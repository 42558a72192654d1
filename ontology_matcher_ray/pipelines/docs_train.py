"""Training-data preparation operators over the ``documents`` table.

The ops an LLM-training corpus pipeline runs after dedup/quality scoring:
PII redaction, sequence packing (concat-and-chunk), TF-IDF salient-term
extraction, and per-language distinct-token HLL sketches.  Like the rest
of the engine every ratio/score is integer micro-units and every hash is
the md5-low-8-bytes recipe (`functions/hashing.md5half` ==
DuckDB ``md5_number_lower``), so each operator is exactly recomputable by
its SQL oracle — no float tolerance anywhere.

Scale design
------------
* ``pii_scrub`` is a pure map stage: RE2 kernels (``pyarrow.compute``
  ``replace_substring_regex`` / ``count_substring_regex``) over Arrow
  string arrays — the SAME regex engine DuckDB uses, so redaction output
  is bit-identical to the oracle.  No shuffle.
* ``doc_pack`` needs a GLOBAL token prefix-sum (concat order = doc_id).
  Classic two-phase distributed scan: pass 1 streams per-batch token
  totals per range-partition to the driver (``num_partitions`` scalars —
  the only driver-side collect); pass 2 re-reads the pruned columns and
  adds the broadcast partition offsets to partition-local sorted cumsums.
  Re-reading beats caching here: the intermediate would have to be
  materialized and consumed twice (the Ray 2.49 double-lineage pitfall,
  see `stages.dedup.near_dup_clusters`), while the re-read is a pruned
  streaming pass.
* ``tfidf_top_terms`` is combiner + two exchanges: per-batch (doc, token)
  tf partials (docs never straddle batches), a token-keyed exchange where
  group size IS the document frequency, and a doc-keyed exchange for the
  per-doc top-k.  The token exchange ships (doc_id, token, tf) rows, not
  text.
* ``lang_token_sketch`` is the sketch path for distinct counting at
  100 TB: per-batch partial register maxima (bounded by langs x
  registers, regardless of token volume), one (lang, reg)-keyed exchange
  of those partials.  Registers merge by max so duplicate tokens need no
  pre-distinct pass — the whole corpus reduces to n_langs x 16 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ontology_matcher_ray.pipelines.docs_text import read_documents, read_embeddings
from ontology_matcher_ray.stages import exchange

from ontology_matcher_ray.functions.hashing import (
    MERSENNE_P,  # 31-bit hash domain shared with minhash/simhash
)

SCALE = 1_000_000
TFIDF_K = 3  # default top-k, mirrored into the oracle SQL

# RE2-compatible (pyarrow and DuckDB both run RE2 — identical semantics)
EMAIL_RE = r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+\.[A-Za-z]+"
PHONE_RE = r"\+1-555-[0-9]+"

PACK_BUDGET = 256          # tokens per training chunk
SKETCH_REGISTERS = 16      # HLL registers (p=4)
SKETCH_RHO_CAP = 28        # rest has 27 bits; rho(rest==0) = cap


def _augment_pii(b: pd.DataFrame) -> pd.Series:
    """Deterministically plant synthetic PII so the redaction path is
    actually exercised (the synthetic corpus contains no emails/phones);
    the oracle plants the identical strings in SQL."""
    d = b["doc_id"].to_numpy(np.int64)
    ids = pd.Series(d).astype(str)
    email_sfx = pd.Series(
        np.where(
            d % 3 == 0,
            " contact user" + ids + "@mail" + pd.Series(d % 7).astype(str) + ".example now",
            "",
        )
    )
    phone_sfx = pd.Series(
        np.where(d % 5 == 0, " call +1-555-" + ids.str.zfill(7) + " today", "")
    )
    return b["text"].reset_index(drop=True) + email_sfx + phone_sfx


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """Redact emails/phones: (doc_id, clean_text, n_emails, n_phones).

    Pure map stage, RE2 kernels on Arrow string arrays.
    """
    import pyarrow.compute as pc

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        aug = pa.array(_augment_pii(b), pa.string())
        n_emails = pc.count_substring_regex(aug, EMAIL_RE)
        n_phones = pc.count_substring_regex(aug, PHONE_RE)
        clean = pc.replace_substring_regex(
            pc.replace_substring_regex(aug, pattern=EMAIL_RE, replacement="<EMAIL>"),
            pattern=PHONE_RE,
            replacement="<PHONE>",
        )
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "clean_text": clean.to_pandas(),
            "n_emails": n_emails.to_numpy().astype(np.int64),
            "n_phones": n_phones.to_numpy().astype(np.int64),
        })

    return ds.map_batches(stage, batch_format="pandas")


def doc_pack(
    sf_dir: str, budget: int = PACK_BUDGET, num_partitions: int = 16
) -> rd.Dataset:
    """Concat-and-chunk sequence packing: documents concatenated in
    doc_id order and split into fixed ``budget``-token training chunks.

    Output per doc: (doc_id, n_tokens, start_offset, chunk_id, n_chunks)
    where start_offset is the doc's global token offset, chunk_id the
    chunk containing its first token, n_chunks how many chunks it spans.

    Two-phase distributed prefix-sum (see module docstring): the driver
    only ever sees ``num_partitions`` partial totals.
    """
    n_docs = read_documents(sf_dir, columns=["doc_id"]).count()  # metadata-only
    if n_docs == 0:
        return rd.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "start_offset": pd.Series([], dtype="int64"),
            "chunk_id": pd.Series([], dtype="int64"),
            "n_chunks": pd.Series([], dtype="int64"),
        }))
    parts = num_partitions

    def counts(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        d = t["doc_id"].to_numpy()
        # len(text.split(' ')) == n_spaces + 1, via the zero-copy Arrow
        # substring counter (no per-row Python, no string copy)
        n = pc.count_substring(t["text"], " ").to_numpy() + 1
        # RANGE partition (doc_id order preserved across partitions);
        # doc_ids beyond n_docs-1 clamp into the last partition
        p = np.minimum(d * parts // max(n_docs, 1), parts - 1)
        return pd.DataFrame({"doc_id": d, "n": n.astype(np.int64), "p": p})

    # pass 1: per-batch partial totals per partition -> tiny driver frame
    def partial_totals(t: pa.Table) -> pd.DataFrame:
        return counts(t).groupby("p", sort=False)["n"].sum().reset_index()

    totals = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial_totals, batch_format="pyarrow")
        .to_pandas()
        .groupby("p")["n"].sum().sort_index()
    )
    offsets = totals.cumsum().shift(fill_value=0).to_dict()  # exclusive

    # pass 2: partition-local sorted cumsum + broadcast offset
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for p, grp in g.groupby("p", sort=False):
            grp = grp.sort_values("doc_id")
            n = grp["n"].to_numpy(np.int64)
            start = np.cumsum(n) - n + offsets[int(p)]
            chunk = start // budget
            out.append(pd.DataFrame({
                "doc_id": grp["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "start_offset": start,
                "chunk_id": chunk,
                "n_chunks": (start + n - 1) // budget - chunk + 1,
            }))
        return pd.concat(out, ignore_index=True)

    ds = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    return exchange.partitioned_apply(ds, ["p"], pack, num_partitions=parts)


def tfidf_top_terms(
    sf_dir: str, k: int = TFIDF_K, num_partitions: int = 16
) -> rd.Dataset:
    """Per-doc top-k salient terms by integer tf-idf.

    score_micro = tf * ((N * 1e6) // df) — linear inverse-df weighting in
    pure int64 (a log-idf would put a libm ``log`` between numpy and
    DuckDB and break bit-exactness; the ranking behavior is equivalent
    for top-k extraction).
    """
    n_docs = read_documents(sf_dir, columns=["doc_id"]).count()
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def tf_partial(b: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "token": b["text"].str.split(" "),
        }).explode("token")
        return e.groupby(["doc_id", "token"], sort=False).size().reset_index(name="tf")

    tf = ds.map_batches(tf_partial, batch_format="pandas")

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # token fully co-located: per-token row count IS the document freq
        df_ = g.groupby("token", sort=False)["doc_id"].transform("size")
        g = g.copy()
        g["score_micro"] = g["tf"].to_numpy(np.int64) * (
            (n_docs * SCALE) // df_.to_numpy(np.int64)
        )
        return g

    scored = exchange.partitioned_apply(tf, ["token"], score, num_partitions)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score_micro", "token"], ascending=[True, False, True]
        )
        g = g.assign(rank=g.groupby("doc_id", sort=False).cumcount() + 1)
        return g.loc[g["rank"] <= k,
                     ["doc_id", "token", "tf", "score_micro", "rank"]]

    return exchange.partitioned_apply(scored, ["doc_id"], topk, num_partitions)


def embedding_quantize(sf_dir: str) -> rd.Dataset:
    """Symmetric int8-style quantization of the embedding column:
    (vec_id, dim, q, scale_micro), one row per vector element.

    Pure map stage (no shuffle).  Arithmetic is fixed-point from the
    first step — v_micro = floor(float64(v) * 1e6) — then all-integer:
    scale = max(|v_micro|) per vector, q = sign * (|v_micro| * 127 //
    scale).  The sign split keeps every division non-negative, where
    numpy floor-division and DuckDB ``//`` (which truncates toward zero
    on negatives) agree, so the oracle recomputes q bit-for-bit.
    Exploded to scalar rows because the driver's value-hash compares
    scalars, not list cells.
    """
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["vec_id"].to_numpy(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        vm = np.floor(mat * SCALE).astype(np.int64)
        scale = np.maximum(np.abs(vm).max(axis=1), 1)
        q = np.sign(vm) * (np.abs(vm) * 127 // scale[:, None])
        n, dim = vm.shape
        return pd.DataFrame({
            "vec_id": np.repeat(ids, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), n),
            "q": q.reshape(-1),
            "scale_micro": np.repeat(scale, dim),
        })

    return ds.map_batches(stage, batch_format="pandas")


def stratified_sample(sf_dir: str) -> rd.Dataset:
    """Per-language deterministic hash sampling with language-derived
    rates: (doc_id, lang, strat_mod) for kept docs.

    Coordination-free like ``docs_text.sample_docs`` (keep iff
    md5half(text) %% mod == 0) but the modulus is per-stratum —
    mod(lang) = md5half(lang) %% 7 + 2 — so every language gets a
    deterministic 1/2 .. 1/8 rate without a configured language list.
    A worker needs no global state: the decision is a pure function of
    the row.
    """
    from ontology_matcher_ray.functions.hashing import md5half

    ds = read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    def stage(b: pd.DataFrame) -> pa.Table:
        mods = {l: md5half(l) % 7 + 2 for l in b["lang"].unique()}
        mod = b["lang"].map(mods).to_numpy(np.int64)
        hv = np.fromiter(
            (md5half(t) for t in b["text"]), dtype=np.uint64, count=len(b)
        )
        keep = hv % mod.astype(np.uint64) == 0
        # typed Arrow output so filtered-empty batches keep their schema
        # (see docs_text.sample_docs)
        return pa.table({
            "doc_id": pa.array(b["doc_id"].to_numpy()[keep], pa.int64()),
            "lang": pa.array(b["lang"].to_numpy()[keep], pa.string()),
            "strat_mod": pa.array(mod[keep], pa.int64()),
        })

    return ds.map_batches(stage, batch_format="pandas")


def lang_token_sketch(
    sf_dir: str, registers: int = SKETCH_REGISTERS, num_partitions: int = 8
) -> rd.Dataset:
    """Per-language HyperLogLog registers over the token stream:
    (lang, reg, max_rho).

    The distinct-counting sketch for 100 TB: registers merge by max, so
    per-batch partials are bounded by n_langs x ``registers`` no matter
    how many tokens stream through, and duplicates need no pre-distinct
    pass.  Estimation (harmonic mean of 2^-rho) is a trivial driver-side
    fold over the returned rows; the sketch itself — which is what
    shuffles and checkpoints — is pure int64 and exactly recomputed by
    the oracle.  rho = trailing-zeros(h // registers) + 1 on the md5
    31-bit domain, ``SKETCH_RHO_CAP`` when the remainder is 0.
    """
    from ontology_matcher_ray.functions.hashing import md5half

    ds = read_documents(sf_dir, columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({
            "lang": b["lang"].to_numpy(),
            "token": b["text"].str.split(" "),
        }).explode("token")
        vocab = pd.unique(e["token"])
        hv_map = {t: md5half(t) % MERSENNE_P for t in vocab}  # md5 once per distinct token
        hv = e["token"].map(hv_map).to_numpy(np.int64)
        reg = hv % registers
        rest = hv // registers
        lowbit = rest & -rest
        rho = np.where(
            rest == 0,
            np.int64(SKETCH_RHO_CAP),
            np.log2(np.maximum(lowbit, 1)).astype(np.int64) + 1,
        )
        part = pd.DataFrame({"lang": e["lang"].to_numpy(), "reg": reg, "rho": rho})
        return (
            part.groupby(["lang", "reg"], sort=False)["rho"]
            .max().reset_index(name="max_rho")
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return exchange.grouped_agg(
        partials, ["lang", "reg"],
        lambda gb: gb.agg(max_rho=("max_rho", "max")),
        num_partitions,
    )


DECON_EVAL_MOD = 37  # every 37th doc stands in for the "benchmark" set


def decon_ngrams(sf_dir: str) -> list:
    """The benchmark n-gram set: every DECON_EVAL_MOD-th document's
    leading 3-gram, read once driver-side (pruned, filtered read —
    n_docs/37 rows) and broadcast into scans as a plain list."""
    import pyarrow as pa

    from ontology_matcher_ray.pipelines.docs_text import read_documents

    def ev_filter(t: pa.Table) -> pa.Table:
        # Arrow in/out: filtered-empty blocks keep their schema (pandas
        # empties trip Ray's size estimator into log spam)
        ids = t["doc_id"].to_numpy()
        return t.filter(pa.array(ids % DECON_EVAL_MOD == 0))

    ev_docs = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(ev_filter, batch_format="pyarrow")
        .to_pandas()  # bounded: n_docs / DECON_EVAL_MOD rows
    )
    return sorted(
        {
            " ".join(t.split(" ")[:3])
            for t in ev_docs["text"].astype(str)
            if t
        }
    )


def decon_hits(text: "pd.Series", ngrams: list) -> "np.ndarray":
    """Per-batch contamination kernel: one vectorized ``str.contains``
    pass per n-gram (for a real ~10^5-n-gram suite the scan swaps to
    the corpus token index / Aho-Corasick used by stages/extract, same
    plumbing).  Module-level so ``curate_decisions``' fused scan reuses
    the EXACT flag definition."""
    import numpy as np

    hit = np.zeros(len(text), dtype=bool)
    for ng in ngrams:
        hit |= text.str.contains(ng, regex=False).to_numpy()
    return hit


def decontaminate(sf_dir: str) -> "rd.Dataset":
    """Eval-set decontamination: flag training docs that contain any
    benchmark n-gram (the substring-overlap rule used before LLM
    training runs).  No shuffle at all: flagging is embarrassingly
    parallel."""
    import numpy as np
    import pandas as pd

    from ontology_matcher_ray.pipelines.docs_text import read_documents

    ngrams = decon_ngrams(sf_dir)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "contaminated": decon_hits(
                    b["text"].astype(str), ngrams).astype(np.int64),
            }
        )

    return read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        flag, batch_format="pandas"
    )


SHUFFLE_SEED = 7
SHUFFLE_SHARDS = 8


def shuffle_shards(
    sf_dir: str,
    n_shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
    n_buckets: int = 64,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Deterministic coordination-free global shuffle into training
    shards: (doc_id, shard, pos) where ``shard`` is a seeded-hash shard
    assignment and ``pos`` the document's rank within its shard in hash
    order — the assignment a data loader needs to stream a reshuffled
    epoch as N independent shard files, reproducible for any seed with
    NO random state (reshuffle = change the seed).

    Key = low-63-bit md5 of ``"{seed}:{doc_id}"`` (DuckDB
    ``md5_number_lower`` convention, like the sampling family);
    shard = key % n_shards; pos = rank by (key, doc_id) within shard.

    Scale shape: global per-shard ranking WITHOUT a global sort — the
    key space is cut into ``n_buckets`` ordered buckets (bucket is
    monotone in key), pass 1 is a per-batch combiner counting
    (shard, bucket) cells so the driver reduce is bounded by
    n_shards x n_buckets scalars (never row data), pass 2 exchanges
    24-byte (doc_id, key) rows on (shard, bucket) and ranks each cell
    locally, offset by the exclusive bucket prefix-sum — the same
    two-phase prefix-sum story as ``doc_pack``.  Hot cells hold
    ~N/(n_shards*n_buckets) rows of 24 bytes; raise ``n_buckets``
    (power of two) to shrink them at constant driver cost.
    """
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    from ontology_matcher_ray.functions.hashing import md5half

    M = 1 << 63
    shift = 63 - n_buckets.bit_length() + 1   # key >> shift in [0, n_buckets)

    def assign(t: "pa.Table") -> pd.DataFrame:
        d = t["doc_id"].to_numpy()
        key = np.fromiter(
            (md5half(f"{seed}:{i}") % M for i in d),
            dtype=np.int64, count=len(d),
        )
        return pd.DataFrame({
            "doc_id": d.astype("int64"),
            "key": key,
            "shard": key % n_shards,
            "bucket": key >> shift,
        })

    # the per-row md5 keying is the op's dominant cost: run it ONCE and
    # materialize the 32 B/doc assignment for both passes (the engine's
    # standard double-consumption pattern — kg_reach edges, PageRank)
    assigned = read_documents(sf_dir, columns=["doc_id"]).map_batches(
        assign, batch_format="pyarrow").materialize()

    # pass 1: bounded driver reduce of (shard, bucket) cell counts
    cnt = (
        assigned.map_batches(
            lambda b: b.groupby(["shard", "bucket"], sort=False)
            .size().reset_index(name="n"),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["shard", "bucket"])["n"].sum().sort_index()
    )
    # exclusive prefix-sum over bucket order WITHIN each shard: bucket is
    # monotone in key, so cell offset + local (key, doc_id) rank = the
    # doc's exact rank under ORDER BY key, doc_id within its shard
    off = (cnt.groupby(level=0).cumsum() - cnt).reset_index(name="off")

    def rank_cells(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "bucket", "key", "doc_id"],
                          kind="mergesort")
        within = g.groupby(["shard", "bucket"], sort=False).cumcount()
        m = g.merge(off, on=["shard", "bucket"], how="left")
        return pd.DataFrame({
            "doc_id": m["doc_id"].to_numpy(np.int64),
            "shard": m["shard"].to_numpy(np.int64),
            "pos": (m["off"].to_numpy(np.int64)
                    + within.to_numpy(np.int64)),
        })

    from ontology_matcher_ray.stages import exchange

    return exchange.partitioned_apply(
        assigned, ["shard", "bucket"], rank_cells, num_partitions,
    )


def _bpe_local_loop(vdf: pd.DataFrame, k: int, min_count: int) -> list:
    """Driver-side mirror of the distributed BPE iteration: identical
    pair weighting, (count desc, 'left right' asc) tie-break, and
    greedy-left non-overlapping apply — over the already-symbolized
    vocab frame.  Rows that converge to the same pieces after a merge
    coalesce here but stay separate rows in the distributed path; pair
    SUMS are identical either way, so the selected merges match."""
    vocab: dict = {}
    for pieces, cnt in zip(vdf["pieces"], vdf["cnt"]):
        t = tuple(str(pieces).split(" "))
        vocab[t] = vocab.get(t, 0) + int(cnt)
    merges = []
    for rank in range(1, k + 1):
        pairs: dict = {}
        for t, c in vocab.items():
            for i in range(len(t) - 1):
                p = (t[i], t[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        if n < min_count:
            break
        merged = left + right
        new: dict = {}
        for t, c in vocab.items():
            out, i, last = [], 0, len(t) - 1
            while i < len(t):
                if i < last and t[i] == left and t[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            tt = tuple(out)
            new[tt] = new.get(tt, 0) + c
        vocab = new
        merges.append((rank, left, right, int(n)))
    return merges


def bpe_merges(
    sf_dir: str,
    k: int = 20,
    num_partitions: int = 16,
    min_count: int = 2,
    driver_vocab_max: int = 200_000,
) -> rd.Dataset:
    """Distributed BPE tokenizer-vocabulary training: the first ``k``
    byte-pair merges over the corpus, (rank, left, right, n) — the
    classic Sennrich et al. 2016 algorithm expressed as a bounded loop
    of exchanges.

    Like the reference algorithm, merges are learned over the WORD
    FREQUENCY table, not raw text: one corpus pass (``token_freq``'s
    combiner + exchange) compresses 100 TB of text to a distinct-word
    dataset, and every iteration after that touches only that vocab
    table.  Per iteration: (1) a per-batch Arrow kernel counts adjacent
    symbol pairs weighted by word count (the DSIR bigram shape on the
    pieces column), (2) one exchange aggregates pair counts exactly,
    (3) the driver reads ONE candidate row per output block (bounded)
    and picks the winner by (count desc, pair asc — deterministic
    tie-break), (4) a vectorized regex pass applies the merge to the
    vocab (leftmost non-overlapping = BPE's greedy-left semantics) and
    re-materializes it (k bounded re-materializations of a vocab-sized
    table — the PageRank iteration pattern).  Stops early when the best
    pair's count drops below ``min_count``.

    Not SQL-expressible (iterative); verified against an independent
    dict-based BPE recompute in tests/test_bpe.py.
    """
    import re as _re

    from ontology_matcher_ray.pipelines.docs_text import token_freq
    from ontology_matcher_ray.stages import exchange

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def symbolize(b: pd.DataFrame) -> pd.DataFrame:
        w = b["token"].astype(str)
        keep = (w.str.len() >= 2).to_numpy()   # 1-char words have no pairs
        return pd.DataFrame({
            "pieces": [" ".join(x) for x in w[keep]],
            "cnt": b.loc[keep, "n"].astype("int64").to_numpy(),
        })

    vocab = token_freq(sf_dir).map_batches(
        symbolize, batch_format="pandas").materialize()

    # Size-gated driver fast path (the union-find fast-path pattern in
    # stages/dedup.near_dup_clusters): the iterative loop touches only
    # the DISTINCT-WORD table, so when that table is driver-sized
    # (<= driver_vocab_max rows — the corpus itself was already reduced
    # by token_freq's combiner) the k exchange+materialize rounds are
    # pure fixed cost; one bounded read + the identical greedy-left /
    # (count desc, pair asc) loop in local pandas produces the SAME
    # merges (tests force both paths onto one fixture and compare).
    # Above the gate the distributed loop runs unchanged.
    if vocab.count() <= driver_vocab_max:       # metadata-only count
        vdf = vocab.to_pandas()
        merges = _bpe_local_loop(vdf, k, min_count)
        return rd.from_pandas(pd.DataFrame(
            merges, columns=["rank", "left", "right", "n"],
        ).astype({"rank": "int64", "left": "object", "right": "object",
                  "n": "int64"}))

    _EMPTY = pd.DataFrame({"pair": pd.Series(dtype=object),
                           "n": pd.Series(dtype="int64")})

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(b["pieces"].astype(str))
        lst = pc.split_pattern(arr, pattern=" ")
        parents = pc.list_parent_indices(lst).to_numpy()
        flat = lst.flatten().to_pandas().to_numpy()
        if len(flat) < 2:
            return _EMPTY.copy()
        adj = parents[1:] == parents[:-1]
        pair = (pd.Series(flat[:-1][adj]) + " "
                + pd.Series(flat[1:][adj])).to_numpy()
        w = b["cnt"].to_numpy()[parents[:-1][adj]]
        g = (pd.DataFrame({"pair": pair, "n": w})
             .groupby("pair", sort=False)["n"].sum().reset_index())
        return g.astype({"n": "int64"})

    def batch_top(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _EMPTY.copy()
        return b.sort_values(["n", "pair"], ascending=[False, True],
                             kind="mergesort").head(1)

    merges = []
    for rank in range(1, k + 1):
        agg = exchange.grouped_agg(
            vocab.map_batches(pair_partial, batch_format="pandas"),
            ["pair"], lambda gb: gb.agg(n=("n", "sum")), num_partitions,
        )
        # every pair is fully aggregated in exactly one row, so the
        # global winner is among the per-block argmaxes (bounded read)
        cand = agg.map_batches(batch_top, batch_format="pandas").to_pandas()
        if not len(cand):
            break
        best = cand.sort_values(["n", "pair"], ascending=[False, True],
                                kind="mergesort").iloc[0]
        if int(best["n"]) < min_count:
            break
        left, right = best["pair"].split(" ")
        merged = left + right
        pat = _re.compile(
            f"(?<= ){_re.escape(left)} {_re.escape(right)}(?= )")

        def apply(bb: pd.DataFrame, pat=pat, merged=merged) -> pd.DataFrame:
            p = (" " + bb["pieces"].astype(str) + " ").str.replace(
                pat, lambda m: merged, regex=True)
            return pd.DataFrame({"pieces": p.str.slice(1, -1),
                                 "cnt": bb["cnt"].to_numpy()})

        vocab = vocab.map_batches(
            apply, batch_format="pandas").materialize()
        merges.append((rank, left, right, int(best["n"])))

    return rd.from_pandas(pd.DataFrame(
        merges, columns=["rank", "left", "right", "n"],
    ).astype({"rank": "int64", "left": "object", "right": "object",
              "n": "int64"}))


class BpeEncoder:
    """Stateful BPE apply: one actor per pool slot, merge ranks captured
    once in ``__init__`` (the merge table is <= k rows — tiny by
    construction, broadcast by closure like the 25-row nation table in
    ``pipelines/relational.py``), plus a per-actor word -> piece-count
    memo so each DISTINCT word is encoded once per actor regardless of
    how many batches repeat it (Zipf makes the memo hit rate dominate at
    corpus scale, and its size is bounded by the actor-lifetime distinct
    vocabulary, not the corpus).

    Apply semantics mirror training exactly: merges in rank order, each
    replacing leftmost non-overlapping occurrences — so for any word in
    the training corpus ``encode(word)`` reproduces the trained vocab's
    pieces (tests/test_bpe.py::test_bpe_encode_consistent_with_training).
    """

    def __init__(self, merges: list):
        # [(left, right), ...] in rank order
        self._merges = [(l, r, l + r) for l, r in merges]
        self._memo: dict = {}

    def _encode_len(self, word: str) -> int:
        n = self._memo.get(word)
        if n is not None:
            return n
        syms = list(word)
        for left, right, merged in self._merges:
            if len(syms) == 1:
                break
            i, out = 0, []
            last = len(syms) - 1
            while i < len(syms):
                if i < last and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n = len(syms)
        self._memo[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lst = pc.split_pattern(
            pc.cast(t["text"], pa.string()), pattern=" ").combine_chunks()
        parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lst).to_pandas()
        # factorize so each distinct word in the batch is encoded once,
        # then scatter-add piece counts back per document
        codes, uniques = pd.factorize(flat, sort=False)
        per_unique = np.fromiter(
            (self._encode_len(w) for w in uniques), dtype=np.int64,
            count=len(uniques))
        n_docs = len(t)
        n_words = np.bincount(parents, minlength=n_docs).astype(np.int64)
        n_pieces = np.bincount(
            parents, weights=per_unique[codes].astype(np.float64),
            minlength=n_docs).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_pieces, pa.int64()),
        })


def bpe_encode(sf_dir: str, k: int = 20, num_partitions: int = 16,
               concurrency: int = 4) -> rd.Dataset:
    """Apply a trained BPE merge table to every document: per-doc
    (n_tokens, n_bpe_tokens) — the fertility profile a tokenizer
    ablation needs before committing a vocab to a 100-TB tokenization
    run.

    Two phases: (1) train via ``bpe_merges`` (bounded: the driver reads
    the <= k-row merge table, nothing else); (2) a shuffle-free
    actor-pool map over the documents — merges broadcast by closure,
    per-actor memoized word encoding, Arrow-native tokenization, one
    output row per input document.  No exchange anywhere in the encode
    phase, so it pipelines with the read at any scale.
    """
    mdf = bpe_merges(sf_dir, k=k, num_partitions=num_partitions).to_pandas()
    merges = list(zip(mdf["left"], mdf["right"]))
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(merges,),
        batch_format="pyarrow", zero_copy_batch=True,
        # autoscaling pool: min 1 so the stage can never reserve every
        # CPU and starve the upstream read on small clusters
        concurrency=(1, concurrency),
    )


def _bigram_counts(b: pd.DataFrame) -> pd.DataFrame:
    """Per-(doc, bigram) occurrence counts — exact within one batch
    because every document sits wholly in one row.  Docs with < 2 tokens
    emit a (doc_id, '', 0) marker so the downstream join keeps one row
    per document (the '' key is seeded into the count table with zero
    mass, so markers survive the inner join and add nothing)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(b["text"].astype(str))
    lst = pc.split_pattern(arr, pattern=" ")
    parents = pc.list_parent_indices(lst).to_numpy()
    flat = lst.flatten().to_pandas()
    adj = parents[1:] == parents[:-1]
    big = (pd.Series(flat.to_numpy()[:-1][adj])
           + " " + pd.Series(flat.to_numpy()[1:][adj])).to_numpy()
    doc_ids = b["doc_id"].astype("int64").to_numpy()
    df = pd.DataFrame({"doc_id": doc_ids[parents[:-1][adj]], "b": big})
    g = df.groupby(["doc_id", "b"], sort=False).size().reset_index(name="c")
    seen = pd.unique(g["doc_id"])
    short = np.setdiff1d(doc_ids, seen)
    if len(short):
        g = pd.concat([g, pd.DataFrame(
            {"doc_id": short, "b": "", "c": 0})], ignore_index=True)
    return g.astype({"doc_id": "int64", "c": "int64"})


def dsir_importance(sf_dir: str, num_partitions: int = 16,
                    salt: int = 1) -> rd.Dataset:
    """DSIR-shaped data-selection score (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): rate each
    document by how much its bigram distribution resembles a target
    (eval-like) slice relative to the raw corpus.

    Deviations from the paper, chosen for distributed exactness: the
    features are EXACT bigram counts (no hash bucketing — the count
    table is built distributed, so there is no model to bound), and the
    score is the integer arithmetic mean of per-occurrence count ratios
    in micro-units rather than a log-likelihood ratio (floats would
    break bit-stable value-hash verification):

        score_micro = (sum over bigram occurrences of
                       (tgt_n+1) * 1e6 // (raw_n+1)) // n_bigrams

    The target slice reuses the decontamination convention (every
    ``DECON_EVAL_MOD``-th doc stands in for the benchmark set).

    Shape: (1) one corpus pass -> per-doc bigram counts (exact per
    batch, no exchange — each doc is one row); (2) a second pass with a
    per-batch combiner + ONE exchange builds the global (bigram, raw_n,
    tgt_n) count table; (3) a big⋈big ``hash_join`` on the bigram
    (``salt`` spreads hot bigrams — "of the" at corpus scale — by
    replicating the pre-aggregated count side); (4) one exchange on
    doc_id sums the score.  Headroom: (tgt_n+1)*1e6 caps the engine's
    int64 at ~9.2e12 target occurrences of one bigram (~sf10k of target
    slice) and wraps silently past that; the DuckDB oracle's unCASTed
    sums promote to HUGEINT, so past the headroom the two diverge —
    stay under it."""
    from ontology_matcher_ray.stages import exchange

    def count_partials(b: pd.DataFrame) -> pd.DataFrame:
        g = _bigram_counts(b)
        tgt = (g["doc_id"] % DECON_EVAL_MOD == 0).to_numpy()
        g["tgt_c"] = np.where(tgt, g["c"].to_numpy(), 0)
        out = g.groupby("b", sort=False, as_index=False)[["c", "tgt_c"]].sum()
        out = out.rename(columns={"c": "raw_n", "tgt_c": "tgt_n"})
        if not (out["b"] == "").any():  # seed the marker key
            out = pd.concat([out, pd.DataFrame(
                {"b": [""], "raw_n": [0], "tgt_n": [0]})], ignore_index=True)
        return out.astype({"raw_n": "int64", "tgt_n": "int64"})

    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    counts = exchange.partitioned_apply(
        docs.map_batches(count_partials, batch_format="pandas"),
        ["b"],
        lambda g: g.groupby("b", sort=False, as_index=False)[
            ["raw_n", "tgt_n"]].sum(),
        num_partitions,
    )
    bg = docs.map_batches(_bigram_counts, batch_format="pandas")
    joined = exchange.hash_join(
        bg, counts, "b", "b",
        {"doc_id": "int64", "b": "object", "c": "int64"},
        {"b": "object", "raw_n": "int64", "tgt_n": "int64"},
        num_partitions=num_partitions, salt=salt,
    )

    def score_terms(b: pd.DataFrame) -> pd.DataFrame:
        term = ((b["tgt_n"].to_numpy() + 1) * 1_000_000
                // (b["raw_n"].to_numpy() + 1)) * b["c"].to_numpy()
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "s": term, "nb": b["c"].to_numpy()})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("doc_id", sort=False, as_index=False)[["s", "nb"]].sum()
        return pd.DataFrame({
            "doc_id": a["doc_id"].astype("int64"),
            "n_bigrams": a["nb"].astype("int64"),
            "dsir_score_micro": (a["s"].to_numpy()
                                 // np.maximum(a["nb"].to_numpy(), 1)
                                 ).astype("int64"),
        })

    return exchange.partitioned_apply(
        joined.map_batches(score_terms, batch_format="pandas"),
        ["doc_id"], finalize, num_partitions,
    )


LM_ALPHA_NUM, LM_ALPHA_DEN = 4, 10  # stupid-backoff alpha = 0.4 as a rational


def _ilog_micro(x: np.ndarray) -> np.ndarray:
    """``floor(1e6 * ln(x))`` as int64 — the integer micro-nat log both
    the engine and the DuckDB oracle compute.  Arguments are always
    integer COUNTS (possibly float64-boxed by a LEFT join), so the two
    sides evaluate the same IEEE double; a divergence would need
    ``1e6*ln(n)`` within ~1 ulp of an integer, and ``ln(n)`` is
    transcendental for integer n>1 — the same negligible-risk class as
    the engine's documented md5-low-half collision bounds.  NaN (an
    unmatched LEFT-join row whose branch is never selected) and 0 are
    clamped to 1 -> 0 micro-nats before the log."""
    v = np.nan_to_num(np.asarray(x, dtype="float64"), nan=1.0)
    return np.floor(SCALE * np.log(np.maximum(v, 1.0))).astype(np.int64)


def lm_perplexity(sf_dir: str, num_partitions: int = 16,
                  salt: int = 1) -> rd.Dataset:
    """CCNet-style language-model fluency scoring (Wenzek et al. 2020):
    score every document's cross-entropy under a bigram LM trained on a
    clean reference slice — the classic "perplexity filter" stage of a
    web-scale training-data pipeline (CCNet buckets Common Crawl by
    KenLM-on-Wikipedia perplexity).

    Deviations from CCNet, chosen for distributed exactness: the LM is a
    STUPID-BACKOFF bigram model (Brants et al. 2007) instead of
    Kneser-Ney — backoff weight alpha = 0.4 as the exact rational 4/10 —
    and every per-token log-probability is quantized to integer
    micro-nats (``_ilog_micro``) BEFORE summation, so the per-doc sum is
    order-independent, partition-invariant, and bit-exactly recomputable
    by the DuckDB oracle (no float-accumulation anywhere).  The train
    slice reuses the decontamination convention (every
    ``DECON_EVAL_MOD``-th doc stands in for the curated reference
    corpus).  Per-token log-prob, with L(x) = floor(1e6*ln(max(x,1))):

        seen bigram (u,w):  L(c2(u,w)) - L(c1(u))
        unseen, w known:    (L(4)-L(10)) + L(c1(w)) - L(T)
        OOV w:              (L(4)-L(10)) - L(T+V)

    (T = total train tokens, V = train vocabulary size.)  Output is one
    row per document: ``lm_n_scored`` (bigram positions scored; 0 for
    docs under 2 tokens) and ``lm_xent_micro`` = cross-entropy in
    micro-nats per position (perplexity = exp(xent/1e6); the monotone
    integer form is kept to stay hash-exact).

    Shape (mirrors ``dsir_importance``): (1) ONE pruned corpus pass
    emits the train-slice unigram AND bigram count partials as a tagged
    union (per-batch combiner + ONE (kind,key)-co-partitioned exchange;
    the resulting vocab-sized table is materialized because it feeds
    three joins and the T/V scalars — the bounded-materialization
    pattern of ``graph.kg_pagerank``); (2) a
    vocab⋈vocab ``hash_join`` attaches the context count c1(prev) to
    each bigram row (prev is recoverable from the bigram string: tokens
    are space-free, so the key has exactly one space); (3) the per-doc
    (doc_id, bigram, c) pair stream LEFT-joins the bigram table then the
    unigram table (``salt`` spreads "of the"-hot keys; the count sides
    are pre-aggregated so replication is cheap); (4) one exchange on
    doc_id sums integer (score, n) — text never enters any shuffle.
    Headroom: |lp| <= ~1e6*ln(T+V) ~ 35e6 micro-nats/position at 100 TB,
    so int64 per-doc sums hold to ~2.6e11 positions per document."""
    import pyarrow.compute as pc

    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def count_partials(b: pd.DataFrame) -> pd.DataFrame:
        # ONE tokenization of the train slice emits BOTH unigram and
        # bigram count partials as a tagged union (kind 'u'/'b') — one
        # corpus read instead of two; the exchange co-partitions by
        # (kind, key) so both tables still sum exactly
        b = b[b["doc_id"].astype("int64") % DECON_EVAL_MOD == 0]
        empty = pd.DataFrame({"kind": pd.Series([], dtype=object),
                              "key": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64")})
        if not len(b):
            return empty
        flat = pc.split_pattern(
            pa.array(b["text"].astype(str)), pattern=" ").flatten()
        vc = pd.Series(flat.to_pandas()).value_counts(sort=False)
        uni = pd.DataFrame({"kind": "u",
                            "key": vc.index.to_numpy(dtype=object),
                            "n": vc.to_numpy().astype("int64")})
        g = _bigram_counts(b)
        g = g[g["c"] > 0]  # short-doc markers carry no mass
        bg = g.groupby("b", sort=False, as_index=False)["c"].sum()
        big = pd.DataFrame({"kind": "b",
                            "key": bg["b"].to_numpy(dtype=object),
                            "n": bg["c"].to_numpy().astype("int64")})
        return pd.concat([uni, big], ignore_index=True)

    counts = exchange.partitioned_apply(
        docs.map_batches(count_partials, batch_format="pandas"),
        ["kind", "key"],
        lambda g: g.groupby(["kind", "key"], sort=False,
                            as_index=False)["n"].sum(),
        num_partitions,
    ).materialize()  # (vocab + bigram-vocab)-sized: feeds T/V + 3 joins

    uni = counts.map_batches(
        lambda f: (f.loc[f["kind"] == "u", ["key", "n"]]
                   .rename(columns={"key": "w", "n": "c1"})),
        batch_format="pandas")
    bg = counts.map_batches(
        lambda f: (f.loc[f["kind"] == "b", ["key", "n"]]
                   .rename(columns={"key": "b", "n": "c2"})),
        batch_format="pandas")
    # T/V scalars via a bounded aggregate over the materialized table
    T = int(counts.map_batches(
        lambda f: pd.DataFrame(
            {"t": [int(f.loc[f["kind"] == "u", "n"].sum())]}),
        batch_format="pandas").sum("t") or 0)
    V = int(counts.map_batches(
        lambda f: pd.DataFrame({"v": [int((f["kind"] == "u").sum())]}),
        batch_format="pandas").sum("v") or 0)

    def with_prev(f: pd.DataFrame) -> pd.DataFrame:
        f = f.copy()
        f["prev"] = f["b"].str.split(" ", n=1).str[0]
        return f

    big2 = exchange.hash_join(
        bg.map_batches(with_prev, batch_format="pandas"),
        uni.map_batches(lambda f: f.rename(columns={"c1": "c1u"}),
                        batch_format="pandas"),
        "prev", "w",
        {"b": "object", "c2": "int64", "prev": "object"},
        {"w": "object", "c1u": "int64"},
        num_partitions=num_partitions, salt=salt,
    ).map_batches(lambda f: f.drop(columns=["prev"]), batch_format="pandas")

    pairs = docs.map_batches(_bigram_counts, batch_format="pandas")
    j1 = exchange.hash_join(
        pairs, big2, "b", "b",
        {"doc_id": "int64", "b": "object", "c": "int64"},
        {"b": "object", "c2": "int64", "c1u": "int64"},
        how="left", num_partitions=num_partitions, salt=salt,
    )

    def with_cur(f: pd.DataFrame) -> pd.DataFrame:
        f = f.copy()
        # markers (b='') split to a single piece -> no [1] element -> ''
        f["cur"] = f["b"].str.split(" ", n=1).str[1].fillna("")
        return f

    j2 = exchange.hash_join(
        j1.map_batches(with_cur, batch_format="pandas"),
        uni.map_batches(lambda f: f.rename(columns={"c1": "c1w"}),
                        batch_format="pandas"),
        "cur", "w",
        {"doc_id": "int64", "b": "object", "c": "int64",
         "c2": "float64", "c1u": "float64", "cur": "object"},
        {"w": "object", "c1w": "int64"},
        how="left", num_partitions=num_partitions, salt=salt,
    )

    l_alpha = int(_ilog_micro(np.array([LM_ALPHA_NUM]))[0]
                  - _ilog_micro(np.array([LM_ALPHA_DEN]))[0])
    l_t = int(_ilog_micro(np.array([T]))[0])
    l_tv = int(_ilog_micro(np.array([T + V]))[0])

    def score(f: pd.DataFrame) -> pd.DataFrame:
        c2 = f["c2"].to_numpy(dtype="float64")
        seen = ~np.isnan(c2)
        c1w = f["c1w"].to_numpy(dtype="float64")
        known = ~np.isnan(c1w)
        lp = np.where(
            seen,
            _ilog_micro(c2) - _ilog_micro(f["c1u"].to_numpy(dtype="float64")),
            l_alpha + np.where(known, _ilog_micro(c1w) - l_t, -l_tv),
        )
        c = f["c"].to_numpy().astype("int64")
        return pd.DataFrame({"doc_id": f["doc_id"].to_numpy(),
                             "s": lp * c, "n": c})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("doc_id", sort=False, as_index=False)[["s", "n"]].sum()
        return pd.DataFrame({
            "doc_id": a["doc_id"].astype("int64"),
            "lm_n_scored": a["n"].astype("int64"),
            "lm_xent_micro": ((-a["s"].to_numpy())
                              // np.maximum(a["n"].to_numpy(), 1)
                              ).astype("int64"),
        })

    return exchange.partitioned_apply(
        j2.map_batches(score, batch_format="pandas"),
        ["doc_id"], finalize, num_partitions,
    )


PPL_HEAD_Q, PPL_TAIL_Q = 0.25, 0.75  # exact binary floats: ceil(q*n) is
#                                      float-boundary-safe in both engines


def lm_ppl_buckets(sf_dir: str, num_partitions: int = 16,
                   salt: int = 1) -> rd.Dataset:
    """CCNet's head/middle/tail corpus partitioning: bucket every
    document by its LM cross-entropy relative to the corpus-wide
    distribution (Wenzek et al. 2020 split Common Crawl into
    head/middle/tail by KenLM perplexity tertiles; this engine uses the
    float-safe 25%/75% cuts — 0.25/0.75 are exact binary fractions, so
    the ``ceil(q*n)`` selection index cannot straddle a float-rounding
    boundary between numpy and DuckDB, unlike 1/3).

    Scale shape: thresholds are quantiles over a corpus-sized value
    column, so the exact (value, count) selection exchange would move
    one row per DISTINCT cross-entropy — effectively per doc.  Instead
    values collapse to the top-5-bit mergeable sketch buckets of
    ``relational._bucket_lower_bound`` (the same sketch the approx
    order-price quantiles use, <1/16 relative error — coarse on purpose,
    CCNet's buckets are coarse): the combiner emits at most ~500
    distinct bucket rows per block, ONE single-partition exchange
    cum-selects the two thresholds (driver reads 1 row), and a
    vectorized label pass compares each doc's own sketch bucket against
    them.  The per-doc score table is materialized once (3 int columns
    per doc — the bounded-materialization pattern; recomputing the LM
    for the second consumer would cost two more corpus passes).
    Unscored docs (< 2 tokens) get bucket 'unscored'."""
    import math

    from ontology_matcher_ray.pipelines.relational import (
        _bucket_lower_bound,
    )

    lm = lm_perplexity(sf_dir, num_partitions, salt).materialize()

    def sketch_partials(b: pd.DataFrame) -> pd.DataFrame:
        s = b[b["lm_n_scored"].to_numpy() > 0]
        f = pd.DataFrame({
            "skb": _bucket_lower_bound(s["lm_xent_micro"].to_numpy()),
            "cnt": np.ones(len(s), dtype=np.int64),
            "g": np.zeros(len(s), dtype=np.int64),
        })
        return f.groupby(["g", "skb"], sort=False, as_index=False).sum()

    def select_thresholds(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("skb", sort=True)["cnt"].sum()
        values = grp.index.to_numpy()
        cum = grp.to_numpy().cumsum()
        n = int(cum[-1]) if len(cum) else 0
        if n == 0:
            return pd.DataFrame({"t_head": [0], "t_tail": [0]})
        pick = lambda q: int(values[np.searchsorted(
            cum, max(0, math.ceil(q * n) - 1) + 1, side="left")])
        return pd.DataFrame({"t_head": [pick(PPL_HEAD_Q)],
                             "t_tail": [pick(PPL_TAIL_Q)]})

    th = exchange.partitioned_apply(
        lm.map_batches(sketch_partials, batch_format="pandas"),
        ["g"], select_thresholds, num_partitions=1,
    ).take_all()
    t_head = int(th[0]["t_head"]) if th else 0
    t_tail = int(th[0]["t_tail"]) if th else 0

    def label(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        skb = _bucket_lower_bound(b["lm_xent_micro"].to_numpy())
        scored = b["lm_n_scored"].to_numpy() > 0
        b["ppl_bucket"] = np.select(
            [~scored, skb <= t_head, skb > t_tail],
            ["unscored", "head", "tail"], default="middle")
        return b

    return lm.map_batches(label, batch_format="pandas")


def curate_decisions(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """End-to-end corpus-curation decision: one row per document,
    (doc_id, curate_keep, drop_reason), combining the independently
    verified flag operators of this engine the way a production
    training-data pipeline chains them.

    Every flag is computed over the FULL corpus (dedup must see all
    documents, not a pre-filtered subset — the standard curation
    practice), then the per-doc flags meet in a distributed
    ``exchange.hash_join`` chain and a fixed precedence decides:

      near_dup       not the min-id survivor of its MinHash near-dup
                     component (``dedup_clusters``; subsumes exact dups —
                     identical text always co-clusters)
      low_quality    Gopher-band 'low' (``doc_quality``)
      contaminated   contains a benchmark n-gram (``decontaminate``)
      in_prior       content already in the prior snapshot
                     (``dedup_incremental``)
      ''             kept (curate_keep = True)

    No text ever enters the joins — only (doc_id, flag) rows move.

    Scan fusion (measured on this host: 6.1 s -> 5.0 s at sf0.1): the
    quality band, contamination flag and content hash are all per-doc
    map-only signals, so ONE fused content scan computes the three
    (reusing the component kernels ``docs_text.quality_stage`` /
    ``decon_hits`` / ``sha256_hex`` verbatim — the standalone operators
    stay byte-identical) instead of three separate passes over the
    corpus text; the MinHash-cluster subtree and the prior-snapshot
    side (semantically a DIFFERENT input table in production) keep
    their own scans."""
    import pyarrow as pa

    from ontology_matcher_ray.functions.hashing import sha256_hex
    from ontology_matcher_ray.pipelines import docs_text
    from ontology_matcher_ray.pipelines.docs_text import (
        quality_stage,
        read_documents,
    )
    from ontology_matcher_ray.stages import exchange

    cl = docs_text.dedup_clusters(sf_dir)
    ngrams = decon_ngrams(sf_dir)

    def fused(t: pa.Table) -> pd.DataFrame:
        q = quality_stage(t)
        text = pd.Series(
            t["text"].to_pandas(), dtype=object).astype(str)
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy().astype("int64"),
            "quality_band": q["quality_band"].to_pandas().to_numpy(),
            "contaminated": decon_hits(text, ngrams).astype(np.int64),
            "h": sha256_hex(text).to_numpy(),
        })

    flags = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        fused, batch_format="pyarrow")

    # in_prior: LEFT join against the prior snapshot's distinct hashes
    prior = docs_text.prior_snapshot_hashes(sf_dir, num_partitions)
    withprior = exchange.hash_join(
        flags, prior, "h", "ph",
        {"doc_id": "int64", "quality_band": "object",
         "contaminated": "int64", "h": "object"},
        {"ph": "object", "in_prior": "int64"},
        how="left", num_partitions=num_partitions,
    )

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "quality_band": b["quality_band"].to_numpy(),
            "contaminated": b["contaminated"].astype("int64").to_numpy(),
            "in_prior": b["in_prior"].fillna(0).astype("int64").to_numpy(),
        })

    flags_full = withprior.map_batches(fin, batch_format="pandas")

    j3 = exchange.multi_join(
        cl, {"doc_id": "int64", "cluster_id": "int64", "keep": "bool"},
        "doc_id",
        [
            (flags_full, "doc_id",
             {"doc_id": "int64", "quality_band": "object",
              "contaminated": "int64", "in_prior": "int64"},
             "inner"),
        ],
        num_partitions=num_partitions,
    )

    def decide(b: pd.DataFrame) -> pd.DataFrame:
        keep, reason = curation_decision(b)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "curate_keep": keep,
            "drop_reason": reason,
        })

    return j3.map_batches(decide, batch_format="pandas")


def curation_decision(b: pd.DataFrame):
    """(curate_keep, drop_reason) numpy arrays from a frame carrying the
    four component flags ``keep`` / ``quality_band`` / ``contaminated`` /
    ``in_prior`` — the single precedence definition, shared by
    ``curate_decisions`` and ``composite.dedup_assignments`` (which
    already holds keep/in_prior from its own join chain and must not
    recompute the clustering and prior-snapshot subtrees)."""
    near = ~b["keep"].astype(bool).to_numpy()
    lowq = (b["quality_band"] == "low").to_numpy()
    cont = (b["contaminated"].astype("int64") == 1).to_numpy()
    prior = (b["in_prior"].astype("int64") == 1).to_numpy()
    reason = np.select(
        [near, lowq, cont, prior],
        ["near_dup", "low_quality", "contaminated", "in_prior"],
        default="",
    )
    return ~(near | lowq | cont | prior), reason.astype(object)


def curate_text(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """The curated training corpus itself: survivors of
    ``curate_decisions`` joined against the PII-scrubbed text —
    (doc_id, clean_text, n_emails, n_phones), ready for ``doc_pack``.
    The decision side ships only (doc_id) keys into the semi join; text
    rides the scrub side untouched."""
    from ontology_matcher_ray.stages import exchange

    kept = curate_decisions(sf_dir, num_partitions).map_batches(
        lambda b: b.loc[b["curate_keep"], ["doc_id"]], batch_format="pandas"
    )
    scrub = pii_scrub(sf_dir)
    return exchange.hash_join(
        scrub, kept, "doc_id", "doc_id",
        {"doc_id": "int64", "clean_text": "object",
         "n_emails": "int64", "n_phones": "int64"},
        {"doc_id": "int64"},
        how="semi",
        num_partitions=num_partitions,
    )


MIXTURE_CAP_MICRO = 300_000  # default per-language share cap (30%)


def mixture_weights_from_stats(ls: pd.DataFrame,
                               cap_micro: int = MIXTURE_CAP_MICRO) -> pd.DataFrame:
    """Capped, renormalized per-language sampling weights from a
    ``lang_stats`` aggregate — the data-mixing step of a multilingual
    training pipeline (cap the dominant language's share, renormalize
    the rest up; cf. the sampling-temperature / cap schemes of
    multilingual LM data recipes).

    Integer-exact: ``share_micro = tokens * 1e6 // total`` (floor),
    ``capped_micro = min(share, cap)``, ``weight_micro = capped * 1e6 //
    sum(capped)``.  Runs on the DRIVER over the per-language aggregate —
    legitimately bounded (the language domain is fixed and tiny at any
    corpus size) — with arbitrary-precision Python ints, so the
    ``tokens * 1e6`` intermediate cannot overflow int64 even at 100-TB
    token counts (the distributed part is lang_stats itself)."""
    if cap_micro <= 0:
        raise ValueError(f"cap_micro must be > 0, got {cap_micro}")
    toks = [int(x) for x in ls["total_tokens"]]
    total = max(sum(toks), 1)
    share = [t * 1_000_000 // total for t in toks]
    capped = [min(s, int(cap_micro)) for s in share]
    ct = max(sum(capped), 1)
    weight = [c * 1_000_000 // ct for c in capped]
    return pd.DataFrame({
        "lang": ls["lang"].to_numpy(),
        "share_micro": pd.Series(share, dtype="int64"),
        "capped_micro": pd.Series(capped, dtype="int64"),
        "weight_micro": pd.Series(weight, dtype="int64"),
    })


def mixture_weights(sf_dir: str,
                    cap_micro: int = MIXTURE_CAP_MICRO) -> pd.DataFrame:
    """Per-language training-mixture sampling weights over the corpus
    (distributed ``lang_stats`` two-phase aggregate -> driver-side
    integer normalization over the bounded language table)."""
    from ontology_matcher_ray.pipelines.docs_text import lang_stats

    return mixture_weights_from_stats(lang_stats(sf_dir).to_pandas(),
                                      cap_micro)


QUALITY_RANK = {"low": 0, "medium": 1, "high": 2}


def quality_priority_keep(g: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster quality-priority survivor selection — the curation
    variant that keeps the HIGHEST-QUALITY member of each near-dup
    cluster rather than the min-id one (ties break to the smaller
    doc_id, so the choice is deterministic).  Runs as the per-partition
    kernel of a cluster_id exchange: a cluster's rows are co-located by
    construction, so the argmax is local.  Adds ``keep_best_quality``;
    every input column passes through."""
    out = g.copy()
    if not len(g):
        out["keep_best_quality"] = np.zeros(0, dtype=bool)
        return out
    rank = (g["quality_band"].map(QUALITY_RANK).fillna(0)
            .to_numpy(dtype=np.int64))
    order = np.lexsort((g["doc_id"].to_numpy(dtype=np.int64), -rank,
                        g["cluster_id"].to_numpy(dtype=np.int64)))
    sorted_cl = g["cluster_id"].to_numpy(dtype=np.int64)[order]
    first = np.empty(len(g), dtype=bool)
    first[0] = True
    first[1:] = sorted_cl[1:] != sorted_cl[:-1]
    keep = np.zeros(len(g), dtype=bool)
    keep[order] = first
    out["keep_best_quality"] = keep
    return out


# Fixed retrieval query for the driver-checked BM25 surface: five terms
# from the sf vocabulary + one guaranteed-OOV term (df = 0 exercises the
# idf upper branch).  A production caller passes its own terms.
BM25_QUERY = ("merge", "join", "window", "spark", "customer", "zzzoov")


def bm25_scores(
    sf_dir: str,
    query_terms: tuple = BM25_QUERY,
    k1: float = 1.2,
    b: float = 0.75,
    batch_size: int | None = None,
) -> rd.Dataset:
    """(doc_id, bm25_micro): Okapi BM25 relevance of every document to a
    fixed query — the lexical-retrieval scorer (Robertson & Zaragoza
    2009, the Lucene ``+1`` idf variant so scores are never negative)
    a training pipeline uses to mine corpus documents relevant to a
    target task.

    Determinism contract: the per-(doc, term) contribution is quantized
    to integer micro-units ``floor(1e6 * idf * tf*(k1+1) / (tf + k1*(1
    - b + b*dl*N/T)))`` BEFORE the per-doc summation, so the int64 doc
    score is order-independent under any partitioning and the SQL
    oracle recomputes the identical double expression term for term
    (the lm_perplexity convention).

    Shape: pass 1 is a per-batch combiner of the global statistics —
    per-query-term document frequencies plus (N, T) — reduced on the
    driver via ``small_grouped_agg`` (bounded: blocks x (|terms| + 1)
    rows; |terms| is a handful).  Pass 2 is SHUFFLE-FREE: the scalar
    stats ride the task closure, tokenization is one
    ``pc.split_pattern`` and tf per term one vectorized equality +
    ``np.add.reduceat`` over the list offsets.  Document text never
    shuffles; streams at any corpus size.
    """
    import pyarrow.compute as pc

    from ontology_matcher_ray.pipelines.docs_text import read_documents

    terms = list(query_terms)
    if len(set(terms)) != len(terms) or not terms:
        raise ValueError("query_terms must be non-empty and distinct")

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def _tok(t: pa.Table):
        la = pc.split_pattern(
            pc.cast(t["text"].combine_chunks(), pa.string()), " ")
        offs = la.offsets.to_numpy()
        return la, offs, np.diff(offs).astype(np.int64)

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        la, offs, dl = _tok(t)
        flat = la.flatten()
        rows = [("", np.int64(len(dl)), dl.sum())]   # (N, T) carrier row
        for q in terms:
            eq = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            tf = np.add.reduceat(eq.astype(np.int64), offs[:-1]) \
                if len(dl) else np.zeros(0, np.int64)
            rows.append((q, np.int64((tf > 0).sum()), np.int64(0)))
        return pd.DataFrame(rows, columns=["term", "a", "b"])

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    g = exchange.small_grouped_agg(
        parts, ["term"], lambda gb: gb.agg(a=("a", "sum"), b=("b", "sum")))
    carrier = g[g["term"] == ""]
    n_docs = int(carrier["a"].iloc[0])
    total_tokens = int(carrier["b"].iloc[0])
    df_map = dict(zip(g["term"], g["a"]))
    dfs = {q: int(df_map.get(q, 0)) for q in terms}

    def score(t: pa.Table) -> pd.DataFrame:
        la, offs, dl = _tok(t)
        flat = la.flatten()
        dlf = dl.astype(np.float64)
        total = np.zeros(len(dl), dtype=np.int64)
        # same literal double expression as the SQL oracle, floored per
        # (doc, term) — tf = 0 contributes an exact 0
        den_base = dlf * n_docs / total_tokens * b
        for q in terms:
            eq = pc.equal(flat, q).to_numpy(zero_copy_only=False)
            tf = (np.add.reduceat(eq.astype(np.int64), offs[:-1])
                  if len(dl) else np.zeros(0, np.int64)).astype(np.float64)
            idf = np.log((n_docs - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            s = np.floor(1e6 * idf * (tf * (k1 + 1.0))
                         / (tf + k1 * ((1.0 - b) + den_base)))
            total += s.astype(np.int64)
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "bm25_micro": total,
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def source_kl(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """(source, n_tokens, kl_micro): per-source token-distribution shift
    vs the whole corpus — the KL(source ‖ corpus) diagnostic a
    data-mixing pipeline uses to see which domain drifts furthest from
    the mixture (the DoReMi-style domain-weighting signal).

    Integer determinism (the lm_perplexity convention): with
    L(x) = floor(1e6 * ln(x)) on integer arguments, each token's
    contribution is ``c_st * (L(c_st * T) - L(T_s * c_t))`` — the
    micro-nat log-likelihood ratio ln(p_s(t)/p(t)) quantized BEFORE the
    per-source sum, so the int64 total is order-independent and
    bit-exactly SQL-recomputable; the output divides by T_s (floor) for
    the per-token average.  ln sees c*T as a double — exact below 2^53
    (~9e15 token-count product; document-scale corpora cross that only
    past ~10^8 tokens per cell, where the 0.1-micro-nat quantization
    error is far below the signal anyway).

    Shape: a tiny per-source token-total pre-pass (combiner +
    ``small_grouped_agg``, bounded by blocks x |sources|), then ONE
    token-keyed exchange of per-batch (source, token, c) partials whose
    partition kernel computes the global token count locally (the token
    is co-located) and PRE-SUMS per source — the vocabulary never
    reaches the driver; the finalize is |partitions| x |sources| rows.
    """
    import pyarrow.compute as pc

    from ontology_matcher_ray.pipelines.docs_text import read_documents

    ds = read_documents(sf_dir, columns=["source", "text"])

    def tok_partial(t: pa.Table) -> pd.DataFrame:
        la = pc.split_pattern(
            pc.cast(t["text"].combine_chunks(), pa.string()), " ")
        offs = la.offsets.to_numpy()
        n_tok = np.diff(offs).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        f = pd.DataFrame({
            "source": np.repeat(src, n_tok),
            "token": la.flatten().to_numpy(zero_copy_only=False),
            "c": np.int64(1),
        })
        return (f.groupby(["source", "token"], sort=False)
                 .agg(c=("c", "sum")).reset_index())

    partials = ds.map_batches(tok_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    totals = exchange.small_grouped_agg(
        partials.map_batches(
            lambda b: b.groupby("source", sort=False)
                       .agg(n=("c", "sum")).reset_index(),
            batch_format="pandas"),
        ["source"], lambda gb: gb.agg(n=("n", "sum")))
    t_src = dict(zip(totals["source"], totals["n"].astype("int64")))
    t_all = int(totals["n"].sum())

    def _L(x: np.ndarray) -> np.ndarray:
        return np.floor(1e6 * np.log(x.astype(np.float64))).astype(np.int64)

    def per_token(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["source", "token"], sort=False)
              .agg(c=("c", "sum")).reset_index())
        ctot = g.groupby("token", sort=False)["c"].transform("sum")
        c = g["c"].to_numpy(np.int64)
        ts = g["source"].map(t_src).to_numpy(np.int64)
        contrib = c * (_L(c * t_all) - _L(ts * ctot.to_numpy(np.int64)))
        return (pd.DataFrame({"source": g["source"], "s": contrib})
                .groupby("source", sort=False)
                .agg(s=("s", "sum")).reset_index())

    part_sums = exchange.partitioned_apply(partials, ["token"], per_token,
                                           num_partitions)
    out = exchange.small_grouped_agg(
        part_sums, ["source"], lambda gb: gb.agg(s=("s", "sum")))
    out["n_tokens"] = out["source"].map(t_src).astype("int64")
    out["kl_micro"] = (out["s"] // out["n_tokens"]).astype("int64")
    return (out[["source", "n_tokens", "kl_micro"]]
            .sort_values("source", ignore_index=True))


def embedding_centroids(sf_dir: str, group: str = "lang",
                        num_partitions: int = 8) -> pd.DataFrame:
    """(group, dim, centroid_micro, n): per-group mean embedding — the
    class-prototype / cluster-summary aggregate (semantic profile per
    language or source, seed centroids for IVF-style indexes).

    Determinism contract: each value is quantized to
    ``floor(x * 1e6)`` (the embedding_quantize convention) BEFORE the
    int64 sum, so partial sums merge order-independently and the
    centroid ``sum // n`` is bit-exactly SQL-recomputable — no float
    accumulation anywhere.

    Shape: embeddings ⋈ documents on vec_id = doc_id through the
    distributed ``exchange.hash_join`` (both sides are corpus-sized —
    no broadcast), then a per-batch (group, dim) combiner collapses
    each batch to |groups| x dim rows and ``small_grouped_agg``
    finalizes (bounded: blocks x groups x dim).  Vector payloads never
    shuffle twice: the join moves them once, the combiner reduces
    in place.
    """
    from ontology_matcher_ray.pipelines.docs_text import (
        read_documents,
        read_embeddings,
    )

    # vectors ride the exchange as fixed-width float64 BYTES: a raw
    # list<float> column arrives as an object ndarray of ndarrays, which
    # Arrow's tensor-extension cast rejects inside the padded join union
    emb = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        lambda b: pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64"),
            "emb_b": [np.asarray(v, dtype=np.float64).tobytes()
                      for v in b["embedding"]],
        }),
        batch_format="pandas",
    )
    docs = read_documents(sf_dir, columns=["doc_id", group])
    joined = exchange.hash_join(
        emb, docs, "vec_id", "doc_id",
        {"vec_id": "int64", "emb_b": "object"},
        {"doc_id": "int64", group: "object"},
        num_partitions=num_partitions,
    )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({group: pd.Series(dtype=object),
                                 "dim": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        mat = np.stack([np.frombuffer(x, dtype=np.float64)
                        for x in b["emb_b"]])
        q = np.floor(mat * 1e6).astype(np.int64)          # (n, dim)
        codes, uniq = pd.factorize(b[group])
        dim = q.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, codes, q)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({
            group: np.repeat(np.asarray(uniq, dtype=object), dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           len(uniq)),
            "s": sums.reshape(-1),
            "n": np.repeat(counts, dim),
        })

    parts = joined.map_batches(combine, batch_format="pandas")
    out = exchange.small_grouped_agg(
        parts, [group, "dim"],
        lambda gb: gb.agg(s=("s", "sum"), n=("n", "sum")))
    # truncating division (toward zero) — DuckDB's BIGINT `//`; numpy's
    # floor_divide would differ by 1 on negative sums
    a = out["s"].to_numpy(np.int64)
    nn = np.maximum(out["n"].to_numpy(np.int64), 1)
    out["centroid_micro"] = (np.sign(a) * (np.abs(a) // nn)).astype("int64")
    out["n"] = out["n"].astype("int64")
    return (out[[group, "dim", "centroid_micro", "n"]]
            .sort_values([group, "dim"], ignore_index=True))


# --------------------------------------------------------------------------
# RAG-style document chunking (fixed token windows with overlap)
# --------------------------------------------------------------------------

CHUNK_WINDOW = 64          # tokens per chunk
CHUNK_STRIDE = 48          # window start step (overlap = WINDOW - STRIDE)
CHUNK_FP_MOD = 1 << 53     # per-chunk hash domain: sums of corpus-sized
                           # chunk counts stay far inside int64


def _chunk_arrays(t: pa.Table, window: int, stride: int):
    """Vectorized chunk derivation for one Arrow batch of whole documents.

    Returns ``(doc_pos, chunk_idx, start_tok, n_chunk_tokens, chunk_text)``
    where ``doc_pos`` indexes rows of ``t``.  Pure Arrow/numpy — one
    ``split_pattern`` over the zero-copy string column, ragged-range
    gather indices built arithmetically (no per-row Python), chunk text
    re-joined with ``pc.binary_join`` on the taken token slices.

    Convention (mirrored exactly by the SQL oracle): whitespace tokens
    via single-space split (``''.split(' ') == ['']``, so every doc has
    >= 1 token and therefore >= 1 chunk); chunk ``i`` covers tokens
    ``[i*stride, min(i*stride + window, n))``; starts are
    ``range(0, n, stride)`` — a trailing window shorter than ``window``
    is emitted as-is, like standard RAG splitters.
    """
    import pyarrow.compute as pc

    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(pc.cast(text, pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets).astype(np.int64)
    flat = toks.values
    n = np.diff(offsets)                                  # tokens per doc
    n_chunks = (n + stride - 1) // stride                 # >= 1 (n >= 1)
    doc_pos = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    excl = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
        excl, n_chunks
    )
    start = chunk_idx * stride
    clen = np.minimum(window, n[doc_pos] - start)
    # ragged ranges: token j of chunk c reads flat[doc_off + start + j]
    tok_excl = np.concatenate(([0], np.cumsum(clen)[:-1]))
    gather = np.arange(int(clen.sum()), dtype=np.int64) + np.repeat(
        offsets[:-1][doc_pos] + start - tok_excl, clen
    )
    taken = flat.take(pa.array(gather, pa.int64()))
    chunk_off = pa.array(
        np.concatenate(([0], np.cumsum(clen))).astype(np.int32)
    )
    chunk_text = pc.binary_join(
        pa.ListArray.from_arrays(chunk_off, taken), pa.scalar(" ")
    )
    return doc_pos, chunk_idx, start, clen, chunk_text


def chunk_documents(
    sf_dir: str, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> rd.Dataset:
    """Split every document into overlapping fixed-token-window chunks —
    the RAG / long-context ingestion primitive (one row per chunk:
    ``doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text``).

    Shuffle-free: each document is one input row, so chunking is a pure
    per-batch map (``_chunk_arrays``) over pruned (doc_id, text) columns;
    output volume is ~``window/stride`` x corpus, streamed block-by-block
    (never materialized).  At 100 TB this is exactly the shape that
    scales: no exchange, no driver state, Arrow-native kernels.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive, got {window}/{stride}")
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = np.asarray(ids).astype(np.int64)
        doc_pos, chunk_idx, start, clen, chunk_text = _chunk_arrays(
            t, window, stride
        )
        return pa.table(
            {
                "doc_id": pa.array(ids_np[doc_pos], pa.int64()),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "n_chunk_tokens": pa.array(clen, pa.int64()),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def chunk_profile(
    sf_dir: str, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> rd.Dataset:
    """Per-document chunk count + order-sensitive chunk fingerprint:
    ``doc_id, n_rag_chunks, chunk_fp`` with
    ``chunk_fp = sum_i md5half(f"{i}:{chunk_text_i}") % 2^53`` —
    verification glue that lets the driver's one-row-per-doc
    ``doc_profile`` composite hash EVERY chunk's text and position
    (DuckDB recomputes the same sum with ``md5_number_lower``).
    Production consumers read ``chunk_documents`` directly.

    Same single pass as ``chunk_documents`` (documents are whole rows, so
    per-doc aggregation inside the batch is exact — no exchange); the
    md5 loop is bounded by chunk count and exists only for the oracle
    gate, not the production path.
    """
    from ontology_matcher_ray.functions.hashing import md5half

    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive, got {window}/{stride}")
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = np.asarray(ids).astype(np.int64)
        doc_pos, chunk_idx, _start, _clen, chunk_text = _chunk_arrays(
            t, window, stride
        )
        fp = np.fromiter(
            (
                md5half(f"{i}:{s}") % CHUNK_FP_MOD
                for i, s in zip(chunk_idx, chunk_text.to_pylist())
            ),
            dtype=np.int64,
            count=len(chunk_idx),
        )
        n_docs = len(ids_np)
        sums = np.zeros(n_docs, dtype=np.int64)
        np.add.at(sums, doc_pos, fp)
        counts = np.bincount(doc_pos, minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids_np, pa.int64()),
                "n_rag_chunks": pa.array(counts, pa.int64()),
                "chunk_fp": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Fixed-size deterministic per-group sampling (exactly-k per stratum)
# --------------------------------------------------------------------------

SAMPLE_K = 64
SAMPLE_SEED = "s7"


def sample_fixed_k(sf_dir: str, k: int = SAMPLE_K, seed: str = SAMPLE_SEED,
                   num_partitions: int = 4) -> rd.Dataset:
    """Exactly ``min(k, |group|)`` documents per language, chosen
    uniformly by a seeded hash order but fully deterministic (reshuffle =
    new seed) — the "give me 10k eval docs per language" primitive that
    rate-based sampling (``stratified_sample``) cannot express.

    Emits ``(doc_id, lang, sample_rank)`` with the 1-based rank in
    ``(md5half(f"{seed}:{doc_id}"), doc_id)`` order — the same total
    order as the SQL ``row_number()`` oracle, unsigned-compared.

    Scale shape: the classic distributed top-k — each batch keeps at
    most k rows per language it sees (a per-batch partial top-k), so the
    exchange moves O(batches x langs x k) 24-byte rows regardless of
    corpus size; the per-language finalize re-selects and ranks.  No
    global sort, no driver pass.
    """
    from ontology_matcher_ray.functions.hashing import md5half

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ds = read_documents(sf_dir, columns=["doc_id", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        h = np.fromiter((md5half(f"{seed}:{d}") for d in ids),
                        dtype=np.uint64, count=len(b))
        f = pd.DataFrame({"doc_id": ids.to_numpy(np.int64),
                          "lang": b["lang"], "h": h})
        f = f.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return f.groupby("lang", sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        g = g.groupby("lang", sort=False).head(k).copy()
        g["sample_rank"] = (g.groupby("lang", sort=False).cumcount()
                            + 1).astype("int64")
        return g[["doc_id", "lang", "sample_rank"]]

    parts = ds.map_batches(partial, batch_format="pandas")
    return exchange.partitioned_apply(parts, ["lang"], final,
                                      num_partitions)


# --------------------------------------------------------------------------
# Embedding second-moment statistics (covariance / PCA energy)
# --------------------------------------------------------------------------

COV_Q = 1000   # floor(x * 1e3): |q| <= ~1e3 for unit-ish embeddings, so a
               # q_i*q_j product is <= 1e6 and the int64 pair sum holds
               # ~9e12 vectors of headroom — integer-exact at 100 TB


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Upper-triangle second-moment table over the embedding matrix:
    ``(i, j, n, s_x, s_y, s_xy)`` for ``1 <= i <= j <= d`` with every
    value quantized ``floor(x * 1e3)`` BEFORE accumulation — the sums
    are order-independent int64, so the result is bit-stable under any
    partitioning and exactly SQL-recomputable.  Covariance, correlation
    or PCA derive from the table downstream (``embedding_pca``).

    Scale shape: each batch reduces to one d x d int64 Gram partial
    (``q.T @ q`` — vectorized, no per-row Python) plus column sums; the
    exchange then moves only d*(d+1)/2 bounded keys per batch
    (d=64 -> 2080 rows), never vectors.  The finalize is a driver frame
    of the same bounded size.
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_embeddings(sf_dir, columns=["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b["embedding"].to_numpy())
        q = np.floor(mat * COV_Q).astype(np.int64)          # (n, d)
        d = q.shape[1]
        gram = q.T @ q                                      # (d, d) int64
        colsum = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({
            "i": (iu + 1).astype("int64"), "j": (ju + 1).astype("int64"),
            "n": np.int64(len(q)),
            "s_x": colsum[iu], "s_y": colsum[ju],
            "s_xy": gram[iu, ju],
        })

    parts = ds.map_batches(partial, batch_format="pandas")
    out = exchange.small_grouped_agg(
        parts, ["i", "j"],
        lambda gb: gb.agg(n=("n", "sum"), s_x=("s_x", "sum"),
                          s_y=("s_y", "sum"), s_xy=("s_xy", "sum")))
    for c in ("i", "j", "n", "s_x", "s_y", "s_xy"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["i", "j"], ignore_index=True)


def embedding_pca(sf_dir: str, top: int = 8) -> pd.DataFrame:
    """Explained-variance spectrum of the embedding matrix: the top
    eigenvalues of the covariance derived from ``embedding_covariance``'s
    integer-exact moment table (the distributed part), eigendecomposed
    on the driver (a bounded d x d symmetric problem — d=64 floats, not
    data-scale work).  Emits ``(component, eigenvalue, explained_ratio)``
    in descending order.  Float enters ONLY here, after all cross-worker
    accumulation is integer."""
    mom = embedding_covariance(sf_dir)
    d = int(mom["j"].max())
    n = int(mom["n"].iloc[0])
    cov = np.zeros((d, d))
    i = mom["i"].to_numpy() - 1
    j = mom["j"].to_numpy() - 1
    sxy = mom["s_xy"].to_numpy(dtype=np.float64)
    sx = mom["s_x"].to_numpy(dtype=np.float64)
    sy = mom["s_y"].to_numpy(dtype=np.float64)
    c = (sxy / n - (sx / n) * (sy / n)) / (COV_Q * COV_Q)
    cov[i, j] = c
    cov[j, i] = c
    w = np.linalg.eigvalsh(cov)[::-1][:top]
    total = float(np.trace(cov))
    return pd.DataFrame({
        "component": np.arange(1, len(w) + 1, dtype=np.int64),
        "eigenvalue": w,
        "explained_ratio": w / total if total > 0 else np.zeros(len(w)),
    })

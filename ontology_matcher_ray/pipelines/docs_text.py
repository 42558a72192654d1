"""Text-analysis & dedup pipelines over the ``documents`` table.

Training-data-pipeline operators: per-doc stats/quality, token frequency,
language stats, fingerprints, exact/near dedup, plus ANN over
``embeddings``.  Every function takes ``sf_dir`` and returns a lazy
Dataset (or a small pandas frame for top-k results); Ray is initialised by
the caller.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ontology_matcher_ray.functions.text import (
    doc_stats_frame,
    guess_lang,
    rolling_fingerprint,
)
from ontology_matcher_ray.stages import dedup as dedup_stages
from ontology_matcher_ray.stages import ann as ann_stages


def read_documents(sf_dir: str, columns=None) -> rd.Dataset:
    from ontology_matcher_ray.sources.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def read_embeddings(sf_dir: str, columns=None) -> rd.Dataset:
    from ontology_matcher_ray.sources.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


def doc_stats(sf_dir: str) -> rd.Dataset:
    """Per-document token/quality stats — Arrow-native, no shuffle.

    Zero-copy pyarrow batches end-to-end: tokenization via
    ``pc.split_pattern``, per-doc distinct/stopword counts via Arrow hash
    aggregation over (list_parent_indices, token), and the micro-unit
    ratio algebra in integer Arrow kernels — no Arrow->pandas string copy
    anywhere (the pandas kernel ``functions/text.doc_stats_frame`` remains
    as the per-cell reference implementation for unit tests).
    """
    ds = read_documents(sf_dir, columns=["doc_id", "lang", "text"])
    return ds.map_batches(stats_stage, batch_format="pyarrow",
                          zero_copy_batch=True)


_STOP_ARR = None


def stats_stage(t: pa.Table) -> pa.Table:
    """Per-batch doc-stats kernel (module-level so fused scans —
    ``composite.doc_profile`` — reuse the EXACT micro-unit algebra)."""
    import pyarrow.compute as pc

    from ontology_matcher_ray.functions.text import EN_STOPWORDS

    global _STOP_ARR
    if _STOP_ARR is None:
        _STOP_ARR = pa.array(sorted(EN_STOPWORDS), pa.string())
    stop_arr = _STOP_ARR
    text = pc.cast(t["text"], pa.string())
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    per_tok = pa.table(
        {
            "p": parent,
            "tok": flat,
            "is_stop": pc.cast(pc.is_in(flat, value_set=stop_arr), pa.int64()),
        }
    )
    agg = per_tok.group_by("p").aggregate(
        [("tok", "count_distinct"), ("is_stop", "sum")]
    ).sort_by("p")                       # every row has >= 1 token
    n_distinct = pc.cast(agg["tok_count_distinct"], pa.int64())
    n_stop = pc.cast(agg["is_stop_sum"], pa.int64())
    denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    mil = pa.scalar(1_000_000, pa.int64())
    stop_ratio = pc.divide(pc.multiply(n_stop, mil), denom)
    avg_tok_len = pc.divide(
        pc.multiply(pc.subtract(n_chars, pc.subtract(n_tokens, pa.scalar(1, pa.int64()))), mil),
        denom,
    )
    quality = pc.add(
        pc.divide(pc.multiply(n_distinct, pa.scalar(500_000, pa.int64())), denom),
        pc.divide(pc.subtract(mil, stop_ratio), pa.scalar(2, pa.int64())),
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct,
            "n_chars": n_chars,
            "stopword_ratio_micro": stop_ratio,
            "avg_token_len_micro": avg_tok_len,
            "quality_micro": quality,
        }
    )


def lang_stats(sf_dir: str) -> rd.Dataset:
    """Per-language aggregate: docs, tokens, mean quality (2-phase)."""
    ds = doc_stats(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", sort=False).agg(
            n_docs=("doc_id", "size"),
            total_tokens=("n_tokens", "sum"),
            quality_sum=("quality_micro", "sum"),
        )
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    from ontology_matcher_ray.stages import exchange

    def agg(gb) -> pd.DataFrame:
        return gb.agg(
            n_docs=("n_docs", "sum"),
            total_tokens=("total_tokens", "sum"),
            quality_sum=("quality_sum", "sum"),
        )

    out = exchange.grouped_agg(partials, ["lang"], agg, num_partitions=8)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # integer micro-units: exact under any partial-sum order
        b["avg_quality_micro"] = (b["quality_sum"] // b["n_docs"]).astype("int64")
        return b.drop(columns=["quality_sum"])

    return out.map_batches(finish, batch_format="pandas")


# the documents table's language domain (stable across every sf); shared
# with the oracle's conditional-aggregation SQL so pivot columns and the
# recomputation can never drift apart
PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def source_lang_matrix(sf_dir: str) -> rd.Dataset:
    """Pivot (wide aggregate): one row per source, one count column per
    language.  Per-block combiner collapses to (source, lang, cnt) — at
    most |sources| x |langs| rows per block — one exchange on source,
    then a vectorized unstack per partition.  The shuffle volume is
    bounded by the category-domain product, never the document count.
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_documents(sf_dir, columns=["source", "lang"])

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["source", "lang"], sort=False)
            .size()
            .reset_index(name="cnt")
            .astype({"cnt": "int64"})
        )

    part = ds.map_batches(combine, batch_format="pandas")

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        p = (
            g.groupby(["source", "lang"], sort=False)["cnt"]
            .sum()
            .unstack(fill_value=0)
        )
        out = {"source": p.index.to_numpy()}
        for lang in PIVOT_LANGS:
            out[f"n_{lang}"] = (
                p[lang].to_numpy().astype(np.int64)
                if lang in p.columns
                else np.zeros(len(p), dtype=np.int64)
            )
        # COUNT(*) semantics: total over ALL langs present, including any
        # outside the pinned pivot domain (matches the oracle's COUNT(*))
        out["n_total"] = p.to_numpy().sum(axis=1).astype(np.int64)
        return pd.DataFrame(out)

    return exchange.partitioned_apply(part, ["source"], pivot, num_partitions=8)


ROLLUP_ALL = "*"  # sentinel for rolled-up levels; shared with the oracle


def doc_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING-SETS-shaped rollup in ONE pass: document counts at
    (lang, source), (lang, *) and (*, *) levels.  The per-block combiner
    emits all three levels (3 x |lang|x|source| rows per block max), so a
    single exchange finalizes every level — no second aggregation job per
    level.
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_documents(sf_dir, columns=["lang", "source"])

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        fine = (
            b.groupby(["lang", "source"], sort=False)
            .size()
            .reset_index(name="n_docs")
        )
        mid = fine.groupby("lang", sort=False)["n_docs"].sum().reset_index()
        mid["source"] = ROLLUP_ALL
        top = pd.DataFrame(
            {"lang": [ROLLUP_ALL], "source": [ROLLUP_ALL],
             "n_docs": [int(fine["n_docs"].sum())]}
        )
        out = pd.concat([fine, mid[["lang", "source", "n_docs"]], top],
                        ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    part = ds.map_batches(combine, batch_format="pandas")
    # <= |langs+1| x |sources+1| groups: bounded driver reduce
    return exchange.small_grouped_agg(part, ["lang", "source"], lambda g: g.sum())


def token_freq(sf_dir: str) -> rd.Dataset:
    """Global token frequencies (combiner inside map_batches, tiny groupby).

    The per-batch combiner is Arrow-native (split -> list_flatten ->
    value_counts on zero-copy batches); only the small combined partials
    go through the pandas exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_documents(sf_dir, columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(_flat_tokens(t, "text"))
        return pa.table(
            {"token": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from ontology_matcher_ray.stages import exchange

    return exchange.grouped_agg(
        partials, ["token"], lambda gb: gb.agg(n=("n", "sum")), num_partitions=8
    )


def top_tokens_per_lang(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Grouped top-k: the k most frequent tokens per language.

    Classic wide-op composition: Arrow-native per-batch (lang, token)
    combiner -> hash-partition exchange summing counts per key -> second
    (cheap) exchange on lang alone for the per-group top-k (sort + head
    per partition; ties broken by token asc for determinism).
    Emits (lang, token, n, rank).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_documents(sf_dir, columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t["text"], pa.string()), " ")
        per = pa.table({
            "lang": pc.take(t["lang"].combine_chunks(), pc.list_parent_indices(toks)),
            "token": pc.list_flatten(toks),
        })
        agg = per.group_by(["lang", "token"]).aggregate([("token", "count")])
        return pa.table({"lang": agg["lang"], "token": agg["token"],
                         "n": pc.cast(agg["token_count"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from ontology_matcher_ray.stages import exchange

    counts = exchange.grouped_agg(
        partials, ["lang", "token"], lambda gb: gb.agg(n=("n", "sum")), 16
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True], ignore_index=True)
        out = g.groupby("lang", sort=False).head(k).copy()
        out["rank"] = out.groupby("lang", sort=False).cumcount() + 1
        return out

    return exchange.partitioned_apply(counts, ["lang"], topk, 8)


def _flat_tokens(t: pa.Table, col: str):
    """THE whitespace tokenization (one definition shared by token_freq,
    heavy_hitters pass 1 and pass 2 — and mirrored by every SQL oracle's
    ``unnest(str_split(text, ' '))``): flattened zero-copy Arrow array
    of every token occurrence."""
    import pyarrow.compute as pc

    return pc.list_flatten(pc.split_pattern(pc.cast(t[col], pa.string()), " "))


def _mg_keep(counts: np.ndarray, k: int):
    """(keep mask, decrement) of the Misra-Gries compress: decrement
    every counter by the (k+1)-th largest and drop the non-positive,
    leaving at most k survivors.  Each compress undercounts a surviving
    token by at most its decrement; over any merge tree the total
    undercount is bounded by N/(k+1) (Agarwal et al., "Mergeable
    Summaries", PODS 2012)."""
    if len(counts) <= k:
        return np.ones(len(counts), dtype=bool), 0
    d = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    return counts > d, int(d)


def _mg_compress(tokens: np.ndarray, counts: np.ndarray, k: int):
    keep, d = _mg_keep(counts, k)
    return tokens[keep], counts[keep] - d


def heavy_hitters(
    make_ds,
    text_col: str = "text",
    phi_micro: int = 2000,
    k_counters: int = 2048,
    num_partitions: int = 4,
) -> rd.Dataset:
    """Frequent tokens — exact count >= ceil(N * phi) where N is the
    total token count — via the two-pass mergeable Misra-Gries sketch
    (Misra & Gries 1982; merge bound from Agarwal et al., PODS 2012;
    both public).  ``make_ds`` is a zero-arg factory returning the input
    Dataset (the corpus is scanned twice, once per pass).

      pass 1: per-batch exact Arrow value_counts MG-compressed to
              ``k_counters`` rows (plus one total-count row), a 64k-row
              recombine stage (sum + re-compress) so the driver reduce
              sees O(#batches/32 x k) rows, then a bounded driver merge
              producing the candidate set (<= k tokens) and exact N.
      pass 2: exact per-batch counts of CANDIDATES only (``is_in``
              filter on zero-copy Arrow), a <= k-row exchange, and the
              threshold filter.

    The MG guarantee (total undercount <= N/(k+1)) means every token
    with true count >= ceil(N*phi) survives pass 1 whenever
    phi > 1/(k+1) (validated).  Pass 2's exact recount filters away the
    sketch's merge-order-dependent EXTRAS, so the OUTPUT is a pure
    function of the data — deterministic under any partitioning and
    verified value-for-value against SQL.  Unlike ``token_freq``, the
    full vocabulary never shuffles: per batch, at most k candidate rows
    move.  Emits (token, n) with n exact."""
    import pyarrow.compute as pc

    if phi_micro * (k_counters + 1) <= 1_000_000:
        raise ValueError(
            "heavy_hitters: need phi > 1/(k+1) for the MG survival "
            f"guarantee (phi_micro={phi_micro}, k_counters={k_counters})"
        )
    k = int(k_counters)

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(_flat_tokens(t, text_col))
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(cnts.sum())
        # keep/decrement decided on the COUNTS array alone; only the
        # <= k surviving tokens ever leave Arrow (no per-token Python
        # string materialization of the whole batch vocabulary)
        keep, d = _mg_keep(cnts, k)
        toks = pc.cast(vc.field("values").filter(pa.array(keep)), pa.string())
        cnts = cnts[keep] - d
        return pa.table({
            "token": pa.concat_arrays(
                [toks, pa.array([""], type=pa.string())]),
            "n": pa.array(np.append(cnts, total), type=pa.int64()),
            # sentinel flag, NOT a sentinel token: "" is a legal token
            # (double spaces split to empty strings)
            "is_total": pa.array([False] * len(cnts) + [True]),
        })

    def recombine(b: pd.DataFrame) -> pd.DataFrame:
        total = int(b.loc[b["is_total"], "n"].sum())
        mg = (b.loc[~b["is_total"]]
              .groupby("token", sort=False)["n"].sum())
        toks, cnts = _mg_compress(
            mg.index.to_numpy(dtype=object), mg.to_numpy(np.int64), k)
        return pd.DataFrame({
            "token": np.append(toks, [""]).astype(object),
            "n": np.append(cnts, [total]).astype(np.int64),
            "is_total": [False] * len(toks) + [True],
        })

    sketch = (
        make_ds()
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(recombine, batch_format="pandas", batch_size=65536)
        .to_pandas()
    )
    # an empty corpus yields zero batches, i.e. a columnless frame
    n_total = (int(sketch.loc[sketch["is_total"], "n"].sum())
               if "is_total" in sketch.columns else 0)
    if n_total == 0:
        # from_arrow keeps the typed schema on zero rows (from_pandas of
        # an empty frame surfaces a columnless dataset)
        return rd.from_arrow(pa.table({
            "token": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }))
    merged = (sketch.loc[~sketch["is_total"]]
              .groupby("token", sort=False)["n"].sum())
    cand_toks, _ = _mg_compress(
        merged.index.to_numpy(dtype=object), merged.to_numpy(np.int64), k)
    candidates = pa.array(sorted(cand_toks), type=pa.string())
    threshold = (n_total * phi_micro + 999_999) // 1_000_000

    def recount(t: pa.Table) -> pa.Table:
        flat = _flat_tokens(t, text_col)
        hits = flat.filter(pc.is_in(flat, value_set=candidates))
        vc = pc.value_counts(hits)
        return pa.table({
            "token": pc.cast(vc.field("values"), pa.string()),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ontology_matcher_ray.stages import exchange

    counts = exchange.grouped_agg(
        make_ds().map_batches(recount, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["token"], lambda gb: gb.agg(n=("n", "sum")), num_partitions,
    )
    return counts.map_batches(
        lambda b: b[b["n"] >= threshold], batch_format="pandas"
    )


def token_heavy_hitters(sf_dir: str, phi_micro: int = 2000,
                        k_counters: int = 2048) -> rd.Dataset:
    """``heavy_hitters`` over the documents table (support phi=0.2%)."""
    return heavy_hitters(
        lambda: read_documents(sf_dir, columns=["text"]),
        phi_micro=phi_micro, k_counters=k_counters,
    )


def _token_doc_pairs(sf_dir: str) -> rd.Dataset:
    """Distinct (token, doc_id) pairs, Arrow-native.  Docs sit wholly in
    one row, so per-batch distinct IS globally distinct (a pair can only
    recur inside its own document) — no dedup exchange needed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern(
            pc.cast(t["text"], pa.string()), " ").combine_chunks()
        parents = pc.list_parent_indices(lst)
        tab = pa.table({
            "token": pc.list_flatten(lst),
            "doc_id": pc.take(
                pc.cast(t["doc_id"], pa.int64()).combine_chunks(), parents),
        })
        return tab.group_by(["token", "doc_id"]).aggregate([])

    return ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def inverted_index(sf_dir: str, min_df: int = 1,
                   max_df: Optional[int] = None,
                   num_partitions: int = 16) -> rd.Dataset:
    """Postings-list build: (token, df, postings) with ``postings`` the
    comma-joined doc_id list in ascending order — the search-index /
    exact-dedup-lookup structure a corpus pipeline materializes once.

    Scale design: per-batch DISTINCT (token, doc_id) pairs are globally
    distinct for free (docs never straddle batches), so after the one
    token-keyed exchange every token's full pair group sits in exactly
    one partition — df is the LOCAL group size and the [min_df, max_df]
    band is a local filter.  One corpus scan, one exchange, no df
    pre-pass and no driver-side vocabulary.  A stopword token's
    postings land in one partition by construction; ``max_df`` is the
    knob that bounds that (drop bands you would never query), and
    ``num_partitions`` must scale with pair volume.
    """
    from ontology_matcher_ray.stages import exchange

    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_df is not None and max_df < min_df:
        raise ValueError(f"max_df {max_df} < min_df {min_df}")
    hi = np.int64(max_df if max_df is not None else 2**62)

    pair_rows = _token_doc_pairs(sf_dir).map_batches(
        lambda b: pd.DataFrame({
            "token": b["token"].astype(str),
            "doc_id": b["doc_id"].astype("int64"),
        }),
        batch_format="pandas",
    )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        agg = (g.assign(s=g["doc_id"].astype(str))
               .groupby("token", sort=False)
               .agg(df=("doc_id", "size"), postings=("s", ",".join))
               .reset_index())
        agg = agg[(agg["df"].to_numpy() >= min_df)
                  & (agg["df"].to_numpy() <= hi)]
        return agg[["token", "df", "postings"]].astype({"df": "int64"})

    return exchange.partitioned_apply(pair_rows, ["token"], build,
                                      num_partitions)


def lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language id per document (stopword-overlap scorer)."""
    ds = read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "declared_lang": b["lang"].to_numpy(),
                "guessed_lang": guess_lang(b["text"].astype(str)).to_numpy(),
            }
        )

    return ds.map_batches(stage, batch_format="pandas")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """Winnowing-style rolling-hash fingerprints per doc."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "fingerprint": rolling_fingerprint(b["text"].astype(str)).to_numpy(),
            }
        )

    return ds.map_batches(stage, batch_format="pandas")


def dedup_exact(sf_dir: str) -> rd.Dataset:
    return dedup_stages.exact_dedup(read_documents(sf_dir, columns=["doc_id", "text"]))


def dedup_jaccard_adjacent(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Exact 3-gram Jaccard for adjacent doc pairs (doc_id, doc_id+1).

    The oracle-checkable member of the near-dup family: shingle sets are
    computed per doc in map_batches, pairs are co-located by a pair-id
    exchange (each doc contributes to pairs (i-1,i) and (i,i+1)), and the
    score is integer micro-units.  The same shape scales to LSH-selected
    candidate pairs (dedup_minhash) where the pair list is data-dependent.
    """
    from ontology_matcher_ray.functions.hashing import shingles
    from ontology_matcher_ray.stages import exchange

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def shingle_rows(b: pd.DataFrame) -> pd.DataFrame:
        doc_id = b["doc_id"].astype("int64").to_numpy()
        sets = [
            sorted(set(shingles(t.split(" "), k)))
            for t in b["text"].astype(str)
        ]
        left = pd.DataFrame({"pair_id": doc_id, "doc_id": doc_id, "sh": sets})
        right = pd.DataFrame({"pair_id": doc_id - 1, "doc_id": doc_id, "sh": sets})
        out = pd.concat([left, right], ignore_index=True)
        return out[out["pair_id"] >= 0]

    pairsrc = ds.map_batches(shingle_rows, batch_format="pandas")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["a", "b", "jaccard_micro"]
        empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        if g.empty:
            return empty
        # positional alignment: 2-member pairs occupy rows 2i, 2i+1 after
        # the (pair_id, doc_id) sort; boundary pairs (last doc) drop out
        g = g.sort_values(["pair_id", "doc_id"], ignore_index=True)
        cnt = g.groupby("pair_id", sort=False)["doc_id"].transform("size")
        g = g[cnt == 2].reset_index(drop=True)
        if g.empty:
            return empty
        import itertools

        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sizes = np.fromiter((len(s) for s in g["sh"]),
                            dtype=np.int64, count=len(g))
        flat = np.fromiter(itertools.chain.from_iterable(g["sh"]),
                           dtype=object, count=int(sizes.sum()))
        ex = pd.DataFrame({"p": np.repeat(np.arange(len(g)) // 2, sizes),
                           "s": flat})
        dup = ex.groupby(["p", "s"], sort=False).size()
        inter = np.zeros(len(g) // 2, dtype=np.int64)
        hits = (dup == 2).groupby(level=0).sum()
        inter[hits.index.to_numpy()] = hits.to_numpy()
        union = sizes[0::2] + sizes[1::2] - inter
        ok = (sizes[0::2] > 0) & (sizes[1::2] > 0)
        jm = np.zeros_like(inter)
        jm[ok] = (inter[ok] * 1_000_000) // union[ok]
        return pd.DataFrame({"a": ids[0::2][ok], "b": ids[1::2][ok],
                             "jaccard_micro": jm[ok]})

    return exchange.partitioned_apply(pairsrc, ["pair_id"], per_partition, 16)


#: 61-bit Mersenne modulus: md5half % M61 fits BIGINT exactly on both
#: sides (DuckDB: md5_number_lower(g) % M61 in UBIGINT, then CAST)
_M61 = (1 << 61) - 1


def dedup_substring(sf_dir: str, k: int = 8, max_df: int = 8,
                    min_shared: int = 2, num_partitions: int = 16) -> rd.Dataset:
    """Exact duplicated-SPAN detection ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022 — substring-level
    dedup, complementing the whole-document minhash/simhash family),
    re-expressed Ray-Data-first:

    1. every k-token window of every document is hashed (md5-low-half
       mod 2^61-1, DuckDB-recomputable), DISTINCT per doc — one
       map_batches pass, document text never leaves it;
    2. a span-hash exchange groups occurrences; spans seen in more than
       ``max_df`` docs are dropped as stop-spans (boilerplate headers
       would otherwise explode pairs quadratically — the cap bounds
       per-span pair fan-out at max_df^2/2 no matter how hot the span);
    3. surviving spans seen in 2+ docs emit candidate pairs, and a
       second (a, b)-keyed exchange counts DISTINCT shared spans per
       pair (each span contributes exactly one row from its hash
       partition, so the count needs no global dedup);
    4. pairs sharing >= ``min_shared`` spans are emitted as
       (a, b, shared_spans).

    Both exchanges move only integer triples; the shuffle volume is the
    number of (span, doc) incidences, never the corpus text."""
    from ontology_matcher_ray.functions.hashing import md5half
    from ontology_matcher_ray.stages import exchange

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def span_rows(b: pd.DataFrame) -> pd.DataFrame:
        doc_out: list = []
        h_out: list = []
        for doc_id, t in zip(b["doc_id"].astype("int64"), b["text"].astype(str)):
            toks = t.split(" ")
            hs = {
                md5half(" ".join(toks[i:i + k])) % _M61
                for i in range(len(toks) - k + 1)
            }
            doc_out.extend([doc_id] * len(hs))
            h_out.extend(hs)
        return pd.DataFrame({
            "h": np.array(h_out, dtype=np.int64),
            "doc_id": np.array(doc_out, dtype=np.int64),
        })

    spans = ds.map_batches(span_rows, batch_format="pandas")

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in ("a", "b")})
        if g.empty:
            return empty
        df = g.groupby("h", sort=False)["doc_id"].transform("size")
        g = g[(df >= 2) & (df <= max_df)]
        if g.empty:
            return empty
        a_parts: list = []
        b_parts: list = []
        for _, grp in g.groupby("h", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(dtype=np.int64))
            ia, ib = np.triu_indices(len(ids), k=1)
            a_parts.append(ids[ia])
            b_parts.append(ids[ib])
        return pd.DataFrame({"a": np.concatenate(a_parts),
                             "b": np.concatenate(b_parts)})

    cand = exchange.partitioned_apply(spans, ["h"], pairs_per_partition,
                                      num_partitions)

    def count_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("a", "b", "shared_spans")})
        out = (g.groupby(["a", "b"], sort=False).size()
               .reset_index(name="shared_spans"))
        out["shared_spans"] = out["shared_spans"].astype("int64")
        return out[out["shared_spans"] >= min_shared]

    return exchange.partitioned_apply(cand, ["a", "b"], count_per_partition,
                                      num_partitions)


def prior_snapshot_hashes(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """DISTINCT content hashes of the PRIOR corpus snapshot (the
    even-``doc_id`` half — deterministic stand-in for yesterday's
    manifest), as (ph, in_prior=1) rows.  Distinct matters: a duplicated
    prior hash would fan out the left join.  Shared by
    ``dedup_incremental`` and ``docs_train.curate_decisions``."""
    from ontology_matcher_ray.functions.hashing import sha256_hex
    from ontology_matcher_ray.stages import exchange

    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def prior_rows(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"].astype("int64") % 2 == 0]
        return pd.DataFrame({
            "ph": sha256_hex(keep["text"].astype(str)).to_numpy(),
            "in_prior": np.ones(len(keep), dtype=np.int64),
        })

    return exchange.distinct(
        docs.map_batches(prior_rows, batch_format="pandas"),
        ["ph"], num_partitions,
    )


def dedup_incremental(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Continuous-ingestion exact dedup: flag each document whose content
    already exists in a PRIOR corpus snapshot.

    The 100-TB shape: a training corpus re-ingests daily; new documents
    must be deduped against yesterday's snapshot WITHOUT recomputing it.
    Both sides are corpus-scale, so no broadcast is possible — the prior
    side is reduced to DISTINCT content hashes (one exchange) and the
    incoming side LEFT-joins it on the hash through the distributed
    ``exchange.hash_join``; only (hash, flag) pairs ever shuffle, never
    document text.  Here the prior snapshot is the even-``doc_id`` half
    of the table (a deterministic stand-in — production passes a real
    prior manifest/table); output is one row per document:
    (doc_id, in_prior) with in_prior=1 iff its exact text occurs among
    the prior half (even docs trivially 1 via themselves)."""
    from ontology_matcher_ray.functions.hashing import sha256_hex
    from ontology_matcher_ray.stages import exchange

    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def hash_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "h": sha256_hex(b["text"].astype(str)).to_numpy(),
        })

    hashed = docs.map_batches(hash_rows, batch_format="pandas")

    prior = prior_snapshot_hashes(sf_dir, num_partitions)

    joined = exchange.hash_join(
        hashed, prior, "h", "ph",
        {"doc_id": "int64", "h": "object"},
        {"ph": "object", "in_prior": "int64"},
        how="left", num_partitions=num_partitions,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "in_prior": b["in_prior"].fillna(0).astype("int64").to_numpy(),
        })

    return joined.map_batches(finalize, batch_format="pandas")


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    return dedup_stages.minhash_near_dups(
        read_documents(sf_dir, columns=["doc_id", "text"]), threshold=threshold
    )


def dedup_jaccard_all(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """EXACT all-pairs 3-shingle Jaccard >= threshold via prefix
    filtering (stages/dedup.allpairs_jaccard) — every qualifying pair,
    not an LSH-recalled subset; the oracle is the full quadratic ground
    truth."""
    return dedup_stages.allpairs_jaccard(
        read_documents(sf_dir, columns=["doc_id", "text"]), threshold=threshold
    )


def dedup_clusters(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """Near-dup cluster resolution: connected components over verified
    MinHash pairs -> (doc_id, cluster_id, keep) with the min-id survivor
    per component (every doc appears; singletons keep themselves)."""
    docs = read_documents(sf_dir, columns=["doc_id", "text"])
    pairs = dedup_stages.minhash_near_dups(docs, threshold=threshold)
    ids = read_documents(sf_dir, columns=["doc_id"])
    return dedup_stages.near_dup_clusters(ids, pairs)


def dedup_simhash(sf_dir: str) -> rd.Dataset:
    return dedup_stages.simhash_buckets(read_documents(sf_dir, columns=["doc_id", "text"]))


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """Verified simhash near-dup pairs (band pigeonhole + exact hamming)."""
    return dedup_stages.simhash_pairs(
        read_documents(sf_dir, columns=["doc_id", "text"]), max_hamming=max_hamming
    )


def dedup_embedding(sf_dir: str, threshold: float = 0.4) -> rd.Dataset:
    # threshold tuned to the synthetic embeddings (random 64-dim vectors:
    # no true near-dups; 0.4 surfaces the closest-pair tail).  dim passed
    # explicitly so the pipeline stays fully lazy (no driver peek).
    return dedup_stages.embedding_near_dups(
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]),
        threshold=threshold, dim=64,
    )


def dedup_semdedup(sf_dir: str, k: int = 16, iterations: int = 4,
                   threshold: float = 0.35) -> rd.Dataset:
    """SemDeDup (k-means blocking + within-cluster cosine) near-dup pairs.

    k=16 suits the synthetic embeddings tables (500-2000 rows); at scale
    k grows with n (stages/cluster.py documents the contract).  0.35
    surfaces the within-cluster tail of the random 64-dim vectors (the
    clusters concentrate similar vectors, so the threshold sits below
    dedup_embedding's global 0.4)."""
    from ontology_matcher_ray.stages.cluster import semdedup_pairs

    return semdedup_pairs(
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]),
        k=k, iterations=iterations, threshold=threshold, dim=64,
    )


def semdedup_keep(sf_dir: str, k: int = 16, iterations: int = 4,
                  threshold: float = 0.35) -> rd.Dataset:
    """Per-vector SemDeDup pruning decision (vec_id, kmeans_cluster,
    sem_keep) — same fit/threshold defaults as ``dedup_semdedup`` so the
    keep flags are exactly 'no smaller-id partner among that query's
    pairs'."""
    from ontology_matcher_ray.stages.cluster import semdedup_assignments

    return semdedup_assignments(
        read_embeddings(sf_dir, columns=["vec_id", "embedding"]),
        k=k, iterations=iterations, threshold=threshold, dim=64,
    )


# above this row count the "dimension" side is corpus-shaped, not a
# dimension table: driver collect + per-actor probe arrays stop being
# cheap, so the join falls back to the distributed hash exchange.
# ~10^7 rows x 16B ≈ 160 MB per actor — the upper end of a sane
# broadcast; a 100-TB corpus side (10^10 rows) routes to the exchange.
BROADCAST_JOIN_MAX_ROWS = 10_000_000


def doc_embedding_join(
    sf_dir: str, broadcast_max_rows: int = BROADCAST_JOIN_MAX_ROWS
) -> rd.Dataset:
    """documents ⋈ embeddings on doc_id = vec_id, size-gated.

    The (vec_id -> label) side is COUNTED first (a metadata-cheap pruned
    count).  Below ``broadcast_max_rows`` it ships once via ``ray.put``
    and every batch of the big side probes it with a vectorized
    searchsorted — the standard pattern for joining a corpus against a
    bounded dimension table (no shuffle of either side).  Above the gate
    — embeddings here are one row per document, i.e. corpus-cardinality
    at scale — the join routes through the engine's distributed
    ``exchange.hash_join`` instead, so neither side is ever collected to
    the driver.  Emits (doc_id, lang, n_chars, label); inner semantics;
    both paths produce identical rows (tested).
    """
    import ray

    docs = read_documents(sf_dir, columns=["doc_id", "lang", "n_chars"])
    emb = read_embeddings(sf_dir, columns=["vec_id", "label"])

    if emb.count() > broadcast_max_rows:
        from ontology_matcher_ray.stages import exchange

        return exchange.hash_join(
            docs, emb, "doc_id", "vec_id",
            {"doc_id": "int64", "lang": "object", "n_chars": "int64"},
            {"vec_id": "int64", "label": "int64"},
        )

    sm = emb.to_pandas().sort_values("vec_id")
    keys = sm["vec_id"].to_numpy(dtype=np.int64)
    vals = sm["label"].to_numpy(dtype=np.int64)
    ref = ray.put((keys, vals))

    class Probe:
        def __init__(self):
            self.keys, self.vals = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b["doc_id"].to_numpy(dtype=np.int64)
            idx = np.clip(np.searchsorted(self.keys, ids), 0, len(self.keys) - 1)
            hit = self.keys[idx] == ids
            out = pd.DataFrame({
                "doc_id": ids[hit],
                "lang": b["lang"].to_numpy()[hit],
                "n_chars": b["n_chars"].to_numpy(dtype=np.int64)[hit],
                "label": self.vals[idx][hit],
            })
            return out

    return docs.map_batches(Probe, batch_format="pandas", concurrency=(1, 4))


def sample_docs(sf_dir: str, mod: int = 10) -> rd.Dataset:
    """Deterministic content-hash sampling: keep docs whose md5-low-half
    of ``text`` is 0 mod ``mod`` (~1/mod of the corpus).

    Hash-threshold sampling is the scale-correct way to sample a
    distributed corpus: no coordination, stable under any partitioning /
    re-run, and recomputable by the SQL oracle (md5_number_lower).
    Emits (doc_id, lang).
    """
    from ontology_matcher_ray.functions.hashing import md5half

    ds = read_documents(sf_dir, columns=["doc_id", "lang", "text"])

    def stage(b: pd.DataFrame) -> pa.Table:
        keep = np.fromiter(
            (md5half(t) % mod == 0 for t in b["text"].astype(str)),
            dtype=bool, count=len(b),
        )
        # typed Arrow output: a batch where the filter keeps nothing must
        # still carry the schema (size-0 object columns defeat Ray's
        # block size estimator and spam the logs)
        return pa.table({
            "doc_id": pa.array(b["doc_id"].to_numpy()[keep], pa.int64()),
            "lang": pa.array(b["lang"].to_numpy()[keep], pa.string()),
        })

    return ds.map_batches(stage, batch_format="pandas")


def _query_vectors(sf_dir: str, n_queries: int = 4):
    head = read_embeddings(sf_dir, columns=["vec_id", "embedding"]).limit(
        max(n_queries, 8)
    ).to_pandas().sort_values("vec_id").head(n_queries)
    qids = head["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    return qids, qmat


def knn_brute(sf_dir: str, top_k: int = 5, n_queries: int = 4) -> pd.DataFrame:
    """Exact cosine top-k for the first ``n_queries`` embedding rows."""
    qids, qmat = _query_vectors(sf_dir, n_queries)
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    return ann_stages.brute_force_topk(ds, qmat, qids, top_k=top_k)


def knn_lsh(sf_dir: str, top_k: int = 5, n_queries: int = 4) -> pd.DataFrame:
    """Approximate top-k via hyperplane-LSH probing (oracle-checkable)."""
    qids, qmat = _query_vectors(sf_dir, n_queries)
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    return ann_stages.lsh_topk(ds, qmat, qids, top_k=top_k)


def knn_ivf(sf_dir: str, top_k: int = 5, n_queries: int = 4) -> pd.DataFrame:
    qids, qmat = _query_vectors(sf_dir, n_queries)
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    return ann_stages.ivf_topk(ds, qmat, qids, top_k=top_k)


def knn_join(sf_dir: str, top_k: int = 3) -> "rd.Dataset":
    """Bulk IVF kNN JOIN: top-k neighbors for EVERY embedding row via
    one centroid-keyed exchange — no driver pass over the embeddings
    (see stages/ann.ivf_knn_join)."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    return ann_stages.ivf_knn_join(ds, top_k=top_k)


def doc_quality(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition/quality heuristics per document — Arrow
    hash aggregation, no shuffle, no Python row loop.

    Public heuristics from Rae et al. 2021 ("Scaling Language Models:
    ... Gopher", §A1.1 repetition filters): fraction of the most common
    token, duplicate-token fraction, duplicate-bigram fraction — plus a
    three-way ``quality_band`` a curation pipeline would filter on.
    Integer micro-unit algebra (floor division) keeps every value exactly
    recomputable by the DuckDB oracle.

    Batch-local by construction (all metrics are per-doc), so it streams
    at any corpus size.
    """
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(quality_stage, batch_format="pyarrow",
                          zero_copy_batch=True)


def quality_stage(t: pa.Table) -> pa.Table:
    """Per-batch Gopher quality kernel (module-level so fused scans —
    ``docs_train.curate_decisions`` — reuse the EXACT band definition)."""
    import pyarrow.compute as pc

    n_rows = t.num_rows
    text = pc.cast(t["text"], pa.string())
    def _one_chunk(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    toks = _one_chunk(pc.split_pattern(text, " "))
    flat = _one_chunk(pc.list_flatten(toks))
    parent = _one_chunk(pc.list_parent_indices(toks))

    # (doc, token) counts -> per-doc max / total / distinct
    tc = pa.table({"p": parent, "tok": flat}).group_by(
        ["p", "tok"]).aggregate([("tok", "count")])
    agg = tc.group_by("p").aggregate(
        [("tok_count", "max"), ("tok_count", "sum"), ("tok", "count")]
    )
    p_idx = agg["p"].to_numpy()
    mx = np.zeros(n_rows, dtype=np.int64)
    n = np.ones(n_rows, dtype=np.int64)
    nd = np.ones(n_rows, dtype=np.int64)
    mx[p_idx] = agg["tok_count_max"].to_numpy()
    n[p_idx] = agg["tok_count_sum"].to_numpy()
    nd[p_idx] = agg["tok_count"].to_numpy()

    # adjacent-token bigrams within each doc (vectorized slice+join)
    nf = len(flat)
    if nf > 1:
        lead = flat.slice(1, nf - 1)
        base = flat.slice(0, nf - 1)
        same_doc = pc.equal(parent.slice(0, nf - 1), parent.slice(1, nf - 1))
        bg = pc.binary_join_element_wise(base, lead, " ")
        bt = pa.table({"p": parent.slice(0, nf - 1), "bg": bg}).filter(same_doc)
        bagg = bt.group_by("p").aggregate(
            [("bg", "count"), ("bg", "count_distinct")]
        )
        bp = bagg["p"].to_numpy()
        nbg = np.zeros(n_rows, dtype=np.int64)
        nbgd = np.zeros(n_rows, dtype=np.int64)
        nbg[bp] = bagg["bg_count"].to_numpy()
        nbgd[bp] = bagg["bg_count_distinct"].to_numpy()
    else:
        nbg = np.zeros(n_rows, dtype=np.int64)
        nbgd = np.zeros(n_rows, dtype=np.int64)

    mil = 1_000_000
    top_frac = mx * mil // n
    repeat = (n - nd) * mil // n
    bg_repeat = (nbg - nbgd) * mil // np.maximum(nbg, 1)
    band = np.where(
        (top_frac > 140_000) | (repeat > 650_000), "low",
        np.where((repeat < 400_000) & (bg_repeat < 20_000), "high", "medium"),
    )
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pa.array(n, pa.int64()),
        "top_token_frac_micro": pa.array(top_frac, pa.int64()),
        "repeat_ratio_micro": pa.array(repeat, pa.int64()),
        "bigram_repeat_micro": pa.array(bg_repeat, pa.int64()),
        "quality_band": pa.array(band.astype(object), pa.string()),
    })


# BPE-ish pre-tokenizer for source code: identifier runs, digit runs,
# single punctuation bytes.  RE2 class-only syntax so pyarrow (RE2) and
# the DuckDB oracle (also RE2) count identically.
CODE_TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^A-Za-z0-9_\s]"
_PUNCT_RE = r"[^A-Za-z0-9\s]"
_ALNUM_RE = r"[A-Za-z0-9]"
# StarCoder/BigCode-style curation signals (all RE2, shared verbatim with
# the DuckDB oracle which also runs RE2):
LICENSE_RE = r"SPDX-License-Identifier|Licensed under|MIT License|Apache License"
AUTOGEN_RE = r"(?i)auto-generated|do not edit|generated by"
SECRET_RES = (r"AKIA[0-9A-Z]{16}", r"-----BEGIN [A-Z ]+PRIVATE KEY-----")
LONG_LINE_CHARS = 120
# per-LINE comment shape (RE2 '^' anchors each split line, not multiline)
COMMENT_LINE_RE = r"^[\t ]*(//|#)"
# StarCoder's 25% alphanumeric-fraction floor, in integer micro-units
MIN_ALNUM_MICRO = 250_000
# fixed drop-reason precedence for the per-file keep/drop decision
# (first matching rule wins; mirrored verbatim by the oracle's CASE)
DROP_RULES = ("autogen", "secrets", "long_lines", "low_alnum")
_DIGIT_RE = r"[0-9]"
_UPPER_RE = r"[A-Z]"


def code_token_stats(corpus_dir: str) -> rd.Dataset:
    """Per-file token counting + character-class ratios + curation
    signals over the source-code corpus ``(repo, path, commit, lang,
    content)``.

    The "BPE-ish" tokenizer is the standard byte-level pre-tokenization
    regex family (identifier runs / digit runs / punctuation singles),
    counted with ``pc.count_substring_regex`` — one vectorized RE2 pass
    per pattern, zero-copy Arrow batches, no shuffle; column pruning at
    the read keeps ``commit`` (and any future payload columns) off the
    wire.  Streams at any corpus size.

    Curation columns follow the StarCoder/BigCode per-file filters:
    line-shape stats (``pc.split_pattern`` once + ``np.*.reduceat`` over
    the list offsets — no per-row Python), alphanumeric fraction,
    license-header / auto-generated-banner flags, a credential scan
    (AWS-shaped access keys, PEM private-key blocks), comment-line
    fraction, and a per-file keep/drop decision with a fixed drop-reason
    precedence (``DROP_RULES``) mirrored by the oracle's CASE."""
    import pyarrow.compute as pc

    from ontology_matcher_ray.sources.io import read_parquet_clean

    ds = read_parquet_clean(corpus_dir, columns=["repo", "path", "lang", "content"])

    def stage(t: pa.Table) -> pa.Table:
        content = pc.cast(t["content"].combine_chunks(), pa.string())
        n_chars = pc.cast(pc.utf8_length(content), pa.int64()).to_numpy()
        n_tok = pc.cast(
            pc.count_substring_regex(content, CODE_TOKEN_RE), pa.int64()
        ).to_numpy()
        denom = np.maximum(n_chars, 1)
        mil = 1_000_000

        def ratio(pat):
            c = pc.cast(pc.count_substring_regex(content, pat), pa.int64())
            return c.to_numpy() * mil // denom

        def flag(pat):
            return pc.cast(pc.match_substring_regex(content, pat), pa.int64())

        # line-shape stats: ONE split, segment reductions over offsets
        # (split_pattern builds a fresh ListArray, so offsets are
        # 0-based; every file has >=1 line, so no empty segments)
        la = pc.split_pattern(content, "\n")
        offs = la.offsets.to_numpy()
        lens = pc.cast(pc.utf8_length(la.values), pa.int64()).to_numpy()
        n_lines = np.diff(offs)
        max_line = np.maximum.reduceat(lens, offs[:-1])
        n_long = np.add.reduceat((lens > LONG_LINE_CHARS).astype(np.int64),
                                 offs[:-1])
        is_comment = pc.cast(
            pc.match_substring_regex(la.values, COMMENT_LINE_RE), pa.int64()
        ).to_numpy()
        n_comment = np.add.reduceat(is_comment, offs[:-1])
        n_secrets = sum(
            pc.cast(pc.count_substring_regex(content, p), pa.int64()).to_numpy()
            for p in SECRET_RES
        )

        # keep/drop decision: fixed precedence over the signals above
        # (the thresholds are sized to the synthetic corpus; StarCoder's
        # production cuts are max_line>1000 / alnum<0.25)
        alnum = ratio(_ALNUM_RE)
        autogen = flag(AUTOGEN_RE)
        drop_reason = np.select(
            [autogen.to_numpy().astype(bool), n_secrets > 0,
             max_line > LONG_LINE_CHARS, alnum < MIN_ALNUM_MICRO],
            list(DROP_RULES), default="",
        )

        return pa.table({
            "repo": t["repo"],
            "path": t["path"],
            "lang": t["lang"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "punct_micro": pa.array(ratio(_PUNCT_RE), pa.int64()),
            "digit_micro": pa.array(ratio(_DIGIT_RE), pa.int64()),
            "upper_micro": pa.array(ratio(_UPPER_RE), pa.int64()),
            "alnum_micro": pa.array(alnum, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "max_line_len": pa.array(max_line, pa.int64()),
            "long_line_micro": pa.array(n_long * mil // n_lines, pa.int64()),
            "comment_line_micro": pa.array(n_comment * mil // n_lines,
                                           pa.int64()),
            "has_license": flag(LICENSE_RE),
            "autogen": autogen,
            "n_secrets": pa.array(n_secrets, pa.int64()),
            "drop_reason": pa.array(drop_reason, pa.string()),
            "curate_keep": pa.array((drop_reason == "").astype(np.int64),
                                    pa.int64()),
        })

    return ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

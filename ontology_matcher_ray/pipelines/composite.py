"""Composite driver queries: tagged unions / key joins of verified operators.

Round 3's driver artifact recorded exactly the FIRST 50 of 67 exposed
queries (CORRECTNESS_r03.json), i.e. the correctness harness caps the
per-round query list at 50.  Every operator still needs a driver-green
value-hash row, so operators with union-compatible schemas (or a shared
doc_id key) are verified TOGETHER in one composite query:

- a tagged UNION keeps each component's full row set, distinguished by a
  constant tag column — the hash check covers every component row
  exactly as the standalone query did;
- a doc_id JOIN of per-document operators emits one row per document
  carrying every component's columns — the hash check covers each
  component column-for-column (the oracle recomputes each component with
  its own independent SQL and joins the same way).

The component pipeline functions are unchanged (tests and bench.py keep
exercising them individually); this module only composes them for the
driver gate.  COVERAGE.md carries the query -> operator map.

Scale note: these composites are VERIFICATION GLUE, run at the gate's
sf0.01, not production pipelines — e.g. ``kg_triples_roundtrip``
materializes the triples once so the write and the union read the same
computation (at production scale the flagship is consumed streaming via
``docs_kg.kg_triples`` / ``corpus_kg.build_kg``), and the doc_id joins
deliberately route through the engine's own distributed joins —
``exchange.multi_join`` where 3+ flag tables meet on one key (ONE
all-to-all instead of k), binary ``exchange.hash_join`` elsewhere — so
the composition itself stays shuffle-clean.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.pipelines import (
    docs_kg,
    docs_text,
    docs_train,
    events,
    relational,
)


def _tagged(ds: rd.Dataset, tag_col: str, tag: str, cols: list[str]) -> rd.Dataset:
    """Prepend a constant tag column and pin column order (union-safe)."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out[tag_col] = tag
        return out[[tag_col] + cols]

    return ds.map_batches(stage, batch_format="pandas")


def _scratch(prefix: str) -> str:
    """Collision-free scratch dir under /tmp (unique per call: concurrent
    runs over the same sf_dir must never share or rmtree each other's
    output — see ADVICE r3 on the md5(sf_dir)-keyed scratch race)."""
    return tempfile.mkdtemp(prefix=f"onto_ray_{prefix}_", dir="/tmp")


# ---------------------------------------------------------------------------
# Tagged unions
# ---------------------------------------------------------------------------

def knn_methods(sf_dir: str) -> pd.DataFrame:
    """ANN family in one row set: brute-force / LSH / IVF top-k for the
    bounded query set, plus the bulk IVF kNN JOIN (every vector a
    query, one centroid-keyed exchange), tagged by ``method``.
    Identical schemas (query_id, vec_id, cos_sim_micro, rank).  The
    join leg's to_pandas is gate glue over an n x k result (bounded by
    the embeddings table, tiny at sf); production consumers keep it a
    Dataset."""
    parts = []
    for method, fn in (
        ("brute", docs_text.knn_brute),
        ("lsh", docs_text.knn_lsh),
        ("ivf", docs_text.knn_ivf),
        ("join", lambda sf: docs_text.knn_join(sf).to_pandas()),
    ):
        df = fn(sf_dir).copy()
        df.insert(0, "method", method)
        parts.append(df[["method", "query_id", "vec_id",
                         "cos_sim_micro", "rank"]])
    return pd.concat(parts, ignore_index=True)


_TRIPLE_COLS = ["subj", "pred", "obj"]


def kg_triples_roundtrip(sf_dir: str) -> rd.Dataset:
    """Flagship triples, twice: computed directly (via='direct') and
    round-tripped through the distributed N-Triples sink/source
    (via='nt').  The round trip must be lossless — both halves hash
    against the SAME oracle SQL."""
    import shutil

    triples = docs_kg.kg_triples(sf_dir).materialize()
    out = _scratch("nt")
    from ontology_matcher_ray.sources.io import read_ntriples, write_ntriples

    write_ntriples(triples, out)
    direct = _tagged(triples, "via", "direct", _TRIPLE_COLS)
    # materialize the read-back so the scratch dir can be removed NOW —
    # a lazy reader would pin the /tmp dump until the caller consumes it
    # (and leak it forever if they never do)
    back = _tagged(read_ntriples(out), "via", "nt", _TRIPLE_COLS).materialize()
    shutil.rmtree(out, ignore_errors=True)
    return direct.union(back)


_LANG_ID_COLS = ["doc_id", "declared_lang", "guessed_lang"]


def lang_id_roundtrip(sf_dir: str) -> rd.Dataset:
    """lang_id over the documents read directly (via='direct') and over
    the same documents round-tripped through FOUR distributed
    sink/source pairs — gzip JSONL ('jsonl', how real ``.jsonl.gz``
    corpora ship), ORC ('orc', the Hive/Trino lake format) and
    zstd Arrow IPC ('ipc', Feather v2 interchange), plus the
    zone-mapped lake layout ('zonemap': write_zonemapped sidecars +
    the scan_between file-skipping read) — each a lossless round trip
    under one oracle."""
    import shutil

    from ontology_matcher_ray.sources import io as sio

    def roundtrip(tag: str, write, read) -> rd.Dataset:
        out = _scratch(tag)
        write(docs_text.read_documents(sf_dir), out)
        tbl_dir = _scratch(f"{tag}_sf")
        read(out).write_parquet(os.path.join(tbl_dir, "documents.parquet"))
        shutil.rmtree(out, ignore_errors=True)   # parquet copy supersedes it
        # materialize before removing the re-read table (see kg_triples note)
        back = _tagged(
            docs_text.lang_id(tbl_dir), "via", tag, _LANG_ID_COLS
        ).materialize()
        shutil.rmtree(tbl_dir, ignore_errors=True)
        return back

    direct = _tagged(docs_text.lang_id(sf_dir), "via", "direct", _LANG_ID_COLS)
    jsonl = roundtrip(
        "jsonl",
        lambda ds, out: sio.write_jsonl(ds, out, codec="gzip"),
        lambda out: sio.read_jsonl(out, codec="gzip"),
    )
    orc = roundtrip("orc", sio.write_orc, sio.read_orc)
    ipc = roundtrip("ipc", sio.write_ipc, sio.read_ipc)
    # zone-mapped lake layout: write with per-part min/max sidecars, read
    # back through the file-skipping scan with an all-keys range — the
    # whole prune+exact-filter path under the same value-hash oracle
    from ontology_matcher_ray.sources import layout as slayout

    zonemap = roundtrip(
        "zonemap",
        lambda ds, out: slayout.write_zonemapped(
            ds, out, stat_cols=["doc_id"]),
        lambda out: slayout.scan_between(
            out, "doc_id", -(1 << 62), 1 << 62),
    )

    # Bloom-sidecar point-lookup path ('bloomscan'): write with a Bloom
    # filter on `lang`, read back as the union of `scan_eq` point probes
    # over every distinct lang — lossless iff scan_eq's prune+exact
    # filter drops nothing it shouldn't and opens every part it must.
    def read_bloom(out: str) -> rd.Dataset:
        import glob as _glob

        import pyarrow.parquet as _pq

        # distinct probe values from the lang column only (manifest-scale
        # driver read: one dictionary column per part, bounded by the
        # part count — at lake scale this comes from a catalog instead)
        langs: set = set()
        for p in sorted(_glob.glob(os.path.join(out, "*.parquet"))):
            langs.update(
                _pq.read_table(p, columns=["lang"])
                .column("lang").unique().to_pylist())
        parts = [slayout.scan_eq(out, "lang", v) for v in sorted(langs)]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    bloomscan = roundtrip(
        "bloomscan",
        lambda ds, out: slayout.write_zonemapped(
            ds, out, stat_cols=["doc_id"], bloom_cols=["lang"]),
        read_bloom,
    )
    return (direct.union(jsonl).union(orc).union(ipc).union(zonemap)
            .union(bloomscan))


_FMT_COLS = [
    "id", "name", "label", "resource", "description",
    "synonyms", "pmids", "taxid", "xrefs", "raw_id",
]


def format_entities_all(sf_dir: str) -> rd.Dataset:
    """Formatted-output surface in one row set: MIXTURE formatted sink
    (strategy='all'), UNIQUE formatted sink ('unique'), UNIQUE failed sink
    with reasons ('failed_unique'; ``reason`` is '' for formatted rows)."""

    def with_reason(ds: rd.Dataset) -> rd.Dataset:
        def stage(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out["reason"] = ""
            return out

        return ds.map_batches(stage, batch_format="pandas")

    cols = _FMT_COLS + ["reason"]
    parts = [
        _tagged(with_reason(docs_kg.formatted_entities(sf_dir)),
                "strategy", "all", cols),
        _tagged(with_reason(docs_kg.formatted_entities_unique(sf_dir)),
                "strategy", "unique", cols),
        _tagged(docs_kg.failed_entities_unique(sf_dir),
                "strategy", "failed_unique", cols),
    ]
    return parts[0].union(parts[1]).union(parts[2])


_CM_COLS = ["id", "label", "name", "description", "resource", "taxid",
            "xrefs", "synonyms", "pmids", "raw_id"]
_CM_PAYLOAD = [c for c in _CM_COLS if c not in ("id", "label")]


def canonical_merge_versioned(sf_dir: str) -> rd.Dataset:
    """Canonical-merge (A1) routed through the MVCC versioned table —
    the round-4 flagship addition under the driver's value-hash oracle.

    The merged entity table (key ``mkey = id|label``) is split by
    ``md5_number_lower(mkey) % 5`` (DuckDB-recomputable):

    * v1 = buckets 1-4, with bucket-1 names STALED (``'stale|' || name``)
      and a synthetic ``'_tmp|' || mkey`` row per bucket-2 key;
    * one MERGE then exercises all three change kinds at once —
      INSERTS (bucket 0), UPDATES (bucket 1 back to the true payload),
      DELETES (the synthetic bucket-2 rows) — committing v2.

    The query returns head (leg='head', == the plain canonical_merge
    result by construction) UNION the v1 snapshot READ AFTER the v2
    commit (leg='v1', time travel): a hash mismatch on the v1 leg means
    snapshot isolation broke; on the head leg, that MERGE upsert/delete
    semantics broke.  Scratch table lives under /tmp and is removed
    after both legs materialize (entity-table scale, not corpus scale).
    """
    import shutil

    from ontology_matcher_ray.functions.hashing import md5half
    from ontology_matcher_ray.sources import versioned as sver

    base = _scratch("mvcc")
    out_cols = ["mkey"] + _CM_COLS

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["mkey"] = b["id"].astype(str) + "|" + b["label"].astype(str)
        b["bucket"] = (b["mkey"].map(md5half) % 5).astype("int64")
        return b

    cm = (docs_kg.canonical_merge(sf_dir)
          .map_batches(keyed, batch_format="pandas").materialize())

    def v1_rows(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["bucket"] != 0].copy()
        stale = keep["bucket"] == 1
        keep.loc[stale, "name"] = "stale|" + keep.loc[stale, "name"]
        tmp = b[b["bucket"] == 2].copy()
        tmp["mkey"] = "_tmp|" + tmp["mkey"]
        for c in _CM_PAYLOAD:
            tmp[c] = ""
        return pd.concat([keep, tmp], ignore_index=True)[out_cols]

    sver.create_versioned(
        cm.map_batches(v1_rows, batch_format="pandas"),
        base, key="mkey", num_ranges=8, bloom_cols=["id"])

    def changes(b: pd.DataFrame) -> pd.DataFrame:
        ups = b[b["bucket"].isin([0, 1])].copy()
        ups["_op"] = "upsert"
        dels = b[b["bucket"] == 2].copy()
        dels["mkey"] = "_tmp|" + dels["mkey"]
        for c in _CM_PAYLOAD:
            dels[c] = ""
        dels["_op"] = "delete"
        return pd.concat([ups, dels],
                         ignore_index=True)[out_cols + ["_op"]]

    sver.merge_versioned(
        base, cm.map_batches(changes, batch_format="pandas"))

    def tag(ds: rd.Dataset, leg: str, version: int) -> rd.Dataset:
        def stage(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out["leg"] = leg
            out["version"] = np.int64(version)
            return out[["leg", "version"] + out_cols]

        return ds.map_batches(stage, batch_format="pandas")

    head = tag(sver.read_versioned(base), "head", 2).materialize()
    v1r = tag(sver.read_versioned(base, version=1), "v1", 1).materialize()
    # Bloom-pruned point probe leg: head rows of the lexicographic-min
    # id, read through read_versioned_eq (id Bloom sidecars written at
    # create, carried through the merge) — SQL-expressible as
    # id = (SELECT min(id) ...), so the probe path itself is value-hash
    # verified, not only tested
    min_id = head.map_batches(
        lambda b: pd.DataFrame({"id": [b["id"].min()]}),
        batch_format="pandas").to_pandas()["id"].min()  # O(blocks) read
    probe = tag(sver.read_versioned_eq(base, "id", min_id),
                "probe", 2).materialize()
    shutil.rmtree(base, ignore_errors=True)
    return head.union(v1r).union(probe)


_Q_COLS = ["o_orderpriority", "q25", "q50", "q75", "q95"]


def order_price_quantiles_both(sf_dir: str) -> rd.Dataset:
    """Exact distributed quantiles (method='exact') and the mergeable
    sketch's lower bounds (method='approx') in one row set; quantile
    columns renamed to the common q25..q95."""

    def rename(ds: rd.Dataset, suffix: str) -> rd.Dataset:
        mapping = {f"q{q}_{suffix}": f"q{q}" for q in (25, 50, 75, 95)}

        def stage(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns=mapping)

        return ds.map_batches(stage, batch_format="pandas")

    exact = _tagged(rename(relational.order_price_quantiles(sf_dir), "cents"),
                    "method", "exact", _Q_COLS)
    approx = _tagged(rename(relational.order_price_quantiles_approx(sf_dir), "lb"),
                     "method", "approx", _Q_COLS)
    return exact.union(approx)


_WIN_COLS = ["event_type", "window_start", "n_events", "value_cents"]


RETENTION_BUCKET_US = 7 * 86_400 * 1_000_000


def events_windows(sf_dir: str) -> rd.Dataset:
    """Tumbling (kind='tumbling'), sliding (kind='sliding') and cohort
    retention (kind='retention') aggregates in one row set.  The
    retention leg maps (cohort, age, n_users) into the window schema:
    window_start = the cohort period's start timestamp, event_type =
    'age=<n>', n_events = n_users, value_cents = 0 sentinel — the SQL
    arm mirrors the mapping exactly, so the round-4 tests-only
    retention operator gains a driver value-hash row."""
    t = _tagged(events.hourly_windows(sf_dir), "kind", "tumbling", _WIN_COLS)
    s = _tagged(events.sliding_windows(sf_dir), "kind", "sliding", _WIN_COLS)

    def ret_stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": "age=" + b["age"].astype(str),
            "window_start": pd.to_datetime(
                b["cohort"].to_numpy(dtype="int64") * RETENTION_BUCKET_US,
                unit="us").astype("datetime64[us]"),
            "n_events": b["n_users"].astype("int64"),
            "value_cents": np.zeros(len(b), dtype="int64"),
        })

    r = _tagged(
        events.user_retention(sf_dir).map_batches(
            ret_stage, batch_format="pandas"),
        "kind", "retention", _WIN_COLS)
    return t.union(s).union(r)


_POINT_COLS = ["event_id", "user_id", "a", "b", "c"]


def events_point_ops(sf_dir: str) -> rd.Dataset:
    """Per-event point operators in one row set, tagged by ``leg``:
    the as-of join ('asof': a=match_event_id, b=gap_us, c=0) and the
    global ordered scan ('scan': a=running_cents, b=seen_max_us
    watermark, c=late flag) — the hash-partitionable and the
    range-scan-only window shapes side by side."""

    def abc(ds: rd.Dataset, ren: dict, pad_c: bool = False) -> rd.Dataset:
        def stage(b: pd.DataFrame) -> pd.DataFrame:
            out = b.rename(columns=ren)
            if pad_c:
                out["c"] = np.zeros(len(out), dtype=np.int64)
            return out

        return ds.map_batches(stage, batch_format="pandas")

    asof = _tagged(
        abc(events.asof_join(sf_dir),
            {"match_event_id": "a", "gap_us": "b"}, pad_c=True),
        "leg", "asof", _POINT_COLS)
    scan = _tagged(
        abc(events.global_scan(sf_dir),
            {"running_cents": "a", "seen_max_us": "b", "late": "c"}),
        "leg", "scan", _POINT_COLS)
    return asof.union(scan)


_PAIR_COLS = ["a", "b", "score"]


def dedup_pairs(sf_dir: str) -> rd.Dataset:
    """Near-dup pair family in one row set, tagged by ``method``:
    exact 3-gram Jaccard on adjacent ids ('jaccard_adjacent'),
    MinHash+LSH verified pairs ('minhash'), simhash hamming-verified
    pairs ('simhash'), embedding-cosine LSH pairs ('embedding'),
    exact duplicated-span pairs ('substring', Lee-et-al-style),
    SemDeDup k-means-blocked cosine pairs ('semdedup'), and the EXACT
    all-pairs prefix-filter join ('jaccard_all' — every pair with
    Jaccard >= 0.8, the full-recall counterpart of 'minhash').
    ``score`` carries each method's native integer metric
    (jaccard_micro / jaccard_micro / hamming / cos_sim_micro /
    shared_spans / cos_sim_micro / jaccard_micro)."""

    def rescore(ds: rd.Dataset, src: str) -> rd.Dataset:
        def stage(b: pd.DataFrame) -> pd.DataFrame:
            out = b.rename(columns={src: "score"})
            out["score"] = out["score"].astype("int64")
            return out

        return ds.map_batches(stage, batch_format="pandas")

    parts = [
        _tagged(rescore(docs_text.dedup_jaccard_adjacent(sf_dir), "jaccard_micro"),
                "method", "jaccard_adjacent", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_minhash(sf_dir), "jaccard_micro"),
                "method", "minhash", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_simhash_pairs(sf_dir), "hamming"),
                "method", "simhash", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_embedding(sf_dir), "cos_sim_micro"),
                "method", "embedding", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_substring(sf_dir), "shared_spans"),
                "method", "substring", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_semdedup(sf_dir), "cos_sim_micro"),
                "method", "semdedup", _PAIR_COLS),
        _tagged(rescore(docs_text.dedup_jaccard_all(sf_dir), "jaccard_micro"),
                "method", "jaccard_all", _PAIR_COLS),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


_TOKFREQ_COLS = ["lang", "token", "n", "rank", "postings"]


def token_freq_all(sf_dir: str) -> rd.Dataset:
    """Global token frequencies (scope='global', lang='*', rank=0), the
    per-language top-k (scope='per_lang'), the two-pass Misra-Gries
    heavy hitters (scope='heavy', exact counts above the phi support
    threshold), and the full inverted index (scope='postings', n=df,
    postings=ascending comma-joined doc ids) in one row set."""

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["lang"] = "*"
        out["rank"] = np.int64(0)
        out["n"] = out["n"].astype("int64")
        out["postings"] = ""
        return out

    g = _tagged(
        docs_text.token_freq(sf_dir).map_batches(widen, batch_format="pandas"),
        "scope", "global", _TOKFREQ_COLS,
    )
    p = _tagged(
        docs_text.top_tokens_per_lang(sf_dir).map_batches(
            lambda b: b.assign(postings=""), batch_format="pandas"),
        "scope", "per_lang", _TOKFREQ_COLS,
    )
    h = _tagged(
        docs_text.token_heavy_hitters(sf_dir).map_batches(
            widen, batch_format="pandas"),
        "scope", "heavy", _TOKFREQ_COLS,
    )
    ii = _tagged(
        docs_text.inverted_index(sf_dir).map_batches(
            lambda b: pd.DataFrame({
                "lang": "*", "token": b["token"],
                "n": b["df"].astype("int64"), "rank": np.int64(0),
                "postings": b["postings"],
            }),
            batch_format="pandas"),
        "scope", "postings", _TOKFREQ_COLS,
    )
    return g.union(p).union(h).union(ii)


# ---------------------------------------------------------------------------
# doc_id joins of per-document operators
# ---------------------------------------------------------------------------

def doc_profile(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Per-document profile: doc_stats ⋈ doc_quality ⋈ fingerprints ⋈
    decontaminate ⋈ dsir_importance ⋈ bpe_encode ⋈ lm_ppl_buckets ⋈
    bm25_scores ⋈ chunk_profile on doc_id (inner; all nine emit exactly
    one row per document) through ONE ``exchange.multi_join`` pass — the
    9-way chain of binary joins would pay 8 all-to-all exchanges on the
    SAME key; the n-ary join pays exactly one.
    doc_quality's n_tokens / bpe's n_tokens / lm's lm_n_scored duplicate
    columns already carried by another side (same tokenizer/positions)
    and are dropped before the join (disjoint non-key names)."""
    import numpy as np
    import pyarrow as pa

    from ontology_matcher_ray.functions.text import rolling_fingerprint
    from ontology_matcher_ray.pipelines.docs_text import (
        quality_stage,
        read_documents,
        stats_stage,
    )
    from ontology_matcher_ray.stages import exchange

    # Scan fusion: stats / quality / fingerprint / contamination are all
    # per-doc map-only signals over the same text, so ONE fused scan
    # computes the four (reusing the component kernels verbatim — the
    # standalone operators stay byte-identical) instead of four separate
    # content passes; the bpe/lm/bm25/dsir/chunk legs keep their own
    # scans because each depends on distributed or broadcast state
    # (trained merges, LM counts, document frequencies).
    ngrams = docs_train.decon_ngrams(sf_dir)

    from ontology_matcher_ray.pipelines.docs_train import decon_hits

    def fused(t: pa.Table) -> pd.DataFrame:
        out = stats_stage(t).to_pandas()
        q = quality_stage(t)             # row-aligned with t by design
        for c in ("top_token_frac_micro", "repeat_ratio_micro",
                  "bigram_repeat_micro", "quality_band"):
            out[c] = q[c].to_pandas().to_numpy()
        text = pd.Series(t["text"].to_pandas(), dtype=object).astype(str)
        out["fingerprint"] = rolling_fingerprint(text).to_numpy()
        out["contaminated"] = decon_hits(text, ngrams).astype(np.int64)
        return out

    fused_ds = read_documents(
        sf_dir, columns=["doc_id", "lang", "text"]
    ).map_batches(fused, batch_format="pyarrow")

    imp = docs_train.dsir_importance(sf_dir)
    bpe = docs_train.bpe_encode(sf_dir).map_batches(
        lambda b: b.drop(columns=["n_tokens"]), batch_format="pandas")
    lm = docs_train.lm_ppl_buckets(sf_dir).map_batches(
        lambda b: b.drop(columns=["lm_n_scored"]), batch_format="pandas")
    bm = docs_train.bm25_scores(sf_dir)
    ch = docs_train.chunk_profile(sf_dir)

    fused_schema = {
        "doc_id": "int64", "lang": "object", "n_tokens": "int64",
        "n_distinct_tokens": "int64", "n_chars": "int64",
        "stopword_ratio_micro": "int64", "avg_token_len_micro": "int64",
        "quality_micro": "int64", "top_token_frac_micro": "int64",
        "repeat_ratio_micro": "int64", "bigram_repeat_micro": "int64",
        "quality_band": "object", "fingerprint": "int64",
        "contaminated": "int64",
    }
    return exchange.multi_join(
        fused_ds, fused_schema, "doc_id",
        [
            (imp, "doc_id",
             {"doc_id": "int64", "n_bigrams": "int64",
              "dsir_score_micro": "int64"}, "inner"),
            (bpe, "doc_id",
             {"doc_id": "int64", "n_bpe_tokens": "int64"}, "inner"),
            (lm, "doc_id",
             {"doc_id": "int64", "lm_xent_micro": "int64",
              "ppl_bucket": "object"}, "inner"),
            (bm, "doc_id",
             {"doc_id": "int64", "bm25_micro": "int64"}, "inner"),
            (ch, "doc_id",
             {"doc_id": "int64", "n_rag_chunks": "int64",
              "chunk_fp": "int64"}, "inner"),
        ],
        num_partitions=num_partitions,
    )


def doc_pack_shuffled(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """doc_pack ⋈ shuffle_shards on doc_id (both emit exactly one row
    per document): the packed-chunk layout plus the deterministic
    epoch-shuffle shard assignment, verified in one driver query."""
    from ontology_matcher_ray.stages import exchange

    pack = docs_train.doc_pack(sf_dir)
    sh = docs_train.shuffle_shards(sf_dir)
    return exchange.hash_join(
        pack, sh, "doc_id", "doc_id",
        {"doc_id": "int64", "n_tokens": "int64", "start_offset": "int64",
         "chunk_id": "int64", "n_chunks": "int64"},
        {"doc_id": "int64", "shard": "int64", "pos": "int64"},
        num_partitions=num_partitions,
    )


def kg_topology(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Per-node KG topology: degrees LEFT⋈ 2-hop reachability LEFT⋈
    co-occurrence triangle counts, all on node.

    The triple union is built and materialized ONCE and shared by all
    three consumers (kg_degrees' combiner pass, kg_reach's edge build,
    kg_triangles' mention-pair derivation) — the composite never
    re-runs the extract chain.  Nodes with no out-edges have no reach
    row and non-entity nodes (docs, langs, sources) are in no
    co-occurrence triangle; each LEFT join's NaN becomes an exact 0
    like the SQL COALESCE."""
    from ontology_matcher_ray.pipelines import graph
    from ontology_matcher_ray.stages import exchange

    trips = docs_kg.kg_triples(sf_dir).materialize()
    deg = graph.kg_degrees(sf_dir, num_partitions, trips=trips)
    reach = graph.kg_reach(sf_dir, num_partitions=num_partitions,
                           trips=trips)
    tri = graph.kg_triangles(sf_dir, num_partitions, trips=trips)
    core = graph.kg_kcore(sf_dir, num_partitions, trips=trips)
    bfs = graph.kg_bfs_dist(sf_dir, num_partitions=num_partitions,
                            trips=trips)
    joined = exchange.multi_join(
        deg,
        {"node": "object", "out_degree": "int64", "in_degree": "int64"},
        "node",
        [
            (reach, "node", {"node": "object", "n_reach": "int64"}, "left"),
            (tri, "node", {"node": "object", "n_triangles": "int64"},
             "left"),
            (core, "node", {"node": "object", "core": "int64"}, "left"),
            (bfs, "node", {"node": "object", "dist": "int64"}, "left"),
        ],
        num_partitions=num_partitions,
    )
    return joined.map_batches(
        lambda b: pd.DataFrame({
            "node": b["node"],
            "out_degree": b["out_degree"].astype("int64"),
            "in_degree": b["in_degree"].astype("int64"),
            "n_reach": b["n_reach"].fillna(0).astype("int64"),
            "n_triangles": b["n_triangles"].fillna(0).astype("int64"),
            "cooc_core": b["core"].fillna(0).astype("int64"),
            "seed_dist": b["dist"].fillna(-1).astype("int64"),
        }),
        batch_format="pandas",
    )


def doc_embedding_profile(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """documents ⋈ embeddings (the size-gated broadcast/exchange join)
    ⋈ per-vector SemDeDup pruning decision on doc_id = vec_id (inner;
    the decision side emits exactly one row per vector) through the
    engine's distributed ``exchange.hash_join``.  Emits (doc_id, lang,
    n_chars, label, kmeans_cluster, sem_keep)."""
    from ontology_matcher_ray.stages import exchange

    base = docs_text.doc_embedding_join(sf_dir)
    keep = docs_text.semdedup_keep(sf_dir)
    base_schema = {"doc_id": "int64", "lang": "object",
                   "n_chars": "int64", "label": "int64"}
    keep_schema = {"vec_id": "int64", "kmeans_cluster": "int64",
                   "sem_keep": "bool"}
    return exchange.hash_join(base, keep, "doc_id", "vec_id",
                              base_schema, keep_schema,
                              num_partitions=num_partitions)


def dedup_assignments(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Per-document dedup state: exact content-hash groups ⋈ near-dup
    cluster resolution ⋈ simhash bucket assignment ⋈ incremental
    prior-snapshot flag ⋈ the end-to-end curation decision
    (docs_train.curate_decisions) on doc_id (inner; one row per
    content-group-representative document)."""
    import numpy as np
    import pyarrow as pa

    from ontology_matcher_ray.functions.hashing import sha256_hex, simhash64
    from ontology_matcher_ray.pipelines.docs_text import (
        prior_snapshot_hashes,
        quality_stage,
        read_documents,
    )
    from ontology_matcher_ray.pipelines.docs_train import decon_hits
    from ontology_matcher_ray.stages import dedup as dedup_stages
    from ontology_matcher_ray.stages import exchange

    clusters = docs_text.dedup_clusters(sf_dir)
    # Scan fusion (same pattern as curate_decisions/doc_profile): the
    # content hash, simhash+bucket, quality band and contamination flag
    # are all per-doc map-only signals — ONE fused scan computes all
    # (kernels shared verbatim: sha256_hex / simhash64 with
    # simhash_buckets' prefix_bits=16 / quality_stage / decon_hits), and
    # the narrow result is materialized once to feed both the
    # exact-group aggregation and the flag join.  The MinHash-cluster
    # subtree and the prior-snapshot side keep their own scans.
    ngrams = docs_train.decon_ngrams(sf_dir)

    def fused(t: pa.Table) -> pd.DataFrame:
        q = quality_stage(t)
        text = pd.Series(t["text"].to_pandas(), dtype=object).astype(str)
        sh = simhash64(text)
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy().astype("int64"),
            "content_sha256": sha256_hex(text).to_numpy(),
            "simhash": sh,
            "bucket": (sh.astype(np.uint64) >> np.uint64(48))
            .astype(np.int64),
            "quality_band": q["quality_band"].to_pandas().to_numpy(),
            "contaminated": decon_hits(text, ngrams).astype(np.int64),
        })

    fused_ds = read_documents(
        sf_dir, columns=["doc_id", "text"]
    ).map_batches(fused, batch_format="pyarrow", batch_size=1024)
    # consumed twice (exact groups + flag join) WITHOUT materializing:
    # a materialize here is a pipeline barrier that serializes against
    # the clusters subtree (measured slower); two executions of the
    # fused scan still replace five separate content scans

    exact = dedup_stages.exact_groups(fused_ds)
    prior = prior_snapshot_hashes(sf_dir, num_partitions)
    withprior = exchange.hash_join(
        fused_ds, prior, "content_sha256", "ph",
        {"doc_id": "int64", "content_sha256": "object", "simhash": "int64",
         "bucket": "int64", "quality_band": "object",
         "contaminated": "int64"},
        {"ph": "object", "in_prior": "int64"},
        how="left", num_partitions=num_partitions,
    )

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "simhash": b["simhash"].astype("int64").to_numpy(),
            "bucket": b["bucket"].astype("int64").to_numpy(),
            "quality_band": b["quality_band"].to_numpy(),
            "contaminated": b["contaminated"].astype("int64").to_numpy(),
            "in_prior": b["in_prior"].fillna(0).astype("int64").to_numpy(),
        })

    flags = withprior.map_batches(fin, batch_format="pandas")

    exact_schema = {"content_sha256": "object", "doc_id": "int64",
                    "n_dups": "int64"}
    # ONE exchange for the whole flag meet (exchange.multi_join)
    j5 = exchange.multi_join(
        exact, exact_schema, "doc_id",
        [
            (clusters, "doc_id",
             {"doc_id": "int64", "cluster_id": "int64", "keep": "bool"},
             "inner"),
            (flags, "doc_id",
             {"doc_id": "int64", "simhash": "int64", "bucket": "int64",
              "quality_band": "object", "contaminated": "int64",
              "in_prior": "int64"}, "inner"),
        ],
        num_partitions=num_partitions,
    )

    out_cols = list(exact_schema) + ["cluster_id", "keep", "simhash",
                                     "bucket", "in_prior", "quality_band"]

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep, reason = docs_train.curation_decision(b)
        out = b[out_cols].copy()
        out["curate_keep"] = keep
        out["drop_reason"] = reason
        return out

    decided = j5.map_batches(finish, batch_format="pandas")
    # quality-priority survivor per near-dup cluster (the keep-best
    # curation variant): one cluster_id exchange, argmax local per group
    return exchange.partitioned_apply(
        decided, ["cluster_id"], docs_train.quality_priority_keep,
        num_partitions,
    )


def event_type_profile(sf_dir: str) -> pd.DataFrame:
    """Per-event-type profile: the exact COUNT DISTINCT users joined
    with the semi-structured ``props.k`` field stats on event_type.
    Both components are bounded driver-side frames (|event types| ~ 5),
    so the join is a trivial pandas merge; per-component value-hash
    strength is unchanged (every column of both survives)."""
    d = events.event_type_distinct_users(sf_dir)
    k = events.event_props_stats(sf_dir)
    out = d.merge(k, on="event_type", how="inner")
    # Markov transition profile (outgoing): LEFT — a type that is only
    # ever a user's last event has no outgoing row; 0/'' sentinels
    # mirror the oracle's COALESCE
    t = events.event_transition_profile(sf_dir)
    out = out.merge(t, on="event_type", how="left")
    out["n_out"] = out["n_out"].fillna(0).astype("int64")
    out["n_next_distinct"] = out["n_next_distinct"].fillna(0).astype("int64")
    out["top_next"] = out["top_next"].fillna("")
    out["top_next_n"] = out["top_next_n"].fillna(0).astype("int64")
    # stream-hygiene rollups (inner: every type has >= 1 event, and both
    # debounce and compaction keep >= 1 row per stream): the md5
    # fingerprints value-hash every kept/compacted row through the
    # bounded per-type join
    out = out.merge(events.debounce_profile(sf_dir), on="event_type",
                    how="inner")
    out = out.merge(events.compact_profile(sf_dir), on="event_type",
                    how="inner")
    return out


def lang_profile(sf_dir: str) -> pd.DataFrame:
    """lang_stats ⋈ mixture_weights on lang (one row per language from
    each side): the per-language aggregate plus the capped data-mixing
    sampling weights, verified in one driver query.  The distributed
    two-phase aggregation runs ONCE; the weight normalization is
    driver-side integer math over the bounded language table
    (docs_train.mixture_weights_from_stats)."""
    ls = docs_text.lang_stats(sf_dir).to_pandas()
    w = docs_train.mixture_weights_from_stats(ls)
    out = ls.merge(w, on="lang")
    return out[["lang", "n_docs", "total_tokens", "avg_quality_micro",
                "share_micro", "capped_micro", "weight_micro"]]


def entity_link_scores(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Co-occurrence pairs LEFT⋈ Adamic-Adar link-prediction scores on
    the (a, b) pair key, through the engine's distributed
    ``exchange.hash_join``.  Emits (a, b, n_docs, common_neighbors,
    aa_micro) — one row per co-occurring entity pair; pairs whose
    endpoints share no third neighbor get the exact 0 the SQL COALESCE
    produces.  The pair list is materialized once and shared by the
    co-occurrence aggregate and the AA wedge passes."""
    from ontology_matcher_ray.pipelines import graph
    from ontology_matcher_ray.stages import exchange

    pairs = graph.entity_cooccurrence(sf_dir, num_partitions).materialize()
    aa = graph.adamic_adar_from_pairs(
        pairs.select_columns(["a", "b"]), num_partitions)
    sep = "\x1f"
    left = pairs.map_batches(
        lambda b: pd.DataFrame({"pk": b["a"] + sep + b["b"],
                                "a": b["a"], "b": b["b"],
                                "n_docs": b["n_docs"].astype("int64")}),
        batch_format="pandas",
    )
    right = aa.map_batches(
        lambda b: pd.DataFrame({
            "pk": b["a"] + sep + b["b"],
            "common_neighbors": b["common_neighbors"].astype("int64"),
            "aa_micro": b["aa_micro"].astype("int64")}),
        batch_format="pandas",
    )
    joined = exchange.hash_join(
        left, right, "pk", "pk",
        {"pk": "object", "a": "object", "b": "object", "n_docs": "int64"},
        {"pk": "object", "common_neighbors": "int64", "aa_micro": "int64"},
        how="left", num_partitions=num_partitions,
    )
    return joined.map_batches(
        lambda b: pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "n_docs": b["n_docs"].astype("int64"),
            "common_neighbors":
                b["common_neighbors"].fillna(0).astype("int64"),
            "aa_micro": b["aa_micro"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    )


def source_profile(sf_dir: str) -> pd.DataFrame:
    """source_lang_matrix (pivot) ⋈ per-source KL-divergence-to-corpus
    (docs_train.source_kl) on source — both bounded by the source
    domain, so the meet is a driver merge; per-component value-hash
    strength is unchanged (every column of both survives)."""
    m = docs_text.source_lang_matrix(sf_dir).to_pandas()
    kl = docs_train.source_kl(sf_dir)
    return m.merge(kl, on="source", how="inner")


_MENTION_COLS = ["doc_id", "term", "raw_id", "pos", "context"]


def mentions_all(sf_dir: str) -> rd.Dataset:
    """Mention surface in one row set: the distinct (doc, term) mention
    SET the linker consumes (leg='set', pos/context zeroed) plus every
    single-token occurrence with its KWIC evidence window (leg='occ',
    docs_kg.mention_contexts) — the KG provenance tier."""

    def zeroed(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["pos"] = np.zeros(len(b), dtype=np.int64)
        out["context"] = ""
        return out

    mset = _tagged(docs_kg.mentions(sf_dir).map_batches(
        zeroed, batch_format="pandas"), "leg", "set", _MENTION_COLS)
    occ = _tagged(docs_kg.mention_contexts(sf_dir), "leg", "occ",
                  _MENTION_COLS)
    return mset.union(occ)


def sampling_methods(sf_dir: str) -> rd.Dataset:
    """Sampling family in one tagged row set (driver key
    ``stratified_sample``): method='rate' = the per-language
    hash-threshold sample with language-derived rates; method='topk' =
    the exactly-k-per-language seeded-hash sample.  Sentinel 0 pads the
    leg-specific columns (the token_freq union convention)."""
    rate = docs_train.stratified_sample(sf_dir).map_batches(
        lambda b: pd.DataFrame({
            "method": "rate", "doc_id": b["doc_id"].astype("int64"),
            "lang": b["lang"], "strat_mod": b["strat_mod"].astype("int64"),
            "sample_rank": np.int64(0)}),
        batch_format="pandas")
    topk = docs_train.sample_fixed_k(sf_dir).map_batches(
        lambda b: pd.DataFrame({
            "method": "topk", "doc_id": b["doc_id"].astype("int64"),
            "lang": b["lang"], "strat_mod": np.int64(0),
            "sample_rank": b["sample_rank"].astype("int64")}),
        batch_format="pandas")
    return rate.union(topk)


def xref_surface(sf_dir: str) -> rd.Dataset:
    """Xref enrichment surface in one tagged row set (driver key
    ``entity_xref_triples``): leg='xref' = the (resolved-id, xref,
    alias-id) triples; leg='cluster' = the transitive ontology-merge
    components over that same xref graph, one (node, 'in_cluster',
    min-id) row per vocabulary id.  The triple build is materialized
    once and shared by both legs."""
    from ontology_matcher_ray.pipelines import graph

    xr = docs_kg.entity_xref_triples(sf_dir).materialize()
    trips = _tagged(xr, "leg", "xref", ["subj", "pred", "obj"])
    cl = graph.xref_entity_clusters(sf_dir, trips=xr).map_batches(
        lambda b: pd.DataFrame({
            "leg": "cluster", "subj": b["node"].astype(str),
            "pred": "in_cluster", "obj": b["cluster"].astype(str)}),
        batch_format="pandas")
    return trips.union(cl)

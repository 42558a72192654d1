"""Driver contract for the Ray-Data-native KG construction engine.

``entry()`` runs the flagship KG-triples pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (plus the training-data-pipeline additions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the caller BEFORE this module's functions run; no
function here (nor the library code they use) calls ``ray.init``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> mentions
    -> dictionary linking (§2.8 routing) -> (subj, pred, obj) triples."""
    from ontology_matcher_ray.pipelines import docs_kg

    return docs_kg.kg_triples(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from ontology_matcher_ray.pipelines import (
        docs_kg,
        docs_text,
        docs_train,
        events,
        graph,
        relational,
    )

    return {
        # --- KG construction core (SURVEY §2.2-2.8) ---
        "mentions": docs_kg.mentions,                       # extractor actor pool
        "mention_triples": docs_kg.mention_triples,         # extract+link+dedup
        "doc_meta_triples": docs_kg.doc_meta_triples,
        "entity_xref_triples": docs_kg.entity_xref_triples, # get_alias_ids (M7)
        "kg_triples": docs_kg.kg_triples,                   # flagship union
        "kg_triples_nt": _kg_triples_nt,                    # N-Triples sink+source round trip
        "resolve_route": docs_kg.resolve_route,             # §2.8 routing tree
        "format_entities": docs_kg.formatted_entities,      # default_format (J1+rules)
        "format_entities_unique": docs_kg.formatted_entities_unique,  # Strategy.UNIQUE
        "failed_entities_unique": docs_kg.failed_entities_unique,     # failed sink
        "canonical_merge": docs_kg.canonical_merge,         # A1 dedup aggregation
        "curie_validate": docs_kg.curie_validate,           # M2
        "curie_parse": docs_kg.curie_parse,                 # M3
        # --- graph analytics over the constructed KG ---
        "entity_cooccurrence": graph.entity_cooccurrence,   # two-exchange pairs
        "kg_degrees": graph.kg_degrees,                     # combiner + exchange
        "kg_pagerank": graph.kg_pagerank,                   # integer msg-passing
        # --- text analysis (training-data ops) ---
        "doc_stats": docs_text.doc_stats,
        "doc_quality": docs_text.doc_quality,               # Gopher repetition bands
        "lang_stats": docs_text.lang_stats,
        "token_freq": docs_text.token_freq,
        "top_tokens_per_lang": docs_text.top_tokens_per_lang,  # grouped top-k
        "lang_id": docs_text.lang_id,
        "lang_id_jsonl": _lang_id_jsonl,                    # JSONL sink+source round trip
        "sample_docs": docs_text.sample_docs,               # hash-threshold sample
        "doc_embedding_join": docs_text.doc_embedding_join, # broadcast hash join
        "fingerprints": docs_text.fingerprints,             # SQL-recomputed oracle
        "source_lang_matrix": docs_text.source_lang_matrix,  # pivot / wide aggregate
        "doc_rollup": docs_text.doc_rollup,                 # GROUPING SETS one-pass
        "code_token_stats": _code_token_stats,              # BPE-ish regex counting
        # --- training-data prep (pipelines/docs_train.py) ---
        "pii_scrub": docs_train.pii_scrub,                  # RE2 redaction map
        "doc_pack": docs_train.doc_pack,                    # distributed prefix-sum
        "tfidf_top_terms": docs_train.tfidf_top_terms,      # int tf-idf top-k
        "lang_token_sketch": docs_train.lang_token_sketch,  # HLL registers
        "embedding_quantize": docs_train.embedding_quantize,  # int8 fixed-point
        "stratified_sample": docs_train.stratified_sample,  # per-lang rates
        "decontaminate": docs_train.decontaminate,          # eval n-gram overlap flag
        # --- dedup family ---
        "dedup_exact": docs_text.dedup_exact,
        "dedup_jaccard_adjacent": docs_text.dedup_jaccard_adjacent,
        "dedup_minhash": docs_text.dedup_minhash,           # SQL-recomputed oracle
        "dedup_clusters": docs_text.dedup_clusters,         # CC cluster resolution
        "dedup_simhash": docs_text.dedup_simhash,           # SQL-recomputed oracle
        "dedup_simhash_pairs": docs_text.dedup_simhash_pairs,  # hamming verify
        "dedup_embedding": docs_text.dedup_embedding,       # LSH + SQL oracle
        # --- similarity search ---
        "knn_brute": docs_text.knn_brute,
        "knn_lsh": docs_text.knn_lsh,                       # LSH-probed, SQL oracle
        "knn_ivf": docs_text.knn_ivf,                       # expected-parquet oracle
        # --- multimodal plumbing (decode stubbed; see stages/multimodal) ---
        "media_featurize": _media_featurize,                # expected-parquet oracle
        "media_transform": _media_transform,                # resize/clip/re-encode
        # --- relational big⋈big family (pipelines/relational.py) ---
        "pricing_summary": relational.pricing_summary,      # Q1-shaped combiner agg
        "revenue_by_nation": relational.revenue_by_nation,  # 2-hop shuffle join chain
        "big_orders": relational.big_orders,                # agg -> HAVING -> join back
        "priority_semi_counts": relational.priority_semi_counts,  # semi join (EXISTS)
        "customers_without_urgent": relational.customers_without_urgent,  # anti join
        "order_discounted_revenue": relational.order_discounted_revenue,  # LEFT OUTER join
        "customer_order_profile": relational.customer_order_profile,  # FULL OUTER join
        "order_price_quantiles": relational.order_price_quantiles,  # exact dist. quantiles
        "order_price_quantiles_approx": relational.order_price_quantiles_approx,  # sketch
        "top_revenue_customers": relational.top_revenue_customers,  # global top-N
        "customer_running_revenue": relational.customer_running_revenue,  # window fns
        # --- stream-shaped ---
        "events_hourly": events.hourly_windows,
        "events_sliding": events.sliding_windows,
        "events_asof": events.asof_join,                    # as-of join via exchange
        "events_range_join": events.range_join,             # range join aggregate
        "events_sessionize": events.sessionize,
        "events_funnel": events.funnel,                     # click->purchase funnel
        "event_type_distinct_users": events.event_type_distinct_users,  # exact COUNT DISTINCT
        # --- flagship corpus pipeline (sharded + resumable; hash-checked
        #     against the closed-form expected parquet, scale-coupled) ---
        "corpus_kg_triples": _corpus_kg_triples,
    }


def _lang_id_jsonl(sf_dir: str):
    """documents round-tripped through the distributed JSONL sink/source,
    then the lang_id pipeline over the re-read table — hash-checked under
    the SAME oracle as lang_id (the round trip must be lossless)."""
    import hashlib
    import os
    import shutil

    from ontology_matcher_ray.pipelines.docs_text import lang_id, read_documents
    from ontology_matcher_ray.sources.io import read_jsonl, write_jsonl

    out = "/tmp/onto_ray_entry/jsonl_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if os.path.isdir(out):
        shutil.rmtree(out)
    write_jsonl(read_documents(sf_dir), out)

    import ray.data as rd

    # run lang_id's own stage over the re-read docs: reuse the pipeline
    # by pointing it at a directory shaped like an sf dir
    tbl_dir = out + "_sf"
    if os.path.isdir(tbl_dir):
        shutil.rmtree(tbl_dir)
    os.makedirs(tbl_dir)
    read_jsonl(out).write_parquet(os.path.join(tbl_dir, "documents.parquet"))
    return lang_id(tbl_dir)


def _kg_triples_nt(sf_dir: str):
    """kg_triples written to a distributed N-Triples sink and read back —
    the sink/source pair sits inside the hash-checked gate under the SAME
    SQL oracle as kg_triples (round trip must be lossless)."""
    import hashlib
    import os

    from ontology_matcher_ray.pipelines import docs_kg
    from ontology_matcher_ray.sources.io import read_ntriples, write_ntriples

    out = "/tmp/onto_ray_entry/nt_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if os.path.isdir(out):
        import shutil

        shutil.rmtree(out)
    write_ntriples(docs_kg.kg_triples(sf_dir), out)
    return read_ntriples(out)


def _corpus_kg_triples(sf_dir: str):
    """End-to-end corpus KG build at a scale derived from sf_dir: generate
    the deterministic source-code corpus under /tmp, run the sharded
    extract->link->dedup pipeline with lineage, return the triples."""
    import os
    import shutil

    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.pipelines import corpus_kg
    from ontology_matcher_ray.pipelines.docs_text import read_documents
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    n_docs = read_documents(sf_dir, columns=["doc_id"]).count()
    n_files = max(2000, n_docs * 4)
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=2000, seed=42)
    base = f"/tmp/onto_ray_entry/corpus_v{corpus_mod.CORPUS_VERSION}_{n_files}"
    corpus_mod.generate_corpus(base, n_files, snap)
    out = f"/tmp/onto_ray_entry/kg_{n_files}"
    if os.path.isdir(out):
        shutil.rmtree(out)
    corpus_kg.build_kg(base, out, snap, n_shards=2)
    return corpus_kg.read_triples(out)


def _code_token_stats(sf_dir: str):
    """BPE-ish token counting + char-class ratios over the deterministic
    source-code corpus at a FIXED 2000-file scale (like media_featurize's
    fixed 256 rows — the corpus is the input fixture here, sized
    identically at every sf so the oracle's Ray-free regeneration of the
    same rows stays scale-independent).  The DuckDB oracle recomputes
    every count with its own RE2 ``regexp_extract_all`` pass."""
    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.pipelines.docs_text import code_token_stats
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    snap = build_snapshot(DISEASE_SPEC, n_synthetic=2000, seed=42)
    base = f"/tmp/onto_ray_entry/corpus_v{corpus_mod.CORPUS_VERSION}_2000"
    corpus_mod.generate_corpus(base, 2000, snap)
    return code_token_stats(base)


def _media_featurize(sf_dir: str):
    """Binary-column pipeline: synthetic media table (REAL PPM/BMP/WAV
    payloads for image/audio, PPM-stream frames for video) sized from
    the documents row count -> actor-pool featurizer with genuine decode.

    The feature vector is finalized to a sha256 over its float32 bytes so
    EVERY output column — metadata, payload sha over the encoded
    container, decoded features — is value-hash comparable against the
    oracle's independent loop-and-struct recomputation
    (oracle.media_expected_parquet); the raw list<float> surface is
    exercised by tests/test_multimodal.py."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ontology_matcher_ray.pipelines.docs_text import read_documents
    from ontology_matcher_ray.stages.multimodal import (
        featurize_media,
        synthesize_media_table,
    )

    n = read_documents(sf_dir, columns=["doc_id"]).count()
    ds = rd.from_pandas(synthesize_media_table(min(n, 256)))

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "media_id": b["media_id"].astype("int64").to_numpy(),
            "kind": b["kind"].to_numpy(),
            "width": b["width"].astype("int64").to_numpy(),
            "height": b["height"].astype("int64").to_numpy(),
            "duration_ms": b["duration_ms"].astype("int64").to_numpy(),
            "payload_sha256": b["payload_sha256"].to_numpy(),
            "feat_sha256": [
                hashlib.sha256(np.asarray(f, dtype=np.float32).tobytes()).hexdigest()
                for f in b["feat"]
            ],
        })

    return featurize_media(ds).map_batches(finalize, batch_format="pandas")


def _media_transform(sf_dir: str):
    """Decode -> nearest-neighbor resize (images) / clip (audio) ->
    re-encode, over the same synthetic media table as media_featurize.
    The payload is finalized to a sha256 over the RE-ENCODED container
    bytes, so the whole decode->transform->encode round trip is
    value-hash-checked against the oracle's closed-form recomputation
    (oracle.media_transform_expected_parquet)."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from ontology_matcher_ray.pipelines.docs_text import read_documents
    from ontology_matcher_ray.stages.multimodal import (
        synthesize_media_table,
        transform_media,
    )

    n = read_documents(sf_dir, columns=["doc_id"]).count()
    ds = rd.from_pandas(synthesize_media_table(min(n, 256)))

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        out = b.drop(columns=["payload"]).copy()
        out["payload_sha256"] = [
            hashlib.sha256(p).hexdigest() for p in b["payload"]
        ]
        return out

    return transform_media(ds).map_batches(finalize, batch_format="pandas")


def oracle_sql() -> dict[str, str]:
    from ontology_matcher_ray.oracle import build_oracle_sql

    return build_oracle_sql()

"""Command-line surface, mirroring the reference CLI (``cli.py:55-330``).

Commands:
  ontology  — full pipeline: read entity file -> resolve -> format -> write
              (+ ``--reformat`` resume from the resolve checkpoint)
  dedup     — canonical-id merge over a formatted TSV (the reference's
              specified-but-stubbed semantics, cli.py:192-296)
  idtypes   — list supported databases for an ontology type
  template  — write an input template
  corpus-kg — corpus-scale KG build (generate/extract/link/dedup/write),
              sharded + resumable; the ``ray job submit`` entry point.
  corpus-dedup — cross-file duplicated-line (boilerplate) detection and
              removal over a code corpus (pipelines/corpus_curate).
  analyze   — training-prep / graph / relational operators over an sf
              table dir (see ``--op`` choices).

This module OWNS the Ray session (guarded init); library code never
initialises Ray.
"""

from __future__ import annotations

import argparse
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


# Sample rows per type (id, name) — the template itself is GENERATED from
# the spec (required columns + the type label + the id's own prefix as
# resource), the engine analogue of each */custom_types.py
# ``generate_template`` classmethod.
TEMPLATE_SAMPLES = {
    "disease": [("DOID:4001", "ovarian carcinoma"),
                 ("MESH:D015673", "Fatigue Syndrome, Chronic")],
    "gene": [("ENTREZ:7157", "tumor protein p53")],
    "compound": [("DrugBank:DB01628", "ETORICOXIB")],
    "metabolite": [("HMDB:HMDB0003345", "alpha-D-Glucose")],
    "symptom": [("UMLS:C0015672", "Fatigue")],
}


def render_template(ontology_type: str) -> str:
    """Header + sample rows derived from the OntologySpec (S7)."""
    from ontology_matcher_ray.schemas import REQUIRED_COLUMNS, SPECS

    spec = SPECS[ontology_type]
    lines = ["\t".join(REQUIRED_COLUMNS)]
    # a type registered without literal samples still gets a spec-derived
    # row, so extension types (schemas.py §2.9) need no table entry here
    samples = TEMPLATE_SAMPLES.get(ontology_type) or [
        (f"{spec.default}:0000001", f"example {spec.type.lower()}")
    ]
    for rid, name in samples:
        row = {
            "id": rid,
            "name": name,
            "label": spec.type,
            "resource": rid.split(":", 1)[0],
        }
        lines.append("\t".join(row[c] for c in REQUIRED_COLUMNS))
    return "\n".join(lines) + "\n"


def cmd_ontology(args) -> int:
    _ensure_ray()
    from ontology_matcher_ray.pipelines.ontology_match import run_ontology_match
    from ontology_matcher_ray.schemas import SPECS, Strategy
    from ontology_matcher_ray.state.snapshot import get_snapshot

    spec = SPECS[args.ontology_type]
    strategy = Strategy.UNIQUE if args.strategy == "unique" else Strategy.MIXTURE
    ckpt = args.checkpoint_dir or (args.output_file + ".ckpt")
    formatted, failed = run_ontology_match(
        args.input_file, args.output_file, get_snapshot(spec), spec,
        strategy=strategy, checkpoint_dir=ckpt, reformat=args.reformat,
        batch_size=getattr(args, "batch_size", 4096),
    )
    print(f"formatted={len(formatted)} failed={len(failed)} -> {args.output_file}")
    print_ontology_links(spec)
    return 0


def print_ontology_links(spec) -> None:
    """The reference's post-conversion links notice
    (``print_ontology_links``, ontology_formatter.py:346-356), including
    its every-database-has-a-link check."""
    missed = set(spec.choices) - set(spec.ontology_links)
    if missed:
        raise SystemExit(
            "Links of the following databases are missed: %s" % sorted(missed)
        )
    print(
        "NOTICE:\nYou can find more details on the following websites "
        "(NOTICE: We don't check whether an ID is valid; we simply attempt "
        "to map it to the default ontology database we have chosen):"
    )
    for key, value in spec.ontology_links.items():
        print(f"{key}: {value}")
    print()


def cmd_dedup(args) -> int:
    """Full dedup semantics (cli.py:192-296): per-label cascade (J3) +
    canonical merge (A1); labels without a registered ontology type pass
    through unmerged (cli.py:215-218)."""
    _ensure_ray()
    import pandas as pd

    from ontology_matcher_ray.pipelines.dedup_merge import dedup_cascade
    from ontology_matcher_ray.schemas import SPECS

    df = pd.read_csv(args.input_file, sep="\t", dtype=str).fillna("")
    for col in ["id", "label", "xrefs"]:
        if col not in df.columns:
            raise SystemExit(f"Cannot find the column {col} in the input file.")
    pieces = []
    for label in df["label"].unique():
        sub = df[df["label"] == label]
        spec = SPECS.get(str(label).lower())
        pieces.append(dedup_cascade(sub, spec) if spec else sub)
    res = pd.concat(pieces, ignore_index=True)
    res.to_csv(args.output_file, sep="\t", index=False)
    print(f"dedup: {len(df)} -> {len(res)} rows -> {args.output_file}")
    return 0


def cmd_idtypes(args) -> int:
    from ontology_matcher_ray.schemas import SPECS

    spec = SPECS[args.ontology_type]
    if getattr(args, "links", False):
        print_ontology_links(spec)
        print(f"database_url: {spec.database_url}")
    else:
        print("\n".join(spec.choices))
    return 0


def cmd_template(args) -> int:
    with open(args.output_file, "w") as f:
        f.write(render_template(args.ontology_type))
    print(f"template -> {args.output_file}")
    return 0


def cmd_corpus_kg(args) -> int:
    _ensure_ray()
    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.pipelines import corpus_kg
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    from ontology_matcher_ray.schemas import Strategy

    strategy = (
        Strategy.UNIQUE if getattr(args, "strategy", "mixture") == "unique"
        else Strategy.MIXTURE
    )
    if args.shards is not None and args.files_per_shard is not None:
        raise SystemExit(
            "corpus-kg: --shards and --files-per-shard are mutually "
            "exclusive (fixed-count vs fixed-size shard planning)"
        )
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=args.dict_size, seed=42)
    if args.generate:
        corpus_mod.generate_corpus(args.corpus_dir, args.n_files, snap)
    records = corpus_kg.build_kg(
        args.corpus_dir, args.output_dir, snap,
        n_shards=args.shards if args.shards is not None else 4,
        strategy=strategy, files_per_shard=args.files_per_shard,
        quarantine=args.quarantine,
    )
    triples = sum(r.triple_count for r in records)
    nq = sum(r.quarantined for r in records)
    extra = f" ({nq} corrupt inputs quarantined)" if nq else ""
    print(f"kg build: {len(records)} shards, {triples} triples"
          f"{extra} -> {args.output_dir}")
    if args.publish_base:
        from ontology_matcher_ray.pipelines.docs_kg import publish_triples

        stats = publish_triples(args.publish_base,
                                corpus_kg.read_triples(args.output_dir))
        from ontology_matcher_ray.sources import versioned as vt

        head = vt.list_versions(args.publish_base)[-1]
        per_op = {r.op: int(r.rows) for r in stats.itertuples()}
        print(f"kg publish: v{head} of {args.publish_base} "
              f"(+{per_op.get('add', 0)} / -{per_op.get('del', 0)} "
              f"triples; subj Bloom + tk zone maps on every part)")
    return 0


def cmd_corpus_dedup(args) -> int:
    """Cross-file duplicated-line curation: write the boilerplate table
    and the line-deduped corpus as partitioned parquet."""
    _ensure_ray()
    import os

    from ontology_matcher_ray.pipelines import corpus_curate

    bp_dir = os.path.join(args.output_dir, "boilerplate")
    clean_dir = os.path.join(args.output_dir, "clean")
    # materialize the (small: >=min_files survivors only) boilerplate
    # table ONCE and feed both the sink and the scrub pass — the corpus
    # is scanned twice total (count pass + scrub pass), never three times
    bp = corpus_curate.corpus_boilerplate(
        args.corpus_dir, args.min_files).materialize()
    bp.write_parquet(bp_dir)
    clean = corpus_curate.corpus_line_dedup(
        args.corpus_dir, args.min_files, boilerplate=bp)
    clean.write_parquet(clean_dir)
    print(f"corpus-dedup: {bp.count()} boilerplate lines -> {bp_dir}; "
          f"cleaned corpus -> {clean_dir}")
    return 0


# one registry: op name -> (pipelines submodule, function, description).
# Adding an op family is one row here, nothing else.
ANALYZE_OPS = {
    # training-data prep
    "pii-scrub": ("docs_train", "pii_scrub", "redact emails/phones"),
    "pack": ("docs_train", "doc_pack", "concat-and-chunk sequence packing"),
    "tfidf": ("docs_train", "tfidf_top_terms", "per-doc salient terms"),
    "sketch": ("docs_train", "lang_token_sketch",
               "per-language HLL distinct-token registers"),
    "quantize": ("docs_train", "embedding_quantize",
                 "int8 embedding quantization"),
    "curate": ("docs_train", "curate_decisions",
               "end-to-end curation decision per doc (dedup+quality+"
               "decon+prior)"),
    "curate-text": ("docs_train", "curate_text",
                    "PII-scrubbed text of curation survivors"),
    "dsir": ("docs_train", "dsir_importance",
             "DSIR-shaped bigram importance score vs the eval slice"),
    "lm-ppl": ("docs_train", "lm_perplexity",
               "CCNet-style bigram-LM cross-entropy (perplexity filter)"),
    "bm25": ("docs_train", "bm25_scores",
             "Okapi BM25 relevance to the fixed retrieval query"),
    "lm-ppl-buckets": ("docs_train", "lm_ppl_buckets",
                       "CCNet head/middle/tail corpus split by LM "
                       "cross-entropy quantiles"),
    "chunk": ("docs_train", "chunk_documents",
              "RAG-style overlapping token-window chunking"),
    "cov": ("docs_train", "embedding_covariance",
            "integer-exact embedding second-moment (covariance) table"),
    "pca": ("docs_train", "embedding_pca",
            "embedding PCA spectrum from the distributed moment table"),
    "sample-k": ("docs_train", "sample_fixed_k",
                 "exactly-k-per-language deterministic sample"),
    "knn-join": ("docs_text", "knn_join",
                 "bulk IVF kNN join: top-k neighbors for EVERY vector "
                 "via one centroid-keyed exchange"),
    "xref-clusters": ("graph", "xref_entity_clusters",
                      "transitive ontology-merge components over xrefs"),
    "kcore": ("graph", "kg_kcore",
              "per-node coreness over the co-occurrence graph"),
    "debounce": ("events", "debounce",
                 "suppress duplicate event bursts per (user, type) stream"),
    "compact": ("events", "compact_latest",
                "latest-wins changelog compaction per (user, type)"),
    "reach": ("graph", "kg_reach",
              "per-node 2-hop reachability count over the KG"),
    "triangles": ("graph", "kg_triangles",
                  "per-entity triangle counts over the co-occurrence graph"),
    "shuffle": ("docs_train", "shuffle_shards",
                "deterministic seeded epoch-shuffle shard assignment"),
    "bpe": ("docs_train", "bpe_merges",
            "first-k distributed BPE tokenizer merges"),
    "bpe-encode": ("docs_train", "bpe_encode",
                   "per-doc BPE token counts (train + memoized apply)"),
    "sample": ("docs_train", "stratified_sample",
               "per-language stratified hash sample"),
    "centroids": ("docs_train", "embedding_centroids",
                  "per-language mean-embedding prototypes (integer-exact)"),
    "source-kl": ("docs_train", "source_kl",
                  "per-source KL divergence to the corpus mixture"),
    "mixture": ("docs_train", "mixture_weights",
                "capped per-language data-mixing sampling weights"),
    "substring-dups": ("docs_text", "dedup_substring",
                       "exact duplicated-span pairs (Lee-et-al-style)"),
    "incremental-dups": ("docs_text", "dedup_incremental",
                         "flag docs already in the prior snapshot"),
    "semdedup": ("docs_text", "dedup_semdedup",
                 "k-means-blocked semantic near-dup pairs (SemDeDup)"),
    "semdedup-keep": ("docs_text", "semdedup_keep",
                      "per-vector SemDeDup pruning decision (cluster+keep)"),
    "inverted-index": ("docs_text", "inverted_index",
                       "token -> sorted postings list with df band"),
    "heavy-hitters": ("docs_text", "token_heavy_hitters",
                      "frequent tokens via two-pass Misra-Gries sketch"),
    "contexts": ("docs_kg", "mention_contexts",
                 "per-occurrence KWIC evidence windows for KG provenance"),
    "kg-delta": ("docs_kg", "kg_delta",
                 "snapshot triple diff (add/del) vs the even-doc half"),
    # graph analytics
    "cooccur": ("graph", "entity_cooccurrence", "entity co-occurrence pairs"),
    "degrees": ("graph", "kg_degrees", "node in/out degrees"),
    "pagerank": ("graph", "kg_pagerank",
                 "integer PageRank over the entity graph"),
    "pagerank-pinned": ("graph", "kg_pagerank_pinned",
                        "same ranks via pinned-partition Pregel actors"),
    "link-predict": ("graph", "kg_link_prediction",
                     "Adamic-Adar link-prediction scores over the "
                     "co-occurrence graph"),
    "retention": ("events", "user_retention",
                  "cohort retention: distinct users per (cohort, age)"),
    "transitions": ("events", "event_transition_matrix",
                    "per-user Markov transition counts between event types"),
    # relational
    "pricing": ("relational", "pricing_summary", "wide aggregate over lineitem"),
    "revenue": ("relational", "revenue_by_nation",
                "shuffle-join chain + broadcast dim"),
    "big-orders": ("relational", "big_orders", "agg -> HAVING -> join back"),
    "semi": ("relational", "priority_semi_counts", "EXISTS semi join counts"),
    "anti": ("relational", "customers_without_urgent", "NOT EXISTS anti join"),
    "quantiles": ("relational", "order_price_quantiles",
                  "exact distributed quantiles"),
    "window": ("relational", "customer_running_revenue",
               "row_number + running sum"),
    "top-customers": ("relational", "top_revenue_customers",
                      "global top-N by revenue"),
    "left-join": ("relational", "order_discounted_revenue",
                  "LEFT OUTER join: per-order discount-free revenue "
                  "(skew-adaptive: sampled heavy keys broadcast map-side)"),
    "scan": ("events", "global_scan",
             "global ordered scan: running totals + watermark + late flags"),
    "bfs": ("graph", "kg_bfs_dist",
            "BFS hop distance from seed docs over the constructed KG"),
    "dq": ("relational", "referential_orphans",
           "FK integrity audit: distinct keys + orphan counts per relation"),
    "jaccard-all": ("docs_text", "dedup_jaccard_all",
                    "EXACT all-pairs Jaccard >= 0.8 via prefix filtering"),
    # documents / events analytics
    "pivot": ("docs_text", "source_lang_matrix",
              "source x language count matrix"),
    "rollup": ("docs_text", "doc_rollup", "GROUPING-SETS doc counts"),
    "funnel": ("events", "funnel", "click->purchase conversion per user"),
    "props-stats": ("events", "event_props_stats",
                    "typed props.k field stats per event type"),
    "distinct-users": ("events", "event_type_distinct_users",
                       "exact distinct users per event type"),
}


def cmd_ivf(args) -> int:
    """Build or query the disk-backed IVF vector index (one
    range-partitioned directory per cluster + centroid sidecar)."""
    _ensure_ray()
    from ontology_matcher_ray.pipelines.docs_text import (
        _query_vectors,
        read_embeddings,
    )
    from ontology_matcher_ray.stages import ann

    if args.build:
        ds = read_embeddings(args.sf_dir, columns=["vec_id", "embedding"])
        stats = ann.build_ivf_index(ds, args.index_dir, nlist=args.nlist)
        print(f"ivf build: {int(stats['rows'].sum())} vectors in "
              f"{len(stats)} clusters -> {args.index_dir}")
        return 0
    qids, qmat = _query_vectors(args.sf_dir, args.n_queries)
    res = ann.ivf_query_index(args.index_dir, qmat, qids,
                              top_k=args.top_k, nprobe=args.nprobe)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.output_dir, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                   os.path.join(args.output_dir, "part-0.parquet"))
    print(f"ivf query: {len(res)} rows -> {args.output_dir}")
    return 0


def cmd_layout(args) -> int:
    """Storage-layout maintenance over a parquet directory: small-file
    compaction, Z-order clustering, zone-map file-skipping scans
    (sources/layout.py)."""
    _ensure_ray()
    from ontology_matcher_ray.sources import layout

    if args.action == "compact":
        stats = layout.compact_parquet(
            args.input_dir, args.output_dir,
            target_bytes=args.target_mb * 1024 * 1024,
            stat_cols=args.stat_cols.split(",") if args.stat_cols else None)
        print(f"compact: {int(stats['n_inputs'].sum())} inputs -> "
              f"{len(stats)} parts this run -> {args.output_dir}")
    elif args.action == "zorder":
        from ontology_matcher_ray.sources.io import read_parquet_clean

        ds = read_parquet_clean(args.input_dir)
        stats = layout.write_zordered(
            ds, args.output_dir, cols=args.cols.split(","),
            num_files=args.num_files)
        print(f"zorder: {int(stats['rows'].sum())} rows -> "
              f"{len(stats)} Z-clustered parts -> {args.output_dir}")
    elif args.action == "vacuum":
        counts = layout.vacuum(args.input_dir)
        print(f"vacuum: removed {counts['tmp']} tmp, {counts['old']} old, "
              f"{counts['orphan_sidecars']} orphan sidecars "
              f"under {args.input_dir}")
    elif args.action == "merge":
        from ontology_matcher_ray.sources.io import read_parquet_clean

        stats = layout.merge_into_range_partitioned(
            args.input_dir, read_parquet_clean(args.changes))
        print(f"merge: {int(stats['upserts'].sum())} upserts, "
              f"{int(stats['deletes'].sum())} deletes across "
              f"{len(stats)} touched ranges of {args.input_dir}")
    else:  # scan
        if args.eq is not None:
            v = _coerce(args.eq)
            pruned = layout.prune_parts_eq(args.input_dir, args.col, v)
            n = layout.scan_eq(args.input_dir, args.col, v).count()
            what = "Bloom/zone maps"
        else:
            lo, hi = _coerce(args.lo), _coerce(args.hi)
            pruned = layout.prune_parts(args.input_dir, args.col, lo, hi)
            n = layout.scan_between(args.input_dir, args.col, lo, hi).count()
            what = "zone maps"
        print(f"scan: {n} rows; {what} skipped "
              f"{pruned['skipped']}/{pruned['total']} files")
    return 0


def _coerce(s: str):
    """CLI predicate bounds: int when it parses, else string."""
    try:
        return int(s)
    except ValueError:
        return s


def cmd_table(args) -> int:
    """Versioned (MVCC) table maintenance: create / merge / log /
    vacuum over a snapshot-isolated range-partitioned table
    (sources/versioned.py)."""
    _ensure_ray()
    from ontology_matcher_ray.sources import versioned as vt
    from ontology_matcher_ray.sources.io import read_parquet_clean

    if args.action == "create":
        blooms = [c for c in (args.bloom_cols or "").split(",") if c]
        stats = vt.create_versioned(
            read_parquet_clean(args.input_dir), args.base, args.key,
            num_ranges=args.num_ranges, bloom_cols=blooms or None)
        print(f"table create: v1 with {int(stats['rows'].sum())} rows in "
              f"{len(stats)} ranges -> {args.base}")
    elif args.action == "merge":
        stats = vt.merge_versioned(
            args.base, read_parquet_clean(args.changes),
            allow_new_columns=args.allow_new_columns)
        head = vt.list_versions(args.base)[-1]
        print(f"table merge: v{head} ({int(stats['upserts'].sum())} "
              f"upserts, {int(stats['deletes'].sum())} deletes, "
              f"{len(stats)} ranges rewritten)")
    elif args.action == "log":
        for v in vt.list_versions(args.base):
            m = vt.load_manifest(args.base, v)
            print(f"v{v}: op={m['op']} parent={m['parent']} "
                  f"ranges={len(m['ranges'])}")
    elif args.action == "recut":
        stats = vt.recut_versioned(args.base, num_ranges=args.num_ranges)
        head = vt.list_versions(args.base)[-1]
        print(f"table recut: v{head} rebalanced into {len(stats)} ranges "
              f"(max {int(stats['rows'].max())} rows)")
    elif args.action == "probe":
        if not args.col or args.value is None:
            raise SystemExit("probe needs --col and --value")
        # coerce the CLI string to the column's stored type
        import pyarrow as pa
        import pyarrow.parquet as pq

        m = vt.load_manifest(args.base, args.version)
        any_part = os.path.join(args.base, "parts",
                                next(iter(m["ranges"].values())))
        sch = pq.read_schema(any_part)
        val = args.value
        if args.col in sch.names:
            t = sch.field(args.col).type
            if pa.types.is_integer(t):
                val = int(val)
            elif pa.types.is_floating(t):
                val = float(val)
        n = vt.read_versioned_eq(args.base, args.col, val,
                                 version=args.version).count()
        print(f"table probe: {n} rows with {args.col} == {val!r}")
    else:  # vacuum
        out = vt.vacuum_versions(args.base, keep_last=args.keep_last)
        print(f"table vacuum: dropped {out['versions_dropped']} versions, "
              f"deleted {out['parts_deleted']} parts")
    return 0


def cmd_analyze(args) -> int:
    """Run an analytics/training-prep operator over an sf-style table
    directory and write partitioned Parquet."""
    import importlib

    _ensure_ray()
    module_name, attr, _desc = ANALYZE_OPS[args.op]
    mod = importlib.import_module(f"ontology_matcher_ray.pipelines.{module_name}")
    res = getattr(mod, attr)(args.sf_dir)
    if hasattr(res, "materialize"):
        ds = res.materialize()          # one execution: write + count
        if args.range_key:
            from ontology_matcher_ray.sources.io import write_range_partitioned

            write_range_partitioned(ds, args.output_dir, args.range_key,
                                    num_ranges=args.num_ranges)
        else:
            ds.write_parquet(args.output_dir)
        n = ds.count()
    else:                               # bounded driver-side result (top-N)
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(args.output_dir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                       os.path.join(args.output_dir, "part-0.parquet"))
        n = len(res)
    print(f"{args.op}: {n} rows -> {args.output_dir}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="onto-match-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    po = sub.add_parser("ontology", help="Convert ontology ids.")
    po.add_argument("--input-file", "-i", required=True)
    po.add_argument("--output-file", "-o", required=True)
    po.add_argument("--ontology-type", "-O", required=True,
                    choices=["disease", "gene", "compound", "metabolite", "symptom"])
    po.add_argument("--strategy", choices=["mixture", "unique"], default="mixture")
    po.add_argument("--checkpoint-dir", default=None)
    po.add_argument("--reformat", "-r", action="store_true")
    # reference CLI option parity (cli.py:77-78,103): --batch-size maps to
    # the resolve-stage Ray batch size; the network-era knobs are accepted
    # as no-ops so existing invocations keep working offline
    po.add_argument("--batch-size", "-b", type=int, default=4096,
                    help="rows per resolve batch (reference cli.py:77)")
    po.add_argument("--sleep-time", "-s", type=int, default=0,
                    help="ignored offline (reference rate-limit knob)")
    po.add_argument("--disable-cache", action="store_true",
                    help="ignored offline (reference sqlite-cache knob)")
    po.set_defaults(fn=cmd_ontology)

    pd_ = sub.add_parser("dedup", help="Merge duplicated ids into one.")
    pd_.add_argument("--input-file", "-i", required=True)
    pd_.add_argument("--output-file", "-o", required=True)
    pd_.set_defaults(fn=cmd_dedup)

    pi = sub.add_parser("idtypes", help="Which ID types are supported.")
    pi.add_argument("--ontology-type", "-O", required=True,
                    choices=["disease", "gene", "compound", "metabolite", "symptom"])
    pi.add_argument("--links", action="store_true",
                    help="print per-database ontology URLs + the upstream "
                         "database_url instead of the bare prefixes")
    pi.set_defaults(fn=cmd_idtypes)

    pt = sub.add_parser("template", help="Generate input file template.")
    pt.add_argument("--ontology-type", "-O", required=True,
                    choices=["disease", "gene", "compound", "metabolite", "symptom"])
    pt.add_argument("--output-file", "-o", required=True)
    pt.set_defaults(fn=cmd_template)

    pc = sub.add_parser("corpus-kg", help="Corpus-scale KG build (resumable).")
    pc.add_argument("--corpus-dir", required=True)
    pc.add_argument("--output-dir", required=True)
    pc.add_argument("--generate", action="store_true")
    pc.add_argument("--n-files", type=int, default=100000)
    pc.add_argument("--dict-size", type=int, default=100000)
    pc.add_argument("--shards", type=int, default=None,
                    help="fixed shard COUNT (default 4); exclusive with "
                         "--files-per-shard")
    pc.add_argument("--files-per-shard", type=int, default=None,
                    help="fixed-size shard planning for incremental ingest "
                         "(append files + rerun = only new/changed shards)")
    pc.add_argument("--strategy", choices=["mixture", "unique"], default="mixture")
    pc.add_argument("--quarantine", action="store_true",
                    help="pre-validate input files; exclude corrupt parts "
                         "into _manifest/quarantine.jsonl instead of "
                         "failing the shard")
    pc.add_argument("--publish-base", default=None,
                    help="also publish the built triples into this MVCC "
                         "versioned table (one atomic snapshot per "
                         "rebuild; incremental diff after the first)")
    pc.set_defaults(fn=cmd_corpus_kg)

    pd_ = sub.add_parser(
        "corpus-dedup",
        help="Cross-file duplicated-line (boilerplate) detection/removal.",
    )
    pd_.add_argument("--corpus-dir", required=True)
    pd_.add_argument("--output-dir", required=True)
    pd_.add_argument("--min-files", type=int, default=8,
                     help="a line in >= this many files is boilerplate")
    pd_.set_defaults(fn=cmd_corpus_dedup)

    pa_ = sub.add_parser(
        "analyze",
        help="Training-prep / graph-analytics operators over an sf table dir.",
    )
    pa_.add_argument("--sf-dir", required=True,
                     help="directory holding documents.parquet / embeddings.parquet")
    pa_.add_argument("--output-dir", required=True)
    pa_.add_argument("--op", required=True, choices=sorted(ANALYZE_OPS))
    pa_.add_argument("--range-key", default=None,
                     help="write range-partitioned sorted parquet keyed "
                          "by this column (resumable: reruns skip "
                          "completed range dirs)")
    pa_.add_argument("--num-ranges", type=int, default=16,
                     help="key ranges for --range-key (default 16)")
    pa_.set_defaults(fn=cmd_analyze)

    pv = sub.add_parser(
        "ivf", help="Disk-backed IVF vector index: build once, query "
                    "with storage-level cluster pruning.")
    pv.add_argument("--sf-dir", required=True)
    pv.add_argument("--index-dir", required=True)
    pv.add_argument("--build", action="store_true",
                    help="build the index (default: query it)")
    pv.add_argument("--nlist", type=int, default=16)
    pv.add_argument("--nprobe", type=int, default=4)
    pv.add_argument("--top-k", type=int, default=5)
    pv.add_argument("--n-queries", type=int, default=4)
    pv.add_argument("--output-dir", default="/tmp/ivf_query_out",
                    help="query-result parquet dir (query mode)")
    pv.set_defaults(fn=cmd_ivf)

    pl = sub.add_parser(
        "layout", help="Storage layout: compact small parquet parts, "
                       "Z-order cluster, zone-map pruned scan.")
    pl.add_argument("action",
                    choices=["compact", "zorder", "scan", "merge",
                             "vacuum"])
    pl.add_argument("--input-dir", required=True)
    pl.add_argument("--output-dir",
                    help="compact/zorder destination directory")
    pl.add_argument("--target-mb", type=int, default=128,
                    help="compact: target part size")
    pl.add_argument("--stat-cols",
                    help="compact: comma-separated zone-map columns")
    pl.add_argument("--cols",
                    help="zorder: comma-separated clustering columns")
    pl.add_argument("--num-files", type=int, default=32,
                    help="zorder: output part count")
    pl.add_argument("--changes",
                    help="merge: parquet path/dir of the changeset "
                         "(table columns + _op upsert|delete)")
    pl.add_argument("--col", help="scan: predicate column")
    pl.add_argument("--lo", help="scan: lower bound (inclusive)")
    pl.add_argument("--hi", help="scan: upper bound (inclusive)")
    pl.add_argument("--eq", help="scan: equality probe (uses the Bloom "
                                 "sidecar when the column has one)")
    pl.set_defaults(fn=cmd_layout)

    ptb = sub.add_parser(
        "table", help="Versioned (MVCC) table: snapshot-isolated "
                      "create/merge, version log, vacuum.")
    ptb.add_argument("action", choices=["create", "merge", "log",
                                        "vacuum", "recut", "probe"])
    ptb.add_argument("--base", required=True,
                     help="versioned table directory")
    ptb.add_argument("--input-dir", help="create: source parquet dir")
    ptb.add_argument("--key", help="create: partition/primary key column")
    ptb.add_argument("--num-ranges", type=int, default=16)
    ptb.add_argument("--changes",
                     help="merge: parquet dir of the changeset "
                          "(table columns + _op upsert|delete)")
    ptb.add_argument("--keep-last", type=int, default=2,
                     help="vacuum: versions to retain")
    ptb.add_argument("--bloom-cols", default="",
                     help="create: comma list of Bloom sidecar columns")
    ptb.add_argument("--allow-new-columns", action="store_true",
                     help="merge: accept changeset columns absent from "
                          "the table (schema evolution; old rows read "
                          "them as typed nulls)")
    ptb.add_argument("--col", help="probe: column to point-probe")
    ptb.add_argument("--value", help="probe: value (col == value)")
    ptb.add_argument("--version", type=int, default=None,
                     help="probe: pin a snapshot (default head)")
    ptb.set_defaults(fn=cmd_table)

    args = p.parse_args(argv)
    if getattr(args, "fn", None) is cmd_table:
        need = {"create": ["input_dir", "key"], "merge": ["changes"],
                "log": [], "vacuum": [], "recut": [],
                "probe": ["col", "value"]}[args.action]
        missing = [n for n in need if getattr(args, n) in (None, "")]
        if missing:
            p.error(f"table {args.action} requires "
                    + ", ".join("--" + n.replace("_", "-") for n in missing))
    if getattr(args, "fn", None) is cmd_layout:
        need = {"compact": ["output_dir"], "zorder": ["output_dir", "cols"],
                "scan": ["col"], "merge": ["changes"],
                "vacuum": []}[args.action]
        if args.action == "scan" and args.eq is None and (
                args.lo is None or args.hi is None):
            p.error("layout scan requires --lo/--hi or --eq")
        missing = [n for n in need if getattr(args, n) in (None, "")]
        if missing:
            p.error(f"layout {args.action} requires "
                    + ", ".join("--" + n.replace("_", "-") for n in missing))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

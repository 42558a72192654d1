"""Benchmark harness: headline corpus-KG build + per-query timings.

Prints ONE JSON line:
  {"metric": "kg_build_sec", "value": <min headline sec>, "unit": "sec",
   "queries": {...per-query min sec...}, "sf": <dir>, "num_cpus": N,
   "triples": T, "triples_per_sec": R, "repeats": N_reps,
   "headline_samples": [...]}

The headline and every per-query timing are MIN-OF-N over
GRAFT_BENCH_REPEATS (default 2) fresh-Ray-session repeats — this host's
shot-to-shot noise reaches ~3x (BASELINE.md), so single-shot numbers are
not comparable across rounds.

``--stats NAME`` runs ONE benched query, materializes it, and dumps
Ray's per-operator wall/cpu/UDF-time breakdown (``Dataset.stats()``) to
stderr — the measure-don't-guess loop as a first-class mode.

``--scaling`` runs the headline job twice in FRESH processes (default
num_cpus=4 then num_cpus=16; GRAFT_SCALING_CPUS overrides) on the same
pre-generated input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N cluster-size criterion; see
BASELINE.md).

Env knobs: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), GRAFT_CORPUS_FILES (default 120000), GRAFT_DICT_SIZE
(default 200000 synthetic xref entries).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    """Min-of-N headline + per-query timings (N = GRAFT_BENCH_REPEATS,
    default 2), each repeat in a FRESH Ray session.

    This host's shot-to-shot noise is documented at up to ~3x for
    identical code (BASELINE.md "Host-speed drift": 36.1 s vs 92.9 s
    eleven minutes apart), so a single-shot bench number is mostly a
    host-state sample; the per-repeat minimum is the standard
    least-interference estimator for a deterministic workload.  The JSON
    carries ``repeats`` plus all raw headline samples so cross-round
    comparisons can see the spread.
    """
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    if repeats < 1:
        raise SystemExit(f"GRAFT_BENCH_REPEATS must be >= 1, got {repeats}")
    runs = [_bench_once() for _ in range(repeats)]
    best = min(runs, key=lambda r: r["value"])
    out = dict(best)
    out["repeats"] = repeats
    out["headline_samples"] = [r["value"] for r in runs]
    # per-query minima across repeats (queries are independent timings)
    out["queries"] = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    out["triples_per_sec"] = round(out["triples"] / out["value"], 1)
    return out


def _bench_once(stats_query: str | None = None) -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_files = int(os.environ.get("GRAFT_CORPUS_FILES", "400000"))
    dict_size = int(os.environ.get("GRAFT_DICT_SIZE", "200000"))
    body_lines = int(os.environ.get("GRAFT_BODY_LINES", "30"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    # empty exchange partitions make Ray's sort emit schema-less empty
    # blocks; the resulting "RefBundle with a different schema" WARNINGs
    # are harmless tail noise — keep the bench line parseable
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # polars block sort: ~1.6x faster exchanges on string-key blocks
    ctx.use_polars_sort = True

    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.pipelines import (
        corpus_curate,
        corpus_kg,
        docs_kg,
        docs_text,
        docs_train,
        events,
        graph,
        relational,
    )
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    # ---- setup (untimed): snapshot + corpus, cached across runs ----
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=dict_size, seed=42)
    corpus_dir = (
        f"/tmp/onto_ray_bench/corpus_g{corpus_mod.CORPUS_VERSION}"
        f"_{n_files}_{body_lines}"
    )
    corpus_mod.generate_corpus(corpus_dir, n_files, snap, body_lines=body_lines)
    # warm the page cache so we measure compute+shuffle, not first disk
    # read.  NOTE: count() on parquet is metadata-only (reads no data);
    # an actual consuming scan is required to fault the bytes in.
    import pandas as _pd

    import ray.data as rd

    rd.read_parquet(corpus_dir).map_batches(
        lambda b: _pd.DataFrame({"n": [len(b)]}), batch_format="pandas"
    ).sum("n")

    # ---- headline: corpus KG build (timed) ----
    out_dir = f"/tmp/onto_ray_bench/kg_out_{num_cpus}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    n_shards = int(os.environ.get("GRAFT_KG_SHARDS", "4"))
    # The generated corpus guarantees one row per (repo, path) subject
    # (corpus.py: the path embeds the file index), so the caller-declared
    # unique-subjects invariant holds and the provably-no-op global dedup
    # exchange is skipped (corpus_kg._shard_pipeline docs).  Set
    # GRAFT_UNIQUE_SUBJECTS=0 to measure the exchange-on path.
    uniq = os.environ.get("GRAFT_UNIQUE_SUBJECTS", "1") == "1"
    if stats_query is None:
        t0 = time.time()
        records = corpus_kg.build_kg(corpus_dir, out_dir, snap,
                                     n_shards=n_shards, unique_subjects=uniq)
        headline = time.time() - t0
        triples = sum(r.triple_count for r in records)
    else:
        headline, triples = 0.0, 0

    # ---- per-query timings over the sf tables ----
    def consume(res):
        if hasattr(res, "to_pandas"):
            return len(res.to_pandas())
        return len(res)

    query_fns = {
        "kg_triples": lambda: docs_kg.kg_triples(sf_dir),
        "format_entities": lambda: docs_kg.formatted_entities(sf_dir),
        "canonical_merge": lambda: docs_kg.canonical_merge(sf_dir),
        "doc_stats": lambda: docs_text.doc_stats(sf_dir),
        "dedup_exact": lambda: docs_text.dedup_exact(sf_dir),
        "dedup_minhash": lambda: docs_text.dedup_minhash(sf_dir),
        # EXACT all-pairs similarity join (prefix filter, full recall)
        "dedup_jaccard_all": lambda: docs_text.dedup_jaccard_all(sf_dir),
        "knn_brute": lambda: docs_text.knn_brute(sf_dir),
        "events_sessionize": lambda: events.sessionize(sf_dir),
        # pinned-partition (Pregel-actor) engine: bit-identical ranks to
        # the per-iteration exchange engine (tests/test_graph.py parity),
        # ~1.3x faster (edges shuffle once, not once per iteration)
        "kg_pagerank": lambda: graph.kg_pagerank_pinned(sf_dir),
        "doc_pack": lambda: docs_train.doc_pack(sf_dir),
        "shuffle_shards": lambda: docs_train.shuffle_shards(sf_dir),
        # bounded transitive closure (2-hop reach) over the KG
        "kg_reach": lambda: graph.kg_reach(sf_dir),
        # degree-ordered wedge-join triangle counting over the
        # co-occurrence graph
        "kg_triangles": lambda: graph.kg_triangles(sf_dir),
        "tfidf_top_terms": lambda: docs_train.tfidf_top_terms(sf_dir),
        "pricing_summary": lambda: relational.pricing_summary(sf_dir),
        "revenue_by_nation": lambda: relational.revenue_by_nation(sf_dir),
        "priority_semi_counts": lambda: relational.priority_semi_counts(sf_dir),
        "order_price_quantiles": lambda: relational.order_price_quantiles(sf_dir),
        "customer_running_revenue": lambda: relational.customer_running_revenue(sf_dir),
        # skew-adaptive hybrid join (sampled heavy keys -> broadcast path)
        "order_discounted_revenue": lambda: relational.order_discounted_revenue(sf_dir),
        # global ordered scan (range-bucket prefix scan + driver carry)
        "events_global_scan": lambda: events.global_scan(sf_dir),
        "events_funnel": lambda: events.funnel(sf_dir),
        # end-to-end curation: near-dup CC + quality + decon + prior
        # flags joined into one decision per doc
        "curate": lambda: docs_train.curate_decisions(sf_dir),
        "token_heavy_hitters": lambda: docs_text.token_heavy_hitters(sf_dir),
        # postings-list build (distinct pairs -> one token exchange ->
        # local df + band filter + sorted join)
        "inverted_index": lambda: docs_text.inverted_index(sf_dir),
        # BPE train (k merges over the distinct-word table) + shuffle-free
        # memoized apply over every document
        "bpe_encode": lambda: docs_train.bpe_encode(sf_dir),
        # CCNet-style bigram-LM cross-entropy (perplexity filter)
        "lm_ppl": lambda: docs_train.lm_perplexity(sf_dir),
        # cross-file duplicated-line (boilerplate) removal over the
        # headline code corpus itself
        "corpus_line_dedup": lambda: corpus_curate.corpus_line_dedup(
            corpus_dir, min_files=max(8, n_files // 500)),
    }
    if stats_query is None and os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        # scaling legs only consume the headline number — skip the
        # per-query suite + copart section (4x less wall per subprocess)
        ray.shutdown()
        return {"metric": "kg_build_sec", "value": round(headline, 3),
                "unit": "sec", "queries": {}, "sf": sf_dir,
                "num_cpus": num_cpus, "corpus_files": n_files,
                "triples": triples}

    if stats_query is not None:
        # --stats NAME: run ONE query, materialize, dump Ray's per-stage
        # wall-time/CPU breakdown to stderr — the "read ds.stats() and
        # iterate" loop as a first-class bench mode
        if stats_query not in query_fns:
            raise SystemExit(
                f"--stats: unknown query {stats_query!r}; one of "
                f"{sorted(query_fns)}")
        tq = time.time()
        res = query_fns[stats_query]()
        if hasattr(res, "materialize"):
            res = res.materialize()
            n_rows = res.count()
            print(res.stats(), file=sys.stderr)
        else:
            n_rows = len(res)
            print("(driver-side result: no Dataset stats)", file=sys.stderr)
        out = {"metric": "query_sec", "query": stats_query,
               "value": round(time.time() - tq, 3), "unit": "sec",
               "rows": int(n_rows), "sf": sf_dir, "num_cpus": num_cpus}
        ray.shutdown()
        return out

    qtimes = {}
    for name, fn in query_fns.items():
        tq = time.time()
        consume(fn())
        qtimes[name] = round(time.time() - tq, 3)

    # ---- co-partitioned zero-shuffle join: pay the range exchange once
    # at write time (copart_write), then every subsequent join on the
    # key is a per-range merge with NO shuffle (copart_join); compare
    # against the per-query exchange joins above (revenue_by_nation) ----
    from ontology_matcher_ray.sources.io import (
        load_cuts,
        merge_join_range_partitioned,
        write_range_partitioned,
    )

    cp_base = f"/tmp/onto_ray_bench/copart_{num_cpus}"
    if os.path.isdir(cp_base):
        shutil.rmtree(cp_base)
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey"],
    ).map_batches(
        lambda b: b.rename(columns={"o_custkey": "custkey"}),
        batch_format="pandas",
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: b.rename(columns={"c_custkey": "custkey"}),
        batch_format="pandas",
    )
    tq = time.time()
    write_range_partitioned(orders, f"{cp_base}/orders", "custkey",
                            num_ranges=32)
    write_range_partitioned(cust, f"{cp_base}/customer", "custkey",
                            num_ranges=32,
                            cuts=load_cuts(f"{cp_base}/orders")["cuts"])
    qtimes["copart_write"] = round(time.time() - tq, 3)
    tq = time.time()
    consume(merge_join_range_partitioned(
        f"{cp_base}/orders", f"{cp_base}/customer", "custkey"))
    qtimes["copart_join"] = round(time.time() - tq, 3)

    # ---- storage layout: small-file compaction, Z-order clustering,
    # zone-map pruned scan (sources/layout.py).  Fixture (untimed):
    # lineitem shredded into 256 small parts — the classic small-file
    # pathology a 100-TB ingest leaves behind ----
    from ontology_matcher_ray.sources.layout import (
        compact_parquet,
        prune_parts,
        scan_between,
        write_zordered,
    )

    lay_base = f"/tmp/onto_ray_bench/layout_{num_cpus}"
    if os.path.isdir(lay_base):
        shutil.rmtree(lay_base)
    li_cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=li_cols,
    ).repartition(256).write_parquet(f"{lay_base}/small")
    tq = time.time()
    compact_parquet(f"{lay_base}/small", f"{lay_base}/compacted",
                    target_bytes=16 << 20, stat_cols=["l_partkey"])
    qtimes["layout_compact"] = round(time.time() - tq, 3)
    tq = time.time()
    write_zordered(rd.read_parquet(f"{lay_base}/compacted"),
                   f"{lay_base}/zo", cols=["l_partkey", "l_suppkey"],
                   num_files=32)
    qtimes["zorder_write"] = round(time.time() - tq, 3)
    # ~5% selectivity on each clustered dim, bounds derived from the
    # zone maps themselves so the test scales with sf; print the skip
    # ratio so the layout win is visible in the log
    from ontology_matcher_ray.sources.layout import zonemap_table

    zt = zonemap_table(f"{lay_base}/zo")
    bounds = {}
    for col in ("l_partkey", "l_suppkey"):
        sub = zt[zt["column"] == col]
        lo_all, hi_all = int(sub["min"].min()), int(sub["max"].max())
        bounds[col] = (lo_all, lo_all + max(1, (hi_all - lo_all) // 20))
    for col, (lo_b, hi_b) in bounds.items():
        pr = prune_parts(f"{lay_base}/zo", col, lo_b, hi_b)
        print(f"zorder pruning: {col} {pr['skipped']}/{pr['total']} "
              f"files skipped", file=sys.stderr)
    tq = time.time()
    for col, (lo_b, hi_b) in bounds.items():
        consume(scan_between(f"{lay_base}/zo", col, lo_b, hi_b))
    qtimes["zorder_scan"] = round(time.time() - tq, 3)

    # ---- MVCC-versioned table: snapshot-isolated create + merge ----
    from ontology_matcher_ray.sources import versioned as vt

    vt_base = f"{lay_base}/vtable"
    ods = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderkey", "o_totalprice"])
    tq = time.time()
    vt.create_versioned(ods, vt_base, "o_orderkey", num_ranges=32)
    qtimes["versioned_create"] = round(time.time() - tq, 3)
    n_changes = 4096
    ch = ods.limit(n_changes).map_batches(
        lambda b: b.assign(
            o_totalprice=b["o_totalprice"] + 1,
            _op=["upsert"] * len(b)),
        batch_format="pandas")
    tq = time.time()
    mstats = vt.merge_versioned(vt_base, ch)
    qtimes["versioned_merge"] = round(time.time() - tq, 3)
    print(f"versioned merge: {int(mstats['upserts'].sum())} upserts "
          f"rewrote {len(mstats)}/32 ranges", file=sys.stderr)

    # ---- flagship lakehouse publish + Bloom-pruned point probes ----
    # The headline KG ships into the MVCC table with subj-Bloom + tk
    # zone-map sidecars on every part (docs_kg.publish_triples); a
    # "all triples about entity X" probe then opens only the parts
    # whose Bloom can contain X.  Timed against the brute filter over
    # the same snapshot — same rows, different files opened.
    if stats_query is None:
        from ontology_matcher_ray.pipelines.docs_kg import subject_triples

        pub_base = f"{lay_base}/kg_table"
        if os.path.isdir(pub_base):
            shutil.rmtree(pub_base)
        trips = corpus_kg.read_triples(out_dir)
        tq = time.time()
        docs_kg.publish_triples(pub_base, trips)
        qtimes["kg_publish"] = round(time.time() - tq, 3)

        probe_subjs = sorted({r["subj"] for r in vt.read_versioned(
            pub_base, columns=["subj"]).take(64)})[:4]
        # observable skip ratio for the first probe
        import json as _json

        from ontology_matcher_ray.sources.layout import (
            _bloom_maybe_contains,
            _zmap_path,
        )

        head = vt.load_manifest(pub_base)
        part_paths = [os.path.join(pub_base, "parts", f)
                      for f in head["ranges"].values()]
        kept = sum(
            1 for p in part_paths
            if _bloom_maybe_contains(
                _json.load(open(_zmap_path(p)))["blooms"]["subj"],
                probe_subjs[0]))
        print(f"kg point probe: {len(part_paths) - kept}/"
              f"{len(part_paths)} parts skipped for "
              f"{probe_subjs[0]!r}", file=sys.stderr)

        tq = time.time()
        n_pruned = sum(subject_triples(pub_base, s).count()
                       for s in probe_subjs)
        qtimes["kg_point_probe_pruned"] = round(time.time() - tq, 3)
        tq = time.time()
        n_brute = 0
        for s in probe_subjs:
            n_brute += vt.read_versioned(
                pub_base, columns=["subj", "pred", "obj"],
            ).map_batches(lambda b, s=s: b[b["subj"] == s],
                          batch_format="pandas").count()
        qtimes["kg_point_probe_brute"] = round(time.time() - tq, 3)
        if n_pruned != n_brute:
            raise SystemExit(
                f"pruned probe diverged: {n_pruned} != {n_brute}")

    ray.shutdown()
    return {
        "metric": "kg_build_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "corpus_files": n_files,
        "triples": triples,
        "triples_per_sec": round(triples / headline, 1),
    }


def run_scaling() -> dict:
    """Same headline job at two parallelism levels in fresh processes.

    Each level runs ``GRAFT_SCALING_REPEATS`` times (default 2) and the
    MINIMUM is reported: single-shot wall times on a shared sandbox host
    vary up to ~30% run-to-run (page-cache / host interference), and the
    minimum is the standard least-interference estimator for a
    deterministic workload.
    """
    results = {}
    # scaling config: KB-sized files (like real source corpora) so
    # per-file compute dominates over single-node exchange constants
    scaling_files = os.environ.get("GRAFT_SCALING_FILES", "3200000")
    scaling_lines = os.environ.get("GRAFT_SCALING_BODY_LINES", "400")
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    # N and 4N parallelism levels.  Default 4,16: BELOW the host's
    # shared-memory contention knee (~16-24 workers on this VM the memory
    # bandwidth saturates — a per-node constant that a real multi-node
    # cluster does not hit; see BASELINE.md).  Override with
    # GRAFT_SCALING_CPUS="8,32" to measure the above-the-knee pair.
    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(","))
    for ncpu in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            # one shard: measure steady-state throughput, not per-shard
            # pipeline startup (resume granularity is exercised in tests)
            GRAFT_KG_SHARDS="1",
            GRAFT_CORPUS_FILES=scaling_files,
            GRAFT_BODY_LINES=scaling_lines,
            # min-of-N lives in THIS loop for scaling runs — keep each
            # subprocess single-shot so repeats aren't multiplied
            GRAFT_BENCH_REPEATS="1",
            GRAFT_HEADLINE_ONLY="1",
        )
        best = None
        for _rep in range(repeats):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            run = json.loads(out.strip().splitlines()[-1])
            if best is None or run["value"] < best["value"]:
                best = run
        results[ncpu] = best
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling",
        "cpus": [lo, hi],
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "tps_lo": results[lo]["triples_per_sec"],
        "tps_hi": results[hi]["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "corpus_files": results[hi]["corpus_files"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        qname = sys.argv[sys.argv.index("--stats") + 1]
        print(json.dumps(_bench_once(stats_query=qname)))
    else:
        print(json.dumps(run_bench()))

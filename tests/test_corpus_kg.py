"""End-to-end corpus KG build: triples vs the closed-form expected set
(F6), per-partition lineage, and kill/resume semantics."""

import json
import os
import shutil

import pytest

from ontology_matcher_ray import corpus as corpus_mod
from ontology_matcher_ray.pipelines import corpus_kg
from ontology_matcher_ray.schemas import DISEASE_SPEC
from ontology_matcher_ray.state.snapshot import build_snapshot

N_FILES = 600


@pytest.fixture(scope="module")
def corpus_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=100, seed=42)
    corpus_dir = str(root / "corpus")
    corpus_mod.generate_corpus(corpus_dir, N_FILES, snap)
    return root, snap, corpus_dir


def triple_set(out_dir):
    df = corpus_kg.read_triples(out_dir).to_pandas()
    return set(map(tuple, df[["subj", "pred", "obj"]].values))


def test_kg_build_matches_expected(corpus_env):
    root, snap, corpus_dir = corpus_env
    out = str(root / "kg1")
    records = corpus_kg.build_kg(corpus_dir, out, snap, n_shards=3)
    got = triple_set(out)
    want = corpus_mod.expected_triples(N_FILES, snap, DISEASE_SPEC)
    missing = want - got
    extra = got - want
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:5]}"
    # lineage: every shard accounted for, row counts sum to the corpus size
    assert sum(r.row_count for r in records) == N_FILES
    assert all(r.triple_count > 0 for r in records)
    assert all(r.content_sha256_agg for r in records)


def test_resume_skips_completed_shards(corpus_env):
    root, snap, corpus_dir = corpus_env
    out = str(root / "kg1")          # already built above
    rec1 = corpus_kg.build_kg(corpus_dir, out, snap, n_shards=3)
    # identical records returned, nothing rebuilt (wall_time preserved)
    rec2 = corpus_kg.build_kg(corpus_dir, out, snap, n_shards=3)
    assert [r.shard for r in rec2] == [r.shard for r in rec1]
    assert [r.triple_count for r in rec2] == [r.triple_count for r in rec1]
    assert [r.wall_time for r in rec2] == [r.wall_time for r in rec1]


def test_resume_rebuilds_missing_shard(corpus_env):
    root, snap, corpus_dir = corpus_env
    out = str(root / "kg2")
    corpus_kg.build_kg(corpus_dir, out, snap, n_shards=3)
    before = triple_set(out)
    # simulate a lost partition (crash after lineage write is also covered:
    # run_sharded requires BOTH the record and the directory)
    shutil.rmtree(os.path.join(out, "shard=00001"))
    corpus_kg.build_kg(corpus_dir, out, snap, n_shards=3)
    assert triple_set(out) == before


def test_sha_invariant_stable_across_builds(corpus_env):
    root, snap, corpus_dir = corpus_env
    m1 = [json.loads(l) for l in open(os.path.join(str(root / "kg1"), "_manifest", "lineage.jsonl"))]
    m2 = [json.loads(l) for l in open(os.path.join(str(root / "kg2"), "_manifest", "lineage.jsonl"))]
    agg1 = {r["shard"]: r["content_sha256_agg"] for r in m1}
    agg2 = {r["shard"]: r["content_sha256_agg"] for r in m2}
    for shard in agg1:
        assert agg1[shard] == agg2[shard]


def test_routes_match_route_id():
    """precompute_routes' fast path must agree with route_id for every
    dictionary entry under both strategies."""
    from ontology_matcher_ray.pipelines.corpus_kg import precompute_routes
    from ontology_matcher_ray.schemas import Strategy
    from ontology_matcher_ray.stages.resolve import route_id

    snap = build_snapshot(DISEASE_SPEC, n_synthetic=500, seed=42)
    for strategy in (Strategy.MIXTURE, Strategy.UNIQUE):
        fast = precompute_routes(snap, DISEASE_SPEC, strategy)
        for raw_id, db_ids in snap.db_ids.items():
            r = route_id(raw_id, db_ids, DISEASE_SPEC, strategy)
            want = "" if r.status in ("failed", "invalid") and strategy == Strategy.UNIQUE else r.out_id
            assert fast[raw_id] == want, (raw_id, strategy, r.status, fast[raw_id], want)


def test_unique_strategy_drops_failed_mentions(corpus_env, tmp_path):
    from ontology_matcher_ray.schemas import Strategy

    root, snap, corpus_dir = corpus_env
    out = str(tmp_path / "kg_unique")
    corpus_kg.build_kg(corpus_dir, out, snap, n_shards=2,
                       strategy=Strategy.UNIQUE)
    got = triple_set(out)
    want = corpus_mod.expected_triples(N_FILES, snap, DISEASE_SPEC,
                                       strategy=Strategy.UNIQUE)
    assert got == want
    # UNIQUE never emits mention triples MIXTURE wouldn't
    mixture = corpus_mod.expected_triples(N_FILES, snap, DISEASE_SPEC)
    got_mentions = {t for t in got if t[1] == "mentions"}
    assert got_mentions <= {t for t in mixture if t[1] == "mentions"}
    assert len(got_mentions) < len({t for t in mixture if t[1] == "mentions"})
    # failed raw ids (multi-default / misses) are absent under UNIQUE
    assert not any(o.startswith("MESH:DMISS") for _s, p, o in got if p == "mentions")


def test_canonical_merge_correct_under_hub_key_skew():
    """Skew: one hub id carries 80% of rows; two-phase merge (per-block
    partial + hash-partition final) must still be exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ontology_matcher_ray.pipelines.docs_kg import _partial_merge
    from ontology_matcher_ray.stages import exchange

    n = 20000
    ids = np.where(np.arange(n) % 5 != 0, "MONDO:HUB", "MONDO:%d" % 7)
    ids = [f"MONDO:HUB" if k % 5 != 0 else f"MONDO:{k % 97}" for k in range(n)]
    df = pd.DataFrame({
        "id": ids, "label": "Disease", "doc_id": np.arange(n),
        "name": ["n%d" % k for k in range(n)], "description": "",
        "resource": "R", "taxid": "",
        "xrefs": ["X:%d" % (k % 13) for k in range(n)],
        "synonyms": "", "pmids": "", "raw_id": ["RAW:%d" % (k % 7) for k in range(n)],
    })
    ds = rd.from_pandas(df, override_num_blocks=16)
    ds = ds.map_batches(_partial_merge, batch_format="pandas")
    out = exchange.partitioned_apply(ds, ["id", "label"], _partial_merge, 8).to_pandas()
    hub = out[out["id"] == "MONDO:HUB"].iloc[0]
    assert hub["name"] == "n1"                          # min doc_id in hub
    assert set(hub["xrefs"].split("|")) == {"X:%d" % i for i in range(13)}
    assert len(out) == 1 + len({k % 97 for k in range(n) if k % 5 == 0})


def test_linker_readmits_default_prefix_misses_under_unique():
    """Reference semantics (ontology_formatter.py:755-763): failed/miss ids
    whose prefix equals the default database stay in the output even under
    Strategy.UNIQUE; other misses are dropped."""
    import pandas as pd

    from ontology_matcher_ray.pipelines.corpus_kg import Linker
    from ontology_matcher_ray.schemas import Strategy

    routes = {"MESH:D1": "MONDO:0001", "MESH:D2": ""}
    b = pd.DataFrame(
        {
            "subj": ["f"] * 5,
            "pred": ["mentions"] * 4 + ["in_lang"],
            "obj": ["MESH:D1", "MESH:D2", "MONDO:MISS9", "MESH:DMISS1", "py"],
        }
    )
    out = Linker(routes, Strategy.UNIQUE, default_prefix="MONDO")(b)
    objs = set(out[out["pred"] == "mentions"]["obj"])
    assert objs == {"MONDO:0001", "MONDO:MISS9"}   # routed + readmitted
    assert (out["pred"] == "in_lang").sum() == 1   # non-mentions untouched

    out_mix = Linker(routes, Strategy.MIXTURE, default_prefix="MONDO")(b)
    objs_mix = set(out_mix[out_mix["pred"] == "mentions"]["obj"])
    assert objs_mix == {"MONDO:0001", "", "MONDO:MISS9", "MESH:DMISS1"}


def test_unique_subjects_fast_path_equals_exchange_path(corpus_env, tmp_path):
    """With the declared unique-subjects invariant the dedup exchange is
    provably a no-op: both paths must emit the identical triple set, and
    a corpus that VIOLATES the invariant must show the difference."""
    import pandas as pd
    import ray.data as rd

    from ontology_matcher_ray.pipelines.corpus_kg import _shard_pipeline  # noqa: F401

    root, snap, corpus_dir = corpus_env
    out_ex = str(tmp_path / "kg_exchange")
    out_fp = str(tmp_path / "kg_fastpath")
    corpus_kg.build_kg(corpus_dir, out_ex, snap, n_shards=2)
    corpus_kg.build_kg(corpus_dir, out_fp, snap, n_shards=2, unique_subjects=True)
    assert triple_set(out_ex) == triple_set(out_fp)

    # violation corpus: the same (repo, path) row duplicated -> only the
    # exchange path collapses cross-batch duplicates
    df = rd.read_parquet(corpus_dir).limit(40).to_pandas()
    dup_dir = str(tmp_path / "dup_corpus")
    import os
    os.makedirs(dup_dir, exist_ok=True)
    half = df.iloc[:20]
    # same rows written to TWO files => same subject in two read batches
    rd.from_pandas(half, override_num_blocks=1).write_parquet(dup_dir)
    rd.from_pandas(half, override_num_blocks=1).write_parquet(dup_dir)
    out_d_ex = str(tmp_path / "dup_ex")
    corpus_kg.build_kg(dup_dir, out_d_ex, snap, n_shards=1)
    trips = corpus_kg.read_triples(out_d_ex).to_pandas()
    # exchange path: globally exact (no duplicate triple rows)
    assert not trips.duplicated(["subj", "pred", "obj"]).any()


def test_incremental_append_with_input_validated_resume(tmp_path):
    """Fixed-size shard planning + input-validated resume = incremental
    ingest: appending corpus files and rerunning recomputes ONLY the
    previously-partial last shard and the new shards, and the result
    equals a from-scratch build over the full file set (stale shard
    output computed from different inputs must never be reused)."""
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=100, seed=42)
    gen = tmp_path / "gen"
    corpus_mod.generate_corpus(str(gen / "a"), 100, snap)
    corpus_mod.generate_corpus(str(gen / "b"), 200, snap)
    corpus_mod.generate_corpus(str(gen / "c"), 300, snap)

    def pick_parquet(d, idx):
        files = sorted(x for x in os.listdir(d) if x.endswith(".parquet"))
        return os.path.join(d, files[idx])

    work = tmp_path / "ingest"
    work.mkdir()
    for i in range(5):  # initial ingest units u0..u4 (same low-index rows)
        shutil.copy(pick_parquet(str(gen / "a"), 0), str(work / f"u{i}.parquet"))

    out = str(tmp_path / "kg")
    rec1 = corpus_kg.build_kg(str(work), out, snap, files_per_shard=2)
    assert [len(r.input_files) for r in rec1] == [2, 2, 1]

    # append units with NOVEL rows (b: rows 0-199, c: rows 0-299) — they
    # sort after u4, so shards 0/1 keep identical inputs
    # last chunks carry the highest-index (novel) rows
    shutil.copy(pick_parquet(str(gen / "b"), -1), str(work / "v5.parquet"))
    shutil.copy(pick_parquet(str(gen / "c"), -1), str(work / "v6.parquet"))
    rec2 = corpus_kg.build_kg(str(work), out, snap, files_per_shard=2)
    assert [len(r.input_files) for r in rec2] == [2, 2, 2, 1]
    # shards 0/1 skipped: the PRIOR lineage records come back verbatim
    assert rec2[0].wall_time == rec1[0].wall_time
    assert rec2[1].wall_time == rec1[1].wall_time
    # shard 2's inputs changed (u4 -> u4+v5): recomputed, not stale-reused
    assert rec2[2].wall_time != rec1[2].wall_time
    assert rec2[2].input_files[-1].endswith("v5.parquet")

    fresh = str(tmp_path / "kg_fresh")
    corpus_kg.build_kg(str(work), fresh, snap, files_per_shard=2)
    assert triple_set(out) == triple_set(fresh)


def test_quarantine_excludes_corrupt_inputs(corpus_env, tmp_path):
    """A truncated part and a wrong-schema part must not kill the build
    when quarantine is on: they are excluded, logged with the error, and
    the surviving triples equal the healthy corpus minus the bad files'
    contributions."""
    import glob

    import pandas as pd

    root, snap, corpus_dir = corpus_env
    # copy the corpus and damage two files
    bad_dir = str(tmp_path / "damaged")
    shutil.copytree(corpus_dir, bad_dir)
    files = sorted(glob.glob(os.path.join(bad_dir, "*.parquet")))
    assert len(files) >= 4          # the corpus writes ~8 parts
    truncated, wrong_schema = files[1], files[len(files) // 2]
    with open(truncated, "r+b") as f:
        f.truncate(os.path.getsize(truncated) // 2)
    pd.DataFrame({"not_content": [1, 2]}).to_parquet(
        wrong_schema, index=False)

    # fail-fast default: the corrupt file kills the build
    with pytest.raises(Exception):
        corpus_kg.build_kg(bad_dir, str(tmp_path / "kg_failfast"),
                           snap, n_shards=3)

    out = str(tmp_path / "kg_quarantined")
    records = corpus_kg.build_kg(bad_dir, out, snap, n_shards=3,
                                 quarantine=True)
    assert sum(r.quarantined for r in records) == 2
    qlog = os.path.join(out, "_manifest", "quarantine.jsonl")
    with open(qlog) as f:
        entries = [json.loads(line) for line in f]
    assert {e["path"] for e in entries} == {truncated, wrong_schema}
    assert all(e["error"] for e in entries)

    # triples == clean-corpus result restricted to surviving subjects:
    # rebuild against the pristine corpus and drop the two bad files'
    # triples by their subject prefix (subjects embed the file path)
    clean_out = str(tmp_path / "kg_clean")
    corpus_kg.build_kg(corpus_dir, clean_out, snap, n_shards=3)
    clean = triple_set(clean_out)
    bad_names = {os.path.basename(truncated), os.path.basename(wrong_schema)}
    import pyarrow.parquet as pq

    bad_paths = set()
    for name in bad_names:
        t = pq.read_table(os.path.join(corpus_dir, name),
                          columns=["repo", "path"])
        bad_paths |= {f"{r}/{p}" for r, p in
                      zip(t.column("repo").to_pylist(),
                          t.column("path").to_pylist())}
    want = {t for t in clean if t[0] not in bad_paths
            and t[2] not in bad_paths}
    got = triple_set(out)
    assert got == want


def test_quarantine_all_bad_shard_raises(corpus_env, tmp_path):
    import glob

    root, snap, corpus_dir = corpus_env
    bad_dir = str(tmp_path / "allbad")
    os.makedirs(bad_dir)
    for i in range(4):
        with open(os.path.join(bad_dir, f"f{i:03d}.parquet"), "wb") as f:
            f.write(b"junk")
    with pytest.raises(RuntimeError, match="every input file"):
        corpus_kg.build_kg(bad_dir, str(tmp_path / "kg"), snap,
                           n_shards=2, quarantine=True)

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

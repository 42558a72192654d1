"""Distributed k-means + SemDeDup (stages/cluster.py): the distributed
Lloyd path must be BIT-IDENTICAL to the closed-form numpy recurrence no
matter how the input is blocked or partitioned (the integer-partial-sum
determinism contract), and the pair stage must find planted semantic
duplicates."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ontology_matcher_ray.stages.ann import _normalize
from ontology_matcher_ray.stages.cluster import (
    MICRO,
    init_centroids,
    kmeans_fit,
    lloyd_iterate,
    semdedup_assignments,
    semdedup_pairs,
)

SF = "/root/testdata/sf0.001"


def _synth(n: int, dim: int = 8, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.tolist() for row in mat],
    })


def _closed_form_pairs(df: pd.DataFrame, k: int, iters: int,
                       threshold: float, seed: int) -> pd.DataFrame:
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    cents = lloyd_iterate(mat, init_centroids(ids, mat, k, seed), iters)
    # quantized-integer assignment + pair scoring, the engine's
    # documented determinism rule (stages/cluster.py module docstring)
    q = np.floor(_normalize(mat) * MICRO).astype(np.int64)
    qc = np.floor(cents * MICRO).astype(np.int64)
    assign = np.argmax(q @ qc.T, axis=1)
    thr12 = int(round(threshold * MICRO)) * MICRO
    rows = []
    for cl in range(k):
        m = assign == cl
        if m.sum() < 2:
            continue
        v = ids[m]
        order = np.argsort(v)
        v, sub = v[order], q[m][order]
        sims = sub @ sub.T
        iu, ju = np.triu_indices(len(v), 1)
        sel = sims[iu, ju] >= thr12
        for x, y, s in zip(v[iu[sel]], v[ju[sel]], sims[iu[sel], ju[sel]]):
            rows.append((int(x), int(y), int(s) // MICRO))
    return (
        pd.DataFrame(rows, columns=["a", "b", "cos_sim_micro"])
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("num_blocks", [1, 3, 11])
def test_kmeans_fit_bit_identical_to_closed_form(num_blocks):
    """Block boundaries must not change a single centroid bit: integer
    partial sums commute, the shared update does the rest."""
    df = _synth(300)
    ds = rd.from_pandas(df, override_num_blocks=num_blocks)
    got = kmeans_fit(ds, k=8, iterations=3, seed=5, dim=8)
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v) for v in df["embedding"]])
    want = lloyd_iterate(mat, init_centroids(ids, mat, 8, 5), 3)
    assert np.array_equal(got, want)


def test_kmeans_fit_order_independent_init():
    """k-means++ is row-order sensitive; init canonicalizes by id, so a
    shuffled table fits the identical centroids."""
    df = _synth(200)
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    a = kmeans_fit(rd.from_pandas(df, override_num_blocks=2),
                   k=6, iterations=2, seed=5, dim=8)
    b = kmeans_fit(rd.from_pandas(shuffled, override_num_blocks=5),
                   k=6, iterations=2, seed=5, dim=8)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("num_partitions", [3, 17])
def test_semdedup_pairs_matches_closed_form(num_partitions):
    df = _synth(250)
    ds = rd.from_pandas(df, override_num_blocks=4)
    got = (
        semdedup_pairs(ds, k=8, iterations=3, threshold=0.5, seed=5,
                       dim=8, num_partitions=num_partitions)
        .to_pandas()
        .astype("int64")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = _closed_form_pairs(df, k=8, iters=3, threshold=0.5, seed=5)
    assert len(want) > 0, "fixture must surface at least one pair"
    pd.testing.assert_frame_equal(got, want)


def test_semdedup_finds_planted_duplicates():
    """Two near-identical vectors (cos ~ 0.9999) must co-cluster and be
    emitted as a pair; unrelated random vectors at dim 32 stay below the
    0.9 threshold."""
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 32))
    mat[57] = mat[13] + rng.normal(scale=1e-3, size=32)  # planted dup
    df = pd.DataFrame({
        "vec_id": np.arange(120, dtype=np.int64),
        "embedding": [row.tolist() for row in mat],
    })
    got = semdedup_pairs(
        rd.from_pandas(df, override_num_blocks=3),
        k=4, iterations=3, threshold=0.9, seed=5, dim=32,
    ).to_pandas()
    assert len(got) == 1
    assert (int(got["a"].iloc[0]), int(got["b"].iloc[0])) == (13, 57)
    assert got["cos_sim_micro"].iloc[0] >= 990_000


def test_kmeans_more_clusters_than_rows():
    """k > n must not crash: empty clusters keep their init centroid."""
    df = _synth(5)
    cents = kmeans_fit(rd.from_pandas(df), k=8, iterations=2, seed=5, dim=8)
    assert cents.shape == (8, 8)
    assert np.isfinite(cents).all()


def test_kmeans_empty_input_raises():
    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "embedding": pd.Series([], dtype=object),
    }))
    with pytest.raises(ValueError, match="empty input"):
        kmeans_fit(empty, k=4, iterations=1, dim=8)


@pytest.mark.parametrize("num_partitions", [3, 17])
def test_semdedup_assignments_consistent_with_pairs(num_partitions):
    """The keep flag must be exactly 'no smaller-id partner among the
    pair set': dropped ids == {b for (a, b) in pairs}, one row per input
    vector, and the flag is partition-count invariant."""
    df = _synth(250)
    ds = rd.from_pandas(df, override_num_blocks=4)
    kw = dict(k=8, iterations=3, threshold=0.5, seed=5, dim=8,
              num_partitions=num_partitions)
    asg = semdedup_assignments(ds, **kw).to_pandas()
    prs = semdedup_pairs(ds, **kw).to_pandas()
    assert len(asg) == len(df)
    assert asg["vec_id"].is_unique
    dropped = set(asg.loc[~asg["sem_keep"], "vec_id"])
    assert dropped == set(prs["b"].astype("int64"))


def test_semdedup_assignments_planted_duplicate_dropped():
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(120, 32))
    mat[57] = mat[13] + rng.normal(scale=1e-3, size=32)
    df = pd.DataFrame({
        "vec_id": np.arange(120, dtype=np.int64),
        "embedding": [row.tolist() for row in mat],
    })
    asg = semdedup_assignments(
        rd.from_pandas(df, override_num_blocks=3),
        k=4, iterations=3, threshold=0.9, seed=5, dim=32,
    ).to_pandas().set_index("vec_id")
    assert bool(asg.loc[13, "sem_keep"]) is True   # lowest id survives
    assert bool(asg.loc[57, "sem_keep"]) is False  # its near-copy is pruned
    assert asg.loc[13, "kmeans_cluster"] == asg.loc[57, "kmeans_cluster"]
    assert asg["sem_keep"].sum() == 119


def test_semdedup_sf_fixture_nonempty():
    """The synthetic embeddings table must surface within-cluster tail
    pairs at the wrapper's default threshold (meaningful oracle rows)."""
    from ontology_matcher_ray.pipelines.docs_text import dedup_semdedup

    got = dedup_semdedup(SF).to_pandas()
    assert len(got) > 0
    assert (got["a"] < got["b"]).all()
    assert (got["cos_sim_micro"] >= int(0.35 * MICRO)).all()


@pytest.mark.parametrize("n,blocks", [(3000, 7), (5000, 5)])
def test_kmeans_sample_canonical_above_2048_rows(n, blocks):
    """Above 2048 rows the init sample must be the smallest-2048-by-id
    stride survivors — a pure function of the row SET — not whatever
    2048 rows Ray's block order surfaces first (regression: a
    block-order `.limit(2048)` sample diverged from init_centroids'
    id-sorted truncation whenever more than 2048 rows survived).
    n=3000 exercises stride==1 with surplus rows; n=5000 stride==2."""
    df = _synth(n)
    ids = df["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    want = lloyd_iterate(mat, init_centroids(ids, mat, 8, 5), 2)
    shuffled = df.sample(frac=1.0, random_state=9).reset_index(drop=True)
    for frame, nb in ((df, 3), (shuffled, blocks)):
        got = kmeans_fit(rd.from_pandas(frame, override_num_blocks=nb),
                         k=8, iterations=2, seed=5, dim=8)
        assert np.array_equal(got, want)

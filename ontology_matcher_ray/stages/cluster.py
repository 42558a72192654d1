"""Distributed spherical k-means (Lloyd) and SemDeDup near-dup pairs.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public) prunes semantic
duplicates by k-means-clustering normalized embeddings and keeping only
WITHIN-CLUSTER pairs above a cosine threshold — the clusters are the
blocking structure, so the all-pairs cost drops from O(n^2) to
O(sum c_i^2).  The scale contract is the paper's: k grows with n
(k ~ n / target_cluster_size) so per-cluster pair work stays bounded;
callers pick k, this module documents the assumption.

Determinism contract (same style as stages/ann.py's IVF index): centroid
init is seeded k-means++ over a deterministic stride sample, and every
Lloyd refinement step quantizes each normalized vector to int64
micro-units and accumulates INTEGER partial sums per cluster.  Integer
addition is order-independent, so the distributed path — per-batch
partials -> per-batch recombine -> bounded driver reduce -> shared
float64 update — is bit-identical to the closed-form numpy recurrence
``lloyd_iterate`` regardless of block boundaries, batch sizes, or task
scheduling (tested).  Assignment and pair scoring are integer-exact
too: scores are int64 dots of the micro-QUANTIZED vectors/centroids
(|q| <= 1e6 per component, so a dot is <= dim * 1e12 — overflow-free to
dim ~9e6), never float gemm, because BLAS results are not guaranteed
bit-stable across matrix shapes or thread counts and the engine's
per-batch matmuls have different shapes than the oracle's full-matrix
ones.  An integer dot is exact at every shape, which closes the one
floating-point link in the chain; ``cos_sim_micro`` is the quantized
dot floor-divided by MICRO (within ~2*dim micro of the float cosine).
The oracle shares only ``init_centroids`` / ``lloyd_iterate`` (the
seeded recipe IS the contract being checked) and recomputes assignment
+ pair scoring independently under the same quantized-integer rule.

No reference-parity citation: the reference (open-prophetdb/
ontology-matcher) has no clustering surface; this is part of the
training-data-pipeline extension family (SURVEY.md §2 additions).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ontology_matcher_ray.stages.ann import _normalize, kmeanspp_centroids

MICRO = 1_000_000


def quantize_micro(mat: np.ndarray) -> np.ndarray:
    """Per-row int64 micro quantization — deterministic per vector, so
    integer partial sums commute across any batching."""
    return np.floor(mat * MICRO).astype(np.int64)


def _update_centroids(
    cents: np.ndarray, counts: np.ndarray, sums_micro: np.ndarray
) -> np.ndarray:
    """One Lloyd update from INTEGER per-cluster sums: mean of the
    quantized members, renormalized; an empty cluster keeps its previous
    centroid verbatim (no renormalization drift).  Shared by the
    distributed engine and the closed-form recurrence so both produce
    bit-identical centroids from identical sums."""
    new = cents.copy()
    nz = counts > 0
    if nz.any():
        means = (sums_micro[nz].astype(np.float64) / MICRO) / counts[nz, None]
        new[nz] = _normalize(means)
    return new


def lloyd_iterate(
    mat: np.ndarray, cents: np.ndarray, iterations: int
) -> np.ndarray:
    """Closed-form spherical Lloyd recurrence over the FULL (n, d) matrix.

    ``mat`` is raw (un-normalized) vectors; rows are normalized here,
    exactly as the engine normalizes each batch (row-wise, so batching
    cannot change a row's normalized value).  Used by tests and the
    oracle's Ray-free recomputation."""
    matn = _normalize(np.asarray(mat, dtype=np.float64))
    q = quantize_micro(matn)
    k = cents.shape[0]
    for _ in range(iterations):
        assign = np.argmax(q @ quantize_micro(cents).T, axis=1)
        sums = np.zeros((k, cents.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, q)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        cents = _update_centroids(cents, counts, sums)
    return cents


def init_centroids(
    ids: np.ndarray, mat: np.ndarray, k: int, seed: int
) -> np.ndarray:
    """Seeded k-means++ over a deterministic stride SPREAD sample — every
    K-th id across the table (K sized so ~2048 rows survive), the same
    recipe as the IVF index (stages/ann.py), so sorted/clustered inputs
    don't bias the init toward one region.  Pure numpy; the engine and
    the oracle both call this on identically-selected rows.

    Rows are canonicalized to id order FIRST: k-means++ is sensitive to
    row order (the seeded rng draws row indices), and Ray's streaming
    executor does not guarantee block order on the engine's sample
    collect — sorting by id here makes the init a pure function of the
    sampled ROW SET, identical no matter which path produced it."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.asarray(mat, dtype=np.float64)[order]
    stride = max(1, len(ids) // 2048)
    mask = (ids % stride == 0) if stride > 1 else np.ones(len(ids), dtype=bool)
    sample = _normalize(np.asarray(mat, dtype=np.float64)[mask][:2048])
    return _normalize(kmeanspp_centroids(sample, k, seed))


def _stack(b: pd.DataFrame, vec_col: str) -> np.ndarray:
    return _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
    )


def kmeans_fit(
    ds: rd.Dataset,
    k: int,
    iterations: int = 4,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
) -> np.ndarray:
    """Distributed spherical k-means: seeded stride-sample init, then
    ``iterations`` Lloyd rounds where each round is

      map_batches partial   — assign batch rows to the broadcast
                              centroids, emit <=k rows of int64
                              (cluster, cnt, s0..s{d-1}) micro-sums;
      map_batches recombine — per-64k-row pandas groupby re-sum, so the
                              driver never sees more than
                              ~ceil(#batches/4096) x k rows;
      driver reduce         — final int sum (bounded, k x (d+1) ints)
                              and the shared float64 centroid update.

    No shuffle at any step; the only cross-round driver state is the
    (k, d) centroid matrix, re-broadcast via ``ray.put`` each round.
    ``ds`` is consumed ``iterations`` times — pass a materialized
    projection when the upstream read is expensive."""
    n_total = ds.count()  # metadata-only
    if n_total == 0:
        raise ValueError("kmeans_fit: empty input dataset")
    if dim is None:
        dim = len(np.asarray(ds.take(1)[0][vec_col]))
    stride = max(1, n_total // 2048)
    # collect the FULL stride-survivor set (~n/stride rows — ≈2048-4096
    # for near-dense ids, the same boundedness assumption as the IVF
    # index sample), then canonicalize to the SMALLEST 2048 ids.  A
    # block-order `.limit(2048)` here would make the sampled row SET
    # depend on Ray's scheduling whenever more than 2048 rows survive,
    # breaking the bit-identical contract with init_centroids / the
    # oracle, which truncate AFTER sorting by id.
    # vectorized batch filter, not filter(expr=...): Ray's expression
    # parser rejects a modulo on the left of a comparison
    sample = (
        ds.map_batches(
            lambda b: b[b[id_col] % stride == 0], batch_format="pandas"
        ).to_pandas()
        if stride > 1
        else ds.to_pandas()
    )
    sample = sample.sort_values(id_col, kind="mergesort").head(2048)
    # init_centroids re-derives the stride mask from the ids so the
    # closed-form recomputation selects the identical sample rows
    cents = init_centroids(
        sample[id_col].to_numpy(dtype=np.int64),
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]]),
        k,
        seed,
    )

    sum_cols = [f"s{j}" for j in range(dim)]

    for _ in range(iterations):
        ref = ray.put(cents)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)  # zero-copy plasma fetch per task
            q = quantize_micro(_stack(b, vec_col))
            assign = np.argmax(q @ quantize_micro(c).T, axis=1)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, assign, q)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            nz = counts > 0
            frame = {
                "cluster": np.arange(k, dtype=np.int64)[nz],
                "cnt": counts[nz],
            }
            for j, col in enumerate(sum_cols):
                frame[col] = sums[nz, j]
            return pd.DataFrame(frame)

        def recombine(b: pd.DataFrame) -> pd.DataFrame:
            return b.groupby("cluster", sort=False).sum().reset_index()

        partials = ds.map_batches(
            partial, batch_format="pandas", batch_size=4096
        ).map_batches(recombine, batch_format="pandas", batch_size=65536)
        total = partials.to_pandas().groupby("cluster", sort=False).sum()

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        idx = total.index.to_numpy(dtype=np.int64)
        counts[idx] = total["cnt"].to_numpy(dtype=np.int64)
        sums[idx] = total[sum_cols].to_numpy(dtype=np.int64)
        cents = _update_centroids(cents, counts, sums)

    return cents


def _fit_and_assign(
    ds: rd.Dataset,
    k: int,
    iterations: int,
    seed: int,
    id_col: str,
    vec_col: str,
    dim: Optional[int],
) -> rd.Dataset:
    """Shared SemDeDup front half: fit centroids, then one assignment
    pass tagging every vector with its cluster.  The QUANTIZED (int64
    micro-unit) payload rides along so downstream per-cluster stages
    never re-read vectors and score pairs with exact integer dots
    (same shape as the LSH verifier's pair join)."""
    proj = ds.map_batches(
        lambda b: b[[id_col, vec_col]], batch_format="pandas"
    ).materialize()  # consumed iterations+1 times (fit rounds + assignment)

    cents = kmeans_fit(proj, k, iterations, seed, id_col, vec_col, dim)
    ref = ray.put(cents)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        q = quantize_micro(_stack(b, vec_col))
        return pd.DataFrame(
            {
                "cluster": np.argmax(
                    q @ quantize_micro(c).T, axis=1
                ).astype(np.int64),
                "vid": b[id_col].astype("int64").to_numpy(),
                # plain lists: object columns of np.ndarray break the
                # pandas<->Arrow conversion inside the exchange
                "payload": [row.tolist() for row in q],
            }
        )

    return proj.map_batches(assign, batch_format="pandas", batch_size=4096)


def semdedup_pairs(
    ds: rd.Dataset,
    k: int = 16,
    iterations: int = 4,
    threshold: float = 0.4,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """SemDeDup near-dup pairs: k-means blocking + within-cluster exact
    cosine.  Emits (a, b, cos_sim_micro) with a < b and quantized
    similarity >= threshold (compared in integer micro^2 space — see the
    module determinism contract; within ~2*dim micro of float cosine).

    One assignment pass tags every vector with its cluster; vectors then
    ship ONCE to their cluster's partition (the normalized payload rides
    the exchange, like the LSH verifier's pair join) and each cluster is
    scored with a single c x c matmul.  Scale contract: k must grow with
    n so per-cluster c stays bounded (the SemDeDup paper's own blocking
    assumption); the all-pairs work is then O(n * max_c), never O(n^2).
    """
    from ontology_matcher_ray.stages import exchange

    assigned = _fit_and_assign(ds, k, iterations, seed, id_col, vec_col, dim)

    thr12 = int(round(threshold * MICRO)) * MICRO  # threshold in micro^2

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["a", "b", "cos_sim_micro"]
        out_a, out_b, out_s = [], [], []
        for _cl, grp in g.groupby("cluster", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("vid", kind="mergesort")
            vids = grp["vid"].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(p, dtype=np.int64) for p in grp["payload"]])
            sims = mat @ mat.T  # int64 quantized dots — exact at any shape
            iu, ju = np.triu_indices(len(grp), 1)
            sel = sims[iu, ju] >= thr12
            out_a.append(vids[iu[sel]])
            out_b.append(vids[ju[sel]])
            out_s.append(sims[iu[sel], ju[sel]] // MICRO)
        if not out_a:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "cos_sim_micro": np.concatenate(out_s),
            }
        )

    return exchange.partitioned_apply(assigned, ["cluster"], pairs, num_partitions)


def semdedup_assignments(
    ds: rd.Dataset,
    k: int = 16,
    iterations: int = 4,
    threshold: float = 0.4,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-vector SemDeDup pruning decision: one row per input vector,
    (vec_id, kmeans_cluster, sem_keep).

    ``sem_keep`` is False iff the vector has a WITHIN-CLUSTER neighbor
    with cosine >= threshold and a SMALLER id — the deterministic
    keep-lowest-id rule, so exactly one representative of every semantic
    near-dup group survives (the paper keeps the vector farthest from
    the centroid; lowest-id is the order-free equivalent the rest of
    this engine's dedup family uses).  Same distribution story and scale
    contract as ``semdedup_pairs``."""
    from ontology_matcher_ray.stages import exchange

    assigned = _fit_and_assign(ds, k, iterations, seed, id_col, vec_col, dim)

    thr12 = int(round(threshold * MICRO)) * MICRO  # threshold in micro^2

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for cl, grp in g.groupby("cluster", sort=False):
            grp = grp.sort_values("vid", kind="mergesort")
            vids = grp["vid"].to_numpy(dtype=np.int64)
            if len(grp) == 1:
                dropped = np.zeros(1, dtype=bool)
            else:
                mat = np.stack(
                    [np.asarray(p, dtype=np.int64) for p in grp["payload"]]
                )
                sims = mat @ mat.T  # int64 quantized dots — exact
                # strictly-lower triangle: sims[i, j] with j < i pairs row
                # i against every SMALLER-id row (vids ascending); masked
                # explicitly so a non-positive threshold can't match the
                # zeroed upper triangle
                lower = np.tril(np.ones_like(sims, dtype=bool), -1)
                dropped = ((sims >= thr12) & lower).any(axis=1)
            frames.append(pd.DataFrame({
                id_col: vids,
                "kmeans_cluster": np.full(len(vids), cl, dtype=np.int64),
                "sem_keep": ~dropped,
            }))
        if not frames:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "kmeans_cluster": pd.Series([], dtype="int64"),
                "sem_keep": pd.Series([], dtype=bool),
            })
        return pd.concat(frames, ignore_index=True)

    return exchange.partitioned_apply(assigned, ["cluster"], decide, num_partitions)

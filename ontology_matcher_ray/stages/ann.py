"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — every batch of database vectors is
scored against a BROADCAST query matrix with one numpy matmul (queries are
shipped via ``ray.put`` once, fetched per actor in ``__init__``), partial
top-k per batch, distributed combine level, tiny final driver reduce.
Scale path: IVF — vectors are assigned to deterministic centroid buckets
in one pass, queries probe only ``nprobe`` buckets, so the scored fraction
drops by ~nlist/nprobe; bucket assignment is groupby-free (assignment is a
map, the search is a filtered brute-force).

Determinism: every per-batch truncation sorts candidates by
(cos_sim desc, vec_id asc) — the same order the final reduce and the SQL
oracle use — so a tie at a batch's k-th boundary cannot drop a candidate
the global top-k would have kept.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _batch_matrix(b: pd.DataFrame, vec_col: str, order: np.ndarray) -> np.ndarray:
    return _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col].iloc[order]])
    )


def _topk_rows(sims: np.ndarray, ids: np.ndarray, qids: np.ndarray,
               top_k: int) -> pd.DataFrame:
    """Per-batch deterministic top-k from a (nq, n) similarity matrix whose
    COLUMNS are pre-sorted by vec_id ascending: a stable argsort on -sims
    then breaks exact-similarity ties by vec_id asc, matching
    ``_finalize_topk`` and the oracle's ORDER BY (sim desc, vec_id asc).
    Non-candidates are -inf and filtered after selection."""
    k = min(top_k, sims.shape[1])
    if k == 0:
        return _empty_topk()
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    rows = np.repeat(np.arange(sims.shape[0]), k)
    cols = idx.reshape(-1)
    picked = sims[rows, cols]
    keep = np.isfinite(picked)
    return pd.DataFrame(
        {
            "query_id": qids[rows][keep],
            "vec_id": ids[cols][keep],
            "cos_sim": picked[keep],
        }
    )


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                         "vec_id": pd.Series([], dtype=np.int64),
                         "cos_sim": pd.Series([], dtype=float)})


class BruteForceScorer:
    """map_batches stage: emit per-batch top-k (query_id, vec_id, cos_sim)."""

    def __init__(self, query_ref, top_k: int, id_col: str, vec_col: str):
        self.qids, self.qmat = ray.get(query_ref)
        self.top_k = top_k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ids = b[self.id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = _batch_matrix(b, self.vec_col, order)
        sims = self.qmat @ mat.T                     # (n_queries, n_batch)
        # exclude self-matches (their sim sits exactly on the 1.0 grid
        # point, where float paths across engines can disagree)
        sims[ids[None, :] == self.qids[:, None]] = -np.inf
        return _topk_rows(sims, ids, self.qids, self.top_k)


def _reduce_topk(partial: rd.Dataset, top_k: int) -> pd.DataFrame:
    """Distributed combine + small driver reduce.

    One combine level caps the driver-side frame at
    O(n_combine_batches * nq * top_k) regardless of input block count
    (each 64k-row combine batch folds ~thousands of per-block partials
    into nq*top_k rows); the combine is idempotent, so at extreme block
    counts deeper tree levels are the same stage repeated.
    """
    def combine(b: pd.DataFrame) -> pd.DataFrame:
        b = b[np.isfinite(b["cos_sim"])]
        if b.empty:
            return _empty_topk()
        b = b.sort_values(["query_id", "cos_sim", "vec_id"],
                          ascending=[True, False, True])
        return b.groupby("query_id", sort=False).head(top_k)

    combined = partial.map_batches(combine, batch_format="pandas",
                                   batch_size=65536)
    return _finalize_topk(combined.to_pandas(), top_k)


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k: distributed partial top-k + combine + reduce.

    Returns a pandas frame (n_queries * top_k rows) with ``rank`` starting
    at 1 per query — small by construction, so driver-side materialize is
    correct here.
    """
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    partial = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs=dict(query_ref=ref, top_k=top_k, id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
        concurrency=(1, 8),
        batch_size=4096,
    )
    return _reduce_topk(partial, top_k)


def _finalize_topk(allp: pd.DataFrame, top_k: int) -> pd.DataFrame:
    allp = allp[np.isfinite(allp["cos_sim"])]
    allp = allp.sort_values(
        ["query_id", "cos_sim", "vec_id"], ascending=[True, False, True]
    )
    top = allp.groupby("query_id", sort=True).head(top_k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    # integer micro-units for a platform-stable value hash
    top["cos_sim_micro"] = np.floor(top["cos_sim"] * 1_000_000).astype("int64")
    return top[["query_id", "vec_id", "cos_sim_micro", "rank"]]


def lsh_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    top_k: int = 5,
    tables: int = 8,
    bits: int = 6,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Hyperplane-LSH-probed ANN: score only vectors sharing a (table,
    bucket) cell with the query.

    Unlike the IVF variant (sample-trained centroids), the hyperplane
    family is a seeded literal, so the ENTIRE algorithm — bucketing,
    candidate set, exact cosine rank — is recomputable in SQL and this
    approximate operator is hash-checked by the driver's oracle gate.
    Scoring is ONE (nq, n) matmul per batch with non-candidates masked to
    -inf — no per-query Python loop.
    """
    from ontology_matcher_ray.stages.dedup import lsh_hyperplanes

    qraw = np.asarray(queries, dtype=np.float64)
    planes = lsh_hyperplanes(qraw.shape[1], tables, bits, seed)
    pows = (1 << np.arange(bits)).astype(np.int64)
    qbuckets = np.stack([
        ((qraw @ planes[t].T) >= 0.0).astype(np.int64) @ pows
        for t in range(tables)
    ], axis=1)                                   # (nq, tables)
    qmat = _normalize(qraw)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, qbuckets, planes, pows))

    class Stage:
        def __init__(self):
            (self.qids, self.qmat, self.qbuckets,
             self.planes, self.pows) = ray.get(ref)
            self.top_k = top_k

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            raw = np.stack([
                np.asarray(v, dtype=np.float64) for v in b[vec_col].iloc[order]
            ])
            buckets = np.stack([
                ((raw @ self.planes[t].T) >= 0.0).astype(np.int64) @ self.pows
                for t in range(self.planes.shape[0])
            ], axis=1)                           # (n, tables)
            # candidate mask: any table where the bucket matches the query's
            cand = (buckets[None, :, :] == self.qbuckets[:, None, :]).any(axis=2)
            cand &= ids[None, :] != self.qids[:, None]     # no self-match
            sims = self.qmat @ _normalize(raw).T           # (nq, n)
            sims[~cand] = -np.inf
            return _topk_rows(sims, ids, self.qids, self.top_k)

    partial = ds.map_batches(Stage, batch_format="pandas", concurrency=(1, 8), batch_size=4096)
    return _reduce_topk(partial, top_k)


def kmeanspp_centroids(mat: np.ndarray, nlist: int, seed: int = 11) -> np.ndarray:
    """Deterministic k-means++-style centroid pick (no Lloyd iterations —
    enough for bucketing; exactness is not required for an ANN index)."""
    rng = np.random.RandomState(seed)
    n = len(mat)
    first = rng.randint(n)
    cents = [mat[first]]
    for _ in range(1, nlist):
        d = np.min(
            np.stack([np.linalg.norm(mat - c, axis=1) ** 2 for c in cents]), axis=0
        )
        probs = d / d.sum() if d.sum() > 0 else np.full(n, 1.0 / n)
        cents.append(mat[rng.choice(n, p=probs)])
    return np.stack(cents)


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    top_k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> pd.DataFrame:
    """IVF-bucketed ANN: score only vectors whose bucket is probed.

    Centroids are trained on a deterministic SPREAD sample — every K-th id
    across the whole table (K sized so ~2048 rows survive), not the first
    block, which on sorted/clustered data would bias the index toward one
    region.  The sample itself is tiny and driver-side by design; every
    worker then derives the identical index without a shuffle.  Scoring is
    one masked (nq, n) matmul per batch, like the LSH variant.
    """
    cents = _train_centroids(ds, nlist, seed, id_col, vec_col)
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]    # (nq, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, cents, probe))

    class Stage:
        def __init__(self):
            self.qids, self.qmat, self.cents, self.probe = ray.get(ref)
            self.top_k = top_k

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            mat = _batch_matrix(b, vec_col, order)
            assign = np.argmax(mat @ self.cents.T, axis=1)        # (n,)
            # (nq, n): vector's bucket is among the query's probed buckets
            cand = (assign[None, None, :] == self.probe[:, :, None]).any(axis=1)
            cand &= ids[None, :] != self.qids[:, None]            # no self-match
            sims = self.qmat @ mat.T
            sims[~cand] = -np.inf
            return _topk_rows(sims, ids, self.qids, self.top_k)

    partial = ds.map_batches(Stage, batch_format="pandas", concurrency=(1, 8), batch_size=4096)
    return _reduce_topk(partial, top_k)


def _train_centroids(ds: rd.Dataset, nlist: int, seed: int,
                     id_col: str, vec_col: str) -> np.ndarray:
    """The ivf_topk spread-sample + kmeans++ training, factored so the
    in-memory query path and the persisted index derive IDENTICAL
    centroids from the same table."""
    n_total = ds.count()                       # metadata-only
    stride = max(1, n_total // 2048)
    sample = ds.filter(
        expr=f"{id_col} % {stride} == 0"
    ).limit(2048).to_pandas() if stride > 1 else ds.limit(2048).to_pandas()
    smat = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in sample[vec_col]]))
    return _normalize(kmeanspp_centroids(smat, nlist, seed))


def build_ivf_index(
    ds: rd.Dataset,
    out_dir: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> pd.DataFrame:
    """Persist a disk-backed IVF index: train centroids once (the
    ivf_topk spread sample), assign every vector its cluster in one
    broadcast-centroid pass, and lay the table out as ONE
    range-partitioned directory PER CLUSTER (``write_range_partitioned``
    with forced integer cuts [1..nlist-1], so range i == cluster i) plus
    a ``_centroids.parquet`` sidecar.

    This is the build-once / query-many amortization a production vector
    store needs: ``ivf_query_index`` answers any later query batch by
    reading ONLY the probed clusters' directories (the reader's range
    pruning — unprobed clusters are never opened, the IVF promise
    enforced at the STORAGE layer, not just in compute), with results
    bit-identical to the in-memory ``ivf_topk`` on the same table.
    Returns the per-cluster stats frame from the writer."""
    from ontology_matcher_ray.sources.io import write_range_partitioned

    cents = _train_centroids(ds, nlist, seed, id_col, vec_col)
    ref = ray.put(cents)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64) for v in b[vec_col]]))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype=np.int64),
            vec_col: b[vec_col],
            "cluster": np.argmax(mat @ c.T, axis=1).astype(np.int64),
        })

    assigned = ds.map_batches(assign, batch_format="pandas")
    stats = write_range_partitioned(
        assigned, out_dir, "cluster", num_ranges=nlist,
        cuts=list(range(1, nlist)), resume=False)
    pd.DataFrame({
        "cluster": np.arange(nlist, dtype=np.int64),
        "centroid": [c.tolist() for c in cents],
    }).to_parquet(os.path.join(out_dir, "_centroids.parquet"), index=False)
    return stats


def ivf_query_index(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    top_k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ANN query against a persisted ``build_ivf_index`` directory.

    Probing decides WHICH range directories are read at all
    (``read_range_partitioned(ranges=probed)``); inside the pruned scan
    each batch carries its stored cluster id, so the per-query candidate
    mask needs no re-assignment matmul.  Scoring/tie-breaking/reduce are
    the ivf_topk kernels — same table, same nlist/nprobe, bit-identical
    result."""
    from ontology_matcher_ray.sources.io import read_range_partitioned

    cdf = pd.read_parquet(os.path.join(index_dir, "_centroids.parquet"))
    cents = np.stack([np.asarray(v, dtype=np.float64)
                      for v in cdf.sort_values("cluster")["centroid"]])
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    needed = sorted(int(r) for r in np.unique(probe))
    # no `columns=` projection: the index layout stores exactly
    # (id, vector, cluster) per file, and Ray 2.49's parquet datasource
    # trips an UnboundLocalError when a column list meets
    # partitioning=None (read_range_partitioned's commit-unit contract)
    ds = read_range_partitioned(index_dir, ranges=needed)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, probe))

    class Stage:
        def __init__(self):
            self.qids, self.qmat, self.probe = ray.get(ref)
            self.top_k = top_k

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            mat = _batch_matrix(b, vec_col, order)
            assign = b["cluster"].to_numpy(dtype=np.int64)[order]
            cand = (assign[None, None, :]
                    == self.probe[:, :, None]).any(axis=1)
            cand &= ids[None, :] != self.qids[:, None]
            sims = self.qmat @ mat.T
            sims[~cand] = -np.inf
            return _topk_rows(sims, ids, self.qids, self.top_k)

    partial = ds.map_batches(Stage, batch_format="pandas",
                             concurrency=(1, 8), batch_size=4096)
    return _reduce_topk(partial, top_k)


def ivf_knn_join(
    ds: rd.Dataset,
    top_k: int = 3,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Bulk kNN JOIN: top-``k`` IVF-routed neighbors for EVERY vector —
    the SemDeDup/retrieval building block at corpus scale, with NO
    driver pass over the embeddings and no broadcast of the table.

    The exchange carries each vector's ORIGINAL float32 bytes (the
    embeddings table's storage precision — half the float64 volume);
    normalization happens after the cast at the bucket, bit-identical
    to normalizing before the exchange.

    Shape: one map assigns each vector its home bucket (nearest
    centroid) and its ``nprobe`` probe buckets, emitting the vector
    once as a CANDIDATE (home bucket) and ``nprobe`` times as a QUERY;
    ONE centroid-keyed exchange co-locates each bucket's queries with
    its candidates and scores them in a single per-bucket matmul,
    keeping a per-(query, bucket) top-k; a second, k-bounded exchange
    on query_id merges each query's <= nprobe partial lists into the
    final ranking.  Exchange volume: (nprobe + 1) x vectors for pass
    one, n x nprobe x k skinny rows for pass two — never quadratic,
    never driver-resident.  Centroids are the shared deterministic
    ``_train_centroids`` recipe (bounded 2048-row spread sample), so an
    engine-free numpy recomputation reproduces the result exactly
    (the same contract as ``ivf_topk``'s oracle).

    Semantics (the deterministic, oracle-checkable definition): a
    query's candidate set is every OTHER vector whose home bucket is
    among the query's ``nprobe`` probed buckets; ranking is
    (cos_sim desc, vec_id asc); output (query_id, vec_id,
    cos_sim_micro, rank), ranks 1..k.
    """
    from ontology_matcher_ray.stages import exchange

    cents = _train_centroids(ds, nlist, seed, id_col, vec_col)
    cents_ref = ray.put(cents)

    def route(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        ids = b[id_col].to_numpy(dtype=np.int64)
        raw32 = np.stack(
            [np.asarray(v, dtype=np.float32) for v in b[vec_col]])
        mat = _normalize(raw32.astype(np.float64))
        sims_c = mat @ c.T                              # (n, nlist)
        assign = np.argmax(sims_c, axis=1).astype(np.int64)
        probe = np.argsort(-sims_c, axis=1, kind="stable")[:, :nprobe]
        n = len(ids)
        # ship the ORIGINAL float32 bytes (half the float64 shuffle
        # volume); the bucket casts f32 -> f64 then normalizes, the
        # exact operation this side just did, so the scored values are
        # bit-identical to normalizing before the exchange
        emb = [v.tobytes() for v in raw32]
        return pd.DataFrame({
            "bucket": np.concatenate([assign, probe.reshape(-1)]),
            "is_query": np.concatenate([
                np.zeros(n, dtype=np.int8),
                np.ones(n * nprobe, dtype=np.int8)]),
            "vid": np.concatenate([ids, np.repeat(ids, nprobe)]),
            "emb": emb + [e for e in emb for _ in range(nprobe)],
        })

    routed = ds.map_batches(route, batch_format="pandas",
                            batch_size=4096)

    _PART = pd.DataFrame({
        "query_id": pd.Series(dtype="int64"),
        "vec_id": pd.Series(dtype="int64"),
        "cos_sim": pd.Series(dtype="float64"),
    })

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("bucket", sort=False):
            isq = grp["is_query"].to_numpy() == 1
            data, qs = grp[~isq], grp[isq]
            if not len(data) or not len(qs):
                continue
            ids = data["vid"].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]

            def decode(col) -> np.ndarray:
                return _normalize(np.stack(
                    [np.frombuffer(v, dtype=np.float32) for v in col]
                ).astype(np.float64))

            dmat = decode(data["emb"].iloc[order])
            qids = qs["vid"].to_numpy(dtype=np.int64)
            qmat = decode(qs["emb"])
            sims = qmat @ dmat.T
            sims[ids[None, :] == qids[:, None]] = -np.inf   # no self
            part = _topk_rows(sims, ids, qids, top_k)
            out.append(part)
        if not out:
            return _PART.copy()
        return pd.concat(out, ignore_index=True)

    partial = exchange.partitioned_apply(
        routed, ["bucket"], score_bucket,
        num_partitions=min(num_partitions, nlist))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "query_id": pd.Series(dtype="int64"),
                "vec_id": pd.Series(dtype="int64"),
                "cos_sim_micro": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
            })
        # a vector reaches a bucket's candidate side once (its home),
        # so (query, candidate) pairs are already unique across buckets
        return _finalize_topk(g, top_k)

    return exchange.partitioned_apply(
        partial, ["query_id"], finalize, num_partitions)

"""Bulk IVF kNN join (stages/ann.ivf_knn_join): every vector gets its
top-k IVF-routed neighbors through one centroid-keyed exchange — no
driver pass over embeddings; result matches the engine-free numpy
recomputation and is partition-invariant."""

import duckdb
import numpy as np
import pandas as pd

from ontology_matcher_ray.oracle import knn_join_expected_parquet
from ontology_matcher_ray.pipelines.docs_text import knn_join

SF = "/root/testdata/sf0.001"


def _got(**kw) -> pd.DataFrame:
    from ontology_matcher_ray.pipelines.docs_text import read_embeddings
    from ontology_matcher_ray.stages.ann import ivf_knn_join

    ds = read_embeddings(SF, columns=["vec_id", "embedding"])
    return (ivf_knn_join(ds, top_k=3, **kw).to_pandas()
            .sort_values(["query_id", "rank"], ignore_index=True))


def _want() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    return con.execute(f"""
SELECT query_id, vec_id, cos_sim_micro, rank
FROM read_parquet('{knn_join_expected_parquet()}')
WHERE emb_fp = (SELECT CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)
                                          * 1000000) AS BIGINT)) AS BIGINT)
                FROM embeddings)
ORDER BY query_id, rank
""").df().astype({"query_id": "int64", "vec_id": "int64",
                  "cos_sim_micro": "int64", "rank": "int64"})


def test_knn_join_matches_numpy_recompute():
    got = knn_join(SF).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    want = _want().reset_index(drop=True)
    # every vector is a query and gets ranks 1..k (enough candidates
    # exist at this sf for every probe set)
    assert got["query_id"].nunique() == 500
    pd.testing.assert_frame_equal(got, want)


def test_knn_join_partition_invariant():
    pd.testing.assert_frame_equal(_got(num_partitions=3),
                                  _got(num_partitions=32))


def test_knn_join_hits_true_neighbors_mostly():
    """IVF recall sanity against full brute force: the probed-buckets
    candidate set must recover most true top-3 neighbors (index
    quality, not exactness — exactness is the recompute test above)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    true = {
        int(ids[i]): {int(ids[j])
                      for j in np.lexsort((ids, -sims[i]))[:3]}
        for i in range(len(ids))
    }
    got = knn_join(SF).to_pandas()
    hit = sum(int(v) in true[int(q)]
              for q, v in zip(got["query_id"], got["vec_id"]))
    # the synthetic embeddings are near-uniform random, where IVF
    # recall approaches nprobe/nlist (= 0.25) with no cluster structure
    # to exploit; measured ~0.47 here.  The floor asserts the index
    # routes far better than a random 3-of-500 pick (0.6%), not
    # clustered-data recall.
    assert hit / len(got) > 0.35

"""Embedding second-moment statistics (docs_train.embedding_covariance /
embedding_pca): DuckDB pair-sum parity on the sf table, a hand-computed
closed form, batch invariance, and the PCA spectrum vs an independent
numpy covariance on the raw vectors."""

import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import (
    COV_Q,
    embedding_covariance,
    embedding_pca,
)

SF = "/root/testdata/sf0.001"

COV_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
u AS (SELECT vec_id, CAST(floor(x * {COV_Q}) AS BIGINT) AS q, i
      FROM (SELECT vec_id, unnest(v) AS x,
                   generate_subscripts(v, 1) AS i FROM e))
SELECT a.i AS i, b.i AS j,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(a.q) AS BIGINT) AS s_x,
       CAST(sum(b.q) AS BIGINT) AS s_y,
       CAST(sum(a.q * b.q) AS BIGINT) AS s_xy
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""


def test_sf_duckdb_parity(ray_session):
    from tests.util import assert_matches_oracle

    assert_matches_oracle(embedding_covariance(SF), COV_SQL, SF)


@pytest.fixture()
def planted(tmp_path):
    vecs = [[1.0, 0.0], [0.5, 0.5], [-0.25, 1.0]]
    pd.DataFrame({
        "vec_id": range(3),
        "embedding": [np.array(v) for v in vecs],
        "label": 0,
    }).to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_closed_form(planted, ray_session):
    got = embedding_covariance(planted)
    rows = {(r.i, r.j): (r.n, r.s_x, r.s_y, r.s_xy)
            for r in got.itertuples()}
    # q vectors: (1000,0), (500,500), (-250,1000)
    assert rows[(1, 1)] == (3, 1250, 1250, 1000**2 + 500**2 + 250**2)
    assert rows[(1, 2)] == (3, 1250, 1500, 0 + 250000 + -250000)
    assert rows[(2, 2)] == (3, 1500, 1500, 0 + 500**2 + 1000**2)
    assert set(rows) == {(1, 1), (1, 2), (2, 2)}


def test_batch_invariance(ray_session):
    import ray.data as rd

    a = embedding_covariance(SF)
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 8192
        b = embedding_covariance(SF)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a, b)


def test_pca_vs_numpy(ray_session):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.floor(np.stack(emb["embedding"].to_numpy()) * COV_Q) / COV_Q
    ref_cov = np.cov(mat, rowvar=False, bias=True)
    ref_w = np.linalg.eigvalsh(ref_cov)[::-1][:8]
    got = embedding_pca(SF, top=8)
    # the engine's moment algebra and np.cov take different float paths
    # to the same matrix — agreement is ~1e-9 relative, not bit-exact
    assert np.allclose(got["eigenvalue"].to_numpy(), ref_w,
                       rtol=1e-7, atol=1e-12)
    assert np.allclose(got["explained_ratio"].sum(),
                       ref_w.sum() / np.trace(ref_cov), rtol=1e-7)
    assert (got["eigenvalue"].to_numpy()[:-1]
            >= got["eigenvalue"].to_numpy()[1:]).all()

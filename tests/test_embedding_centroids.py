"""Per-group embedding centroids (docs_train.embedding_centroids):
value-exact vs an independent DuckDB recompute (unnest + subscripts) and
a pure-numpy reference, partition/batch invariance via the quantize-
before-sum contract, single-group closed form."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import embedding_centroids

SF = "/root/testdata/sf0.001"


def _oracle(sf: str, group="lang") -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con.execute(f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
j AS (SELECT d.{group} AS grp, u.x, u.dim
      FROM e JOIN documents d ON d.doc_id = e.vec_id,
      LATERAL (SELECT unnest(v) AS x,
                      generate_subscripts(v, 1) AS dim) u)
SELECT grp AS {group}, CAST(dim AS BIGINT) AS dim,
       CAST(sum(CAST(floor(x * 1000000) AS BIGINT))
            // count(*) AS BIGINT) AS centroid_micro,
       CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1, 2 ORDER BY 1, 2""").df()


def test_centroids_match_oracle_sf(ray_session):
    got = embedding_centroids(SF)
    want = _oracle(SF)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_centroids_by_source_match_oracle_sf(ray_session):
    got = embedding_centroids(SF, group="source")
    want = _oracle(SF, group="source")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("parts", [1, 16])
def test_centroids_partition_invariant(ray_session, parts):
    base = embedding_centroids(SF)
    got = embedding_centroids(SF, num_partitions=parts)
    pd.testing.assert_frame_equal(got, base)


def test_centroids_single_group_closed_form(tmp_path, ray_session):
    vecs = np.array([[1.0, -2.0], [3.0, 0.5], [0.25, 0.25]])
    pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [v.tolist() for v in vecs],
    }).to_parquet(tmp_path / "embeddings.parquet", index=False)
    pd.DataFrame({
        "doc_id": [0, 1, 2], "text": ["a", "b", "c"],
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [1] * 3,
    }).to_parquet(tmp_path / "documents.parquet", index=False)
    got = embedding_centroids(str(tmp_path))
    q = np.floor(vecs * 1e6).astype(np.int64)
    t = q.sum(axis=0)
    want = np.sign(t) * (np.abs(t) // 3)    # truncating (DuckDB //)
    assert got["centroid_micro"].tolist() == want.tolist()
    assert got["n"].tolist() == [3, 3] and got["dim"].tolist() == [1, 2]

"""Exactly-k-per-group sampling (docs_train.sample_fixed_k): exact-k
property, determinism + seed sensitivity, DuckDB row_number parity on
the sf table (standalone and through the driver's tagged sampling
union), batch/partition invariance."""

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import sample_fixed_k

SF = "/root/testdata/sf0.001"

TOPK_SQL = """
SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5_number_lower('{seed}:' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS rk
  FROM documents) WHERE rk <= {k}
"""


def test_exactly_k(ray_session):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    sizes = docs.groupby("lang").size()
    got = sample_fixed_k(SF, k=10).to_pandas()
    per = got.groupby("lang").size()
    for lang, n in sizes.items():
        assert per.get(lang, 0) == min(10, n)
    assert (got.groupby("lang")["sample_rank"].max()
            == per).all()  # ranks are 1..k dense


def test_sf_duckdb_parity(ray_session):
    from tests.util import assert_matches_oracle

    assert_matches_oracle(sample_fixed_k(SF, k=7, seed="z1"),
                          TOPK_SQL.format(k=7, seed="z1"), SF)
    assert_matches_oracle(sample_fixed_k(SF),
                          TOPK_SQL.format(k=64, seed="s7"), SF)


def test_deterministic_and_seeded(ray_session):
    a = sample_fixed_k(SF, k=5, seed="a").to_pandas()
    b = sample_fixed_k(SF, k=5, seed="a").to_pandas()
    c = sample_fixed_k(SF, k=5, seed="b").to_pandas()
    key = ["lang", "sample_rank"]
    pd.testing.assert_frame_equal(a.sort_values(key, ignore_index=True),
                                  b.sort_values(key, ignore_index=True))
    assert set(a["doc_id"]) != set(c["doc_id"])  # new seed = new sample


def test_partition_invariance(ray_session):
    a = sample_fixed_k(SF, k=9, num_partitions=1).to_pandas()
    b = sample_fixed_k(SF, k=9, num_partitions=11).to_pandas()
    key = ["lang", "sample_rank"]
    pd.testing.assert_frame_equal(a.sort_values(key, ignore_index=True),
                                  b.sort_values(key, ignore_index=True))


def test_bad_k(ray_session):
    with pytest.raises(ValueError):
        sample_fixed_k(SF, k=0)

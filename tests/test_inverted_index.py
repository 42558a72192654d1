"""Inverted-index (postings-list) build vs an independent DuckDB
recomputation, on the sf documents table and a planted fixture, with
df-band filtering and partition invariance."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.pipelines.docs_text import inverted_index

SF = "/root/testdata/sf0.001"


def _oracle(sf: str, min_df: int = 1, max_df=None) -> pd.DataFrame:
    hi = max_df if max_df is not None else 2**62
    return duckdb.connect().execute(f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
  FROM read_parquet('{sf}/documents.parquet')
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY token
HAVING count(*) >= {min_df} AND count(*) <= {hi}
ORDER BY token""").df()


def _got(sf: str, **kw) -> pd.DataFrame:
    return (inverted_index(sf, **kw).to_pandas()
            .sort_values("token", ignore_index=True))


def test_sf_matches_oracle():
    got = _got(SF)
    want = _oracle(SF)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 20           # the sf vocab (31 tokens, = token_freq)
    assert got["df"].max() > 1     # real multi-doc postings exist


def test_df_band_filters():
    got = _got(SF, min_df=3, max_df=50)
    want = _oracle(SF, min_df=3, max_df=50)
    pd.testing.assert_frame_equal(got, want)
    assert got["df"].between(3, 50).all()
    assert 0 < len(got) < len(_oracle(SF))


@pytest.mark.parametrize("parts", [1, 4, 16])
def test_partition_invariant(parts, tmp_path):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b b c", "b c d", "c d e", "a e e"],
        "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [7, 5, 5, 5],
    })
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    got = _got(str(d), num_partitions=parts)
    want = pd.DataFrame({
        "token": ["a", "b", "c", "d", "e"],
        "df": [2, 2, 3, 2, 2],
        "postings": ["0,3", "0,1", "0,1,2", "1,2", "2,3"],
    })
    want["df"] = want["df"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_rejects_bad_bands():
    with pytest.raises(ValueError):
        inverted_index(SF, min_df=0)
    with pytest.raises(ValueError):
        inverted_index(SF, min_df=5, max_df=4)

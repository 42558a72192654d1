"""Incremental (prior-snapshot) exact dedup: planted cross-half copies,
distinct-prior fan-out guard, and DuckDB parity (the gate re-checks it
inside the dedup_assignments composite at sf0.001/sf0.01)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ontology_matcher_ray.pipelines.docs_text import dedup_incremental


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rows = [
        (0, "prior text shared with doc one"),       # prior (even)
        (1, "prior text shared with doc one"),       # new copy of doc 0 -> 1
        (2, "another prior only text"),              # prior, unshared
        (3, "a brand new never seen text"),          # new, novel -> 0
        (4, "duplicated prior text"),                # prior, duplicated with 6
        (5, "duplicated prior text"),                # new copy -> 1
        (6, "duplicated prior text"),                # prior dup of 4: must NOT
                                                     # fan out the left join
        (7, "yet another novel document"),           # new, novel -> 0
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "planted"
    out = tmp_path_factory.mktemp("incr_docs")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(out, "documents.parquet"))
    return str(out)


def test_prior_flags_and_no_fanout(planted_dir, ray_session):
    got = (dedup_incremental(planted_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # exactly one output row per document even though doc 4/6 duplicate
    # the same prior hash (distinct-prior guard)
    assert got["doc_id"].tolist() == list(range(8))
    expected = {0: 1, 1: 1, 2: 1, 3: 0, 4: 1, 5: 1, 6: 1, 7: 0}
    assert dict(zip(got["doc_id"], got["in_prior"])) == expected


def test_duckdb_parity_on_planted_table(planted_dir, ray_session):
    from ontology_matcher_ray import oracle

    got = (dedup_incremental(planted_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    sql = """
SELECT d.doc_id,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM documents p
                              WHERE p.doc_id % 2 = 0 AND p.text = d.text)
            THEN 1 ELSE 0 END AS BIGINT) AS in_prior
FROM documents d
"""
    exp = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))

"""DSIR-shaped importance scoring (docs_train.dsir_importance):
value-exact vs an independent DuckDB recompute on an edge-case corpus
(empty text, single-token docs, exact duplicates, target-slice members),
invariant to exchange partitioning and hot-key salting."""

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import (
    DECON_EVAL_MOD,
    dsir_importance,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dsir")
    rows = []
    for i in range(120):
        if i % 11 == 0:
            text = ""                       # no tokens
        elif i % 11 == 1:
            text = "lonely"                 # one token -> no bigrams
        elif i % 3 == 0:
            text = "the quick brown fox the quick"
        else:
            text = f"doc {i % 7} body value {i % 5} end"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "s", "n_chars": len(text)})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con.execute(f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
bgl AS (SELECT doc_id,
          unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS b FROM t),
bc AS (SELECT doc_id, b, count(*) AS c FROM bgl GROUP BY 1, 2),
cnt AS (SELECT b, sum(c) AS raw_n,
          sum(CASE WHEN doc_id % {DECON_EVAL_MOD} = 0 THEN c ELSE 0 END)
            AS tgt_n FROM bc GROUP BY 1),
s AS (SELECT doc_id,
        sum(((tgt_n + 1) * 1000000 // (raw_n + 1)) * c) AS ss,
        sum(c) AS nb FROM bc JOIN cnt USING (b) GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(s.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(s.ss // greatest(s.nb, 1), 0) AS BIGINT)
         AS dsir_score_micro
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
""").df()


def _run(sf: str, **kw) -> pd.DataFrame:
    return (dsir_importance(sf, **kw).to_pandas()
            .sort_values("doc_id", ignore_index=True))


def test_dsir_edge_cases_match_duckdb(edge_dir):
    got = _run(edge_dir)
    want = _oracle(edge_dir)
    assert len(got) == 120                  # one row per doc, shorts kept
    assert (got.loc[got["n_bigrams"] == 0, "dsir_score_micro"] == 0).all()
    assert (got["n_bigrams"] == 0).any()    # the fixture exercises markers
    pd.testing.assert_frame_equal(got, want)
    # target-slice docs score their own bigrams high: every doc whose
    # bigrams ALL come from the target slice beats the corpus median
    med = got["dsir_score_micro"].median()
    tgt = got[(got["doc_id"] % DECON_EVAL_MOD == 0) & (got["n_bigrams"] > 0)]
    assert (tgt["dsir_score_micro"] > med).any()


def test_dsir_sf_tables_match_duckdb():
    pd.testing.assert_frame_equal(_run(SF), _oracle(SF))


def test_dsir_partition_and_salt_invariant(edge_dir):
    base = _run(edge_dir)
    pd.testing.assert_frame_equal(base, _run(edge_dir, num_partitions=3))
    pd.testing.assert_frame_equal(base, _run(edge_dir, salt=4))

"""Exact duplicated-span dedup (docs_text.dedup_substring): planted
spans, stop-span cap, min_shared filter, and DuckDB parity on the same
planted table (the gate checks it again at sf0.001/sf0.01 inside the
dedup_pairs composite)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ontology_matcher_ray.oracle import substring_pairs_sql
from ontology_matcher_ray.pipelines.docs_text import dedup_substring

K = 8
SPAN_A = " ".join(f"alpha{i}" for i in range(K))
SPAN_B = " ".join(f"beta{i}" for i in range(K))
SPAN_C = " ".join(f"gamma{i}" for i in range(K))
BOILER = " ".join(f"footer{i}" for i in range(K))


def _filler(tag: str, n: int = 12) -> str:
    return " ".join(f"{tag}x{i}" for i in range(n))


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    rows = []
    # docs 0/1 share TWO distinct spans -> pair (0,1), shared >= 2
    rows.append((0, f"{SPAN_A} {_filler('d0')} {SPAN_B}"))
    rows.append((1, f"{_filler('d1')} {SPAN_A} {_filler('d1b')} {SPAN_B}"))
    # docs 2/3 share ONE span -> below min_shared=2, filtered
    rows.append((2, f"{SPAN_C} {_filler('d2')}"))
    rows.append((3, f"{_filler('d3')} {SPAN_C}"))
    # boilerplate span in 10 docs (> max_df=8) -> stop-span, no pairs
    for i in range(10):
        rows.append((10 + i, f"{BOILER} {_filler(f'd{10+i}')}"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "planted"
    out = tmp_path_factory.mktemp("substring_docs")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(out, "documents.parquet"))
    return str(out)


def test_planted_spans_stop_spans_and_min_shared(planted_dir, ray_session):
    got = (dedup_substring(planted_dir, k=K, max_df=8, min_shared=2)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # exactly the (0,1) pair; its two planted spans counted; the single
    # shared span of (2,3) and the 10-doc boilerplate never surface
    assert got[["a", "b"]].values.tolist() == [[0, 1]]
    assert int(got["shared_spans"][0]) == 2


def test_boilerplate_inside_cap_does_pair(planted_dir, ray_session):
    # with the cap lifted the boilerplate family pairs quadratically:
    # C(10,2)=45 extra pairs, each sharing exactly the 1 boilerplate span
    got = dedup_substring(planted_dir, k=K, max_df=100, min_shared=1).to_pandas()
    boiler_pairs = got[(got["a"] >= 10) & (got["b"] >= 10)]
    assert len(boiler_pairs) == 45
    assert (boiler_pairs["shared_spans"] == 1).all()


def test_duckdb_parity_on_planted_table(planted_dir, ray_session):
    got = (dedup_substring(planted_dir, k=K, max_df=8, min_shared=2)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{planted_dir}/documents.parquet')"
    )
    exp = (con.execute(substring_pairs_sql(k=K, max_df=8, min_shared=2)).df()
           .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_like=True
    )

"""Snapshot triple diff (docs_kg.triple_delta / kg_delta): closed forms
(adds, dels, unchanged, within-side duplicates), partition invariance,
DuckDB EXCEPT parity, and the kg_delta demo wiring's invariant that every
even-doc triple is absent from the delta."""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.pipelines.docs_kg import kg_delta, triple_delta

SF = "/root/testdata/sf0.001"


def _t(rows):
    return rd.from_pandas(pd.DataFrame(rows, columns=["subj", "pred", "obj"]))


def _delta(old_rows, new_rows, **kw) -> set:
    df = triple_delta(_t(old_rows), _t(new_rows), **kw).to_pandas()
    return {(r.op, r.subj, r.pred, r.obj) for r in df.itertuples()}


BASE = [("a", "p", "x"), ("b", "p", "y"), ("c", "q", "z")]


def test_delta_closed_form():
    new = [("a", "p", "x"), ("b", "p", "y2"), ("d", "q", "w")]
    assert _delta(BASE, new) == {
        ("del", "b", "p", "y"), ("del", "c", "q", "z"),
        ("add", "b", "p", "y2"), ("add", "d", "q", "w"),
    }


def test_delta_identical_sets_empty():
    assert _delta(BASE, BASE) == set()


def test_delta_duplicates_within_side_collapse():
    assert _delta(BASE + BASE, BASE + [("e", "p", "v"), ("e", "p", "v")]) \
        == {("add", "e", "p", "v")}


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_delta_partition_invariant(parts):
    new = BASE[1:] + [("n", "p", "m")]
    want = {("del", "a", "p", "x"), ("add", "n", "p", "m")}
    assert _delta(BASE, new, num_partitions=parts) == want


def test_delta_matches_duckdb_except():
    old = [(f"s{i % 7}", "p", f"o{i % 5}") for i in range(40)]
    new = [(f"s{i % 6}", "p", f"o{i % 8}") for i in range(40)]
    got = _delta(old, new)
    con = duckdb.connect()
    con.register("old_t", pd.DataFrame(old, columns=["subj", "pred", "obj"]))
    con.register("new_t", pd.DataFrame(new, columns=["subj", "pred", "obj"]))
    want = con.execute("""
SELECT 'add' AS op, * FROM (SELECT * FROM new_t EXCEPT SELECT * FROM old_t)
UNION ALL
SELECT 'del', * FROM (SELECT * FROM old_t EXCEPT SELECT * FROM new_t)
""").df()
    assert got == {(r.op, r.subj, r.pred, r.obj) for r in want.itertuples()}


def test_kg_delta_demo_invariants(ray_session):
    df = kg_delta(SF).to_pandas()
    assert set(df.op) <= {"add", "del"}
    adds = df[df.op == "add"]
    # every odd doc's metadata triples must arrive as adds; no even doc
    # may appear anywhere in the delta (its triples exist in both)
    doc_subj = adds[adds.subj.str.startswith("doc:")]
    ids = doc_subj.subj.str.slice(4).astype(int)
    assert (ids % 2 == 1).all()
    assert len(ids) > 0
    dels = df[df.op == "del"]
    del_doc = dels[dels.subj.str.startswith("doc:")]
    assert len(del_doc) == 0    # removing docs can only delete xref triples

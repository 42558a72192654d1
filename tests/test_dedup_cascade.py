"""J3 dedup cascade semantics (cli.py:192-296 specified behavior)."""

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.dedup_merge import dedup_cascade
from ontology_matcher_ray.schemas import DISEASE_SPEC


def frame(rows):
    base = {"label": "Disease", "name": "", "description": "", "resource": "",
            "taxid": "", "xrefs": "", "synonyms": "", "pmids": "", "raw_id": ""}
    return pd.DataFrame([{**base, **r} for r in rows])


def test_xref_match_merges_into_official():
    df = frame([
        {"id": "MONDO:1", "name": "alpha", "xrefs": "MESH:D1|OMIM:1"},
        {"id": "MESH:D1", "name": "alpha mesh", "xrefs": "UMLS:C1"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert list(out["id"]) == ["MONDO:1"]
    assert set(out.iloc[0]["xrefs"].split("|")) == {"MESH:D1", "OMIM:1", "UMLS:C1"}


def test_synonym_then_name_cascade_order():
    df = frame([
        {"id": "MONDO:1", "name": "alpha", "synonyms": "beta|gamma"},
        {"id": "MONDO:2", "name": "beta"},
        # synonym hit on MONDO:1 wins BEFORE the name index would hit MONDO:2
        {"id": "MESH:D9", "name": "beta"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert sorted(out["id"]) == ["MONDO:1", "MONDO:2"]
    merged = out[out["id"] == "MONDO:1"].iloc[0]
    assert "MESH:D9" in merged["xrefs"].split("|")


def test_ambiguous_match_drops_row():
    df = frame([
        {"id": "MONDO:1", "name": "alpha", "xrefs": "MESH:D1"},
        {"id": "MONDO:2", "name": "alpha2", "xrefs": "MESH:D1"},
        {"id": "MESH:D1", "name": "ambiguous"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert sorted(out["id"]) == ["MONDO:1", "MONDO:2"]      # MESH row dropped


def test_no_match_keeps_row():
    df = frame([
        {"id": "MONDO:1", "name": "alpha"},
        {"id": "MESH:D404", "name": "unrelated"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert sorted(out["id"]) == ["MESH:D404", "MONDO:1"]


def test_final_merge_unions_duplicate_officials():
    df = frame([
        {"id": "MONDO:1", "name": "first", "xrefs": "A:1", "raw_id": "MESH:1"},
        {"id": "MONDO:1", "name": "second", "xrefs": "A:2", "raw_id": "MESH:2"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["name"] == "first"                            # first in input order
    assert set(row["xrefs"].split("|")) == {"A:1", "A:2"}
    assert set(row["raw_id"].split("|")) == {"MESH:1", "MESH:2"}


def test_case_insensitive_match():
    df = frame([
        {"id": "MONDO:1", "name": "Alpha Syndrome"},
        {"id": "MESH:D2", "name": "ALPHA SYNDROME"},
    ])
    out = dedup_cascade(df, DISEASE_SPEC)
    assert list(out["id"]) == ["MONDO:1"]

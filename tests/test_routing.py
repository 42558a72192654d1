"""Table-driven tests of the §2.8 routing tree (route_id) and its
interaction with the Formatter, checked against the hand-written
EXPECTED_ROUTE oracle and reference-derived cases."""

import pandas as pd
import pytest

from ontology_matcher_ray.schemas import (
    DISEASE_SPEC,
    GENE_SPEC,
    Strategy,
)
from ontology_matcher_ray.stages.resolve import route_id
from ontology_matcher_ray.state.fixtures import (
    EXPECTED_ROUTE,
    FIXTURE_DICT,
    FIXTURE_METADATA,
)


@pytest.mark.parametrize("raw_id", sorted(EXPECTED_ROUTE))
def test_route_matches_expected(raw_id):
    status, reason, out_id, xrefs = EXPECTED_ROUTE[raw_id]
    r = route_id(
        raw_id,
        FIXTURE_DICT.get(raw_id),
        DISEASE_SPEC,
        Strategy.MIXTURE,
        FIXTURE_METADATA.get(raw_id),
    )
    assert r.status == status
    assert r.reason == reason
    assert r.out_id == out_id
    if status in ("ok", "ok_raw"):
        got_xrefs = sorted(set(r.alias_ids) | set(r.meta_xrefs))
        assert "|".join(got_xrefs) == xrefs


def test_invalid_prefix_routed():
    r = route_id("FOO:123", None, DISEASE_SPEC)
    assert r.status == "invalid"
    assert "Invalid prefix" in r.reason


def test_invalid_local_chars_routed():
    r = route_id("MESH:D 123", None, DISEASE_SPEC)
    assert r.status == "invalid"


def test_multiple_default_abandons_record():
    # disease/__init__.py:151-158 — the whole record is dropped, even if
    # other databases had clean hits
    r = route_id(
        "MESH:D1", {"MONDO": ["MONDO:1", "MONDO:2"], "DOID": ["DOID:1"]}, DISEASE_SPEC
    )
    assert r.status == "failed"
    assert r.reason == "Multiple results found"


def test_unique_strategy_fails_on_any_multi():
    # disease/__init__.py:160-169
    db_ids = {"MONDO": ["MONDO:1"], "DOID": ["DOID:1", "DOID:2"]}
    mixture = route_id("MESH:D1", db_ids, DISEASE_SPEC, Strategy.MIXTURE)
    unique = route_id("MESH:D1", db_ids, DISEASE_SPEC, Strategy.UNIQUE)
    assert mixture.status == "ok"
    assert unique.status == "failed"
    assert unique.reason == "The strategy is unique, but multiple results found"


def test_mixture_keeps_raw_when_no_default():
    # ontology_formatter.py:712-716 (rule 7)
    r = route_id("UMLS:C9", {"HP": ["HP:9"]}, DISEASE_SPEC)
    assert r.status == "ok_raw"
    assert r.out_id == "UMLS:C9"
    assert r.alias_ids == ["HP:9", "UMLS:C9"]


def test_default_prefix_passthrough():
    # prefix == default database: id flows through unchanged
    r = route_id("MONDO:77", {"DOID": ["DOID:77"]}, DISEASE_SPEC)
    assert r.status == "ok"
    assert r.out_id == "MONDO:77"
    assert r.alias_ids == ["DOID:77"]   # raw MONDO id is NOT an alias


def test_alias_includes_raw_self_for_non_default_prefix():
    # get_alias_ids collects the prefix attribute (the raw id itself)
    # whenever prefix != default — ontology_formatter.py:625-641
    r = route_id("MESH:D7", {"MONDO": ["MONDO:7"]}, DISEASE_SPEC)
    assert "MESH:D7" in r.alias_ids


def test_no_dictionary_hit():
    r = route_id("MESH:D404", None, DISEASE_SPEC)
    assert r.status == "failed"
    assert r.reason == "No results found"


def test_gene_spec_multi_default():
    # gene/__init__.py:169-176 with ENTREZ default
    r = route_id(
        "SYMBOL:TP53", {"ENTREZ": ["ENTREZ:7157", "ENTREZ:1"]}, GENE_SPEC
    )
    assert r.status == "failed"
    assert r.reason == "Multiple results found"


def test_gene_keeps_multi_resource_ids():
    # gene/__init__.py:189-192: keep the record even when the default db
    # id is missing ("convert as much as possible")
    r = route_id("UNIPROT:P04637", {"SYMBOL": ["SYMBOL:TP53"]}, GENE_SPEC)
    assert r.status == "ok_raw"
    assert sorted(r.alias_ids) == ["SYMBOL:TP53", "UNIPROT:P04637"]


def test_golden_disease_record():
    # examples/results/disease_formatted.json first record
    r = route_id("MESH:C579849", FIXTURE_DICT["MESH:C579849"], DISEASE_SPEC)
    assert r.status == "ok"
    assert r.out_id == "MONDO:0013256"
    assert set(r.alias_ids) == {
        "DOID:0060395", "MESH:C579849", "OMIM:613406",
        "Orphanet:94065", "UMLS:C3150674", "UMLS:CN237818",
    }

"""User-extension surface (SURVEY §2.9): adding an entity type is one
OntologySpec + one dictionary snapshot — the whole pipeline (resolve,
format, sinks, dedup cascade) works for the new type with no other code."""

import pandas as pd

from ontology_matcher_ray.pipelines.dedup_merge import dedup_cascade
from ontology_matcher_ray.pipelines.ontology_match import run_ontology_match
from ontology_matcher_ray.schemas import OntologySpec, Strategy
from ontology_matcher_ray.state.snapshot import DictionarySnapshot

ANATOMY_SPEC = OntologySpec(
    type="Anatomy",
    default="UBERON",
    choices=["UBERON", "FMA", "MESH", "BTO"],
)


def make_snapshot() -> DictionarySnapshot:
    snap = DictionarySnapshot()
    snap.db_ids.update(
        {
            "FMA:7088": {"UBERON": ["UBERON:0000948"], "MESH": ["MESH:D006321"]},
            "BTO:0000089": {"UBERON": ["UBERON:0000955"]},
            "MESH:D001921": {"FMA": ["FMA:50801"]},          # no default -> ok_raw
            "MESH:D008168": {"UBERON": ["UBERON:1", "UBERON:2"]},  # multi-default
        }
    )
    snap.metadata["FMA:7088"] = {"name": "heart", "synonyms": ["cor"]}
    return snap


def test_new_entity_type_end_to_end(tmp_path):
    rows = [
        {"id": "FMA:7088", "name": "heart raw", "label": "Anatomy", "resource": "SRC"},
        {"id": "BTO:0000089", "name": "brain", "label": "Anatomy", "resource": "SRC"},
        {"id": "MESH:D001921", "name": "basal ganglia", "label": "Anatomy", "resource": "SRC"},
        {"id": "MESH:D008168", "name": "lung", "label": "Anatomy", "resource": "SRC"},
        {"id": "UBERON:0002107", "name": "liver", "label": "Anatomy", "resource": "SRC"},
    ]
    inp = tmp_path / "in.tsv"
    pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)
    formatted, failed = run_ontology_match(
        str(inp), str(tmp_path / "out.tsv"), make_snapshot(), ANATOMY_SPEC
    )
    by_id = {r["id"]: r for _, r in formatted.iterrows()}
    assert by_id["UBERON:0000948"]["name"] == "heart"            # metadata name
    assert by_id["UBERON:0000948"]["synonyms"] == "cor"
    assert by_id["UBERON:0000948"]["label"] == "Anatomy"
    assert "MESH:D001921" in by_id                               # ok_raw keeps raw
    assert "MESH:D008168" in by_id                               # multi-default readmitted
    assert "UBERON:0002107" in by_id                             # default passthrough
    assert len(failed) == 0


def test_new_type_dedup_cascade():
    df = pd.DataFrame(
        [
            {"id": "UBERON:1", "label": "Anatomy", "name": "heart",
             "xrefs": "FMA:7088", "synonyms": "", "raw_id": ""},
            {"id": "FMA:7088", "label": "Anatomy", "name": "heart fma",
             "xrefs": "", "synonyms": "", "raw_id": ""},
        ]
    )
    out = dedup_cascade(df, ANATOMY_SPEC)
    assert list(out["id"]) == ["UBERON:1"]
    assert "FMA:7088" in out.iloc[0]["xrefs"].split("|")

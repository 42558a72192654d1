"""Build dictionary snapshots from the reference's committed example
results (``/root/reference/examples/results/*_formatted.json``).

The JSON checkpoints are DATA (recorded lookup responses + decisions), not
code: each ``converted_ids[i]`` records the per-database ids and metadata
the live APIs returned for one raw id (``ConvertedId`` dynamic attributes,
ontology_formatter.py:45-102).  Loading them as a snapshot lets the engine
re-run resolution + formatting OFFLINE and compare bit-for-bit against the
committed ``*_formatted.tsv`` — the strongest available parity oracle.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

from ontology_matcher_ray.schemas import OntologySpec, SPECS
from ontology_matcher_ray.state.snapshot import DictionarySnapshot

REFERENCE_EXAMPLES = "/root/reference/examples"

# The reference commits NO symptom example (symptom/__init__.py:1: the
# OxO/OLS4 APIs can't provide symptom metadata yet), so C9 parity runs
# against a synthetic OLS4-shaped fixture whose expected TSV is derived
# BY HAND from the reference's default_format rules — see the fixture's
# embedded comment.
SYMPTOM_FIXTURE = os.path.join(os.path.dirname(__file__), "symptom_fixture")


def _examples_root(kind: str) -> str:
    return SYMPTOM_FIXTURE if kind == "symptom" else REFERENCE_EXAMPLES


def _aslist(v) -> List[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v] if v else []
    if isinstance(v, list):
        return [str(x) for x in v if x]
    return [str(v)]


def _gene_metadata(meta: Dict) -> Dict[str, object]:
    """Fold the MyGene row shape into the engine's meta_* fields,
    reproducing GeneOntologyFormatter.format_by_metadata
    (gene/__init__.py:332-354): SYMBOL -> name, summary -> description,
    alias+other_names+name -> synonyms, taxid."""
    symbol = meta.get("SYMBOL")
    name = meta.get("name")
    synonyms = _aslist(meta.get("alias")) + _aslist(meta.get("other_names"))
    # artifact semantics: the gene name joins the synonym list only when
    # alias/other_names contributed something (the committed TSV keeps
    # synonyms empty for alias-less records; current code appends
    # unconditionally, gene/__init__.py:349-350)
    if synonyms and name:
        synonyms.append(str(name))
    out: Dict[str, object] = {}
    # NOTE: the committed gene_formatted.tsv predates the SYMBOL-name
    # override in gene/__init__.py:338-341 — it keeps metadata['name'].
    # The engine follows the artifact (metadata name first) so parity
    # holds against the only executable oracle available offline.
    if symbol or name:
        out["name"] = str(name or symbol)
    if meta.get("summary"):
        out["description"] = str(meta["summary"])
    if synonyms:
        out["synonyms"] = sorted(set(synonyms))
    if meta.get("taxid") is not None:
        out["taxid"] = str(int(meta["taxid"])) if isinstance(meta["taxid"], float) else str(meta["taxid"])
    return out


def _entity_metadata(meta: Dict) -> Dict[str, object]:
    """Entity-shaped metadata (apis.py:16-36): name/description/synonyms/
    xrefs/pmids pass straight through."""
    out: Dict[str, object] = {}
    for key in ("name", "description"):
        if meta.get(key):
            out[key] = str(meta[key])
    for key in ("synonyms", "xrefs", "pmids"):
        vals = _aslist(meta.get(key))
        if vals:
            out[key] = vals
    return out


def load_golden(kind: str) -> Dict:
    path = os.path.join(_examples_root(kind), "results", f"{kind}_formatted.json")
    with open(path) as f:
        return json.load(f)


def snapshot_from_golden(kind: str) -> Tuple[DictionarySnapshot, OntologySpec]:
    """Snapshot whose routing reproduces the recorded conversion result.

    Converted ids get their per-database lists; failed ids ("No results
    found") are simply ABSENT, which routes them to the same failure.
    """
    spec = SPECS[kind]
    data = load_golden(kind)
    cr = data["conversion_result"]
    snap = DictionarySnapshot()
    gene_style = spec.gene_style_metadata
    for rec in cr["converted_ids"]:
        raw_id = rec["raw_id"]
        prefix = raw_id.split(":", 1)[0]
        db_ids: Dict[str, List[str]] = {}
        for db in spec.choices:
            if db == prefix:
                continue
            vals = _aslist(rec.get(db))
            if vals:
                db_ids[db] = vals
        snap.db_ids[raw_id] = db_ids
        meta = rec.get("metadata")
        if meta:
            folded = _gene_metadata(meta) if gene_style else _entity_metadata(meta)
            if folded:
                snap.metadata[raw_id] = folded
    return snap, spec


def golden_input_path(kind: str) -> str:
    return os.path.join(_examples_root(kind), f"{kind}.tsv")


def golden_formatted_path(kind: str) -> str:
    return os.path.join(_examples_root(kind), "results", f"{kind}_formatted.tsv")

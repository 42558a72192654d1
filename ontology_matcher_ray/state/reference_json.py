"""Reference ``<out>.json`` checkpoint compatibility (S4/S5 migration).

The reference CLI round-trips a JSON checkpoint next to every output TSV
(``CustomJSONEncoder/Decoder``, ``ontology_formatter.py:105-171``) and its
``--reformat`` flag resumes from it instead of re-querying the network
(``cli.py:127-148``).  A migrating user's first action is pointing this
engine at such a file — this module loads the recorded conversion result
(per-database id lists + metadata per raw id) into a
``DictionarySnapshot`` so the resolve stage reproduces the recorded
decisions offline.

The JSON is treated as DATA: ``converted_ids[i]`` records what the live
APIs returned for one raw id (``ConvertedId`` dynamic attributes); failed
ids are simply absent from the snapshot, which routes them to the same
"No results found" outcome.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

from ontology_matcher_ray.schemas import OntologySpec
from ontology_matcher_ray.state.snapshot import DictionarySnapshot


def _aslist(v) -> List[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v] if v else []
    if isinstance(v, list):
        return [str(x) for x in v if x]
    return [str(v)]


def _gene_metadata(meta: Dict) -> Dict[str, object]:
    """MyGene row shape -> engine meta_* fields (gene/__init__.py:332-354):
    SYMBOL/name -> name, summary -> description, alias+other_names(+name)
    -> synonyms, taxid.  See state/golden.py for the artifact-semantics
    notes (the committed TSVs predate the SYMBOL-name override)."""
    symbol = meta.get("SYMBOL")
    name = meta.get("name")
    synonyms = _aslist(meta.get("alias")) + _aslist(meta.get("other_names"))
    if synonyms and name:
        synonyms.append(str(name))
    out: Dict[str, object] = {}
    if symbol or name:
        out["name"] = str(name or symbol)
    if meta.get("summary"):
        out["description"] = str(meta["summary"])
    if synonyms:
        out["synonyms"] = sorted(set(synonyms))
    if meta.get("taxid") is not None:
        out["taxid"] = (
            str(int(meta["taxid"])) if isinstance(meta["taxid"], float)
            else str(meta["taxid"])
        )
    return out


def _entity_metadata(meta: Dict) -> Dict[str, object]:
    """Entity-shaped metadata (apis.py:16-36) passes straight through."""
    out: Dict[str, object] = {}
    for key in ("name", "description"):
        if meta.get(key):
            out[key] = str(meta[key])
    for key in ("synonyms", "xrefs", "pmids"):
        vals = _aslist(meta.get(key))
        if vals:
            out[key] = vals
    return out


def snapshot_from_conversion(data: Dict, spec: OntologySpec) -> DictionarySnapshot:
    """Build a snapshot from a decoded reference checkpoint dict."""
    cr = data.get("conversion_result") or {}
    snap = DictionarySnapshot()
    gene_style = spec.gene_style_metadata
    for rec in cr.get("converted_ids", []):
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
    return snap


def load_reference_checkpoint(path: str, spec: OntologySpec) -> DictionarySnapshot:
    """Load a reference ``<out>.json`` checkpoint file as a snapshot."""
    with open(path) as f:
        data = json.load(f)
    return snapshot_from_conversion(data, spec)


def reference_json_path(output_path: str) -> str:
    """The reference's checkpoint naming convention (cli.py:127)."""
    return output_path[: -len(".tsv")] + ".json" if output_path.endswith(".tsv") \
        else output_path + ".json"

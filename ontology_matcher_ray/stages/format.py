"""Formatting/merge stage: ``default_format`` re-expressed over batches.

The reference loops row-at-a-time over converted ids and point-scans the
raw input per id (``get_raw_record``, O(n^2) —
``ontology_formatter.py:589-607,675-771``).  Here the conversion output
already FLOWS WITH its raw record (the resolve stage annotates the input
row in place), so formatting is a single ``map_batches`` pass: J1 becomes a
no-op join and the routing-tree emission rules (§2.8 rules 6-9) are applied
per batch.

Output rows carry ``sink`` in {"formatted", "failed"}; the two reference
sinks (``<out>.tsv`` / ``<out>.failed.tsv``, ``ontology_formatter.py:792-813``)
are a downstream filter split of the same Dataset.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd

from ontology_matcher_ray.functions.listops import concat, join_lst
from ontology_matcher_ray.schemas import (
    FORMATTED_COLUMNS,
    OntologySpec,
    Strategy,
    STATUS_FAILED,
    STATUS_INVALID,
    STATUS_OK,
    STATUS_OK_RAW,
)


def _record_value(batch_row: Dict[str, object], key: str) -> str:
    v = batch_row.get(key, "")
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ""
    return str(v)


def _cell_list(v) -> List[str]:
    """Normalize a list-typed cell that may arrive as list, ndarray (after a
    Parquet/pandas round-trip) or None."""
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return [str(x) for x in v]
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return [str(x) for x in v.tolist()]
    except ImportError:        # pragma: no cover
        pass
    return [str(v)] if v else []


class Formatter:
    """map_batches stage over resolve-stage output.

    Expects the entity-file columns (id,name,label,resource + optionals,
    ontology_formatter.py:398-436) plus the Resolver's added columns.
    Emits FORMATTED_COLUMNS + reason + sink.
    """

    def __init__(self, spec: OntologySpec, strategy: Strategy = Strategy.MIXTURE):
        self.spec = spec
        self.strategy = strategy

    def _format_converted(self, row: Dict[str, object]) -> Dict[str, str]:
        """Rules 6-7 + metadata merge (ontology_formatter.py:656-739)."""
        spec = self.spec
        raw_id = str(row["id"])
        new_row = {key: _record_value(row, key) for key in FORMATTED_COLUMNS[:-1]}

        meta_syn = _cell_list(row.get("meta_synonyms"))
        meta_xrefs = _cell_list(row.get("meta_xrefs"))
        meta_pmids = _cell_list(row.get("meta_pmids"))
        has_meta = bool(
            row.get("meta_name") or row.get("meta_description")
            or meta_syn or meta_xrefs or row.get("meta_taxid")
        )
        syn_in = _record_value(row, "synonyms")
        xrefs_in = _record_value(row, "xrefs")
        pmids_in = _record_value(row, "pmids")

        if has_meta:
            # default_format_by_metadata (ontology_formatter.py:656-673)
            new_row["name"] = str(row.get("meta_name") or "") or new_row["name"]
            new_row["description"] = str(row.get("meta_description") or "") or new_row["description"]
            synonyms = concat(meta_syn, syn_in)
            xrefs = concat(meta_xrefs, xrefs_in)
            pmids = concat(meta_pmids, pmids_in)
            if self.spec.gene_style_metadata:
                # gene/__init__.py:332-354: taxid and summary-description
                # REPLACE the record values unconditionally (no fallback —
                # gene/__init__.py:343-345); alias+other_names synonyms are
                # already folded into meta_* by the snapshot/Resolver.
                new_row["taxid"] = str(row.get("meta_taxid") or "")
                new_row["description"] = str(row.get("meta_description") or "")
        else:
            synonyms: List[str] | str = syn_in
            xrefs = xrefs_in
            pmids = pmids_in

        alias_ids = _cell_list(row.get("alias_ids"))
        xrefs = concat(alias_ids, xrefs)

        new_row["synonyms"] = join_lst(synonyms)
        new_row["pmids"] = join_lst(pmids)

        if row["status"] == STATUS_OK_RAW:
            # rule 7 (ontology_formatter.py:712-716): keep raw id; label /
            # resource / raw_id stay as the record provided them.
            new_row["id"] = raw_id
            new_row["xrefs"] = join_lst(xrefs)
            new_row["raw_id"] = ""
        else:
            # rule 6+9 (ontology_formatter.py:723-739)
            new_row["raw_id"] = raw_id
            new_row["id"] = str(row["out_id"])
            new_row["resource"] = _record_value(row, "resource")
            new_row["label"] = self.spec.type
            new_row["xrefs"] = join_lst(xrefs)
        new_row["reason"] = ""
        new_row["sink"] = "formatted"
        return new_row

    def _format_failed(self, row: Dict[str, object], force_failed: bool = False) -> Dict[str, str]:
        """Rule 8: failed-id readmission (ontology_formatter.py:741-763).

        ``force_failed`` covers CURIE-regex invalid ids: the reference
        RAISES on those before conversion (ontology_formatter.py:302-303);
        this engine routes them to the failed sink instead of aborting a
        trillion-row job, and never readmits them.
        """
        raw_id = str(row["id"])
        prefix = raw_id.split(":", 1)[0]
        new_row = {key: _record_value(row, key) for key in FORMATTED_COLUMNS[:-1]}
        new_row["id"] = raw_id
        new_row["label"] = self.spec.type
        new_row["resource"] = _record_value(row, "resource")
        new_row["raw_id"] = ""
        if not force_failed and (prefix == self.spec.default or self.strategy == Strategy.MIXTURE):
            new_row["reason"] = ""
            new_row["sink"] = "formatted"
        else:
            new_row["reason"] = str(row.get("reason") or "")
            new_row["sink"] = "failed"
        return new_row

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = batch.to_dict("records")
        out = []
        for row in rows:
            status = row["status"]
            if status in (STATUS_OK, STATUS_OK_RAW):
                out.append(self._format_converted(row))
            else:
                out.append(self._format_failed(row, force_failed=(status == STATUS_INVALID)))
        cols = FORMATTED_COLUMNS + ["reason", "sink"]
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype=str) for c in cols})
        frame = pd.DataFrame(out)
        return frame[cols].astype(str)

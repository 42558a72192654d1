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
        """Vectorized formatting pass.

        Scalar fields (id/label/resource/raw_id/reason/sink and the
        has-meta name/description/taxid overrides) are mask-based numpy
        column ops; only the LIST-valued merges (synonyms/xrefs/pmids,
        inherently per-cell set unions) run in a tight loop restricted to
        converted rows.  Same row semantics as ``_format_converted`` /
        ``_format_failed`` (kept above as the per-row reference
        implementation — exercised directly by unit tests).
        """
        import numpy as np

        cols = FORMATTED_COLUMNS + ["reason", "sink"]
        n = len(batch)
        if n == 0:
            return pd.DataFrame({c: pd.Series([], dtype=str) for c in cols})

        def scol(key: str) -> np.ndarray:
            if key in batch.columns:
                s = batch[key]
                return s.where(s.notna(), "").astype(str).to_numpy(dtype=object)
            return np.full(n, "", dtype=object)

        def lcol(key: str):
            if key in batch.columns:
                return batch[key].to_numpy(dtype=object)
            return np.full(n, None, dtype=object)

        out = {key: scol(key) for key in FORMATTED_COLUMNS[:-1]}
        status = batch["status"].to_numpy(dtype=object)
        raw_ids = out["id"].copy()
        is_ok = status == STATUS_OK
        is_okraw = status == STATUS_OK_RAW
        conv = is_ok | is_okraw
        is_invalid = status == STATUS_INVALID

        reason = np.full(n, "", dtype=object)
        sink = np.full(n, "formatted", dtype=object)

        # ---- converted rows: metadata overrides + list merges ----
        idxs = np.flatnonzero(conv)
        if len(idxs):
            meta_name = scol("meta_name")
            meta_desc = scol("meta_description")
            meta_taxid = scol("meta_taxid")
            msyn, mxr, mpm = lcol("meta_synonyms"), lcol("meta_xrefs"), lcol("meta_pmids")
            alias = lcol("alias_ids")
            syn_in, xr_in, pm_in = out["synonyms"], out["xrefs"], out["pmids"]
            gene_style = self.spec.gene_style_metadata
            for i in idxs:
                ms, mx, mp = _cell_list(msyn[i]), _cell_list(mxr[i]), _cell_list(mpm[i])
                has_meta = bool(meta_name[i] or meta_desc[i] or ms or mx or meta_taxid[i])
                if has_meta:
                    # default_format_by_metadata (ontology_formatter.py:656-673)
                    if meta_name[i]:
                        out["name"][i] = meta_name[i]
                    if meta_desc[i]:
                        out["description"][i] = meta_desc[i]
                    synonyms = concat(ms, syn_in[i])
                    xrefs0 = concat(mx, xr_in[i])
                    pmids = concat(mp, pm_in[i])
                    if gene_style:
                        # gene/__init__.py:332-354: REPLACE unconditionally
                        out["taxid"][i] = meta_taxid[i]
                        out["description"][i] = meta_desc[i]
                else:
                    synonyms, xrefs0, pmids = syn_in[i], xr_in[i], pm_in[i]
                xrefs = concat(_cell_list(alias[i]), xrefs0)
                out["synonyms"][i] = join_lst(synonyms)
                out["pmids"][i] = join_lst(pmids)
                out["xrefs"][i] = join_lst(xrefs)

        # ---- scalar routing fields, mask-based (§2.8 rules 6-9) ----
        out_id = scol("out_id")
        raw_col = np.full(n, "", dtype=object)
        # rule 6+9 (ok): canonical id, raw_id kept, typed label
        out["id"] = np.where(is_ok, out_id, out["id"])
        raw_col = np.where(is_ok, raw_ids, raw_col)
        out["label"] = np.where(is_ok, self.spec.type, out["label"])
        # rule 7 (ok_raw): keep raw id; label/resource as the record
        out["id"] = np.where(is_okraw, raw_ids, out["id"])
        # rule 8 + invalid: failed sink routing with readmission
        failed_like = ~conv
        if failed_like.any():
            out["id"] = np.where(failed_like, raw_ids, out["id"])
            out["label"] = np.where(failed_like, self.spec.type, out["label"])
            prefixes = np.array(
                [r.split(":", 1)[0] for r in raw_ids[failed_like]], dtype=object
            )
            readmit = np.zeros(n, dtype=bool)
            readmit[failed_like] = (
                (self.strategy == Strategy.MIXTURE) | (prefixes == self.spec.default)
            )
            readmit &= ~is_invalid          # invalid ids are never readmitted
            to_failed = failed_like & ~readmit
            reason = np.where(to_failed, scol("reason"), reason)
            sink = np.where(to_failed, "failed", sink)
        out["raw_id"] = raw_col

        frame = pd.DataFrame({k: out[k] for k in FORMATTED_COLUMNS[:-1]})
        frame["raw_id"] = out["raw_id"]
        frame["reason"] = reason
        frame["sink"] = sink
        return frame[cols].astype(str)

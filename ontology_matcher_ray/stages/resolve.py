"""The resolution core: §2.8 routing tree as a pure function + Ray stage.

``route_id`` reproduces, decision-for-decision, the reference's response
routers (``disease/__init__.py:87-178``, ``gene/__init__.py:94-195``,
``compound/__init__.py:88-107``) against an offline xref dictionary instead
of a live HTTP response.  The Ray-side ``Resolver`` is a callable class for
``map_batches(Resolver, concurrency=N)``: the dictionary is fetched from the
object store ONCE per actor in ``__init__`` (broadcast via ``ray.put``), and
``__call__`` resolves a whole Arrow batch with hash lookups — no network, no
sleeps, no per-batch state rebuild.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ontology_matcher_ray.schemas import (
    OntologySpec,
    Strategy,
    STATUS_FAILED,
    STATUS_INVALID,
    STATUS_OK,
    STATUS_OK_RAW,
    REASON_MULTIPLE,
    REASON_NO_RESULTS,
    REASON_UNIQUE_MULTI,
    reason_invalid_prefix,
)


@dataclass
class RouteResult:
    """Outcome of routing one raw id through the fallback chain."""

    status: str                      # ok | ok_raw | failed | invalid
    reason: str = ""
    out_id: str = ""                 # canonical id ("ok") or raw id otherwise
    alias_ids: List[str] = field(default_factory=list)   # sorted xref CURIEs
    meta_name: str = ""
    meta_description: str = ""
    meta_synonyms: List[str] = field(default_factory=list)
    meta_xrefs: List[str] = field(default_factory=list)
    meta_pmids: List[str] = field(default_factory=list)
    meta_taxid: str = ""


def route_id(
    raw_id: str,
    db_ids: Optional[Dict[str, List[str]]],
    spec: OntologySpec,
    strategy: Strategy = Strategy.MIXTURE,
    metadata: Optional[Dict[str, object]] = None,
) -> RouteResult:
    """Route one raw CURIE through the §2.8 decision tree.

    Decision order matches the reference exactly:
      1. CURIE regex / prefix validity (ontology_formatter.py:292-303,
         disease/__init__.py:112-119) -> invalid.
      2. no dictionary hit -> failed "No results found"
         (disease/__init__.py:123-126).
      3. >1 hit in the DEFAULT database -> failed "Multiple results found",
         whole record abandoned (disease/__init__.py:151-158).
      4. UNIQUE strategy and >1 hit in ANY database -> failed
         (disease/__init__.py:160-169).
      5. exactly one default-db hit -> ok; output id = that hit.
      6. converted but no default-db hit -> ok_raw; output id = raw id
         (mixture fallback, ontology_formatter.py:712-716).

    ``alias_ids`` reproduces ``get_alias_ids``
    (ontology_formatter.py:625-641): every non-default db's ids, INCLUDING
    the raw id itself when its prefix is not the default database (the
    reference stores the raw id under its prefix attribute,
    disease/__init__.py:130).
    """
    prefix, _, _local = raw_id.partition(":")

    if not spec.curie_regex.match(raw_id or ""):
        return RouteResult(status=STATUS_INVALID, reason=reason_invalid_prefix(spec), out_id=raw_id)

    if not db_ids:
        return RouteResult(status=STATUS_FAILED, reason=REASON_NO_RESULTS, out_id=raw_id)

    # the raw id is implicitly a hit in its own prefix database
    effective: Dict[str, List[str]] = {prefix: [raw_id]}
    for db, ids in db_ids.items():
        if db == prefix:
            continue
        if ids:
            effective[db] = list(ids)

    for choice in spec.choices:
        if choice == prefix:
            continue
        hits = effective.get(choice, [])
        if choice == spec.default and len(hits) > 1:
            return RouteResult(status=STATUS_FAILED, reason=REASON_MULTIPLE, out_id=raw_id)
        if strategy == Strategy.UNIQUE and len(hits) > 1:
            return RouteResult(status=STATUS_FAILED, reason=REASON_UNIQUE_MULTI, out_id=raw_id)

    default_hits = effective.get(spec.default, [])
    alias_ids = sorted(
        {
            cid
            for db, ids in effective.items()
            if db != spec.default
            for cid in ids
            if cid
        }
    )

    meta = metadata or {}

    def _aslist(v) -> List[str]:
        if isinstance(v, str) and v:
            return [v]
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v if x]
        return []

    common = dict(
        alias_ids=alias_ids,
        meta_name=str(meta.get("name") or ""),
        meta_description=str(meta.get("description") or meta.get("summary") or ""),
        meta_synonyms=_aslist(meta.get("synonyms")),
        meta_xrefs=_aslist(meta.get("xrefs")),
        meta_pmids=_aslist(meta.get("pmids")),
        meta_taxid=str(meta.get("taxid") or ""),
    )

    if not default_hits:
        return RouteResult(status=STATUS_OK_RAW, out_id=raw_id, **common)
    return RouteResult(status=STATUS_OK, out_id=default_hits[0], **common)


class Resolver:
    """Actor-pool stage: resolve an ``id`` column against the dictionary.

    Usage::

        snap_ref = ray.put(snapshot)          # once, on the driver
        ds.map_batches(Resolver, fn_constructor_kwargs=dict(
                           snapshot_ref=snap_ref, spec=spec),
                       batch_format="pandas", concurrency=N)

    The precomputed route table (raw_id -> RouteResult fields) is built once
    per actor in ``__init__`` — the Ray-native analogue of the reference's
    whole-run sqlite HTTP cache (``cli.py:103-125``).
    """

    ADDED_COLUMNS = [
        "status", "reason", "out_id", "alias_ids",
        "meta_name", "meta_description", "meta_synonyms",
        "meta_xrefs", "meta_pmids", "meta_taxid",
    ]

    FIELDS = [
        "status", "reason", "out_id", "alias_ids",
        "meta_name", "meta_description", "meta_synonyms",
        "meta_xrefs", "meta_pmids", "meta_taxid",
    ]

    def __init__(self, snapshot_ref, spec: OntologySpec, strategy: Strategy = Strategy.MIXTURE,
                 id_column: str = "id"):
        snapshot = ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef) else snapshot_ref
        self.spec = spec
        self.strategy = strategy
        self.id_column = id_column
        # Precompute every known raw_id's route once per actor, laid out
        # as SORTED parallel column arrays: batch resolution is then one
        # vectorized searchsorted + per-field fancy-index (no per-row
        # Python in __call__; the dict/dataclass layout only exists here).
        keys = sorted(snapshot.db_ids)
        routes = [
            route_id(rid, snapshot.db_ids[rid], spec, strategy,
                     snapshot.metadata.get(rid))
            for rid in keys
        ]
        self.keys = np.array(keys, dtype=np.str_)

        def obj_col(values) -> np.ndarray:
            # 1-D object array of list/str cells; np.array() would collapse
            # equal-length list cells into a 2-D array
            col = np.empty(len(values), dtype=object)
            for i, v in enumerate(values):
                col[i] = v
            return col

        self.cols: Dict[str, np.ndarray] = {
            f: obj_col([getattr(r, f) for r in routes]) for f in self.FIELDS
        }
        self._invalid_reason = reason_invalid_prefix(spec)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_column].astype(str)
        arr = ids.to_numpy(dtype=np.str_)
        n = len(arr)
        batch = batch.copy()
        if len(self.keys):
            idx = np.clip(np.searchsorted(self.keys, arr), 0, len(self.keys) - 1)
            hit = self.keys[idx] == arr
        else:
            idx = np.zeros(n, dtype=np.int64)
            hit = np.zeros(n, dtype=bool)
        miss = ~hit
        vals = {f: self.cols[f][idx] if len(self.keys) else
                np.full(n, None, dtype=object) for f in self.FIELDS}
        if miss.any():
            # miss routing tree (rules 1-2): invalid prefix vs no-results,
            # vectorized via the compiled CURIE regex
            raw = ids.to_numpy(dtype=object)
            valid = ids.str.match(self.spec.curie_regex).to_numpy()
            for f in self.FIELDS:
                vals[f] = vals[f].copy()
            vals["status"][miss] = np.where(valid[miss], STATUS_FAILED, STATUS_INVALID)
            vals["reason"][miss] = np.where(
                valid[miss], REASON_NO_RESULTS, self._invalid_reason
            )
            vals["out_id"][miss] = raw[miss]
            n_miss = int(miss.sum())
            empty_list_cells = np.empty(n_miss, dtype=object)
            for i in range(n_miss):
                empty_list_cells[i] = []
            for f in ("alias_ids", "meta_synonyms", "meta_xrefs", "meta_pmids"):
                vals[f][miss] = empty_list_cells
            for f in ("meta_name", "meta_description", "meta_taxid"):
                vals[f][miss] = ""
        for f in self.FIELDS:
            batch[f] = vals[f]
        return batch

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

    def __init__(self, snapshot_ref, spec: OntologySpec, strategy: Strategy = Strategy.MIXTURE,
                 id_column: str = "id"):
        snapshot = ray.get(snapshot_ref) if isinstance(snapshot_ref, ray.ObjectRef) else snapshot_ref
        self.spec = spec
        self.strategy = strategy
        self.id_column = id_column
        # Precompute every known raw_id's route once per actor.
        self.table: Dict[str, RouteResult] = {
            raw_id: route_id(raw_id, db_ids, spec, strategy, snapshot.metadata.get(raw_id))
            for raw_id, db_ids in snapshot.db_ids.items()
        }
        self._miss_cache: Dict[str, RouteResult] = {}

    def _route(self, raw_id: str) -> RouteResult:
        hit = self.table.get(raw_id)
        if hit is not None:
            return hit
        miss = self._miss_cache.get(raw_id)
        if miss is None:
            miss = route_id(raw_id, None, self.spec, self.strategy, None)
            self._miss_cache[raw_id] = miss
        return miss

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        routes = [self._route(rid) for rid in batch[self.id_column].astype(str)]
        batch = batch.copy()
        batch["status"] = [r.status for r in routes]
        batch["reason"] = [r.reason for r in routes]
        batch["out_id"] = [r.out_id for r in routes]
        batch["alias_ids"] = [r.alias_ids for r in routes]
        batch["meta_name"] = [r.meta_name for r in routes]
        batch["meta_description"] = [r.meta_description for r in routes]
        batch["meta_synonyms"] = [r.meta_synonyms for r in routes]
        batch["meta_xrefs"] = [r.meta_xrefs for r in routes]
        batch["meta_pmids"] = [r.meta_pmids for r in routes]
        batch["meta_taxid"] = [r.meta_taxid for r in routes]
        return batch

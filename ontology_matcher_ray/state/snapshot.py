"""Dictionary/lexicon snapshot: build-once, broadcast-everywhere linker state.

Replaces the reference's live OXO/MyGene/MyChem lookups + sqlite HTTP cache
(``cli.py:103-125``, ``apis.py``) with an offline, deterministic snapshot:

* fixture entries (``state/fixtures.py``) pinned for the correctness oracle;
* ``n_synthetic`` seeded programmatic entries shaped like real xref data
  (1-hit, multi-hit, non-default-only, and missing cases in fixed ratios)
  so bench runs exercise realistic dictionary sizes (10^5-10^6 entries,
  the scale the reference reports: 589k genes / 175k compounds,
  README.md:96-111).

At 100 TB scale the snapshot is built once on the driver (or loaded from a
Parquet snapshot dir), pushed to the object store with ``ray.put``, and each
linker/extractor actor fetches it zero-copy-ish in ``__init__`` — it is
never re-shipped per batch and never shuffled.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ontology_matcher_ray.schemas import DICTIONARY_SCHEMA, LEXICON_SCHEMA, OntologySpec
from ontology_matcher_ray.state.fixtures import (
    FIXTURE_DICT,
    FIXTURE_METADATA,
    FIXTURE_TERMS,
)


@dataclass
class DictionarySnapshot:
    """In-memory linker state: raw_id -> per-db ids (+ optional metadata)."""

    db_ids: Dict[str, Dict[str, List[str]]] = field(default_factory=dict)
    metadata: Dict[str, Dict[str, object]] = field(default_factory=dict)
    # term surface form -> raw CURIE, for mention extraction
    lexicon: Dict[str, str] = field(default_factory=dict)

    def to_tables(self) -> Tuple[pa.Table, pa.Table]:
        """Materialize as Arrow tables (DICTIONARY_SCHEMA / LEXICON_SCHEMA)."""
        raw_ids = sorted(self.db_ids)
        rows = {
            "raw_id": raw_ids,
            "db_ids": [sorted(self.db_ids[r].items()) for r in raw_ids],
            "name": [str((self.metadata.get(r) or {}).get("name") or "") for r in raw_ids],
            "synonyms": [list((self.metadata.get(r) or {}).get("synonyms") or []) for r in raw_ids],
            "xrefs": [list((self.metadata.get(r) or {}).get("xrefs") or []) for r in raw_ids],
            "description": [str((self.metadata.get(r) or {}).get("description") or "") for r in raw_ids],
            "pmids": [list((self.metadata.get(r) or {}).get("pmids") or []) for r in raw_ids],
            "taxid": [str((self.metadata.get(r) or {}).get("taxid") or "") for r in raw_ids],
        }
        dict_table = pa.Table.from_pydict(rows, schema=DICTIONARY_SCHEMA)
        terms = sorted(self.lexicon)
        lex_table = pa.Table.from_pydict(
            {"term": terms, "raw_id": [self.lexicon[t] for t in terms]},
            schema=LEXICON_SCHEMA,
        )
        return dict_table, lex_table

    def write_parquet(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        dict_table, lex_table = self.to_tables()
        pq.write_table(dict_table, os.path.join(out_dir, "dictionary.parquet"))
        pq.write_table(lex_table, os.path.join(out_dir, "lexicon.parquet"))

    @classmethod
    def read_parquet(cls, in_dir: str) -> "DictionarySnapshot":
        dict_table = pq.read_table(os.path.join(in_dir, "dictionary.parquet"))
        lex_table = pq.read_table(os.path.join(in_dir, "lexicon.parquet"))
        snap = cls()
        for row in dict_table.to_pylist():
            snap.db_ids[row["raw_id"]] = {db: list(ids) for db, ids in row["db_ids"]}
            meta = {}
            if row["name"]:
                meta["name"] = row["name"]
            if row["description"]:
                meta["description"] = row["description"]
            if row["synonyms"]:
                meta["synonyms"] = list(row["synonyms"])
            if row["xrefs"]:
                meta["xrefs"] = list(row["xrefs"])
            if row["pmids"]:
                meta["pmids"] = list(row["pmids"])
            if row["taxid"]:
                meta["taxid"] = row["taxid"]
            if meta:
                snap.metadata[row["raw_id"]] = meta
        for row in lex_table.to_pylist():
            snap.lexicon[row["term"]] = row["raw_id"]
        return snap


def synthetic_curie(i: int, db: str) -> str:
    return f"{db}:{'D' if db == 'MESH' else ''}9{i:07d}"


def build_snapshot(
    spec: OntologySpec,
    n_synthetic: int = 0,
    seed: int = 42,
    include_fixtures: bool = True,
) -> DictionarySnapshot:
    """Deterministic snapshot: fixtures + ``n_synthetic`` seeded entries.

    Synthetic entry i (raw prefix cycles over non-default choices):
      * i % 10 == 7 -> hits only in a non-default db  (ok_raw path)
      * i % 10 == 8 -> two default-db hits            (failed Multiple)
      * i % 50 == 9 -> absent from dictionary         (failed No results)
      * otherwise   -> single default-db hit (+ one extra xref db hit)
    Every worker building with the same (spec, n, seed) gets an identical
    snapshot — required for cross-actor consistency.
    """
    snap = DictionarySnapshot()
    if include_fixtures:
        snap.db_ids.update({k: {db: list(v) for db, v in d.items()} for k, d in FIXTURE_DICT.items()})
        snap.metadata.update({k: dict(v) for k, v in FIXTURE_METADATA.items()})
        snap.lexicon.update(FIXTURE_TERMS)

    if n_synthetic > 0:
        non_default = spec.non_default_choices
        default = spec.default
        for i in range(n_synthetic):
            src_db = non_default[i % len(non_default)]
            raw = synthetic_curie(i, src_db)
            if i % 50 == 9:
                # planted miss: term exists in the lexicon but not the dict
                snap.lexicon[f"synterm{i}"] = raw
                continue
            if i % 10 == 7:
                other = non_default[(i + 1) % len(non_default)]
                entry = {other: [synthetic_curie(i, other)]}
            elif i % 10 == 8:
                entry = {default: [f"{default}:9{i:07d}", f"{default}:8{i:07d}"]}
            else:
                entry = {default: [f"{default}:9{i:07d}"]}
                if i % 3 == 0:
                    other = non_default[(i + 2) % len(non_default)]
                    entry[other] = [synthetic_curie(i, other)]
            snap.db_ids[raw] = entry
            snap.lexicon[f"synterm{i}"] = raw
    return snap


_SNAPSHOT_CACHE: Dict[Tuple[str, int, int, bool], DictionarySnapshot] = {}


def get_snapshot(
    spec: OntologySpec,
    n_synthetic: int = 0,
    seed: int = 42,
    include_fixtures: bool = True,
) -> DictionarySnapshot:
    """Process-level memoized snapshot (driver side)."""
    key = (spec.type, n_synthetic, seed, include_fixtures)
    if key not in _SNAPSHOT_CACHE:
        _SNAPSHOT_CACHE[key] = build_snapshot(spec, n_synthetic, seed, include_fixtures)
    return _SNAPSHOT_CACHE[key]

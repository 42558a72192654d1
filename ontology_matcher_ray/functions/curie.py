"""CURIE parsing/validation, vectorized over Arrow/pandas batches.

Re-expresses ``_check_ids`` (ontology_formatter.py:279-303) and
``make_grouped_ids`` (ontology_formatter.py:180-200) as batch-level
column operations instead of per-row Python loops: invalid rows are ROUTED
(status/reason columns) rather than raised, so a trillion-row corpus never
aborts on one bad id (SURVEY.md §2.2 M2/M3).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ontology_matcher_ray.schemas import OntologySpec


def split_curie_arrays(ids: "pa.ChunkedArray | pa.Array") -> Tuple[pa.Array, pa.Array]:
    """Split ``db:local`` on the FIRST colon -> (prefix, local) arrays.

    The reference splits with ``id.split(":")`` and takes [0]/[1]
    (ontology_formatter.py:189); locals with dots (``ICD-9:349.89``) are
    preserved because we split at most once.  Rows without a colon get
    ``local == ''``.  Vectorized with pyarrow.compute throughout.
    """
    arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    arr = pc.cast(arr, pa.string())
    split = pc.split_pattern(arr, pattern=":", max_splits=1)
    prefix = pc.list_element(split, 0)           # every row has >= 1 element
    stripped = pc.replace_substring_regex(
        arr, pattern=r"^[^:]*:", replacement="", max_replacements=1
    )
    has_colon = pc.not_equal(pc.find_substring(arr, ":"), -1)
    local = pc.if_else(has_colon, stripped, "")
    return prefix, local


def validate_ids(ids: "np.ndarray | list", spec: OntologySpec) -> np.ndarray:
    """Boolean mask of CURIE-regex validity (ontology_formatter.py:292)."""
    rx = spec.curie_regex
    return np.fromiter(
        (bool(isinstance(i, str) and rx.match(i)) for i in ids),
        dtype=bool,
        count=len(ids),
    )


def group_by_prefix(ids: List[str]) -> Tuple[dict, dict]:
    """Bucket ids by CURIE prefix, keeping original index.

    Driver-side helper equivalent to ``make_grouped_ids``
    (ontology_formatter.py:180-200); the Ray pipelines instead keep the
    prefix as a column and rely on groupby, but small control paths (CLI,
    tests) use this.
    """
    id_dict: dict = {}
    id_idx: dict = {}
    for idx, cid in enumerate(ids):
        prefix, _, local = cid.partition(":")
        id_dict.setdefault(prefix, []).append(local)
        id_idx[f"{prefix}:{local}"] = idx
    return id_dict, id_idx

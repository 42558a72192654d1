"""List/set scalar functions matching the reference's cell semantics.

``join_lst`` / ``concat`` / ``flatten_dedup`` re-express
``ontology_formatter.py:203-210,544-568``.  One deliberate refinement: the
reference materializes Python ``set`` iteration order (non-deterministic
across processes); this engine SORTS every deduped collection so output is
deterministic under parallel execution (SURVEY.md §4.1 "order independence").
Set equality with the reference is preserved.
"""

from __future__ import annotations

from typing import Iterable, List, Union

StrOrList = Union[str, List[str], None]


def flatten_dedup(nested: Iterable) -> List[str]:
    """Flatten one level of nesting and dedup (ontology_formatter.py:203-210).

    Deterministic: returns sorted order instead of arbitrary set order.
    """
    flat: List[str] = []
    for item in nested:
        if isinstance(item, list):
            flat.extend(item)
        else:
            flat.append(item)
    return sorted(set(flat))


def join_lst(value: StrOrList) -> str:
    """Normalize str-or-list to a pipe-joined, deduped, empty-filtered string.

    Mirrors ``ontology_formatter.py:544-553``: embedded pipes in elements are
    split out before dedup.  Sorted for determinism.
    """
    if isinstance(value, str):
        parts = sorted(set(value.split("|")))
        return "|".join(p for p in parts if p)
    if isinstance(value, (list, tuple)):
        nested = [str(x).split("|") for x in value if x]
        parts = flatten_dedup(nested)
        return "|".join(p for p in parts if p)
    return ""


def concat(x: StrOrList, y: StrOrList) -> List[str]:
    """Set-union two str-or-list values (ontology_formatter.py:555-568).

    Falsy inputs contribute nothing; strings count as single elements
    (pipe-splitting happens later in ``join_lst``).  Sorted for determinism.
    """
    xs = [x] if isinstance(x, str) and x else (list(x) if isinstance(x, (list, tuple)) else [])
    ys = [y] if isinstance(y, str) and y else (list(y) if isinstance(y, (list, tuple)) else [])
    return sorted(set(xs + ys))


def merge_unique(items: Iterable[StrOrList]) -> str:
    """Union of pipe-split string cells -> pipe-joined string.

    The dedup aggregation's combiner (``cli.py:262-267`` ``merge_unique``),
    used by the canonical-id merge (``cli.py:276-291``).  Associative and
    commutative, so it is safe as a two-phase (partial/final) Ray aggregate.
    Sorted for determinism; empty fragments dropped.
    """
    out: set = set()
    for item in items:
        if isinstance(item, str):
            out.update(item.split("|"))
        elif isinstance(item, (list, tuple)):
            for sub in item:
                if isinstance(sub, str):
                    out.update(sub.split("|"))
    return "|".join(sorted(p for p in out if p))

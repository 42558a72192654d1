"""Triple-level precision/recall between two formatted entity tables.

The north-star metric for this engine is "triple P/R >= 0.95 vs the
ontology-matcher reference fixtures": every cell of a formatted
conversion result is an emitted (subject, predicate, object) triple —
``(id, column, value)``, with pipe-joined multi-value cells contributing
one triple per element (the reference materializes arbitrary Python set
order for those cells, so they are SETS by contract; reference
``ontology_matcher/ontology_formatter.py`` ``format_output`` /
``save_to_file``).  Precision is the fraction of engine triples present
in the reference set; recall the fraction of reference triples the
engine emits.  ``tests/test_triple_pr.py`` computes this against the
reference's committed golden artifacts and BASELINE.md records the
numbers.
"""

from __future__ import annotations

from typing import FrozenSet, Iterable, Tuple

import pandas as pd

Triple = Tuple[str, str, str]

PIPE_COLS = frozenset({"synonyms", "pmids", "xrefs"})


def entity_triples(df: pd.DataFrame,
                   pipe_cols: Iterable[str] = PIPE_COLS,
                   id_col: str = "id") -> FrozenSet[Triple]:
    """Explode a formatted entity table into its (id, column, value)
    triple set.  Empty cells emit nothing (an absent value is not a
    triple); pipe columns emit one triple per non-empty element."""
    pipe = frozenset(pipe_cols)
    trips = set()
    df = df.fillna("").astype(str)
    for col in df.columns:
        if col == id_col:
            continue
        ids = df[id_col].to_numpy()
        vals = df[col].to_numpy()
        if col in pipe:
            for sid, cell in zip(ids, vals):
                for part in cell.split("|"):
                    if part:
                        trips.add((sid, col, part))
        else:
            for sid, cell in zip(ids, vals):
                if cell:
                    trips.add((sid, col, cell))
    return frozenset(trips)


def triple_pr(got: FrozenSet[Triple],
              want: FrozenSet[Triple]) -> Tuple[float, float]:
    """(precision, recall) of ``got`` against the reference set
    ``want``.  Empty sets score 1.0 on their side (nothing asserted /
    nothing missed)."""
    hit = len(got & want)
    p = hit / len(got) if got else 1.0
    r = hit / len(want) if want else 1.0
    return p, r

"""Mention / relation extraction stages (stateful actor pools).

``MentionExtractor`` is the engine's analogue of scanning text against the
ontology label+synonym lexicon (terms shaped like ``Entity.synonyms``,
``apis.py:16-36``): the lexicon index is built ONCE per actor in
``__init__`` and each ``__call__`` matches a whole batch vectorized —
tokens via an exploded merge for single-word terms, consecutive n-grams for
phrase terms.  Match semantics are word-boundary containment (term appears
as a whitespace-delimited token run), which the DuckDB oracle reproduces
with ``LIKE '% term %'`` on padded text.

``CurieExtractor`` pulls literal CURIE mentions out of source-code
``content`` with one compiled alternation regex (prefixes from the
OntologySpec choices); ``ImportExtractor`` pulls ``import a.b.c`` relations.
Both are stateless-per-batch but keep compiled regexes per actor.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

import ray

from ontology_matcher_ray.schemas import OntologySpec


class MentionExtractor:
    """map_batches stage: (id_col, text_col) -> (id_col, term, raw_id) rows.

    One output row per DISTINCT (document, term) pair, matching the
    "mention set" semantics the downstream linker needs (duplicate
    occurrences carry no extra signal for entity linking).
    """

    def __init__(self, lexicon_ref, id_col: str = "doc_id", text_col: str = "text",
                 fuzzy: bool = False):
        lexicon: Dict[str, str] = (
            ray.get(lexicon_ref) if isinstance(lexicon_ref, ray.ObjectRef) else lexicon_ref
        )
        self.id_col = id_col
        self.text_col = text_col
        self.fuzzy = fuzzy
        # split lexicon into single-token terms and n-gram phrase terms
        self.word_terms: Dict[str, str] = {}
        self.phrase_terms: Dict[int, Dict[str, str]] = {}   # n -> {phrase: raw_id}
        for term, raw_id in lexicon.items():
            parts = term.split(" ")
            if len(parts) == 1:
                self.word_terms[term] = raw_id
            else:
                self.phrase_terms.setdefault(len(parts), {})[term] = raw_id
        self.word_frame = pd.DataFrame(
            {"term": list(self.word_terms), "raw_id": list(self.word_terms.values())}
        )
        self.phrase_frames = {
            n: pd.DataFrame({"term": list(d), "raw_id": list(d.values())})
            for n, d in self.phrase_terms.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].reset_index(drop=True)
        toks = batch[self.text_col].astype(str).str.split(" ").reset_index(drop=True)

        outs: List[pd.DataFrame] = []

        # single-word terms: explode tokens, inner-merge with the lexicon
        exploded = pd.DataFrame({"_id": ids, "term": toks}).explode("term")
        hits = exploded.merge(self.word_frame, on="term", how="inner")
        if len(hits):
            outs.append(hits.drop_duplicates(["_id", "term"]))

        if self.fuzzy:
            # exact-then-fuzzy tier (north-star): tokens that are not
            # exact keys fall back to lowercase fold + single plural
            # strip; the match is reported under the CANONICAL lexicon
            # surface form, vectorized as two extra merges
            tok = exploded["term"].astype(str)
            low = tok.str.lower()
            stripped = np.where(
                (low.str.len() > 3) & low.str.endswith("s"),
                low.str[:-1], low,
            )
            exact = tok.isin(self.word_terms)
            cand = exploded.loc[~exact, ["_id"]].copy()
            cand["term"] = low[~exact].to_numpy()
            miss_low = ~cand["term"].isin(self.word_terms)
            cand.loc[miss_low, "term"] = stripped[(~exact).to_numpy()][
                miss_low.to_numpy()
            ]
            fhits = cand.merge(self.word_frame, on="term", how="inner")
            if len(fhits):
                outs.append(fhits.drop_duplicates(["_id", "term"]))

        # phrase terms: consecutive n-grams within each doc, then merge
        for n, frame in self.phrase_frames.items():
            grams_col = toks.map(
                lambda t, n=n: [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
            )
            grams = pd.DataFrame({"_id": ids, "term": grams_col}).explode("term")
            phits = grams.merge(frame, on="term", how="inner")
            if len(phits):
                outs.append(phits.drop_duplicates(["_id", "term"]))

        if not outs:
            return pd.DataFrame(
                {self.id_col: pd.Series([], dtype=ids.dtype),
                 "term": pd.Series([], dtype=str),
                 "raw_id": pd.Series([], dtype=str)}
            )
        out = pd.concat(outs, ignore_index=True)
        out = out.rename(columns={"_id": self.id_col})
        out = out[[self.id_col, "term", "raw_id"]]
        if self.fuzzy:
            # a doc with both "Spark" and "spark" reports (doc, spark) once
            out = out.drop_duplicates([self.id_col, "term"])
        return out


class CurieExtractor:
    """map_batches stage: source content -> (file_id, raw_id) CURIE mentions.

    The alternation regex is compiled once per actor from the spec's
    choices, mirroring the CURIE pattern of ``ontology_formatter.py:292``
    but applied as a *search* over free text instead of a full-string match.
    Emits DISTINCT (file, curie) pairs.

    ``scan`` is the hot-path equivalent: CURIEs are COLON-anchored and
    colons are rare in source text, so scanning ``str.find(':')`` (C
    memchr) and validating the prefix/id around each colon is ~10x faster
    than running the alternation regex over every byte.  Equivalence with
    the regex is property-tested (tests/test_properties.py).
    """

    ID_CHARS = frozenset(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.+*"
    )
    PREFIX_CHARS = frozenset(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-"
    )

    def __init__(self, spec: OntologySpec, id_col: str = "file_id", text_col: str = "content"):
        self.id_col = id_col
        self.text_col = text_col
        choices = "|".join(re.escape(c) for c in spec.choices)
        self.rx = re.compile(r"\b(%s):[a-z0-9A-Z\.\+\*]+" % choices)
        self.choice_set = frozenset(spec.choices)
        # longest-first so an overlapping shorter choice cannot shadow a
        # longer one in the boundary-suffix fallback
        self.choices_by_len = sorted(spec.choices, key=len, reverse=True)

    def scan(self, text: str) -> set:
        """Set of CURIE mentions in ``text`` — same result as
        ``{m.group(0) for m in self.rx.finditer(text)}``."""
        res = set()
        id_chars = self.ID_CHARS
        pref_chars = self.PREFIX_CHARS
        n = len(text)
        idx = text.find(":")
        while idx != -1:
            j = idx - 1
            while j >= 0 and text[j] in pref_chars:
                j -= 1
            span = text[j + 1 : idx]
            pref = None
            if span in self.choice_set:
                # char before span is not in PREFIX_CHARS ⊇ \w, so the
                # regex's \b boundary holds automatically
                pref = span
            else:
                for c in self.choices_by_len:
                    if span.endswith(c) and len(span) > len(c):
                        before = span[-len(c) - 1]
                        # \w chars deny the boundary; '-' etc. allow it
                        if not (before.isalnum() or before == "_"):
                            pref = c
                            break
            if pref is not None:
                k = idx + 1
                while k < n and text[k] in id_chars:
                    k += 1
                if k > idx + 1:
                    res.add(pref + text[idx:k])
            idx = text.find(":", idx + 1)
        return res

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].reset_index(drop=True)
        found = batch[self.text_col].astype(str).reset_index(drop=True).map(
            lambda s: sorted(self.scan(s))
        )
        out = pd.DataFrame({self.id_col: ids, "raw_id": found}).explode("raw_id")
        out = out[out["raw_id"].notna()]
        return out.reset_index(drop=True)


class ImportExtractor:
    """map_batches stage: source content -> (file_id, imported_module) rows.

    Matches ``import x.y.z`` / ``from x.y import z`` style lines with one
    compiled regex; emits DISTINCT (file, module) pairs for the
    ``imports`` relation of the corpus KG.
    """

    RX = re.compile(r"^\s*(?:import|from)\s+([A-Za-z_][\w\.]*)", re.M)

    def __init__(self, id_col: str = "file_id", text_col: str = "content"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].reset_index(drop=True)
        found = batch[self.text_col].astype(str).reset_index(drop=True).map(
            lambda s: sorted(set(self.RX.findall(s)))
        )
        out = pd.DataFrame({self.id_col: ids, "module": found}).explode("module")
        out = out[out["module"].notna()]
        return out.reset_index(drop=True)

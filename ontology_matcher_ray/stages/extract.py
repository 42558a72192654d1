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


def _one_chunk(a):
    import pyarrow as pa

    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


class MentionExtractor:
    """map_batches stage: (id_col, text_col) -> (id_col, term, raw_id) rows.

    One output row per DISTINCT (document, term) pair, matching the
    "mention set" semantics the downstream linker needs (duplicate
    occurrences carry no extra signal for entity linking).

    Arrow-native hot path: tokenization via ``pc.split_pattern`` on
    zero-copy string arrays, lexicon membership via ``pc.is_in`` against
    the per-actor term dictionary (built once in ``__init__``), phrase
    n-grams via shifted-slice ``binary_join_element_wise`` with a
    same-document parent mask — no pandas string copy, no Python loop
    over rows or tokens.  Accepts a pandas batch too (tests / ad-hoc
    callers) and mirrors the input format on output.
    """

    def __init__(self, lexicon_ref, id_col: str = "doc_id", text_col: str = "text",
                 fuzzy: bool = False, typo: bool = False):
        import pyarrow as pa

        lexicon: Dict[str, str] = (
            ray.get(lexicon_ref) if isinstance(lexicon_ref, ray.ObjectRef) else lexicon_ref
        )
        self.id_col = id_col
        self.text_col = text_col
        self.fuzzy = fuzzy or typo   # the typo tier sits BEHIND fold/strip
        self.typo = typo
        # split lexicon into single-token terms and n-gram phrase terms,
        # stored as PARALLEL Arrow arrays: membership = is_in(term_arr),
        # term -> raw_id = take(raw_arr, index_in(hits, term_arr))
        word_terms: Dict[str, str] = {}
        phrase_terms: Dict[int, Dict[str, str]] = {}   # n -> {phrase: raw_id}
        for term, raw_id in lexicon.items():
            parts = term.split(" ")
            if len(parts) == 1:
                word_terms[term] = raw_id
            else:
                phrase_terms.setdefault(len(parts), {})[term] = raw_id
        self.word_arr = pa.array(list(word_terms), pa.string())
        self.word_raw = pa.array(list(word_terms.values()), pa.string())
        self.phrase_arrs = {
            n: (pa.array(list(d), pa.string()),
                pa.array(list(d.values()), pa.string()))
            for n, d in phrase_terms.items()
        }
        # bounded DL<=1 typo tier (same deletion-neighborhood index +
        # ambiguous-drop semantics as the corpus pipeline's fused actor,
        # pipelines/corpus_kg.py) — built once per actor, memoized probes
        if typo:
            from ontology_matcher_ray.functions.fuzzy import build_del1_index

            self.del1 = build_del1_index(sorted(word_terms))
            self._typo_memo: Dict[str, Optional[str]] = {}
        else:
            self.del1 = None

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        was_pandas = isinstance(batch, pd.DataFrame)
        t = (
            pa.Table.from_pandas(batch, preserve_index=False)
            if was_pandas else batch
        )
        ids = _one_chunk(t[self.id_col])
        text = _one_chunk(pc.cast(t[self.text_col], pa.string()))
        toks = _one_chunk(pc.split_pattern(text, " "))
        flat = _one_chunk(pc.list_flatten(toks))
        parent = _one_chunk(pc.list_parent_indices(toks))

        outs: List[pa.Table] = []

        def emit(hit_terms, hit_parents, term_arr, raw_arr):
            idx = pc.index_in(hit_terms, value_set=term_arr)
            outs.append(pa.table({
                "_id": pc.take(ids, hit_parents),
                "term": hit_terms,
                "raw_id": pc.take(raw_arr, idx),
            }))

        # single-word terms: one vectorized membership pass
        exact_mask = pc.is_in(flat, value_set=self.word_arr)
        emit(pc.filter(flat, exact_mask), pc.filter(parent, exact_mask),
             self.word_arr, self.word_raw)

        if self.fuzzy:
            # exact-then-fuzzy tier (north-star): tokens that are not
            # exact keys fall back to lowercase fold + single plural
            # strip; the match is reported under the CANONICAL lexicon
            # surface form — all Arrow kernels on the miss subset
            miss = pc.invert(exact_mask)
            m_tok = pc.filter(flat, miss)
            m_par = pc.filter(parent, miss)
            low = pc.utf8_lower(m_tok)
            low_in = pc.is_in(low, value_set=self.word_arr)
            strip_ok = pc.and_(
                pc.greater(pc.utf8_length(low), 3),
                pc.ends_with(low, pattern="s"),
            )
            stripped = pc.utf8_replace_slice(
                low, start=-1, stop=1 << 30, replacement=""
            )
            cand = pc.if_else(
                low_in, low, pc.if_else(strip_ok, stripped, low)
            )
            fmask = pc.is_in(cand, value_set=self.word_arr)
            emit(pc.filter(cand, fmask), pc.filter(m_par, fmask),
                 self.word_arr, self.word_raw)

            if self.del1 is not None:
                # DL<=1 typo tier over the still-missing tokens: probes
                # the LOWERED form (same as the corpus fused actor's
                # resolve_token — the plural-stripped candidate is only a
                # lexicon probe, never the typo query, so both tiers see
                # the identical DL1 neighborhood); unique tokens only
                # (heavy repetition across docs), memoized per actor with
                # the same 1M-entry pathological-corpus bound; ambiguous
                # candidates drop (del1_lookup contract)
                from ontology_matcher_ray.functions.fuzzy import (
                    del1_lookup,
                    eligible_token,
                )

                rmask = pc.invert(fmask)
                rem_tok = pc.filter(low, rmask)
                rem_par = pc.filter(m_par, rmask)
                memo = self._typo_memo
                mapping: Dict[str, str] = {}
                for u in pc.unique(rem_tok).to_pylist():
                    if u not in memo:
                        if len(memo) > 1_000_000:
                            memo.clear()
                        memo[u] = (
                            del1_lookup(u, *self.del1)
                            if eligible_token(u) else None
                        )
                    if memo[u] is not None:
                        mapping[u] = memo[u]
                if mapping:
                    keys = pa.array(list(mapping), pa.string())
                    canon = pa.array(list(mapping.values()), pa.string())
                    tmask = pc.is_in(rem_tok, value_set=keys)
                    canon_terms = pc.take(
                        canon,
                        pc.index_in(pc.filter(rem_tok, tmask), value_set=keys),
                    )
                    emit(canon_terms, pc.filter(rem_par, tmask),
                         self.word_arr, self.word_raw)

        # phrase terms: consecutive n-grams via n shifted slices joined
        # element-wise, masked to same-document runs
        nf = len(flat)
        for n, (term_arr, raw_arr) in self.phrase_arrs.items():
            m = nf - n + 1
            if m <= 0:
                continue
            gram = pc.binary_join_element_wise(
                *[flat.slice(k, m) for k in range(n)], " "
            )
            same_doc = pc.equal(parent.slice(0, m), parent.slice(n - 1, m))
            pmask = pc.and_(same_doc, pc.is_in(gram, value_set=term_arr))
            emit(pc.filter(gram, pmask),
                 pc.filter(parent.slice(0, m), pmask), term_arr, raw_arr)

        cat = pa.concat_tables(outs) if outs else pa.table({
            "_id": pa.array([], ids.type),
            "term": pa.array([], pa.string()),
            "raw_id": pa.array([], pa.string()),
        })
        # DISTINCT (doc, term): raw_id is functionally determined by term,
        # so min() just picks the single value present
        dedup = cat.group_by(["_id", "term"]).aggregate([("raw_id", "min")])
        out = pa.table({
            self.id_col: dedup["_id"],
            "term": dedup["term"],
            "raw_id": dedup["raw_id_min"],
        })
        return out.to_pandas() if was_pandas else out


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

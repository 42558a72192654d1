"""Vectorized text-analysis kernels for the documents pipelines.

These are the training-data-pipeline additions (language id, quality
scoring, token counting, fingerprinting) layered on top of the reference's
semantics; they run inside ``map_batches`` over pandas/numpy batches and
never loop Python-per-row on large strings (each kernel is a handful of
C-speed str ops per column).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

# Tiny deterministic stopword sets per language for the n-gram/lexicon
# language-id heuristic.  Offline by construction.
STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset({"the", "a", "of", "and", "to", "in", "is", "it"}),
    "fr": frozenset({"le", "la", "de", "et", "un", "une", "est", "en"}),
    "es": frozenset({"el", "la", "de", "y", "un", "una", "es", "en"}),
    "de": frozenset({"der", "die", "das", "und", "ein", "ist", "zu", "in"}),
    "zh": frozenset({"de", "shi", "zai", "le", "he", "you", "wo", "ta"}),
}

EN_STOPWORDS = STOPWORDS["en"]

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
U64_MASK = (1 << 64) - 1


def token_lists(texts: pd.Series) -> pd.Series:
    """Whitespace tokenization -> Series of token lists (C-speed split)."""
    return texts.str.split(" ")


def doc_stats_frame(texts: pd.Series) -> pd.DataFrame:
    """Per-doc stats: token counts, distinct tokens, stopword ratio, quality.

    Ratio-like scores are expressed in INTEGER micro-units (value * 1e6,
    floor), computed with pure integer arithmetic so the DuckDB oracle
    reproduces them bit-for-bit on any platform (no float rounding-mode
    ambiguity).  quality_micro is DEFINED as
    ``(n_distinct*500000)//n_tokens + (1000000 - stopword_ratio_micro)//2``
    — half lexical diversity, half non-stopword share.
    """
    toks = token_lists(texts)
    n_tokens = toks.str.len().astype("int64")
    n_distinct = toks.map(lambda t: len(set(t))).astype("int64")
    n_chars = texts.str.len().astype("int64")
    n_stop = toks.map(lambda t: sum(1 for w in t if w in EN_STOPWORDS)).astype("int64")
    denom = np.maximum(n_tokens, 1)
    stop_ratio_micro = (n_stop * 1_000_000) // denom
    avg_token_len_micro = ((n_chars - (n_tokens - 1)) * 1_000_000) // denom
    quality_micro = (n_distinct * 500_000) // denom + (1_000_000 - stop_ratio_micro) // 2
    return pd.DataFrame(
        {
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct,
            "n_chars": n_chars,
            "stopword_ratio_micro": stop_ratio_micro.astype("int64"),
            "avg_token_len_micro": avg_token_len_micro.astype("int64"),
            "quality_micro": quality_micro.astype("int64"),
        }
    )


def guess_lang(texts: pd.Series) -> pd.Series:
    """Stopword-overlap language-id heuristic.

    Scores each language by stopword hits; ties broken by language code
    order for determinism.  Returns 'und' when nothing matches.
    """
    langs = sorted(STOPWORDS)
    toksets = texts.str.split(" ").map(set)

    def best(tokset: set) -> str:
        scores = [(sum(1 for w in STOPWORDS[lg] if w in tokset), lg) for lg in langs]
        hits, lg = max(scores, key=lambda s: (s[0], [-ord(c) for c in s[1]]))
        return lg if hits > 0 else "und"

    return toksets.map(best)


def rolling_fingerprint(texts: pd.Series, window: int = 4) -> pd.Series:
    """Deterministic document fingerprint: min over word ``window``-gram
    hashes (winnowing-style — documents sharing content windows share
    fingerprints).

    The gram hash is the low md5 half masked to 63 bits, which DuckDB
    recomputes exactly (``md5_number_lower(gram) % 2^63``) — the oracle
    for this operator is full recomputation in SQL.
    """
    from ontology_matcher_ray.functions.hashing import md5half

    mask = (1 << 63) - 1

    def fp(tokens: List[str]) -> int:
        if not tokens or tokens == [""]:
            return 0
        n = len(tokens)
        w = min(window, n)
        return min(
            md5half(" ".join(tokens[i : i + w])) & mask
            for i in range(n - w + 1)
        )

    return token_lists(texts).map(fp).astype("int64")

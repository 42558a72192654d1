"""Bounded edit-distance (Damerau-Levenshtein <= 1) term matching.

The typo tier of the exact-then-fuzzy mention chain (north-star): a token
that survives exact / lowercase-fold / plural-strip misses is matched
against the single-token lexicon at optimal-string-alignment distance 1
(one substitution, insertion, deletion, or adjacent transposition), with
AMBIGUOUS candidates dropped (two distinct lexicon terms both at distance
1 give no match — mirroring the reference dedup cascade's ambiguous-drop,
``cli.py:227-250``).

Candidate generation is the deletion-neighborhood trick (SymSpell, public
domain): every string within DL distance 1 of a term shares at least one
member of the term's {self} ∪ {one-char-deletions} set with the query's
same set, so candidates come from hash-bucket intersection and only a few
exact verifications run per query token.  The index is built ONCE
driver-side as two numpy arrays (sorted variant hashes + term indices —
contiguous buffers, so ``ray.put`` shares one zero-copy plasma object
across every actor on a node instead of pickling a per-actor Python dict)
and probed with binary search.  A 63-bit hash collision only adds a false
candidate, which exact verification rejects.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np


def dl_leq1(a: str, b: str) -> bool:
    """True iff optimal-string-alignment distance(a, b) <= 1 — one
    substitution, insertion, deletion, or adjacent transposition.  O(n)
    case analysis (no DP table: the bound is 1)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la == lb:
        # positions that differ
        diff = [i for i in range(la) if a[i] != b[i]]
        if len(diff) == 1:
            return True                                   # substitution
        if len(diff) == 2:
            i, j = diff
            return j == i + 1 and a[i] == b[j] and a[j] == b[i]  # transpose
        return False
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by 1: deletion check — first mismatch must be the
    # inserted char in b
    for i in range(la):
        if a[i] != b[i]:
            return a[i:] == b[i + 1:]
    return True                                           # insert at end


_HMASK = (1 << 63) - 1


def _vhash(s: str) -> int:
    """Deterministic 63-bit string hash (blake2b low 8 bytes) — stable
    across processes (unlike builtin ``hash``) so driver-built indexes and
    worker-side probes agree."""
    return (
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        & _HMASK
    )


def _variants(s: str) -> List[str]:
    """{s} ∪ one-char deletions of s (deduplicated, order-stable)."""
    seen = {s}
    out = [s]
    for i in range(len(s)):
        v = s[:i] + s[i + 1:]
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def build_del1_index(terms: List[str]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted variant hashes int64[], term index int32[], terms str[]).

    ~(avg_len + 1) x len(terms) rows; tens of MB at a 10^6-term lexicon —
    broadcastable.  Ties (several terms sharing a variant hash) sit in
    adjacent runs of the sorted array.
    """
    hashes: List[int] = []
    idx: List[int] = []
    for t_i, term in enumerate(terms):
        for v in _variants(term):
            hashes.append(_vhash(v))
            idx.append(t_i)
    h = np.asarray(hashes, dtype=np.int64)
    ix = np.asarray(idx, dtype=np.int32)
    order = np.argsort(h, kind="stable")
    return h[order], ix[order], np.array(terms, dtype=np.str_)


def _chunk_rows(terms: List[str], base: int) -> Tuple[np.ndarray, np.ndarray]:
    """(hashes, term indices offset by ``base``) for one term chunk —
    the per-task body of the parallel index build."""
    hashes: List[int] = []
    idx: List[int] = []
    for t_i, term in enumerate(terms):
        for v in _variants(term):
            hashes.append(_vhash(v))
            idx.append(base + t_i)
    return np.asarray(hashes, dtype=np.int64), np.asarray(idx, dtype=np.int32)


def build_del1_index_parallel(
    terms: List[str], num_tasks: int = 32
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``build_del1_index`` with the variant generation + hashing fanned
    out as Ray tasks (the build is O(lexicon x avg_len) Python work —
    ~5 s single-threaded at a 200k-term lexicon, and it sits on the
    driver's critical path of every KG build).  The driver only merges
    and argsorts the ~len x terms hash rows.  Identical output to the
    serial build (chunking preserves term indices)."""
    import ray

    if len(terms) < 10_000 or not ray.is_initialized():
        return build_del1_index(terms)
    chunk = (len(terms) + num_tasks - 1) // num_tasks
    task = ray.remote(num_returns=2)(_chunk_rows)
    parts = [
        task.remote(terms[s:s + chunk], s)
        for s in range(0, len(terms), chunk)
    ]
    hs = ray.get([p[0] for p in parts])
    ixs = ray.get([p[1] for p in parts])
    h = np.concatenate(hs)
    ix = np.concatenate(ixs)
    order = np.argsort(h, kind="stable")
    return h[order], ix[order], np.array(terms, dtype=np.str_)


def eligible_token(t: str) -> bool:
    """Query-side gate for the typo tier: long enough that one edit is a
    plausible typo (not a different identifier), and identifier-shaped
    (alphanumeric with at least one letter — kills hex/digit noise)."""
    return len(t) >= 5 and t.isalnum() and not t.isdigit()


def del1_lookup(
    token: str, hashes: np.ndarray, term_idx: np.ndarray, terms: np.ndarray
) -> Optional[str]:
    """The unique term at DL distance <= 1 from ``token``, or None (no
    candidate, or ambiguous).  Callers run this AFTER the exact tiers, so
    ``token`` itself is not a term (distance-0 self-hits cannot occur)."""
    qh = np.array([_vhash(v) for v in _variants(token)], dtype=np.int64)
    lo = np.searchsorted(hashes, qh, side="left")
    hi = np.searchsorted(hashes, qh, side="right")
    match: Optional[str] = None
    seen: set = set()
    for s, e in zip(lo, hi):
        for t_i in term_idx[s:e]:
            if t_i in seen:
                continue
            seen.add(t_i)
            term = str(terms[t_i])
            if dl_leq1(token, term):
                if match is not None and term != match:
                    return None                           # ambiguous: drop
                match = term
    return match

"""Hashing kernels: sha256, MinHash, SimHash, band/bucket hashing.

Used by the corpus per-row invariant (``content`` sha256 equality, per
BASELINE.json ``input_hint``), the exact/near dedup stages, and salted
shuffle keys.  All functions are batch-level (numpy/pandas in, numpy out);
MinHash signatures use the standard ``(a*x + b) mod p`` universal hash
family with a fixed seed so every worker derives identical permutations.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd

MERSENNE_P = (1 << 61) - 1
I64_MASK = (1 << 63) - 1


def sha256_hex(texts: pd.Series) -> pd.Series:
    """Hex sha256 per string cell (the per-row corpus invariant)."""
    return texts.map(lambda s: hashlib.sha256(s.encode()).hexdigest())


def stable_hash64(values: pd.Series) -> np.ndarray:
    """Deterministic 63-bit hash of strings (process-independent, unlike
    Python's ``hash``).  Used for salted shuffle keys and exact-dedup keys."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
            & I64_MASK
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE_P, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles(tokens: List[str], k: int = 3) -> List[str]:
    """Word k-gram shingles; short docs fall back to the whole token list."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature_matrix(
    texts: pd.Series, num_perm: int = 64, k: int = 3, seed: int = 7
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signature matrix.

    Shingle hashes are blake2b-derived (stable across processes); the
    permutation family is seeded, so signatures are globally consistent
    across actors and cluster sizes.
    """
    a, b = _minhash_params(num_perm, seed)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for row, text in enumerate(texts):
        toks = text.split(" ") if isinstance(text, str) else []
        sh = shingles(toks, k)
        if not sh:
            out[row, :] = 0
            continue
        hv = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
                % MERSENNE_P
                for s in sh
            ),
            dtype=np.uint64,
            count=len(sh),
        )
        # (a*x + b) mod p for every (perm, shingle) pair, then column-min
        prods = (hv[None, :] * a[:, None] + b[:, None]) % np.uint64(MERSENNE_P)
        out[row, :] = prods.min(axis=1)
    return out


def band_keys(signatures: np.ndarray, bands: int = 16) -> np.ndarray:
    """Collapse each signature into ``bands`` LSH bucket keys.

    Returns (n_docs, bands) int64: hash of each band's rows.  Docs sharing
    any band key are near-dup candidates (groupby on (band_idx, band_key)).
    """
    n, num_perm = signatures.shape
    rows_per_band = num_perm // bands
    keys = np.empty((n, bands), dtype=np.int64)
    for bidx in range(bands):
        chunk = signatures[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
        acc = np.zeros(n, dtype=np.uint64)
        for col in range(chunk.shape[1]):
            acc = (acc * np.uint64(1099511628211)) ^ chunk[:, col]
        keys[:, bidx] = (acc & np.uint64(I64_MASK)).astype(np.int64)
    return keys


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word tokens (stable blake2b token hashes)."""
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for row, text in enumerate(texts):
        toks = text.split(" ") if isinstance(text, str) else []
        if not toks:
            out[row] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok, cnt in pd.Series(toks).value_counts().items():
            hv = np.uint64(
                int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            )
            bits = (hv >> bit_idx) & np.uint64(1)
            acc += np.where(bits.astype(bool), cnt, -cnt)
        val = 0
        for i in range(64):
            if acc[i] > 0:
                val |= 1 << i
        out[row] = val & I64_MASK
    return out


def jaccard(a_tokens: List[str], b_tokens: List[str], k: int = 3) -> float:
    sa, sb = set(shingles(a_tokens, k)), set(shingles(b_tokens, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0

"""Hashing kernels: sha256, MinHash, SimHash, band/bucket hashing.

Used by the corpus per-row invariant (``content`` sha256 equality, per
BASELINE.json ``input_hint``), the exact/near dedup stages, and salted
shuffle keys.  All functions are batch-level (numpy/pandas in, numpy out);
MinHash signatures use the standard ``(a*x + b) mod p`` universal hash
family with a fixed seed so every worker derives identical permutations.

ORACLE PARITY: content hashes for the oracle-checked dedup family
(MinHash shingles, SimHash tokens) are the LOW 8 BYTES of md5,
little-endian — exactly DuckDB's ``md5_number_lower()`` — and the
permutation arithmetic stays inside 62 bits (31-bit hash domain,
Mersenne p = 2^31-1) so numpy int64 and DuckDB BIGINT compute identical
values with no wrap-around ambiguity.  ``stable_hash64`` (partition/
shuffle keys only, never oracle-compared) stays blake2b.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd

MERSENNE_P = (1 << 31) - 1        # 31-bit domain: a*x+b fits int64 exactly
I64_MASK = (1 << 63) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants), wrapping uint64 —
    the engine's generic vectorized int mixer (shuffle keys, band keys)."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def md5half(s: str) -> int:
    """Low 8 bytes of md5, little-endian == DuckDB md5_number_lower()."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


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


def content_hash64(values) -> np.ndarray:
    """NUL-safe, process-stable uint64 content hash of strings.

    pandas' DEFAULT ``hash_pandas_object`` path (categorize=True)
    factorizes with a C-string compare, silently MERGING values at an
    embedded NUL — and worse, the merged category keeps the FIRST
    occurrence's full-byte hash, so the same value hashes differently
    depending on batch makeup ('b' alone vs 'b' next to 'b\\x00';
    caught twice by hypothesis: layout Bloom commit 529816c, then the
    round-5 batch-consistency property).  The fix is
    ``categorize=False``: the underlying siphash hashes every string's
    FULL byte length directly, making the hash NUL-safe AND a pure
    function of the value.  Nulls hash as ''.  Used for CONTENT
    membership (line dedup, Bloom keys); partition routing may keep
    the default-path hash (placement only — a merge there just
    co-locates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if len(values) == 0:
            return np.empty(0, dtype=np.uint64)
        if pa.types.is_null(values.type):
            values = pa.nulls(len(values), type=pa.large_string())
        s = pc.fill_null(values, "").cast(pa.large_string()).to_pandas()
    else:
        s = pd.Series(values, dtype=object).fillna("")
        if len(s) == 0:
            return np.empty(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(
        s, index=False, categorize=False).to_numpy().astype(np.uint64)


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_perm).astype(np.int64)
    b = rng.randint(0, MERSENNE_P, size=num_perm).astype(np.int64)
    return a, b


def shingles(tokens: List[str], k: int = 3) -> List[str]:
    """Word k-gram shingles; docs with fewer than ``k`` tokens yield []
    (such docs carry no shingle signal and are excluded from the near-dup
    candidate space — and from the oracle SQL — rather than compared on a
    degenerate whole-text shingle)."""
    if len(tokens) < k:
        return []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature_matrix(
    texts: pd.Series, num_perm: int = 64, k: int = 3, seed: int = 7
) -> np.ndarray:
    """(len(texts), num_perm) int64 MinHash signature matrix; -1 rows mark
    docs with no shingles (fewer than ``k`` tokens).

    Shingle hashes are ``md5half % p`` (p = 2^31-1) and the permutation
    family is seeded, so signatures are globally consistent across actors
    AND recomputable in DuckDB SQL (md5_number_lower + BIGINT modmul).
    """
    sig, _ = minhash_sig_and_hashes(texts, num_perm, k, seed)
    return sig


def minhash_sig_and_hashes(
    texts: pd.Series, num_perm: int = 64, k: int = 3, seed: int = 7
):
    """One shingling + md5 pass yielding BOTH the signature matrix and
    each doc's sorted-unique shingle-hash set (``md5half % p`` int64) —
    the verification payload.  Fusing the two avoids a second full-corpus
    shingle/md5 pass in the near-dup pipeline; Jaccard over the hashed
    sets equals Jaccard over the shingles up to md5 collisions, and the
    SQL oracle hashes identically, so parity is bit-for-bit.
    """
    a, b = _minhash_params(num_perm, seed)
    out = np.empty((len(texts), num_perm), dtype=np.int64)
    hsets = []
    for row, text in enumerate(texts):
        toks = text.split(" ") if isinstance(text, str) else []
        sh = shingles(toks, k)
        if not sh:
            out[row, :] = -1
            hsets.append(np.empty(0, dtype=np.int64))
            continue
        hv = np.fromiter(
            (md5half(s) % MERSENNE_P for s in sh), dtype=np.int64, count=len(sh)
        )
        # (a*x + b) mod p for every (perm, shingle) pair, then column-min;
        # products < 2^62: exact in int64, no wrap-around
        prods = (hv[None, :] * a[:, None] + b[:, None]) % np.int64(MERSENNE_P)
        out[row, :] = prods.min(axis=1)
        hsets.append(np.unique(hv))
    return out, hsets


def shingle_hash_sets(texts: pd.Series, k: int = 3) -> list:
    """Sorted-unique ``md5half % p`` int64 shingle-hash set per text —
    the near-dup verification payload WITHOUT the MinHash signature work
    (the all-pairs prefix-filter path needs only the sets).  Identical
    hashing to ``minhash_sig_and_hashes`` and to the SQL oracle's
    ``md5_number_lower % p`` recomputation."""
    out = []
    for text in texts:
        toks = text.split(" ") if isinstance(text, str) else []
        sh = shingles(toks, k)
        if not sh:
            out.append(np.empty(0, dtype=np.int64))
            continue
        hv = np.fromiter(
            (md5half(s) % MERSENNE_P for s in sh), dtype=np.int64, count=len(sh)
        )
        out.append(np.unique(hv))
    return out


def band_keys(signatures: np.ndarray, bands: int = 16) -> np.ndarray:
    """Collapse each signature into ``bands`` LSH bucket keys.

    Returns (n_docs, bands) object array of STRINGS — each band's
    signature values joined with '-'.  Exact (no hash collisions between
    bands) and trivially recomputable in SQL via ordered string_agg; the
    exchange hashes the string to an int partition key anyway, so the only
    scale cost is ~10x wider candidate rows (still tiny vs the corpus).
    Docs sharing any band key are near-dup candidates.
    """
    n, num_perm = signatures.shape
    rows_per_band = num_perm // bands
    keys = np.empty((n, bands), dtype=object)
    for bidx in range(bands):
        chunk = signatures[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
        acc = chunk[:, 0].astype(str).astype(object)
        for col in range(1, chunk.shape[1]):
            acc = acc + "-" + chunk[:, col].astype(str)
        keys[:, bidx] = acc
    return keys


def band_keys_int64(signatures: np.ndarray, bands: int = 16) -> np.ndarray:
    """Collapse each signature into ``bands`` int64 LSH bucket keys by
    splitmix64-mixing the band's signature values — the PRODUCTION key
    path (``band_keys``' join-strings remain the readable/SQL-mirroring
    reference).

    A 64-bit collision between two different band signatures (~n^2/2^64)
    could only create a FALSE CANDIDATE, which exact verification
    rejects — correctness is unaffected — while the int keys take the
    exchange's pure-numpy fast path and skip per-row string formatting
    entirely.
    """
    n, num_perm = signatures.shape
    rows_per_band = num_perm // bands
    out = np.empty((n, bands), dtype=np.int64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    for bidx in range(bands):
        chunk = signatures[:, bidx * rows_per_band:(bidx + 1) * rows_per_band]
        h = np.full(n, np.uint64(bidx + 1), dtype=np.uint64)
        for col in range(chunk.shape[1]):
            h = splitmix64(h * gold + chunk[:, col].astype(np.uint64))
        out[:, bidx] = h.view(np.int64)
    return out


def simhash64(texts: pd.Series) -> np.ndarray:
    """63-bit SimHash over word tokens (md5half token hashes, bit 63
    dropped so the value is a non-negative int64 == DuckDB BIGINT).

    Bit i is set iff the count-weighted sum of (+1 if token-hash bit i
    else -1) over the doc's tokens is > 0 — recomputable in SQL as a
    group-by over (token, bit) with md5_number_lower bit extraction.
    """
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(63, dtype=np.uint64)
    powers = (np.int64(1) << np.arange(63, dtype=np.int64))
    for row, text in enumerate(texts):
        toks = text.split(" ") if isinstance(text, str) else []
        if not toks:
            out[row] = 0
            continue
        acc = np.zeros(63, dtype=np.int64)
        for tok, cnt in pd.Series(toks).value_counts().items():
            hv = np.uint64(md5half(tok))
            bits = (hv >> bit_idx) & np.uint64(1)
            acc += np.where(bits.astype(bool), cnt, -cnt)
        out[row] = int(powers[acc > 0].sum())
    return out


def jaccard(a_tokens: List[str], b_tokens: List[str], k: int = 3) -> float:
    sa, sb = set(shingles(a_tokens, k)), set(shingles(b_tokens, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0

"""Exact all-pairs set-similarity join (stages/dedup.allpairs_jaccard):
prefix-filter recall vs quadratic brute force, size-filter pruning,
and partition invariance.  Oracle parity of the 'jaccard_all' leg runs
through the dedup_pairs composite in tests/test_queries_oracle.py."""

import numpy as np
import pandas as pd
import ray.data as rd

from ontology_matcher_ray.functions.hashing import shingle_hash_sets
from ontology_matcher_ray.stages import dedup
from tests.util import normalize, to_pandas


def _brute_force(df: pd.DataFrame, t_micro: int, k: int = 3) -> pd.DataFrame:
    """Quadratic ground truth over the SAME hashed shingle sets."""
    hs = shingle_hash_sets(df["text"].astype(str), k)
    ids = df["doc_id"].to_numpy()
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((int(ids[i]), int(ids[j])))
            sa, sb = set(hs[i].tolist()), set(hs[j].tolist())
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            jm = inter * 1_000_000 // union
            if jm >= t_micro:
                rows.append((a, b, jm))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard_micro"]).astype("int64")


def _run(df: pd.DataFrame, threshold: float, num_partitions: int = 8,
         order: str = "hash") -> pd.DataFrame:
    got = to_pandas(dedup.allpairs_jaccard(
        rd.from_pandas(df), threshold=threshold,
        num_partitions=num_partitions, order=order))
    return normalize(got.astype("int64"))


def test_allpairs_planted_near_dups():
    """Planted family: doc 0 is the base, docs 1-3 share progressively
    fewer shingles, docs 10+ are unrelated; exact recall of every pair
    >= threshold and nothing below it."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = {
        0: base,
        1: base + " extra",                       # very close
        2: "the quick brown fox jumps over the lazy dog",  # prefix copy
        3: base.replace("fox", "cat"),            # one token changed
        10: "completely different words in this document entirely",
        11: "another unrelated text body with no shared trigrams at all",
        12: base,                                 # exact dup of 0
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    for t in (0.5, 0.8, 0.99):
        want = normalize(_brute_force(df, int(round(t * 1_000_000))))
        got = _run(df, t)
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
    # the exact dup pair must surface at every threshold
    got = _run(df, 0.99)
    assert ((got["a"] == 0) & (got["b"] == 12)).any()


def test_allpairs_randomized_vs_brute_force():
    """Randomized recall proof: a tiny vocab forces heavy shingle
    sharing; the engine's prefix-filtered answer must equal the
    quadratic ground truth for every seed and threshold."""
    vocab = np.array(["alpha", "beta", "gamma"])
    n_nonempty = 0
    for seed in range(4):
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 10)))
            for _ in range(40)
        ]
        df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                           "text": texts})
        for t in (0.3, 0.6):
            want = normalize(_brute_force(df, int(round(t * 1_000_000))))
            got = _run(df, t)
            if want.empty:
                assert got.empty
                continue
            n_nonempty += 1
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
    assert n_nonempty >= 4  # the property must actually bite


def test_allpairs_partition_invariance_and_short_docs():
    """Docs with fewer than k tokens carry no shingles and never pair;
    the answer is identical at any partition count."""
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["one two", "one two", "a b c d e f", "a b c d e f",
                 "a b c d e f g", ""],
    })
    want = normalize(_brute_force(df, 500_000))
    a = _run(df, 0.5, num_partitions=2)
    b = _run(df, 0.5, num_partitions=16)
    pd.testing.assert_frame_equal(a, want, check_dtype=False, check_exact=True)
    pd.testing.assert_frame_equal(b, want, check_dtype=False, check_exact=True)
    assert not ((a["a"] == 0) | (a["b"] == 0)).any()  # <k-token docs excluded


def test_allpairs_rare_first_order_identical():
    """rare_first (sketched stop-shingles sort last in every prefix)
    must give the EXACT same pair set as hash order — the total order
    only steers candidate volume, never the answer.  Corpus planted
    with a stop-shingle shared by every doc plus genuine near-dup
    clusters."""
    import numpy as np

    stop = "lorem ipsum dolor"        # one 3-gram shared by all docs
    rng = np.random.default_rng(17)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee", "ff"])
    texts = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=6))
        texts.append(f"{stop} {body}")
    texts += [texts[0], texts[5]]     # exact dups -> guaranteed pairs
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    for t in (0.4, 0.8):
        want = _run(df, t, order="hash")
        got = _run(df, t, order="rare_first")
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
    import pytest

    with pytest.raises(ValueError, match="order"):
        _run(df, 0.5, order="df")

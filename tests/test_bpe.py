"""Distributed BPE merge training (docs_train.bpe_merges) vs an
independent dict-based reference implementation (no pandas/Arrow — a
straight transcription of Sennrich et al. 2016's learn_bpe loop over a
word-frequency dict), on a hand-built fixture with known merges, on the
sf documents table, and under partitioning changes."""

import collections

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import bpe_merges

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict, k: int, min_count: int = 2):
    """Dict-based BPE: pieces are tuples of symbols; ties break by
    (count desc, 'left right' string asc) like the engine."""
    vocab = {tuple(w): c for w, c in word_counts.items() if len(w) >= 2}
    merges = []
    for rank in range(1, k + 1):
        pairs = collections.Counter()
        for pieces, c in vocab.items():
            for i in range(len(pieces) - 1):
                pairs[(pieces[i], pieces[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (left, right), n = best
        if n < min_count:
            break
        new_vocab = {}
        for pieces, c in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if (i < len(pieces) - 1 and pieces[i] == left
                        and pieces[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
        merges.append((rank, left, right, n))
    return pd.DataFrame(merges, columns=["rank", "left", "right", "n"]).astype(
        {"rank": "int64", "left": "object", "right": "object", "n": "int64"})


def _corpus_word_counts(sf: str) -> dict:
    df = duckdb.connect().execute(f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(str_split(text, ' ')) AS token
  FROM read_parquet('{sf}/documents.parquet')
) GROUP BY 1""").df()
    return dict(zip(df["token"], df["n"]))


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    # the classic learn-bpe fixture: 'lo' then 'low' dominate, plus
    # regex-special symbols and repeated-symbol overlap ('aaaa')
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["lowest"] * 2 + ["newer"] * 6
        + ["wider"] * 3 + ["a+b"] * 4 + ["aaaa"] * 3 + ["x"] * 9 + [""]
    )
    pd.DataFrame([{"doc_id": 0, "text": text, "lang": "en",
                   "source": "s", "n_chars": len(text)}]).to_parquet(
        d / "documents.parquet", index=False)
    return str(d)


def test_bpe_tiny_matches_reference(tiny_dir):
    got = bpe_merges(tiny_dir, k=12).to_pandas()
    want = _reference_bpe(_corpus_word_counts(tiny_dir), 12)
    pd.testing.assert_frame_equal(got, want)
    # the canonical first merges on this fixture: 'e r' (11) beats 'l o' (9)
    assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("e", "r")


def test_bpe_overlap_is_greedy_left(tiny_dir):
    """'aaaa' must contribute pairs like greedy-left BPE, and once 'a a'
    merges, 'aaaa' becomes ('aa','aa') — never ('a','aa','a')."""
    got = bpe_merges(tiny_dir, k=12).to_pandas()
    rows = got[(got["left"] == "a") & (got["right"] == "a")]
    assert len(rows) == 1                      # 'a a' merges exactly once
    aa = got[(got["left"] == "aa") & (got["right"] == "aa")]
    assert len(aa) == 1                        # then 'aa aa' completes it


def test_bpe_sf_matches_reference():
    got = bpe_merges(SF, k=8).to_pandas()
    want = _reference_bpe(_corpus_word_counts(SF), 8)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_partition_invariant(tiny_dir):
    a = bpe_merges(tiny_dir, k=6).to_pandas()
    b = bpe_merges(tiny_dir, k=6, num_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_bpe_min_count_stops(tiny_dir):
    got = bpe_merges(tiny_dir, k=64, min_count=4).to_pandas()
    assert len(got) and (got["n"] >= 4).all()


def test_bpe_rejects_zero_k(tiny_dir):
    with pytest.raises(ValueError):
        bpe_merges(tiny_dir, k=0)


# ---- bpe_encode (apply) ----

def _reference_encode(word: str, merges) -> list:
    """Independent apply: merges in rank order, leftmost non-overlapping
    replacement — a straight transcription of the training-time vocab
    update, with no shared code with the engine's BpeEncoder."""
    pieces = list(word)
    for _, left, right, _ in merges.itertuples(index=False):
        out, i = [], 0
        while i < len(pieces):
            if (i < len(pieces) - 1 and pieces[i] == left
                    and pieces[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(pieces[i])
                i += 1
        pieces = out
    return pieces


def _expected_encode_counts(sf: str, k: int) -> pd.DataFrame:
    merges = _reference_bpe(_corpus_word_counts(sf), k)
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = str(text).split(" ")
        rows.append((int(doc_id), len(toks),
                     sum(len(_reference_encode(t, merges)) for t in toks)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_bpe_tokens"]
                        ).astype("int64").sort_values("doc_id",
                                                      ignore_index=True)


def test_bpe_encode_tiny_matches_reference(tiny_dir):
    from ontology_matcher_ray.pipelines.docs_train import bpe_encode

    got = (bpe_encode(tiny_dir, k=12).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(got, _expected_encode_counts(tiny_dir, 12))


def test_bpe_encode_sf_matches_reference():
    from ontology_matcher_ray.pipelines.docs_train import bpe_encode

    got = (bpe_encode(SF, k=8).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _expected_encode_counts(SF, 8)
    pd.testing.assert_frame_equal(got, want)
    # compression must be real: BPE pieces per doc strictly below chars,
    # and at least the word count (a piece never spans a space)
    assert (got["n_bpe_tokens"] >= got["n_tokens"]).all()


def test_bpe_encode_reproduces_training_vocab(tiny_dir):
    """encode(word) piece count == the trained vocab's pieces for every
    in-corpus word (train and apply share semantics exactly)."""
    from ontology_matcher_ray.pipelines.docs_train import BpeEncoder

    counts = _corpus_word_counts(tiny_dir)
    merges = _reference_bpe(counts, 12)
    enc = BpeEncoder(list(zip(merges["left"], merges["right"])))
    for w in counts:
        assert enc._encode_len(w) == len(_reference_encode(w, merges)), w


def test_bpe_driver_and_distributed_paths_identical(tiny_dir):
    """The size-gated driver fast path and the exchange loop must pick
    the same merges (same weighting, tie-break, greedy-left apply)."""
    fast = bpe_merges(tiny_dir, k=12).to_pandas()                # gated
    dist = bpe_merges(tiny_dir, k=12, driver_vocab_max=0).to_pandas()
    pd.testing.assert_frame_equal(fast, dist)


def test_bpe_distributed_path_matches_reference():
    got = bpe_merges(SF, k=6, driver_vocab_max=0).to_pandas()
    want = _reference_bpe(_corpus_word_counts(SF), 6)
    pd.testing.assert_frame_equal(got, want)

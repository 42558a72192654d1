"""Invariants for the training-data prep family (pipelines/docs_train.py)
beyond the oracle equality checks in test_queries_oracle."""

import re

import pandas as pd
import pytest

from ontology_matcher_ray.functions.hashing import md5half
from ontology_matcher_ray.pipelines.docs_train import (
    EMAIL_RE,
    MERSENNE_P,
    PACK_BUDGET,
    PHONE_RE,
    SKETCH_REGISTERS,
    SKETCH_RHO_CAP,
    doc_pack,
    lang_token_sketch,
    pii_scrub,
    tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_pii_scrub_leaves_no_pii():
    df = pii_scrub(SF).to_pandas()
    email, phone = re.compile(EMAIL_RE), re.compile(PHONE_RE)
    assert not df["clean_text"].str.contains(email).any()
    assert not df["clean_text"].str.contains(phone).any()
    # planted PII found where planted
    assert (df.loc[df["doc_id"] % 3 == 0, "n_emails"] >= 1).all()
    assert (df.loc[df["doc_id"] % 5 == 0, "n_phones"] >= 1).all()
    assert (df.loc[(df["doc_id"] % 3 != 0), "n_emails"] == 0).all()


@pytest.mark.parametrize("parts", [4, 16])
def test_doc_pack_is_global_prefix_sum(parts):
    df = doc_pack(SF, num_partitions=parts).to_pandas().sort_values("doc_id")
    n = df["n_tokens"].to_numpy()
    start = df["start_offset"].to_numpy()
    # contiguous concat: each doc starts where the previous one ended
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (df["chunk_id"] == df["start_offset"] // PACK_BUDGET).all()
    assert (df["n_chunks"] >= 1).all()


def test_tfidf_ranks_and_rare_term_wins():
    df = tfidf_top_terms(SF).to_pandas()
    per_doc = df.groupby("doc_id")["rank"].apply(list)
    assert all(sorted(r) == list(range(1, len(r) + 1)) for r in per_doc)
    # within a doc, rank order follows score desc
    for _, g in df.groupby("doc_id"):
        s = g.sort_values("rank")["score_micro"].to_numpy()
        assert (s[:-1] >= s[1:]).all()


def test_sketch_matches_brute_force_registers():
    got = lang_token_sketch(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    want = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for tok in text.split(" "):
            hv = md5half(tok) % MERSENNE_P
            reg, rest = hv % SKETCH_REGISTERS, hv // SKETCH_REGISTERS
            rho = SKETCH_RHO_CAP if rest == 0 else (rest & -rest).bit_length()
            key = (lang, reg)
            want[key] = max(want.get(key, 0), rho)
    got_map = {(r.lang, r.reg): r.max_rho for r in got.itertuples()}
    assert got_map == want


# --- shuffle_shards: deterministic epoch-shuffle shard assignment --------

def _shuffle_reference(doc_ids, n_shards, seed):
    """Closed-form recompute: rank by (key, doc_id) within shard."""
    from ontology_matcher_ray.pipelines.docs_train import SHUFFLE_SEED  # noqa: F401

    rows = []
    for d in doc_ids:
        key = md5half(f"{seed}:{d}") % (1 << 63)
        rows.append((int(d), key, key % n_shards))
    df = pd.DataFrame(rows, columns=["doc_id", "key", "shard"])
    df = df.sort_values(["shard", "key", "doc_id"], ignore_index=True)
    df["pos"] = df.groupby("shard", sort=False).cumcount()
    return (df[["doc_id", "shard", "pos"]].astype("int64")
            .sort_values("doc_id", ignore_index=True))


def test_shuffle_shards_matches_reference():
    from ontology_matcher_ray.pipelines.docs_train import (
        SHUFFLE_SEED,
        SHUFFLE_SHARDS,
        shuffle_shards,
    )

    got = (shuffle_shards(SF).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _shuffle_reference(range(500), SHUFFLE_SHARDS, SHUFFLE_SEED)
    pd.testing.assert_frame_equal(got, want)
    # pos is a contiguous 0..n-1 ranking inside every shard
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_shuffle_shards_partition_and_bucket_invariant():
    from ontology_matcher_ray.pipelines.docs_train import shuffle_shards

    base = (shuffle_shards(SF).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    for kw in ({"num_partitions": 3}, {"n_buckets": 4}, {"n_buckets": 256}):
        other = (shuffle_shards(SF, **kw).to_pandas()
                 .sort_values("doc_id", ignore_index=True))
        pd.testing.assert_frame_equal(base, other, obj=str(kw))


def test_shuffle_shards_seed_changes_order():
    from ontology_matcher_ray.pipelines.docs_train import shuffle_shards

    a = (shuffle_shards(SF, seed=7).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    b = (shuffle_shards(SF, seed=8).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    assert not a.equals(b)                     # a reshuffle really reshuffles
    pd.testing.assert_frame_equal(             # still exactly deterministic
        b, _shuffle_reference(range(500), 8, 8))


def test_shuffle_shards_rejects_bad_buckets():
    from ontology_matcher_ray.pipelines.docs_train import shuffle_shards

    with pytest.raises(ValueError):
        shuffle_shards(SF, n_buckets=48)

"""Bloom-filter shuffle pruning (exchange.bloom_build / bloom_prune):
no false negatives ever (every member row survives), real pruning of
non-members, identical join results with pruning on and off — for both
integer and string keys — and the wired `priority_semi_counts` path."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from ontology_matcher_ray.stages import exchange

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_int_keys():
    keys = pd.DataFrame({"k": np.arange(0, 5000, dtype=np.int64) * 7 + 3})
    bits = exchange.bloom_build(rd.from_pandas(keys), "k")
    probe = pd.DataFrame({"k": keys["k"].to_numpy(),
                          "v": np.arange(5000, dtype=np.int64)})
    kept = exchange.bloom_prune(
        rd.from_pandas(probe), "k", bits).to_pandas()
    # every true member survives (bloom filters cannot false-negative)
    assert len(kept) == 5000
    pd.testing.assert_frame_equal(
        kept.sort_values("k", ignore_index=True),
        probe.sort_values("k", ignore_index=True))


def test_bloom_prunes_non_members_int_and_str():
    members = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    bits = exchange.bloom_build(rd.from_pandas(members), "k")
    # disjoint probe domain: virtually everything must drop
    probe = pd.DataFrame({"k": np.arange(10_000_000, 10_050_000,
                                         dtype=np.int64)})
    kept = exchange.bloom_prune(rd.from_pandas(probe), "k", bits).count()
    assert kept < 500  # <1% false-positive rate at this fill

    smem = pd.DataFrame({"k": [f"tok{i}" for i in range(1000)]})
    sbits = exchange.bloom_build(rd.from_pandas(smem), "k")
    sprobe = pd.DataFrame({"k": [f"other{i}" for i in range(50_000)]})
    skept = exchange.bloom_prune(rd.from_pandas(sprobe), "k", sbits).count()
    assert skept < 500
    # and members all survive under string hashing too
    skeep = exchange.bloom_prune(rd.from_pandas(smem), "k", sbits).count()
    assert skeep == 1000


def test_bloom_pruned_semi_join_identical():
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 100_000, 20_000),
                         "payload": rng.integers(0, 9, 20_000)}).astype(
        {"k": "int64", "payload": "int64"})
    right = pd.DataFrame({"k": rng.integers(0, 100_000, 300)}).astype(
        {"k": "int64"})
    plain = exchange.hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k",
        {"k": "int64", "payload": "int64"}, {"k": "int64"},
        how="semi", num_partitions=8).to_pandas()
    bits = exchange.bloom_build(rd.from_pandas(right), "k")
    pruned = exchange.bloom_prune(rd.from_pandas(left), "k", bits)
    viabloom = exchange.hash_join(
        pruned, rd.from_pandas(right), "k", "k",
        {"k": "int64", "payload": "int64"}, {"k": "int64"},
        how="semi", num_partitions=8).to_pandas()
    srt = lambda d: d.sort_values(["k", "payload"], ignore_index=True)
    pd.testing.assert_frame_equal(srt(plain), srt(viabloom))


def test_priority_semi_counts_bloom_matches_plain():
    from ontology_matcher_ray.pipelines.relational import (
        priority_semi_counts,
    )
    srt = lambda d: d.sort_values("o_orderpriority", ignore_index=True)
    with_bloom = srt(priority_semi_counts(SF, bloom=True))
    without = srt(priority_semi_counts(SF, bloom=False))
    pd.testing.assert_frame_equal(with_bloom, without)
    assert with_bloom["n_orders"].sum() > 0


def test_bloom_nul_string_keys_no_false_negative():
    """Round-4 VERDICT 'wrong' #2: the string fallback of the Bloom key
    hash used pandas' NUL-unstable string hash — a false NEGATIVE here
    silently drops matching join rows.  NUL-adversarial members must all
    survive the prune, in every batch composition."""
    members = pd.DataFrame({"k": ["", "\x00", "x", "x\x00", "\x00x",
                                  "x\x00y", "xy", "\x00\x00"]})
    bits = exchange.bloom_build(rd.from_pandas(members), "k")
    kept = exchange.bloom_prune(
        rd.from_pandas(members), "k", bits).to_pandas()
    assert sorted(kept["k"]) == sorted(members["k"])
    # probing one-at-a-time (different categorize batches) agrees too
    for v in members["k"]:
        one = exchange.bloom_prune(
            rd.from_pandas(pd.DataFrame({"k": [v]})), "k", bits).count()
        assert one == 1, repr(v)

"""Range-partitioned sorted Parquet sink/source (sources/io.py):
layout, per-range sortedness, disjoint ordered key ranges, lossless
round trip, resume (completed ranges skipped and never rewritten),
partition pruning, and cut-point stability across reruns."""

import glob
import json
import os

import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.sources.io import (
    FormatError,
    read_range_partitioned,
    write_range_partitioned,
)


def _mk(n=1000, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.permutation(n).astype("int64"),
        "v": [f"v{i}" for i in range(n)],
    })


def test_write_layout_sorted_disjoint(tmp_path):
    out = str(tmp_path / "rp")
    df = _mk()
    stats = write_range_partitioned(
        rd.from_pandas(df), out, "k", num_ranges=8)
    dirs = sorted(glob.glob(os.path.join(out, "range=*")))
    assert 1 < len(dirs) <= 8
    assert stats["rows"].sum() == len(df)
    prev_max = None
    for d in dirs:
        part = pd.read_parquet(d)
        assert part["k"].is_monotonic_increasing          # sorted inside
        if prev_max is not None:
            assert part["k"].iloc[0] > prev_max           # disjoint+ordered
        prev_max = part["k"].iloc[-1]
    # lossless round trip
    back = read_range_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values("k", ignore_index=True),
        df.sort_values("k", ignore_index=True))


def test_string_keys(tmp_path):
    out = str(tmp_path / "rp")
    df = pd.DataFrame({"k": [f"id{i:04d}" for i in range(200)][::-1],
                       "v": range(200)})
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=4)
    back = read_range_partitioned(out).to_pandas()
    assert sorted(back["k"]) == sorted(df["k"])


def test_resume_skips_completed(tmp_path):
    out = str(tmp_path / "rp")
    df = _mk(600)
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=6)
    dirs = sorted(glob.glob(os.path.join(out, "range=*")))
    mtimes = {d: os.path.getmtime(os.path.join(d, "part-000.parquet"))
              for d in dirs}
    # simulate a crashed run: two ranges missing
    import shutil

    for d in dirs[1:3]:
        shutil.rmtree(d)
    stats = write_range_partitioned(
        rd.from_pandas(df), out, "k", num_ranges=6)
    assert sorted(stats["range_id"]) == [
        int(os.path.basename(d).split("=")[1]) for d in dirs[1:3]]
    # survivors were skipped, not rewritten
    for d in dirs[:1] + dirs[3:]:
        assert os.path.getmtime(os.path.join(d, "part-000.parquet")) \
            == mtimes[d]
    back = read_range_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values("k", ignore_index=True),
        df.sort_values("k", ignore_index=True))


def test_cuts_persisted_and_validated(tmp_path):
    out = str(tmp_path / "rp")
    df = _mk(300)
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=4)
    cuts = json.load(open(os.path.join(out, "_cuts.json")))
    assert cuts["key"] == "k" and len(cuts["cuts"]) == 3
    with pytest.raises(FormatError):
        write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=5)
    with pytest.raises(FormatError):
        write_range_partitioned(rd.from_pandas(df), out, "v", num_ranges=4)


def test_partition_pruning(tmp_path):
    out = str(tmp_path / "rp")
    df = _mk(400)
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=4)
    sub = read_range_partitioned(out, ranges=[0]).to_pandas()
    whole = read_range_partitioned(out).to_pandas()
    assert 0 < len(sub) < len(whole)
    assert sub["k"].max() < whole["k"].max()
    with pytest.raises(FormatError):
        read_range_partitioned(out, ranges=[99])


def test_resume_false_clears(tmp_path):
    out = str(tmp_path / "rp")
    write_range_partitioned(
        rd.from_pandas(_mk(100)), out, "k", num_ranges=2)
    df2 = _mk(100, seed=9)
    write_range_partitioned(
        rd.from_pandas(df2), out, "k", num_ranges=3, resume=False)
    back = read_range_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(
        back.sort_values("k", ignore_index=True),
        df2.sort_values("k", ignore_index=True))


def test_single_range_and_rejects_zero(tmp_path):
    out = str(tmp_path / "rp")
    df = _mk(50)
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=1)
    assert len(glob.glob(os.path.join(out, "range=*"))) == 1
    with pytest.raises(ValueError):
        write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=0)

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


# ------------------------------------------ co-partitioned zero-shuffle join


def _two_sides(tmp_path, n_left=400, n_right=300, ranges=6):
    """Left/right frames with partial key overlap, right co-partitioned
    with the left's cuts."""
    import numpy as np

    from ontology_matcher_ray.sources.io import load_cuts

    rng = np.random.default_rng(17)
    left = pd.DataFrame({
        "k": rng.integers(0, 500, n_left).astype("int64"),
        "lv": np.arange(n_left, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(250, 750, n_right).astype("int64"),
        "rv": [f"r{i}" for i in range(n_right)],
    })
    ld, rdir = str(tmp_path / "L"), str(tmp_path / "R")
    write_range_partitioned(rd.from_pandas(left), ld, "k",
                            num_ranges=ranges)
    write_range_partitioned(rd.from_pandas(right), rdir, "k",
                            num_ranges=ranges,
                            cuts=load_cuts(ld)["cuts"])
    return left, right, ld, rdir


def _norm(df, how):
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("how", ["inner", "left"])
def test_merge_join_matches_pandas(tmp_path, ray_session, how):
    from ontology_matcher_ray.sources.io import merge_join_range_partitioned

    left, right, ld, rdir = _two_sides(tmp_path)
    got = merge_join_range_partitioned(ld, rdir, "k", how=how).to_pandas()
    want = left.merge(right, on="k", how=how)
    pd.testing.assert_frame_equal(
        _norm(got, how), _norm(want, how), check_dtype=False)


def test_merge_join_empty_right_ranges(tmp_path, ray_session):
    # right side confined to a narrow key band: most ranges have no
    # right directory at all; inner drops them, left NaN-pads them
    import numpy as np

    from ontology_matcher_ray.sources.io import (
        load_cuts,
        merge_join_range_partitioned,
    )

    left = pd.DataFrame({"k": np.arange(300, dtype="int64"),
                         "lv": np.arange(300, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(10, 20, dtype="int64"),
                          "rv": ["x"] * 10})
    ld, rdir = str(tmp_path / "L2"), str(tmp_path / "R2")
    write_range_partitioned(rd.from_pandas(left), ld, "k", num_ranges=8)
    write_range_partitioned(rd.from_pandas(right), rdir, "k", num_ranges=8,
                            cuts=load_cuts(ld)["cuts"])
    inner = merge_join_range_partitioned(ld, rdir, "k").to_pandas()
    assert sorted(inner["k"]) == list(range(10, 20))
    lj = merge_join_range_partitioned(ld, rdir, "k", how="left").to_pandas()
    assert len(lj) == 300
    assert lj["rv"].notna().sum() == 10


def test_merge_join_rejects_mismatched_cuts(tmp_path, ray_session):
    from ontology_matcher_ray.sources.io import merge_join_range_partitioned

    a, b = _mk(200, seed=1), _mk(200, seed=2)
    ld, rdir = str(tmp_path / "La"), str(tmp_path / "Rb")
    write_range_partitioned(rd.from_pandas(a), ld, "k", num_ranges=4)
    write_range_partitioned(rd.from_pandas(b), rdir, "k", num_ranges=5)
    with pytest.raises(FormatError, match="not co-partitioned|cut points"):
        merge_join_range_partitioned(ld, rdir, "k")


def test_merge_join_matches_hash_join(tmp_path, ray_session):
    from ontology_matcher_ray.sources.io import merge_join_range_partitioned
    from ontology_matcher_ray.stages import exchange

    left, right, ld, rdir = _two_sides(tmp_path, n_left=250, n_right=250)
    got = merge_join_range_partitioned(ld, rdir, "k").to_pandas()
    hj = exchange.hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k",
        {"k": "int64", "lv": "int64"}, {"k": "int64", "rv": "object"},
        num_partitions=8,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(got, "inner"), _norm(hj[got.columns.tolist()], "inner"),
        check_dtype=False)


def test_forced_cuts_validation(tmp_path, ray_session):
    from ontology_matcher_ray.sources.io import load_cuts

    a = _mk(100, seed=5)
    d = str(tmp_path / "F")
    with pytest.raises(FormatError, match="sorted and distinct"):
        write_range_partitioned(rd.from_pandas(a), d, "k", cuts=[5, 3])
    write_range_partitioned(rd.from_pandas(a), str(tmp_path / "F2"), "k",
                            num_ranges=4, cuts=[10, 50, 80])
    assert load_cuts(str(tmp_path / "F2"))["cuts"] == [10, 50, 80]
    # re-writing the same dir with DIFFERENT forced cuts is refused
    with pytest.raises(FormatError, match="different cuts"):
        write_range_partitioned(rd.from_pandas(a), str(tmp_path / "F2"),
                                "k", num_ranges=4, cuts=[11, 50, 80])


def test_read_with_column_pruning(tmp_path):
    """Regression: columns= on a range-partitioned read used to trip an
    UnboundLocalError inside Ray's parquet datasource when combined with
    partitioning=None; the pruned path now reads one file per task with
    pyarrow's own column selection."""
    out = str(tmp_path / "rp")
    df = _mk()
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=4)
    back = read_range_partitioned(out, columns=["k"]).to_pandas()
    assert list(back.columns) == ["k"]
    assert sorted(back["k"]) == sorted(df["k"])


def test_read_range_between_prunes_and_matches(tmp_path):
    """Key-range scans open only the range dirs whose interval intersects
    the bound (the persisted cuts ARE a zone map on the key)."""
    import numpy as np

    from ontology_matcher_ray.sources.io import read_range_between

    out = str(tmp_path / "rp")
    df = pd.DataFrame({"k": np.arange(0, 1000, dtype="int64"),
                       "v": np.arange(0, 1000, dtype="int64") * 3})
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=8)
    got = read_range_between(out, 100, 199).to_pandas()
    want = df[(df.k >= 100) & (df.k <= 199)]
    assert sorted(got["k"]) == sorted(want["k"])
    assert sorted(got["v"]) == sorted(want["v"])
    # column selection applies after the exact filter
    one_col = read_range_between(out, 100, 199, columns=["v"]).to_pandas()
    assert list(one_col.columns) == ["v"] and len(one_col) == len(want)
    # empty intersection (beyond all cuts) still returns cleanly
    assert read_range_between(out, 5000, 6000).count() == 0


def test_read_range_between_all_ranges_missing(tmp_path):
    """A key range whose every intersecting range dir never materialized
    (empty at write time) returns a typed empty dataset, not an error."""
    from ontology_matcher_ray.sources.io import read_range_between

    out = str(tmp_path / "rp")
    df = pd.DataFrame({"k": [0, 1, 2, 500, 501, 502], "v": range(6)})
    # force cuts that leave a middle range empty
    write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=3,
                            cuts=[2, 100])
    ds = read_range_between(out, 50, 99)   # range (2, 100] is empty
    assert ds.count() == 0
    assert "k" in ds.schema().names

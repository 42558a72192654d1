"""Storage-layout operators: zone-mapped sinks + file-skipping scans,
Z-order clustered writes, small-file compaction."""

import glob
import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.sources.io import FormatError
from ontology_matcher_ray.sources.layout import (
    compact_parquet,
    plan_compaction,
    prune_parts,
    scan_between,
    write_zonemapped,
    write_zordered,
    zonemap_table,
)


def _frame_fingerprint(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _mkdata(n=4000, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 100_000, n).astype("int64"),
        "v": rng.integers(-50, 50, n).astype("int64"),
        "s": [f"s{int(x):05d}" for x in rng.integers(0, 10_000, n)],
    })


# ---------------------------------------------------------------------------
# zone maps
# ---------------------------------------------------------------------------

class TestZonemap:
    @pytest.fixture()
    def zm_dir(self, tmp_path):
        df = _mkdata().sort_values("k", ignore_index=True)  # clustered on k
        out = str(tmp_path / "zm")
        write_zonemapped(
            rd.from_pandas(df).repartition(16), out, stat_cols=["k", "v"])
        return out, df

    def test_scan_matches_brute_filter(self, zm_dir):
        out, df = zm_dir
        lo, hi = 20_000, 30_000
        got = scan_between(out, "k", lo, hi).to_pandas()
        want = df[(df.k >= lo) & (df.k <= hi)]
        assert _frame_fingerprint(got) == _frame_fingerprint(want)

    def test_clustered_column_prunes_files(self, zm_dir):
        out, _ = zm_dir
        pruned = prune_parts(out, "k", 20_000, 30_000)
        assert pruned["total"] >= 8
        # a 10% selectivity range over a sorted-by-k layout must skip
        # most parts
        assert pruned["skipped"] >= pruned["total"] // 2

    def test_unclustered_column_still_exact(self, zm_dir):
        out, df = zm_dir
        got = scan_between(out, "v", -3, 3).to_pandas()
        want = df[(df.v >= -3) & (df.v <= 3)]
        assert _frame_fingerprint(got) == _frame_fingerprint(want)

    def test_empty_range_returns_typed_empty(self, zm_dir):
        out, df = zm_dir
        ds = scan_between(out, "k", 10_000_000, 20_000_000)
        # typed at the Dataset level even though no data file was opened
        assert ds.schema().names == list(df.columns)
        assert ds.count() == 0

    def test_column_pruning(self, zm_dir):
        out, df = zm_dir
        got = scan_between(out, "k", 0, 50_000, columns=["s"]).to_pandas()
        assert list(got.columns) == ["s"]
        assert len(got) == int((df.k <= 50_000).sum())

    def test_zonemap_table_bounded(self, zm_dir):
        out, _ = zm_dir
        t = zonemap_table(out)
        n_parts = len(glob.glob(os.path.join(out, "*.parquet")))
        assert len(t) == 2 * n_parts          # two stat columns
        assert (t["min"] <= t["max"]).all()

    def test_unknown_stat_column_raises(self, zm_dir):
        out, _ = zm_dir
        with pytest.raises(FormatError, match="no zone map"):
            prune_parts(out, "s", "a", "b")

    def test_nulls_never_match_between(self, tmp_path):
        df = pd.DataFrame({
            "k": pd.array([1, None, 3, None, 5], dtype="Int64"),
            "x": list("abcde"),
        })
        out = str(tmp_path / "zn")
        write_zonemapped(rd.from_pandas(df), out, stat_cols=["k"])
        got = scan_between(out, "k", 0, 10).to_pandas()
        assert sorted(got["x"]) == ["a", "c", "e"]

    def test_all_null_part_pruned(self, tmp_path):
        out = str(tmp_path / "za")
        a = pd.DataFrame({"k": pd.array([None, None], dtype="Int64")})
        b = pd.DataFrame({"k": pd.array([1, 2], dtype="Int64")})
        write_zonemapped(
            rd.from_pandas(a).union(rd.from_pandas(b)), out, stat_cols=["k"])
        pruned = prune_parts(out, "k", 0, 10)
        assert pruned["skipped"] == 1 and len(pruned["kept"]) == 1

    def test_refuses_nonempty_dir(self, zm_dir):
        out, df = zm_dir
        with pytest.raises(FormatError, match="already contains"):
            write_zonemapped(rd.from_pandas(df), out, stat_cols=["k"])


# ---------------------------------------------------------------------------
# Z-order
# ---------------------------------------------------------------------------

class TestZorder:
    @pytest.fixture()
    def zo(self, tmp_path):
        rng = np.random.default_rng(11)
        n = 6000
        df = pd.DataFrame({
            "x": rng.integers(0, 1000, n).astype("int64"),
            "y": rng.integers(0, 1000, n).astype("int64"),
            "payload": rng.integers(0, 1 << 40, n).astype("int64"),
        })
        out = str(tmp_path / "zo")
        stats = write_zordered(
            rd.from_pandas(df).repartition(8), out, cols=["x", "y"],
            num_files=16)
        return out, df, stats

    def test_exact_on_both_dims(self, zo):
        out, df, _ = zo
        for col in ("x", "y"):
            got = scan_between(out, col, 100, 200).to_pandas()
            want = df[(df[col] >= 100) & (df[col] <= 200)]
            assert _frame_fingerprint(got) == _frame_fingerprint(want), col

    def test_prunes_on_both_dims(self, zo):
        """The whole point of Z-order: a single-column sort prunes one
        dimension; the Morton layout must prune BOTH."""
        out, _, stats = zo
        n_files = int(stats["file_id"].nunique())
        assert n_files >= 8
        for col in ("x", "y"):
            pruned = prune_parts(out, col, 100, 200)  # ~10% selectivity
            assert pruned["skipped"] >= pruned["total"] // 4, (
                col, pruned)

    def test_all_rows_land_exactly_once(self, zo):
        out, df, stats = zo
        assert int(stats["rows"].sum()) == len(df)
        got = scan_between(out, "x", -1, 10_000).to_pandas()
        assert _frame_fingerprint(got) == _frame_fingerprint(df)

    def test_layout_metadata_persisted(self, zo):
        out, _, _ = zo
        with open(os.path.join(out, "_zorder.json")) as f:
            meta = json.load(f)
        assert meta["cols"] == ["x", "y"]
        assert meta["zcuts"] == sorted(meta["zcuts"])

    def test_single_column_rejected(self, tmp_path):
        with pytest.raises(ValueError, match=">= 2 columns"):
            write_zordered(
                rd.from_pandas(_mkdata(100)), str(tmp_path / "z1"),
                cols=["k"])


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def _small_parts_dir(tmp_path, n_parts=24, rows_per=200) -> tuple:
    src = str(tmp_path / "small")
    os.makedirs(src)
    frames = []
    rng = np.random.default_rng(3)
    for i in range(n_parts):
        f = pd.DataFrame({
            "k": rng.integers(0, 10_000, rows_per).astype("int64"),
            "s": [f"r{i:03d}_{j}" for j in range(rows_per)],
        })
        f.to_parquet(os.path.join(src, f"in-{i:04d}.parquet"), index=False)
        frames.append(f)
    return src, pd.concat(frames, ignore_index=True)


class TestCompaction:
    def test_bins_respect_target(self, tmp_path):
        src, _ = _small_parts_dir(tmp_path)
        sizes = {f: os.path.getsize(f)
                 for f in glob.glob(os.path.join(src, "*.parquet"))}
        target = 4 * max(sizes.values())
        bins = plan_compaction(src, target)
        assert sum(len(b) for b in bins) == len(sizes)
        for b in bins:
            if len(b) > 1:
                assert sum(sizes[f] for f in b) <= target

    def test_content_preserved_and_files_reduced(self, tmp_path):
        src, full = _small_parts_dir(tmp_path)
        out = str(tmp_path / "compacted")
        target = 6 * os.path.getsize(
            sorted(glob.glob(os.path.join(src, "*.parquet")))[0])
        stats = compact_parquet(src, out, target_bytes=target)
        out_parts = glob.glob(os.path.join(out, "*.parquet"))
        assert 0 < len(out_parts) < 24
        assert len(out_parts) == len(stats)
        got = rd.read_parquet(out_parts).to_pandas()
        assert _frame_fingerprint(got) == _frame_fingerprint(full)

    def test_resume_skips_done_and_rebuilds_deleted(self, tmp_path):
        src, full = _small_parts_dir(tmp_path)
        out = str(tmp_path / "resume")
        stats1 = compact_parquet(src, out, target_bytes=1 << 16)
        # rerun: nothing to do
        stats2 = compact_parquet(src, out, target_bytes=1 << 16)
        assert len(stats2) == 0
        # delete ONE output part: exactly that bin is rebuilt
        victim = sorted(glob.glob(os.path.join(out, "*.parquet")))[0]
        os.remove(victim)
        stats3 = compact_parquet(src, out, target_bytes=1 << 16)
        assert len(stats3) == 1
        got = rd.read_parquet(
            glob.glob(os.path.join(out, "*.parquet"))).to_pandas()
        assert _frame_fingerprint(got) == _frame_fingerprint(full)
        assert int(stats1["rows"].sum()) == len(full)

    def test_plan_is_stable_across_reruns(self, tmp_path):
        src, _ = _small_parts_dir(tmp_path)
        out = str(tmp_path / "plan")
        compact_parquet(src, out, target_bytes=1 << 16)
        with open(os.path.join(out, "_compaction.json")) as f:
            saved = json.load(f)
        assert saved["bins"] == plan_compaction(src, 1 << 16)

    def test_zonemaps_carried_through(self, tmp_path):
        src, full = _small_parts_dir(tmp_path)
        out = str(tmp_path / "zmc")
        compact_parquet(src, out, target_bytes=1 << 16, stat_cols=["k"])
        got = scan_between(out, "k", 0, 5000).to_pandas()
        want = full[(full.k >= 0) & (full.k <= 5000)]
        assert _frame_fingerprint(got) == _frame_fingerprint(want)

    def test_wrong_source_dir_rejected(self, tmp_path):
        src, _ = _small_parts_dir(tmp_path)
        out = str(tmp_path / "wrong")
        compact_parquet(src, out, target_bytes=1 << 16)
        other = str(tmp_path / "other")
        shutil.copytree(src, other)
        with pytest.raises(FormatError, match="was planned from"):
            compact_parquet(other, out, target_bytes=1 << 16)


# ---------------------------------------------------------------------------
# Bloom point lookups
# ---------------------------------------------------------------------------

class TestBloom:
    @pytest.fixture()
    def bl_dir(self, tmp_path):
        rng = np.random.default_rng(23)
        n = 5000
        df = pd.DataFrame({
            "repo": [f"org{int(a):03d}/repo{int(b):05d}"
                     for a, b in zip(rng.integers(0, 50, n),
                                     rng.integers(0, 2000, n))],
            "stars": rng.integers(0, 10_000, n).astype("int64"),
        })
        out = str(tmp_path / "bl")
        write_zonemapped(
            rd.from_pandas(df).repartition(16), out,
            stat_cols=["stars"], bloom_cols=["repo"])
        return out, df

    def test_point_lookup_exact(self, bl_dir):
        from ontology_matcher_ray.sources.layout import scan_eq

        out, df = bl_dir
        target = df["repo"].iloc[1234]
        got = scan_eq(out, "repo", target).to_pandas()
        want = df[df.repo == target]
        assert _frame_fingerprint(got) == _frame_fingerprint(want)

    def test_bloom_prunes_most_parts(self, bl_dir):
        from ontology_matcher_ray.sources.layout import prune_parts_eq

        out, df = bl_dir
        # a key that lives in ~1 part: a high-cardinality point probe
        # must skip most files (fpp ~1% per part)
        target = df["repo"].iloc[7]
        pruned = prune_parts_eq(out, "repo", target)
        assert pruned["total"] >= 8
        assert pruned["skipped"] >= pruned["total"] // 2, pruned

    def test_absent_key_usually_opens_nothing(self, bl_dir):
        from ontology_matcher_ray.sources.layout import (
            prune_parts_eq,
            scan_eq,
        )

        out, _ = bl_dir
        pruned = prune_parts_eq(out, "repo", "org999/never-existed")
        assert len(pruned["kept"]) <= 2      # fpp gives at most a stray
        got = scan_eq(out, "repo", "org999/never-existed").to_pandas()
        assert len(got) == 0

    def test_eq_on_zonemap_only_column_works(self, bl_dir):
        from ontology_matcher_ray.sources.layout import scan_eq

        out, df = bl_dir
        v = int(df["stars"].iloc[0])
        got = scan_eq(out, "stars", v).to_pandas()
        assert _frame_fingerprint(got) == _frame_fingerprint(
            df[df.stars == v])

    def test_unknown_column_raises(self, bl_dir):
        from ontology_matcher_ray.sources.layout import prune_parts_eq

        out, _ = bl_dir
        with pytest.raises(FormatError, match="neither zone map nor"):
            prune_parts_eq(out, "nope", 1)


# ---------------------------------------------------------------------------
# MERGE INTO range-partitioned table
# ---------------------------------------------------------------------------

class TestMergeInto:
    @pytest.fixture()
    def table(self, tmp_path):
        from ontology_matcher_ray.sources.io import write_range_partitioned

        df = pd.DataFrame({
            "k": np.arange(0, 1000, dtype="int64"),
            "v": np.arange(0, 1000, dtype="int64") * 10,
        })
        out = str(tmp_path / "tbl")
        write_range_partitioned(rd.from_pandas(df), out, "k", num_ranges=8)
        return out, df

    def _apply(self, table_dir, changes: pd.DataFrame):
        from ontology_matcher_ray.sources.layout import (
            merge_into_range_partitioned,
        )

        return merge_into_range_partitioned(
            table_dir, rd.from_pandas(changes))

    def test_upsert_insert_delete(self, table):
        from ontology_matcher_ray.sources.io import read_range_partitioned

        out, df = table
        changes = pd.DataFrame({
            "k": [5, 2000, 7],
            "v": [999, 42, 0],
            "_op": ["upsert", "upsert", "delete"],
        })
        stats = self._apply(out, changes)
        back = read_range_partitioned(out).to_pandas()
        want = df[df.k != 7].copy()
        want.loc[want.k == 5, "v"] = 999
        want = pd.concat(
            [want, pd.DataFrame({"k": [2000], "v": [42]})],
            ignore_index=True)
        assert _frame_fingerprint(back) == _frame_fingerprint(want)
        assert int(stats["upserts"].sum()) == 2
        assert int(stats["deletes"].sum()) == 1

    def test_untouched_ranges_not_rewritten(self, table):
        out, _ = table
        import glob as g
        import os as o

        parts = sorted(g.glob(o.path.join(out, "range=*", "*.parquet")))
        mtimes = {p: o.path.getmtime(p) for p in parts}
        stats = self._apply(out, pd.DataFrame(
            {"k": [1], "v": [111], "_op": ["upsert"]}))
        assert len(stats) == 1               # exactly one range touched
        untouched = [p for p in parts
                     if o.path.getmtime(p) == mtimes[p]]
        assert len(untouched) == len(parts) - 1

    def test_idempotent_reapply(self, table):
        from ontology_matcher_ray.sources.io import read_range_partitioned

        out, _ = table
        changes = pd.DataFrame({
            "k": [3, 900], "v": [33, 0], "_op": ["upsert", "delete"]})
        self._apply(out, changes)
        first = read_range_partitioned(out).to_pandas()
        stats2 = self._apply(out, changes)   # crash-recovery story
        second = read_range_partitioned(out).to_pandas()
        assert _frame_fingerprint(first) == _frame_fingerprint(second)
        assert int(stats2["rows_after"].sum()) >= 0

    def test_ranges_stay_sorted_and_disjoint(self, table):
        from ontology_matcher_ray.sources.io import load_cuts

        out, _ = table
        self._apply(out, pd.DataFrame({
            "k": [0, 500, 999, -5, 10_000],
            "v": [1, 2, 3, 4, 5],
            "_op": ["upsert"] * 5}))
        import glob as g
        import os as o

        cuts = load_cuts(out)["cuts"]
        for d in sorted(g.glob(o.path.join(out, "range=*"))):
            part = pd.read_parquet(d)
            assert part["k"].is_monotonic_increasing
            rid = int(o.path.basename(d).split("=")[1])
            if rid > 0:
                assert part["k"].iloc[0] > cuts[rid - 1] - 1
            if rid < len(cuts):
                assert part["k"].iloc[-1] <= cuts[rid]

    def test_duplicate_changeset_key_rejected(self, table):
        out, _ = table
        with pytest.raises(Exception, match="duplicate key"):
            self._apply(out, pd.DataFrame({
                "k": [1, 1], "v": [2, 3], "_op": ["upsert", "upsert"]}))

    def test_unknown_op_rejected(self, table):
        out, _ = table
        with pytest.raises(Exception, match="unknown _op"):
            self._apply(out, pd.DataFrame(
                {"k": [1], "v": [2], "_op": ["replace"]}))


# ---------------------------------------------------------------------------
# vacuum + schema evolution
# ---------------------------------------------------------------------------

class TestVacuum:
    def test_sweeps_tmp_old_and_orphans(self, tmp_path):
        from ontology_matcher_ray.sources.io import write_range_partitioned
        from ontology_matcher_ray.sources.layout import vacuum

        base = str(tmp_path / "lake")
        df = _mkdata(500)
        write_range_partitioned(rd.from_pandas(df), base, "k", num_ranges=4)
        # plant crash debris
        os.makedirs(os.path.join(base, "range=00001.old"))
        os.makedirs(os.path.join(base, "range=00099.tmp"))
        with open(os.path.join(base, "part-000000.parquet.tmp123"), "w"):
            pass
        with open(os.path.join(base, "_zmap-part-000042.json"), "w") as f:
            json.dump({"rows": 0, "stats": {}}, f)
        counts = vacuum(base)
        assert counts == {"tmp": 2, "old": 1, "orphan_sidecars": 1}
        left = set(os.listdir(base))
        assert not any(".tmp" in n or n.endswith(".old") for n in left)
        # committed data untouched
        from ontology_matcher_ray.sources.io import read_range_partitioned

        back = read_range_partitioned(base).to_pandas()
        assert _frame_fingerprint(back) == _frame_fingerprint(df)

    def test_live_sidecars_survive(self, tmp_path):
        from ontology_matcher_ray.sources.layout import vacuum

        out = str(tmp_path / "zm")
        write_zonemapped(rd.from_pandas(_mkdata(300)), out, stat_cols=["k"])
        n_before = len(glob.glob(os.path.join(out, "_zmap-*.json")))
        counts = vacuum(out)
        assert counts["orphan_sidecars"] == 0
        assert len(glob.glob(os.path.join(out, "_zmap-*.json"))) == n_before


class TestSchemaEvolution:
    @pytest.fixture()
    def drifted(self, tmp_path):
        """Three ingest batches with drifting schemas: a new column
        appears in batch 2, an int column widens in batch 3."""
        d = str(tmp_path / "drift")
        os.makedirs(d)
        b1 = pd.DataFrame({"id": np.array([1, 2], dtype="int32"),
                           "name": ["a", "b"]})
        b2 = pd.DataFrame({"id": np.array([3], dtype="int32"),
                           "name": ["c"], "lang": ["py"]})
        b3 = pd.DataFrame({"id": np.array([1 << 40], dtype="int64"),
                           "name": ["d"], "lang": ["rs"]})
        for i, b in enumerate([b1, b2, b3]):
            b.to_parquet(os.path.join(d, f"part-{i:03d}.parquet"),
                         index=False)
        return d

    def test_unified_read(self, drifted):
        from ontology_matcher_ray.sources.layout import read_evolved

        got = read_evolved(drifted).to_pandas()
        assert sorted(got.columns) == ["id", "lang", "name"]
        assert str(got["id"].dtype) == "int64"
        assert len(got) == 4
        assert got.set_index("name")["lang"].to_dict() == {
            "a": None, "b": None, "c": "py", "d": "rs"}

    def test_column_selection(self, drifted):
        from ontology_matcher_ray.sources.layout import read_evolved

        got = read_evolved(drifted, columns=["name", "lang"]).to_pandas()
        assert list(got.columns) == ["name", "lang"]
        assert len(got) == 4

    def test_missing_column_rejected(self, drifted):
        from ontology_matcher_ray.sources.layout import read_evolved

        with pytest.raises(FormatError, match="not in any part"):
            read_evolved(drifted, columns=["nope"])

    def test_incompatible_drift_fails_at_plan_time(self, tmp_path):
        from ontology_matcher_ray.sources.layout import read_evolved

        d = str(tmp_path / "bad")
        os.makedirs(d)
        pd.DataFrame({"id": [1]}).to_parquet(
            os.path.join(d, "a.parquet"), index=False)
        pd.DataFrame({"id": ["x"]}).to_parquet(
            os.path.join(d, "b.parquet"), index=False)
        with pytest.raises(FormatError, match="incompatible schema drift"):
            read_evolved(d)


# ---------------------------------------------------------------------------
# property tests (pure kernels + randomized merge equivalence)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


class TestLayoutProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=20), min_size=1,
                    max_size=50))
    def test_bloom_has_no_false_negatives(self, values):
        from ontology_matcher_ray.sources.layout import (
            _bloom_build,
            _bloom_maybe_contains,
        )

        bloom = _bloom_build(pd.Series(values, dtype=object))
        for v in values:
            assert _bloom_maybe_contains(bloom, v)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
                    min_size=1, max_size=200))
    def test_morton_interleave_is_injective_on_codes(self, pairs):
        from ontology_matcher_ray.sources.layout import _interleave_bits

        xs = np.array([p[0] for p in pairs], dtype=np.uint64)
        ys = np.array([p[1] for p in pairs], dtype=np.uint64)
        z = _interleave_bits([xs, ys], bits=10)
        # injective: distinct (x, y) -> distinct z
        seen = {}
        for x, y, zz in zip(xs, ys, z):
            if (x, y) in seen:
                assert seen[(x, y)] == zz
            else:
                assert zz not in set(seen.values())
                seen[(x, y)] = zz
        # bit budget: 2 cols x 10 bits
        assert int(z.max()) < (1 << 20)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(-10_000, 10_000), min_size=1,
                    max_size=300),
           st.integers(2, 64))
    def test_rank_codes_monotone_and_bounded(self, vals, ladder_n):
        from ontology_matcher_ray.sources.layout import _rank_code

        arr = np.sort(np.array(vals, dtype=np.int64))
        ladder = np.sort(np.array(vals, dtype=np.int64))[:ladder_n]
        codes = _rank_code(arr, np.sort(ladder), bits=8)
        assert (codes < 256).all() and (codes >= 0).all()
        assert (np.diff(codes) >= 0).all()      # monotone in the value


def test_merge_into_random_changesets_match_pandas_model(tmp_path):
    """Ten random upsert/delete changesets applied sequentially: the
    range-partitioned table must track a plain pandas primary-key model
    exactly at every step."""
    from ontology_matcher_ray.sources.io import (
        read_range_partitioned,
        write_range_partitioned,
    )
    from ontology_matcher_ray.sources.layout import (
        merge_into_range_partitioned,
    )

    rng = np.random.default_rng(99)
    model = pd.DataFrame({
        "k": np.arange(0, 400, dtype="int64"),
        "v": rng.integers(0, 1000, 400).astype("int64"),
    })
    out = str(tmp_path / "tbl")
    write_range_partitioned(
        rd.from_pandas(model), out, "k", num_ranges=6)
    for step in range(10):
        n = int(rng.integers(1, 30))
        keys = rng.choice(np.arange(-50, 600), size=n, replace=False)
        ops = rng.choice(["upsert", "delete"], size=n)
        vals = rng.integers(0, 10_000, n)
        changes = pd.DataFrame({
            "k": keys.astype("int64"), "v": vals.astype("int64"),
            "_op": ops})
        merge_into_range_partitioned(out, rd.from_pandas(changes))
        # pandas primary-key model
        ups = changes[changes._op == "upsert"].drop(columns=["_op"])
        dels = set(changes.loc[changes._op == "delete", "k"])
        model = model[~model.k.isin(dels) & ~model.k.isin(set(ups.k))]
        model = pd.concat([model, ups], ignore_index=True)
        back = read_range_partitioned(out).to_pandas()
        assert _frame_fingerprint(back) == _frame_fingerprint(model), step


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(-1000, 1000), min_size=1,
                         max_size=30), min_size=1, max_size=8),
       st.integers(-1100, 1100), st.integers(0, 300))
def test_pruning_is_sound_for_any_partitioning(tmp_path_factory,
                                               parts, lo, width):
    """Pure zone-map soundness: whatever rows land in whatever parts,
    every part containing a match for [lo, lo+width] is kept (no Ray —
    parts and sidecars written directly)."""
    import pyarrow as pa2

    from ontology_matcher_ray.sources.layout import _write_zmap

    hi = lo + width
    d = str(tmp_path_factory.mktemp("zs"))
    expect_kept = set()
    for i, vals in enumerate(parts):
        path = os.path.join(d, f"part-{i:06d}.parquet")
        tbl = pa2.table({"k": pd.Series(vals, dtype="int64")})
        import pyarrow.parquet as pq2

        pq2.write_table(tbl, path)
        _write_zmap(path, tbl, ["k"])
        if any(lo <= v <= hi for v in vals):
            expect_kept.add(path)
    pruned = prune_parts(d, "k", lo, hi)
    assert expect_kept <= set(pruned["kept"])     # soundness: no misses

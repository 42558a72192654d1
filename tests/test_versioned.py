"""MVCC-versioned tables: snapshot isolation, time travel, optimistic
commits, version vacuum."""

import glob
import hashlib
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.sources.io import FormatError
from ontology_matcher_ray.sources.versioned import (
    CommitConflict,
    create_versioned,
    list_versions,
    load_manifest,
    merge_versioned,
    read_versioned,
    vacuum_versions,
)


def _fp(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture()
def table(tmp_path):
    df = pd.DataFrame({
        "k": np.arange(0, 500, dtype="int64"),
        "v": np.arange(0, 500, dtype="int64") * 7,
    })
    base = str(tmp_path / "vt")
    stats = create_versioned(rd.from_pandas(df), base, "k", num_ranges=5)
    assert int(stats["rows"].sum()) == len(df)
    return base, df


def _merge(base, changes: pd.DataFrame, **kw):
    return merge_versioned(base, rd.from_pandas(changes), **kw)


def test_create_and_read_head(table):
    base, df = table
    assert list_versions(base) == [1]
    assert _fp(read_versioned(base).to_pandas()) == _fp(df)


def test_merge_creates_new_version_and_time_travel(table):
    base, df = table
    changes = pd.DataFrame({
        "k": [3, 9999, 7], "v": [111, 222, 0],
        "_op": ["upsert", "upsert", "delete"]})
    stats = _merge(base, changes)
    assert list_versions(base) == [1, 2]
    assert int(stats["upserts"].sum()) == 2
    # head reflects the merge
    want = df[df.k != 7].copy()
    want.loc[want.k == 3, "v"] = 111
    want = pd.concat([want, pd.DataFrame({"k": [9999], "v": [222]})],
                     ignore_index=True)
    assert _fp(read_versioned(base).to_pandas()) == _fp(want)
    # time travel: v1 still returns the ORIGINAL rows exactly
    assert _fp(read_versioned(base, version=1).to_pandas()) == _fp(df)


def test_untouched_ranges_share_part_files(table):
    base, _ = table
    _merge(base, pd.DataFrame(
        {"k": [1], "v": [5], "_op": ["upsert"]}))
    m1 = load_manifest(base, 1)["ranges"]
    m2 = load_manifest(base, 2)["ranges"]
    shared = [r for r in m1 if m1[r] == m2.get(r)]
    assert len(shared) == len(m1) - 1       # exactly one range rewritten


def test_snapshot_isolation_mid_scan(table):
    """A dataset pinned BEFORE a merge reads pre-merge rows even when
    consumed after the merge landed (the manifest pins the part list)."""
    base, df = table
    pinned = read_versioned(base)           # lazy: not yet consumed
    _merge(base, pd.DataFrame(
        {"k": [0], "v": [0], "_op": ["delete"]}))
    got = pinned.to_pandas()                 # consumed after the merge
    assert _fp(got) == _fp(df)


def test_commit_conflict_on_concurrent_writer(table):
    base, _ = table
    # simulate a concurrent writer that already committed v2
    import json

    from ontology_matcher_ray.sources.versioned import _manifest_path

    head = load_manifest(base)
    rival = dict(head, version=2, parent=1, op="merge")
    with open(_manifest_path(base, 2), "w") as f:
        json.dump(rival, f)
    with pytest.raises(CommitConflict):
        _merge(base, pd.DataFrame(
            {"k": [1], "v": [2], "_op": ["upsert"]}),
            expected_head=1)
    # without expected_head, the merge builds on the rival's head (v2)
    # and commits v3 cleanly
    stats = _merge(base, pd.DataFrame(
        {"k": [1], "v": [2], "_op": ["upsert"]}))
    assert list_versions(base) == [1, 2, 3]
    assert int(stats["upserts"].sum()) == 1


def test_expected_head_guard(table):
    base, _ = table
    _merge(base, pd.DataFrame({"k": [1], "v": [2], "_op": ["upsert"]}))
    with pytest.raises(CommitConflict, match="expected v1"):
        _merge(base, pd.DataFrame(
            {"k": [1], "v": [3], "_op": ["upsert"]}), expected_head=1)


def test_vacuum_drops_old_versions_and_orphan_parts(table):
    base, df = table
    for i in range(3):
        _merge(base, pd.DataFrame(
            {"k": [i], "v": [1000 + i], "_op": ["upsert"]}))
    head_before = read_versioned(base).to_pandas()
    n_parts_before = len(glob.glob(os.path.join(base, "parts", "*.parquet")))
    out = vacuum_versions(base, keep_last=2)
    assert out["versions_dropped"] == 2      # v1, v2 gone
    assert out["parts_deleted"] >= 1
    assert list_versions(base) == [3, 4]
    # retained versions still read exactly
    assert _fp(read_versioned(base).to_pandas()) == _fp(head_before)
    with pytest.raises(FormatError, match="possibly vacuumed"):
        read_versioned(base, version=1)
    assert len(glob.glob(os.path.join(base, "parts", "*.parquet"))) \
        < n_parts_before


def test_range_emptied_by_deletes_leaves_manifest(table):
    base, df = table
    m1 = load_manifest(base)
    # delete every key of range 0
    cuts = m1["cuts"]
    r0_keys = df.k[df.k <= cuts[0]]
    _merge(base, pd.DataFrame({
        "k": r0_keys.to_numpy(), "v": np.zeros(len(r0_keys), dtype="int64"),
        "_op": ["delete"] * len(r0_keys)}))
    m2 = load_manifest(base)
    assert "0" not in m2["ranges"]
    got = read_versioned(base).to_pandas()
    assert _fp(got) == _fp(df[df.k > cuts[0]])


def test_duplicate_changeset_key_rejected(table):
    base, _ = table
    with pytest.raises(Exception, match="duplicate key"):
        _merge(base, pd.DataFrame(
            {"k": [1, 1], "v": [2, 3], "_op": ["upsert", "upsert"]}))


def test_create_twice_rejected(table, tmp_path):
    base, df = table
    with pytest.raises(FormatError, match="already has committed"):
        create_versioned(rd.from_pandas(df), base, "k")


def test_incremental_kg_publish_end_to_end(tmp_path):
    """The flagship story: corpus rebuild -> triple diff -> one atomic
    versioned publish.  Readers of v1 are untouched; the head equals the
    new build exactly; a republish of the same build is a no-op."""
    from ontology_matcher_ray import corpus as corpus_mod
    from ontology_matcher_ray.pipelines import corpus_kg
    from ontology_matcher_ray.pipelines.docs_kg import publish_triples
    from ontology_matcher_ray.schemas import DISEASE_SPEC
    from ontology_matcher_ray.state.snapshot import build_snapshot

    snap = build_snapshot(DISEASE_SPEC, n_synthetic=100, seed=42)
    base = str(tmp_path / "kg_table")

    def build(n_files: int, tag: str):
        cdir = str(tmp_path / f"corpus_{tag}")
        corpus_mod.generate_corpus(cdir, n_files, snap)
        out = str(tmp_path / f"kg_{tag}")
        corpus_kg.build_kg(cdir, out, snap, n_shards=2)
        return corpus_kg.read_triples(out).materialize()

    t1 = build(300, "a")
    stats1 = publish_triples(base, t1)
    assert list_versions(base) == [1]
    assert int(stats1["rows"].sum()) == t1.count()

    # the corpus GROWS (the generator is deterministic per index, so the
    # first 300 files are identical -> the diff is exactly the new files'
    # triples minus any now-shared ones)
    t2 = build(400, "b")
    stats2 = publish_triples(base, t2)
    assert list_versions(base) == [1, 2]
    adds = int(stats2.loc[stats2.op == "add", "rows"].sum())
    assert adds > 0

    set1 = set(map(tuple, t1.to_pandas()[["subj", "pred", "obj"]].values))
    set2 = set(map(tuple, t2.to_pandas()[["subj", "pred", "obj"]].values))
    head = read_versioned(base, columns=["subj", "pred", "obj"]).to_pandas()
    assert set(map(tuple, head.values)) == set2
    v1 = read_versioned(base, version=1,
                        columns=["subj", "pred", "obj"]).to_pandas()
    assert set(map(tuple, v1.values)) == set1

    # republish of the identical build: no new version, 0/0 delta
    stats3 = publish_triples(base, t2)
    assert list_versions(base) == [1, 2]
    assert int(stats3["rows"].sum()) == 0


def test_versioned_random_changesets_match_pandas_model(tmp_path):
    """Eight random changesets: the HEAD tracks a pandas primary-key
    model exactly at every step, and EVERY retained historical version
    still reproduces its own snapshot at the end (time-travel audit)."""
    rng = np.random.default_rng(7)
    model = pd.DataFrame({
        "k": np.arange(0, 300, dtype="int64"),
        "v": rng.integers(0, 1000, 300).astype("int64"),
    })
    base = str(tmp_path / "vt")
    create_versioned(rd.from_pandas(model), base, "k", num_ranges=4)
    snapshots = {1: model.copy()}
    for step in range(8):
        n = int(rng.integers(1, 25))
        keys = rng.choice(np.arange(-20, 400), size=n, replace=False)
        changes = pd.DataFrame({
            "k": keys.astype("int64"),
            "v": rng.integers(0, 10_000, n).astype("int64"),
            "_op": rng.choice(["upsert", "delete"], size=n)})
        merge_versioned(base, rd.from_pandas(changes))
        ups = changes[changes._op == "upsert"].drop(columns=["_op"])
        dels = set(changes.loc[changes._op == "delete", "k"])
        model = model[~model.k.isin(dels) & ~model.k.isin(set(ups.k))]
        model = pd.concat([model, ups], ignore_index=True)
        snapshots[step + 2] = model.copy()
        assert _fp(read_versioned(base).to_pandas()) == _fp(model), step
    # every retained version reproduces its exact historical state
    for v, snap in snapshots.items():
        assert _fp(read_versioned(base, version=v).to_pandas()) == _fp(snap), v


def test_sidecars_written_and_point_probe_prunes(tmp_path):
    """Lakehouse sidecars on versioned parts: a Bloom point probe on a
    non-key column opens only the parts that can contain the value,
    returns identical rows to the brute filter, survives merges, and
    vacuum removes sidecars with their parts."""
    from ontology_matcher_ray.sources.versioned import read_versioned_eq

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": np.arange(0, 2000, dtype="int64"),
        "subj": [f"e{i // 100:02d}" for i in range(2000)],  # clustered
        "v": rng.integers(0, 9, 2000).astype("int64"),
    })
    base = str(tmp_path / "vt_side")
    create_versioned(rd.from_pandas(df), base, "k", num_ranges=8,
                     stat_cols=["k"], bloom_cols=["subj"])
    parts = glob.glob(os.path.join(base, "parts", "*.parquet"))
    sides = glob.glob(os.path.join(base, "parts", "_zmap-*.json"))
    assert len(sides) == len(parts) > 1

    probe = read_versioned_eq(base, "subj", "e03").to_pandas()
    want = df[df["subj"] == "e03"]
    assert _fp(probe) == _fp(want)
    # pruning really engages: subj is clustered with k, so most parts'
    # Blooms reject e03
    opened = read_versioned_eq(base, "subj", "e03")
    assert len(probe) == 100

    # a merge keeps writing sidecars (config persisted in the manifest)
    ch = pd.DataFrame({"k": [5000], "subj": ["zz"], "v": [1],
                       "_op": ["upsert"]})
    _merge(base, ch)
    m2 = load_manifest(base)
    assert m2["bloom_cols"] == ["subj"]
    new_parts = [os.path.join(base, "parts", f)
                 for f in m2["ranges"].values()]
    from ontology_matcher_ray.sources.layout import _zmap_path
    assert all(os.path.exists(_zmap_path(p)) for p in new_parts)
    got2 = read_versioned_eq(base, "subj", "zz").to_pandas()
    assert list(got2["k"]) == [5000]
    # time travel probe: v1 has no zz
    assert read_versioned_eq(base, "subj", "zz", version=1).count() == 0

    # vacuum removes orphaned sidecars together with their parts
    _merge(base, pd.DataFrame({"k": [5000], "subj": ["zz"], "v": [2],
                               "_op": ["upsert"]}))
    vacuum_versions(base, keep_last=1)
    parts_after = set(glob.glob(os.path.join(base, "parts", "*.parquet")))
    for sc in glob.glob(os.path.join(base, "parts", "_zmap-*.json")):
        from ontology_matcher_ray.sources.layout import _part_of_zmap
        assert _part_of_zmap(sc) in parts_after


def test_point_probe_skips_most_parts(tmp_path):
    """Observable pruning: count parts the probe would open via the
    same sidecar logic and assert real skipping on clustered data."""
    import json as _json

    from ontology_matcher_ray.sources.layout import _bloom_maybe_contains

    df = pd.DataFrame({
        "k": np.arange(0, 1600, dtype="int64"),
        "subj": [f"e{i // 200}" for i in range(1600)],
    })
    base = str(tmp_path / "vt_prune")
    create_versioned(rd.from_pandas(df), base, "k", num_ranges=8,
                     bloom_cols=["subj"])
    sides = sorted(glob.glob(os.path.join(base, "parts", "_zmap-*.json")))
    kept = 0
    for sc in sides:
        meta = _json.load(open(sc))
        if _bloom_maybe_contains(meta["blooms"]["subj"], "e2"):
            kept += 1
    assert kept < len(sides) / 2          # most parts skipped


def test_recut_rebalances_and_preserves_history(table):
    """Skewed inserts funnel into one range; recut_versioned commits a
    rebalanced version with identical data, working sidecar config and
    intact time travel."""
    from ontology_matcher_ray.sources.versioned import recut_versioned

    base, df = table
    # all new keys land past the v1 max -> ONE range absorbs everything
    ins = pd.DataFrame({
        "k": np.arange(10_000, 14_000, dtype="int64"),
        "v": np.arange(4000, dtype="int64"),
        "_op": ["upsert"] * 4000,
    })
    _merge(base, ins)
    head_before = read_versioned(base).to_pandas()
    m2 = load_manifest(base)
    sizes_before = [
        len(pd.read_parquet(os.path.join(base, "parts", f)))
        for f in m2["ranges"].values()]
    assert max(sizes_before) >= 4000          # the hot range

    stats = recut_versioned(base, num_ranges=8)
    m3 = load_manifest(base)
    assert m3["op"] == "recut" and m3["version"] == m2["version"] + 1
    assert m3["cuts"] != m2["cuts"]           # fresh cuts, not the frozen v1
    # identical data, rebalanced bins
    pd.testing.assert_frame_equal(
        read_versioned(base).to_pandas().sort_values(
            "k", ignore_index=True),
        head_before.sort_values("k", ignore_index=True))
    assert int(stats["rows"].sum()) == len(head_before)
    assert stats["rows"].max() < max(sizes_before)
    # history intact: v1 and v2 still reproduce their snapshots
    assert len(read_versioned(base, version=1).to_pandas()) == len(df)
    assert len(read_versioned(base, version=2).to_pandas()) == len(
        head_before)
    # a merge AFTER the recut routes through the new cuts
    _merge(base, pd.DataFrame({"k": [13_999], "v": [-1],
                               "_op": ["upsert"]}))
    got = read_versioned(base).to_pandas()
    assert int(got.loc[got["k"] == 13_999, "v"].iloc[0]) == -1


def test_schema_evolution_merge(table):
    """ADD COLUMN via allow_new_columns: upserts carrying a new int64
    column rewrite only their ranges; old rows read the column as TYPED
    nulls (int64, not NaN-float); untouched parts keep their old
    schema on disk; time travel is unaffected; strict mode refuses."""
    import pyarrow.parquet as pq

    from ontology_matcher_ray.sources.versioned import read_versioned_eq

    base, df = table
    ch = pd.DataFrame({"k": [10, 600], "v": [-1, -2],
                       "w": np.array([70, 71], dtype="int64"),
                       "_op": ["upsert", "upsert"]})
    # strict default: loud refusal
    with pytest.raises(FormatError, match="allow_new_columns"):
        _merge(base, ch)
    stats = _merge(base, ch, allow_new_columns=True)
    assert int(stats["upserts"].sum()) == 2

    # the UNIFIED Arrow schema keeps w an int64 (typed nulls on old
    # rows — never a float upcast in storage; pandas materializes the
    # nulls as NaN at ITS boundary, which is pandas semantics, not ours)
    import pyarrow as pa
    sch = read_versioned(base).schema()
    assert dict(zip(sch.names, sch.types))["w"] == pa.int64()
    head = read_versioned(base).to_pandas()
    got = head.set_index("k")
    assert int(got.loc[10, "w"]) == 70 and int(got.loc[600, "w"]) == 71
    # old rows: typed null, NOT 0.0/NaN-float
    assert pd.isna(got.loc[11, "w"])
    assert len(head) == len(df) + 1          # 600 is an insert

    # untouched parts were not rewritten: some still lack 'w' on disk
    m = load_manifest(base)
    schemas = [set(pq.read_schema(os.path.join(base, "parts", f)).names)
               for f in m["ranges"].values()]
    assert any("w" not in s for s in schemas)
    assert any("w" in s for s in schemas)

    # time travel to v1: no 'w'
    assert "w" not in read_versioned(base, version=1).to_pandas().columns

    # point probe on the key still prunes + matches across mixed parts
    probe = read_versioned_eq(base, "k", 600).to_pandas()
    assert len(probe) == 1 and int(probe["w"].iloc[0]) == 71
    probe_old = read_versioned_eq(base, "k", 123).to_pandas()
    assert len(probe_old) == 1 and pd.isna(probe_old["w"].iloc[0])


def test_versioned_random_evolving_changesets_match_model(tmp_path):
    """The randomized-model audit WITH schema evolution: a new column
    arrives mid-history and later changesets keep writing it; the head
    tracks the pandas model (NaN where the model has no value) at every
    step and every retained version reproduces its snapshot."""
    rng = np.random.default_rng(11)
    model = pd.DataFrame({
        "k": np.arange(0, 200, dtype="int64"),
        "v": rng.integers(0, 1000, 200).astype("int64"),
    })
    base = str(tmp_path / "vt_ev")
    create_versioned(rd.from_pandas(model), base, "k", num_ranges=4)
    snapshots = {1: model.copy()}
    for step in range(6):
        n = int(rng.integers(1, 20))
        keys = rng.choice(np.arange(-10, 260), size=n, replace=False)
        changes = pd.DataFrame({
            "k": keys.astype("int64"),
            "v": rng.integers(0, 10_000, n).astype("int64"),
            "_op": rng.choice(["upsert", "delete"], size=n)})
        if step >= 2:                       # the column arrives at step 2
            changes["w"] = rng.integers(0, 99, n).astype("int64")
            changes = changes[["k", "v", "w", "_op"]]
        merge_versioned(base, rd.from_pandas(changes),
                        allow_new_columns=True)
        ups = changes[changes._op == "upsert"].drop(columns=["_op"])
        dels = set(changes.loc[changes._op == "delete", "k"])
        model = model[~model.k.isin(dels) & ~model.k.isin(set(ups.k))]
        model = pd.concat([model, ups], ignore_index=True)
        snapshots[step + 2] = model.copy()
        got = read_versioned(base).to_pandas()
        assert _fp_nan(got) == _fp_nan(model), step
    for v, snap in snapshots.items():
        assert _fp_nan(read_versioned(base, version=v).to_pandas()) \
            == _fp_nan(snap), v


def _fp_nan(df: pd.DataFrame) -> str:
    """_fp with NaN/NA normalized (the model's float-NaN vs the evolved
    read's typed-null both stringify to one token)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            # integral floats print like the int64 they model
            df[c] = s.map(lambda x: "<NA>" if pd.isna(x)
                          else str(int(x)) if float(x).is_integer()
                          else str(x))
        else:
            df[c] = s.map(lambda x: "<NA>" if pd.isna(x) else str(x))
    rows = sorted(df.apply("|".join, axis=1).tolist())
    import hashlib as _h
    return _h.sha256("\n".join(rows).encode()).hexdigest()

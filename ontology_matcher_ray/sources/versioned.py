"""Versioned (MVCC) range-partitioned tables: snapshot-isolated merges,
time travel, optimistic-concurrency commits, version vacuum.

``layout.merge_into_range_partitioned`` rewrites ranges IN PLACE — a
reader scanning while a merge lands can see half old / half new state.
At 100 TB with many concurrent consumers that is not acceptable; the
lakehouse answer (Iceberg/Delta) is copy-on-write + a manifest commit:

* Parts are IMMUTABLE: range ``r`` at version ``v`` lives in
  ``parts/r{r:05d}-v{v:06d}.parquet`` and is never modified.
* A version is a MANIFEST ``_versions/v{v:06d}.json`` mapping range_id
  -> part filename.  Untouched ranges keep pointing at the SAME part
  file across versions — a merge copies only what it changes.
* The manifest commit is the transaction point, published with
  ``os.link`` (create-exclusive): two concurrent merges racing to the
  same next version — both built against the same parent snapshot —
  cannot both win; the loser gets ``CommitConflict`` and retries on the
  new head.  Readers never block and never see a torn state: they pin
  one manifest and read exactly its parts.
* ``read_versioned(dir, version=k)`` is time travel: any retained
  version remains exactly reproducible (the audit/debug story: "what
  did the KG look like before Tuesday's merge?").
* ``vacuum_versions`` retires old manifests and deletes parts no
  retained manifest references.

Routing, cut persistence, and the per-range upsert/delete semantics are
shared with the in-place ``layout.merge_into_range_partitioned`` (the
key is the primary key; a changeset is a set of final row states).
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

import numpy as np
import pandas as pd
import ray.data as rd

from ontology_matcher_ray.sources.io import (
    FormatError,
    _load_or_sample_cuts,
    _sample_cuts,
    read_parquet_clean,
)

_VDIR = "_versions"
_PARTS = "parts"


class CommitConflict(Exception):
    """Another writer committed this version first — reload the head
    snapshot and re-apply the changeset."""


def _manifest_path(base: str, version: int) -> str:
    return os.path.join(base, _VDIR, f"v{version:06d}.json")


def _part_name(rid: int, version: int, token: str) -> str:
    """Immutable part name.  ``token`` is one random hex per WRITE
    ATTEMPT (create/merge call), captured by every task of that attempt:
    a task RETRY inside the attempt overwrites its own part, while two
    concurrent writers racing to the same version number can never
    clobber each other's parts — the commit decides the winner and the
    loser's orphan parts are swept by ``vacuum_versions``."""
    return f"r{rid:05d}-v{version:06d}-{token}.parquet"


def list_versions(base: str) -> List[int]:
    files = glob.glob(os.path.join(base, _VDIR, "v*.json"))
    return sorted(int(os.path.basename(f)[1:-5]) for f in files)


def load_manifest(base: str, version: Optional[int] = None) -> dict:
    """The pinned snapshot: ``{"version", "parent", "key", "cuts",
    "ranges": {rid(str) -> part filename}, "op"}``."""
    versions = list_versions(base)
    if not versions:
        raise FormatError(f"{base} has no committed versions")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FormatError(
            f"version {version} not found under {base} "
            f"(have {versions[0]}..{versions[-1]}, possibly vacuumed)")
    with open(_manifest_path(base, version)) as f:
        return json.load(f)


def _commit(base: str, manifest: dict) -> None:
    """Create-exclusive manifest publish: the one atomic step.

    ``os.link`` fails with EEXIST when a concurrent writer already
    committed this version number — the optimistic-concurrency check.
    """
    os.makedirs(os.path.join(base, _VDIR), exist_ok=True)
    final = _manifest_path(base, manifest["version"])
    tmp = final + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {manifest['version']} was committed concurrently "
            f"under {base}; reload the head and re-apply") from None
    finally:
        os.unlink(tmp)


def _write_part_sidecar(path: str, g,
                        stat_cols: List[str],
                        bloom_cols: List[str]) -> None:
    """Lakehouse zone-map/Bloom sidecar for a committed part — the SAME
    ``_zmap-*.json`` format the layout scans read, so pruned point/range
    reads work identically over a versioned snapshot's parts.  ``g`` is
    a pandas frame or an Arrow table (the schema-evolution merge path
    stays Arrow end-to-end)."""
    import pyarrow as pa

    from ontology_matcher_ray.sources.layout import _write_zmap

    names = g.column_names if isinstance(g, pa.Table) else list(g.columns)
    cols = [c for c in dict.fromkeys(list(stat_cols) + list(bloom_cols))
            if c in names]
    if not cols:
        return
    tbl = (g.select(cols) if isinstance(g, pa.Table)
           else pa.Table.from_pandas(g[cols], preserve_index=False))
    _write_zmap(path, tbl,
                [c for c in stat_cols if c in names],
                [c for c in bloom_cols if c in names])


def _union_concat(frames: List[pd.DataFrame], key: str):
    """Concat pandas frames with DIFFERING columns under the Arrow
    unified schema (missing columns become TYPED nulls, widened types
    promote permissively), sorted by ``key``.  Returns a pa.Table."""
    import pyarrow as pa

    tbls = [pa.Table.from_pandas(f, preserve_index=False)
            for f in frames if len(f)]
    if not tbls:
        return pa.Table.from_pandas(frames[0].iloc[0:0],
                                    preserve_index=False)
    try:
        unified = pa.unify_schemas([t.schema for t in tbls],
                                   promote_options="permissive")
    except (pa.lib.ArrowException, TypeError) as e:
        raise FormatError(f"incompatible schema drift: {e}") from e
    cast = []
    for t in tbls:
        arrays = [t.column(f.name).cast(f.type)
                  if f.name in t.column_names
                  else pa.nulls(t.num_rows, type=f.type)
                  for f in unified]
        cast.append(pa.Table.from_arrays(arrays, schema=unified))
    return pa.concat_tables(cast).sort_by([(key, "ascending")])


def create_versioned(
    ds: rd.Dataset,
    base: str,
    key: str,
    num_ranges: int = 16,
    sample_per_block: int = 64,
    stat_cols: Optional[List[str]] = None,
    bloom_cols: Optional[List[str]] = None,
) -> pd.DataFrame:
    """Version 1 of a table: range-partition ``ds`` on ``key`` into
    immutable sorted parts and commit the first manifest.  Returns the
    per-range stats frame (range_id, rows).

    ``stat_cols`` (default: the key) get per-part min/max zone maps and
    ``bloom_cols`` per-part Bloom sidecars — written next to every part
    this and every future merge commits (the config persists in the
    manifest), so ``read_versioned_eq`` point probes skip parts without
    opening them."""
    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    import uuid

    if list_versions(base):
        raise FormatError(f"{base} already has committed versions")
    stat_cols = [key] if stat_cols is None else list(stat_cols)
    bloom_cols = list(bloom_cols or [])
    os.makedirs(os.path.join(base, _PARTS), exist_ok=True)
    token = uuid.uuid4().hex[:8]
    cuts = _load_or_sample_cuts(ds, base, key, num_ranges, sample_per_block)
    cuts_arr = np.asarray(cuts) if cuts else np.asarray([], dtype=object)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[PARTITION_COL] = (
            np.searchsorted(cuts_arr, b[key].to_numpy(), side="right")
            .astype("int64") if len(cuts_arr)
            else np.zeros(len(b), dtype=np.int64))
        return b

    _EMPTY = pd.DataFrame({"range_id": pd.Series(dtype="int64"),
                           "rows": pd.Series(dtype="int64")})

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY.copy()
        rid = (int(np.searchsorted(cuts_arr, g[key].iloc[0], side="right"))
               if len(cuts_arr) else 0)
        g = g.sort_values(key, kind="mergesort", ignore_index=True)
        path = os.path.join(base, _PARTS, _part_name(rid, 1, token))
        tmp = path + f".tmp{os.getpid()}"
        g.to_parquet(tmp, index=False)
        os.replace(tmp, path)      # deterministic name: retry overwrites
        _write_part_sidecar(path, g, stat_cols, bloom_cols)
        return pd.DataFrame({"range_id": [rid], "rows": [len(g)]})

    keyed = ds.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(
        keyed, write_range, [key]).to_pandas()
    if len(stats):
        stats = stats.astype({"range_id": "int64", "rows": "int64"})
    else:
        stats = _EMPTY.copy()
    _commit(base, {
        "version": 1, "parent": None, "op": "create", "key": key,
        "cuts": list(cuts),
        "stat_cols": stat_cols, "bloom_cols": bloom_cols,
        "ranges": {str(int(r)): _part_name(int(r), 1, token)
                   for r in stats["range_id"]},
    })
    return stats.sort_values("range_id", ignore_index=True)


def _part_schemas_differ(files: List[str]) -> bool:
    """O(files) footer-metadata check — no data read."""
    import pyarrow.parquet as pq

    first = pq.read_schema(files[0]).remove_metadata()
    return any(pq.read_schema(f).remove_metadata() != first
               for f in files[1:])


def read_versioned(
    base: str,
    version: Optional[int] = None,
    columns: Optional[List[str]] = None,
) -> rd.Dataset:
    """Scan one pinned snapshot (default: head).  Reads exactly the
    manifest's parts — a merge landing mid-scan is invisible.  Parts
    whose schemas drifted (``merge_versioned(allow_new_columns=True)``)
    read under the unified schema, old parts padded with typed nulls."""
    m = load_manifest(base, version)
    files = sorted(os.path.join(base, _PARTS, f)
                   for f in m["ranges"].values())
    if not files:
        raise FormatError(
            f"version {m['version']} of {base} is empty")
    if _part_schemas_differ(files):
        from ontology_matcher_ray.sources.layout import read_evolved_files

        return read_evolved_files(files, columns)
    return read_parquet_clean(files, columns=columns)


def read_versioned_eq(
    base: str,
    col: str,
    value,
    version: Optional[int] = None,
    columns: Optional[List[str]] = None,
) -> rd.Dataset:
    """Point probe ``col == value`` over one pinned snapshot with
    zone-map/Bloom part skipping — identical rows to filtering
    ``read_versioned`` (Bloom false positives fall to the exact
    filter), but only the parts that can contain the value are opened.
    Parts without a sidecar (or whose sidecar lacks ``col``) are
    conservatively kept."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ontology_matcher_ray.sources.layout import (
        _bloom_maybe_contains,
        _zmap_path,
    )

    m = load_manifest(base, version)
    files = sorted(os.path.join(base, _PARTS, f)
                   for f in m["ranges"].values())
    if not files:
        raise FormatError(f"version {m['version']} of {base} is empty")
    kept = []
    for p in files:
        sc = _zmap_path(p)
        if not os.path.exists(sc):
            kept.append(p)
            continue
        with open(sc) as f:
            meta = json.load(f)
        st = meta["stats"].get(col)
        bloom = meta.get("blooms", {}).get(col)
        if st is not None:
            if st["min"] is None:
                continue                       # all-null part
            if value < st["min"] or value > st["max"]:
                continue
        if bloom is not None and not _bloom_maybe_contains(bloom, value):
            continue
        kept.append(p)
    if not kept:
        schema = pa.unify_schemas(
            [pq.read_schema(f).remove_metadata() for f in files],
            promote_options="permissive")
        want = list(columns) if columns is not None else schema.names
        return rd.from_arrow(schema.empty_table().select(want))
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + [col]))

    def exact(tbl: pa.Table) -> pa.Table:
        keep = pc.equal(tbl.column(col), pa.scalar(value))
        out = tbl.filter(pc.fill_null(keep, False))
        if columns is not None:
            out = out.select(columns)
        return out

    # drift check over the FULL snapshot, not only kept parts: a probe
    # whose kept parts all predate an added column must still present
    # the snapshot's unified schema (typed nulls)
    if _part_schemas_differ(files):
        from ontology_matcher_ray.sources.layout import read_evolved_files

        ds = read_evolved_files(kept, columns=read_cols,
                                schema_files=files)
    else:
        ds = read_parquet_clean(kept, columns=read_cols)
    return ds.map_batches(exact, batch_format="pyarrow")


def merge_versioned(
    base: str,
    changes: rd.Dataset,
    op_col: str = "_op",
    expected_head: Optional[int] = None,
    allow_new_columns: bool = False,
) -> pd.DataFrame:
    """Copy-on-write MERGE: apply an upsert/delete changeset against the
    head snapshot, writing NEW parts for touched ranges only, then
    commit head+1.  ``expected_head`` (when given) fails fast if the
    head moved since the caller read it; either way the create-exclusive
    commit guarantees a racing writer cannot silently clobber.

    ``allow_new_columns=True`` is the lakehouse ADD COLUMN: changeset
    columns absent from the current part are added, existing rows
    reading the new column as TYPED nulls (the rewrite pads through
    Arrow ``unify_schemas`` — an int64 column stays int64, never a
    NaN-float upcast).  Untouched ranges are NOT rewritten; readers see
    the unified schema via the evolved snapshot read.  Default False:
    a drifted changeset is a loud ``FormatError``, not silent schema
    creep.

    Returns per-range stats ``(range_id, rows_before, upserts, deletes,
    rows_after)`` — rows_after = 0 means the range emptied and left the
    manifest.
    """
    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    import uuid

    head = load_manifest(base)
    token = uuid.uuid4().hex[:8]
    if expected_head is not None and head["version"] != expected_head:
        raise CommitConflict(
            f"head is v{head['version']}, expected v{expected_head}")
    key, cuts = head["key"], head["cuts"]
    stat_cols = head.get("stat_cols", [key])
    bloom_cols = head.get("bloom_cols", [])
    target = head["version"] + 1
    cuts_arr = np.asarray(cuts) if cuts else np.asarray([], dtype=object)
    ranges = dict(head["ranges"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        ops = b[op_col]
        bad = ~ops.isin(["upsert", "delete"])
        if bad.any():
            raise FormatError(
                f"unknown {op_col} value {ops[bad].iloc[0]!r}")
        b = b.copy()
        b[PARTITION_COL] = (
            np.searchsorted(cuts_arr, b[key].to_numpy(), side="right")
            .astype("int64") if len(cuts_arr)
            else np.zeros(len(b), dtype=np.int64))
        return b

    _EMPTY = pd.DataFrame({
        "range_id": pd.Series(dtype="int64"),
        "rows_before": pd.Series(dtype="int64"),
        "upserts": pd.Series(dtype="int64"),
        "deletes": pd.Series(dtype="int64"),
        "rows_after": pd.Series(dtype="int64"),
    })

    def apply_range(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY.copy()
        if g[key].duplicated().any():
            dup = g[key][g[key].duplicated()].iloc[0]
            raise FormatError(
                f"changeset has duplicate key {dup!r} — a changeset is "
                "a set of final row states; compact it first")
        rid = (int(np.searchsorted(cuts_arr, g[key].iloc[0], side="right"))
               if len(cuts_arr) else 0)
        cur_name = ranges.get(str(rid))
        if cur_name is not None:
            cur = pd.read_parquet(os.path.join(base, _PARTS, cur_name))
        else:
            cur = g.drop(columns=[op_col]).iloc[0:0]
        ups = g[g[op_col] == "upsert"].drop(columns=[op_col])
        dels = set(g.loc[g[op_col] == "delete", key])
        before = len(cur)
        keep = cur[~cur[key].isin(dels) & ~cur[key].isin(set(ups[key]))]
        new_cols = [c for c in ups.columns if c not in cur.columns]
        if new_cols and not allow_new_columns:
            raise FormatError(
                f"changeset adds columns {new_cols} not in the table — "
                "pass allow_new_columns=True for schema evolution")
        if new_cols or any(c not in ups.columns for c in cur.columns):
            # schema drift: union through Arrow and KEEP the result an
            # Arrow table end-to-end — to_pandas would upcast an
            # int64-with-nulls new column to float64
            new = _union_concat([keep, ups], key)
            n_after = new.num_rows
        else:
            new = (pd.concat([keep, ups], ignore_index=True)
                   .sort_values(key, kind="mergesort",
                                ignore_index=True))
            n_after = len(new)
        if n_after:
            import pyarrow as pa
            import pyarrow.parquet as pq

            path = os.path.join(
                base, _PARTS, _part_name(rid, target, token))
            tmp = path + f".tmp{os.getpid()}"
            if isinstance(new, pa.Table):
                pq.write_table(new, tmp)
            else:
                new.to_parquet(tmp, index=False)
            os.replace(tmp, path)   # immutable target name: retry-safe
            _write_part_sidecar(path, new, stat_cols, bloom_cols)
        return pd.DataFrame({
            "range_id": [rid], "rows_before": [before],
            "upserts": [len(ups)], "deletes": [int(len(g) - len(ups))],
            "rows_after": [n_after],
        })

    keyed = changes.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(
        keyed, apply_range, [key]).to_pandas()
    if not len(stats):
        return _EMPTY.copy()
    stats = stats.astype({c: "int64" for c in stats.columns})
    for _, row in stats.iterrows():     # bounded: one row per TOUCHED range
        rid = int(row["range_id"])
        if int(row["rows_after"]) > 0:
            ranges[str(rid)] = _part_name(rid, target, token)
        else:
            ranges.pop(str(rid), None)
    _commit(base, {
        "version": target, "parent": head["version"], "op": "merge",
        "key": key, "cuts": cuts,
        "stat_cols": stat_cols, "bloom_cols": bloom_cols,
        "ranges": ranges,
    })
    return stats.sort_values("range_id", ignore_index=True)


def recut_versioned(
    base: str,
    num_ranges: int = 16,
    sample_per_block: int = 64,
) -> pd.DataFrame:
    """Rebalancing compaction: commit head+1 whose parts are freshly
    range-partitioned on NEW cut points sampled from the CURRENT head.

    Why: ``create_versioned`` freezes the cuts at v1; a long run of
    skewed inserts (e.g. a KG growing into one id prefix) then funnels
    every merge into a few ranges — those parts grow without bound and
    each touching merge rewrites the whole hot part.  A periodic recut
    is the lakehouse ``OPTIMIZE``/compaction step for this table shape:
    data identical (same rows, re-binned), history intact (old versions
    keep their manifests/parts until ``vacuum_versions``), readers
    never blocked (same create-exclusive commit as a merge).

    Returns the new per-range stats frame (range_id, rows).
    """
    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    import uuid

    head = load_manifest(base)
    key = head["key"]
    stat_cols = head.get("stat_cols", [key])
    bloom_cols = head.get("bloom_cols", [])
    target = head["version"] + 1
    token = uuid.uuid4().hex[:8]
    ds = read_versioned(base)
    # fresh cuts from the live distribution (NOT the persisted v1 cuts:
    # bypass the _load_or_sample_cuts cache by sampling directly)
    cuts = _sample_cuts(ds, key, num_ranges, sample_per_block)
    cuts_arr = np.asarray(cuts) if cuts else np.asarray([], dtype=object)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[PARTITION_COL] = (
            np.searchsorted(cuts_arr, b[key].to_numpy(), side="right")
            .astype("int64") if len(cuts_arr)
            else np.zeros(len(b), dtype=np.int64))
        return b

    _EMPTY = pd.DataFrame({"range_id": pd.Series(dtype="int64"),
                           "rows": pd.Series(dtype="int64")})

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY.copy()
        rid = (int(np.searchsorted(cuts_arr, g[key].iloc[0], side="right"))
               if len(cuts_arr) else 0)
        g = g.sort_values(key, kind="mergesort", ignore_index=True)
        path = os.path.join(base, _PARTS, _part_name(rid, target, token))
        tmp = path + f".tmp{os.getpid()}"
        g.to_parquet(tmp, index=False)
        os.replace(tmp, path)
        _write_part_sidecar(path, g, stat_cols, bloom_cols)
        return pd.DataFrame({"range_id": [rid], "rows": [len(g)]})

    keyed = ds.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(
        keyed, write_range, [key]).to_pandas()
    if len(stats):
        stats = stats.astype({"range_id": "int64", "rows": "int64"})
    else:
        stats = _EMPTY.copy()
    _commit(base, {
        "version": target, "parent": head["version"], "op": "recut",
        "key": key, "cuts": list(cuts),
        "stat_cols": stat_cols, "bloom_cols": bloom_cols,
        "ranges": {str(int(r)): _part_name(int(r), target, token)
                   for r in stats["range_id"]},
    })
    return stats.sort_values("range_id", ignore_index=True)


def vacuum_versions(base: str, keep_last: int = 2) -> dict:
    """Retire manifests older than the newest ``keep_last`` and delete
    parts no retained manifest references.  Readers pinned to a retained
    version keep working; time travel beyond it is gone (that is the
    retention trade every lakehouse makes).  Returns
    ``{"versions_dropped": n, "parts_deleted": n}``."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(base)
    drop = versions[:-keep_last]
    kept = versions[-keep_last:]
    referenced = set()
    for v in kept:
        referenced.update(load_manifest(base, v)["ranges"].values())
    n_parts = 0
    for p in glob.glob(os.path.join(base, _PARTS, "*.parquet")):
        if os.path.basename(p) not in referenced:
            os.remove(p)
            n_parts += 1
            from ontology_matcher_ray.sources.layout import _zmap_path

            sc = _zmap_path(p)
            if os.path.exists(sc):       # orphaned sidecar goes with it
                os.remove(sc)
    for v in drop:
        os.remove(_manifest_path(base, v))
    return {"versions_dropped": len(drop), "parts_deleted": n_parts}

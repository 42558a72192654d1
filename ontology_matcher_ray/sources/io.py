"""Sources/sinks with the reference's file semantics (SURVEY.md §2.1).

S1 reader: delimiter inferred from extension (',' for .csv else tab), all
cells strings, rows with null ``id`` dropped, remaining nulls -> ''
(``ontology_formatter.py:528-542``).  S2/S3 writers: formatted TSV +
``.failed.tsv`` secondary sink (``ontology_formatter.py:792-813``), plus
Parquet variants for engine-scale outputs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data as rd

from ontology_matcher_ray.schemas import ALL_ENTITY_COLUMNS, REQUIRED_COLUMNS


class FormatError(Exception):
    pass


def read_parquet_clean(paths, columns: Optional[List[str]] = None, **kwargs) -> rd.Dataset:
    """``read_parquet`` with a metadata-free schema.

    Pandas-written parquet carries a ``pandas`` schema-metadata dict that
    makes ``hash(schema)`` raise, defeating Ray's block-schema dedup and
    spamming "Failed to hash the schemas" warnings on every task.  Passing
    an explicit metadata-stripped schema (projected to ``columns`` when
    given) removes the metadata at the source.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(first):
        inside = sorted(_glob.glob(os.path.join(first, "*.parquet")))
        if inside:
            first = inside[0]
    full = pq.read_schema(first)
    if columns is not None:
        schema = pa.schema([full.field(c) for c in columns])
    else:
        schema = full.remove_metadata()
    return rd.read_parquet(paths, schema=schema, columns=columns, **kwargs)


def check_entity_columns(columns: List[str]) -> None:
    """Eager schema validation (``_check_format``,
    ontology_formatter.py:570-587): raise listing the missing required
    columns."""
    missed = [c for c in REQUIRED_COLUMNS if c not in columns]
    if missed:
        raise FormatError(
            "The file format is not correct, missed columns: %s" % ", ".join(missed)
        )


def read_entity_file(path: str) -> rd.Dataset:
    """S1: read a reference-format entity TSV/CSV into a Dataset.

    All-string columns, null-id rows dropped, other nulls -> ''.  Small
    control files read eagerly via pandas then distributed; entity inputs
    in the reference are <10^6 rows (README.md:96-111), so this is not the
    100 TB path (that is ``read_parquet`` on the corpus).
    """
    ext = Path(path).suffix.lstrip(".")
    delim = "," if ext == "csv" else "\t"
    df = pd.read_csv(path, delimiter=delim, dtype=str)
    check_entity_columns(df.columns.tolist())
    df = df[df["id"].notna()].fillna("")
    return rd.from_pandas(df)


def write_formatted_tsv(
    formatted: pd.DataFrame,
    failed: Optional[pd.DataFrame],
    out_path: str,
) -> None:
    """S2+S3: main TSV + ``.failed.tsv``; parent dirs created; raises when
    the formatted frame is empty (ontology_formatter.py:799-813)."""
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    if formatted is None or len(formatted) == 0:
        raise FormatError(
            "Cannot find the valid formatted data, maybe the format method is "
            "not called or the formatted data is empty."
        )
    formatted.to_csv(out, sep="\t", index=False)
    if failed is not None and len(failed) > 0:
        failed.to_csv(out.with_suffix(".failed.tsv"), sep="\t", index=False)


def write_dataset_parquet(ds: rd.Dataset, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)


# ---------------------------------------------------------------------------
# N-Triples sink/source — the standard line-based KG exchange format.
# Deterministic mapping: subj/pred are always IRIs under urn:graft:;
# obj becomes an IRI when it is CURIE-shaped (prefix:local, e.g.
# "MONDO:0005148", "doc:17"), otherwise a quoted literal (lang tags,
# source names, free text).  IRI content is percent-encoded for the
# characters that would break the <...> framing or the line format
# (% > < space TAB CR LF); literal content uses backslash escapes with a
# SINGLE-PASS regex unescape on read (sequential replaces corrupt
# backslash-adjacent inputs, e.g. a literal backslash followed by "t").
# The reader inverts the mapping exactly — write -> read round-trips
# bit-for-bit for ARBITRARY strings (property-tested), and the
# kg_triples_nt query runs the round trip under the kg_triples oracle.
# ---------------------------------------------------------------------------

_NT_URN = "urn:graft:"
_CURIE_OBJ_RE = r"^[A-Za-z][A-Za-z0-9_.]*:[A-Za-z0-9_.:-]+$"

# order matters: encode % first / decode it last
_IRI_ENC = [("%", "%25"), (">", "%3E"), ("<", "%3C"), (" ", "%20"),
            ("\t", "%09"), ("\r", "%0D"), ("\n", "%0A")]
_LIT_UNESCAPE_RE = None  # compiled lazily (module import stays light)


def _nt_iri_encode(s: pd.Series) -> pd.Series:
    for raw, enc in _IRI_ENC:
        s = s.str.replace(raw, enc, regex=False)
    return s


def _nt_iri_decode(s: pd.Series) -> pd.Series:
    for raw, enc in reversed(_IRI_ENC):
        s = s.str.replace(enc, raw, regex=False)
    return s


def _nt_lit_escape(s: pd.Series) -> pd.Series:
    """N-Triples literal escaping (backslash first, then quote/newlines)."""
    return (
        s.str.replace("\\", "\\\\", regex=False)
        .str.replace('"', '\\"', regex=False)
        .str.replace("\n", "\\n", regex=False)
        .str.replace("\r", "\\r", regex=False)
        .str.replace("\t", "\\t", regex=False)
    )


def _nt_lit_unescape(s: pd.Series) -> pd.Series:
    """Single-pass inverse of ``_nt_lit_escape``: each backslash consumes
    exactly the next character, so escaped backslashes can never be
    re-consumed by a later replacement pass."""
    import re

    global _LIT_UNESCAPE_RE
    if _LIT_UNESCAPE_RE is None:
        _LIT_UNESCAPE_RE = re.compile(r"\\(.)")
    m = {"n": "\n", "r": "\r", "t": "\t"}
    return s.str.replace(
        _LIT_UNESCAPE_RE, lambda mo: m.get(mo.group(1), mo.group(1)), regex=True
    )


def triples_to_nt_lines(b: pd.DataFrame) -> pd.DataFrame:
    """(subj, pred, obj) batch -> one N-Triples line per row (vectorized)."""
    subj = "<" + _NT_URN + _nt_iri_encode(b["subj"].astype(str)) + ">"
    pred = "<" + _NT_URN + _nt_iri_encode(b["pred"].astype(str)) + ">"
    obj_s = b["obj"].astype(str)
    is_iri = obj_s.str.match(_CURIE_OBJ_RE)
    obj = ("<" + _NT_URN + _nt_iri_encode(obj_s) + ">").where(
        is_iri, '"' + _nt_lit_escape(obj_s) + '"'
    )
    return pd.DataFrame({"line": subj + " " + pred + " " + obj + " ."})


def nt_lines_to_triples(b: pd.DataFrame) -> pd.DataFrame:
    """Inverse of ``triples_to_nt_lines`` (vectorized regex extract).
    Raises on any line that does not parse — silent NaN rows would
    corrupt downstream joins."""
    pat = (
        r"^<" + _NT_URN + r"(?P<subj>[^>]*)> <" + _NT_URN
        + r"(?P<pred>[^>]*)> (?:<" + _NT_URN
        + r"(?P<obj_iri>[^>]*)>|\"(?P<obj_lit>.*)\") \.$"
    )
    m = b["text"].str.extract(pat)
    bad = m["subj"].isna()
    if bad.any():
        raise ValueError(
            f"unparseable N-Triples line: {b['text'][bad].iloc[0]!r}"
        )
    is_lit = m["obj_iri"].isna()
    obj = _nt_iri_decode(m["obj_iri"].fillna("")).where(
        ~is_lit, _nt_lit_unescape(m["obj_lit"].fillna(""))
    )
    return pd.DataFrame(
        {
            "subj": _nt_iri_decode(m["subj"]),
            "pred": _nt_iri_decode(m["pred"]),
            "obj": obj,
        }
    )


from ray.data import Datasink as _Datasink


class _NTriplesDatasink(_Datasink):
    """Ray Datasink writing one ``part-{task_idx:06d}.nt`` file per write
    task.  DETERMINISTIC per-task names + tmp-then-rename make a retried
    or lineage-reconstructed task OVERWRITE its own part instead of
    adding a duplicate (the Ray-native datasink convention) — the prior
    content-hash+uuid naming duplicated rows under per-task retries."""

    def __init__(self, out_dir: str):
        self._out_dir = out_dir

    def write(self, blocks, ctx) -> int:
        from ray.data.block import BlockAccessor

        frames = [BlockAccessor.for_block(b).to_pandas() for b in blocks]
        parts = [triples_to_nt_lines(f)["line"] for f in frames if len(f)]
        lines: List[str] = []
        for p in parts:
            lines.extend(p.tolist())
        payload = ("\n".join(lines) + "\n").encode() if lines else b""
        path = os.path.join(self._out_dir, f"part-{ctx.task_idx:06d}.nt")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return len(lines)


def write_ntriples(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed .nt sink into an EMPTY directory via Ray's Datasink
    API: one part per write task, named deterministically by
    ``TaskContext.task_idx`` so task retries overwrite rather than
    duplicate (see ``_NTriplesDatasink``).  Writes are tmp+rename; the
    reader globs ``*.nt`` so a crash-leftover tmp is never parsed."""
    os.makedirs(out_dir, exist_ok=True)
    if any(f.endswith(".nt") for f in os.listdir(out_dir)):
        raise ValueError(f"write_ntriples: {out_dir} already contains .nt parts")
    ds.write_datasink(_NTriplesDatasink(out_dir))


def read_ntriples(out_dir: str) -> rd.Dataset:
    """Distributed .nt source: read_text over the ``*.nt`` part files
    only (leftover ``.tmp`` files from a crashed writer are ignored),
    vectorized line parse back to (subj, pred, obj)."""
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, "*.nt")))
    if not parts:
        raise FileNotFoundError(f"no .nt part files under {out_dir}")
    ds = rd.read_text(parts)
    return ds.map_batches(nt_lines_to_triples, batch_format="pandas")


# stream-codec suffixes for compressed line-JSON parts; every part is
# independently decompressible, so reads stay one-file-per-task parallel
_JSONL_CODEC_EXT = {"gzip": "gz", "zstd": "zst", "lz4": "lz4", "brotli": "br"}


def _check_jsonl_codec(codec: str) -> str:
    import pyarrow as _pa

    if codec not in _JSONL_CODEC_EXT:
        raise ValueError(
            f"unsupported jsonl codec {codec!r}; one of {sorted(_JSONL_CODEC_EXT)}"
        )
    if not _pa.Codec.is_available(codec):
        raise ValueError(f"pyarrow was built without codec {codec!r}")
    return _JSONL_CODEC_EXT[codec]


def write_jsonl(ds: rd.Dataset, out_dir: str, codec: Optional[str] = None) -> None:
    """Distributed JSONL sink (Ray's native line-delimited JSON writer).

    ``codec`` ('gzip' / 'zstd' / 'lz4' / 'brotli') streams each part
    through the matching pyarrow compressor — real corpora ship as
    ``.jsonl.gz`` / ``.jsonl.zst``, and at 100 TB the 5-10x text
    compression is the difference between shipping bytes and shipping
    the object store.  Part names stay deterministic per write task
    (Ray's task-indexed naming), so retries overwrite, not duplicate."""
    os.makedirs(out_dir, exist_ok=True)
    if codec is None:
        ds.write_json(out_dir)
        return
    ext = _check_jsonl_codec(codec)
    from ray.data.datasource import FilenameProvider

    class _Named(FilenameProvider):
        def get_filename_for_block(self, block, write_uuid, task_index, block_index):
            return f"part-{task_index:06d}-{block_index:06d}.jsonl.{ext}"

    ds.write_json(
        out_dir,
        filename_provider=_Named(),
        arrow_open_stream_args={"compression": codec},
    )


def read_jsonl(
    out_dir: str,
    columns: Optional[List[str]] = None,
    codec: Optional[str] = None,
) -> rd.Dataset:
    """Distributed JSONL source; optional column projection after parse
    (JSON has no column pruning at the read — prefer Parquet for scans,
    this exists for interop with line-JSON corpora).  ``codec`` reads
    parts written by ``write_jsonl(..., codec=...)``: each compressed
    part decompresses independently inside its read task, so
    parallelism is unchanged (one file = one stream = one task)."""
    if codec is None:
        ds = rd.read_json(out_dir)
    else:
        ext = _check_jsonl_codec(codec)
        ds = rd.read_json(
            out_dir,
            arrow_open_stream_args={"compression": codec},
            file_extensions=[ext],
        )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


# ---------------------------------------------------------------------------
# Columnar interop: ORC and Arrow IPC (Feather v2) sinks/sources.  Both
# are real columnar formats a pipeline swap-in must read/write (ORC for
# Hive/Trino lakes, IPC for Arrow-native interchange); both ride the
# same deterministic part-per-task + tmp-then-rename retry contract as
# the N-Triples sink, and both READERS run one file per task so
# parallelism tracks the part count.
# ---------------------------------------------------------------------------


class _ArrowFileDatasink(_Datasink):
    """Generic one-part-per-task sink through a pyarrow table writer —
    deterministic ``part-{task_idx}`` names + tmp-then-rename, so a
    retried write task overwrites its own part instead of duplicating."""

    def __init__(self, out_dir: str, ext: str, writer):
        self._out_dir = out_dir
        self._ext = ext
        self._writer = writer

    def write(self, blocks, ctx) -> int:
        import pyarrow as pa
        from ray.data.block import BlockAccessor

        tables = [BlockAccessor.for_block(b).to_arrow() for b in blocks]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return 0
        tbl = pa.concat_tables(tables, promote_options="default")
        path = os.path.join(
            self._out_dir, f"part-{ctx.task_idx:06d}.{self._ext}"
        )
        tmp = path + f".tmp{os.getpid()}"
        self._writer(tbl, tmp)
        os.replace(tmp, path)
        return tbl.num_rows


def _write_parts(ds: rd.Dataset, out_dir: str, ext: str, writer) -> None:
    os.makedirs(out_dir, exist_ok=True)
    if any(f.endswith(f".{ext}") for f in os.listdir(out_dir)):
        raise ValueError(f"{out_dir} already contains .{ext} parts")
    ds.write_datasink(_ArrowFileDatasink(out_dir, ext, writer))


def _read_parts(out_dir: str, ext: str, reader,
                columns: Optional[List[str]] = None) -> rd.Dataset:
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, f"*.{ext}")))
    if not parts:
        raise FileNotFoundError(f"no .{ext} part files under {out_dir}")

    def load(b):
        import pyarrow as pa

        tbls = [reader(p, columns) for p in b["item"]]
        return tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)

    return rd.from_items(parts, override_num_blocks=len(parts)).map_batches(
        load, batch_format="pandas"
    )


def write_orc(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed ORC sink: one ``part-{task_idx}.orc`` per write task."""

    def writer(tbl, path):
        import pyarrow.orc as orc

        orc.write_table(tbl, path)

    _write_parts(ds, out_dir, "orc", writer)


def read_orc(out_dir: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    """Distributed ORC source (one file per read task); ``columns``
    prunes at the stripe read — real column projection, unlike JSONL."""

    def reader(path, cols):
        import pyarrow.orc as orc

        return orc.ORCFile(path).read(columns=cols)

    return _read_parts(out_dir, "orc", reader, columns)


def write_ipc(ds: rd.Dataset, out_dir: str,
              compression: Optional[str] = "zstd") -> None:
    """Distributed Arrow IPC (Feather v2) sink, zstd-compressed by
    default — the zero-parse Arrow-native interchange format."""

    def writer(tbl, path):
        import pyarrow.feather as feather

        feather.write_feather(tbl, path, compression=compression)

    _write_parts(ds, out_dir, "arrow", writer)


def read_ipc(out_dir: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    """Distributed Arrow IPC source (one file per read task) with
    column projection."""

    def reader(path, cols):
        import pyarrow.feather as feather

        return feather.read_table(path, columns=cols)

    return _read_parts(out_dir, "arrow", reader, columns)


# ---------------------------------------------------------------------------
# Range-partitioned sorted Parquet sink — the resumable-output layout a
# 100-TB job needs: one directory per key range (range=NNNN/), each
# internally SORTED by the key, cut points persisted so a rerun assigns
# identically, completed ranges committed by atomic rename and skipped
# (filtered out BEFORE the exchange) on resume.  The Spark-
# RangePartitioner recipe expressed over the engine's own exchange:
# one bounded sampling pass picks equi-depth cuts, one identity-
# partitioned exchange co-locates each range, a per-range kernel sorts
# and writes.  Never one giant file: num_ranges bounds per-file volume
# and a failed run re-does only its missing ranges.
# ---------------------------------------------------------------------------

_CUTS_FILE = "_cuts.json"


def _range_dir(out_dir: str, rid: int) -> str:
    return os.path.join(out_dir, f"range={rid:05d}")


def load_cuts(out_dir: str) -> dict:
    """The persisted partitioning contract of a range-partitioned
    directory: ``{"key": ..., "num_ranges": ..., "cuts": [...]}``."""
    import json

    cuts_path = os.path.join(out_dir, _CUTS_FILE)
    if not os.path.exists(cuts_path):
        raise FormatError(f"{out_dir} has no {_CUTS_FILE} — not a "
                          "range-partitioned directory")
    with open(cuts_path) as f:
        return json.load(f)


def _sample_cuts(ds: "rd.Dataset", key: str, num_ranges: int,
                 sample_per_block: int) -> list:
    """Equi-depth cut points from a bounded stride sample (<=
    sample_per_block keys leave each block — the driver read is
    O(blocks), never O(rows)).  No persistence: callers needing
    resume-stable cuts go through ``_load_or_sample_cuts``; the
    versioned-table RECUT deliberately wants fresh cuts from the live
    distribution."""
    import numpy as np

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        take = min(sample_per_block, n)
        idx = np.unique(np.linspace(0, n - 1, take).astype(np.int64))
        return pd.DataFrame({"k": b[key].iloc[idx]})

    ks = ds.map_batches(sample, batch_format="pandas").to_pandas()["k"]
    ks = ks.sort_values(kind="mergesort", ignore_index=True)
    if len(ks) == 0 or num_ranges <= 1:
        cuts = []
    else:
        # equi-depth: cut after each 1/num_ranges quantile of the sample
        pos = (np.arange(1, num_ranges) * len(ks)) // num_ranges
        cuts = sorted(set(ks.iloc[pos].tolist()))
    return [c.item() if hasattr(c, "item") else c for c in cuts]


def _load_or_sample_cuts(
    ds: rd.Dataset, out_dir: str, key: str, num_ranges: int,
    sample_per_block: int, forced_cuts: Optional[list] = None,
) -> list:
    """Equi-depth cut points from a bounded stride sample (<=
    sample_per_block keys leave each block — the driver read is
    O(blocks), never O(rows)).  Persisted atomically on first write so
    RESUMED runs partition identically even though Ray may re-block the
    input differently."""
    import json

    cuts_path = os.path.join(out_dir, _CUTS_FILE)
    if os.path.exists(cuts_path):
        with open(cuts_path) as f:
            saved = json.load(f)
        if saved["key"] != key or saved["num_ranges"] != num_ranges:
            raise FormatError(
                f"{out_dir} was range-partitioned with "
                f"key={saved['key']!r}/num_ranges={saved['num_ranges']} — "
                f"got key={key!r}/num_ranges={num_ranges}; use a fresh "
                "directory to re-partition differently")
        if forced_cuts is not None and list(forced_cuts) != saved["cuts"]:
            raise FormatError(
                f"{out_dir} already partitioned with different cuts than "
                "the forced ones; use a fresh directory")
        return saved["cuts"]

    if forced_cuts is not None:
        cuts = [c.item() if hasattr(c, "item") else c for c in forced_cuts]
        if sorted(set(cuts)) != cuts:
            raise FormatError("forced cuts must be sorted and distinct")
        os.makedirs(out_dir, exist_ok=True)
        tmp = cuts_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"key": key, "num_ranges": num_ranges, "cuts": cuts},
                      f)
        os.rename(tmp, cuts_path)
        return cuts

    cuts = _sample_cuts(ds, key, num_ranges, sample_per_block)
    os.makedirs(out_dir, exist_ok=True)
    tmp = cuts_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "num_ranges": num_ranges, "cuts": cuts}, f)
    os.rename(tmp, cuts_path)
    return cuts


def write_range_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key: str,
    num_ranges: int = 16,
    sample_per_block: int = 64,
    resume: bool = True,
    cuts: Optional[list] = None,
) -> pd.DataFrame:
    """Write ``ds`` as per-key-range SORTED Parquet directories.

    Returns the bounded per-range stats frame (range_id, rows, key_min,
    key_max) for the ranges written THIS run; completed ranges are
    filtered out before the exchange on resume, so a rerun streams past
    them without shuffling a byte.  ``resume=False`` clears the
    directory first.  The input is consumed twice (sampling pass +
    write pass — the two-scan RangePartitioner contract, deliberately
    NOT materialized: at 100 TB a second pruned scan is cheap, holding
    the dataset is not); pass a pre-materialized ``ds`` if its lineage
    is expensive and small.  Keys must be a total order under numpy
    comparison (ints or strings).

    ``cuts`` forces explicit cut points instead of sampling — pass
    ``load_cuts(other_dir)["cuts"]`` to CO-PARTITION this dataset with
    one already written on the same key, which is what makes
    ``merge_join_range_partitioned`` a zero-shuffle join."""
    import shutil

    import numpy as np

    from ontology_matcher_ray.stages.exchange import (
        PARTITION_COL,
        partitioned_apply_prepartitioned,
    )

    if num_ranges < 1:
        raise ValueError(f"num_ranges must be >= 1, got {num_ranges}")
    if not resume and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    cuts = _load_or_sample_cuts(ds, out_dir, key, num_ranges,
                                sample_per_block, forced_cuts=cuts)
    cuts_arr = np.asarray(cuts)
    done = frozenset(
        rid for rid in range(len(cuts) + 1)
        if os.path.isdir(_range_dir(out_dir, rid))
    )

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        rid = (np.searchsorted(cuts_arr, b[key].to_numpy(), side="right")
               .astype("int64") if len(cuts_arr)
               else np.zeros(len(b), dtype=np.int64))
        b = b.copy()
        b[PARTITION_COL] = rid
        if done:
            b = b[~np.isin(rid, list(done))]
        return b

    _EMPTY = pd.DataFrame({
        "range_id": pd.Series(dtype="int64"),
        "rows": pd.Series(dtype="int64"),
        "key_min": pd.Series(dtype=object),
        "key_max": pd.Series(dtype=object),
    })

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _EMPTY.copy()
        g = g.sort_values(key, kind="mergesort", ignore_index=True)
        rid = (int(np.searchsorted(cuts_arr, g[key].iloc[0], side="right"))
               if len(cuts_arr) else 0)
        final = _range_dir(out_dir, rid)
        tmp = final + ".tmp"       # deterministic: a task RETRY overwrites
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        g.to_parquet(os.path.join(tmp, "part-000.parquet"), index=False)
        os.rename(tmp, final)
        return pd.DataFrame({
            "range_id": [rid], "rows": [len(g)],
            "key_min": [g[key].iloc[0]], "key_max": [g[key].iloc[-1]],
        })

    keyed = ds.map_batches(assign, batch_format="pandas")
    stats = partitioned_apply_prepartitioned(keyed, write_range, [key])
    df = stats.to_pandas()          # bounded: one row per range
    if not len(df):
        return _EMPTY.copy()
    return (df.astype({"range_id": "int64", "rows": "int64"})
            .sort_values("range_id", ignore_index=True))


def read_range_partitioned(
    out_dir: str,
    columns: Optional[List[str]] = None,
    ranges: Optional[List[int]] = None,
) -> rd.Dataset:
    """Source for ``write_range_partitioned`` output.  ``ranges``
    selects specific key ranges (partition pruning: unselected
    directories are never opened)."""
    import glob

    dirs = sorted(glob.glob(os.path.join(out_dir, "range=*")))
    dirs = [d for d in dirs if not d.endswith(".tmp")]
    if ranges is not None:
        want = {f"range={r:05d}" for r in ranges}
        dirs = [d for d in dirs if os.path.basename(d) in want]
    # a list of FILES, not directories: ray.data.read_parquet accepts a
    # directory only as a single path, and pruning needs the explicit list
    files = sorted(f for d in dirs
                   for f in glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        raise FormatError(f"no completed range directories under {out_dir}")
    # partitioning=None: the range=NNNNN path segment is a COMMIT unit,
    # not a hive partition column — inference would add a 'range' column
    # and break the write->read round trip
    if columns is None:
        return read_parquet_clean(files, partitioning=None)
    # columns + partitioning=None trips an UnboundLocalError inside
    # Ray's parquet datasource (_get_data_and_partition_columns), so
    # the pruned-columns path reads one file per task with pyarrow's
    # own column pruning — same contract as the ORC/IPC sources
    import pyarrow.parquet as pq

    def reader(path, cols):
        return pq.read_table(path, columns=cols)

    def load(b):
        tbls = [reader(p, columns) for p in b["item"]]
        return tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)

    return rd.from_items(files, override_num_blocks=len(files)).map_batches(
        load, batch_format="pandas"
    )


def read_range_between(
    out_dir: str,
    lo,
    hi,
    columns: Optional[List[str]] = None,
) -> rd.Dataset:
    """Exact ``lo <= key <= hi`` scan over a range-partitioned directory
    opening ONLY the range dirs whose key interval intersects the bound
    — the persisted cut points are a zone map on the partition key, so
    pruning is a driver-side ``searchsorted`` over O(num_ranges)
    metadata.  The exact row filter runs on the (at most two) boundary
    ranges; interior ranges pass through untouched."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    meta = load_cuts(out_dir)
    key, cuts = meta["key"], meta["cuts"]
    cuts_arr = np.asarray(cuts) if cuts else np.asarray([], dtype=object)
    first = (int(np.searchsorted(cuts_arr, lo, side="right"))
             if len(cuts_arr) else 0)
    last = (int(np.searchsorted(cuts_arr, hi, side="right"))
            if len(cuts_arr) else 0)
    try:
        ds = read_range_partitioned(out_dir, columns=None,
                                    ranges=list(range(first, last + 1)))
    except FormatError:
        # every intersecting range held no rows at write time (only
        # non-empty ranges materialize): a typed empty result from one
        # existing part's footer
        import glob as _glob

        import pyarrow.parquet as pq

        any_part = sorted(_glob.glob(
            os.path.join(out_dir, "range=*", "*.parquet")))[0]
        schema = pq.read_schema(any_part).remove_metadata()
        want = list(columns) if columns is not None else schema.names
        return rd.from_arrow(schema.empty_table().select(want))

    def exact(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column(key), pa.scalar(lo)),
            pc.less_equal(t.column(key), pa.scalar(hi)),
        )
        out = t.filter(pc.fill_null(keep, False))
        if columns is not None:
            out = out.select(list(columns))
        return out

    return ds.map_batches(exact, batch_format="pyarrow")


def merge_join_range_partitioned(
    left_dir: str,
    right_dir: str,
    on: str,
    how: str = "inner",
) -> rd.Dataset:
    """ZERO-SHUFFLE equi-join of two range-partitioned directories that
    share the same key and cut points (write the second side with
    ``cuts=load_cuts(first_dir)["cuts"]`` to co-partition them).

    This is the "pick ONE partitioning key and reuse it across stages"
    scale path: the all-to-all exchange ``exchange.hash_join`` pays per
    query is paid ONCE at write time, and every subsequent join on the
    key is an embarrassingly-parallel per-range merge — range i of the
    left can only match range i of the right, because both sides were
    split at identical cut points.  Each Ray task reads exactly one
    range pair (a pure re-runnable read: retries and speculative copies
    are safe), so nothing moves between workers and the join streams at
    any scale; at 100 TB this is the difference between re-shuffling
    the fact table per query and never shuffling it again.

    ``how``: "inner" or "left".  Non-key column names must be disjoint
    (the ``hash_join`` contract).  A range directory absent on one side
    means that range held no rows on that side (the writer materializes
    only non-empty ranges) — inner emits nothing for it, left keeps the
    left rows with NaN right columns, exactly like the exchange join.
    """
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join how={how!r}")
    lc, rc = load_cuts(left_dir), load_cuts(right_dir)
    if lc["key"] != on or rc["key"] != on:
        raise FormatError(
            f"both sides must be partitioned on {on!r}; got "
            f"{lc['key']!r} / {rc['key']!r}")
    if lc["cuts"] != rc["cuts"]:
        raise FormatError(
            "cut points differ — the sides are not co-partitioned; "
            "rewrite one with cuts=load_cuts(other)['cuts']")

    def _side_empty(d: str) -> pd.DataFrame:
        """Typed empty frame of a side (real dtypes, so a merge against
        an absent range keeps key/int columns intact)."""
        files = sorted(glob.glob(os.path.join(d, "range=*", "*.parquet")))
        if not files:
            raise FormatError(f"no completed range directories under {d}")
        return pq.read_schema(files[0]).empty_table().to_pandas()

    empty_l, empty_r = _side_empty(left_dir), _side_empty(right_dir)
    l_cols, r_cols = list(empty_l.columns), list(empty_r.columns)
    overlap = (set(l_cols) - {on}) & (set(r_cols) - {on})
    if overlap:
        raise ValueError(f"non-key column names must be disjoint: {overlap}")

    n_ranges = len(lc["cuts"]) + 1

    def _read_range(d: str, rid: int, empty: pd.DataFrame) -> pd.DataFrame:
        p = _range_dir(d, rid)
        if not os.path.isdir(p):
            return empty.copy()
        files = sorted(glob.glob(os.path.join(p, "*.parquet")))
        return pd.concat([pd.read_parquet(f) for f in files],
                         ignore_index=True)

    def join_range(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for rid in b["rid"].tolist():
            left = _read_range(left_dir, int(rid), empty_l)
            if not len(left):
                continue        # inner AND left emit nothing without left rows
            right = _read_range(right_dir, int(rid), empty_r)
            frames.append(left.merge(right, on=on, how=how))
        if not frames:
            return empty_l.merge(empty_r, on=on, how=how)
        return pd.concat(frames, ignore_index=True)

    rids = rd.from_pandas(pd.DataFrame({"rid": np.arange(n_ranges,
                                                         dtype=np.int64)}))
    # one range pair per task: batch_size=1 over the bounded rid list
    return rids.map_batches(join_range, batch_format="pandas", batch_size=1)

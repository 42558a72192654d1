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
# source names, free text).  The reader inverts the mapping exactly, so
# write -> read round-trips bit-for-bit (the kg_triples_nt query runs the
# round trip under the kg_triples SQL oracle).
# ---------------------------------------------------------------------------

_NT_URN = "urn:graft:"
_CURIE_OBJ_RE = r"^[A-Za-z][A-Za-z0-9_.]*:[A-Za-z0-9_.:-]+$"


def _nt_escape(s: pd.Series) -> pd.Series:
    """N-Triples string escaping (backslash first, then quote/newlines)."""
    return (
        s.str.replace("\\", "\\\\", regex=False)
        .str.replace('"', '\\"', regex=False)
        .str.replace("\n", "\\n", regex=False)
        .str.replace("\r", "\\r", regex=False)
        .str.replace("\t", "\\t", regex=False)
    )


def triples_to_nt_lines(b: pd.DataFrame) -> pd.DataFrame:
    """(subj, pred, obj) batch -> one N-Triples line per row (vectorized)."""
    subj = "<" + _NT_URN + _nt_escape(b["subj"].astype(str)) + ">"
    pred = "<" + _NT_URN + _nt_escape(b["pred"].astype(str)) + ">"
    obj_s = b["obj"].astype(str)
    is_iri = obj_s.str.match(_CURIE_OBJ_RE)
    obj = ("<" + _NT_URN + _nt_escape(obj_s) + ">").where(
        is_iri, '"' + _nt_escape(obj_s) + '"'
    )
    return pd.DataFrame({"line": subj + " " + pred + " " + obj + " ."})


def nt_lines_to_triples(b: pd.DataFrame) -> pd.DataFrame:
    """Inverse of ``triples_to_nt_lines`` (vectorized regex extract)."""
    pat = (
        r"^<" + _NT_URN + r"(?P<subj>[^>]*)> <" + _NT_URN
        + r"(?P<pred>[^>]*)> (?:<" + _NT_URN
        + r"(?P<obj_iri>[^>]*)>|\"(?P<obj_lit>.*)\") \.$"
    )
    m = b["text"].str.extract(pat)
    obj = m["obj_iri"].fillna(m["obj_lit"])
    out = pd.DataFrame({"subj": m["subj"], "pred": m["pred"], "obj": obj})
    for c in out.columns:
        out[c] = (
            out[c]
            .str.replace("\\t", "\t", regex=False)
            .str.replace("\\r", "\r", regex=False)
            .str.replace("\\n", "\n", regex=False)
            .str.replace('\\"', '"', regex=False)
            .str.replace("\\\\", "\\", regex=False)
        )
    return out


def write_ntriples(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed .nt sink: each batch writes one content-addressed part
    file (md5 of the payload), so re-runs are idempotent and a resumed
    job never duplicates a finished part."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_part(b: pd.DataFrame) -> pd.DataFrame:
        lines = triples_to_nt_lines(b)
        payload = ("\n".join(lines["line"].tolist()) + "\n").encode()
        name = f"part-{hashlib.md5(payload).hexdigest()[:20]}.nt"
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        return pd.DataFrame({"part": [name], "rows": [len(b)]})

    # consume: the sink IS the action (bounded one-row-per-part output)
    ds.map_batches(write_part, batch_format="pandas").materialize()


def read_ntriples(out_dir: str) -> rd.Dataset:
    """Distributed .nt source: read_text over the part files, vectorized
    line parse back to (subj, pred, obj)."""
    ds = rd.read_text(os.path.join(out_dir))
    return ds.map_batches(nt_lines_to_triples, batch_format="pandas")


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed JSONL sink (Ray's native line-delimited JSON writer)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)


def read_jsonl(out_dir: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    """Distributed JSONL source; optional column projection after parse
    (JSON has no column pruning at the read — prefer Parquet for scans,
    this exists for interop with line-JSON corpora)."""
    ds = rd.read_json(out_dir)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds

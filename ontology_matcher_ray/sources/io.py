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

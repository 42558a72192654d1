"""CLI-parity pipeline: entity file in -> formatted + failed files out.

The engine equivalent of ``onto-match ontology -i in.tsv -o out.tsv -O
<type>`` (``cli.py:55-165``): read (S1) -> Resolver actor pool (replaces
the HTTP converters, §2.3) -> Formatter (default_format, §2.8) -> split
sinks (S2/S3).  The dictionary snapshot replaces the network + sqlite
cache; ``--reformat``-style resume maps to re-running only the format
stage from a saved resolve-output Parquet checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import pandas as pd

import ray
import ray.data as rd

from ontology_matcher_ray.schemas import FORMATTED_COLUMNS, OntologySpec, Strategy
from ontology_matcher_ray.sources.io import read_entity_file, write_formatted_tsv
from ontology_matcher_ray.stages.format import Formatter
from ontology_matcher_ray.stages.resolve import Resolver
from ontology_matcher_ray.state.snapshot import DictionarySnapshot


def resolve_dataset(
    ds: rd.Dataset,
    snapshot: DictionarySnapshot,
    spec: OntologySpec,
    strategy: Strategy = Strategy.MIXTURE,
    concurrency=(1, 4),
    batch_size: int = 4096,
) -> rd.Dataset:
    ref = ray.put(snapshot)
    return ds.map_batches(
        Resolver,
        fn_constructor_kwargs=dict(snapshot_ref=ref, spec=spec, strategy=strategy),
        batch_format="pandas",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def format_dataset(
    ds: rd.Dataset, spec: OntologySpec, strategy: Strategy = Strategy.MIXTURE
) -> rd.Dataset:
    fmt = Formatter(spec, strategy)
    return ds.map_batches(fmt, batch_format="pandas")


def run_ontology_match(
    input_path: str,
    output_path: str,
    snapshot: DictionarySnapshot,
    spec: OntologySpec,
    strategy: Strategy = Strategy.MIXTURE,
    checkpoint_dir: Optional[str] = None,
    reformat: bool = False,
    batch_size: int = 4096,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Full reference pipeline with checkpoint/resume.

    ``checkpoint_dir`` holds the resolve-stage output (the engine analogue
    of the reference's conversion-result JSON, ``cli.py:127-148``); with
    ``reformat=True`` and an existing checkpoint, resolution is skipped and
    only formatting re-runs.

    MIGRATION (S4/S5): with ``reformat=True`` and no Parquet checkpoint,
    a reference ``<output>.json`` checkpoint sitting next to the output
    (the reference CLI's naming convention) is accepted instead — its
    recorded conversions are loaded as the dictionary so resolution
    reproduces the recorded decisions without the original network state.
    """
    resolved: Optional[rd.Dataset] = None
    if reformat and checkpoint_dir and os.path.isdir(checkpoint_dir):
        resolved = rd.read_parquet(checkpoint_dir)
    if resolved is None and reformat:
        from ontology_matcher_ray.state.reference_json import (
            load_reference_checkpoint,
            reference_json_path,
        )

        ref_json = reference_json_path(output_path)
        if os.path.isfile(ref_json):
            snapshot = load_reference_checkpoint(ref_json, spec)
            ds = read_entity_file(input_path)
            resolved = resolve_dataset(ds, snapshot, spec, strategy,
                                       batch_size=batch_size)
    if resolved is None:
        ds = read_entity_file(input_path)
        resolved = resolve_dataset(ds, snapshot, spec, strategy,
                                   batch_size=batch_size)
        if checkpoint_dir:
            # atomic checkpoint: write to tmp, rename (skip if present,
            # mirroring "skip if file exists", ontology_formatter.py:788-790)
            if not os.path.isdir(checkpoint_dir):
                tmp = checkpoint_dir + ".tmp"
                import shutil

                if os.path.isdir(tmp):
                    shutil.rmtree(tmp)
                resolved.write_parquet(tmp)
                os.rename(tmp, checkpoint_dir)
            resolved = rd.read_parquet(checkpoint_dir)

    formatted_ds = format_dataset(resolved, spec, strategy)
    out = formatted_ds.to_pandas()    # entity files are small (<10^6 rows)
    formatted = out[out["sink"] == "formatted"][FORMATTED_COLUMNS].reset_index(drop=True)
    failed = out[out["sink"] == "failed"][FORMATTED_COLUMNS + ["reason"]].reset_index(drop=True)
    write_formatted_tsv(formatted, failed, output_path)
    return formatted, failed

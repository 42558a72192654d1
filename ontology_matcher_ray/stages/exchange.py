"""Hash-partition exchange helpers — the engine's shuffle primitive.

Ray Data's ``groupby().aggregate``/``map_groups`` on string keys pays a
Python-level cost per row/group inside each block (measured ~650 rows/s on
multi-key string aggregates).  The scalable pattern used everywhere in this
engine instead is:

    map_batches(add _p = hash(keys) %% P)      # vectorized partition key
      -> groupby("_p")                         # int-key exchange (fast path)
      -> map_groups(per-partition pandas fn)   # ONE Python call per
                                               # partition, vectorized inside

P bounds the number of Python invocations (not the number of distinct
keys), keys are content-hashed (skew-resistant for dedup; for aggregation
by a hot key, callers salt by appending a second column).  Measured 130x
faster than ``groupby(cols).aggregate(Count)`` on the triple-dedup shape.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
import pandas as pd

import ray.data as rd

PARTITION_COL = "_p"


def _key_series(b: pd.DataFrame, cols: Sequence[str]) -> pd.Series:
    s = b[cols[0]].astype(str)
    for c in cols[1:]:
        s = s + "\x00" + b[c].astype(str)
    return s


def add_partition_column(b: pd.DataFrame, cols: Sequence[str], p: int) -> pd.DataFrame:
    """Vectorized, process-stable partition id from the key columns."""
    h = pd.util.hash_pandas_object(_key_series(b, cols), index=False)
    b = b.copy()
    b[PARTITION_COL] = (h % np.uint64(p)).astype("int64")
    return b


def partitioned_apply(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 64,
) -> rd.Dataset:
    """Co-locate rows by hash(key_cols), run ``fn`` once per partition.

    ``fn`` sees every row of each key group together (the partitioning
    guarantee) and must itself group by the key columns if it needs
    per-key output.  The partition column is stripped before ``fn``.
    """
    cols = list(key_cols)

    def strip_then_apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[PARTITION_COL]))

    return (
        ds.map_batches(lambda b: add_partition_column(b, cols, num_partitions),
                       batch_format="pandas")
        .groupby(PARTITION_COL)
        .map_groups(strip_then_apply, batch_format="pandas")
    )


def partitioned_apply_prepartitioned(
    ds: rd.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    key_cols: Sequence[str],
) -> rd.Dataset:
    """Like ``partitioned_apply`` for datasets that ALREADY carry the
    partition column (e.g. emitted by an upstream actor stage so no extra
    task pass is needed)."""
    def strip_then_apply(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[PARTITION_COL]))

    return ds.groupby(PARTITION_COL).map_groups(strip_then_apply, batch_format="pandas")


def distinct(
    ds: rd.Dataset, cols: Sequence[str], num_partitions: int = 64
) -> rd.Dataset:
    """Exact distinct over ``cols``: per-batch combiner + one exchange.

    Equivalent to the reference's full-row dedup (SURVEY §2.7 O3) at
    arbitrary scale: duplicates co-locate by content hash, so the result is
    exact under any input partitioning.
    """
    cols = list(cols)
    pre = ds.map_batches(lambda b: b.drop_duplicates(cols), batch_format="pandas")
    return partitioned_apply(
        pre, cols, lambda g: g.drop_duplicates(cols), num_partitions
    )


def grouped_agg(
    ds: rd.Dataset,
    key_cols: Sequence[str],
    agg_fn: Callable[["pd.core.groupby.DataFrameGroupBy"], pd.DataFrame],
    num_partitions: int = 64,
) -> rd.Dataset:
    """Per-key aggregation via partition-local pandas groupby (C-speed).

    ``agg_fn`` receives a pandas ``DataFrameGroupBy`` over the key columns
    and returns a frame indexed by key (reset inside).
    """
    cols = list(key_cols)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g.groupby(cols, sort=False)).reset_index()

    return partitioned_apply(ds, cols, per_partition, num_partitions)

"""Global ordered scan (events.global_scan): range-bucket prefix scan
with driver carry-in reconciliation — correctness on PLANTED disorder
(the testdata stream is in-order, so the late flag is exercised here),
bucket-boundary carries, and partition/bucket-size invariance.  Oracle
parity of the 'scan' leg runs through the events_asof composite in
tests/test_queries_oracle.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ontology_matcher_ray.pipelines import events
from tests.util import to_pandas


def _write_events(tmp_path, n=500, seed=5, disorder_minutes=90):
    """Synthetic stream with REAL disorder: base timeline 1 min/event,
    a seeded subset yanked back ``disorder_minutes`` so late flags at a
    30-min allowed lateness are nonzero."""
    rng = np.random.default_rng(seed)
    base = np.arange(n, dtype=np.int64) * 60_000_000
    lag = rng.random(n) < 0.15
    ts_us = base - lag * disorder_minutes * 60_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "event_type": np.full(n, "click"),
        "value": rng.integers(-500, 10_000, n) / 100.0,
        "props": np.full(n, "{}"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


def _expected(df: pd.DataFrame, lateness_minutes=30) -> pd.DataFrame:
    df = df.sort_values("event_id", ignore_index=True)
    ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    v = df["value"].to_numpy() * 100
    cents = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype("int64")
    seen = np.empty(len(ts), dtype=np.int64)
    seen[0] = -1
    if len(ts) > 1:
        seen[1:] = np.maximum.accumulate(ts)[:-1]
    return pd.DataFrame({
        "event_id": df["event_id"].to_numpy(),
        "user_id": df["user_id"].to_numpy(),
        "running_cents": np.cumsum(cents),
        "seen_max_us": seen,
        "late": ((seen >= 0)
                 & (ts < seen - lateness_minutes * 60_000_000)).astype("int64"),
    })


def test_global_scan_planted_disorder(tmp_path):
    df = _write_events(tmp_path)
    want = _expected(df)
    assert want["late"].sum() > 10          # the disorder must bite
    for bucket_size, parts in ((7, 3), (64, 8), (10_000, 2)):
        got = to_pandas(events.global_scan(
            str(tmp_path), bucket_size=bucket_size, num_partitions=parts,
        )).sort_values("event_id", ignore_index=True)
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False, check_exact=True)


def test_global_scan_two_level_path(tmp_path):
    """Force the level-2 (distributed carry) path: a tiny
    max_driver_buckets makes the bucket summaries exceed the driver
    bound, so carries reduce through the super-bucket exchange and join
    back via the bucket-keyed exchange — output must be bit-identical
    to the level-1 broadcast path."""
    df = _write_events(tmp_path, n=700, seed=11)
    want = _expected(df)
    got = to_pandas(events.global_scan(
        str(tmp_path), bucket_size=5, num_partitions=4,
        max_driver_buckets=8,           # 140 buckets >> 8: level-2 kicks in
    )).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True)
    assert got["late"].sum() > 0


def test_global_scan_testdata_in_order():
    """On the in-order testdata stream: zero late events, watermark =
    previous ts, running total matches a driver-side recomputation."""
    got = to_pandas(events.global_scan("/root/testdata/sf0.001")
                    ).sort_values("event_id", ignore_index=True)
    raw = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    want = _expected(raw)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True)
    assert got["late"].sum() == 0

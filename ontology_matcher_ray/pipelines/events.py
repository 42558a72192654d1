"""Stream-shaped pipeline over the ``events`` table.

Ray Data has no event-time windows; tumbling windows are expressed as a
keyed aggregation over ``(event_type, window_start)`` with a per-batch
combiner before the shuffle (see /opt/skills/guides/ray_guide.md,
"Streaming-shaped workloads").  Values are aggregated in integer cents so
partial-sum order cannot perturb the result hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd


def read_events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def hourly_windows(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h windows: (event_type, window_start, n_events, value_cents).

    Two-phase: map_batches partial aggregation (combiner), then a small
    groupby over (event_type, window_start) partials.
    """
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["window_start"] = b["ts"].dt.floor("h")
        b["value_cents"] = np.round(b["value"].to_numpy() * 100).astype("int64")
        g = b.groupby(["event_type", "window_start"], sort=False).agg(
            n_events=("value_cents", "size"), value_cents=("value_cents", "sum")
        )
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    from ontology_matcher_ray.stages import exchange

    return exchange.grouped_agg(
        partials,
        ["event_type", "window_start"],
        lambda gb: gb.agg(n_events=("n_events", "sum"), value_cents=("value_cents", "sum")),
        num_partitions=16,
    )


def sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: events within ``gap_minutes`` of the
    previous event share a session.

    groupby(user_id).map_groups sorts each user's events by ts and applies
    the gap rule — the documented partitioning assumption is that one
    user's history fits in one group (true for per-user event logs).
    Emits (user_id, session_id, n_events, session_start, session_end).
    """
    ds = read_events(sf_dir, columns=["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        session = gap.cumsum().fillna(0).astype("int64")
        out = g.assign(session_id=session).groupby("session_id").agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        ).reset_index()
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

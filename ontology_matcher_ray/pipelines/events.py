"""Stream-shaped pipeline over the ``events`` table.

Ray Data has no event-time windows; tumbling windows are expressed as a
keyed aggregation over ``(event_type, window_start)`` with a per-batch
combiner before the shuffle (the standard map-side pre-aggregation
pattern from the Ray Data docs on groupby/shuffle).  Values are
aggregated in integer cents so partial-sum order cannot perturb the
result hash.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd


def read_events(sf_dir: str, columns=None) -> rd.Dataset:
    from ontology_matcher_ray.sources.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"), columns=columns)


def hourly_windows(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h windows: (event_type, window_start, n_events, value_cents).

    Two-phase: map_batches partial aggregation (combiner), then a small
    groupby over (event_type, window_start) partials.
    """
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["window_start"] = b["ts"].dt.floor("h")
        # half-away-from-zero to match DuckDB round() (np.round is
        # banker's rounding: diverges on exact half-cents)
        v = b["value"].to_numpy() * 100
        b["value_cents"] = np.where(
            v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)
        ).astype("int64")
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


def sliding_windows(sf_dir: str, size_hours: int = 3, hop_hours: int = 1) -> rd.Dataset:
    """Sliding (hopping) event-time windows: each event contributes to
    ``size/hop`` overlapping windows.

    Window enumeration is a per-batch map (one frame per hop offset, no
    Python per row), then the same combiner + hash-partition exchange as
    the tumbling windows — the fan-out factor (size/hop) multiplies only
    the COMBINED partial rows, not the shuffled volume per key.
    Emits (event_type, window_start, n_events, value_cents).
    """
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    k_max = size_hours // hop_hours

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        base = b["ts"].dt.floor(f"{hop_hours}h")
        v = b["value"].to_numpy() * 100
        cents = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype("int64")
        frames = []
        for k in range(k_max):
            frames.append(pd.DataFrame({
                "event_type": b["event_type"].to_numpy(),
                "window_start": base - pd.Timedelta(hours=k * hop_hours),
                "value_cents": cents,
            }))
        all_rows = pd.concat(frames, ignore_index=True)
        g = all_rows.groupby(["event_type", "window_start"], sort=False).agg(
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


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click") -> rd.Dataset:
    """AS-OF join (an operator Ray Data lacks natively): each ``left_type``
    event is joined to the MOST RECENT prior-or-equal ``right_type`` event
    of the same user.

    Composition: one hash-partition exchange on ``user_id`` co-locates
    each user's events, then a vectorized ``pd.merge_asof`` per partition
    (sorted backward search, C-speed).  Ties on ts resolve to the larger
    event_id (right side sorted by (ts, event_id); merge_asof takes the
    last match), mirrored exactly by the oracle's window ordering.
    Partitioning assumption: one user's history fits in a partition.
    Emits (event_id, user_id, match_event_id, gap_us) with -1 sentinels
    for left rows with no match.
    """
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], ignore_index=True)
        right = g[g["event_type"] == right_type].sort_values(
            ["ts", "event_id"], ignore_index=True)
        cols = ["event_id", "user_id", "match_event_id", "gap_us"]
        if left.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        joined = pd.merge_asof(
            left, right.rename(columns={"event_id": "match_event_id", "ts": "match_ts"}),
            left_on="ts", right_on="match_ts", by="user_id", direction="backward",
        )
        out = pd.DataFrame({
            "event_id": joined["event_id"].astype("int64"),
            "user_id": joined["user_id"].astype("int64"),
            "match_event_id": joined["match_event_id"].fillna(-1).astype("int64"),
            # integer us via timedelta64 (total_seconds() is a float and
            # double-rounds microseconds on multi-day gaps)
            "gap_us": np.where(
                joined["match_event_id"].notna(),
                (joined["ts"] - joined["match_ts"]).to_numpy()
                .astype("timedelta64[us]").astype("int64"),
                -1,
            ).astype("int64"),
        })
        return out

    from ontology_matcher_ray.stages import exchange

    return exchange.partitioned_apply(ds, ["user_id"], per_partition, 32)


def range_join(sf_dir: str, left_type: str = "purchase",
               right_type: str = "click", window_minutes: int = 30) -> rd.Dataset:
    """RANGE join aggregate: for each ``left_type`` event, how many
    ``right_type`` events the same user produced in the preceding
    ``window_minutes`` (inclusive of equal timestamps).

    Same partitioning shape as the as-of join (one user_id exchange), but
    the per-partition kernel is two vectorized ``searchsorted`` probes per
    user block (window start / event time) — no pair explosion, so a hot
    user with a million clicks costs O(log n) per probe, not O(n).
    Emits (event_id, user_id, n_recent).
    """
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")
    win = pd.Timedelta(minutes=window_minutes)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "n_recent"]
        out_frames = []
        left_all = g[g["event_type"] == left_type]
        right_all = g[g["event_type"] == right_type]
        if left_all.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        rgroups = {u: grp for u, grp in right_all.groupby("user_id", sort=False)}
        for u, lgrp in left_all.groupby("user_id", sort=False):
            rts = rgroups.get(u)
            if rts is None:
                n = np.zeros(len(lgrp), dtype=np.int64)
            else:
                rsorted = np.sort(rts["ts"].to_numpy())
                lts = lgrp["ts"].to_numpy()
                hi = np.searchsorted(rsorted, lts, side="right")
                lo = np.searchsorted(rsorted, lts - win, side="left")
                n = (hi - lo).astype(np.int64)
            out_frames.append(pd.DataFrame({
                "event_id": lgrp["event_id"].to_numpy(dtype=np.int64),
                "user_id": np.full(len(lgrp), u, dtype=np.int64),
                "n_recent": n,
            }))
        return pd.concat(out_frames, ignore_index=True)

    from ontology_matcher_ray.stages import exchange

    return exchange.partitioned_apply(ds, ["user_id"], per_partition, 32)


def sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: events within ``gap_minutes`` of the
    previous event share a session.

    Runs as ONE hash-partition exchange on ``user_id`` (stages/exchange)
    with a fully vectorized per-partition kernel: sort by (user, ts)
    once, session breaks via diff + cumsum over the whole partition (no
    per-user Python call), then a C-speed pandas aggregate.  The
    partitioning assumption is that one user's history fits in one
    partition (true for per-user event logs; hot users would be handled
    upstream by splitting on a coarser time key).
    Emits (user_id, session_id, n_events, session_start, session_end).
    """
    ds = read_events(sf_dir, columns=["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = g["user_id"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user | (g["ts"].diff() > gap).to_numpy()
        run = np.cumsum(brk)                       # global session counter
        # per-user session_id starts at 0: subtract the user's first run id
        first_run = pd.Series(run).groupby(uid).transform("min").to_numpy()
        g["session_id"] = (run - first_run).astype("int64")
        out = g.groupby(["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        ).reset_index()
        return out

    from ontology_matcher_ray.stages import exchange

    return exchange.partitioned_apply(ds, ["user_id"], per_partition, 32)

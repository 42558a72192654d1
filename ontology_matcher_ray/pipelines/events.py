"""Stream-shaped pipeline over the ``events`` table.

Ray Data has no event-time windows; tumbling windows are expressed as a
keyed aggregation over ``(event_type, window_start)`` with a per-batch
combiner before the shuffle (the standard map-side pre-aggregation
pattern from the Ray Data docs on groupby/shuffle).  Values are
aggregated in integer cents so partial-sum order cannot perturb the
result hash.

HOT-KEY SALTING (SURVEY §4.1): the per-user operators (sessionize,
as-of join, range join) never exchange on ``user_id`` alone — the event
volume always moves through a ``(user_id, bucket)`` key, where ``bucket``
is a coarse time bucket (default 24 h), so a bot user with millions of
events spreads across partitions instead of landing in one.  Cross-bucket
state (sessions spanning midnight, as-of carry-over) is reconciled in a
second pass that exchanges only per-(user, bucket) SUMMARY rows — O(#
buckets) per user regardless of event count — and a third salted pass
joins the reconciliation back.  Every operator's output is bit-identical
to the unsalted single-exchange formulation (the SQL oracles are
unchanged and stay green).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

_US = 1_000_000
_EPOCH0 = pd.Timestamp("1970-01-01")


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


GLOBAL_SCAN_BUCKET = 1024       # events per scan bucket (see global_scan)
LATENESS_MINUTES = 30
_NO_TS = np.iinfo(np.int64).min  # internal "no prior event" sentinel: ts can
                                 # legitimately be negative (pre-epoch), so -1
                                 # is only a PRESENTATION value (oracle
                                 # COALESCE(prev_max, -1)), never the carrier


def global_scan(sf_dir: str, lateness_minutes: int = LATENESS_MINUTES,
                num_partitions: int = 16,
                bucket_size: int = GLOBAL_SCAN_BUCKET,
                max_driver_buckets: int = 65536) -> rd.Dataset:
    """GLOBAL ordered scan over the arrival sequence (event_id): per
    event, the inclusive running ``value_cents`` total, the EXCLUSIVE
    running max of event time (the stream's WATERMARK before this event
    arrived), and a late flag (event time lags the watermark by more
    than ``lateness_minutes`` — Flink/Beam-style bounded-disorder
    detection; this table's synthetic stream is in-order, so the flag is
    structurally 0 here while the running columns carry the hash
    weight).

    A single global window is the one shape a hash exchange CANNOT
    spread (one key = one partition).  The scalable form is a
    range-bucket scan: (1) ONE exchange on ``event_id // bucket_size``
    computes each bucket's LOCAL inclusive/exclusive scans plus an O(1)
    summary row (bucket sum, bucket max); (2) the summaries — #buckets
    rows, not #events — reduce into per-bucket exclusive carry-ins; (3)
    the carry-ins merge back into the local scans.  Up to
    ``max_driver_buckets`` the reduce runs on the driver and the merge
    is a broadcast map; past it (10^10+ events) the IMPLEMENTED level-2
    path kicks in: a super-bucket exchange scans summaries-of-summaries,
    only the per-super rows reach the driver, and carries join back via
    one bucket-keyed exchange — each level divides the row count by
    ``max_driver_buckets``, so a third level is the same recursion (not
    needed below ~10^14 events).  Both paths are bit-identical
    (tests/test_global_scan.py forces the cut-over on small data).

    Emits (event_id, user_id, running_cents, seen_max_us, late).
    """
    from ontology_matcher_ray.stages import exchange

    late_us = lateness_minutes * 60 * _US
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy() * 100
        return pd.DataFrame({
            "bucket": (b["event_id"].to_numpy(dtype=np.int64)
                       // bucket_size),
            "event_id": b["event_id"].to_numpy(dtype=np.int64),
            "user_id": b["user_id"].to_numpy(dtype=np.int64),
            "ts_us": b["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "cents": np.where(v >= 0, np.floor(v + 0.5),
                              np.ceil(v - 0.5)).astype("int64"),
        })

    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        # per bucket: inclusive running sum, exclusive running max, plus
        # one summary row per bucket (event_id = -1)
        g = g.sort_values(["bucket", "event_id"], ignore_index=True)
        pieces = []
        for bkt, grp in g.groupby("bucket", sort=False):
            ts = grp["ts_us"].to_numpy()
            cents = grp["cents"].to_numpy()
            run = np.cumsum(cents)
            excl_max = np.empty(len(ts), dtype=np.int64)
            excl_max[0] = _NO_TS
            if len(ts) > 1:
                excl_max[1:] = np.maximum.accumulate(ts)[:-1]
            pieces.append(pd.DataFrame({
                "bucket": np.full(len(grp), bkt, dtype=np.int64),
                "event_id": grp["event_id"].to_numpy(),
                "user_id": grp["user_id"].to_numpy(),
                "ts_us": ts,
                "local_run": run,
                "local_excl_max": excl_max,
            }))
            pieces.append(pd.DataFrame({
                "bucket": [bkt], "event_id": [np.int64(-1)],
                "user_id": [np.int64(-1)],
                "ts_us": [np.int64(ts.max())],
                "local_run": [run[-1]], "local_excl_max": [np.int64(_NO_TS)],
            }))
        return pd.concat(pieces, ignore_index=True)

    p1 = exchange.partitioned_apply(
        ds.map_batches(prep, batch_format="pandas"),
        ["bucket"], local_scan, num_partitions,
    ).materialize()

    summ_ds = p1.map_batches(lambda b: b[b["event_id"] < 0],
                             batch_format="pandas")

    def _final_frame(b: pd.DataFrame, cs: np.ndarray,
                     cm: np.ndarray) -> pd.DataFrame:
        seen = np.maximum(b["local_excl_max"].to_numpy(), cm)
        ts = b["ts_us"].to_numpy()
        has = seen != _NO_TS
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "user_id": b["user_id"].to_numpy(),
            "running_cents": b["local_run"].to_numpy() + cs,
            "seen_max_us": np.where(has, seen, -1),
            "late": (has & (ts < seen - late_us)).astype("int64"),
        })

    n_buckets = summ_ds.count()
    if n_buckets <= max_driver_buckets:
        # LEVEL-1 path: driver reduce over SUMMARY rows (#buckets rows),
        # carry-ins broadcast as a closure dict, zero extra exchanges
        summ = summ_ds.to_pandas().sort_values("bucket", ignore_index=True)
        csum = np.concatenate([[0],
                               np.cumsum(summ["local_run"].to_numpy())[:-1]])
        cmax = np.concatenate(
            [[_NO_TS], np.maximum.accumulate(summ["ts_us"].to_numpy())[:-1]])
        carry_sum = dict(zip(summ["bucket"].to_numpy().tolist(), csum.tolist()))
        carry_max = dict(zip(summ["bucket"].to_numpy().tolist(), cmax.tolist()))

        def finalize(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_id"] >= 0]
            bk = b["bucket"].to_numpy()
            cs = np.fromiter((carry_sum[int(x)] for x in bk), dtype=np.int64,
                             count=len(bk))
            cm = np.fromiter((carry_max[int(x)] for x in bk), dtype=np.int64,
                             count=len(bk))
            return _final_frame(b, cs, cm)

        return p1.map_batches(finalize, batch_format="pandas")

    # LEVEL-2 path (bucket count beyond the driver bound): the classic
    # two-level scan.  (a) group bucket summaries into SUPER-buckets and
    # compute each bucket's within-super exclusive scan in one SMALL
    # exchange; (b) driver-reduce only the per-super summaries
    # (#buckets / super_size rows); (c) emit per-bucket carry rows
    # (super carry + within-super exclusive) and join them back to the
    # event rows with ONE bucket-keyed exchange — no driver-sized dict
    # anywhere.  Each level divides the row count by super_size, so a
    # third level is the same recursion (not needed below ~10^14 events).
    super_size = max(2, max_driver_buckets)

    def with_super(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["super"] = b["bucket"].to_numpy(dtype=np.int64) // super_size
        return b

    def within_super(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["super", "bucket"], ignore_index=True)
        pieces = []
        for sup, grp in g.groupby("super", sort=False):
            runs = grp["local_run"].to_numpy()
            maxs = grp["ts_us"].to_numpy()
            pieces.append(pd.DataFrame({
                "super": np.full(len(grp), sup, dtype=np.int64),
                "bucket": grp["bucket"].to_numpy(),
                "w_sum": np.concatenate([[0], np.cumsum(runs)[:-1]]),
                "w_max": np.concatenate(
                    [[_NO_TS], np.maximum.accumulate(maxs)[:-1]]),
            }))
            pieces.append(pd.DataFrame({
                "super": [sup], "bucket": [np.int64(-1)],
                "w_sum": [runs.sum()], "w_max": [np.int64(maxs.max())],
            }))
        return pd.concat(pieces, ignore_index=True)

    p2 = exchange.partitioned_apply(
        summ_ds.map_batches(with_super, batch_format="pandas"),
        ["super"], within_super, num_partitions,
    ).materialize()

    sup = (p2.map_batches(lambda b: b[b["bucket"] < 0],
                          batch_format="pandas")
           .to_pandas().sort_values("super", ignore_index=True))
    s_csum = np.concatenate([[0], np.cumsum(sup["w_sum"].to_numpy())[:-1]])
    s_cmax = np.concatenate(
        [[_NO_TS], np.maximum.accumulate(sup["w_max"].to_numpy())[:-1]])
    sc_sum = dict(zip(sup["super"].to_numpy().tolist(), s_csum.tolist()))
    sc_max = dict(zip(sup["super"].to_numpy().tolist(), s_cmax.tolist()))

    def carry_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["bucket"] >= 0]
        sups = b["super"].to_numpy()
        cs = np.fromiter((sc_sum[int(x)] for x in sups), dtype=np.int64,
                         count=len(sups))
        cm = np.fromiter((sc_max[int(x)] for x in sups), dtype=np.int64,
                         count=len(sups))
        return pd.DataFrame({
            "bucket": b["bucket"].to_numpy(),
            "event_id": np.full(len(b), -2, dtype=np.int64),  # carry marker
            "user_id": np.full(len(b), -1, dtype=np.int64),
            "ts_us": np.maximum(b["w_max"].to_numpy(), cm),   # carry max
            "local_run": b["w_sum"].to_numpy() + cs,          # carry sum
            "local_excl_max": np.full(len(b), _NO_TS, dtype=np.int64),
        })

    carries = p2.map_batches(carry_rows, batch_format="pandas")
    events_only = p1.map_batches(lambda b: b[b["event_id"] >= 0],
                                 batch_format="pandas")

    def merge_carry(g: pd.DataFrame) -> pd.DataFrame:
        is_carry = g["event_id"].to_numpy() == -2
        ev = g[~is_carry]
        cr = g[is_carry].drop_duplicates("bucket").set_index("bucket")
        cs = cr["local_run"].reindex(ev["bucket"].to_numpy()).to_numpy()
        cm = cr["ts_us"].reindex(ev["bucket"].to_numpy()).to_numpy()
        return _final_frame(ev, cs.astype(np.int64), cm.astype(np.int64))

    return exchange.partitioned_apply(
        events_only.union(carries), ["bucket"], merge_carry, num_partitions,
    )


def _with_bucket(b: pd.DataFrame, bucket_us: int) -> pd.DataFrame:
    b = b.copy()
    b["bucket"] = (b["ts"].astype("datetime64[us]").astype("int64")
                   // bucket_us).astype("int64")
    return b


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click", bucket_hours: int = 24) -> rd.Dataset:
    """AS-OF join (an operator Ray Data lacks natively): each ``left_type``
    event is joined to the MOST RECENT prior-or-equal ``right_type`` event
    of the same user.

    Hot-key-safe three-pass composition (no per-user partition-fit
    assumption anywhere):

    1. salted exchange on (user_id, bucket): vectorized ``pd.merge_asof``
       against the SAME bucket's rights resolves almost every left;
       per-bucket summaries (last right, unmatched-left markers) ride out
       as O(1)-per-bucket rows;
    2. user-keyed exchange over SUMMARIES ONLY: a running forward-fill
       computes each marker bucket's carry-in (last right of any earlier
       bucket) — a bot user costs O(#buckets) rows here, not O(#events);
    3. salted exchange joins carry-ins back to the unmatched lefts.

    Ties on ts resolve to the larger event_id (right side sorted by
    (ts, event_id); merge_asof takes the last match), mirrored exactly by
    the oracle's window ordering.  Emits (event_id, user_id,
    match_event_id, gap_us) with -1 sentinels for no-match lefts.
    """
    bucket_us = bucket_hours * 3600 * _US
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")
    ds = ds.map_batches(lambda b: _with_bucket(b, bucket_us), batch_format="pandas")

    from ontology_matcher_ray.stages import exchange

    P1_COLS = {"kind": "int64", "event_id": "int64", "user_id": "int64",
               "bucket": "int64", "ts": "datetime64[us]",
               "match_event_id": "int64", "gap_us": "int64",
               "r_id": "int64", "r_ts": "datetime64[us]"}

    def _empty(cols) -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})

    def _p1_frame(**named) -> pd.DataFrame:
        n = len(next(iter(named.values())))
        out = {}
        for c, t in P1_COLS.items():
            if c in named:
                out[c] = pd.Series(named[c]).astype(t).to_numpy()
            elif t == "datetime64[us]":
                out[c] = np.full(n, _EPOCH0, dtype="datetime64[us]")
            else:
                out[c] = np.full(n, -1, dtype=np.int64)
        return pd.DataFrame(out)

    def within_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], ignore_index=True)
        right = g[g["event_type"] == right_type].sort_values(
            ["ts", "event_id"], ignore_index=True)
        pieces = []
        if len(right):
            # per-(user, bucket) last right, by (ts, event_id) order
            lastr = right.groupby(["user_id", "bucket"], sort=False).tail(1)
            pieces.append(_p1_frame(
                kind=np.ones(len(lastr)), user_id=lastr["user_id"],
                bucket=lastr["bucket"], r_id=lastr["event_id"],
                r_ts=lastr["ts"]))
        if len(left):
            joined = pd.merge_asof(
                left,
                right.rename(columns={"event_id": "match_event_id",
                                      "ts": "match_ts"}),
                left_on="ts", right_on="match_ts",
                by=["user_id", "bucket"], direction="backward",
            )
            hit = joined["match_event_id"].notna()
            m = joined[hit]
            if len(m):
                pieces.append(_p1_frame(
                    kind=np.full(len(m), -1), event_id=m["event_id"],
                    user_id=m["user_id"],
                    match_event_id=m["match_event_id"],
                    gap_us=(m["ts"] - m["match_ts"]).to_numpy()
                           .astype("timedelta64[us]").astype("int64")))
            u = joined[~hit]
            if len(u):
                pieces.append(_p1_frame(
                    kind=np.zeros(len(u)), event_id=u["event_id"],
                    user_id=u["user_id"], bucket=u["bucket"], ts=u["ts"]))
                mk = u[["user_id", "bucket"]].drop_duplicates()
                pieces.append(_p1_frame(
                    kind=np.full(len(mk), 2), user_id=mk["user_id"],
                    bucket=mk["bucket"]))
        if not pieces:
            return _empty(P1_COLS)
        return pd.concat(pieces, ignore_index=True)

    p1 = exchange.partitioned_apply(
        ds, ["user_id", "bucket"], within_bucket, 32
    ).materialize()

    def carries(g: pd.DataFrame) -> pd.DataFrame:
        # summaries only: kind 1 = per-bucket last right, kind 2 = marker.
        # Within one bucket, markers sort BEFORE rights so the forward
        # fill exposes strictly-earlier buckets' rights to a marker.
        g = g.sort_values(["user_id", "bucket", "kind"],
                          ascending=[True, True, False], ignore_index=True)
        is_r = g["kind"].to_numpy() == 1
        cr = g["r_id"].where(is_r).groupby(g["user_id"]).ffill()
        ct = g["r_ts"].where(is_r).groupby(g["user_id"]).ffill()
        mk = g["kind"].to_numpy() == 2
        out = _p1_frame(
            kind=np.full(mk.sum(), 3), user_id=g.loc[mk, "user_id"],
            bucket=g.loc[mk, "bucket"],
            r_id=cr[mk].fillna(-1), r_ts=ct[mk].fillna(_EPOCH0))
        return out

    p2 = exchange.partitioned_apply(
        p1.map_batches(lambda b: b[b["kind"].isin([1, 2])], batch_format="pandas"),
        ["user_id"], carries, 32,
    )

    OUT_COLS = {"event_id": "int64", "user_id": "int64",
                "match_event_id": "int64", "gap_us": "int64"}

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        un = g[g["kind"] == 0]
        cr = g.loc[g["kind"] == 3, ["user_id", "bucket", "r_id", "r_ts"]]
        if un.empty:
            return _empty(OUT_COLS)
        m = un.merge(cr, on=["user_id", "bucket"], how="left",
                     suffixes=("", "_c"))
        has = m["r_id_c"].fillna(-1).to_numpy() >= 0
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "match_event_id": m["r_id_c"].fillna(-1).astype("int64"),
            "gap_us": np.where(
                has,
                (m["ts"] - m["r_ts_c"]).to_numpy()
                .astype("timedelta64[us]").astype("int64"),
                -1).astype("int64"),
        })

    p3 = exchange.partitioned_apply(
        p1.map_batches(lambda b: b[b["kind"] == 0], batch_format="pandas")
          .union(p2),
        ["user_id", "bucket"], resolve, 32,
    )

    matched = p1.map_batches(
        lambda b: b.loc[b["kind"] == -1,
                        ["event_id", "user_id", "match_event_id", "gap_us"]],
        batch_format="pandas",
    )
    return matched.union(p3)


def range_join(sf_dir: str, left_type: str = "purchase",
               right_type: str = "click", window_minutes: int = 30,
               bucket_hours: int = 24) -> rd.Dataset:
    """RANGE join aggregate: for each ``left_type`` event, how many
    ``right_type`` events the same user produced in the preceding
    ``window_minutes`` (inclusive of equal timestamps).

    Hot-key-safe in ONE salted exchange: rows co-locate by
    (user_id, bucket); a right event within ``window`` of its bucket's
    end is REPLICATED into the next bucket (≤2x the right rows, exact
    because bucket width >= window means a left's window spans at most
    its own and the previous bucket).  The per-partition kernel is fully
    vectorized: one composite-key sort over (group, t) and two
    ``searchsorted`` probes per left block — no per-user Python loop, no
    pair explosion.  Emits (event_id, user_id, n_recent).
    """
    bucket_us = bucket_hours * 3600 * _US
    win_us = window_minutes * 60 * _US
    if bucket_us < win_us:
        raise ValueError("bucket width must be >= the range window")
    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")

    def route(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        bucket = ts_us // bucket_us
        home = b.copy()
        home["bucket"] = bucket
        is_r = (b["event_type"] == right_type).to_numpy()
        spill_mask = is_r & (ts_us % bucket_us >= bucket_us - win_us)
        spill = b[spill_mask].copy()
        spill["bucket"] = bucket[spill_mask] + 1
        return pd.concat([home, spill], ignore_index=True)

    routed = ds.map_batches(route, batch_format="pandas")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64", "n_recent": "int64"}
        left_mask = (g["event_type"] == left_type).to_numpy()
        if not left_mask.any():
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
        # joint group ids over (user_id, bucket) for lefts and rights
        ub = np.stack([g["user_id"].to_numpy(dtype=np.int64),
                       g["bucket"].to_numpy(dtype=np.int64)], axis=1)
        _, gid = np.unique(ub, axis=0, return_inverse=True)
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # group-relative time keeps the composite key inside int64:
        # span <= bucket + window, groups < 2^50/span in any real partition
        gmin = np.full(gid.max() + 1, np.iinfo(np.int64).max)
        np.minimum.at(gmin, gid, ts_us)
        t_rel = ts_us - gmin[gid]
        span = np.int64(bucket_us + win_us + 2)
        comp = gid.astype(np.int64) * span + t_rel
        r_comp = np.sort(comp[~left_mask])
        l_comp = comp[left_mask]
        hi = np.searchsorted(r_comp, l_comp, side="right")
        lo = np.searchsorted(
            r_comp,
            gid[left_mask].astype(np.int64) * span
            + np.maximum(t_rel[left_mask] - win_us, 0),
            side="left")
        # lefts only count in their HOME bucket partition (spills are
        # right-only), so each left is emitted exactly once
        return pd.DataFrame({
            "event_id": g.loc[left_mask, "event_id"].to_numpy(dtype=np.int64),
            "user_id": g.loc[left_mask, "user_id"].to_numpy(dtype=np.int64),
            "n_recent": (hi - lo).astype(np.int64),
        })

    from ontology_matcher_ray.stages import exchange

    return exchange.partitioned_apply(
        routed, ["user_id", "bucket"], per_partition, 32
    )


def sessionize(sf_dir: str, gap_minutes: int = 30,
               bucket_hours: int = 24) -> rd.Dataset:
    """Session windows per user: events within ``gap_minutes`` of the
    previous event share a session; ``session_id`` is the user's 0-based
    session ordinal in time order.

    Hot-key-safe three-pass shape (same pattern as ``asof_join``):

    1. salted exchange on (user_id, bucket): vectorized diff/cumsum
       sessionization WITHIN each bucket -> per-bucket session summaries;
    2. user-keyed exchange over BOUNDARY summaries only (first + last
       session per bucket, <= 2 rows per user-bucket): detects sessions
       spanning bucket edges, merges chains (a chain crosses a middle
       bucket only when that bucket holds a single session), and computes
       each bucket's session-ordinal offset — all vectorized;
    3. salted exchange joins offsets + drop-markers back onto the
       summaries; merged chains are emitted by pass 2 with combined
       start/end/count.

    Exactness: with bucket width >= gap, an empty bucket between two
    events forces a time gap > gap_minutes, so only ADJACENT buckets can
    merge — the chain algebra in pass 2 is therefore complete, and the
    output is bit-identical to the single-exchange formulation (the SQL
    oracle is unchanged).  Emits (user_id, session_id, n_events,
    session_start, session_end).
    """
    gap = pd.Timedelta(minutes=gap_minutes)
    bucket_us = bucket_hours * 3600 * _US
    if bucket_us < gap_minutes * 60 * _US:
        raise ValueError("bucket width must be >= the session gap")
    ds = read_events(sf_dir, columns=["user_id", "ts", "event_id"])
    ds = ds.map_batches(lambda b: _with_bucket(b, bucket_us), batch_format="pandas")

    from ontology_matcher_ray.stages import exchange

    S_COLS = {"user_id": "int64", "bucket": "int64", "local_seq": "int64",
              "n_b": "int64", "n_events": "int64",
              "start": "datetime64[us]", "end": "datetime64[us]",
              "kind": "int64", "offset": "int64", "sid": "int64"}

    def _empty_s() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in S_COLS.items()})

    def _s_frame(**named) -> pd.DataFrame:
        n = len(next(iter(named.values())))
        out = {}
        for c, t in S_COLS.items():
            if c in named:
                out[c] = pd.Series(named[c]).astype(t).to_numpy()
            elif t == "datetime64[us]":
                out[c] = np.full(n, _EPOCH0, dtype="datetime64[us]")
            else:
                out[c] = np.full(n, -1, dtype=np.int64)
        return pd.DataFrame(out)

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _empty_s()
        g = g.sort_values(["user_id", "bucket", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy()
        bkt = g["bucket"].to_numpy()
        new_grp = np.empty(len(g), dtype=bool)
        new_grp[0:1] = True
        new_grp[1:] = (uid[1:] != uid[:-1]) | (bkt[1:] != bkt[:-1])
        brk = new_grp | (g["ts"].diff() > gap).to_numpy()
        run = np.cumsum(brk)
        first_run = pd.Series(run).groupby([uid, bkt]).transform("min").to_numpy()
        g["local_seq"] = (run - first_run).astype("int64")
        out = g.groupby(["user_id", "bucket", "local_seq"], sort=False).agg(
            n_events=("event_id", "size"),
            start=("ts", "min"), end=("ts", "max"),
        ).reset_index()
        out["n_b"] = out.groupby(["user_id", "bucket"], sort=False)[
            "local_seq"].transform("max") + 1
        return _s_frame(user_id=out["user_id"], bucket=out["bucket"],
                        local_seq=out["local_seq"], n_b=out["n_b"],
                        n_events=out["n_events"], start=out["start"],
                        end=out["end"], kind=np.full(len(out), -1))

    p1 = exchange.partitioned_apply(
        ds, ["user_id", "bucket"], bucket_sessions, 32
    ).materialize()

    def reconcile(g: pd.DataFrame) -> pd.DataFrame:
        """Boundary rows (first/last session per bucket) -> offsets per
        bucket (kind 0), chain drop-markers (kind 1), merged chain
        sessions (kind 2).  Vectorized across all users in the partition."""
        if g.empty:
            return _empty_s()
        firsts = g[g["local_seq"] == 0]
        lasts = g[g["local_seq"] == g["n_b"] - 1]
        bs = firsts.merge(
            lasts, on=["user_id", "bucket", "n_b"], suffixes=("_f", "_l")
        ).sort_values(["user_id", "bucket"], ignore_index=True)
        u = bs["user_id"].to_numpy()
        same_prev = np.zeros(len(bs), dtype=bool)
        same_prev[1:] = u[1:] == u[:-1]
        prev_end_l = bs["end_l"].shift(1)
        merge_in = (same_prev
                    & ((bs["start_f"] - prev_end_l) <= gap).to_numpy())
        x = bs["n_b"].to_numpy() - merge_in.astype(np.int64)
        base = pd.Series(x).groupby(u).cumsum().to_numpy() - x
        offset = base - merge_in.astype(np.int64)
        pieces = [_s_frame(user_id=bs["user_id"], bucket=bs["bucket"],
                           offset=offset, kind=np.zeros(len(bs)))]
        if merge_in.any():
            e = bs.assign(
                _off=offset,
                _prev_bucket=bs["bucket"].shift(1),
                _prev_off=pd.Series(offset).shift(1),
                _prev_n_b=bs["n_b"].shift(1),
                _prev_n_l=bs["n_events_l"].shift(1),
                _prev_start_l=bs["start_l"].shift(1),
            )[merge_in].reset_index(drop=True)
            # chain continuation: this edge extends the previous edge's
            # chain iff same user, buckets adjacent in the edge list, and
            # the shared bucket holds a single session
            eu = e["user_id"].to_numpy()
            ebk = e["bucket"].to_numpy()
            epb = e["_prev_bucket"].to_numpy()
            enb = e["n_b"].to_numpy()
            cont = np.zeros(len(e), dtype=bool)
            cont[1:] = ((eu[1:] == eu[:-1]) & (epb[1:] == ebk[:-1])
                        & (enb[:-1] == 1))
            e["chain"] = np.cumsum(~cont)
            agg = e.groupby("chain", sort=True).agg(
                user_id=("user_id", "first"),
                sid_off=("_prev_off", "first"),
                sid_nb=("_prev_n_b", "first"),
                base_n=("_prev_n_l", "first"),
                start=("_prev_start_l", "first"),
                end=("end_f", "last"),
                add_n=("n_events_f", "sum"),
            ).reset_index(drop=True)
            pieces.append(_s_frame(
                user_id=agg["user_id"],
                sid=agg["sid_off"] + agg["sid_nb"] - 1,
                n_events=agg["base_n"] + agg["add_n"],
                start=agg["start"], end=agg["end"],
                kind=np.full(len(agg), 2)))
            drops = pd.concat([
                pd.DataFrame({"user_id": e["user_id"],
                              "bucket": e["_prev_bucket"].astype("int64"),
                              "local_seq": (e["_prev_n_b"] - 1).astype("int64")}),
                pd.DataFrame({"user_id": e["user_id"],
                              "bucket": e["bucket"],
                              "local_seq": np.zeros(len(e), dtype=np.int64)}),
            ], ignore_index=True).drop_duplicates()
            pieces.append(_s_frame(user_id=drops["user_id"],
                                   bucket=drops["bucket"],
                                   local_seq=drops["local_seq"],
                                   kind=np.ones(len(drops))))
        return pd.concat(pieces, ignore_index=True)

    boundary = p1.map_batches(
        lambda b: b[(b["local_seq"] == 0) | (b["local_seq"] == b["n_b"] - 1)],
        batch_format="pandas",
    )
    p2 = exchange.partitioned_apply(boundary, ["user_id"], reconcile, 32)

    OUT_COLS = {"user_id": "int64", "session_id": "int64",
                "n_events": "int64", "session_start": "datetime64[us]",
                "session_end": "datetime64[us]"}

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=t) for c, t in OUT_COLS.items()})
        sess = g[g["kind"] == -1]
        offs = g.loc[g["kind"] == 0, ["user_id", "bucket", "offset"]].rename(
            columns={"offset": "_off"})
        drops = g.loc[g["kind"] == 1, ["user_id", "bucket", "local_seq"]]
        comb = g[g["kind"] == 2]
        m = sess.merge(offs, on=["user_id", "bucket"], how="left")
        m = m.merge(drops.assign(_drop=1),
                    on=["user_id", "bucket", "local_seq"], how="left")
        m = m[m["_drop"].isna()]
        out = pd.DataFrame({
            "user_id": m["user_id"].astype("int64"),
            "session_id": (m["_off"] + m["local_seq"]).astype("int64"),
            "n_events": m["n_events"].astype("int64"),
            "session_start": m["start"].astype("datetime64[us]"),
            "session_end": m["end"].astype("datetime64[us]"),
        })
        if len(comb):
            out = pd.concat([out, pd.DataFrame({
                "user_id": comb["user_id"].astype("int64"),
                "session_id": comb["sid"].astype("int64"),
                "n_events": comb["n_events"].astype("int64"),
                "session_start": comb["start"].astype("datetime64[us]"),
                "session_end": comb["end"].astype("datetime64[us]"),
            })], ignore_index=True)
        return out

    # kind-2 rows carry bucket = -1; they hash to some partition and pass
    # straight through `assemble` — their fields are already final
    return exchange.partitioned_apply(
        p1.union(p2), ["user_id", "bucket"], assemble, 32
    )


def funnel(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Click -> purchase conversion funnel per user: first click, first
    purchase at-or-after it, and a converted flag.

    Plan: prune to (user_id, ts, event_type), filter to the two funnel
    stages in the scan pass (shuffle volume = funnel events only), reduce
    clicks to one per-user min per BLOCK in the same pass, one user_id
    exchange, then a vectorized kernel: per user, the first purchase >=
    first click via a merge of per-user minima.  Timestamps leave as
    epoch MICROSECONDS (int64) so the result is value-hash comparable
    with the oracle's ``epoch_us``.

    Hot-user note: per-user rows fit a partition (the salted pattern from
    sessionize applies if one user dominates).
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_events(sf_dir, columns=["user_id", "ts", "event_type"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        keep = (et == "click") | (et == "purchase")
        b = b[keep]
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        f = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "ts_us": us,
                "is_click": (b["event_type"].to_numpy() == "click"),
            }
        )
        # block-local combiner: clicks collapse to one min per user
        clicks = (
            f[f["is_click"]]
            .groupby("user_id", sort=False)["ts_us"]
            .min()
            .reset_index()
        )
        clicks["is_click"] = True
        purchases = f[~f["is_click"]]
        return pd.concat([clicks, purchases], ignore_index=True)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        is_click = g["is_click"].to_numpy()
        fc = (
            g[is_click]
            .groupby("user_id", sort=False)["ts_us"]
            .min()
            .rename("first_click_us")
            .reset_index()
        )
        p = g[~is_click].merge(fc, on="user_id", how="inner")
        p = p[p["ts_us"].to_numpy() >= p["first_click_us"].to_numpy()]
        fp = (
            p.groupby("user_id", sort=False)["ts_us"]
            .min()
            .rename("first_purchase_us")
            .reset_index()
        )
        out = fc.merge(fp, on="user_id", how="left")
        has = out["first_purchase_us"].notna().to_numpy()
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64").to_numpy(),
                "first_click_us": out["first_click_us"].astype("int64").to_numpy(),
                "first_purchase_us": np.where(
                    has, out["first_purchase_us"].fillna(-1).to_numpy(), -1
                ).astype(np.int64),
                "converted": has.astype(np.int64),
            }
        )

    part = ds.map_batches(prep, batch_format="pandas")
    return exchange.partitioned_apply(part, ["user_id"], per_user, num_partitions)


def event_props_stats(sf_dir: str) -> pd.DataFrame:
    """Typed-field stats extracted from the semi-structured ``props``
    JSON-string column: per event_type, the count of events, the count
    with a parseable integer ``k``, and k's sum/min/max.

    Extraction is a VECTORIZED RE2 kernel on zero-copy Arrow
    (``pyarrow.compute.extract_regex``) — no per-row json.loads in the
    hot path; rows whose props lack an integer k surface as nulls and
    are excluded from the stats (counted in ``n_events`` -
    ``n_with_k``).  A full nested-JSON decode would instead be a
    stateful actor stage holding a streaming parser; for flat metadata
    keys — the common case in training-data pipelines — the regex
    kernel is the scale path.  Per-batch Arrow group_by combiner,
    bounded driver reduce (|event types| ~ 5)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ontology_matcher_ray.stages import exchange

    ds = read_events(sf_dir, columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            pc.cast(t["props"], pa.string()), pattern=r'"k":\s*(?P<k>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())  # null on miss
        tbl = pa.table({"event_type": t["event_type"], "k": k})
        agg = tbl.group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max"),
             ("event_type", "count")]
        )
        # null-free int64 partials keep the driver reduce EXACT: one
        # null (a batch where a type has no parseable k) would float64-
        # ify the collected pandas column and round sums above 2^53.
        # Identity sentinels per aggregate: sum 0, min +int64max,
        # max +int64min; all-miss types are rewritten to the documented
        # 0-sentinels after the reduce (n_with_k == 0 marks them).
        i64 = pa.int64()
        info = np.iinfo(np.int64)
        return pa.table({
            "event_type": agg["event_type"],
            "n_events": pc.cast(agg["event_type_count"], i64),
            "n_with_k": pc.cast(agg["k_count"], i64),
            "k_sum": pc.coalesce(pc.cast(agg["k_sum"], i64),
                                 pa.scalar(0, i64)),
            "k_min": pc.coalesce(pc.cast(agg["k_min"], i64),
                                 pa.scalar(info.max, i64)),
            "k_max": pc.coalesce(pc.cast(agg["k_max"], i64),
                                 pa.scalar(info.min, i64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = exchange.small_grouped_agg(
        partials, ["event_type"],
        lambda g: g.agg(n_events=("n_events", "sum"),
                        n_with_k=("n_with_k", "sum"),
                        k_sum=("k_sum", "sum"),
                        k_min=("k_min", "min"),
                        k_max=("k_max", "max")),
    )
    # 0-sentinels where NO row of a type had a parseable k (the identity
    # sentinels above otherwise surface): deterministic and mirrored by
    # the oracle's COALESCE
    none = out["n_with_k"] == 0
    for c in ("k_sum", "k_min", "k_max"):
        out[c] = out[c].astype("int64")
        out.loc[none, c] = 0
    return out


def event_type_distinct_users(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """EXACT distinct count per group (the exact counterpart of the HLL
    sketch in docs_train): distinct users per event_type.

    Per-block combiner dedups (event_type, user_id) pairs, the distinct
    exchange finalizes pair uniqueness, then a per-block count combiner +
    a 5-row exchange aggregates.  Shuffle volume is bounded by the
    DISTINCT pair count, not the event count.
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_events(sf_dir, columns=["event_type", "user_id"])
    pairs = exchange.distinct(
        ds, ["event_type", "user_id"], num_partitions=num_partitions
    )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "n_users": np.ones(len(b), dtype=np.int64),
            }
        )
        return f.groupby("event_type", sort=False).sum().reset_index()

    # 5 event types: bounded driver reduce of the count combiner
    return exchange.small_grouped_agg(
        pairs.map_batches(combine, batch_format="pandas"),
        ["event_type"],
        lambda g: g.sum(),
    )


def event_transition_matrix(sf_dir: str,
                            num_partitions: int = 16) -> rd.Dataset:
    """(prev_type, next_type, n): Markov transition counts over each
    user's event stream in (ts, event_id) time order — the
    user-journey / funnel-discovery aggregate.

    One user-keyed exchange co-locates a user's events; the partition
    kernel sorts locally, derives consecutive pairs with one shifted
    comparison (no Python loop), and PRE-AGGREGATES to (prev, next, n)
    before the second, pair-keyed exchange — so the pair shuffle is
    bounded by the type-domain square per partition, not the event
    count.  The (ts, event_id) tie-break makes equal-timestamp streams
    deterministic on both engines (the SQL oracle orders identically).
    A pathologically hot user concentrates one partition (the asof_join
    trade-off); at cluster scale bucket the user key like ``sessionize``
    does and stitch boundary pairs.
    """
    from ontology_matcher_ray.stages import exchange

    ds = read_events(sf_dir, columns=["user_id", "ts", "event_id",
                                      "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"prev_type": pd.Series(dtype=object),
                                 "next_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        same = u[1:] == u[:-1]
        f = pd.DataFrame({"prev_type": t[:-1][same],
                          "next_type": t[1:][same],
                          "n": np.int64(1)})
        return (f.groupby(["prev_type", "next_type"], sort=False)
                 .agg(n=("n", "sum")).reset_index())

    partial = exchange.partitioned_apply(ds, ["user_id"], pairs,
                                         num_partitions)
    return exchange.grouped_agg(
        partial, ["prev_type", "next_type"],
        lambda gb: gb.agg(n=("n", "sum")), num_partitions)


def event_transition_profile(sf_dir: str,
                             num_partitions: int = 16) -> pd.DataFrame:
    """Per-source-type outgoing-transition profile over the matrix:
    (event_type, n_out, n_next_distinct, top_next, top_next_n) with the
    deterministic (count desc, type asc) argmax.  Bounded by the
    type-domain square, so the finalize is a driver frame — the same
    contract as the other event_type_profile components."""
    tm = event_transition_matrix(sf_dir, num_partitions).to_pandas()
    if not len(tm):
        return pd.DataFrame({"event_type": pd.Series(dtype=object),
                             "n_out": pd.Series(dtype="int64"),
                             "n_next_distinct": pd.Series(dtype="int64"),
                             "top_next": pd.Series(dtype=object),
                             "top_next_n": pd.Series(dtype="int64")})
    agg = (tm.groupby("prev_type", sort=False)
             .agg(n_out=("n", "sum"), n_next_distinct=("next_type", "size"))
             .reset_index())
    top = tm.sort_values(["prev_type", "n", "next_type"],
                         ascending=[True, False, True],
                         kind="mergesort").drop_duplicates("prev_type")
    out = agg.merge(
        top.rename(columns={"next_type": "top_next", "n": "top_next_n"})
           [["prev_type", "top_next", "top_next_n"]],
        on="prev_type")
    return out.rename(columns={"prev_type": "event_type"}).astype(
        {"n_out": "int64", "n_next_distinct": "int64",
         "top_next_n": "int64"})


def user_retention(sf_dir: str, bucket_days: int = 7,
                   num_partitions: int = 16) -> rd.Dataset:
    """(cohort, age, n_users): cohort retention — users bucketed by the
    ``bucket_days``-day period of their FIRST event (the cohort), counted
    distinct in every later period they return (age = periods since the
    cohort period, 0 = the cohort period itself).

    All-integer bucketing (``epoch_us // bucket_us``) so the result is
    exactly SQL-recomputable.  Shape: a per-batch (user, min_ts) combiner
    + one user exchange derives each user's cohort (shuffle bounded by
    the user domain, not events); the cohort table joins back onto the
    event stream through the distributed ``hash_join`` (both sides
    corpus-scale, 16-byte rows); distinct (cohort, age, user) triples via
    the distinct exchange; a bounded count finalize.  No driver-side
    pass over events anywhere."""
    from ontology_matcher_ray.stages import exchange

    bucket_us = bucket_days * 86_400 * 1_000_000
    ds = read_events(sf_dir, columns=["user_id", "ts"])

    def ts_int(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            # normalize to µs epoch regardless of source precision (the
            # sf tables are timestamp[us]; ad-hoc pandas parquet is [ns])
            "t": b["ts"].astype("datetime64[us]").astype("int64"),
        })

    ev = ds.map_batches(ts_int, batch_format="pandas")
    first_partial = ev.map_batches(
        lambda b: b.groupby("user_id", sort=False)
                   .agg(t=("t", "min")).reset_index(),
        batch_format="pandas")
    cohorts = exchange.grouped_agg(
        first_partial, ["user_id"], lambda gb: gb.agg(t=("t", "min")),
        num_partitions,
    ).map_batches(
        lambda b: pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "cohort": (b["t"].astype("int64") // bucket_us).astype("int64"),
        }),
        batch_format="pandas")

    joined = exchange.hash_join(
        ev, cohorts, "user_id", "user_id",
        {"user_id": "int64", "t": "int64"},
        {"user_id": "int64", "cohort": "int64"},
        num_partitions=num_partitions)

    def age_rows(b: pd.DataFrame) -> pd.DataFrame:
        age = (b["t"].to_numpy(np.int64) // bucket_us
               - b["cohort"].to_numpy(np.int64))
        return pd.DataFrame({
            "cohort": b["cohort"].astype("int64"),
            "age": age.astype("int64"),
            "user_id": b["user_id"].astype("int64"),
        }).drop_duplicates()

    triples = exchange.distinct(
        joined.map_batches(age_rows, batch_format="pandas"),
        ["cohort", "age", "user_id"], num_partitions)
    counts = triples.map_batches(
        lambda b: b.groupby(["cohort", "age"], sort=False)
                   .size().reset_index(name="n_users")
                   .astype({"n_users": "int64"}),
        batch_format="pandas")
    return exchange.grouped_agg(
        counts, ["cohort", "age"],
        lambda gb: gb.agg(n_users=("n_users", "sum")), num_partitions)


# --------------------------------------------------------------------------
# Stream hygiene: debounce (duplicate-burst suppression) and latest-wins
# compaction (the CDC/upsert "compact the changelog" primitive)
# --------------------------------------------------------------------------

DEBOUNCE_GAP_SECONDS = 60
# per-row fingerprint domain for the driver-gate profiles: 2^45 keeps
# batch partials (<= 4096 rows) and the cross-partial sum inside int64;
# the SQL side sums exactly in HUGEINT and reduces % MOD at the end
EVENT_FP_MOD = 1 << 45


def debounce(sf_dir: str, gap_seconds: int = DEBOUNCE_GAP_SECONDS,
             num_partitions: int = 16) -> rd.Dataset:
    """Keep an event iff it is the first of its ``(user_id, event_type)``
    stream or arrived >= ``gap_seconds`` after the PREVIOUS event of that
    stream (lag semantics — the throttle window slides with every event,
    matching SQL ``lag()`` exactly, so the op is fully SQL-recomputable).
    Emits ``(event_id, user_id, event_type, gap_us)`` with ``gap_us=-1``
    for stream-first events.

    One ``(user_id, event_type)``-keyed exchange co-locates each stream;
    the kernel sorts on the deterministic ``(ts, event_id)`` tie-break
    and computes gaps with one shifted comparison — no Python loop, no
    driver state.  Hot streams concentrate a partition (the
    transition-matrix trade-off); at cluster scale salt with a coarse
    time bucket like ``sessionize`` and reconcile boundary gaps."""
    from ontology_matcher_ray.stages import exchange

    gap_us = int(gap_seconds) * _US
    ds = read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                      "event_type"])

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap = np.full(len(g), -1, dtype=np.int64)
        if len(g) > 1:
            d = t[1:] - t[:-1]
            gap[1:] = np.where(same[1:], d, -1)
        keep = ~same | (gap >= gap_us)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[keep].astype("int64"),
            "user_id": u[keep].astype("int64"),
            "event_type": et[keep],
            "gap_us": gap[keep],
        })

    return exchange.partitioned_apply(ds, ["user_id", "event_type"], kern,
                                      num_partitions)


def compact_latest(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Latest-wins changelog compaction: one row per ``(user_id,
    event_type)`` carrying the most recent event (max ``(ts, event_id)``)
    plus the collapsed version count — the CDC/upsert table-compaction
    primitive.  Emits ``(user_id, event_type, last_event_id, last_ts_us,
    last_value, n_versions)``.

    Classic combiner-then-exchange argmax: each batch reduces to at most
    one row per key it sees (sort + keep-last + partial count), the
    key exchange merges partials with the same argmax kernel and sums the
    counts — event volume never shuffles, only per-key survivors."""
    from ontology_matcher_ray.stages import exchange

    ds = read_events(sf_dir, columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "event_type": b["event_type"],
            "last_event_id": b["event_id"].astype("int64"),
            "last_ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
            "last_value": b["value"].astype("float64"),
            "n_versions": np.int64(1),
        })
        f = f.sort_values(["user_id", "event_type", "last_ts_us",
                           "last_event_id"], kind="mergesort")
        n = (f.groupby(["user_id", "event_type"], sort=False)["n_versions"]
              .sum().reset_index())
        last = f.drop_duplicates(["user_id", "event_type"], keep="last")
        return last.drop(columns=["n_versions"]).merge(
            n, on=["user_id", "event_type"])

    def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "last_ts_us",
                           "last_event_id"], kind="mergesort")
        n = (g.groupby(["user_id", "event_type"], sort=False)["n_versions"]
              .sum().reset_index())
        last = g.drop_duplicates(["user_id", "event_type"], keep="last")
        return last.drop(columns=["n_versions"]).merge(
            n, on=["user_id", "event_type"])

    parts = ds.map_batches(partial, batch_format="pandas")
    return exchange.partitioned_apply(parts, ["user_id", "event_type"],
                                      merge_partials, num_partitions)


def _md5_profile(ds: rd.Dataset, fp_of, num_partitions: int = 8):
    """Per-event-type (n, fp) rollup of a row-level dataset: fp = the
    md5half row fingerprint summed % EVENT_FP_MOD.  Driver-gate glue (the
    md5 loop exists only so a bounded per-type row can value-hash every
    underlying row in the composite); production consumers stream the
    row-level dataset itself."""
    from ontology_matcher_ray.functions.hashing import md5half
    from ontology_matcher_ray.stages import exchange

    def part(b: pd.DataFrame) -> pd.DataFrame:
        fp = np.fromiter(
            (md5half(s) % EVENT_FP_MOD for s in fp_of(b)),
            dtype=np.int64, count=len(b))
        f = pd.DataFrame({"event_type": b["event_type"],
                          "n": np.int64(1), "fp": fp})
        out = (f.groupby("event_type", sort=False)
                .agg(n=("n", "sum"), fp=("fp", "sum")).reset_index())
        out["fp"] %= EVENT_FP_MOD
        return out

    parts = ds.map_batches(part, batch_format="pandas")
    out = exchange.small_grouped_agg(
        parts, ["event_type"],
        lambda gb: gb.agg(n=("n", "sum"), fp=("fp", "sum")))
    out["fp"] = (out["fp"] % EVENT_FP_MOD).astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type", ignore_index=True)


def debounce_profile(sf_dir: str,
                     gap_seconds: int = DEBOUNCE_GAP_SECONDS) -> pd.DataFrame:
    """(event_type, n_debounced, debounce_fp): bounded per-type rollup of
    ``debounce`` for the driver composite — the fingerprint hashes every
    kept row's (event_id, gap_us)."""
    df = _md5_profile(
        debounce(sf_dir, gap_seconds),
        lambda b: (f"{e}:{g}" for e, g in
                   zip(b["event_id"].astype("int64"),
                       b["gap_us"].astype("int64"))))
    return df.rename(columns={"n": "n_debounced", "fp": "debounce_fp"})


def compact_profile(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_streams, compact_fp): bounded per-type rollup of
    ``compact_latest`` — the fingerprint hashes every surviving stream's
    (user_id, last_event_id, n_versions)."""
    df = _md5_profile(
        compact_latest(sf_dir),
        lambda b: (f"{u}:{e}:{n}" for u, e, n in
                   zip(b["user_id"].astype("int64"),
                       b["last_event_id"].astype("int64"),
                       b["n_versions"].astype("int64"))))
    return df.rename(columns={"n": "n_streams", "fp": "compact_fp"})

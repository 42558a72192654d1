"""Hot-key safety of the per-user event operators (VERDICT r02 item 1).

One user owns ~80% of all events; the salted (user_id, bucket) exchanges
must (a) spread that user across partitions instead of concentrating
them, and (b) still produce output bit-identical to an unsalted
single-machine pandas reference — including sessions that chain across
MANY bucket boundaries and as-of carries over click-free buckets.
"""

import os

import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines import events as ev
from ontology_matcher_ray.stages import exchange

GAP_MIN = 30
WIN_MIN = 30


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """~10k events, user 7 holds 80% as an unbroken 6-minute cadence over
    ~20 days (one session spanning ~20 bucket boundaries); sparse users
    exercise same-bucket breaks, midnight merges, and no-click buckets."""
    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0

    def add(user, ts, etype):
        nonlocal eid
        rows.append((eid, ts.floor("us"), user, etype, float(eid % 97)))
        eid += 1

    # hot user 7: 8000 events, every 6 min, alternating click/purchase
    for i in range(8000):
        add(7, base + pd.Timedelta(minutes=6 * i),
            "click" if i % 2 else "purchase")
    # user 8: midnight-crossing session pairs (23:50 + 00:10) for 10 days
    for d in range(10):
        add(8, base + pd.Timedelta(days=d, hours=23, minutes=50), "click")
        add(8, base + pd.Timedelta(days=d + 1, minutes=10), "purchase")
    # user 9: same-bucket session breaks (gap 45 min > 30)
    for d in range(10):
        add(9, base + pd.Timedelta(days=d, hours=10), "purchase")
        add(9, base + pd.Timedelta(days=d, hours=10, minutes=45), "purchase")
    # user 10: purchases in click-free buckets (carry from day 0's click)
    add(10, base + pd.Timedelta(hours=1), "click")
    for d in range(2, 12):
        add(10, base + pd.Timedelta(days=d, hours=5), "purchase")
    # user 11: purchases before ANY click (-1 sentinels)
    for d in range(5):
        add(11, base + pd.Timedelta(days=d, hours=3), "purchase")
    add(11, base + pd.Timedelta(days=20), "click")
    # filler users with a few random-ish events each
    rng = np.random.RandomState(5)
    for u in range(12, 30):
        for _ in range(40):
            add(u, base + pd.Timedelta(minutes=int(rng.randint(0, 28 * 24 * 60))),
                "click" if rng.rand() < 0.5 else "purchase")

    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("skew")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d), df


def _collect(ds) -> pd.DataFrame:
    frames = list(ds.iter_batches(batch_size=8192, batch_format="pandas"))
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def test_salted_key_bounds_partition_size(skew_dir):
    """The structural property itself: on the salted key no partition
    holds more than a small fraction of the hot user's events (on the raw
    user_id key one partition would hold all 80%)."""
    _, df = skew_dir
    b = ev._with_bucket(df, 24 * 3600 * ev._US)
    salted = exchange.add_partition_column(b, ["user_id", "bucket"], 32)
    frac_salted = salted[exchange.PARTITION_COL].value_counts().max() / len(df)
    plain = exchange.add_partition_column(df.copy(), ["user_id"], 32)
    frac_plain = plain[exchange.PARTITION_COL].value_counts().max() / len(df)
    assert frac_plain > 0.5          # the hazard is real on this input
    assert frac_salted < 0.2         # and the salt removes it


def _sessionize_ref(df: pd.DataFrame, gap_min: int) -> pd.DataFrame:
    g = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    uid = g["user_id"].to_numpy()
    new_user = np.empty(len(g), dtype=bool)
    new_user[0:1] = True
    new_user[1:] = uid[1:] != uid[:-1]
    brk = new_user | (g["ts"].diff() > pd.Timedelta(minutes=gap_min)).to_numpy()
    run = np.cumsum(brk)
    first = pd.Series(run).groupby(uid).transform("min").to_numpy()
    g["session_id"] = (run - first).astype("int64")
    return g.groupby(["user_id", "session_id"], sort=False).agg(
        n_events=("event_id", "size"),
        session_start=("ts", "min"), session_end=("ts", "max"),
    ).reset_index()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, ignore_index=True)
            .reset_index(drop=True))


def test_sessionize_matches_reference_on_skew(skew_dir):
    d, df = skew_dir
    got = _norm(_collect(ev.sessionize(d, gap_minutes=GAP_MIN)))
    want = _norm(_sessionize_ref(df, GAP_MIN))
    pd.testing.assert_frame_equal(got, want)
    # the hot user's unbroken cadence must surface as ONE chained session
    hot = got[got["user_id"] == 7]
    assert len(hot) == 1 and int(hot["n_events"].iloc[0]) == 8000


def _asof_ref(df: pd.DataFrame) -> pd.DataFrame:
    left = df[df["event_type"] == "purchase"].sort_values(
        ["ts", "event_id"], ignore_index=True)
    right = df[df["event_type"] == "click"].sort_values(
        ["ts", "event_id"], ignore_index=True)
    j = pd.merge_asof(
        left, right.rename(columns={"event_id": "match_event_id", "ts": "match_ts"}),
        left_on="ts", right_on="match_ts", by="user_id", direction="backward")
    return pd.DataFrame({
        "event_id": j["event_id"].astype("int64"),
        "user_id": j["user_id"].astype("int64"),
        "match_event_id": j["match_event_id"].fillna(-1).astype("int64"),
        "gap_us": np.where(
            j["match_event_id"].notna(),
            (j["ts"] - j["match_ts"]).to_numpy()
            .astype("timedelta64[us]").astype("int64"),
            -1).astype("int64"),
    })


def test_asof_matches_reference_on_skew(skew_dir):
    d, df = skew_dir
    got = _norm(_collect(ev.asof_join(d)))
    want = _norm(_asof_ref(df))
    pd.testing.assert_frame_equal(got, want)
    # carry across click-free buckets: user 10's purchases all match the
    # day-0 click; user 11's early purchases are -1
    by_user = got.set_index("event_id")
    u10 = got[got["user_id"] == 10]
    assert (u10["match_event_id"] >= 0).all()
    u11 = want[(want["user_id"] == 11)]
    assert (u11["match_event_id"] == -1).all()


def _range_ref(df: pd.DataFrame, win_min: int) -> pd.DataFrame:
    win = pd.Timedelta(minutes=win_min)
    left = df[df["event_type"] == "purchase"]
    right = df[df["event_type"] == "click"]
    rows = []
    rg = {u: np.sort(g["ts"].to_numpy()) for u, g in right.groupby("user_id")}
    for u, g in left.groupby("user_id"):
        rts = rg.get(u, np.array([], dtype="datetime64[us]"))
        lts = g["ts"].to_numpy()
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - win, side="left")
        for e, n in zip(g["event_id"].to_numpy(), (hi - lo)):
            rows.append((int(e), int(u), int(n)))
    return pd.DataFrame(rows, columns=["event_id", "user_id", "n_recent"])


def test_range_join_matches_reference_on_skew(skew_dir):
    d, df = skew_dir
    got = _norm(_collect(ev.range_join(d, window_minutes=WIN_MIN)))
    want = _norm(_range_ref(df, WIN_MIN))
    pd.testing.assert_frame_equal(got, want)


def test_event_props_stats_matches_pandas(tmp_path):
    """Vectorized RE2 extraction of props.k: parseable, missing-key,
    negative, and malformed-JSON rows over a synthetic events table —
    stats must match a plain-pandas recompute (misses excluded from the
    stats, counted via n_events - n_with_k), and an all-miss type gets
    the documented 0-sentinels."""
    import json

    from ontology_matcher_ray.pipelines.events import event_props_stats

    rows = []
    for i in range(200):
        et = ["click", "view", "broken"][i % 3]
        if et == "broken":
            props = "{not json"               # never a parseable k
        elif i % 10 == 0:
            props = json.dumps({"other": 1})  # missing key
        else:
            props = json.dumps({"k": (i - 100) * 3})
        rows.append((i, et, props))
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "props"])
    df["ts"] = pd.Timestamp("2026-01-01")
    df["user_id"] = df["event_id"] % 7
    df["value"] = 1.0
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)

    got = (event_props_stats(str(sf))
           .sort_values("event_type", ignore_index=True))

    ks = df["props"].str.extract(r'"k":\s*(-?\d+)')[0].astype("Int64")
    ref = (pd.DataFrame({"event_type": df["event_type"], "k": ks})
           .groupby("event_type")
           .agg(n_events=("k", "size"), n_with_k=("k", "count"),
                k_sum=("k", "sum"), k_min=("k", "min"), k_max=("k", "max"))
           .reset_index())
    for c in ("k_sum", "k_min", "k_max"):
        ref[c] = ref[c].fillna(0).astype("int64")
    ref = ref.sort_values("event_type", ignore_index=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "n_with_k": "int64"}),
        ref.astype({"n_events": "int64", "n_with_k": "int64"}),
    )
    broken = got.set_index("event_type").loc["broken"]
    assert broken["n_with_k"] == 0 and broken["k_sum"] == 0

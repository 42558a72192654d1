"""Stream hygiene ops (events.debounce / compact_latest): planted closed
forms (burst suppression with lag semantics, tie-break on equal
timestamps, latest-wins survivor + version counts), DuckDB parity on the
sf table for the full row-level outputs AND the per-type fingerprint
rollups, and partition invariance."""

import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray.functions.hashing import md5half
from ontology_matcher_ray.pipelines.events import (
    EVENT_FP_MOD,
    compact_latest,
    compact_profile,
    debounce,
    debounce_profile,
)

SF = "/root/testdata/sf0.001"

DEBOUNCE_SQL = """
WITH o AS (
  SELECT event_id, user_id, event_type,
         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id, event_type ORDER BY ts, event_id),
           -1) AS gap_us
  FROM events)
SELECT event_id, user_id, event_type, CAST(gap_us AS BIGINT) AS gap_us
FROM o WHERE gap_us = -1 OR gap_us >= {gap_us}
"""

COMPACT_SQL = """
SELECT user_id, event_type, event_id AS last_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
       value AS last_value, CAST(nv AS BIGINT) AS n_versions
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type) AS nv
      FROM events)
WHERE rn = 1
"""


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    d = tmp_path_factory.mktemp("hygiene")
    base = pd.Timestamp("2024-01-01")
    s = lambda sec: base + pd.Timedelta(seconds=sec)
    rows = [
        # user 1 click burst: 0s, 10s, 70s, 75s, 140s (gap 60s)
        (0, s(0), 1, "click", 1.0),
        (1, s(10), 1, "click", 2.0),
        (2, s(70), 1, "click", 3.0),
        (3, s(75), 1, "click", 4.0),
        (4, s(140), 1, "click", 5.0),
        # same user, different type: independent stream
        (5, s(5), 1, "view", 6.0),
        # user 2: equal timestamps -> event_id tie-break
        (6, s(0), 2, "click", 7.0),
        (7, s(0), 2, "click", 8.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["props"] = '{"k": 1}'
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_debounce_closed_form(planted, ray_session):
    got = debounce(planted, gap_seconds=60).to_pandas()
    kept = sorted(got["event_id"])
    # 0 first; 1 dropped (10s); 2 kept (60s from 10s); 3 dropped (5s);
    # 4 kept (65s from 75s); 5 first of view; 6 first; 7 dropped (0s gap)
    assert kept == [0, 2, 4, 5, 6]
    gaps = dict(zip(got["event_id"], got["gap_us"]))
    assert gaps[0] == -1 and gaps[5] == -1 and gaps[6] == -1
    assert gaps[2] == 60_000_000 and gaps[4] == 65_000_000


def test_compact_closed_form(planted, ray_session):
    got = compact_latest(planted).to_pandas()
    rows = {(r.user_id, r.event_type):
            (r.last_event_id, r.last_value, r.n_versions)
            for r in got.itertuples()}
    assert rows == {
        (1, "click"): (4, 5.0, 5),
        (1, "view"): (5, 6.0, 1),
        (2, "click"): (7, 8.0, 2),   # equal ts -> max event_id wins
    }


def test_debounce_sf_duckdb_parity(ray_session):
    from tests.util import assert_matches_oracle

    assert_matches_oracle(
        debounce(SF), DEBOUNCE_SQL.format(gap_us=60 * 1_000_000), SF)


def test_debounce_gap_param(ray_session):
    from tests.util import assert_matches_oracle

    assert_matches_oracle(
        debounce(SF, gap_seconds=600),
        DEBOUNCE_SQL.format(gap_us=600 * 1_000_000), SF)


def test_compact_sf_duckdb_parity(ray_session):
    from tests.util import assert_matches_oracle

    assert_matches_oracle(compact_latest(SF), COMPACT_SQL, SF)


def test_partition_invariance(ray_session):
    a = debounce(SF, num_partitions=3).to_pandas()
    b = debounce(SF, num_partitions=17).to_pandas()
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True),
        b.sort_values(key, ignore_index=True))
    c = compact_latest(SF, num_partitions=3).to_pandas()
    d = compact_latest(SF, num_partitions=17).to_pandas()
    key = ["user_id", "event_type"]
    pd.testing.assert_frame_equal(
        c.sort_values(key, ignore_index=True),
        d.sort_values(key, ignore_index=True))


def test_profiles_match_row_level(ray_session):
    """The per-type rollups must equal a direct recompute over the full
    row-level outputs (the glue itself is being trusted by the driver)."""
    db = debounce(SF).to_pandas()
    want_n = db.groupby("event_type").size()
    fp = np.array([md5half(f"{e}:{g}") % EVENT_FP_MOD
                   for e, g in zip(db["event_id"], db["gap_us"])],
                  dtype=object)
    want_fp = pd.Series(fp).groupby(db["event_type"].values).sum() % EVENT_FP_MOD
    prof = debounce_profile(SF)
    got = prof.set_index("event_type")
    assert (got["n_debounced"] == want_n).all()
    assert (got["debounce_fp"] == want_fp.astype("int64")).all()

    cp = compact_latest(SF).to_pandas()
    prof2 = compact_profile(SF).set_index("event_type")
    want_n2 = cp.groupby("event_type").size()
    fp2 = np.array([md5half(f"{u}:{e}:{n}") % EVENT_FP_MOD
                    for u, e, n in zip(cp["user_id"], cp["last_event_id"],
                                       cp["n_versions"])], dtype=object)
    want_fp2 = (pd.Series(fp2).groupby(cp["event_type"].values).sum()
                % EVENT_FP_MOD)
    assert (prof2["n_streams"] == want_n2).all()
    assert (prof2["compact_fp"] == want_fp2.astype("int64")).all()

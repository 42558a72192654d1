"""Cohort retention (events.user_retention): value-exact vs a DuckDB
window recompute on the sf table, planted closed form (returning /
one-shot / late-cohort users), partition invariance, bucket-width knob."""

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.events import user_retention

SF = "/root/testdata/sf0.001"
US_DAY = 86_400 * 1_000_000


def _run(sf, **kw) -> dict:
    df = user_retention(sf, **kw).to_pandas()
    return {(r.cohort, r.age): r.n_users for r in df.itertuples()}


def _oracle(sf, bucket_days=7) -> dict:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    df = con.execute(f"""
WITH e AS (SELECT user_id,
                  epoch_us(ts) // {bucket_days * US_DAY} AS b
           FROM events),
c AS (SELECT user_id, min(b) AS cohort FROM e GROUP BY 1)
SELECT c.cohort, e.b - c.cohort AS age,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN c USING (user_id) GROUP BY 1, 2""").df()
    return {(r.cohort, r.age): r.n_users for r in df.itertuples()}


def test_retention_matches_oracle_sf(ray_session):
    assert _run(SF) == _oracle(SF)


def test_retention_matches_oracle_daily(ray_session):
    assert _run(SF, bucket_days=1) == _oracle(SF, bucket_days=1)


@pytest.mark.parametrize("parts", [1, 8])
def test_retention_partition_invariant(ray_session, parts):
    assert _run(SF, num_partitions=parts) == _oracle(SF)


def test_retention_closed_form(tmp_path, ray_session):
    t0 = pd.Timestamp("2024-01-01")
    w = pd.Timedelta(days=7)
    rows = [
        # user 1: weeks 0, 1, 3 (returning)
        (0, t0, 1), (1, t0 + w, 1), (2, t0 + 3 * w, 1),
        # user 2: week 0 only, twice in-week (dedups to one)
        (3, t0 + pd.Timedelta(days=1), 2), (4, t0 + pd.Timedelta(days=2), 2),
        # user 3: first appears week 1 -> its own cohort
        (5, t0 + w, 3), (6, t0 + 2 * w, 3),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    df["event_type"], df["value"], df["props"] = "click", 1.0, "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _run(str(tmp_path))
    c0 = pd.Timestamp("2024-01-01").value // 1000 // (7 * US_DAY)
    assert got == {(c0, 0): 2, (c0, 1): 1, (c0, 3): 1,
                   (c0 + 1, 0): 1, (c0 + 1, 1): 1}

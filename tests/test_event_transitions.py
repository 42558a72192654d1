"""Markov transition matrix / profile over per-user event streams
(events.event_transition_matrix / event_transition_profile): closed-form
fixture incl. equal-timestamp tie-breaks and single-event users,
partition invariance, and the deterministic top-next argmax."""

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.events import (
    event_transition_matrix,
    event_transition_profile,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trans")
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: click -> view -> click -> purchase
        (0, t0, 1, "click"), (1, t0 + pd.Timedelta("1min"), 1, "view"),
        (2, t0 + pd.Timedelta("2min"), 1, "click"),
        (3, t0 + pd.Timedelta("3min"), 1, "purchase"),
        # user 2: two events at the SAME timestamp -> event_id breaks the tie
        (4, t0, 2, "signup"), (5, t0, 2, "click"),
        # user 3: single event -> no transition
        (6, t0, 3, "error"),
        # user 4: click -> view (reinforces click->view over click->purchase)
        (7, t0, 4, "click"), (8, t0 + pd.Timedelta("1min"), 4, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"] = 1.0
    df["props"] = '{"k": 1}'
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


EXPECTED = {
    ("click", "view"): 2,
    ("view", "click"): 1,
    ("click", "purchase"): 1,
    ("signup", "click"): 1,
}


def _matrix(sf, **kw) -> dict:
    df = event_transition_matrix(sf, **kw).to_pandas()
    return {(r.prev_type, r.next_type): r.n for r in df.itertuples()}


def test_matrix_closed_form(fixture_dir, ray_session):
    assert _matrix(fixture_dir) == EXPECTED


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_matrix_partition_invariant(fixture_dir, ray_session, parts):
    assert _matrix(fixture_dir, num_partitions=parts) == EXPECTED


def test_profile_closed_form(fixture_dir, ray_session):
    p = event_transition_profile(fixture_dir)
    row = p[p.event_type == "click"].iloc[0]
    assert row.n_out == 3 and row.n_next_distinct == 2
    assert row.top_next == "view" and row.top_next_n == 2
    # 'error' and 'purchase' never transition out -> no row at all
    assert set(p.event_type) == {"click", "view", "signup"}


def test_profile_argmax_tie_breaks_lexicographic(tmp_path, ray_session):
    t0 = pd.Timestamp("2024-01-01")
    rows = [(0, t0, 1, "a"), (1, t0 + pd.Timedelta("1min"), 1, "z"),
            (2, t0, 2, "a"), (3, t0 + pd.Timedelta("1min"), 2, "b")]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"], df["props"] = 1.0, "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    p = event_transition_profile(str(tmp_path))
    row = p[p.event_type == "a"].iloc[0]
    assert row.top_next == "b" and row.top_next_n == 1   # tie 1-1 -> asc


def test_matrix_matches_duckdb_on_sf(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
WITH tr AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2""").df()
    want_d = {(r.prev, r.nxt): r.n for r in want.itertuples()}
    assert _matrix(SF) == want_d

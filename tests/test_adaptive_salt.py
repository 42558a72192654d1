"""Adaptive skew response (exchange.adaptive_salt / adaptive_join):
the partition_load pre-flight picks the physical plan; every plan is
output-set-identical; the hub fixture provably ENGAGES the adaptive
path while uniform keys provably stay on the plain exchange."""

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.stages import exchange


def _uniform(n=20_000) -> pd.DataFrame:
    return pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                         "v": np.arange(n, dtype=np.int64)})


def _hub(n=20_000) -> pd.DataFrame:
    # 90% of rows share one key: one partition would hold ~29x the mean
    k = np.where(np.arange(n) % 10 == 0,
                 np.arange(n, dtype=np.int64), np.int64(7))
    return pd.DataFrame({"k": k, "v": np.arange(n, dtype=np.int64)})


def test_adaptive_salt_uniform_stays_plain():
    assert exchange.adaptive_salt(rd.from_pandas(_uniform()), ["k"]) == 1


def test_adaptive_salt_hub_engages_power_of_two():
    s = exchange.adaptive_salt(rd.from_pandas(_hub()), ["k"])
    assert s > 1
    assert s & (s - 1) == 0          # power of two
    assert s <= 16                   # capped


def _join_all(left: pd.DataFrame, right: pd.DataFrame, **kw):
    plan: dict = {}
    out = exchange.adaptive_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k",
        {"k": "int64", "v": "int64"}, {"k": "int64", "w": "int64"},
        plan=plan, **kw,
    ).to_pandas().sort_values(["k", "v", "w"], ignore_index=True)
    return out, plan


def test_adaptive_join_plans_and_identity():
    right = pd.DataFrame({"k": np.arange(0, 20_000, 3, dtype=np.int64)})
    right["w"] = right["k"] * 10

    # uniform -> plain hash plan
    u_out, u_plan = _join_all(_uniform(), right)
    assert u_plan == {"plan": "hash", "salt": 1}

    # hub -> salted plan by default
    h_out, h_plan = _join_all(_hub(), right)
    assert h_plan["plan"] == "salted" and h_plan["salt"] > 1

    # hub + broadcast-small right declared -> skew plan
    s_out, s_plan = _join_all(_hub(), right, broadcast_small_right=True)
    assert s_plan["plan"] == "skew"

    # every physical plan produces the identical logical result
    want_u = _uniform().merge(right, on="k").sort_values(
        ["k", "v", "w"], ignore_index=True)
    want_h = _hub().merge(right, on="k").sort_values(
        ["k", "v", "w"], ignore_index=True)
    pd.testing.assert_frame_equal(u_out, want_u)
    pd.testing.assert_frame_equal(h_out, want_h)
    pd.testing.assert_frame_equal(s_out, want_h)


def test_kg_reach_auto_engages_and_matches_explicit():
    """A 300-spoke hub graph: the auto pre-flight must measure salt > 1
    on the edge source side AND the auto output must equal the
    unsalted run exactly."""
    from test_graph import _run_reach, _trips_ds

    rows = [(f"s{i:03d}", "hub") for i in range(300)]
    rows += [("hub", f"t{j}") for j in range(12)]
    rows += [(f"t{j}", f"u{j}") for j in range(12)]
    edges = pd.DataFrame(rows, columns=["src", "dst"])

    # engagement: the measured signal the hop join consumes
    trips = _trips_ds(edges)
    from ontology_matcher_ray.pipelines.graph import _distinct_edges
    e = _distinct_edges(trips, 8)
    assert exchange.adaptive_salt(e, ["dst"], num_partitions=8) > 1

    auto = _run_reach(edges, 2)                   # default salt="auto"
    plain = _run_reach(edges, 2, salt=1)
    pd.testing.assert_frame_equal(auto, plain)

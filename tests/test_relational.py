"""Relational family (pipelines/relational.py): partition invariance and
join semantics edge cases.  Oracle parity for all five queries is covered
by tests/test_queries_oracle.py (they auto-enroll via __ray_entry__)."""

import pandas as pd

from ontology_matcher_ray.pipelines import relational
from tests.util import normalize, run_oracle, to_pandas

SF = "/root/testdata/sf0.001"


def test_revenue_partition_invariance():
    """The 2-hop shuffle-join chain must give identical results at any
    partition count (content-hash partitioning, order-independent integer
    sums)."""
    a = normalize(to_pandas(relational.revenue_by_nation(SF, num_partitions=2)))
    b = normalize(to_pandas(relational.revenue_by_nation(SF, num_partitions=5)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_semi_join_counts_order_once():
    """An order with several qualifying line items must count once (semi
    join, not inner join): total over priorities == distinct qualifying
    orders."""
    got = to_pandas(relational.priority_semi_counts(SF))
    want = run_oracle(
        f"""SELECT count(DISTINCT l_orderkey) AS n FROM lineitem
            WHERE l_quantity >= {relational.SEMI_MIN_QTY}
              AND l_orderkey IN (SELECT o_orderkey FROM orders)""",
        SF,
    )
    assert int(got["n_orders"].sum()) == int(want["n"].iloc[0])


def test_anti_plus_semi_partition_customers():
    """left_anti(urgent) and left_semi(urgent) over customer partition the
    customer table exactly."""
    anti = to_pandas(relational.customers_without_urgent(SF))
    n_cust = int(run_oracle("SELECT count(*) AS n FROM customer", SF)["n"].iloc[0])
    n_with = int(
        run_oracle(
            """SELECT count(*) AS n FROM customer
               WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
            SF,
        )["n"].iloc[0]
    )
    assert len(anti) == n_cust - n_with
    assert anti["c_custkey"].is_unique

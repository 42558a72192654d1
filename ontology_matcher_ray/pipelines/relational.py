"""Distributed relational operators over the TPC-H-shaped tables.

The reference's join surface is broadcast-shaped (conversion ⋈ raw input,
converted ⋈ metadata — SURVEY §2.5 J1/J2: one side always fits in memory).
A 100-TB training-data pipeline also needs the *big ⋈ big* shapes — fact ⋈
fact equi-joins, semi/anti filters, and wide aggregates — so this module
adds them Ray-Data-natively:

- **Shuffle hash join**: ``exchange.hash_join`` — both sides
  hash-partitioned on the key through the engine's task-based exchange,
  each partition joined with one vectorized pandas merge.  Used for every
  join where BOTH sides scale with the fact tables (lineitem ⋈ orders,
  orders ⋈ customer).  Ray 2.49's native actor-based ``Dataset.join`` is
  available behind ``native=True`` (see ``exchange.hash_join`` for the
  measured per-query actor-startup cost that makes it the non-default).
- **Broadcast join**: tiny dimension chains (nation: 25 rows) are read
  once driver-side and shipped as a plain dict/array lookup inside
  ``map_batches`` — never shuffled (same pattern as
  ``docs_text.doc_embedding_join``).
- **Partial aggregation before the exchange**: every per-key sum is
  combined inside ``map_batches`` first (e.g. lineitem → one row per
  orderkey per block) so the shuffle moves combiner output, not raw fact
  rows — at 100 TB this is the difference between shuffling ~4 rows per
  order and shuffling every line item.
- **Integer-exact money arithmetic**: prices/discounts are converted to
  integer cents / whole percent via ``floor(x * 100 + 0.5)`` — the same
  IEEE-double expression DuckDB evaluates — so distributed sums are
  order-independent and the oracle comparison is value-hash exact (the
  engine-wide "integer micro-units" rule; see functions/text.py).

Skew note: TPC-H keys are uniform; for a skewed fact⋈fact key the plan is
the one already used by ``canonical_merge``/events — salt the hot key with
a second column and merge in a cheap second pass.  ``Dataset.join`` keeps
`num_partitions` blocks per side; callers size it to the fact volume.

Overflow headroom: the cent-percent accumulators (``sum_disc_price_cp``,
``revenue_cp``) add ~1e8–1e9 per lineitem row into int64 (max ~9.2e18),
so a single group saturates only past ~1e10 rows per (returnflag,
linestatus) group — roughly TPC-H sf30,000 (~30 TB of *lineitem alone*,
with the sum concentrated in 6 groups).  Within this engine's tested and
claimed envelope that bound holds; a deployment summing beyond it should
drop the x100 percent factor (plain cents) or split hi/lo int64 pairs,
both of which keep the order-independent integer-exactness property.
(DuckDB's oracle SUM promotes to HUGEINT, so the oracle itself never
wraps.)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.stages import exchange

def _join_partitions(requested=None) -> int:
    """Partitions per hash-shuffle join, sized to the CLUSTER, not the
    data: each join spawns one aggregator actor per partition, so asking
    for more partitions than cores makes the actors thrash (measured 84 s
    vs 4 s on an 8-CPU session for the same sf0.001 join chain).  Half the
    cores per join leaves room for the scan/combiner tasks and for the
    second join of a chain; on a real cluster this is ~total cores."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 2)


def _join(
    left,
    right,
    on,
    right_on,
    left_schema,
    right_schema,
    how="inner",
    num_partitions=None,
    native=False,
    skew=False,
    heavy_top=8,
):
    """Join dispatch: the task-based ``exchange.hash_join`` by default
    (see its docstring for the measured rationale), Ray's native
    actor-based ``Dataset.join`` with ``native=True`` (same key/column
    semantics: left key name kept, right key consumed), or the
    skew-adaptive ``exchange.skew_join`` with ``skew=True`` (sampled
    heavy keys join map-side against a broadcast right subset; output
    identical to hash_join for any heavy set)."""
    num_partitions = _join_partitions(num_partitions)
    if native:
        kinds = {"inner": "inner", "left": "left_outer", "outer": "full_outer",
                 "semi": "left_semi", "anti": "left_anti"}
        if how not in kinds:
            raise ValueError(f"native join does not support how={how!r}")
        kind = kinds[how]
        return left.join(
            right, kind, num_partitions=num_partitions,
            on=(on,), right_on=(right_on,),
        )
    if skew:
        return exchange.skew_join(
            left, right, on, right_on, left_schema, right_schema, how,
            num_partitions, heavy_top=heavy_top,
        )
    return exchange.hash_join(
        left, right, on, right_on, left_schema, right_schema, how, num_partitions
    )

PRICING_CUTOFF = "2000-06-30"  # keeps ~half of lineitem at every sf
BIG_ORDER_MIN_QTY = 150        # non-degenerate at sf0.001..sf0.1
SEMI_MIN_QTY = 49.0            # "orders with a near-max-quantity line"


def _read(sf_dir: str, name: str, columns):
    from ontology_matcher_ray.sources.io import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _cents(x: np.ndarray) -> np.ndarray:
    """float dollars -> int64 cents, bit-identical to DuckDB's
    CAST(FLOOR(x * 100 + 0.5) AS BIGINT) (both sides evaluate the same
    IEEE-double product/sum before the floor)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _whole(x: np.ndarray) -> np.ndarray:
    """float -> nearest int64 via the same floor(x + 0.5) expression."""
    return np.floor(x + 0.5).astype(np.int64)


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped wide aggregate: per (returnflag, linestatus) sums
    over the shipped slice of lineitem.

    Plan: pruned read -> per-block combiner (groupby inside the batch,
    ~6 output rows per block) -> tiny final exchange.  The shuffle moves
    O(blocks x 6) rows regardless of fact volume.
    """
    cutoff = np.datetime64(PRICING_CUTOFF)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"].to_numpy() <= cutoff]
        price_c = _cents(b["l_extendedprice"].to_numpy())
        disc_pct = _whole(b["l_discount"].to_numpy() * 100.0)
        f = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_numpy(),
                "l_linestatus": b["l_linestatus"].to_numpy(),
                "sum_qty": _whole(b["l_quantity"].to_numpy()),
                "sum_base_price_cents": price_c,
                # disc price in cent-percent units (exact integer algebra;
                # divide by 100 downstream only for display)
                "sum_disc_price_cp": price_c * (100 - disc_pct),
                "count_order": np.ones(len(b), dtype=np.int64),
            }
        )
        return (
            f.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .sum()
            .reset_index()
        )

    part = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).map_batches(combine, batch_format="pandas")
    # ~6 groups: bounded driver reduce of combiner output (see
    # exchange.small_grouped_agg for the measured exchange-latency case)
    return exchange.small_grouped_agg(
        part, ["l_returnflag", "l_linestatus"], lambda g: g.sum()
    )


def _lineitem_revenue_per_order(sf_dir: str) -> rd.Dataset:
    """Per-block combiner: lineitem -> one (l_orderkey, revenue_cp) row
    per order per block.  revenue_cp = cents * (100 - disc_pct), the
    integer-exact form of extendedprice * (1 - discount)."""

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        price_c = _cents(b["l_extendedprice"].to_numpy())
        disc_pct = _whole(b["l_discount"].to_numpy() * 100.0)
        f = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "revenue_cp": price_c * (100 - disc_pct),
            }
        )
        return f.groupby("l_orderkey", sort=False).sum().reset_index()

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(combine, batch_format="pandas")


def revenue_by_nation(sf_dir: str, num_partitions=None, native=False) -> pd.DataFrame:
    """Revenue per customer nation: a two-hop shuffle-join chain over the
    fact tables plus a broadcast dimension lookup.

        lineitem --combiner--> (orderkey, revenue)        [fact]
          ⋈ shuffle on orderkey: orders(orderkey, custkey) [fact]
          ⋈ shuffle on custkey:  customer(custkey, nationkey) [scales w/ facts]
          ⋈ broadcast: nation name (25 rows, driver-read, numpy lookup)
          --combiner + tiny exchange--> (n_name, revenue_cents... cp)

    Both fact joins are Ray's hash-shuffle join (each side partitioned by
    the key); only the 25-row nation table is broadcast.
    """
    import pyarrow.parquet as pq

    li = _lineitem_revenue_per_order(sf_dir)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    j1 = _join(
        li, orders, "l_orderkey", "o_orderkey",
        {"l_orderkey": "int64", "revenue_cp": "int64"},
        {"o_orderkey": "int64", "o_custkey": "int64"},
        num_partitions=num_partitions, native=native,
    )
    def cust_combine(b: pd.DataFrame) -> pd.DataFrame:
        # partial-aggregate per block before the second exchange: ~10
        # orders/customer collapse to one row per customer per block, so
        # j2 shuffles combiner output, not order-grain rows
        return (
            b[["o_custkey", "revenue_cp"]]
            .groupby("o_custkey", sort=False)
            .sum()
            .reset_index()
        )

    j2 = _join(
        j1.map_batches(cust_combine, batch_format="pandas"),
        cust, "o_custkey", "c_custkey",
        {"o_custkey": "int64", "revenue_cp": "int64"},
        {"c_custkey": "int64", "c_nationkey": "int64"},
        num_partitions=num_partitions, native=native,
    )

    # dense int nationkey -> name array, broadcast by closure capture (25
    # rows; Ray ships it once per task spec, not per batch)
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    names = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    names[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy()

    def tag_and_combine(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame(
            {
                "n_name": names[b["c_nationkey"].to_numpy()],
                "revenue_cp": b["revenue_cp"].to_numpy(),
            }
        )
        return f.groupby("n_name", sort=False).sum().reset_index()

    part = j2.map_batches(tag_and_combine, batch_format="pandas")
    return exchange.small_grouped_agg(part, ["n_name"], lambda g: g.sum())


def big_orders(sf_dir: str, num_partitions=None, native=False) -> rd.Dataset:
    """TPC-H-Q18-shaped: orders whose total line quantity exceeds
    BIG_ORDER_MIN_QTY, with order payload attached.

    Plan: lineitem per-block qty combiner -> per-orderkey exchange sum ->
    HAVING filter (cheap: runs on the already-aggregated rows) -> shuffle
    join back to orders for the payload columns.  The join's left side is
    the filtered aggregate (~5% of orders), so the shuffle moves the small
    surviving set plus one pass of orders.
    """

    num_partitions = _join_partitions(num_partitions)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "sum_qty": _whole(b["l_quantity"].to_numpy()),
            }
        )
        return f.groupby("l_orderkey", sort=False).sum().reset_index()

    per_order = exchange.grouped_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            combine, batch_format="pandas"
        ),
        ["l_orderkey"],
        lambda g: g.sum(),
        num_partitions=num_partitions,
    )
    big = per_order.map_batches(
        lambda b: b[b["sum_qty"].to_numpy() > BIG_ORDER_MIN_QTY],
        batch_format="pandas",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    j = _join(
        big, orders, "l_orderkey", "o_orderkey",
        {"l_orderkey": "int64", "sum_qty": "int64"},
        {"o_orderkey": "int64", "o_custkey": "int64",
         "o_totalprice": "float64", "o_orderdate": "datetime64[us]"},
        num_partitions=num_partitions, native=native,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        # the hash join keeps the LEFT key column (l_orderkey); the right
        # key is consumed by the equi-condition
        return pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].astype("int64").to_numpy(),
                "o_custkey": b["o_custkey"].astype("int64").to_numpy(),
                "o_orderdate": pd.to_datetime(b["o_orderdate"]).dt.strftime(
                    "%Y-%m-%d"
                ),
                "o_totalprice_cents": _cents(b["o_totalprice"].to_numpy()),
                "sum_qty": b["sum_qty"].astype("int64").to_numpy(),
            }
        )

    return j.map_batches(finalize, batch_format="pandas")


def priority_semi_counts(sf_dir: str, num_partitions=None, native=False,
                         bloom: bool = True) -> pd.DataFrame:
    """Order count per priority for orders having >= 1 near-max-quantity
    line item — a semi join (EXISTS), so an order with five qualifying
    lines still counts once.

    Plan: filter lineitem in the scan (only matching keys leave the read)
    -> bloom-prune the orders PROBE side against the filtered key set
    (Spark's runtime-bloom-join shape: the filter is selective, so most
    orders rows drop BEFORE the exchange — false positives pass through
    and the exact semi join removes them, so the result is identical;
    set ``bloom=False`` to skip) -> ``left_semi`` hash-shuffle join
    (dedups the filter side inside the exchange) -> per-block count
    combiner -> 5-row final exchange.  The filtered key scan runs twice
    (bloom build + join side) — a pruned column scan, cheaper than
    shuffling the unpruned probe side.
    """
    num_partitions = _join_partitions(num_partitions)

    def hits():
        return _read(
            sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            lambda b: b[b["l_quantity"].to_numpy() >= SEMI_MIN_QTY][
                ["l_orderkey"]],
            batch_format="pandas",
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    if bloom and not native:
        bits = exchange.bloom_build(hits(), "l_orderkey")
        orders = exchange.bloom_prune(orders, "o_orderkey", bits)
    semi = _join(
        orders,
        hits(), "o_orderkey", "l_orderkey",
        {"o_orderkey": "int64", "o_orderpriority": "object"},
        {"l_orderkey": "int64"},
        how="semi", num_partitions=num_partitions, native=native,
    )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        f = pd.DataFrame(
            {
                "o_orderpriority": b["o_orderpriority"].to_numpy(),
                "n_orders": np.ones(len(b), dtype=np.int64),
            }
        )
        return f.groupby("o_orderpriority", sort=False).sum().reset_index()

    return exchange.small_grouped_agg(
        semi.map_batches(combine, batch_format="pandas"),
        ["o_orderpriority"],
        lambda g: g.sum(),
    )


DISC_FREE_MAX = 0.01  # "discount-free" line items (~18% of orders have one)


def order_discounted_revenue(sf_dir: str, num_partitions=None, native=False) -> rd.Dataset:
    """LEFT OUTER join: every order with its discount-free revenue, -1
    when the order has no qualifying line item (~82% of orders — the
    NULL side is the common case, exercising real outer-join semantics).

    Plan: filter lineitem in the scan -> per-block combiner -> per-key
    exchange aggregate (one row per orderkey — a left join against
    PARTIAL sums would duplicate left rows) -> skew-adaptive left join
    (``exchange.skew_join``: sampled heavy keys take the broadcast
    map-side path, the rest the exchange — output identical to
    hash_join for any heavy sample, so this query drives BOTH join
    paths through the value-hash oracle) -> COALESCE(-1) finalize,
    matching the oracle's LEFT JOIN + COALESCE exactly.
    """
    num_partitions = _join_partitions(num_partitions)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_discount"].to_numpy() < DISC_FREE_MAX]
        f = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(),
                "revenue_cents": _cents(b["l_extendedprice"].to_numpy()),
            }
        )
        return f.groupby("l_orderkey", sort=False).sum().reset_index()

    per_order = exchange.grouped_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(combine, batch_format="pandas"),
        ["l_orderkey"],
        lambda g: g.sum(),
        num_partitions=num_partitions,
    )
    if not native:
        # skew_join consumes the right side twice (heavy-subset collect +
        # light filter): checkpoint the aggregate once instead of
        # re-running the lineitem scan+exchange per consumer
        per_order = per_order.materialize()
    j = _join(
        _read(sf_dir, "orders", ["o_orderkey"]),
        per_order,
        "o_orderkey", "l_orderkey",
        {"o_orderkey": "int64"},
        {"l_orderkey": "int64", "revenue_cents": "int64"},
        how="left",
        num_partitions=num_partitions, native=native,
        skew=not native,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64").to_numpy(),
                "revenue_cents": b["revenue_cents"].fillna(-1).astype("int64").to_numpy(),
            }
        )

    return j.map_batches(finalize, batch_format="pandas")


TOP_CUSTOMERS = 10


def top_revenue_customers(sf_dir: str, num_partitions=None) -> pd.DataFrame:
    """Global top-N by value: the ``TOP_CUSTOMERS`` highest-revenue
    customers.  Per-partition partial top-N (each at most N rows) then
    one driver-side merge of ``num_partitions * N`` rows — the same
    bounded-reduce pattern as the ANN finalize; the driver never sees
    more than P*N rows no matter the table size.  Ties break by
    o_custkey asc so the result is deterministic and oracle-comparable.
    """
    j1 = _join(
        _lineitem_revenue_per_order(sf_dir),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "l_orderkey", "o_orderkey",
        {"l_orderkey": "int64", "revenue_cp": "int64"},
        {"o_orderkey": "int64", "o_custkey": "int64"},
        num_partitions=num_partitions,
    )
    per_cust = exchange.grouped_agg(
        j1.map_batches(
            lambda b: b[["o_custkey", "revenue_cp"]], batch_format="pandas"
        ),
        ["o_custkey"],
        lambda g: g.sum(),
        num_partitions=_join_partitions(num_partitions),
    )

    def partial_top(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["revenue_cp", "o_custkey"], ascending=[False, True]
        ).head(TOP_CUSTOMERS)

    partials = per_cust.map_batches(partial_top, batch_format="pandas").to_pandas()
    return (
        partials.sort_values(["revenue_cp", "o_custkey"], ascending=[False, True])
        .head(TOP_CUSTOMERS)
        .reset_index(drop=True)
    )


BIG_SPEND_MIN = 350_000.0  # "big order" threshold for the outer-join profile


def customer_order_profile(sf_dir: str, num_partitions=None) -> rd.Dataset:
    """FULL OUTER join: per-customer urgent-order count vs big-spend
    order count — customers appear if they have EITHER kind (only-urgent,
    only-big and both are all populated at every sf), with 0 for the
    missing side, matching the oracle's FULL JOIN + COALESCE.

    Plan: two scan-filtered per-customer aggregates (grouped_agg, one
    row per customer each) -> ``hash_join(how="outer")`` -> fillna(0)
    finalize.  The key survives from whichever side is present.
    """
    num_partitions = _join_partitions(num_partitions)

    def counts(pred_col, keep):
        def combine(b: pd.DataFrame) -> pd.DataFrame:
            b = b[keep(b)]
            f = pd.DataFrame(
                {
                    "o_custkey": b["o_custkey"].to_numpy(),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
            return f.groupby("o_custkey", sort=False).sum().reset_index()

        return exchange.grouped_agg(
            _read(sf_dir, "orders", ["o_custkey", pred_col]).map_batches(
                combine, batch_format="pandas"
            ),
            ["o_custkey"],
            lambda g: g.sum(),
            num_partitions=num_partitions,
        )

    urgent = counts(
        "o_orderpriority",
        lambda b: b["o_orderpriority"].to_numpy() == "1-URGENT",
    ).map_batches(lambda b: b.rename(columns={"n": "n_urgent"}),
                  batch_format="pandas")
    big = counts(
        "o_totalprice", lambda b: b["o_totalprice"].to_numpy() > BIG_SPEND_MIN
    ).map_batches(lambda b: b.rename(columns={"n": "n_big"}),
                  batch_format="pandas")

    j = exchange.hash_join(
        urgent, big, "o_custkey", "o_custkey",
        {"o_custkey": "int64", "n_urgent": "int64"},
        {"o_custkey": "int64", "n_big": "int64"},
        how="outer", num_partitions=num_partitions,
    )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].astype("int64").to_numpy(),
                "n_urgent": b["n_urgent"].fillna(0).astype("int64").to_numpy(),
                "n_big": b["n_big"].fillna(0).astype("int64").to_numpy(),
            }
        )

    return j.map_batches(finalize, batch_format="pandas")


QUANTILES = (0.25, 0.50, 0.75, 0.95)


def _distributed_quantiles(sf_dir: str, transform, suffix: str) -> rd.Dataset:
    """Shared core of the exact and sketch quantile operators:
    (group, value, count) combiner -> group exchange -> cumulative-count
    selection at index max(0, ceil(q*n) - 1) (DuckDB's ``quantile_disc``
    definition, verified empirically).  ``transform`` optionally maps
    values to sketch buckets BEFORE counting; ``suffix`` names the output
    columns (q25_<suffix>, ...)."""
    import math

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        vals = _cents(b["o_totalprice"].to_numpy())
        if transform is not None:
            vals = transform(vals)
        f = pd.DataFrame(
            {
                "o_orderpriority": b["o_orderpriority"].to_numpy(),
                "cents": vals,
                "cnt": np.ones(len(b), dtype=np.int64),
            }
        )
        return f.groupby(["o_orderpriority", "cents"], sort=False).sum().reset_index()

    part = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]).map_batches(
        combine, batch_format="pandas"
    )

    def select_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for prio, grp in g.groupby("o_orderpriority", sort=False):
            grp = grp.groupby("cents", sort=True)["cnt"].sum()
            values = grp.index.to_numpy()
            cum = grp.to_numpy().cumsum()
            n = int(cum[-1])
            row = {"o_orderpriority": prio}
            for q in QUANTILES:
                idx = max(0, math.ceil(q * n) - 1)
                # first distinct value whose cumulative count exceeds idx
                row[f"q{int(q * 100)}_{suffix}"] = int(
                    values[np.searchsorted(cum, idx + 1, side="left")]
                )
            out.append(row)
        return pd.DataFrame(out)

    return exchange.partitioned_apply(
        part, ["o_orderpriority"], select_quantiles, num_partitions=8
    )


def order_price_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact distributed quantiles of order price per priority, via
    count-based selection: the shuffle moves (group, value, count) rows —
    volume bounded by the DISTINCT-value count of the domain (integer
    cents), not the row count, so a 100-TB orders table exchanges at most
    |domain| rows per group."""
    return _distributed_quantiles(sf_dir, None, "cents")


_POW2 = np.int64(2) ** np.arange(63, dtype=np.int64)  # all int64 bit lengths


def _bucket_lower_bound(c: np.ndarray) -> np.ndarray:
    """Mergeable quantile-sketch bucket: keep the top 5 bits of each
    value (relative error < 1/16).  Pure integer ops — bit length via
    searchsorted over powers of two — bit-identical to the oracle's
    ``(c >> greatest(length(bin(c))-5, 0)) << ...`` SQL."""
    bl = np.searchsorted(_POW2, c, side="right").astype(np.int64)
    shift = np.maximum(bl - 5, 0)
    return (c >> shift) << shift


def order_price_quantiles_approx(sf_dir: str) -> rd.Dataset:
    """APPROXIMATE distributed quantiles (relative error < 1/16): the
    mergeable-sketch counterpart of ``order_price_quantiles``.

    Same count-based selection, but values collapse to top-5-bit buckets
    in the combiner — the exchange moves at most |priorities| x ~64
    bucket rows per block regardless of how many distinct prices exist
    (the exact variant's shuffle grows with the distinct-value count; at
    an unbounded domain this sketch is the scale path, exactly like
    HLL vs exact COUNT DISTINCT).  The oracle recomputes quantile_disc
    over the identically-bucketed values, so the gate checks the sketch
    exactly, not approximately.
    """
    return _distributed_quantiles(sf_dir, _bucket_lower_bound, "lb")


def customer_running_revenue(sf_dir: str, num_partitions=None) -> rd.Dataset:
    """Ordered window functions (row_number + running sum) per customer:
    one exchange on the window key, then a vectorized
    sort + groupby-cumsum/cumcount kernel per partition — no per-row or
    per-group Python.  Ties broken by (o_orderdate, o_orderkey) so output
    is deterministic under any partitioning.

    Hot-key note: assumes one customer's orders fit a partition (same
    declared assumption as the event ops pre-salting; a pathological
    customer would use the salted-exchange + boundary-merge pattern from
    pipelines/events.py).
    """
    num_partitions = _join_partitions(num_partitions)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(),
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "o_orderdate": b["o_orderdate"].to_numpy(),
                "cents": _cents(b["o_totalprice"].to_numpy()),
            }
        )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        grp = g.groupby("o_custkey", sort=False)
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(),
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "rn": (grp.cumcount() + 1).to_numpy(),
                "cum_cents": grp["cents"].cumsum().to_numpy(),
            }
        )

    part = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ).map_batches(prep, batch_format="pandas")
    return exchange.partitioned_apply(part, ["o_custkey"], window, num_partitions)


def customer_running_revenue_salted(
    sf_dir: str, bucket_days: int = 32, num_partitions=None
) -> rd.Dataset:
    """Hot-key-safe ``customer_running_revenue``: identical output, but a
    single customer's orders may span partitions.

    Three passes (the offsets-only cousin of events.sessionize's salted
    pattern — ordered-window offsets need no chain merging):

    1. salted exchange on (custkey, bucket = orderdate // bucket_days):
       local row_number + running sum WITHIN each bucket, plus one
       (n_rows, total) summary per bucket;
    2. custkey exchange over SUMMARIES ONLY (bounded by user-bucket
       count, not row count): per-bucket prefix offsets;
    3. salted exchange joins offsets back: rn = local_rn + rn_offset,
       cum = local_cum + cum_offset.

    Pass 1 is materialized once (object-store backed, spillable) so
    passes 2 and 3 don't recompute the scan.
    """
    num_partitions = _join_partitions(num_partitions)
    bucket_us = np.int64(bucket_days) * 86_400_000_000

    F_COLS = (
        ("o_custkey", -1), ("bucket", -1), ("o_orderkey", -1),
        ("o_orderdate_us", -1), ("local_rn", -1), ("local_cum", -1),
        ("n", -1), ("total", -1), ("rn_off", -1), ("cum_off", -1),
        ("kind", -1),
    )

    def _frame(**named) -> pd.DataFrame:
        n = len(next(iter(named.values()))) if named else 0
        out = {}
        for c, fill in F_COLS:
            if c in named:
                out[c] = np.asarray(named[c], dtype=np.int64)
            else:
                out[c] = np.full(n, fill, dtype=np.int64)
        return pd.DataFrame(out)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        us = b["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return _frame(
            o_custkey=b["o_custkey"].to_numpy(),
            bucket=us // bucket_us,
            o_orderkey=b["o_orderkey"].to_numpy(),
            o_orderdate_us=us,
            local_cum=_cents(b["o_totalprice"].to_numpy()),  # cents; cumsum in p1
            kind=np.zeros(len(b), dtype=np.int64),
        )

    def bucket_window(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _frame()
        g = g.sort_values(
            ["o_custkey", "bucket", "o_orderdate_us", "o_orderkey"],
            ignore_index=True,
        )
        grp = g.groupby(["o_custkey", "bucket"], sort=False)
        rows = _frame(
            o_custkey=g["o_custkey"], bucket=g["bucket"],
            o_orderkey=g["o_orderkey"],
            local_rn=(grp.cumcount() + 1),
            local_cum=grp["local_cum"].cumsum(),
            kind=np.zeros(len(g), dtype=np.int64),
        )
        summ = grp.agg(n=("o_orderkey", "size"), total=("local_cum", "sum")
                       ).reset_index()
        summaries = _frame(
            o_custkey=summ["o_custkey"], bucket=summ["bucket"],
            n=summ["n"], total=summ["total"],
            kind=np.ones(len(summ), dtype=np.int64),
        )
        return pd.concat([rows, summaries], ignore_index=True)

    src = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ).map_batches(prep, batch_format="pandas")
    p1 = exchange.partitioned_apply(
        src, ["o_custkey", "bucket"], bucket_window, num_partitions
    ).materialize()

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return _frame()
        g = g.sort_values(["o_custkey", "bucket"], ignore_index=True)
        grp = g.groupby("o_custkey", sort=False)
        return _frame(
            o_custkey=g["o_custkey"], bucket=g["bucket"],
            rn_off=grp["n"].cumsum() - g["n"],
            cum_off=grp["total"].cumsum() - g["total"],
            kind=np.full(len(g), 2, dtype=np.int64),
        )

    p2 = exchange.partitioned_apply(
        p1.map_batches(lambda b: b[b["kind"] == 1], batch_format="pandas"),
        ["o_custkey"],
        offsets,
        num_partitions,
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        rows = g[g["kind"] == 0]
        offs = g[g["kind"] == 2][["o_custkey", "bucket", "rn_off", "cum_off"]]
        if rows.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("o_custkey", "o_orderkey", "rn", "cum_cents")}
            )
        m = rows.drop(columns=["rn_off", "cum_off"]).merge(
            offs, on=["o_custkey", "bucket"], how="inner"
        )
        return pd.DataFrame(
            {
                "o_custkey": m["o_custkey"].to_numpy(),
                "o_orderkey": m["o_orderkey"].to_numpy(),
                "rn": (m["local_rn"] + m["rn_off"]).to_numpy(),
                "cum_cents": (m["local_cum"] + m["cum_off"]).to_numpy(),
            }
        )

    rows_in = p1.map_batches(lambda b: b[b["kind"] == 0], batch_format="pandas")
    return exchange.partitioned_apply(
        rows_in.union(p2), ["o_custkey", "bucket"], attach, num_partitions
    )


def customers_without_urgent(sf_dir: str, num_partitions=None, native=False) -> rd.Dataset:
    """Customers with no 1-URGENT order — an anti join (NOT EXISTS).

    Plan: filter orders to the urgent slice in the scan -> ``left_anti``
    hash-shuffle join against customer.  Only customer keys + the pruned
    urgent keys are shuffled.
    """
    num_partitions = _join_partitions(num_partitions)
    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b[b["o_orderpriority"].to_numpy() == "1-URGENT"][["o_custkey"]],
        batch_format="pandas",
    )
    return _join(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        urgent, "c_custkey", "o_custkey",
        {"c_custkey": "int64", "c_name": "object"},
        {"o_custkey": "int64"},
        how="anti", num_partitions=num_partitions, native=native,
    )


#: (relation label, child table, child FK col, parent table, parent PK col)
FK_RELATIONS = [
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("embeddings.vec_id->documents", "embeddings", "vec_id",
     "documents", "doc_id"),
]


def referential_orphans(sf_dir: str, num_partitions=None,
                        relations=None) -> pd.DataFrame:
    """Data-quality audit over every declared FK relation: one row per
    relation with the DISTINCT child-key count, parent-key count, and
    the count of orphan child keys (child keys absent from the parent) —
    the pre-flight integrity sweep a pipeline swap-in runs before
    trusting joins over a new lake drop.

    Per relation: a per-batch distinct combiner bounds what leaves each
    scan, a key exchange dedups child keys, and an ANTI ``hash_join``
    against the parent keys counts orphans — only KEYS ever shuffle
    (never rows), so the audit costs O(distinct keys) per relation
    regardless of table width.  The result is driver-sized by
    construction (one row per relation).
    """
    num_partitions = _join_partitions(num_partitions)

    def distinct_keys(table: str, col: str) -> rd.Dataset:
        src = _read(sf_dir, table, [col]).map_batches(
            lambda b, _c=col: pd.DataFrame(
                {"k": pd.unique(b[_c].to_numpy())}),
            batch_format="pandas",
        )
        return exchange.distinct(src, ["k"], num_partitions)

    rows = []
    for label, child_t, child_c, parent_t, parent_c in (
            relations or FK_RELATIONS):
        child = distinct_keys(child_t, child_c).materialize()
        parent = distinct_keys(parent_t, parent_c).materialize()
        orphans = exchange.hash_join(
            child, parent, "k", "k", {"k": "int64"}, {"k": "int64"},
            how="anti", num_partitions=num_partitions,
        )
        rows.append({
            "relation": label,
            "n_child_keys": child.count(),
            "n_parent_keys": parent.count(),
            "n_orphans": orphans.count(),
        })
    out = pd.DataFrame(rows)
    for c in ("n_child_keys", "n_parent_keys", "n_orphans"):
        out[c] = out[c].astype("int64")
    return out

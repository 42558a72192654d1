"""Relational family (pipelines/relational.py): partition invariance and
join semantics edge cases.  Oracle parity for all five queries is covered
by tests/test_queries_oracle.py (they auto-enroll via __ray_entry__)."""

import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.pipelines import relational
from ontology_matcher_ray.stages import exchange
from tests.util import normalize, run_oracle, to_pandas

SF = "/root/testdata/sf0.001"


def test_revenue_partition_invariance():
    """The 2-hop shuffle-join chain must give identical results at any
    partition count (content-hash partitioning, order-independent integer
    sums)."""
    a = normalize(to_pandas(relational.revenue_by_nation(SF, num_partitions=2)))
    b = normalize(to_pandas(relational.revenue_by_nation(SF, num_partitions=5)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_salted_join_on_hot_key():
    """One key owning ~80% of the left side: salted hash_join must (a)
    split the hot key across partitions and (b) return the identical row
    set as the unsalted join."""
    import numpy as np
    import ray.data as rd

    from ontology_matcher_ray.stages import exchange

    rng = np.random.default_rng(7)
    n = 20_000
    keys = np.where(rng.random(n) < 0.8, 42, rng.integers(0, 500, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame(
        {"rk": np.arange(500, dtype=np.int64), "w": np.arange(500, dtype=np.int64) * 10}
    )
    ls = {"k": "int64", "v": "int64"}
    rs = {"rk": "int64", "w": "int64"}

    plain = normalize(
        to_pandas(
            exchange.hash_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", "rk", ls, rs,
                num_partitions=8,
            )
        )
    )
    salted = normalize(
        to_pandas(
            exchange.hash_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", "rk", ls, rs,
                num_partitions=8, salt=8,
            )
        )
    )
    assert len(plain) == n  # every left row matches exactly one right row
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False, check_exact=True)

    # property (a): the hot key must actually SPREAD — its 8 salt groups
    # hash to more than one partition (guards against salt silently
    # becoming a no-op in hash_join's key_cols)
    probe = pd.DataFrame(
        {"k": np.full(8, 42, dtype=np.int64),
         "_salt": np.arange(8, dtype=np.int64)}
    )
    n_parts = exchange.add_partition_column(probe, ["k", "_salt"], 8)[
        exchange.PARTITION_COL
    ].nunique()
    assert n_parts > 1

    # semi/anti under salt: replicated right keys must not duplicate rows
    semi = to_pandas(
        exchange.hash_join(
            rd.from_pandas(left), rd.from_pandas(right.iloc[:100]), "k", "rk",
            ls, {"rk": "int64"}, how="semi", num_partitions=8, salt=4,
        )
    )
    assert len(semi) == int((keys < 100).sum())


def test_hash_join_many_to_many_and_empty_side():
    """Inner join semantics: duplicate keys on BOTH sides produce the
    per-key cartesian product (pandas-merge ground truth); an empty right
    side yields 0 inner rows and all-left anti rows."""
    import numpy as np
    import ray.data as rd

    from ontology_matcher_ray.stages import exchange

    left = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": range(6)})
    right = pd.DataFrame({"rk": [1, 1, 3, 9], "w": [10, 11, 30, 90]})
    ls = {"k": "int64", "v": "int64"}
    rs = {"rk": "int64", "w": "int64"}

    got = normalize(
        to_pandas(
            exchange.hash_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", "rk", ls, rs,
                num_partitions=3,
            )
        )
    )
    want = normalize(
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)

    empty = right.iloc[0:0]
    inner = to_pandas(
        exchange.hash_join(
            rd.from_pandas(left), rd.from_pandas(empty), "k", "rk", ls, rs,
            num_partitions=2,
        )
    )
    assert len(inner) == 0
    anti = to_pandas(
        exchange.hash_join(
            rd.from_pandas(left), rd.from_pandas(empty), "k", "rk",
            ls, {"rk": "int64"}, how="anti", num_partitions=2,
        )
    )
    assert len(anti) == len(left)


def test_salted_window_matches_unsalted(tmp_path):
    """customer_running_revenue_salted must be bit-identical to the
    single-exchange formulation — on real data and on a hot-customer
    fixture (one customer owns ~80% of orders, spanning many buckets)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = normalize(to_pandas(relational.customer_running_revenue(SF)))
    b = normalize(to_pandas(relational.customer_running_revenue_salted(SF)))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)

    rng = np.random.default_rng(11)
    n = 4000
    cust = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 50, n)).astype(np.int64)
    days = rng.integers(0, 400, n)  # spans ~13 monthly buckets
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(cust),
            "o_orderdate": pa.array(
                (np.datetime64("1998-01-01", "us")
                 + days * np.timedelta64(86400, "s").astype("timedelta64[us]"))
            ),
            "o_totalprice": pa.array(rng.random(n) * 1000.0),
        }
    )
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))
    a2 = normalize(to_pandas(relational.customer_running_revenue(str(d))))
    b2 = normalize(
        to_pandas(relational.customer_running_revenue_salted(str(d)))
    )
    assert len(a2) == n
    pd.testing.assert_frame_equal(a2, b2, check_dtype=False, check_exact=True)


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


def test_approx_quantiles_error_bound():
    """The top-5-bit sketch must stay within its documented < 1/16
    relative error of the exact distributed quantiles."""
    from tests.util import run_oracle

    import __ray_entry__ as em

    a = (
        to_pandas(relational.order_price_quantiles_approx(SF))
        .set_index("o_orderpriority")
        .sort_index()
    )
    # the driver oracle is now the composite (exact UNION approx, common
    # q25..q95 names) — take its exact half as the reference values
    comp = run_oracle(em.oracle_sql()["order_price_quantiles"], SF)
    e = (
        comp[comp["method"] == "exact"]
        .set_index("o_orderpriority")
        .sort_index()
    )
    for q in (25, 50, 75, 95):
        rel = (a[f"q{q}_lb"] - e[f"q{q}"]).abs() / e[f"q{q}"]
        assert (rel < 1 / 16).all()


# ------------------------------------------------- n-ary one-exchange join


def _mj_frames(seed=23):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                         "a": rng.integers(0, 9, 200).astype("int64")})
    # partial key coverage on every right side
    r1 = pd.DataFrame({"doc_id": np.arange(0, 180, dtype="int64"),
                       "b": rng.integers(0, 9, 180).astype("int64")})
    r2 = pd.DataFrame({"doc_id": np.arange(20, 200, dtype="int64"),
                       "c": [f"s{i % 5}" for i in range(180)]})
    r3 = pd.DataFrame({"vec_id": np.arange(0, 200, 2, dtype="int64"),
                       "d": rng.integers(0, 9, 100).astype("int64")})
    return base, r1, r2, r3


@pytest.mark.parametrize("hows", [("inner", "inner", "inner"),
                                  ("left", "left", "left"),
                                  ("inner", "left", "inner")])
def test_multi_join_equals_binary_chain(ray_session, hows):
    base, r1, r2, r3 = _mj_frames()
    b_s = {"doc_id": "int64", "a": "int64"}
    r1_s = {"doc_id": "int64", "b": "int64"}
    r2_s = {"doc_id": "int64", "c": "object"}
    r3_s = {"vec_id": "int64", "d": "int64"}

    got = exchange.multi_join(
        rd.from_pandas(base), b_s, "doc_id",
        [(rd.from_pandas(r1), "doc_id", r1_s, hows[0]),
         (rd.from_pandas(r2), "doc_id", r2_s, hows[1]),
         (rd.from_pandas(r3), "vec_id", r3_s, hows[2])],
        num_partitions=8,
    ).to_pandas()

    j = exchange.hash_join(rd.from_pandas(base), rd.from_pandas(r1),
                           "doc_id", "doc_id", b_s, r1_s, how=hows[0],
                           num_partitions=8)
    j1_s = {**b_s, "b": "float64" if hows[0] == "left" else "int64"}
    j = exchange.hash_join(j, rd.from_pandas(r2), "doc_id", "doc_id",
                           j1_s, r2_s, how=hows[1], num_partitions=8)
    j2_s = {**j1_s, "c": "object"}
    j = exchange.hash_join(j, rd.from_pandas(r3), "doc_id", "vec_id",
                           j2_s, r3_s, how=hows[2], num_partitions=8)
    want = j.to_pandas()

    key = sorted(got.columns)
    got = got[key].sort_values(key, ignore_index=True)
    want = want[key].sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_multi_join_validation(ray_session):
    base, r1, _, _ = _mj_frames()
    b_s = {"doc_id": "int64", "a": "int64"}
    with pytest.raises(ValueError, match="disjoint"):
        exchange.multi_join(
            rd.from_pandas(base), b_s, "doc_id",
            [(rd.from_pandas(r1.rename(columns={"b": "a"})), "doc_id",
              {"doc_id": "int64", "a": "int64"}, "inner")])
    with pytest.raises(ValueError, match="how"):
        exchange.multi_join(
            rd.from_pandas(base), b_s, "doc_id",
            [(rd.from_pandas(r1), "doc_id",
              {"doc_id": "int64", "b": "int64"}, "outer")])
    with pytest.raises(ValueError, match="key dtype"):
        exchange.multi_join(
            rd.from_pandas(base), b_s, "doc_id",
            [(rd.from_pandas(r1), "doc_id",
              {"doc_id": "object", "b": "int64"}, "inner")])


def test_partition_load_histogram(ray_session):
    import numpy as np

    # 90%-hot key: the diagnostic must localize the hot partition and
    # conserve the total
    n = 2000
    keys = np.where(np.arange(n) % 10 == 0,
                    np.arange(n).astype(str), "hotkey")
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": np.arange(n)}))
    hist = exchange.partition_load(ds, ["k"], num_partitions=8)
    assert len(hist) == 8 and hist["n_rows"].sum() == n
    assert hist["n_rows"].max() >= 1800   # the hot partition
    # and the histogram matches the REAL exchange's per-partition sizes
    sizes = exchange.partitioned_apply(
        ds, ["k"],
        lambda g: pd.DataFrame({"p": [exchange.add_partition_column(
            g, ["k"], 8)[exchange.PARTITION_COL].iloc[0]], "n": [len(g)]}),
        num_partitions=8,
    ).to_pandas()
    got = dict(zip(sizes["p"], sizes["n"]))
    want = {r.partition: r.n_rows for r in hist.itertuples() if r.n_rows}
    assert got == want


def test_skew_join_matches_hash_join():
    """Skew-adaptive hybrid join: one key owning ~80% of the left side
    takes the broadcast map-side path, everything else the exchange —
    the row set must be identical to plain hash_join for every supported
    ``how``, with an explicit heavy set AND with the sampled sketch."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 20_000
    keys = np.where(rng.random(n) < 0.8, 42, rng.integers(0, 500, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype=np.int64)})
    # right misses keys >= 400 (exercises left-NaN / anti-keep paths) and
    # duplicates key 42 (heavy-side many-to-many)
    right = pd.DataFrame(
        {"rk": np.r_[np.arange(400), [42, 42]].astype(np.int64)}
    )
    right["w"] = right["rk"] * 10
    ls = {"k": "int64", "v": "int64"}
    rs = {"rk": "int64", "w": "int64"}

    for how in ("inner", "left", "semi", "anti"):
        r_schema = rs if how in ("inner", "left") else {"rk": "int64"}
        r_in = right if how in ("inner", "left") else right[["rk"]]
        plain = normalize(to_pandas(exchange.hash_join(
            rd.from_pandas(left), rd.from_pandas(r_in), "k", "rk",
            ls, r_schema, how=how, num_partitions=8)))
        for hk in ([42], [42, 7, 999]):  # 999: heavy key absent from both
            skew = normalize(to_pandas(exchange.skew_join(
                rd.from_pandas(left), rd.from_pandas(r_in), "k", "rk",
                ls, r_schema, how=how, num_partitions=8, heavy_keys=hk)))
            pd.testing.assert_frame_equal(
                plain, skew, check_dtype=False, check_exact=True)
        sampled = normalize(to_pandas(exchange.skew_join(
            rd.from_pandas(left), rd.from_pandas(r_in), "k", "rk",
            ls, r_schema, how=how, num_partitions=8, heavy_top=4)))
        pd.testing.assert_frame_equal(
            plain, sampled, check_dtype=False, check_exact=True)


def test_sample_heavy_keys_finds_hot_key():
    import numpy as np

    rng = np.random.default_rng(3)
    n = 50_000
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 2000, n)).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    top = exchange.sample_heavy_keys(ds, "k", top=4)
    assert top and top[0] == 7

    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
    assert exchange.sample_heavy_keys(empty, "k") == []


def test_skew_join_validation():
    import numpy as np

    left = rd.from_pandas(pd.DataFrame({"k": np.arange(4, dtype=np.int64),
                                        "v": np.arange(4, dtype=np.int64)}))
    right = rd.from_pandas(pd.DataFrame({"rk": np.arange(4, dtype=np.int64),
                                         "w": np.arange(4, dtype=np.int64)}))
    with pytest.raises(ValueError, match="how"):
        exchange.skew_join(left, right, "k", "rk", {"k": "int64", "v": "int64"},
                           {"rk": "int64", "w": "int64"}, how="outer",
                           heavy_keys=[1])
    with pytest.raises(ValueError, match="disjoint"):
        exchange.skew_join(left, right, "k", "rk", {"k": "int64", "v": "int64"},
                           {"rk": "int64", "v": "int64"}, heavy_keys=[1])
    # empty heavy set degenerates to the plain exchange join
    got = normalize(to_pandas(exchange.skew_join(
        left, right, "k", "rk", {"k": "int64", "v": "int64"},
        {"rk": "int64", "w": "int64"}, heavy_keys=[])))
    assert len(got) == 4


def test_skew_join_string_keys():
    """String join keys take the pandas string-hash exchange path and a
    string heavy set — same bit-equality contract as the int path."""
    import numpy as np

    rng = np.random.default_rng(5)
    langs = np.array(["en", "de", "fr", "ja", "und"])
    keys = np.where(rng.random(5000) < 0.7, "en", rng.choice(langs, 5000))
    left = pd.DataFrame({"k": keys, "v": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"rk": ["en", "de", "fr"],
                          "w": np.array([1, 2, 3], dtype=np.int64)})
    ls = {"k": "object", "v": "int64"}
    rs = {"rk": "object", "w": "int64"}
    plain = normalize(to_pandas(exchange.hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk", ls, rs,
        how="left", num_partitions=4)))
    skew = normalize(to_pandas(exchange.skew_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "rk", ls, rs,
        how="left", num_partitions=4, heavy_keys=["en"])))
    pd.testing.assert_frame_equal(plain, skew, check_dtype=False,
                                  check_exact=True)
    assert exchange.sample_heavy_keys(
        rd.from_pandas(left), "k", top=1) == ["en"]


def test_skew_join_heavy_keys_absent_from_right():
    """Every sampled heavy key can MISS the right side entirely (the
    sf0.1 bench shape: unique left keys, pre-aggregated right) — the
    broadcast subset is then an empty SCHEMA-LESS pandas frame from
    Ray, which must be rebuilt typed, not KeyError."""
    import numpy as np

    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "v": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(50, dtype=np.int64),
                          "w": np.arange(50, dtype=np.int64) * 2})
    ls = {"k": "int64", "v": "int64"}
    rs = {"rk": "int64", "w": "int64"}
    for how in ("inner", "left", "semi", "anti"):
        r_schema = rs if how in ("inner", "left") else {"rk": "int64"}
        r_in = right if how in ("inner", "left") else right[["rk"]]
        plain = normalize(to_pandas(exchange.hash_join(
            rd.from_pandas(left), rd.from_pandas(r_in), "k", "rk",
            ls, r_schema, how=how, num_partitions=4)))
        skew = normalize(to_pandas(exchange.skew_join(
            rd.from_pandas(left), rd.from_pandas(r_in), "k", "rk",
            ls, r_schema, how=how, num_partitions=4,
            heavy_keys=[60, 70, 99])))   # all absent from right
        pd.testing.assert_frame_equal(plain, skew, check_dtype=False,
                                      check_exact=True)


def test_referential_orphans(tmp_path):
    """FK audit: planted orphan keys are counted per relation; the
    shipped testdata is integral (0 orphans on every declared FK)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def w(name, df):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / f"{name}.parquet"))

    w("child", pd.DataFrame({"fk": np.array([1, 1, 2, 3, 9, 9, 12],
                                            dtype=np.int64)}))
    w("parent", pd.DataFrame({"pk": np.arange(5, dtype=np.int64)}))
    got = relational.referential_orphans(
        str(tmp_path), num_partitions=3,
        relations=[("child.fk->parent", "child", "fk", "parent", "pk")])
    row = got.iloc[0]
    assert (row["n_child_keys"], row["n_parent_keys"], row["n_orphans"]) \
        == (5, 5, 2)           # distinct children {1,2,3,9,12}; orphans {9,12}

    full = relational.referential_orphans(SF).set_index("relation")
    assert len(full) == len(relational.FK_RELATIONS)
    assert (full["n_orphans"] == 0).all()
    assert (full["n_child_keys"] > 0).all()

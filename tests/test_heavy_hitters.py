"""Two-pass Misra-Gries heavy hitters (pipelines/docs_text.heavy_hitters):
the OUTPUT must be the exact threshold filter — a pure function of the
data — no matter how the input is blocked (the sketch only bounds the
candidate exchange), and the MG survival guarantee must hold with a
vocabulary far larger than the counter budget (compress actually fires;
the sf fixtures' 31-token vocabulary never exercises it)."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ontology_matcher_ray.pipelines.docs_text import (
    _mg_compress,
    heavy_hitters,
    token_heavy_hitters,
)

SF = "/root/testdata/sf0.001"


def _skewed_docs() -> pd.DataFrame:
    """500 docs: 'alpha' x400, 'beta' x150, plus 5000 unique singleton
    tail tokens (10 per doc) — vocabulary 5002 >> any test k."""
    rows = []
    for i in range(500):
        toks = [f"t{i}_{j}" for j in range(10)]
        if i < 400:
            toks.append("alpha")
        if i < 150:
            toks.append("beta")
        rows.append(" ".join(toks))
    return pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                         "text": rows})


def _exact_heavy(df: pd.DataFrame, phi_micro: int) -> pd.DataFrame:
    counts = Counter()
    for text in df["text"]:
        counts.update(text.split(" "))
    n = sum(counts.values())
    thr = (n * phi_micro + 999_999) // 1_000_000
    rows = sorted((t, c) for t, c in counts.items() if c >= thr)
    return pd.DataFrame(rows, columns=["token", "n"]).astype({"n": "int64"})


def _run(df: pd.DataFrame, phi_micro: int, k: int, blocks: int) -> pd.DataFrame:
    got = heavy_hitters(
        lambda: rd.from_pandas(df, override_num_blocks=blocks),
        phi_micro=phi_micro, k_counters=k,
    ).to_pandas()
    return (got.sort_values("token", ignore_index=True)
            .astype({"n": "int64"}))


@pytest.mark.parametrize("blocks", [1, 4, 13])
def test_output_is_exact_threshold_filter(blocks):
    """vocab 5002 with k=64: compress fires every batch, yet the output
    equals the exact HAVING filter because pass 2 recounts exactly."""
    df = _skewed_docs()
    got = _run(df, phi_micro=20_000, k=64, blocks=blocks)   # 2% support
    want = _exact_heavy(df, 20_000)
    assert set(want["token"]) == {"alpha", "beta"}
    pd.testing.assert_frame_equal(got, want)


def test_partition_invariance():
    """Different blockings change the sketch's merge order and its
    extras, never the output."""
    df = _skewed_docs()
    a = _run(df, phi_micro=50_000, k=32, blocks=2)
    b = _run(df, phi_micro=50_000, k=32, blocks=11)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["token"]) == ["alpha"]   # 5% support: only the top token


def test_survival_guarantee_at_minimum_margin():
    """phi just above 1/(k+1): the planted heavy token must survive the
    harshest legal counter budget."""
    df = _skewed_docs()
    # k=15 -> guarantee needs phi > 1/16 = 6.25%; alpha is 400/5550 = 7.2%
    got = _run(df, phi_micro=70_000, k=15, blocks=7)
    want = _exact_heavy(df, 70_000)
    assert list(want["token"]) == ["alpha"]
    pd.testing.assert_frame_equal(got, want)


def test_phi_below_guarantee_raises():
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(lambda: rd.from_pandas(_skewed_docs()),
                      phi_micro=1_000, k_counters=100)


def test_empty_input_returns_empty():
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype=str)})
    ds = heavy_hitters(lambda: rd.from_pandas(empty),
                       phi_micro=2_000, k_counters=2048)
    assert ds.count() == 0
    # assert on the Dataset schema: Ray's to_pandas() drops columns on
    # zero-row datasets even when the Arrow schema is typed
    assert ds.schema().names == ["token", "n"]


def test_mg_compress_bounds():
    """Compress leaves <= k counters and never INCREASES a count; a
    counter above the decrement survives with count - d."""
    toks = np.array([f"w{i}" for i in range(100)], dtype=object)
    cnts = np.arange(1, 101, dtype=np.int64)
    out_t, out_c = _mg_compress(toks, cnts, 10)
    assert len(out_t) <= 10
    # d = 90 (the 11th largest of 1..100): survivors are 91..100 -> 1..10
    assert list(out_c) == list(range(1, 11))
    assert list(out_t) == [f"w{i}" for i in range(90, 100)]


def test_sf_fixture_matches_duckdb():
    """token_heavy_hitters over the documents fixture vs an independent
    DuckDB recount at the default 0.2% support."""
    import duckdb

    got = (token_heavy_hitters(SF).to_pandas()
           .sort_values("token", ignore_index=True).astype({"n": "int64"}))
    want = duckdb.connect().execute(f"""
        WITH tok AS (SELECT unnest(str_split(text, ' ')) AS token
                     FROM read_parquet('{SF}/documents.parquet')),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok)
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY token
        HAVING count(*) >= (SELECT (n_total * 2000 + 999999) // 1000000
                            FROM tot)
        ORDER BY token
    """).df().astype({"n": "int64"})
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)

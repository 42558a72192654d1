"""Closed-form checks for the capped language-mixture sampling weights
(docs_train.mixture_weights_from_stats); the engine-vs-DuckDB value-hash
check of the full lang_profile composite lives in the driver gate
(tests/test_queries_oracle.py::test_query_matches_oracle[lang_stats])."""

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import (
    MIXTURE_CAP_MICRO,
    mixture_weights_from_stats,
)


def stats(**langs) -> pd.DataFrame:
    return pd.DataFrame({
        "lang": list(langs),
        "total_tokens": pd.Series(list(langs.values()), dtype="int64"),
    })


def test_cap_binds_on_dominant_language():
    w = mixture_weights_from_stats(stats(en=70, de=15, fr=15))
    w = w.set_index("lang")
    assert w.loc["en", "share_micro"] == 700_000
    assert w.loc["en", "capped_micro"] == MIXTURE_CAP_MICRO
    # 300k / (300k + 150k + 150k) = 1/2
    assert w.loc["en", "weight_micro"] == 500_000
    assert w.loc["de", "weight_micro"] == 250_000


def test_no_cap_when_balanced():
    w = mixture_weights_from_stats(stats(a=25, b=25, c=25, d=25))
    assert (w["share_micro"] == 250_000).all()
    assert (w["capped_micro"] == 250_000).all()
    assert (w["weight_micro"] == 250_000).all()


def test_weights_sum_close_to_unit():
    # floor division: sum in (1e6 - n_langs, 1e6]
    w = mixture_weights_from_stats(stats(a=7, b=11, c=13, d=17, e=3))
    s = int(w["weight_micro"].sum())
    assert 1_000_000 - len(w) < s <= 1_000_000


def test_no_int64_overflow_at_100tb_token_counts():
    # 1e14 tokens/lang * 1e6 overflows int64; driver math is Python ints
    big = stats(en=10**14 * 6, zh=10**14)
    w = mixture_weights_from_stats(big).set_index("lang")
    assert w.loc["en", "share_micro"] == 857_142
    assert w.loc["en", "capped_micro"] == MIXTURE_CAP_MICRO
    assert w.loc["zh", "share_micro"] == 142_857


def test_cap_micro_validated():
    with pytest.raises(ValueError):
        mixture_weights_from_stats(stats(en=1), cap_micro=0)

"""Code-curation profile (``docs_text.code_token_stats``) tests.

Closed-form checks of the planted curation markers (license headers,
autogen banners, fake credentials, over-long lines — corpus.py v5) plus
full-frame DuckDB parity of every column over a small generated corpus.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray import corpus as corpus_mod
from ontology_matcher_ray.oracle import code_stats_sql
from ontology_matcher_ray.pipelines.docs_text import code_token_stats
from ontology_matcher_ray.schemas import DISEASE_SPEC
from ontology_matcher_ray.state.snapshot import build_snapshot

from tests.util import normalize

# covers every marker residue (6, 9, 11, 13) several times
N_FILES = 300


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=200, seed=42)
    out = str(tmp_path_factory.mktemp("codecorpus") / "c")
    corpus_mod.generate_corpus(out, N_FILES, snap)
    return out


@pytest.fixture(scope="module")
def stats(corpus_dir) -> pd.DataFrame:
    df = code_token_stats(corpus_dir).to_pandas()
    assert len(df) == N_FILES
    fid = df["path"].str.extract(r"_(\d+)\.\w+$")[0].astype(int)
    df = df.set_index(fid.to_numpy()).sort_index()
    assert (df.index == np.arange(N_FILES)).all()
    return df


def test_planted_license_and_autogen_flags(stats):
    i = stats.index.to_numpy()
    assert (stats["has_license"].to_numpy() == (i % 6 == 2)).all()
    assert (stats["autogen"].to_numpy() == (i % 9 == 4)).all()


def test_planted_secret_counts(stats):
    i = stats.index.to_numpy()
    want = (i % 11 == 7).astype(np.int64) + (i % 11 == 3).astype(np.int64)
    assert (stats["n_secrets"].to_numpy() == want).all()
    assert stats["n_secrets"].sum() > 0


def test_planted_long_lines(stats):
    i = stats.index.to_numpy()
    planted = i % 13 == 6
    # the blob line is the only >120-char line in the corpus
    assert (stats.loc[planted, "max_line_len"] > 160).all()
    assert (stats.loc[~planted, "max_line_len"] <= 120).all()
    want = np.where(
        planted, 1_000_000 // stats["n_lines"].to_numpy(), 0
    )
    assert (stats["long_line_micro"].to_numpy() == want).all()


def test_curation_decision_precedence(stats):
    """drop_reason follows the fixed rule order over the planted residues
    (autogen beats secrets beats long_lines); low_alnum never fires on
    this corpus, which the alnum floor assertion pins."""
    i = stats.index.to_numpy()
    assert (stats["alnum_micro"].to_numpy() >= 250_000).all()
    want = np.select(
        [i % 9 == 4, (i % 11 == 7) | (i % 11 == 3), i % 13 == 6],
        ["autogen", "secrets", "long_lines"], default="",
    )
    assert (stats["drop_reason"].to_numpy() == want).all()
    assert (stats["curate_keep"].to_numpy() == (want == "")).all()
    # every precedence collision actually occurs in 300 files
    assert ((i % 9 == 4) & (i % 11 == 3)).any()
    assert ((i % 11 == 7) & (i % 13 == 6)).any()


def test_comment_fraction_closed_form(stats):
    """comment_line_micro recomputed from the generator rows with plain
    Python (lines starting with optional blanks then // or #)."""
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=200, seed=42)
    raw_ids = corpus_mod._raw_id_universe(snap)
    terms = corpus_mod.token_lexicon_terms(snap)
    pool = corpus_mod._typo_pool(terms)
    for i in range(0, N_FILES, 11):
        lines = corpus_mod.file_row(i, raw_ids, terms, typo_pool=pool)[
            "content"
        ].split("\n")
        n_comment = sum(
            1 for ln in lines if ln.lstrip("\t ").startswith(("//", "#"))
        )
        assert stats.loc[i, "comment_line_micro"] == (
            n_comment * 1_000_000 // len(lines)
        )


def test_line_stats_closed_form(stats):
    """n_lines / max_line_len recomputed from the generator rows with
    plain Python string ops (independent of both engines)."""
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=200, seed=42)
    raw_ids = corpus_mod._raw_id_universe(snap)
    terms = corpus_mod.token_lexicon_terms(snap)
    pool = corpus_mod._typo_pool(terms)
    for i in range(0, N_FILES, 7):
        lines = corpus_mod.file_row(i, raw_ids, terms, typo_pool=pool)[
            "content"
        ].split("\n")
        row = stats.loc[i]
        assert row["n_lines"] == len(lines)
        assert row["max_line_len"] == max(len(ln) for ln in lines)
        assert row["n_chars"] == sum(len(ln) for ln in lines) + len(lines) - 1


def test_duckdb_full_frame_parity(corpus_dir, stats):
    want = duckdb.sql(code_stats_sql(f"{corpus_dir}/*.parquet")).df()
    got = stats.reset_index(drop=True)
    pd.testing.assert_frame_equal(normalize(got), normalize(want))

"""KWIC mention evidence (docs_kg.mention_contexts): planted closed
forms (doc-start/doc-end clipping, repeated occurrences, phrase terms
excluded), window parameter, and the 1-based pos convention."""

import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_kg import SPEC, mention_contexts
from ontology_matcher_ray.state.snapshot import get_snapshot


@pytest.fixture(scope="module")
def term():
    lex = get_snapshot(SPEC).lexicon
    singles = sorted(t for t in lex if " " not in t)
    return singles[0]


@pytest.fixture()
def planted(tmp_path, term):
    texts = [
        f"{term} after one two three",             # doc start: left clip
        f"one two three four {term}",              # doc end: right clip
        f"a b {term} c d e {term} f",              # two occurrences
        "nothing here matches at all",             # zero occurrences
    ]
    pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": "en", "source": "s",
        "n_chars": [len(t) for t in texts],
    }).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _rows(sf, **kw):
    df = mention_contexts(sf, **kw).to_pandas()
    return sorted((r.doc_id, r.pos, r.context) for r in df.itertuples())


def test_contexts_closed_form(planted, term, ray_session):
    assert _rows(planted) == [
        (0, 1, f"{term} after one two"),
        (1, 5, f"two three four {term}"),
        (2, 3, f"a b {term} c d e"),
        (2, 7, f"c d e {term} f"),
    ]


def test_contexts_window_param(planted, term, ray_session):
    got = _rows(planted, window=1)
    assert (0, 1, f"{term} after") in got
    assert (2, 3, f"b {term} c") in got


def test_phrase_terms_excluded(tmp_path, ray_session):
    lex = get_snapshot(SPEC).lexicon
    phrases = [t for t in lex if " " in t]
    if not phrases:
        pytest.skip("fixture lexicon has no phrase terms")
    pd.DataFrame({
        "doc_id": [0], "text": [f"x {phrases[0]} y"],
        "lang": ["en"], "source": ["s"], "n_chars": [9],
    }).to_parquet(tmp_path / "documents.parquet", index=False)
    df = mention_contexts(str(tmp_path)).to_pandas()
    assert not (df["term"] == phrases[0]).any()

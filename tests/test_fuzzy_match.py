"""Exact-then-fuzzy mention matching (north-star tier): normalized-form
fallback in both the shared MentionExtractor and the corpus pipeline,
with the corpus closed-form expected set covering the planted variants."""

import pandas as pd
import pytest

from ontology_matcher_ray import corpus as corpus_mod
from ontology_matcher_ray.schemas import DISEASE_SPEC
from ontology_matcher_ray.stages.extract import MentionExtractor
from ontology_matcher_ray.state.snapshot import build_snapshot


def test_mention_extractor_fuzzy_tier():
    lexicon = {"spark": "MESH:D1", "windowing": "MESH:D2", "hash join": "MONDO:3"}
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "Spark rocks",              # case fold
                "windowings here",          # plural strip (after fold)
                "SPARK and spark",          # exact + fuzzy -> one row
                "sparkle nothing",          # no partial-prefix match
                "the hash join op",         # phrases stay exact-only
            ],
        }
    )
    out = MentionExtractor(lexicon, fuzzy=True)(batch)
    got = set(map(tuple, out[["doc_id", "term", "raw_id"]].values))
    assert got == {
        (1, "spark", "MESH:D1"),
        (2, "windowing", "MESH:D2"),
        (3, "spark", "MESH:D1"),
        (5, "hash join", "MONDO:3"),
    }
    # fuzzy off: only exact hits survive
    out0 = MentionExtractor(lexicon, fuzzy=False)(batch)
    assert set(out0["doc_id"]) == {3, 5}


def test_corpus_fuzzy_variants_resolve(tmp_path):
    """Planted Capitalized/UPPER/plural variants must produce the same
    mention triples as their canonical surface form — and at least some of
    those triples are fuzzy-ONLY (not derivable from the exact tier)."""
    import ray.data as rd
    from ontology_matcher_ray.pipelines import corpus_kg

    n_files = 240
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=60, seed=42)
    corpus_dir = str(tmp_path / "corpus")
    corpus_mod.generate_corpus(corpus_dir, n_files, snap)
    out = str(tmp_path / "kg")
    corpus_kg.build_kg(corpus_dir, out, snap, n_shards=2)
    got = set(map(tuple, corpus_kg.read_triples(out).to_pandas()
                 [["subj", "pred", "obj"]].values))
    want = corpus_mod.expected_triples(n_files, snap, DISEASE_SPEC)
    assert got == want

    # the fuzzy tier is exercised non-vacuously: some file has a fuzzy
    # variant whose canonical term was NOT planted exactly in that file
    terms = corpus_mod.token_lexicon_terms(snap)
    fuzzy_only = 0
    for i in range(n_files):
        variants = corpus_mod._planted_fuzzy(i, terms)
        if not variants:
            continue
        key = corpus_mod.normalize_term(variants[0], snap.lexicon)
        if key and key not in corpus_mod._planted_terms(i, terms):
            fuzzy_only += 1
    assert fuzzy_only > 10

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


# ---------------------------------------------------------------------------
# DL<=1 typo tier
# ---------------------------------------------------------------------------

def test_dl1_implementations_agree():
    """Engine case-analysis (functions.fuzzy.dl_leq1) vs oracle DP
    (corpus._edit1): property-equal over an exhaustive small alphabet."""
    from itertools import product

    from ontology_matcher_ray.functions.fuzzy import dl_leq1

    strs = [""] + ["".join(p) for n in (1, 2, 3)
                   for p in product("abc", repeat=n)]
    for a in strs:
        for b in strs:
            assert dl_leq1(a, b) == corpus_mod._edit1(a, b), (a, b)
    # targeted long-string cases: each single edit kind + distance-2
    base = "windowing"
    assert dl_leq1(base, "windowing"[:4] + "X" + "wing")  is not None  # smoke
    cases = [
        ("windowing", "windowing", True),
        ("windowing", "windowingx", True),      # insert at end
        ("windowing", "xwindowing", True),      # insert at start
        ("windowing", "windwing", False) if len("windowing") - len("windwing") != 1
        else ("windowing", "windwing", True),   # delete one char
        ("windowing", "winodwing", True),       # adjacent transpose
        ("windowing", "windawing", True),       # substitute
        ("windowing", "winwodnig", False),      # distance 2+
        ("spark", "kraps", False),
    ]
    for a, b, want in cases:
        assert dl_leq1(a, b) == want == corpus_mod._edit1(a, b), (a, b)


def test_del1_lookup_unique_and_ambiguous():
    from ontology_matcher_ray.functions.fuzzy import (
        build_del1_index,
        del1_lookup,
        eligible_token,
    )

    idx = build_del1_index(["stream", "streak", "window"])
    # unique candidate at distance 1 (callers only pass NON-exact tokens)
    assert del1_lookup("strxam", *idx) == "stream"          # substitute
    assert del1_lookup("windwo", *idx) == "window"          # transpose
    assert del1_lookup("windo", *idx) == "window"           # deletion
    assert del1_lookup("windows", *idx) == "window"         # insertion
    # "strea_" within 1 of BOTH stream and streak -> ambiguous drop
    assert del1_lookup("strea", *idx) is None
    assert del1_lookup("streax", *idx) is None
    # far tokens don't match
    assert del1_lookup("python", *idx) is None
    # gate: short / digit / underscore tokens are ineligible
    assert not eligible_token("modX")
    assert not eligible_token("12345")
    assert not eligible_token("body_1_2")
    assert eligible_token("windwo") and eligible_token("synterm12")


def test_corpus_typo_tier_non_vacuous():
    """Planted typos resolve through the DL<=1 tier specifically (not the
    fold/strip tiers), in enough files to matter."""
    snap = build_snapshot(DISEASE_SPEC, n_synthetic=60, seed=42)
    terms = corpus_mod.token_lexicon_terms(snap)
    pool = corpus_mod._typo_pool(terms)
    stl = set(terms)
    d1 = corpus_mod._typo_candidates(terms)
    tier4 = 0
    for i in range(240):
        for v in corpus_mod._planted_typos(i, pool):
            low = v.lower()
            if (v in stl or low in stl
                    or (len(low) > 3 and low.endswith("s") and low[:-1] in stl)):
                continue
            if corpus_mod._resolve_token(v, stl, d1) is not None:
                tier4 += 1
    assert tier4 >= 20


def test_mention_extractor_typo_tier():
    """DL<=1 typo tier in the shared extractor: transposed/edited tokens
    resolve to the unique lexicon term; ambiguous candidates drop; the
    tier sits BEHIND exact/fold/strip (same semantics as the corpus
    pipeline's fused actor)."""
    lexicon = {
        "windowing": "MESH:D2",
        "streaming": "MESH:D3",
        "boast": "MESH:D4",
        "board": "MESH:D5",
    }
    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "wnidowing starts",      # adjacent transposition -> windowing
                "streamin here",         # one deletion -> streaming
                "boasd ambiguous",       # DL1 from boast AND board -> drop
                "windowing exact",       # exact tier still wins
                "boars here",            # DL1 from board only (lowered
                                         # probe, NOT stripped 'boar')
            ],
        }
    )
    from ontology_matcher_ray.stages.extract import MentionExtractor

    out = MentionExtractor(lexicon, typo=True)(batch)
    got = set(map(tuple, out[["doc_id", "term", "raw_id"]].values))
    assert got == {
        (1, "windowing", "MESH:D2"),
        (2, "streaming", "MESH:D3"),
        (4, "windowing", "MESH:D2"),
        (5, "board", "MESH:D5"),
    }
    # typo off: only the exact row survives
    out0 = MentionExtractor(lexicon, fuzzy=True)(batch)
    assert set(out0["doc_id"]) == {4}


def test_typo_tier_probes_lowered_token_like_corpus_chain():
    """Regression (review finding): the typo tier must probe the LOWERED
    token, not the plural-stripped candidate — a 5-letter s-ending typo
    ('cures' for lexicon term 'curex') strips to 'cure', which fails the
    eligible_token len>=5 gate; the corpus fused actor resolves it, so the
    extractor must too."""
    import pandas as pd

    from ontology_matcher_ray.stages.extract import MentionExtractor

    lexicon = {"curex": "MESH:X"}
    batch = pd.DataFrame({"doc_id": [1], "text": ["cures everything"]})
    out = MentionExtractor(lexicon, typo=True)(batch)
    assert set(map(tuple, out[["doc_id", "term", "raw_id"]].values)) == {
        (1, "curex", "MESH:X")
    }

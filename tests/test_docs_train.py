"""Invariants for the training-data prep family (pipelines/docs_train.py)
beyond the oracle equality checks in test_queries_oracle."""

import re

import pandas as pd
import pytest

from ontology_matcher_ray.functions.hashing import md5half
from ontology_matcher_ray.pipelines.docs_train import (
    EMAIL_RE,
    MERSENNE_P,
    PACK_BUDGET,
    PHONE_RE,
    SKETCH_REGISTERS,
    SKETCH_RHO_CAP,
    doc_pack,
    lang_token_sketch,
    pii_scrub,
    tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_pii_scrub_leaves_no_pii():
    df = pii_scrub(SF).to_pandas()
    email, phone = re.compile(EMAIL_RE), re.compile(PHONE_RE)
    assert not df["clean_text"].str.contains(email).any()
    assert not df["clean_text"].str.contains(phone).any()
    # planted PII found where planted
    assert (df.loc[df["doc_id"] % 3 == 0, "n_emails"] >= 1).all()
    assert (df.loc[df["doc_id"] % 5 == 0, "n_phones"] >= 1).all()
    assert (df.loc[(df["doc_id"] % 3 != 0), "n_emails"] == 0).all()


@pytest.mark.parametrize("parts", [4, 16])
def test_doc_pack_is_global_prefix_sum(parts):
    df = doc_pack(SF, num_partitions=parts).to_pandas().sort_values("doc_id")
    n = df["n_tokens"].to_numpy()
    start = df["start_offset"].to_numpy()
    # contiguous concat: each doc starts where the previous one ended
    assert start[0] == 0
    assert (start[1:] == start[:-1] + n[:-1]).all()
    assert (df["chunk_id"] == df["start_offset"] // PACK_BUDGET).all()
    assert (df["n_chunks"] >= 1).all()


def test_tfidf_ranks_and_rare_term_wins():
    df = tfidf_top_terms(SF).to_pandas()
    per_doc = df.groupby("doc_id")["rank"].apply(list)
    assert all(sorted(r) == list(range(1, len(r) + 1)) for r in per_doc)
    # within a doc, rank order follows score desc
    for _, g in df.groupby("doc_id"):
        s = g.sort_values("rank")["score_micro"].to_numpy()
        assert (s[:-1] >= s[1:]).all()


def test_sketch_matches_brute_force_registers():
    got = lang_token_sketch(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "text"])
    want = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for tok in text.split(" "):
            hv = md5half(tok) % MERSENNE_P
            reg, rest = hv % SKETCH_REGISTERS, hv // SKETCH_REGISTERS
            rho = SKETCH_RHO_CAP if rest == 0 else (rest & -rest).bit_length()
            key = (lang, reg)
            want[key] = max(want.get(key, 0), rho)
    got_map = {(r.lang, r.reg): r.max_rho for r in got.itertuples()}
    assert got_map == want

"""RAG-style overlapping token-window chunking
(docs_train.chunk_documents / chunk_profile): planted closed forms
(overlap, short-tail chunk, single-token and empty docs), window/stride
parameters, DuckDB parity on the sf table for BOTH the full per-chunk
table and the per-doc fingerprint profile, and partition invariance."""

import pandas as pd
import pytest

from ontology_matcher_ray.functions.hashing import md5half
from ontology_matcher_ray.pipelines.docs_train import (
    CHUNK_FP_MOD,
    chunk_documents,
    chunk_profile,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunks")
    texts = [
        "a b c d e f g",   # 7 tokens
        "x",               # single token -> one chunk
        "",                # ''.split(' ') == [''] -> one 1-token chunk
        "p q r",           # exactly one window at window=4
    ]
    pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": "en", "source": "s",
        "n_chars": [len(t) for t in texts],
    }).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _rows(sf, **kw):
    df = chunk_documents(sf, **kw).to_pandas()
    return sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_chunk_tokens, r.chunk_text)
        for r in df.itertuples()
    )


def test_closed_form(planted, ray_session):
    # window=4, stride=3: doc 0 (7 toks) -> starts 0, 3, 6
    assert _rows(planted, window=4, stride=3) == [
        (0, 0, 0, 4, "a b c d"),
        (0, 1, 3, 4, "d e f g"),
        (0, 2, 6, 1, "g"),
        (1, 0, 0, 1, "x"),
        (2, 0, 0, 1, ""),
        (3, 0, 0, 3, "p q r"),
    ]


def test_no_overlap_params(planted, ray_session):
    # window == stride: disjoint cover, every token appears exactly once
    rows = _rows(planted, window=3, stride=3)
    doc0 = [r for r in rows if r[0] == 0]
    assert [r[4] for r in doc0] == ["a b c", "d e f", "g"]
    assert sum(r[3] for r in doc0) == 7


def test_bad_params(planted, ray_session):
    with pytest.raises(ValueError):
        chunk_documents(planted, window=0)
    with pytest.raises(ValueError):
        chunk_profile(planted, stride=-1)


def test_profile_closed_form(planted, ray_session):
    prof = chunk_profile(planted, window=4, stride=3).to_pandas()
    got = {r.doc_id: (r.n_rag_chunks, r.chunk_fp) for r in prof.itertuples()}
    chunks = {
        0: ["a b c d", "d e f g", "g"],
        1: ["x"],
        2: [""],
        3: ["p q r"],
    }
    want = {
        d: (
            len(cs),
            sum(md5half(f"{i}:{s}") % CHUNK_FP_MOD for i, s in enumerate(cs)),
        )
        for d, cs in chunks.items()
    }
    assert got == want


def test_sf_duckdb_parity(ray_session):
    from ontology_matcher_ray.oracle import RAG_CHUNKS_SQL
    from tests.util import assert_matches_oracle

    assert_matches_oracle(chunk_documents(SF), RAG_CHUNKS_SQL, SF)


def test_profile_sf_duckdb_parity(ray_session):
    # the profile SQL is folded into doc_profile for the driver; rebuild
    # the standalone fragment the same way the oracle module does
    from ontology_matcher_ray.oracle import RAG_CHUNKS_SQL
    from tests.util import assert_matches_oracle

    sql = f"""
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rag_chunks,
       CAST(sum(CAST(md5_number_lower(CAST(chunk_idx AS VARCHAR)
                                      || ':' || chunk_text)
                     % {CHUNK_FP_MOD} AS BIGINT)) AS BIGINT) AS chunk_fp
FROM ({RAG_CHUNKS_SQL})
GROUP BY 1
"""
    assert_matches_oracle(chunk_profile(SF), sql, SF)


def test_partition_invariance(planted, ray_session):
    import ray.data as rd

    a = pd.DataFrame(_rows(planted, window=4, stride=3))
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 1024  # force many tiny blocks
        b = pd.DataFrame(_rows(planted, window=4, stride=3))
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a, b)


def test_every_token_covered_sf(ray_session):
    """Window/stride cover invariant on real data: per doc, chunk count =
    ceil(n/stride) and the last chunk ends exactly at n tokens."""
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = docs["text"].astype(str).str.split(" ").str.len()
    want = pd.DataFrame({
        "doc_id": docs["doc_id"].astype("int64"),
        "n": n.astype("int64"),
    })
    got = chunk_documents(SF).to_pandas()
    g = got.groupby("doc_id").agg(
        n_chunks=("chunk_idx", "size"),
        last_end=("start_tok", "max"),
    ).reset_index()
    m = g.merge(want, on="doc_id")
    stride = 48
    assert (m["n_chunks"].to_numpy()
            == -(-m["n"].to_numpy() // stride)).all()
    last = got.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id").tail(1)
    lm = last.merge(want, on="doc_id")
    assert ((lm["start_tok"] + lm["n_chunk_tokens"]).to_numpy()
            == lm["n"].to_numpy()).all()

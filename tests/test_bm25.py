"""Okapi BM25 retrieval scoring (docs_train.bm25_scores): value-exact vs
an independent pure-Python reference AND vs the SQL oracle fragment on an
edge-case corpus (empty text, OOV-only docs, repeated query terms),
invariant to input partitioning, with the OOV query term exercising the
df = 0 idf branch."""

import math

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import BM25_QUERY, bm25_scores

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bm25")
    rows = []
    for i in range(90):
        if i % 9 == 0:
            text = ""                            # one empty token after split
        elif i % 9 == 1:
            text = "nothing relevant here"       # all-miss doc
        elif i % 3 == 0:
            text = "merge join merge merge spark window"   # repeated terms
        else:
            text = f"customer {i % 5} join filler window w{i % 7}"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "s", "n_chars": len(text)})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _reference(sf: str, terms=BM25_QUERY, k1=1.2, b=0.75) -> dict:
    """Independent plain-Python BM25 (dict counting, same quantization)."""
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    t = sum(len(v) for v in toks.values())
    dfs = {q: sum(q in v for v in toks.values()) for q in terms}
    out = {}
    for doc_id, tk in toks.items():
        dl = len(tk)
        s = 0
        for q in terms:
            tf = tk.count(q)
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            s += math.floor(1e6 * idf * (tf * (k1 + 1.0))
                            / (tf + k1 * ((1.0 - b) + dl * n / t * b)))
        out[doc_id] = s
    return out


def _run(sf: str, **kw) -> dict:
    df = bm25_scores(sf, **kw).to_pandas()
    return dict(zip(df["doc_id"], df["bm25_micro"]))


def _oracle(sf: str) -> dict:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    df = con.execute(_component_sql()).df()
    return dict(zip(df["doc_id"], df["bm25_micro"]))


def _component_sql() -> str:
    # the same SQL the oracle embeds inside doc_profile (kept verbatim
    # here so the component stays independently checkable standalone)
    terms = "'merge', 'join', 'window', 'spark', 'customer', 'zzzoov'"
    return f"""
WITH btoks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS token
               FROM documents),
bdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM btoks GROUP BY 1),
bgl AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dl) AS BIGINT) AS t FROM bdl),
bq AS (SELECT unnest([{terms}]) AS term),
bqdf AS (SELECT q.term, CAST(COALESCE(d.df, 0) AS BIGINT) AS df
         FROM bq q LEFT JOIN
           (SELECT token, count(DISTINCT doc_id) AS df FROM btoks
            WHERE token IN ({terms}) GROUP BY 1) d ON d.token = q.term),
btf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM btoks
        WHERE token IN ({terms}) GROUP BY 1, 2),
bsc AS (SELECT d.doc_id,
          floor(1000000.0
                * ln((g.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
                * (COALESCE(f.tf, 0) * (1.2 + 1.0))
                / (COALESCE(f.tf, 0)
                   + 1.2 * ((1.0 - 0.75) + d.dl * g.n / g.t * 0.75))) AS sc
        FROM bdl d CROSS JOIN bgl g
        JOIN bqdf q ON TRUE
        LEFT JOIN btf f ON f.doc_id = d.doc_id AND f.token = q.term)
SELECT doc_id, CAST(sum(sc) AS BIGINT) AS bm25_micro FROM bsc GROUP BY 1
"""


def test_bm25_matches_python_reference_edge(edge_dir, ray_session):
    assert _run(edge_dir) == _reference(edge_dir)


def test_bm25_matches_oracle_edge(edge_dir, ray_session):
    assert _run(edge_dir) == _oracle(edge_dir)


def test_bm25_matches_both_on_sf(ray_session):
    got = _run(SF)
    assert got == _reference(SF)
    assert got == _oracle(SF)


def test_bm25_oov_term_scores_zero(edge_dir, ray_session):
    # a query of only the OOV term gives every doc tf = 0 -> score 0
    got = _run(edge_dir, query_terms=("zzzoov",))
    assert set(got.values()) == {0}


def test_bm25_relevant_doc_outranks_miss(edge_dir, ray_session):
    got = _run(edge_dir)
    docs = pd.read_parquet(f"{edge_dir}/documents.parquet")
    hit = docs[docs.text.str.startswith("merge join")].doc_id.iloc[0]
    miss = docs[docs.text == "nothing relevant here"].doc_id.iloc[0]
    assert got[hit] > got[miss] == 0


@pytest.mark.parametrize("batch_size", [1, 7, 1024])
def test_bm25_batch_invariant(edge_dir, ray_session, batch_size):
    # the stats pass is a per-batch combiner: forcing tiny batches must
    # not perturb the global (N, T, df) reduction or any score
    assert _run(edge_dir, batch_size=batch_size) == _reference(edge_dir)


def test_bm25_rejects_duplicate_terms():
    with pytest.raises(ValueError):
        bm25_scores(SF, query_terms=("join", "join"))

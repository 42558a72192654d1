"""CCNet-style stupid-backoff bigram LM scoring
(docs_train.lm_perplexity): value-exact vs BOTH an independent DuckDB
recompute and a pure-Python dict-based reference on an edge-case corpus
(empty text, single-token docs, double-space '' tokens, OOV docs,
train-slice members), invariant to exchange partitioning and hot-key
salting."""

import math

import duckdb
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_train import (
    DECON_EVAL_MOD,
    lm_perplexity,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lmppl")
    rows = []
    for i in range(120):
        if i % 11 == 0:
            text = ""                        # no tokens -> marker row
        elif i % 11 == 1:
            text = "lonely"                  # one token -> no bigrams
        elif i % 11 == 2:
            text = "gap  twice"              # double space -> '' token
        elif i % 13 == 0:
            text = f"zz{i}q xx{i}v totally oov"   # OOV-heavy
        elif i % 3 == 0:
            text = "the quick brown fox the quick"
        else:
            text = f"doc {i % 7} body value {i % 5} end"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "s", "n_chars": len(text)})
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _lm_sql() -> str:
    L = "CAST(floor(1000000 * ln(greatest({x}, 1))) AS BIGINT)"
    la = f"({L.format(x=4)} - {L.format(x=10)})"
    return f"""
WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
bgl AS (SELECT doc_id,
          unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS b FROM t),
bc AS (SELECT doc_id, b, count(*) AS c FROM bgl GROUP BY 1, 2),
tuni AS (SELECT w, count(*) AS c1 FROM
           (SELECT unnest(toks) AS w FROM t
            WHERE doc_id % {DECON_EVAL_MOD} = 0) GROUP BY 1),
tot AS (SELECT CAST(COALESCE(sum(c1), 0) AS BIGINT) AS tt,
               CAST(count(*) AS BIGINT) AS vv FROM tuni),
tbig AS (SELECT b, count(*) AS c2 FROM bgl
         WHERE doc_id % {DECON_EVAL_MOD} = 0 GROUP BY 1),
big2 AS (SELECT tb.b, tb.c2, tu.c1 AS c1u
         FROM tbig tb JOIN tuni tu ON str_split(tb.b, ' ')[1] = tu.w),
s AS (SELECT bc.doc_id,
        sum(bc.c * CASE
          WHEN b2.c2 IS NOT NULL THEN
            {L.format(x='b2.c2')} - {L.format(x='b2.c1u')}
          WHEN u.c1 IS NOT NULL THEN
            {la} + {L.format(x='u.c1')}
            - {L.format(x='(SELECT tt FROM tot)')}
          ELSE {la} - {L.format(x='(SELECT tt + vv FROM tot)')}
          END) AS slp,
        sum(bc.c) AS n
      FROM bc
      LEFT JOIN big2 b2 ON bc.b = b2.b
      LEFT JOIN tuni u ON str_split(bc.b, ' ')[2] = u.w
      GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS lm_n_scored,
       CAST(COALESCE((-s.slp) // greatest(s.n, 1), 0) AS BIGINT)
         AS lm_xent_micro
FROM documents d LEFT JOIN s USING (doc_id)
"""


def _oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con.execute(_lm_sql() + " ORDER BY doc_id").df()


def _pure(sf: str) -> pd.DataFrame:
    """Independent dict-based transcription of the scoring rule."""
    df = pd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = {int(r.doc_id): str(r.text).split(" ") for r in df.itertuples()}
    c1: dict = {}
    c2: dict = {}
    t_total = 0
    for d, ts in toks.items():
        if d % DECON_EVAL_MOD:
            continue
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
            t_total += 1
        for u, w in zip(ts, ts[1:]):
            c2[(u, w)] = c2.get((u, w), 0) + 1
    v_total = len(c1)

    def L(x: int) -> int:
        return math.floor(1_000_000 * math.log(max(x, 1)))

    la = L(4) - L(10)
    rows = []
    for d in sorted(toks):
        ts = toks[d]
        s = n = 0
        for u, w in zip(ts, ts[1:]):
            n += 1
            if (u, w) in c2:
                lp = L(c2[(u, w)]) - L(c1[u])
            elif w in c1:
                lp = la + L(c1[w]) - L(t_total)
            else:
                lp = la - L(t_total + v_total)
            s += lp
        rows.append({"doc_id": d, "lm_n_scored": n,
                     "lm_xent_micro": (-s) // max(n, 1)})
    return pd.DataFrame(rows).astype(
        {"doc_id": "int64", "lm_n_scored": "int64",
         "lm_xent_micro": "int64"})


def _run(sf: str, **kw) -> pd.DataFrame:
    return (lm_perplexity(sf, **kw).to_pandas()
            .sort_values("doc_id", ignore_index=True))


def test_lm_ppl_edge_cases_match_both_oracles(edge_dir):
    got = _run(edge_dir)
    assert len(got) == 120                  # one row per doc, shorts kept
    assert (got.loc[got["lm_n_scored"] == 0, "lm_xent_micro"] == 0).all()
    assert (got["lm_n_scored"] == 0).any()  # markers exercised
    pd.testing.assert_frame_equal(got, _oracle(edge_dir))
    pd.testing.assert_frame_equal(got, _pure(edge_dir))
    # fluency signal: docs made of train-slice bigrams score lower
    # cross-entropy than the planted OOV docs
    scored = got[got["lm_n_scored"] > 0]
    oov = scored[scored["doc_id"] % 13 == 0]
    rest = scored[scored["doc_id"] % 13 != 0]
    assert oov["lm_xent_micro"].min() > rest["lm_xent_micro"].median()


def test_lm_ppl_sf_tables_match_duckdb():
    pd.testing.assert_frame_equal(_run(SF), _oracle(SF))


def test_lm_ppl_partition_and_salt_invariant(edge_dir):
    base = _run(edge_dir)
    pd.testing.assert_frame_equal(base, _run(edge_dir, num_partitions=3))
    pd.testing.assert_frame_equal(base, _run(edge_dir, salt=4))


def _bucket_oracle(sf: str) -> pd.DataFrame:
    """Independent DuckDB recompute of lm_ppl_buckets (thresholds over
    the top-5-bit sketch at the 0.25/0.75 cuts)."""
    skb = ("(lm_xent_micro >> greatest(length(bin(lm_xent_micro)) - 5, 0))"
           " << greatest(length(bin(lm_xent_micro)) - 5, 0)")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con.execute(f"""
WITH lm AS ({_lm_sql()}),
sk AS (SELECT doc_id, lm_n_scored, lm_xent_micro, {skb} AS skb FROM lm),
th AS (SELECT quantile_disc(skb, 0.25) AS t_head,
              quantile_disc(skb, 0.75) AS t_tail
       FROM sk WHERE lm_n_scored > 0)
SELECT doc_id, lm_n_scored, lm_xent_micro,
       CASE WHEN lm_n_scored = 0 THEN 'unscored'
            WHEN skb <= (SELECT t_head FROM th) THEN 'head'
            WHEN skb > (SELECT t_tail FROM th) THEN 'tail'
            ELSE 'middle' END AS ppl_bucket
FROM sk ORDER BY doc_id
""").df()


def test_lm_ppl_buckets_match_duckdb(edge_dir):
    from ontology_matcher_ray.pipelines.docs_train import lm_ppl_buckets

    got = (lm_ppl_buckets(edge_dir).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _bucket_oracle(edge_dir)
    pd.testing.assert_frame_equal(got, want)
    # unscored == exactly the short docs; the max-entropy ties sit AT the
    # 75% threshold here, so 'tail' is legitimately empty on this fixture
    assert ((got["ppl_bucket"] == "unscored")
            == (got["lm_n_scored"] == 0)).all()
    assert set(got["ppl_bucket"]) <= {"head", "middle", "tail", "unscored"}
    # the planted OOV docs never land in the fluent head
    oov = got[(got["doc_id"] % 13 == 0) & (got["lm_n_scored"] > 0)]
    assert not (oov["ppl_bucket"] == "head").any()


def test_lm_ppl_buckets_sf_match_duckdb():
    from ontology_matcher_ray.pipelines.docs_train import lm_ppl_buckets

    got = (lm_ppl_buckets(SF).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(got, _bucket_oracle(SF))
    # the sf corpus has a spread distribution: all three scored buckets
    assert {"head", "middle", "tail"} <= set(got["ppl_bucket"])

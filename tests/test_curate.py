"""End-to-end corpus curation (docs_train.curate_decisions /
curate_text): every document gets exactly one decision, the fixed
precedence is honored, and the curated text is the PII-scrubbed
survivor set — checked value-for-value against an independent DuckDB
recompute over ALL docs (the driver composite only covers
content-group representatives via the dedup_exact inner join)."""

import duckdb
import pandas as pd

from ontology_matcher_ray.oracle import clusters_sql
from ontology_matcher_ray.pipelines.docs_train import (
    DECON_EVAL_MOD,
    curate_decisions,
    curate_text,
)

SF = "/root/testdata/sf0.001"



def _expected(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    # the band is recomputed here from scratch (both Gopher OR arms),
    # independent of the engine's doc_quality implementation
    return con.execute(f"""
WITH cl AS ({clusters_sql()}),
t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (SELECT doc_id, max(c) AS mx, sum(c) AS n, count(*) AS nd
        FROM tc GROUP BY 1),
q AS (SELECT doc_id,
        CASE WHEN (mx * 1000000) // n > 140000
               OR ((n - nd) * 1000000) // n > 650000
        THEN 'low' ELSE 'ok' END AS band FROM agg),
ev AS (SELECT DISTINCT array_to_string(str_split(text, ' ')[1:3], ' ') AS ng
       FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 0 AND text <> ''),
dc AS (SELECT d.doc_id,
         CAST(EXISTS (SELECT 1 FROM ev WHERE contains(d.text, ev.ng))
              AS BIGINT) AS contaminated FROM documents d),
inc AS (SELECT d.doc_id,
          CAST(CASE WHEN EXISTS (SELECT 1 FROM documents p
                                 WHERE p.doc_id % 2 = 0 AND p.text = d.text)
               THEN 1 ELSE 0 END AS BIGINT) AS in_prior FROM documents d)
SELECT cl.doc_id,
       (cl.keep AND q.band <> 'low' AND dc.contaminated = 0
        AND inc.in_prior = 0) AS curate_keep,
       CASE WHEN NOT cl.keep THEN 'near_dup'
            WHEN q.band = 'low' THEN 'low_quality'
            WHEN dc.contaminated = 1 THEN 'contaminated'
            WHEN inc.in_prior = 1 THEN 'in_prior'
            ELSE '' END AS drop_reason
FROM cl JOIN q USING (doc_id) JOIN dc USING (doc_id)
JOIN inc USING (doc_id)
ORDER BY doc_id
""").df()


def test_curate_decisions_every_doc_matches_duckdb():
    got = (curate_decisions(SF).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    want = _expected(SF)
    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert len(got) == n_docs           # one decision per document
    assert got["doc_id"].is_unique
    pd.testing.assert_frame_equal(
        got.astype({"curate_keep": bool, "drop_reason": object}),
        want.astype({"curate_keep": bool, "drop_reason": object}),
    )
    # the fixture must exercise the keep case and at least two drop rules
    reasons = set(got["drop_reason"])
    assert "" in reasons and len(reasons - {""}) >= 2
    assert (got.loc[got["curate_keep"], "drop_reason"] == "").all()


def test_curate_text_is_scrubbed_survivor_set():
    dec = curate_decisions(SF).to_pandas()
    kept_ids = set(dec.loc[dec["curate_keep"], "doc_id"])
    txt = curate_text(SF).to_pandas()
    assert set(txt["doc_id"]) == kept_ids
    assert len(txt) == len(kept_ids)
    # PII scrub applied: no raw email survives in the curated text
    assert not txt["clean_text"].str.contains("@mail", regex=False).any()
    assert (txt.loc[txt["n_emails"] > 0, "clean_text"]
            .str.contains("<EMAIL>").all())

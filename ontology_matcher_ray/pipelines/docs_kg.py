"""KG-construction pipelines over the synthetic ``documents`` table.

This is the engine's flagship surface wired to the driver's test data:
``documents(doc_id, text, lang, source, n_chars)`` plays the role of the
text corpus; the fixture lexicon/dictionary (``state/fixtures.py``) plays
the role of the compiled ontology xref dictionaries.  Stages:

    read_parquet(documents)
      -> map_batches(MentionExtractor actor pool)     # term mentions
      -> map_batches(Resolver actor pool)             # §2.8 routing
      -> map_batches(emit (subj,pred,obj))            # triple emission
      -> groupby(subj,pred,obj) dedup                 # exact dedup (O3)

plus the entity-format / canonical-merge pipelines (reference
``default_format`` + ``cli.py:276-291`` dedup aggregation) over an entity
table derived DETERMINISTICALLY from documents so a DuckDB oracle can
recompute every result in closed form.

Every function takes ``sf_dir`` and returns a lazy ``ray.data.Dataset``;
none of them calls ``ray.init``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ontology_matcher_ray.functions.listops import merge_unique
from ontology_matcher_ray.schemas import DISEASE_SPEC, FORMATTED_COLUMNS, OntologySpec, Strategy
from ontology_matcher_ray.stages.extract import MentionExtractor
from ontology_matcher_ray.stages.format import Formatter
from ontology_matcher_ray.stages.resolve import Resolver, RouteResult, route_id
from ontology_matcher_ray.state.fixtures import ORDERED_TERMS
from ontology_matcher_ray.state.snapshot import DictionarySnapshot, get_snapshot

SPEC = DISEASE_SPEC

# Broadcast cache: one ray.put per snapshot identity PER RAY SESSION;
# actors read the object-store copy instead of re-shipping the dict with
# every task.  The cache key is a token ATTACHED to the snapshot object
# (not id(): a GC'd snapshot's address can be reused, which would
# silently serve a stale object-store dictionary) plus the Ray job id —
# a ref put in a previous session is dead once that session ends (e.g.
# bench.py's fresh-session repeats) and must never be served.
_BROADCAST: Dict[str, "ray.ObjectRef"] = {}
_BC_SEQ = [0]


def _broadcast_token(snap: DictionarySnapshot) -> str:
    tok = getattr(snap, "_bc_token", None)
    if tok is None:
        _BC_SEQ[0] += 1
        tok = "snap-%d" % _BC_SEQ[0]
        object.__setattr__(snap, "_bc_token", tok)
    # node id is unique per Ray session (job ids restart at 01000000 on
    # every local ray.init, so they can NOT distinguish sessions)
    return "%s@%s" % (tok, ray.get_runtime_context().get_node_id())


def _snapshot_ref(snapshot: Optional[DictionarySnapshot] = None) -> "ray.ObjectRef":
    snap = snapshot or get_snapshot(SPEC)
    key = _broadcast_token(snap)
    if key not in _BROADCAST:
        _BROADCAST[key] = ray.put(snap)
    return _BROADCAST[key]


def _lexicon_ref(snapshot: Optional[DictionarySnapshot] = None) -> "ray.ObjectRef":
    snap = snapshot or get_snapshot(SPEC)
    key = "lex:" + _broadcast_token(snap)
    if key not in _BROADCAST:
        _BROADCAST[key] = ray.put(dict(snap.lexicon))
    return _BROADCAST[key]


def read_documents(sf_dir: str, columns: Optional[List[str]] = None) -> rd.Dataset:
    from ontology_matcher_ray.sources.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Entity-table derivation (deterministic; mirrored by the oracle SQL).
# ---------------------------------------------------------------------------

def _derive_entity_batch(batch: pd.DataFrame) -> pd.DataFrame:
    doc_id = batch["doc_id"].astype("int64")
    n = len(ORDERED_TERMS)
    raw_ids = [ORDERED_TERMS[i % n][1] for i in doc_id]
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "id": raw_ids,
            "name": ["name_%d" % i for i in doc_id],
            "label": "Disease",
            "resource": batch["source"].astype(str),
            "description": "",
            "synonyms": ["syn_%d|shared_syn" % (i % 5) for i in doc_id],
            "pmids": "",
            "taxid": "",
            "xrefs": "",
        }
    )


def derive_entities(sf_dir: str) -> rd.Dataset:
    """documents -> reference-shaped entity input table (FIXTURES.md F2)."""
    ds = read_documents(sf_dir, columns=["doc_id", "source"])
    return ds.map_batches(_derive_entity_batch, batch_format="pandas")


def resolve_entities(sf_dir: str, strategy: Strategy = Strategy.MIXTURE) -> rd.Dataset:
    """Entity table + Resolver -> routing decisions (status/reason/out_id)."""
    ref = _snapshot_ref()
    ds = derive_entities(sf_dir)
    ds = ds.map_batches(
        Resolver,
        fn_constructor_kwargs=dict(snapshot_ref=ref, spec=SPEC, strategy=strategy),
        batch_format="pandas",
        concurrency=(1, 4),
        batch_size=4096,
    )
    return ds


def resolve_route(sf_dir: str) -> rd.Dataset:
    """Query surface: (doc_id, raw_id, status, reason, out_id)."""
    ds = resolve_entities(sf_dir)
    ds = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "raw_id": b["id"],
                "status": b["status"],
                "reason": b["reason"],
                "out_id": b["out_id"],
            }
        ),
        batch_format="pandas",
    )
    return ds


def format_entities(sf_dir: str, keep_doc_id: bool = False,
                    strategy: Strategy = Strategy.MIXTURE) -> rd.Dataset:
    """Full ontology-format pipeline output (FORMATTED_COLUMNS + sink)."""
    ds = resolve_entities(sf_dir, strategy)
    fmt = Formatter(SPEC, strategy)

    def _fmt(batch: pd.DataFrame) -> pd.DataFrame:
        out = fmt(batch)
        if keep_doc_id:
            out["doc_id"] = batch["doc_id"].astype("int64").values
        return out

    return ds.map_batches(_fmt, batch_format="pandas")


def formatted_entities(sf_dir: str) -> rd.Dataset:
    """The formatted sink only (reference main output TSV)."""
    ds = format_entities(sf_dir)
    ds = ds.map_batches(
        lambda b: b[b["sink"] == "formatted"][FORMATTED_COLUMNS], batch_format="pandas"
    )
    return ds


def formatted_entities_unique(sf_dir: str) -> rd.Dataset:
    """UNIQUE-strategy formatted sink: failed ids with non-default prefixes
    are NOT readmitted (ontology_formatter.py:756-763)."""
    ds = format_entities(sf_dir, strategy=Strategy.UNIQUE)
    return ds.map_batches(
        lambda b: b[b["sink"] == "formatted"][FORMATTED_COLUMNS], batch_format="pandas"
    )


def failed_entities_unique(sf_dir: str) -> rd.Dataset:
    """UNIQUE-strategy failed sink with reasons (the *.failed.tsv surface)."""
    ds = format_entities(sf_dir, strategy=Strategy.UNIQUE)
    return ds.map_batches(
        lambda b: b[b["sink"] == "failed"][FORMATTED_COLUMNS + ["reason"]],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Canonical-id merge (A1, cli.py:276-291) as a two-phase salted-safe merge.
# ---------------------------------------------------------------------------

_FIRST_COLS = ["name", "description", "resource", "taxid"]
_MERGE_COLS = ["xrefs", "synonyms", "pmids", "raw_id"]


def _partial_merge(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: one row per (id,label) per batch.

    'first' is made deterministic as arg-min over doc_id (the reference's
    pandas ``first`` is input-order dependent — SURVEY §4.1); merge_unique
    is associative, so partial->final composition is exact.
    """
    recs = []
    for (eid, label), g in batch.groupby(["id", "label"], sort=False):
        i = g["doc_id"].idxmin()
        rec = {"id": eid, "label": label, "doc_id": int(g["doc_id"].min())}
        for c in _FIRST_COLS:
            rec[c] = g.loc[i, c]
        for c in _MERGE_COLS:
            rec[c] = merge_unique(g[c].tolist())
        recs.append(rec)
    cols = ["id", "label", "doc_id"] + _FIRST_COLS + _MERGE_COLS
    if not recs:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
    return pd.DataFrame(recs)[cols]


def canonical_merge(sf_dir: str) -> rd.Dataset:
    """groupby(id,label) merge: THE canonicalization shuffle.

    Phase 1 combines inside each batch (map_batches) so the all-to-all
    exchange moves one row per key per block, not one per input row; phase 2
    is the small groupby().map_groups final merge.
    """
    ds = format_entities(sf_dir, keep_doc_id=True)
    ds = ds.map_batches(
        lambda b: _partial_merge(b[b["sink"] == "formatted"]), batch_format="pandas"
    )
    from ontology_matcher_ray.stages import exchange

    ds = exchange.partitioned_apply(ds, ["id", "label"], _partial_merge, num_partitions=32)
    return ds.drop_columns(["doc_id"])


def curie_validate(sf_dir: str) -> rd.Dataset:
    """M2 as a routed (not raised) validator: (doc_id, id, valid).

    Input ids are derived deterministically with valid and invalid shapes;
    validation is the reference CURIE regex (ontology_formatter.py:292).
    """
    from ontology_matcher_ray.functions.curie import validate_ids

    ds = read_documents(sf_dir, columns=["doc_id"])

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        doc_id = b["doc_id"].astype("int64")
        shapes = [
            lambda i: "MESH:D%d" % i,
            lambda i: "FOO:%d" % i,
            lambda i: "MONDO:00%d" % i,
            lambda i: "MESH:D %d" % i,
            lambda i: "noprefix",
        ]
        ids = [shapes[i % 5](i) for i in doc_id]
        return pd.DataFrame(
            {"doc_id": doc_id, "id": ids, "valid": validate_ids(ids, SPEC)}
        )

    return ds.map_batches(stage, batch_format="pandas")


def curie_parse(sf_dir: str) -> rd.Dataset:
    """M3 prefix grouping: per-prefix id counts over the derived entities.

    Uses the vectorized pyarrow CURIE splitter + a two-phase count
    (per-batch combiner, then a tiny groupby over partials).
    """
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from ontology_matcher_ray.functions.curie import split_curie_arrays

    ds = derive_entities(sf_dir)

    def partial(t: _pa.Table) -> _pa.Table:
        # combiner: one row per (prefix, raw_id) per batch — exact distinct
        # counting composes across batches, unlike partial count_distinct
        prefix, _ = split_curie_arrays(t["id"])
        tbl = _pa.table({"prefix": prefix, "raw_id": t["id"]})
        g = tbl.group_by(["prefix", "raw_id"]).aggregate([("raw_id", "count")])
        return g.rename_columns(["prefix", "raw_id", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from ontology_matcher_ray.stages import exchange

    def agg(gb) -> pd.DataFrame:
        return gb.agg(n_ids=("n", "sum"), n_distinct_ids=("raw_id", "nunique"))

    return exchange.grouped_agg(partials, ["prefix"], agg, num_partitions=8)


# ---------------------------------------------------------------------------
# Mention extraction, linking, triples.
# ---------------------------------------------------------------------------

def mentions(sf_dir: str) -> rd.Dataset:
    """Distinct (doc_id, term, raw_id) mentions via the extractor pool."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        MentionExtractor,
        fn_constructor_kwargs=dict(lexicon_ref=_lexicon_ref()),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        batch_size=2048,
    )


def linked_mentions(sf_dir: str) -> rd.Dataset:
    """Mentions resolved through the dictionary: + status/out_id columns."""
    ds = mentions(sf_dir)
    return ds.map_batches(
        Resolver,
        fn_constructor_kwargs=dict(snapshot_ref=_snapshot_ref(), spec=SPEC, id_column="raw_id"),
        batch_format="pandas",
        concurrency=(1, 4),
        batch_size=8192,
    )


def _dedup_triples(ds: rd.Dataset) -> rd.Dataset:
    """Exact (subj,pred,obj) dedup (O3) via per-batch dedup + groupby-first.

    The per-batch drop_duplicates is the partial combiner; the groupby is
    the one shuffle, keyed on the triple itself.
    """
    from ontology_matcher_ray.stages import exchange

    return exchange.distinct(ds, ["subj", "pred", "obj"], num_partitions=32)


def mention_triples(sf_dir: str) -> rd.Dataset:
    """(doc:<id>, mentions, resolved-output-id) triples.

    Under MIXTURE every mention yields a triple: canonical id when routing
    succeeded, raw id for fallback/readmitted rows (§2.8 rules 7-8).
    """
    ds = linked_mentions(sf_dir)

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": "doc:" + b["doc_id"].astype("int64").astype(str),
                "pred": "mentions",
                "obj": b["out_id"].astype(str),
            }
        )

    return _dedup_triples(ds.map_batches(emit, batch_format="pandas"))


def _meta_emit_arrow(b):
    """(doc, in_lang, lang) + (doc, from_source, source) rows, zero-copy
    Arrow: the subj column is built with a compute kernel and the string
    payload columns pass through without a pandas round trip."""
    import pyarrow as pa
    import pyarrow.compute as pc

    subj = pc.binary_join_element_wise(
        pa.scalar("doc:"),
        pc.cast(b.column("doc_id"), pa.string()),
        pa.scalar(""),
    )
    n = b.num_rows
    lang = pa.table({
        "subj": subj,
        "pred": pa.repeat(pa.scalar("in_lang"), n),
        "obj": pc.cast(b.column("lang"), pa.string()),
    })
    src = pa.table({
        "subj": subj,
        "pred": pa.repeat(pa.scalar("from_source"), n),
        "obj": pc.cast(b.column("source"), pa.string()),
    })
    return pa.concat_tables([lang, src])


def doc_meta_triples(sf_dir: str) -> rd.Dataset:
    """(doc, in_lang, lang) and (doc, from_source, source) triples."""
    ds = read_documents(sf_dir, columns=["doc_id", "lang", "source"])
    return _dedup_triples(ds.map_batches(_meta_emit_arrow, batch_format="pyarrow"))


def entity_xref_triples(sf_dir: str) -> rd.Dataset:
    """(resolved-id, xref, alias-id) triples for converted mentions.

    alias semantics per ``get_alias_ids`` (ontology_formatter.py:625-641);
    failed/readmitted mentions emit nothing (no xref enrichment, rule 8).
    """
    ds = linked_mentions(sf_dir)

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["status"].isin(["ok", "ok_raw"])]
        xref_lists = [
            sorted(set(a) | set(m))
            for a, m in zip(keep["alias_ids"], keep["meta_xrefs"])
        ]
        frame = pd.DataFrame(
            {"subj": keep["out_id"].astype(str), "obj": xref_lists}
        ).explode("obj")
        frame = frame[frame["obj"].notna()]
        frame["pred"] = "xref"
        return frame[["subj", "pred", "obj"]]

    return _dedup_triples(ds.map_batches(emit, batch_format="pandas"))


def kg_triples(sf_dir: str) -> rd.Dataset:
    """Flagship: mention + doc-metadata + xref triples, deduped.

    Built from ONE extract+link pass (a single extractor pool and a single
    resolver pool) — the mention and xref emissions are cheap task-stages
    fanning out of the same linked stream.  A union of independently-linked
    branches would multiply actor pools and, on a small CPU budget, starve
    the read stage (idle actors reserve CPUs).
    """
    linked = linked_mentions(sf_dir)

    def emit_both(b: pd.DataFrame) -> pd.DataFrame:
        mention = pd.DataFrame(
            {
                "subj": "doc:" + b["doc_id"].astype("int64").astype(str),
                "pred": "mentions",
                "obj": b["out_id"].astype(str),
            }
        )
        keep = b[b["status"].isin(["ok", "ok_raw"])]
        xref_lists = [
            sorted(set(a) | set(m))
            for a, m in zip(keep["alias_ids"], keep["meta_xrefs"])
        ]
        xref = pd.DataFrame(
            {"subj": keep["out_id"].astype(str), "obj": xref_lists}
        ).explode("obj")
        xref = xref[xref["obj"].notna()]
        xref["pred"] = "xref"
        return pd.concat([mention, xref[["subj", "pred", "obj"]]], ignore_index=True)

    body = _dedup_triples(linked.map_batches(emit_both, batch_format="pandas"))
    # doc-metadata triples are distinct per doc by construction: no actor
    # pool, no dedup shuffle needed; Arrow-native emit (zero-copy strings)
    meta = read_documents(sf_dir, columns=["doc_id", "lang", "source"]).map_batches(
        _meta_emit_arrow, batch_format="pyarrow"
    )
    return body.union(meta)


def triple_delta(old: rd.Dataset, new: rd.Dataset,
                 num_partitions: int = 32) -> rd.Dataset:
    """(op, subj, pred, obj): the snapshot diff between two triple sets —
    'add' rows present only in ``new``, 'del' rows present only in
    ``old`` — the incremental-publish primitive a continuously-rebuilt
    KG ships downstream instead of the full graph.

    ONE exchange: both sides are tagged and unioned, the triple
    co-locates by content hash, and the partition kernel reduces each
    triple's side set to min/max (0-only -> del, 1-only -> add, both ->
    unchanged, dropped).  Duplicate rows within a side collapse in the
    same reduction, so inputs need not be pre-distinct and no separate
    distinct/anti-join exchanges are paid (a two-way anti-join
    formulation costs 4).
    """
    from ontology_matcher_ray.stages import exchange

    def tag(ds: rd.Dataset, side: int) -> rd.Dataset:
        return ds.map_batches(
            lambda b, side=side: pd.DataFrame({
                "subj": b["subj"].astype(str),
                "pred": b["pred"].astype(str),
                "obj": b["obj"].astype(str),
                "_sd": np.full(len(b), side, dtype=np.int8),
            }).drop_duplicates(["subj", "pred", "obj", "_sd"]),
            batch_format="pandas",
        )

    u = tag(old, 0).union(tag(new, 1))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        gb = (g.groupby(["subj", "pred", "obj"], sort=False)["_sd"]
               .agg(["min", "max"]).reset_index())
        only_old = gb["max"].to_numpy() == 0
        only_new = gb["min"].to_numpy() == 1
        keep = only_old | only_new
        out = gb.loc[keep, ["subj", "pred", "obj"]].copy()
        out.insert(0, "op", np.where(only_new[keep], "add", "del"))
        return out

    return exchange.partitioned_apply(u, ["subj", "pred", "obj"], kern,
                                      num_partitions)


TK_SEP = "\x1f"        # unit separator: never appears in triple parts


def publish_triples(base: str, new_triples: rd.Dataset,
                    num_ranges: int = 16,
                    num_partitions: int = 32) -> pd.DataFrame:
    """Incremental KG publish into an MVCC-versioned table
    (``sources/versioned``): the continuously-rebuilt KG ships each
    rebuild as ONE atomic snapshot-isolated version instead of
    rewriting files under its readers.

    * First publish: the triple set becomes version 1, range-partitioned
      on a surrogate key ``tk = subj\x1fpred\x1fobj`` (the triple IS
      the primary key, so upsert/delete semantics degenerate to exact
      set insert/remove — idempotent by construction).
    * Later publishes: ``triple_delta`` diffs the HEAD snapshot against
      the new set in one exchange; only the add/del rows become a
      changeset, and ``merge_versioned`` rewrites only the ranges they
      land in.  Downstream readers pinned to any retained version are
      untouched; ``read_versioned(base, v)`` is the KG as of publish v.

    Returns the delta stats frame (op counts for this publish).
    """
    from ontology_matcher_ray.sources import versioned as vt

    def with_tk(b: pd.DataFrame) -> pd.DataFrame:
        s_, p_, o_ = (b["subj"].astype(str), b["pred"].astype(str),
                      b["obj"].astype(str))
        return pd.DataFrame({
            "tk": s_ + TK_SEP + p_ + TK_SEP + o_,
            "subj": s_, "pred": p_, "obj": o_,
        })

    keyed_new = new_triples.map_batches(with_tk, batch_format="pandas")
    if not vt.list_versions(base):
        # lakehouse sidecars on every committed part: tk zone maps (the
        # sort key — range scans) + a subj Bloom (point probes: "all
        # triples about entity X" opens only the parts that can hold X)
        stats = vt.create_versioned(keyed_new, base, "tk",
                                    num_ranges=num_ranges,
                                    stat_cols=["tk"],
                                    bloom_cols=["subj"])
        return pd.DataFrame({"op": ["add"], "rows": [int(stats["rows"].sum())]})

    old = vt.read_versioned(base, columns=["subj", "pred", "obj"])
    delta = triple_delta(old, new_triples, num_partitions=num_partitions)

    def to_changes(b: pd.DataFrame) -> pd.DataFrame:
        out = with_tk(b)
        out["_op"] = np.where(b["op"].to_numpy() == "add",
                              "upsert", "delete")
        return out

    changes = delta.map_batches(to_changes, batch_format="pandas")
    mstats = vt.merge_versioned(base, changes)
    # one consumption of the delta; counts come from the merge stats
    # (an empty delta commits nothing and reports 0/0)
    return pd.DataFrame({
        "op": ["add", "del"],
        "rows": [int(mstats["upserts"].sum()),
                 int(mstats["deletes"].sum())],
    })


def subject_triples(base: str, subj: str,
                    version: int | None = None) -> rd.Dataset:
    """All triples about one entity from a published KG snapshot — the
    Bloom-pruned point probe over ``publish_triples`` output: only
    parts whose subj Bloom (written with every commit) can contain
    ``subj`` are opened.  Identical rows to filtering the full
    snapshot."""
    from ontology_matcher_ray.sources import versioned as vt

    return vt.read_versioned_eq(base, "subj", subj, version=version,
                                columns=["subj", "pred", "obj"])


def kg_delta(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Demonstration wiring of ``triple_delta``: diff the KG built from
    the even-doc_id half of the corpus (the "previous snapshot") against
    the full corpus KG.  Entity xref triples shared by both snapshots
    vanish from the delta; mention/meta triples of odd documents arrive
    as 'add' rows; 'del' rows appear only if dropping documents removed
    an entity's last mention (its xref tier)."""
    import shutil
    import tempfile

    # previous snapshot: stage the even-doc half as an sf-style dir and
    # run the same pipeline over it (demo wiring — a production caller
    # diffs two already-built triple outputs and never re-extracts).
    # The snapshot side is MATERIALIZED before the delta union: two
    # live extract/resolve actor pools in one streaming topology can
    # deadlock on a small CPU budget (idle actors reserve CPUs — the
    # single-pool flagship rule; see .claude/skills/verify gotchas)
    old_dir = tempfile.mkdtemp(prefix="onto_ray_delta_", dir="/tmp")
    read_documents(sf_dir).map_batches(
        lambda b: b[b["doc_id"] % 2 == 0], batch_format="pandas"
    ).write_parquet(os.path.join(old_dir, "documents.parquet"))
    old = kg_triples(old_dir).materialize()
    shutil.rmtree(old_dir, ignore_errors=True)
    full = kg_triples(sf_dir)
    return triple_delta(old, full, num_partitions)


def mention_contexts(sf_dir: str, window: int = 3) -> rd.Dataset:
    """(doc_id, term, raw_id, pos, context): every OCCURRENCE of a
    single-token lexicon term with its +/-``window``-token context — the
    KG provenance/evidence record ("doc 17 mentions MONDO:x at token 42:
    '... renal diabetes insipidus nephrogenic ...'") that the distinct
    mention set drops.

    Shuffle-free actor-pool stage: the single-token lexicon tier is
    broadcast once (``ray.put``) and loaded per actor; per batch, ONE
    ``pc.split_pattern`` + ``pc.is_in`` membership over the flattened
    zero-copy token array finds hit positions, and only the (sparse)
    hits pay a per-hit window join — the token stream itself is never
    looped.  Phrase terms are excluded (their occurrence positions need
    n-gram reconstruction; the distinct-set surface still covers them),
    mirrored by the oracle's ``term NOT LIKE '% %'``.  ``pos`` is
    1-based (SQL generate_subscripts convention); the context window is
    clipped at document edges.
    """
    import pyarrow.compute as pc

    snap = get_snapshot(SPEC)
    word_lex = {t: r for t, r in snap.lexicon.items() if " " not in t}
    ref = ray.put(word_lex)

    class ContextStage:
        def __init__(self):
            lex = ray.get(ref)
            self.word_arr = pa.array(list(lex), pa.string())
            self.raw = lex
            self.window = window

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            la = pc.split_pattern(
                pc.cast(t["text"].combine_chunks(), pa.string()), " ")
            offs = la.offsets.to_numpy().astype(np.int64)
            flat = la.flatten()
            member = pc.is_in(flat, value_set=self.word_arr).to_numpy(
                zero_copy_only=False)
            idx = np.nonzero(member)[0]
            if not len(idx):
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype=object),
                    "raw_id": pd.Series(dtype=object),
                    "pos": pd.Series(dtype="int64"),
                    "context": pd.Series(dtype=object)})
            doc_of = np.searchsorted(offs, idx, side="right") - 1
            start, end = offs[doc_of], offs[doc_of + 1]
            lo = np.maximum(idx - self.window, start)
            hi = np.minimum(idx + self.window + 1, end)
            fl = flat.to_numpy(zero_copy_only=False)
            terms = fl[idx]
            ctx = [" ".join(fl[a:b]) for a, b in zip(lo, hi)]  # hits only
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return pd.DataFrame({
                "doc_id": doc_ids[doc_of].astype("int64"),
                "term": terms,
                "raw_id": [self.raw[x] for x in terms],
                "pos": (idx - start + 1).astype("int64"),
                "context": ctx,
            })

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(ContextStage, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8),
                          batch_size=2048)

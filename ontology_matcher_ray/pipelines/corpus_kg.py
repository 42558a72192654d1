"""The corpus-scale KG construction pipeline (SURVEY.md §4.2 physical plan).

    read_parquet(corpus shard)                 # repo,path,commit,lang,content
      -> map_batches(ExtractEmit actor pool)   # sha256 invariant + CURIE /
                                               #   import extraction, fused
      -> map_batches(Linker actor pool)        # §2.8 routing via a
                                               #   PRECOMPUTED route table
      -> per-batch dedup -> groupby(subj,pred,obj) first   # exact dedup
      -> write_parquet(out/shard=K) + lineage record

Design notes for scale:
* ONE consumption per shard: the sha-invariant rides the triple stream as
  ``pred='__sha__'`` rows (one per file), so nothing executes twice and
  ``content`` never enters the shuffle — only (subj, pred, obj) strings.
* The routing table is precomputed ONCE on the driver
  (``precompute_routes``) and broadcast via ``ray.put``; linker actors just
  deserialize it in ``__init__`` instead of re-running the routing tree
  over the whole dictionary per actor.
* Sharded + resumable via ``lineage.run_sharded``: each shard is an
  explicit input-file range with its own output dir and lineage record.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ontology_matcher_ray.functions.hashing import sha256_hex
from ontology_matcher_ray.lineage import Manifest, plan_shards, run_sharded, xor_sha_agg
from ontology_matcher_ray.schemas import DISEASE_SPEC, OntologySpec, Strategy
from ontology_matcher_ray.stages.extract import CurieExtractor, ImportExtractor
from ontology_matcher_ray.stages.resolve import route_id
from ontology_matcher_ray.state.snapshot import DictionarySnapshot

SHA_PRED = "__sha__"


def precompute_routes(
    snapshot: DictionarySnapshot, spec: OntologySpec, strategy: Strategy
) -> Dict[str, str]:
    """raw_id -> output id for every dictionary entry (driver-side, once).

    Mention linking in the corpus pipeline only needs the output id (the
    full §2.8 result set matters for entity formatting, which runs in the
    ontology-match pipeline); misses fall back to the raw id (mixture
    readmission) inside the linker.
    """
    # Fast path of route_id for the out_id-only case (validated against
    # route_id in tests/test_corpus_kg.py::test_routes_match_route_id).
    # Under MIXTURE every outcome yields an id (canonical / self / raw
    # readmission, §2.8 rules 6-8); under UNIQUE, failures map to "" and
    # the Linker DROPS those mentions (no readmission for non-default
    # prefixes, ontology_formatter.py:756-763).
    default = spec.default
    unique = strategy == Strategy.UNIQUE
    out: Dict[str, str] = {}
    for raw_id, db_ids in snapshot.db_ids.items():
        prefix = raw_id.partition(":")[0]
        if prefix == default:
            out[raw_id] = raw_id
            continue
        hits = db_ids.get(default) or ()
        multi_any = any(len(v) > 1 for k, v in db_ids.items() if k != prefix)
        if len(hits) > 1 or (unique and multi_any):
            out[raw_id] = "" if unique else raw_id      # failed
        elif len(hits) == 1:
            out[raw_id] = hits[0]                        # canonical
        else:
            out[raw_id] = raw_id                         # ok_raw keeps raw
    return out


class ExtractEmit:
    """Fused per-file stage: sha256 invariant + CURIE & import extraction.

    Emits (subj, pred, obj) rows: ``mentions`` (raw CURIEs), ``imports``,
    ``in_lang``, plus one ``__sha__`` row per file carrying the content
    sha256 (the per-row invariant, BASELINE.json input_hint).  Compiled
    regexes built once per actor.
    """

    def __init__(self, spec: OntologySpec):
        self.curie = CurieExtractor(spec, id_col="subj", text_col="content")
        self.imports = ImportExtractor(id_col="subj", text_col="content")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["subj"] = batch["repo"].astype(str) + "/" + batch["path"].astype(str)

        curies = self.curie(batch).rename(columns={"raw_id": "obj"})
        curies["pred"] = "mentions"
        imps = self.imports(batch).rename(columns={"module": "obj"})
        imps["pred"] = "imports"
        langs = pd.DataFrame(
            {"subj": batch["subj"], "pred": "in_lang", "obj": batch["lang"].astype(str)}
        )
        sha_rows = pd.DataFrame(
            {"subj": batch["subj"], "pred": SHA_PRED,
             "obj": sha256_hex(batch["content"].astype(str))}
        )
        return pd.concat(
            [curies[["subj", "pred", "obj"]], imps[["subj", "pred", "obj"]],
             langs, sha_rows],
            ignore_index=True,
        )


class Linker:
    """Actor stage: map ``mentions`` objects through the precomputed route
    table (hash lookups only); other preds pass through untouched.

    ``strategy=UNIQUE`` drops failed mentions (routes mapped to "" and
    dictionary misses); MIXTURE keeps the raw id (readmission)."""

    def __init__(self, routes_ref, strategy: Strategy = Strategy.MIXTURE):
        self.routes = (
            ray.get(routes_ref) if isinstance(routes_ref, ray.ObjectRef) else routes_ref
        )
        self.unique = strategy == Strategy.UNIQUE

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        m = b["pred"].to_numpy() == "mentions"
        if m.any():
            b = b.copy()
            col = b["obj"].to_numpy(dtype=object)
            routes = self.routes
            miss = "" if self.unique else None
            col[m] = [routes.get(x, x if miss is None else miss) for x in col[m]]
            b["obj"] = col
            if self.unique:
                b = b[(b["obj"].to_numpy(dtype=object) != "")]
        return b


class ExtractLinkEmit(ExtractEmit):
    """Fused extract + link actor (the hot-path stage of the corpus build).

    Extraction and linking are both per-row maps; fusing them into one
    actor pool removes an inter-stage serialization boundary and a second
    pool's startup/memory cost — at 100 TB the intermediate (raw-CURIE)
    stream never needs to exist.  The dictionary state is still broadcast
    once and fetched per actor in ``__init__``.
    """

    def __init__(self, spec: OntologySpec, routes_ref, strategy: Strategy = Strategy.MIXTURE):
        super().__init__(spec)
        self.linker = Linker(routes_ref, strategy)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.linker(super().__call__(batch))


def corpus_files(corpus_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))


def _shard_pipeline(
    input_files: List[str],
    out_dir: str,
    routes_ref,
    spec: OntologySpec,
    extract_concurrency,
    link_concurrency,
    strategy: Strategy = Strategy.MIXTURE,
) -> Dict[str, object]:
    # Size read blocks to the extract pool: ~2 blocks per actor balances
    # the pool without flooding the downstream exchange with hundreds of
    # small blocks (shuffle cost grows with blocks x partitions, and the
    # scheduler becomes the bottleneck long before the CPUs do).
    pool = extract_concurrency if isinstance(extract_concurrency, int) else (
        extract_concurrency[1] if extract_concurrency else 8
    )
    nblocks = max(16, 2 * pool)
    ds = rd.read_parquet(
        input_files,
        columns=["repo", "path", "lang", "content"],
        override_num_blocks=nblocks,
    )
    linked = ds.map_batches(
        ExtractLinkEmit,
        fn_constructor_kwargs=dict(spec=spec, routes_ref=routes_ref, strategy=strategy),
        batch_format="pandas",
        concurrency=extract_concurrency,
        batch_size=1024,
    )
    # exact dedup: per-batch combiner + ONE int-keyed hash-partition
    # exchange (see stages/exchange.py — ~130x faster than Ray's
    # string-key groupby aggregate on this shape)
    from ontology_matcher_ray.stages import exchange

    deduped = exchange.distinct(linked, ["subj", "pred", "obj"], num_partitions=64)
    deduped.write_parquet(out_dir)

    # lineage from the WRITTEN output (columnar filtered read; nothing
    # upstream re-executes)
    written = rd.read_parquet(out_dir)
    total = written.count()                       # metadata-only
    acc = 0
    n_rows = 0
    for b in written.filter(expr=f"pred == '{SHA_PRED}'").select_columns(
        ["obj"]
    ).iter_batches(batch_size=65536, batch_format="pandas"):
        acc ^= int(xor_sha_agg(b["obj"]), 16)
        n_rows += len(b)
    return {
        "row_count": n_rows,
        "content_sha256_agg": "%032x" % acc,
        "triple_count": total - n_rows,
    }


def build_kg(
    corpus_dir: str,
    out_dir: str,
    snapshot: DictionarySnapshot,
    spec: OntologySpec = DISEASE_SPEC,
    strategy: Strategy = Strategy.MIXTURE,
    n_shards: int = 4,
    extract_concurrency=None,
    link_concurrency=None,
) -> List:
    """Run the full corpus KG build, sharded + resumable.

    Returns the lineage records (one per shard).  Rerunning after a crash
    skips completed shards via the manifest.
    """
    if extract_concurrency is None:
        # the fused extract+link pool IS the compute: fixed-size pool at
        # ~3/4 of the node (autoscaling pools don't ramp up within a short
        # job; fixed pools pre-start), leaving headroom for read/shuffle
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        extract_concurrency = max(2, (ncpu * 3) // 4)
    routes_ref = ray.put(precompute_routes(snapshot, spec, strategy))
    manifest = Manifest(os.path.join(out_dir, "_manifest", "lineage.jsonl"))
    shards = plan_shards(corpus_files(corpus_dir), n_shards)
    return run_sharded(
        "kg_build",
        shards,
        out_dir,
        manifest,
        lambda files, shard_out: _shard_pipeline(
            files, shard_out, routes_ref, spec, extract_concurrency,
            link_concurrency, strategy,
        ),
    )


def read_triples(out_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(
        sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    )
    return ds.filter(expr=f"pred != '{SHA_PRED}'")

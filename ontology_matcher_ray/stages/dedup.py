"""Deduplication stages: exact, MinHash+LSH, SimHash, embedding-cosine.

Large-scale training-data dedup operators layered on the engine (the
reference's own dedup semantics — canonical-id merge + first-on-duplicate,
``cli.py:262-291``, ``ontology_formatter.py:604-605`` — live in
``pipelines/docs_kg.canonical_merge``; these stages cover corpus-level
document dedup).

Scale notes: every variant is a combiner-then-shuffle shape — signatures
are computed vectorized inside ``map_batches`` (no shuffle), candidates are
co-located by a single ``groupby`` on a hash/band key, and verification
runs per group.  Keys are content-derived (stable across cluster sizes).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.functions.hashing import (
    band_keys,
    jaccard,
    minhash_signature_matrix,
    sha256_hex,
    simhash64,
    stable_hash64,
)


def add_content_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_sha256"] = sha256_hex(batch[text_col].astype(str))
    return batch


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Exact dedup: hash-partition by content hash, keep min-id per group.

    'first on duplicate' (ontology_formatter.py:604-605) made deterministic
    as arg-min over the id column.  Emits (content_sha256, doc_id, n_dups).
    """
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col), batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("content_sha256", sort=False).agg(
            doc_id=(id_col, "min"), n_dups=(id_col, "size")
        )
        return g.reset_index()

    partials = hashed.map_batches(partial, batch_format="pandas")

    from ontology_matcher_ray.stages import exchange

    def agg(gb) -> pd.DataFrame:
        return gb.agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))

    return exchange.grouped_agg(partials, ["content_sha256"], agg, num_partitions=32)


class MinHasher:
    """map_batches stage: text -> (doc_id, band, band_key) candidate rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = minhash_signature_matrix(batch[self.text_col].astype(str), self.num_perm, self.k)
        keys = band_keys(sig, self.bands)
        n = len(batch)
        return pd.DataFrame(
            {
                self.id_col: np.repeat(batch[self.id_col].to_numpy(), self.bands),
                "band": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_key": keys.reshape(-1),
            }
        )


def minhash_candidate_pairs(
    ds: rd.Dataset, num_perm: int = 64, bands: int = 16, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    """MinHash LSH: band rows -> groupby(band, band_key) -> candidate pairs.

    Emits distinct (a, b) with a < b.  The groupby is the only shuffle and
    moves (id, band, key) rows — never the documents themselves.
    """
    bandrows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pandas",
        concurrency=(1, 8),
        batch_size=1024,
    )

    from ontology_matcher_ray.stages import exchange

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        # prune singleton buckets first (the vast majority), then expand
        # pairs only for multi-member buckets
        sizes = g.groupby(["band", "band_key"], sort=False)[id_col].transform("size")
        multi = g[sizes > 1]
        out = []
        for _key, grp in multi.groupby(["band", "band_key"], sort=False):
            ids = np.sort(grp[id_col].unique())
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"a": ids[ai], "b": ids[bi]}))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    cand = exchange.partitioned_apply(
        bandrows, ["band", "band_key"], pairs_per_partition, num_partitions=32
    )
    return exchange.distinct(cand, ["a", "b"], num_partitions=16)


def minhash_near_dups(
    ds: rd.Dataset, threshold: float = 0.8, num_perm: int = 64, bands: int = 16, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    """Candidates verified by true k-shingle Jaccard >= threshold.

    Verification joins the candidate pairs back to the (small) projected
    text columns via a broadcast map — appropriate when candidates are
    sparse; at 100 TB the join would be bucketed by pair key instead.
    """
    import ray

    texts = {
        r[id_col]: r[text_col]
        for r in ds.select_columns([id_col, text_col]).iter_rows()
    }
    text_ref = ray.put(texts)
    cand = minhash_candidate_pairs(ds, num_perm, bands, k, id_col, text_col)

    class Verify:
        def __init__(self):
            self.texts = ray.get(text_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sims = [
                jaccard(self.texts[a].split(" "), self.texts[x].split(" "), k)
                for a, x in zip(b["a"], b["b"])
            ]
            b = b.copy()
            b["jaccard_micro"] = np.floor(np.array(sims) * 1_000_000).astype("int64")
            return b[np.array(sims) >= threshold]

    return cand.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))


def simhash_buckets(ds: rd.Dataset, prefix_bits: int = 16,
                    id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """SimHash dedup surface: (doc_id, simhash, bucket = top prefix_bits).

    Bucket groupby co-locates likely-near docs; hamming verification can
    then run per bucket.
    """
    def stage(b: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(b[text_col].astype(str))
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "simhash": sh,
                "bucket": (sh.astype(np.uint64) >> np.uint64(64 - prefix_bits)).astype(np.int64),
            }
        )

    return ds.map_batches(stage, batch_format="pandas", batch_size=1024)


def embedding_near_dups(
    ds: rd.Dataset, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs via blocked matmul.

    Each batch computes cosine sims against a broadcast normalized matrix
    (numpy matmul); emits (a, b, cos_sim) with a < b and sim >= threshold.
    The broadcast side must fit in memory (IVF-bucket it beyond ~10^7 rows).
    """
    import ray

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    class Stage:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            q = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ self.mat.T
            qa, xb = np.where(sims >= threshold)
            a = b[id_col].to_numpy()[qa]
            bb = self.ids[xb]
            keep = a < bb
            return pd.DataFrame(
                {"a": a[keep], "b": bb[keep],
                 "cos_sim_micro": np.floor(sims[qa, xb][keep] * 1_000_000).astype("int64")}
            )

    return ds.map_batches(Stage, batch_format="pandas", concurrency=(1, 4), batch_size=512)

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

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.functions.hashing import (
    band_keys,
    band_keys_int64,
    minhash_signature_matrix,
    sha256_hex,
    simhash64,
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
    return exact_groups(hashed, id_col)


def exact_groups(hashed: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """The aggregation half of ``exact_dedup`` over an ALREADY-hashed
    dataset carrying ``content_sha256`` (extra columns ignored) —
    module-level so fused scans (``composite.dedup_assignments``) reuse
    the exact group/representative semantics without a second hash
    pass."""
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
    """map_batches stage: text -> (doc_id, band, band_key) candidate rows.

    Stateless (no model/index), so it dispatches as a TASK pool — no
    actor startup latency, parallelism scales with block count.  Band
    keys are splitmix64-mixed int64 (``band_keys_int64``): a collision
    only adds a false candidate that verification rejects, and the int
    keys ride the exchange's numpy fast path.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = minhash_signature_matrix(batch[self.text_col].astype(str), self.num_perm, self.k)
        keep = sig[:, 0] >= 0          # docs with >= k tokens (have shingles)
        sig = sig[keep]
        keys = (band_keys_int64(sig, self.bands) if len(sig)
                else np.empty((0, self.bands), np.int64))
        n = len(sig)
        return pd.DataFrame(
            {
                self.id_col: np.repeat(batch[self.id_col].to_numpy()[keep], self.bands),
                "band": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_key": keys.reshape(-1),
            }
        )


def minhash_candidate_pairs(
    ds: rd.Dataset, num_perm: int = 64, bands: int = 16, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    """MinHash LSH candidates, distinct (a, b) with a < b — the public
    surface.  ``minhash_near_dups`` uses the RAW (possibly-duplicated)
    variant instead and dedups on arrival inside the payload join,
    saving one all-to-all over the pair set."""
    return exchange_distinct_pairs(
        _minhash_candidate_pairs_raw(ds, num_perm, bands, k, id_col, text_col)
    )


def exchange_distinct_pairs(cand: rd.Dataset, num_partitions: int = 16) -> rd.Dataset:
    from ontology_matcher_ray.stages import exchange

    return exchange.distinct(cand, ["a", "b"], num_partitions)


def _minhash_candidate_pairs_raw(
    ds: rd.Dataset, num_perm: int = 64, bands: int = 16, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> rd.Dataset:
    """MinHash LSH: band rows -> groupby(band, band_key) -> candidate pairs.

    Emits (a, b) with a < b; a pair caught by several bands appears once
    PER band (callers dedup — see minhash_candidate_pairs).  The groupby
    is the only shuffle and moves (id, band, key) rows — never the
    documents themselves.
    """
    bandrows = ds.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, k=k,
                  id_col=id_col, text_col=text_col),
        batch_format="pandas",
        batch_size=256,
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

    return exchange.partitioned_apply(
        bandrows, ["band", "band_key"], pairs_per_partition, num_partitions=32
    )


def minhash_near_dups(
    ds: rd.Dataset, threshold: float = 0.8, num_perm: int = 64, bands: int = 16, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 32,
    materialize_signatures: bool = True,
) -> rd.Dataset:
    """Candidates verified by exact Jaccard >= threshold over each doc's
    k-shingle HASH set (``md5half % p`` — identical to the hash the
    signatures minimize over, and recomputed identically by the SQL
    oracle; equals raw-shingle Jaccard up to md5 collisions) — fully
    DISTRIBUTED, no driver-side materialization anywhere.

    ONE fused corpus pass (``minhash_sig_and_hashes``) produces band rows
    AND the verification payloads, instead of shingling + hashing the
    corpus twice.  With ``materialize_signatures`` (default) that pass's
    output — band keys + int64 hash sets, comparable in bytes to the
    corpus text and spillable — is checkpointed in the object store and
    consumed by both downstream exchanges; set it False to stream instead
    (the fused stage then re-executes once per consumer: trade recompute
    for zero intermediate footprint, e.g. when the store is tight).

    Verification is a two-exchange bucketed join:

      1. doc-id exchange: payload rows meet candidate-pair membership
         rows (multi-band duplicate pairs are dropped on arrival); each
         membership picks up its doc's hash set.
      2. pair exchange: both sides co-locate by hash((a, b)); Jaccard in
         integer micro-units via a pure-numpy composite-key count (pair
         ids shifted over the 31-bit hash domain), thresholded with
         integer arithmetic so the DuckDB oracle agrees bit-for-bit.

    Emits (a, b, jaccard_micro).
    """
    from ontology_matcher_ray.functions.hashing import minhash_sig_and_hashes
    from ontology_matcher_ray.stages import exchange

    t_micro = int(round(threshold * 1_000_000))

    def fused(batch: pd.DataFrame) -> pd.DataFrame:
        sig, hsets = minhash_sig_and_hashes(batch[text_col].astype(str), num_perm, k)
        keep = sig[:, 0] >= 0
        sig = sig[keep]
        keys = (band_keys_int64(sig, bands) if len(sig)
                else np.empty((0, bands), np.int64))
        ids = batch[id_col].to_numpy()[keep]
        n = len(sig)
        bandrows = pd.DataFrame({
            "doc_id": np.repeat(ids, bands),
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_key": keys.reshape(-1),
            "payload": [None] * (n * bands),
        })
        paysrc = pd.DataFrame({
            "doc_id": ids,
            "band": np.full(n, -1, dtype=np.int64),
            "band_key": np.zeros(n, dtype=np.int64),
            "payload": [h.tolist() for h, kp in zip(hsets, keep) if kp],
        })
        return pd.concat([bandrows, paysrc], ignore_index=True)

    src = ds.map_batches(fused, batch_format="pandas", batch_size=256)
    if materialize_signatures:
        src = src.materialize()
    bandrows = src.map_batches(
        lambda b: b.loc[b["band"] >= 0, ["doc_id", "band", "band_key"]],
        batch_format="pandas")
    payloads = src.map_batches(
        lambda b: b.loc[b["band"] < 0, ["doc_id", "payload"]],
        batch_format="pandas")

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_key"], sort=False)["doc_id"].transform("size")
        multi = g[sizes > 1]
        out = []
        for _key, grp in multi.groupby(["band", "band_key"], sort=False):
            ids = np.sort(grp["doc_id"].unique())
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            out.append(pd.DataFrame({"a": ids[ai], "b": ids[bi]}))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    cand = exchange.partitioned_apply(
        bandrows, ["band", "band_key"], pairs_per_partition, num_partitions
    )
    pair_sh = exchange.pair_payload_join_rows(payloads, cand, num_partitions)

    return exchange.partitioned_apply(
        pair_sh, ["a", "b"], jaccard_verify_kernel(t_micro), num_partitions
    )


def jaccard_verify_kernel(t_micro: int):
    """Per-partition exact-Jaccard verifier over ``pair_payload_join``
    rows (two int64 hash-set payload rows per candidate pair): integer
    micro-unit Jaccard, thresholded at ``t_micro`` — shared by the
    MinHash-LSH and all-pairs prefix-filter paths so both verify with
    the SAME bit-exact kernel."""

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out = _align_pairs(g)
        cols = ["a", "b", "jaccard_micro"]
        if out is None:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g, a, b = out
        sizes = np.fromiter((len(p) for p in g["payload"]),
                            dtype=np.int64, count=len(g))
        if sizes.sum() == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in g["payload"] if len(p)])
        # composite (pair_idx << 31) | hash: hashes live in the 31-bit
        # Mersenne domain, so one np.unique counts per-pair intersections
        pair_of_row = np.arange(len(g), dtype=np.int64) // 2
        comp = (np.repeat(pair_of_row, sizes) << np.int64(31)) | flat
        uniq, cnts = np.unique(comp, return_counts=True)
        inter = np.bincount((uniq >> np.int64(31))[cnts == 2],
                            minlength=len(g) // 2).astype(np.int64)
        union = sizes[0::2] + sizes[1::2] - inter
        ok = union > 0
        jm = np.zeros_like(inter)
        jm[ok] = (inter[ok] * 1_000_000) // union[ok]
        keep = ok & (jm >= t_micro)
        return pd.DataFrame({"a": a[keep], "b": b[keep],
                             "jaccard_micro": jm[keep]})

    return verify


def allpairs_jaccard(
    ds: rd.Dataset,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    materialize_payloads: bool = True,
    order: str = "hash",
) -> rd.Dataset:
    """EXACT all-pairs set-similarity self-join — every pair with Jaccard
    >= threshold over md5-hashed k-shingle sets — via prefix filtering
    (the All-Pairs / PPJoin candidate rule): the exact-recall counterpart
    of ``minhash_near_dups`` (LSH recall < 1; this emits EVERY
    qualifying pair, so its SQL oracle is the full quadratic ground
    truth, not a recomputation of the engine's own candidates).

    Global token order (``order``): ``"hash"`` = ascending hash
    (deterministic, zero extra passes); ``"rare_first"`` approximates
    the classic df-ascending candidate-minimizing refinement WITHOUT
    the df exchange + prefix rejoin it classically costs — one cheap
    combiner-tree pass sketches the heaviest shingle hashes
    (``exchange.sample_heavy_keys``) and the order key becomes
    (is-sketched-heavy, hash), pushing stop-shingles out of every
    prefix whenever the prefix can avoid them.  ANY consistent total
    order yields the SAME output set (the prefix lemma holds per
    order; verification is order-free) — only the candidate volume
    changes — so the sketch being approximate is safe by construction,
    exactly like skew_join's heavy set.  Per doc
    with n distinct shingle hashes only the FIRST L = n - ceil(t*n) + 1
    hashes are indexed.  Recall proof: for a qualifying pair,
    inter >= ceil(t * max(|A|, |B|)); the SMALLEST common hash x has at
    most |A| - inter elements of A before it (every other common element
    sorts after x), so x sits within A's first |A| - ceil(t*|A|) + 1
    hashes — and symmetrically for B — hence the pair shares a hash both
    sides INDEXED, and the bucket exchange surfaces it.

    Plan: one fused corpus pass emits payload rows (full hash set) and
    prefix rows (hash, doc, set size); bucket exchange on prefix hash ->
    per-bucket pairs pruned by the size condition min*1e6 >= t_micro*max
    (necessary for any qualifying pair, so prune-only); then the SAME
    two-exchange payload join + integer verify kernel as MinHash.  A
    hash shared by B docs' prefixes costs O(B^2) candidates — inherent
    to exact all-pairs (those docs ARE pairwise candidates); the size
    filter prunes cross-size pairs before they are emitted.

    Emits (a, b, jaccard_micro), a < b.
    """
    from ontology_matcher_ray.functions.hashing import shingle_hash_sets
    from ontology_matcher_ray.stages import exchange

    if order not in ("hash", "rare_first"):
        raise ValueError(f"unsupported order={order!r}")
    t_micro = int(round(threshold * 1_000_000))

    heavy: frozenset = frozenset()
    if order == "rare_first":
        def hash_rows(b: pd.DataFrame) -> pd.DataFrame:
            hsets = shingle_hash_sets(b[text_col].astype(str), k)
            return pd.DataFrame({
                "h": (np.concatenate(hsets) if hsets
                      else np.empty(0, dtype=np.int64))
            })

        heavy = frozenset(exchange.sample_heavy_keys(
            ds.map_batches(hash_rows, batch_format="pandas"), "h", top=64))

    def fused(batch: pd.DataFrame) -> pd.DataFrame:
        hsets = shingle_hash_sets(batch[text_col].astype(str), k)
        ids = batch[id_col].to_numpy()
        sizes = np.fromiter((len(h) for h in hsets), dtype=np.int64,
                            count=len(hsets))
        keep = sizes > 0
        ids, sizes = ids[keep], sizes[keep]
        hsets = [h for h, kp in zip(hsets, keep) if kp]
        if heavy:
            # (is_heavy, hash) total order: stop-shingles sort LAST so
            # prefixes avoid them whenever n - ceil(t*n) + 1 allows
            hv_arr = np.fromiter(heavy, dtype=np.int64, count=len(heavy))
            hsets = [
                h[np.lexsort((h, np.isin(h, hv_arr)))] for h in hsets
            ]
        # ceil(t*n) in exact integer arithmetic
        pref_len = sizes - (t_micro * sizes + 999_999) // 1_000_000 + 1
        pref = ([np.concatenate([h[:L] for h, L in zip(hsets, pref_len)])]
                if len(hsets) else [np.empty(0, dtype=np.int64)])
        prefix_rows = pd.DataFrame({
            "h": pref[0],
            "doc_id": np.repeat(ids, pref_len),
            "size": np.repeat(sizes, pref_len),
            "payload": [None] * int(pref_len.sum()),
        })
        payload_rows = pd.DataFrame({
            "h": np.full(len(ids), -1, dtype=np.int64),
            "doc_id": ids,
            "size": sizes,
            "payload": [h.tolist() for h in hsets],
        })
        return pd.concat([prefix_rows, payload_rows], ignore_index=True)

    src = ds.map_batches(fused, batch_format="pandas", batch_size=256)
    if materialize_payloads:
        src = src.materialize()
    prefix_rows = src.map_batches(
        lambda b: b.loc[b["h"] >= 0, ["h", "doc_id", "size"]],
        batch_format="pandas")
    payloads = src.map_batches(
        lambda b: b.loc[b["h"] < 0, ["doc_id", "payload"]],
        batch_format="pandas")

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in ("a", "b")})
        bucket_sizes = g.groupby("h", sort=False)["doc_id"].transform("size")
        multi = g[bucket_sizes > 1]
        out = []
        for _h, grp in multi.groupby("h", sort=False):
            o = np.argsort(grp["doc_id"].to_numpy())
            ids = grp["doc_id"].to_numpy()[o]
            szs = grp["size"].to_numpy()[o]
            ai, bi = np.triu_indices(len(ids), k=1)
            na, nb = szs[ai], szs[bi]
            ok = np.minimum(na, nb) * 1_000_000 >= t_micro * np.maximum(na, nb)
            if ok.any():
                out.append(pd.DataFrame({"a": ids[ai[ok]], "b": ids[bi[ok]]}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    cand = exchange.partitioned_apply(
        prefix_rows, ["h"], pairs_per_partition, num_partitions
    )
    pair_sh = exchange.pair_payload_join_rows(payloads, cand, num_partitions)
    return exchange.partitioned_apply(
        pair_sh, ["a", "b"], jaccard_verify_kernel(t_micro), num_partitions
    )


def _align_pairs(g: pd.DataFrame):
    """Sort pair-join rows by (a, b, doc_id) and keep exactly-2-member
    pairs, so rows 2i and 2i+1 are the two sides of pair i — the
    positional alignment that lets verify kernels run without a per-pair
    Python loop.  Returns (frame, a_per_pair, b_per_pair) or None."""
    if g.empty:
        return None
    g = g.sort_values(["a", "b", "doc_id"], ignore_index=True)
    cnt = g.groupby(["a", "b"], sort=False)["doc_id"].transform("size")
    g = g[cnt == 2].reset_index(drop=True)
    if g.empty:
        return None
    return g, g["a"].to_numpy()[0::2], g["b"].to_numpy()[0::2]


def _union_find_min_labels(edges: pd.DataFrame) -> pd.DataFrame:
    """Path-compressed union-find over a bounded (src, dst) edge frame:
    (doc_id, label) where label = MIN doc id of the connected component
    — the same fixpoint the iterative propagation converges to."""
    ids = np.unique(np.concatenate([edges["src"].to_numpy(),
                                    edges["dst"].to_numpy()]))
    idx = {int(v): i for i, v in enumerate(ids)}
    parent = np.arange(len(ids))

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:           # path compression
            parent[i], i = root, parent[i]
        return root

    for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
        rs, rd_ = find(idx[int(s)]), find(idx[int(d)])
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    roots = np.array([find(i) for i in range(len(ids))])
    # min doc id per component: ids is sorted, so scatter-min over roots
    comp_min = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, roots, ids.astype(np.int64))
    return pd.DataFrame({"doc_id": ids.astype("int64"),
                         "label": comp_min[roots]})


def near_dup_clusters(
    ds: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str = "doc_id",
    num_partitions: int = 32,
    max_rounds: int = 25,
    driver_edges_max: int = 4_000_000,
) -> rd.Dataset:
    """Cluster resolution: connected components over near-dup candidate
    pairs -> per-doc (doc_id, cluster_id, keep).

    This is the operator a training-data pipeline actually runs after any
    near-dup detector: every doc gets the MIN doc id of its connected
    component as ``cluster_id`` and ``keep`` is true exactly for that
    survivor — the corpus-scale generalization of the reference's
    first-on-duplicate rule (``ontology_formatter.py:604-605``, which is
    the 1-D case where components are exact-duplicate groups).

    Algorithm: iterative min-label propagation through the hash-partition
    exchange (two exchanges per round: src-keyed label pickup, dst-keyed
    min-reduce), converging in O(component diameter) rounds — near-dup
    components are shallow in practice.  Labels are a bounded (doc_id,
    label) table, materialized per round so lineage doesn't re-execute;
    the corpus itself is touched exactly once (singleton fill at the
    end).  Convergence is detected with a tiny driver-side sum of a
    per-row changed flag (a scalar aggregate, not a materialization).

    Size gate: the edge table is already materialized (it is reused
    every round), so when it holds <= ``driver_edges_max`` rows (16 B
    each — 64 MB at the default) the component labels come from ONE
    bounded driver read + a path-compressed union-find instead of
    paying 2 exchanges + a materialize per propagation round; the
    corpus-sized singleton fill stays distributed either way, and both
    paths produce the identical min-label fixpoint (tested).  Above
    the gate the iterative exchange path runs unchanged.
    """
    from ontology_matcher_ray.stages import exchange

    # edges both directions, materialized ONCE (tiny vs corpus; reused
    # every round so re-executing the detector lineage per round would be
    # quadratic waste)
    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].astype("int64").to_numpy()
        bb = b["b"].astype("int64").to_numpy()
        return pd.DataFrame({"src": np.concatenate([a, bb]),
                             "dst": np.concatenate([bb, a])})

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    if edges.count() <= driver_edges_max:       # metadata-only count
        ef = edges.to_pandas()
        lab = (_union_find_min_labels(ef) if len(ef) else
               pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64")}))
        lab["changed"] = np.zeros(len(lab), dtype=np.int64)
        labels = rd.from_pandas(lab)
        return _singleton_fill(ds, labels, id_col, num_partitions)

    # initial labels: each pair-member doc labels itself
    def self_labels(b: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(np.concatenate([
            b["a"].astype("int64").to_numpy(), b["b"].astype("int64").to_numpy()
        ]))
        # 'changed' present from round 0 so every labels generation (and
        # the singleton fill) shares one schema
        return pd.DataFrame({"doc_id": ids, "label": ids,
                             "changed": np.zeros(len(ids), dtype=np.int64)})

    labels = exchange.distinct(
        pairs.map_batches(self_labels, batch_format="pandas"),
        ["doc_id"], num_partitions,
    ).materialize()

    for _round in range(max_rounds):
        # IMPORTANT (Ray 2.49): each iteration consumes `labels` exactly
        # ONCE — a union() of two branches derived from the same
        # MaterializedDataset re-attaches its full lineage and doubles
        # execution every round.  Exchange 1 therefore forwards each
        # label row through as its own 'own' message (dst = doc itself)
        # while also emitting one candidate message per out-edge.
        lab_rows = labels.map_batches(
            lambda b: pd.DataFrame({"key": b["doc_id"].astype("int64"),
                                    "dst": np.int64(-1),
                                    "label": b["label"].astype("int64")}),
            batch_format="pandas",
        )
        edge_rows = edges.map_batches(
            lambda b: pd.DataFrame({"key": b["src"].astype("int64"),
                                    "dst": b["dst"].astype("int64"),
                                    "label": np.int64(-1)}),
            batch_format="pandas",
        )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["dst"] < 0, ["key", "label"]]
            ed = g.loc[g["dst"] >= 0, ["key", "dst"]]
            m = ed.merge(lab, on="key", how="inner")
            return pd.DataFrame(
                {"doc_id": np.concatenate(
                    [m["dst"].to_numpy(), lab["key"].to_numpy()]),
                 "label": np.concatenate(
                    [m["label"].to_numpy(), lab["label"].to_numpy()]),
                 "own": np.concatenate(
                    [np.zeros(len(m), dtype=np.int64),
                     np.ones(len(lab), dtype=np.int64)])}
            )

        msgs = exchange.partitioned_apply(
            lab_rows.union(edge_rows), ["key"], emit, num_partitions
        )

        # exchange 2: min-reduce incoming labels with the current label
        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            mins = g.groupby("doc_id", sort=False)["label"].min()
            own = g[g["own"] == 1].set_index("doc_id")["label"]
            out = pd.DataFrame({"doc_id": mins.index.to_numpy(),
                                "label": mins.to_numpy()})
            out["changed"] = (
                out["label"].to_numpy()
                < own.reindex(out["doc_id"]).to_numpy()
            ).astype("int64")
            return out

        new_labels = exchange.partitioned_apply(
            msgs, ["doc_id"], reduce_min, num_partitions
        ).materialize()
        changed = new_labels.sum("changed")
        # next round's input is the MaterializedDataset ITSELF (chaining a
        # lazy op like drop_columns would re-attach pre-materialization
        # lineage); downstream map_batches ignores the 'changed' column
        labels = new_labels
        if not changed:
            break

    return _singleton_fill(ds, labels, id_col, num_partitions)


def _singleton_fill(
    ds: rd.Dataset, labels: rd.Dataset, id_col: str, num_partitions: int
) -> rd.Dataset:
    """Docs in no pair keep their own id (one exchange over the corpus
    ids; min(own, final) == final for pair members) — shared tail of
    both cluster-resolution paths."""
    from ontology_matcher_ray.stages import exchange

    all_self = ds.map_batches(
        lambda b: pd.DataFrame({"doc_id": b[id_col].astype("int64"),
                                "label": b[id_col].astype("int64"),
                                "changed": np.zeros(len(b), dtype=np.int64)}),
        batch_format="pandas",
    )

    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        mins = g.groupby("doc_id", sort=False)["label"].min()
        out = pd.DataFrame({"doc_id": mins.index.to_numpy(),
                            "cluster_id": mins.to_numpy()})
        out["keep"] = out["cluster_id"].to_numpy() == out["doc_id"].to_numpy()
        return out

    return exchange.partitioned_apply(
        all_self.union(labels), ["doc_id"], final_min, num_partitions
    )


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


# 16-bit popcount lookup (64 KiB, built once per process) — numpy < 2 has
# no bitwise_count kernel
_POPCOUNT16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via four 16-bit LUT probes."""
    x = x.astype(np.uint64)
    m = np.uint64(0xFFFF)
    acc = _POPCOUNT16[(x & m).astype(np.int64)].astype(np.int64)
    for s in (16, 32, 48):
        acc += _POPCOUNT16[((x >> np.uint64(s)) & m).astype(np.int64)]
    return acc


def simhash_pairs(
    ds: rd.Dataset, max_hamming: int = 3,
    id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 32,
) -> rd.Dataset:
    """SimHash near-dup pairs with EXACT hamming verification — the stage
    that completes the simhash family (``simhash_buckets`` stops at the
    blocking surface): verified (a, b, hamming) pairs feed
    ``near_dup_clusters`` exactly like the MinHash and embedding verifiers.

    Candidate generation is the classic band pigeonhole (Manku et al.,
    WWW'07, public): the 64-bit simhash splits into ``max_hamming + 1``
    contiguous bands, and two hashes within ``max_hamming`` bit flips MUST
    agree on at least one whole band — so banding loses NO true pair
    (exact recall at the verify threshold, unlike probabilistic LSH).
    One exchange co-locates (band, band_val) buckets — the 8-byte hash
    rides along as the payload, so no second payload join is needed —
    verification is a vectorized XOR + 16-bit-LUT popcount over each
    bucket's pair triangle, and a distinct exchange dedups pairs found by
    several bands.  Scale note: band width is 64/(max_hamming+1) bits;
    at corpora where 2^width buckets saturate (≳10^8 docs for the default
    16-bit bands), widen the fingerprint or pre-block by a content prefix
    before banding.  Emits (a, b, hamming), a < b, hamming <= max_hamming.
    """
    from ontology_matcher_ray.stages import exchange

    bands = max_hamming + 1
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(b[text_col].astype(str)).astype(np.uint64)
        ids = b[id_col].astype("int64").to_numpy()
        frames = []
        for k in range(bands):
            val = ((sh >> np.uint64(k * width)) & mask).astype(np.int64)
            frames.append(pd.DataFrame(
                {"band": np.int64(k), "band_val": val,
                 id_col: ids, "simhash": sh.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    rows = ds.map_batches(band_rows, batch_format="pandas", batch_size=1024)

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_val"], sort=False)[id_col].transform("size")
        multi = g[sizes > 1]
        out = []
        for _key, grp in multi.groupby(["band", "band_val"], sort=False):
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            ai, bi = np.triu_indices(len(ids), k=1)
            ham = _popcount64(hs[ai] ^ hs[bi])
            keep = ham <= max_hamming
            out.append(pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep],
                                     "hamming": ham[keep].astype(np.int64)}))
        cols = ["a", "b", "hamming"]
        if not out:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        return pd.concat(out, ignore_index=True)[cols]

    cand = exchange.partitioned_apply(
        rows, ["band", "band_val"], pairs_per_partition, num_partitions
    )
    return exchange.distinct(cand, ["a", "b"], num_partitions)


def lsh_hyperplanes(dim: int, tables: int = 8, bits: int = 6, seed: int = 23) -> np.ndarray:
    """(tables, bits, dim) seeded Gaussian hyperplanes — every worker (and
    the DuckDB oracle, via float literals) derives the identical family."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((tables, bits, dim))


def embedding_lsh_candidates(
    ds: rd.Dataset, dim: int, tables: int = 8, bits: int = 6, seed: int = 23,
    id_col: str = "vec_id", vec_col: str = "embedding", num_partitions: int = 32,
    distinct: bool = True,
) -> rd.Dataset:
    """Random-hyperplane LSH blocking: distinct (a, b) candidate pairs.

    Each vector gets one sign-bit bucket per table (bucket = sum of
    2^i * [v . r_i >= 0]); vectors sharing a (table, bucket) cell are
    candidates.  The shuffle moves (table, bucket, vec_id) rows only —
    never the vectors — and singleton buckets are pruned per partition.
    Collision probability per table is (1 - theta/pi)^bits, so near-dup
    pairs (small angle) collide with high probability across ``tables``
    tables while random pairs rarely do.
    """
    from ontology_matcher_ray.stages import exchange

    planes = lsh_hyperplanes(dim, tables, bits, seed)
    pows = (1 << np.arange(bits)).astype(np.int64)

    def bucket_rows(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        ids = b[id_col].astype("int64").to_numpy()
        frames = []
        for t in range(planes.shape[0]):
            signs = (mat @ planes[t].T) >= 0.0            # (n, bits)
            bucket = signs.astype(np.int64) @ pows
            frames.append(pd.DataFrame(
                {"table": np.int64(t), "bucket": bucket, id_col: ids}))
        return pd.concat(frames, ignore_index=True)

    rows = ds.map_batches(bucket_rows, batch_format="pandas", batch_size=2048)

    def pairs_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["table", "bucket"], sort=False)[id_col].transform("size")
        multi = g[sizes > 1]
        out = []
        for _key, grp in multi.groupby(["table", "bucket"], sort=False):
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
        rows, ["table", "bucket"], pairs_per_partition, num_partitions
    )
    if distinct:
        cand = exchange.distinct(cand, ["a", "b"], num_partitions)
    return cand


def embedding_near_dups(
    ds: rd.Dataset, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    tables: int = 8, bits: int = 6, seed: int = 23, dim: Optional[int] = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs, LSH-blocked and fully distributed.

    Candidates from random-hyperplane LSH (``embedding_lsh_candidates``),
    then exact cosine verification through the same two-exchange pair join
    as the MinHash verifier (``exchange.pair_payload_join``): vectors ship
    to their pairs' partitions, each pair is scored ONCE with a single
    deterministic np.dot.  No driver-side materialization at any step.
    Emits (a, b, cos_sim_micro) with a < b and cos >= threshold.
    """
    from ontology_matcher_ray.stages import exchange

    if dim is None:
        first = ds.take(1)
        dim = len(np.asarray(first[0][vec_col]))
    # distinct=False: multi-table duplicates are dropped on arrival inside
    # the payload join (one fewer all-to-all over the pair set)
    cand = embedding_lsh_candidates(
        ds, dim, tables, bits, seed, id_col, vec_col, num_partitions,
        distinct=False,
    )

    def vec_rows(b: pd.DataFrame) -> pd.DataFrame:
        # payload as plain lists: object columns of np.ndarray break the
        # pandas<->Arrow block conversion inside the exchange
        return pd.DataFrame(
            {"doc_id": b[id_col].astype("int64").to_numpy(),
             "payload": [np.asarray(v, dtype=np.float64).tolist() for v in b[vec_col]]}
        )

    pair_vec = exchange.pair_payload_join(ds, cand, id_col, vec_rows, num_partitions)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out = _align_pairs(g)
        cols = ["a", "b", "cos_sim_micro"]
        if out is None:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g, a, b = out
        # positional two-row alignment -> one batched row-wise dot product
        mat = np.stack([np.asarray(p, dtype=np.float64) for p in g["payload"]])
        v1, v2 = mat[0::2], mat[1::2]
        sims = (v1 * v2).sum(axis=1) / (
            np.linalg.norm(v1, axis=1) * np.linalg.norm(v2, axis=1))
        keep = sims >= threshold
        return pd.DataFrame({
            "a": a[keep], "b": b[keep],
            "cos_sim_micro": np.floor(sims[keep] * 1_000_000).astype("int64"),
        })

    return exchange.partitioned_apply(pair_vec, ["a", "b"], verify, num_partitions)

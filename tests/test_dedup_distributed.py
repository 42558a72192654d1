"""Near-dup verification must be fully distributed: no driver-side
materialization (take_all / to_pandas / iter_rows on the corpus) anywhere
in the minhash or embedding near-dup pipelines (VERDICT r01 items 1-2)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ontology_matcher_ray.stages import dedup as dedup_stages

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def forbid_driver_materialization(monkeypatch):
    def banned(name):
        def _raise(self, *a, **k):
            raise AssertionError(
                f"driver-side materialization via Dataset.{name} is forbidden "
                "in distributed dedup pipelines"
            )
        return _raise

    for name in ("take_all", "to_pandas", "iter_rows"):
        monkeypatch.setattr(rd.Dataset, name, banned(name))
    yield


def _collect(ds: rd.Dataset) -> pd.DataFrame:
    frames = [b for b in ds.iter_batches(batch_size=8192, batch_format="pandas")]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def test_minhash_near_dups_no_driver_materialization(forbid_driver_materialization):
    docs = rd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    out = _collect(dedup_stages.minhash_near_dups(docs, threshold=0.5))
    # pipeline executes end-to-end under the ban; output shape is stable
    if len(out):
        assert list(out.columns) == ["a", "b", "jaccard_micro"]
        assert (out["a"] < out["b"]).all()
        assert (out["jaccard_micro"] >= 500_000).all()


def test_embedding_near_dups_no_driver_materialization(forbid_driver_materialization):
    vecs = rd.read_parquet(SF + "/embeddings.parquet", columns=["vec_id", "embedding"])
    out = _collect(dedup_stages.embedding_near_dups(vecs, threshold=0.4, dim=64))
    if len(out):
        assert list(out.columns) == ["a", "b", "cos_sim_micro"]
        assert (out["a"] < out["b"]).all()


def test_embedding_lsh_recall_on_planted_near_dups():
    """Planted near-identical vectors must be recovered by the LSH blocking
    + exact verification (high-sim pairs collide with prob ~1 across 8
    tables of 6 bits)."""
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 64))
    # 10 planted near-dup partners: tiny perturbation of vectors 0..9
    partners = base[:10] + 0.01 * rng.standard_normal((10, 64))
    mat = np.concatenate([base, partners])
    df = pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [v.tolist() for v in mat],
    })
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = dedup_stages.embedding_near_dups(ds, threshold=0.95, dim=64)
    got = {(int(a), int(b)) for a, b in
           _collect(out)[["a", "b"]].itertuples(index=False)}
    want = {(i, 40 + i) for i in range(10)}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, (recall, sorted(want - got))


def test_near_dup_clusters_chain_components():
    """Min-label propagation must cross multi-hop chains: a 0-1-2-...-9
    path component, a 3-cycle, and singletons."""
    import ray.data as rd

    chain = [(i, i + 1) for i in range(9)]            # component {0..9}
    cycle = [(20, 21), (21, 22), (20, 22)]            # component {20,21,22}
    pairs = pd.DataFrame(chain + cycle, columns=["a", "b"])
    ids = pd.DataFrame({"doc_id": list(range(10)) + [15, 20, 21, 22, 30]})
    out = dedup_stages.near_dup_clusters(
        rd.from_pandas(ids, override_num_blocks=3),
        rd.from_pandas(pairs, override_num_blocks=2),
        num_partitions=4,
    )
    df = _collect(out).sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(df["doc_id"], df["cluster_id"]))
    for i in range(10):
        assert got[i] == 0
    for i in (20, 21, 22):
        assert got[i] == 20
    assert got[15] == 15 and got[30] == 30
    keep = set(df[df["keep"]]["doc_id"])
    assert keep == {0, 15, 20, 30}
    assert len(df) == len(ids)


def test_ivf_recall_on_clustered_vectors():
    """IVF with a spread centroid sample must recover most true neighbors
    on clustered data SORTED BY CLUSTER (the case a first-block-only
    training sample gets wrong: it would only ever see cluster 0)."""
    from ontology_matcher_ray.stages import ann as ann_stages

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((8, 32)) * 4
    vecs, ids = [], []
    for c in range(8):                      # sorted by cluster on purpose
        pts = centers[c] + 0.3 * rng.standard_normal((50, 32))
        vecs.append(pts)
        ids.extend(range(c * 50, c * 50 + 50))
    mat = np.concatenate(vecs)
    df = pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                       "embedding": [v.tolist() for v in mat]})
    ds = rd.from_pandas(df, override_num_blocks=8)
    qids = np.array([0, 120, 260, 390], dtype=np.int64)
    qmat = mat[[0, 120, 260, 390]]
    brute = ann_stages.brute_force_topk(ds, qmat, qids, top_k=5)
    approx = ann_stages.ivf_topk(ds, qmat, qids, top_k=5, nlist=8, nprobe=2)
    b = {(r.query_id, r.vec_id) for r in brute.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(a & b) / len(b)
    assert recall >= 0.8, recall


def test_simhash_pairs_exact_vs_brute_force(forbid_driver_materialization):
    """Band pigeonhole guarantees EXACT recall at the hamming threshold:
    the distributed pairs must equal a brute-force all-pairs popcount."""
    import pyarrow.parquet as pq

    from ontology_matcher_ray.functions.hashing import simhash64
    from ontology_matcher_ray.stages.dedup import _popcount64

    docs = rd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    out = _collect(dedup_stages.simhash_pairs(docs, max_hamming=3))
    assert list(out.columns) == ["a", "b", "hamming"]
    assert (out["a"] < out["b"]).all()
    assert (out["hamming"] <= 3).all()

    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    sh = simhash64(t["text"].astype(str)).astype(np.uint64)
    ids = t["doc_id"].to_numpy()
    ai, bi = np.triu_indices(len(ids), k=1)
    ham = _popcount64(sh[ai] ^ sh[bi])
    keep = ham <= 3
    want = set(zip(ids[ai][keep].tolist(), ids[bi][keep].tolist(),
                   ham[keep].tolist()))
    got = set(zip(out["a"].tolist(), out["b"].tolist(), out["hamming"].tolist()))
    assert got == want and len(want) > 0


def test_simhash_pairs_feed_cluster_resolution():
    """The verified simhash pairs drive near_dup_clusters exactly like the
    minhash/embedding verifiers: every doc labeled, min-id survivor kept,
    and both endpoints of every pair share a cluster.  (No materialization
    ban here: near_dup_clusters' scalar convergence aggregate is a
    documented, contractually-small driver read.)"""
    docs = rd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    pairs = dedup_stages.simhash_pairs(docs, max_hamming=3)
    ids = rd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    labels = _collect(dedup_stages.near_dup_clusters(ids, pairs))
    assert len(labels) == 500
    assert (labels[labels["keep"]]["cluster_id"]
            == labels[labels["keep"]]["doc_id"]).all()
    pdf = _collect(dedup_stages.simhash_pairs(docs, max_hamming=3))
    lab = labels.set_index("doc_id")["cluster_id"]
    assert (lab.loc[pdf["a"]].to_numpy() == lab.loc[pdf["b"]].to_numpy()).all()


def test_near_dup_clusters_gated_and_iterative_paths_identical():
    """The size-gated driver union-find and the iterative exchange path
    must produce the identical min-label fixpoint — chains, cycles, a
    star hub, and a random union of components."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    comp = []
    comp += [(i, i + 1) for i in range(9)]               # chain
    comp += [(20, 21), (21, 22), (20, 22)]               # cycle
    comp += [(40, 40 + i) for i in range(1, 12)]         # star
    extra = rng.integers(60, 90, size=(25, 2))           # random blobs
    comp += [(int(a), int(b)) for a, b in extra if a != b]
    pairs = pd.DataFrame(comp, columns=["a", "b"])
    ids = pd.DataFrame({"doc_id": sorted(
        set(pairs["a"]) | set(pairs["b"]) | {100, 101})})

    def run(**kw):
        return (_collect(dedup_stages.near_dup_clusters(
            rd.from_pandas(ids, override_num_blocks=3),
            rd.from_pandas(pairs, override_num_blocks=2),
            num_partitions=4, **kw))
            .sort_values("doc_id", ignore_index=True))

    gated = run()                          # default gate -> union-find
    iterative = run(driver_edges_max=0)    # force the exchange loop
    pd.testing.assert_frame_equal(gated, iterative)
    # spot invariants
    got = dict(zip(gated["doc_id"], gated["cluster_id"]))
    assert got[9] == 0 and got[22] == 20 and got[51] == 40
    assert got[100] == 100 and got[101] == 101

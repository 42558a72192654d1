"""Disk-backed IVF index (stages/ann.build_ivf_index + ivf_query_index):
query results bit-identical to the in-memory ivf_topk over the same
table, storage-layer pruning proven by DELETING every unprobed cluster
directory, and the _cuts contract (one range per cluster)."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from ontology_matcher_ray.pipelines.docs_text import (
    _query_vectors,
    read_embeddings,
)
from ontology_matcher_ray.stages import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("ivf") / "index")
    ds = read_embeddings(SF, columns=["vec_id", "embedding"])
    stats = ann.build_ivf_index(ds, out, nlist=16)
    return out, stats


def test_layout_one_range_per_cluster(built):
    out, stats = built
    from ontology_matcher_ray.sources.io import load_cuts

    assert load_cuts(out)["cuts"] == list(range(1, 16))
    # every written range holds exactly its own cluster id
    for d in glob.glob(os.path.join(out, "range=*")):
        rid = int(os.path.basename(d).split("=")[1])
        part = pd.read_parquet(d)
        assert set(part["cluster"]) == {rid}
    assert stats["rows"].sum() == pd.read_parquet(
        f"{SF}/embeddings.parquet").shape[0]


def test_query_matches_in_memory_ivf(built, ray_session):
    out, _ = built
    qids, qmat = _query_vectors(SF, 4)
    want = ann.ivf_topk(read_embeddings(SF, columns=["vec_id", "embedding"]),
                        qmat, qids, top_k=5)
    got = ann.ivf_query_index(out, qmat, qids, top_k=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


def test_unprobed_clusters_never_read(built, ray_session, tmp_path):
    # copy the index, DELETE every directory outside the probe set, and
    # get the identical answer — proof the reader prunes at storage level
    out, _ = built
    qids, qmat = _query_vectors(SF, 4)
    want = ann.ivf_query_index(out, qmat, qids, top_k=5)

    cdf = pd.read_parquet(os.path.join(out, "_centroids.parquet"))
    cents = np.stack([np.asarray(v, dtype=np.float64)
                      for v in cdf.sort_values("cluster")["centroid"]])
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = set(np.argsort(-(qn @ cents.T), axis=1)[:, :4].ravel().tolist())

    crippled = str(tmp_path / "crippled")
    shutil.copytree(out, crippled)
    removed = 0
    for d in glob.glob(os.path.join(crippled, "range=*")):
        if int(os.path.basename(d).split("=")[1]) not in probe:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0          # the probe set must not cover everything
    got = ann.ivf_query_index(crippled, qmat, qids, top_k=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))

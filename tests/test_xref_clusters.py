"""Ontology-merge clusters (graph.min_label_components /
xref_entity_clusters): closed-form component graphs, transitivity across
chained xrefs, equality of the driver union-find tier and the forced
distributed min-label-propagation tier, and the flagship xref graph vs
an independent pure-Python BFS."""

from collections import deque

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ontology_matcher_ray.pipelines.graph import (
    min_label_components,
    xref_entity_clusters,
)

SF = "/root/testdata/sf0.001"


def _edges_ds(pairs) -> rd.Dataset:
    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(str)
    return rd.from_pandas(pd.DataFrame({
        "src": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
        "dst": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
    }))


def _bfs_clusters(pairs) -> dict:
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict = {}
    for start in adj:
        if start in out:
            continue
        comp, q = {start}, deque([start])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in comp:
                    comp.add(u)
                    q.append(u)
        lab = min(comp)
        for v in comp:
            out[v] = lab
    return out


def _run(pairs, **kw) -> dict:
    df = min_label_components(_edges_ds(pairs), **kw).to_pandas()
    return dict(zip(df["node"], df["cluster"]))


def test_chain_transitivity(ray_session):
    pairs = [("MESH:D1", "OMIM:2"), ("OMIM:2", "MONDO:3"),
             ("MONDO:3", "UMLS:4")]
    got = _run(pairs)
    assert got == {v: "MESH:D1"
                   for v in ("MESH:D1", "OMIM:2", "MONDO:3", "UMLS:4")}


def test_two_components(ray_session):
    pairs = [("a", "b"), ("c", "d"), ("d", "e")]
    assert _run(pairs) == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "c"}


def test_tiers_identical(ray_session):
    rng = np.random.RandomState(3)
    pairs = sorted({tuple(sorted((f"id{a}", f"id{b}")))
                    for a, b in rng.randint(0, 30, size=(40, 2)) if a != b})
    fast = _run(pairs)                                # union-find tier
    dist = _run(pairs, driver_edges_max=0)            # forced exchange tier
    assert fast == dist == _bfs_clusters(pairs)


def test_flagship_vs_bfs(ray_session):
    from ontology_matcher_ray.pipelines.docs_kg import entity_xref_triples

    xr = entity_xref_triples(SF).to_pandas()
    pairs = list(zip(xr["subj"], xr["obj"]))
    want = _bfs_clusters(pairs)
    got = {r.node: r.cluster
           for r in xref_entity_clusters(SF).to_pandas().itertuples()}
    assert got == want
    # every xref target joins its entity's cluster (transitive identity)
    assert all(got[a] == got[b] for a, b in pairs)

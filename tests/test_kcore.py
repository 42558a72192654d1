"""k-core decomposition (graph.kcore_from_edges / kg_kcore): closed-form
graphs (clique, star, shared-node triangles, path, clique+pendant), a
random graph vs an independent Matula–Beck peeling reference, partition
invariance, and the flagship co-occurrence graph vs peeling over the
DuckDB-recomputed pair list."""

import heapq

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from ontology_matcher_ray.pipelines.graph import kcore_from_edges, kg_kcore

SF = "/root/testdata/sf0.001"


def _peel(pairs) -> dict:
    """Independent coreness reference: Matula–Beck min-degree peeling."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed: set = set()
    core: dict = {}
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def _edges_ds(pairs) -> rd.Dataset:
    df = pd.DataFrame(pairs, columns=["a", "b"]).astype(str)
    sym = pd.DataFrame({
        "src": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
        "dst": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
    })
    return rd.from_pandas(sym)


def _run(pairs, **kw) -> dict:
    out = kcore_from_edges(_edges_ds(pairs), **kw).to_pandas()
    return dict(zip(out["node"], out["core"]))


def test_clique(ray_session):
    pairs = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    assert _run(pairs) == {v: 3 for v in "abcd"}


def test_star(ray_session):
    pairs = [("hub", f"leaf{i}") for i in range(5)]
    got = _run(pairs)
    assert got == {**{"hub": 1}, **{f"leaf{i}": 1 for i in range(5)}}


def test_two_triangles_shared_node(ray_session):
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("c", "d"), ("d", "e"), ("c", "e")]
    assert _run(pairs) == {v: 2 for v in "abcde"}


def test_path(ray_session):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    assert _run(pairs) == {v: 1 for v in "abcd"}


def test_clique_plus_pendant(ray_session):
    pairs = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    pairs.append(("d", "p"))
    got = _run(pairs)
    assert got["p"] == 1
    assert all(got[v] == 3 for v in "abcd")


def test_random_graph_vs_peeling(ray_session):
    rng = np.random.RandomState(11)
    n = 40
    pairs = sorted({tuple(sorted((f"n{a}", f"n{b}")))
                    for a, b in rng.randint(0, n, size=(160, 2)) if a != b})
    assert _run(pairs) == _peel(pairs)


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(5)
    pairs = sorted({tuple(sorted((f"n{a}", f"n{b}")))
                    for a, b in rng.randint(0, 25, size=(80, 2)) if a != b})
    a = _run(pairs, num_partitions=1)
    b = _run(pairs, num_partitions=13)
    assert a == b


def test_kg_kcore_vs_peeling_sf(ray_session):
    """Flagship graph: engine coreness == peeling over the SAME pair
    list recomputed independently by DuckDB (the cooc oracle CTEs)."""
    import duckdb

    from ontology_matcher_ray.oracle import GRAPH_CTES, terms_cte

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    pairs = con.sql(
        f"WITH {terms_cte()},\n{GRAPH_CTES}\nSELECT a, b FROM cpairs"
    ).fetchall()
    want = _peel([(a, b) for a, b in pairs])
    got = {r.node: r.core for r in kg_kcore(SF).to_pandas().itertuples()}
    assert got == want

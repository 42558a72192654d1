"""Graph-analytics operators (pipelines/graph.py) on skewed synthetic
graphs — the sf fixtures' 16-term vocabulary yields a complete (regular)
co-occurrence graph whose PageRank is uniform, so these tests build a
star graph where the hub MUST outrank the leaves, and check the integer
recurrence against a local reference implementation plus
partition-count invariance (the order-independence claim)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ontology_matcher_ray.pipelines.graph import (
    TOTAL_MASS,
    entity_cooccurrence,
    kg_degrees,
    pagerank_from_edges,
)

SF = "/root/testdata/sf0.001"


def star_edges(n_leaves: int = 20) -> pd.DataFrame:
    """Hub 'h' <-> each leaf, symmetric (every node has in+out edges)."""
    leaves = [f"leaf_{i:02d}" for i in range(n_leaves)]
    return pd.DataFrame({
        "src": leaves + ["h"] * n_leaves,
        "dst": ["h"] * n_leaves + leaves,
    })


def reference_pagerank(edges: pd.DataFrame, iterations: int = 5) -> dict:
    """Plain-Python mirror of the engine's integer recurrence."""
    deg = edges.groupby("src").size().to_dict()
    n = len(deg)
    base = TOTAL_MASS // n
    rank = {v: base for v in deg}
    for _ in range(iterations):
        insum = {v: 0 for v in deg}
        for src, dst in zip(edges["src"], edges["dst"]):
            insum[dst] += rank[src] // deg[src]
        rank = {v: (15 * base) // 100 + (85 * insum[v]) // 100 for v in deg}
    return rank


def test_pagerank_star_hub_dominates():
    edges = star_edges(20)
    got = (
        pagerank_from_edges(rd.from_pandas(edges), iterations=5, num_partitions=8)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    want = reference_pagerank(edges, iterations=5)
    assert got == want
    leaf_ranks = {v: r for v, r in got.items() if v != "h"}
    assert got["h"] > max(leaf_ranks.values())
    assert len(set(leaf_ranks.values())) == 1  # leaves symmetric


@pytest.mark.parametrize("parts", [2, 16])
def test_pagerank_partition_invariant(parts):
    edges = star_edges(13)
    got = (
        pagerank_from_edges(rd.from_pandas(edges), iterations=3, num_partitions=parts)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert got == reference_pagerank(edges, iterations=3)


def test_degrees_consistent_with_cooccurrence():
    """Over the fixture: co-occurrence pairs are symmetric in the degree
    view of the undirected graph, and kg_degrees' totals must equal the
    triple count on each side."""
    co = entity_cooccurrence(SF, num_partitions=8).to_pandas()
    assert (co["a"] < co["b"]).all()
    assert co.duplicated(["a", "b"]).sum() == 0
    dg = kg_degrees(SF, num_partitions=8).to_pandas()
    # every triple contributes exactly one out- and one in-degree
    assert dg["out_degree"].sum() == dg["in_degree"].sum()
    assert (dg["out_degree"] + dg["in_degree"] > 0).all()


def test_pagerank_asymmetric_drops_sinks():
    # a -> b only: 'b' has no out-edge, documented to drop in round 1;
    # 'a' keeps forwarding into the void and decays to the teleport term
    edges = pd.DataFrame({"src": ["a"], "dst": ["b"]})
    got = (
        pagerank_from_edges(rd.from_pandas(edges), iterations=3, num_partitions=2)
        .to_pandas()
    )
    assert got["node"].tolist() == ["a"]
    base = TOTAL_MASS // 1  # one node with out-degree
    assert got["rank"].iloc[0] == (15 * base) // 100


def test_pagerank_empty_string_node_name():
    # a node literally named "" must behave like any other node
    edges = pd.DataFrame({
        "src": ["", "hub", "x", "hub"],
        "dst": ["hub", "", "hub", "x"],
    })
    got = (
        pagerank_from_edges(rd.from_pandas(edges), iterations=4, num_partitions=2)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert got == reference_pagerank(edges, iterations=4)
    assert "" in got


# ---------------------------------------------------------------------------
# pinned-partition (Pregel-actor) engine: bit parity with the exchange
# engine on every graph shape the exchange tests cover
# ---------------------------------------------------------------------------

def _random_edges(n_nodes: int = 40, n_edges: int = 300, seed: int = 3):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    keep = a != b
    e = pd.DataFrame({
        "src": [f"n{v:03d}" for v in a[keep]],
        "dst": [f"n{v:03d}" for v in b[keep]],
    }).drop_duplicates(ignore_index=True)
    # symmetric closure: every node has both directions
    return pd.concat(
        [e, e.rename(columns={"src": "dst", "dst": "src"})[["src", "dst"]]],
        ignore_index=True,
    ).drop_duplicates(ignore_index=True)


@pytest.mark.parametrize("parts", [1, 2, 7])
def test_pinned_pagerank_bit_identical_to_exchange(parts, ray_session):
    from ontology_matcher_ray.pipelines.graph import pagerank_from_edges_pinned

    for edges in (star_edges(), _random_edges()):
        ex = (pagerank_from_edges(rd.from_pandas(edges), iterations=4,
                                  num_partitions=parts)
              .to_pandas().sort_values("node", ignore_index=True))
        pin = (pagerank_from_edges_pinned(rd.from_pandas(edges), iterations=4,
                                          num_partitions=parts)
               .to_pandas().sort_values("node", ignore_index=True))
        pd.testing.assert_frame_equal(ex, pin, check_dtype=False)


def test_pinned_pagerank_asymmetric_and_reference(ray_session):
    """Sink-drop contract matches the exchange engine on a directed
    graph, and both match the plain-Python reference on symmetric
    input."""
    from ontology_matcher_ray.pipelines.graph import pagerank_from_edges_pinned

    directed = pd.DataFrame({
        "src": ["a", "b", "c", "a"],
        "dst": ["b", "c", "a", "c"],
    })
    ex = (pagerank_from_edges(rd.from_pandas(directed), iterations=3,
                              num_partitions=2)
          .to_pandas().sort_values("node", ignore_index=True))
    pin = (pagerank_from_edges_pinned(rd.from_pandas(directed), iterations=3,
                                      num_partitions=2)
           .to_pandas().sort_values("node", ignore_index=True))
    pd.testing.assert_frame_equal(ex, pin, check_dtype=False)

    edges = star_edges(12)
    pin = pagerank_from_edges_pinned(rd.from_pandas(edges), iterations=5,
                                     num_partitions=3).to_pandas()
    assert dict(zip(pin["node"], pin["rank"])) == reference_pagerank(
        edges, iterations=5
    )


@pytest.mark.parametrize("parts", [2, 5])
def test_pinned_pagerank_multi_actor_parity(parts, ray_session):
    """Force p > 1 via rows_per_partition (the production constant is
    65536, far above any test graph) so the num_returns message routing,
    per-owner payload splitting, and apply-side merging actually execute
    — without this knob every parametrization clamps to one actor and
    the multi-actor path ships untested."""
    from ontology_matcher_ray.pipelines.graph import pagerank_from_edges_pinned

    for edges in (star_edges(), _random_edges()):
        ex = (pagerank_from_edges(rd.from_pandas(edges), iterations=4,
                                  num_partitions=parts)
              .to_pandas().sort_values("node", ignore_index=True))
        pin = (pagerank_from_edges_pinned(rd.from_pandas(edges), iterations=4,
                                          num_partitions=parts,
                                          rows_per_partition=8)
               .to_pandas().sort_values("node", ignore_index=True))
        pd.testing.assert_frame_equal(ex, pin, check_dtype=False)


def test_pinned_pagerank_empty_shard_receives_messages(ray_session):
    """One hub src fanning out to many dsts: every edge hashes to the
    hub's owner, so the other shards own ZERO nodes yet receive message
    payloads for the (deg-0) leaves they'd own — those must be dropped,
    not crash on indexing an empty owned-node array (regression), and
    the result must match the exchange engine's sink-drop contract."""
    from ontology_matcher_ray.pipelines.graph import pagerank_from_edges_pinned

    edges = pd.DataFrame({
        "src": ["hub"] * 50,
        "dst": [f"x{i:03d}" for i in range(50)],
    })
    ex = (pagerank_from_edges(rd.from_pandas(edges), iterations=3,
                              num_partitions=4)
          .to_pandas().sort_values("node", ignore_index=True))
    pin = (pagerank_from_edges_pinned(rd.from_pandas(edges), iterations=3,
                                      num_partitions=4, rows_per_partition=4)
           .to_pandas().sort_values("node", ignore_index=True))
    pd.testing.assert_frame_equal(ex, pin, check_dtype=False)


# --- kg_reach: bounded transitive closure --------------------------------

def _trips_ds(edges: pd.DataFrame) -> rd.Dataset:
    return rd.from_pandas(pd.DataFrame({
        "subj": edges["src"], "pred": "e", "obj": edges["dst"],
    }))


def _reference_reach(edges: pd.DataFrame, hops: int) -> pd.DataFrame:
    """Closed-form BFS tiers 1..hops, distinct reached nodes per start."""
    adj = edges.groupby("src")["dst"].apply(set).to_dict()
    out = {}
    for start in adj:
        frontier, reached = {start}, set()
        for _ in range(hops):
            frontier = set().union(*(adj.get(v, set()) for v in frontier))
            reached |= frontier
        out[start] = len(reached)
    return (pd.DataFrame({"node": list(out), "n_reach": list(out.values())})
            .astype({"n_reach": "int64"})
            .sort_values("node", ignore_index=True))


def _run_reach(edges: pd.DataFrame, hops: int, **kw) -> pd.DataFrame:
    from ontology_matcher_ray.pipelines.graph import kg_reach

    return (kg_reach("", hops=hops, trips=_trips_ds(edges), **kw)
            .to_pandas().sort_values("node", ignore_index=True))


def chain_plus_hub() -> pd.DataFrame:
    """a->b->c->d chain, plus a hub reached by 30 spokes that fans out to
    8 sinks (the in-degree x out-degree 2-hop blowup case), plus a
    2-cycle (reach includes the start when a cycle returns)."""
    rows = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")]
    rows += [(f"s{i:02d}", "hub") for i in range(30)]
    rows += [("hub", f"t{j}") for j in range(8)]
    return pd.DataFrame(rows, columns=["src", "dst"])


@pytest.mark.parametrize("hops", [1, 2, 3])
def test_reach_matches_reference(hops):
    edges = chain_plus_hub()
    got = _run_reach(edges, hops)
    pd.testing.assert_frame_equal(got, _reference_reach(edges, hops))


def test_reach_cycle_counts_start():
    got = _run_reach(chain_plus_hub(), 2).set_index("node")["n_reach"]
    assert got["x"] == 2          # y and x itself (cycle closes)
    assert got["s00"] == 9        # hub + its 8 sinks
    assert got["a"] == 2          # b, c


def test_reach_partition_and_salt_invariant():
    edges = chain_plus_hub()
    base = _run_reach(edges, 2)
    pd.testing.assert_frame_equal(base, _run_reach(edges, 2, num_partitions=3))
    pd.testing.assert_frame_equal(base, _run_reach(edges, 2, salt=4))


def test_reach_duplicate_edges_collapse():
    edges = pd.concat([chain_plus_hub()] * 3, ignore_index=True)
    pd.testing.assert_frame_equal(
        _run_reach(edges, 2), _reference_reach(chain_plus_hub(), 2))


def test_reach_rejects_zero_hops():
    with pytest.raises(ValueError):
        _run_reach(chain_plus_hub(), 0)


# ---- triangle counting (triangles_from_edges / kg_triangles) ----

def _ref_triangles(edges) -> dict:
    """Brute-force reference: adjacency sets, count closed u<v<w."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w <= v:
                    continue
                for x in (u, v, w):
                    counts[x] = counts.get(x, 0) + 1
    return counts


def _tri_counts(edge_list, parts=4) -> dict:
    from ontology_matcher_ray.pipelines.graph import triangles_from_edges

    ds = rd.from_pandas(pd.DataFrame(edge_list, columns=["a", "b"]))
    df = triangles_from_edges(ds, num_partitions=parts).to_pandas()
    if not len(df):        # triangle-free graph: schema-less empty
        return {}
    return dict(zip(df["node"], df["n_triangles"]))


def test_triangles_k4_plus_pendant():
    # K4 = 4 triangles, 3 per corner; pendant node e joins none
    k4 = [("a", "b"), ("a", "c"), ("a", "d"),
          ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    got = _tri_counts(k4)
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}   # e emits no row


def test_triangles_hub_star_and_mixed():
    # star hub h with leaves l0..l5 has no triangles; closing l0-l1
    # creates exactly one through the hub
    star = [("h", f"l{i}") for i in range(6)]
    assert _tri_counts(star) == {}
    assert _tri_counts(star + [("l0", "l1")]) == {"h": 1, "l0": 1, "l1": 1}


def test_triangles_match_reference_random():
    import random

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)})
    want = _ref_triangles(edges)
    assert sum(want.values()) > 0           # fixture must be non-trivial
    assert _tri_counts(edges) == want


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_triangles_partition_invariant(parts):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("a", "d"), ("d", "e"), ("c", "e")]
    assert _tri_counts(edges, parts) == _ref_triangles(edges)


# ---------------------------------------------------------------- Adamic-Adar


def _ref_adamic_adar(edge_list, max_center_degree=10_000) -> dict:
    """Brute-force reference: for every pair sharing >= 1 neighbor,
    (common_neighbors, sum of floor(1e6 / ln(deg(center))))."""
    import math

    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for w, nbrs in adj.items():
        d = len(nbrs)
        if d > max_center_degree:
            continue
        s = math.floor(1e6 / math.log(d)) if d >= 2 else 0
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cn, sm = scores.get((ns[i], ns[j]), (0, 0))
                scores[(ns[i], ns[j])] = (cn + 1, sm + s)
    return scores


def _aa_table(edge_list, parts=4, **kw) -> dict:
    from ontology_matcher_ray.pipelines.graph import adamic_adar_from_pairs

    ds = rd.from_pandas(pd.DataFrame(edge_list, columns=["a", "b"]))
    df = adamic_adar_from_pairs(ds, num_partitions=parts, **kw).to_pandas()
    if not len(df):
        return {}
    return {(r.a, r.b): (r.common_neighbors, r.aa_micro)
            for r in df.itertuples()}


def test_adamic_adar_closed_form():
    # path a-b-c: pair (a,c) shares exactly center b (deg 2)
    got = _aa_table([("a", "b"), ("b", "c")])
    assert got == {("a", "c"): (1, int(1e6 / np.log(2)))}


def test_adamic_adar_star_scores_every_leaf_pair():
    # hub h with 5 leaves: every leaf pair shares only h (deg 5)
    edges = [("h", f"l{i}") for i in range(5)]
    got = _aa_table(edges)
    want = _ref_adamic_adar(edges)
    assert got == want
    assert len(got) == 10  # C(5,2)
    s = int(np.floor(1e6 / np.log(5)))
    assert all(v == (1, s) for v in got.values())


def _undirected(edges: pd.DataFrame) -> list:
    """_random_edges' symmetric (src,dst) frame -> unique a<b edge list."""
    e = edges[edges["src"] < edges["dst"]]
    return sorted(set(zip(e["src"], e["dst"])))


def test_adamic_adar_matches_reference_random():
    el = _undirected(_random_edges(n_nodes=30, n_edges=120, seed=7))
    assert _aa_table(el) == _ref_adamic_adar(el)


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_adamic_adar_partition_invariant(parts):
    el = _undirected(_random_edges(n_nodes=20, n_edges=60, seed=11))
    assert _aa_table(el, parts=parts) == _ref_adamic_adar(el)


def test_adamic_adar_center_degree_cap_skips_hubs():
    # hub h (deg 4) capped out; only the square's own wedges remain
    edges = [("h", x) for x in "abcd"] + [("a", "b"), ("c", "d")]
    got = _aa_table(edges, max_center_degree=3)
    assert got == _ref_adamic_adar(edges, max_center_degree=3)
    # with the cap off, leaf pairs through h appear
    assert len(_aa_table(edges)) > len(got)


def _write_docs(tmp_path, doc_ids):
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "doc_id": pd.Series(doc_ids, dtype="int64"),
        "text": ["x y z"] * len(doc_ids),
        "lang": ["en"] * len(doc_ids),
        "source": ["s"] * len(doc_ids),
        "n_chars": pd.Series([5] * len(doc_ids), dtype="int64"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))


def test_bfs_dist_closed_form(tmp_path):
    """Settled-set BFS from the doc_id%10==0 seeds: min-hop labels on a
    planted graph with a shortcut (two paths of different length to the
    same node must keep the SHORTER), a cycle, and unreachable nodes."""
    from ontology_matcher_ray.pipelines.graph import kg_bfs_dist

    _write_docs(tmp_path, [10, 20, 3])     # seeds: doc:10, doc:20 (not doc:3)
    edges = pd.DataFrame([
        ("doc:10", "a"), ("a", "b"), ("b", "c"),      # chain: a=1 b=2 c=3
        ("doc:20", "b"),                              # shortcut: b=1 -> c=2
        ("c", "a"),                                   # cycle back (a stays 1)
        ("doc:3", "zz"),                              # non-seed doc: zz unlabeled
        ("q", "r"),                                   # disconnected
    ], columns=["src", "dst"])
    got = (kg_bfs_dist(str(tmp_path), hops=3, trips=_trips_ds(edges),
                       num_partitions=3)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == {"doc:10": 0, "doc:20": 0, "a": 1, "b": 1, "c": 2}

    # partition/salt invariance
    alt = (kg_bfs_dist(str(tmp_path), hops=3, trips=_trips_ds(edges),
                       num_partitions=8, salt=4)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert alt == got

    # hops bound: with hops=1 node c is not yet settled
    one = (kg_bfs_dist(str(tmp_path), hops=1, trips=_trips_ds(edges),
                       num_partitions=3)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert one == {"doc:10": 0, "doc:20": 0, "a": 1, "b": 1}

"""Graph analytics over the constructed knowledge graph.

The operators a KG-construction pipeline runs AFTER building triples:
co-occurrence edge derivation, degree statistics, and PageRank-style
centrality over the entity graph.  The reference stops at emitting
formatted entities (`ontology_matcher/cli.py`); these are the follow-on
analyses its downstream consumers (knowledge-graph curation) perform, so
the engine ships them as first-class distributed operators.

Scale design
------------
* Co-occurrence pairs are generated inside a ``doc_id``-keyed partition
  (every mention of one doc is co-located by the exchange guarantee) and
  aggregated by a second ``(a, b)``-keyed exchange — no driver-side pass,
  pair volume bounded by sum(per-doc entity count squared).
* Degrees are one partial-combine (per-batch pandas groupby) + one small
  exchange keyed on the node — the canonical combiner-then-shuffle shape.
* PageRank is iterative message passing through the same hash-partition
  exchange used by `stages.dedup.near_dup_clusters`: per round, rank rows
  and edge rows co-locate on the source node (exchange 1), contributions
  ship to destinations and reduce by sum (exchange 2).  The edge list is
  materialized ONCE and each round consumes the previous round's bounded
  (node, deg, rank) table exactly once (the Ray 2.49 double-consume
  lineage pitfall — see near_dup_clusters).
* All rank arithmetic is INTEGER (micro-mass units of a 10^12 total), so
  results are order-independent, bit-stable across parallelism levels,
  and exactly recomputable by the DuckDB oracle
  (`oracle.pagerank_sql`): contrib = rank // deg,
  rank' = (15 * BASE) // 100 + (85 * sum(contrib_in)) // 100.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ontology_matcher_ray.pipelines.docs_kg import kg_triples, linked_mentions
from ontology_matcher_ray.stages import exchange

TOTAL_MASS = 10**12  # integer PageRank mass; per-node BASE = TOTAL // n


def entity_cooccurrence(sf_dir: str, num_partitions: int = 32,
                        trips: rd.Dataset | None = None) -> rd.Dataset:
    """(a, b, n_docs): entity pairs co-mentioned in a document.

    ``a < b`` lexicographically; ``n_docs`` counts distinct documents
    mentioning both.  Pair generation is a per-partition self-merge on
    ``doc_id`` (all mentions of a doc are co-located), aggregation a
    second exchange on the pair — the same two-exchange shape as the
    near-dup verifiers.

    Pass a precomputed (e.g. materialized) ``trips`` to derive the
    (doc, entity) mention pairs from its ``pred='mentions'`` rows
    instead of re-running the extract chain (composite.kg_topology) —
    the flagship triple union stores them distinct by construction.
    """
    # per-batch partial dedup (combiner); the doc_id exchange below
    # completes the (doc_id, out_id) distinct inside the pair kernel —
    # fusing what would otherwise be a separate distinct exchange
    # (3 exchanges -> 2; measured 3.9s -> ~2.6s on the sf0.1 chain)
    if trips is not None:
        def from_trips(b: pd.DataFrame) -> pd.DataFrame:
            m = b[b["pred"] == "mentions"]
            return pd.DataFrame({
                "doc_id": m["subj"].str.slice(4).astype("int64"),
                "out_id": m["obj"].astype(str),
            })

        dm = trips.map_batches(from_trips, batch_format="pandas")
    else:
        dm = linked_mentions(sf_dir).map_batches(
            lambda b: pd.DataFrame({
                "doc_id": b["doc_id"].astype("int64"),
                "out_id": b["out_id"].astype(str),
            }).drop_duplicates(),
            batch_format="pandas",
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["doc_id", "out_id"])
        m = g.merge(g, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["out_id_a"] < m["out_id_b"]]
        return (
            m.groupby(["out_id_a", "out_id_b"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"out_id_a": "a", "out_id_b": "b"})
        )

    partial = exchange.partitioned_apply(dm, ["doc_id"], pairs, num_partitions)
    return exchange.grouped_agg(
        partial, ["a", "b"],
        lambda gb: gb.agg(n_docs=("n", "sum")),
        num_partitions,
    )


def kg_degrees(
    sf_dir: str, num_partitions: int = 32,
    trips: rd.Dataset | None = None,
) -> rd.Dataset:
    """(node, out_degree, in_degree) over the flagship triple union.

    Per-batch partial counts (the combiner) keep the exchange volume at
    O(distinct nodes per batch), not O(triples).  Pass a precomputed
    (e.g. materialized) ``trips`` to share the triple build with other
    consumers (composite.kg_topology).
    """
    if trips is None:
        trips = kg_triples(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        o = b.groupby("subj", sort=False).size().reset_index(name="out_degree")
        o = o.rename(columns={"subj": "node"})
        o["in_degree"] = np.int64(0)
        i = b.groupby("obj", sort=False).size().reset_index(name="in_degree")
        i = i.rename(columns={"obj": "node"})
        i["out_degree"] = np.int64(0)
        return pd.concat(
            [o[["node", "out_degree", "in_degree"]],
             i[["node", "out_degree", "in_degree"]]],
            ignore_index=True,
        )

    partials = trips.map_batches(partial, batch_format="pandas")
    return exchange.grouped_agg(
        partials, ["node"],
        lambda gb: gb.agg(out_degree=("out_degree", "sum"),
                          in_degree=("in_degree", "sum")),
        num_partitions,
    )


def _distinct_edges(trips: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Distinct directed (src, dst) edge list of a triple set,
    MATERIALIZED (it is re-consumed by every hop join — the Ray 2.49
    double-consume pitfall; bounded by distinct-edge volume, spills at
    scale).  Shared by kg_reach and kg_bfs_dist."""
    return exchange.distinct(
        trips.map_batches(
            lambda b: pd.DataFrame({
                "src": b["subj"].astype(str),
                "dst": b["obj"].astype(str),
            }).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"], num_partitions,
    ).materialize()


def kg_bfs_dist(
    sf_dir: str,
    hops: int = 3,
    num_partitions: int = 32,
    salt: int | str = "auto",
    trips: rd.Dataset | None = None,
    seed_mod: int = 10,
) -> rd.Dataset:
    """(node, dist): BFS hop distance from a SEED SET (the 'doc:k'
    nodes with k % ``seed_mod`` == 0) along directed triple edges —
    single-source-set shortest paths, the iterative-graph tier next to
    reach counting (kg_reach counts WHAT is reachable; this labels HOW
    FAR, with min-hop semantics).

    Settled-set semi-naive expansion through the engine's exchanges:
    per hop, ONE ``hash_join`` of the frontier against the edge list
    (``salt`` spreads hub sources exactly as in kg_reach) and ONE anti
    join against the settled set, so a node is labeled by its FIRST
    (minimal) hop and never re-expanded — the frontier shrinks to the
    unvisited boundary instead of re-walking the whole ball each round.
    The settled set is node-bounded (not path-bounded) and materializes
    once per hop.  Unreachable nodes are ABSENT from the output
    (consumers COALESCE to -1, as the kg_degrees composite does).
    """
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    if trips is None:
        trips = kg_triples(sf_dir)

    from ontology_matcher_ray.pipelines.docs_text import read_documents

    edges = _distinct_edges(trips, num_partitions)
    seeds = read_documents(sf_dir, columns=["doc_id"]).map_batches(
        lambda b: pd.DataFrame({
            "node": "doc:" + b["doc_id"][
                b["doc_id"].astype("int64") % seed_mod == 0
            ].astype(str),
            "dist": np.int64(0),
        }),
        batch_format="pandas",
    )
    settled = seeds.materialize()
    frontier = settled
    # the frontier's nodes are DISTINCT (uniform histogram by
    # construction), so the hub signal lives on the edge side: a hub's
    # out-edges all hash to one partition.  One pre-flight over the
    # materialized edge list sizes the salt for every hop.
    hop_salt = (exchange.adaptive_salt(edges, ["src"], num_partitions)
                if salt == "auto" else salt)
    for d in range(1, hops + 1):
        hop = exchange.hash_join(
            frontier.map_batches(
                lambda b: b[["node"]], batch_format="pandas"),
            edges.map_batches(
                lambda b: b.rename(columns={"src": "esrc", "dst": "edst"}),
                batch_format="pandas",
            ),
            "node", "esrc",
            {"node": "object"},
            {"esrc": "object", "edst": "object"},
            num_partitions=num_partitions, salt=hop_salt,
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["edst"]}).drop_duplicates(),
            batch_format="pandas",
        )
        hop = exchange.distinct(hop, ["node"], num_partitions)
        new = exchange.hash_join(
            hop,
            settled.map_batches(lambda b: b[["node"]],
                                batch_format="pandas"),
            "node", "node",
            {"node": "object"}, {"node": "object"},
            how="anti", num_partitions=num_partitions,
        ).map_batches(
            lambda b, _d=d: pd.DataFrame({
                "node": b["node"],
                "dist": np.full(len(b), _d, dtype=np.int64),
            }),
            batch_format="pandas",
        ).materialize()
        settled = settled.union(new).materialize()
        frontier = new
    return settled


def kg_reach(
    sf_dir: str,
    hops: int = 2,
    num_partitions: int = 32,
    salt: int | str = "auto",
    trips: rd.Dataset | None = None,
) -> rd.Dataset:
    """(node, n_reach): distinct nodes reachable from ``node`` along
    1..``hops`` directed triple edges — the bounded transitive-closure
    tier an ontology pipeline runs over its constructed graph (e.g.
    "everything a document connects to through its linked entities'
    xrefs").

    Semi-naive frontier expansion through the engine's own exchanges:
    the distinct edge list is materialized ONCE (it is re-consumed by
    the base tier and every hop join — the Ray 2.49 double-consume
    pitfall, same as PageRank's edge list; bounded by distinct-edge
    volume, spills at scale); each hop is one ``hash_join`` of the
    frontier's destination against the edge source.  ``salt`` spreads
    HOT intermediate nodes (a popular entity reached by many documents
    multiplied by its own out-degree) by replicating the edge side of
    the hop join — ADAPTIVE by default (``salt="auto"``: a
    ``partition_load`` pre-flight over both join sides sizes the salt
    to the measured imbalance, 1 when balanced); the cost when it
    engages is a salt-times-larger edge-side shuffle per hop, the win
    is that no single partition materializes a hub's in-degree x
    out-degree row blowup alone.  The final count is skew-robust by construction:
    distinct on the (src, dst) PAIR key (no hub key exists at pair
    granularity), then a per-batch combiner + node-keyed exchange sums
    bounded partials — a hub node's reach set is never collected into
    one partition as raw pairs.

    Reached nodes are counted whatever they are (a cycle back to the
    start counts the start); hop tiers overlap and are de-duplicated by
    the final pair-distinct.
    """
    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    if trips is None:
        trips = kg_triples(sf_dir)

    edges = _distinct_edges(trips, num_partitions)

    tiers = [edges]
    frontier = edges
    # per-key blowup in a hop join is (frontier rows at key) x (edge
    # rows at key): measure BOTH sides' partition histograms and take
    # the max — the edge side once (it never changes), the frontier
    # side per hop.  Every measured dataset is materialized (edges, or
    # the distinct()d previous tier), so each histogram is a cheap
    # combiner re-read, never a pipeline recompute.  Balanced data
    # measures salt 1 and pays zero replication.
    edge_salt = (exchange.adaptive_salt(edges, ["src"], num_partitions)
                 if salt == "auto" else 0)
    for h in range(hops - 1):
        hop_salt = (max(edge_salt,
                        exchange.adaptive_salt(frontier, ["dst"],
                                               num_partitions))
                    if salt == "auto" else salt)
        nxt = exchange.hash_join(
            frontier.map_batches(
                lambda b: b.rename(columns={"dst": "via"}),
                batch_format="pandas",
            ),
            edges.map_batches(
                lambda b: b.rename(columns={"src": "esrc", "dst": "edst"}),
                batch_format="pandas",
            ),
            "via", "esrc",
            {"src": "object", "via": "object"},
            {"esrc": "object", "edst": "object"},
            num_partitions=num_partitions, salt=hop_salt,
        ).map_batches(
            lambda b: pd.DataFrame({
                "src": b["src"], "dst": b["edst"],
            }).drop_duplicates(),
            batch_format="pandas",
        )
        if h < hops - 2:
            # intermediate tiers feed the NEXT hop join too: full
            # distinct bounds the joined volume, materialize for the
            # double consumption (union + join left side)
            frontier = exchange.distinct(
                nxt, ["src", "dst"], num_partitions).materialize()
        else:
            frontier = nxt     # last tier flows straight into the union
        tiers.append(frontier)

    allr = tiers[0]
    for t in tiers[1:]:
        allr = allr.union(t)
    dist = exchange.distinct(allr, ["src", "dst"], num_partitions)
    partial = dist.map_batches(
        lambda b: b.groupby("src", sort=False).size().reset_index(name="n"),
        batch_format="pandas",
    )
    counted = exchange.grouped_agg(
        partial, ["src"],
        lambda gb: gb.agg(n_reach=("n", "sum")),
        num_partitions,
    )
    return counted.map_batches(
        lambda b: pd.DataFrame({
            "node": b["src"], "n_reach": b["n_reach"].astype("int64"),
        }),
        batch_format="pandas",
    )


_TRI_SEP = "\x1f"   # unit separator — never appears in entity ids


def triangles_from_edges(edges: rd.Dataset,
                         num_partitions: int = 32) -> rd.Dataset:
    """(node, n_triangles) over an undirected simple edge list (a, b).

    Degree-ordered wedge-join triangle counting (the standard
    MapReduce/GraphX formulation): every edge is oriented from its
    lower-(degree, node) endpoint to the higher, which turns the
    undirected graph into a DAG whose max out-degree is O(sqrt(m)) —
    so wedge volume is bounded by m^1.5 TOTAL and a hub node's
    quadratic pair blowup can never land on one partition (the hub has
    high degree, so almost all its edges point INTO it and it generates
    few wedges).  Each triangle {u,v,w} with u<v<w in the orientation
    order is found exactly once: as the wedge (v,w) centered at u,
    closed by the oriented edge v->w.

    Exchanges: one degree aggregation, two joins to attach endpoint
    degrees, one src-keyed exchange for wedge generation, and one
    semi-join of wedges against the oriented edge set on the (v,w) pair
    key — pair keys have no hubs, so the closure join needs no salt.
    Per-node counts are orientation-invariant (each triangle credits
    all three corners), which is what lets the SQL oracle recompute
    them with plain lexicographic ordering.
    """
    edges = edges.map_batches(
        lambda b: pd.DataFrame({"a": b["a"].astype(str),
                                "b": b["b"].astype(str)}),
        batch_format="pandas",
    ).materialize()     # consumed by the degree pass + the orientation join

    deg_partial = edges.map_batches(
        lambda b: pd.DataFrame({
            "node": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
            "d": np.int64(1),
        }).groupby("node", sort=False).agg(d=("d", "sum")).reset_index(),
        batch_format="pandas",
    )
    deg = exchange.grouped_agg(
        deg_partial, ["node"], lambda gb: gb.agg(d=("d", "sum")),
        num_partitions,
    ).materialize()     # O(nodes); probed by both endpoint joins

    with_da = exchange.hash_join(
        edges,
        deg.map_batches(lambda b: b.rename(columns={"d": "da"}),
                        batch_format="pandas"),
        "a", "node",
        {"a": "object", "b": "object"},
        {"node": "object", "da": "int64"},
        num_partitions=num_partitions,
    )
    with_both = exchange.hash_join(
        with_da,
        deg.map_batches(lambda b: b.rename(columns={"d": "db"}),
                        batch_format="pandas"),
        "b", "node",
        {"a": "object", "b": "object", "da": "int64"},
        {"node": "object", "db": "int64"},
        num_partitions=num_partitions,
    )

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        lo = (b["da"] < b["db"]) | ((b["da"] == b["db"]) & (b["a"] < b["b"]))
        lo = lo.to_numpy()
        return pd.DataFrame({
            "src": np.where(lo, b["a"], b["b"]),
            "dst": np.where(lo, b["b"], b["a"]),
            "dst_d": np.where(lo, b["db"], b["da"]).astype("int64"),
        })

    oriented = with_both.map_batches(
        orient, batch_format="pandas",
    ).materialize()     # consumed by wedge generation + the closure join

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="src", suffixes=("_x", "_y"))
        lo = ((m["dst_d_x"] < m["dst_d_y"])
              | ((m["dst_d_x"] == m["dst_d_y"])
                 & (m["dst_x"] < m["dst_y"]))).to_numpy()
        m = m[lo]
        return pd.DataFrame({
            "key": m["dst_x"] + _TRI_SEP + m["dst_y"],
            "u": m["src"].to_numpy(),
            "v": m["dst_x"].to_numpy(),
            "w": m["dst_y"].to_numpy(),
        })

    wedge_ds = exchange.partitioned_apply(
        oriented, ["src"], wedges, num_partitions)
    closed = exchange.hash_join(
        wedge_ds,
        oriented.map_batches(
            lambda b: pd.DataFrame({"key": b["src"] + _TRI_SEP + b["dst"]}),
            batch_format="pandas",
        ),
        "key", "key",
        {"key": "object", "u": "object", "v": "object", "w": "object"},
        {"key": "object"},
        how="semi", num_partitions=num_partitions,
    )

    corner_partial = closed.map_batches(
        lambda b: pd.DataFrame({
            "node": np.concatenate([b["u"].to_numpy(), b["v"].to_numpy(),
                                    b["w"].to_numpy()]),
            "n": np.int64(1),
        }).groupby("node", sort=False).agg(n=("n", "sum")).reset_index(),
        batch_format="pandas",
    )
    return exchange.grouped_agg(
        corner_partial, ["node"],
        lambda gb: gb.agg(n_triangles=("n", "sum")),
        num_partitions,
    )


def kg_triangles(sf_dir: str, num_partitions: int = 32,
                 trips: rd.Dataset | None = None) -> rd.Dataset:
    """(node, n_triangles) over the entity co-occurrence graph — the
    community-structure probe an ontology pipeline runs on its
    constructed KG (entities sharing documents pairwise form cliques).
    Nodes in no triangle emit no row (the composite's LEFT join
    restores the exact 0 like the SQL COALESCE)."""
    pairs = entity_cooccurrence(sf_dir, num_partitions, trips=trips)
    return triangles_from_edges(pairs, num_partitions)


def _cooc_edges(sf_dir: str, num_partitions: int) -> rd.Dataset:
    """Undirected co-occurrence edges, both directions."""
    pairs = entity_cooccurrence(sf_dir, num_partitions)

    def both(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
            "dst": np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]),
        })

    return pairs.map_batches(both, batch_format="pandas")


def kg_pagerank(
    sf_dir: str,
    iterations: int = 5,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Integer PageRank over the entity co-occurrence graph.

    Nodes are entities appearing in >=1 co-occurrence pair; total rank
    mass is ``TOTAL_MASS`` split evenly (``BASE = TOTAL_MASS // n``).
    Each of ``iterations`` rounds applies, in pure int64 arithmetic::

        contrib(u)  = rank(u) // deg(u)          (deg >= 1 by construction)
        rank'(v)    = (15 * BASE) // 100 + (85 * sum_in(v)) // 100

    i.e. damping 0.85 with the teleport term floored per node.  Integer
    floors lose a bounded amount of mass per round — the price of
    order-independent, exchange-safe, oracle-exact arithmetic (documented
    in `oracle.pagerank_sql`, which recomputes the identical recurrence).

    Distribution: the bounded (node, deg, rank) table and the edge list
    co-locate on ``hash(src)`` (exchange 1); contributions reduce on
    ``hash(dst)`` (exchange 2).  Each round's ranks are materialized
    (bounded by entity-vocabulary size) and consumed exactly once; a
    'carrier' message re-delivers each node's static ``deg`` through the
    same exchange so no per-round broadcast or extra join is needed.
    """
    return pagerank_from_edges(
        _cooc_edges(sf_dir, num_partitions), iterations, num_partitions
    )


def pagerank_from_edges(
    edge_ds: rd.Dataset,
    iterations: int = 5,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Integer PageRank over an arbitrary directed (src, dst) edge list.

    Same recurrence and distribution story as `kg_pagerank` (which is a
    thin wrapper over the flagship co-occurrence edges); exposed
    separately so callers — and the skew tests — can run it over any
    graph.  Symmetric edge lists (every node both a src and a dst) give
    the canonical behavior; on arbitrary directed lists, a node with no
    out-edge (deg 0 — it cannot forward mass) is dropped from the rank
    table in the round it first receives a message, and a node with no
    in-edge decays toward the teleport term.
    """
    edges = edge_ds.materialize()

    # Partition count scales with edge volume: each iteration runs two
    # exchanges, so at small graphs the fixed per-partition task cost
    # dominates (measured 4.4s -> ~1s on the sf0.1 fixture graph at 32
    # partitions vs sized-to-volume).  ~64k edge rows per partition keeps
    # per-task heap bounded at scale while collapsing tiny graphs to a
    # handful of tasks.
    n_edges = edges.count()
    num_partitions = max(1, min(num_partitions, (n_edges + 65535) // 65536))

    deg = exchange.grouped_agg(
        edges, ["src"],
        lambda gb: gb.agg(deg=("dst", "size")),
        num_partitions,
    ).materialize()

    n = deg.count()
    if n == 0:
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=str),
            "rank": pd.Series([], dtype="int64"),
        }))
    base = TOTAL_MASS // n

    ranks = deg.map_batches(
        lambda b: pd.DataFrame({
            "node": b["src"].astype(str),
            "deg": b["deg"].astype("int64"),
            "rank": np.full(len(b), base, dtype=np.int64),
        }),
        batch_format="pandas",
    ).materialize()

    for _round in range(iterations):
        # exchange 1: co-locate each node's (rank, deg) with its
        # out-edges; 'own' rows double as the deg carrier to the next
        # ranks generation.  `ranks` is consumed exactly once here.
        rank_rows = ranks.map_batches(
            lambda b: pd.DataFrame({
                "key": b["node"].astype(str),
                "dst": "",
                "contrib": (b["rank"].to_numpy(dtype=np.int64)
                            // b["deg"].to_numpy(dtype=np.int64)),
                "deg": b["deg"].astype("int64"),
                "carrier": np.int64(1),
            }),
            batch_format="pandas",
        )
        edge_rows = edges.map_batches(
            lambda b: pd.DataFrame({
                "key": b["src"].astype(str),
                "dst": b["dst"].astype(str),
                "contrib": np.int64(0),
                "deg": np.int64(0),
                "carrier": np.int64(0),
            }),
            batch_format="pandas",
        )

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            # explicit carrier marker — a dst=="" sentinel would
            # misclassify edges touching a node literally named ""
            own = g.loc[g["carrier"] == 1, ["key", "contrib", "deg"]]
            ed = g.loc[g["carrier"] == 0, ["key", "dst"]]
            m = ed.merge(own[["key", "contrib"]], on="key", how="inner")
            frame = pd.DataFrame({
                "node": np.concatenate(
                    [m["dst"].to_numpy(), own["key"].to_numpy()]),
                "contrib": np.concatenate(
                    [m["contrib"].to_numpy(dtype=np.int64),
                     np.zeros(len(own), dtype=np.int64)]),
                "deg": np.concatenate(
                    [np.zeros(len(m), dtype=np.int64),
                     own["deg"].to_numpy(dtype=np.int64)]),
            })
            # partial combine (hot-node safety): a hub with in-degree D
            # would otherwise ship D message rows into one exchange-2
            # partition; summing per node HERE bounds its rows at
            # num_partitions (one per source partition) — the same
            # combiner-then-shuffle shape as kg_degrees
            return (
                frame.groupby("node", sort=False)
                .agg(contrib=("contrib", "sum"), deg=("deg", "max"))
                .reset_index()
            )

        msgs = exchange.partitioned_apply(
            rank_rows.union(edge_rows), ["key"], emit, num_partitions
        )

        # exchange 2: reduce contributions per destination; the carrier
        # row restores deg.  Every graph node has >=1 in-edge (edges are
        # symmetric), so no node drops out of the table.
        def reduce_(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("node", sort=False).agg(
                insum=("contrib", "sum"), deg=("deg", "max"))
            # a message recipient with no carrier has deg 0: no
            # out-edges, cannot forward mass next round — drop it now
            # (documented contract; also prevents rank // 0 upstream)
            agg = agg[agg["deg"] > 0]
            agg["rank"] = ((15 * base) // 100
                           + (85 * agg["insum"].to_numpy(dtype=np.int64)) // 100)
            return agg.reset_index()[["node", "deg", "rank"]]

        ranks = exchange.partitioned_apply(
            msgs, ["node"], reduce_, num_partitions
        ).materialize()

    return ranks.map_batches(
        lambda b: b[["node", "rank"]], batch_format="pandas"
    )


def kg_pagerank_pinned(
    sf_dir: str, iterations: int = 5, num_partitions: int = 32
) -> rd.Dataset:
    """`kg_pagerank` on the pinned-partition (Pregel-actor) engine —
    bit-identical ranks (tests/test_graph.py parity suite), edges
    shuffled once instead of once per iteration."""
    return pagerank_from_edges_pinned(
        _cooc_edges(sf_dir, num_partitions), iterations, num_partitions
    )


def _owner_partition(nodes: pd.Series, p: int) -> np.ndarray:
    """Process-stable owner partition per node — the SAME string hash the
    exchange uses (`exchange.add_partition_column` string path), so the
    two PageRank engines partition identically."""
    h = pd.util.hash_pandas_object(nodes.astype(str), index=False).to_numpy()
    return (h % np.uint64(p)).astype("int64")


def pagerank_from_edges_pinned(
    edge_ds: rd.Dataset,
    iterations: int = 5,
    num_partitions: int = 32,
    rows_per_partition: int = 65536,
) -> rd.Dataset:
    """Pregel-style PINNED-PARTITION PageRank: bit-identical output to
    ``pagerank_from_edges`` (same int64 recurrence), different
    distribution shape.

    The exchange engine re-shuffles the FULL edge list every iteration
    (2 exchanges x `iterations`); at 100 TB the edge volume dominates,
    so this variant partitions edges by ``hash(src)`` ONCE (a single
    exchange pass writing one parquet per partition — at cluster scale,
    shared storage), loads each partition into a long-lived Ray ACTOR,
    and iterates by shipping only per-destination AGGREGATED
    contributions between actors (``num_returns=P`` routes each payload
    to exactly one peer — nothing else crosses the wire).  This is the
    documented raw-actor escape hatch: the Dataset API cannot pin a
    partitioning across iterations, a stateful shard can.

    Partitioning assumption (document per the custom-operator contract):
    node ownership is ``hash(node) % P`` with the exchange's own string
    hash, srcs are complete within their owner (so local out-degrees are
    global), and message payloads are per-(owner, dst) pre-summed int64
    — commutative, so arrival order cannot change a bit.  The final
    (node, rank) table is collected once (bounded by entity-vocabulary
    size, same bound the exchange engine materializes every round)."""
    import shutil
    import tempfile

    edges = edge_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=str),
            "rank": pd.Series([], dtype="int64"),
        }))
    import ray

    rpp = max(1, int(rows_per_partition))
    p = max(1, min(num_partitions, (n_edges + rpp - 1) // rpp))
    # each shard is a 1-CPU pinned actor; more shards than cluster CPUs
    # would leave actors unschedulable and DEADLOCK the iteration loop
    # (ray.get on a message from an actor that never starts)
    p = max(1, min(p, int(ray.cluster_resources().get("CPU", 1))))

    # one-time exchange: co-locate edges by owner(src), one parquet each.
    # part_dir cleanup must cover the exchange itself (a failed shuffle
    # would otherwise leak a partially-populated /tmp dir), so the
    # try/finally starts immediately after mkdtemp.
    part_dir = tempfile.mkdtemp(prefix="onto_ray_pregel_", dir="/tmp")
    try:
        return _pagerank_pinned_run(edges, iterations, p, part_dir)
    finally:
        shutil.rmtree(part_dir, ignore_errors=True)


def _pagerank_pinned_run(
    edges: rd.Dataset, iterations: int, p: int, part_dir: str
) -> rd.Dataset:
    import os

    import ray

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        # the groupby key IS the partition id — pass it through instead
        # of re-hashing the first src (keeps one hash invocation, one
        # source of truth)
        pid = int(g["_owner"].iloc[0])
        g[["src", "dst"]].to_parquet(
            os.path.join(part_dir, f"part-{pid:05d}.parquet"), index=False
        )
        return pd.DataFrame({"pid": np.array([pid], dtype=np.int64),
                             "n_src": np.array([g["src"].nunique()], np.int64)})

    tagged = edges.map_batches(
        lambda b: b.assign(_owner=_owner_partition(b["src"], p)),
        batch_format="pandas",
    )
    counts = (tagged.groupby("_owner")
              .map_groups(write_part, batch_format="pandas")
              .to_pandas())
    n = int(counts["n_src"].sum())
    base = TOTAL_MASS // n

    @ray.remote(num_cpus=1)
    class _Shard:
        """One pinned graph partition: its srcs' edges + owned ranks."""

        def __init__(self, path: str, pid: int, nparts: int, base_: int):
            self.pid = pid
            self.p = nparts
            if os.path.exists(path):
                e = pd.read_parquet(path)
            else:                       # owner got no edges (hash gap)
                e = pd.DataFrame({"src": pd.Series([], dtype=str),
                                  "dst": pd.Series([], dtype=str)})
            e = e.sort_values(["src", "dst"], ignore_index=True)
            self.src = e["src"].to_numpy()
            self.dst = e["dst"].to_numpy()
            self.dst_owner = _owner_partition(e["dst"], nparts)
            deg = e.groupby("src", sort=True).size()
            self.nodes = deg.index.to_numpy()            # sorted, owned
            self.deg = deg.to_numpy(dtype=np.int64)
            self.rank = np.full(len(deg), base_, dtype=np.int64)
            # src row -> owned-node index, for the contribution gather
            self.src_idx = np.searchsorted(self.nodes, self.src)

        def messages(self):
            """Per-destination pre-summed contributions, split by owner.
            Returns a list of (dst_nodes, contrib_sums) — slot j goes to
            actor j and ONLY actor j (num_returns routing)."""
            contrib = (self.rank // self.deg)[self.src_idx]
            out = []
            for j in range(self.p):
                m = self.dst_owner == j
                if not m.any():
                    out.append((np.array([], dtype=self.dst.dtype),
                                np.array([], dtype=np.int64)))
                    continue
                f = pd.DataFrame({"dst": self.dst[m], "c": contrib[m]})
                g = f.groupby("dst", sort=True)["c"].sum()
                out.append((g.index.to_numpy(),
                            g.to_numpy(dtype=np.int64)))
            return out if self.p > 1 else out[0]

        def apply(self, base_: int, *payloads):
            """Sum arrived contributions into owned ranks (int64 adds —
            arrival order immaterial)."""
            insum = np.zeros(len(self.nodes), dtype=np.int64)
            for nodes, sums in payloads:
                # an edge-less shard (hash gap) owns no nodes; every
                # arriving message is to a non-owned node — drop them
                # (indexing the empty self.nodes would raise otherwise)
                if len(nodes) == 0 or len(self.nodes) == 0:
                    continue
                idx = np.searchsorted(self.nodes, nodes)
                # messages to non-owned/deg-0 nodes are dropped (same
                # contract as the exchange engine's reduce_)
                ok = (idx < len(self.nodes)) & (self.nodes[np.minimum(
                    idx, len(self.nodes) - 1)] == nodes)
                np.add.at(insum, idx[ok], sums[ok])
            self.rank = ((15 * base_) // 100
                         + (85 * insum) // 100).astype(np.int64)

        def result(self) -> pd.DataFrame:
            return pd.DataFrame({"node": self.nodes, "rank": self.rank})

    actors = [
        _Shard.remote(os.path.join(part_dir, f"part-{j:05d}.parquet"),
                      j, p, base)
        for j in range(p)
    ]
    try:
        for _round in range(iterations):
            if p == 1:
                ray.get(actors[0].apply.remote(
                    base, actors[0].messages.remote()))
                continue
            outs = [a.messages.options(num_returns=p).remote()
                    for a in actors]
            ray.get([
                actors[j].apply.remote(base, *[outs[i][j] for i in range(p)])
                for j in range(p)
            ])
        frames = ray.get([a.result.remote() for a in actors])
    finally:
        for a in actors:
            ray.kill(a)
    return rd.from_pandas(pd.concat(frames, ignore_index=True))


def adamic_adar_from_pairs(
    pairs: rd.Dataset,
    num_partitions: int = 32,
    max_center_degree: int = 10_000,
) -> rd.Dataset:
    """(a, b, common_neighbors, aa_micro) link-prediction scores over an
    undirected simple edge list (a, b) with a < b.

    Adamic-Adar (Adamic & Adar 2003): for a node pair (a, b), the score
    is ``sum over common neighbors w of 1 / ln(deg(w))`` — shared rare
    neighbors are stronger evidence of a link than shared hubs.  Scores
    are integer micro-units, quantized PER WEDGE as
    ``floor(1e6 / ln(deg_w))`` before summation (the lm_perplexity
    convention) so the int64 sum is order-independent under any
    partitioning and bit-exactly SQL-recomputable.

    Shape: one degree aggregation, one degree-attach ``hash_join``, one
    center-keyed exchange whose per-partition kernel self-merges each
    center's neighbor list into wedges and PRE-AGGREGATES them per pair
    (the combiner — wedge rows leave the partition already summed), and
    one final pair-keyed exchange.  A center of degree d yields d^2/2
    wedges, so unlike the triangle count (which orients edges to bound
    wedge work at O(m^1.5)) the exact all-pairs common-neighbor table is
    inherently quadratic in hub degree; ``max_center_degree`` is the
    stop-node cap (the substring dedup's max_df convention): centers
    above it are skipped, which for AA is also the standard
    approximation — a 10k-degree hub contributes at most
    1/ln(10^4) ~= 0.11 per pair.  The cap is mirrored verbatim in the
    SQL oracle.  Emits one row per pair with >= 1 common neighbor
    (every pair, not only existing edges — the non-edge rows ARE the
    link predictions); callers wanting scores for existing edges join
    this against the edge list (composite.entity_link_scores).
    """
    pairs = pairs.materialize()  # consumed by the neighbor + degree passes

    def both(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "w": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
            "u": np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]),
        })

    nb = pairs.map_batches(both, batch_format="pandas")
    deg_partial = nb.map_batches(
        lambda b: b.groupby("w", sort=False).size().reset_index(name="d"),
        batch_format="pandas",
    )
    deg = exchange.grouped_agg(
        deg_partial, ["w"], lambda gb: gb.agg(d=("d", "sum")),
        num_partitions,
    )
    nbd = exchange.hash_join(
        pairs.map_batches(both, batch_format="pandas"),
        deg.map_batches(
            lambda b: b[b["d"] <= max_center_degree], batch_format="pandas"
        ),
        "w", "w",
        {"w": "object", "u": "object"}, {"w": "object", "d": "int64"},
        num_partitions=num_partitions,
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g[["w", "u"]], on="w", suffixes=("", "_y"))
        m = m[m["u"] < m["u_y"]]
        s = np.floor(1e6 / np.log(m["d"].to_numpy(np.float64))).astype(np.int64)
        out = pd.DataFrame({"a": m["u"].to_numpy(), "b": m["u_y"].to_numpy(),
                            "cn": np.int64(1), "s": s})
        return (out.groupby(["a", "b"], sort=False)
                   .agg(cn=("cn", "sum"), s=("s", "sum")).reset_index())

    wedge_ds = exchange.partitioned_apply(nbd, ["w"], wedges, num_partitions)
    return exchange.grouped_agg(
        wedge_ds, ["a", "b"],
        lambda gb: gb.agg(common_neighbors=("cn", "sum"),
                          aa_micro=("s", "sum")),
        num_partitions,
    )


def kg_link_prediction(sf_dir: str, num_partitions: int = 32) -> rd.Dataset:
    """Adamic-Adar link prediction over the entity co-occurrence graph —
    the "which entities SHOULD co-occur" probe an ontology pipeline runs
    to propose missing KG edges.  Emits every pair with >= 1 common
    neighbor (existing edges and predicted ones); the driver composite
    (composite.entity_link_scores) restricts to existing pairs."""
    pairs = entity_cooccurrence(sf_dir, num_partitions)
    return adamic_adar_from_pairs(
        pairs.select_columns(["a", "b"]), num_partitions)


# --------------------------------------------------------------------------
# k-core decomposition (per-node coreness)
# --------------------------------------------------------------------------

def kcore_from_edges(edges: rd.Dataset, num_partitions: int = 32,
                     max_rounds: int = 64) -> rd.Dataset:
    """(node, core): per-node coreness over a symmetric (src, dst) edge
    list, via the distributed H-index iteration (Lü et al. 2016: with
    ``c0(v) = deg(v)`` and ``c_{t+1}(v) = H(c_t(u) : u ~ v)``, the
    sequence is monotonically non-increasing and converges exactly to
    the core number).  The H-index of a multiset is order-independent,
    so every round is bit-stable under any partitioning.

    Distribution per round (the PageRank loop shape): exchange 1
    co-locates each node's current ``c`` with its out-edges and ships
    (dst, c) messages, PRE-COMBINED per batch into (node, c, cnt)
    HISTOGRAM rows — a hub's million identical-valued messages compress
    to one row per distinct value per source partition, so no partition
    ever materializes a hub's raw in-neighborhood; exchange 2 reduces
    the per-node histogram: sorted by value desc, ``H = max(min(c,
    cumulative_cnt))``.  Convergence is a per-round driver scalar (the
    summed change flag over the bounded node table); rounds are
    data-dependent but bounded by ``max_rounds`` (real graphs converge
    in a handful — the bound is a backstop, and hitting it raises
    rather than silently returning a non-coreness).
    """
    edges = edges.materialize()
    n_edges = edges.count()
    num_partitions = max(1, min(num_partitions, (n_edges + 65535) // 65536))

    state = exchange.grouped_agg(
        edges, ["src"],
        lambda gb: gb.agg(c=("dst", "size")),
        num_partitions,
    ).map_batches(
        lambda b: pd.DataFrame({"node": b["src"].astype(str),
                                "c": b["c"].astype("int64")}),
        batch_format="pandas",
    ).materialize()
    if state.count() == 0:
        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype=str),
            "core": pd.Series([], dtype="int64")}))

    for _round in range(max_rounds):
        own = state.map_batches(
            lambda b: pd.DataFrame({
                "key": b["node"].astype(str), "dst": "",
                "c": b["c"].astype("int64"), "carrier": np.int64(1)}),
            batch_format="pandas")
        ed = edges.map_batches(
            lambda b: pd.DataFrame({
                "key": b["src"].astype(str), "dst": b["dst"].astype(str),
                "c": np.int64(0), "carrier": np.int64(0)}),
            batch_format="pandas")

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            own_rows = g.loc[g["carrier"] == 1, ["key", "c"]]
            edge_rows = g.loc[g["carrier"] == 0, ["key", "dst"]]
            m = edge_rows.merge(own_rows, on="key", how="inner")
            # histogram combine: (dst, c) -> cnt, plus the old-value
            # carrier (cnt = -1 marks it; message counts are >= 1)
            hist = (m.groupby(["dst", "c"], sort=False).size()
                     .rename("cnt").reset_index()
                     .rename(columns={"dst": "node"}))
            hist["cnt"] = hist["cnt"].astype("int64")
            carrier = pd.DataFrame({
                "node": own_rows["key"].to_numpy(),
                "c": own_rows["c"].to_numpy(dtype=np.int64),
                "cnt": np.int64(-1)})
            return pd.concat([hist, carrier], ignore_index=True)

        msgs = exchange.partitioned_apply(
            own.union(ed), ["key"], emit, num_partitions)

        def reduce_(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"node": pd.Series(dtype=object),
                                  "c": pd.Series(dtype="int64"),
                                  "changed": pd.Series(dtype="int64")})
            if not len(g):
                return empty
            old = g.loc[g["cnt"] == -1, ["node", "c"]].rename(
                columns={"c": "old_c"})
            h = g.loc[g["cnt"] > 0].copy()
            if not len(h):
                return empty
            # merge duplicate (node, c) histogram rows across source
            # partitions, then the desc-cumulative H-index rule
            h = (h.groupby(["node", "c"], sort=False)
                  .agg(cnt=("cnt", "sum")).reset_index())
            h = h.sort_values(["node", "c"],
                              ascending=[True, False], kind="mergesort")
            codes, _ = pd.factorize(h["node"], sort=False)
            cnt = h["cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(cnt)
            first = np.zeros(len(h), dtype=np.int64)
            starts = np.flatnonzero(np.diff(codes, prepend=-1))
            first[starts] = np.concatenate(([0], cum[starts[1:] - 1])) \
                if len(starts) > 1 else 0
            base = np.maximum.accumulate(first)
            within = cum - base
            cand = np.minimum(h["c"].to_numpy(dtype=np.int64), within)
            hw = pd.DataFrame({"node": h["node"].to_numpy(), "cand": cand})
            hv = (hw.groupby("node", sort=False)
                    .agg(c=("cand", "max")).reset_index())
            out = hv.merge(old, on="node", how="inner")
            out["changed"] = (out["c"] != out["old_c"]).astype("int64")
            return out[["node", "c", "changed"]]

        state = exchange.partitioned_apply(
            msgs, ["node"], reduce_, num_partitions).materialize()
        if int(state.sum("changed") or 0) == 0:
            break
    else:
        raise RuntimeError(
            f"k-core H-index iteration did not converge in {max_rounds} "
            "rounds — raise max_rounds")

    return state.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype(str),
                                "core": b["c"].astype("int64")}),
        batch_format="pandas")


def kg_kcore(sf_dir: str, num_partitions: int = 32,
             trips: rd.Dataset | None = None) -> rd.Dataset:
    """Coreness over the entity co-occurrence graph — the KG-curation
    density signal (a high-core entity sits in a densely interlinked
    mention community; core 1 = peripheral)."""
    pairs = entity_cooccurrence(sf_dir, num_partitions, trips=trips)

    def both(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
            "dst": np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]),
        })

    return kcore_from_edges(pairs.map_batches(both, batch_format="pandas"),
                            num_partitions)


# --------------------------------------------------------------------------
# Connected components over string-keyed edges (ontology-merge clusters)
# --------------------------------------------------------------------------

def min_label_components(edges: rd.Dataset, num_partitions: int = 32,
                         max_rounds: int = 50,
                         driver_edges_max: int = 4_000_000) -> rd.Dataset:
    """(node, cluster): connected components over a symmetric string
    (src, dst) edge list, cluster = the LEXICOGRAPHIC MIN node of the
    component — the canonical-representative rule, SQL-recomputable by a
    recursive reachability CTE.

    The string-keyed sibling of ``stages.dedup.near_dup_clusters``
    (int64 doc ids), with the same two tiers: below ``driver_edges_max``
    the materialized edge table is read once and solved with a
    path-compressed union-find (labels = per-root min string); above it,
    iterative min-label propagation through the exchange, two exchanges
    per round, messages PRE-COMBINED to one (dst, min_label) row per
    destination per partition so hub nodes never collect raw
    in-neighborhoods.  Both tiers produce the identical fixpoint
    (tested by forcing the gate)."""
    edges = edges.materialize()
    if edges.count() <= driver_edges_max:
        ef = edges.to_pandas()
        if not len(ef):
            return rd.from_pandas(pd.DataFrame({
                "node": pd.Series(dtype=object),
                "cluster": pd.Series(dtype=object)}))
        codes, uniq = pd.factorize(
            pd.concat([ef["src"], ef["dst"]], ignore_index=True))
        n = len(uniq)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        a, b = codes[: len(ef)], codes[len(ef):]
        for x, y in zip(a, b):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[ry] = rx
        roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64,
                            count=n)
        lab = pd.DataFrame({"node": np.asarray(uniq, dtype=object),
                            "root": roots})
        rep = (lab.groupby("root", sort=False)["node"].min()
                  .rename("cluster").reset_index())
        out = lab.merge(rep, on="root")[["node", "cluster"]]
        return rd.from_pandas(out.sort_values("node", ignore_index=True))

    def self_labels(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(pd.concat([b["src"], b["dst"]], ignore_index=True))
        return pd.DataFrame({"node": ids, "label": ids,
                             "changed": np.zeros(len(ids), dtype=np.int64)})

    labels = exchange.distinct(
        edges.map_batches(self_labels, batch_format="pandas"),
        ["node"], num_partitions).materialize()

    for _round in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda b: pd.DataFrame({
                "key": b["node"].astype(str), "dst": "",
                "label": b["label"].astype(str),
                "carrier": np.int64(1)}),
            batch_format="pandas")
        edge_rows = edges.map_batches(
            lambda b: pd.DataFrame({
                "key": b["src"].astype(str), "dst": b["dst"].astype(str),
                "label": "", "carrier": np.int64(0)}),
            batch_format="pandas")

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["carrier"] == 1, ["key", "label"]]
            ed = g.loc[g["carrier"] == 0, ["key", "dst"]]
            m = ed.merge(lab, on="key", how="inner")
            # pre-combine per destination (hub safety)
            cand = (m.groupby("dst", sort=False)["label"].min()
                     .reset_index().rename(columns={"dst": "node"}))
            cand["own"] = np.int64(0)
            own = pd.DataFrame({"node": lab["key"].to_numpy(),
                                "label": lab["label"].to_numpy(),
                                "own": np.int64(1)})
            return pd.concat([cand, own], ignore_index=True)

        msgs = exchange.partitioned_apply(
            lab_rows.union(edge_rows), ["key"], emit, num_partitions)

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            mins = g.groupby("node", sort=False)["label"].min()
            own = g[g["own"] == 1].set_index("node")["label"]
            out = pd.DataFrame({"node": mins.index.to_numpy(),
                                "label": mins.to_numpy()})
            out["changed"] = (
                out["label"].to_numpy()
                < own.reindex(out["node"]).to_numpy()
            ).astype("int64")
            return out

        new_labels = exchange.partitioned_apply(
            msgs, ["node"], reduce_min, num_partitions).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels
        if not changed:
            break

    return labels.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype(str),
                                "cluster": b["label"].astype(str)}),
        batch_format="pandas")


def xref_entity_clusters(sf_dir: str, num_partitions: int = 32,
                         trips: rd.Dataset | None = None,
                         driver_edges_max: int = 4_000_000) -> rd.Dataset:
    """(node, cluster): canonical entity clusters over the xref graph —
    entities and their cross-vocabulary alias ids merged into one
    component per real-world entity, labeled by the lexicographic min
    id.  THE ontology-merge step: the distributed generalization of the
    reference's pairwise xref-priority dedup cascade
    (`/root/reference/ontology_matcher/dedup.py`) to transitive
    cross-database identity."""
    from ontology_matcher_ray.pipelines.docs_kg import entity_xref_triples

    xr = entity_xref_triples(sf_dir) if trips is None else trips

    def both(b: pd.DataFrame) -> pd.DataFrame:
        s = b["subj"].astype(str).to_numpy()
        o = b["obj"].astype(str).to_numpy()
        return pd.DataFrame({"src": np.concatenate([s, o]),
                             "dst": np.concatenate([o, s])})

    return min_label_components(
        xr.map_batches(both, batch_format="pandas"),
        num_partitions, driver_edges_max=driver_edges_max)

"""Distributed connected components — the clustering stage of near-dup
deduplication (pairs -> clusters -> canonical doc election).

The reference has no graph operators (it is a raster library); this is
part of the LLM-training-data-pipeline tier the task mandates: LSH
near-dup joins (textops D2-D4, vectors V1-V4) emit PAIRS, but dedup
needs per-document CLUSTER ids so exactly one canonical survives per
duplicate group.

Algorithm: iterative min-label propagation over the undirected pair
graph.  Each round is one shuffle (groupBy-min over the symmetric edge
list joined to current labels); a round strictly lowers labels, and the
fixpoint assigns every vertex the minimum vertex id reachable from it
(= a deterministic component id).  Rounds needed = graph diameter.

Scale posture (10^12 rows): near-dup clusters produced by
verified-LSH are DENSE (a duplicate group is close to a clique — every
member pairs with most others), so diameters are tiny (2-4) and this
converges in a handful of shuffles over an edge list that is itself
bounded by the LSH band fan-out.  The pathological case — long chains,
e.g. transitive drift across a similarity threshold — is bounded by
``max_iter``; for adversarial graphs swap the round body for the
alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — PAPERS.md),
which the per-round join shape here already accommodates.

The per-round convergence check is a driver-side aggregate (one scalar
per round, no data collected) — acceptable: it gates loop exit exactly
like knn.py's frontier census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pin(df: DataFrame) -> DataFrame:
    """Truncate lineage AND reset the size estimate for an iterative
    round: localCheckpoint alone is NOT enough, because the LogicalRDD
    it produces carries over the SOURCE plan's estimated sizeInBytes —
    and join-size estimates are multiplicative, so round r's checkpoint
    inherits a product of products: by round 4 the estimate is a
    ~10^5-digit BigInteger and Catalyst's SizeInBytesOnlyStatsPlanVisitor
    spends tens of seconds PER ROUND in Karatsuba multiplication (jstack
    verified: 45 s of planning on a 2-component, 1.5k-edge graph).
    Caching on top of the checkpoint and materializing replaces that
    estimate with the EXACT in-memory size, so every round plans
    against real (tiny) numbers and join strategies stay sane.

    The cached blocks are round-sized (component labels / frontier
    edges — KBs to MBs), but a long one-session suite (the 545-query
    gate) runs HUNDREDS of iterative ops: without a bound the pinned
    caches accumulate for the whole session and squeeze the box (a
    545-query gate run OOM'd the sibling DuckDB process after ~400
    queries).  A FIFO registry keeps the most recent _PIN_CAP pins
    live and unpersists older ones — their localCheckpoint blocks
    still hold the data, so correctness and lineage are untouched;
    only the (no-longer-replanned) stats reset is dropped."""
    out = _pin_lazy(df)
    out.count()
    return out


_PINNED: list[DataFrame] = []
_PIN_CAP = 48


def _pin_lazy(df: DataFrame) -> DataFrame:
    """checkpoint+cache+register without forcing materialization — for
    loop frames whose first action is the convergence witness."""
    out = df.localCheckpoint(eager=False).cache()
    _PINNED.append(out)
    while len(_PINNED) > _PIN_CAP:
        try:
            _PINNED.pop(0).unpersist()
        except Exception:
            pass
    return out


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) with component = min vertex id in the
    connected component.  Vertices with no incident edge keep their own
    id.  Deterministic for any input order (min is order-free)."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    sym.persist()
    # localCheckpoint (not persist) on the per-round label frame: persist
    # caches DATA but the logical plan still nests one round deeper per
    # iteration, and AQE re-renders the whole tree per action — O(rounds²)
    # single-threaded driver time that dwarfs the actual shuffles on
    # multi-round (chain-like) graphs.  Checkpointing truncates lineage to
    # a LogicalRDD so every round's plan is one-round deep, constant size.
    labels = vertices.select(
        F.col(vertex_col).alias("vid"), F.col(vertex_col).alias("label")
    ).transform(_pin)
    try:
        # labels only ever DECREASE, so for numeric ids sum(label) is a
        # strictly decreasing convergence witness — one scalar aggregate
        # per round instead of a changed-rows join+count.  decimal(38,0):
        # 10^12 vertices x 64-bit ids overflows a BIGINT sum.  For
        # non-numeric ids fall back to counting distinct labels (also
        # monotone: merges only ever reduce the label set).
        numeric = dict(labels.dtypes)["label"] not in ("string", "binary")

        def _sum(df: DataFrame):
            return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

        prev_sum = _sum(labels) if numeric else None
        for _ in range(max_iter):
            # neighbor-min pass: each vertex pulls the smallest label in
            # its closed neighborhood (one shuffle: groupBy(v).min)
            neigh = (
                sym.join(labels, sym["u"] == labels["vid"])
                .groupBy(F.col("v").alias("vid"))
                .agg(F.min("label").alias("nlabel"))
            )
            new = (
                labels.join(neigh, "vid", "left")
                .select(
                    "vid",
                    F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                        "label"
                    ),
                )
                # lazy ckpt+cache; the witness sum below materializes it
                .transform(_pin_lazy)
            )
            if numeric:
                new_sum = _sum(new)
                converged = new_sum == prev_sum
                prev_sum = new_sum
            else:
                # exact changed-rows check (sound for any id type; the
                # distinct-label count is NOT a valid witness — a label
                # can move between vertices without leaving the set)
                converged = (
                    new.alias("n")
                    .join(labels.alias("o"), "vid")
                    .where(F.col("n.label") != F.col("o.label"))
                    .count()
                ) == 0
            labels = new
            if converged:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                "(long-chain graph? switch to large-star/small-star)"
            )
        return labels.select(
            F.col("vid").alias(vertex_col), F.col("label").alias("component")
        )
    finally:
        sym.unpersist()


def canonical_docs(components: DataFrame, vertex_col: str = "doc_id") -> DataFrame:
    """Dedup election: the canonical survivor of each cluster is the
    minimum doc id — which IS the component id, so this is a map-only
    flag, no extra shuffle."""
    return components.withColumn(
        "is_canonical", (F.col(vertex_col) == F.col("component")).cast("boolean")
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damp_pct: int = 85,
) -> DataFrame:
    """Damped PageRank with ALL-INTEGER arithmetic — the iterative graph
    algorithm of the pipeline tier (link/influence analysis over the
    near-dup, citation, or interaction graph).

    ``edges`` is a directed (src:long, dst:long) list in which every
    node occurs at least once as a src (symmetrize first for undirected
    graphs — that also removes dangling-node mass loss).  Per iteration:

        contrib(u->v) = rank(u) div outdeg(u)           (int64)
        rank'(v)      = (100-damp_pct)*scale div 100
                        + (damp_pct * sum(contrib)) div 100

    Integer division and int64 sums make every iteration
    order-independent, so the fixpoint trajectory is bit-identical on
    any partitioning and any engine — floating-point PageRank cannot
    cross-check this way (shuffle order perturbs the sums).

    Plan shape: the (edges ⋈ outdeg) relation is localCheckpoint'ed ONCE
    and re-probed each iteration; each round is one equi-join on src
    (the rank side is nodes-sized — broadcastable when nodes ≪ edges)
    plus one partial+final agg on dst, and each rank frame is
    localCheckpoint'ed so the lineage stays one round deep (the
    cell_rollup lesson: lazy DAGs duplicate upstream work into every
    consumer).  At 10^12 edges the per-round cost is the two shuffles
    any synchronous PageRank round needs; convergence-free fixed
    ``iters`` keeps the job a static DAG."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(deg, "src").transform(_pin)
    base = int((100 - damp_pct) * scale // 100)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(int(scale)).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = e.join(ranks, e["src"] == ranks["node"]).select(
            F.col("dst"), F.expr("rank div deg").alias("c")
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("insum"))
            .select(
                "node",
                (F.lit(base) + F.expr(f"({damp_pct} * insum) div 100"))
                .cast("long")
                .alias("rank"),
            )
            .transform(_pin)
        )
    return ranks


def bfs_min_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 4
) -> DataFrame:
    """Distributed BFS: minimum hop distance (0..max_hops) from a seed
    set over a directed edge list (src:long, dst:long) — the
    multi-hop-reachability primitive stock SQL engines express with
    WITH RECURSIVE (the DuckDB oracle does exactly that) and Spark
    expresses as an iterative frontier loop.

    Frontier algorithm: visited holds (node, d); each round the
    frontier joins edges, anti-joins visited (so a node keeps its FIRST
    = minimum distance), and both sets advance.  `localCheckpoint`
    truncates lineage per round — same policy as pagerank_int/
    connected_components.  max_hops bounds rounds, so termination does
    not depend on data.

    Scale shape: per round one src-keyed equi-join + one node-keyed
    anti-join; at 10^12 edges both are co-partitioned shuffles on the
    same keys; frontiers shrink geometrically on expander-ish graphs."""
    frontier = seeds.select(F.col("node").cast("long").alias("node")).distinct()
    visited = frontier.withColumn("d", F.lit(0))
    frontier = frontier.transform(_pin)
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .transform(_pin)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt.withColumn("d", F.lit(d)))
        frontier = nxt
    return visited


def forest_contract(edges: DataFrame, n_parts: int = 8) -> DataFrame:
    """Local-contraction pre-pass for two-level distributed CC (the
    shard-then-merge scheme of Rastogi et al. ICDE'13 / every MPC CC
    paper's "local phase"): hash-partition the edge list, run an exact
    union-find INSIDE each partition (Arrow-batched via mapInPandas —
    a per-shard batch loop, not per-row SQL Python), and emit each
    shard's spanning structure as star edges (node -> shard-local min
    of its local component).

    Connectivity is preserved exactly: every input edge (u,v) lands in
    some shard whose forest connects u and v, so the union of shard
    forests has the same components as the input.  Output size is at
    most one edge per (node, shard) — and each shard-component is
    already a STAR, so the global star-contraction loop that follows
    converges in 1-3 round pairs instead of O(log n).

    At 10^12 scale this is the standard shape: each executor contracts
    its shard in memory (shard size is bounded by the partition count
    you choose), and only the quotient graph enters the iterative
    global phase."""
    sym = edges.select(
        F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v")
    )

    def _uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
                u = int(u)
                v = int(v)
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
        if parent:
            nodes = list(parent)
            roots = [find(x) for x in nodes]
            yield pd.DataFrame({"u": nodes, "v": roots})

    # RANGE partitioning, not hash: a hash shard of a chain-like graph
    # holds scattered singleton edges (nothing to contract); contiguous
    # id ranges keep locally-connected structure together, so each
    # shard's union-find actually collapses it (pinned by
    # tests/test_graph_rounds.py::test_star_cc_pre_contract_cuts_rounds).
    return (
        sym.repartitionByRange(n_parts, "u", "v")
        .mapInPandas(_uf, "u long, v long")
        .where(F.col("u") != F.col("v"))
    )


# round count of the most recent connected_components_star run — the
# O(log n) convergence claim is PINNED by tests/test_graph_rounds.py
# against adversarial (long-chain) topologies via this census.
last_star_rounds: int = 0


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame,
    vertex_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iter: int = 25,
    pre_contract: int | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — PAPERS.md): the adversarial-graph-safe sibling of
    ``connected_components``.  Min-label propagation needs diameter
    rounds (a 10^6-long chain = 10^6 shuffles); star contraction halves
    component "height" per round pair, converging in O(log n) rounds on
    ANY topology — the production choice when the near-dup graph is not
    guaranteed clique-like.

    Per round (2 shuffles, both combiner-friendly groupBy-min):
      large-star: group the symmetric edge list by u, m = min(Γ(u)∪{u});
                  re-point every LARGER neighbor v>u at m.
      small-star: orient edges max->min, group by the max endpoint u,
                  m = min(Γ⁻(u)∪{u}); re-point u and all its smaller
                  neighbors at m.
    Both operations preserve connectivity (edges only re-point within a
    component) and monotonically flatten each component toward a star
    rooted at its minimum id.  Fixpoint: the small-star edge set is
    stable; then every node's component = min(neighbors ∪ self).

    Same contract as ``connected_components``: (vertex, component) with
    component = min reachable vertex id, isolated vertices keep their
    own id, deterministic on any partitioning.  The convergence witness
    is Σ(u+v) over the oriented edge set — strictly decreasing while any
    re-pointing happens (every re-point replaces an endpoint by a
    strictly smaller label), one scalar aggregate per round."""
    ecur = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    )
    if pre_contract:
        ecur = forest_contract(ecur, n_parts=pre_contract).select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    # lazy checkpoint + cache with the witness aggregate as the
    # materializing action: one job per round pins lineage, resets the
    # size stats (see _pin) AND measures convergence.
    ecur = _pin_lazy(ecur.distinct())

    def _witness(e: DataFrame):
        return e.agg(
            F.count(F.lit(1)),
            F.sum(F.col("u").cast("decimal(38,0)") + F.col("v").cast("decimal(38,0)")),
        ).first()

    prev = _witness(ecur)
    global last_star_rounds
    last_star_rounds = 0
    for _round in range(max_iter):
        last_star_rounds = _round + 1
        sym = ecur.union(ecur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: m(u) = min over closed neighborhood; (v, m) for v > u
        lmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star on the max->min orientation: (v, m) for v in Γ⁻(u)∪{u}
        ori = large.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        smin = ori.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            ori.join(smin, "u")
            .select(
                F.explode(F.array(F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                                  F.struct(F.col("u").alias("a"), F.col("m").alias("b")))).alias("e")
            )
            .select(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
            .where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .transform(_pin_lazy)
        )
        cur = _witness(small)
        # witness equality is necessary-not-sufficient; confirm the
        # suspected fixpoint with ONE exact multiset-diff (runs ~once)
        stable = cur == prev and small.exceptAll(ecur).count() == 0
        ecur = small
        prev = cur
        if stable:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )

    verts = vertices.select(F.col(vertex_col).alias("vid"))
    nmin = (
        ecur.union(ecur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("nm"))
    )
    return verts.join(nmin, verts["vid"] == nmin["u"], "left").select(
        F.col("vid").alias(vertex_col),
        F.least(F.col("vid"), F.coalesce("nm", F.col("vid"))).alias("component"),
    )


def triangle_census(edges: DataFrame) -> DataFrame:
    """Exact distributed triangle counting with degree-ordered wedge
    enumeration (Suri & Vassilvitskii, "Counting Triangles and the Curse
    of the Last Reducer", WWW'11 — the MPC-standard algorithm; networkx
    ``triangles`` / Spark GraphX ``triangleCount`` analog).

    ``edges`` is an undirected simple edge list (u:long, v:long); rows
    are deduped and self-loops dropped here, so callers may pass raw
    co-occurrence pairs.

    Orientation: every edge points from its lower-(degree, id) endpoint
    to the higher one.  Each wedge (a->b, a->c) is then generated ONCE,
    at its lowest-degree apex a, and closed by probing the oriented edge
    (b, c).  This caps per-key fan-out at O(sqrt(m)) wedges for any
    degree distribution — the whole point: a hot vertex of degree d no
    longer contributes d^2 wedges, because high-degree endpoints never
    serve as apex.

    Returns ONE global census row: n_nodes, n_edges, n_triangles,
    n_wedges (open paths of length 2 = sum C(deg, 2)), max_degree, and
    an integer transitivity in parts-per-million (3*tri*1e6 // wedges).

    Scale shape: two shuffles on vertex keys (degree agg + orientation
    join), one wedge self-join shuffled on the apex, one semi-join probe
    of wedges against oriented edges, then a partial+final global agg.
    No driver loops, no UDFs; everything is codegen'd joins.

    The deduped edge list, the degree table, and the oriented edges are
    each consumed by several differently-pruned subtrees (union legs,
    orientation join sides, wedge legs, the closing probe), which
    defeats plan-level ReuseExchange — so all three slim intermediates
    (2-3 longs per row) are pinned with lazy localCheckpoints and the
    upstream edge derivation runs exactly once."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .transform(_pin)
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = (
        sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        .transform(_pin)
    )

    # Orient by (deg, id): a -> b iff (deg_a, a) < (deg_b, b).
    du = deg.select(F.col("u").alias("_au"), F.col("deg").alias("_da"))
    dv = deg.select(F.col("u").alias("_bv"), F.col("deg").alias("_db"))
    keyed = (
        und.join(du, und["u"] == du["_au"]).join(dv, und["v"] == dv["_bv"])
    )
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).transform(_pin)

    w1 = oriented.select(F.col("a").alias("apex"), F.col("b").alias("p"))
    w2 = oriented.select(F.col("a").alias("apex"), F.col("b").alias("q"))
    wedges = w1.join(w2, "apex").where(F.col("p") < F.col("q"))
    closed = wedges.join(
        oriented.select(
            F.least("a", "b").alias("p"), F.greatest("a", "b").alias("q")
        ),
        ["p", "q"],
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))

    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.shiftright(F.sum(F.col("deg") * (F.col("deg") - 1)), 1).alias("n_wedges"),
        F.max("deg").alias("max_degree"),
    )
    ecnt = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(ecnt)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            "max_degree",
            F.expr("div(n_triangles * 3 * 1000000, n_wedges)").alias(
                "transitivity_ppm"
            ),
        )
    )


def sssp_rounds(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Weighted single-source(-set) shortest paths by `rounds` Bellman-
    Ford relaxations (the bounded-hop variant every MPC system ships;
    GraphX Pregel ShortestPaths analog).  ``edges`` is directed
    (src:long, dst:long, w:long), ``seeds`` is (node:long); all integer,
    so the frontier is bit-comparable to an unrolled recursive-CTE
    oracle.

    Returns (node, dist) for every node reachable within `rounds` hops —
    the exact distance if the true shortest path has <= `rounds` edges.

    Scale shape: each round is ONE shuffle (relax join on src keyed to
    the current distance frame) + a min agg on dst; the distance frame
    stays nodes-sized.  Unbounded convergence loops belong to the
    driver (cf. connected_components); a fixed unrolled round count
    keeps the plan static and resumable."""
    dist = seeds.select(F.col("node").cast("long").alias("node")).distinct()
    dist = dist.withColumn("d", F.lit(0).cast("long"))
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("w").cast("long").alias("w"),
    )
    for _ in range(rounds):
        relax = (
            e.join(dist, e["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("d") + F.col("w")).alias("d"))
        )
        # keep lineage one round deep (cf. connected_components note:
        # AQE re-renders the nested tree per action, O(rounds²) planning)
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .transform(_pin)
        )
    return dist.select("node", F.col("d").alias("dist"))


def k_core_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded-round k-core peeling (Matula & Beck 1983; the
    degeneracy-ordering building block of community mining and of
    triangle-count work bounds): repeatedly drop vertices with degree
    < k and the edges touching them.  `rounds` fixed peels make the
    plan a static DAG; the true k-core is reached when a round removes
    nothing (the census row shows convergence).

    Returns one census row per round r (1-based): surviving n_nodes,
    n_edges, and a node checksum — so the trajectory, not just the
    fixpoint, is pinned.

    Scale shape: per round ONE degree agg + ONE semi-join edge filter
    (both combiner-friendly, keyed on vertices); frames are
    localCheckpoint'd so lineage stays round-deep."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    out_rows = []
    cur = und
    for r in range(1, rounds + 1):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("u").transform(_pin)
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            # USING-joins move the join key to column 0, so the second
            # join leaves columns ordered (v, u); the sym union below is
            # POSITIONAL — re-pin the order or every edge flips.
            .select("u", "v")
            .transform(_pin)
        )
        survivors = cur.select(F.col("u").alias("n")).union(
            cur.select(F.col("v").alias("n"))
        ).distinct()
        census = survivors.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("node_checksum"),
        ).crossJoin(cur.agg(F.count(F.lit(1)).alias("n_edges")))
        out_rows.append(census.select(F.lit(r).cast("long").alias("round"), "n_nodes", "n_edges", "node_checksum"))
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res


def clustering_coefficients(edges: DataFrame, min_triangles: int = 1) -> DataFrame:
    """Per-node local clustering coefficient (Watts & Strogatz 1998;
    networkx ``clustering`` / GraphFrames motif analog): for each node,
    the fraction of its neighbor pairs that are themselves adjacent,
    reported as exact integer parts-per-million
    2·t(v)·10⁶ // (deg·(deg−1)) — no float ratio ever materializes.

    Reuses triangle_census's degree-ordered orientation (Suri &
    Vassilvitskii WWW'11) so wedge fan-out stays O(sqrt m) per apex
    under any skew; each closed triangle is found ONCE and then
    credited to all three corners with a bounded 3-way explode.

    Output: nodes with >= `min_triangles` triangles (deg, n_tri,
    coeff_ppm) — the zero-triangle tail is pinned globally by
    triangle_census, not re-listed per node.

    Slim intermediates (edge list, degrees, oriented edges) are pinned
    with lazy localCheckpoints exactly as in triangle_census — their
    multiple pruning-specialized consumers would otherwise re-evaluate
    the whole upstream edge derivation per use."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = (
        sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        .transform(_pin)
    )
    du = deg.select(F.col("u").alias("_au"), F.col("deg").alias("_da"))
    dv = deg.select(F.col("u").alias("_bv"), F.col("deg").alias("_db"))
    keyed = und.join(du, und["u"] == du["_au"]).join(dv, und["v"] == dv["_bv"])
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).transform(_pin)
    w1 = oriented.select(F.col("a").alias("apex"), F.col("b").alias("p"))
    w2 = oriented.select(F.col("a").alias("apex"), F.col("b").alias("q"))
    wedges = w1.join(w2, "apex").where(F.col("p") < F.col("q"))
    closed = wedges.join(
        oriented.select(
            F.least("a", "b").alias("p"), F.greatest("a", "b").alias("q")
        ),
        ["p", "q"],
    )
    corners = closed.select(
        F.explode(F.array("apex", "p", "q")).alias("node")
    )
    pert = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    out = pert.join(deg, pert["node"] == deg["u"]).where(
        F.col("n_tri") >= min_triangles
    )
    return out.select(
        "node",
        "deg",
        "n_tri",
        F.expr("div(2 * n_tri * 1000000, deg * (deg - 1))").alias("coeff_ppm"),
    )


def label_propagation_rounds(edges: DataFrame, rounds: int) -> DataFrame:
    """Bounded-round synchronous label propagation (Raghavan et al.
    2007; GraphX/GraphFrames ``labelPropagation``) with a DETERMINISTIC
    tie rule: each node adopts the most frequent label among its
    neighbors, ties to the SMALLEST label — so the trajectory is a pure
    function of the graph, reshuffle-proof.  Nodes start labeled with
    their own id; isolated nodes keep it.

    Returns one census row per round r (1-based): n_labels (distinct
    surviving labels), max_community (largest label class), and the
    Σ node·label checksum pinning the full assignment.

    Scale shape: per round ONE edge⋈label equi-join (shuffles on the
    neighbor key) + ONE (node, label) count agg + ONE argmax-by-struct
    agg per node; label frames are localCheckpoint'd so lineage stays
    round-deep.  The argmax is a single max(struct(cnt, -label)) —
    never a window sort."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    sym = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(_pin)
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .select("node", F.col("node").alias("lbl"))
        .transform(_pin)
    )
    out_rows = []
    for r in range(1, rounds + 1):
        nbr = sym.join(
            labels.select(F.col("node").alias("v"), F.col("lbl").alias("nlbl")), "v"
        )
        cnt = nbr.groupBy("u", "nlbl").agg(F.count(F.lit(1)).alias("cnt"))
        best = cnt.groupBy("u").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("nlbl")).alias("neg"))).alias("m")
        )
        labels = best.select(
            F.col("u").alias("node"), (-F.col("m.neg")).alias("lbl")
        ).transform(_pin)
        census = labels.agg(
            F.countDistinct("lbl").alias("n_labels"),
            F.sum(F.col("node") * F.col("lbl")).alias("label_checksum"),
        ).crossJoin(
            labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.max("sz").alias("max_community"))
        )
        out_rows.append(
            census.select(
                F.lit(r).cast("long").alias("round"),
                "n_labels",
                "max_community",
                "label_checksum",
            )
        )
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res


def hits_rounds(edges: DataFrame, rounds: int) -> DataFrame:
    """Bounded-round HITS (Kleinberg JACM'99 hubs & authorities) on a
    DIRECTED edge list, kept integer-exact by running the UNNORMALIZED
    power iteration — a(v) = Σ h(u) over in-edges, h(u) = Σ a(v) over
    out-edges — for a fixed round count (normalization only rescales;
    the RANKING after r rounds is identical, and int64 holds r=2 on
    degree-bounded graphs: scores grow like (max_deg)^(2r)).

    Returns one census row per round: Σh, Σa, max h, max a and the two
    node-weighted checksums pinning both full score vectors.

    Scale shape: per half-round ONE edge⋈score equi-join + ONE
    combiner-friendly sum agg (shuffles on the vertex keys, exactly the
    pagerank_int contract); score frames are localCheckpoint'd so
    lineage stays round-deep."""
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).distinct().transform(_pin)
    hubs = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1).cast("long").alias("h")
    ).transform(_pin)
    out_rows = []
    for r in range(1, rounds + 1):
        auth = (
            e.join(hubs.select(F.col("node").alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .select(F.col("dst").alias("node"), "a")
            .transform(_pin)
        )
        hubs = (
            e.join(auth.select(F.col("node").alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .select(F.col("src").alias("node"), "h")
            .transform(_pin)
        )
        census = hubs.agg(
            F.sum("h").alias("sum_h"),
            F.max("h").alias("max_h"),
            F.sum(F.col("node") * F.col("h")).alias("hub_checksum"),
        ).crossJoin(
            auth.agg(
                F.sum("a").alias("sum_a"),
                F.max("a").alias("max_a"),
                F.sum(F.col("node") * F.col("a")).alias("auth_checksum"),
            )
        )
        out_rows.append(
            census.select(
                F.lit(r).cast("long").alias("round"),
                "sum_h", "max_h", "hub_checksum",
                "sum_a", "max_a", "auth_checksum",
            )
        )
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res


def degree_assortativity_moments(edges: DataFrame) -> DataFrame:
    """Degree-assortativity moments (Newman PRL'02 — do hubs attach to
    hubs?): over the symmetrized edge list, the exact integer moments
    M, Σx, Σx², Σxy of the endpoint-degree pairs, plus the Pearson
    coefficient in MILLI units computed from them — on the symmetrized
    list Σy = Σx and Σy² = Σx², so the usual sqrt(varx·vary) collapses
    to the integer M·Σx² − (Σx)² exactly and the whole coefficient is
    one truncating integer division (milli, not ppm, keeps 10³·num
    inside int64).

    Scale shape: one degree agg + two broadcast-able degree lookups on
    the edge list + ONE global reduce — no window, no sort."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("u").alias("_u"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("u").alias("_v"), F.col("deg").alias("dy"))
    j = sym.join(du, sym["u"] == du["_u"]).join(dv, sym["v"] == dv["_v"])
    m = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sum_x"),
        F.sum(F.col("dx") * F.col("dx")).alias("sum_x2"),
        F.sum(F.col("dx") * F.col("dy")).alias("sum_xy"),
    )
    num = F.col("m") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_x")
    den2 = F.col("m") * F.col("sum_x2") - F.col("sum_x") * F.col("sum_x")
    return m.select(
        "m",
        "sum_x",
        "sum_x2",
        "sum_xy",
        (F.lit(1000) * num).alias("num_milli"),
        den2.alias("den"),
    ).select(
        "m",
        "sum_x",
        "sum_x2",
        "sum_xy",
        F.expr("div(num_milli, den)").alias("assortativity_milli"),
    )


RICH_CLUB_KS = (4, 8, 16)


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient (Colizza et al. Nature Physics'06 — do
    hubs preferentially interconnect?): for each degree threshold k,
    the subgraph induced on nodes with degree > k, reported as exact
    integers n_k (club size), e_k (club edges) and the normalized
    φ = 2·e_k / (n_k·(n_k−1)) in ppm.

    Scale shape: ONE degree agg; per threshold a broadcast-able
    semi-join of the edge list against the club membership (the club
    shrinks geometrically in k, so every filter after the first is
    tiny); counts are global reduces."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    rows = []
    for k in RICH_CLUB_KS:
        club = deg.where(F.col("deg") > k).select("u")
        nk = club.agg(F.count(F.lit(1)).alias("n_club"))
        ek = (
            und.join(club, "u", "left_semi")
            .join(club.select(F.col("u").alias("v")), "v", "left_semi")
            .agg(F.count(F.lit(1)).alias("e_club"))
        )
        rows.append(
            nk.crossJoin(ek).select(
                F.lit(k).cast("long").alias("k"),
                "n_club",
                "e_club",
                F.when(
                    F.col("n_club") >= 2,
                    F.expr("div(2000000 * e_club, n_club * (n_club - 1))"),
                )
                .otherwise(F.lit(0))
                .alias("phi_ppm"),
            )
        )
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res


def dag_layer_census(edges: DataFrame, rounds: int) -> DataFrame:
    """Topological layering by Kahn peeling (the scheduling/critical-
    path primitive: layer k = nodes whose longest incoming path is k):
    each round removes the current zero-in-degree set; the census row
    per round pins layer size, node checksum, and surviving edges.
    `edges` must be a DAG — callers orient by key (u < v), which is
    acyclic by construction.

    Scale shape: per round ONE in-degree agg (dst-keyed) + ONE anti/
    semi-join pair removing the layer — the k-core contract with
    in-degree-0 as the peel rule; frames localCheckpoint'd."""
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).where(F.col("src") != F.col("dst")).distinct().transform(_pin)
    nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select(F.col("dst").alias("n")))
        .distinct()
        .transform(_pin)
    )
    out_rows = []
    cur_e = e
    cur_n = nodes
    for r in range(1, rounds + 1):
        with_in = cur_e.select(F.col("dst").alias("n")).distinct()
        layer = cur_n.join(with_in, "n", "left_anti").transform(_pin)
        cen = layer.agg(
            F.count(F.lit(1)).alias("layer_size"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("layer_checksum"),
        )
        cur_n = cur_n.join(layer, "n", "left_anti").transform(_pin)
        cur_e = (
            cur_e.join(layer.select(F.col("n").alias("src")), "src", "left_anti")
            .transform(_pin)
        )
        ecen = cur_e.agg(F.count(F.lit(1)).alias("n_edges_left"))
        out_rows.append(
            cen.crossJoin(ecen).select(
                F.lit(r).cast("long").alias("round"),
                "layer_size",
                "layer_checksum",
                "n_edges_left",
            )
        )
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res


FOF_TOPK = 20


def fof_recommendations(edges: DataFrame) -> DataFrame:
    """Friend-of-friend link recommendation (the common-neighbors
    ranker of 'people you may know' / co-purchase 'bought together'
    panels): for every NON-adjacent pair with at least one common
    neighbor, the exact common-neighbor count, top-FOF_TOPK by
    (common DESC, pair ASC).

    Scale shape: the wedge self-join runs on the SYMMETRIC adjacency
    (exactness needs every apex, so per-apex fan-out is deg² — at
    10¹² rows cap or sample apex degrees like the D2 module header
    mandates; the fixture's degrees are bounded); existing edges are
    removed by ONE anti-join on the canonical pair; ranking is
    TakeOrdered."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    a = sym.select(F.col("u").alias("apex"), F.col("v").alias("p"))
    b = sym.select(F.col("u").alias("apex"), F.col("v").alias("q"))
    wedges = a.join(b, "apex").where(F.col("p") < F.col("q"))
    cn = wedges.groupBy("p", "q").agg(F.count(F.lit(1)).alias("common"))
    non_adj = cn.join(
        und.select(F.col("u").alias("p"), F.col("v").alias("q")),
        ["p", "q"],
        "left_anti",
    )
    return non_adj.orderBy(
        F.desc("common"), F.asc("p"), F.asc("q")
    ).limit(FOF_TOPK)


RA_SCALE = 10**12  # integer reciprocal scale: weight(z) = RA_SCALE div deg(z)
RA_TOPK = 20


def resource_allocation(edges: DataFrame) -> DataFrame:
    """Resource-Allocation link prediction (Zhou, Lü & Zhang, EPJ B
    2009): for every NON-adjacent pair (p, q) with at least one common
    neighbor z, score RA(p,q) = Σ_z 1/deg(z) — common neighbors count
    for less when they are promiscuous hubs.  Kept integer-exact by
    scoring each apex as RA_SCALE div deg(z) (floor division on longs),
    so the ranking is reproducible bit-for-bit across engines and
    parallelism (no float summation order).

    Output: top-RA_TOPK rows (p, q, ra_score, n_common) by
    (ra_score DESC, p ASC, q ASC).

    Scale shape: same degree-keyed wedge machinery as
    fof_recommendations — one shuffle for degrees, a wedge self-join on
    the apex (per-apex fan-out deg²; cap or sample hot apexes at 10¹²
    rows as the D2 module header mandates), a broadcast-or-shuffle
    apex→deg lookup, one partial+final agg on the candidate pair, one
    anti-join against the existing edge set, TakeOrdered for the top-K.
    The deduped edge list is pinned (lazy localCheckpoint) because the
    wedge legs and the anti-join consume it with different pruning."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    a = sym.select(F.col("u").alias("apex"), F.col("v").alias("p"))
    b = sym.select(F.col("u").alias("apex"), F.col("v").alias("q"))
    wedges = a.join(b, "apex").where(F.col("p") < F.col("q"))
    scored = wedges.join(deg.withColumnRenamed("u", "apex"), "apex").select(
        "p", "q", F.expr(f"{RA_SCALE}L div deg").alias("w")
    )
    cand = scored.groupBy("p", "q").agg(
        F.sum("w").alias("ra_score"), F.count(F.lit(1)).alias("n_common")
    )
    non_adj = cand.join(
        und.select(F.col("u").alias("p"), F.col("v").alias("q")),
        ["p", "q"],
        "left_anti",
    )
    return non_adj.orderBy(
        F.desc("ra_score"), F.asc("p"), F.asc("q")
    ).limit(RA_TOPK)


def harmonic_centrality(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3, scale: int = 6
) -> DataFrame:
    """Bounded-radius harmonic centrality for a seed set: for each seed
    u, H(u) = Σ_{v: 0 < d(u,v) ≤ max_hops} 1/d(u,v) — the
    disconnected-safe centrality (Boldi & Vigna 2014) that search and
    influence ranking use where closeness diverges.  Kept integer-exact
    by scaling with LCM(1..max_hops) (6 for the default radius 3):
    h6 = Σ (6 DIV d) — 6, 3, 2 per hop ring — plus the plain reach
    count, so no float enters the hash surface.

    Algorithm: labeled multi-source BFS — the bfs_min_hops frontier loop
    with a seed tag carried along, so each (seed, node) keeps its FIRST
    (= minimum) distance via the per-round anti-join.  localCheckpoint
    truncates lineage per round; max_hops bounds rounds.

    Scale shape: each round is one src-keyed equi-join plus one
    (seed,node)-keyed anti-join — co-partitioned shuffles; state is
    O(seeds × reach), which the bounded radius caps.  At 10^12 edges
    you shard the seed set and union the (tiny) per-seed aggregates."""
    frontier = (
        seeds.select(F.col("node").cast("long").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"))
        .transform(_pin)
    )
    visited = frontier.withColumn("d", F.lit(0))
    for d in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
            .transform(_pin)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt.withColumn("d", F.lit(d)))
        frontier = nxt
    return (
        visited.where(F.col("d") > 0)
        .groupBy("seed")
        .agg(
            F.sum(F.expr(f"{scale} DIV d")).alias(f"h{scale}"),
            F.count(F.lit(1)).alias("n_reached"),
        )
    )


def boruvka_msf(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Minimum spanning forest via Borůvka rounds (Borůvka 1926; the
    standard MST algorithm for bulk-parallel frameworks because every
    round is a pair of groupBy reductions): ``edges`` is (u, v, w) with
    u < v and GLOBALLY DISTINCT weights (callers build w with a
    unique-id tiebreak in the low digits), which makes the MSF unique
    and every round deterministic.

    Each round: (1) drop intra-component edges, (2) every component
    picks its minimum incident edge — ONE groupBy(component).min over
    the lexicographic (w, u, v) struct, (3) contract by recomputing
    min-label connected components over all chosen edges.  Components
    at least halve per round, so rounds <= ceil(log2 V) — the classic
    O(log V) Borůvka bound; the loop asserts it.

    Scale shape: per round, one broadcast-or-shuffle join of edges
    against the (slim) component labels + one groupBy(comp) partial+
    final min — edges never amplify, no pair explosion.  Contraction
    does NOT re-run a full CC over the cumulative forest each round
    (that was the dominant fixed cost — a whole witness-checked star
    loop per Borůvka round): the round's min-edge choices form a
    PSEUDOFOREST over current component ids (each component points at
    the other end of its min edge; with globally distinct weights
    every cycle is a mutual-min 2-cycle), so contraction is the
    classic hook + pointer-jumping: break 2-cycles toward the smaller
    id, then square the parent map (one self-join per jump, on a
    frame no larger than the component count) until idempotent.
    At 10^12 edges the weight-struct min is exactly the shape a
    Pregel-style MSF takes; labels stay a slim broadcastable dim until
    V itself is huge, at which point the same joins hash-partition."""
    slim = edges.select("u", "v", "w").transform(_pin)
    verts = (
        slim.select(F.col("u").alias("vid"))
        .union(slim.select(F.col("v").alias("vid")))
        .distinct()
        .transform(_pin)
    )
    comp = verts.select("vid", F.col("vid").alias("component"))
    chosen: DataFrame | None = None
    for _ in range(max_rounds):
        ca = comp.select(
            F.col("vid").alias("u"), F.col("component").alias("cu")
        )
        cb = comp.select(
            F.col("vid").alias("v"), F.col("component").alias("cv")
        )
        cross = (
            slim.join(ca, "u").join(cb, "v").where(F.col("cu") != F.col("cv"))
        )
        ms = (
            cross.select(
                F.col("cu").alias("c"),
                F.struct("w", "u", "v", F.col("cv").alias("oc")).alias("e"),
            )
            .union(
                cross.select(
                    F.col("cv").alias("c"),
                    F.struct("w", "u", "v", F.col("cu").alias("oc")).alias("e"),
                )
            )
            .groupBy("c")
            .agg(F.min("e").alias("e"))
            .transform(_pin)
        )
        if ms.isEmpty():
            break
        chosen = (
            ms.select("e.u", "e.v", "e.w")
            if chosen is None
            else chosen.union(ms.select("e.u", "e.v", "e.w"))
        )
        chosen = chosen.distinct().transform(_pin)
        # hook: p(c) = other component of c's min edge; mutual-min
        # 2-cycles root at the smaller id (p(c) = c), leaving in-trees.
        p = ms.select("c", F.col("e.oc").alias("p"))
        nbr = p.select(F.col("c").alias("p"), F.col("p").alias("pp"))
        p = p.join(nbr, "p", "left").select(
            "c",
            F.when(
                (F.col("pp") == F.col("c")) & (F.col("c") < F.col("p")),
                F.col("c"),
            )
            .otherwise(F.col("p"))
            .alias("p"),
        )
        # pointer jumping: p <- p∘p until idempotent (≤ log2(depth)
        # self-joins, each over a ≤|components| frame).
        for _ in range(40):
            nxt = p.select(F.col("c").alias("p"), F.col("p").alias("pp"))
            sq = (
                p.join(nxt, "p")
                .select(
                    "c",
                    F.col("pp").alias("p"),
                    (F.col("pp") != F.col("p")).alias("moved"),
                )
                .transform(_pin)
            )
            moved = sq.where("moved").isEmpty()
            p = sq.select("c", "p")
            if moved:
                break
        else:
            raise RuntimeError("boruvka_msf pointer jumping did not converge")
        comp = (
            comp.join(
                p.select(F.col("c").alias("component"), "p"), "component", "left"
            )
            .select("vid", F.coalesce("p", F.col("component")).alias("component"))
            .transform(_pin)
        )
    else:
        raise RuntimeError(f"boruvka_msf did not converge in {max_rounds} rounds")
    if chosen is None:
        return slim.where(F.lit(False)).select(
            F.col("u").alias("za"), F.col("v").alias("zb"), F.col("w").alias("weight")
        )
    return chosen.select(
        F.col("u").alias("za"), F.col("v").alias("zb"), F.col("w").alias("weight")
    )


def k_truss_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded-round k-truss peeling (Cohen 2008 — the triangle-support
    sibling of k-core, the standard cohesive-subgraph definition for
    community cores): repeatedly drop edges in fewer than k-2
    triangles.  `rounds` fixed peels make the plan a static DAG; the
    census row per round pins the whole trajectory (n_edges, triangle
    count before the peel, and an edge checksum), so convergence is
    visible when a round removes nothing.

    Triangles enumerate once each via the oriented triple join on
    u<v edges — e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) — and each triangle
    credits its three edges; support is ONE groupBy count over the
    3x projected triangle table.

    Scale shape: the oriented join bounds each wedge apex by its
    out-degree; at 10^12 edges the degree-ordered orientation
    (triangle_census) drops in as the same shape.  Per round: one
    3-way self-join + one partial+final count + one semi filter,
    all keyed on edge endpoints; frames localCheckpoint'd so lineage
    stays round-deep."""
    und = (
        edges.select(F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .transform(_pin)
    )
    out_rows = []
    cur = und
    for r in range(1, rounds + 1):
        e1 = cur.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = cur.select(F.col("u").alias("b"), F.col("v").alias("c"))
        e3 = cur.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = e1.join(e2, "b").join(e3, ["a", "c"]).transform(_pin)
        sup = (
            tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .union(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
            .union(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        cur = (
            cur.join(sup, ["u", "v"])
            .where(F.col("sup") >= k - 2)
            .select("u", "v")
            .transform(_pin)
        )
        census = cur.agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.coalesce(F.sum(F.col("u") * 100_003 + F.col("v")), F.lit(0)).alias(
                "edge_checksum"
            ),
        ).crossJoin(tri.agg(F.count(F.lit(1)).alias("n_tris_pre")))
        out_rows.append(
            census.select(
                F.lit(r).cast("long").alias("round"),
                "n_edges",
                "n_tris_pre",
                "edge_checksum",
            )
        )
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res


def apsp_path_counts(edges: DataFrame, max_rounds: int = 24) -> DataFrame:
    """All-pairs shortest-path distances AND multiplicities (the σ_st
    path-counting layer of Brandes' betweenness, run to all pairs on a
    dim-scale graph): level-synchronous BFS from every source at once —
    frontier rows (s, v, n) carry the number of distinct shortest
    s→v paths, each round sums counts over the edge fan-out and
    anti-joins everything already settled (first-reach = shortest on
    an unweighted graph).

    Returns (src, dst, dist, npaths) for every reachable ordered pair
    (including dist 0 self-rows), deterministic for any partitioning —
    counts are additive and order-free.

    Scale shape: each round is ONE join against the symmetric edge
    list + ONE (s,v) groupBy-sum + ONE anti-join, all keyed on the
    vertex — the textbook Pregel BFS; rounds = graph diameter.  At
    10^12 edges the same loop shards by source-partition batches; the
    settled set stays keyed and localCheckpoint'd so lineage is
    round-deep."""
    sym = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .union(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .distinct()
        .transform(_pin)
    )
    verts = sym.select(F.col("a").alias("s")).distinct()
    frontier = verts.select(
        "s", F.col("s").alias("v"), F.lit(1).cast("long").alias("n")
    ).transform(_pin)
    done = frontier.select("s", "v", F.lit(0).alias("dist"), "n")
    for k in range(1, max_rounds + 1):
        if frontier.isEmpty():
            break
        nxt = (
            frontier.join(sym, frontier["v"] == sym["a"])
            .groupBy("s", F.col("b").alias("v2"))
            .agg(F.sum("n").alias("n"))
            .withColumnRenamed("v2", "v")
            .join(done.select("s", "v").withColumn("seen", F.lit(1)),
                  ["s", "v"], "left_anti")
            .transform(_pin)
        )
        if nxt.isEmpty():
            frontier = nxt
            break
        done = done.unionByName(
            nxt.select("s", "v", F.lit(k).alias("dist"), "n")
        ).transform(_pin)
        frontier = nxt
    else:
        raise RuntimeError(f"apsp_path_counts: diameter exceeds {max_rounds}")
    return (
        done.select(
            F.col("s").alias("src"), F.col("v").alias("dst"),
            F.col("dist").cast("long").alias("dist"), F.col("n").alias("npaths"),
        )
        .repartition(1)
        .sortWithinPartitions("src", "dst")
    )


def bellman_ford_rounds(
    edges: DataFrame, source: int, rounds: int
) -> DataFrame:
    """Single-source WEIGHTED shortest paths via bounded Bellman-Ford
    relaxation rounds (the BSP shortest-path shape — Pregel's hello-
    world — where Dijkstra's priority queue has no parallel analog):
    ``edges`` is (u, v, w) undirected with positive integer weights;
    each round relaxes every edge once, d_k(v) = min(d_{k-1}(v),
    min_{(u,v)} d_{k-1}(u) + w).  ``rounds`` fixed relaxations make the
    plan a static DAG; with rounds >= |V|-1 the fixpoint is exact, and
    the emitted per-node round-of-last-improvement pins the whole
    trajectory, not just the final distances.

    Returns (node, dist, settled_round) for nodes reachable from
    ``source`` within ``rounds`` relaxations.

    Scale shape: per round ONE join of the frontier against the edge
    list + ONE groupBy(v).min — both combiner-friendly; frames
    localCheckpoint'd so lineage stays round-deep.  At 10^12 edges
    this is delta-stepping's degenerate bucket, sharded on v."""
    sym = (
        edges.select("u", "v", "w")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
        .distinct()
        .transform(_pin)
    )
    dist = (
        sym.select(F.col("u").alias("node")).distinct()
        .select(
            "node",
            F.when(F.col("node") == source, F.lit(0).cast("long")).alias("dist"),
            F.when(F.col("node") == source, F.lit(0).cast("long")).alias("settled"),
        )
        .transform(_pin)
    )
    for k in range(1, rounds + 1):
        cand = (
            dist.where(F.col("dist").isNotNull())
            .join(sym, dist["node"] == sym["u"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cdist"))
        )
        new = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.least(
                    F.coalesce("dist", F.lit(None).cast("long")),
                    F.coalesce("cdist", F.col("dist")),
                ).alias("ndist"),
                "dist",
                "settled",
            )
            .select(
                "node",
                F.col("ndist").alias("dist_new"),
                F.when(
                    F.col("dist").isNull() & F.col("ndist").isNotNull(), F.lit(k)
                )
                .when(F.col("ndist") < F.col("dist"), F.lit(k))
                .otherwise(F.col("settled"))
                .alias("settled"),
            )
            .withColumnRenamed("dist_new", "dist")
            .transform(_pin)
        )
        dist = new
    return (
        dist.where(F.col("dist").isNotNull())
        .select("node", "dist", F.col("settled").cast("long").alias("settled_round"))
        .repartition(1)
        .sortWithinPartitions("node")
    )

"""Link-graph analytics for corpus curation.

Web-crawl curation ranks pages by link structure (the CommonCrawl /
C4-style "keep well-linked pages" signal) before any text-quality
gate runs. PageRank is the canonical primitive; at 100 TB the edge
list is the big table and every iteration is one shuffle on ``dst``
(the contribution aggregation) — rank state is two BIGINTs per node,
never the page payload.

Engine-exact by construction: ranks are scaled BIGINTs and every
iteration step is integer arithmetic (``DIV``-style truncating
division, BIGINT sums — exact and order-free), so the result cannot
depend on partitioning, summation order, or libm differences. The
DuckDB oracle unrolls the same iterations with ``//``; for positive
operands both engines truncate identically.

Reference parity: the reference has no graph operator; this extends
the LLM-pipeline surface per the build brief (corpus-forensics
family). Dedup's connected components (`dedup.py`) shares the
iterate-with-checkpoint pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from arc_jupyter_spark.checkpoint import materialize, materialize_lazy

#: Fixed-point scale for ranks: rank 1.0 == 10^9.
RANK_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = RANK_SCALE,
    checkpoint_every: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration integer PageRank → ``[node, rank_e9]``.

    Per iteration: ``r' = base + damping * SUM(r_u DIV deg_u)`` where
    ``base = ((den-num) * scale DIV den) DIV n`` and the damping
    multiply is ``(num * s) DIV den`` — all BIGINT, all exact.
    Dangling-node mass is dropped (standard "leak" variant); both the
    operator and any oracle compute the same closed form, so parity
    holds by construction.

    Scale shape: edges are deduplicated once (one shuffle — skipped
    entirely when the caller guarantees ``assume_distinct``, e.g. the
    two disjoint orientations of an already-DISTINCT bipartite pair
    set), degrees and the node set are derived from that same frame.
    Rank state is carried as the CONTRIBUTION-SUM table ``s`` (nodes
    with at least one in-edge), not the full rank vector: a node
    without in-edges has the constant rank ``base`` after iteration 1
    and the constant ``r0`` before it, so its rank never needs to be
    materialized or joined. Each iteration is then ONE equi-join of
    ``s`` onto the edge+degree frame (iteration 1 skips even that —
    every rank is the constant ``r0``) plus one map-side-combined
    ``groupBy(dst)`` BIGINT sum; the full node vector is joined
    exactly once, after the loop. Rank state per node is 8 bytes.
    Lineage is truncated every few rounds via the session's checkpoint
    strategy (``checkpoint.materialize``: executor-local by default,
    ``spark.arc.checkpoint.mode=reliable`` for fault-tolerant cluster
    runs) so the plan stays constant-size at high iteration counts.
    """
    # all loop-invariant frames are LAZY checkpoints, and the node
    # count never reaches the driver: n flows into the rank constants
    # as a broadcast 1-row aggregate (`_n`), so the whole fixed-
    # iteration query is ONE job — the final action materializes e,
    # ed and nodes (previously nodes.count() was a separate job run
    # only to fold n into the expressions as a Python literal)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.transform(materialize_lazy)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize_lazy)
    )
    nc = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("_n")))
    # the (edge, out-degree, n) pairing is loop-invariant — join it
    # once and checkpoint, so each iteration is ranks-join + one
    # shuffle, not a re-run of the degree aggregation and its join
    ed = (
        e.join(deg, "src", "inner").crossJoin(nc).transform(materialize_lazy)
    )
    # integer-identical to the old Python-side constants: base =
    # ((den - num) * scale DIV den) DIV n, r0 = scale DIV n (SQL DIV
    # on non-negative BIGINTs == Python //). On an empty graph no row
    # ever evaluates the DIV-by-zero and every output frame is empty,
    # which is the documented contract.
    base = f"(({(damping_den - damping_num) * scale} DIV {damping_den}) DIV _n)"
    r0 = f"({scale} DIV _n)"

    # rank_i(u) = base + (num * COALESCE(s_i(u), 0)) DIV den for i >= 1
    # and the constant r0 for i = 0 — identical integer arithmetic to
    # materializing the rank vector, with the per-iteration nodes-join
    # algebraically eliminated (it only ever filled in the constant).
    s = None
    rank_of_s = (
        f"({base} + ({damping_num} * COALESCE(s, 0)) DIV {damping_den})"
    )
    for i in range(iterations):
        if s is None:
            # iteration 1: every node's rank is the constant r0 — the
            # contribution needs no rank join at all
            contrib_src = ed.select(
                F.col("dst").alias("node"),
                F.expr(f"{r0} DIV deg").alias("c"),
            )
        else:
            contrib_src = ed.join(s, ed.src == s.node, "left").select(
                F.col("dst").alias("node"),
                F.expr(f"{rank_of_s} DIV deg").alias("c"),
            )
        s = (
            contrib_src.groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            s = s.transform(materialize)
    return nodes.crossJoin(nc).join(s, "node", "left").select(
        "node",
        F.expr(rank_of_s).cast("bigint").alias("rank_e9"),
    )


def _wedge_closure(
    edges: DataFrame,
    src: str,
    dst: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the triangle pipeline → ``(e, deg, closure)`` where
    ``closure`` is the wedge⋈edge join whose row count IS the
    triangle count. Split out so plan gates can assert on the REAL
    pipeline (equi-joins only, no nested-loop fallback) instead of a
    reconstruction."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        # the canonical edge set feeds degrees, orientation, closing
        # AND two of the three summary counts — materialize once
        # instead of re-running the upstream dedup shuffle per action
        # (EAGER on purpose: an interleaved A/B showed the lazy form
        # consistently ~1s slower here — the three count() actions
        # schedule better against pre-pinned blocks)
        .transform(materialize)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: (u -> v) iff (deg_u, u) < (deg_v, v) — a total order, so
    # each undirected edge appears exactly once in `oriented`
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # plain equi-joins: AQE broadcasts the degree table when it is
    # actually small (runtime stats), but a web-scale graph's
    # per-node table is GBs — a mandatory broadcast hint would OOM
    # exactly where the operator claims to scale
    with_deg = e.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    # oriented is read twice (wedge build + closing set): materialize
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).transform(materialize)
    # wedges at the low end: pairs (v, w) of out-neighbours of u
    o1 = oriented.select(F.col("u"), F.col("v"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = o1.join(o2, "u").where(F.col("v") < F.col("w"))
    # close the wedge with an inner join: `closing` rows are distinct
    # canonical pairs (oriented came from the distinct undirected edge
    # set), so each wedge row matches at most once — the join count IS
    # the triangle count, with per-u wedge multiplicity preserved
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    closure = wedges.select(
        F.least("v", "w").alias("x"), F.greatest("v", "w").alias("y")
    ).join(closing, ["x", "y"])
    return e, deg, closure


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle count → one row
    ``[n_nodes, n_edges, n_triangles]``.

    Classic degree-oriented algorithm (Suri & Vassilvitskii's
    MapReduce formulation, public): canonicalize the edge set to
    undirected distinct pairs, orient every edge from the
    lower-(degree, id) endpoint to the higher, build wedges only at
    each edge's *lower-degree* endpoint, and close them with one join
    back to the oriented edge set.

    Why this survives 100×: a hub of degree d would generate d² wedges
    under naive pairing; orientation bounds per-node wedge work by the
    node's *oriented* out-degree (≤ √(2m) for any graph), so the wedge
    table is O(m^1.5) worst case and far smaller on real graphs. All
    joins are equi-joins on node ids; AQE broadcasts the degree table
    (2 BIGINTs per node) when its runtime size allows, and billion-node
    graphs fall back to a shuffle join instead of OOMing on a hint.

    Everything is integer counting — engine-exact. DuckDB mirror: a
    3-way self-join on the canonical a<b edge table.
    """
    e, deg, closure = _wedge_closure(edges, src, dst)
    n_tri = closure.count()
    n_nodes = deg.count()
    n_edges = e.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    checkpoint_every: int = 2,
    assume_distinct: bool = False,
) -> DataFrame:
    """Synchronous label propagation (community detection) →
    ``[node, label]`` after a FIXED number of rounds.

    Raghavan et al.'s LPA (public), made engine-deterministic: every
    node starts labelled with its own id; each round every node adopts
    the label most frequent among its in-neighbours, ties broken by
    the SMALLEST label. Synchronous fixed-round updates + a total
    tie-break order make the result a pure function of the edge set —
    no run-to-run or engine-to-engine drift, unlike the asynchronous
    randomized formulation. Pass both directions of each undirected
    edge (as g03 does) for the classic undirected behaviour.

    Scale shape: per round, ONE shuffle join of the 16 B/row label
    state onto edges (AQE broadcasts the label table only while it is
    genuinely small), one partial-agg'd ``groupBy(node, label)``
    count, and one per-node sort-free ``max_by`` argmax. Round 1 is
    join-free: labels == ids and distinct edges make every vote count
    exactly 1, so the argmax collapses to one map-combined
    ``MIN(src)`` per node (struct
    key ``(n, -label)`` — total order, so most-frequent with
    smallest-label tiebreak) whose input is already partitioned by
    ``node`` from the count's exchange — Catalyst reuses that
    partitioning, so the argmax adds neither a sort nor an exchange. Label state is two BIGINTs per node; the corpus/payload
    never moves. Lineage growth is truncated across rounds via the session's
    checkpoint strategy (``checkpoint.materialize`` — flip
    ``spark.arc.checkpoint.mode=reliable`` for cluster fault tolerance).

    Reference parity: no graph surface in the reference
    (`README.md:1` positions it as notebook ETL); this extends the
    corpus-forensics family alongside :func:`pagerank`.
    """
    if iterations < 1:
        raise ValueError("label_propagation() needs iterations >= 1")
    # lazy checkpoints: the final action materializes e/nodes once and
    # every round reuses the pinned blocks — no separate eager jobs
    # (the g01 job-overhead lesson; see pagerank above)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.transform(materialize_lazy)
    # node set tagged with "has an in-edge" in the SAME single shuffle
    # the plain distinct cost (groupBy + max partial-aggregates like
    # distinct does). A node with NO in-edge never receives a
    # neighbour vote, so its label is its own id forever (the
    # coalesce-to-node of every round reduced to exactly that) — the
    # `iso` slice is unioned back per round instead of left-joining
    # the full node vector against `best` every round: one shuffle
    # fewer per round, and empty under the undirected
    # both-orientations convention (src set == dst set).
    ntab = (
        e.select(F.col("src").alias("node"), F.lit(0).alias("_in"))
        .union(e.select(F.col("dst").alias("node"), F.lit(1).alias("_in")))
        .groupBy("node")
        .agg(F.max("_in").alias("_in"))
        .transform(materialize_lazy)
    )
    iso = ntab.where(F.col("_in") == 0).select(
        "node", F.col("node").alias("label")
    )
    labels = None
    for i in range(iterations):
        if labels is None:
            # iteration 1: every node's label IS its id, so the edge ⨝
            # labels join would only rename src → label, and — e being
            # DISTINCT — every (node, label) vote count is exactly 1.
            # The most-frequent-then-smallest argmax over all-ones
            # counts is just MIN(src) per dst: one map-combined
            # aggregate replaces the join AND the (node, label) count
            # exchange (the g01/g06 iteration-1 constant lesson).
            best = e.groupBy(F.col("dst").alias("node")).agg(
                F.min("src").alias("label")
            )
        else:
            counts = (
                e.join(labels, e.src == labels.node, "inner")
                .select(F.col("dst").alias("node"), "label")
                .groupBy("node", "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            # argmax by (count DESC, label ASC) as a sort-free min_by
            # over struct(-n, label): lexicographic struct comparison
            # gives the most frequent label with smallest-label
            # tiebreak, and the label field makes the key total (no
            # equal structs — min_by is then deterministic). Negating
            # the COUNT (always a bigint) rather than the label keeps
            # the key valid for string node ids too. Replaces a
            # row_number window whose per-node sort cost a full extra
            # sort stage per round; the second groupBy reuses the
            # count's hash partitioning on `node`.
            best = counts.groupBy("node").agg(
                F.min_by(
                    "label",
                    F.struct((-F.col("n")).alias("nn"), F.col("label")),
                ).alias("label")
            )
        # every in-edge-bearing node has a `best` row; isolated nodes
        # keep their own id — the disjoint union IS the full vector
        labels = best.unionByName(iso)
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            labels = labels.transform(materialize)
    return labels


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 3,
    assume_distinct: bool = False,
) -> DataFrame:
    """Frontier BFS from a source node set → ``[node, dist]`` with the
    MINIMUM hop distance (0 for sources), capped at ``max_depth``.

    The canonical iterative distributed-graph pattern (Pregel's
    message round, public): per round, ONE equi-join expands the
    frontier along edges, a ``distinct`` collapses multi-parent
    arrivals, and a LEFT ANTI join against the visited set enforces
    min-distance semantics — a node is labelled the first round it is
    reached and never again. Rounds stop early when a frontier comes
    back empty (the checkpoint makes the emptiness probe free).

    Scale shape: state per node is 16 B; each round shuffles only the
    frontier-adjacent edge endpoints (partial-distinct collapses
    duplicates map-side before the exchange), and the visited set
    joins as a plain equi-join that AQE broadcasts only while it is
    genuinely small. ``checkpoint.materialize`` pins each frontier so round
    ``k``'s anti-join does not re-run rounds ``1..k-1``
    (``spark.arc.checkpoint.mode=reliable`` for cluster fault
    tolerance). Unlike q70's chain-follow
    (relational path enumeration), the visited-set subtraction makes
    this linear in reachable edges, not in path count.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # lazy: round 1's emptiness probe materializes e and the frontier
    # in the same job instead of two eager checkpoint jobs up front
    e = e.transform(materialize_lazy)
    frontier = sources.select("node").distinct().transform(materialize_lazy)
    visited = frontier.withColumn("dist", F.lit(0).cast("bigint"))
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(frontier, e.src == frontier.node, "inner")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        # lazy checkpoint: the emptiness probe is the materializing
        # action, so each round costs one job, not two
        new = nxt.join(visited.select("node"), "node", "left_anti").transform(materialize_lazy)
        if d == max_depth:
            # the last frontier needs no emptiness probe — an empty
            # `new` unions to nothing, so the probe job only ever
            # decided whether to run rounds that don't exist
            visited = visited.union(
                new.withColumn("dist", F.lit(d).cast("bigint"))
            )
            break
        if not new.take(1):
            break
        frontier = new
        visited = visited.union(
            new.withColumn("dist", F.lit(d).cast("bigint"))
        )
    return visited


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    checkpoint_every: int = 4,
    assume_distinct: bool = False,
    authority_only: bool = False,
) -> DataFrame:
    """Integer HITS (Kleinberg) over a directed edge list →
    ``[node, authority, hub]`` — authority for every dst node, hub
    for every src node (0 where a node lacks that role).

    ``authority_only=True`` returns just ``[node, authority]`` for the
    dst nodes (the rows whose authority is > 0 in the full output):
    the final iteration's hub update and the full-outer hub/authority
    stitch are skipped entirely — one join + one shuffle + one
    full-outer join fewer for consumers that rank authorities only
    (Catalyst cannot prune them itself: the full-outer join changes
    which ROWS exist, not just which columns).

    UNNORMALIZED integer scores: hubs start at 1; each iteration is
    ``a(v) = Σ_{u→v} h(u)`` then ``h(u) = Σ_{u→v} a(v)`` — two BIGINT
    shuffles per iteration, both with map-side partial aggregation.
    Classic HITS L1-normalizes between steps, but each update is
    LINEAR in the other score vector, so skipping the normalization
    multiplies every score by the same positive scalar per iteration —
    the RANKING is identical to normalized HITS, and staying in
    integers keeps results partition-order-free and oracle-exact
    (an oracle unrolls the same joins in SQL).

    Overflow headroom: after ``t`` iterations scores are bounded by
    ``(d_max² )^t`` where ``d_max`` is the max degree — with BIGINT
    that holds to ~10^18; for extreme graphs (d_max ~ 10^4, t > 2)
    rescale by a constant ``DIV`` between iterations (divides every
    score equally, so the ranking argument above still applies).

    Edges are deduplicated once; that shuffled frame is lazily
    checkpointed and reused by every iteration (the g01 edge-build
    lesson), with lineage truncated every ``checkpoint_every`` rounds.
    """
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.transform(materialize_lazy)

    # iteration 1's hub vector is the constant 1 for every src node,
    # so ``a_1(v) = Σ_{u→v} 1`` = the in-edge count — the join against
    # the all-ones hub table (and the distinct-src shuffle that built
    # it) only ever summed a constant; start from the in-degree
    # aggregate instead (the g01 iteration-1 lesson).
    auth = None
    hubs = None
    for i in range(iterations):
        if hubs is None:
            auth = (
                e.groupBy(F.col("dst").alias("node"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("a"))
            )
        else:
            auth = (
                e.join(hubs, e.src == hubs.node, "inner")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("h").alias("a"))
            )
        if authority_only and i + 1 == iterations:
            # the last hub update feeds nothing the caller reads
            return auth.select("node", F.col("a").alias("authority"))
        hubs = (
            e.join(auth, e.dst == auth.node, "inner")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            auth = auth.transform(materialize)
            hubs = hubs.transform(materialize)
    return (
        auth.join(hubs, "node", "full_outer")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).cast("bigint").alias("authority"),
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    assume_distinct: bool = False,
    return_edges: bool = False,
    degrees: DataFrame | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame, DataFrame]:
    """k-core decomposition by iterative peeling → ``[node, degree]``
    for every node of the k-core (the maximal subgraph where every
    node keeps degree >= k), with its WITHIN-CORE degree.

    Corpus-graph curation primitive: web-spam and link-farm filtering
    keep pages inside a dense core (k-core membership is the classic
    "well-embedded page" signal, complementing PageRank's flow rank).
    ``edges`` is a directed edge list; for the undirected-degree
    semantics callers pass both orientations (the g04 convention), so
    ``degree(node) = count of distinct out-neighbours``.

    Peeling is the textbook fixpoint: drop every node with degree < k,
    recompute degrees on the induced subgraph, repeat until no node
    falls below k (or the edge set empties). Each round is ONE
    map-side-combined count aggregate plus one semi-join of the edge
    list against surviving nodes on each endpoint — the edge frame
    shrinks monotonically, and ``materialize`` pins each round's
    survivor set so round ``r`` never re-runs rounds ``1..r-1``.
    Early exit when a round removes nothing (the survivor-count probe
    doubles as the checkpoint action).

    Scale shape: state is one BIGINT per node; every shuffle key is a
    node id; nothing is ever collected to the driver. Rounds needed =
    the peel depth of the graph (small for power-law web graphs); the
    induced-subgraph semi-joins are plain equi-joins AQE can broadcast
    once the survivor frontier gets small. A convergence cap
    ``max_rounds`` bounds the job count; an exact oracle can unroll
    the same peel as chained CTEs because extra rounds past the
    fixpoint are no-ops.

    Job shape: each round is ONE job, and the fixpoint is read off the
    DEGREE table, not a confirmation peel — the round materializes the
    previous round's induced edge frame (lazy checkpoint), aggregates
    degrees (pinned), and one tiny node-sized aggregate reports
    ``(n_nodes, n_below_k)``. ``n_below_k == 0`` IS the fixpoint (no
    node would be peeled, so the induced subgraph is already stable),
    which saves the old confirmation round's two semi-joins + full
    edge-frame re-checkpoint, needs no upfront edge count, and lets
    the final core projection read the pinned degree table instead of
    re-aggregating the fixpoint frame.

    ``assume_distinct`` skips the initial edge dedup shuffle when the
    caller guarantees distinct rows (e.g. the two disjoint
    orientations of an already-DISTINCT pair set). ``return_edges``
    additionally returns the FIXPOINT edge frame (the core's induced
    subgraph, materialized) AND its pinned degree table, so nested
    peels (g08) reuse both instead of re-inducing from the full graph
    and re-aggregating degrees: level k+1's round-1 degree table IS
    level k's fixpoint degree table (same edge frame), which
    ``degrees`` hands back in.
    """
    if k < 1:
        raise ValueError("kcore() needs k >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.transform(materialize_lazy)

    def _empty() -> DataFrame:
        out = e.limit(0).select(
            F.col("src").alias("node"),
            F.lit(0).cast("bigint").alias("degree"),
        )
        # third element mirrors the REAL pinned degree table's
        # [src, degree] schema so the degrees= round-trip is
        # schema-consistent even on the empty path (ADVICE r9 item 2)
        empty_deg = e.limit(0).select(
            "src", F.lit(0).cast("bigint").alias("degree")
        )
        return (out, e.limit(0), empty_deg) if return_edges else out

    deg = None
    # max_rounds bounds INDUCTIONS; the +1 iteration only reads the
    # degree stats of the last allowed round (exhaustion exactly AT
    # the fixpoint is accepted, still-shrinking raises — the ADVICE r8
    # loud-failure contract).
    for r in range(max_rounds + 1):
        if r == 0 and degrees is not None:
            # caller-supplied degree table of `edges` (already pinned
            # by a previous peel) — round 1's stats job reads cached
            # blocks instead of re-aggregating the full edge frame
            deg = degrees
        else:
            deg = (
                e.groupBy("src")
                .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
                .transform(materialize_lazy)
            )
        n_nodes, n_drop = deg.select(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("degree") < k).cast("int")).alias("d"),
        ).first()  # the ONE job: materializes e + deg, reads the stats
        if n_nodes == 0:
            return _empty()
        if n_drop == 0:
            break  # fixpoint: no node would be peeled
        if r == max_rounds:
            raise RuntimeError(
                f"kcore(k={k}) did not converge within max_rounds="
                f"{max_rounds}: {n_drop} of {n_nodes} surviving nodes "
                "still below k; raise max_rounds (peel depth of this "
                "graph exceeds the budget)"
            )
        keep = deg.where(F.col("degree") >= k).select("src")
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .transform(materialize_lazy)
        )
    # at the fixpoint every surviving node has degree >= k, so the
    # pinned degree table IS the core (the where is belt-and-braces)
    core = deg.where(F.col("degree") >= k).select(
        F.col("src").alias("node"), "degree"
    )
    return (core, e, deg) if return_edges else core

"""Round-compressed connected components: alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond", ACM SoCC 2014 — the algorithm behind GraphFrames'
connectedComponents).

Why a second CC implementation: q73's min-label propagation
(extensions/dedup.py) runs one join+agg round per *hop*, i.e.
O(component diameter) rounds.  Near-dup clusters are usually shallow,
but at 100 TB a single chain-shaped component (docs A~B~C~... via
successive small edits) makes the round count unbounded.  The
alternating-star algorithm contracts paths by pointer doubling and
converges in O(log n) rounds regardless of diameter, with the same
per-round physical plan (one shuffle for the groupBy-min, one shuffle
for the join back — both on the node-id key, so AQE coalesces them).

State between rounds is only the edge set; lineage is truncated with
an eager localCheckpoint per round, so plan size stays constant no
matter how many rounds run.  No driver-side state
beyond the convergence checksum (2 scalars per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Orient every edge big->small, drop loops and duplicates."""
    return (
        e.select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    # emitted (v, m) always has v > u >= m, so it is already canonical
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect u and all its smaller neighbors to their minimum."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    j = e.join(mins, "u")
    out = j.select(F.col("u"), F.col("m").alias("v")).unionByName(
        j.where(F.col("v") != F.col("m")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    )
    return out.distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node that appears in ``edges`` with its component's
    minimum node id.  Returns DataFrame[node, component].

    Ids may be any orderable type (long, string).  Isolated nodes don't
    appear in an edge list and so are absent — same contract as q73.
    ``stats['rounds']`` reports the number of star rounds if a dict is
    passed (used by tests to pin the O(log n) behavior).
    """
    # eager checkpoints: the star operators reference their input from
    # TWO branches (sym union, join-back), and Spark schedules those
    # branches as parallel stages — a lazy checkpoint then materializes
    # the same partitions twice concurrently (measured slower than the
    # extra eager job on the LSH doc graph)
    e = _canon(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)

    prev = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        # LAZY checkpoint whose first consumer is the fingerprint
        # aggregate below: that single-stage action computes (and
        # caches) every partition exactly once, so the round runs ONE
        # job instead of the former eager-checkpoint job + separate
        # fingerprint job — the next round's parallel star branches
        # then read materialized blocks (the double-materialization
        # hazard of lazy checkpoints only bites when the FIRST consumer
        # is itself two parallel stages).
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        # set fingerprint of the (distinct) edge set; equal => fixpoint
        # (bit_xor, not sum: ANSI mode makes sum overflow on 64-bit hashes)
        cur = e2.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        e = e2
        if prev is not None and (cur["n"], cur["h"]) == prev:
            converged = True
            break
        prev = (cur["n"], cur["h"])
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # O(log^2 n) worst case: hitting this means max_iter was set far
        # too low for the graph — fail loudly, never emit partial labels
        raise RuntimeError(
            f"star rounds did not reach a fixpoint in {max_iter} iterations"
        )

    # at the fixpoint the edge set is a star forest: (node, root) with
    # node > root; roots only ever appear on the v side
    non_roots = e.groupBy("u").agg(F.min("v").alias("component"))
    roots = (
        e.select("v")
        .distinct()
        .join(non_roots.select("u").withColumnRenamed("u", "v"), "v", "left_anti")
        .select(F.col("v").alias("u"), F.col("v").alias("component"))
    )
    return non_roots.unionByName(roots).withColumnRenamed("u", "node")


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 0,
) -> DataFrame:
    """Fixed-iteration PageRank power method over a directed edge set.

    Returns (node, rank) after ``n_iter`` rounds of
    r' = (1-d)/N + d * sum_in(r/outdeg). Per round: ONE equi-join of
    the edge set with the O(#nodes) rank vector and ONE aggregate
    keyed on dst — the same shuffle shape as one CC round, linear in
    |E| — plus a left join back onto the STATIC node set for sinks
    with no in-edges, so the dynamic state is referenced once per
    round and the whole loop is one lazy linear plan (no per-round
    materialization; ``checkpoint_every`` > 0 re-enables periodic
    truncation for very deep loops). N comes from a 1-row broadcast
    aggregate, never a driver collect.

    On a symmetric near-dup graph every node has outdeg >= 1 (no
    dangling-mass redistribution needed); rank then measures cluster
    centrality — the most-connected member is the natural canonical
    representative for keep-one dedup.
    """
    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    n_tot = deg.agg(F.count("*").alias("n"))
    # (node, outdeg, n) never changes across rounds — materialize it
    # ONCE and join each round's update against it, instead of carrying
    # the static columns through the dynamic rank vector.  That leaves
    # the dynamic state referenced exactly ONCE per round (the contrib
    # join), so the whole n_iter chain is lazily LINEAR: no per-round
    # localCheckpoint, no exponential recompute, one job at the end
    # (the old shape referenced r twice per round and needed a
    # per-round truncation).
    # persist, NOT localCheckpoint: an AQE localCheckpoint executes its
    # stages eagerly at call time (extra per-call jobs) and erases the
    # child's output partitioning (the LogicalRDD comes back with
    # UnknownPartitioning), while InMemoryRelation keeps both lazy and
    # partitioned — so the per-round joins below see nodes' hash
    # partitioning and skip their exchanges
    nodes = (
        deg.select(F.col(src).alias("node"), "outdeg")
        .crossJoin(F.broadcast(n_tot))
        .persist()
    )
    r = nodes.select(
        "node", "outdeg", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for it in range(n_iter):
        # join strategy is chosen DELIBERATELY (guide §3.1): the rank
        # vector is the O(#nodes) side and bounded per partition, so a
        # shuffled-hash build of it streams the edge set with NO sort;
        # when the caller hands in edges already hash-partitioned on
        # ``src`` (the session-memoized co-purchase build), the edge
        # side of this per-round join needs no Exchange either.
        contrib = (
            edges.join(
                r.select(F.col("node").alias(src), "outdeg", "rank").hint(
                    "shuffle_hash"
                ),
                src,
            )
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("in_mass"))
        )
        r = (
            nodes.join(contrib.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # checkpoint_every remains available for graphs deep enough
        # that even a linear lazy plan gets expensive to analyze;
        # default 1 now means "never mid-loop" is fine because the
        # chain no longer recomputes (truncation is an analysis-time
        # economy only)
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and (it + 1) < n_iter:
            r = r.localCheckpoint(eager=False)
    return r.select("node", "rank")


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 0,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    bounded at ``n_iter`` hops.

    ``sources`` must have a single ``node`` column. Returns
    (node, dist) for every node reached within ``n_iter`` hops —
    synchronous frontier relaxation: dist' = min(dist, min over
    in-neighbors dist+1). Per round ONE equi-join of the O(#reached)
    distance vector against the edge set and ONE min-aggregate keyed
    on the destination — the CC/pagerank shuffle shape, linear in |E|.
    Lineage is truncated every ``checkpoint_every`` rounds (default
    every round; see the pagerank cadence note). Unlike frontier-only BFS this relaxation is
    idempotent (min semiring), so stragglers re-relaxed in later
    rounds cannot change the result — the property that makes the
    unrolled-SQL oracle replay it exactly.

    The per-round state IS referenced twice (relax join + carry
    union), but both references sit directly above the same
    min-aggregate whose exchange is one shared AQE query stage
    (ReusedExchange), so the lazy chain does not recompute — only the
    cheap final-agg operator above the exchange is duplicated.
    ``checkpoint_every`` > 0 restores periodic truncation for loops
    deep enough that plan analysis itself gets expensive.
    """
    dist = sources.select("node", F.lit(0).alias("dist")).localCheckpoint(
        eager=False
    )
    for it in range(n_iter):
        # shuffled-hash build of the O(#reached) distance vector streams
        # the (pre-partitioned) edge set sort- and exchange-free per
        # round — the same deliberate strategy as the pagerank rounds
        relaxed = dist.hint("shuffle_hash").join(
            edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")),
            "node",
        ).select(F.col("nbr").alias("node"), (F.col("dist") + 1).alias("dist"))
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # both dist references share the aggregate's exchange stage
        # (docstring): lazy by default, periodic truncation opt-in
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and (it + 1) < n_iter:
            dist = dist.localCheckpoint(eager=False)
    return dist

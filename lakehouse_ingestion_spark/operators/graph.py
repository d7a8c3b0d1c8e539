"""Connected components over candidate-pair edges — the cluster-formation
step of near-duplicate deduplication.

Pair finders (MinHash-LSH banding, SimHash, embedding blocking) emit
EDGES; production dedup needs CLUSTERS: transitively connected groups
from which one canonical document survives. A doc similar to B and B to
C must collapse to one cluster even when A-C was never a candidate pair.

Algorithm: iterative min-label propagation, with optional pointer
jumping. Every node starts labeled with itself; each round every node
takes the min of its own label and its neighbors' labels; at fixpoint
every member of a component carries the component's minimum node id
(which doubles as a stable canonical id).

- ``algorithm="propagate"``: rounds needed = graph diameter. One
  shuffle join + one aggregation per round, all JVM-side — the leanest
  round for the shallow components near-dup pair finders emit.
- ``algorithm="jump"`` (default): propagation plus path halving (the
  Shiloach-Vishkin pointer-jumping idea) — every label is replaced by
  its label's label, so label-tree depth halves per round and
  convergence is O(log diameter). The extra self-join per round buys
  chain-shaped components (templated/boilerplate documents form them)
  safety from the round budget: a 200-link chain converges in ~10
  rounds instead of 200. The hop join is DEFERRED for the first
  ``_JUMP_WARMUP`` rounds (r12 optimization, guide §2.4/§1.2): the
  overwhelmingly common near-dup cluster is diameter <= 2, where plain
  propagation already converges and the hop join is one pure-overhead
  shuffle per round; deep chains still get halving from round 3 on,
  keeping the O(log d) budget (2 + log2 d rounds). Final labels are
  identical either way (min-label fixpoint; property-tested).

- ``algorithm="star"``: the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14). Each round rewrites the EDGE SET itself —
  large-star hangs every node's larger neighbors off the neighborhood
  minimum, small-star re-parents the smaller ones — so the graph
  contracts toward one star per component in O(log n) rounds with
  per-round shuffle volume proportional to the CURRENT edge set (which
  shrinks), not to a static node-label table. The right choice when
  single-round shuffle volume is the binding constraint (edge-heavy
  graphs at 100 TB).

All three converge to identical labels (property-tested on chains,
cliques, and random graphs).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checkpoint import release_local_checkpoint

log = logging.getLogger(__name__)

# propagate-only warmup rounds before "jump" adds its per-round hop
# join (see the module docstring): shallow graphs converge inside the
# warmup at propagate cost, deep chains still halve from round 3 on.
_JUMP_WARMUP = 2

# Relabel-delta broadcast gate for the incremental maintenance path:
# 2 long columns ~ 160 MB build side at this row count. Above it the
# hint is withheld so the relabel join degrades to a shuffle join
# instead of hitting the 8 GB broadcast ceiling (same rule as
# plans/hints.py::broadcast_if_under).
BROADCAST_DELTA_MAX_ROWS = 10_000_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    algorithm: str = "jump",
) -> DataFrame:
    """Resolve ``edges`` (undirected; direction of the input pairs is
    ignored) into (node, cluster_id) where ``cluster_id`` is the minimum
    node id of the component — a deterministic canonical id.

    Only nodes that appear in an edge are returned (singletons have no
    edges; callers union them back with cluster_id = own id if needed).
    Each iteration ``localCheckpoint``s the label frame: plain persist()
    caches data but leaves the logical plan growing (it doubles per
    round — by round 12 merely *formatting* the plan OOMs the driver),
    while checkpointing truncates lineage so plan size stays constant no
    matter the diameter. localCheckpoint stores blocks on executors; on
    a cluster with dynamic allocation use a reliable checkpoint dir
    instead. Raises if ``max_iterations`` rounds don't converge
    (diameter larger than the budget) rather than returning
    half-propagated labels.
    """
    if algorithm not in ("propagate", "jump", "star"):
        raise ValueError(
            f"algorithm must be 'propagate', 'jump' or 'star', got {algorithm!r}"
        )
    # NULL node ids fail loudly (same stance as operators/sampling.py):
    # a NULL can't label a component; silently emitting a (NULL, NULL)
    # cluster row would corrupt downstream canonical-doc selection
    bad = F.col(src).isNull() | F.col(dst).isNull()

    def _checked(c: str) -> Column:
        return F.when(
            bad,
            F.raise_error(
                F.lit("connected_components: edge endpoints must not be NULL")
            ),
        ).otherwise(F.col(c))

    if algorithm == "star":
        return _star_components(edges, src, dst, _checked, max_iterations)

    # bidirectional view via explode, not self-union: the (possibly
    # expensive) upstream edge plan is evaluated ONCE during bi's cache
    # materialization instead of once per union branch (r12, guide §2.4
    # — the LSH pair pipeline ran twice per CC call before). The view
    # also carries a SELF-LOOP per endpoint (r12): each round's "min of
    # my label and my neighbors' labels" then falls out of the one
    # join+groupBy — the per-round union branch that re-read the label
    # checkpoint for the self rows is gone, and the label table is
    # referenced exactly once per step (which is what makes the fused
    # first action below cheap). Cache layout: partitioned by the
    # round-join key `b` — distinct's (a, b) grouping is satisfied by
    # hash(b), so the build pays the SAME single exchange it always
    # did, while every round's bi-side join exchange disappears
    # (guide §2.4: operations keyed the same way share one exchange).
    bi = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        _checked(src).alias("a"), _checked(dst).alias("b")
                    ),
                    F.struct(
                        _checked(dst).alias("a"), _checked(src).alias("b")
                    ),
                    F.struct(
                        _checked(src).alias("a"), _checked(src).alias("b")
                    ),
                    F.struct(
                        _checked(dst).alias("a"), _checked(dst).alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select(F.col("__e.a").alias("a"), F.col("__e.b").alias("b"))
        .repartition("b")
        .distinct()
        .persist()
    )

    def _step(labels: DataFrame | None) -> DataFrame:
        """One label-propagation step: (node, cluster_id, __old) where
        cluster_id = min label over self + neighbors, __old = the
        incoming label (via the self-loop row). Round 1 needs no label
        table at all — labels start as the identity, so the step is a
        single map-side-combined groupBy over the edge set."""
        if labels is None:
            return (
                bi.groupBy(F.col("a").alias("node"))
                .agg(F.min("b").alias("cluster_id"))
                .select("node", "cluster_id", F.col("node").alias("__old"))
            )
        joined = bi.join(labels, bi["b"] == labels["node"]).select(
            bi["a"].alias("node"),
            (bi["a"] == bi["b"]).alias("__self"),
            F.col("cluster_id"),
        )
        return joined.groupBy("node").agg(
            F.min("cluster_id").alias("cluster_id"),
            F.min(F.when(F.col("__self"), F.col("cluster_id"))).alias("__old"),
        )

    # r12 round shape (guide §1.2/§2.4): exactly ONE action per round —
    # the changed-count, which doubles as the materialization of that
    # round's LAZY localCheckpoint (eager=True would spend a separate
    # job on the same scan). The FIRST action fuses steps 1+2: shallow
    # (star-shaped) components — the dominant near-dup case — converge
    # at step 1, and the old shape paid a second full action purely to
    # observe that; chaining step 2 lazily onto step 1 inside one
    # checkpoint+count does the identical total compute in half the
    # actions (step 2 is the detection round either way), and deeper
    # graphs continue with single-step rounds at unchanged cost.
    # `max_iterations` stays a budget on STEPS, not actions.
    labels = None
    try:
        it = 0
        while it < max_iterations:
            first_action = labels is None
            stepped = _step(labels)
            it += 1
            if first_action and it < max_iterations:
                stepped = _step(stepped.select("node", "cluster_id"))
                it += 1
            if algorithm == "jump" and it - 1 >= _JUMP_WARMUP:
                # path halving: follow the label one hop (every label IS
                # a node id present in `stepped`, by induction from the
                # self-labeled start) — label-tree depth halves per round
                # (the fused first action covers steps 0-1, both inside
                # the warmup, so the hop never applies to a fused step)
                hop = stepped.select(
                    F.col("node").alias("__jn"),
                    F.col("cluster_id").alias("__jc"),
                )
                stepped = stepped.join(
                    hop, stepped["cluster_id"] == hop["__jn"]
                ).select(
                    "node",
                    F.col("__jc").alias("cluster_id"),
                    F.col("__old"),
                )
            merged = stepped.select(
                "node",
                "cluster_id",
                (F.col("cluster_id") < F.col("__old")).alias("__changed"),
            ).localCheckpoint(eager=False)  # materialized by the count below
            changed = merged.filter(F.col("__changed")).count()
            # step N is materialized — step N-1's blocks are dead.
            # Freeing them here (not at ContextCleaner's GC leisure)
            # bounds live checkpoint blocks to 2 rounds no matter the
            # iteration count; see checkpoint.py.
            if labels is not None:
                release_local_checkpoint(labels)
            labels = merged.drop("__changed")
            if changed == 0:
                log.info("connected_components converged after %d rounds", it)
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(component diameter exceeds the budget); raise max_iterations"
        )
    finally:
        bi.unpersist()


def _star_components(
    edges: DataFrame,
    src: str,
    dst: str,
    _checked,
    max_iterations: int,
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al., SoCC'14).

    The edge set is kept in canonical orientation ``(x, y)`` with
    ``x > y``; each round applies

    - LARGE-STAR: for every node ``u`` (over the bidirectional view),
      with ``m = min(N(u) + {u})``, emit ``(v, m)`` for each neighbor
      ``v > u`` — strictly-larger neighbors re-hang off the local
      minimum;
    - SMALL-STAR: for every node ``u`` (grouping canonical edges by
      their LARGER endpoint), with ``m = min`` of its smaller neighbors,
      emit ``(v, m)`` for each smaller neighbor plus ``(u, m)`` — the
      smaller neighbors and ``u`` itself all attach to the minimum.

    The fixed point is one star per component rooted at the component's
    minimum id; labels fall straight out of the final edge set. Each
    round is two groupBy-min + join passes over the CURRENT edges, and
    the edge set only shrinks toward n-1 star edges — this is the
    shuffle-volume-optimal formulation for edge-heavy graphs.
    """
    # Pin the (possibly expensive) upstream edge plan ONCE — both the
    # node set and the canonical edge set derive from it, and without
    # the pin each materialization re-evaluates the whole pair pipeline
    # (r12: the LSH near-dup upstream ran twice per star call before).
    ed = edges.select(
        _checked(src).alias("s"), _checked(dst).alias("d")
    ).localCheckpoint(eager=False)  # materialized by all_nodes' job below
    # full node set BEFORE dropping self-loops: a node whose only edge
    # is (v, v) must still label itself (propagate/jump include it via
    # the bidirectional view; the star output must agree). Its EAGER
    # checkpoint job is what materializes ed's lazy one (r12 v2: ed's
    # separate eager-checkpoint job folded away — init is now 2 actions,
    # this one and the cur count, with the same peak block footprint).
    all_nodes = (
        ed.select(F.col("s").alias("node"))
        .union(ed.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    cur = (
        ed.select(
            F.greatest(F.col("s"), F.col("d")).alias("x"),
            F.least(F.col("s"), F.col("d")).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the count below
    )
    cur_count = cur.count()
    # both derived frames are materialized — the pinned input is dead
    release_local_checkpoint(ed)
    for it in range(max_iterations):
        # -- large-star over the bidirectional neighbor view ------------
        bi = cur.select(F.col("x").alias("a"), F.col("y").alias("b")).union(
            cur.select(F.col("y").alias("a"), F.col("x").alias("b"))
        )
        mins = bi.groupBy("a").agg(F.min("b").alias("mb"))
        m = F.least(F.col("a"), F.col("mb"))
        large = (
            bi.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("x"), m.alias("y"))
            .filter(F.col("x") != F.col("y"))
            .distinct()
        )
        # -- small-star over canonical orientation (group by larger) ----
        mins2 = large.groupBy("x").agg(F.min("y").alias("my"))
        with_min = large.join(mins2, "x")
        part_nbrs = with_min.filter(F.col("y") != F.col("my")).select(
            F.col("y").alias("x"), F.col("my").alias("y")
        )
        part_self = mins2.select(F.col("x"), F.col("my").alias("y"))
        nxt = (
            part_nbrs.union(part_self)
            .filter(F.col("x") != F.col("y"))
            .distinct()
            # lazy: the count below materializes blocks AND truncates
            # per-round lineage in the same job (r12 — eager spent a
            # separate job on the identical scan)
            .localCheckpoint(eager=False)
        )
        # fixed point: same canonical edge set as last round
        nxt_count = nxt.count()
        if nxt_count == cur_count and nxt.exceptAll(cur).count() == 0:
            log.info("star CC converged after %d rounds", it + 1)
            release_local_checkpoint(cur)
            attached = nxt.select(
                F.col("x").alias("node"), F.col("y").alias("cluster_id")
            )
            return (
                all_nodes.join(attached, "node", "left")
                .select(
                    "node",
                    F.coalesce("cluster_id", F.col("node")).alias("cluster_id"),
                )
            )
        # round's edge set is materialized and the convergence check
        # consumed the old one — free its blocks now (checkpoint.py)
        release_local_checkpoint(cur)
        cur = nxt
        cur_count = nxt_count
    raise RuntimeError(
        f"star connected components did not converge in {max_iterations} "
        "rounds; raise max_iterations"
    )


def incremental_components(
    labels: DataFrame | None,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    algorithm: str = "jump",
) -> DataFrame:
    """Fold a BATCH of new edges into a persisted (node, cluster_id)
    label table without re-running connected components over history —
    the cluster-maintenance step for continuous ingest (round 8; the
    same incremental posture as ``operators/incremental_dedup``, which
    maintains the PAIR index this consumes).

    ``labels=None`` bootstraps (plain ``connected_components`` over the
    batch). Otherwise:

    1. translate each new edge's endpoints to their CURRENT canonical
       label (unseen endpoints label themselves),
    2. run CC on that CONTRACTED graph — its node set is old cluster
       reps + brand-new nodes touched this batch, so the iterative part
       is batch-sized, never corpus-sized,
    3. relabel the persisted table through the (old rep -> new rep)
       delta — one equi-join against a broadcast-sized frame.

    Labels equal a full recompute over the union of all edge batches
    (property-tested): every persisted cluster_id is its component's
    minimum node id, so the contracted CC's minimum is the global
    minimum transitively. That invariant is REQUIRED of the input —
    feed this function only its own output or
    ``connected_components``'s.

    100-TB posture: history participates in exactly two narrow-column
    equi-joins (endpoint translation probes only batch edges; the
    relabel join's build side is the delta, bounded by the batch's
    touched components). Compare ``connected_components`` on the full
    pair set, whose every label round shuffles the corpus-sized label
    table. Batches that merely ADD members to existing clusters produce
    a delta that relabels nothing.
    """
    if labels is None:
        return connected_components(
            edges, src=src, dst=dst,
            max_iterations=max_iterations, algorithm=algorithm,
        )
    for c in ("node", "cluster_id"):
        if c not in labels.columns:
            raise ValueError(f"labels frame lacks column {c!r}")
    la = labels.select(
        F.col("node").alias("__ln"), F.col("cluster_id").alias("__lc")
    )
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    contracted = (
        e.join(la, e["__s"] == la["__ln"], "left")
        .select(
            F.coalesce("__lc", "__s").alias("__cs"), "__d"
        )
        .join(la, F.col("__d") == la["__ln"], "left")
        .select(
            F.col("__cs").alias(src),
            F.coalesce("__lc", "__d").alias(dst),
        )
        .filter(F.col(src) != F.col(dst))
        .distinct()
    )
    new_nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select("__d"))
        .distinct()
        .join(la, F.col("node") == la["__ln"], "anti")
        .select("node", F.col("node").alias("cluster_id"))
    )
    # No isEmpty() pre-check (r12: it cost one extra action per batch):
    # an all-intra-cluster batch yields an empty contracted graph, CC
    # over it returns an empty label frame in one cheap round, the
    # delta is empty, and the left-join relabel below keeps every
    # persisted row — identical output, one fewer job on the common
    # (non-empty) path.
    delta = connected_components(
        contracted, src=src, dst=dst,
        max_iterations=max_iterations, algorithm=algorithm,
    ).select(
        F.col("node").alias("__old_rep"), F.col("cluster_id").alias("__new_rep")
    )
    # the CC output is a checkpoint-materialized RDD with no plan
    # stats, so the planner can't see it's small — hint the broadcast
    # ourselves, but SIZE-GATED (counting the materialized blocks is
    # cheap): a bootstrap-sized batch can make the delta grow past
    # broadcast limits, and an unconditional hint would OOM instead of
    # degrading to a shuffle join (same rule as plans/hints.py)
    n_delta = delta.count()
    if n_delta == 0:
        # all batch edges fell inside existing clusters (the contracted
        # graph was empty) — labels unchanged; returning the INPUT state
        # is the no-op contract callers rely on (identity-checked in
        # tests), re-established here from the count the broadcast gate
        # pays for anyway.
        return labels
    if n_delta <= BROADCAST_DELTA_MAX_ROWS:
        delta = F.broadcast(delta)
    all_labels = labels.unionByName(new_nodes)
    return (
        all_labels.join(
            delta,
            all_labels["cluster_id"] == delta["__old_rep"],
            "left",
        )
        .select(
            "node",
            F.coalesce("__new_rep", "cluster_id").alias("cluster_id"),
        )
    )


class ComponentsDelta:
    """What one edge batch did to the label state, without ever
    materializing the full label table (round 9; the streaming curation
    sink's label maintenance — VERDICT r8 "What's wrong #2" asked for
    label DELTAS instead of a full overwrite per trigger).

    * ``node_labels`` — (node, cluster_id) for every node of the
      CONTRACTED graph (old component reps + nodes first seen in this
      batch), i.e. the batch's view of where its clusters now point.
    * ``moves`` — (__old_rep, __new_rep) rows where the label CHANGED:
      merged-away old reps plus first-seen nodes that did not become
      their component's minimum. Any persisted row keyed by an
      ``__old_rep`` (label rows, rep-keyed assignment rows) must be
      re-keyed through this map.
    * ``label_delta`` — the (node, cluster_id) rows to APPEND to a
      latest-epoch-wins label log: relabeled members of merged history
      clusters plus every first-seen node. Sized O(members of touched
      components + batch), never O(corpus).

    The invariant that makes the O(K) read path sound: every time a
    rep merges away, ALL its members' label rows are re-emitted in the
    same delta — so a stored row whose cluster_id is a CURRENT rep is
    by construction the node's latest row (stale rows always point at
    reps that have since merged away and been superseded).
    """

    def __init__(
        self, node_labels: DataFrame, moves: DataFrame, label_delta: DataFrame
    ) -> None:
        self.node_labels = node_labels
        self.moves = moves
        self.label_delta = label_delta


def incremental_components_delta(
    labels: DataFrame | None,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    algorithm: str = "jump",
    epoch_col: str | None = None,
) -> ComponentsDelta:
    """Delta-only face of ``incremental_components`` for callers that
    persist the label state as an append-only, latest-wins LOG instead
    of rewriting the full table per batch (the streaming curation
    sink). ``labels`` is the RAW log — it may hold multiple rows per
    node across epochs; when ``epoch_col`` is given, per-node latest
    rows are resolved by max-``epoch_col`` AFTER the (batch-sized)
    semi-join onto this batch's edge endpoints, so history is never
    shuffled corpus-wide.

    Semantics match ``incremental_components`` exactly: folding every
    returned ``label_delta`` into the log (latest epoch wins) yields
    the same (node, cluster_id) mapping as the full-table variant fed
    the same batches (pinned by ``tests/test_llm_curation.py``).

    100-TB posture: history is touched by (a) one semi-join probed by
    batch endpoints and (b) one scan filtered by the broadcast-sized
    ``__old_rep`` set — both shuffle O(touched members), and the
    iterative CC runs on the contracted batch graph only.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    endpoints = e.select(F.col("__s").alias("node")).union(
        e.select(F.col("__d").alias("node"))
    ).distinct()
    if labels is None:
        ep_labels = None
    else:
        for c in ("node", "cluster_id"):
            if c not in labels.columns:
                raise ValueError(f"labels frame lacks column {c!r}")
        matched = labels.join(endpoints, "node", "semi")
        if epoch_col is not None and epoch_col in labels.columns:
            # multi-epoch log: latest row per endpoint (batch-sized agg)
            ep_labels = matched.groupBy("node").agg(
                F.max_by("cluster_id", F.col(epoch_col)).alias("cluster_id")
            )
        else:
            ep_labels = matched.select("node", "cluster_id")
    if ep_labels is None:
        known = endpoints.limit(0)
        la = None
    else:
        la = ep_labels.select(
            F.col("node").alias("__ln"), F.col("cluster_id").alias("__lc")
        )
        known = ep_labels.select("node")
    new_nodes = endpoints.join(known, "node", "left_anti")
    if la is not None:
        contracted = (
            e.join(la, e["__s"] == la["__ln"], "left")
            .select(F.coalesce("__lc", "__s").alias("__cs"), "__d")
            .join(la, F.col("__d") == la["__ln"], "left")
            .select(
                F.col("__cs").alias(src),
                F.coalesce("__lc", "__d").alias(dst),
            )
        )
    else:
        contracted = e.select(F.col("__s").alias(src), F.col("__d").alias(dst))
    contracted = contracted.filter(F.col(src) != F.col(dst)).distinct()
    # No isEmpty() pre-check (r12, same reasoning as
    # incremental_components): an empty contracted graph flows through
    # CC (one cheap round, empty labels), so moves / new_rows /
    # member_rows / label_delta all come out empty — identical
    # ComponentsDelta, one fewer action on the common path.
    cc = (
        connected_components(
            contracted, src=src, dst=dst,
            max_iterations=max_iterations, algorithm=algorithm,
        )
        .select(F.col("node"), F.col("cluster_id"))
        # consumed by moves + new_rows + the member gate count: pin the
        # (batch-sized) frame once instead of re-running the CC rounds
        .localCheckpoint(eager=True)
    )
    moves = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("__old_rep"),
        F.col("cluster_id").alias("__new_rep"),
    )
    # first-seen nodes write their label row whether or not they became
    # the component minimum; contracted singleton endpoints never reach
    # cc (CC emits edge-connected nodes only), but a new node always
    # shares a surviving contracted edge, so cc covers all of them
    new_rows = cc.join(new_nodes, "node", "semi")
    if labels is None:
        member_rows = new_rows.limit(0)
    else:
        gate_moves = moves
        if gate_moves.count() <= BROADCAST_DELTA_MAX_ROWS:
            gate_moves = F.broadcast(gate_moves)
        # latest rows of merged clusters' members: by the class-docstring
        # invariant, rows whose cluster_id is a (current) old rep ARE the
        # latest rows — no per-node resolution needed
        member_rows = (
            labels.join(
                gate_moves,
                labels["cluster_id"] == gate_moves["__old_rep"],
            )
            .select("node", F.col("__new_rep").alias("cluster_id"))
        )
    label_delta = member_rows.unionByName(
        new_rows.select("node", "cluster_id")
    )
    return ComponentsDelta(cc, moves, label_delta)


def dedup_clusters(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Cluster verified near-dup pairs and summarize each cluster:
    (cluster_id = canonical doc, n_members, members_sum). ``members_sum``
    pins the exact membership for cross-engine checks."""
    cc = connected_components(pairs, src=left, dst=right)
    return cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("node").alias("members_sum"),
    )


def cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Pick one surviving document per near-dup cluster — the "keep the
    best copy" step that turns pair edges into an actual dedup decision.

    Every document appears exactly once in the output: paired docs carry
    their component's canonical ``cluster_id``, unpaired docs are their
    own singleton cluster (left join + coalesce — no doc silently
    drops). The representative is the cluster's max-``score_col`` row,
    ties broken by min id (a total order, so both engines agree).
    Returns ``cluster_id, rep_id, rep_score, n_members``.

    One CC run over the (tiny) pair set plus one window shuffle over the
    corpus keyed by cluster — the corpus never joins against itself."""
    from pyspark.sql.window import Window

    cc = connected_components(pairs, src=left, dst=right)
    j = df.select(
        F.col(id_col).alias("__id"), F.col(score_col).alias("__score")
    ).join(cc, F.col("__id") == cc["node"], "left")
    labeled = j.select(
        "__id",
        "__score",
        F.coalesce(cc["cluster_id"], F.col("__id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__score"), F.col("__id")
    )
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("__rk") == 1)
        .select(
            "cluster_id",
            F.col("__id").alias("rep_id"),
            F.col("__score").alias("rep_score"),
            "n_members",
        )
    )

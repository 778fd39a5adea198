"""Connected components over a pair table — the canonicalization step
every near-dup pipeline needs (LSH emits PAIRS; survivor selection
needs CLUSTERS: pair → component → keep-one).

Extends the reference's exact-dedup intent (tools/ingest_runner.py:
1576-1588 keeps one row per key) to transitively-linked near-dup sets.

Algorithm: iterative minimum-label propagation. Every node starts
labeled with its own id; each round, a node takes the min of its label
and its neighbors' labels; converged when no label changes. Rounds
needed = graph diameter — for near-dup graphs that is small (dup
clusters are tight cliques/chains), which is why label propagation is
the standard choice over pointer-doubling (large-star/small-star,
Kiveris et al. "Connected Components in MapReduce", SoCC'14) until
diameters get pathological.

Scale notes (100 TB):
- Each round is one (src-keyed) shuffle join + one groupBy min with
  map-side partial aggregation — O(E) per round, no quadratic term.
- ``localCheckpoint`` after every round truncates the lineage chain so
  plan size stays constant across iterations (the standard iterative-
  algorithm guard; without it round k replays rounds 1..k-1).
- The convergence probe is a scalar ``count`` per round (driver gets
  ONE number, never data).
- ``max_iter`` bounds worst-case chains; hitting the bound raises
  rather than silently emitting a half-merged labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automatic_etl_spark.operators.checkpoints import (
    release as checkpoints_release,
)


# Public home: operators/checkpoints.release (r15 — promoted per r14
# ADVICE so the version-brittle reflection lives in exactly one
# module); the private alias stays because round-14 A/B tooling
# (tools/ab_interleaved.py) and historical docs reference it.
_release_checkpoint = checkpoints_release


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iter: int = 20,
    compress: bool = False,
    stats: dict | None = None,
    delta_frontier: bool = False,
) -> DataFrame:
    """Label every node with its component's MINIMUM node id.

    ``nodes``: one row per node (singletons included — unpaired docs
    become their own component). ``edges``: undirected pairs.
    Returns (node, component). When ``stats`` is a dict, it receives
    ``{"rounds": n}`` on return — the number of hook rounds executed
    including the final no-change probe round (the observable the
    round-count pin and the compress-crossover analysis rest on).

    ``compress=True`` adds a pointer-jumping step per round
    (Shiloach-Vishkin hook+compress): after the neighbor-min hook,
    every label is replaced by its label's label (p(u) := p(p(u)) via
    one self-join). Information reach then grows ~2^t instead of t, so
    rounds drop from O(diameter) to O(log diameter) at the cost of a
    second shuffle join per round. Measured crossover (COVERAGE.md r8
    attribution): a compress round costs ~1.6× a plain round, so
    compress wins when diameter+1 > 1.6·(⌈log₂ d⌉+1) — **d ≥ 4**. Use
    it for long chains; plain label propagation stays the default on
    the tight near-dup cliques where diameter ≈ 1-3. Both variants
    converge to the identical min-label fixpoint (compress is a no-op
    at the fixpoint, where every label is already the component min,
    so the hook-only convergence probe remains exact).

    ``delta_frontier=True`` joins only the CHANGED labels (last
    round's frontier) against the edge blocks instead of the full
    label table — sound because after round k every node's label ≤
    every neighbor's round-(k-1) label, so an unchanged neighbor can
    never win a later min (round 1's frontier is all nodes; with
    compress, jump-lowered labels are tracked into the frontier too).
    Measured and left OFF by default (r15 A/B,
    bench_baselines/ab_cc_delta_r15.jsonl): on the near-dup fixture
    graphs it ran +3…+9% slower at BOTH sf0.1 and the 10× stress
    corpus — these graphs converge in ~3 rounds with round 1 doing
    almost all the work, so the saved late-round shuffle is smaller
    than the added per-round filter/plan overhead. Flip it on when
    the regime inverts: many rounds over a large label table with a
    geometrically shrinking frontier (long-diameter graphs at cluster
    scale), where rounds 2+ stop shuffling the O(V) label table and
    the O(E) edge blocks entirely once the frontier broadcasts.
    """
    # Materialize the DIRECTED edge list first (r14): the symmetrize
    # union references `edges` twice, and for LSH-verified near-dup
    # edges that subtree is the expensive front of the whole query —
    # without this checkpoint the one `sym` materialization evaluates
    # the candidate-generation + Jaccard-verify pipeline TWICE (the
    # two union branches differ in projection, so Spark's
    # ReusedExchange cannot collapse them).
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # No distinct and no second checkpoint on the symmetrized view
    # (r14): min-label propagation is duplicate-insensitive (the
    # groupBy MIN below is unchanged by repeated edges), so the
    # distinct's full shuffle bought nothing, and the union over the
    # materialized directed blocks is narrow/constant-depth — each
    # round re-reads the blocks, never recomputes the edge front.
    # (Heavily duplicated caller edge lists would inflate the per-round
    # join input — the near-dup callers all pass unique a<b pairs.)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)
    prev_ckpt = labels
    # round 1's frontier is all nodes (initial labels count as
    # changed); only consulted when delta_frontier is on
    frontier = labels

    for round_no in range(1, max_iter + 1):
        if stats is not None:
            stats["rounds"] = round_no
        hook_src = frontier if delta_frontier else labels
        nbr_min = (
            hook_src.join(sym, hook_src["node"] == sym["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        relabeled = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.col("nbr_component").isNotNull()
                    & (F.col("nbr_component") < F.col("component"))
                )
                .cast("int")
                .alias("changed"),
            )
            # LAZY checkpoint (r14): the convergence probe right below
            # is the materializing action — its partial-agg map stage
            # computes every partition exactly once and persists the
            # blocks as it goes, so eager=True's separate count job per
            # round bought nothing. (Lazy is only safe when the FIRST
            # consumer reads the frame exactly once: the probe does;
            # `edges`/`labels` above stay eager because their first
            # consumer reads them from two concurrent stages, which
            # would compute the subtree twice.) One scheduler barrier
            # per round removed — on the spiky sandbox VM each job is
            # also one more draw from the multi-second-stall tail.
            .localCheckpoint(eager=False)
        )
        changed = relabeled.agg(F.sum("changed")).first()[0] or 0
        # the new checkpoint is materialized — the previous round's
        # label blocks are dead weight from here, free them now
        # (prev_ckpt is always the checkpoint FRAME itself: a
        # projection over it would not expose the LogicalRDD)
        _release_checkpoint(prev_ckpt)
        prev_ckpt = relabeled
        labels = relabeled.drop("changed")
        if changed == 0:
            _release_checkpoint(edges)
            return labels
        if delta_frontier:
            # next round's frontier: a narrow filter over the fresh
            # checkpoint blocks, never a recomputation
            frontier = relabeled.filter(F.col("changed") == 1).drop(
                "changed"
            )
        if compress:
            # p(u) := p(p(u)) — component values are node ids, so the
            # lookup is a self-join; inner is safe (every component id
            # is present as a node). The jump can LOWER labels the
            # hook's `changed` flag never saw, so the delta frontier
            # must also capture jump-changed nodes: `j_changed` ORs
            # the hook flag with a strict jump decrease (labels only
            # ever decrease, so p_component < component is exact).
            j_cols = [
                F.col("l.node").alias("node"),
                F.col("p_component").alias("component"),
            ]
            if delta_frontier:
                j_cols.append(
                    (
                        (F.col("l.changed") == 1)
                        | (F.col("p_component") < F.col("l.component"))
                    )
                    .cast("int")
                    .alias("j_changed")
                )
            jumped = (
                relabeled.alias("l")
                .join(
                    relabeled.select(
                        F.col("node").alias("p_node"),
                        F.col("component").alias("p_component"),
                    ),
                    F.col("l.component") == F.col("p_node"),
                )
                .select(*j_cols)
            )
            jumped = jumped.localCheckpoint(eager=True)
            _release_checkpoint(prev_ckpt)
            prev_ckpt = jumped
            if delta_frontier:
                labels = jumped.drop("j_changed")
                frontier = jumped.filter(F.col("j_changed") == 1).drop(
                    "j_changed"
                )
            else:
                labels = jumped
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds — "
        "graph diameter exceeds the bound; raise max_iter or switch to "
        "pointer-doubling"
    )

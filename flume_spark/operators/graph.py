"""Graph analytics over edge tables — PageRank as bounded driver-loop
iterations (the connected_components / kmeans pattern: per round one
partial-agg shuffle, only scalars cross the driver).

No reference analog (the reference processes no graphs); engine-native
per the LLM-pipeline/scale mandate.

Scale shape per iteration: ranks live distributed keyed by vertex;
contributions = ranks ⋈ edges on src (one equi-join, shuffle bounded by
|E|), grouped by dst (one partial-agg shuffle).  Nothing vertex- or
edge-sized ever reaches the driver — only the dangling-mass and delta
scalars.  At 100 TB-scale graphs the same loop runs with edges bucketed
by src so the per-iteration join is exchange-free on the edge side
(exactly the band-index treatment in operators/dedup.py).

Determinism: the full iterative ranks are float sums whose partial-agg
order varies — approximate by design (driver records rows-only), gated
by invariant tests (mass conservation, convergence).  The hash-checkable
deterministic core is `pagerank_step_exact`: one step from the uniform
vector with integer micro-contributions (round(1e12/out_degree) as
BIGINT), so every aggregation is an EXACT integer sum — engine-identical
regardless of order, the same trick the repo's cents-exact revenue
queries use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000_000_000  # 1e12 fixed-point scale for exact contributions


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    return edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Standard damped PageRank over a directed edge list.

    Dangling vertices (no out-edges) redistribute their mass uniformly —
    the scalar `dangling_mass / N` is the only per-iteration driver
    value.  Returns (vertex, rank); ranks sum to 1 (invariant-tested).
    """
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .unionByName(edges.select(F.col(dst).alias("vertex")))
        .distinct()
        .cache()
    )
    n = verts.count()
    degs = out_degrees(edges, src)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        with_deg = ranks.join(degs, "vertex", "left")
        # mass parked on dangling vertices, redistributed uniformly
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(edges, F.col("vertex") == F.col(src))
            .select(
                F.col(dst).alias("vertex"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # truncate lineage like connected_components — each iteration
            # otherwise stacks a join+agg onto an ever-deeper plan
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_step_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
) -> DataFrame:
    """ONE PageRank step from the uniform vector, in exact integer
    arithmetic: vertex u contributes round(MICRO / out_deg(u)) integer
    micro-units along each out-edge, so the per-vertex inflow is an exact
    BIGINT sum (aggregation-order-independent — hash-checkable), and
    N * rank_1(v) = (1-d) + d * inflow_micro / MICRO exactly as written.

    Quantization error vs the real step is < out_deg * 5e-13 per vertex —
    irrelevant for ranking, decisive for cross-engine determinism.
    Returns (vertex, inflow_micro, n_rank1: rounded N*rank after one step).
    """
    degs = out_degrees(edges, src)
    contribs = (
        edges.join(degs, F.col(src) == F.col("vertex"))
        .select(
            F.col(dst).alias("v"),
            F.floor(F.lit(MICRO) / F.col("out_deg") + F.lit(0.5))
            .cast("long")
            .alias("c_micro"),
        )
        .groupBy("v")
        .agg(F.sum("c_micro").alias("inflow_micro"))
    )
    verts = (
        edges.select(F.col(src).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
    )
    return (
        verts.join(contribs, "v", "left")
        .select(
            F.col("v").alias("vertex"),
            F.coalesce(F.col("inflow_micro"), F.lit(0)).alias("inflow_micro"),
            F.round(
                F.lit(1.0 - damping)
                + F.lit(damping)
                * F.coalesce(F.col("inflow_micro"), F.lit(0)).cast("double")
                / F.lit(float(MICRO)),
                9,
            ).alias("n_rank1"),
        )
    )

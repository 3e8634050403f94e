"""Deterministic Lloyd's k-means over an ``array<float>`` embedding column —
the corpus-partitioning / IVF-codebook-training step of an embedding
pipeline (the IVF ANN operator in operators/similarity.py consumes exactly
such a codebook).

No reference analog ([NS] north-star operator). Design:

- everything runs on the *exploded* (key, dim, value) form: distances and
  centroid updates are codegen'd hash aggregations over (key × k × dim)
  rows — no interpreted array lambdas in the hot path, no collect();
- centroids live in a tiny (cluster, dim, c) frame broadcast into the
  assignment join; state per iteration is localCheckpoint'd (constant-size
  lineage, same discipline as operators/graph.py);
- determinism across engines/runs: init is the k smallest keys; distances
  and updated centroids are rounded (6 dp) before comparison so
  aggregation-order noise in the last double bits can't flip an argmin;
  argmin ties break toward the smaller cluster id.

Scale notes: the exploded assignment join shuffles nothing (centroids are
broadcast; the groupBy(key, cluster) partial-aggregates map-side); the
centroid update is one k×dim-sized aggregate. Iterations are O(1) jobs
each — the classic driver-orchestrated iterative-ML shape where data never
leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dims(df: DataFrame, vec_col: str, key_col: str) -> DataFrame:
    return df.select(
        F.col(key_col), F.posexplode(vec_col).alias("d", "_xf")
    ).select(key_col, "d", F.col("_xf").cast("double").alias("x"))


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """(key, cluster, dist) hard assignments after ``iters`` Lloyd rounds.

    ``cluster`` is 0-based in init order (the i-th smallest key seeds
    cluster i); ``dist`` is the squared L2 distance (rounded 6 dp) to the
    centroid the point was assigned to in the last assignment step (i.e.
    the round-``iters-1`` centroids — assignment precedes the update).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dims = _dims(df, vec_col, key_col).localCheckpoint()
    seeds = (
        df.select(key_col)
        .orderBy(key_col)
        .limit(k)
        .select(
            F.col(key_col).alias("_seed"),
            (F.row_number().over(W.orderBy(key_col)) - 1).cast("long").alias("cluster"),
        )
    )
    cent = (
        seeds.join(dims, seeds["_seed"] == dims[key_col])
        .select("cluster", "d", F.col("x").alias("c"))
        .localCheckpoint()
    )

    assign = None
    for _ in range(iters):
        dist = (
            dims.join(F.broadcast(cent), "d")
            .groupBy(key_col, "cluster")
            .agg(
                F.round(
                    F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 6
                ).alias("dist")
            )
        )
        w = W.partitionBy(key_col).orderBy("dist", "cluster")
        assign = (
            dist.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(key_col, "cluster", "dist")
            .localCheckpoint()
        )
        cent = (
            assign.join(dims, key_col)
            .groupBy("cluster", "d")
            .agg(F.round(F.avg("x"), 6).alias("c"))
            .localCheckpoint()
        )
    return assign

"""Distributed iterative ML primitives (SURVEY.md §2.12b companion).

``ml_kmeans_embeddings`` is Lloyd's k-means over the embeddings table —
the coarse-quantizer trainer that ``sim_ann_ivf`` / ``sim_ann_ivf_pruned``
presuppose (their docstrings say "cells come from a k-means coarse
quantizer"; this operator is that trainer). Fixed K and iteration count,
deterministic initialization, so the whole trajectory is reproducible
and oracle-able.

Distribution strategy (the Spark-MLlib shape, expressed relationally):
vectors live in long form (id, dim, x) — one posexplode, after which
every k-means step is a plain join + groupBy Catalyst plans like any
other aggregation. Per iteration: distances are a (N·D)⋈(K·D) join
grouped to (N·K), the argmin is a min-of-struct, and the centroid
update is a (cluster, dim) average. At 100 TB the only fact-sized
shuffles key on the vector id / (cluster, dim) — K·D is dim-sized and
broadcasts. Each iteration ``localCheckpoint``s the K·D centroid table
(truncating lineage growth, the graph_pagerank discipline); nothing
fact-sized ever reaches the driver.

Cross-engine determinism (PARITY.md discipline):
- float32 inputs are cast to DOUBLE at extraction on BOTH engines, so
  all arithmetic is float64 from the start (float32 kernels would
  round differently).
- centroids are ROUNDED to 6dp (IEEE-exact floor form) after every
  update — the per-(cluster,dim) mean is the one summation-order-
  sensitive value in the loop, and rounding collapses its ~1e-15 drift
  so both engines iterate from bit-identical centroids.
- the argmin tie-breaks on cluster id (min-of-struct / ORDER BY
  dist2, cl), so equidistant points cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manual_data_ingest_spark.functions.rounding import rnd, sql_rnd
from manual_data_ingest_spark.io import load_table
from manual_data_ingest_spark.registry import register

_K = 8
_ITERS = 3
_DIM = 64


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    """The identical Lloyd trajectory unrolled into portable SQL CTEs."""
    head = f"""
WITH v AS (
  SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings
), vd AS (
  SELECT id, t.d AS d, CAST(embedding[CAST(t.d AS INTEGER)] AS DOUBLE) AS x
  FROM v, generate_series(1, {dim}) AS t(d)
), init AS (
  SELECT id, row_number() OVER (ORDER BY id) - 1 AS cl
  FROM (SELECT id FROM v ORDER BY id LIMIT {k})
), cd0 AS (
  SELECT init.cl, vd.d, {sql_rnd('avg(vd.x)', 6)} AS c
  FROM init JOIN vd USING (id) GROUP BY init.cl, vd.d
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""", dist{i} AS (
  SELECT vd.id, cd.cl, sum((vd.x - cd.c) * (vd.x - cd.c)) AS dist2
  FROM vd JOIN cd{i-1} cd USING (d)
  GROUP BY vd.id, cd.cl
), assign{i} AS (
  SELECT id, cl, dist2 FROM dist{i}
  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, cl) = 1
), cd{i} AS (
  SELECT a.cl, vd.d, {sql_rnd('avg(vd.x)', 6)} AS c
  FROM assign{i} a JOIN vd USING (id) GROUP BY a.cl, vd.d
)""")
    tail = f""", final_dist AS (
  SELECT vd.id, cd.cl, sum((vd.x - cd.c) * (vd.x - cd.c)) AS dist2
  FROM vd JOIN cd{iters} cd USING (d)
  GROUP BY vd.id, cd.cl
), final_assign AS (
  SELECT id, cl, dist2 FROM final_dist
  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist2, cl) = 1
)
SELECT cl AS cluster,
       count(*) AS n_vecs,
       {sql_rnd('sum(dist2)', 4)} AS inertia,
       {sql_rnd('avg(dist2)', 6)} AS mean_dist2
FROM final_assign
GROUP BY cl
"""
    return head + "".join(steps) + tail


@register("ml_kmeans_embeddings", _kmeans_oracle(_K, _ITERS, _DIM))
def ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (K=8, 3 fixed iterations) over the embedding
    corpus; init = the K lowest-id vectors. Returns per-cluster size,
    inertia and mean squared distance under the final centroids.
    Oracle: the identical trajectory unrolled into SQL CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(F.col("vec_id").cast("long").alias("id"), "embedding")

    # long form: (id, d, x) with x promoted to double BEFORE any math
    vd = (v.select("id", F.posexplode("embedding").alias("d", "x"))
          .select("id", (F.col("d") + 1).alias("d"),
                  F.col("x").cast("double").alias("x"))
          .localCheckpoint(eager=True))  # explode once, reuse per iteration

    init = (v.orderBy("id").limit(_K)
            .select("id", (F.row_number().over(Window.orderBy("id")) - 1)
                    .alias("cl")))
    cd = (init.join(vd, "id")
          .groupBy("cl", "d")
          .agg(rnd(F.avg("x"), 6).alias("c")))

    def assign_against(centroids: DataFrame) -> DataFrame:
        dist = (vd.join(F.broadcast(centroids), "d")
                .groupBy("id", "cl")
                .agg(F.sum((F.col("x") - F.col("c"))
                           * (F.col("x") - F.col("c"))).alias("dist2")))
        return (dist.groupBy("id")
                .agg(F.min(F.struct("dist2", "cl")).alias("m"))
                .select("id", F.col("m.cl").alias("cl"),
                        F.col("m.dist2").alias("dist2")))

    for _ in range(_ITERS):
        assign = assign_against(cd)
        cd = (assign.join(vd, "id")
              .groupBy("cl", "d")
              .agg(rnd(F.avg("x"), 6).alias("c"))
              .localCheckpoint(eager=True))  # K·D rows; truncates lineage

    final = assign_against(cd)
    return (final.groupBy(F.col("cl").alias("cluster"))
            .agg(F.count("*").alias("n_vecs"),
                 rnd(F.sum("dist2"), 4).alias("inertia"),
                 rnd(F.avg("dist2"), 6).alias("mean_dist2")))

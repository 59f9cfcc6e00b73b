"""Embedding similarity search: exact top-k + LSH-bucketed ANN.

s48 brute-force cosine top-k is the correctness baseline (oracle:
DuckDB with the identical sequential-fold dot product). s49 is the
scale path: random-hyperplane LSH buckets then exact re-rank within
buckets — at 100 TB the bucket join replaces the all-pairs product, and
recall is tuned with more tables/probes, not more comparisons.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.exact import fold_dot, fold_dot_sql
from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5


@query(
    "s48_cosine_topk",
    f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt({fold_dot_sql("embedding", "embedding")}) AS nrm
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {fold_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    ranked AS (
      SELECT q_id, n_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, n_id) AS INTEGER) AS rank
      FROM scored)
    SELECT q_id, n_id, ROUND(cosine, 6) AS cosine_r, rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def s48_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a small query set against the corpus.

    The query side is broadcast (tiny), so the corpus never shuffles;
    per-query top-k is a window rank — Spark pushes a partial top-k
    before the shuffle. Ranking on the bit-exact fold keeps order
    identical to the oracle."""
    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id", "embedding", F.sqrt(fold_dot("embedding", "embedding")).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = fold_dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    scored = (
        n.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos.alias("cosine"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("q_id", "n_id", F.round("cosine", 6).alias("cosine_r"), "rank")
    )


_N_TABLES = 4  # independent hash tables (union of candidates)
_BITS_PER_TABLE = 5  # 32 buckets per table
_DIM = 64
_rng = random.Random(1234)
_PLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(_BITS_PER_TABLE)]
    for _ in range(_N_TABLES)
]


@query("s49_ann_lsh_topk")  # approximate → rows-only check
def s49_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 4 independent tables
    of 5-bit sign signatures → union of bucket-mates → exact cosine
    re-rank → top-3 per query.

    Scale shape: signature computation is a per-row map (no shuffle);
    candidate generation shuffles on (table, bucket) only; exact cosine
    runs on bucket-mates, not the full corpus. Recall tunes with table
    count / multi-probe — multiplying only the bucket join, never an
    all-pairs product. (On this synthetic near-orthogonal corpus recall
    is intrinsically modest; clustered real embeddings collide far
    more.)"""
    em = t(spark, sf_dir, "embeddings")
    sig = em.select(
        "vec_id",
        "embedding",
        F.sqrt(fold_dot("embedding", "embedding")).alias("nrm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ti).alias("tbl"),
                        sum(
                            [
                                F.when(
                                    fold_dot(
                                        F.col("embedding"),
                                        F.array(*[F.lit(v) for v in _PLANES[ti][j]]),
                                    )
                                    > 0,
                                    1 << j,
                                ).otherwise(0)
                                for j in range(_BITS_PER_TABLE)
                            ],
                            F.lit(0),
                        ).alias("bucket"),
                    )
                    for ti in range(_N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "nrm", "tb.tbl", "tb.bucket")
    q = sig.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "tbl",
        "bucket",
    )
    cos = fold_dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
    cand = (
        sig.join(F.broadcast(q), on=["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos.alias("cosine"))
        .dropDuplicates(["q_id", "n_id"])
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "n_id", F.round("cosine", 6).alias("cosine_r"), "rank")
    )

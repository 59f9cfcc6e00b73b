"""Embedding similarity search: exact top-k + LSH and IVF ANN paths.

s48 brute-force cosine top-k is the correctness baseline (oracle:
DuckDB with the identical sequential-fold dot product). s49 is one
scale path: random-hyperplane LSH buckets then exact re-rank within
buckets — at 100 TB the bucket join replaces the all-pairs product, and
recall is tuned with more tables/probes, not more comparisons. s50 is
the other canonical scale path, IVF: a tiny coarse-quantizer centroid
set partitions the corpus into disjoint cells; queries probe only their
nprobe nearest cells. Unlike s49's random planes, s50's quantizer is
data-derived and fully deterministic, so it is exact-oracle-checkable.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_materialized, persist_once

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.functions.exact import (
    fold_dot,
    fold_dot_sql,
    fold_norm,
    fold_norm_sql,
)
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


_IVF_K = 16  # coarse-quantizer cells (↑ to sqrt(n) at scale)
_IVF_NPROBE = 2  # cells each query probes
_IVF_TOP_K = 3


@query(
    "s50_ann_ivf_topk",
    f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, embedding, nrm, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, embedding, nrm, c_id FROM ranked WHERE rn = 1),
    probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
      FROM ranked WHERE vec_id < {_N_QUERIES} AND rn <= {_IVF_NPROBE}),
    rescored AS (
      SELECT p.q_id, m.vec_id AS n_id,
             {fold_dot_sql("p.q_emb", "m.embedding")} / (p.q_nrm * m.nrm) AS cosine
      FROM probe p JOIN cell m ON m.c_id = p.c_id
      WHERE m.vec_id <> p.q_id),
    final AS (
      SELECT q_id, n_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, n_id) AS INTEGER) AS rank
      FROM rescored)
    SELECT q_id, n_id, ROUND(cosine, 6) AS cosine_r, rank
    FROM final WHERE rank <= {_IVF_TOP_K}
    """,
)
def s50_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via an IVF (inverted-file) index: a 16-centroid coarse
    quantizer partitions the corpus into disjoint cells; each query
    probes its 2 nearest cells and exact-reranks only their members.

    The quantizer here is deterministic sampled centroids (corpus
    vectors 10..25) rather than Lloyd-iterated k-means — same physical
    shape, but exact-oracle-checkable (production would refine the
    centroids offline; the plan is unchanged). Scale shape: the
    centroid set is O(sqrt(n)) and broadcast, so cell assignment is a
    per-row map over a broadcast product bounded by K, never a data ×
    data product; the inverted lists carry the vectors (one
    map-side-combinable agg picks each row's cell); candidate
    generation is an equi-join on c_id touching ~nprobe/K of the
    corpus per query. Complements s49: IVF gives tunable recall via
    nprobe with disjoint cells, LSH via multi-table union."""
    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id", "embedding", F.sqrt(fold_dot("embedding", "embedding")).alias("nrm")
    )
    cent = n.filter(
        (F.col("vec_id") >= _N_QUERIES) & (F.col("vec_id") < _N_QUERIES + _IVF_K)
    ).select(
        (F.col("vec_id") - _N_QUERIES).cast("int").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    # Deliberate broadcast product vs the K-row centroid table: the
    # fan-out is bounded by the quantizer size, not by data (the one
    # sanctioned nested-loop shape besides d47/q48 — see
    # test_plan_quality.test_no_accidental_cartesian_products).
    ccos = fold_dot("embedding", "c_emb") / (F.col("nrm") * F.col("c_nrm"))
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "nrm", "c_id", ccos.alias("ccos")
    )
    # argmax over centroids = max(struct(ccos, -c_id)): highest cosine,
    # smallest c_id on ties — identical order to the oracle's
    # ROW_NUMBER(ORDER BY ccos DESC, c_id). Map-side combinable, and
    # first(embedding/nrm) is deterministic (constant within group).
    cell = (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct(F.col("ccos"), (-F.col("c_id")).alias("neg_c"))).alias("m"),
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "embedding", "nrm", (-F.col("m.neg_c")).alias("c_id"))
    )
    from pyspark.sql import Window as W

    wq = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("c_id"))
    probe = (
        scored.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "c_id",
        )
    )
    cos = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    cand = (
        cell.join(F.broadcast(probe), "c_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cos.alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_TOP_K)
        .select("q_id", "n_id", F.round("cosine", 6).alias("cosine_r"), "rank")
    )


@query(
    "s51_label_centroids",
    """
    WITH ex AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings)
    SELECT label, pos, COUNT(*) AS n_vecs,
           ROUND(SUM(CAST(ROUND(val * 1000000) AS BIGINT)) / COUNT(*)
                 / 1000000.0, 6) AS mean_val
    FROM ex GROUP BY label, pos
    """,
)
def s51_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, exploded to (label, dimension):
    the assignment-step aggregate of distributed k-means and the class
    diagnostic (centroid drift, intra-class scatter) of an embedding
    pipeline. posexplode turns the vector column into (pos, val) rows
    so the mean is one map-side-combinable hash aggregate keyed on
    (label, pos) — shuffle bounded by #labels × dim, never corpus-sized.
    Fixed-point integer sums (functions/exact.py rationale) keep the
    float mean order-independent and bit-equal to the oracle."""
    em = t(spark, sf_dir, "embeddings")
    ex = em.select("label", F.posexplode("embedding").alias("pos", "v")).select(
        "label", "pos", F.col("v").cast("double").alias("val")
    )
    return ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(F.round(F.col("val") * 1000000).cast("long"))
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_val"),
    )


_N_PROBES = 200  # leave-one-out eval probe set: vec_id < 200


@query(
    "s52_knn_label_accuracy",
    f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt({fold_dot_sql("embedding", "embedding")}) AS nrm
      FROM embeddings),
    scored AS (
      SELECT p.vec_id AS p_id, p.label AS p_label,
             c.vec_id AS n_id, c.label AS n_label,
             {fold_dot_sql("p.embedding", "c.embedding")} / (p.nrm * c.nrm)
               AS cosine
      FROM n p JOIN n c ON p.vec_id <> c.vec_id
      WHERE p.vec_id < {_N_PROBES}),
    nn AS (
      SELECT p_id, p_label, n_label,
             ROW_NUMBER() OVER (PARTITION BY p_id
                                ORDER BY cosine DESC, n_id) AS rnk
      FROM scored)
    SELECT p_label AS label,
           COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_match,
           CAST(SUM(CASE WHEN n_label = p_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS acc
    FROM nn WHERE rnk = 1
    GROUP BY p_label
    """,
)
def s52_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label agreement per class — the standard
    embedding-quality eval (does nearest-neighbor structure respect
    labels?) run before trusting a vector store or a dedup threshold.

    Shape is s48's: the PROBE set is broadcast (eval sets are small by
    design — hundreds to thousands of held-out points even at 100 TB
    corpus scale), the corpus side never shuffles, and the per-probe
    argmin is a rank-1 window that Spark group-limits map-side. The
    bit-exact sequential-fold cosine keeps the argmin (and its
    deterministic n_id tie-break) identical to the oracle. Corpus-wide
    all-pairs eval is exactly what this shape avoids: cost is
    #probes × corpus, linear in the corpus like any scoring scan."""
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(fold_dot("embedding", "embedding")).alias("nrm"),
    )
    p = n.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("p_id"),
        F.col("label").alias("p_label"),
        F.col("embedding").alias("p_emb"),
        F.col("nrm").alias("p_nrm"),
    )
    cos = fold_dot(F.col("p_emb"), F.col("embedding")) / (
        F.col("p_nrm") * F.col("nrm")
    )
    scored = n.join(F.broadcast(p), F.col("p_id") != F.col("vec_id")).select(
        "p_id",
        "p_label",
        F.col("label").alias("n_label"),
        F.col("vec_id").alias("n_id"),
        cos.alias("cosine"),
    )
    w = W.partitionBy("p_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    nn = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    match = F.sum((F.col("n_label") == F.col("p_label")).cast("int"))
    return nn.groupBy(F.col("p_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        match.cast("long").alias("n_match"),
        (match.cast("double") / F.count(F.lit(1))).alias("acc"),
    )


_KM_K = 8  # deterministic Lloyd-step init: centroids = vec_id < _KM_K

_L2_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)


def _fold_l2(a, b):
    """Squared L2 distance as a sequential double fold (same
    cross-engine bit-exactness argument as :func:`fold_dot`)."""
    diffs = F.zip_with(
        F.col(a) if isinstance(a, str) else a,
        F.col(b) if isinstance(b, str) else b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


@query(
    "s53_kmeans_step",
    f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS c_emb
      FROM embeddings WHERE vec_id < {_KM_K}),
    d AS (
      SELECT e.vec_id, c.cid,
             {_L2_SQL.format(a="e.embedding", b="c.c_emb")} AS dist
      FROM embeddings e CROSS JOIN c),
    a AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rnk
        FROM d) WHERE rnk = 1),
    ex AS (
      SELECT a.cid AS cluster,
             CAST(generate_subscripts(e.embedding, 1) - 1 AS INTEGER) AS pos,
             CAST(unnest(e.embedding) AS DOUBLE) AS val
      FROM a JOIN embeddings e USING (vec_id))
    SELECT cluster, pos, COUNT(*) AS n_members,
           ROUND(SUM(CAST(ROUND(val * 1000000) AS BIGINT)) / COUNT(*)
                 / 1000000.0, 6) AS mean_val
    FROM ex GROUP BY cluster, pos
    """,
)
def s53_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration of k-means (k={_KM_K}, deterministic
    init = the first {_KM_K} vectors): assign every embedding to its
    nearest centroid by squared L2, then recompute per-cluster means —
    the building block of distributed corpus clustering (topic
    bucketing, IVF codebook training). Output is the NEW centroid table
    as (cluster, dim, mean); iterating is re-running with the previous
    output broadcast in.

    Scale shape: centroids broadcast (k rows — a bounded product like
    s50's quantizer, never data x data); distances computed map-side in
    one codegen pass; argmin lowers to WindowGroupLimit so each map task
    forwards one candidate row per vector before the vec_id exchange;
    the recompute is one hash aggregate on (cluster, dim) — shuffle
    bounded by k x dim. Distance folds are sequential double
    accumulation (functions/exact.py) and means are fixed-point sums,
    so assignment AND centroids are bit-identical to the oracle."""
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    c = em.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    d = em.crossJoin(F.broadcast(c)).select(
        "vec_id", "cid", _fold_l2("embedding", "c_emb").alias("dist")
    )
    w = W.partitionBy("vec_id").orderBy("dist", "cid")
    a = (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", F.col("cid").alias("cluster"))
    )
    ex = a.join(em, "vec_id").select(
        "cluster", F.posexplode("embedding").alias("pos", "v")
    )
    return ex.groupBy("cluster", "pos").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum(F.round(F.col("v").cast("double") * 1000000).cast("long"))
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_val"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third canonical ANN pillar next to
# LSH (s49/d48) and IVF (s50): compress vectors to M subspace codes
# against a small codebook, then search with asymmetric distance
# computation (ADC) over the codes, never the raw vectors.
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces (64 dims / 8 per slice)
_PQ_DSUB = 8  # dims per subspace
_PQ_K = 16  # codewords per subspace: deterministic init = vec_id < _PQ_K
_PQ_NPROBE = 8  # ADC probe set: vec_id < _PQ_NPROBE
_PQ_TOPK = 5

_SLICE_L2_SQL = (
    "list_reduce(list_transform(list_zip("
    "list_slice({a}, {m} * 8 + 1, {m} * 8 + 8), "
    "list_slice({b}, {m} * 8 + 1, {m} * 8 + 8)), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)

_PQ_CODES_SQL = f"""
    cb AS (
      SELECT vec_id AS cid, embedding AS c_emb
      FROM embeddings WHERE vec_id < {_PQ_K}),
    ms AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    pq_d AS (
      SELECT e.vec_id, ms.m, cb.cid,
             {_SLICE_L2_SQL.format(a="e.embedding", b="cb.c_emb", m="ms.m")}
               AS dist
      FROM embeddings e CROSS JOIN ms CROSS JOIN cb),
    pq_codes AS (
      SELECT vec_id, m, cid AS code, dist FROM (
        SELECT vec_id, m, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, cid) AS rnk
        FROM pq_d) WHERE rnk = 1)
"""


def _slice_l2(emb_a, emb_b, m):
    """Squared L2 between one _PQ_DSUB-wide slice of two vectors —
    sequential fold, same bit-exactness contract as fold_dot.

    r14 (guide §4 adjacent — eliminating INTERPRETED eval, not
    Python): the zip_with + aggregate HOF pair evaluated lambda trees
    row-by-row outside whole-stage codegen; unrolled to an explicit
    8-term left-associated sum of element_at terms it compiles into
    the surrounding codegen stage. ((((0.0+t1)+t2)+...)+t8) with every
    element cast to double before subtract/multiply is EXACTLY the
    fold's IEEE op order, so this is bit-identical by construction
    (and was proven frame-equal at sf0.1 for both s54 and s55).
    Measured: s54 0.82 → 0.34 s, s55 1.06 → 0.66 s at sf0.1. Note
    this is NOT the r13 negative result recorded on _pq_codes_df —
    that moved the whole distance matrix in-row per pair (nested
    transform/aggregate, still interpreted); this keeps the exploded
    shape and just un-interprets the per-row arithmetic. The unroll
    width is _PQ_DSUB=8 terms — far below the 64-term fold_dot unroll
    that lost to codegen size effects in r13."""
    acc = F.lit(0.0)
    for j in range(_PQ_DSUB):
        x = F.element_at(emb_a, m * _PQ_DSUB + j + 1).cast("double")
        y = F.element_at(emb_b, m * _PQ_DSUB + j + 1).cast("double")
        acc = acc + (x - y) * (x - y)
    return acc


def _pq_codes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, code, dist): nearest codeword per subspace.
    Codebook = a broadcast _PQ_K-row product (bounded fan-out, the
    s50/s53 shape); argmin is a combinable MIN over (dist, cid)
    structs (r13: replaces the windowed rank-1 — lexicographic struct
    MIN ≡ ORDER BY dist, cid rank 1, frame-equal-proven — so the
    per-group sort disappears and the reduction combines map-side).
    r13 negative result, kept as-is deliberately: computing all 8
    slice distances in-row per (vec, codeword) pair (640k pair rows,
    nested transform/aggregate) measured ~50% SLOWER than this
    explode+join form — nested HOF lambdas evaluate interpreted while
    the exploded form pipelines through codegen (the d58 lesson)."""
    em = t(spark, sf_dir, "embeddings")
    cb = em.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    d = (
        em.select("vec_id", "embedding", ms)
        .join(F.broadcast(cb))
        .select(
            "vec_id",
            "m",
            "cid",
            _slice_l2(F.col("embedding"), F.col("c_emb"), F.col("m")).alias(
                "dist"
            ),
        )
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "cid")).alias("mn"))
        .select(
            "vec_id",
            "m",
            F.col("mn.cid").alias("code"),
            F.col("mn.dist").alias("dist"),
        )
    )


@query(
    "s54_pq_encode",
    f"""
    WITH {_PQ_CODES_SQL}
    SELECT vec_id, CAST(m AS INTEGER) AS m, CAST(code AS INTEGER) AS code,
           dist
    FROM pq_codes
    """,
)
def s54_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each 64-d vector becomes
    {_PQ_M} one-byte codes — the nearest of {_PQ_K} codewords per
    8-dim subspace (deterministic codebook = the first {_PQ_K}
    vectors' slices; a production codebook comes from s53's Lloyd step
    run per subspace). Emitted as (vec_id, m, code, dist) rows with
    the exact per-subspace quantization error.

    Scale shape: codebook broadcast (K rows), slice distances are
    in-row folds, argmin is a map-side WindowGroupLimit before the
    skinny (vec_id, m) exchange. The encoded table is M bytes +
    overhead per vector — the representation ADC search (s55) scans
    instead of 256-byte float vectors, an 8x read reduction here and
    ~32x at float32/byte-code production settings."""
    return _pq_codes_df(spark, sf_dir).select(
        "vec_id",
        F.col("m").cast("int").alias("m"),
        F.col("code").cast("int").alias("code"),
        "dist",
    )


@query(
    "s55_pq_adc_topk",
    f"""
    WITH {_PQ_CODES_SQL},
    probes AS (
      SELECT vec_id AS p_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < {_PQ_NPROBE}),
    lut AS (
      SELECT p.p_id, ms.m, cb.cid,
             CAST(ROUND({_SLICE_L2_SQL.format(a="p.q_emb", b="cb.c_emb", m="ms.m")}
               * 1000000) AS BIGINT) AS d_fp
      FROM probes p CROSS JOIN ms CROSS JOIN cb),
    adc AS (
      SELECT l.p_id, c.vec_id, CAST(SUM(l.d_fp) AS BIGINT) AS adc_fp
      FROM pq_codes c
      JOIN lut l ON l.m = c.m AND l.cid = c.code
      WHERE c.vec_id <> l.p_id
      GROUP BY l.p_id, c.vec_id),
    ranked AS (
      SELECT p_id, vec_id, adc_fp,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_id
                                     ORDER BY adc_fp, vec_id) AS INTEGER)
               AS rnk
      FROM adc)
    SELECT p_id, rnk, vec_id, CAST(adc_fp AS DOUBLE) / 1000000.0 AS adc_dist
    FROM ranked WHERE rnk <= {_PQ_TOPK}
    """,
)
def s55_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-{_PQ_TOPK}: per probe, build
    the {_PQ_M}x{_PQ_K} lookup table of exact probe-slice-to-codeword
    distances, then score every encoded vector as the SUM of table
    entries selected by its codes — the vectors themselves are never
    touched at query time. Per-entry distances are fixed-pointed
    BEFORE the sum (order-independent integer aggregation,
    functions/exact.py) so ADC scores are bit-equal to the oracle.

    Scale shape: the LUT is probes x M x K rows — broadcast; the scan
    side is the M-bytes-per-vector code table joined on (m, code);
    the per-(probe, vector) sum is one combinable aggregate and the
    top-k cut lowers to WindowGroupLimit. At 100 TB this is the
    classic memory-resident-codes ANN: scan cost tracks the CODE
    table size, an order of magnitude under the raw vectors."""
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    codes = _pq_codes_df(spark, sf_dir).select("vec_id", "m", "code")
    cb = em.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    probes = em.filter(F.col("vec_id") < _PQ_NPROBE).select(
        F.col("vec_id").alias("p_id"), F.col("embedding").alias("q_emb")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    lut = (
        probes.select("p_id", "q_emb", ms)
        .join(F.broadcast(cb))
        .select(
            "p_id",
            "m",
            "cid",
            F.round(
                _slice_l2(F.col("q_emb"), F.col("c_emb"), F.col("m")) * 1000000
            )
            .cast("long")
            .alias("d_fp"),
        )
    )
    c = codes.alias("c")
    l = lut.alias("l")
    adc = (
        c.join(
            F.broadcast(l),
            (F.col("c.m") == F.col("l.m"))
            & (F.col("c.code") == F.col("l.cid"))
            & (F.col("c.vec_id") != F.col("l.p_id")),
        )
        .groupBy(F.col("l.p_id").alias("p_id"), F.col("c.vec_id").alias("vec_id"))
        .agg(F.sum("d_fp").alias("adc_fp"))
    )
    w = W.partitionBy("p_id").orderBy("adc_fp", "vec_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _PQ_TOPK)
        .select(
            "p_id",
            "rnk",
            "vec_id",
            (F.col("adc_fp").cast("double") / 1000000.0).alias("adc_dist"),
        )
    )


# ---------------------------------------------------------------------------
# s56: simplified silhouette — clustering-quality eval per label
# ---------------------------------------------------------------------------
#
# The standard "are these clusters real?" diagnostic run after any
# embedding clustering (s51/s53) and before trusting cluster-based
# curation decisions: for each point, a = distance to its OWN cluster
# centroid, b = distance to the nearest OTHER centroid, silhouette
# s = (b - a) / max(a, b) in [-1, 1] (the medoid-free simplified form —
# the full pairwise silhouette is quadratic and adds nothing at corpus
# scale). Reported per label as the mean silhouette.
#
# Exactness: centroids are fixed-point means (s51 arithmetic); both
# engines then run the identical IEEE double pipeline (sequential L2
# fold -> subtract -> divide) on identical inputs, and the result is
# floored to integer micro-units — floor (NOT round: no half-boundary
# hazard, and floor/`//` agree on negatives where truncating div does
# not) before the order-independent integer mean.

_SIL_SCALE = 1_000_000

_Q_S56 = f"""
    WITH ex AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings),
    cs AS (
      SELECT label AS cid, pos,
             SUM(CAST(ROUND(val * {_SIL_SCALE}) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM ex GROUP BY label, pos),
    cent AS (
      SELECT cid,
             list(CAST(s AS DOUBLE) / n / {_SIL_SCALE}.0 ORDER BY pos) AS c_emb
      FROM cs GROUP BY cid),
    d AS (
      SELECT e.vec_id, e.label, c.cid,
             {_L2_SQL.format(a="e.embedding", b="c.c_emb")} AS dist
      FROM embeddings e CROSS JOIN cent c),
    ab AS (
      SELECT vec_id, label,
             MIN(CASE WHEN cid = label THEN dist END) AS a,
             MIN(CASE WHEN cid <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label),
    sil AS (
      SELECT label,
             CASE WHEN GREATEST(a, b) > 0
                  THEN CAST(FLOOR({_SIL_SCALE} * (b - a) / GREATEST(a, b))
                            AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS sil_micro
      FROM ab)
    SELECT label, COUNT(*) AS n_points,
           CAST(SUM(sil_micro) AS BIGINT) AS sum_sil_micro,
           CAST(FLOOR(CAST(SUM(sil_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_sil_micro
    FROM sil GROUP BY label
"""


@query("s56_silhouette_by_label", _Q_S56)
def s56_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per label (see block comment): the
    clustering-quality eval, bit-exact cross-engine via fixed-point
    centroids + floored micro-unit scores.

    Scale shape: the centroid table is k rows built by one (label, pos)
    hash aggregate (shuffle bounded by k x dim) and BROADCAST back —
    the bounded product s50/s53 sanction, never data x data. The
    per-point a/b min is a conditional aggregate over the k co-located
    candidate rows, so partial aggregation collapses each point to one
    row BEFORE the vec_id exchange; the final per-label mean is one
    combinable integer aggregate. Total shuffled volume: one narrow row
    per point plus k x dim — linear scan cost at any corpus size."""
    em = t(spark, sf_dir, "embeddings")
    ex = em.select("label", F.posexplode("embedding").alias("pos", "v")).select(
        "label", "pos", F.col("v").cast("double").alias("val")
    )
    cs = ex.groupBy(F.col("label").alias("cid"), F.col("pos")).agg(
        F.sum(F.round(F.col("val") * _SIL_SCALE).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = (
        cs.select(
            "cid",
            "pos",
            (F.col("s").cast("double") / F.col("n") / float(_SIL_SCALE)).alias("m"),
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda st: st["m"],
            ).alias("c_emb")
        )
    )
    d = em.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "cid", _fold_l2("embedding", "c_emb").alias("dist")
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cid") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("cid") != F.col("label"), F.col("dist"))).alias("b"),
    )
    g = F.greatest("a", "b")
    sil = ab.select(
        "label",
        F.when(
            g > 0,
            F.floor(F.lit(float(_SIL_SCALE)) * (F.col("b") - F.col("a")) / g).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("sil_micro"),
    )
    return sil.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("sil_micro").alias("sum_sil_micro"),
        F.floor(F.sum("sil_micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_sil_micro"),
    )


# --- s57: tf-idf similar-document retrieval (inverted index) --------
_S57_PROBES = 8
_S57_TOP_K = 5

_S57 = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term),
    stats AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(ROUND(ln(CAST(n.n_docs AS DOUBLE) / stats.df)
                                * 1000000) AS BIGINT) AS wt
      FROM tf JOIN stats ON stats.term = tf.term CROSS JOIN n),
    norms AS (
      SELECT doc_id,
             SUM(CAST(wt AS HUGEINT) * CAST(wt AS HUGEINT)) AS norm2
      FROM w
      GROUP BY doc_id),
    dots AS (
      SELECT q.doc_id AS probe_id, c.doc_id AS cand_id,
             SUM(CAST(q.wt AS HUGEINT) * CAST(c.wt AS HUGEINT)) AS dot
      FROM w q JOIN w c ON c.term = q.term AND c.doc_id <> q.doc_id
      WHERE q.doc_id < {_S57_PROBES}
      GROUP BY q.doc_id, c.doc_id),
    scored AS (
      SELECT d.probe_id, d.cand_id,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(nq.norm2 AS DOUBLE))
                  * sqrt(CAST(nc.norm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms nq ON nq.doc_id = d.probe_id
      JOIN norms nc ON nc.doc_id = d.cand_id),
    ranked AS (
      SELECT probe_id, cand_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
      FROM scored)
    SELECT probe_id, cand_id, ROUND(cosine, 6) AS cosine_r, rank
    FROM ranked WHERE rank <= {_S57_TOP_K}
"""


@query("s57_tfidf_similar_docs", _S57)
def s57_tfidf_similar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-document retrieval over SPARSE tf-idf vectors via an
    inverted-index join: probe docs meet candidates only on SHARED
    terms (posting-list equi-join), so the corpus never self-pairs —
    the classic MapReduce similarity-join shape, and the sparse
    complement to s48's dense-embedding top-k. t69 scores a keyword
    QUERY against docs; this ranks DOC-to-DOC similarity (the
    retrieval primitive behind near-dup triage and related-content
    recommendation).

    Exactness: term weights are integer micro-units (tf ×
    ROUND(ln(N/df)·1e6) — the t68 presum rule), dot products and
    norms are exact DECIMAL(38,0) sums (r11 audit: wt² passes int64
    on common terms of long documents), and the final cosine is a
    fixed sequence of IEEE double ops (sqrt/×/÷ are correctly
    rounded) on identical integers — bit-identical cross-engine, so
    ranking cannot diverge.

    Scale shape: the probe side is a handful of docs, so the posting
    join fans out as |probe terms ∩ posting lists| — linear in corpus
    df, never corpus². At 100 TB the same plan serves "find docs like
    these K seeds"; for all-pairs similarity use d44/d48 (blocked
    candidates), not this operator. (This synthetic corpus's 31-term
    vocabulary makes every posting list dense; on Zipfian real text a
    df stop-filter — the d44 pattern — caps the hot lists.)

    r13: the (doc, term, tf) triples are computed IN-ROW (sorted-run
    fold over each document's token array — functions/arrays.py), so
    the token occurrence stream never explodes into rows and the
    (doc, term) count exchange disappears; same triples, same
    downstream plan."""
    from pinot_pulsar_plugin_spark.functions.arrays import runs_expr

    d = t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.split(F.lower("text"), " ").alias("tk"))
        .select("doc_id", F.explode(F.expr(runs_expr("tk"))).alias("r"))
        .select("doc_id", F.col("r.g").alias("term"), F.col("r.c").alias("tf"))
    )
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    idf_micro = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("df")) * 1000000
    ).cast("long")
    w = (
        tf.join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", (F.col("tf") * idf_micro).alias("wt"))
        .transform(persist_materialized)
    )
    # materialized at persist (owned-only count, r13): norms + probes +
    # posting join read the cache
    # r11 audit: the weight products run in DECIMAL(38,0) — wt = tf ·
    # idf_micro reaches ~2.8e9 on common terms of long documents, so
    # wt² sits at the int64 edge PER ROW and the per-doc sum passes it;
    # DECIMAL→double before sqrt is the oracle's int128→double, so the
    # cosine chain is bit-identical.
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("wt").cast("decimal(38,0)") * F.col("wt")).alias("norm2")
    )
    probes = (
        w.filter(F.col("doc_id") < _S57_PROBES)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.col("term").alias("q_term"),
            F.col("wt").alias("q_wt"),
        )
    )
    dots = (
        w.join(
            F.broadcast(probes),
            (F.col("term") == F.col("q_term"))
            & (F.col("doc_id") != F.col("probe_id")),
        )
        .groupBy("probe_id", F.col("doc_id").alias("cand_id"))
        .agg(
            F.sum(F.col("q_wt").cast("decimal(38,0)") * F.col("wt")).alias(
                "dot"
            )
        )
    )
    nq = norms.select(
        F.col("doc_id").alias("nq_id"), F.col("norm2").alias("q_norm2")
    )
    nc = norms.select(
        F.col("doc_id").alias("nc_id"), F.col("norm2").alias("c_norm2")
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("q_norm2").cast("double"))
        * F.sqrt(F.col("c_norm2").cast("double"))
    )
    scored = (
        dots.join(F.broadcast(nq), F.col("nq_id") == F.col("probe_id"))
        .join(nc, F.col("nc_id") == F.col("cand_id"))
        .select("probe_id", "cand_id", cosine.alias("cosine"))
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S57_TOP_K)
        .select(
            "probe_id", "cand_id", F.round("cosine", 6).alias("cosine_r"), "rank"
        )
    )


# --- s58: int8 scalar quantization + integer dot top-k --------------
_S58_PROBES = 8
_S58_TOP_K = 5

_S58 = f"""
    WITH q AS (
      SELECT vec_id,
             list_aggregate(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE))), 'max') AS scale,
             embedding
      FROM embeddings),
    quant AS (
      SELECT vec_id,
             CASE WHEN scale = 0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) / scale * 127)
                                 AS BIGINT)) END AS qv
      FROM q),
    pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             CAST(list_reduce(list_transform(list_zip(p.qv, c.qv),
                    z -> z[1] * z[2]), (acc, x) -> acc + x) AS BIGINT) AS qdot
      FROM quant p JOIN quant c ON c.vec_id >= {_S58_PROBES}
      WHERE p.vec_id < {_S58_PROBES}),
    ranked AS (
      SELECT probe_id, cand_id, qdot,
             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY qdot DESC, cand_id) AS INTEGER) AS rank
      FROM pairs)
    SELECT probe_id, cand_id, qdot, rank FROM ranked
    WHERE rank <= {_S58_TOP_K}
"""


@query("s58_int8_quantized_topk", _S58)
def s58_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (per-vector symmetric max-abs scale,
    the FAISS SQ8 / common vector-DB compression) + top-k by EXACT
    INTEGER quantized dot product — the memory-bound retrieval path:
    4× smaller vectors, integer SIMD dots, float math only at
    quantization time.

    Exactness: x/scale*127 is the same IEEE double sequence on both
    engines and its ROUND target is an integer, so the quantized
    vectors are identical; dots are then pure int64 folds — ranking
    is exact, no tolerance needed (this is what makes the operator
    oracle-checkable while s49's random-plane LSH is not).

    Scale shape: the probe side broadcasts (like s48), the corpus
    side streams — no corpus shuffle; at 100 TB the quantized
    corpus column is what you'd persist (16 GB/billion vectors at
    dim=64 instead of 256 GB fp32), with s50's IVF cells on top for
    sub-linear probing."""
    em = t(spark, sf_dir, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    qv = F.when(
        F.col("scale") == 0.0,
        F.transform("embedding", lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") / F.col("scale") * 127).cast("long"),
        )
    )
    quant = em.withColumn("scale", scale).select("vec_id", qv.alias("qv"))
    probes = quant.filter(F.col("vec_id") < _S58_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("p_qv")
    )
    cands = quant.filter(F.col("vec_id") >= _S58_PROBES).select(
        F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv")
    )
    qdot = F.aggregate(
        F.zip_with(F.col("p_qv"), F.col("c_qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = cands.join(F.broadcast(probes)).select(
        "probe_id", "cand_id", qdot.alias("qdot")
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("probe_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S58_TOP_K)
        .select("probe_id", "cand_id", "qdot", "rank")
    )


# --- s59: MIPS via norm augmentation (Bachrach et al. reduction) ----
_S59_PROBES = 6
_S59_TOP_K = 5

_S59 = f"""
    WITH nrm AS (
      SELECT vec_id, embedding,
             {fold_dot_sql("embedding", "embedding")} AS norm2
      FROM embeddings),
    mx AS (SELECT MAX(norm2) AS max2 FROM nrm WHERE vec_id >= {_S59_PROBES}),
    pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             {fold_dot_sql("p.embedding", "c.embedding")} AS dot,
             sqrt(m.max2 - c.norm2) AS aug
      FROM nrm p
      JOIN nrm c ON c.vec_id >= {_S59_PROBES}
      CROSS JOIN mx m
      WHERE p.vec_id < {_S59_PROBES}),
    scored AS (
      SELECT probe_id, cand_id, dot,
             ROUND(aug, 6) AS aug_dim_r,
             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, cand_id) AS INTEGER) AS rank
      FROM pairs)
    SELECT probe_id, cand_id, ROUND(dot, 6) AS dot_r, aug_dim_r, rank
    FROM scored WHERE rank <= {_S59_TOP_K}
"""


@query("s59_mips_norm_augmented", _S59)
def s59_mips_norm_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search via the norm-augmentation
    reduction (Bachrach et al., RecSys'14): append one dimension
    sqrt(M² − ‖x‖²) to every candidate (M = max corpus norm) and 0 to
    every probe — augmented vectors all have norm M, so COSINE ranking
    against them IS inner-product ranking. This is how recommender
    embeddings (where magnitude carries popularity and cosine engines
    can't serve argmax⟨q,x⟩) reuse a cosine ANN stack unchanged —
    the last classic retrieval reduction in the similarity family
    (exact s48, LSH s49, IVF s50, PQ s54/s55, sparse s57, SQ8 s58).

    The operator emits the augmentation dimension it would index
    (aug_dim_r) alongside the exact MIPS top-k; the reduction's
    correctness — augmented-cosine order ≡ dot order — is asserted in
    test_ann_quality (cross-engine the ranking rides the deterministic
    fold dot, so the oracle is exact).

    Scale shape: M is a 1-row broadcast; probes broadcast (the s48
    pattern); the corpus never shuffles; per-probe top-k is a
    partitioned window with partial top-k before the exchange."""
    em = t(spark, sf_dir, "embeddings")
    nrm = em.select(
        "vec_id", "embedding", fold_dot("embedding", "embedding").alias("norm2")
    )
    cands = nrm.filter(F.col("vec_id") >= _S59_PROBES)
    mx = cands.agg(F.max("norm2").alias("max2"))
    probes = nrm.filter(F.col("vec_id") < _S59_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    pairs = (
        cands.crossJoin(F.broadcast(mx))
        .join(F.broadcast(probes))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            fold_dot(F.col("p_emb"), F.col("embedding")).alias("dot"),
            F.sqrt(F.col("max2") - F.col("norm2")).alias("aug"),
        )
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("probe_id").orderBy(F.desc("dot"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S59_TOP_K)
        .select(
            "probe_id",
            "cand_id",
            F.round("dot", 6).alias("dot_r"),
            F.round("aug", 6).alias("aug_dim_r"),
            "rank",
        )
    )


# --- s60: MMR diversified top-k (cogrouped greedy rerank) -----------
#
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): rerank
# a relevance shortlist so results are relevant AND mutually diverse —
# the retrieval op a training-data curator runs to avoid filling a
# context window (or a labeling batch) with near-duplicates of one
# hit. Greedy: S_0 = {}; each step picks
#   argmax_c  λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)
# (ties → smaller vec_id; empty-S penalty = 0).
#
# Architecture (the documented custom-operator ladder): the HEAVY
# parts — corpus relevance scan, per-query top-m shortlist, pairwise
# sims among shortlist members — are pure DataFrame plans (fold-exact
# cosines, WindowGroupLimit top-m, equi-joins). The greedy selection
# itself is inherently sequential over a ≤m-row shortlist, so it runs
# as a COGROUPED applyInPandas (FlatMapCoGroupsInPandas — shortlist
# rows cogrouped with sim rows by q_id): distributed across queries,
# no driver loop, Arrow-batched, and the m² state never leaves the
# executor. The DuckDB oracle replays the greedy with a recursive CTE
# carrying the selected set as a list — parity proves the whole
# sequential policy, tie-breaks included (Python float and SQL double
# arithmetic are the same IEEE chains on fold-identical cosines).

_MMR_NQ = 2      # query vectors: vec_id < 2
_MMR_M = 24      # relevance shortlist size fed to the rerank
_MMR_K = 8       # diversified results returned
_MMR_LAMBDA = 0.7
_MMR_MU = 0.3  # NOT computed as 1-lambda: Python 1-0.7 is 0.30000000000000004,
# the SQL literal 0.3 is not — pin the same literal on both engines


@query(
    "s60_mmr_diversified_topk",
    f"""
    WITH RECURSIVE n AS (
      SELECT vec_id, embedding, {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    rel AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {fold_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
               AS rel
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_MMR_NQ}),
    short AS (
      SELECT q_id, n_id, rel FROM (
        SELECT q_id, n_id, rel,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY rel DESC, n_id) AS rk
        FROM rel) WHERE rk <= {_MMR_M}),
    sims AS (
      SELECT a.q_id, a.n_id AS ia, b.n_id AS ib,
             {fold_dot_sql("ea.embedding", "eb.embedding")}
               / (ea.nrm * eb.nrm) AS s
      FROM short a
      JOIN short b ON a.q_id = b.q_id AND a.n_id < b.n_id
      JOIN n ea ON ea.vec_id = a.n_id
      JOIN n eb ON eb.vec_id = b.n_id),
    mmr AS (
      (SELECT q_id, 1 AS step, [n_id] AS sel, n_id,
              {_MMR_LAMBDA} * rel - {_MMR_MU} * 0.0 AS mmr_score
       FROM (SELECT q_id, n_id, rel,
                    ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY rel DESC, n_id) AS rk
             FROM short) WHERE rk = 1)
      UNION ALL
      (SELECT m.q_id, m.step + 1, list_append(m.sel, pick.n_id),
              pick.n_id, pick.mmr_score
       FROM mmr m JOIN LATERAL (
         SELECT c.n_id,
                {_MMR_LAMBDA} * c.rel - {_MMR_MU} * (
                  SELECT MAX(s.s) FROM sims s
                  WHERE s.q_id = m.q_id
                    AND ((s.ia = c.n_id AND list_contains(m.sel, s.ib))
                      OR (s.ib = c.n_id AND list_contains(m.sel, s.ia)))
                ) AS mmr_score
         FROM short c
         WHERE c.q_id = m.q_id AND NOT list_contains(m.sel, c.n_id)
         ORDER BY mmr_score DESC, c.n_id LIMIT 1) pick ON TRUE
       WHERE m.step < {_MMR_K}))
    SELECT q_id, CAST(step AS INTEGER) AS step, n_id, mmr_score
    FROM mmr
    """,
)
def s60_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k per query (see block comment): DataFrame
    shortlist + sims, cogrouped-pandas greedy rerank.

    Scale shape: the corpus is touched exactly once (the broadcast
    relevance scan — s48's shape, corpus never shuffles); everything
    after is shortlist-grain (m rows/query, m² sims). The rerank
    parallelizes across queries and each group's work is an O(k·m)
    loop over at most m² floats held in one Arrow batch."""
    import pandas as pd

    em = t(spark, sf_dir, "embeddings")
    n = em.select("vec_id", "embedding", fold_norm("embedding").alias("nrm"))
    q = n.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    rel = (
        n.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            (
                fold_dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("rel"),
            "embedding",
            "nrm",
        )
    )
    from pyspark.sql import Window as W

    # shortlist rows CARRY their embedding+norm so the sims self-join
    # below needs no further touch of the corpus (one scan total)
    w = W.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("n_id"))
    short_full = (
        rel.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_M)
        .drop("rk")
        .transform(persist_once)
    )
    short = short_full.select("q_id", "n_id", "rel")
    sa, sb = short_full.alias("sa"), short_full.alias("sb")
    sims = (
        sa.join(
            sb,
            (F.col("sa.q_id") == F.col("sb.q_id"))
            & (F.col("sa.n_id") < F.col("sb.n_id")),
        )
        .select(
            F.col("sa.q_id").alias("q_id"),
            F.col("sa.n_id").alias("ia"),
            F.col("sb.n_id").alias("ib"),
            (
                fold_dot(F.col("sa.embedding"), F.col("sb.embedding"))
                / (F.col("sa.nrm") * F.col("sb.nrm"))
            ).alias("s"),
        )
    )

    lam = _MMR_LAMBDA

    def greedy(key, short_pdf: pd.DataFrame, sims_pdf: pd.DataFrame) -> pd.DataFrame:
        rel_of = {int(r.n_id): float(r.rel) for r in short_pdf.itertuples()}
        sim = {}
        for r in sims_pdf.itertuples():
            sim[(int(r.ia), int(r.ib))] = float(r.s)
            sim[(int(r.ib), int(r.ia))] = float(r.s)
        cands = sorted(rel_of)
        sel: list[int] = []
        out = []
        for step in range(1, _MMR_K + 1):
            best_id, best_score = None, None
            for c in cands:
                if c in sel:
                    continue
                pen = max(sim[(c, x)] for x in sel) if sel else 0.0
                score = lam * rel_of[c] - _MMR_MU * pen
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            if best_id is None:
                break
            sel.append(best_id)
            out.append((int(key[0]), step, best_id, best_score))
        return pd.DataFrame(out, columns=["q_id", "step", "n_id", "mmr_score"])

    return (
        short.groupBy("q_id")
        .cogroup(sims.groupBy("q_id"))
        .applyInPandas(greedy, "q_id long, step int, n_id long, mmr_score double")
    )


# --- s61: NDCG@k retrieval-quality evaluation -----------------------
#
# The similarity family has retrieval METHODS (s48 exact, s49 LSH,
# s50 IVF, s55 PQ, s58 SQ8) and pointwise accuracy evals (s52 1-NN
# label accuracy, recall floors in test_ann_quality); s61 adds the
# RANKING metric those evals can't see: NDCG@k with binary relevance
# (neighbor shares the probe's label), the standard figure of merit
# when deciding whether an ANN index is good enough to replace the
# exact scan. Graded per probe so regressions localize.
#
# Exactness: the DCG discount table round(1e6/log2(i+1)) and its
# prefix sums are PRECOMPUTED integer literals embedded identically
# in both engines' queries (computing log2 at query time risks a
# 1-ulp engine divergence under the ROUND half-boundary; a constant
# table cannot diverge). DCG/IDCG are then int64 sums of table
# lookups, and NDCG is one double division of two exact integers —
# bit-identical. Ranking rides the fold-exact cosine with vec_id
# tie-breaks (the s48 contract).

_S61_PROBES = 12
_S61_K = 10
# round(1e6 / log2(rank+1)) for rank 1..10, and 1-based prefix sums
_S61_W = [1000000, 630930, 500000, 430677, 386853, 356207,
          333333, 315465, 301030, 289065]
_S61_P = [1000000, 1630930, 2130930, 2561607, 2948460, 3304667,
          3638000, 3953465, 4254495, 4543560]
_S61_W_SQL = "[" + ", ".join(str(w) for w in _S61_W) + "]"
_S61_P_SQL = "[" + ", ".join(str(p) for p in _S61_P) + "]"

_S61 = f"""
    WITH n AS (
      SELECT vec_id, label, embedding, {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    lab AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_lab
      FROM embeddings GROUP BY label),
    ranked AS (
      SELECT p_id, p_label, label,
             ROW_NUMBER() OVER (PARTITION BY p_id
               ORDER BY cosine DESC, n_id) AS rank
      FROM (
        SELECT q.vec_id AS p_id, q.label AS p_label,
               c.vec_id AS n_id, c.label,
               {fold_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
                 AS cosine
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_S61_PROBES})),
    gains AS (
      SELECT p_id, p_label,
             CAST(SUM(CASE WHEN label = p_label
                           THEN {_S61_W_SQL}[CAST(rank AS INTEGER)]
                           ELSE 0 END) AS BIGINT) AS dcg_w,
             CAST(SUM(CASE WHEN label = p_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_topk
      FROM ranked WHERE rank <= {_S61_K}
      GROUP BY p_id, p_label),
    ideal AS (
      SELECT g.p_id, g.n_rel_topk, g.dcg_w,
             CAST(LEAST(l.n_lab - 1, {_S61_K}) AS BIGINT) AS ideal_n
      FROM gains g JOIN lab l ON l.label = g.p_label)
    SELECT p_id, n_rel_topk, dcg_w, ideal_n,
           CASE WHEN ideal_n <= 0 THEN 0.0
                ELSE CAST(dcg_w AS DOUBLE)
                     / CAST({_S61_P_SQL}[CAST(ideal_n AS INTEGER)] AS DOUBLE)
           END AS ndcg
    FROM ideal
"""


@query("s61_ndcg_eval", _S61)
def s61_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{k} of exact-cosine retrieval under label-match relevance,
    per probe (see block comment — literal integer discount table,
    int64 DCG/IDCG, one double division).

    Scale shape: probes broadcast against the corpus (the s48
    pattern — the corpus never shuffles); per-probe top-k is a
    partitioned window Spark rewrites to map-side partial top-k; the
    per-label totals are a tiny broadcast dimension. Evaluating an
    ANN method instead of the exact scan swaps the `ranked` CTE for
    the method's candidate list — the metric plan is unchanged."""
    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id", "label", "embedding", fold_norm("embedding").alias("nrm")
    )
    lab = em.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    probes = n.filter(F.col("vec_id") < _S61_PROBES).select(
        F.col("vec_id").alias("p_id"),
        F.col("label").alias("p_label"),
        F.col("embedding").alias("p_emb"),
        F.col("nrm").alias("p_nrm"),
    )
    cos = fold_dot(F.col("p_emb"), F.col("embedding")) / (
        F.col("p_nrm") * F.col("nrm")
    )
    scored = n.join(F.broadcast(probes), F.col("p_id") != F.col("vec_id")).select(
        "p_id", "p_label", F.col("vec_id").alias("n_id"), "label", cos.alias("cosine")
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("p_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    w_arr = F.array(*[F.lit(w) for w in _S61_W])
    p_arr = F.array(*[F.lit(p) for p in _S61_P])
    gains = (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S61_K)
        .groupBy("p_id", "p_label")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("p_label"),
                    F.element_at(w_arr, F.col("rank")),
                ).otherwise(0)
            ).alias("dcg_w"),
            F.sum(
                F.when(F.col("label") == F.col("p_label"), 1).otherwise(0)
            ).alias("n_rel_topk"),
        )
    )
    ideal = gains.join(
        F.broadcast(lab), gains["p_label"] == lab["label"]
    ).select(
        "p_id",
        "n_rel_topk",
        "dcg_w",
        F.least(F.col("n_lab") - 1, F.lit(_S61_K)).cast("long").alias("ideal_n"),
    )
    return ideal.select(
        "p_id",
        "n_rel_topk",
        "dcg_w",
        "ideal_n",
        F.when(F.col("ideal_n") <= 0, F.lit(0.0))
        .otherwise(
            F.col("dcg_w").cast("double")
            / F.element_at(p_arr, F.col("ideal_n").cast("int")).cast("double")
        )
        .alias("ndcg"),
    )


# --- s62: IVF recall@k vs the exact scan ----------------------------
#
# The eval that closes the ANN loop: s50 IS the IVF index; s62
# measures what nprobe=2 buys — recall@{{1,5,10}} of the IVF
# candidate ranking against the exhaustive scan, over the same
# probe set. This is the number a 100 TB deployment watches when
# tuning nprobe/K (recall floors live in test_ann_quality; this
# entry makes the curve itself a served, oracle-checked table).
#
# Exactness: both rankings ride the fold-exact cosine with vec_id
# tie-breaks, so the pair set is deterministic; recalls are integer
# ppm floor-divisions (hits·1e6 // (k·n_probes)). A true-neighbor
# pair counts at level k iff BOTH ranks ≤ k — GREATEST(er, ir) ≤ k —
# so one inner join on (q, n) yields every level's hit count by
# conditional sum (no rank-theta join, no per-k pass).

_S62_TOP_K = 10

_S62 = f"""
    WITH n AS (
      SELECT vec_id, embedding, {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, embedding, nrm, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, embedding, nrm, c_id FROM ranked WHERE rn = 1),
    probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
      FROM ranked WHERE vec_id < {_N_QUERIES} AND rn <= {_IVF_NPROBE}),
    ivf AS (
      SELECT q_id, n_id, rank FROM (
        SELECT p.q_id, m.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY p.q_id ORDER BY
                 {fold_dot_sql("p.q_emb", "m.embedding")} / (p.q_nrm * m.nrm)
                   DESC, m.vec_id) AS rank
        FROM probe p JOIN cell m ON m.c_id = p.c_id
        WHERE m.vec_id <> p.q_id)
      WHERE rank <= {_S62_TOP_K}),
    exact AS (
      SELECT q_id, n_id, rank FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {fold_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
                   DESC, c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {_N_QUERIES})
      WHERE rank <= {_S62_TOP_K}),
    pairs AS (
      SELECT e.q_id, GREATEST(e.rank, i.rank) AS mr
      FROM exact e JOIN ivf i ON i.q_id = e.q_id AND i.n_id = e.n_id)
    SELECT CAST({_N_QUERIES} AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_1,
           CAST(SUM(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_5,
           CAST(SUM(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_10,
           CAST(SUM(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) * 1000000
                // (1 * {_N_QUERIES}) AS BIGINT) AS recall_1_ppm,
           CAST(SUM(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) * 1000000
                // (5 * {_N_QUERIES}) AS BIGINT) AS recall_5_ppm,
           CAST(SUM(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) * 1000000
                // (10 * {_N_QUERIES}) AS BIGINT) AS recall_10_ppm
    FROM pairs
"""


@query("s62_ivf_recall", _S62)
def s62_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@1/5/10 of the s50 IVF configuration against the exact
    scan over the same probes (see block comment) — the nprobe-tuning
    curve as an oracle-checked one-row table.

    Scale shape: the exact arm is probe-bounded (probes broadcast, the
    s48 pattern); the IVF arm touches ~nprobe/K of the corpus per
    probe; the recall join runs on ≤ probes×k pairs. At 100 TB the
    exact arm runs on a SAMPLE of probes (it is the measurement, not
    the serving path) while the IVF arm is the serving plan itself."""
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id", "embedding", fold_norm("embedding").alias("nrm")
    ).transform(persist_once)
    cent = n.filter(
        (F.col("vec_id") >= _N_QUERIES) & (F.col("vec_id") < _N_QUERIES + _IVF_K)
    ).select(
        (F.col("vec_id") - _N_QUERIES).cast("int").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    # sanctioned broadcast product vs the K-row quantizer (s50 note)
    ccos = fold_dot("embedding", "c_emb") / (F.col("nrm") * F.col("c_nrm"))
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "nrm", "c_id", ccos.alias("ccos")
    )
    cell = (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct(F.col("ccos"), (-F.col("c_id")).alias("neg_c"))).alias("m"),
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "embedding", "nrm", (-F.col("m.neg_c")).alias("c_id"))
    )
    wq = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("c_id"))
    probe = (
        scored.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "c_id",
        )
    )
    cosi = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    wr = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    ivf = (
        cell.join(F.broadcast(probe), "c_id")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cosi.alias("cos"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S62_TOP_K)
        .select("q_id", "n_id", F.col("rank").alias("i_rank"))
    )
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cose = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    exact = (
        n.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), cose.alias("cos"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _S62_TOP_K)
        .select("q_id", "n_id", F.col("rank").alias("e_rank"))
    )
    pairs = exact.join(ivf, ["q_id", "n_id"]).select(
        F.greatest("e_rank", "i_rank").alias("mr")
    )
    nq = _N_QUERIES
    return pairs.agg(
        F.lit(nq).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("mr") <= 1, 1).otherwise(0)).alias("hits_1"),
        F.sum(F.when(F.col("mr") <= 5, 1).otherwise(0)).alias("hits_5"),
        F.sum(F.when(F.col("mr") <= 10, 1).otherwise(0)).alias("hits_10"),
        F.expr(f"sum(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) * 1000000 div (1 * {nq})").alias("recall_1_ppm"),
        F.expr(f"sum(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) * 1000000 div (5 * {nq})").alias("recall_5_ppm"),
        F.expr(f"sum(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) * 1000000 div (10 * {nq})").alias("recall_10_ppm"),
    )


# --- s63: prefix-truncation (Matryoshka) recall ---------------------
#
# The third compression axis next to PQ (s54/s55) and SQ8 (s58):
# rank with only the FIRST m dimensions of the embedding (the
# Matryoshka/MRL deployment trick — truncated vectors cost m/d of
# the scan bandwidth and index memory with no re-encoding at all)
# and measure recall@k against the full-dimension exact ranking.
# Unlike PQ/SQ8 there is no codebook to train: the "index build" is
# a projection, which is why truncation is the first knob a 100 TB
# deployment tries.
#
# Exactness: both rankings ride sequential-fold cosines (the fold
# prefix is itself a fold — bit-identical on both engines); recalls
# are integer ppm floor-divisions (the s62 algebra).

_S63_M = 32   # prefix dimensions kept (of 64)
_S63_TOP_K = 10

_S63 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm,
             sqrt({fold_dot_sql("embedding[1:{m}]", "embedding[1:{m}]")})
               AS tnrm
      FROM embeddings),
    trunc AS (
      SELECT q_id, n_id, rank FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {fold_dot_sql("q.embedding[1:{m}]", "c.embedding[1:{m}]")}
                   / (q.tnrm * c.tnrm) DESC, c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {{nq}})
      WHERE rank <= {_S63_TOP_K}),
    exact AS (
      SELECT q_id, n_id, rank FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 {fold_dot_sql("q.embedding", "c.embedding")} / (q.nrm * c.nrm)
                   DESC, c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {{nq}})
      WHERE rank <= {_S63_TOP_K}),
    pairs AS (
      SELECT e.q_id, GREATEST(e.rank, t.rank) AS mr
      FROM exact e JOIN trunc t ON t.q_id = e.q_id AND t.n_id = e.n_id)
    SELECT CAST({{nq}} AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_1,
           CAST(SUM(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_5,
           CAST(SUM(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_10,
           CAST(SUM(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) * 1000000
                // (1 * {{nq}}) AS BIGINT) AS recall_1_ppm,
           CAST(SUM(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) * 1000000
                // (5 * {{nq}}) AS BIGINT) AS recall_5_ppm,
           CAST(SUM(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) * 1000000
                // (10 * {{nq}}) AS BIGINT) AS recall_10_ppm
    FROM pairs
""".replace("{m}", str(_S63_M)).replace("{nq}", str(_N_QUERIES))


@query("s63_matryoshka_recall", _S63)
def s63_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@1/5/10 of first-{m}-of-64-dimension cosine ranking vs the
    full-dimension exact scan (see block comment) — the truncation
    point on the compression-recall curve next to s62 (IVF) and the
    PQ/SQ8 evals.

    Scale shape: probes broadcast (s48 pattern), corpus never
    shuffles; at deployment the truncated scan reads HALF the vector
    bytes — with columnar storage of fixed-size arrays that is real
    I/O savings, not just FLOPs."""
    from pyspark.sql import Window as W

    em = t(spark, sf_dir, "embeddings")
    trunc_col = F.slice("embedding", 1, _S63_M)
    n = em.select(
        "vec_id",
        "embedding",
        fold_norm("embedding").alias("nrm"),
        F.sqrt(fold_dot(trunc_col, trunc_col)).alias("tnrm"),
    ).transform(persist_once)
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("tnrm").alias("q_tnrm"),
    )
    wr = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))

    def ranked(score_col, rank_name):
        return (
            n.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
            .select("q_id", F.col("vec_id").alias("n_id"), score_col.alias("cos"))
            .withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= _S63_TOP_K)
            .select("q_id", "n_id", F.col("rank").alias(rank_name))
        )

    tdot = fold_dot(F.slice("q_emb", 1, _S63_M), F.slice("embedding", 1, _S63_M))
    trunc = ranked(tdot / (F.col("q_tnrm") * F.col("tnrm")), "t_rank")
    edot = fold_dot("q_emb", "embedding")
    exact = ranked(edot / (F.col("q_nrm") * F.col("nrm")), "e_rank")
    pairs = exact.join(trunc, ["q_id", "n_id"]).select(
        F.greatest("e_rank", "t_rank").alias("mr")
    )
    nq = _N_QUERIES
    return pairs.agg(
        F.lit(nq).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("mr") <= 1, 1).otherwise(0)).alias("hits_1"),
        F.sum(F.when(F.col("mr") <= 5, 1).otherwise(0)).alias("hits_5"),
        F.sum(F.when(F.col("mr") <= 10, 1).otherwise(0)).alias("hits_10"),
        F.expr(f"sum(CASE WHEN mr <= 1 THEN 1 ELSE 0 END) * 1000000 div (1 * {nq})").alias("recall_1_ppm"),
        F.expr(f"sum(CASE WHEN mr <= 5 THEN 1 ELSE 0 END) * 1000000 div (5 * {nq})").alias("recall_5_ppm"),
        F.expr(f"sum(CASE WHEN mr <= 10 THEN 1 ELSE 0 END) * 1000000 div (10 * {nq})").alias("recall_10_ppm"),
    )


# --- s64: embedding-table quality audit -----------------------------
#
# Every operator in this family ASSUMES clean vectors (finite values,
# non-zero norms, uniform dimension, one vector per document); s64 is
# the gate that verifies it before an index build — the vector-table
# analog of q119's column profile. Checks per label: dimension
# uniformity (min=max), zero-norm and non-finite counts (either
# poisons a cosine), plus the doc↔vector pairing coverage (vec_id ≡
# doc_id pairing of the test corpus; production passes its own key).
#
# Exactness: dims and counts are integers; the non-finite probe folds
# isnan/isinf flags through an integer sum (no float compare); the
# zero-norm probe compares the exact fold dot against literal 0.0.

_S64 = f"""
    WITH v AS (
      SELECT vec_id, label,
             CAST(len(embedding) AS BIGINT) AS dim,
             {fold_dot_sql("embedding", "embedding")} AS norm2,
             CAST(len(list_filter(embedding,
                    x -> isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE))))
                  AS BIGINT) AS n_bad
      FROM embeddings),
    pair AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_unpaired
      FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
    SELECT v.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(dim) AS BIGINT) AS dim_min,
           CAST(MAX(dim) AS BIGINT) AS dim_max,
           CAST(SUM(CASE WHEN norm2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           CAST(SUM(CASE WHEN n_bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonfinite,
           p.n_docs_unpaired
    FROM v CROSS JOIN pair p
    GROUP BY v.label, p.n_docs_unpaired
"""


@query("s64_embedding_quality_audit", _S64)
def s64_embedding_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-table quality gate: per-label dimension uniformity,
    zero-norm and non-finite vector counts, and doc↔vector pairing
    coverage (see block comment) — run before any index build.

    Scale shape: one scan of embeddings with in-row folds (dim, norm,
    finite flags — no shuffle to check a vector), a |labels|-row
    rollup, and one anti-join for pairing coverage keyed on the doc
    id. The unpaired count is a broadcast scalar riding every row of
    the tiny output."""
    em = t(spark, sf_dir, "embeddings")
    d = t(spark, sf_dir, "documents").select("doc_id")
    bad = F.size(
        F.filter(
            "embedding",
            lambda x: F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == float("inf")),
        )
    ).cast("long")
    v = em.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        fold_dot("embedding", "embedding").alias("norm2"),
        bad.alias("n_bad"),
    )
    unpaired = (
        d.join(em.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_docs_unpaired"))
    )
    return (
        v.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("dim").alias("dim_min"),
            F.max("dim").alias("dim_max"),
            F.sum(F.when(F.col("norm2") == 0.0, 1).otherwise(0)).alias(
                "n_zero_norm"
            ),
            F.sum(F.when(F.col("n_bad") > 0, 1).otherwise(0)).alias(
                "n_nonfinite"
            ),
        )
        .crossJoin(F.broadcast(unpaired))
    )


# --- s65: IVF index cell-balance audit ----------------------------------
#
# The index-health read that decides when to retrain the coarse
# quantizer: per-cell member counts of s50's IVF assignment, each
# cell's corpus share, and its imbalance versus the uniform ideal
# (share·K — 1e6 ppm means perfectly balanced). A cell at several
# times the ideal is a probe-latency hot spot (every query probing it
# reranks that many more members) — the ANN twin of q171's shuffle-skew
# report. Assignment math (cosine argmax with the (ccos DESC, c_id)
# tie rule) is byte-identical to s50, so this audit measures exactly
# the index that query serves. Counts and ppm shares are exact
# integers; empty cells surface with zero members via the centroid
# spine.

_S65 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, c_id FROM ranked WHERE rn = 1),
    sizes AS (
      SELECT c.c_id, CAST(COUNT(m.vec_id) AS BIGINT) AS n_members
      FROM cent c LEFT JOIN cell m ON m.c_id = c.c_id
      GROUP BY c.c_id),
    tot AS (SELECT CAST(SUM(n_members) AS BIGINT) AS n_total FROM sizes)
    SELECT CAST(s.c_id AS BIGINT) AS c_id, s.n_members, t.n_total,
           CAST(s.n_members * 1000000 // t.n_total AS BIGINT) AS share_ppm,
           CAST(s.n_members * {_IVF_K} * 1000000 // t.n_total AS BIGINT)
             AS vs_uniform_ppm
    FROM sizes s CROSS JOIN tot t
"""


@query("s65_ivf_cell_balance", _S65)
def s65_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell member counts and imbalance of s50's IVF index (see
    block comment).

    Scale shape: identical to s50's assignment — a broadcast product
    bounded by the K-row centroid table folded into a per-vector
    argmax, then ONE combinable count keyed on the 16-value cell id
    and the total as a metadata-only corpus count broadcast as one
    row. The audit costs one corpus scan, unpersisted."""
    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id",
        "embedding",
        F.sqrt(fold_dot("embedding", "embedding")).alias("nrm"),
    )
    cent = n.filter(
        (F.col("vec_id") >= _N_QUERIES) & (F.col("vec_id") < _N_QUERIES + _IVF_K)
    ).select(
        (F.col("vec_id") - _N_QUERIES).cast("int").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    ccos = fold_dot("embedding", "c_emb") / (F.col("nrm") * F.col("c_nrm"))
    scored = n.crossJoin(F.broadcast(cent.select("c_id", "c_emb", "c_nrm"))).select(
        "vec_id", "c_id", ccos.alias("ccos")
    )
    # same argmax-as-max(struct) trick as s50: highest cosine, lowest
    # c_id on ties — no per-vector window needed
    cell = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("ccos"), (-F.col("c_id")).alias("neg"))).alias("best")
    ).select("vec_id", (-F.col("best.neg")).cast("int").alias("c_id"))
    # Aggregate BEFORE joining the centroid spine: join-then-group
    # planned as a sort-merge join that shuffled the corpus-sized
    # assignment on 16 skewed cell ids (caught by the r9 PLAN_AUDIT
    # regen). group-then-join sends only map-side count partials
    # through the 16-key exchange, and the spine join becomes 16 × 16
    # broadcast rows; empty cells come back via the left join + 0.
    counts = cell.groupBy("c_id").agg(F.count(F.lit(1)).alias("cnt"))
    sizes = (
        cent.select("c_id")
        .join(F.broadcast(counts), "c_id", "left")
        .select(
            "c_id", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_members")
        )
    )
    # The total needs no second pass over the expensive fold_dot
    # assignment (the reason r8 persisted sizes): every DISTINCT
    # vec_id gets exactly ONE rn=1 cell whenever centroids exist, so
    # SUM(n_members) ≡ COUNT(DISTINCT vec_id) — a one-column two-stage
    # aggregate over the raw table (no fold_dot, no cross join),
    # crossJoined back as a one-row broadcast. DISTINCT (not COUNT(*))
    # keeps the oracle equivalence independent of the vec_id-unique
    # fixture invariant (review r9). When the centroid slice is empty
    # the result relation is empty from the cent-side left join, so
    # the total is never read. Same fold-the-second-consumer move as
    # q180's sweep (SCALING.md r9 addendum), one step further: the
    # second consumer became nearly free.
    tot = em.agg(F.countDistinct("vec_id").alias("n_total"))
    return sizes.crossJoin(F.broadcast(tot)).select(
        F.col("c_id").cast("long").alias("c_id"),
        "n_members",
        "n_total",
        F.expr("n_members * 1000000 div n_total").alias("share_ppm"),
        F.expr(f"n_members * {_IVF_K} * 1000000 div n_total").alias(
            "vs_uniform_ppm"
        ),
    )


# --- s66: quantizer centroid-separation matrix ---------------------------
#
# s65's companion diagnostic: pairwise cosine between the 16 IVF
# centroids. Near-parallel centroids split one true cluster across
# cells (queries then need higher nprobe to reach full recall — the
# s62 curve degrades), so "max pairwise cosine" is the retrain
# trigger alongside s65's imbalance. K²/2 = 120 pairs total — a
# bounded broadcast product, never data-sized. Cosines are rounded to
# 6 dp in the OUTPUT only (the s50 display rule; comparisons all
# happen on the driver of the retrain decision, not in-query).

_S66 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings
      WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding, nrm
      FROM n)
    SELECT a.c_id AS c_a, b.c_id AS c_b,
           ROUND({fold_dot_sql("a.embedding", "b.embedding")}
                 / (a.nrm * b.nrm), 6) AS cosine_r
    FROM cent a JOIN cent b ON b.c_id > a.c_id
"""


@query("s66_centroid_separation", _S66)
def s66_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 120 pairwise centroid cosines of s50's quantizer (see
    block comment).

    Scale shape: the centroid filter pushes to the scan; the pair
    join is the K-row table against itself — bounded by the quantizer
    size like s50's assignment product, independent of corpus size."""
    em = t(spark, sf_dir, "embeddings")
    cent = em.filter(
        (F.col("vec_id") >= _N_QUERIES) & (F.col("vec_id") < _N_QUERIES + _IVF_K)
    ).select(
        (F.col("vec_id") - _N_QUERIES).cast("int").alias("c_id"),
        "embedding",
        F.sqrt(fold_dot("embedding", "embedding")).alias("nrm"),
    )
    a, b = cent.alias("a"), cent.alias("b")
    cos = fold_dot("a.embedding", "b.embedding") / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return a.join(b, F.col("b.c_id") > F.col("a.c_id")).select(
        F.col("a.c_id").alias("c_a"),
        F.col("b.c_id").alias("c_b"),
        F.round(cos, 6).alias("cosine_r"),
    )


# --- s67: IVF efficiency audit (work vs agreement) ------------------------
#
# The table that justifies shipping an ANN index at all: per query,
# how many candidates the IVF probe actually touches (selectivity in
# ppm of the corpus) and whether its top-1 AGREES with the exhaustive
# top-1 — efficiency and quality in one read (s62 gives the recall
# curve; this gives the cost axis). Assignment, probing (nprobe=2),
# and the (cosine DESC, n_id) tie rule are byte-identical to s50, so
# the audited index is the served index.

_S67 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, embedding, nrm, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, embedding, nrm, c_id FROM ranked WHERE rn = 1),
    probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
      FROM ranked WHERE vec_id < {_N_QUERIES} AND rn <= {_IVF_NPROBE}),
    cand AS (
      SELECT p.q_id, m.vec_id AS n_id,
             {fold_dot_sql("p.q_emb", "m.embedding")} / (p.q_nrm * m.nrm)
               AS cosine
      FROM probe p JOIN cell m ON m.c_id = p.c_id
      WHERE m.vec_id <> p.q_id),
    ivf_top AS (
      SELECT q_id, n_id AS ivf_top1 FROM (
        SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS rk
        FROM cand) WHERE rk = 1),
    counts AS (
      SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY q_id),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM n),
    ex AS (
      SELECT q.vec_id AS q_id, m.vec_id AS n_id,
             {fold_dot_sql("q.embedding", "m.embedding")} / (q.nrm * m.nrm)
               AS cosine
      FROM n q JOIN n m ON m.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    exact_top AS (
      SELECT q_id, n_id AS exact_top1 FROM (
        SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS rk
        FROM ex) WHERE rk = 1)
    SELECT c.q_id, c.n_candidates, co.n_corpus,
           CAST(c.n_candidates * 1000000 // co.n_corpus AS BIGINT)
             AS selectivity_ppm,
           e.exact_top1, i.ivf_top1,
           CAST(e.exact_top1 = i.ivf_top1 AS INTEGER) AS agree
    FROM counts c
    JOIN ivf_top i ON i.q_id = c.q_id
    JOIN exact_top e ON e.q_id = c.q_id
    CROSS JOIN corpus co
"""


def _ivf_ranked(spark: SparkSession, sf_dir: str):
    """Shared IVF instrumentation prologue for s67/s68/s69: the normed
    embedding relation ``n`` and the per-vector centroid ranking
    ``ranked`` (rn = 1 is the assigned cell; rn ≤ nprobe are probe
    cells). BOTH are persisted and MATERIALIZED before return: each
    feeds several downstream consumers in one job, and an
    unmaterialized cache is raced by concurrent stage chains (the q182
    lesson) — before r8, every recompute re-read embeddings and
    re-evaluated the interpreted fold_dot centroid cross-join (the
    dynamic scan audit counted up to 70 embeddings reads in one
    executed s68 plan).

    The caches are DELIBERATELY session-scoped (ADVICE r8 #3,
    documented): the returned relations feed s67/s68/s69's lazy
    results, so they cannot be unpersisted here, and across those
    three queries the shared entry is the point — persist_once makes
    repeat invocations reuse it silently instead of WARN-spamming.
    Footprint bound: one normed-embeddings + one 5-int-column ranking
    relation per distinct sf_dir."""
    from pyspark.sql.window import Window

    em = t(spark, sf_dir, "embeddings")
    n = em.select(
        "vec_id", "embedding", F.sqrt(fold_dot("embedding", "embedding")).alias("nrm")
    ).transform(persist_materialized)
    cent = n.filter(
        (F.col("vec_id") >= _N_QUERIES) & (F.col("vec_id") < _N_QUERIES + _IVF_K)
    ).select(
        (F.col("vec_id") - _N_QUERIES).cast("int").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    ccos = fold_dot("embedding", "c_emb") / (F.col("nrm") * F.col("c_nrm"))
    scored = n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "nrm", "c_id", ccos.alias("ccos")
    )
    wq = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("c_id"))
    ranked = scored.withColumn("rn", F.row_number().over(wq)).transform(
        persist_materialized
    )
    return n, ranked


@query("s67_ivf_efficiency", _S67)
def s67_ivf_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query IVF candidates touched, selectivity ppm, and top-1
    agreement with the exhaustive scan (see block comment).

    Scale shape: the IVF side is s50's plan verbatim (broadcast-K
    assignment, cell equi-join probing). The exhaustive side is the
    deliberate ground-truth product — bounded by the 10-query probe
    set like s48, documented as the verification cost, not the
    serving path."""
    from pyspark.sql.window import Window

    n, ranked = _ivf_ranked(spark, sf_dir)
    cell = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "nrm", "c_id"
    )
    probe = ranked.filter(
        (F.col("vec_id") < _N_QUERIES) & (F.col("rn") <= _IVF_NPROBE)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "c_id",
    )
    qcos = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    cand = (
        probe.join(cell.withColumnRenamed("vec_id", "n_id"), "c_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", qcos.alias("cosine"))
        .transform(persist_materialized)
    )
    # materialized at persist (owned-only count, r13) before the top-1
    # + count double consumption
    wtop = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    ivf_top = (
        cand.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("n_id").alias("ivf_top1"))
    )
    counts = cand.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    corpus = n.agg(F.count(F.lit(1)).alias("n_corpus"))
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    ex = (
        n.withColumnRenamed("vec_id", "n_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", qcos.alias("cosine"))
    )
    exact_top = (
        ex.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("n_id").alias("exact_top1"))
    )
    return (
        counts.join(ivf_top, "q_id")
        .join(exact_top, "q_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "q_id",
            "n_candidates",
            "n_corpus",
            F.expr("n_candidates * 1000000 div n_corpus").alias(
                "selectivity_ppm"
            ),
            "exact_top1",
            "ivf_top1",
            (F.col("exact_top1") == F.col("ivf_top1"))
            .cast("int")
            .alias("agree"),
        )
    )


# --- s68: nprobe sweep (agreement vs work) -----------------------------------
#
# s67's knob sweep: the SAME IVF index probed at nprobe = 1 / 2 / 4,
# reporting per setting how many of the 10 queries' top-1 results
# agree with the exhaustive scan and the mean candidate selectivity —
# the curve an operator reads before picking the latency/recall
# trade. All three settings ride ONE plan (the d60 trick: nprobe joins
# in as a broadcast config relation against the per-query centroid
# ranking). Agreement counts are exact; mean selectivity is a floored
# ppm mean (per-query floor first — ratchet rule).

_S68_NPROBES = (1, 2, 4)

_S68 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, embedding, nrm, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, embedding, nrm, c_id FROM ranked WHERE rn = 1),
    nps AS (SELECT * FROM (VALUES (1), (2), (4)) v(np)),
    probe AS (
      SELECT nps.np, r.vec_id AS q_id, r.embedding AS q_emb,
             r.nrm AS q_nrm, r.c_id
      FROM ranked r CROSS JOIN nps
      WHERE r.vec_id < {_N_QUERIES} AND r.rn <= nps.np),
    cand AS (
      SELECT p.np, p.q_id, m.vec_id AS n_id,
             {fold_dot_sql("p.q_emb", "m.embedding")} / (p.q_nrm * m.nrm)
               AS cosine
      FROM probe p JOIN cell m ON m.c_id = p.c_id
      WHERE m.vec_id <> p.q_id),
    ivf_top AS (
      SELECT np, q_id, n_id AS ivf_top1 FROM (
        SELECT np, q_id, n_id, ROW_NUMBER() OVER (PARTITION BY np, q_id
                 ORDER BY cosine DESC, n_id) AS rk
        FROM cand) WHERE rk = 1),
    counts AS (
      SELECT np, q_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      FROM cand GROUP BY 1, 2),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM n),
    ex AS (
      SELECT q.vec_id AS q_id, m.vec_id AS n_id,
             {fold_dot_sql("q.embedding", "m.embedding")} / (q.nrm * m.nrm)
               AS cosine
      FROM n q JOIN n m ON m.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    exact_top AS (
      SELECT q_id, n_id AS exact_top1 FROM (
        SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS rk
        FROM ex) WHERE rk = 1)
    SELECT c.np AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN i.ivf_top1 = e.exact_top1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top1_agree,
           CAST(SUM(c.n_candidates * 1000000 // co.n_corpus) // COUNT(*)
                AS BIGINT) AS mean_selectivity_ppm
    FROM counts c
    JOIN ivf_top i ON i.np = c.np AND i.q_id = c.q_id
    JOIN exact_top e ON e.q_id = c.q_id
    CROSS JOIN corpus co
    GROUP BY c.np
"""


@query("s68_nprobe_sweep", _S68)
def s68_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 agreement and mean selectivity at nprobe = 1/2/4 in one
    plan (see block comment).

    Scale shape: the config fan-out multiplies only the 10-row probe
    relation; cells assign once; the exhaustive side is the same
    probe-bounded ground truth as s67."""
    from pyspark.sql.window import Window

    n, ranked = _ivf_ranked(spark, sf_dir)
    cell = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("n_id"), "embedding", "nrm", "c_id"
    )
    nps = spark.createDataFrame([(np,) for np in _S68_NPROBES], "np int")
    probe = (
        ranked.filter(F.col("vec_id") < _N_QUERIES)
        .crossJoin(F.broadcast(nps))
        .filter(F.col("rn") <= F.col("np"))
        .select(
            "np",
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "c_id",
        )
    )
    qcos = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    cand = (
        probe.join(cell, "c_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("np", "q_id", "n_id", qcos.alias("cosine"))
        .transform(persist_materialized)
    )
    # materialized at persist (owned-only count, r13) before the top-1
    # + count double consumption
    wtop = Window.partitionBy("np", "q_id").orderBy(
        F.desc("cosine"), F.asc("n_id")
    )
    ivf_top = (
        cand.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select("np", "q_id", F.col("n_id").alias("ivf_top1"))
    )
    counts = cand.groupBy("np", "q_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    corpus = n.agg(F.count(F.lit(1)).alias("n_corpus"))
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    ex = (
        n.withColumnRenamed("vec_id", "n_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", qcos.alias("cosine"))
    )
    wex = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    exact_top = (
        ex.withColumn("rk", F.row_number().over(wex))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("n_id").alias("exact_top1"))
    )
    return (
        counts.join(ivf_top, ["np", "q_id"])
        .join(exact_top, "q_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy(F.col("np").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                F.when(F.col("ivf_top1") == F.col("exact_top1"), 1).otherwise(0)
            ).alias("n_top1_agree"),
            F.expr(
                "sum(n_candidates * 1000000 div n_corpus) div count(1)"
            ).alias("mean_selectivity_ppm"),
        )
    )


# --- s69: mean reciprocal rank of the exhaustive top-1 -----------------------
#
# s61 (NDCG) grades graded relevance; MRR grades the single-right-
# answer retrieval task: at what rank does the IVF candidate list
# place the EXHAUSTIVE top-1 neighbor? Reciprocal ranks are floored
# micro units per query (1e6 // rank — ratchet rule) with 0 for a
# miss (the exact top-1 not in any probed cell), then a floored mean.
# One row: n_queries, hits, and MRR in micro units.

_S69 = f"""
    WITH n AS (
      SELECT vec_id, embedding,
             {fold_norm_sql("embedding")} AS nrm
      FROM embeddings),
    cent AS (
      SELECT CAST(vec_id - {_N_QUERIES} AS INTEGER) AS c_id,
             embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id >= {_N_QUERIES} AND vec_id < {_N_QUERIES + _IVF_K}),
    scored AS (
      SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
             {fold_dot_sql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) AS ccos
      FROM n CROSS JOIN cent c),
    ranked AS (
      SELECT vec_id, embedding, nrm, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ccos DESC, c_id) AS rn
      FROM scored),
    cell AS (SELECT vec_id, embedding, nrm, c_id FROM ranked WHERE rn = 1),
    probe AS (
      SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
      FROM ranked WHERE vec_id < {_N_QUERIES} AND rn <= {_IVF_NPROBE}),
    cand AS (
      SELECT p.q_id, m.vec_id AS n_id,
             ROW_NUMBER() OVER (PARTITION BY p.q_id
               ORDER BY {fold_dot_sql("p.q_emb", "m.embedding")}
                        / (p.q_nrm * m.nrm) DESC, m.vec_id) AS rk
      FROM probe p JOIN cell m ON m.c_id = p.c_id
      WHERE m.vec_id <> p.q_id),
    ex AS (
      SELECT q.vec_id AS q_id, m.vec_id AS n_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {fold_dot_sql("q.embedding", "m.embedding")}
                        / (q.nrm * m.nrm) DESC, m.vec_id) AS rk
      FROM n q JOIN n m ON m.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    truth AS (SELECT q_id, n_id AS true_top1 FROM ex WHERE rk = 1),
    rr AS (
      SELECT t.q_id,
             COALESCE(MAX(CASE WHEN c.n_id = t.true_top1
                               THEN 1000000 // c.rk END), 0) AS rr_micro
      FROM truth t LEFT JOIN cand c ON c.q_id = t.q_id
      GROUP BY t.q_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN rr_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(SUM(rr_micro) // COUNT(*) AS BIGINT) AS mrr_micro
    FROM rr
"""


@query("s69_mrr_eval", _S69)
def s69_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR of the exhaustive top-1 within the IVF candidate ranking
    (see block comment).

    Scale shape: the IVF side is s50's plan; the exhaustive side the
    probe-bounded ground truth; the reciprocal-rank election is a
    per-query MAX over the candidate equi-join — one summary row."""
    from pyspark.sql.window import Window

    n, ranked = _ivf_ranked(spark, sf_dir)
    cell = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("n_id"), "embedding", "nrm", "c_id"
    )
    probe = ranked.filter(
        (F.col("vec_id") < _N_QUERIES) & (F.col("rn") <= _IVF_NPROBE)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "c_id",
    )
    qcos = fold_dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("nrm"))
    wrk = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    cand = (
        probe.join(cell, "c_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", qcos.alias("cosine"))
        .withColumn("rk", F.row_number().over(wrk))
    )
    q = n.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    ex = (
        n.withColumnRenamed("vec_id", "n_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", qcos.alias("cosine"))
        .withColumn("rk", F.row_number().over(wrk))
    )
    truth = ex.filter(F.col("rk") == 1).select(
        "q_id", F.col("n_id").alias("true_top1")
    )
    rr = (
        truth.join(
            cand.select("q_id", "n_id", "rk"), "q_id", "left"
        )
        .groupBy("q_id")
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("n_id") == F.col("true_top1"),
                        F.expr("1000000 div rk"),
                    )
                ),
                F.lit(0),
            ).alias("rr_micro")
        )
    )
    return rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("rr_micro") > 0, 1).otherwise(0)).alias("n_hits"),
        F.expr("sum(rr_micro) div count(1)").alias("mrr_micro"),
    )

"""Remaining UDF/join surface: right join, grouped-map applyInPandas,
row-at-a-time Python UDF (demonstrated, with the explicit caveat that
it is the slowest path), and the distributed-rank pattern.

Every Python function here is a closure → cloudpickle serializes it by
value, so executors never need this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q52_join_right",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def q52_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (kept-side = nation; null-extended suppliers)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@query(
    "q53_grouped_map_rank",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS spend_rank,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS INTEGER) AS group_size
    FROM orders
    """,
)
def q53_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: whole group as one pandas frame in,
    frame out (the UDTF-ish custom-operator escape hatch). Computes a
    per-group rank so the DuckDB window oracle can verify the group
    routing, intra-group ordering, and Arrow round-trip exactly.

    Scale note: each group must fit one worker's memory — the right
    tool for bounded groups (per-customer, per-session), not for
    whole-table state; unbounded-group logic belongs in window
    functions (q21-q29) which spill. Measured cost: ~2 ms per group of
    Python/pandas overhead (~20 s for 10k customer groups at sf0.1)
    vs ~0.3 s for the identical rank as a JVM window (q21/q25) — use
    applyInPandas only when the per-group logic genuinely can't be
    expressed in Spark SQL."""

    def rank_group(pdf):  # closure → pickled by value
        pdf = pdf.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        pdf["spend_rank"] = range(1, len(pdf) + 1)
        pdf["group_size"] = len(pdf)
        return pdf[["o_custkey", "o_orderkey", "spend_rank", "group_size"]]

    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return o.groupBy("o_custkey").applyInPandas(
        rank_group, schema="o_custkey bigint, o_orderkey bigint, spend_rank int, group_size int"
    )


# r11 review #2 class: the ORACLE ring-reduces (DuckDB's BIGINT
# multiply is overflow-checked, so the raw product raises on ids past
# ~3.47e9); the Spark side is a Python-bigint UDF — exact at any id —
# and the ring identity keeps the two equal everywhere.
@query(
    "q54_python_udf_row",
    """
    SELECT o_orderkey,
           ((o_orderkey % 1000) * 2654435761) % 1000 AS key_hash,
           CASE WHEN o_totalprice > 200000 THEN 'H' ELSE 'L' END AS band
    FROM orders
    """,
)
def q54_python_udf_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — demonstrated for surface completeness
    ONLY. This path pays per-row serde and blocks codegen; q46's
    pandas_udf or built-ins are the production answer (the plan-quality
    tests forbid this node in the scalar-op hot paths)."""
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def key_hash(k):  # closure → pickled by value
        return (k * 2654435761) % 1000

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        key_hash(F.col("o_orderkey")).alias("key_hash"),
        F.when(F.col("o_totalprice") > 200000, "H").otherwise("L").alias("band"),
    )


# --- q115: Python UDTF (Spark 4 table-function surface) -------------
_Q115_N_PARTS = 4
_Q115_MIN_PRICE = 400000.0

_Q115 = f"""
    SELECT o.o_orderkey,
           CAST(i.i AS INTEGER) AS installment,
           CAST(
             (CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // {_Q115_N_PARTS})
             + CASE WHEN i.i < (CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                                % {_Q115_N_PARTS}) THEN 1 ELSE 0 END
             AS BIGINT) AS amount_cents
    FROM orders o, UNNEST(range({_Q115_N_PARTS})) AS i(i)
    WHERE o.o_totalprice > {_Q115_MIN_PRICE}
"""


@query("q115_udtf_installments", _Q115)
def q115_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): one input row → many output
    rows through a LATERAL table function — the fourth and last Python
    API surface (row UDF q54, scalar pandas UDF q46, grouped map q53,
    table function here). Each large order explodes into its
    installment schedule with exact integer-cents splitting (remainder
    spread over the first installments), so the DuckDB ``UNNEST(range)``
    oracle reproduces every row bit-for-bit.

    Scale note: like every Python-row surface this pays per-row
    serialization — the input is filtered FIRST (pushdown gated in
    tests) so the UDTF touches only qualifying rows, and the expansion
    factor is a constant. For pure integer expansion like this the
    JVM-side spelling is ``explode(sequence(...))`` (t64's shape); the
    UDTF form exists for expansions whose per-row logic genuinely needs
    Python."""
    from pyspark.sql.functions import lit, udtf

    n_parts = _Q115_N_PARTS

    @udtf(returnType="installment: int, amount_cents: bigint")
    class Installments:  # closure → pickled by value
        def eval(self, total_cents: int):
            base, rem = divmod(total_cents, n_parts)
            for i in range(n_parts):
                yield i, base + (1 if i < rem else 0)

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _Q115_MIN_PRICE)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return o.lateralJoin(
        Installments(F.col("cents").outer())
    ).select("o_orderkey", "installment", "amount_cents")


_Q120 = """
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("q120_pandas_grouped_agg", _Q120)
def q120_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate ``pandas_udf`` (Series → scalar): the fifth
    and last Python surface in SURVEY §2.B's UDF row (row UDF q54,
    scalar pandas q46, grouped map q53, UDTF q115, grouped agg here).
    The whole group's column arrives as ONE pandas Series per group —
    unlike q53 it returns a scalar, so Spark can still pipeline it
    inside a normal aggregate plan.

    Semantics chosen oracle-exact on purpose: quantities are integral
    doubles, and pandas ``Series.median`` and DuckDB ``MEDIAN`` use the
    same even-count interpolation, so the comparison is bit-exact.
    Scale note: a grouped-agg UDF buffers each group's column in one
    worker — same bounded-group caveat as q53; the JVM spelling
    (percentile, q43) is the production path when the aggregate is
    expressible."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's postponed annotations make
    # type-hint inference see strings it cannot resolve
    @pandas_udf("double", functionType=PandasUDFType.GROUPED_AGG)
    def median_qty(s):  # closure → pickled by value
        return float(s.median())

    # Spark refuses to mix pandas and JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas UDAF too
    @pandas_udf("long", functionType=PandasUDFType.GROUPED_AGG)
    def n_rows(s):
        return len(s)

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        median_qty("l_quantity").alias("med_qty"),
        n_rows("l_quantity").alias("n_items"),
    )


# --- q159: Arrow-optimized Python UDF (Spark 4 useArrow path) -------
_Q159 = """
    SELECT o_orderkey,
           CAST(
             length(CAST(o_orderkey AS VARCHAR))
             + CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 0 END
             AS BIGINT) AS tag,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
"""


@query("q159_arrow_python_udf", _Q159)
def q159_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized row UDF (``@F.udf(useArrow=True)``, Spark 4's
    middle tier between q54's pickled row UDF and q46's pandas UDF):
    row-at-a-time Python semantics but Arrow-batched transfer, so the
    per-row serde tax drops to the columnar exchange without rewriting
    the function vectorized. Plans as ArrowEvalPython — counted as a
    deliberate python_eval surface in PLAN_AUDIT next to q54/q46.

    Like q54, surface-completeness ONLY: the logic is expressible as
    built-ins (the oracle proves it), which remains the production
    answer for anything hot."""
    from pyspark.sql.types import LongType

    @F.udf(LongType(), useArrow=True)
    def tag(k):  # closure → pickled by value, Arrow-batched transfer
        return len(str(k)) + (100 if k % 97 == 0 else 0)

    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        tag(F.col("o_orderkey")).alias("tag"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

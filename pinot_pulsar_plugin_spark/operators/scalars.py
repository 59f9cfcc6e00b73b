"""Scalar function families: string, date/time, math, array, JSON/map,
conditional, pivot/unpivot.

Everything is built-in ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — no Python UDFs. Where Spark and DuckDB differ in function
spelling or result type (year() width, dayofweek origin, ceil type,
libm last-ulp drift on pow/ln/exp), both sides are normalized in the
query so the value-hash comparison is exact; see inline notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pinot_pulsar_plugin_spark.operators.common import make_registry, t

QUERIES, ORACLE, query = make_registry()


@query(
    "q34_string_funcs",
    """
    SELECT p_partkey,
           p_brand || '/' || p_type AS brand_type,
           SUBSTR(p_name, 1, 5) AS name5,
           UPPER(p_name) AS name_up,
           LOWER(p_brand) AS brand_lo,
           TRIM(p_type) AS type_trim,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(p_brand, 12, '*') AS brand_pad
    FROM part
    """,
)
def q34_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.trim("p_type").alias("type_trim"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
    )


@query(
    "q35_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
             AS days_since_95,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_1mo
    FROM orders
    """,
)
def q35_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Normalizations for oracle parity: DuckDB
    year() is bigint → cast INT both sides; Spark dayofweek is
    1=Sunday vs DuckDB isodow 1=Monday → convert Spark to ISO."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        ((F.dayofweek(d) + 5) % 7 + 1).cast("int").alias("iso_dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_add(d.cast("date"), 30).alias("plus_30d"),
        F.add_months(d.cast("date"), 1).alias("plus_1mo"),
    )


@query(
    "q36_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_discount, 4) AS disc_amt,
           ABS(l_quantity - 25.0) AS qty_dev,
           SQRT(l_extendedprice) AS price_sqrt,
           ROUND(POWER(1.0 + l_discount, 2.0), 6) AS disc_pow2,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           l_linenumber % 3 AS ln_mod3,
           CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS qty_sign
    FROM lineitem
    """,
)
def q36_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt/abs are IEEE-exact cross-engine; pow/ln/exp may
    drift a last ulp between libms → rounded to 6 decimals both sides."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 4 decimals: a 2-dec × 2-dec product has ≤4 decimals, so
        # no half-boundary exists (ROUND(x,2) here is engine-divergent —
        # Spark rounds the decimal expansion, DuckDB multiplies first)
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_amt"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2.0), 6).alias("disc_pow2"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_sign"),
    )


@query(
    "q37_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) AS head3_sum,
           list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[1]
             AS x2_1,
           list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[3]
             AS x2_3,
           CAST(list_max(embedding) AS DOUBLE) AS emax,
           CAST(list_min(embedding) AS DOUBLE) AS emin
    FROM embeddings
    """,
)
def q37_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, element_at, slice,
    transform (lambda), array_max/min. Element math is cast to double
    pre-op on both engines so results are bit-identical."""
    em = t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    el = lambda i: F.element_at(e, i).cast("double")  # noqa: E731
    return em.select(
        "vec_id",
        F.size(e).alias("dim"),
        el(1).alias("e1"),
        (el(1) + el(2) + el(3)).alias("head3_sum"),
        # transform (lambda) exercised; outputs flattened to scalars so
        # the driver's value-hash never sees an array-typed column
        F.element_at(
            F.transform(F.slice(e, 1, 3), lambda x: x.cast("double") * 2.0), 1
        ).alias("x2_1"),
        F.element_at(
            F.transform(F.slice(e, 1, 3), lambda x: x.cast("double") * 2.0), 3
        ).alias("x2_3"),
        F.array_max(e).cast("double").alias("emax"),
        F.array_min(e).cast("double").alias("emin"),
    )


@query(
    "q38_explode_tokens",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id < 20),
    idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tk[CAST(i AS INTEGER)] AS token
    FROM idx
    """,
)
def q38_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of a tokenized text column (lateral flatten)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@query(
    "q39_map_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_map,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
           json_extract_string(props, '$.k') AS k_tuple,
           1 AS n_keys
    FROM events
    """,
)
def q39_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode three ways — the reference decoder's parse step
    (PulsarJSONMessageDecoder.java:62-73): from_json to MapType,
    from_json to StructType, json_tuple. Scalar outputs only (map/struct
    types stay internal) so the oracle comparison is type-stable."""
    e = t(spark, sf_dir, "events")
    as_map = F.from_json("props", "map<string,int>")
    as_struct = F.from_json("props", "struct<k:int>")
    return e.select(
        "event_id",
        F.element_at(as_map, "k").alias("k_map"),
        as_struct.getField("k").alias("k_struct"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
        F.size(F.map_keys(as_map)).alias("n_keys"),
    )


@query(
    "q40_case_coalesce",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           LEAST(o_totalprice, 150000.0) AS capped,
           GREATEST(o_totalprice, 50000.0) AS floored,
           IF(o_orderpriority LIKE '1-%', 1, 0) AS is_urgent
    FROM orders
    """,
)
def q40_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE / COALESCE / NULLIF / LEAST /
    GREATEST / IF."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored"),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("is_urgent"),
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "q41_pivot",
    f"""
    SELECT c_nationkey,
           {", ".join(f'''COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS "{s}"'''
                      for s in _SEGMENTS)}
    FROM customer GROUP BY c_nationkey
    """,
)
def q41_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-nation customer counts by segment. Explicit value list
    (no extra distinct pass) and missing cells coalesced to 0 to match
    conditional-aggregation semantics."""
    c = t(spark, sf_dir, "customer")
    piv = c.groupBy("c_nationkey").pivot("c_mktsegment", _SEGMENTS).count()
    return piv.select(
        "c_nationkey",
        *[F.coalesce(F.col(f"`{s}`"), F.lit(0)).alias(s) for s in _SEGMENTS],
    )


@query(
    "q42_unpivot",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
)
def q42_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long) via DataFrame.unpivot (≡ SQL stack())."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# --- q161: URL function family (Pinot urlProtocol/urlDomain/…) ------
#
# Pinot ships a URL scalar family; the engine analog is structured
# URL decomposition + per-host rollup. No URL column exists in the
# corpus, so referrer URLs are INJECTED deterministically from event
# ids (the q86/t60 pattern) — the interesting part is the
# decomposition plan, which is identical on real data. Parsing uses
# one anchored regexp evaluated identically on both engines (Spark's
# parse_url has no DuckDB counterpart; a shared regex does), plus
# query-string key extraction.

_Q161_RE = "^(https?)://([^/?]+)(/[^?]*)?(?:\\?(.*))?$"

_Q161 = f"""
    WITH urls AS (
      SELECT event_id,
             'http' || CASE WHEN event_id % 4 = 0 THEN 's' ELSE '' END ||
             '://h' || CAST(user_id % 7 AS VARCHAR) || '.example.com/p/' ||
             CAST(event_id % 13 AS VARCHAR) ||
             CASE WHEN event_id % 3 = 0
                  THEN '?ref=' || CAST(event_id % 5 AS VARCHAR) || '&x=1'
                  ELSE '' END AS url
      FROM events),
    parts AS (
      SELECT event_id,
             regexp_extract(url, '{_Q161_RE}', 1) AS proto,
             regexp_extract(url, '{_Q161_RE}', 2) AS host,
             COALESCE(NULLIF(regexp_extract(url, '{_Q161_RE}', 3), ''), '/')
               AS path,
             NULLIF(regexp_extract(url, '{_Q161_RE}', 4), '') AS query,
             NULLIF(regexp_extract(url, 'ref=([^&]*)', 1), '') AS ref_val
      FROM urls)
    SELECT proto, host,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(SUM(CASE WHEN query IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_with_query,
           CAST(COUNT(DISTINCT ref_val) AS BIGINT) AS n_ref_values
    FROM parts GROUP BY proto, host
"""


@query("q161_url_functions", _Q161)
def q161_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (protocol/host/path/query/param) and per-host
    rollup — the Pinot URL-function-family analog on injected referrer
    URLs (see block comment).

    Scale shape: parsing is in-row regexp at scan speed (zero
    shuffle); the rollup is one combinable aggregate keyed by
    (proto, host) — cardinality-bounded output. The two exact
    DISTINCTs share the single Expand pass Spark plans for
    multi-distinct aggregates."""
    e = t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("http"),
        F.when(F.expr("event_id % 4 = 0"), "s").otherwise(""),
        F.lit("://h"),
        F.expr("CAST(user_id % 7 AS STRING)"),
        F.lit(".example.com/p/"),
        F.expr("CAST(event_id % 13 AS STRING)"),
        F.when(
            F.expr("event_id % 3 = 0"),
            F.concat(F.lit("?ref="), F.expr("CAST(event_id % 5 AS STRING)"), F.lit("&x=1")),
        ).otherwise(""),
    )
    urls = e.select("event_id", url.alias("url"))
    rx = _Q161_RE.replace("\\\\", "\\")
    parts = urls.select(
        "event_id",
        F.regexp_extract("url", rx, 1).alias("proto"),
        F.regexp_extract("url", rx, 2).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract("url", rx, 3), F.lit("")), F.lit("/")
        ).alias("path"),
        F.nullif(F.regexp_extract("url", rx, 4), F.lit("")).alias("query"),
        F.nullif(F.regexp_extract("url", "ref=([^&]*)", 1), F.lit("")).alias(
            "ref_val"
        ),
    )
    return parts.groupBy("proto", "host").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("path").alias("n_paths"),
        F.sum(F.when(F.col("query").isNull(), 0).otherwise(1)).alias("n_with_query"),
        F.countDistinct("ref_val").alias("n_ref_values"),
    )


# --- q170: nested JSON array extraction (jsonPath-over-arrays) ------
#
# q03/q39 cover scalar and map JSON; q170 covers the third shape
# Pinot's JSON index and json_extract family serve: an ARRAY OF
# OBJECTS inside the payload (order line arrays, tag lists). The
# payload is synthesized per order from its ids (deterministic, the
# q161 pattern): items = [{"sku": …, "qty": …}, …] with 1-3 entries.
# The plan: one from_json with an array<struct> schema, explode, and
# an aggregate proving values survive the round-trip — all JVM-side
# (from_json/explode), zero Python.
#
# Exactness: every extracted field is an integer derived from ids;
# the aggregate is integer sums/counts.

_Q170 = """
    WITH payload AS (
      SELECT o_orderkey,
             '{"items": [' ||
             '{"sku": ' || CAST(o_orderkey % 97 AS VARCHAR) ||
             ', "qty": ' || CAST(o_orderkey % 5 + 1 AS VARCHAR) || '}' ||
             CASE WHEN o_orderkey % 3 >= 1 THEN
               ', {"sku": ' || CAST((o_orderkey + 13) % 97 AS VARCHAR) ||
               ', "qty": ' || CAST(o_orderkey % 7 + 1 AS VARCHAR) || '}'
             ELSE '' END ||
             CASE WHEN o_orderkey % 3 = 2 THEN
               ', {"sku": ' || CAST((o_orderkey + 29) % 97 AS VARCHAR) ||
               ', "qty": 1}'
             ELSE '' END ||
             ']}' AS doc
      FROM orders),
    items AS (
      SELECT o_orderkey,
             CAST(item.sku AS BIGINT) AS sku,
             CAST(item.qty AS BIGINT) AS qty
      FROM payload,
           LATERAL UNNEST(CAST(json_extract(doc, '$.items')
                          AS STRUCT(sku BIGINT, qty BIGINT)[])) AS u(item))
    SELECT sku,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM items GROUP BY sku
"""


@query("q170_json_array_extract", _Q170)
def q170_json_array_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-objects JSON decode: from_json with an array<struct>
    schema, explode, per-sku rollup (see block comment) — the nested
    third of the JSON surface next to q03 (project) and q39 (map).

    Scale shape: parse and explode are in-row JVM expressions at scan
    speed (bounded ×3 fanout); the rollup is one combinable exchange
    keyed by sku. A real JSON column replaces the synthesized doc;
    the plan is unchanged."""
    o = t(spark, sf_dir, "orders")
    doc = F.concat(
        F.lit('{"items": [{"sku": '),
        F.expr("CAST(o_orderkey % 97 AS STRING)"),
        F.lit(', "qty": '),
        F.expr("CAST(o_orderkey % 5 + 1 AS STRING)"),
        F.lit("}"),
        F.when(
            F.expr("o_orderkey % 3 >= 1"),
            F.concat(
                F.lit(', {"sku": '),
                F.expr("CAST((o_orderkey + 13) % 97 AS STRING)"),
                F.lit(', "qty": '),
                F.expr("CAST(o_orderkey % 7 + 1 AS STRING)"),
                F.lit("}"),
            ),
        ).otherwise(""),
        F.when(
            F.expr("o_orderkey % 3 = 2"),
            F.concat(
                F.lit(', {"sku": '),
                F.expr("CAST((o_orderkey + 29) % 97 AS STRING)"),
                F.lit(', "qty": 1}'),
            ),
        ).otherwise(""),
        F.lit("]}"),
    )
    payload = o.select("o_orderkey", doc.alias("doc"))
    parsed = payload.select(
        "o_orderkey",
        F.from_json(
            "doc", "struct<items: array<struct<sku: bigint, qty: bigint>>>"
        ).alias("p"),
    )
    items = parsed.select(
        "o_orderkey", F.explode(F.col("p.items")).alias("item")
    ).select(
        "o_orderkey", F.col("item.sku").alias("sku"), F.col("item.qty").alias("qty")
    )
    return items.groupBy("sku").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").alias("total_qty"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


# --- q183: business-day fulfillment lag -------------------------------
#
# The SLA metric ops teams actually track: WEEKDAYS between order
# placement and first shipment (calendar-day lags overstate weekend
# spans). Closed form, no calendar explode: with epoch day 0 a
# Thursday and Monday = 0 (the q166 anchor rule), the number of
# business days in [0, d) is g(d+3) where
#     g(n) = 5·(n // 7) + LEAST(n % 7, 5)
# (count of y in [0, n) with y % 7 ≤ 4), so the lag over [d1, d2) is
# g(d2+3) − g(d1+3). Pure int64 floor-div/mod arithmetic — identical
# on both engines at any date, no date functions in the hot path.

_Q183 = """
    WITH first_ship AS (
      SELECT l_orderkey,
             MIN(epoch_us(l_shipdate)) // 86400000000 AS ship_day
      FROM lineitem GROUP BY 1),
    lags AS (
      SELECT o.o_orderpriority,
             (5 * ((f.ship_day + 3) // 7)
                + LEAST((f.ship_day + 3) % 7, 5))
             - (5 * ((epoch_us(o.o_orderdate) // 86400000000 + 3) // 7)
                + LEAST((epoch_us(o.o_orderdate) // 86400000000 + 3) % 7, 5))
               AS lag_bd
      FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(lag_bd) * 1000 // COUNT(*) AS BIGINT) AS avg_lag_milli,
           CAST(MAX(lag_bd) AS BIGINT) AS max_lag_bd
    FROM lags GROUP BY 1
"""


@query("q183_business_day_lag", _Q183)
def q183_business_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day lag from order date to first shipment, per
    priority (see block comment for the closed-form weekday count).

    Scale shape: first-ship is one map-side-combinable MIN per order;
    the order join is key-to-key; the priority rollup is a handful of
    groups. The lag itself is whole-stage-codegen integer arithmetic —
    no calendar table, no explode, no UDF."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(
        F.expr("min(unix_micros(l_shipdate)) div 86400000000").alias("ship_day")
    )
    joined = o.join(first_ship, first_ship["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (
            (
                F.expr("5 * ((ship_day + 3) div 7) + least((ship_day + 3) % 7, 5)")
            )
            - F.expr(
                "5 * ((unix_micros(o_orderdate) div 86400000000 + 3) div 7) "
                "+ least((unix_micros(o_orderdate) div 86400000000 + 3) % 7, 5)"
            )
        ).alias("lag_bd"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("sum(lag_bd) * 1000 div count(1)").alias("avg_lag_milli"),
        F.max("lag_bd").alias("max_lag_bd"),
    )


# --- q202: accounts-receivable aging buckets -------------------------------
#
# The AR aging report finance closes every period with: open orders
# ('O' status) bucketed by age at the reporting date (the corpus's
# max order date — a broadcast scalar, so the report needs no
# parameter), with counts and exact open cents per (priority, bucket).
# Ages are integer epoch-day differences; buckets are the standard
# 0-30 / 31-60 / 61-90 / 90+.

_Q202 = """
    WITH base AS (
      SELECT o_orderpriority,
             epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderstatus = 'O'),
    ref AS (SELECT MAX(epoch_us(o_orderdate)) // 86400000000 AS today
            FROM orders)
    SELECT o_orderpriority,
           CASE WHEN ref.today - base.day <= 30 THEN '0-30'
                WHEN ref.today - base.day <= 60 THEN '31-60'
                WHEN ref.today - base.day <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS open_cents
    FROM base CROSS JOIN ref
    GROUP BY 1, 2
"""


@query("q202_ar_aging", _Q202)
def q202_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging buckets at the corpus max date (see block
    comment).

    Scale shape: the status filter pushes to the scan, the reporting
    date is a one-row broadcast, and the report is one combinable
    aggregate over scan-time CASE arithmetic — a single pass."""
    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderpriority",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ref = o.agg(
        F.expr("max(unix_micros(o_orderdate)) div 86400000000").alias("today")
    )
    age = F.col("today") - F.col("day")
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 60, "31-60")
        .when(age <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        base.crossJoin(F.broadcast(ref))
        .groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("open_cents"),
        )
    )

"""Seeded random differential fuzzing (mini-sqllogictest).

Generates queries from a grammar both engines parse identically (ANSI
subset over integer/string columns with exact aggregates only), runs
the SAME SQL text through Spark SQL and DuckDB, and requires exact
equality. Complements the fixed oracle suite: the grammar explores
predicate/group-by combinations no hand-written query covers.
"""

from __future__ import annotations

import random

import pytest

from pinot_pulsar_plugin_spark.catalog import load_table
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"

_INT_COLS = ["o_orderkey", "o_custkey"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]
_STATUSES = ["O", "F", "P"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _gen_predicate(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:
        return f"{rng.choice(_INT_COLS)} % {rng.randrange(2, 9)} = {rng.randrange(0, 2)}"
    if kind == 1:
        return f"{rng.choice(_INT_COLS)} BETWEEN {rng.randrange(0, 500)} AND {rng.randrange(500, 1500)}"
    if kind == 2:
        vals = ", ".join(f"'{v}'" for v in rng.sample(_STATUSES, rng.randrange(1, 3)))
        return f"o_orderstatus IN ({vals})"
    if kind == 3:
        return f"o_orderpriority = '{rng.choice(_PRIOS)}'"
    if kind == 4:
        return f"NOT ({_gen_predicate(rng)})"
    left, op, right = _gen_predicate(rng), rng.choice(["AND", "OR"]), _gen_predicate(rng)
    return f"({left} {op} {right})"


def _gen_query(rng: random.Random) -> str:
    pred = _gen_predicate(rng)
    group = rng.choice(_STR_COLS)
    aggs = rng.sample(
        [
            "COUNT(*) AS n",
            "MIN(o_orderkey) AS min_k",
            "MAX(o_orderkey) AS max_k",
            "CAST(SUM(o_orderkey) AS BIGINT) AS sum_k",
            "COUNT(DISTINCT o_custkey) AS n_cust",
        ],
        rng.randrange(2, 5),
    )
    return f"SELECT {group}, {', '.join(aggs)} FROM orders WHERE {pred} GROUP BY {group}"


def _gen_join_query(rng: random.Random) -> str:
    pred = _gen_predicate(rng)
    how = rng.choice(["JOIN", "LEFT JOIN"])
    agg = rng.choice(
        ["COUNT(*) AS n", "COUNT(o.o_orderkey) AS n", "MIN(o.o_orderkey) AS mn"]
    )
    return (
        f"SELECT c.c_mktsegment, {agg} "
        f"FROM customer c {how} orders o ON c.c_custkey = o.o_custkey "
        f"AND ({pred}) GROUP BY c.c_mktsegment"
    )


@pytest.fixture(scope="module")
def fuzz_env(spark):
    load_table(spark, SF, "orders").createOrReplaceTempView("orders")
    load_table(spark, SF, "customer").createOrReplaceTempView("customer")
    load_table(spark, SF, "documents").createOrReplaceTempView("documents")
    load_table(spark, SF, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, SF, "part").createOrReplaceTempView("part")
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_differential(seed, spark, fuzz_env):
    rng = random.Random(9000 + seed)
    sql = _gen_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"fuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_join_differential(seed, spark, fuzz_env):
    rng = random.Random(7000 + seed)
    sql = _gen_join_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"jfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_window_query(rng: random.Random) -> str:
    part = rng.choice(_STR_COLS)
    fn = rng.choice(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            "COUNT(*) OVER_FRAME",
            "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER_FRAME",
            "MIN(o_orderkey) OVER_FRAME",
        ]
    )
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        ]
    )
    over = f"OVER (PARTITION BY {part} ORDER BY o_orderkey"
    if "OVER_FRAME" in fn:
        expr = fn.replace("OVER_FRAME", f"{over} {frame})")
    else:
        expr = f"{fn} {over})"
    pred = _gen_predicate(rng)
    return (
        f"SELECT o_orderkey, {part}, CAST({expr} AS BIGINT) AS w "
        f"FROM orders WHERE {pred}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_window_differential(seed, spark, fuzz_env):
    """Random window functions with explicit ROWS frames (unique
    order-by key keeps every spec deterministic)."""
    rng = random.Random(5000 + seed)
    sql = _gen_window_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"wfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_rollup_query(rng: random.Random) -> str:
    k0, k1 = rng.sample(_STR_COLS, 2)
    form = rng.choice(
        [
            f"ROLLUP ({k0}, {k1})",
            f"CUBE ({k0}, {k1})",
            f"GROUPING SETS (({k0}), ({k1}), ())",
        ]
    )
    pred = _gen_predicate(rng)
    return (
        f"SELECT {k0}, {k1}, COUNT(*) AS n, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS s, "
        f"CAST(GROUPING({k0}) AS INTEGER) AS g0, "
        f"CAST(GROUPING({k1}) AS INTEGER) AS g1 "
        f"FROM orders WHERE {pred} GROUP BY {form}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_rollup_differential(seed, spark, fuzz_env):
    """Random ROLLUP/CUBE/GROUPING SETS with GROUPING() indicators —
    the super-aggregate NULL semantics both engines must agree on."""
    rng = random.Random(3000 + seed)
    sql = _gen_rollup_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"rfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


_SCALAR_EXPRS = [
    "UPPER(o_orderpriority)",
    "LOWER(o_orderpriority)",
    "SUBSTR(o_orderpriority, 2, 4)",
    "CAST(LENGTH(o_orderpriority) AS BIGINT)",
    "CONCAT(o_orderstatus, '-', o_orderpriority)",
    "REPLACE(o_orderpriority, '-', '_')",
    "TRIM(o_orderstatus)",
    "CASE WHEN o_orderkey % 2 = 0 THEN 'even' ELSE 'odd' END",
    "COALESCE(NULLIF(o_orderstatus, 'O'), 'open')",
    "CAST(o_orderkey % 97 AS BIGINT)",
    "CAST(ABS(o_custkey - 750) AS BIGINT)",
]


def _gen_scalar_query(rng: random.Random) -> str:
    exprs = rng.sample(_SCALAR_EXPRS, rng.randrange(2, 5))
    cols = ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
    pred = _gen_predicate(rng)
    return f"SELECT o_orderkey, {cols} FROM orders WHERE {pred}"


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_scalar_differential(seed, spark, fuzz_env):
    """Random scalar-function pipelines (string/case/arithmetic subset
    both dialects define identically)."""
    rng = random.Random(1000 + seed)
    sql = _gen_scalar_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"sfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


# String functions verified to have identical name + semantics in Spark
# SQL and DuckDB (each templated over a documents column or snippet).
_TEXT_EXPRS = [
    "CAST(contains(text, '{w}') AS INTEGER)",
    "CAST(instr(text, '{w}') AS BIGINT)",
    "left(text, {n})",
    "right(text, {n})",
    "lpad(source, {n}, '*')",
    "repeat(lang, {k})",
    "reverse(left(text, {n}))",
    "split_part(text, ' ', {k})",
    "CAST(levenshtein(left(text, {k}), '{w}') AS BIGINT)",
    "md5(left(text, {n}))",
    "translate(left(text, {n}), 'aeiou', 'AEIOU')",
    # regexp_extract is the one regexp function with identical
    # name+semantics in both dialects (leftmost match, '' on miss);
    # patterns stay in the Java-regex ∩ RE2 subset (no lookarounds)
    "regexp_extract(text, '({w}[a-z]*)', 1)",
    "regexp_extract(text, '[a-z]{{{k}}} ', 0)",
    "CAST(length(regexp_extract(text, '{w}[a-z]*', 0)) AS BIGINT)",
]
_TEXT_WORDS = ["table", "scan", "value", "query", "zzz"]


def _gen_text_query(rng: random.Random) -> str:
    exprs = rng.sample(_TEXT_EXPRS, rng.randrange(2, 5))
    cols = ", ".join(
        e.format(
            w=rng.choice(_TEXT_WORDS), n=rng.randrange(3, 30), k=rng.randrange(1, 6)
        )
        + f" AS c{i}"
        for i, e in enumerate(exprs)
    )
    pred = rng.choice(
        [
            f"lang = '{rng.choice(['en', 'de', 'fr', 'es'])}'",
            f"n_chars BETWEEN {rng.randrange(0, 200)} AND {rng.randrange(200, 600)}",
            f"doc_id % {rng.randrange(2, 7)} = 0",
            f"text LIKE '%{rng.choice(_TEXT_WORDS)}%'",
        ]
    )
    return f"SELECT doc_id, {cols} FROM documents WHERE {pred}"


def _gen_filter_agg_query(rng: random.Random) -> str:
    """Aggregates with FILTER clauses and DISTINCT modifiers — the
    corner where Spark and DuckDB semantics diverge most (VERDICT r3
    next-round item #4): per-aggregate predicates, distinct-within-
    group, and their combination."""
    group = rng.choice(_STR_COLS)
    aggs = rng.sample(
        [
            f"COUNT(*) FILTER (WHERE {_gen_predicate(rng)}) AS f0",
            f"COUNT(DISTINCT o_custkey) FILTER (WHERE {_gen_predicate(rng)}) AS f1",
            f"CAST(SUM(o_orderkey) FILTER (WHERE {_gen_predicate(rng)}) AS BIGINT) AS f2",
            f"CAST(SUM(DISTINCT o_custkey % 50) AS BIGINT) AS f3",
            f"MIN(o_orderkey) FILTER (WHERE {_gen_predicate(rng)}) AS f4",
            f"MAX(o_custkey) FILTER (WHERE {_gen_predicate(rng)}) AS f5",
            "COUNT(DISTINCT o_orderstatus) AS f6",
            f"CAST(AVG(DISTINCT o_custkey % 25) AS DOUBLE) AS f7",
        ],
        rng.randrange(2, 5),
    )
    pred = _gen_predicate(rng)
    return (
        f"SELECT {group}, {', '.join(aggs)} FROM orders "
        f"WHERE {pred} GROUP BY {group}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_filter_agg_differential(seed, spark, fuzz_env):
    """Random FILTER-clause / DISTINCT aggregates (both engines define
    FILTER per ANSI: the aggregate sees only qualifying rows, NULL /
    zero identity when none qualify)."""
    rng = random.Random(13000 + seed)
    sql = _gen_filter_agg_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"ffuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_setop_query(rng: random.Random) -> str:
    """Set operations over aligned projections — DISTINCT and ALL
    variants, optionally composed, with multiset (ALL) semantics the
    order-insensitive compare checks exactly."""
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
    )
    cols = f"o_orderstatus, o_orderpriority, o_orderkey % {rng.randrange(3, 9)} AS b"
    p1, p2 = _gen_predicate(rng), _gen_predicate(rng)
    q = (
        f"SELECT {cols} FROM orders WHERE {p1} "
        f"{op} SELECT {cols} FROM orders WHERE {p2}"
    )
    if rng.random() < 0.4:  # three-branch composition, left-associative
        op2 = rng.choice(["UNION", "UNION ALL", "EXCEPT"])
        q += f" {op2} SELECT {cols} FROM orders WHERE {_gen_predicate(rng)}"
    return q


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_setop_differential(seed, spark, fuzz_env):
    """Random UNION/INTERSECT/EXCEPT chains incl. ALL multiset forms —
    both engines are left-associative with equal precedence for the
    grammar produced here (no mixed INTERSECT precedence cases)."""
    rng = random.Random(17000 + seed)
    sql = _gen_setop_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"ufuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_text_differential(seed, spark, fuzz_env):
    """Random text-function pipelines over documents — the string
    surface the LLM-pipeline ops (t50-t58) build on, explored beyond
    the hand-written queries."""
    rng = random.Random(11000 + seed)
    sql = _gen_text_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"tfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


# Temporal expressions with identical name+semantics in Spark SQL and
# DuckDB over a TIMESTAMP column (testdata r5 ships o_orderdate /
# l_shipdate / ts as micros-no-tz parquet, which the engine must read
# as plain TIMESTAMP — this family pins that read path end-to-end).
_TIME_EXPRS = [
    "CAST(year(o_orderdate) AS BIGINT)",
    "CAST(month(o_orderdate) AS BIGINT)",
    "CAST(day(o_orderdate) AS BIGINT)",
    "CAST(quarter(o_orderdate) AS BIGINT)",
    # DuckDB date_trunc returns DATE for day-or-coarser parts, Spark
    # always TIMESTAMP — the outer cast aligns them without changing
    # either engine's truncation semantics
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)",
    "CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)",
    "date_trunc('hour', o_orderdate)",
    "CAST(o_orderdate AS DATE)",
    "o_orderdate + INTERVAL {k} DAY",
    "CAST(extract(doy FROM o_orderdate) AS BIGINT)",
    # week-grain parity: ISO week number and Monday-start week trunc
    # agree between engines (probed 1996 dates incl. year boundary)
    "CAST(extract(week FROM o_orderdate) AS BIGINT)",
    "CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)",
    "CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)",
    "CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)",
    "last_day(CAST(o_orderdate AS DATE))",
    "greatest(o_orderdate, TIMESTAMP '1996-01-01 00:00:00')",
]


def _gen_temporal_query(rng: random.Random) -> str:
    exprs = rng.sample(_TIME_EXPRS, rng.randrange(2, 5))
    cols = ", ".join(
        e.format(k=rng.randrange(1, 90)) + f" AS c{i}" for i, e in enumerate(exprs)
    )
    pred = rng.choice(
        [
            f"o_orderdate >= TIMESTAMP '199{rng.randrange(5, 9)}-0{rng.randrange(1, 10)}-01 00:00:00'",
            f"year(o_orderdate) = 199{rng.randrange(5, 9)}",
            _gen_predicate(rng),
        ]
    )
    return f"SELECT o_orderkey, {cols} FROM orders WHERE {pred}"


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_temporal_differential(seed, spark, fuzz_env):
    """Random temporal-function pipelines over the TIMESTAMP columns —
    extraction, truncation, interval arithmetic, date casts; guards the
    parquet micros-no-tz → TimestampType read path (r5 testdata)."""
    rng = random.Random(29000 + seed)
    sql = _gen_temporal_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"dtfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_subquery_query(rng: random.Random) -> str:
    """Correlated / quantified subqueries (VERDICT r4 #5): EXISTS and
    NOT EXISTS with extra correlated predicates, IN and NOT IN with
    NULLIF-injected NULLs (the ANSI three-valued corner where NOT IN
    over a NULL-containing list yields no rows), and correlated scalar
    aggregates — incl. COUNT(*) over an empty correlated group, which
    must be 0, not NULL (the classic decorrelation-rewrite bug)."""
    pred = _gen_predicate(rng)
    kind = rng.randrange(5)
    if kind == 0:
        q = rng.choice(["EXISTS", "NOT EXISTS"])
        return (
            f"SELECT c_custkey, c_mktsegment FROM customer c WHERE {q} "
            f"(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND ({pred}))"
        )
    if kind == 1:
        return (
            f"SELECT c_custkey, c_mktsegment FROM customer c WHERE c_custkey IN "
            f"(SELECT o_custkey FROM orders WHERE {pred})"
        )
    if kind == 2:
        # NULLIF plants a NULL in the list for custkeys that exist, so
        # NOT IN collapses to empty whenever the predicate admits one —
        # both engines must agree on the three-valued result
        k = rng.randrange(1, 1500)
        return (
            f"SELECT c_custkey FROM customer c WHERE c_custkey NOT IN "
            f"(SELECT NULLIF(o_custkey, {k}) FROM orders WHERE {pred})"
        )
    if kind == 3:
        agg = rng.choice(
            ["CAST(COUNT(*) AS BIGINT)", "MIN(o_orderkey)", "MAX(o_orderkey)"]
        )
        return (
            f"SELECT c_custkey, (SELECT {agg} FROM orders o "
            f"WHERE o.o_custkey = c.c_custkey AND ({pred})) AS v "
            f"FROM customer c WHERE c_custkey % {rng.randrange(2, 6)} = 0"
        )
    # HAVING over a correlated-derived count via join-free quantifier
    return (
        f"SELECT o_orderstatus, COUNT(*) AS n FROM orders WHERE o_custkey IN "
        f"(SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING') "
        f"AND ({pred}) GROUP BY o_orderstatus"
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_subquery_differential(seed, spark, fuzz_env):
    """Random correlated/quantified subqueries — NULL semantics in
    NOT IN lists, empty-group correlated COUNT(*), correlated
    EXISTS/scalar aggregates (the decorrelation hotspots)."""
    rng = random.Random(19000 + seed)
    sql = _gen_subquery_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"qfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_range_frame_query(rng: random.Random) -> str:
    """RANGE frames over DUPLICATE order keys (VERDICT r4 #5): the
    modulo order key puts many peers in each value class, so RANGE
    (value-based, peers share a frame) and ROWS (position-based,
    nondeterministic under ties) genuinely differ — only the RANGE
    forms are generated, and every per-row result is deterministic
    because a frame depends on the ORDER BY value alone."""
    part = rng.choice(_STR_COLS)
    mod = rng.randrange(5, 40)
    direction = rng.choice(["ASC", "DESC"])
    frame = rng.choice(
        [
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN {rng.randrange(1, 10)} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {rng.randrange(1, 10)} FOLLOWING",
            f"RANGE BETWEEN {rng.randrange(1, 6)} PRECEDING AND {rng.randrange(1, 6)} FOLLOWING",
        ]
    )
    agg = rng.choice(
        ["SUM(o_orderkey)", "COUNT(*)", "MIN(o_orderkey)", "MAX(o_orderkey)"]
    )
    pred = _gen_predicate(rng)
    return (
        f"SELECT o_orderkey, o_custkey % {mod} AS k, "
        f"CAST({agg} OVER (PARTITION BY {part} "
        f"ORDER BY o_custkey % {mod} {direction} {frame}) AS BIGINT) AS w "
        f"FROM orders WHERE {pred}"
    )


def _gen_layered_query(rng: random.Random) -> str:
    """Composite shapes: GROUP BY in a derived table, a window over the
    aggregated rows, and an outer filter on the window value — the
    optimizer path (agg → window → filter pushdown barriers) no
    single-layer family exercises."""
    group = rng.choice(_STR_COLS)
    inner_pred = _gen_predicate(rng)
    agg = rng.choice(
        [
            "COUNT(*)",
            "CAST(SUM(o_orderkey) AS BIGINT)",
            "MIN(o_orderkey)",
            "COUNT(DISTINCT o_custkey)",
        ]
    )
    win = rng.choice(
        [
            "ROW_NUMBER() OVER (ORDER BY m DESC, g)",
            "RANK() OVER (ORDER BY m DESC, g)",
            "CAST(SUM(m) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            "CAST(LAG(m, 1, 0) OVER (ORDER BY g) AS BIGINT)",
        ]
    )
    outer = rng.choice(["w > 1", "w <= 3", "m > 5", "TRUE"])
    return (
        f"SELECT g, m, w FROM ("
        f"  SELECT g, m, {win} AS w FROM ("
        f"    SELECT {group} AS g, CAST({agg} AS BIGINT) AS m"
        f"    FROM orders WHERE {inner_pred} GROUP BY {group}) a"
        f") b WHERE {outer}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_layered_differential(seed, spark, fuzz_env):
    """Random agg→window→filter compositions over derived tables."""
    rng = random.Random(41000 + seed)
    sql = _gen_layered_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"lyfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_nullkey_join_query(rng: random.Random) -> str:
    """Outer joins with NULL-INJECTED join keys: NULLIF plants NULLs on
    one or both sides, and ANSI equi-join semantics (NULL matches
    nothing, outer sides still emit the row with NULL partners) must
    agree row-for-row across engines."""
    how = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    null_left = rng.random() < 0.7
    null_right = rng.random() < 0.7
    lkey = (
        f"NULLIF(o_custkey % {rng.randrange(50, 200)}, {rng.randrange(0, 40)})"
        if null_left
        else f"o_custkey % {rng.randrange(50, 200)}"
    )
    rkey = (
        f"NULLIF(c_custkey % {rng.randrange(50, 200)}, {rng.randrange(0, 40)})"
        if null_right
        else f"c_custkey % {rng.randrange(50, 200)}"
    )
    pred = _gen_predicate(rng)
    return (
        f"SELECT l.k AS lk, r.k2 AS rk, "
        f"COUNT(*) AS n, COUNT(l.k) AS n_l, COUNT(r.k2) AS n_r "
        f"FROM (SELECT {lkey} AS k FROM orders WHERE {pred}) l "
        f"{how} (SELECT {rkey} AS k2 FROM customer) r ON l.k = r.k2 "
        f"GROUP BY l.k, r.k2"
    )


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_nullkey_join_differential(seed, spark, fuzz_env):
    """Random inner/left/right/full joins over NULL-injected keys —
    NULL never matches, outer rows survive with NULL partners, and
    COUNT(col) vs COUNT(*) see the difference identically."""
    rng = random.Random(37000 + seed)
    sql = _gen_nullkey_join_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"nkfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_range_frame_differential(seed, spark, fuzz_env):
    """Random RANGE-frame windows over duplicate order keys — peer
    groups share frames, offsets are value distances, DESC flips the
    offset direction; both engines must agree row-for-row."""
    rng = random.Random(23000 + seed)
    sql = _gen_range_frame_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"rgfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_fill_query(rng: random.Random) -> tuple[str, str]:
    """IGNORE NULLS window-fill family (guards the q77/q92 fill
    semantics): a predicate sparsifies a measure into NULLs, then
    first/last/nth_value with IGNORE NULLS reads through the gaps over
    a deterministic frame (unique order key). Spark and DuckDB place
    the IGNORE NULLS clause differently (after the call vs inside the
    argument list), so the template renders one text per engine — the
    results, not the SQL string, are what must agree."""
    part = rng.choice(_STR_COLS)
    measure = f"CASE WHEN {_gen_predicate(rng)} THEN o_custkey END"
    direction = rng.choice(["ASC", "DESC"])
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
            f"ROWS BETWEEN {rng.randrange(1, 20)} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {rng.randrange(1, 10)} PRECEDING AND {rng.randrange(1, 10)} FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
        ]
    )
    fn = rng.choice(["first_value", "last_value", "nth"])
    over = f"OVER (PARTITION BY {part} ORDER BY o_orderkey {direction} {frame})"
    if fn == "nth":
        k = rng.randrange(1, 4)
        spark_expr = f"nth_value({measure}, {k}) IGNORE NULLS {over}"
        duck_expr = f"nth_value({measure}, {k} IGNORE NULLS) {over}"
    else:
        spark_expr = f"{fn}({measure}) IGNORE NULLS {over}"
        duck_expr = f"{fn}({measure} IGNORE NULLS) {over}"
    base = "SELECT o_orderkey, CAST({} AS BIGINT) AS w FROM orders"
    return base.format(spark_expr), base.format(duck_expr)


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_ignore_nulls_fill_differential(seed, spark, fuzz_env):
    """Random IGNORE NULLS window fills — LOCF, next-observation, and
    nth-observation reads over NULL-sparsified measures; both engines
    must agree row-for-row despite their different clause placement."""
    rng = random.Random(31000 + seed)
    spark_sql, duck_sql = _gen_fill_query(rng)
    expected = fuzz_env.sql(duck_sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"fillfuzz{seed}", spark.sql(spark_sql), expected)
    assert not problems, f"{spark_sql}\n{duck_sql}\n" + "\n".join(problems)


def test_day_of_week_conventions_pinned(spark, fuzz_env):
    """Day-of-week is a REAL cross-engine trap: Spark extract(dow) is
    Sunday=1..Saturday=7 while DuckDB dow is Sunday=0..Saturday=6, so
    the same SQL text silently returns different numbers. This test
    pins (a) the divergence itself (so an engine upgrade that changes
    either convention fails loudly) and (b) the portable translation —
    Spark dow_iso ≡ DuckDB isodow (Monday=1..Sunday=7) — over every
    order date."""
    spark_plain = spark.sql(
        "SELECT o_orderkey, CAST(extract(dow FROM o_orderdate) AS BIGINT) AS d "
        "FROM orders"
    ).toPandas().set_index("o_orderkey")["d"]
    duck_plain = (
        fuzz_env.sql(
            "SELECT o_orderkey, CAST(extract(dow FROM o_orderdate) AS BIGINT) AS d "
            "FROM orders"
        )
        .arrow().to_pandas().set_index("o_orderkey")["d"]
    )
    assert (spark_plain - duck_plain.reindex(spark_plain.index) == 1).all(), (
        "Spark dow should be DuckDB dow + 1 (Sunday=1 vs Sunday=0)"
    )

    expected = fuzz_env.sql(
        "SELECT o_orderkey, CAST(extract(isodow FROM o_orderdate) AS BIGINT) AS iso "
        "FROM orders"
    ).arrow().to_pandas(date_as_object=True)
    problems = compare(
        "dow_iso",
        spark.sql(
            "SELECT o_orderkey, CAST(extract(dow_iso FROM o_orderdate) AS BIGINT) "
            "AS iso FROM orders"
        ),
        expected,
    )
    assert not problems, problems


def _gen_limit_offset_query(rng: random.Random) -> str:
    """Fully-ordered pagination: ORDER BY a random key stack that ends
    with the unique primary key (so the page cut is deterministic on
    both engines), then LIMIT/OFFSET — the serving-layer pagination
    contract. Optionally paginate a grouped aggregate instead of the
    raw table (ordered by an aggregate with key tie-break)."""
    if rng.random() < 0.4:
        inner = (
            f"SELECT o_custkey, COUNT(*) AS n, MAX(o_orderkey) AS mx "
            f"FROM orders WHERE {_gen_predicate(rng)} GROUP BY o_custkey"
        )
        order = rng.choice(
            ["n DESC, o_custkey", "n, mx DESC, o_custkey", "mx, o_custkey"]
        )
        body = f"SELECT * FROM ({inner}) g ORDER BY {order}"
    else:
        keys = rng.sample(
            ["o_orderstatus", "o_orderpriority", "o_totalprice DESC", "o_custkey"],
            rng.randrange(1, 3),
        )
        body = (
            f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            f"WHERE {_gen_predicate(rng)} "
            f"ORDER BY {', '.join(keys)}, o_orderkey"
        )
    limit = rng.randrange(1, 40)
    q = f"{body} LIMIT {limit}"
    if rng.random() < 0.6:
        q += f" OFFSET {rng.randrange(0, 60)}"
    return q


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_limit_offset_differential(seed, spark, fuzz_env):
    """Deterministic pagination pages must match row-for-row: LIMIT,
    LIMIT+OFFSET, over raw and aggregated inputs, under multi-key
    ORDER BY ending in a unique key."""
    rng = random.Random(21000 + seed)
    sql = _gen_limit_offset_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"lofuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_exists_chain_query(rng: random.Random) -> str:
    """Correlated existential chains over orders/customer — the q97
    decorrelation family generalized: EXISTS / NOT EXISTS (optionally
    both) with correlated equality plus an extra inner predicate, under
    a grouped or plain projection."""
    inner_pred = _gen_predicate(rng).replace("o_orderkey", "o2.o_orderkey").replace(
        "o_custkey", "o2.o_custkey"
    ).replace("o_orderstatus", "o2.o_orderstatus").replace(
        "o_orderpriority", "o2.o_orderpriority"
    )
    ex1 = rng.choice(["EXISTS", "NOT EXISTS"])
    clause1 = (
        f"{ex1} (SELECT 1 FROM orders o2 WHERE o2.o_custkey = o.o_custkey "
        f"AND o2.o_orderkey <> o.o_orderkey AND ({inner_pred}))"
    )
    clauses = [clause1]
    if rng.random() < 0.5:
        cmp_op = rng.choice(["<", ">", "<="])
        ex2 = rng.choice(["EXISTS", "NOT EXISTS"])
        clauses.append(
            f"{ex2} (SELECT 1 FROM orders o3 WHERE o3.o_custkey = o.o_custkey "
            f"AND o3.o_totalprice {cmp_op} o.o_totalprice "
            f"AND o3.o_orderkey <> o.o_orderkey)"
        )
    where = " AND ".join(clauses)
    if rng.random() < 0.5:
        return (
            f"SELECT o.o_orderstatus, COUNT(*) AS n, MIN(o.o_orderkey) AS mn "
            f"FROM orders o WHERE {where} GROUP BY o.o_orderstatus"
        )
    return (
        f"SELECT o.o_orderkey, o.o_custkey FROM orders o WHERE {where}"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_exists_chain_differential(seed, spark, fuzz_env):
    """Random correlated EXISTS / NOT EXISTS chains (incl. theta-
    correlated inner predicates on o_totalprice) must decorrelate to
    the same answers DuckDB computes."""
    rng = random.Random(23000 + seed)
    sql = _gen_exists_chain_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"exfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_lateral_query(rng: random.Random) -> str:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (the q63
    shape, fuzzed): random correlation predicate, sort direction, k,
    and optionally an aggregate instead of a top-k. Tiebreak on the
    unique o_orderkey keeps every variant deterministic."""
    k = rng.choice([1, 2, 3])
    direction = rng.choice(["ASC", "DESC"])
    pred = rng.choice(
        [
            "o.o_custkey = c.c_custkey",
            "o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'",
            f"o.o_custkey = c.c_custkey AND o.o_orderkey % {rng.randint(2, 5)} = 0",
            "o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal",
        ]
    )
    seg = rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"])
    if rng.random() < 0.4:
        inner = (
            f"SELECT COUNT(*) AS n, MIN(o.o_orderkey) AS mn "
            f"FROM orders o WHERE {pred}"
        )
        cols = "lat.n, lat.mn"
    else:
        inner = (
            f"SELECT o.o_orderkey, o.o_orderstatus FROM orders o "
            f"WHERE {pred} "
            f"ORDER BY o.o_orderkey {direction} LIMIT {k}"
        )
        cols = "lat.o_orderkey, lat.o_orderstatus"
    join = rng.choice(["JOIN", "LEFT JOIN"])
    return (
        f"SELECT c.c_custkey, {cols} "
        f"FROM customer c {join} LATERAL ({inner}) AS lat ON true "
        f"WHERE c.c_mktsegment = '{seg}'"
    )


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_lateral_differential(seed, spark, fuzz_env):
    """Random correlated LATERAL top-k / aggregate subqueries — the
    decorrelation path (LATERAL → window/aggregate join) must agree
    with DuckDB, including LEFT LATERAL's NULL-extension rows."""
    rng = random.Random(31000 + seed)
    sql = _gen_lateral_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"latfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_distinct_filter_agg_query(rng: random.Random) -> str:
    """Aggregates mixing DISTINCT and FILTER (WHERE ...) clauses —
    the partial-aggregation rewrite (expand + two-phase) both engines
    implement differently but must answer identically."""
    pred1 = _gen_predicate(rng)
    pred2 = _gen_predicate(rng)
    aggs = rng.sample(
        [
            f"COUNT(DISTINCT o_custkey) FILTER (WHERE {pred1}) AS a1",
            f"COUNT(DISTINCT o_orderpriority) AS a2",
            f"CAST(SUM(o_orderkey) FILTER (WHERE {pred2}) AS BIGINT) AS a3",
            f"COUNT(*) FILTER (WHERE {pred1}) AS a4",
            f"MIN(o_orderkey) FILTER (WHERE {pred2}) AS a5",
            f"CAST(SUM(DISTINCT o_orderkey % 1000) AS BIGINT) AS a6",
        ],
        k=rng.randint(2, 4),
    )
    group = rng.choice(["o_orderstatus", "o_orderpriority"])
    return f"SELECT {group}, {', '.join(aggs)} FROM orders GROUP BY {group}"


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_distinct_filter_agg_differential(seed, spark, fuzz_env):
    """Random DISTINCT + FILTER aggregate mixes (multi-distinct expand
    plans) — empty filter groups must yield NULL sums / zero counts
    identically on both engines."""
    rng = random.Random(33000 + seed)
    sql = _gen_distinct_filter_agg_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"dffuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def _gen_recursive_query(rng: random.Random) -> str:
    """Random WITH RECURSIVE walks over the event-transition graph —
    varied start node, depth bound, edge filter, and accumulator.
    Shared-syntax recursion is new surface in Spark 4; this family
    pins anchor/step semantics, cycle-bounded termination, and
    accumulator arithmetic against DuckDB."""
    start = rng.choice(["signup", "click", "view", "purchase"])
    depth = rng.randint(2, 4)
    minn = rng.choice([0, 1, 5])
    acc = rng.choice(
        ["p.score + e.n", "p.score + 1", "CASE WHEN e.n > p.score THEN e.n ELSE p.score END"]
    )
    return f"""
        WITH RECURSIVE edges AS (
          SELECT prev, curr, COUNT(*) AS n FROM (
            SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                     AS prev,
                   event_type AS curr
            FROM events) x
          WHERE prev IS NOT NULL GROUP BY prev, curr HAVING COUNT(*) > {minn}),
        walk AS (
          SELECT CONCAT('{start}', ' > ', curr) AS path, curr AS last,
                 2 AS depth, n AS score
          FROM edges WHERE prev = '{start}'
          UNION ALL
          SELECT CONCAT(p.path, ' > ', e.curr), e.curr, p.depth + 1, {acc}
          FROM walk p JOIN edges e ON e.prev = p.last
          WHERE p.depth < {depth})
        SELECT path, CAST(depth AS INTEGER) AS depth, CAST(score AS BIGINT)
                 AS score
        FROM walk
    """


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_recursive_differential(seed, spark, fuzz_env):
    rng = random.Random(37000 + seed)
    sql = _gen_recursive_query(rng)
    # fuzz_env registers the DuckDB views; the Spark temp view is ours
    from pinot_pulsar_plugin_spark.catalog import load_table

    load_table(spark, SF, "events").createOrReplaceTempView("events")
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"recfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


# --- Unicode / multibyte string family ------------------------------
# The m60 bug class: fixtures were ASCII-only, so char-vs-byte indexing
# hazards never fired. This family runs portable string functions over
# an inline multibyte corpus (accents, combining marks, CJK, emoji
# surrogate pairs, empty string) shared verbatim by both engines.
# Curated by probe: upper() (DuckDB ß→ẞ vs Spark ß→SS), reverse()
# (DuckDB reverses grapheme clusters, Spark codepoints) and
# levenshtein() (DuckDB measures BYTES) are excluded here and pinned
# with both engines' actual behaviors in
# test_unicode_divergences_pinned below.
_UNI_STRINGS = [
    "héllo wörld",
    "naïve café",
    "日本語のテキスト",
    "🎉🚀 emoji mix",
    "é combining",
    "ASCII only",
    "",
    "ß sharp",
    "Ωmega UPPER",
    "mixed 中文 and latin",
]
_UNI_CTE = "WITH uni(id, s) AS (VALUES {}) ".format(
    ", ".join(f"({i}, '{s}')" for i, s in enumerate(_UNI_STRINGS))
)
_UNI_NEEDLES = ["é", "中", "🎉", "i", "mix", "zz"]
_UNI_EXPRS = [
    "CAST(length(s) AS BIGINT)",
    "lower(s)",
    "substr(s, {n}, {m})",
    "left(s, {n})",
    "right(s, {n})",
    "CAST(instr(s, '{w}') AS BIGINT)",
    "lpad(s, {p}, '·')",
    "rpad(s, {p}, '素')",
    "repeat(left(s, {n}), {k})",
    "replace(s, '{w}', '<>')",
    "translate(s, 'éö中', 'eoZ')",
    "split_part(s, ' ', {k})",
    "CAST(ascii(s) AS BIGINT)",
    "concat(s, '|', left(s, {n}))",
    "trim(s)",
    "regexp_extract(s, '([a-z]+)', 1)",
    "md5(s)",
]


def _gen_unicode_query(rng: random.Random) -> str:
    exprs = rng.sample(_UNI_EXPRS, rng.randrange(3, 6))
    cols = ", ".join(
        e.format(
            w=rng.choice(_UNI_NEEDLES),
            n=rng.randrange(1, 8),
            m=rng.randrange(1, 10),
            p=rng.randrange(5, 20),
            k=rng.randrange(1, 5),
        )
        + f" AS c{i}"
        for i, e in enumerate(exprs)
    )
    return _UNI_CTE + f"SELECT id, {cols} FROM uni"


@pytest.mark.parametrize("seed", range(35))
def test_fuzz_unicode_differential(seed, spark, fuzz_env):
    rng = random.Random(31000 + seed)
    sql = _gen_unicode_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"unifuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def test_unicode_divergences_pinned(spark, fuzz_env):
    """Both engines' DOCUMENTED divergent behaviors, asserted on each
    side so a change in either engine (or a portability fix) surfaces:
    upper('ß') is 'SS' (Spark, Java locale-free mapping) vs 'ẞ'
    (DuckDB, capital sharp s); reverse() reverses codepoints in Spark
    but grapheme clusters in DuckDB (combining mark stays attached);
    levenshtein() counts codepoints in Spark but BYTES in DuckDB."""
    assert spark.sql("SELECT upper('ß') AS c").collect()[0].c == "SS"
    assert fuzz_env.sql("SELECT upper('ß') AS c").fetchone()[0] == "ẞ"

    s = "éx"  # e + combining acute + x
    sp = spark.sql(f"SELECT reverse('{s}') AS c").collect()[0].c
    du = fuzz_env.sql(f"SELECT reverse('{s}') AS c").fetchone()[0]
    assert sp == "x́e"  # codepoint reversal detaches the mark
    assert du == "xé"  # grapheme reversal keeps it attached

    assert (
        spark.sql("SELECT levenshtein('héll', 'abc') AS c").collect()[0].c == 4
    )
    assert fuzz_env.sql("SELECT levenshtein('héll', 'abc') AS c").fetchone()[0] == 5


# --- TRY_CAST / safe-arithmetic family ------------------------------
# Malformed-ingest semantics: TRY_CAST over dirty strings and
# division against zero denominators. Curated by probe — the portable
# surface is fuzzed here; the real divergences are pinned with both
# engines' behaviors in test_trycast_divergences_pinned: DuckDB's
# string→INT parses float/exponent/hex forms ('3.7'→4, '1e3'→1000,
# '0x1A'→26) where Spark yields NULL; a bare time string casts to
# today's TIMESTAMP on Spark but NULL on DuckDB; BOOLEAN accepts
# ' true '/'yes'/'no' on Spark only; and x/0 ERRORS under Spark ANSI
# but returns NULL on DuckDB (portable spelling: try_divide ≡ /).
_DIRTY = [
    "42", " 42", "-7", "+5", "", "abc", "12abc", "9999999999999999999999",
    "3.14", "-0.5", "1e308", "1e309", "inf", "-inf", "Infinity",
    "true", "false", "TRUE", "f",
    "2024-03-01", "2024-02-30", "2024-13-01", "1970-01-01",
    "2024-03-01 12:00:00", "2024-03-01T12:00:00", "not a date",
]
_INT_SAFE = [
    "42", " 42", "-7", "+5", "", "abc", "12abc",
    "9999999999999999999999", "127", "-128", "2147483648", "0",
]
# DuckDB parses 'inf'/'Infinity' as the INFINITE date/timestamp
# (pinned below); exclude them from the temporal corpora
_DATE_SAFE = [s for s in _DIRTY if s not in ("inf", "-inf", "Infinity")]
_TS_SAFE = [s for s in _DATE_SAFE if s != "12:00:00"]


def _gen_trycast_query(rng: random.Random) -> tuple[str, str]:
    mode = rng.choice(["double", "date", "timestamp", "boolean", "int", "div"])
    if mode == "div":
        # denominators include zero; Spark needs try_divide under ANSI,
        # DuckDB's plain / already NULLs — per-engine rendering
        nums = [rng.randrange(-50, 50) for _ in range(8)]
        dens = [rng.choice([0, 0, rng.randrange(1, 9)]) for _ in range(8)]
        vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(nums, dens)))
        cte = f"WITH raw(id, a, b) AS (VALUES {vals}) "
        spark_e = "try_divide(CAST(a AS DOUBLE), b)"
        duck_e = "CAST(a AS DOUBLE) / b"
        base = cte + "SELECT id, {} AS c FROM raw"
        return base.format(spark_e), base.format(duck_e)
    corpus, ty = {
        "double": (_DIRTY, "DOUBLE"),
        "date": (_DATE_SAFE, "DATE"),
        "timestamp": (_TS_SAFE, "TIMESTAMP"),
        "boolean": (["true", "false", "TRUE", "f", "t", "1", "0", "abc", ""], "BOOLEAN"),
        "int": (_INT_SAFE, rng.choice(["INTEGER", "BIGINT"])),
    }[mode]
    pick = rng.sample(corpus, rng.randrange(4, min(9, len(corpus) + 1)))
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(pick))
    sql = (
        f"WITH raw(id, s) AS (VALUES {vals}) "
        f"SELECT id, TRY_CAST(s AS {ty}) AS c FROM raw"
    )
    return sql, sql


@pytest.mark.parametrize("seed", range(35))
def test_fuzz_trycast_differential(seed, spark, fuzz_env):
    rng = random.Random(33000 + seed)
    spark_sql, duck_sql = _gen_trycast_query(rng)
    expected = fuzz_env.sql(duck_sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"castfuzz{seed}", spark.sql(spark_sql), expected)
    assert not problems, f"{spark_sql}\n{duck_sql}\n" + "\n".join(problems)


def test_trycast_divergences_pinned(spark, fuzz_env):
    """Both engines' DOCUMENTED cast/arithmetic divergences asserted on
    each side (a change in either engine surfaces here)."""
    # string→INT: DuckDB parses numeric forms and rounds; Spark NULLs
    for s, duck_val in (("3.7", 4), ("1e3", 1000), ("0x1A", 26)):
        assert spark.sql(
            f"SELECT TRY_CAST('{s}' AS INTEGER) AS c"
        ).collect()[0].c is None
        assert fuzz_env.sql(
            f"SELECT TRY_CAST('{s}' AS INTEGER) AS c"
        ).fetchone()[0] == duck_val
    # 'Infinity' → DATE: DuckDB yields the infinite date, Spark NULL
    assert (
        spark.sql("SELECT TRY_CAST('Infinity' AS DATE) AS c").collect()[0].c
        is None
    )
    assert fuzz_env.sql(
        "SELECT isinf(TRY_CAST('Infinity' AS DATE))"
    ).fetchone()[0] is True
    # bare time → TIMESTAMP: Spark anchors to the current date
    assert (
        spark.sql("SELECT TRY_CAST('12:00:00' AS TIMESTAMP) AS c").collect()[0].c
        is not None
    )
    assert (
        fuzz_env.sql("SELECT TRY_CAST('12:00:00' AS TIMESTAMP)").fetchone()[0]
        is None
    )
    # BOOLEAN: Spark trims and accepts yes/no; DuckDB does neither
    for s in (" true ", "yes"):
        assert spark.sql(
            f"SELECT TRY_CAST('{s}' AS BOOLEAN) AS c"
        ).collect()[0].c is True
        assert (
            fuzz_env.sql(f"SELECT TRY_CAST('{s}' AS BOOLEAN)").fetchone()[0]
            is None
        )
    # division by zero: Spark ANSI raises, DuckDB yields NULL
    import pytest as _pytest

    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT 1/0 AS c").collect()
    assert fuzz_env.sql("SELECT 1/0 AS c").fetchone()[0] is None
    assert spark.sql("SELECT try_divide(1, 0) AS c").collect()[0].c is None


# --- GROUP BY ALL family --------------------------------------------
def _gen_groupby_all_query(rng: random.Random) -> str:
    """GROUP BY ALL (both engines infer keys = every non-aggregate
    select item) over random key subsets and aggregates — the modern
    SQL shorthand analysts actually write; key inference must agree."""
    keys = rng.sample(_STR_COLS + ["o_custkey % 5"], rng.randrange(1, 3))
    aggs = rng.sample(
        [
            "CAST(COUNT(*) AS BIGINT) AS n",
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents",
            "CAST(MIN(o_orderkey) AS BIGINT) AS mn",
            "CAST(MAX(o_orderkey) AS BIGINT) AS mx",
            "CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd",
        ],
        rng.randrange(1, 4),
    )
    cols = ", ".join(
        [f"{k} AS k{i}" for i, k in enumerate(keys)] + aggs
    )
    pred = _gen_predicate(rng)
    return f"SELECT {cols} FROM orders WHERE {pred} GROUP BY ALL"


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_groupby_all_differential(seed, spark, fuzz_env):
    rng = random.Random(35000 + seed)
    sql = _gen_groupby_all_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"gballfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


# --- NULL-ordering family -------------------------------------------
def _gen_null_order_window_query(rng: random.Random) -> str:
    """Window ranks over a NULL-sparsified order key with EXPLICIT
    NULLS FIRST/LAST — the engines' DEFAULTS differ (Spark ASC puts
    NULLS FIRST, DuckDB NULLS LAST; pinned below), so portable SQL
    must always spell the placement; this family proves the explicit
    forms agree."""
    part = rng.choice(_STR_COLS)
    key = f"CASE WHEN {_gen_predicate(rng)} THEN o_totalprice END"
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    return (
        f"SELECT o_orderkey, CAST({fn} OVER (PARTITION BY {part} "
        f"ORDER BY {key} {direction} {nulls}, o_orderkey) AS BIGINT) AS rn "
        f"FROM orders"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_null_order_window_differential(seed, spark, fuzz_env):
    rng = random.Random(37000 + seed)
    sql = _gen_null_order_window_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"nullordfuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


def test_null_order_default_divergence_pinned(spark, fuzz_env):
    """Default ASC null placement DIFFERS: Spark ranks NULL keys
    FIRST, DuckDB LAST — both behaviors asserted so a change in either
    engine (or SQL that forgets explicit placement) surfaces."""
    sql = (
        "WITH v(id, k) AS (VALUES (1, 10), (2, NULL), (3, 5)) "
        "SELECT id, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM v"
    )
    sp = sorted((r.id, r.rn) for r in spark.sql(sql).collect())
    du = sorted(fuzz_env.sql(sql).fetchall())
    assert sp == [(1, 3), (2, 1), (3, 2)]  # NULL ranks first
    assert du == [(1, 2), (2, 3), (3, 1)]  # NULL ranks last


# --- TPC-H-shape fuzz (round 6): randomized Q19 disjuncts + Q4
# EXISTS-interval lateness. Guards operators/tpch_suite.py's pattern
# classes with predicate combinations no fixed query covers; exact
# fixed-point revenue keeps equality bit-level.
def _gen_q19_query(rng: random.Random) -> str:
    clauses = []
    for _ in range(rng.randrange(1, 4)):
        b = f"Brand#{rng.randrange(1, 21)}"
        s0 = rng.randrange(1, 40)
        s1 = s0 + rng.randrange(1, 20)
        q0 = rng.randrange(1, 30)
        q1 = q0 + rng.randrange(1, 25)
        clauses.append(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1}"
            f" AND l.l_quantity BETWEEN {q0} AND {q1})"
        )
    pred = " OR ".join(clauses)
    return (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)"
        " AS BIGINT)) AS BIGINT) AS rev_fp "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        f"WHERE {pred}"
    )


def _gen_q4_query(rng: random.Random) -> str:
    days = rng.randrange(10, 90)
    month = rng.randrange(1, 10)
    lo = f"1997-{month:02d}-01 00:00:00"
    hi = f"1997-{month + 3:02d}-01 00:00:00"
    neg = "NOT " if rng.random() < 0.3 else ""
    return (
        "SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders o "
        f"WHERE o.o_orderdate >= TIMESTAMP '{lo}' "
        f"AND o.o_orderdate < TIMESTAMP '{hi}' "
        f"AND {neg}EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        f"AND l.l_shipdate > o.o_orderdate + INTERVAL {days} DAY) "
        "GROUP BY o.o_orderpriority"
    )


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_q19_disjunct_differential(seed, spark, fuzz_env):
    rng = random.Random(26000 + seed)
    sql = _gen_q19_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"q19fuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_q4_exists_interval_differential(seed, spark, fuzz_env):
    rng = random.Random(27000 + seed)
    sql = _gen_q4_query(rng)
    expected = fuzz_env.sql(sql).arrow().to_pandas(date_as_object=True)
    problems = compare(f"q4fuzz{seed}", spark.sql(sql), expected)
    assert not problems, f"{sql}\n" + "\n".join(problems)


# --- closed-form vs sequential-reference fuzz (q155 / q154) ----------
#
# The two novel window tricks of the third r6 batch replace inherently
# sequential definitions with one-pass window algebra; these fuzzers
# replay the SEQUENTIAL definition in Python on random inputs and
# demand bit-equality — the guard that keeps the closed forms honest
# as they evolve.


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_cusum_closed_form(seed, spark, tmp_path):
    import datetime
    import random as _r

    from pinot_pulsar_plugin_spark.operators.timeseries import q155_cusum_changepoint

    rng = _r.Random(900 + seed)
    n = rng.randint(5, 40)
    vals = [round(rng.uniform(1, 500), 2) for _ in range(n)]
    if rng.random() < 0.7:  # usually inject a shift
        at = rng.randrange(1, n)
        vals = vals[:at] + [round(v * rng.uniform(1.5, 4), 2) for v in vals[at:]]
    rows = [
        (d, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), 1, "m",
         vals[d], "{}")
        for d in range(len(vals))
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    r = q155_cusum_changepoint(spark, str(tmp_path)).collect()[0]

    cents = [int(round(v * 100)) for v in vals]
    mu0 = sum(cents) // len(cents)
    k = mu0 // 20
    s_hi = s_lo = 0
    a_hi = a_lo = 0
    m_hi = m_lo = 0
    for x in cents:
        s_hi = max(0, s_hi + (x - mu0 - k))
        s_lo = max(0, s_lo + (mu0 - k - x))
        m_hi, m_lo = max(m_hi, s_hi), max(m_lo, s_lo)
        a_hi += s_hi > mu0
        a_lo += s_lo > mu0
    assert (r.n_alarms_hi, r.n_alarms_lo, r.max_s_hi, r.max_s_lo) == (
        a_hi, a_lo, m_hi, m_lo,
    ), (seed, vals)


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_window_funnel_vs_bruteforce(seed, spark, tmp_path):
    import datetime
    import random as _r

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        _Q154_W_US,
        q154_window_funnel,
    )

    rng = _r.Random(4200 + seed)
    rows, eid = [], 0
    journeys = {}
    for uid in range(rng.randint(2, 8)):
        evs = []
        for _ in range(rng.randint(1, 12)):
            etype = rng.choice(["view", "click", "purchase", "signup"])
            us = rng.randrange(0, 3 * 86_400_000_000)  # 3 days in µs
            evs.append((etype, us))
        if not any(e == "view" for e, _ in evs):
            evs.append(("view", rng.randrange(0, 3 * 86_400_000_000)))
        journeys[uid] = evs
        for etype, us in evs:
            rows.append(
                (eid,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(microseconds=us),
                 uid, etype, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {}
    for r in q154_window_funnel(spark, str(tmp_path)).collect():
        got.setdefault(r.max_step, 0)
        got[r.max_step] += r.n_users

    want = {}
    for uid, evs in journeys.items():
        views = [us for e, us in evs if e == "view"]
        clicks = sorted(us for e, us in evs if e == "click")
        purchases = sorted(us for e, us in evs if e == "purchase")
        best = 1
        for v in views:
            # step 2: any click at/after v within W (same-µs ties are
            # ordered by event_id; click rows always follow the view
            # rows they tie with only if inserted later — emulate the
            # operator's (us, event_id) order by >= on us, which
            # matches because ties in this generator are measure-zero)
            step = 1
            cands = [c for c in clicks if v <= c <= v + _Q154_W_US]
            if cands:
                step = 2
                if any(
                    any(c <= p <= v + _Q154_W_US for p in purchases)
                    for c in cands
                ):
                    step = 3
            best = max(best, step)
        want.setdefault(best, 0)
        want[best] += 1
    assert got == want, (seed, journeys)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_hamilton_allocation_properties(seed, spark, tmp_path):
    """Largest-remainder invariants on random lane tables: per-language
    allocations sum EXACTLY to 1000, and every lane receives floor or
    ceil of its exact proportional share (the quota-method property
    that rounding-based allocators violate)."""
    import random as _r

    from pinot_pulsar_plugin_spark.operators.pipelines import (
        q158_largest_remainder_alloc,
    )

    rng = _r.Random(7100 + seed)
    docs, did = [], 0
    lanes = {}
    for lang in ["aa", "bb"][: rng.randint(1, 2)]:
        for s_i in range(rng.randint(1, 6)):
            src = f"s{s_i}"
            n = rng.randint(1, 40)
            lanes[(lang, src)] = n
            for _ in range(n):
                docs.append((did, "t", lang, src, 3)); did += 1
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    rows = q158_largest_remainder_alloc(spark, str(tmp_path)).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, 0)
        per_lang[r.lang] += r.alloc
        w = sum(n for (lg, _), n in lanes.items() if lg == r.lang)
        exact = 1000 * lanes[(r.lang, r.source)] / w
        assert r.alloc in (int(exact) // 1, int(exact) + 1, int(exact)), (
            seed, r, exact,
        )
        assert abs(r.alloc - exact) < 1, (seed, r, exact)
    assert all(v == 1000 for v in per_lang.values()), (seed, per_lang)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_interval_sweep_vs_python(seed, spark, tmp_path):
    """q180's segmented-prefix sweep vs a sequential pure-Python sweep
    on random half-open intervals (random multi-line orders, zero-
    length intervals included): per-bucket peak and earliest attaining
    instant must match exactly."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.timeseries import (
        q180_max_concurrency,
    )

    rng = random.Random(4200 + seed)
    DAY = 86_400_000_000
    base = dt.datetime(1970, 1, 1)
    orders, lines, iv = [], [], {}
    for k in range(1, rng.randint(15, 40)):
        s_day = rng.randint(0, 70)
        orders.append((k, base + dt.timedelta(days=s_day)))
        ships = [s_day + rng.randint(0, 25) for _ in range(rng.randint(1, 4))]
        for sd in ships:
            lines.append((k, base + dt.timedelta(days=sd)))
        iv[k] = (s_day * DAY, max(ships) * DAY)

    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    # sequential reference: sort (+1 at s, -1 at e) by (ts, delta, okey)
    evs = []
    for k, (s, e) in iv.items():
        if e > s:
            evs.append((s, 1, k))
            evs.append((e, -1, k))
    evs.sort()
    want = {}
    conc = 0
    for ts, delta, _k in evs:
        conc += delta
        mb = ts // DAY // 30
        best = want.get(mb)
        if best is None or conc > best[0]:
            want[mb] = (conc, ts)
    got = {
        r.month_bucket: (r.max_open, r.at_ts_us)
        for r in q180_max_concurrency(spark, str(tmp_path)).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_rake_vs_python(seed, spark, tmp_path):
    """t81's windowed segmentation + floored ppm scoring vs a
    sequential pure-Python RAKE on random token streams (stopwords
    interleaved, repeated words, over-long phrases)."""
    from pinot_pulsar_plugin_spark.operators.textops import (
        _T81_MAX_LEN,
        t81_rake_keyphrases,
    )

    rng = random.Random(6100 + seed)
    stops = ["the", "a", "is", "of", "and", "to", "in"]
    words = ["w%d" % i for i in range(12)]
    docs = []
    for doc_id in range(rng.randint(4, 9)):
        n = rng.randint(3, 40)
        toks = [
            rng.choice(stops) if rng.random() < 0.3 else rng.choice(words)
            for _ in range(n)
        ]
        docs.append((doc_id, " ".join(toks)))
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    want = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        phrases, cur, pnum_of = [], [], []
        pnum = 0
        for tk in toks:
            if tk in stops:
                pnum += 1
                if cur:
                    phrases.append((pnum_of[-1], cur))
                cur = []
            else:
                if not cur:
                    pnum_of.append(pnum)
                cur.append(tk)
        if cur:
            phrases.append((pnum_of[-1], cur))
        kept = [(pn, ph) for pn, ph in phrases if 1 <= len(ph) <= _T81_MAX_LEN]
        if not kept:
            continue
        freq, deg = {}, {}
        for _pn, ph in kept:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
        score = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
        cands = [
            (sum(score[w] for w in ph), " ".join(ph), pn, len(ph))
            for pn, ph in kept
        ]
        # winner: score DESC, phrase ASC, pnum ASC
        cands.sort(key=lambda c: (-c[0], c[1], c[2]))
        s, ph, _pn, ln = cands[0]
        want[doc_id] = (ph, ln, s)

    got = {
        r.doc_id: (r.phrase, r.len, r.score_fp)
        for r in t81_rake_keyphrases(spark, str(tmp_path)).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_bridge_identity(seed, spark, tmp_path):
    """q184's waterfall must reconcile on ANY data: for every month m,
    total(m-1) + new + churn + expansion + contraction == total(m).
    Random customers/months/amounts, including gaps and re-entries."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q184_revenue_bridge,
    )

    rng = random.Random(8800 + seed)
    base = dt.datetime(1970, 1, 2)
    orders, ok = [], 0
    for _ in range(rng.randint(30, 120)):
        ok += 1
        orders.append((
            ok,
            rng.randint(1, 12),
            round(rng.uniform(0.01, 99.0), 2),
            base + dt.timedelta(days=30 * rng.randint(0, 5) + rng.randint(0, 27)),
        ))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    # month totals in exact cents (tz-safe day arithmetic, not
    # .timestamp() which is local-tz-dependent on naive datetimes)
    totals = {}
    epoch = dt.datetime(1970, 1, 1)
    for _, _c, price, ts in orders:
        m = (ts - epoch).days // 30
        totals[m] = totals.get(m, 0) + round(price * 100)
    bridge = {
        r.month_bucket: r
        for r in q184_revenue_bridge(spark, str(tmp_path)).collect()
    }
    for m, r in bridge.items():
        prev_total = totals.get(m - 1, 0)
        cur_total = totals.get(m, 0)
        moved = (r.new_cents + r.churned_cents + r.expansion_cents
                 + r.contraction_cents)
        assert prev_total + moved == cur_total, (m, prev_total, moved, cur_total)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_price_volume_reconciles(seed, spark, tmp_path):
    """q206's forced reconciliation holds on ANY data: volume_effect +
    price_mix_effect == delta_cents for every decomposable brand."""
    import datetime as dt

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        q206_price_volume_bridge,
    )

    rng = random.Random(9900 + seed)
    d = lambda n: dt.datetime(1970, 1, 1) + dt.timedelta(days=n)
    lines, parts = [], {}
    for pk in range(1, rng.randint(4, 9)):
        parts[pk] = f"B{pk % 4}"
        for _ in range(rng.randint(1, 12)):
            lines.append((
                pk,
                float(rng.randint(1, 40)),
                round(rng.uniform(0.5, 50.0), 2),
                round(rng.choice([0.0, 0.05, 0.1]), 2),
                d(rng.randint(0, 59)),
            ))
    spark.createDataFrame(
        lines,
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        list(parts.items()), "p_partkey long, p_brand string"
    ).write.parquet(str(tmp_path / "part.parquet"))

    for r in q206_price_volume_bridge(spark, str(tmp_path)).collect():
        if r.volume_effect is not None:
            assert r.volume_effect + r.price_mix_effect == r.delta_cents


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_asof_ties_differential(seed, spark, tmp_path):
    """q28's union-merge as-of composition vs DuckDB's native ASOF
    JOIN on tie-heavy random event sets. The hazard this family pins:
    at EQUAL timestamps the semantics are `v.ts <= p.ts` (a view tying
    a purchase matches), which the union-merge encodes purely through
    the (ts, kind) sort order — kind 0 (view) before kind 1 (purchase)
    — so any ordering regression flips tie rows. A coarse 40-slot time
    grid makes same-µs collisions common within and across types."""
    import datetime
    import random as _r

    import duckdb

    from pinot_pulsar_plugin_spark.registry import all_oracle_sql, all_queries

    rng = _r.Random(52000 + seed)
    rows, eid = [], 0
    for uid in range(rng.randint(2, 6)):
        for _ in range(rng.randint(1, 25)):
            etype = rng.choice(["view", "purchase", "click"])
            us = rng.randrange(0, 40) * 1_000_000
            rows.append(
                (eid,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(microseconds=us),
                 uid, etype, 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    expected = (
        con.sql(all_oracle_sql()["q28_asof_join"])
        .arrow()
        .to_pandas(date_as_object=True)
    )
    got = all_queries()["q28_asof_join"](spark, str(tmp_path))
    problems = compare(f"asof{seed}", got, expected)
    assert not problems, "\n".join(problems)


def test_q108_interleaved_datasets_no_view_clobber(spark, tmp_path):
    """r9 regression gate for the per-sf_dir view naming (ADVICE r8
    #3): with the old fixed view name, building q108 on dataset B
    between dataset A's BUILD and its COLLECT re-pointed A's lazy
    recursion at B's edges. Interleave two datasets with disjoint
    transition graphs and collect in reverse order — each result must
    see only its own paths."""
    import datetime

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q108_journey_paths,
    )

    def write(dirname, chain):
        rows = []
        t0 = datetime.datetime(2024, 1, 1)
        for uid in range(3):
            for i, etype in enumerate(chain):
                rows.append(
                    (uid * 10 + i, t0 + datetime.timedelta(minutes=i),
                     uid, etype, 1.0, "{}")
                )
        d = tmp_path / dirname
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(str(d / "events.parquet"))
        return str(d)

    dir_a = write("a", ["signup", "view", "click"])
    dir_b = write("b", ["signup", "purchase"])
    df_a = q108_journey_paths(spark, dir_a)   # build A (lazy)
    df_b = q108_journey_paths(spark, dir_b)   # build B before A collects
    paths_b = {r.path for r in df_b.collect()}
    paths_a = {r.path for r in df_a.collect()}
    assert paths_a == {"signup > view", "signup > view > click"}
    assert paths_b == {"signup > purchase"}


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sessionize_chunked_equals_q29_logic(seed, spark):
    """sessionize_chunked (the hot-key scale path, SCALING.md §6) must
    be row-identical to q29's lag-gap sessionization for ANY chunk
    size: 1µs chunks route every event through the boundary-merge
    window (phase 2 does all the work), tiny chunks force sessions
    spanning many empty chunks, huge chunks reduce to the plain
    single-window path. Oracle is a direct Python replay of q29's
    (ts, event_id)-ordered gap split."""
    import random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.windows import sessionize_chunked

    rng = random.Random(8800 + seed)
    gap = 100
    rows = []
    eid = 0
    for u in range(6):
        n = rng.randrange(0, 50)
        ts = 0
        for _ in range(n):
            # mixture of intra-session steps, exact-gap boundaries, and
            # long jumps; occasional ties (step 0) with distinct event_ids
            ts += rng.choice([0, 1, 7, gap - 1, gap, gap + 1, 5 * gap, 40 * gap])
            rows.append((eid, u, ts))
            eid += 1
    if not rows:
        rows = [(0, 0, 0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long"
    ).select("event_id", "user_id", F.timestamp_micros("ts_us").alias("ts"))

    # Python replay of q29: sort by (ts, event_id), split on gap > G
    exp = set()
    byu = {}
    for e, u, t_ in rows:
        byu.setdefault(u, []).append((t_, e))
    for u, evs in byu.items():
        evs.sort()
        sessions, cur = [], [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > gap:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for i, s in enumerate(sessions, 1):
            ts_list = [x[0] for x in s]
            exp.add(
                (u, i, len(s), min(ts_list), max(ts_list), max(ts_list) - min(ts_list))
            )

    for chunk in [1, 37, gap, 4 * gap, 10**12]:
        got = {
            tuple(r)
            for r in sessionize_chunked(df, gap_us=gap, chunk_us=chunk).collect()
        }
        assert got == exp, (seed, chunk, got ^ exp)

    # empty-input totality (sessionize_chunked is not registry-gated)
    empty = df.filter(F.lit(False))
    assert sessionize_chunked(empty, gap_us=gap).count() == 0


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_scd2_chunked_equals_q90_logic(seed, spark):
    """scd2_chunked (the hot-key scale path for CDC compaction) must be
    row-identical to q90's lag-filter-lead build for ANY chunk size.
    The generator plants long same-type runs (so whole chunks have zero
    kept rows and the ignore-nulls valid_to skip is exercised), ties in
    ts with distinct event_ids, and type changes exactly at chunk
    boundaries. Oracle is a direct Python replay of q90."""
    import random

    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.eventanalytics import scd2_chunked

    rng = random.Random(7700 + seed)
    types = ["a", "b", "c"]
    rows = []
    eid = 0
    for u in range(6):
        n = rng.randrange(0, 60)
        ts, cur = 0, rng.choice(types)
        for _ in range(n):
            ts += rng.choice([0, 1, 3, 50, 100, 137, 500])
            if rng.random() < 0.25:  # sticky types -> long runs
                cur = rng.choice(types)
            rows.append((eid, u, ts, cur))
            eid += 1
    if not rows:
        rows = [(0, 0, 0, "a")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros("ts_us").alias("ts"),
    )

    # Python replay of q90: sort by (ts, event_id); keep changes; lead
    exp = set()
    byu = {}
    for e, u, t_, ty in rows:
        byu.setdefault(u, []).append((t_, e, ty))
    for u, evs in byu.items():
        evs.sort()
        kept = [
            (t_, ty)
            for i, (t_, e, ty) in enumerate(evs)
            if i == 0 or evs[i - 1][2] != ty
        ]
        for i, (t_, ty) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            exp.add((u, ty, t_, nxt, nxt is None))

    for chunk in [1, 37, 100, 1000, 10**12]:
        got = {
            tuple(r) for r in scd2_chunked(df, chunk_us=chunk).collect()
        }
        assert got == exp, (seed, chunk, got ^ exp)

    empty = df.filter(F.lit(False))
    assert scd2_chunked(empty).count() == 0


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_running_sum_chunked_equals_plain_window(seed, spark):
    """running_sum_chunked must match the plain q23-shaped single
    window exactly (sum AND 1-based seq) for any bucket granularity,
    including bucket == order value (every row its own bucket) and one
    global bucket, with ties on the order column broken by the
    tiebreak, negative values in the mix, and a NULL key group — the
    plain window numbers null-key rows as their own partition, so the
    chunked twin's key join must be null-safe (ADVICE r10 #1)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.windows import running_sum_chunked

    rng = random.Random(6600 + seed)
    rows = []
    rid = 0
    for k in [None, 1, 2, 3, 4]:
        for _ in range(rng.randrange(0, 40)):
            # ~10% null order values: bucket must be null too, and the
            # rows must survive with nulls-first numbering (review r10)
            d = None if rng.random() < 0.1 else rng.randrange(0, 50)
            rows.append((k, d, rid, rng.randrange(-500, 500)))
            rid += 1
    if not rows:
        rows = [(0, 0, 0, 1)]
    df = spark.createDataFrame(rows, "k long, d long, id long, cents long")

    w = W.partitionBy("k").orderBy("d", "id")
    plain = df.select(
        "k",
        "d",
        "id",
        "cents",
        F.sum("cents")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_sum"),
        F.row_number().over(w).alias("order_seq"),
    )
    exp = {tuple(r) for r in plain.collect()}
    for div in [1, 7, 10**9]:
        got = {
            tuple(r)
            for r in running_sum_chunked(
                df,
                keys=["k"],
                order_by=["d", "id"],
                value=F.col("cents"),
                bucket=F.expr(f"d div {div}"),
            ).collect()
        }
        assert got == exp, (seed, div, got ^ exp)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_trimmed_mean_hist_equals_q91_rank_trim(seed, spark):
    """trimmed_mean_hist must equal q91's rank-trim exactly. The
    generator plants heavy duplicate values (cut lands INSIDE a tie
    run), raw doubles that differ but round to the same cents (the
    coarsening the identity argument rests on), negative values, and
    group sizes around the floor(n*frac) boundaries."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.aggregates2 import trimmed_mean_hist

    rng = random.Random(3300 + seed)
    rows = []
    eid = 0
    for g in range(4):
        n = rng.choice([1, 2, 19, 20, 21, rng.randrange(1, 80)])
        for _ in range(n):
            if rng.random() < 0.1:
                val = None  # sorts FIRST in the rank form; kept exact.
                # NaN is OUT of the comparison: the rank form's
                # cast(round(NaN*100) as long) RAISES CAST_OVERFLOW
                # under ANSI, so NaN has no plain-form behavior to
                # match (see the dedicated NaN check below).
            else:
                base = rng.choice([-2.0, 0.0, 0.5, 0.5, 0.5, 1.25, 7.31])
                # sub-cent jitter: distinct raw values, same cents
                val = base + rng.choice([0.0, 0.001, -0.001, 0.004])
            rows.append((eid, f"t{g}", val))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    # q91's exact pipeline on the same frame
    rank_w = W.partitionBy("event_type").orderBy("value", "event_id")
    cnt_w = W.partitionBy("event_type")
    r = df.select(
        "event_type",
        "value",
        F.row_number().over(rank_w).alias("rn"),
        F.count(F.lit(1)).over(cnt_w).alias("n"),
    )
    lo = F.floor(F.col("n") * 0.05).cast("long")
    k = r.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    plain = k.groupBy("event_type").agg(
        F.max("n").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100.0
            / F.count(F.lit(1))
        ).alias("trimmed_mean"),
    )
    exp = {tuple(r_) for r_ in plain.collect()}
    got = {tuple(r_) for r_ in trimmed_mean_hist(df).collect()}
    assert got == exp, (seed, got ^ exp)

    # NaN: the rank form crashes (ANSI CAST_OVERFLOW); the histogram
    # is the documented lenient superset — NaN sorts LAST (Spark sort
    # order), counts toward n/trim ranks, contributes nothing to the
    # sum. Pin that: one NaN among 20 rows (lo=1) lands in the top
    # trim, so the result equals the same frame without its max+NaN.
    nan_rows = [(i, "z", 1.0) for i in range(19)] + [(99, "z", float("nan"))]
    ndf = spark.createDataFrame(
        nan_rows, "event_id long, event_type string, value double"
    )
    row = trimmed_mean_hist(ndf).collect()[0]
    assert (row.n_total, row.n_kept) == (20, 18) and row.trimmed_mean == 1.0, row


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_weighted_median_bucketed_equals_plain_window(seed, spark):
    """weighted_median_bucketed must equal q99's plain cumw-window
    pick exactly for any bucket width. Ties on value (RANGE-shared
    cum), zero weights, negative values (floor-bucket sign handling),
    all-weights-zero groups, and widths from sub-tie to one-global-
    bucket are all planted."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.aggregates2 import (
        weighted_median_bucketed,
    )

    rng = random.Random(2200 + seed)
    rows = []
    for g in range(5):
        n = rng.randrange(1, 40)
        allzero = g == 3
        allnullv = g == 4
        for _ in range(n):
            if allnullv or rng.random() < 0.1:
                v = None  # null values sort first; crossing may land here
            else:
                v = rng.choice([-7.5, -1.25, 0.0, 0.5, 0.5, 0.5, 2.25, 9.75, 13.5])
            wt = 0 if allzero else rng.choice([0, 1, 1, 2, 5])
            rows.append((f"g{g}", v, wt))
    df = spark.createDataFrame(rows, "g string, v double, wt long")

    part = W.partitionBy("g")
    c = df.select(
        "g",
        "v",
        F.sum("wt").over(part.orderBy("v")).alias("cumw"),
        F.sum("wt").over(part).alias("totw"),
    )
    plain = c.groupBy("g").agg(
        F.min(F.when(F.col("cumw") * 2 >= F.col("totw"), F.col("v"))).alias(
            "weighted_median"
        ),
        F.min("totw").cast("long").alias("total_weight"),
    )
    exp = {tuple(r) for r in plain.collect()}
    for width in [0.25, 1.0, 4.0, 1000.0]:
        got = {
            tuple(r)
            for r in weighted_median_bucketed(
                df, "g", "v", "wt", bucket_width=width
            ).collect()
        }
        assert got == exp, (seed, width, got ^ exp)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_equidepth_hist_equals_rank_form(seed, spark):
    """equidepth_bins_hist must reproduce q106's rank-assigned bins
    exactly: tie runs straddling bin edges (the invariance argument's
    stress case), group sizes below/at/above the bin count, and
    remainder-heavy n div B splits."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        equidepth_bins_hist,
    )

    rng = random.Random(1100 + seed)
    B = 8
    rows = []
    eid = 0
    for g in range(5):
        n = rng.choice([1, 3, 7, 8, 9, rng.randrange(10, 90)])
        for _ in range(n):
            # tiny value pool -> long tie runs crossing bin boundaries
            rows.append((eid, f"t{g}", rng.choice([0.5, 0.5, 1.25, 2.0, 7.75])))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    part = W.partitionBy("event_type")
    r = df.select(
        "event_type",
        "value",
        F.row_number().over(part.orderBy("value", "event_id")).alias("rk"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    plain = (
        r.select(
            "event_type",
            "value",
            F.expr(f"CAST(((rk - 1) * {B}) div n AS INT)").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    exp = {tuple(r_) for r_ in plain.collect()}
    got = {tuple(r_) for r_ in equidepth_bins_hist(df, bins=B).collect()}
    assert got == exp, (seed, got ^ exp)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_gini_histogram_equals_rank_form(seed, spark, tmp_path):
    """q209's histogram Gini must equal the oracle's rank form exactly:
    sum(i*n) over a tie run of equal activity n is tie-invariant, and
    the closed form n*c*(2cum-c+1) div 2 must hit it for every run
    shape (planted: many tied activity counts, singleton users,
    single-user types)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pinot_pulsar_plugin_spark.operators.eventanalytics import (
        q209_engagement_gini,
    )

    rng = random.Random(5500 + seed)
    rows = []
    eid = 0
    for g in range(4):
        n_users = rng.choice([1, 2, rng.randrange(3, 30)])
        for u in range(n_users):
            # heavy ties: activity drawn from a tiny set
            for _ in range(rng.choice([1, 1, 1, 2, 2, 5])):
                rows.append((eid, f"t{g}", g * 1000 + u))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    # rank-form oracle on the same frame
    ua = df.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("n", "user_id")
    ranked = ua.select(
        "event_type", "n", F.row_number().over(w).cast("long").alias("i")
    )
    plain = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
        F.expr(
            "(2 * sum(i * n) - (count(1) + 1) * sum(n)) * 1000 "
            "div (count(1) * sum(n))"
        ).alias("gini_milli"),
    )
    exp = {tuple(r) for r in plain.collect()}

    df.withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000)) \
      .withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}")) \
      .write.parquet(str(tmp_path / "events.parquet"))
    got = {tuple(r) for r in q209_engagement_gini(spark, str(tmp_path)).collect()}
    assert got == exp, (seed, got ^ exp)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_q196_decimal_gini_equals_long_form(seed, spark):
    """The r11 overflow fix (gini_milli arithmetic lifted to
    DECIMAL(38,0)) must be value-identical to the original all-BIGINT
    expression wherever the long form doesn't overflow — same rounded
    milli for every group, including single-part groups (gini 0) and
    all-equal revenues."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(9600 + seed)
    rows = []
    for g in range(5):
        n = rng.choice([1, 2, 3, 17, rng.randrange(1, 60)])
        equal = rng.random() < 0.3
        base = rng.randrange(1, 10**9)
        for k in range(n):
            cents = base if equal else rng.randrange(1, 10**9)
            rows.append((f"t{g}", k, cents))
    df = spark.createDataFrame(rows, "p_type string, l_partkey long, cents long")
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    ranked = df.select(
        "p_type",
        "cents",
        F.row_number()
        .over(w.partitionBy("p_type").orderBy("cents", "l_partkey"))
        .cast("long")
        .alias("i"),
    )
    long_form = F.expr(
        "(2 * sum(i * cents) - (count(1) + 1) * sum(cents)) * 1000 "
        "div (count(1) * sum(cents))"
    ).alias("g")
    dec_form = F.expr(
        "CAST((2 * sum(CAST(i AS DECIMAL(38,0)) * cents)"
        " - (count(1) + 1) * CAST(sum(cents) AS DECIMAL(38,0))) * 1000"
        " div (count(1) * CAST(sum(cents) AS DECIMAL(38,0))) AS BIGINT)"
    ).alias("g")
    a = {tuple(r) for r in ranked.groupBy("p_type").agg(long_form).collect()}
    b = {tuple(r) for r in ranked.groupBy("p_type").agg(dec_form).collect()}
    assert a == b, (seed, a ^ b)


def test_q196_decimal_gini_survives_long_overflow(spark):
    """The regime that motivated the fix, pinned: cents magnitudes
    where (2*sum(i*cents) - (n+1)*sum(cents)) * 1000 exceeds int64
    (measured ~2.0e19 on the 100x corpus) make the BIGINT form raise
    ANSI ARITHMETIC_OVERFLOW while the DECIMAL form returns the exact
    milli (verified against Python's arbitrary-precision ints)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    n, scale = 40, 10**15
    rows = [("t", k, (k + 1) * scale) for k in range(n)]
    df = spark.createDataFrame(rows, "p_type string, l_partkey long, cents long")
    ranked = df.select(
        "p_type",
        "cents",
        F.row_number()
        .over(W.partitionBy("p_type").orderBy("cents", "l_partkey"))
        .cast("long")
        .alias("i"),
    )
    dec_form = F.expr(
        "CAST((2 * sum(CAST(i AS DECIMAL(38,0)) * cents)"
        " - (count(1) + 1) * CAST(sum(cents) AS DECIMAL(38,0))) * 1000"
        " div (count(1) * CAST(sum(cents) AS DECIMAL(38,0))) AS BIGINT)"
    ).alias("g")
    got = ranked.groupBy("p_type").agg(dec_form).collect()[0].g
    cents = [(k + 1) * scale for k in range(n)]
    sic = sum((k + 1) * c for k, c in enumerate(sorted(cents)))
    sc = sum(cents)
    exp = (2 * sic - (n + 1) * sc) * 1000 // (n * sc)
    assert (2 * sic - (n + 1) * sc) * 1000 > 2**63 - 1  # long form overflows
    assert got == exp
    long_form = F.expr(
        "(2 * sum(i * cents) - (count(1) + 1) * sum(cents)) * 1000 "
        "div (count(1) * sum(cents))"
    ).alias("g")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        ranked.groupBy("p_type").agg(long_form).collect()

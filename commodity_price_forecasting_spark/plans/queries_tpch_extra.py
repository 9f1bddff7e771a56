"""Extended relational coverage: TPC-H-style query shapes (adapted to
the fixture schema, which has no partsupp/commitdate/shipmode) that
exercise operator patterns the SURVEY.md §2 inventory reaches only
implicitly — EXISTS semi-joins, anti-join aggregates, CASE-aggregates,
LIKE-prefix joins, OR-of-ANDs predicate pushdown, HAVING over joined
aggregates, and CUBE grouping. Everything DataFrame-first with
broadcast dimensions; rounding policy per queries_relational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

# --- q4-style: EXISTS semi-join counted per priority --------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("q4_priority_exists", oracle=_Q4_ORACLE, tags=("join", "semi"))
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipped line
    (ship > order + 60d), counted per priority. left_semi join — the
    probe side streams, no duplicate explosion, one agg shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --- q10-style: returned-item revenue by customer -----------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@register("q10_returned_revenue", oracle=_Q10_ORACLE, tags=("join", "topk"))
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items, top-20
    customers. Fact-to-fact join shuffles on orderkey once; customer
    and nation broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- q12-style: CASE-aggregate split by priority class ------------------

_Q12_ORACLE = """
SELECT count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
"""


@register("q12_priority_case_agg", oracle=_Q12_ORACLE, tags=("join", "agg"))
def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: very-late lines split into high/low priority
    CASE counts — conditional aggregation in one pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
    )


# --- q14-style: promo revenue share (LIKE-class predicate on a dim) -----

_Q14_ORACLE = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("join", "agg"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share over a quarter. Part is
    broadcast; the CASE ratio is one aggregate pass."""
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# --- q18-style: HAVING over a joined aggregate --------------------------

_Q18_ORACLE = """
SELECT c.c_name, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(t.sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
"""


@register("q18_large_orders", oracle=_Q18_ORACLE, tags=("join", "agg", "topk", "bench"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300
    (HAVING), enriched with customer — the aggregate runs FIRST so
    only qualifying orderkeys join onward."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("_sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- q19-style: OR-of-ANDs bracket predicate ----------------------------

_Q19_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


@register("q19_bracket_or", oracle=_Q19_ORACLE, tags=("join", "filter"))
def q19_bracket_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets across the
    join — Catalyst extracts the common p_brand/p_size conjuncts into
    the broadcast side scan."""
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(bracket).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- CUBE grouping (free Spark capability beyond reference parity) ------

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_qty", oracle=_CUBE_ORACLE, tags=("agg",))
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in
    one pass (SURVEY.md §2.4 note — cube/rollup come free from Spark
    SQL and are exposed for multi-market rollups)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- salted skew join: identical semantics to the plain join ------------

_SALTED_ORACLE = """
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("skew_salted_join", oracle=_SALTED_ORACLE, tags=("join", "skew"))
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem⋈orders join executed through the explicit salting
    operator (operators/joins.salted_join, 8 salts): a hot orderkey
    spreads over 8 reducers. The oracle is the plain SQL join —
    salting must be semantically invisible."""
    from commodity_price_forecasting_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = salted_join(li, o, ["l_orderkey"], n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


# --- q7-style: volume between two trading nations -----------------------

_Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


@register("q7_nation_volume", oracle=_Q7_ORACLE, tags=("join", "agg"))
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    Supplier/customer/nation broadcast; lineitem⋈orders is the only
    big shuffle; the nation-pair disjunction prunes AFTER the
    broadcast joins attach the names."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("_snk"))
        .join(cn, F.col("c_nationkey") == F.col("_cnk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --- q8-style: market share of one nation in a part type ----------------

_Q8_ORACLE = """
WITH volumes AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'ECONOMY'
)
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM volumes GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share within a part class
    per year — a ratio of conditional aggregates over one scan of the
    joined volumes."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# --- q16-style: distinct supplier count per part attribute --------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size IN (5, 10, 15, 20)
GROUP BY 1, 2
"""


@register("q16_supplier_cnt", oracle=_Q16_ORACLE, tags=("join", "agg", "distinct"))
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type) for
    selected sizes — count-distinct over a broadcast-joined
    dimension; the IN-list prunes the broadcast side scan."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(5, 10, 15, 20))
        .select("p_partkey", "p_brand", "p_type")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- q15-style: top supplier(s) by revenue (argmax over aggregate) ------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(r.total_revenue, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("join", "agg", "topk"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — argmax over an aggregate via a rank window on the
    aggregated (small) frame, not a self-join against a scalar
    subquery re-scan."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = (
        revenue.withColumn("_rk", F.rank().over(W.orderBy(F.desc("total_revenue"))))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return top.join(s, F.col("supplier_no") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
    )


# --- q9-style: profit by supplier nation and year -----------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.5 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS profit
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
"""


@register("q9_profit_nation_year", oracle=_Q9_ORACLE, tags=("join", "agg"))
def q9_profit_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the fixture, so supply cost is
    modeled as half the part retail price): pseudo-profit per supplier
    nation per order year, part-name LIKE filter pushed to the part
    scan. Fact-to-fact joins (lineitem⋈orders) hash-shuffle on the
    key; part/supplier/nation are broadcast. DECIMAL aggregation for
    cross-engine midpoint-exact rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(28,10)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount).cast("double"), 2).alias("profit"))
    )


# --- q13-style: customer order-count distribution -----------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


@register("q13_custdist", oracle=_Q13_ORACLE, tags=("join", "agg"))
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer
    (LEFT join keeps the zero-order customers), then the histogram of
    those counts. First agg shuffles on custkey; the second input is
    |customers| rows of two ints, so its shuffle is trivial."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- q17-style: small-quantity revenue vs per-part average --------------

_Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
       AS avg_yearly
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE 2 * l.l_quantity * pa.cnt < pa.sum_qty
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE, tags=("join", "agg"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below
    half the part's average. The threshold compare is cross-multiplied
    (2·qty·cnt < sum_qty) so both engines compare EXACT integers —
    no float-average boundary ties. The per-part aggregate is tiny
    (|parts| rows) and broadcast back against lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = F.broadcast(
        li.groupBy("l_partkey").agg(
            F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
        ).withColumnRenamed("l_partkey", "pa_partkey")
    )
    return (
        li.join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(2 * F.col("l_quantity") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# --- q20-style: suppliers providing the majority of a part's volume ------

_Q20_ORACLE = """
WITH pq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
), pt AS (
  SELECT l_partkey, SUM(sq) AS total_q FROM pq GROUP BY 1
)
SELECT s.s_name, COUNT(*) AS n_dominated_parts
FROM pq
JOIN pt ON pq.l_partkey = pt.l_partkey
JOIN supplier s ON pq.l_suppkey = s.s_suppkey
WHERE 2 * pq.sq > pt.total_q
GROUP BY s.s_name
"""


@register("q20_dominant_supplier", oracle=_Q20_ORACLE, tags=("join", "agg"))
def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that shipped more than half of a
    part's 1996 volume, with how many parts they dominate. Both
    aggregates reuse the SAME shuffle key prefix (partkey), so the
    second agg is a near-free re-shuffle of pre-combined rows;
    supplier is broadcast. Quantity sums are integral doubles —
    exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    pt = pq.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("sq").alias("total_q")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        pq.join(pt, pq.l_partkey == F.col("pt_partkey"))
        .filter(2 * F.col("sq") > F.col("total_q"))
        .join(s, pq.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


# --- q21-style: sole late supplier on multi-supplier orders -------------

_Q21_ORACLE = """
WITH ol AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), agg AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
  FROM ol GROUP BY 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM ol
JOIN agg ON ol.l_orderkey = agg.l_orderkey
JOIN supplier s ON ol.l_suppkey = s.s_suppkey
WHERE ol.is_late = 1 AND agg.n_supp >= 2 AND agg.n_late = 1
GROUP BY s.s_name
"""


@register("q21_sole_late_supplier", oracle=_Q21_ORACLE, tags=("join", "agg"))
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    orders involving ≥2 suppliers. The exists/not-exists pair is
    expressed as one (orderkey, suppkey) aggregate plus a per-order
    rollup — two shuffles on the same leading key instead of two
    correlated self-joins over lineitem."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # one explicit hash partitioning on the LEADING key: the
        # (orderkey, suppkey) aggregate, the per-order rollup, and the
        # ol⋈agg self-join are all clustered by l_orderkey, so this
        # single exchange serves all three (5 -> 3 exchanges total)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    agg = ol.groupBy(F.col("l_orderkey").alias("a_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        ol.join(agg, ol.l_orderkey == F.col("a_orderkey"))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, ol.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- q22-style: high-balance customers with no orders -------------------

_Q22_ORACLE = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal, COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer c, pos
WHERE 2 * CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.cnt > pos.sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1
"""


@register("q22_idle_rich_customers", oracle=_Q22_ORACLE, tags=("join", "anti", "agg"))
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above half the positive-balance
    average with NO orders since 1999 (every fixture customer has
    ordered at least once, so "lapsed" replaces "never ordered" to
    keep the anti-join non-vacuous), grouped by nation. The average compare is cross-multiplied in DECIMAL
    (2·bal·cnt > sum) so both engines
    compare exact decimals — no float-average boundary. Anti-join
    against orders carries only custkeys."""
    c = load_table(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(pos)).filter(
        2 * F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt") > F.col("sum_bal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("totacctbal"),
        )
    )


# --- q2-style: minimum-cost supplier per part ---------------------------

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY 1, 2
), cost AS (
  SELECT l_partkey, l_suppkey,
         ROUND(CAST(sum_price AS DOUBLE) / CAST(sum_qty AS DOUBLE), 6)
           AS unit_cost,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY ROUND(CAST(sum_price AS DOUBLE) / CAST(sum_qty AS DOUBLE), 6) ASC,
                    l_suppkey ASC) AS rk
  FROM ps
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, c.unit_cost,
       ROUND(CAST(s.s_acctbal AS DOUBLE), 2) AS s_acctbal
FROM cost c
JOIN part p ON p.p_partkey = c.l_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE c.rk = 1 AND p.p_size <= 4 AND r.r_name = 'EUROPE'
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "topk"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (the fixture has no partsupp, so the observed
    unit price SUM(extprice)/SUM(qty) per (part, supplier) from
    lineitem plays the role of ps_supplycost): for each small
    EUROPE-supplied part, the cheapest supplier. The correlated min
    becomes one argmin window per part; the small-part filter
    broadcasts INTO the pre-window join so the window only ranks
    surviving parts (equivalent — the argmin is per-part — and far
    less window input at scale). Sums are exact DECIMAL; the cost is
    rounded to 6dp before ranking with a suppkey tie-break so both
    engines pick the same winner."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 4)
        .select("p_partkey", "p_name")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    ps = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_price"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        )
        .withColumn(
            "unit_cost",
            F.round(
                F.col("sum_price").cast("double") / F.col("sum_qty").cast("double"), 6
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_cost"), F.asc("l_suppkey")
    )
    best = ps.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            "unit_cost",
            F.round(F.col("s_acctbal").cast("double"), 2).alias("s_acctbal"),
        )
    )


# --- q11-style: important parts by supplied value -----------------------

_Q11_ORACLE = """
WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(8,2)))) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY 1
), tot AS (SELECT SUM(part_value) AS total_value, COUNT(*) AS n_parts FROM val)
SELECT v.l_partkey AS p_partkey,
       ROUND(CAST(v.part_value AS DOUBLE), 2) AS part_value
FROM val v, tot t
WHERE v.part_value * t.n_parts > 2 * t.total_value
"""


@register("q11_important_parts", oracle=_Q11_ORACLE, tags=("join", "agg"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose ASIA-supplied discounted value
    exceeds a global threshold. TPC-H's fixed fraction breaks under
    scale-factor changes, so the threshold is scale-invariant: value
    above 2x the mean part value, compared cross-multiplied in exact
    DECIMAL (value*n_parts > 2*total) — no float-average boundary.
    The scalar (total, count) aggregate broadcasts to every
    partition; the only big shuffle is the partkey groupBy."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
            ).alias("part_value")
        )
    )
    tot = val.agg(
        F.sum("part_value").alias("total_value"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("part_value") * F.col("n_parts") > 2 * F.col("total_value"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value").cast("double"), 2).alias("part_value"),
        )
    )


# --- market-basket pair co-occurrence (r4) ------------------------------

_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sized AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 2 AND 20
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sized s ON s.l_orderkey = a.l_orderkey
)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pairs GROUP BY part_a, part_b
HAVING COUNT(*) >= 2
"""


@register("basket_item_pairs", oracle=_BASKET_ORACLE, tags=("relational", "agg"))
def basket_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair co-occurrence: how often two parts appear in
    the same order (support >= 2) — the counting core of association
    mining and of co-occurrence matrices for embedding training. The
    quadratic per-basket pair blowup is bounded BEFORE the self-join
    by capping basket size (2..20 distinct items): at 100 TB a single
    pathological mega-basket would otherwise dominate one task, so
    the cap (or per-basket sampling above it) is load-bearing, not
    cosmetic. Joins are all equi-joins on the order key the items
    table is already aggregated by."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter((F.col("n_items") >= 2) & (F.col("n_items") <= 20))
        .select("l_orderkey")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(sized, "l_orderkey")
        .join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("part_a", "part_b", F.col("n_orders").cast("long").alias("n_orders"))
    )


_REC_COSINE_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sized AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 2 AND 20
), ok AS (
  SELECT i.l_orderkey, i.l_partkey FROM items i
  JOIN sized s ON s.l_orderkey = i.l_orderkey
), deg AS (
  SELECT l_partkey, COUNT(*) AS n_ord FROM ok GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM ok a JOIN ok b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(p.n_ab / SQRT(da.n_ord * CAST(db.n_ord AS DOUBLE)), 6)
         AS cosine
FROM pairs p
JOIN deg da ON da.l_partkey = p.part_a
JOIN deg db ON db.l_partkey = p.part_b
ORDER BY ROUND(p.n_ab / SQRT(da.n_ord * CAST(db.n_ord AS DOUBLE)), 6) DESC,
         p.part_a, p.part_b
LIMIT 20
"""


@register("rec_item_cosine", oracle=_REC_COSINE_ORACLE, tags=("relational", "ml", "behavior"))
def rec_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering scores: cosine similarity of
    the co-purchase incidence vectors, computed WITHOUT materializing
    vectors — cos(a,b) = n_ab/√(n_a·n_b) from the pair-support counts
    (``basket_item_pairs``) and per-item order degrees; top-20
    recommendations by rounded score. This is the Amazon-style
    item-to-item recipe: the quadratic stays bounded by the same
    basket-size cap, and the degree table is a broadcast dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter((F.col("n_items") >= 2) & (F.col("n_items") <= 20))
        .select("l_orderkey")
    )
    ok = items.join(sized, "l_orderkey")
    deg = ok.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    da = deg.select(
        F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("na")
    )
    db = deg.select(
        F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("nb")
    )
    cos = F.round(
        F.col("n_ab") / F.sqrt(F.col("na") * F.col("nb").cast("double")), 6
    )
    return (
        pairs.join(F.broadcast(da), "part_a")
        .join(F.broadcast(db), "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            cos.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


# --- association rules over capped baskets (r5) --------------------------

_ASSOC_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), sized AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 2 AND 20
), ok AS (
  SELECT i.l_orderkey, i.l_partkey FROM items i JOIN sized s USING (l_orderkey)
), nb AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM ok
), ideg AS (
  SELECT l_partkey, COUNT(*) AS n FROM ok GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons, COUNT(*) AS n_ab
  FROM ok a JOIN ok b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT p.ante, p.cons, CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / t.n_baskets, 6) AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / da.n, 6) AS confidence,
       ROUND(CAST(p.n_ab AS DOUBLE) * t.n_baskets / (da.n * db.n), 6)
         AS lift,
       ROUND(CAST(p.n_ab AS DOUBLE) / t.n_baskets
             - CAST(da.n AS DOUBLE) * db.n / (t.n_baskets * t.n_baskets),
             6) AS leverage,
       ROUND((1.0 - CAST(db.n AS DOUBLE) / t.n_baskets)
             / NULLIF(1.0 - CAST(p.n_ab AS DOUBLE) / da.n, 0), 6)
         AS conviction
FROM pairs p
JOIN ideg da ON da.l_partkey = p.ante
JOIN ideg db ON db.l_partkey = p.cons
CROSS JOIN nb t
"""


@register("basket_association_rules", oracle=_ASSOC_ORACLE, tags=("relational", "agg", "ml"))
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules ante→cons over the capped baskets
    (support ≥ 3 co-occurrences — co-occurrence counts DILUTE as the catalog grows, so the floor is set where every test SF keeps a non-trivial rule set): support, confidence, lift, leverage
    and conviction — the full Agrawal-style rule readout on top of
    ``basket_item_pairs``' counting core, with conviction NULL at
    confidence 1 (NULLIF on both engines, no infinity). Every metric
    is a ratio of integer counts; the basket-size cap bounds the
    per-basket pair blowup exactly as in the pair query; item degrees
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter((F.col("n_items") >= 2) & (F.col("n_items") <= 20))
        .select("l_orderkey")
    )
    ok = items.join(sized, "l_orderkey")
    nb = ok.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    ideg = ok.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("ante"),
            F.col("b.l_partkey").alias("cons"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    da = ideg.select(F.col("l_partkey").alias("ante"), F.col("n").alias("na"))
    db = ideg.select(F.col("l_partkey").alias("cons"), F.col("n").alias("nc"))
    nab = F.col("n_ab").cast("double")
    nbk = F.col("n_baskets")
    conf = nab / F.col("na")
    return (
        pairs.join(F.broadcast(da), "ante")
        .join(F.broadcast(db), "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(nab / nbk, 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(nab * nbk / (F.col("na") * F.col("nc")), 6).alias("lift"),
            F.round(
                nab / nbk
                - F.col("na").cast("double") * F.col("nc") / (nbk * nbk),
                6,
            ).alias("leverage"),
            F.round(
                (1.0 - F.col("nc").cast("double") / nbk)
                / F.nullif(1.0 - conf, F.lit(0.0)),
                6,
            ).alias("conviction"),
        )
    )

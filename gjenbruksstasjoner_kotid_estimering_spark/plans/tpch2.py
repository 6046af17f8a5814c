"""Extended TPC-H query shapes (Q4..Q22 family) over the driver corpus.

plans/tpch.py carries Q1/Q3/Q5/Q6/Q18; this module widens the benchmark
surface with the remaining canonical shapes, adapted to this corpus's
narrower schema (no partsupp table, no commit/receipt dates, no
phone/container columns — see TESTDATA.md):

- Q4's "late delivery EXISTS" becomes "a returned line shipped after the
  order date" (same correlated-EXISTS-then-aggregate plan).
- Q9's supply cost becomes ``0.1 * p_retailprice * l_quantity`` (same
  multi-join profit rollup shape).
- Q12's ship modes become order priorities (same CASE-sum pivot).
- Q16/Q20's partsupp becomes the distinct (supplier, part) pairs observed
  in lineitem — the supply relation this corpus actually materializes.

All money sums use the cents-exact pattern (round once per row to a
BIGINT, sum exactly) so the oracle hash cannot drift under parallel
summation; every LIMIT carries a total tie-break ordering.

Plan notes per query live in each docstring; the shared posture is:
dimension sides broadcast, the lineitem⋈orders fact join shuffles once on
the order key, correlated subqueries decorrelate into semi/anti joins
(Catalyst), and aggregates run partial→final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


def _rev_cents(price, discount):
    return F.round(price * (F.lit(1.0) - discount) * 100.0, 0).cast("long")


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q4",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R'
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 (order priority checking), adapted: the correlated "
    "EXISTS probes for a returned line shipped after the order date (the "
    "corpus has no commit/receipt dates). Catalyst decorrelates to a left "
    "SEMI join on l_orderkey with the non-equi shipdate predicate as the "
    "join residual; the semi probe stops at first match, then a tiny "
    "5-group aggregate. At 100 TB: one fact-fact semi shuffle, no "
    "duplication from the EXISTS side.",
    tags=("tpch", "subquery", "exists", "agg"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (volume shipping): bidirectional nation-pair trade "
    "volume by ship year. Both nation sides broadcast; the disjunctive "
    "pair predicate lands AFTER both nation joins resolve names (it "
    "references both sides), but each nation join itself prunes via the "
    "broadcast hash. lineitem⋈orders is the single fact shuffle; customer "
    "and supplier broadcast. 2 pair-directions × 2 years = 4 result rows.",
    tags=("tpch", "join", "agg"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("revenue_cents")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q9",
    oracle="""
        SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)
                    - 0.1 * p.p_retailprice * l.l_quantity) * 100.0, 0)
                    AS BIGINT)) AS BIGINT) AS profit_cents
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 (product-type profit), adapted: supply cost is "
    "0.1 × p_retailprice × quantity (no partsupp table in this corpus). "
    "part is filtered by the LIKE before its broadcast join — at 100 TB "
    "the p_name predicate prunes the build side, not the fact scan — then "
    "supplier/nation broadcast and orders shuffles once against lineitem. "
    "Profit rounds to cents once per row, sums exactly as BIGINT.",
    tags=("tpch", "join", "agg"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit_cents = F.round(
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100.0,
        0,
    ).cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit_cents).alias("profit_cents"))
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q10",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
               c.c_acctbal, n.n_name, c.c_mktsegment
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
        ORDER BY revenue_cents DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 (returned item reporting): revenue lost to returns per "
    "customer over one quarter, top-20. Date filter pushes to the orders "
    "scan and the returnflag filter to the lineitem scan BEFORE the fact "
    "join; customer/nation broadcast onto the aggregated survivors. "
    "Deterministic top-20 via (revenue DESC, custkey) — TakeOrdered, no "
    "global sort.",
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.sum(
                _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("revenue_cents")
        )
        .select(
            "c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12",
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus
    """,
    doc="TPC-H Q12 (shipping modes / priority), adapted: ship modes "
    "become line status (the corpus has no l_shipmode) and the CASE-sum "
    "pivot counts urgent-vs-other order priorities per status. One fact "
    "shuffle on the order key; the CASE sums are map-side combinable "
    "integer partial aggregates.",
    tags=("tpch", "join", "agg", "case"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                               AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer order-count distribution): LEFT OUTER join "
    "keeps zero-order customers (count over the nullable right key → 0), "
    "then a second aggregation histograms the counts. The priority "
    "predicate is part of the JOIN CONDITION, not a WHERE — pushing it to "
    "WHERE would silently drop the zero-order customers. Two shuffles "
    "(join+count on custkey, histogram on c_count); the second input is "
    "one row per customer, tiny.",
    tags=("tpch", "join", "outer", "agg"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14",
    oracle="""
        SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0, 0) AS BIGINT) ELSE 0 END) AS DOUBLE)
               / CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0, 0) AS BIGINT)) AS DOUBLE) AS promo_pct,
               CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0, 0) AS BIGINT) ELSE 0 END) AS BIGINT)
                   AS promo_revenue_cents,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 (promotion effect): share of one month's revenue from "
    "PROMO parts. part broadcasts into the date-pruned lineitem scan; the "
    "percentage is ONE double division of two exactly-summed BIGINT cents "
    "totals, so the hash is parallelism-proof. Single global aggregate "
    "row, no post-join shuffle at all (partial aggs collapse to one).",
    tags=("tpch", "join", "agg", "case"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
    promo_rev = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    )
    total_rev = F.sum(rev)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0) * promo_rev.cast("double") / total_rev.cast("double")
        ).alias("promo_pct"),
        promo_rev.alias("promo_revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q19",
    oracle="""
        SELECT CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                    * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 (discounted revenue, disjunctive predicates): three "
    "OR'ed brand/size/quantity conjuncts spanning BOTH join sides. "
    "Catalyst extracts the common single-side implications — the brand "
    "IN-list prunes the part build side and the quantity range (1..30) "
    "prunes the lineitem scan — before the broadcast join evaluates the "
    "full disjunction as a residual. The classic test that OR predicates "
    "don't defeat pushdown.",
    tags=("tpch", "join", "filter", "agg"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(
                _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q2",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(round(l_extendedprice / l_quantity * 100.0, 0)
                       AS BIGINT)) AS cost_cents
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        )
        SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, s.s_acctbal,
               sp.cost_cents
        FROM part p
        JOIN supply sp  ON sp.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = sp.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size = 25 AND p.p_type = 'STANDARD'
          AND sp.cost_cents = (
              SELECT min(sp2.cost_cents) FROM supply sp2
              WHERE sp2.l_partkey = p.p_partkey
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 (minimum-cost supplier), adapted: the supply relation is "
    "derived from lineitem (distinct (part, supplier) with min observed "
    "unit price in cents) since the corpus has no partsupp. The correlated "
    "min-cost subquery becomes a min-over-partition WINDOW on the supply "
    "aggregate — one shuffle on partkey computes both the per-pair cost "
    "and the per-part floor, no self-join re-scan. part is filtered before "
    "its broadcast; supplier/nation broadcast.",
    tags=("tpch", "join", "subquery", "window"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(
        F.min(
            F.round(
                F.col("l_extendedprice") / F.col("l_quantity") * 100.0, 0
            ).cast("long")
        ).alias("cost_cents")
    )
    w = Window.partitionBy("l_partkey")
    cheapest = supply.withColumn(
        "min_cost", F.min("cost_cents").over(w)
    ).where(F.col("cost_cents") == F.col("min_cost"))
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 25) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        cheapest.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            "cost_cents",
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


@register(
    "tpch_q8",
    oracle="""
        WITH all_sales AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0, 0) AS BIGINT) AS rev_cents,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = n1.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'EUROPE'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents
                        ELSE 0 END) AS DOUBLE)
               / CAST(sum(rev_cents) AS DOUBLE) AS mkt_share,
               CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents
                        ELSE 0 END) AS BIGINT) AS nation_rev_cents,
               CAST(sum(rev_cents) AS BIGINT) AS total_rev_cents
        FROM all_sales
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 (national market share): NATION_3's share of revenue "
    "sold into EUROPE-region customers per order year. The region filter "
    "prunes the customer-side nation broadcast; both nation lookups and "
    "supplier broadcast; lineitem⋈orders is the one fact shuffle. Share = "
    "one double division of two exactly-summed cents totals per year.",
    tags=("tpch", "join", "agg", "case"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    rev = _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
            F.lit(0).cast("long")
        )
    )
    total_rev = F.sum(rev)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (nation_rev.cast("double") / total_rev.cast("double")).alias(
                "mkt_share"
            ),
            nation_rev.alias("nation_rev_cents"),
            total_rev.alias("total_rev_cents"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q15",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                        * 100.0, 0) AS BIGINT)) AS BIGINT) AS total_rev_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev_cents
        FROM revenue r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev_cents = (SELECT max(total_rev_cents) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier, keep "
    "the max-revenue supplier(s). The max comes from a second aggregate "
    "over the ALREADY-AGGREGATED per-supplier frame (100 rows) broadcast "
    "back as a scalar — the fact table is scanned once; ties all survive "
    "(exact cents equality, no float fuzz).",
    tags=("tpch", "agg", "subquery", "topk"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    # Materialize the supplier-count-sized revenue aggregate once: the
    # max-subquery side and the join side are NOT exchange-reusable (the
    # join pushes an extra IsNotNull(l_suppkey) into its scan, so the
    # two subtrees canonicalize differently) — without this the quarter
    # of lineitem is scanned and aggregated twice (measured r17).
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(
            _rev_cents(F.col("l_extendedprice"), F.col("l_discount"))
        ).alias("total_rev_cents")
    ).localCheckpoint(eager=False)
    best = revenue.agg(F.max("total_rev_cents").alias("best_cents"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(best),
            F.col("total_rev_cents") == F.col("best_cents"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT sp.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
        JOIN part p ON p.p_partkey = sp.l_partkey
        WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
          AND p.p_size IN (5, 15, 25, 35, 45)
          AND sp.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship), adapted: the supply "
    "relation is the distinct (part, supplier) pairs observed in lineitem; "
    "the complaint-supplier NOT IN becomes an anti-join against negative-"
    "balance suppliers (keys are non-null so NOT IN ≡ ANTI). Dedup "
    "shuffles on the pair key, the part filters prune the broadcast build "
    "side, and the final distinct-count is the only wide aggregate.",
    tags=("tpch", "join", "anti", "distinct", "agg"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select("l_partkey", "l_suppkey").distinct()
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    return (
        sp.join(
            F.broadcast(bad), sp.l_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"),
            F.col("p_size"),
        )
    )


@register(
    "tpch_q17",
    oracle="""
        SELECT CAST(sum(CAST(round(l.l_extendedprice * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS total_cents,
               CAST(sum(CAST(round(l.l_extendedprice * 100.0, 0) AS BIGINT))
                    AS DOUBLE) / 700.0 AS avg_yearly,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < 0.2 * (
              SELECT avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lines whose quantity is "
    "under 20% of their part's average. The correlated avg decorrelates "
    "into a per-part aggregate joined back on partkey — the Spark plan "
    "computes it explicitly as groupBy(partkey).avg ⋈ lineitem, one "
    "shuffle each side under AQE. Quantities are integral doubles, so the "
    "avg (exact integer sum / exact count) is bit-identical across "
    "engines and the 0.2× threshold cannot flip rows.",
    tags=("tpch", "join", "subquery", "agg"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#23"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
            ).alias("total_cents"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")
                ).cast("double")
                / F.lit(700.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q20",
    oracle="""
        SELECT s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_4'
          AND s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE 'red%'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY l.l_suppkey, l.l_partkey
              HAVING sum(CAST(l.l_quantity AS BIGINT)) > 50
          )
        ORDER BY s.s_name
    """,
    doc="TPC-H Q20 (potential part promotion), adapted: suppliers in "
    "NATION_4 who moved >50 units of any 'red%' part in 1997 (the "
    "available-stock half of the original predicate needs partsupp). The "
    "IN-subquery becomes LEFT SEMI against the part-filtered, "
    "HAVING-pruned per-(supplier, part) aggregate; part broadcasts into "
    "the date-pruned lineitem scan, and the semi probe side is tiny.",
    tags=("tpch", "join", "semi", "subquery", "agg"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_4"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        JOIN nation n    ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n.n_name = 'NATION_0'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting), adapted: the "
    "return flag 'R' stands in for late delivery (no receipt/commit "
    "dates). The oracle keeps the canonical EXISTS / NOT-EXISTS pair; the "
    "Spark plan uses the equivalent ONE-PASS formulation — per order, "
    "count distinct suppliers and distinct RETURNING suppliers, then keep "
    "R-lines on multi-supplier orders where the returning-supplier set is "
    "exactly {this supplier}. That turns two correlated fact self-probes "
    "into a single per-order aggregate joined back — one lineitem "
    "shuffle instead of three at 100 TB.",
    tags=("tpch", "join", "exists", "agg"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_0"
    )
    l1 = li.where(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(per_order, l1.l_orderkey == F.col("po_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22",
    oracle="""
        WITH thresh AS (
            SELECT CAST(sum(CAST(round(c_acctbal * 100.0, 0) AS BIGINT))
                        AS DOUBLE) / count(*) AS avg_cents
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT substring(c.c_name, 16, 2) AS cntrycode,
               count(*) AS numcust,
               CAST(sum(CAST(round(c.c_acctbal * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS totacctbal_cents
        FROM customer c, thresh t
        WHERE CAST(round(c.c_acctbal * 100.0, 0) AS BIGINT) > t.avg_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY cntrycode
        ORDER BY cntrycode
    """,
    doc="TPC-H Q22 (global sales opportunity), adapted: country code "
    "becomes two digits of the zero-padded customer name (no phone "
    "column). The global-average threshold is computed in EXACT cents "
    "(BIGINT sum / count, one double division) so the above-average "
    "comparison is parallelism-proof, broadcast as a 1-row scalar; "
    "DORMANT customers (no order since 1999 — this corpus has almost no "
    "order-less customers) via LEFT ANTI on the date-pruned orders scan. "
    "One fact anti-shuffle, tiny grouped rollup.",
    tags=("tpch", "anti", "subquery", "agg"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100.0, 0).cast("long")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents).cast("double") / F.count(F.lit(1))).alias("avg_cents")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(thresh))
        .where(cents > F.col("avg_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring(F.col("c_name"), 16, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(cents).alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )

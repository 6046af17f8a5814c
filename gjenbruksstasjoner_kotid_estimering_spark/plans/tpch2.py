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

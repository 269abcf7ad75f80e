"""TPC-H composite queries (SURVEY.md §2.B "Composite end-to-end queries").

These are the bench headliners: each stresses the full scan → filter → join →
aggregate → sort pipeline the reference's catalog metadata exists to serve
(reference README.md:3-7).

Scale notes: Q1 is a pure map-side-partial + final hash agg (4 groups — the
shuffle carries only partial aggregates). Q3/Q5 shuffle the two fact tables on
their join keys once each; every dimension is broadcast so the fact tables are
never shuffled for dimension joins. AQE handles skew and coalesces the tiny
post-agg exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from .common import ntz, r4, t


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary report (filter + group + 8 aggregates + sort)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= ntz("1998-09-02 00:00:00"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(disc_price)).alias("sum_disc_price"),
            r4(F.sum(charge)).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority (3-way join + agg + top-k).

    Filters are applied *before* the joins so pushdown shrinks each scan;
    customer (post-filter) is broadcast. l_orderkey added to the sort as a
    unique tiebreak so LIMIT 10 is deterministic.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < ntz("1998-03-15 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > ntz("1998-03-15 00:00:00"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local supplier volume (6-way join + agg).

    The region filter is applied to the broadcast dimension chain
    (region → nation → supplier), so the big-side joins only see suppliers in
    ASIA; customer-supplier co-nationality is the extra equi condition.
    """
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < ntz("1997-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """Q6 forecasting revenue change: pure pushdown filter + global agg —
    the cheapest possible plan shape (no shuffle beyond one partial/final)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ntz("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           round(c.c_acctbal, 4) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting (adapted to fixture columns): 4-way join,
    revenue agg, top-20. Customer and nation broadcast; lineitem/orders
    shuffle once on the join key; TakeOrderedAndProject caps the output."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1996-04-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey", "c_name", "revenue", r4("c_acctbal").alias("c_acctbal"), "n_name"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """Q14 promotion effect: broadcast part join + conditional aggregate."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1996-10-01 00:00:00"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            r4(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           round(o.o_totalprice, 4) AS o_totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: semi-join against a HAVING aggregate —
    the inner aggregate shrinks to qualifying keys before touching the
    3-way join, so the join input is pre-filtered at any scale."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r4(F.sum("l_quantity")).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            r4("o_totalprice").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """Q19 discounted revenue (adapted): disjunctive multi-branch predicate
    over a broadcast join — Catalyst extracts the common p_partkey join key
    and pushes the per-branch ranges below it."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(branch).agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue")
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """Q4 order-priority checking (adapted: the fixture drops
    l_commitdate/l_receiptdate, so "late" = shipped >30 days after order).

    The correlated EXISTS is a left-semi join on the order key with the
    lateness predicate as an extra join condition — one shuffle, no
    per-row subquery."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ntz("1996-04-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l.l_shipdate) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                 AND TIMESTAMP '1997-12-31 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """Q7 volume shipping between two nations, by direction and year.

    Both nation dimensions are pre-filtered to the two-nation pair BEFORE
    touching the fact tables, so supplier and customer shrink to ~2/25 of
    their rows; the only big-big shuffle is lineitem ⋈ orders. The
    direction disjunction runs after both nation names are attached."""
    pair = ["NATION_1", "NATION_2"]
    n = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") <= ntz("1997-12-31 00:00:00"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n1.n_name AS nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
          JOIN region r   ON n2.n_regionkey = r.r_regionkey
          JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
            AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                  AND TIMESTAMP '1997-12-31 00:00:00') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """Q8 national market share (adapted to fixture nations/types): share of
    NATION_3 suppliers in PROMO-part revenue sold into ASIA, per year.

    8-table join where every dimension chain (part·type, region→nation→
    customer-membership, supplier→nation) is filtered then broadcast; the
    fact side shuffles once on l_orderkey ⋈ o_orderkey."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = t(spark, sf_dir, "nation")
    n2 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .select("c_custkey")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") <= ntz("1997-12-31 00:00:00"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
)
def q_tpch_q12(spark, sf_dir):
    """Q12 shipping-priority audit (adapted: no l_shipmode in the fixture, so
    the group key is l_linestatus and "late" = shipped >60 days after order).

    Conditional counts ride the single fact-fact shuffle; the lateness
    predicate is a non-equi residual on the hash join."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1997-01-01 00:00:00"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark, sf_dir):
    """Q13 customer order-count distribution (adapted: the excluded-comment
    predicate becomes an order-priority exclusion).

    Two-level aggregate: the left join keeps zero-order customers (their
    count(o_orderkey)=0 bucket is the point of the query); the second
    aggregate is over ≤ a few dozen distinct counts, so it collapses to a
    near-free final exchange."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark, sf_dir):
    """Q15 top supplier by quarterly revenue.

    The scalar max is a 1-row aggregate of the (already tiny, |suppliers|-row)
    revenue relation, broadcast back as a cross join — no window-over-
    unpartitioned-data, no second scan of lineitem."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ntz("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue (adapted: p_container → p_size filter).

    The correlated per-part average decorrelates to one aggregate over the
    qualifying parts' lines: semi-join lineitem to the filtered part set
    FIRST (the avg over a part's lines is unchanged by a filter on part
    attributes), then self-join the per-part thresholds back. Both sides of
    the self-join are already restricted to ~1/250 of lineitem."""
    p = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
)
def q_tpch_q21(spark, sf_dir):
    """Q21 suppliers who kept waiting (adapted lateness = shipped >60 days
    after the order date, status-F orders, one nation).

    Spark-first decorrelation: instead of EXISTS/NOT-EXISTS per row, the
    per-order supplier stats (distinct suppliers, distinct late suppliers)
    come from one (order, supplier)-level aggregate followed by an
    order-level one — a qualifying order has ≥2 suppliers and exactly 1
    late one, and late lines of qualifying orders are attributed to that
    single late supplier. The two-level aggregate is deliberate: a double
    countDistinct would plan as an Expand (gid) that doubles the rows in
    the widest shuffle. Every shuffle in the plan keys on l_orderkey (or
    its (orderkey, suppkey) refinement), versus four correlated-subquery
    scans in the literal translation."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late"),
    )
    qual = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)).select(
        "l_orderkey"
    )
    n1 = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == n1.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("is_late"))
        .join(qual, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q_tpch_q22(spark, sf_dir):
    """Q22 global sales opportunity (adapted: no c_phone in the fixture, so
    the group key is the customer's nation, and "inactive" = no order since
    1999 — every fixture customer has SOME order, making the literal
    never-ordered predicate vacuous).

    The scalar average broadcasts as a 1-row cross join; the NOT EXISTS is
    a left-anti join against date-pre-filtered orders (filter pushed below
    the anti join, so the probe side shrinks before the shuffle)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= ntz("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Derived partsupp (TPC-H Q2/Q9/Q11/Q16/Q20)
#
# The fixture set ships no partsupp table (FIXTURES.md), so the five
# composites that need it derive one as a PURE deterministic function of
# part × count(supplier), using integer-only arithmetic that evaluates
# bit-identically in Spark and DuckDB:
#
#   for i in 0..3:                       # 4 suppliers per part, like TPC-H
#     ps_partkey   = p_partkey
#     ps_suppkey   = (p_partkey + i*(S DIV 4 + 1)) % S     # S = |supplier|
#     ps_availqty  = (p_partkey*7  + i*13) % 9999 + 1
#     cost_cents   = (p_partkey*31 + i*17) % 20000 + 100   # exact integer
#     ps_supplycost = cost_cents / 100.0                   # same bits both engines
#
# Keys are dense and 0-based in the fixtures (verified), so the modulo hits
# real suppliers; the 4 suppkeys per part are distinct because the stride
# (S DIV 4 + 1) never divides S for S >= 4. Where a query filters part, the
# Spark side derives partsupp FROM THE FILTERED part (derivation is
# per-part-row, so this is semantically identical and turns the part join
# into a map-only projection).
#
# Scale: the derivation is a projection over part with two 1-row/4-row
# broadcasts — no shuffle, no skew; it would be generated on the fly at any
# scale rather than materialized.
# ---------------------------------------------------------------------------

PARTSUPP_SQL = """
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + r.i * ((sc.s_cnt // 4) + 1)) % sc.s_cnt AS ps_suppkey,
             (p_partkey * 7 + r.i * 13) % 9999 + 1 AS ps_availqty,
             (p_partkey * 31 + r.i * 17) % 20000 + 100 AS ps_cost_cents,
             ((p_partkey * 31 + r.i * 17) % 20000 + 100) / 100.0 AS ps_supplycost,
             p_brand, p_type, p_size, p_name
      FROM part
      CROSS JOIN range(4) AS r(i)
      CROSS JOIN (SELECT count(*) AS s_cnt FROM supplier) sc
    )
"""


def _partsupp(spark, sf_dir, part_df=None):
    """Derived partsupp DataFrame (see module comment). ``part_df`` lets a
    caller derive from a pre-filtered part — map-only, no join."""
    part = part_df if part_df is not None else t(spark, sf_dir, "part")
    s_cnt = t(spark, sf_dir, "supplier").agg(F.count("*").alias("s_cnt"))
    i_df = spark.range(4).select(F.col("id").alias("i"))
    pk = F.col("p_partkey")
    cents = (pk * 31 + F.col("i") * 17) % 20000 + 100
    return (
        part.crossJoin(F.broadcast(i_df))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            pk.alias("ps_partkey"),
            ((pk + F.col("i") * (F.expr("s_cnt DIV 4") + F.lit(1))) % F.col("s_cnt")).alias(
                "ps_suppkey"
            ),
            ((pk * 7 + F.col("i") * 13) % 9999 + 1).alias("ps_availqty"),
            cents.alias("ps_cost_cents"),
            (cents / F.lit(100.0)).alias("ps_supplycost"),
            "p_brand", "p_type", "p_size", "p_name",
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey, ps.p_brand,
           round(ps.ps_supplycost, 4) AS supplycost
    FROM partsupp ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region rg  ON n.n_regionkey = rg.r_regionkey
    WHERE ps.p_size = 15 AND ps.p_type = 'STANDARD' AND rg.r_name = 'ASIA'
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region rg2  ON n2.n_regionkey = rg2.r_regionkey
        WHERE ps2.ps_partkey = ps.ps_partkey AND rg2.r_name = 'ASIA')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, ps.ps_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf_dir):
    """Q2 minimum-cost supplier (adapted: fixture part has no p_mfgr and
    supplier no s_address/s_phone/s_comment, so the output carries p_brand
    and drops the address columns; p_type is a single word, so an exact
    match replaces LIKE '%BRASS').

    The correlated min-cost subquery is decorrelated into a groupBy(min)
    over the SAME region-filtered partsupp, joined back on
    (partkey, cost == min) — cost values are bit-identical doubles by
    construction, so the equality is exact. partsupp derives from the
    size/type-filtered part (map-only); the supplier→nation→region chain is
    a broadcast. Sort keys (s_name, ps_partkey) make LIMIT deterministic."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    ps = _partsupp(spark, sf_dir, part)
    rg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = t(spark, sf_dir, "nation")
    nr = n.join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s = t(spark, sf_dir, "supplier")
    sn = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    asia = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey)
    min_cost = asia.groupBy(F.col("ps_partkey").alias("_mk")).agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    return (
        asia.join(
            F.broadcast(min_cost),
            (asia.ps_partkey == min_cost._mk)
            & (asia.ps_supplycost == min_cost._min_cost),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "ps_partkey", "p_brand",
            r4(F.col("ps_supplycost")).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "ps_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost * l.l_quantity), 4) AS sum_profit
    FROM lineitem l
    JOIN partsupp ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE ps.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark, sf_dir):
    """Q9 product-type profit measure (p_name LIKE '%red%' — fixture names
    are '<color> <noun>', so color predicates select ~1/9 of parts).

    partsupp derives from the red-filtered part, so lineitem's join
    partner is already pruned before the (l_partkey, l_suppkey) shuffle —
    the one big shuffle; orders joins on the orderkey shuffle; the
    supplier→nation side is a broadcast. Profit uses ps_supplycost doubles
    that are bit-identical across engines; the sum is rounded to 4dp."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ps = _partsupp(spark, sf_dir, part).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(r4(F.sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH """ + PARTSUPP_SQL + """,
    nation_ps AS (
      SELECT ps.ps_partkey,
             ps.ps_cost_cents * ps.ps_availqty AS value_cents
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey,
           round(CAST(sum(value_cents) AS BIGINT) / 100.0, 4) AS value
    FROM nation_ps
    GROUP BY ps_partkey
    HAVING CAST(sum(value_cents) AS BIGINT) * 1000
           > (SELECT CAST(sum(value_cents) AS BIGINT) FROM nation_ps) * 2
    ORDER BY value DESC, ps_partkey
    """,
)
def q_tpch_q11(spark, sf_dir):
    """Q11 important stock identification (nation pinned to NATION_7;
    fraction 0.002).

    The HAVING threshold compares INTEGER cents on both sides
    (sum_cents * 1000 > total_cents * 2) so no float rounding can flip a
    borderline group between engines — the only doubles are in the final
    display division. partsupp joins the nation-filtered supplier set by
    broadcast, groups on ps_partkey (one shuffle), and the grand total is a
    1-row broadcast cross join."""
    ps = _partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7").select(
        "n_nationkey"
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    nation_ps = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
    )
    grp = nation_ps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("_sum_cents")
    )
    total = grp.agg(F.sum("_sum_cents").alias("_total_cents"))
    return (
        grp.crossJoin(F.broadcast(total))
        .filter(F.col("_sum_cents") * 1000 > F.col("_total_cents") * 2)
        .select(
            "ps_partkey",
            F.round(F.col("_sum_cents") / 100.0, 4).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 5, 9, 15, 25, 35, 45, 50)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """Q16 parts/supplier relationship (adapted: fixture supplier has no
    s_comment, so the 'Customer Complaints' exclusion is dropped; p_type is
    a single word, so NOT LIKE 'MEDIUM POLISHED%' becomes <> 'MEDIUM').

    partsupp derives from the brand/type/size-filtered part (map-only);
    the countDistinct shuffles once on the 3-column group key."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 5, 9, 15, 25, 35, 45, 50)
    )
    ps = _partsupp(spark, sf_dir, part)
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH """ + PARTSUPP_SQL + """
    SELECT s.s_name, round(s.s_acctbal, 4) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.p_name LIKE 'red%'
          AND ps.ps_availqty > (
            SELECT 0.5 * sum(l.l_quantity)
            FROM lineitem l
            WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
    ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark, sf_dir):
    """Q20 potential part promotion (adapted: no s_address in the fixture,
    so the output carries s_acctbal; 'forest%' becomes 'red%' against the
    fixture's '<color> <noun>' names; nation pinned to NATION_3).

    The correlated half-year-demand subquery decorrelates into a lineitem
    pre-aggregate keyed on (l_partkey, l_suppkey) — lineitem's only
    shuffle; partsupp (derived from red parts, map-only) inner-joins that
    aggregate, filters on availqty > 0.5*qty (sums of whole-number doubles,
    exact in both engines), and the surviving suppkeys semi-join the
    nation-filtered supplier broadcast side."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    ps = _partsupp(spark, sf_dir, part).select(
        "ps_partkey", "ps_suppkey", "ps_availqty"
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < ntz("1998-01-01 00:00:00"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
    )
    excess = (
        ps.join(
            li,
            (ps.ps_partkey == li.l_partkey) & (ps.ps_suppkey == li.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select(
        "n_nationkey"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(excess), s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", r4(F.col("s_acctbal")).alias("s_acctbal"))
        .orderBy("s_name")
    )

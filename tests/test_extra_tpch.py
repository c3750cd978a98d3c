"""Extra TPC-H-shaped relational coverage beyond the 50-entry driver
registry (the registry is capped; these run the same DuckDB-oracle
comparison at pytest level via tests/oracle_harness.compare).

Shapes: Q4 (EXISTS semi-join + count), Q7 (two-nation volume flow,
multi-join + derived year), Q18 (HAVING over a grouped subquery feeding
an IN filter).  Date literals sit inside the fixture ranges
(shipdate 1995-01→2001-11, orderdate 1995-01→2001-08).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.01"


def _tables(spark):
    from dbc_informed_socketcan_to_parquet_spark.session import load_tables

    return load_tables(spark, SF)


def test_q4_order_priority_exists(spark):
    t = _tables(spark)
    li, orders = t["lineitem"], t["orders"]
    # the fixture lineitem has no commit/receipt dates; use the same EXISTS
    # shape over a high-discount line predicate instead
    late = li.filter(F.col("l_discount") > 0.09).select("l_orderkey").distinct()
    got = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )
    sql = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
    GROUP BY o_orderpriority
    """
    rep = compare("q4", got, duck_connection(SF), sql)
    assert rep["status"] == "OK", rep


def test_q7_volume_shipping(spark):
    t = _tables(spark)
    li, orders, cust, supp, nation = (
        t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"],
    )
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    got = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            # order-independent: exact decimal accumulation, double at the end
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)")
                 * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")).cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )
    sql = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name != n2.n_name
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    GROUP BY 1, 2, 3
    """
    rep = compare("q7", got, duck_connection(SF), sql)
    assert rep["status"] == "OK", rep


def test_q18_large_volume_customers(spark):
    t = _tables(spark)
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    got = (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li.groupBy("l_orderkey").agg(F.sum("l_quantity").cast("double").alias("total_qty")),
              orders.o_orderkey == F.col("l_orderkey"))
        .select(
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )
    sql = """
    SELECT c_name, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(tq.total_qty AS DOUBLE) AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1) tq ON o_orderkey = tq.l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    """
    rep = compare("q18", got, duck_connection(SF), sql)
    assert rep["status"] == "OK", rep

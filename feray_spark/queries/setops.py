"""Set operations (SURVEY §2.7 U1-U4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.queries import register


@register(
    "u1_union_all",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000
    """,
    tags=("setop", "U1"),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bag union by name (overlapping rows appear twice)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@register(
    "u1b_union_diagonal",
    oracle="""
        SELECT r_regionkey AS key, r_name AS name, NULL AS extra FROM region
        UNION ALL
        SELECT n_nationkey AS key, n_name AS name, CAST(n_regionkey AS INT)
            AS extra FROM nation
    """,
    tags=("setop", "U1"),
)
def u1b_union_diagonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: schema-aligning union (polars concat how="diagonal") —
    missing columns null-filled via allowMissingColumns."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    a = r.select(F.col("r_regionkey").alias("key"), F.col("r_name").alias("name"))
    b = n.select(
        F.col("n_nationkey").alias("key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("extra"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "u2_union_distinct",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    tags=("setop", "U2"),
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set union (union + distinct)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.union(b).distinct()


@register(
    "u3_intersect",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    tags=("setop", "U3"),
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set intersection."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    return a.intersect(b)


@register(
    "u4_except",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 1000
    """,
    tags=("setop", "U4"),
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: set difference."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 1000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return o.subtract(c)


@register(
    "u4b_except_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
          AND l_returnflag = 'R' AND l_linenumber = 1
    """,
    tags=("setop", "U4"),
)
def u4b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: bag difference (multiplicity-preserving)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    b = li.filter(
        (F.col("l_linestatus") == "F")
        & (F.col("l_returnflag") == "R")
        & (F.col("l_linenumber") == 1)
    ).select("l_orderkey")
    return a.exceptAll(b)

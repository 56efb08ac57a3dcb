"""Declared correctness queries Q01–Q18 (SURVEY.md §2.5).

Each function takes (spark, sf_dir) and returns a DataFrame; ORACLE holds
the DuckDB-equivalent ANSI SQL. Column names are aliased identically on
both sides (the driver's compare sorts columns by name before hashing).

Conventions (FIXTURES.md): session timezone pinned to UTC; every query has
a canonical ORDER BY; aggregate columns explicitly aliased; rank/count
columns cast to bigint on the Spark side where Spark's default type is
int (DuckDB window/count functions return BIGINT).

Scale notes are inline: these run unchanged on a cluster; the plans rely
on pushdown + partial aggregation + AQE join selection rather than any
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.operators import core as ops
from tez_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- step 1: scan → filter → project -------------------------------------

def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter (FilterByWordInputProcessor.java:138). LIKE pushes to scan."""
    docs = _t(spark, sf_dir, "documents")
    out = ops.project(
        ops.filter_rows(docs, F.col("text").like("%data%")), "doc_id", "n_chars"
    )
    return out.orderBy("doc_id")


def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed column (ForwardingProcessor,
    HashJoinExample.java:269-300)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    return out.orderBy("l_orderkey", "net")


# --- step 2: flatMap + aggregation ----------------------------------------

def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops.flat_map_tokens(docs, "text", out_col="word")


def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount (TokenProcessor+SumProcessor, WordCount.java:74-139).
    explode+split stays in codegen; partial agg = the combiner."""
    return ops.count_by(_words(spark, sf_dir), "word", out="c").orderBy("word")


def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OrderedWordCount (OrderedWordCount.java:70-168): agg → global order.
    Spark range-partitions the sort — no parallelism-1 final vertex."""
    return ops.count_by(_words(spark, sf_dir), "word", out="c").orderBy(
        F.desc("c"), "word"
    )


def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-function hash aggregation, TPC-H Q1 shape (SumProcessor +
    combiner, TezRuntimeConfiguration.java:231)."""
    li = _t(spark, sf_dir, "lineitem")
    out = ops.aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    return ops.bounded_sort(out, "l_returnflag", "l_linestatus")


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-distinct (grouped-reader dedup semantics, ValuesIterator.java:45)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(F.countDistinct("o_custkey").alias("n_cust"))


# --- step 3: joins ----------------------------------------------------------

def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repartition inner join (HashJoinExample.java:143-264). customer is
    small → AQE converts to broadcast at run time; at 100TB both sides
    shuffle on the key (sort-merge)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = ops.hash_join(orders, cust, orders.o_custkey == cust.c_custkey)
    return ops.bounded_sort(ops.count_by(j, "c_mktsegment", out="n"), "c_mktsegment")


def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join (HashJoinExample.java:218-240): nation (25 rows) ships
    whole to every task — zero shuffle of supplier."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    j = ops.broadcast_join(sup, nation, sup.s_nationkey == nation.n_nationkey)
    return ops.bounded_sort(ops.count_by(j, "n_name", out="n"), "n_name")


def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge join large⋈large (SortMergeJoinProcessor,
    SortMergeJoinExample.java:244-313).

    Declared as a plain join: at 100TB Catalyst picks SortMergeJoinExec for
    two large inputs on its own; at bench scale AQE converts it to broadcast
    — forcing a merge hint here would pessimize small scales for no parity
    gain (the explicit sort_merge_join operator is tested separately)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = ops.hash_join(li, orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .transform(lambda d: ops.bounded_sort(d, "o_orderpriority"))
    )


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join — HashJoinProcessor's actual semantics
    (HashJoinExample.java:307-345)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    j = ops.semi_join(li, part, li.l_partkey == part.p_partkey)
    return j.agg(F.count(F.lit(1)).alias("n"))


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join / join validation (JoinValidate.java:151-181)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = ops.anti_join(orders, li, orders.o_orderkey == li.l_orderkey)
    return j.agg(F.count(F.lit(1)).alias("n"))


# --- step 4: cartesian, union, multi-stage ---------------------------------

def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian + theta filter (CartesianProduct.java:151-199,
    CartesianProductFilter.java)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    out = ops.cross_join(
        region, nation, F.col("n_regionkey") != F.col("r_regionkey")
    ).select("r_name", "n_name")
    return ops.bounded_sort(out, "r_name", "n_name")


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all + agg (VertexGroup/GroupInputEdge, UnionExample.java:208-224)."""
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    u = ops.union_all(orders, cust)
    return ops.count_by(u, "k", out="n").orderBy("k").limit(100)


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage MRR chain (MRRSleepJob.java; YARNRunner.java:479):
    two groupBys — Catalyst reuses the first shuffle's partitioning for
    the second agg (o_orderpriority ⊂ first grouping is a re-shuffle, but
    partial aggregation keeps it tiny)."""
    orders = _t(spark, sf_dir, "orders")
    inner = orders.groupBy(
        F.col("o_orderpriority").alias("pri"), "o_custkey"
    ).agg(F.count(F.lit(1)).alias("c"))
    return ops.bounded_sort(ops.count_by(inner, "pri", out="n"), "pri")


# --- step 5: sorts ----------------------------------------------------------

def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (Sort.java:102-170). TakeOrderedAndProject:
    per-partition top-k then merge — no full sort at scale."""
    orders = _t(spark, sf_dir, "orders")
    return ops.top_k(
        orders.select("o_orderkey", "o_totalprice"),
        1000,
        F.desc("o_totalprice"),
        "o_orderkey",
    )


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group = secondary sort (SecondarySort.java:54-148)."""
    orders = _t(spark, sf_dir, "orders")
    ranked = ops.top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )
    return ranked.orderBy("o_custkey", "rn").limit(500)


# --- step 6: runtime-parity features ----------------------------------------

def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over events (batch windowing; the
    streaming twin lives in tez_spark.streaming)."""
    ev = _t(spark, sf_dir, "events")
    out = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    # orderBy, not bounded_sort: hour x event_type rows grow with the
    # stream's time span — span-scaled, not group-bounded (ADVICE r7).
    return ops.global_sort(out, "h", "event_type")


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant join (FairShuffleVertexManager motivation,
    FairShuffleVertexManager.java:113-130): user_id is skewed; AQE
    skewJoin splits oversized partitions at run time."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    j = ev.join(cust, ev.user_id % 1000 == cust.c_custkey % 1000)
    return ops.bounded_sort(ops.count_by(j, "event_type", out="n"), "event_type")


# --- oracle SQL (DuckDB) ------------------------------------------------------

ORACLE: dict[str, str] = {
    "q01": """
        SELECT doc_id, n_chars FROM documents
        WHERE text LIKE '%data%' ORDER BY doc_id
    """,
    "q02": """
        SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net
        FROM lineitem ORDER BY l_orderkey, net
    """,
    "q03": """
        SELECT word, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word ORDER BY word
    """,
    "q04": """
        SELECT word, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word ORDER BY c DESC, word
    """,
    "q05": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_price,
               AVG(l_discount) AS avg_disc,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q06": """
        SELECT c.c_mktsegment, COUNT(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 1
    """,
    "q07": """
        SELECT n.n_name, COUNT(*) AS n
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "q08": """
        SELECT o.o_orderpriority, SUM(l.l_quantity) AS sum_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "q09": """
        SELECT COUNT(*) AS n FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
    "q10": """
        SELECT COUNT(*) AS n FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    "q11": """
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
        WHERE n.n_regionkey <> r.r_regionkey ORDER BY 1, 2
    """,
    "q12": """
        SELECT k, COUNT(*) AS n
        FROM (SELECT o_custkey AS k FROM orders
              UNION ALL SELECT c_custkey AS k FROM customer)
        GROUP BY k ORDER BY k LIMIT 100
    """,
    "q13": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
    "q14": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 500
    """,
    "q15": "SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders",
    "q16": """
        SELECT pri, COUNT(*) AS n FROM (
            SELECT o_orderpriority AS pri, o_custkey, COUNT(*) AS c
            FROM orders GROUP BY 1, 2)
        GROUP BY 1 ORDER BY 1
    """,
    "q17": """
        SELECT date_trunc('hour', ts) AS h, event_type,
               COUNT(*) AS n, SUM(value) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q18": """
        SELECT e.event_type, COUNT(*) AS n
        FROM events e JOIN customer c ON e.user_id % 1000 = c.c_custkey % 1000
        GROUP BY 1 ORDER BY 1
    """,
}

QUERIES = {
    "q01": q01, "q02": q02, "q03": q03, "q04": q04, "q05": q05,
    "q06": q06, "q07": q07, "q08": q08, "q09": q09, "q10": q10,
    "q11": q11, "q12": q12, "q13": q13, "q14": q14, "q15": q15,
    "q16": q16, "q17": q17, "q18": q18,
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Encoding, Fanouts}

/** Core queries: the reference's data-prep pipeline re-expressed as
  * declarative DataFrame plans (SURVEY.md §2 rows 1-8).
  *
  * Oracle-parity conventions (driver hashes values after sorting columns
  * by name): every computed column is aliased identically here and in the
  * SQL; double-summing aggregates go through DECIMAL(38,6) so the result
  * is exact and independent of partition/accumulation order, then cast
  * back to double.
  */
object QueriesCore {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")

  /** TPC-H Q1-style flagship aggregation. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** FK value counts (datasets.py:113). */
  def fkCountQ(spark: SparkSession, dir: String): DataFrame =
    Fanouts
      .fkCount(Tables(spark, dir, "orders"), "o_custkey")
      .orderBy(col("o_custkey"))

  val fkCountSql: String =
    "SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey ORDER BY o_custkey"

  /** Fanout outer-joined onto the PK table, missing → 1. */
  def adjFanoutQ(spark: SparkSession, dir: String): DataFrame =
    Fanouts
      .adjFanout(
        Tables(spark, dir, "customer"), "c_custkey",
        Tables(spark, dir, "orders"), "o_custkey",
        "adj_fanout")
      .select(col("c_custkey"), col("adj_fanout"))
      .orderBy(col("c_custkey"))

  val adjFanoutSql: String =
    """SELECT c.c_custkey, COALESCE(f.cnt, 1) AS adj_fanout
      |FROM customer c
      |LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) f
      |  ON c.c_custkey = f.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  /** Bottom-up weight over customer←orders←lineitem rooted at customer
    * (datasets.py:296-357): weight(customer) = Σ over its orders of
    * (lineitem count per order, missing → 1), missing orders → 1.
    */
  def fanoutWeightQ(spark: SparkSession, dir: String): DataFrame = {
    val chain = Subschema(
      "chain", "customer",
      Seq(
        FkEdge("customer", "c_custkey", "orders", "o_custkey"),
        FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey"))
    )
    Fanouts
      .weighted(chain, "customer", Fanouts.loader(spark, dir))
      .select(col("c_custkey"), col("__weight__").as("weight"))
      .orderBy(col("c_custkey"))
  }

  val fanoutWeightSql: String =
    """SELECT c.c_custkey,
      |  CAST(COALESCE(ow.w, 1) AS BIGINT) AS weight
      |FROM customer c
      |LEFT JOIN (
      |  SELECT o.o_custkey, SUM(COALESCE(lw.cnt, 1)) AS w
      |  FROM orders o
      |  LEFT JOIN (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) lw
      |    ON o.o_orderkey = lw.l_orderkey
      |  GROUP BY o.o_custkey) ow
      |  ON c.c_custkey = ow.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  /** Universal-relation size: the reference's OTHER partitioning mode
    * (UR = one padded full outer join of the whole schema vs per-table
    * CIN subschemas; scardina/schema.py builds either). Each table joins
    * exactly once along a spanning tree of the FK graph — nation/region
    * enter via the customer path, matching the join-each-table-once UR
    * construction. Full joins can't broadcast; this is a chain of
    * sort-merge joins, each co-partitioned on its key — one shuffle per
    * edge, the unavoidable minimum for padded joins.
    */
  /** Universal-relation size by aggregation algebra, not by building the
    * join: every hop of the reference's UR spanning tree lands on a
    * unique-PK side, so each chained full join preserves existing rows
    * 1:1 and only ADDS the dim rows whose key no upstream row carries —
    * ur = |lineitem| + Σ unreferenced-dim counts. Each addend is a tiny
    * anti-join against a distinct-FK frame; the 7-table outer-join
    * shuffle the naive plan pays (the whole UR!) never happens. The
    * oracle still counts the literal FULL JOIN chain — equality is the
    * correctness statement. (Spec cross-checks the algebra against the
    * materialized join, including padding in both directions.)
    */
  def urSizeQ(spark: SparkSession, dir: String): DataFrame = {
    val load = Fanouts.loader(spark, dir)
    def adds(dim: String, dimKey: String, src: DataFrame, srcKey: String, a: String) =
      load(dim)
        .join(
          src.select(col(srcKey)).filter(col(srcKey).isNotNull).distinct(),
          col(dimKey) === col(srcKey), "left_anti")
        .agg(count(lit(1)).as(a))
    val li = load("lineitem")
    val o = load("orders")
    val c = load("customer")
    val n = load("nation")
    li.agg(count(lit(1)).as("__base"))
      .crossJoin(adds("orders", "o_orderkey", li, "l_orderkey", "__a1"))
      .crossJoin(adds("customer", "c_custkey", o, "o_custkey", "__a2"))
      .crossJoin(adds("nation", "n_nationkey", c, "c_nationkey", "__a3"))
      .crossJoin(adds("region", "r_regionkey", n, "n_regionkey", "__a4"))
      .crossJoin(adds("part", "p_partkey", li, "l_partkey", "__a5"))
      .crossJoin(adds("supplier", "s_suppkey", li, "l_suppkey", "__a6"))
      .select(
        lit("ur").as("name"),
        (col("__base") + col("__a1") + col("__a2") + col("__a3") +
          col("__a4") + col("__a5") + col("__a6")).as("size"))
  }

  val urSizeSql: String =
    """SELECT 'ur' AS name, COUNT(*) AS size
      |FROM lineitem
      |FULL JOIN orders ON l_orderkey = o_orderkey
      |FULL JOIN customer ON o_custkey = c_custkey
      |FULL JOIN nation ON c_nationkey = n_nationkey
      |FULL JOIN region ON n_regionkey = r_regionkey
      |FULL JOIN part ON l_partkey = p_partkey
      |FULL JOIN supplier ON l_suppkey = s_suppkey""".stripMargin

  /** Full-outer-join sizes of every CIN subschema (schema.py:85-183),
    * through the add-only count algebra where the subschema shape allows
    * (all five do: FK center → unique-PK dims) — see urSizeQ.
    */
  def subschemaSizesQ(spark: SparkSession, dir: String): DataFrame = {
    val load = Fanouts.loader(spark, dir)
    SchemaGraph.tpch.cinSubschemas
      .map(sub =>
        Fanouts.subschemaSizeFast(sub, load)
          .getOrElse(Fanouts.subschemaSize(sub, load))
          .select(lit(sub.name).as("name"), col("size")))
      .reduce(_.unionAll(_))
      .orderBy(col("name"))
  }

  val subschemaSizesSql: String =
    """SELECT 'customer:c_nationkey=nation.n_nationkey' AS name, COUNT(*) AS size
      |  FROM customer FULL JOIN nation ON c_nationkey = n_nationkey
      |UNION ALL
      |SELECT 'lineitem:l_orderkey=orders.o_orderkey:l_partkey=part.p_partkey:l_suppkey=supplier.s_suppkey', COUNT(*)
      |  FROM lineitem
      |  FULL JOIN orders ON l_orderkey = o_orderkey
      |  FULL JOIN part ON l_partkey = p_partkey
      |  FULL JOIN supplier ON l_suppkey = s_suppkey
      |UNION ALL
      |SELECT 'nation:n_regionkey=region.r_regionkey', COUNT(*)
      |  FROM nation FULL JOIN region ON n_regionkey = r_regionkey
      |UNION ALL
      |SELECT 'orders:o_custkey=customer.c_custkey', COUNT(*)
      |  FROM orders FULL JOIN customer ON o_custkey = c_custkey
      |UNION ALL
      |SELECT 'supplier:s_nationkey=nation.n_nationkey', COUNT(*)
      |  FROM supplier FULL JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY name""".stripMargin

  /** Sorted distinct non-null values for representative columns. */
  def distinctValsQ(spark: SparkSession, dir: String): DataFrame = {
    def one(t: String, c: String) =
      Encoding
        .distinctVals(Tables(spark, dir, t), c)
        .select(lit(s"$t.$c").as("col_name"), col(c).cast("string").as("val"))
    one("lineitem", "l_returnflag")
      .unionAll(one("orders", "o_orderpriority"))
      .unionAll(one("customer", "c_mktsegment"))
      .orderBy(col("col_name"), col("val"))
  }

  val distinctValsSql: String =
    """SELECT 'lineitem.l_returnflag' AS col_name, CAST(l_returnflag AS VARCHAR) AS val
      |  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 2
      |UNION ALL
      |SELECT 'orders.o_orderpriority', CAST(o_orderpriority AS VARCHAR)
      |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 2
      |UNION ALL
      |SELECT 'customer.c_mktsegment', CAST(c_mktsegment AS VARCHAR)
      |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 2
      |ORDER BY col_name, val""".stripMargin

  /** Dictionary codes with the reference's 0=MASK / 1=NULL reservation. */
  def dictEncodeQ(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val enc1 = Encoding.dictEncode(o, "o_orderpriority", "pr_code")
    val enc2 = Encoding.dictEncode(enc1, "o_orderstatus", "st_code")
    enc2.select(col("o_orderkey"), col("pr_code"), col("st_code"))
      .orderBy(col("o_orderkey"))
  }

  val dictEncodeSql: String =
    """SELECT o_orderkey,
      |  CAST(1 + DENSE_RANK() OVER (ORDER BY o_orderpriority) AS INTEGER) AS pr_code,
      |  CAST(1 + DENSE_RANK() OVER (ORDER BY o_orderstatus) AS INTEGER) AS st_code
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Bit-sliced factorization of the l_partkey dictionary code
    * (common.py:137-196), long format, threshold = 6 bits.
    */
  def factorizeQ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val enc = Encoding.dictEncode(li, "l_partkey", "code")
    Encoding
      .factorize(enc, "code", Seq("l_orderkey", "l_linenumber"), threshold = 6)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("fact_idx"))
  }

  val factorizeSql: String =
    """WITH enc AS (
      |  SELECT l_orderkey, l_linenumber,
      |         1 + DENSE_RANK() OVER (ORDER BY l_partkey) AS code
      |  FROM lineitem
      |), sz AS (
      |  SELECT MAX(code) + 1 AS ds, LENGTH(bin(MAX(code) + 1)) AS bl,
      |         CAST(CEIL(LENGTH(bin(MAX(code) + 1)) / 6.0) AS INT) AS n
      |  FROM enc
      |), ex AS (
      |  SELECT enc.l_orderkey, enc.l_linenumber, enc.code, sz.bl, sz.n,
      |         UNNEST(range(0, CAST(sz.n AS BIGINT))) AS fact_idx
      |  FROM enc, sz
      |), geom AS (
      |  SELECT l_orderkey, l_linenumber, code, fact_idx,
      |         CAST(FLOOR(bl * 1.0 / n) AS INT) AS base,
      |         bl - CAST(FLOOR(bl * 1.0 / n) AS INT) * n AS rem
      |  FROM ex
      |)
      |SELECT l_orderkey, l_linenumber, CAST(fact_idx AS INT) AS fact_idx,
      |  CAST(CAST(FLOOR(code / POWER(2, base * fact_idx + LEAST(fact_idx, rem))) AS BIGINT)
      |       % CAST(POWER(2, base + CASE WHEN fact_idx < rem THEN 1 ELSE 0 END) AS BIGINT)
      |       + 1 AS INT) AS scol_code
      |FROM geom
      |ORDER BY l_orderkey, l_linenumber, fact_idx""".stripMargin

  /** Skewed fact⋈dim join through the salted replicate plan
    * (operators.Skew.saltedJoin) — the oracle is the PLAIN join + agg:
    * salting must not change a single row.
    */
  def skewJoinQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew
      .saltedJoin(
        Tables(spark, dir, "lineitem"), Tables(spark, dir, "part"),
        "l_partkey", "p_partkey", buckets = 32)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("p_brand"))

  val skewJoinSql: String =
    """SELECT p_brand, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val zorderBits = 16
  val zorderBucketShift = 16

  /** Z-order layout summary of lineitem over (l_partkey, l_suppkey):
    * per z-bucket row counts and min/max key ranges — the file-level
    * stats a z-sorted writer would give a pruning reader.
    */
  def zorderLayoutQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Layout
      .zorderSummary(
        Tables(spark, dir, "lineitem"), "l_partkey", "l_suppkey",
        zorderBits, zorderBucketShift)
      .orderBy(col("bucket"))

  val zorderLayoutSql: String = {
    val z = graft.operators.Layout.zValueSql("l_partkey", "l_suppkey", zorderBits)
    s"""WITH z AS (SELECT l_partkey, l_suppkey, CAST($z AS BIGINT) AS z FROM lineitem)
       |SELECT z >> $zorderBucketShift AS bucket, COUNT(*) AS cnt,
       |  MIN(l_partkey) AS min_l_partkey, MAX(l_partkey) AS max_l_partkey,
       |  MIN(l_suppkey) AS min_l_suppkey, MAX(l_suppkey) AS max_l_suppkey,
       |  MIN(z) AS z_lo, MAX(z) AS z_hi
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "skew_join" -> (skewJoinQ _),
    "zorder_layout" -> (zorderLayoutQ _),
    "fk_count" -> (fkCountQ _),
    "adj_fanout" -> (adjFanoutQ _),
    "fanout_weight" -> (fanoutWeightQ _),
    "subschema_sizes" -> (subschemaSizesQ _),
    "ur_size" -> (urSizeQ _),
    "distinct_vals" -> (distinctValsQ _),
    "dict_encode" -> (dictEncodeQ _),
    "factorize" -> (factorizeQ _)
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "skew_join" -> skewJoinSql,
    "zorder_layout" -> zorderLayoutSql,
    "fk_count" -> fkCountSql,
    "adj_fanout" -> adjFanoutSql,
    "fanout_weight" -> fanoutWeightSql,
    "subschema_sizes" -> subschemaSizesSql,
    "ur_size" -> urSizeSql,
    "distinct_vals" -> distinctValsSql,
    "dict_encode" -> dictEncodeSql,
    "factorize" -> factorizeSql
  )
}

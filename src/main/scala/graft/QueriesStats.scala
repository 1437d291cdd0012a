package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Stats / sketch queries (SURVEY.md §2 rows 15-18). Oracle SQL is
  * generated from the same column specs the Spark side iterates.
  */
object QueriesStats {

  /** (table, column, isNumeric) */
  val statCols: Seq[(String, String, Boolean)] = Seq(
    ("lineitem", "l_quantity", true),
    ("lineitem", "l_returnflag", false),
    ("orders", "o_totalprice", true),
    ("orders", "o_custkey", true),
    ("customer", "c_mktsegment", false),
    ("part", "p_size", true),
    ("events", "value", true),
    ("documents", "lang", false))

  def colStatsQ(spark: SparkSession, dir: String): DataFrame =
    statCols
      .map { case (t, c, num) =>
        Stats.colStats(Tables(spark, dir, t), c, num, s"$t.$c")
      }
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"))

  val colStatsSql: String =
    statCols
      .map { case (t, c, num) =>
        val (minNum, maxNum, minStr, maxStr) =
          if (num) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
        s"""SELECT '$t.$c' AS col_name, COUNT(*) AS cnt,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
           |  COUNT(DISTINCT $c) AS ndv,
           |  $minNum AS min_num, $maxNum AS max_num,
           |  $minStr AS min_str, $maxStr AS max_str
           |FROM $t""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  val histCols: Seq[(String, String)] = Seq(
    ("lineitem", "l_extendedprice"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"))
  val histBins = 10

  def histogramQ(spark: SparkSession, dir: String): DataFrame =
    histCols
      .map { case (t, c) =>
        Stats.histogram(Tables(spark, dir, t), c, histBins, s"$t.$c")
      }
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"), col("bucket"))

  val histogramSql: String =
    histCols
      .map { case (t, c) =>
        s"""SELECT '$t.$c' AS col_name,
           |  LEAST(CAST(FLOOR((CAST($c AS DOUBLE) - mn) * $histBins.0 / (mx - mn)) AS BIGINT),
           |        ${histBins - 1}) AS bucket,
           |  COUNT(*) AS cnt
           |FROM $t, (SELECT CAST(MIN($c) AS DOUBLE) AS mn, CAST(MAX($c) AS DOUBLE) AS mx FROM $t)
           |GROUP BY 1, 2""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name, bucket")

  val mcvCols: Seq[(String, String, Int)] = Seq(
    ("orders", "o_orderpriority", 5),
    ("customer", "c_mktsegment", 5),
    ("part", "p_brand", 8))

  def mcvQ(spark: SparkSession, dir: String): DataFrame =
    mcvCols
      .map { case (t, c, k) =>
        Stats.mcv(Tables(spark, dir, t), c, k, s"$t.$c")
      }
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"), col("rnk"))

  val mcvSql: String =
    mcvCols
      .map { case (t, c, k) =>
        s"""SELECT * FROM (
           |  SELECT '$t.$c' AS col_name, CAST($c AS VARCHAR) AS val, COUNT(*) AS cnt,
           |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, CAST($c AS VARCHAR)) AS INTEGER) AS rnk
           |  FROM $t WHERE $c IS NOT NULL GROUP BY $c
           |) WHERE rnk <= $k""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name, rnk")

  // ---- row 18b: count-min sketch (portable md5 hash family) ----

  /** depth 4 × width 256; probe partkeys 1..20 exist at every SF. */
  val cmsDepth = 4
  val cmsProbes: Seq[Long] = 1L to 20L

  /** CMS frequency estimates vs true counts for the probe keys:
    * est(v) = min over sketch rows d of counter[d][bucket_d(v)] — always
    * ≥ the true count, equal when no collision. Probe buckets are md5'd
    * driver-side (20×4 constants); the counter build is the only data
    * pass.
    */
  def cmsFreqQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val counters = Stats.cmsCounters(li, "l_partkey", cmsDepth)
    val probeCells = cmsProbes
      .flatMap(v => (0 until cmsDepth).map(d => (v, d, Stats.cmsBucketOf(d, v.toString))))
      .toDF("partkey", "d", "bucket")
    // broadcast the BUILDABLE side: for a left-outer join only the right
    // side can be broadcast, and counters is bounded at depth×256 rows
    val est = probeCells
      .join(broadcast(counters), Seq("d", "bucket"), "left")
      .groupBy(col("partkey"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
    val tru = li
      .filter(col("l_partkey").isin(cmsProbes: _*))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("true_cnt"))
      .select(col("l_partkey").cast("long").as("partkey"), col("true_cnt"))
    est.join(tru, Seq("partkey"), "left")
      .select(
        col("partkey"), col("cms_cnt").cast("long").as("cms_cnt"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
      .orderBy(col("partkey"))
  }

  val cmsFreqSql: String = {
    def bucketSql(v: String): String =
      s"(strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 1, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 2, 1)) - 1)"
    s"""WITH depths AS (SELECT UNNEST([${(0 until cmsDepth).mkString(", ")}]) AS d),
       |counters AS (
       |  SELECT depths.d AS d, ${bucketSql("l_partkey")} AS bucket, COUNT(*) AS cnt
       |  FROM lineitem, depths
       |  GROUP BY 1, 2
       |),
       |probes AS (SELECT UNNEST([${cmsProbes.mkString(", ")}]) AS pk),
       |probe_cells AS (
       |  SELECT probes.pk, depths.d, ${bucketSql("probes.pk")} AS bucket
       |  FROM probes, depths
       |),
       |est AS (
       |  SELECT pc.pk, MIN(COALESCE(c.cnt, 0)) AS cms_cnt
       |  FROM probe_cells pc LEFT JOIN counters c ON pc.d = c.d AND pc.bucket = c.bucket
       |  GROUP BY pc.pk
       |),
       |tru AS (
       |  SELECT l_partkey AS pk, COUNT(*) AS true_cnt FROM lineitem
       |  WHERE l_partkey IN (SELECT pk FROM probes) GROUP BY 1
       |)
       |SELECT CAST(est.pk AS BIGINT) AS partkey, CAST(est.cms_cnt AS BIGINT) AS cms_cnt,
       |  CAST(COALESCE(tru.true_cnt, 0) AS BIGINT) AS true_cnt
       |FROM est LEFT JOIN tru ON est.pk = tru.pk
       |ORDER BY partkey""".stripMargin
  }

  val hllCols: Seq[(String, String)] = Seq(
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
    ("customer", "c_custkey"),
    ("events", "user_id"))

  def hllNdvQ(spark: SparkSession, dir: String): DataFrame =
    hllCols
      .map { case (t, c) => Stats.hllNdv(Tables(spark, dir, t), c, s"$t.$c") }
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"))

  // ---- row 18c: KMV (k-minimum-values) ndv sketch, portable ----

  /** Sketch size; estimate = (k−1)/u_k with u_k the k-th smallest
    * md5-derived uniform over the column's DISTINCT values — the
    * classic KMV estimator, built entirely from engine-portable pieces
    * (md5 → 52-bit integer), unlike HLL++ whose register layout is
    * implementation-specific.
    */
  val kmvK = 64

  def kmvNdvQ(spark: SparkSession, dir: String): DataFrame =
    hllCols
      .map { case (t, c) =>
        val hashed = Tables(spark, dir, t)
          .filter(col(c).isNotNull)
          .select(col(c).cast("string").as("v"))
          .distinct()
          .select(
            conv(substring(md5(concat(lit("kmv:"), col("v"))), 1, 13), 16, 10)
              .cast("long").as("h"))
        // partial-aggregated distinct + TakeOrdered(k): the shuffle
        // carries at most k hashes per partition, never the column
        val exact = Tables(spark, dir, t).agg(count_distinct(col(c)).as("exact_ndv"))
        hashed
          .orderBy(col("h")).limit(kmvK)
          .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
          .crossJoin(broadcast(exact))
          .select(
            lit(s"$t.$c").as("col_name"),
            when(col("m") < kmvK, col("m").cast("double"))
              .otherwise(lit((kmvK - 1).toDouble) /
                (col("hk").cast("double") / lit(4503599627370496.0)))
              .as("kmv_est"),
            col("exact_ndv"))
      }
      .reduce(_.unionAll(_))
      .orderBy(col("col_name"))

  val kmvNdvSql: String =
    hllCols
      .map { case (t, c) =>
        s"""SELECT '$t.$c' AS col_name,
           |  CASE WHEN m < $kmvK THEN CAST(m AS DOUBLE)
           |       ELSE CAST(${kmvK - 1} AS DOUBLE) / (CAST(hk AS DOUBLE) / 4503599627370496.0) END AS kmv_est,
           |  (SELECT CAST(COUNT(DISTINCT $c) AS BIGINT) FROM $t) AS exact_ndv
           |FROM (SELECT MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS m FROM (
           |  SELECT CAST(('0x' || substr(md5('kmv:' || CAST($c AS VARCHAR)), 1, 13)) AS BIGINT) AS h
           |  FROM (SELECT DISTINCT $c FROM $t WHERE $c IS NOT NULL)
           |  ORDER BY h LIMIT $kmvK) z)""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "col_stats" -> (colStatsQ _),
    "histogram" -> (histogramQ _),
    "mcv" -> (mcvQ _),
    "cms_freq" -> (cmsFreqQ _),
    "hll_ndv" -> (hllNdvQ _),
    "kmv_ndv" -> (kmvNdvQ _)
  )

  /** hll_ndv is rows-only (impl-specific sketch); kmv_ndv is its
    * SQL-checked portable companion.
    */
  val oracleSql: Map[String, String] = Map(
    "col_stats" -> colStatsSql,
    "histogram" -> histogramSql,
    "mcv" -> mcvSql,
    "cms_freq" -> cmsFreqSql,
    "kmv_ndv" -> kmvNdvSql
  )
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave: the sketch-join estimator family's third member (CMS
  * inner product), cheaper/asymmetric near-dup variants (1-bit minhash,
  * containment), a perceptual-hash dedup leg for the multimodal column,
  * heavy-tail/changepoint monitors, a time-bounded funnel, SAX symbolic
  * series, URL canonicalization dedup, and a curriculum shard plan.
  * Everything stays on the repo's portable grids (integer cents, 1e-6
  * fixed point, md5-derived hashes, truncating integer division) so the
  * DuckDB oracle hash-matches.
  */
object QueriesWave7 {

  // ---- cms_join_est: CMS inner-product join-size estimator ----

  /** AGMS/CMS-sketch join-size estimator (Alon–Matias–Szegedy lineage,
    * Cormode–Muthukrishnan CM sketches): |A ⋈ B| = Σ_k d_A(k)·d_B(k) is
    * estimated by the inner product of the two sides' count-min rows —
    * est = min over depths d of Σ_w A[d][w]·B[d][w]. Hash collisions
    * only ADD cross terms, so every depth's inner product is an upper
    * bound of the truth and the min is the tightest; unlike the KMV
    * sample (`kmv_join_est`) the CMS estimate has no sampling variance,
    * it trades that for collision bias at small width. Same three
    * audited edges; the per-key degree frame is the session-shared
    * `kjeDeg` memo, so the truth costs nothing extra, and the sketch
    * cells are a ≤ depth×256-row aggregate of it — at 100 TB the only
    * data-sized work is the keyed degree count the memo already does.
    * Portable hash: bucket_d(k) = first md5 byte of "d:k" (the
    * `cms_freq` family).
    */
  def cmsJoinEstQ(spark: SparkSession, dir: String): DataFrame =
    QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val deg = QueriesWave6.kjeDeg(spark, dir, label, ta, ka, tb, kb)
      val cells = deg
        .select(col("da"), col("db"),
          posexplode(array((0 until QueriesStats.cmsDepth).map(d =>
            graft.operators.Stats.cmsBucket(d, col("k"))): _*)).as(Seq("d", "w")))
        .groupBy(col("d"), col("w"))
        .agg(sum(col("da")).as("ca"), sum(col("db")).as("cb"))
      val est = cells
        .groupBy(col("d")).agg(sum(col("ca") * col("cb")).as("s"))
        .agg(min(col("s")).as("est"))
      val actual = deg.agg(sum(col("g")).as("actual"))
      est.crossJoin(actual)
        .select(lit(label).as("edge"), col("est"), col("actual"),
          (col("est").cast("double") /
            greatest(col("actual"), lit(1L)).cast("double")).as("inflation"))
    }.reduce(_.unionAll(_)).orderBy(col("edge"))

  val cmsJoinEstSql: String = {
    val depth = QueriesStats.cmsDepth
    def bucketSql(v: String): String =
      s"(strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 1, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 2, 1)) - 1)"
    val ctes = QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val n = QueriesWave6.cteName(label)
      s"""${QueriesWave6.kjeDegCte(label, ta, ka, tb, kb)},
         |cells_$n AS (
         |  SELECT depths.d AS d, ${bucketSql("CAST(k AS VARCHAR)")} AS w,
         |         SUM(da) AS ca, SUM(db) AS cb
         |  FROM deg_$n, depths GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val arms = QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val n = QueriesWave6.cteName(label)
      s"""SELECT '$label' AS edge,
         |  (SELECT MIN(s) FROM (SELECT d, SUM(ca * cb) AS s FROM cells_$n GROUP BY d)) AS est,
         |  (SELECT SUM(g) FROM deg_$n) AS actual""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH depths AS (SELECT UNNEST([${(0 until depth).mkString(", ")}]) AS d),
       |$ctes,
       |s AS (
       |$arms)
       |SELECT edge, CAST(est AS BIGINT) AS est, CAST(actual AS BIGINT) AS actual,
       |  CAST(est AS DOUBLE) / CAST(GREATEST(actual, 1) AS DOUBLE) AS inflation
       |FROM s ORDER BY edge""".stripMargin
  }

  // ---- bbit_minhash: 1-bit minhash Jaccard estimation ----

  /** b-bit minhash (Li–König 2010) over the session's LSH candidate
    * pairs: keep only the LOWEST hex bit of each of the 16 signature
    * entries — 16 bits per doc instead of 16 md5 strings (a 128×
    * signature-storage cut, THE at-scale justification) — and unbias the
    * agreement rate: E[agree] = J + (1−J)/2, so Ĵ₁ = max(0, 2·agree/16
    * − 1). Reported next to the full-signature estimate (agree/16) and
    * the exact set Jaccard so the audit shows what the compression
    * costs. All three estimates are exact binary fractions (k/16,
    * k/32-grid) — engine-portable doubles. Candidates and both per-doc
    * frames are session memos; the only new work is a pair-keyed join.
    */
  def bbitMinhashQ(spark: SparkSession, dir: String): DataFrame = {
    val sigs = QueriesText.mhWide(spark, dir)
    val n = graft.operators.TextOps.numPerms
    def lowBit(c: Column): Column = conv(substring(c, 32, 1), 16, 10).cast("long") % 2
    def side(suffix: String): DataFrame =
      sigs.select(
        (col("doc_id").as(s"doc_$suffix") +:
          (0 until n).map(i => col(s"m$i").as(s"m${i}_$suffix"))): _*)
    val sets = QueriesText.shArr3(spark, dir)
    val sigAgree = (0 until n)
      .map(i => when(col(s"m${i}_a") === col(s"m${i}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    val bitAgree = (0 until n)
      .map(i => when(lowBit(col(s"m${i}_a")) === lowBit(col(s"m${i}_b")), 1L).otherwise(0L))
      .reduce(_ + _)
    graft.operators.TextOps.lshCandidatesCollapsed(sigs)
      .join(side("a"), "doc_a").join(side("b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (sigAgree.cast("double") / n).as("j_sig"),
        greatest(lit(0.0), (lit(2L) * bitAgree - n).cast("double") / n).as("j_1bit"))
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double")).as("j_exact"),
        col("j_sig"), col("j_1bit"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val bbitMinhashSql: String = {
    val n = graft.operators.TextOps.numPerms
    val sigAgree = (0 until n)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    def lowBit(m: String): String =
      s"(strpos('0123456789abcdef', substr($m, 32, 1)) - 1) % 2"
    val bitAgree = (0 until n)
      .map(i => s"CASE WHEN ${lowBit(s"a.m$i")} = ${lowBit(s"b.m$i")} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${QueriesText.candCtes},
       |sets AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |          FROM sh a
       |          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
       |          GROUP BY 1, 2),
       |est AS (SELECT c.doc_a, c.doc_b,
       |    CAST($sigAgree AS DOUBLE) / $n AS j_sig,
       |    GREATEST(0.0, CAST(2 * ($bitAgree) - $n AS DOUBLE) / $n) AS j_1bit
       |  FROM cand c JOIN sigs a ON a.doc_id = c.doc_a JOIN sigs b ON b.doc_id = c.doc_b)
       |SELECT e.doc_a, e.doc_b,
       |  CAST(COALESCE(i.inter, 0) AS DOUBLE) /
       |    CAST(sa.n + sb.n - COALESCE(i.inter, 0) AS DOUBLE) AS j_exact,
       |  e.j_sig, e.j_1bit
       |FROM est e
       |LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
       |JOIN sets sa ON sa.doc_id = e.doc_a
       |JOIN sets sb ON sb.doc_id = e.doc_b
       |ORDER BY e.doc_a, e.doc_b""".stripMargin
  }

  // ---- hill_tail: Hill estimator of the heavy-tail index ----

  val hillK = 100

  /** Hill estimator of the Pareto tail index over order values: with
    * x₍₁₎ ≥ … the order statistics of o_totalprice cents, H =
    * (1/m)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the m top values strictly above the
    * (k+1)-th, and the tail index α̂ = 1/H — the standard diagnostic for
    * "does this value distribution have power-law tails" (pairs with
    * `zipf_fit`'s rank-frequency slope). Distributed shape: the top
    * k+1 VALUES arrive via TakeOrdered (k = $hillK — never a global
    * sort), the threshold broadcasts back, and ties at the threshold
    * make the value multiset — and hence every output — deterministic.
    * Each ln term is quantized to the 1e-6 grid before the sum (the one
    * transcendental, engine-portable).
    */
  def hillTailQ(spark: SparkSession, dir: String): DataFrame = {
    val cents = expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    val top = Tables(spark, dir, "orders")
      .select(cents.as("c")).orderBy(col("c").desc).limit(hillK + 1)
    val thr = top.agg(min(col("c")).as("xk"))
    top.crossJoin(broadcast(thr))
      .filter(col("c") > col("xk"))
      .select(col("xk"),
        (round(log(col("c").cast("double") / col("xk").cast("double")) * 1e6) / 1e6)
          .as("lnr"))
      .groupBy(col("xk"))
      .agg(count(lit(1)).as("m"), sum(col("lnr")).as("__s"))
      .select(col("m"), col("xk").as("x_thresh"),
        (col("__s") / col("m")).as("h_hill"),
        (col("m").cast("double") / col("__s")).as("alpha"))
  }

  val hillTailSql: String =
    s"""WITH top AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       |             FROM orders ORDER BY c DESC LIMIT ${hillK + 1}),
       |thr AS (SELECT MIN(c) AS xk FROM top),
       |terms AS (SELECT t.c, thr.xk,
       |    round(ln(CAST(t.c AS DOUBLE) / CAST(thr.xk AS DOUBLE)) * 1e6) / 1e6 AS lnr
       |  FROM top t, thr WHERE t.c > thr.xk)
       |SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(xk) AS x_thresh,
       |  SUM(lnr) / COUNT(*) AS h_hill,
       |  CAST(COUNT(*) AS DOUBLE) / SUM(lnr) AS alpha
       |FROM terms GROUP BY xk""".stripMargin

  // ---- registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_join_est" -> (cmsJoinEstQ _),
    "bbit_minhash" -> (bbitMinhashQ _),
    "hill_tail" -> (hillTailQ _)
  )

  def oracleSql: Map[String, String] = Map(
    "cms_join_est" -> cmsJoinEstSql,
    "bbit_minhash" -> bbitMinhashSql,
    "hill_tail" -> hillTailSql
  )
}

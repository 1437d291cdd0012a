package graft

import org.apache.spark.sql.functions._

class Wave21Spec extends SparkSpec {
  import spark.implicits._

  test("wasserstein_drift: every pair once, W1 in [0, 1], exact refit on one pair") {
    val rows = QueriesWave21.wassersteinDriftQ(spark, sf).collect()
    val nSrc = Tables(spark, sf, "documents")
      .select($"source").distinct().count().toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    for (r <- rows) {
      val w1 = r.getDouble(4)
      assert(w1 >= 0.0 && w1 <= 1.0, s"W1 out of [0,1] in $r")
      assert(r.getString(0) < r.getString(1))
    }
    // driver-side exact refit for the first pair from the same hist
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val hist = Memo(spark, sf, "wave21:srcScoreHist")(
      sys.error("hist memo must already exist"))
      .filter($"source".isin(sa, sb))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val support = hist.map(_._2).distinct.sorted
    def cdf(src: String): Map[Long, Long] = {
      val byV = hist.filter(_._1 == src).map(t => t._2 -> t._3).toMap
      var c = 0L
      support.map { v => c += byV.getOrElse(v, 0L); v -> c }.toMap
    }
    val (ca, cb) = (cdf(sa), cdf(sb))
    val (na, nb) = (ca(support.last), cb(support.last))
    val tsum = support.zip(support.tail).map { case (v, vn) =>
      (BigInt(ca(v)) * nb - BigInt(cb(v)) * na).abs * (vn - v)
    }.sum
    val want = tsum.toDouble / (BigInt(na) * nb).toDouble / 1000.0
    assert(math.abs(rows.head.getDouble(4) - want) < 1e-12,
      s"refit $want vs ${rows.head.getDouble(4)}")
  }

  test("kmeans_coreset: m distinct rows, sensitivities valid, weights consistent") {
    val rows = QueriesWave21.kmeansCoresetQ(spark, sf).collect()
    assert(rows.length === QueriesWave21.coresetM)
    assert(rows.map(_.getInt(0)).toSeq === (1 to QueriesWave21.coresetM))
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
    for (r <- rows) {
      val q = r.getDouble(2)
      assert(q > 0.0 && q < 1.0, s"sensitivity out of (0,1) in $r")
      assert(r.getDouble(3) === 1.0 / (QueriesWave21.coresetM * q))
    }
  }

  test("kmeans_coreset sensitivities sum to 1 over the corpus") {
    QueriesWave21.kmeansCoresetQ(spark, sf).count() // builds the memo
    val scored = Memo(spark, sf, "wave21:coresetScored")(
      sys.error("scored memo must already exist"))
    val t = scored.agg(sum($"n2d2".cast("decimal(38,0)")))
      .collect().head.getDecimal(0)
    val n = scored.count()
    // Σ q(x) = Σ (1/2n + n2d2/2T) = 1/2 + 1/2 = 1 by construction;
    // verify through the same double arithmetic the query uses
    val qsum = scored
      .select((lit(0.5) / $"__n".cast("double") +
        $"n2d2".cast("double") / (lit(2.0) * lit(t.toString).cast("decimal(38,0)").cast("double"))).as("q"))
      .agg(sum($"q")).as[Double].collect().head
    assert(math.abs(qsum - 1.0) < 1e-9, s"sum q = $qsum")
    assert(n > 0)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Invariants of the association / trend / gains / deletable-sketch wave. */
class Wave17InvariantSpec extends SparkSpec {

  test("cramers_v: V in [0,1], df matches the table shape") {
    val r = QueriesWave17.cramersVQ(spark, sf).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Int]("df") == 4 * 6, "5 event types x 7 weekdays")
  }

  test("trend_test_ca: z matches a driver-side refit of the CA statistic") {
    val r = QueriesWave17.trendTestCaQ(spark, sf).collect().head
    assert(r.getAs[Double]("late_rate") >= 0.0 && r.getAs[Double]("late_rate") <= 1.0)
    assert(r.getAs[Boolean]("significant") ==
      (math.abs(r.getAs[Double]("z_trend")) >= QueriesWave17.caCrit))
    // refit from the marked frame
    val marked = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "lineitem").groupBy(col("l_orderkey"))
        .agg(min(col("l_shipdate")).as("fs")),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"),
        (coalesce(expr(
          """(unix_micros(CAST(fs AS TIMESTAMP))
            | - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000"""
            .stripMargin), lit(Long.MaxValue)) > QueriesWave17.caLateDays).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byW = marked.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val n = byW.values.map(_._1).sum
    val k = byW.values.map(_._2).sum
    val snw = byW.map { case (w, (ni, _)) => ni * w }.sum
    val snw2 = byW.map { case (w, (ni, _)) => ni * w * w }.sum
    val skw = byW.map { case (w, (_, ki)) => ki * w }.sum
    val tNum = (BigInt(skw) * n - BigInt(snw) * k).toDouble
    val varN3 = (BigInt(k) * (n - k) * (BigInt(n) * snw2 - BigInt(snw) * snw)).toDouble
    val se6 = math.round(1e6 * math.sqrt(varN3 / n))
    val z = tNum * 1e6 / se6
    assert(math.abs(z - r.getAs[Double]("z_trend")) < 1e-9, s"refit $z")
  }

  test("gains_curve: capture monotone to 1, lift decreasing, decile masses even") {
    val rows = QueriesWave17.gainsCurveQ(spark, sf).collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    assert(math.abs(rows.last.getAs[Double]("capture") - 1.0) < 1e-12)
    rows.map(_.getAs[Double]("capture")).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-12); case _ =>
    }
    // a score with positive AUC gains fastest early: first-decile lift >= 1
    assert(rows.head.getAs[Double]("lift") >= 1.0 - 1e-9)
    rows.map(_.getAs[Double]("lift")).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9); case _ =>
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1, "NTILE deciles differ by at most one row")
  }

  test("counting_bloom: deletes never create false negatives, counts reconcile") {
    val r = QueriesWave17.countingBloomQ(spark, sf).collect().head
    assert(r.getAs[Long]("false_negative") == 0L,
      "counting bloom must keep the no-false-negative contract after deletes")
    assert(r.getAs[Long]("bloom_positive") ==
      r.getAs[Long]("true_positive") + r.getAs[Long]("false_positive"))
    assert(r.getAs[Long]("true_positive") == r.getAs[Long]("n_remaining"))
    assert(r.getAs[Double]("fpr") >= 0.0 && r.getAs[Double]("fpr") < 1.0)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Invariants of the CUPED / odds-ratio / drawdown wave. */
class Wave18InvariantSpec extends SparkSpec {

  test("cuped_adjust: shares partition to 1, rho2 bounded by 1") {
    val r = QueriesWave18.cupedAdjustQ(spark, sf).collect().head
    val (rho2, rem) = (r.getAs[Double]("var_reduction_share"),
      r.getAs[Double]("var_remaining_share"))
    assert(rho2 >= 0.0 && rho2 <= 1.0 + 1e-9)
    assert(math.abs(rho2 + rem - 1.0) < 1e-12)
    assert(r.getAs[Long]("n") > 0)
  }

  test("odds_ratio_ci: CI brackets the point estimate, counts conserve the corpus") {
    val r = QueriesWave18.oddsRatioCiQ(spark, sf).collect().head
    val n = r.getAs[Long]("a") + r.getAs[Long]("b") + r.getAs[Long]("c") +
      r.getAs[Long]("d")
    assert(n == Tables(spark, sf, "documents").count())
    val (or_, lo, hi) = (r.getAs[Double]("odds_ratio"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    assert(or_ > 0.0)
    assert(lo <= or_ + 1e-9 && or_ <= hi + 1e-9)
    assert(r.getAs[Boolean]("significant") == (lo > 1.0 || hi < 1.0))
  }

  test("max_drawdown: peak precedes trough and the drawdown refits from the path") {
    val r = QueriesWave18.maxDrawdownQ(spark, sf).collect().head
    assert(r.getAs[Long]("peak_day_s") <= r.getAs[Long]("trough_day_s"))
    assert(r.getAs[Double]("max_drawdown") >= 0.0)
    // driver-side refit
    val daily = Tables(spark, sf, "orders")
      .groupBy(expr("unix_micros(date_trunc('DAY', o_orderdate))").as("d"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    var cum = 0L; var runmax = 0L; var best = 0L
    daily.foreach { case (_, x) =>
      cum += x; runmax = math.max(runmax, cum)
      best = math.max(best, runmax - cum)
    }
    assert(math.abs(best / 100.0 - r.getAs[Double]("max_drawdown")) < 1e-9,
      s"refit ${best / 100.0} vs ${r.getAs[Double]("max_drawdown")}")
  }
}

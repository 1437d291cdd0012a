package graft

import org.apache.spark.sql.functions._

/** Count-min sketch invariants on real table data: the estimate never
  * undercounts, and the probe set is fully covered.
  */
class SketchSpec extends SparkSpec {

  test("cms_freq: estimate dominates the true count for every probe") {
    val rows = QueriesStats.cmsFreqQ(spark, sf).collect()
    assert(rows.length == QueriesStats.cmsProbes.length)
    rows.foreach { r =>
      val (est, tru) = (r.getAs[Long]("cms_cnt"), r.getAs[Long]("true_cnt"))
      assert(est >= tru, s"partkey ${r.get(0)}: cms $est < true $tru")
    }
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf, "events")
    val salted = graft.operators.Skew
      .saltedCountSum(ev, Seq("event_type"), "value", 32)
      .orderBy("event_type")
      .as[(String, Long, Double)].collect().toSeq
    val direct = ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
      .orderBy("event_type")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted == direct)
    // degenerate hot key — 500 IDENTICAL rows: round-robin salting must
    // still spread them (content hashing would not) and stay correct
    val dup = Seq.fill(500)(("hot", 1.0)).toDF("event_type", "value")
    val dupSalted = graft.operators.Skew
      .saltedCountSum(dup, Seq("event_type"), "value", 32)
      .as[(String, Long, Double)].collect().toSeq
    assert(dupSalted == Seq(("hot", 500L, 500.0)))
  }

  test("cmsBucket (plan-side) and cmsBucketOf (driver-side) agree") {
    import spark.implicits._
    val vals = Seq("1", "42", "xyz", "1995-03-15")
    val planSide = vals.toDF("v")
      .select(
        col("v"),
        graft.operators.Stats.cmsBucket(0, col("v")).as("b0"),
        graft.operators.Stats.cmsBucket(3, col("v")).as("b3"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    vals.foreach { v =>
      val (b0, b3) = planSide(v)
      assert(b0 == graft.operators.Stats.cmsBucketOf(0, v))
      assert(b3 == graft.operators.Stats.cmsBucketOf(3, v))
    }
  }
}

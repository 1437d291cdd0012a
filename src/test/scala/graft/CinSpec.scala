package graft

import org.apache.spark.sql.functions._

/** CIN-combine estimator invariants (reference:
  * scardina/estimators.py:1040-1426 ProgressiveSamplingCIN).
  */
class CinSpec extends SparkSpec {

  private def byId(q: org.apache.spark.sql.DataFrame): Map[String, Double] =
    q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("CIN is conjunction-exact for queries inside one subschema") {
    val est = byId(QueriesEstimators.cinEstQ(spark, sf))
    val tru = QueriesEstimators.trueCardQ(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // b01..b06 and b10's edges all live in one closed in-neighborhood
    // (lineitem's or orders'), so the per-subschema joint captures the
    // full conjunction and the estimate equals the true cardinality.
    for (id <- Seq("b01", "b02", "b03", "b04", "b05", "b06", "b10"))
      assert(est(id) === tru(id), s"$id should be exact under CIN")
    // b07/b08/b09 cross subschema boundaries — the estimate is the
    // architecture's conditional-independence approximation, not truth.
    assert(Seq("b07", "b08", "b09").exists(id => est(id) !== tru(id)))
  }

  test("pessimistic degree bound dominates the true cardinality on every spec") {
    val rows = QueriesEstimators.pessEstQ(spark, sf)
      .select("query_id", "est", "card", "bound_holds")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 10)
    rows.foreach { case (id, est, card, holds) =>
      assert(holds && est >= card, s"$id: bound $est < true $card")
    }
    // single-table specs have no join factors: the bound IS the
    // conjunction-exact count, so it is tight there
    val m = rows.map(r => r._1 -> r).toMap
    assert(m("b01")._2 == m("b01")._3 && m("b02")._2 == m("b02")._3)
  }

  test("CIN combine is |root| x fanout-scaled boundary factors (b08 by hand)") {
    // b08: customer⋈nation⋈region, preds c_acctbal>0 (customer group),
    // r_name='ASIA' (nation group). Root = customer's subschema.
    val load = graft.operators.Fanouts.loader(spark, sf)
    def cnt(df: org.apache.spark.sql.DataFrame): Double = df.count().toDouble
    val cn = load("customer").join(load("nation"),
      col("c_nationkey") === col("n_nationkey"))
    val nr = load("nation").join(load("region"),
      col("n_regionkey") === col("r_regionkey"))
    val expected = cnt(cn.filter(col("c_acctbal") > 0)) *
      (cnt(nr.filter(col("r_name") === "ASIA")) / cnt(load("nation")))
    val est = byId(QueriesEstimators.cinEstQ(spark, sf))
    assert(est("b08") === expected)
  }
}

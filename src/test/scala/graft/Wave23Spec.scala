package graft

import org.apache.spark.sql.functions._

class Wave23Spec extends SparkSpec {
  import spark.implicits._

  test("fact_est: >=2 subcolumns, positive estimates, q_err consistent") {
    val rows = QueriesWave23.factEstQ(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      QueriesWave23.factSpecs.map(_._1))
    for (r <- rows) {
      val (k, est, card, qerr) =
        (r.getInt(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(k >= 2, s"threshold must force >=2 subcolumns, got $k")
      assert(est > 0.0, s"est must be positive in $r")
      assert(card > 0L, s"every spec matches rows in $r")
      assert(qerr >= 1.0, s"q_err below 1 in $r")
      assert(qerr === math.max(est / card, card.toDouble / est),
        s"q_err inconsistent in $r")
    }
  }

  test("fact_progressive narrows monotonically and lands on the exact card") {
    val prog = QueriesWave23.factProgressiveQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3).toSeq
      }
    val card = QueriesWave23.factEstQ(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val k = prog.values.head.length
    assert(k >= 2)
    for ((id, ests) <- prog) {
      assert(ests.length === k, s"$id missing steps")
      // the factor mask only narrows: each consumed slice is an AND
      for (Seq(a, b) <- ests.sliding(2))
        assert(a >= b, s"$id mask widened: $ests")
      // all bits consumed => the factored chain equals the unfactored
      // truth EXACTLY (slice tuple <-> code is a bijection)
      assert(ests.last === card(id).toDouble,
        s"$id factored final ${ests.last} != unfactored ${card(id)}")
    }
  }

  test("factored truth matches a direct unfactorized count of orders") {
    // independent of the dictionary/slicing machinery: predicate applied
    // straight to the base table
    val direct = Map(
      "fp01" -> Tables(spark, sf, "orders").filter($"o_custkey" <= 100).count(),
      "fp02" -> Tables(spark, sf, "orders")
        .filter($"o_custkey".between(40, 200)).count(),
      "fp03" -> Tables(spark, sf, "orders")
        .filter($"o_custkey".isin(7, 21, 40, 99, 150)).count(),
      "fp04" -> Tables(spark, sf, "orders").filter($"o_custkey" > 120).count())
    val card = QueriesWave23.factEstQ(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(card === direct)
  }
}

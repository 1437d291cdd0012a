package graft

import org.apache.spark.sql.functions._

class Wave20Spec extends SparkSpec {
  import spark.implicits._

  test("lsh_precision_audit: verified ⊆ candidates and the rates reconcile") {
    val r = QueriesWave20.lshPrecisionAuditQ(spark, sf).collect().head
    val (nCand, nVer) = (r.getLong(0), r.getLong(1))
    assert(nVer <= nCand, s"verified $nVer > candidates $nCand")
    assert(nCand > 0, "band join emitted no candidates at sf0.001")
    assert(r.getDouble(2) === nVer.toDouble / nCand.toDouble)
    assert(r.getLong(3) === nCand - nVer)
    val direct = QueriesText.lshPairs(spark, sf).count()
    assert(nVer === direct, s"audit $nVer vs direct pair count $direct")
  }

  test("split_leak_audit: shares sum to 1 and pair counts reconcile") {
    val rows = QueriesWave20.splitLeakAuditQ(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = QueriesText.lshPairs(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    for (r <- rows)
      assert(r.getBoolean(3) === (r.getString(0) != r.getString(1)))
  }

  test("ivf_pq_adc: k results per probe, ADC sorted, candidates from probed cells") {
    val out = QueriesWave20.ivfPqAdcQ(spark, sf).collect()
    val k = QueriesText.topK
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.size === QueriesText.probeMax.toInt)
    for ((p, rows) <- byProbe) {
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to k), s"probe $p ranks")
      val adcs = sorted.map(_.getLong(3))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        s"probe $p ADC not non-decreasing: ${adcs.mkString(",")}")
      assert(adcs.forall(_ >= 0L))
      assert(!sorted.map(_.getLong(2)).contains(p), s"probe $p returned itself")
    }
  }

  test("mmd_drift: every unordered source pair once, finite statistics") {
    val rows = QueriesWave20.mmdDriftQ(spark, sf).collect()
    val nSrc = Tables(spark, sf, "documents")
      .select($"source").distinct().count().toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    for (r <- rows) {
      val m = r.getDouble(4)
      assert(!m.isNaN && !m.isInfinite, s"mmd2 not finite in $r")
      // U-statistic MMD² can be slightly negative; it must stay near 0
      // for same-generator sources and bounded by the kernel's scale
      assert(m > -1e-3 && m < 10.0, s"mmd2 out of range in $r")
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("gumbel_topk_sample: k distinct docs per source, keys non-increasing") {
    val rows = QueriesWave20.gumbelTopkSampleQ(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    for ((s, rs) <- bySrc) {
      assert(rs.length === QueriesWave20.gumbelK, s"source $s row count")
      assert(rs.map(_.getLong(2)).distinct.length === rs.length,
        s"source $s repeated a doc")
      val keys = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(keys.zip(keys.tail).forall { case (a, b) => a >= b },
        s"source $s keys not non-increasing")
    }
  }

  test("gumbel_topk_sample matches the built-in per-group window top-k") {
    // groupedTopK must be IDENTICAL to the naive single-window plan on
    // the same keys — the two-stage form is a pure scale optimization
    import org.apache.spark.sql.expressions.Window
    val got = QueriesWave20.gumbelTopkSampleQ(spark, sf)
      .select($"source", $"rnk", $"doc_id").collect().toSet
    val keyed = Tables(spark, sf, "documents")
      .filter($"n_chars" > 0)
      .select($"doc_id", $"source", $"n_chars")
      .withColumn("__h",
        conv(substring(md5(concat(lit("gk:"), $"doc_id".cast("string"))), 1, 13),
          16, 10).cast("long"))
      .withColumn("__lnu6", expr(
        "CAST(round(1e6 * ln((CAST(__h AS DOUBLE) + 0.5) / 4503599627370496.0)) AS BIGINT)"))
      .withColumn("gumbel_key", $"__lnu6".cast("double") / $"n_chars".cast("double"))
    val naive = keyed
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"gumbel_key".desc, $"doc_id")))
      .filter($"rnk" <= QueriesWave20.gumbelK)
      .select($"source", $"rnk", $"doc_id").collect().toSet
    assert(got === naive)
  }

  test("groupedTopK equals the built-in window top-k on ragged groups") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0L, 500L)
      .select($"id",
        ($"id" % 7).cast("string").as("g"),
        (($"id" * 2654435761L) % 1000L).as("v"))
      .repartition(8)
    for (k <- Seq(1, 3, 80)) { // 80 > the ~71-row groups: whole group survives
      val got = operators.Layout
        .groupedTopK(df, Seq("g"), Seq($"v".desc, $"id"), k, "rnk")
        .select($"g", $"rnk", $"id").collect().toSet
      val want = df
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id")))
        .filter($"rnk" <= k)
        .select($"g", $"rnk", $"id").collect().toSet
      assert(got === want, s"k=$k mismatch")
    }
  }
}

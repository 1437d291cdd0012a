package graft

class Wave29Spec extends SparkSpec {

  test("mixture_gof: nonnegative chi2 with the documented df") {
    val r = QueriesWave29.mixtureGofQ(spark, sf).collect().head
    val (n, chi2, df, perDf) =
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
    assert(n === Tables(spark, sf, "events").count())
    assert(chi2 >= 0.0)
    assert(df === (QueriesWave29.gofGroups - 1 - 5).toLong)
    assert(math.abs(perDf - chi2 / df) < 1e-12)
  }

  test("dup_quality_or: cells tile the corpus; CI brackets the estimate") {
    val r = QueriesWave29.dupQualityOrQ(spark, sf).collect().head
    val cells = (0 to 3).map(r.getLong(_))
    assert(cells.sum === Tables(spark, sf, "documents").count())
    val (or, lo, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(or > 0.0)
    assert(lo <= or + 1e-9 && or <= hi + 1e-9, s"CI [$lo,$hi] misses OR $or")
    assert(r.getBoolean(7) === (lo > 1.0 || hi < 1.0))
    // dup cells must match the verified-component membership count
    val nDup = QueriesText.dupComponents(spark, sf).count()
    assert(cells(0) + cells(1) === nDup)
  }
}

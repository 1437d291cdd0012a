package graft

import org.apache.spark.sql.DataFrame

/** The deep-memo lineage cut (Memo.lineageCut) is a bench/verify-only
  * serving mode: identical rows, shallower served plan. These tests pin
  * the contract both ways — OFF (the default, what every plan audit in
  * this suite sees) serves a persisted frame with its FULL logical plan;
  * ON serves the same rows behind a single leaf. The flag is restored
  * after each test: the rest of the suite must keep auditing full plans.
  */
class MemoLineageCutSpec extends SparkSpec {

  /** A deliberately deep frame: > Memo.lineageCutNodes analyzed nodes,
    * tiny data (unrolled per-iteration projections, like the pagerank
    * memo that motivated the cut). */
  private def deepFrame(): DataFrame = {
    import spark.implicits._
    var df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    (1 to 120).foreach { i =>
      df = df.select(org.apache.spark.sql.functions.col("id"),
        (org.apache.spark.sql.functions.col("v") * 1.0 + i - i).as("v"))
    }
    df
  }

  private def analyzedNodes(df: DataFrame): Int =
    df.queryExecution.analyzed.collect { case n => n }.size

  test("flag OFF (default): deep memo serves a persisted full plan the audits can walk") {
    assert(!Memo.lineageCut, "lineageCut must default to OFF for the test suite")
    val base = deepFrame()
    assert(analyzedNodes(base) > Memo.lineageCutNodes, s"fixture not deep enough: ${analyzedNodes(base)}")
    val served = Memo(spark, "memo-cut-spec", "deep-off")(deepFrame())
    // full lineage retained: the served analyzed plan is as deep as the build
    assert(analyzedNodes(served) > Memo.lineageCutNodes)
    assert(!served.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"))
    assert(served.storageLevel.useMemory || served.storageLevel.useDisk,
      "flag OFF must serve a persist()-ed frame")
  }

  test("flag ON: deep memo serves the same rows behind a single lineage-cut leaf") {
    Memo.lineageCut = true
    try {
      val served = Memo(spark, "memo-cut-spec", "deep-on")(deepFrame())
      // lineage cut: the served plan is a leaf, not the 100+-node tree
      assert(analyzedNodes(served) <= 3,
        s"expected a cut leaf, got ${analyzedNodes(served)} nodes")
      // same rows as the uncut build
      val a = deepFrame().collect().map(_.toString).sorted.toSeq
      val b = served.collect().map(_.toString).sorted.toSeq
      assert(a == b)
    } finally Memo.lineageCut = false
  }

  test("flag ON + configured checkpoint dir: the cut is a RELIABLE checkpoint (cluster-safe)") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite session must not have a checkpoint dir")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    sc.setCheckpointDir(dir)
    Memo.lineageCut = true
    try {
      val served = Memo(spark, "memo-cut-spec", "deep-reliable")(deepFrame())
      served.count() // lazy checkpoint materializes on first action
      assert(analyzedNodes(served) <= 3)
      // reliable checkpoint writes RDD partitions under the configured dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable checkpoint must write to the checkpoint dir")
    } finally {
      Memo.lineageCut = false
      // SparkContext has no public unset API; reflectively clear the
      // private checkpointDir var to restore the suite invariant for
      // later tests in this JVM (best effort — the flag is off anyway)
      try {
        val f = sc.getClass.getDeclaredField("checkpointDir")
        f.setAccessible(true)
        f.set(sc, None)
      } catch { case _: Throwable => () }
    }
  }

  test("shallow memos persist regardless of the flag (no gratuitous checkpointing)") {
    Memo.lineageCut = true
    try {
      import spark.implicits._
      val served = Memo(spark, "memo-cut-spec", "shallow-on")(
        Seq((1, "a"), (2, "b")).toDF("k", "s"))
      assert(served.storageLevel.useMemory || served.storageLevel.useDisk)
      assert(!served.queryExecution.executedPlan.toString.contains("Scan ExistingRDD"))
    } finally Memo.lineageCut = false
  }
}

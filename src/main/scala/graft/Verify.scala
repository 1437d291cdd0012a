package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local fast loop)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // The bounded top-k AGGREGATES (TopKPairs) keep <= k-entry
      // buffers per group; the default ObjectHashAggregate fallback
      // threshold (128 in-memory groups per partition) would push them
      // back into a per-partition SORT -- exactly the input-sized sort
      // the aggregate replaces. 128k groups x ~100 B buffer is ~13 MB
      // per partition: hash aggregation stays safe at any scale, and
      // the knob stays env-tunable for cluster profiles.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJAGG_GROUPS", "131072"))
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same deep-memo lineage cut as Bench: cheaper per-consumer
    // re-analysis; results are identical (same materialized rows)
    Memo.lineageCut = true
    new java.io.File(outDir).mkdirs()
    // Correctness dump is order-independent (one output dir per query)
    // — run queries on a small concurrent pool (guide §2.6) so the
    // 406-query dump isn't a sequential latency sum. Memo/Checkpoint
    // builds are per-key locked; per-query results are unchanged.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_WARM_THREADS", "8").toInt)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          SparkEntry.queries.toSeq
            .filter { case (name, _) => only.forall(_.contains(name)) }
            .map { case (name, fn) =>
              scala.concurrent.Future(
                try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                  .parquet(s"$outDir/$name")
                catch { case e: Throwable =>
                  System.err.println(s"[verify] $name failed: ${e.getMessage}")
                })
            }),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

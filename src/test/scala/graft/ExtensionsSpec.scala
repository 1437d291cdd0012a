package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make quantized_dot resolvable in a session built
  * with `spark.sql.extensions=graft.GraftExtensions` — the cluster
  * deployment path — with no programmatic registration call. The conf is
  * a STATIC one: Spark reads it from the SparkContext conf at session
  * instantiation, so it lives on the fixture's builder and this spec
  * builds a brand-new session (fresh function registry) from the same
  * context to prove the conf alone registers the function.
  *
  * The shared fixture session is set aside and restored; tests run
  * sequentially in the forked JVM, so the default-session swap cannot
  * race another suite.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions registers quantized_dot at session build") {
    val base = spark // force the shared fixture to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.extensions", classOf[GraftExtensions].getName)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(extended ne base)
      val d = extended
        .sql("SELECT quantized_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .head().getLong(0)
      assert(d == 32L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

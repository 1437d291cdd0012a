package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the TESTDATA.md layout: one parquet per table
  * under an sf directory. At cluster scale the same API points at a
  * partitioned table root; nothing here assumes single-file inputs.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  /** Per-table unique row-identity columns — the deterministic candidate
    * ORDER for sampling picks. NOTE: the synthetic TESTDATA lineitem does
    * NOT enforce the TPC-H (l_orderkey, l_linenumber) PK; the 5-column
    * prefix below is verified unique at every test scale factor (and
    * orderable identically in Spark and DuckDB — no double→string casts,
    * doubles participate only in comparisons).
    */
  val pks: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  /** Session-level cache of base-table read relations: one listing +
    * footer/schema read per (session, dir, table) instead of one per
    * QUERY that touches the table. Profiled at sf0.1/local[32]: the 406
    * bench queries spend 43.7 s of their 161 s total in driver-side
    * DataFrame construction, a large part of it re-running
    * `spark.read.parquet` (file listing + schema inference + analysis
    * of a fresh relation) for the same ten tables hundreds of times.
    * The cached object is the unexecuted READ PLAN — no data or results
    * are cached; every action still computes from the parquet inputs.
    * Weak on both axes (same discipline as Checkpoint.loaded): a
    * retired session's entries must be collectable, and a DataFrame
    * strongly references its session, so values are WeakReferences.
    * Caveat (same as any cached read relation, e.g. Checkpoint's): a
    * process that OVERWRITES `$dir/$name.parquet` under a live session
    * must use a fresh session (or dir) for the re-read — every test
    * writes each dataset once into a fresh temp dir, and TESTDATA is
    * read-only.
    */
  private val loaded = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), java.lang.ref.WeakReference[DataFrame]]]())

  private def sessionLoaded(spark: SparkSession) = loaded.synchronized {
    var m = loaded.get(spark)
    if (m == null) {
      m = scala.collection.concurrent
        .TrieMap[(String, String), java.lang.ref.WeakReference[DataFrame]]()
      loaded.put(spark, m)
    }
    m
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val m = sessionLoaded(spark)
    m.get((dir, name)).flatMap(r => Option(r.get)).getOrElse {
      val df = load(spark, dir, name)
      m.put((dir, name), new java.lang.ref.WeakReference(df))
      df
    }
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) in parquet, which Spark reads only as
    // a nanos LONG (spark.sql.legacy.parquet.nanosAsLong=true, set by our
    // session builders). Truncate to micros — the same floor DuckDB's
    // ns→us conversion applies — so both engines see identical instants.
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    // Newer testdata writes timestamps as TIMESTAMP_NTZ. Our sessions pin
    // spark.sql.session.timeZone=UTC, so casting NTZ → TIMESTAMP keeps the
    // exact instant (and unix_micros etc. resolve); DuckDB reads the same
    // parquet natively, so the oracle sees identical values.
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(nanosFixed) {
      (acc, f) => acc.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }
}

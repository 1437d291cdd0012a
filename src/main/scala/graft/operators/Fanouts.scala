package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{FkEdge, Subschema, Tables}

/** Join-fanout machinery, the heart of the reference's data prep
  * (reference: scardina/datasets.py:68 _prepare_data).
  *
  * Spark-first notes: each fanout is one `groupBy(key).count()` — partial
  * (map-side) aggregation makes the shuffled payload one row per distinct
  * key, so the follow-up join is against a pre-aggregated, usually small
  * relation that AQE will broadcast when it fits. Nothing is collected to
  * the driver; at 100 TB the same plan holds with the shuffle sized by
  * distinct keys, not input rows.
  */
object Fanouts {

  /** Per-FK value counts (reference: datasets.py:113 value_counts). */
  def fkCount(fkTable: DataFrame, fkCol: String): DataFrame =
    fkTable.groupBy(col(fkCol)).agg(count(lit(1)).as("cnt"))

  /** Fanout of `fkTable.fkCol` joined onto the PK side; PK rows with no
    * matching FK rows get fanout 1, as the reference fills NA with 1
    * (reference: datasets.py:161-173 match_fanout).
    */
  def adjFanout(
      pkTable: DataFrame,
      pkCol: String,
      fkTable: DataFrame,
      fkCol: String,
      outName: String
  ): DataFrame = {
    val counts = fkCount(fkTable, fkCol).withColumnRenamed(fkCol, "__fo_key")
    pkTable
      .join(counts, col(pkCol) === col("__fo_key"), "left")
      .withColumn(outName, coalesce(col("cnt"), lit(1L)))
      .drop("__fo_key", "cnt")
  }

  /** Bottom-up `__weight__` for one table of a subschema rooted at `root`:
    * weight(t) = Π over child edges of coalesce(Σ child weights per key, 1)
    * (reference: datasets.py:296-357 join_sampling weight pass). The
    * returned frame is `table` plus a `__weight__` column.
    *
    * `load` resolves a table name to its DataFrame.
    */
  def weighted(
      sub: Subschema,
      root: String,
      load: String => DataFrame
  ): DataFrame = {
    // Undirected adjacency of the subschema's edges.
    def neighbors(t: String): Seq[(FkEdge, String)] =
      sub.edges.collect {
        case e if e.pkTable == t => (e, e.fkTable)
        case e if e.fkTable == t => (e, e.pkTable)
      }

    def weigh(t: String, from: Option[String]): DataFrame = {
      var df = load(t).withColumn("__weight__", lit(1L))
      for ((e, child) <- neighbors(t) if !from.contains(child)) {
        val (myKey, childKey) =
          if (e.pkTable == t) (e.pkCol, e.fkCol) else (e.fkCol, e.pkCol)
        val childW = weigh(child, Some(t))
          .groupBy(col(childKey).as("__w_key"))
          .agg(sum("__weight__").as("__w_sum"))
        df = df
          .join(childW, col(myKey) === col("__w_key"), "left")
          .withColumn("__weight__", col("__weight__") * coalesce(col("__w_sum"), lit(1L)))
          .drop("__w_key", "__w_sum")
      }
      df
    }
    weigh(root, None)
  }

  /** Size of the full outer join of a subschema — the reference registers
    * these as `subschema_sizes` inputs (reference: schema.py:151-162).
    * Computed without materializing the join payload: only join keys are
    * scanned (column pruning), counts compose per edge.
    */
  def subschemaSize(sub: Subschema, load: String => DataFrame): DataFrame = {
    var joined: DataFrame = load(sub.center)
    for (e <- sub.edges.sortBy(_.joinLabel)) {
      val other = if (e.fkTable == sub.center) e.pkTable else e.fkTable
      val (myKey, otherKey) =
        if (e.fkTable == sub.center) (e.fkCol, e.pkCol) else (e.pkCol, e.fkCol)
      joined = joined.join(load(other), col(myKey) === col(otherKey), "full")
    }
    joined.agg(count(lit(1)).as("size"))
  }

  /** COUNT of the padded full-outer subschema join WITHOUT materializing
    * it: when every edge joins the center's FK to a unique-PK dimension,
    * each full join keeps every existing row exactly once (unique match
    * or NULL pad) and only ADDS the dimension rows no center row
    * references — so size = |center| + Σ_d |d ⟂ center.fk_d| (anti-join
    * counts over the distinct FK values). The 100 TB plan: per-FK
    * distinct + tiny anti-joins instead of shuffling the full
    * multi-table outer join. Falls back to None when an edge's far side
    * is not the PK side (the add-only algebra needs uniqueness).
    *
    * PRECONDITION: every edge's pk side must be UNIQUE on pkCol — the
    * add-only algebra is wrong otherwise (a duplicated far-side key
    * multiplies center rows instead of padding). SchemaGraph edges
    * declare pkCol as the table's primary key, which is what makes the
    * orientation check (`fkTable == center`) a sufficient gate; an edge
    * whose far side were a non-unique column MUST NOT be modeled with
    * pkCol on that side. Equivalence with [[subschemaSize]] is asserted
    * per-subschema in LayoutSpec.
    */
  def subschemaSizeFast(sub: Subschema, load: String => DataFrame): Option[DataFrame] = {
    if (!sub.edges.forall(_.fkTable == sub.center)) return None
    val center = load(sub.center)
    val base = center.agg(count(lit(1)).as("__base"))
    val adds = sub.edges.sortBy(_.joinLabel).zipWithIndex.map { case (e, i) =>
      load(e.pkTable)
        .join(
          center.select(col(e.fkCol)).filter(col(e.fkCol).isNotNull).distinct(),
          col(e.pkCol) === col(e.fkCol), "left_anti")
        .agg(count(lit(1)).as(s"__a$i"))
    }
    val joined = adds.foldLeft(base)(_.crossJoin(_))
    val total = sub.edges.indices
      .map(i => col(s"__a$i"))
      .foldLeft(col("__base"))(_ + _)
    Some(joined.select(total.as("size")))
  }

  /** Convenience loader bound to an sf directory. */
  def loader(spark: SparkSession, dir: String): String => DataFrame =
    name => Tables(spark, dir, name)
}

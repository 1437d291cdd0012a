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
    val edges = sub.edges.sortBy(_.joinLabel)
    // Single-pass edge algebra: the per-edge formulation scanned the
    // center once PER EDGE for its distinct-FK set plus once for the
    // base count (4 center scans for a 3-edge subschema). Tagging each
    // FK value with its edge index in ONE exploded scan and AGGREGATING
    // it together with the unioned dimension keys computes every
    // add-count with one center pass. (An (edge, key) anti-join would
    // read the same way, but PushDownLeftSemiAntiJoin splits it through
    // the dim union into one join PER BRANCH — re-duplicating the
    // center scan the rewrite exists to remove; a keyed aggregate
    // cannot be split.) Per edge this is the identical anti-join count:
    // a (edge, key) group with min(__pk) = 0 has an FK occurrence, so
    // summing __pk over min = 1 groups counts exactly the dim rows with
    // no FK match; NULL dim keys group apart from the (filtered) FK
    // rows and are always counted, like the old never-matching NULLs.
    // Requires one common key type across the edges (true of the
    // integer-keyed schema); mixed types fall back to the per-edge legs.
    val keyTypes =
      (edges.map(e => center.schema(e.fkCol).dataType) ++
        edges.map(e => load(e.pkTable).schema(e.pkCol).dataType)).distinct
    val counted: DataFrame =
      if (keyTypes.size == 1) {
        val fkRows = center
          .select(posexplode(array(edges.map(e => col(e.fkCol)): _*)))
          .select(col("pos").as("__e"), col("col").as("__k"), lit(0L).as("__pk"))
          .filter(col("__k").isNotNull)
        val dimRows = edges.zipWithIndex
          .map { case (e, i) =>
            load(e.pkTable)
              .select(lit(i).as("__e"), col(e.pkCol).as("__k"), lit(1L).as("__pk"))
          }
          .reduce(_.unionAll(_))
        val adds = edges.indices.map(i =>
          coalesce(sum(when(col("__e") === i && col("__anyfk") === 1L,
            col("__pks"))), lit(0L)).as(s"__a$i"))
        base.crossJoin(
          fkRows.unionAll(dimRows)
            .groupBy(col("__e"), col("__k"))
            .agg(sum(col("__pk")).as("__pks"), min(col("__pk")).as("__anyfk"))
            .agg(adds.head, adds.tail: _*))
      } else {
        val adds = edges.zipWithIndex.map { case (e, i) =>
          load(e.pkTable)
            .join(
              center.select(col(e.fkCol)).filter(col(e.fkCol).isNotNull).distinct(),
              col(e.pkCol) === col(e.fkCol), "left_anti")
            .agg(count(lit(1)).as(s"__a$i"))
        }
        adds.foldLeft(base)(_.crossJoin(_))
      }
    val total = sub.edges.indices
      .map(i => col(s"__a$i"))
      .foldLeft(col("__base"))(_ + _)
    Some(counted.select(total.as("size")))
  }

  /** Convenience loader bound to an sf directory. */
  def loader(spark: SparkSession, dir: String): String => DataFrame =
    name => Tables(spark, dir, name)
}

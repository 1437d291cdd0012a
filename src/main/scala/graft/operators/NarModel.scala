package graft.operators

import org.apache.spark.ml.classification.{
  MultilayerPerceptronClassificationModel, MultilayerPerceptronClassifier}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Neural autoregressive density model over the discretized join sample —
  * the Spark-first re-expression of the reference's learned cardinality
  * model (scardina/models.py:276 `NAR`, :435 `NARTransformer`): the
  * reference trains a masked autoencoder whose output heads are each
  * column's conditional distribution given the others, then answers
  * COUNT(*) queries by progressive sampling through those conditionals.
  *
  * Here the same autoregressive factorization P(c) · P(o | c) ·
  * P(l | c, o) is learned with MLlib `MultilayerPerceptronClassifier`
  * heads — a softmax MLP per non-root column IS that column's
  * conditional-distribution head — trained on the SAME encoded training
  * batch (`training_batch`, the matrix datasets.py:_prepare_data feeds
  * the autoencoder: dictionary codes, NULL token 1 on padded slots).
  *
  * Inference: the discretized domains are catalog-sized (a handful of
  * codes per column), so instead of progressive SAMPLING we enumerate
  * the full code cross-product and evaluate the exact model joint — the
  * infinite-sample-budget limit of the reference's estimator, and
  * deterministic. Estimate = total join weight W × Σ P̂(combo) over
  * combos satisfying the (encoded) predicate, exactly the shape of
  * `sample_est` with the learned density replacing the empirical one.
  *
  * Scale: the training input is the weighted join SAMPLE — thousands of
  * rows regardless of base-table size (building it is the distributed
  * part, and is memoized); the enumerated joint is a broadcast-sized
  * table, the analogue of the reference's model checkpoint.
  */
object NarModel {

  /** 1-hot encode dictionary code `c ∈ 1..max` as a double array. */
  private def oneHot(c: String, max: Int): Column =
    expr(s"transform(sequence(1, $max), i -> CASE WHEN i = $c THEN 1.0D ELSE 0.0D END)")

  private def featVec(featCols: Seq[(String, Int)]): Column =
    array_to_vector(
      featCols.map { case (c, m) => oneHot(c, m) }.reduce(concat(_, _)))

  /** One autoregressive head: softmax P(labelCol | featCols) trained on
    * the encoded batch. The batch is coalesced to one partition sorted
    * by `orderCol` so L-BFGS sees a fixed gradient-aggregation order —
    * training is deterministic given the seed. (The batch is
    * sample-sized by contract; one partition of it is not a scale
    * concern — the 100 TB work happened producing the sample.)
    *
    * `init` warm-starts L-BFGS from an existing head's weights — the
    * incremental-training path (the reference's run.py `--inc-train`:
    * continue optimizing a loaded checkpoint on base+appended data
    * instead of refitting from the seed initialization).
    */
  def head(
      batch: DataFrame, orderCol: String, featCols: Seq[(String, Int)],
      labelCol: String, nClasses: Int, hidden: Int, seed: Long,
      maxIter: Int = 60,
      init: Option[MultilayerPerceptronClassificationModel] = None)
      : MultilayerPerceptronClassificationModel = {
    val dim = featCols.map(_._2).sum
    val train = batch
      .select(col(orderCol), featVec(featCols).as("features"),
        (col(labelCol) - lit(1)).cast("double").as("label"))
      .coalesce(1)
      .sortWithinPartitions(col(orderCol))
      .drop(orderCol)
    val cls = new MultilayerPerceptronClassifier()
      .setLayers(Array(dim, hidden, nClasses))
      .setSeed(seed)
      // 60 L-BFGS iterations at 1e-6 converge these catalog-sized
      // softmax heads to the same ≤1.1 q-error as 300@1e-9 at a fifth
      // of the cost — each iteration is a driver-coordinated job over
      // the one-partition batch, so iteration count IS the wall time
      .setMaxIter(maxIter)
      .setTol(1e-6)
    init.foreach(m => cls.setInitialWeights(m.weights))
    cls.fit(train)
  }

  /** The three autoregressive heads P(o|c), P(l|c,o), P(f|c,o,l) as one
    * trainable unit — what a model checkpoint holds. */
  case class Heads(
      po: MultilayerPerceptronClassificationModel,
      pl: MultilayerPerceptronClassificationModel,
      pf: MultilayerPerceptronClassificationModel)

  /** Train all three heads on `batch` (concurrent Spark jobs — same
    * seeds and single-partition inputs, so results are unchanged and
    * wall time is the slowest head, not the sum). `init` warm-starts
    * each head from a previous [[Heads]] (incremental training).
    */
  def heads(
      batch: DataFrame, cMax: Int, oMax: Int, lMax: Int, fMax: Int,
      hidden: Int, seed: Long, maxIter: Int = 60,
      init: Option[Heads] = None): Heads = {
    val codeFeats = Seq("c_code" -> cMax, "o_code" -> oMax, "l_code" -> lMax)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fPo = Future(head(batch, "slot", Seq("c_code" -> cMax), "o_code",
      oMax, hidden, seed, maxIter, init.map(_.po)))
    val fPl = Future(head(batch, "slot", Seq("c_code" -> cMax, "o_code" -> oMax),
      "l_code", lMax, hidden, seed + 1, maxIter, init.map(_.pl)))
    val fPf = Future(head(
      batch.withColumn("f_code", least(col("lo_fanout"), lit(fMax.toLong)).cast("int")),
      "slot", codeFeats, "f_code", fMax, hidden, seed + 2, maxIter, init.map(_.pf)))
    Heads(Await.result(fPo, Duration.Inf), Await.result(fPl, Duration.Inf),
      Await.result(fPf, Duration.Inf))
  }

  /** Attach `out` = P̂(labelCol's code | featCols) to each row of `df`
    * by evaluating the head's softmax and selecting the code's slot.
    */
  def prob(
      model: MultilayerPerceptronClassificationModel, df: DataFrame,
      featCols: Seq[(String, Int)], labelCol: String, out: String): DataFrame =
    model
      .transform(df.withColumn("features", featVec(featCols)))
      // label = code - 1 → probability vector slot code (1-indexed element_at)
      .withColumn(out, element_at(vector_to_array(col("probability")), col(labelCol).cast("int")))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** Exact model joint over the code cross-product:
    * P(c_code) · P̂(o_code | c) · P̂(l_code | c, o), with the structural
    * zero (a padded order cannot carry a real lineitem) re-imposed and
    * the mass renormalized. A fourth head learns the per-edge fanout
    * distribution P̂(lo_fanout | c, o, l) — the reference's fanout
    * columns (models.py fanout scaling) — summarized per combo as
    * einv = E[1/fanout | combo], the downweight that converts
    * universal-relation slot mass into order-level counts.
    * Returns (c_code, o_code, l_code, p, einv).
    */
  def joint(
      batch: DataFrame, cMax: Int, oMax: Int, lMax: Int, fMax: Int,
      hidden: Int, seed: Long): DataFrame =
    jointOf(heads(batch, cMax, oMax, lMax, fMax, hidden, seed), batch,
      cMax, oMax, lMax, fMax)

  /** The enumerated joint of an already-trained [[Heads]] over `batch`
    * (whose empirical root marginal supplies P(c)) — shared by the
    * from-scratch and incremental training paths.
    */
  def jointOf(
      hs: Heads, batch: DataFrame, cMax: Int, oMax: Int, lMax: Int,
      fMax: Int): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val codeFeats =
      Seq("c_code" -> cMax, "o_code" -> oMax, "l_code" -> lMax)
    val (po, pl, pf) = (hs.po, hs.pl, hs.pf)
    // root marginal is the exact empirical distribution of the sample —
    // the reference's first autoregressive slot is likewise fit directly
    val n = batch.agg(count(lit(1)).cast("double").as("__n"))
    val pc = batch.groupBy(col("c_code")).agg(count(lit(1)).as("__k"))
      .crossJoin(broadcast(n))
      .select(col("c_code"), (col("__k").cast("double") / col("__n")).as("pc"))
    val combos = (for { c <- 1 to cMax; o <- 1 to oMax; l <- 1 to lMax }
      yield (c, o, l)).toDF("c_code", "o_code", "l_code")
    val raw = prob(pl, prob(po, combos, Seq("c_code" -> cMax), "o_code", "po"),
        Seq("c_code" -> cMax, "o_code" -> oMax), "l_code", "pl")
      .join(broadcast(pc), Seq("c_code"), "left")
      .withColumn("__praw",
        when(col("o_code") === 1 && col("l_code") =!= 1, lit(0.0))
          .otherwise(coalesce(col("pc"), lit(0.0)) * col("po") * col("pl")))
    // FIXED-ORDER float folds, not partition-parallel sum(): the combos
    // frame is a local Seq, so its partition count follows the
    // session's default parallelism — a parallel double sum over it
    // would make the persisted joint differ in the last ulp between a
    // local[4] and a local[16] build (caught by the full-store
    // rebuild-vs-committed diff in round 14). collect_list order is
    // nondeterministic, so sort the bounded array first and fold
    // sequentially — same values on any partitioning, any box.
    val einv = prob(pf,
        combos.crossJoin((1 to fMax).toDF("f_code")), codeFeats, "f_code", "pfv")
      .groupBy(col("c_code"), col("o_code"), col("l_code"))
      .agg(expr("aggregate(array_sort(collect_list(struct(f_code, pfv)))," +
        " cast(0.0 as double), (acc, x) -> acc + x.pfv / x.f_code)").as("einv"))
    val z = raw.agg(expr(
      "aggregate(array_sort(collect_list(struct(c_code, o_code, l_code, __praw)))," +
        " cast(0.0 as double), (acc, x) -> acc + x.__praw)").as("__z"))
    raw.crossJoin(broadcast(z))
      .join(einv, Seq("c_code", "o_code", "l_code"))
      .select(col("c_code"), col("o_code"), col("l_code"),
        (col("__praw") / col("__z")).as("p"), col("einv"))
  }
}

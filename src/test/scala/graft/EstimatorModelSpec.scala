package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression

/** The trained-estimator leg: ols_est must be the SAME model MLlib's
  * normal-equation LinearRegression learns (the closed form exists so the
  * DuckDB oracle can re-derive it; MLlib is the independent trainer that
  * proves the closed form is a real least-squares fit, reference:
  * scardina/models.py:276's train-then-predict loop). progressive_est is
  * the reference's ProgressiveSamplingUR analogue (estimators.py:913).
  */
class EstimatorModelSpec extends SparkSpec {
  import spark.implicits._

  test("ols_est agrees with MLlib LinearRegression (normal-equation solver)") {
    val feats = QueriesEstimators.olsFeats(spark, sf)
    val assembled = new VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(feats)
    val model = new LinearRegression()
      .setSolver("normal").setRegParam(0.0)
      .setLabelCol("y").setFeaturesCol("features")
      .fit(assembled)
    val mllibPred = model.transform(assembled)
      .select($"query_id", greatest($"prediction", lit(1.0)).as("p"))
      .as[(String, Double)].collect().toMap
    val olsPred = QueriesEstimators.olsEstQ(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(olsPred.keySet == mllibPred.keySet)
    // the closed form quantizes moments to 1/64 fixed point (engine
    // portability), so agreement is near-exact but not bitwise
    olsPred.foreach { case (id, e) =>
      val m = mllibPred(id)
      val rel = math.abs(e - m) / math.max(math.abs(m), 1.0)
      assert(rel < 1e-2, s"$id: ols $e vs mllib $m (rel $rel)")
    }
  }

  test("progressive_est covers the sampled subschema's specs with finite q-error") {
    val got = QueriesSampleEst.progressiveEstQ(spark, sf)
      .as[(String, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (id, est, qerr) =>
      assert(est >= 0.0, s"$id est $est")
      assert(qerr >= 1.0 && !qerr.isInfinite, s"$id q_err $qerr")
    }
  }

  test("nar density model: joint sums to 1, einv in (0,1], estimates within 2× of truth") {
    val joint = graft.operators.NarModel.joint(
      QueriesSampleEst.trainingBatchQ(spark, sf), 6, 4, 4, 8, 8, 101L)
    val mass = joint.agg(sum($"p")).as[Double].collect().head
    assert(math.abs(mass - 1.0) < 1e-9, s"joint mass $mass")
    joint.select($"einv").as[Double].collect().foreach { e =>
      assert(e > 0.0 && e <= 1.0 + 1e-9, s"einv $e")
    }
    // the structural zero: a padded order never carries a real lineitem
    val leak = joint.filter($"o_code" === 1 && $"l_code" =!= 1)
      .agg(sum($"p")).as[Double].collect().head
    assert(leak == 0.0)
    // end-to-end accuracy: tighter in-test than the oracle gate's 4×
    val checks = QueriesNar.narCheckQ(spark, sf)
      .as[(String, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(checks.map(_._1) == Seq("n01", "n02", "n03", "n04"))
    checks.foreach { case (id, fin, pos, q, prog) =>
      assert(fin && pos && q && prog, s"$id verdict ($fin, $pos, $q, $prog)")
    }
  }

  test("shannon entropy sits between Rényi-2 and ln(ndv), exact on a known distribution") {
    // H(1/2, 1/4, 1/4) = 1.5 ln 2; column built as 2×a, 1×b, 1×c
    val d = Seq("a", "a", "b", "c").toDF("v")
    val counts = d.groupBy($"v").agg(count(lit(1)).as("cnt"))
    val n = 4.0
    val h = counts.select(($"cnt".cast("double") * log($"cnt".cast("double"))).as("t"))
      .agg(sum($"t")).as[Double].collect().head
    val entropy = math.log(n) - h / n
    assert(math.abs(entropy - 1.5 * math.log(2.0)) < 1e-12)
    // on real data: 0 ≤ H ≤ ln(ndv) for every profiled column
    val rows = QueriesStats.shannonEntropyQ(spark, sf)
      .select($"col_name", $"ndv", $"entropy", $"norm_entropy")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(rows.size == QueriesStats.statCols.size)
    rows.foreach { case (cn, ndv, e, ne) =>
      assert(e >= -1e-9 && e <= math.log(ndv.toDouble) + 1e-9, s"$cn H=$e ndv=$ndv")
      assert(ne >= -1e-9 && ne <= 1.0 + 1e-9, s"$cn norm=$ne")
    }
  }

  test("incremental NAR training: every before/after/agreement gate holds") {
    val rows = QueriesNar.queries("nar_inc_check")(spark, sf).collect()
    assert(rows.length == 4, rows.mkString(" | "))
    for (r <- rows; i <- 2 until 6)
      assert(r.getBoolean(i), s"gate $i false in $r")
  }

  test("transformer NAR: hand-rolled backprop matches numeric gradients") {
    // tiny instance, exhaustive central-difference check of every param
    val m = new graft.operators.NarTransformer(2, 2, 2, 2, d = 4, h = 3, seed = 7L)
    val data = Array((0, 1, 0, 1, 2.0), (1, 0, 1, 0, 1.0), (1, 1, 1, 1, 3.0))
    val g = new Array[Double](m.nParams)
    m.lossAndGrad(data, g)
    val eps = 1e-6
    var worst = 0.0
    for (i <- 0 until m.nParams) {
      val p0 = m.params(i)
      m.params(i) = p0 + eps
      val lp = m.lossAndGrad(data, null)
      m.params(i) = p0 - eps
      val lm = m.lossAndGrad(data, null)
      m.params(i) = p0
      val num = (lp - lm) / (2 * eps)
      val rel = math.abs(num - g(i)) / math.max(1e-4, math.abs(num) + math.abs(g(i)))
      if (rel > worst) worst = rel
      assert(rel < 1e-4, s"param $i: analytic ${g(i)} vs numeric $num (rel $rel)")
    }
    assert(worst >= 0.0)
  }

  test("transformer NAR training is deterministic given the seed") {
    val data = Array((0, 1, 0, 1, 5.0), (1, 0, 1, 0, 2.0), (0, 0, 0, 0, 3.0))
    val a = graft.operators.NarTransformer.train(data, 2, 2, 2, 2, 11L, steps = 50)
    val b = graft.operators.NarTransformer.train(data, 2, 2, 2, 2, 11L, steps = 50)
    assert(a.params.sameElements(b.params))
    assert(a.enumerateJoint() == b.enumerateJoint())
  }

  test("transformer NAR fits the empirical conditionals on a separable toy") {
    // weighted combos with a hard dependency: o == c, l == o, f == l
    val data = Array((0, 0, 0, 0, 10.0), (1, 1, 1, 1, 30.0))
    val m = graft.operators.NarTransformer.train(data, 2, 2, 2, 2, 3L, steps = 400)
    val c0 = m.conditionals(0, 0, 0)
    val c1 = m.conditionals(1, 1, 1)
    assert(math.abs(c0(0)(0) - 0.25) < 0.05, s"P(c=0) ${c0(0)(0)}")
    assert(c0(1)(0) > 0.9, s"P(o=0|c=0) ${c0(1)(0)}")
    assert(c1(1)(1) > 0.9, s"P(o=1|c=1) ${c1(1)(1)}")
    assert(c1(2)(1) > 0.9 && c1(3)(1) > 0.9)
  }

  test("nar_training_curve: gates hold and training monotonically helped") {
    val rows = QueriesNar.queries("nar_training_curve")(spark, sf).collect()
    assert(rows.length == 12, s"3 rungs x 4 specs expected, got ${rows.length}")
    for (r <- rows; i <- 3 until 6)
      assert(r.getBoolean(i), s"gate $i false in $r")
    assert(rows.map(_.getInt(0)).distinct.sorted.toSeq == Seq(50, 200, 800))
  }

  test("nar_hpo: grid shape, argmin selection, and the winner's contract hold") {
    val rows = QueriesNar.queries("nar_hpo")(spark, sf).collect()
    assert(rows.length == 16, s"4 trials x 4 specs expected, got ${rows.length}")
    // columns: trial d h lr1000 query_id truth loss_ok sel_ok finite_ok best_ok
    assert(rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
      .distinct.length == 4, "4 distinct (d, h, lr) configs expected")
    for (r <- rows; i <- 6 until 10)
      assert(r.getBoolean(i), s"gate $i false in $r")
  }

  test("transformer NAR: joint mass 1, structural zero, every registered gate holds") {
    val rows = QueriesNar.queries("nar_tx_check")(spark, sf).collect()
    assert(rows.length == 4, rows.mkString(" | "))
    for (r <- rows; i <- 2 until 6)
      assert(r.getBoolean(i), s"gate $i false in $r")
    val joint = QueriesNar.narTxArtifact(spark, sf)
    val mass = joint.agg(sum($"p")).as[Double].collect().head
    assert(math.abs(mass - 1.0) < 1e-9, s"joint mass $mass")
    val leak = joint.filter($"o_code" === 1 && $"l_code" =!= 1)
      .agg(sum($"p")).as[Double].collect().head
    assert(leak == 0.0, s"structural-zero mass $leak")
  }

  test("masked-denoising NAR: hand-rolled backprop matches numeric gradients") {
    val m = new graft.operators.NarMlm(2, 2, 2, 2, d = 4, h = 3, seed = 7L)
    val data = Array((0, 1, 0, 1, 2.0), (1, 0, 1, 0, 1.0), (1, 1, 1, 1, 3.0))
    val g = new Array[Double](m.nParams)
    m.lossAndGrad(data, g)
    val eps = 1e-6
    for (i <- 0 until m.nParams) {
      val p0 = m.params(i)
      m.params(i) = p0 + eps
      val lp = m.lossAndGrad(data, null)
      m.params(i) = p0 - eps
      val lm = m.lossAndGrad(data, null)
      m.params(i) = p0
      val num = (lp - lm) / (2 * eps)
      val rel = math.abs(num - g(i)) / math.max(1e-4, math.abs(num) + math.abs(g(i)))
      assert(rel < 1e-4, s"param $i: analytic ${g(i)} vs numeric $num (rel $rel)")
    }
  }

  test("masked-denoising NAR training is deterministic given the seed") {
    val data = Array((0, 1, 0, 1, 5.0), (1, 0, 1, 0, 2.0), (0, 0, 0, 0, 3.0))
    val a = graft.operators.NarMlm.train(data, 2, 2, 2, 2, 11L, steps = 50)
    val b = graft.operators.NarMlm.train(data, 2, 2, 2, 2, 11L, steps = 50)
    assert(a.params.sameElements(b.params))
    assert(a.enumerateJoint() == b.enumerateJoint())
  }

  test("masked-denoising NAR recovers conditionals via the masking trick") {
    // hard dependency o == c: the masked head must read the observed c
    val data = Array((0, 0, 0, 0, 10.0), (1, 1, 1, 1, 30.0))
    val m = graft.operators.NarMlm.train(data, 2, 2, 2, 2, 3L, steps = 400)
    val pc = m.conditional(0, Array(0, 0, 0, 0), 15)
    assert(math.abs(pc(0) - 0.25) < 0.05, s"P(c=0) ${pc(0)}")
    val po0 = m.conditional(1, Array(0, 0, 0, 0), 14)
    val po1 = m.conditional(1, Array(1, 0, 0, 0), 14)
    assert(po0(0) > 0.9, s"P(o=0|c=0) ${po0(0)}")
    assert(po1(1) > 0.9, s"P(o=1|c=1) ${po1(1)}")
    val pf = m.conditional(3, Array(1, 1, 1, 0), 8)
    assert(pf(1) > 0.9, s"P(f=1|c,o,l=1) ${pf(1)}")
  }

  test("masked-denoising NAR: joint mass 1, structural zero, registered gates hold") {
    val rows = QueriesNar.queries("nar_mlm_check")(spark, sf).collect()
    assert(rows.length == 4, rows.mkString(" | "))
    for (r <- rows; i <- 2 until 7)
      assert(r.getBoolean(i), s"gate $i false in $r")
    val joint = QueriesNar.narMlmArtifact(spark, sf)
    val mass = joint.agg(sum($"p")).as[Double].collect().head
    assert(math.abs(mass - 1.0) < 1e-9, s"joint mass $mass")
    val leak = joint.filter($"o_code" === 1 && $"l_code" =!= 1)
      .agg(sum($"p")).as[Double].collect().head
    assert(leak == 0.0, s"structural-zero mass $leak")
  }
}

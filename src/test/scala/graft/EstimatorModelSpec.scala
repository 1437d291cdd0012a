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
    val got = QueriesEstimators.progressiveEstQ(spark, sf)
      .as[(String, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (id, est, qerr) =>
      assert(est >= 0.0, s"$id est $est")
      assert(qerr >= 1.0 && !qerr.isInfinite, s"$id q_err $qerr")
    }
  }

  test("nar density model: joint sums to 1, einv in (0,1], estimates within 2× of truth") {
    val joint = graft.operators.NarModel.joint(
      QueriesEstimators.trainingBatchQ(spark, sf), 6, 4, 4, 8, 8, 101L)
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
    val checks = QueriesEstimators.narCheckQ(spark, sf)
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
    val rows = QueriesEstimators.queries("nar_inc_check")(spark, sf).collect()
    assert(rows.length == 4, rows.mkString(" | "))
    for (r <- rows; i <- 2 until 6)
      assert(r.getBoolean(i), s"gate $i false in $r")
  }
}

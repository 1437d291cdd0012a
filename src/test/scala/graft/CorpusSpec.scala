package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("thresholdHex maps fractions to 8-hex-digit cut points") {
    assert(Corpus.thresholdHex(0.5) == "80000000")
    assert(Corpus.thresholdHex(0.25) == "40000000")
    assert(Corpus.thresholdHex(0.1) == "19999999")
  }

  test("stratifiedSample keeps ~frac per stratum, deterministically") {
    val docs = (0L until 4000L)
      .map(i => (i, s"src${i % 2}", "t")).toDF("doc_id", "source", "text")
    val thresh = when(expr("CAST(substring(source, 4) AS INT)") % 2 === 0,
      lit(Corpus.thresholdHex(0.5))).otherwise(lit(Corpus.thresholdHex(0.1)))
    val s = Corpus.stratifiedSample(docs, "s", thresh).cache()
    val by = s.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(by("src0") / 2000.0 - 0.5) < 0.05, by)
    assert(math.abs(by("src1") / 2000.0 - 0.1) < 0.04, by)
    val again = Corpus.stratifiedSample(docs, "s", thresh)
    assert(s.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
  }

  test("sourceMixSample downsamples every source toward the smallest") {
    // src0: 3000 docs, src1: 300 → src0 keeps ~10%, src1 keeps ~100%
    val docs = ((0L until 3000L).map(i => (i, "src0", "t")) ++
      (3000L until 3300L).map(i => (i, "src1", "t")))
      .toDF("doc_id", "source", "text")
    val out = Corpus.sourceMixSample(docs, "m").cache()
    assert(out.count() == 3300) // keep-list form: every doc, flagged
    val kept = out.filter(col("kept")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(kept("src0") - 300.0) < 60, kept)
    assert(kept("src1") > 250, kept) // rate 1.0 keeps (nearly) everything
    // deterministic: same seed → same keep-list
    val again = Corpus.sourceMixSample(docs, "m")
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(again == out.filter(col("kept")).select("doc_id").as[Long].collect().toSet)
  }

  test("perGroupSample returns exactly k deterministic rows per group") {
    val docs = (0L until 500L).map(i => (i, s"src${i % 4}", "t"))
      .toDF("doc_id", "source", "text")
    val s = Corpus.perGroupSample(docs, "p", 5).cache()
    val by = s.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(by.values.forall(_ == 5) && by.size == 4)
    // ranks are 1..k and the pick is stable across runs
    assert(s.select("rnk").as[Int].collect().sorted.toSeq == Seq.fill(4)(1 to 5).flatten.sorted)
    val again = Corpus.perGroupSample(docs, "p", 5).select("doc_id").as[Long].collect().toSet
    assert(again == s.select("doc_id").as[Long].collect().toSet)
  }

  test("chi2Drift is exactly zero for homogeneous populations") {
    // consecutive (even, odd) event_id pairs share a type → 50/50 split
    val ev = (0L until 400L).map(i => (i, s"t${(i / 2) % 4}"))
      .toDF("event_id", "event_type")
    val got = Corpus.chi2Drift(ev).select("chi2").as[Double].collect()
    assert(got.length == 4 && got.forall(_ == 0.0), got.toSeq)
  }

  test("docFilter flags short, low-quality, and PII documents") {
    val good = "the quick brown foxes jumped over " * 6 + "the lazy dogs"
    val docs = Seq(
      (1L, good),
      (2L, "tiny doc"),
      (3L, good + " contact bob@example.com")
    ).toDF("doc_id", "text")
    val got = Corpus.docFilter(docs)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false), got)
  }

  test("Memo isolates materialized frames per (session, dir)") {
    // the same memoized query against two sf dirs must not cross-serve
    val a = QueriesEstimators.trueCardQ(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = QueriesEstimators.trueCardQ(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a.keySet == b.keySet)
    assert(a != b, "sf0.001 and sf0.01 true cards should differ")
  }

  test("stratifiedSample is stateless: identical on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sc = spark.sqlContext
    val docs = (0L until 500L).map(i => (i, s"src${i % 2}", "t"))
    val thresh = when(expr("CAST(substring(source, 4) AS INT)") % 2 === 0,
      lit(Corpus.thresholdHex(0.5))).otherwise(lit(Corpus.thresholdHex(0.1)))
    val batch = Corpus
      .stratifiedSample(docs.toDF("doc_id", "source", "text"), "s", thresh)
      .select("doc_id").as[Long].collect().toSet
    val ms = MemoryStream[(Long, String, String)]
    ms.addData(docs: _*)
    val q = Corpus
      .stratifiedSample(ms.toDF.toDF("doc_id", "source", "text"), "s", thresh)
      .writeStream.format("memory").queryName("strat_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("strat_stream").select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("bpePairs counts adjacent char pairs weighted by word frequency") {
    // "abab" ×2 docs + "ba": pairs from abab = ab,ba,ab (weight 2 each
    // occurrence) → ab: 2·2=4, ba: 2·1=2 + word "ba": +1 = 3
    val docs = Seq((1L, "abab"), (2L, "abab ba")).toDF("doc_id", "text")
    val got = Corpus.bpePairs(docs, 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L), ("ba", 3L)), got)
  }

  test("substringDup covers exactly the repeated-gram spans") {
    // docs 1/2 share their full 10-token text (all positions covered);
    // doc 3 is unique (omitted from output)
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared),
      (3L, (1 to 12).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val byDoc = Corpus.substringDup(docs, 10)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byDoc.keySet == Set(1L, 2L))
    assert(byDoc(1L) == ((10L, 10L, 1.0)) && byDoc(2L) == ((10L, 10L, 1.0)), byDoc)
  }

  test("repetitionRatio detects repeated content") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val got = Corpus.repetitionRatio(docs)
      .select("doc_id", "dup_word_ratio", "top_word_ratio", "dup_bigram_ratio")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val (dw1, tw1, db1) = got(1L)
    assert(math.abs(dw1 - (1.0 - 1.0 / 6)) < 1e-12 && tw1 == 1.0 &&
      math.abs(db1 - (1.0 - 1.0 / 5)) < 1e-12, got(1L))
    assert(got(2L) == ((0.0, 0.25, 0.0)), got(2L))
  }

  test("bpeTrain replays greedy BPE by hand: overlaps, ties, and merged-symbol pairs") {
    import spark.implicits._
    // words: abab x3, ab x2, aaa x4 — hand-computed merge sequence:
    //  1. ties (a,a)=8 vs (a,b)=8 -> lexicographic (a,a); greedy
    //     left-to-right turns "a a a" into "aa a" (overlap handling)
    //  2. (a,b)=8
    //  3. (aa,a)=4 beats (ab,ab)=3 — a pair of MERGED symbols
    //  4. (ab,ab)=3
    val vocab = Seq(("abab", 3L), ("ab", 2L), ("aaa", 4L))
      .toDF("word", "c")
      .select(col("c"), concat(lit(" "),
        concat_ws("  ",
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")),
        lit(" ")).as("seq"))
    val got = Corpus.bpeTrain(vocab, 4)
    assert(got == Seq(
      (1, "a", "a", "aa", 8L),
      (2, "a", "b", "ab", 8L),
      (3, "aa", "a", "aaa", 4L),
      (4, "ab", "ab", "abab", 3L)), got)
  }
}

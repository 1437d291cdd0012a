package graft

import org.apache.spark.sql.functions._

import graft.operators.{Metrics, TextOps}
import graft.query.{Engine, PseudoSql}

class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("quantilesNearest with a single row returns it for every quantile") {
    val got = Metrics.quantilesNearest(Seq(42.0).toDF("v"), "v")
      .as[(Double, Double)].collect().toSeq
    assert(got == Metrics.quantiles.map(q => (q, 42.0)))
  }

  test("Engine rejects a disconnected join graph") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM lineitem, region WHERE l_quantity > 0")
    val ex = intercept[IllegalArgumentException] {
      Engine.plan(q, t => Tables(spark, sf, t))
    }
    assert(ex.getMessage.contains("disconnected"))
  }

  test("Engine resolves join edges whose column name matches on both sides") {
    // The reference's IMDB workloads join mc.movie_id = ci.movie_id —
    // same column name on both sides. Table aliases must make the edge
    // resolve per-table instead of being ambiguous or trivially true.
    val mc = Seq((1L, 10L), (2L, 20L)).toDF("movie_id", "company_id")
    val ci = Seq((1L, 100L), (1L, 101L), (3L, 102L)).toDF("movie_id", "person_id")
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM mc, ci WHERE mc.movie_id = ci.movie_id AND ci.person_id >= 101")
    val cnt = Engine.count(q, Map("mc" -> mc, "ci" -> ci)(_))
      .collect()(0).getLong(0)
    assert(cnt == 1L)
  }

  test("Engine turns redundant cycle edges into filters (job-m shape)") {
    // t.id = mc.movie_id AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id
    // — the third edge closes a cycle and must become a residual filter,
    // not a third join.
    val t = Seq((1L, 2005), (2L, 2012)).toDF("id", "year")
    val mc = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("movie_id", "company_id")
    val ci = Seq((1L, 100L), (2L, 101L), (2L, 102L)).toDF("movie_id", "person_id")
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM t, mc, ci WHERE t.id = mc.movie_id" +
        " AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id AND t.year > 2010")
    val cnt = Engine.count(q, Map("t" -> t, "mc" -> mc, "ci" -> ci)(_))
      .collect()(0).getLong(0)
    // movie 2: 2 mc rows × 2 ci rows = 4
    assert(cnt == 4L)
  }

  test("queries without WHERE parse to empty joins and predicates") {
    val q = PseudoSql.parse("SELECT COUNT(*) FROM orders")
    assert(q.tables == Seq("orders") && q.joins.isEmpty && q.predicates.isEmpty)
  }

  test("short documents produce no 3-shingles but don't fail") {
    val d = Seq((1L, "only two"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    assert(TextOps.docShingles(d, 3).count() == 0)
    val arrays = TextOps.shingleArrays(d, 3)
      .select(col("doc_id"), size(col("sh")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(arrays == Map(1L -> 0, 2L -> 0, 3L -> 0))
  }

  test("simhash band join never pairs a doc with itself") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val dups = TextOps.simhashDups(TextOps.simhashBands(d), 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(dups == Seq((1L, 2L, 0L)))
  }

  test("dictEncode on an all-null column maps every row to the NULL code") {
    val d = Seq[Option[String]](None, None).toDF("v")
    val got = graft.operators.Encoding.dictEncode(d, "v", "code")
      .select("code").as[Int].collect().toSeq
    assert(got == Seq(1, 1))
  }

  test("lshCandidatesCollapsed equals the naive band self-join on mixed data") {
    val d = (1L to 30L).map { i =>
      // 3 exact-dup families of 5 plus 15 distinct docs
      val text =
        if (i <= 15L) s"shared boilerplate family ${i % 3} repeated words here"
        else s"unique document number $i with its own words $i $i"
      (i, text)
    }.toDF("doc_id", "text")
    val sigs = TextOps.minhashWide(TextOps.docShingles(d, 3))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    val naive = pairs(TextOps.lshCandidates(TextOps.lshBands(sigs)))
    val collapsed = pairs(TextOps.lshCandidatesCollapsed(sigs))
    assert(collapsed == naive)
  }

  test("lshCandidatesCollapsed bounds the band join on an all-identical corpus") {
    val k = 50
    val d = (1L to k.toLong).map((_, "the exact same document body for every single row"))
      .toDF("doc_id", "text")
    val sigs = TextOps.minhashWide(TextOps.docShingles(d, 3))
    // one signature group → the band self-join sees ONE representative
    // (numBands rows), not k docs × numBands buckets
    val nGroups = sigs.withColumn("sig_key", TextOps.sigKeyExpr)
      .select("sig_key").distinct().count()
    assert(nGroups == 1L)
    val reps = sigs.withColumn("sig_key", TextOps.sigKeyExpr)
      .groupBy(col("sig_key")).agg(min(col("doc_id")).as("doc_id"))
    assert(TextOps.lshBands(sigs.join(reps.select("doc_id"), Seq("doc_id"), "leftsemi"))
      .count() == TextOps.numBands.toLong)
    // output is still the full pair set (they ARE all duplicates)
    assert(TextOps.lshCandidatesCollapsed(sigs).count() == (k * (k - 1) / 2).toLong)
  }

  test("fuzzy candidate blocking is length-bounded and loses no qualifying pair") {
    // prefix lengths spread 2..40 so truncated/empty segment keys and
    // the ±τ length band are all exercised, not just the full-cap path
    val base = "the quick brown fox jumps over the lazy dog body"
    val p = ((1L to 40L).map { i =>
      (i, "s" + (i % 2), "ab" * (1 + (i % 20)).toInt)
    } ++
      // front-inserted variants: qualifying pairs whose intact segments
      // sit at SHIFTED positions (the case aligned-only blocking misses)
      (0 to 7).map(k => (100L + k, "s0", ("z" * k + base).take(40))))
      .toDF("doc_id", "source", "pre")
    val cands = QueriesText.fuzzyCandidates(p)
      .select($"doc_a", $"doc_b", length($"pa").as("la"), length($"pb").as("lb"))
    // every candidate's length gap is inside the exact ±τ band
    val maxGap = cands.agg(max(abs($"la" - $"lb"))).as[Int].collect().head
    assert(maxGap <= QueriesText.fuzzyMaxDist, s"gap $maxGap")
    // blocking candidates ⊂ naive pairs, and no dist ≤ τ pair is lost
    val naive = p.select($"source", $"doc_id".as("doc_a"), $"pre".as("pa"))
      .join(p.select($"source", $"doc_id".as("doc_b"), $"pre".as("pb")), Seq("source"))
      .filter($"doc_a" < $"doc_b")
      .withColumn("dist", levenshtein($"pa", $"pb"))
      .filter($"dist" <= QueriesText.fuzzyMaxDist)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val blocked = QueriesText.fuzzyCandidates(p)
      .withColumn("dist", levenshtein($"pa", $"pb"))
      .filter($"dist" <= QueriesText.fuzzyMaxDist)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(blocked == naive)
  }

  test("fuzzy blocking is exhaustive on randomized edit families (indels, subs, truncation)") {
    // Adversarial randomized recall check for the PassJoin-style
    // segment blocking: seed strings over a tiny alphabet (forcing
    // segment collisions), partners derived by random edit scripts of
    // every length 0..12 (past τ=8, so the naive truth set includes
    // boundary cases on both sides), lengths spanning the short-string
    // truncated/empty-segment paths. The blocked+verified pair set
    // must equal the naive quadratic truth on every seeded corpus.
    val alphabet = "abc "
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      def randStr(n: Int): String =
        (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      def edit(s: String): String = {
        val sb = new StringBuilder(s)
        val k = rnd.nextInt(13)
        for (_ <- 1 to k) {
          val op = rnd.nextInt(3)
          if (sb.isEmpty || op == 0) // insert
            sb.insert(rnd.nextInt(sb.length + 1), alphabet(rnd.nextInt(alphabet.length)))
          else if (op == 1) sb.deleteCharAt(rnd.nextInt(sb.length))
          else sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(alphabet.length)))
        }
        sb.toString
      }
      val docs = (1 to 20).flatMap { fam =>
        val base = randStr(rnd.nextInt(61)) // 0..60 chars, many < cap
        base +: (1 to 3).map(_ => edit(base))
      }
      val p = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, s"s${i % 2}", t.take(QueriesText.fuzzyPrefixLen)) }
        .toDF("doc_id", "source", "pre")
      val naive = p.select($"source", $"doc_id".as("doc_a"), $"pre".as("pa"))
        .join(p.select($"source", $"doc_id".as("doc_b"), $"pre".as("pb")), Seq("source"))
        .filter($"doc_a" < $"doc_b")
        .filter(levenshtein($"pa", $"pb") <= QueriesText.fuzzyMaxDist)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val blocked = QueriesText.fuzzyCandidates(p)
        .filter(levenshtein($"pa", $"pb") <= QueriesText.fuzzyMaxDist)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(blocked == naive,
        s"seed $seed: missing ${naive -- blocked}, extra ${blocked -- naive}")
      assert(naive.nonEmpty, s"seed $seed produced a vacuous truth set")
    }
  }

  test("ngram_jaccard: multi-family corpus — cross-group expansion and (lang,source) filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_njc").toString
    val docs = Seq(
      // family A (en/web): one exact-dup pair + two near-dups
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "web"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "web"),
      (3L, "the quick brown fox jumps over the lazy dog and runs away slow", "en", "web"),
      (4L, "the quick brown fox jumps over the lazy dog and walks away fast", "en", "web"),
      // identical text, different lang — a CANDIDATE the filter must drop
      (5L, "the quick brown fox jumps over the lazy dog and runs away fast", "de", "web"),
      // family B (en/book): an all-identical group (sig-collapse path)
      (6L, "pack my box with five dozen liquor jugs said the old brewer today", "en", "book"),
      (7L, "pack my box with five dozen liquor jugs said the old brewer today", "en", "book"),
      (8L, "pack my box with five dozen liquor jugs said the old brewer today", "en", "book"),
      // identical to family B, different source — candidate, filtered
      (9L, "pack my box with five dozen liquor jugs said the old brewer today", "en", "web"),
      (10L, "completely different content about numerical linear algebra routines", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    docs.write.parquet(s"$dir/documents.parquet")
    val got = QueriesText.ngramJaccardQ(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // independent reference: the NAIVE (uncollapsed) band join + brute
    // bigram-set Jaccard with the lang/source equality inside the join —
    // the DuckDB oracle's formulation re-expressed in Spark
    val cands = TextOps.lshCandidates(
      TextOps.lshBands(TextOps.minhashWide(TextOps.docShingles(docs, 3))))
    val sets = TextOps.shingleArrays(docs, 2, extraCols = Seq("lang", "source"))
    val want = cands
      .join(sets.select($"doc_id".as("doc_a"), $"lang", $"source",
        $"sh".as("sha"), size($"sh").as("na")), "doc_a")
      .join(sets.select($"doc_id".as("doc_b"), $"lang".as("lb"),
        $"source".as("sb"), $"sh".as("shb"), size($"sh").as("nb")), "doc_b")
      .filter($"lang" === $"lb" && $"source" === $"sb")
      .withColumn("inter", size(array_intersect($"sha", $"shb")))
      .filter($"inter" > 0)
      .select($"doc_a", $"doc_b",
        ($"inter".cast("double") / ($"na" + $"nb" - $"inter").cast("double")).as("j"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.sorted == want.sorted)
    val pairs = got.map(t => (t._1, t._2)).toSet
    // identical-signature pairs are candidates by construction
    assert(Set((1L, 2L), (6L, 7L), (6L, 8L), (7L, 8L)).subsetOf(pairs))
    got.filter(t => Set((1L, 2L), (6L, 7L)).contains((t._1, t._2)))
      .foreach(t => assert(t._3 == 1.0, s"exact dup pair $t"))
    // the cross-(lang, source) exact dups WERE candidates…
    val rawPairs = cands.as[(Long, Long)].collect().toSet
    assert(Set((1L, 5L), (6L, 9L)).subsetOf(rawPairs))
    // …and the filter dropped every one of them: doc 5 (de) pairs with
    // nothing; doc 9 (web) never pairs into the book family
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
    assert(!pairs.exists { case (a, b) =>
      Set(a, b).contains(9L) && Set(a, b).intersect(Set(6L, 7L, 8L)).nonEmpty })
  }
}

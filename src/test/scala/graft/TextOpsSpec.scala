package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("docShingles: 3-shingles of tokenized text, distinct") {
    val got = TextOps.docShingles(docs(1L -> "The quick brown fox, the quick brown fox"), 3)
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "the quick brown"), (1L, "quick brown fox"),
      (1L, "brown fox the"), (1L, "fox the quick")))
  }

  test("minhash: identical docs get identical signatures; determinism") {
    val d = docs(1L -> "a b c d e f g", 2L -> "a b c d e f g", 3L -> "x y z w v u t")
    val sig = TextOps.minhashLong(TextOps.docShingles(d, 3))
      .as[(Long, Int, String)].collect()
    val byDoc = sig.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L) != byDoc(3L))
    assert(byDoc(1L).size == TextOps.numPerms)
  }

  test("jaccard: exact set overlap on candidate pairs") {
    val d = docs(1L -> "a b c d", 2L -> "a b c e", 3L -> "p q r s")
    val sh = TextOps.docShingles(d, 2) // doc1: {a b, b c, c d}, doc2: {a b, b c, c e}
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = TextOps.jaccard(pairs, sh)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => ((a, b), j) }.toMap
    assert(math.abs(got((1L, 2L)) - 2.0 / 4.0) < 1e-12)
    assert(!got.contains((1L, 3L))) // no shared shingle → not emitted
  }

  test("simhash: near-identical docs within hamming 3, disjoint docs are not") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // identical → hamming 0
      3L -> "one two three four five six seven eight nine ten")
    val dups = TextOps.simhashDups(TextOps.simhashBands(d), 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(dups.contains((1L, 2L, 0L)))
    assert(!dups.exists(t => t._2 == 3L || t._1 == 3L))
  }

  test("langId picks the profile with most stopword hits, tie-break by lang") {
    val d = docs(1L -> "the cat of the house and a dog", 2L -> "der hund und die katze ist nicht")
    val got = TextAnalysis.langId(d).as[(Long, String, Int)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
  }

  test("fingerprint: whitespace/punct-insensitive") {
    val d = docs(1L -> "Hello,   World!", 2L -> "hello world", 3L -> "different")
    val fp = TextAnalysis.fingerprint(d).as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("tfidfTopTerms ranks rare frequent terms first, rational idf") {
    val d = docs(1L -> "apple apple banana", 2L -> "banana cherry")
    val got = TextAnalysis.tfidfTopTerms(d, 2)
      .as[(Long, Int, String, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
    // N=2; df: apple 1, banana 2, cherry 1
    assert(got == Seq(
      (1L, 1, "apple", 4.0), (1L, 2, "banana", 1.0),
      (2L, 1, "cherry", 2.0), (2L, 2, "banana", 1.0)))
  }

  test("seq_pack tiles each lang stream contiguously in doc_id order") {
    val got = QueriesText.seqPackQ(spark, sf)
      .select("lang", "n_tokens", "pack_id", "pack_offset")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // offsets reconstruct the running sum: pack_id*cap + pack_offset is
    // nondecreasing per lang and each doc starts where the previous ended
    got.groupBy(_._1).values.foreach { docs =>
      val starts = docs.map(d => d._3 * QueriesText.packCapacity + d._4)
      assert(starts.zip(starts.drop(1)).zip(docs.map(_._2)).forall {
        case ((s0, s1), n) => s1 == s0 + n
      })
    }
    assert(got.forall(d => d._4 >= 0 && d._4 < QueriesText.packCapacity))
  }

  test("incremental dedup flags only batch docs, candidates gate near-dups") {
    val got = QueriesText.incrementalDedupQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.nonEmpty && got.forall(_._1 % 10 == 9))
    // a near-dup verdict requires at least one LSH band candidate
    assert(got.forall { case (_, cands, _, near) => !near || cands > 0 })
  }

  test("connectedComponents resolves transitive chains to the min label") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (7L, 6L), (9L, 9L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Components
      .connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 6L -> 6L, 7L -> 6L, 9L -> 9L))
  }

  test("piiScrub counts and redacts emails/phones; clean docs untouched") {
    val d = docs(
      1L -> "write to jo.doe+x@mail.example.org or call 030-555-1234 now",
      2L -> "two mails: a@b.co and c.d@e-f.org, phone 0123-4567 is too short",
      3L -> "nothing sensitive here")
    val got = TextAnalysis.piiScrub(d)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L)._1 == 1L && got(1L)._2 == 1L)
    assert(got(2L)._1 == 2L && got(2L)._2 == 0L)
    assert(got(3L)._1 == 0L && got(3L)._2 == 0L)
    // doc 3 unchanged → fingerprint equals md5 of the raw text
    val raw = d.filter(col("doc_id") === 3L).select(md5(col("text"))).head.getString(0)
    assert(got(3L)._3 == raw)
    assert(got(1L)._3 != raw)
  }

  test("urlStats aggregates match counts per source") {
    import spark.implicits._
    val d = Seq(
      (1L, "see https://example.org/a and http://b.io/x?", "web"),
      (2L, "no links", "web"),
      (3L, "https://example.org/path_%20ok trailing", "crawl"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.urlStats(d)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got("web") == ((2L, 2L, 1L)))
    assert(got("crawl") == ((1L, 1L, 1L)))
  }
}

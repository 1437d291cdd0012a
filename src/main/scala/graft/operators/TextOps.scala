package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * tokenization, shingling, MinHash + banded LSH, SimHash, exact n-gram
  * Jaccard. Everything is built from codegen'd `functions._` expressions —
  * no UDFs — and every hash is md5-derived so the DuckDB oracle can
  * reproduce values exactly.
  *
  * Scale notes: signatures are per-doc aggregations (one shuffle on
  * doc_id); LSH candidate generation is a self-join on (band, band_key) —
  * co-partitioned by construction; exact verification only touches
  * candidate pairs, never the full N² cross product.
  */
object TextOps {

  /** Lowercased alphanumeric tokens, empties dropped. */
  val tokensExpr: Column =
    expr("filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')")

  /** Word k-shingles (k=3) joined by single spaces. */
  val shingles3Expr: Column =
    expr(
      """CASE WHEN size(__ws) >= 3
        |  THEN transform(sequence(1, size(__ws) - 2),
        |                 i -> concat_ws(' ', __ws[i-1], __ws[i], __ws[i+1]))
        |  ELSE array() END""".stripMargin)

  /** Word bigrams. */
  val shingles2Expr: Column =
    expr(
      """CASE WHEN size(__ws) >= 2
        |  THEN transform(sequence(1, size(__ws) - 1),
        |                 i -> concat_ws(' ', __ws[i-1], __ws[i]))
        |  ELSE array() END""".stripMargin)

  /** 52-bit md5 hashes of word 4-grams, in document order (winnowing
    * input). Empty for docs under 4 words.
    */
  val gramHashes4Expr: Column =
    expr(
      """CASE WHEN size(__ws) >= 4
        |  THEN transform(sequence(1, size(__ws) - 3),
        |    i -> cast(conv(substring(md5(concat_ws(' ',
        |           __ws[i-1], __ws[i], __ws[i+1], __ws[i+2])), 1, 13), 16, 10) as bigint))
        |  ELSE array() END""".stripMargin)

  /** Winnowing (the MOSS fingerprint scheme): distinct minima over every
    * sliding window of 4 consecutive gram hashes — guarantees any match
    * of ≥ k+w−1 = 7 words shares a fingerprint. Short docs (1..3 grams)
    * contribute the min of what they have. Pure per-document array
    * expressions over `__hs` — codegen'd, zero shuffle.
    */
  val winnowExpr: Column =
    expr(
      """CASE WHEN size(__hs) = 0 THEN array()
        |  ELSE array_distinct(transform(
        |    sequence(1, greatest(size(__hs) - 3, 1)),
        |    p -> array_min(slice(__hs, p, 4))))
        |  END""".stripMargin)

  /** Per-doc winnowing fingerprints: (doc_id, fp) rows. */
  def winnowFingerprints(documents: DataFrame): DataFrame =
    winnowFingerprintsToks(documents.select(col("doc_id"), tokensExpr.as("__ws")))

  /** [[winnowFingerprints]] over a pre-tokenized (doc_id, __ws) frame —
    * callers holding the memoized tokenized corpus skip the re-tokenize. */
  def winnowFingerprintsToks(toks: DataFrame): DataFrame =
    toks
      .select(col("doc_id"), gramHashes4Expr.as("__hs"))
      .select(col("doc_id"), explode(winnowExpr).as("fp"))

  private def shinglesFor(k: Int): Column = k match {
    case 2 => shingles2Expr
    case 3 => shingles3Expr
    case other => throw new IllegalArgumentException(s"k=$other")
  }

  /** Distinct (doc_id, shingle) pairs for word k-shingles, k ∈ {2,3}. */
  def docShingles(documents: DataFrame, k: Int): DataFrame =
    docShinglesToks(documents.select(col("doc_id"), tokensExpr.as("__ws")), k)

  /** [[docShingles]] over a pre-tokenized (doc_id, __ws) frame. */
  def docShinglesToks(toks: DataFrame, k: Int): DataFrame =
    toks
      .select(col("doc_id"), explode(shinglesFor(k)).as("shingle"))
      .distinct()

  /** Distinct shingle SET per doc as one array column — for workloads
    * that verify many candidate pairs per doc, shipping the set once per
    * pair (array_intersect) beats the exploded shingle self-join.
    */
  def shingleArrays(documents: DataFrame, k: Int, extraCols: Seq[String] = Nil): DataFrame =
    shingleArraysToks(
      documents.select((col("doc_id") +: extraCols.map(col)) :+ tokensExpr.as("__ws"): _*), k)

  /** [[shingleArrays]] over a pre-tokenized frame carrying __ws plus any
    * companion columns the caller wants kept. */
  def shingleArraysToks(toks: DataFrame, k: Int): DataFrame =
    toks
      .withColumn("sh", array_distinct(shinglesFor(k)))
      .drop("__ws")

  val numPerms = 16

  /** Portable MinHash: perm i's hash of a shingle is md5("i:" ++ shingle)
    * (lowercase hex); the signature entry is the lexicographic minimum.
    * Computed as one aggregation with numPerms min() columns — the shuffle
    * carries docs × numPerms strings, not docs × shingles × numPerms rows.
    * Wide layout (doc_id, m0..m15).
    */
  def minhashWide(shingles: DataFrame): DataFrame = {
    val aggs = (0 until numPerms).map { i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"m$i")
    }
    shingles.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Long-format signature (doc_id, seed, minhash). */
  def minhashLong(shingles: DataFrame): DataFrame =
    minhashWide(shingles)
      .select(
        col("doc_id"),
        posexplode(array((0 until numPerms).map(i => col(s"m$i")): _*)))
      .withColumnRenamed("pos", "seed")
      .withColumnRenamed("col", "minhash")

  val numBands = 8 // 16 perms → 8 bands × 2 rows

  /** (doc_id, band, band_key): band b hashes perms (2b, 2b+1) together. */
  def lshBands(sigs: DataFrame): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until numBands).map { b =>
        md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}")))
      }: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")

  /** Distinct candidate pairs (doc_a < doc_b) sharing ≥1 LSH band. The
    * self-join key (band, band_key) co-partitions both sides; bucket
    * sizes stay tiny because a 2-perm band only collides for
    * high-similarity docs (P = J²).
    */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** md5 key over the full 16-perm signature — identical docs (and any
    * minhash-identical docs) collapse to one key.
    */
  val sigKeyExpr: Column =
    md5(concat_ws("|", (0 until numPerms).map(i => col(s"m$i")): _*))

  /** [[lshCandidates]] with an exact-signature collapse in front of the
    * band self-join. A web-scale corpus always contains large groups of
    * identical (or minhash-identical) documents; naively those k docs
    * land k deep in every one of their 8 band buckets and the self-join
    * does 8 × k² work for pairs that are known-identical by
    * construction. Instead:
    *   1. group docs by [[sigKeyExpr]]; pick min(doc_id) as the group
    *      representative;
    *   2. run the band self-join over REPRESENTATIVES only — bucket
    *      depth is bounded by the number of distinct signatures in the
    *      bucket, not the number of documents;
    *   3. expand representative pairs back through group membership, and
    *      emit each group's internal pairs directly from one
    *      co-partitioned equi-join on sig_key.
    * Docs in one group share every band; docs in different groups share
    * a band iff their representatives do — so the result is exactly the
    * candidate set of the naive form (verified by EdgeCaseSpec), while
    * the quadratic term only ever materializes candidate OUTPUT rows,
    * never × 8 band replicas.
    */
  def lshCandidatesCollapsed(sigs: DataFrame): DataFrame = {
    val keyed = sigs.withColumn("sig_key", sigKeyExpr)
    val members = keyed.select(col("sig_key"), col("doc_id"))
    val reps = members.groupBy(col("sig_key")).agg(min(col("doc_id")).as("doc_id"))
    val repBands = lshBands(keyed.join(reps, Seq("sig_key", "doc_id"), "leftsemi"))
    val repKey = reps.select(col("doc_id"), col("sig_key"))
    val crossKeys = lshCandidates(repBands)
      .join(repKey.select(col("doc_id").as("doc_a"), col("sig_key").as("ka")), "doc_a")
      .join(repKey.select(col("doc_id").as("doc_b"), col("sig_key").as("kb")), "doc_b")
      .select(col("ka"), col("kb"))
    val crossPairs = crossKeys
      .join(members.select(col("sig_key").as("ka"), col("doc_id").as("da")), "ka")
      .join(members.select(col("sig_key").as("kb"), col("doc_id").as("db")), "kb")
      .select(least(col("da"), col("db")).as("doc_a"), greatest(col("da"), col("db")).as("doc_b"))
    val intraPairs = members
      .join(members.select(col("sig_key"), col("doc_id").as("doc_b")), "sig_key")
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
    // Disjoint by construction (same-key vs different-key pairs) and each
    // unordered pair arises exactly once — no final distinct needed.
    crossPairs.unionAll(intraPairs)
  }

  /** Exact shingle-set Jaccard for the given (doc_a, doc_b) pairs:
    * inter via shingle-equality join restricted to candidates, sizes via
    * per-doc distinct counts. Only candidate pairs are ever materialized.
    */
  def jaccard(pairs: DataFrame, shingles: DataFrame): DataFrame = {
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Restrict each side to docs that actually appear in a candidate pair
    // BEFORE the shingle self-join — when candidates are sparse (LSH) this
    // collapses the join's input from the whole corpus to the near-dups.
    val a = shingles
      .join(pairs.select(col("doc_a").as("doc_id")).distinct(), Seq("doc_id"), "leftsemi")
      .select(col("doc_id").as("doc_a"), col("shingle"))
    val b = shingles
      .join(pairs.select(col("doc_b").as("doc_id")).distinct(), Seq("doc_id"), "leftsemi")
      .select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a
      .join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .join(pairs, Seq("doc_a", "doc_b"), "leftsemi")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
  }

  // ---- SimHash ----

  /** 64-bit SimHash held as 4 × 16-bit band integers (b0..b3) so both
    * Spark and the oracle stay inside exact signed-64 arithmetic. Token
    * bits come from the first 16 hex digits of md5(token); per-bit votes
    * are +1/-1 over the doc's distinct tokens; a tie votes 1.
    */
  def simhashBands(documents: DataFrame): DataFrame =
    simhashBandsToks(documents.select(col("doc_id"), tokensExpr.as("__ws")))

  /** [[simhashBands]] over a pre-tokenized (doc_id, __ws) frame. */
  def simhashBandsToks(toks: DataFrame): DataFrame = {
    // Custom typed aggregation (graft.functions.SimHashVotes): built-ins
    // would need a per-bit or per-digit explode plus a second shuffle —
    // the Aggregator folds all 64 votes per token in one pass, with
    // map-side partial aggregation, one shuffle total.
    val simhash = udaf(new graft.functions.SimHashVotes)
    toks
      // distinct tokens resolved row-locally (array_distinct) — no
      // corpus-wide (doc_id, word) distinct shuffle before the aggregate
      .select(col("doc_id"), explode(array_distinct(col("__ws"))).as("word"))
      .groupBy(col("doc_id"))
      .agg(simhash(col("word")).as("__bands"))
      .select(
        col("doc_id"),
        col("__bands")(0).as("b0"), col("__bands")(1).as("b1"),
        col("__bands")(2).as("b2"), col("__bands")(3).as("b3"))
  }

  /** Band-bucket population above which the second-level pigeonhole
    * kicks in (see [[simhashCandidates]]): a bucket of ≤ cap docs
    * contributes at most C(cap, 2) pairs — bounded work per bucket —
    * while anything larger is re-split so no single key ever owns an
    * unbounded quadratic. Dial measured in PairGrowthAuditSpec on both
    * test corpora. */
  val simhashHotCap = 32L

  /** Candidate pairs for hamming ≤ 3 over the 4 × 16-bit bands, with a
    * LOSSLESS second-level pigeonhole on hot buckets: a qualifying
    * pair shares some band b exactly (first pigeonhole), so its ≤ 3
    * differing bits all lie in the 48 complement bits; splitting those
    * into 4 sub-bands of 12 bits, at least one sub-band is also exact
    * (second pigeonhole — 3 diffs cannot hit 4 sub-bands). Buckets at
    * or under [[simhashHotCap]] join directly; hot buckets join on
    * (band key, sub-band id, sub-band value), converting one hot-key
    * quadratic into 4 unions of sub-bucket quadratics. At 100 TB this
    * is the skew guard: a degenerate signature cluster (boilerplate
    * corpus slice) caps per-task pair fan-out at the sub-bucket level
    * instead of melting one reducer; the hot-key list itself is ≤
    * n/cap rows — broadcastable by construction.
    */
  def simhashCandidates(bands: DataFrame,
      hotCap: Long = simhashHotCap): DataFrame =
    (0 until 4).map { b =>
      val others = (0 until 4).filter(_ != b)
      // exact 48-bit complement of band b as one long (each band is a
      // 16-bit value, so the polynomial concat stays < 2^48)
      val comp = others.zipWithIndex
        .map { case (o, i) => col(s"b$o") * lit(1L << (16 * i)) }
        .reduce(_ + _)
      val keyed = bands.select(
        col("doc_id"), col(s"b$b").as("__k"), comp.as("__c"))
      val hot = keyed.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > hotCap).select(col("__k"))
      val cold = keyed.join(broadcast(hot), Seq("__k"), "left_anti")
      val coldPairs = cold.select(col("doc_id").as("doc_a"), col("__k"))
        .join(cold.select(col("doc_id").as("doc_b"), col("__k")), Seq("__k"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
      val sub = keyed.join(broadcast(hot), Seq("__k"))
        .select(col("doc_id"), col("__k"),
          explode(array((0 until 4).map(s => struct(lit(s).as("s"),
            shiftright(col("__c"), 12 * s).bitwiseAND(lit(4095L)).as("v"))): _*))
            .as("__sb"))
        .select(col("doc_id"), col("__k"),
          col("__sb.s").as("__s"), col("__sb.v").as("__v"))
      val hotPairs = sub.select(col("doc_id").as("doc_a"), col("__k"), col("__s"), col("__v"))
        .join(sub.select(col("doc_id").as("doc_b"), col("__k"), col("__s"), col("__v")),
          Seq("__k", "__s", "__v"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
      coldPairs.unionAll(hotPairs)
    }.reduce(_.unionAll(_)).distinct()

  /** Near-dup pairs with Hamming distance ≤ maxHamming (< 4): any pair
    * within that distance must share at least one of the 4 bands
    * (pigeonhole), so candidates come from 4 equi-joins, never N² —
    * with hot band buckets re-split by [[simhashCandidates]]'s
    * second-level pigeonhole (output-identical: the blocking is
    * lossless for hamming ≤ 3, only the candidate set shrinks).
    */
  def simhashDups(bands: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < 4, "band pigeonhole only covers hamming < #bands")
    val cands = simhashCandidates(bands)
    val la = bands.select(col("doc_id").as("doc_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val lb = bands.select(col("doc_id").as("doc_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cands
      .join(la, "doc_a")
      .join(lb, "doc_b")
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond per-doc analysis: deterministic stratified sampling,
  * distribution-drift testing, corpus n-gram statistics, rule-based
  * document filtering, and repetition signals (the Gopher/C4 quality
  * rule family). Everything is codegen'd expressions + at most one keyed
  * aggregation — no collects, no UDFs.
  */
object Corpus {

  /** Hex threshold for a sampling fraction over the first 8 md5 hex
    * digits (uniform on [0, 16^8)): keep iff hex8 < thresholdHex(f).
    */
  def thresholdHex(frac: Double): String =
    f"${(frac * 4294967296d).toLong}%08x"

  /** Deterministic stratified sampling: a doc is kept iff the first 8
    * hex digits of md5(seed:doc_id) fall below the per-row threshold
    * (derived from the row's stratum fraction). A pure filter — no
    * shuffle, no state, independent of partitioning, reproducible at
    * any scale, and stable under re-runs (the same doc is always in or
    * out of the sample).
    */
  def stratifiedSample(documents: DataFrame, seed: String, threshold: Column): DataFrame =
    documents
      .select(
        col("doc_id"), col("source"),
        substring(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), 1, 8).as("h8"))
      .filter(col("h8") < threshold)

  /** Rebalance the corpus toward a uniform source mix: each source is
    * downsampled to (approximately) the smallest source's size with the
    * same deterministic md5-threshold filter as stratifiedSample — keep
    * iff u · n_src < min_src · 2³², where u is the 32-bit uniform from
    * md5(seed:doc_id). The per-source counts are one keyed aggregation
    * broadcast back onto the scan; the keep decision itself is a pure
    * row-local filter (reproducible at any scale and partitioning).
    * Products go through DECIMAL(38,0) so the comparison stays exact
    * even when a source holds billions of documents.
    */
  def sourceMixSample(documents: DataFrame, seed: String): DataFrame = {
    val counts = documents.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val minCnt = counts.agg(min(col("n_src")).as("min_src"))
    val u = conv(
      substring(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    documents
      .join(broadcast(counts), "source")
      .crossJoin(broadcast(minCnt))
      .withColumn("__u", u)
      .withColumn("kept",
        col("__u").cast("decimal(38,0)") * col("n_src").cast("decimal(38,0)") <
          col("min_src").cast("decimal(38,0)") * lit(4294967296L).cast("decimal(38,0)"))
      .select(col("doc_id"), col("source"), col("n_src"), col("min_src"), col("kept"))
  }

  /** Deterministic k-per-group sample: rank rows inside each group by
    * md5(seed:doc_id) (doc_id tie-break) and keep the first k — the
    * "give me k random-but-reproducible examples per source/language"
    * primitive every curation review loop needs. One shuffle on the
    * group key; at scale the per-group heap is bounded by k.
    */
  def perGroupSample(documents: DataFrame, seed: String, k: Int): DataFrame = {
    val h = md5(concat(lit(s"$seed:"), col("doc_id").cast("string")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
  }

  /** χ² homogeneity test between two event populations (deterministic
    * split g = event_id % 2): per event_type the observed counts and the
    * χ² contribution Σ_g (o_g − e_g)²/e_g with e_g = rowTot × colTot/N.
    * One groupBy plus a broadcast 1-row totals frame; drift detection
    * over 100 TB of events is one shuffle of |event_type| rows.
    */
  def chi2Drift(events: DataFrame): DataFrame = {
    val obs = events
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
    val tot = obs.agg(sum(col("n0")).as("t0"), sum(col("n1")).as("t1"))
    def e(tg: Column): Column =
      (col("n0") + col("n1")).cast("double") * tg.cast("double") /
        (col("t0") + col("t1")).cast("double")
    def part(n: Column, eg: Column): Column =
      (n.cast("double") - eg) * (n.cast("double") - eg) / eg
    obs
      .crossJoin(broadcast(tot))
      .withColumn("__e0", e(col("t0")))
      .withColumn("__e1", e(col("t1")))
      .select(
        col("event_type"), col("n0"), col("n1"),
        (part(col("n0"), col("__e0")) + part(col("n1"), col("__e1"))).as("chi2"))
  }

  /** Corpus-level top-k n-grams (bigrams) per language by frequency —
    * the contamination/repetition statistic: one explode, one keyed
    * count (map-side combined), one bounded per-lang window.
    */
  def ngramFreq(documents: DataFrame, k: Int): DataFrame =
    ngramFreqToks(documents.select(col("lang"), TextOps.tokensExpr.as("__ws")), k)

  /** [[ngramFreq]] over a pre-tokenized (lang, __ws) frame. */
  def ngramFreqToks(toks: DataFrame, k: Int): DataFrame = {
    val bi = toks
      .select(col("lang"), explode(TextOps.shingles2Expr).as("ngram"))
    val counts = bi.groupBy(col("lang"), col("ngram")).agg(count(lit(1)).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("ngram"))
    counts
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("ngram"), col("cnt"))
  }

  /** C4/Gopher-style rule filter: per-document boolean per rule plus the
    * conjunction. Single scan, pure expressions.
    */
  def docFilter(documents: DataFrame): DataFrame = {
    import TextAnalysis.{emailPat, phonePat}
    val base = documents
      .select(col("doc_id"), col("text"), TextOps.tokensExpr.as("__ws"))
      .withColumn("__n", expr("size(__ws)"))
      .withColumn("__stop",
        expr(s"CAST(size(filter(__ws, w -> w IN ${TextAnalysis.enStopwords
          .map(w => s"'$w'").mkString("(", ", ", ")")})) AS DOUBLE)") /
          col("__n").cast("double"))
      .withColumn("__awl",
        expr("CAST(aggregate(__ws, 0L, (acc, w) -> acc + length(w)) AS DOUBLE)") /
          col("__n").cast("double"))
      .withColumn("__pii",
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0))) +
          size(regexp_extract_all(col("text"), lit(phonePat), lit(0))))
      .select(
        col("doc_id"),
        (col("__n") >= 30).as("r_min_words"),
        (col("__stop") >= 0.02).as("r_stop_ratio"),
        col("__awl").between(3.0, 10.0).as("r_word_shape"),
        (col("__pii") === 0).as("r_no_pii"))
    base.withColumn("kept",
      col("r_min_words") && col("r_stop_ratio") && col("r_word_shape") && col("r_no_pii"))
  }

  /** Repetition signals (the Gopher duplicate-fraction family):
    * duplicate-word fraction, top-word share, duplicate-bigram fraction.
    * Word stats come from one keyed count; bigram stats are row-local
    * array expressions — one shuffle total.
    */
  def repetitionRatio(documents: DataFrame): DataFrame =
    repetitionRatioToks(documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")))

  /** [[repetitionRatio]] over a pre-tokenized (doc_id, __ws) frame. */
  def repetitionRatioToks(base: DataFrame): DataFrame = {
    val rowLvl = base
      .withColumn("__bl", TextOps.shingles2Expr)
      .select(
        col("doc_id"),
        size(col("__bl")).as("__nb"),
        size(array_distinct(col("__bl"))).as("__nub"))
    val agg = base
      .select(col("doc_id"), explode(col("__ws")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("__nt"),
        count(lit(1)).as("__nu"),
        max(col("cnt")).as("__mx"))
    rowLvl
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(
          lit(1.0) - col("__nu").cast("double") / col("__nt").cast("double"),
          lit(0.0)).as("dup_word_ratio"),
        coalesce(col("__mx").cast("double") / col("__nt").cast("double"), lit(0.0))
          .as("top_word_ratio"),
        when(col("__nb") > 0,
          lit(1.0) - col("__nub").cast("double") / col("__nb").cast("double"))
          .otherwise(lit(0.0)).as("dup_bigram_ratio"))
  }

  /** BPE tokenizer-training inner statistic: top-k adjacent character
    * pairs weighted by word frequency. The pair explosion runs over the
    * DISTINCT word vocabulary after one corpus-wide count shuffle —
    * exactly how production BPE trainers iterate (work is bounded by
    * vocabulary size, not corpus size).
    */
  def bpePairs(documents: DataFrame, k: Int): DataFrame =
    bpePairsToks(documents.select(TextOps.tokensExpr.as("__ws")), k)

  /** [[bpePairs]] over a pre-tokenized frame carrying __ws. */
  def bpePairsToks(toks: DataFrame, k: Int): DataFrame =
    toks
      .select(explode(col("__ws")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .filter(length(col("word")) >= 2)
      .select(col("c"),
        explode(expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("c")).cast("bigint").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)

  /** Greedy BPE merge loop over a sentinel-spaced vocabulary frame
    * `(c, seq)` — seq = leading/trailing single space, TWO spaces
    * between symbols (see QueriesCorpus.bpeVocab for why that makes
    * one literal replace-all per merge exactly the greedy
    * left-to-right BPE merge). Each of the `merges` iterations counts
    * adjacent symbol pairs weighted by `c` (vocabulary-bounded work),
    * picks the most frequent (ties: lexicographic on the pair), and
    * merges it everywhere; the winner is a 1-row driver pick. Returns
    * (merge_idx, sym_a, sym_b, merged, cnt) per iteration — the
    * trained tokenizer's merge table.
    */
  def bpeTrain(vocab: DataFrame, merges: Int): Seq[(Int, String, String, String, Long)] = {
    var v = vocab
    val rows = Seq.newBuilder[(Int, String, String, String, Long)]
    for (t <- 1 to merges) {
      val best = v
        .select(col("c"), split(trim(col("seq")), "  ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).cast("bigint").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).head()
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      rows += ((t, a, b, a + b, cnt))
      v = v.select(col("c"),
        expr(s"replace(seq, ' $a  $b ', ' ${a + b} ')").as("seq"))
    }
    rows.result()
  }

  /** Exact-substring duplication profile: token `gram`-grams occurring
    * more than once anywhere in the corpus mark their covering spans;
    * per doc, distinct covered positions and the coverage ratio. Docs
    * with no repeated span are omitted. The gram table is O(tokens); the
    * span explode touches only grams that actually repeat — the
    * suffix-array-free formulation of the exact-substring dedup
    * statistic.
    */
  def substringDup(
      documents: DataFrame, gram: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame =
    substringDupToks(
      documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")), gram, materialize)

  /** [[substringDup]] over a pre-tokenized (doc_id, __ws) frame. */
  def substringDupToks(
      toks: DataFrame, gram: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    // `materialize` lets the caller cache the gram table: it feeds both
    // the repeat-count aggregation and the span probe, and the
    // tokenize + md5 + posexplode work dominates — computing it twice
    // doubles the query's cost.
    val grams = materialize(toks
      .filter(size(col("__ws")) >= gram)
      .select(col("doc_id"), size(col("__ws")).as("__n"),
        posexplode(expr(
          s"transform(sequence(1, size(__ws) - ${gram - 1}), i -> md5(concat_ws(' ', slice(__ws, i, $gram))))")))
      .select(col("doc_id"), col("__n"), (col("pos") + 1).as("p"), col("col").as("gh")))
    // Repeat filter: a count window riding the single shuffle by gh
    // replaces the old groupBy(gh)+left-semi-join pair, which shuffled
    // the full gram table twice and sorted both join sides. The window
    // is PARTITIONED (per-gram groups; no unpartitioned scan), and the
    // sort by gh is the same sort the SortMergeJoin paid anyway.
    val repeated = grams
      .withColumn("__occ",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))))
      .filter(col("__occ") > 1)
      .select(col("doc_id"), col("__n"), col("p"))
    // Covered-position count as an interval union: every repeated gram
    // covers [p, p+gram-1] and all intervals have the same length, so
    // sorted by p the union length is Σ min(gram, p_i − p_{i−1}) (first
    // interval contributes gram). Exactly count_distinct(pos) over the
    // exploded spans, without the gram-times row explode or the
    // two-shuffle distinct aggregate.
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    repeated
      .withColumn("__prev", lag(col("p"), 1).over(dw))
      .groupBy(col("doc_id"), col("__n"))
      .agg(sum(coalesce(least(lit(gram), col("p") - col("__prev")), lit(gram))
        .cast("long")).as("covered"))
      .select(col("doc_id"), col("__n").cast("bigint").as("n_tokens"),
        col("covered").cast("bigint").as("covered_tokens"),
        (col("covered").cast("double") / col("__n").cast("double")).as("coverage"))
  }
}

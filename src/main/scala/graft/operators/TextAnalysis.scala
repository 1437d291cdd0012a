package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-level text analysis: language ID, quality scoring, token
  * counting, fingerprinting. Pure codegen'd expressions over the
  * `documents` table — embarrassingly parallel, no shuffle except the
  * tiny per-language score pick.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "of", "and", "to", "a", "in"),
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "ni"))

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("(", ", ", ")")

  /** Per-language stopword-hit score; winner by (score desc, lang asc). */
  def langId(documents: DataFrame): DataFrame =
    langIdToks(documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")))

  /** [[langId]] over a pre-tokenized (doc_id, __ws) frame. */
  def langIdToks(base: DataFrame): DataFrame = {
    val scored = langProfiles
      .map { case (lang, words) =>
        base.select(
          col("doc_id"),
          lit(lang).as("lang_pred"),
          expr(s"size(filter(__ws, w -> w IN ${inList(words)}))").as("score"))
      }
      .reduce(_.unionAll(_))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("lang_pred"))
    scored
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang_pred"), col("score"))
  }

  val enStopwords: Seq[String] = langProfiles.toMap.apply("en")

  /** Length / stopword-ratio / word-shape quality score in [0, 1].
    * Fixed-order double arithmetic (matches the oracle bit-for-bit).
    */
  def qualityScore(documents: DataFrame): DataFrame =
    qualityScoreToks(documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")))

  /** [[qualityScore]] over a pre-tokenized (doc_id, __ws) frame. */
  def qualityScoreToks(toks: DataFrame): DataFrame =
    toks
      .withColumn("n_words", expr("size(__ws)"))
      .withColumn("stop_ratio",
        expr(s"CAST(size(filter(__ws, w -> w IN ${inList(enStopwords)})) AS DOUBLE)") /
          col("n_words").cast("double"))
      .withColumn("avg_word_len",
        expr("CAST(aggregate(__ws, 0L, (acc, w) -> acc + length(w)) AS DOUBLE)") /
          col("n_words").cast("double"))
      .withColumn("score",
        lit(0.4) * least(col("n_words").cast("double") / lit(200.0), lit(1.0)) +
          lit(0.3) * col("stop_ratio") +
          lit(0.3) * when(col("avg_word_len").between(3.0, 8.0), 1.0).otherwise(0.0))
      .select(col("doc_id"), col("n_words"), col("stop_ratio"), col("avg_word_len"), col("score"))

  /** Whitespace+punct regex token counts: total and unique. */
  def tokenCount(documents: DataFrame): DataFrame =
    tokenCountToks(documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")))

  /** [[tokenCount]] over a pre-tokenized (doc_id, __ws) frame. */
  def tokenCountToks(toks: DataFrame): DataFrame =
    toks
      .select(
        col("doc_id"),
        expr("size(__ws)").as("n_tokens"),
        expr("size(array_distinct(__ws))").as("n_unique"))

  /** Canonical-form fingerprint: lowercase, collapse non-alnum runs to a
    * single space, trim, md5.
    */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))).as("fingerprint"))

  /** Per-document top-k terms by tf-idf with a LOG-FREE idf
    * (score = tf × N / df): ln() is the one place libm implementations
    * may differ in the last ulp between engines, and the rational form
    * ranks identically per term while staying bit-exact everywhere.
    * One explode + two keyed aggregations (doc-term, then term) + a
    * per-doc window over that doc's distinct terms — bounded work per
    * key; the doc count is a 1-row broadcast.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int): DataFrame =
    tfidfTopTermsToks(documents.select(col("doc_id"), TextOps.tokensExpr.as("__ws")), k)

  /** [[tfidfTopTerms]] over a pre-tokenized (doc_id, __ws) frame
    * (tokenization is row-preserving, so the doc count comes from it too). */
  def tfidfTopTermsToks(toks: DataFrame, k: Int): DataFrame = {
    val words = toks.select(col("doc_id"), explode(col("__ws")).as("term"))
    val tf = words.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = toks.agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
  }

  /** PII / URL patterns restricted to the regex subset on which Java
    * regex (Spark) and RE2 (DuckDB) agree: character classes, bounded
    * repetition, alternation-free, no backrefs or lookaround — both
    * engines produce the identical greedy matches.
    */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
  val urlPat = "https?://[A-Za-z0-9./_%-]+"

  /** PII scrub: per document, email/phone match counts and the md5 of
    * the redacted text (emails → <EMAIL>, phones → <PHONE>) — the
    * fingerprint stands in for shipping megabytes of scrubbed text
    * through the correctness gate. Pure per-row expressions, no shuffle.
    */
  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(phonePat), lit(0))).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
        phonePat, "<PHONE>")).as("redacted_md5"))

  /** Per-source URL stats: one scan, per-row match counts, tiny
    * per-source aggregate (map-side combined).
    */
  def urlStats(documents: DataFrame): DataFrame =
    documents
      .select(
        col("source"),
        size(regexp_extract_all(col("text"), lit(urlPat), lit(0))).cast("long").as("__n"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_urls"),
        sum(when(col("__n") > 0, 1L).otherwise(0L)).as("docs_with_url"))
      .orderBy(col("source"))
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 wave: the sketch-join estimator family's third member (CMS
  * inner product), cheaper/asymmetric near-dup variants (1-bit minhash,
  * containment), a perceptual-hash dedup leg for the multimodal column,
  * heavy-tail/changepoint monitors, a time-bounded funnel, SAX symbolic
  * series, URL canonicalization dedup, and a curriculum shard plan.
  * Everything stays on the repo's portable grids (integer cents, 1e-6
  * fixed point, md5-derived hashes, truncating integer division) so the
  * DuckDB oracle hash-matches.
  */
object QueriesWave7 {

  // ---- cms_join_est: CMS inner-product join-size estimator ----

  /** AGMS/CMS-sketch join-size estimator (Alon–Matias–Szegedy lineage,
    * Cormode–Muthukrishnan CM sketches): |A ⋈ B| = Σ_k d_A(k)·d_B(k) is
    * estimated by the inner product of the two sides' count-min rows —
    * est = min over depths d of Σ_w A[d][w]·B[d][w]. Hash collisions
    * only ADD cross terms, so every depth's inner product is an upper
    * bound of the truth and the min is the tightest; unlike the KMV
    * sample (`kmv_join_est`) the CMS estimate has no sampling variance,
    * it trades that for collision bias at small width. Same three
    * audited edges; the per-key degree frame is the session-shared
    * `kjeDeg` memo, so the truth costs nothing extra, and the sketch
    * cells are a ≤ depth×256-row aggregate of it — at 100 TB the only
    * data-sized work is the keyed degree count the memo already does.
    * Portable hash: bucket_d(k) = first md5 byte of "d:k" (the
    * `cms_freq` family).
    */
  def cmsJoinEstQ(spark: SparkSession, dir: String): DataFrame =
    QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val deg = QueriesWave6.kjeDeg(spark, dir, label, ta, ka, tb, kb)
      val cells = deg
        .select(col("da"), col("db"),
          posexplode(array((0 until QueriesStats.cmsDepth).map(d =>
            graft.operators.Stats.cmsBucket(d, col("k"))): _*)).as(Seq("d", "w")))
        .groupBy(col("d"), col("w"))
        .agg(sum(col("da")).as("ca"), sum(col("db")).as("cb"))
      val est = cells
        .groupBy(col("d")).agg(sum(col("ca") * col("cb")).as("s"))
        .agg(min(col("s")).as("est"))
      val actual = deg.agg(sum(col("g")).as("actual"))
      est.crossJoin(actual)
        .select(lit(label).as("edge"), col("est"), col("actual"),
          (col("est").cast("double") /
            greatest(col("actual"), lit(1L)).cast("double")).as("inflation"))
    }.reduce(_.unionAll(_)).orderBy(col("edge"))

  val cmsJoinEstSql: String = {
    val depth = QueriesStats.cmsDepth
    def bucketSql(v: String): String =
      s"(strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 1, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substr(md5(depths.d || ':' || $v), 2, 1)) - 1)"
    val ctes = QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val n = QueriesWave6.cteName(label)
      s"""${QueriesWave6.kjeDegCte(label, ta, ka, tb, kb)},
         |cells_$n AS (
         |  SELECT depths.d AS d, ${bucketSql("CAST(k AS VARCHAR)")} AS w,
         |         SUM(da) AS ca, SUM(db) AS cb
         |  FROM deg_$n, depths GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val arms = QueriesWave6.kjeEdges.map { case (label, ta, ka, tb, kb) =>
      val n = QueriesWave6.cteName(label)
      s"""SELECT '$label' AS edge,
         |  (SELECT MIN(s) FROM (SELECT d, SUM(ca * cb) AS s FROM cells_$n GROUP BY d)) AS est,
         |  (SELECT SUM(g) FROM deg_$n) AS actual""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH depths AS (SELECT UNNEST([${(0 until depth).mkString(", ")}]) AS d),
       |$ctes,
       |s AS (
       |$arms)
       |SELECT edge, CAST(est AS BIGINT) AS est, CAST(actual AS BIGINT) AS actual,
       |  CAST(est AS DOUBLE) / CAST(GREATEST(actual, 1) AS DOUBLE) AS inflation
       |FROM s ORDER BY edge""".stripMargin
  }

  // ---- bbit_minhash: 1-bit minhash Jaccard estimation ----

  /** b-bit minhash (Li–König 2010) over the session's LSH candidate
    * pairs: keep only the LOWEST hex bit of each of the 16 signature
    * entries — 16 bits per doc instead of 16 md5 strings (a 128×
    * signature-storage cut, THE at-scale justification) — and unbias the
    * agreement rate: E[agree] = J + (1−J)/2, so Ĵ₁ = max(0, 2·agree/16
    * − 1). Reported next to the full-signature estimate (agree/16) and
    * the exact set Jaccard so the audit shows what the compression
    * costs. All three estimates are exact binary fractions (k/16,
    * k/32-grid) — engine-portable doubles. Candidates and both per-doc
    * frames are session memos; the only new work is a pair-keyed join.
    */
  def bbitMinhashQ(spark: SparkSession, dir: String): DataFrame = {
    val sigs = QueriesText.mhWide(spark, dir)
    val n = graft.operators.TextOps.numPerms
    def lowBit(c: Column): Column = conv(substring(c, 32, 1), 16, 10).cast("long") % 2
    def side(suffix: String): DataFrame =
      sigs.select(
        (col("doc_id").as(s"doc_$suffix") +:
          (0 until n).map(i => col(s"m$i").as(s"m${i}_$suffix"))): _*)
    val sets = QueriesText.shArr3(spark, dir)
    val sigAgree = (0 until n)
      .map(i => when(col(s"m${i}_a") === col(s"m${i}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    val bitAgree = (0 until n)
      .map(i => when(lowBit(col(s"m${i}_a")) === lowBit(col(s"m${i}_b")), 1L).otherwise(0L))
      .reduce(_ + _)
    graft.operators.TextOps.lshCandidatesCollapsed(sigs)
      .join(side("a"), "doc_a").join(side("b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (sigAgree.cast("double") / n).as("j_sig"),
        greatest(lit(0.0), (lit(2L) * bitAgree - n).cast("double") / n).as("j_1bit"))
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double")).as("j_exact"),
        col("j_sig"), col("j_1bit"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val bbitMinhashSql: String = {
    val n = graft.operators.TextOps.numPerms
    val sigAgree = (0 until n)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    def lowBit(m: String): String =
      s"(strpos('0123456789abcdef', substr($m, 32, 1)) - 1) % 2"
    val bitAgree = (0 until n)
      .map(i => s"CASE WHEN ${lowBit(s"a.m$i")} = ${lowBit(s"b.m$i")} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${QueriesText.candCtes},
       |sets AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |          FROM sh a
       |          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
       |          GROUP BY 1, 2),
       |est AS (SELECT c.doc_a, c.doc_b,
       |    CAST($sigAgree AS DOUBLE) / $n AS j_sig,
       |    GREATEST(0.0, CAST(2 * ($bitAgree) - $n AS DOUBLE) / $n) AS j_1bit
       |  FROM cand c JOIN sigs a ON a.doc_id = c.doc_a JOIN sigs b ON b.doc_id = c.doc_b)
       |SELECT e.doc_a, e.doc_b,
       |  CAST(COALESCE(i.inter, 0) AS DOUBLE) /
       |    CAST(sa.n + sb.n - COALESCE(i.inter, 0) AS DOUBLE) AS j_exact,
       |  e.j_sig, e.j_1bit
       |FROM est e
       |LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
       |JOIN sets sa ON sa.doc_id = e.doc_a
       |JOIN sets sb ON sb.doc_id = e.doc_b
       |ORDER BY e.doc_a, e.doc_b""".stripMargin
  }

  // ---- hill_tail: Hill estimator of the heavy-tail index ----

  val hillK = 100

  /** Hill estimator of the Pareto tail index over order values: with
    * x₍₁₎ ≥ … the order statistics of o_totalprice cents, H =
    * (1/m)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the m top values strictly above the
    * (k+1)-th, and the tail index α̂ = 1/H — the standard diagnostic for
    * "does this value distribution have power-law tails" (pairs with
    * `zipf_fit`'s rank-frequency slope). Distributed shape: the top
    * k+1 VALUES arrive via TakeOrdered (k = $hillK — never a global
    * sort), the threshold broadcasts back, and ties at the threshold
    * make the value multiset — and hence every output — deterministic.
    * Each ln term is quantized to the 1e-6 grid before the sum (the one
    * transcendental, engine-portable).
    */
  def hillTailQ(spark: SparkSession, dir: String): DataFrame = {
    val cents = expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    val top = Tables(spark, dir, "orders")
      .select(cents.as("c")).orderBy(col("c").desc).limit(hillK + 1)
    val thr = top.agg(min(col("c")).as("xk"))
    top.crossJoin(broadcast(thr))
      .filter(col("c") > col("xk"))
      .select(col("xk"),
        (round(log(col("c").cast("double") / col("xk").cast("double")) * 1e6) / 1e6)
          .as("lnr"))
      .groupBy(col("xk"))
      .agg(count(lit(1)).as("m"), sum(col("lnr")).as("__s"))
      .select(col("m"), col("xk").as("x_thresh"),
        (col("__s") / col("m")).as("h_hill"),
        (col("m").cast("double") / col("__s")).as("alpha"))
  }

  val hillTailSql: String =
    s"""WITH top AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
       |             FROM orders ORDER BY c DESC LIMIT ${hillK + 1}),
       |thr AS (SELECT MIN(c) AS xk FROM top),
       |terms AS (SELECT t.c, thr.xk,
       |    round(ln(CAST(t.c AS DOUBLE) / CAST(thr.xk AS DOUBLE)) * 1e6) / 1e6 AS lnr
       |  FROM top t, thr WHERE t.c > thr.xk)
       |SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(xk) AS x_thresh,
       |  SUM(lnr) / COUNT(*) AS h_hill,
       |  CAST(COUNT(*) AS DOUBLE) / SUM(lnr) AS alpha
       |FROM terms GROUP BY xk""".stripMargin

  // ---- containment_sim: asymmetric containment over candidate pairs ----

  val containTau = 0.9

  /** Asymmetric set containment |A∩B| / min(|A|,|B|) ≥ 0.9 over the LSH
    * candidate pairs — the subset/quote detector symmetric Jaccard
    * misses: a short doc fully embedded in a long one has high
    * containment but Jaccard ≈ |short|/|long|, which can sit far below
    * the dedup threshold. `missed_by_jaccard` flags exactly those pairs
    * (the reason curation pipelines run containment as a second pass).
    * Consumes the session's candidate and shingle-set memos — the only
    * new work is the pair-keyed verify. At 100 TB the recall ceiling is
    * the band join's (documented on row 23); an exact-recall containment
    * pass would ride `prefix_sim_join`'s prefix filter instead.
    */
  def containmentSimQ(spark: SparkSession, dir: String): DataFrame = {
    val sets = QueriesText.shArr3(spark, dir)
    graft.operators.TextOps.lshCandidatesCollapsed(QueriesText.mhWide(spark, dir))
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("containment",
        col("inter").cast("double") /
          least(size(col("sha")), size(col("shb"))).cast("double"))
      .filter(col("containment") >= containTau)
      .select(col("doc_a"), col("doc_b"), col("containment"),
        (col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")).cast("double")).as("jaccard"))
      .withColumn("missed_by_jaccard", col("jaccard") < QueriesText.lshTau)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val containmentSimSql: String =
    s"""WITH ${QueriesText.candCtes},
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |          FROM sh a
       |          JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
       |          GROUP BY 1, 2),
       |scored AS (SELECT i.doc_a, i.doc_b,
       |    CAST(i.inter AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment,
       |    CAST(i.inter AS DOUBLE) / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b)
       |SELECT doc_a, doc_b, containment, jaccard,
       |  jaccard < ${QueriesText.lshTau} AS missed_by_jaccard
       |FROM scored WHERE containment >= $containTau
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- mm_phash_dup: perceptual-hash near-dup pairs on the image leg ----

  val phashMaxHamming = 3

  /** Perceptual-hash (dHash) near-dup detection for the multimodal image
    * column: each image's decode stub yields an 8×9 "pixel" grid whose
    * cell (r,c) hashes the document's word at position (9r+c) mod |ws| —
    * so images of near-identical documents get near-identical grids, the
    * property a real thumbnail dHash has. 64 horizontal-gradient bits
    * (g(r,c) > g(r,c+1)) pack into 4×16-bit bands; candidate pairs come
    * from 4 band equijoins (pigeonhole: hamming ≤ 3 ⇒ some band equal —
    * the `simhash_dup` discipline, complete by construction), verified
    * by bit_count(xor) over the wide layout. Only the grid function is
    * the swappable stub; the banding, pigeonhole bound, and verify are
    * exactly what a production pHash dedup runs. Everything after the
    * per-doc 64-position explode+pack is band-keyed — no all-pairs.
    */
  def mmPhashDupQ(spark: SparkSession, dir: String): DataFrame = {
    val images = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), graft.operators.TextOps.tokensExpr.as("ws"))
    def gExpr(posExpr: String): Column =
      expr(s"CAST(conv(substring(md5(coalesce(element_at(ws, ($posExpr) % greatest(size(ws), 1) + 1), '')), 1, 2), 16, 10) AS BIGINT)")
    val bits = images
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), lit(63))).as("p"))
      .withColumn("r", col("p") / 8 cast "int")
      .withColumn("c", col("p") % 8)
      .withColumn("bit",
        when(gExpr("r * 9 + c") > gExpr("r * 9 + c + 1"), 1L).otherwise(0L))
      .select(col("doc_id"), (col("r") / 2).cast("int").as("band"),
        ((col("r") % 2) * 8 + col("c")).as("bpos"), col("bit"))
    val bands = Memo(spark, dir, "wave7:phashBands")(
      bits.groupBy(col("doc_id"), col("band"))
        .agg(sum(col("bit") * expr("CAST(pow(2.0, 15 - bpos) AS BIGINT)")).as("bv")))
    val wideAggs = (0 until 4).map(b =>
      max(when(col("band") === b, col("bv"))).as(s"b$b"))
    val wide = bands.groupBy(col("doc_id"))
      .agg(wideAggs.head, wideAggs.tail: _*)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val ham = (0 until 4).map(b =>
      expr(s"bit_count(a$b ^ c$b)").cast("long")).reduce(_ + _)
    cand
      .join(wide.select(col("doc_id").as("doc_a") +:
        (0 until 4).map(b => col(s"b$b").as(s"a$b")): _*), "doc_a")
      .join(wide.select(col("doc_id").as("doc_b") +:
        (0 until 4).map(b => col(s"b$b").as(s"c$b")): _*), "doc_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= phashMaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val mmPhashDupSql: String = {
    val g = (pos: String) =>
      s"CAST(('0x' || substr(md5(COALESCE(ws[($pos) % GREATEST(len(ws), 1) + 1], '')), 1, 2)) AS BIGINT)"
    s"""WITH ${QueriesText.wordsCte},
       |img AS (SELECT w.doc_id, ws FROM w WHERE w.doc_id % 3 = 0),
       |pos AS (SELECT UNNEST(range(0, 64)) AS p),
       |bits AS (SELECT doc_id, CAST((p // 8) // 2 AS INT) AS band,
       |    ((p // 8) % 2) * 8 + (p % 8) AS bpos,
       |    CASE WHEN ${g("(p // 8) * 9 + (p % 8)")} > ${g("(p // 8) * 9 + (p % 8) + 1")}
       |         THEN 1 ELSE 0 END AS bit
       |  FROM img, pos),
       |bands AS (SELECT doc_id, band,
       |    CAST(SUM(bit * CAST(pow(2.0, 15 - bpos) AS BIGINT)) AS BIGINT) AS bv
       |  FROM bits GROUP BY 1, 2),
       |wide AS (SELECT doc_id,
       |    MAX(CASE WHEN band = 0 THEN bv END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN bv END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN bv END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN bv END) AS b3
       |  FROM bands GROUP BY 1),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
       |       bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
       |FROM cand c
       |JOIN wide a ON a.doc_id = c.doc_a
       |JOIN wide b ON b.doc_id = c.doc_b
       |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
       |      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= $phashMaxHamming
       |ORDER BY c.doc_a, c.doc_b""".stripMargin
  }

  // ---- norm_text_dedup: normalization-canonical exact dedup ----

  /** Exact dedup on the NORMALIZED text (casefold + alnum tokenization +
    * single-space join — the tokenizer the whole text stack shares):
    * catches formatting-only duplicates (case, punctuation, whitespace,
    * markup residue) that byte-exact `exact_dedup` misses — the cheap
    * first rung every curation ladder runs before MinHash. Per doc:
    * canonical keep id, normalized-group size, and `formatting_dup` —
    * true iff normalization merged this doc into a LARGER group than the
    * raw hash did (the interesting rows). Same one-shuffle keyed-agg
    * plan as exact_dedup; both hash frames are slim (doc_id, md5).
    */
  def normTextDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("__hraw"),
        md5(concat_ws(" ", graft.operators.TextOps.tokensExpr)).as("__hn"))
    val normGroups = d.groupBy(col("__hn"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("norm_group_n"))
    val rawGroups = d.groupBy(col("__hraw"))
      .agg(count(lit(1)).as("raw_group_n"))
    d.join(normGroups, "__hn").join(rawGroups, "__hraw")
      .select(col("doc_id"), col("keep_id"), col("norm_group_n"),
        (col("norm_group_n") > col("raw_group_n")).as("formatting_dup"))
      .orderBy(col("doc_id"))
  }

  val normTextDedupSql: String =
    s"""WITH ${QueriesText.wordsCte},
       |h AS (SELECT d.doc_id, md5(d.text) AS hraw,
       |        md5(array_to_string(w.ws, ' ')) AS hn
       |      FROM documents d JOIN w ON w.doc_id = d.doc_id),
       |ng AS (SELECT hn, MIN(doc_id) AS keep_id, COUNT(*) AS norm_group_n
       |       FROM h GROUP BY 1),
       |rg AS (SELECT hraw, COUNT(*) AS raw_group_n FROM h GROUP BY 1)
       |SELECT h.doc_id, ng.keep_id, ng.norm_group_n,
       |  ng.norm_group_n > rg.raw_group_n AS formatting_dup
       |FROM h JOIN ng ON ng.hn = h.hn JOIN rg ON rg.hraw = h.hraw
       |ORDER BY h.doc_id""".stripMargin

  // ---- registry ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_join_est" -> (cmsJoinEstQ _),
    "bbit_minhash" -> (bbitMinhashQ _),
    "hill_tail" -> (hillTailQ _),
    "containment_sim" -> (containmentSimQ _),
    "mm_phash_dup" -> (mmPhashDupQ _),
    "norm_text_dedup" -> (normTextDedupQ _)
  )

  def oracleSql: Map[String, String] = Map(
    "cms_join_est" -> cmsJoinEstSql,
    "bbit_minhash" -> bbitMinhashSql,
    "hill_tail" -> hillTailSql,
    "containment_sim" -> containmentSimSql,
    "mm_phash_dup" -> mmPhashDupSql,
    "norm_text_dedup" -> normTextDedupSql
  )
}

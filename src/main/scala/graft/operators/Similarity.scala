package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  * Exactness strategy: float components are quantized once to integers
  * (⌊v·10⁶ + 0.5⌋ — floor is the same in every engine, unlike round());
  * dot products and norms are then exact BIGINT sums (order-independent),
  * and the final cosine is a fixed-order double expression — so Spark and
  * the DuckDB oracle agree bit-for-bit, and rankings are deterministic
  * with doc-id tie-breaks.
  *
  * Scale: brute-force top-k broadcasts the (tiny) probe set and streams
  * the corpus once — no shuffle until the per-probe top-k window over
  * probes×k rows. The LSH variant buckets by random-hyperplane signature
  * so each probe only scans its bucket.
  */
object Similarity {

  /** Quantized embedding: array<long> of ⌊v·10⁶ + 0.5⌋. */
  val quantExpr: Column =
    expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))")

  /** Exact dot product via the native codegen'd expression
    * (graft.functions.QuantizedDot); see GraftFunctions.register.
    */
  private def dot(a: Column, b: Column): Column =
    expr(s"quantized_dot(${a.toString}, ${b.toString})")

  /** Brute-force cosine top-k of every corpus vector for each probe.
    * `probePred` selects the probe rows (must be small — it is broadcast).
    */
  def cosineTopK(embeddings: DataFrame, probePred: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings
      .select(col("vec_id"), quantExpr.as("qv"))
      .withColumn("nn", dot(col("qv"), col("qv")))
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"), col("nn").as("np"))
    val cands = q.select(col("vec_id").as("cand_id"), col("qv").as("cv"), col("nn").as("nc"))
    val win = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    broadcast(probes)
      .join(cands, col("cand_id") =!= col("probe_id"))
      .withColumn("cos",
        dot(col("pv"), col("cv")).cast("double") /
          sqrt(col("np").cast("double")) / sqrt(col("nc").cast("double")))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("cos"))
  }

  val numPlanes = 6 // 2^6 buckets — sized so test-scale buckets are non-trivial; raise with corpus size

  /** Deterministic md5-derived random hyperplanes: component (p, d) is
    * the ODD INTEGER 2·hexval(md5("p:d")[0]) − 15 ∈ [−15, 15] — the same
    * sign pattern as (hexval − 7.5) but integral, so projections against
    * the quantized vectors are exact BIGINT sums (order-independent and
    * reproducible in the DuckDB oracle). Tiny (numPlanes × dim)
    * broadcast table.
    */
  def hyperplanes(spark: org.apache.spark.sql.SparkSession, dim: Int): DataFrame = {
    import spark.implicits._
    spark.range(numPlanes.toLong).toDF("plane")
      .crossJoin(spark.range(dim.toLong).toDF("d"))
      .withColumn("w",
        expr("CAST(conv(substring(md5(concat(plane, ':', d)), 1, 1), 16, 10) AS BIGINT) * 2 - 15"))
  }

  /** Random-hyperplane LSH bucket per vector: bit p = (q · h_p > 0) over
    * the QUANTIZED vector (exact integer projection — an odd-integer
    * hyperplane never projects exactly to 0 on a nonzero axis-aligned
    * input, and the integer sum is partition-order independent, unlike a
    * double sum), bucket = Σ bit_p · 2^p. One explode + one aggregation.
    */
  def lshBuckets(embeddings: DataFrame, planes: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(quantExpr).as(Seq("d", "q")))
      .join(broadcast(planes), "d")
      .groupBy(col("vec_id"), col("plane"))
      .agg(sum(col("q") * col("w")).as("proj"))
      .withColumn("bit", (col("proj") > 0L).cast("long"))
      .groupBy(col("vec_id"))
      .agg(sum(expr("bit * CAST(pow(2.0, plane) AS BIGINT)")).as("bucket"))

  /** IVF (inverted-file) ANN: vectors are partitioned into inverted
    * lists by nearest centroid, probes scan only their nProbe closest
    * lists — the other classic ANN scale path next to LSH (bounded
    * per-probe work: nProbe/nCent of the corpus instead of all of it).
    *
    * Centroids are a fixed slice of the corpus (`centPred`) rather than
    * k-means iterates, so the index is deterministic and the DuckDB
    * oracle rebuilds it exactly; a trained centroid table slots into the
    * same plan without changing the assignment or probe path. Assignment
    * is a broadcast nested-loop against the tiny centroid set + one
    * map-side-combined argmax per vector — no shuffle of the corpus.
    */
  def ivfAnn(
      embeddings: DataFrame, probePred: Column, centPred: Column,
      nProbe: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = quantized(embeddings)
    val cents = q.filter(centPred)
      .select(col("vec_id").as("cent_id"), col("qv").as("centv"), col("nn").as("ncent"))
    ivfSearch(q, probePred, cents, nProbe, k)
  }

  /** MLlib k-means centroids for the IVF index, quantized like the
    * corpus vectors: the "MLlib" leg of the stats+MLlib approach — the
    * trainer runs once over the corpus, the resulting (cent_id, centv)
    * table is tiny and broadcasts into the same search plan the
    * deterministic-slice index uses.
    */
  def kmeansCentroids(embeddings: DataFrame, k: Int, seed: Long): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val feats = embeddings.select(
      col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        expr("transform(embedding, v -> CAST(v AS DOUBLE))")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(10).fit(feats)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) =>
        (i.toLong, v.toArray.map(d => math.floor(d * 1000000.0 + 0.5).toLong))
      }
      .toDF("cent_id", "centv")
  }

  /** IVF search against an explicit (cent_id, centv: array<long>)
    * centroid table (e.g. from kmeansCentroids).
    */
  def ivfAnnWith(
      embeddings: DataFrame, probePred: Column, centroids: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val cents = centroids.select(
      col("cent_id"), col("centv"), dot(col("centv"), col("centv")).as("ncent"))
    ivfSearch(quantized(embeddings), probePred, cents, nProbe, k)
  }

  private def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), quantExpr.as("qv"))
      .withColumn("nn", dot(col("qv"), col("qv")))

  private def ivfSearch(
      q: DataFrame, probePred: Column, cents: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    val simToCent = q.crossJoin(broadcast(cents))
      .withColumn("cos_c",
        dot(col("qv"), col("centv")).cast("double") /
          sqrt(col("nn").cast("double")) / sqrt(col("ncent").cast("double")))
    // each vector's inverted list: argmax centroid (ties → lower cent_id)
    val assign = simToCent
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("cos_c"), -col("cent_id"))).as("list_id"))
    val probeLists = simToCent.filter(probePred)
      .withColumn("rnk_c", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rnk_c") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("cent_id").as("list_id"))
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"), col("nn").as("np"))
      .join(probeLists, "probe_id")
    val cands = q.join(assign, "vec_id")
      .select(col("vec_id").as("cand_id"), col("qv").as("cv"), col("nn").as("nc"), col("list_id"))
    val win = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    broadcast(probes)
      .join(cands, Seq("list_id"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos",
        dot(col("pv"), col("cv")).cast("double") /
          sqrt(col("np").cast("double")) / sqrt(col("nc").cast("double")))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("cos"), col("list_id"))
  }

  /** Product-quantization encode: the vector splits into nSub contiguous
    * subvectors (width = ⌊dim/nSub⌋), each assigned its nearest codebook
    * entry by EXACT integer L2 over the quantized components (zip_with +
    * aggregate — codegen'd, no UDF). The codebook is a deterministic
    * corpus slice (like the IVF index) so the oracle rebuilds it; a
    * trained codebook table slots in unchanged. Long-format output
    * (vec_id, m, code, d2) — the ANN compression layer that stores nSub
    * small codes per vector instead of dim floats, which is what makes
    * billion-vector indexes fit in memory at 100 TB corpus scale.
    */
  def pqEncode(embeddings: DataFrame, centPred: Column, nSub: Int): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantExpr.as("qv"))
    val cents = q.filter(centPred)
      .select(col("vec_id").as("code"), col("qv").as("cv"))
    val win = Window.partitionBy(col("vec_id"), col("m")).orderBy(col("d2"), col("code"))
    q.crossJoin(broadcast(cents))
      .withColumn("m", explode(sequence(lit(0), lit(nSub - 1))))
      .withColumn("w", expr(s"CAST(FLOOR(size(qv) / $nSub.0) AS INT)"))
      .withColumn("d2", expr(
        "aggregate(zip_with(slice(qv, m * w + 1, w), slice(cv, m * w + 1, w)," +
          " (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("code"), col("d2"))
  }

  /** IVFADC — the composed coarse-quantizer + residual-PQ search that
    * billion-vector indexes actually run (FAISS's IVFADC): every vector
    * is assigned to its nearest coarse cell by exact integer L2, its
    * RESIDUAL (vector − cell centroid) is product-quantized against a
    * residual codebook, and a probe searches only its nProbe nearest
    * cells, scoring candidates by asymmetric distance — a per-(probe,
    * cell) lookup table of slice-L2s between the probe's residual and
    * each codeword, so candidates ship nSub small codes, never vectors.
    * All distances are exact BIGINT sums over the quantized grid, so
    * ranking is deterministic and the oracle reproduces it bit-for-bit.
    * Both the coarse cells and the residual codebook are deterministic
    * corpus slices here (like [[pqEncode]]'s codebook); trained tables
    * slot in unchanged.
    *
    * Scale: coarse assignment and PQ encode are map-side against
    * broadcast centroid/codebook rows; the LUT is probes × nProbe ×
    * nSub × codebook rows (tiny, broadcast); the ADC join keys on
    * (cell, subspace, code) and aggregates probed-cell candidates only.
    */
  private def residualAssign(q: DataFrame, coarsePred: Column): DataFrame = {
    val coarse = q.filter(coarsePred)
      .select(col("vec_id").as("cent_id"), col("qv").as("ccv"))
    q.crossJoin(broadcast(coarse))
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, ccv, (a, b) -> (a - b) * (a - b))," +
          " 0L, (acc, x) -> acc + x)"))
      .groupBy(col("vec_id"), col("qv"))
      .agg(min_by(struct(col("cent_id"), col("ccv")),
        struct(col("d2"), col("cent_id"))).as("__c"))
      .select(col("vec_id"), col("__c.cent_id").as("list_id"),
        expr("zip_with(qv, __c.ccv, (a, b) -> a - b)").as("rv"))
  }

  private def sliceD2(nSub: Int) = expr(
    "aggregate(zip_with(slice(rv, m * w + 1, w), slice(kv, m * w + 1, w)," +
      " (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")

  /** The residual codebook: the codebook slice's residuals to THEIR
    * coarse cells (deterministic here; a trained table slots in). */
  def ivfPqCodebook(embeddings: DataFrame, coarsePred: Column,
      codebookPred: Column): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantExpr.as("qv"))
    residualAssign(q.filter(coarsePred || codebookPred), coarsePred)
      .filter(codebookPred)
      .select(col("vec_id").as("code"), col("rv").as("kv"))
  }

  /** The STORED IVFADC index: one row per (vector, subspace) carrying
    * the coarse cell and the residual-PQ code — built once per corpus
    * (callers memoize/persist it), searched many times. nSub codes per
    * vector replace dim floats, which is what makes the index fit at
    * billion-vector scale.
    */
  def ivfPqIndex(embeddings: DataFrame, coarsePred: Column,
      codebook: DataFrame, nSub: Int): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantExpr.as("qv"))
    residualAssign(q, coarsePred).crossJoin(broadcast(codebook))
      .withColumn("m", explode(sequence(lit(0), lit(nSub - 1))))
      .withColumn("w", expr(s"CAST(FLOOR(size(rv) / $nSub.0) AS INT)"))
      .withColumn("d2", sliceD2(nSub))
      .groupBy(col("vec_id"), col("list_id"), col("m"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
  }

  /** IVFADC — the composed coarse-quantizer + residual-PQ search that
    * billion-vector indexes actually run (FAISS's IVFADC): a probe
    * searches only its nProbe nearest cells, scoring candidates by
    * asymmetric distance — a per-(probe, cell) lookup table of
    * slice-L2s between the probe's residual and each codeword, joined
    * to the stored `index` on (cell, subspace, code) — so candidates
    * never ship vectors. All distances are exact BIGINT sums over the
    * quantized grid: deterministic ranking, bit-for-bit oracle replay.
    * Probe-side work is probes × (cells + nProbe × codebook) — tiny,
    * broadcast; the index side is one broadcast-hash join + a keyed
    * aggregate over the probed cells' candidates only. The `codebook`
    * is the SAME table the stored index was built from ([[ivfPqIndex]])
    * — callers build/memoize it once and pass it to both, so a search
    * never re-derives the index's training artifacts.
    */
  def ivfPqAdc(embeddings: DataFrame, index: DataFrame, probePred: Column,
      coarsePred: Column, codebook: DataFrame, nSub: Int, nProbe: Int,
      k: Int): DataFrame = {
    val q = embeddings.select(col("vec_id"), quantExpr.as("qv"))
    val coarse = q.filter(coarsePred)
      .select(col("vec_id").as("cent_id"), col("qv").as("ccv"))
    val plist = q.filter(probePred).crossJoin(broadcast(coarse))
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, ccv, (a, b) -> (a - b) * (a - b))," +
          " 0L, (acc, x) -> acc + x)"))
      .withColumn("rnc", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cent_id"))))
      .filter(col("rnc") <= nProbe)
      .select(col("vec_id").as("probe_id"), col("cent_id").as("list_id"),
        expr("zip_with(qv, ccv, (a, b) -> a - b)").as("rv"))
    val lut = plist.crossJoin(broadcast(codebook))
      .withColumn("m", explode(sequence(lit(0), lit(nSub - 1))))
      .withColumn("w", expr(s"CAST(FLOOR(size(rv) / $nSub.0) AS INT)"))
      .withColumn("d2", sliceD2(nSub))
      .select(col("probe_id"), col("list_id"), col("m"), col("code"), col("d2"))
    val win = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("cand_id"))
    index
      .select(col("vec_id").as("cand_id"), col("list_id"), col("m"), col("code"))
      .join(broadcast(lut), Seq("list_id", "m", "code"))
      .filter(col("cand_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("cand_id"))
      .agg(sum(col("d2")).as("adc"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("adc"))
  }

  /** Embedding-cosine near-dup pairs: candidate pairs share a
    * random-hyperplane LSH bucket (the blocking step — at corpus scale
    * the self-join is per-bucket, never all-pairs), then each candidate
    * is verified by the EXACT quantized cosine and kept at ≥ tau. Same
    * exactness story as the ANN ops: integer projections make the
    * bucketing oracle-reproducible, integer dots make the verdict
    * bit-for-bit. One bucket per vector (single signature), so each
    * pair appears at most once.
    */
  def cosineDupPairs(embeddings: DataFrame, buckets: DataFrame, tau: Double): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings
      .select(col("vec_id"), quantExpr.as("qv"))
      .withColumn("nn", dot(col("qv"), col("qv")))
      .join(buckets, "vec_id")
    val a = q.select(col("vec_id").as("vec_a"), col("qv").as("pv"), col("nn").as("np"), col("bucket"))
    val b = q.select(col("vec_id").as("vec_b"), col("qv").as("cv"), col("nn").as("nc"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        dot(col("pv"), col("cv")).cast("double") /
          sqrt(col("np").cast("double")) / sqrt(col("nc").cast("double")))
      .filter(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Bucketed approximate NN: probes only compare against same-bucket
    * vectors — the 100 TB scale path (bucket join instead of full scan).
    */
  def lshAnn(embeddings: DataFrame, buckets: DataFrame, probePred: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val q = embeddings
      .select(col("vec_id"), quantExpr.as("qv"))
      .withColumn("nn", dot(col("qv"), col("qv")))
      .join(buckets, "vec_id")
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"), col("nn").as("np"), col("bucket"))
    val cands = q.select(col("vec_id").as("cand_id"), col("qv").as("cv"), col("nn").as("nc"), col("bucket"))
    val win = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("cand_id"))
    broadcast(probes)
      .join(cands, Seq("bucket"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos",
        dot(col("pv"), col("cv")).cast("double") /
          sqrt(col("np").cast("double")) / sqrt(col("nc").cast("double")))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("cand_id"), col("cos"), col("bucket"))
  }
}

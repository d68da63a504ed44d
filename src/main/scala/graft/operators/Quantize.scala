package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Int8 scalar quantization for the embedding store.
  *
  * At 100 TB the embedding column IS the corpus cost: 768-dim float32 is
  * 3 KB/row; int8 codes + one float scale are ~770 B — a 4× cheaper scan
  * for every ANN probe, dedup pass, and export. Per-vector symmetric
  * quantization: `code[j] = round(127 * x[j] / max|x|)`, `scale =
  * max|x| / 127`, so `dot(a, b) ≈ scale_a * scale_b * Σ code_a·code_b`
  * with the integer sum exact in Long (127² × dim ≪ 2⁶³). Search runs
  * two-stage: approximate scores on codes over-fetch `overFetch × k`
  * candidates, exact float cosine re-ranks them ([[VectorSearch]] style) —
  * the same candidate/refine contract as every blocked operator here
  * (bbox → haversine, LSH band → Jaccard, bucket → cosine).
  *
  * All arithmetic is deterministic (round-half-up on exact doubles, int
  * accumulation), so codes and approximate scores replay identically on
  * any cluster size.
  */
object Quantize {

  /** code array + scale for one vector; zero vector → all-zero codes,
    * scale 0 (dequantizes to the zero vector, cosine guard handles it). */
  private[graft] def encode(emb: Array[Double]): (Array[Byte], Double) = {
    var maxAbs = 0.0
    var j = 0
    while (j < emb.length) {
      val a = math.abs(emb(j)); if (a > maxAbs) maxAbs = a; j += 1
    }
    val codes = new Array[Byte](emb.length)
    if (maxAbs > 0.0) {
      val f = 127.0 / maxAbs
      j = 0
      while (j < emb.length) {
        codes(j) = math.floor(emb(j) * f + 0.5).toByte
        j += 1
      }
    }
    (codes, if (maxAbs > 0.0) maxAbs / 127.0 else 0.0)
  }

  private val encodeUdf = udf { (emb: Array[Double]) =>
    if (emb == null) null else { val (c, s) = encode(emb); (c, s) }
  }

  private val approxDotUdf = udf {
    (a: Array[Byte], sa: java.lang.Double, b: Array[Byte], sb: java.lang.Double) =>
      if (a == null || b == null || sa == null || sb == null) null
      else {
        var acc = 0L
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
        java.lang.Double.valueOf(acc * sa * sb)
      }
  }

  /** Adds `q_codes` (BINARY — Spark's Array[Byte] mapping, one byte per
    * dimension) + `q_scale` (double) next to the float column — the
    * compact store; callers may then drop or lazy-load the float column
    * and keep it only for re-ranking. */
  def withCodes(df: DataFrame, embCol: String): DataFrame = {
    // fail loudly instead of silently overwriting caller data with the
    // same names (withColumn replaces an existing column)
    val clash = Seq("q_codes", "q_scale", "__q").filter(df.columns.contains)
    require(clash.isEmpty,
      s"withCodes would overwrite existing column(s): ${clash.mkString(", ")}")
    df.withColumn("__q", encodeUdf(col(embCol).cast("array<double>")))
      .withColumn("q_codes", col("__q._1"))
      .withColumn("q_scale", col("__q._2"))
      .drop("__q")
  }

  /** Two-stage top-k: approximate dot on int8 codes selects
    * `overFetch × k` candidates (narrow scan of codes+scale only), exact
    * float cosine re-ranks the survivors. Query comes as a 1-row frame
    * with column `qe` (array<double>), like [[VectorSearch.knnByExample]].
    */
  def topK(corpus: DataFrame, embCol: String, query: DataFrame,
           k: Int, overFetch: Int = 4, tieBreak: Seq[String] = Nil): DataFrame = {
    val q = withCodes(query.select(col("qe").cast("array<double>").as("qe")), "qe")
      .withColumnRenamed("q_codes", "qq_codes")
      .withColumnRenamed("q_scale", "qq_scale")
    val coded = withCodes(corpus, embCol)
    val cand = coded.crossJoin(broadcast(q))
      .withColumn("approx_sim",
        approxDotUdf(col("q_codes"), col("q_scale"),
          col("qq_codes"), col("qq_scale")))
      .orderBy((desc("approx_sim") +: tieBreak.map(col)): _*)
      .limit(k * overFetch)
    cand
      .withColumn("similarity", vectors.cosineSim(col(embCol), col("qe")))
      .orderBy((desc("similarity") +: tieBreak.map(col)): _*)
      .limit(k)
      .drop("q_codes", "q_scale", "qq_codes", "qq_scale", "qe", "approx_sim")
  }
}

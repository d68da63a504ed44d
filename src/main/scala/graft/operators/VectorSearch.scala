package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// Column is used by the shared query-vector helper below

import graft.functions.vectors

/** Vector similarity search (reference: backend/embeddings.py:138-193 —
  * pgvector `<=>` cosine KNN with threshold; backend/hybrid_search.py:129-197
  * — semantic re-rank fused with distance score).
  *
  * Exact brute-force scan: at test scale this is both exact and fast; the
  * plan is a single narrow projection + `TakeOrderedAndProject` (distributed
  * top-k, no global sort, no shuffle of the corpus). The 100 TB path is
  * [[graft.operators.AnnIndex]] (LSH bucketing) — same API, approximate.
  */
object VectorSearch {

  /** Top-k most-similar rows to `queryVec`, keeping rows with
    * cosine ≥ `threshold` (reference defaults: threshold 0.7, k 5 —
    * backend/main.py:362-363).
    */
  def knn(corpus: DataFrame, embCol: String, queryVec: Seq[Float],
          k: Int, threshold: Double,
          tieBreak: Seq[String] = Nil): DataFrame =
    scored(corpus, embCol, typedLit(queryVec), k, threshold, tieBreak)

  /** KNN where the query vector comes from a 1-row DataFrame (column
    * `queryCol`), broadcast to the corpus — the common "query by example"
    * shape in the testdata oracles.
    */
  def knnByExample(corpus: DataFrame, embCol: String,
                   query: DataFrame, queryCol: String,
                   k: Int, threshold: Double,
                   tieBreak: Seq[String] = Nil): DataFrame =
    scored(corpus.crossJoin(broadcast(query)), embCol, col(queryCol),
      k, threshold, tieBreak)

  /** ONE score/threshold/top-k body behind [[knn]] and [[knnByExample]]
    * (they had drifted into two hand-mirrored copies differing only in
    * where the query vector comes from). `tieBreak` makes the k-boundary
    * row deterministic when similarities tie exactly (duplicate texts
    * under the deterministic embedding stub tie routinely) — the same
    * dial every other top-k face here exposes. */
  private def scored(corpus: DataFrame, embCol: String, q: Column,
                     k: Int, threshold: Double,
                     tieBreak: Seq[String]): DataFrame =
    corpus.filter(col(embCol).isNotNull)
      .withColumn("similarity", vectors.cosineSim(col(embCol), q))
      .filter(col("similarity") >= threshold)
      .orderBy(desc("similarity") +: tieBreak.map(col): _*)
      .limit(k)

  /** Semantic re-rank over geo candidates (reference
    * backend/hybrid_search.py:137-197): similarity + normalized distance
    * score fused via `w*sim + (1-w)*distScore` (X14).
    *
    * `maxDistance` is the search RADIUS parameter, not the max observed
    * candidate distance: the reference computes
    * `distance_score = 1 - d/max_dist if max_dist > 0 else 1.0` with
    * `max_dist = max_distance_km` (hybrid_search.py:164-167). Normalizing by
    * the observed max instead would reorder results whenever candidates
    * cluster well inside the radius — and would need a global max-window
    * (single-partition at scale); the fixed denominator is both faithful and
    * embarrassingly parallel.
    */
  def hybridRerank(candidates: DataFrame, embCol: String, queryCol: String,
                   distanceCol: String, maxDistance: Double,
                   weight: Double, limit: Int,
                   tieBreak: Seq[String] = Nil): DataFrame =
    candidates
      // coalesce, not just the embCol null-guard: a NULL QUERY vector
      // (embedding generation failed — the reference's fallback case,
      // hybrid_search.py:133-136) nulls the cosine for every candidate
      // that HAS an embedding, so desc ordering would sort exactly the
      // embedding-less rows (sim forced 0.0) to the top — an inverted
      // ranking. With every similarity collapsing to 0.0 the combined
      // score degrades to the distance score alone: the reference's own
      // distance-only fallback, reached without a mode switch.
      .withColumn("similarity",
        when(col(embCol).isNull, lit(0.0))
          .otherwise(coalesce(
            vectors.cosineSim(col(embCol), col(queryCol)), lit(0.0))))
      .withColumn("distance_score",
        if (maxDistance > 0) lit(1.0) - col(distanceCol) / maxDistance
        else lit(1.0))
      .withColumn("combined_score",
        col("similarity") * weight + col("distance_score") * (1.0 - weight))
      .orderBy(desc("combined_score") +: tieBreak.map(col): _*)
      .limit(limit)
}

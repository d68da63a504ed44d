package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Approximate nearest-neighbor search over an embedding column.
  *
  * The reference's vector index is pgvector HNSW
  * (backend/migrate_pgvector.py:64-77) — a single-node graph index with no
  * Spark analog. The scale path here is random-hyperplane LSH: each vector
  * gets a `planes`-bit bucket id (sign of dot with `planes` deterministic
  * pseudo-random hyperplanes); search touches only the query's bucket, so
  * a 100 TB corpus partitions by bucket and a top-k probes one partition
  * group instead of scanning everything. Brute-force exact search stays in
  * [[VectorSearch.knn]] for oracle parity and small corpora.
  *
  * Hyperplane coefficients are deterministic integers
  * `((i*131 + j*37) % 7) - 3` (i = plane, j = dimension): identical in any
  * engine, no RNG, no seed drift between driver and executors.
  */
object AnnIndex {

  /** SQL for the coefficient of plane i, dimension j (both engines). */
  def coefSql(i: String, j: String): String = s"((($i) * 131 + ($j) * 37) % 7 - 3)"

  /** `planes`-bit LSH bucket id for an embedding column. Compiled kernel
    * (interpreted HOF lambdas cost ~planes × dim evals per row; see
    * [[graft.functions.TextSig]] for the rationale). The j-loop accumulates
    * doubles left-to-right — the same order as the DuckDB rendering below,
    * so every sign, and therefore every bucket id, matches exactly. */
  private val bucketUdf = udf { (emb: Seq[Double], dim: Int, planes: Int) =>
    if (emb == null) null // NULL embeddings never join a bucket
    else {
      var bucket = 0L
      var i = 0
      while (i < planes) {
        var acc = 0.0
        var j = 0
        while (j < dim) {
          acc += ((i * 131 + j * 37) % 7 - 3) * emb(j)
          j += 1
        }
        if (acc > 0) bucket |= 1L << i
        i += 1
      }
      java.lang.Long.valueOf(bucket)
    }
  }

  def bucketExpr(embCol: String, dim: Int, planes: Int): Column =
    bucketUdf(col(embCol).cast("array<double>"), lit(dim), lit(planes))

  /** DuckDB rendering of [[bucketExpr]] for oracle SQL. */
  def bucketSqlDuck(embCol: String, dim: Int, planes: Int): String = {
    val dot = (i: String) =>
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(generate_series(0, ${dim - 1}), j -> " +
        s"${coefSql(i, "j")} * (CAST($embCol AS DOUBLE[]))[j + 1])), (acc, x) -> acc + x)"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(0, ${planes - 1}), i -> " +
      s"CASE WHEN ${dot("i")} > 0 THEN CAST(pow(2, i) AS BIGINT) ELSE CAST(0 AS BIGINT) END)), " +
      s"(acc, b) -> acc + b)"
  }

  /** Corpus with an LSH `bucket` column appended — persist this (partitioned
    * by bucket) as the "index build". */
  def withBucket(df: DataFrame, embCol: String, dim: Int, planes: Int): DataFrame =
    df.withColumn("bucket", bucketExpr(embCol, dim, planes))

  /** ANN top-k: restrict to the query's bucket, then exact cosine re-rank.
    * `query` is a 1-row frame with the query embedding in `queryCol`. */
  def annTopK(corpus: DataFrame, embCol: String, dim: Int, planes: Int,
              query: DataFrame, queryCol: String, k: Int,
              tieBreak: Seq[String] = Nil): DataFrame = {
    val q = withBucket(query.select(col(queryCol)), queryCol, dim, planes)
      .withColumnRenamed("bucket", "q_bucket")
    withBucket(corpus, embCol, dim, planes)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .withColumn("similarity", vectors.cosineSim(col(embCol), col(queryCol)))
      .orderBy(desc("similarity") +: tieBreak.map(col): _*)
      .limit(k)
  }
}

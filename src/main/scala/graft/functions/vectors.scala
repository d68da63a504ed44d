package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column expressions.
  *
  * The reference stores 768-dim pgvector embeddings and computes cosine
  * similarity in Python (backend/embeddings.py:112-135) / numpy
  * (backend/hybrid_search.py:150-161). Here similarity is a native codegen
  * Catalyst expression ([[graft.plans.CosineSim]]) when GraftExtensions is
  * installed, a compiled Scala UDF otherwise — never an interpreted HOF
  * lambda (benchmarked ~10x slower). Arrays are cast to `array<double>`
  * first so accumulation order and precision match the DuckDB oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])` exactly; the native,
  * UDF and DuckDB paths produce bit-identical doubles (oracle-gated).
  */
object vectors {

  /** Σ aᵢ·bᵢ, sequential left-to-right accumulation in double — the same
    * order DuckDB's list_dot_product and a zip_with/aggregate fold use, so
    * all three produce bit-identical doubles. Compiled loop, not a Catalyst
    * HOF: interpreted lambda evaluation made brute-force similarity scans
    * ~10x slower at bench scale. `private[graft]` (not `private`): the
    * streaming face ([[graft.streaming.EventsStream.embedNearDupStream]])
    * calls this same kernel inside its state machine so its driver-gated
    * stream/batch cosine parity can never drift at rounding boundaries. */
  private[graft] def dotKernel(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  // Array[Double] (not Seq) parameters: Spark deserializes array<double>
  // into a primitive double[] in one toDoubleArray copy, where a Seq
  // parameter pays a per-element converter — ~13 µs vs ~0.5 µs per call on
  // 64-dim vectors, the difference between 2 s and 0.1 s on a 150k-pair
  // dedup join. java.lang.Double returns: NULL embeddings (the reference's
  // columns are nullable) must yield NULL, not a task-aborting NPE.
  // Kept as the extension-free fallback; [[dot]]/[[cosineSim]] route
  // through the native codegen expressions when GraftExtensions is
  // installed (ArrayData in place, no copy, no codegen fence).
  private val dotUdf = udf { (a: Array[Double], b: Array[Double]) =>
    if (a == null || b == null) null
    else java.lang.Double.valueOf(dotKernel(a, b))
  }

  private val cosineUdf = udf { (a: Array[Double], b: Array[Double]) =>
    if (a == null || b == null) null
    else {
      val na = math.sqrt(dotKernel(a, a))
      val nb = math.sqrt(dotKernel(b, b))
      java.lang.Double.valueOf(
        if (na == 0.0 || nb == 0.0) 0.0 else dotKernel(a, b) / (na * nb))
    }
  }

  /** true when the active session has [[graft.plans.GraftExtensions]]'
    * function registrations (Bench/Verify/tests all install them). */
  private def extensionsActive: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("cosine_sim"))

  def dot(a: Column, b: Column): Column =
    if (extensionsActive)
      call_function("dot_product", a.cast("array<double>"), b.cast("array<double>"))
    else dotUdf(a.cast("array<double>"), b.cast("array<double>"))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either norm is 0 (backend/embeddings.py:130-131). */
  def cosineSim(a: Column, b: Column): Column =
    if (extensionsActive)
      call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))
    else cosineUdf(a.cast("array<double>"), b.cast("array<double>"))

  /** Cosine distance, pgvector `<=>` form (backend/embeddings.py:170). */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)

  /** SQL-text twin of [[cosineSim]] for DuckDB oracles (same double math,
    * INCLUDING the zero-norm guard — without it a zero vector, e.g. the
    * hashing-TF embedding of a blank doc, is 0/0 = NaN on the oracle side
    * while the kernel returns 0.0, and fixedPoint over NaN errors). */
  def cosineSimSql(a: String, b: String): String = {
    val na = s"sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[]))"
    val nb = s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))"
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 " +
      s"ELSE list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / ($na * $nb) END)"
  }

  /** Deterministic stand-in embedder (reference embeds via a Vertex AI RPC —
    * backend/embeddings.py:47-73 — which a zero-egress engine cannot call).
    * Hashing-trick term-frequency: each whitespace token hashes (polynomial
    * char hash, [[graft.functions.text.tokenHash]]) into one of `dim`
    * buckets; bucket counts are L2-normalized. Same expression renders for
    * DuckDB, so embed→similarity pipelines are oracle-checkable end-to-end.
    */
  def embedStubSql(d: Dialect, col: String, dim: Int): String = {
    val hs = text.tokenHashes(d, col)
    val counts = d.transform(d.seq("0", (dim - 1).toString), "i",
      s"CAST(${d.size(d.filterArr(hs, "h", s"h % $dim = i"))} AS DOUBLE)")
    // no CTE available inside an expression: norm recomputed per element is
    // fine at dim<=32 demo scale; real pipelines materialize the counts col
    val norm = s"sqrt(${d.fold(counts, "CAST(0.0 AS DOUBLE)", "acc", "x", "acc + x * x")})"
    d.transform(counts, "x", s"CASE WHEN $norm = 0.0 THEN 0.0 ELSE x / $norm END")
  }

  /** Column form of [[embedStubSql]] over a named text column — the
    * compiled [[TextSig.embed]] kernel, same doubles as the SQL fragment
    * (asserted in ModulesSpec): the interpreted-HOF rendering re-tokenizes
    * the document O(dim²) times per row and benchmarked ~180 ms/row. */
  def embedStub(textColName: String, dim: Int = 16): Column =
    TextSig.embedUdf(org.apache.spark.sql.functions.col(textColName),
      org.apache.spark.sql.functions.lit(dim))
}

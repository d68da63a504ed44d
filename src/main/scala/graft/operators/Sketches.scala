package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency sketch (count-min) as a typed Aggregator.
  *
  * The scale sibling of q_approx_distinct's HLL: where HLL answers "how
  * many distinct keys", count-min answers "how often does key X occur"
  * without materializing the full key->count map. An exact per-key count of
  * a skewed 100 TB fact column is a full shuffle of every key; the sketch
  * is a fixed-size (depth x width) counter grid that combines map-side like
  * any partial aggregate — only the grids cross the exchange. Estimates
  * overcount only (never undercount): est(k) in [true(k), true(k) + eps*N]
  * with the configured confidence, asserted in ModulesSpec.
  *
  * Built on Spark's public `org.apache.spark.util.sketch.CountMinSketch`
  * (the same structure `DataFrameStatFunctions.countMinSketch` collects to
  * the driver); wrapping it in an Aggregator keeps it usable per-GROUP and
  * inside one mixed agg pass, not just as a driver-side action.
  */
object Sketches {

  /** Global/per-group count-min over a long key column; `finish` reports
    * estimates for the fixed `queryKeys`, as (key, est) structs in
    * queryKeys order. */
  final class CmsAgg(eps: Double, confidence: Double, seed: Int,
                     queryKeys: Seq[Long])
    extends Aggregator[java.lang.Long, CountMinSketch, Seq[KeyEst]] {

    override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)

    override def reduce(b: CountMinSketch, k: java.lang.Long): CountMinSketch = {
      if (k != null) b.addLong(k)
      b
    }

    override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
      b1.mergeInPlace(b2)
      b1
    }

    override def finish(b: CountMinSketch): Seq[KeyEst] =
      queryKeys.map(k => KeyEst(k, b.estimateCount(java.lang.Long.valueOf(k))))

    // kryo buffer: the sketch rides ObjectHashAggregate as a live object and
    // only serializes at spill/exchange boundaries
    override def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
    override def outputEncoder: Encoder[Seq[KeyEst]] = ExpressionEncoder()
  }

  final case class KeyEst(key: Long, est: Long)

  /** Column form: `agg(Sketches.cms(0.001, 0.99, 42, keys)(col("k")))` →
    * `array<struct<key:bigint,est:bigint>>`. */
  def cms(eps: Double, confidence: Double, seed: Int, queryKeys: Seq[Long])
         (key: Column): Column =
    udaf(new CmsAgg(eps, confidence, seed, queryKeys),
      Encoders.LONG.asInstanceOf[Encoder[java.lang.Long]])(key)

  /** Mutable Misra-Gries buffer: at most k live counters + how many items
    * this summary has absorbed (the error denominator). A plain
    * java.util.HashMap, NOT scala mutable.LongMap: the buffer rides
    * Encoders.kryo, and kryo's field-level reconstruction of LongMap's
    * specialized internals produced a corrupt object whose foreach
    * crashed the JVM outright (hs_err in LongMap.foreach); kryo has a
    * dedicated, correct serializer for java maps. */
  final case class MgBuf(counters: java.util.HashMap[java.lang.Long, java.lang.Long],
                         var n: Long)

  /** Misra-Gries heavy-hitters summary as a typed Aggregator — the
    * deterministic-bound sibling of [[CmsAgg]]: count-min answers "how
    * often does key X occur" for known probes with a probabilistic
    * overcount bound; Misra-Gries answers "WHICH keys are frequent"
    * with a deterministic one — no hashing, no seed, no failure
    * probability. With k counters: estimates only undercount, the
    * undercount is at most n/(k+1), and therefore every key with true
    * frequency above n/(k+1) is guaranteed present in the summary
    * (superset property). Merging follows Agarwal et al., "Mergeable
    * Summaries" (PODS'12): add counters pointwise, and if more than k
    * survive, subtract the (k+1)-th largest count from all and drop the
    * non-positives — the bound still holds after any merge tree, so the
    * summary is safe for map-side partial aggregation at any scale.
    *
    * The SET of surviving counters (and the exact estimates) depends on
    * encounter order, so it is not reproducible across shuffles — callers
    * wanting deterministic OUTPUT filter the candidates by exact count
    * (one semi-join probe), which the superset property makes exact:
    * see q_mg_heavy. */
  final class MgAgg(k: Int)
    extends Aggregator[java.lang.Long, MgBuf, Seq[KeyEst]] {
    require(k >= 1, "Misra-Gries needs at least one counter")

    override def zero: MgBuf =
      MgBuf(new java.util.HashMap[java.lang.Long, java.lang.Long], 0L)

    /** decrement every counter by `d`, dropping the non-positive */
    private def decrementAll(m: java.util.HashMap[java.lang.Long, java.lang.Long],
                             d: Long): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue - d
        if (c <= 0) it.remove() else e.setValue(c)
      }
    }

    override def reduce(b: MgBuf, key: java.lang.Long): MgBuf = {
      if (key == null) return b
      b.n += 1
      val cur = b.counters.get(key)
      if (cur != null) b.counters.put(key, cur + 1)
      else if (b.counters.size < k) b.counters.put(key, 1L)
      // decrement-all kills at least one counter (classic MG step); the
      // arriving item is absorbed into the decrement, not inserted
      else decrementAll(b.counters, 1L)
      b
    }

    override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
      val it = b2.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = b1.counters.get(e.getKey)
        b1.counters.put(e.getKey,
          if (cur == null) e.getValue else cur + e.getValue)
      }
      b1.n += b2.n
      if (b1.counters.size > k) {
        // subtract the (k+1)-th largest count, keep strictly positive
        import scala.jdk.CollectionConverters._
        val kth = b1.counters.values.asScala.map(_.longValue).toArray
          .sorted(Ordering[Long].reverse)(k)
        decrementAll(b1.counters, kth)
      }
      b1
    }

    /** surviving (key, est) counters sorted by key; get the error
      * denominator n from a `count(keyCol)` in the same agg pass */
    override def finish(b: MgBuf): Seq[KeyEst] = {
      import scala.jdk.CollectionConverters._
      b.counters.asScala.toSeq
        .map { case (key2, c) => KeyEst(key2.longValue, c.longValue) }
        .sortBy(_.key)
    }

    override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    override def outputEncoder: Encoder[Seq[KeyEst]] = ExpressionEncoder()
  }

  /** Column form: `agg(Sketches.misraGries(8)(col("k")))` →
    * `array<struct<key:bigint,est:bigint>>`. */
  def misraGries(k: Int)(key: Column): Column =
    udaf(new MgAgg(k), Encoders.LONG.asInstanceOf[Encoder[java.lang.Long]])(key)
}

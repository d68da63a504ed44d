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
}

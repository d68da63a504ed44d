package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a mergeable bounded-heap aggregate.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k`) is exact but sorts ENTIRE groups after the shuffle — at
  * 100 TB a hot group is millions of rows buffered and sorted on one task
  * for a 3-row answer. This [[Aggregator]] keeps a k-bounded buffer,
  * combines map-side like any partial aggregate, and ships at most k
  * (id, score) pairs per group per map partition through the exchange.
  * `TakeOrderedAndProject` does the same trick for GLOBAL top-k; Spark has
  * no built-in per-GROUP analog (reference top-k loops:
  * search_housing.py:128-143, main.py:466-475).
  *
  * Determinism: ordering is (score DESC, id ASC) — ties cannot reorder
  * results between runs or cluster sizes.
  */
object TopK {

  /** One candidate: `id` is the payload key, `score` the ranking value. */
  final case class Scored(id: Long, score: Double)

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Buffer invariant: sorted by (score DESC, id ASC), length <= k. */
  final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.length >= k && !beats(a, buf.last)) buf
      else {
        val i = buf.indexWhere(b => beats(a, b)) match {
          case -1 => buf.length
          case x => x
        }
        ((buf.take(i) :+ a) ++ buf.drop(i)).take(k)
      }

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(reduce) // both k-bounded: O(k^2) per merge, k tiny

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column form: `agg(TopK.topK(3)(col("id"), col("score")).as("tk"))` —
    * result is `array<struct<id:bigint,score:double>>` in rank order. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    (id: Column, score: Column) => fn(id, score)
  }
}

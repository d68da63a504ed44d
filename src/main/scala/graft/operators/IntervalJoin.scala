package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join: events matched to the keyed interval(s)
  * containing them (`start <= ts < end`) — the visit-in-stay /
  * event-in-campaign shape, third of the engine's non-equi join patterns
  * ([[AsOfJoin]] = point→latest-preceding, [[GeoSearch.gridPairs]] =
  * distance pairs, this = point-in-range).
  *
  * A raw `BETWEEN` theta-join is a per-key cross product; the blocked plan
  * buckets time like [[GeoSearch.gridPairs]] buckets space: each interval
  * replicates to every `bucketMinutes` bucket it overlaps, each event
  * lives in exactly one home bucket, so a qualifying (interval, event)
  * pair meets in exactly one cell — the event's — and the shuffle is keyed
  * by (key, bucket). Replication factor is interval length / bucket size:
  * size buckets near the typical interval length, and cap pathological
  * intervals upstream the way mega LSH buckets are capped.
  */
object IntervalJoin {

  /** Inner join: one output row per (interval, contained event). Interval
    * ends are exclusive (`start <= ts < end`), the sessionization
    * convention. Output: interval columns + the event's columns prefixed
    * `e_`. Both frames need the join key non-null. */
  def containsJoin(intervals: DataFrame, events: DataFrame,
                   key: String, startCol: String, endCol: String,
                   tsCol: String, bucketMinutes: Int): DataFrame = {
    // micros, not unix_timestamp: second-truncation would compute a
    // fractional-second end's last bucket one short and silently drop
    // events in that bucket (events.ts IS micros-precision here)
    val bucketUs = bucketMinutes * 60L * 1000000L
    // drop malformed intervals (end <= start) BEFORE the explode: they can
    // never contain an event (the refine below is unsatisfiable), but
    // Spark's sequence() DESCENDS when its bounds invert, so one bad row
    // would fan out |start-end|/bucket junk replicas instead of zero
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b", explode(expr(
        // end is exclusive, so an interval ending exactly on a bucket
        // boundary does not replicate into that bucket
        s"sequence(unix_micros($startCol) div $bucketUs, " +
          s"(unix_micros($endCol) - 1) div $bucketUs)")))
      .hint("shuffle_hash")
    val ev = events.toDF(events.columns.map("e_" + _).toIndexedSeq: _*)
      .withColumn("__b", expr(s"unix_micros(e_$tsCol) div $bucketUs"))
      .hint("shuffle_hash")
    iv.join(ev, iv("__b") === ev("__b") && iv(key) === ev(s"e_$key"))
      .filter(col(s"e_$tsCol") >= col(startCol) && col(s"e_$tsCol") < col(endCol))
      .drop("__b")
  }
}

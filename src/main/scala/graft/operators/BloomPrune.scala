package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi-join — the explicit form of the runtime-filter
  * pattern (Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
  * injects the same shape automatically when its size thresholds are met;
  * this operator makes it deterministic and tunable).
  *
  * Shape: the small (build) side's join keys are compacted into a Bloom
  * filter (one narrow aggregation job), the filter is broadcast, and the
  * probe side is pre-filtered by `mightContain` BEFORE its shuffle or any
  * downstream work. Bloom filters have no false negatives, so the prune
  * never drops a matching row; the exact semi-join afterwards removes the
  * ~fpp false positives, so results are EXACTLY a plain semi-join (that is
  * the oracle for q_bloom_join).
  *
  * Why it matters at 100 TB: a semi-join of a fact table against a 0.1%
  * selective dimension normally shuffles the whole fact side. The bloom
  * prune costs one broadcast of a few MB (1M keys at 3% fpp ≈ 0.9 MB) and
  * cuts the fact shuffle to roughly the match rate. The reference has no
  * analog (Postgres does this with its hash-join batching); this is pure
  * scale engineering.
  */
object BloomPrune {

  /** Exact semi-join of `probe` against `build`'s key set, with a Bloom
    * pre-filter on the probe side. Long-typed keys (the star schema's FK
    * columns). `expectedItems` sizes the filter: overestimating wastes a
    * few bits/key, underestimating raises the false-positive rate (never
    * correctness).
    */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // eager by design: the build side must finish before the probe scan
    // starts (same dependency Spark's adaptive runtime filters have)
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf { (k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k)
    }
    probe.filter(mightContain(col(probeKey)))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}

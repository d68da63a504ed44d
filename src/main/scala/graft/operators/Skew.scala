package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual counterpart to AQE's runtime
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`), for when the
  * skew is known ahead of time (hot users, boilerplate dedup buckets,
  * null-heavy FKs) or the join is not an AQE-splittable sort-merge join.
  *
  * The reference never joins at a scale where skew matters (its biggest join
  * is doses ⋈ medications inside Postgres, backend/health_api.py:155-163);
  * at 100 TB a single hot key can hold an executor hostage for hours, so the
  * engine ships the standard salting pattern as an operator.
  *
  * Shape: the big side's hot key space is split `n` ways by a DETERMINISTIC
  * salt derived from an existing unique column (`pmod(hash(saltFrom), n)`),
  * and the small side is replicated ×n so every salted partition finds its
  * match. Results are exactly those of the unsalted join — only the
  * partitioning changes — which is what lets the DuckDB oracle check the
  * salted plan against the plain SQL join. A `rand()`-based salt would
  * break retry determinism (a re-computed task could re-salt differently);
  * deriving from data keeps tasks idempotent.
  */
object Skew {

  /** Inner equi-join `big ⋈ small ON bigKey = smallKey`, with `big`'s
    * shuffle key salted `n` ways. `saltFrom` is any big-side column with
    * high cardinality (a unique id is ideal); `n` caps the per-key
    * parallelism — set it near the cluster's cores-per-hot-key budget.
    * The small side grows ×n, so keep it broadcast-sized ÷ n.
    */
  def saltedJoin(big: DataFrame, bigKey: String, saltFrom: String,
                 small: DataFrame, smallKey: String, n: Int): DataFrame = {
    require(n > 0)
    val salted = big.withColumn("__salt", pmod(hash(col(saltFrom)), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${n - 1})")))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(bigKey) === replicated(smallKey))
      .drop("__salt")
  }
}

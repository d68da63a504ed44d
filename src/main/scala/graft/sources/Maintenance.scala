package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-maintenance operators — the jobs that keep a 100 TB parquet lake
  * queryable. The reference's maintenance is imperative SQL migrations
  * (backend/migrate_add_location.py:25-45 `ALTER TABLE ADD COLUMN`,
  * backend/migrate_pgvector.py:53-57); on an immutable lake those become
  * schema-merged reads and rewrite jobs.
  */
object Maintenance {

  /** Small-file compaction: rewrite `srcDir` into `dstDir` with file count
    * sized from the actual input bytes (ceil(bytes / targetFileBytes)).
    * Streaming sinks and fine-grained ingest leave thousands of KB-sized
    * files per partition; every query then pays file-open and footer-read
    * per file, and the driver pays listing — at 100 TB that dominates
    * scan time. Rewrite to a separate directory + atomic swap by the
    * orchestrator (an in-place overwrite that fails midway loses the
    * table; this operator refuses to encode that footgun).
    */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(srcDir != dstDir, "compaction rewrites to a NEW directory (atomic swap)")
    val df = spark.read.parquet(srcDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((bytes + targetFileBytes - 1) / targetFileBytes).toLong.max(1L)
    df.repartition(n.toInt).write.mode(SaveMode.Overwrite).parquet(dstDir)
    n
  }

  /** Schema evolution on read (the lake's `ALTER TABLE ADD COLUMN`):
    * merge the schemas of files written before and after a column was
    * added — old rows surface NULL for the new column, no rewrite. Spark
    * leaves mergeSchema off by default because footer-merging every file
    * costs listing time at scale; turning it on is a per-read decision,
    * which is exactly what this helper records. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}

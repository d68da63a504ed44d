package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch kernels.
  *
  * The reference is text-only; this is the training-data-pipeline extension
  * for 100 TB multimodal corpora. The Spark-side plumbing — schema,
  * partition-parallel batch decode, feature schema, frame sampling — is
  * real and tested. The decode kernels themselves are DETERMINISTIC FAKES
  * (this container ships no image/audio codecs): they derive pseudo-pixels
  * and pseudo-features from the byte content, clearly marked below. Swap
  * `fakeDecode` for a real codec (javacv / a Pandas UDF in PySpark) and
  * everything downstream keeps its shape.
  *
  * Scale notes: media rows are large — partition by size
  * (`maxPartitionBytes`), never collect, and keep features (small) in a
  * separate narrow table keyed by media_id so analytic scans skip the bytes
  * entirely (Parquet column pruning does this for free once features are
  * written to their own files).
  */
object Multimodal {

  /** canonical media table schema */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))))))

  // ======================================================================
  // STUB: deterministic fake decoder. A real implementation would invoke an
  // image/audio codec here; none ships in this environment. The fake is a
  // pure function of the bytes, so tests and oracle runs are reproducible.
  // ======================================================================
  private[operators] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < content.length) {
      h = (h ^ (content(i) & 0xffL)) * 1099511628211L
      out((i % dim + dim) % dim) += ((h >>> 33) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** Batch feature extraction: content bytes → `dim`-float feature vector.
    * Typed Dataset mapPartitions (not a per-row UDF, not an RDD drop-down):
    * a real decoder amortizes codec init per partition — the same batch
    * shape Pandas UDFs give PySpark — while rows stay Tungsten-encoded
    * end-to-end and the plan stays a single DeserializeToObject →
    * MapPartitions → SerializeFromObject pipeline Catalyst can place. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens here (codec handles, model weights, ...)
        rows.map { case (id, kind, content) => (id, kind, fakeDecode(content, dim)) }
      }
      .toDF("media_id", "kind", "feature")
  }

  /** Video frame sampling: one row per sampled frame timestamp — a pure
    * generator (explode over a sequence), no decode needed until the frame
    * is actually fetched. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
          .as("frame_ts_ms"))

  /** Resize request plumbing: records the target geometry next to the
    * metadata; the actual pixel work belongs to the decode kernel. */
  def withResizeSpec(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("resize_spec",
      struct(lit(w).as("width"), lit(h).as("height"),
        (col("meta.width") * col("meta.height")).isNotNull.as("known_source")))
}

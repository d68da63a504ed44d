package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Throwaway profiling main — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("local[32]", 32, appName = "scratch")
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val sfDir = "/root/testdata/sf0.1"
    val m = 80
    val stride = 100000000L
    val emb = (0 until m).map { i =>
      Tables.embeddings(spark, sfDir)
        .withColumn("vec_id", col("vec_id") + i * stride)
    }.reduce(_ unionByName _)
    val embB = graft.operators.AnnIndex.withBucket(
      emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb")), "emb", 64, 8)
    t("warm count")(embB.count())
    import graft.functions.vectors
    val sigs = embB.select(col("vec_id").as("id"), col("bucket").as("block"),
      col("emb"))
    val over = sigs.groupBy(col("block"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 64)
      .select(col("block"))
    val wFine = Window.partitionBy(col("block"), col("fine"))
    val mega = sigs.join(over, Seq("block"), "left_semi")
      .withColumn("fine", graft.operators.AnnIndex.signSketchExpr("emb", 16))
      .withColumn("nrm", vectors.l2Norm(col("emb")))
      .withColumn("__fn", count(lit(1)).over(wFine))
      .withColumn("__rep",
        min(struct(col("id"), col("emb"), col("nrm"))).over(wFine))
    t("mega count")(mega.count())
    t("fine group census") {
      mega.groupBy("block", "fine").count()
        .agg(count(lit(1)), max("count"), sum(when(col("count") <= 64, 1))).collect().toSeq
    }
    t("stars only") {
      mega.filter(col("__fn") > 64 && col("id") =!= col("__rep.id")).count()
    }
    t("small members")(mega.filter(col("__fn") <= 64).count())
    t("capped face") {
      graft.operators.Dedup.embeddingPairs(embB, "vec_id", "emb", "bucket",
        threshold = 0.99, maxBucket = 64).count()
    }
    t("salvage full") {
      graft.operators.Dedup.embeddingSalvageEdges(embB, "vec_id", "emb",
        "bucket", threshold = 0.99, maxBucket = 64, maxReps = 16).count()
    }
    spark.stop()
  }
}

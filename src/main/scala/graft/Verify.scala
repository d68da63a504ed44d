package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Graft.session(s"local[$cpus]",
      shufflePartitions = cpus.toInt, appName = "graft-verify",
      extraConf = Map("spark.ui.enabled" -> "false"))
    new java.io.File(outDir).mkdirs()
    // dev-only: SPARK_GRAFT_ONLY=q_a,q_b dumps just those queries (the
    // driver never sets it, so the gate always covers the full catalog)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // a typo'd name would otherwise yield zero dumps + an empty oracle map
    // and check_oracle would print "0 pass, 0 fail" with exit 0 — a silent
    // green. Unknown names must fail loudly.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the catalog: ${unknown.mkString(", ")}")
    }
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // ---- streaming smoke: the streaming tier under the SAME gate as the
    // batch catalog (previously spec-only; its batch twins alone ran here).
    // One bounded availableNow pass over the REAL events table through
    // dedupStream + dailyCounts, parity-asserted against the batch-twin
    // aggregation. A parity break lands in the failures manifest and the
    // nonzero exit like any broken query dump. Skipped under
    // SPARK_GRAFT_ONLY (dev loops), like Bench's isolated re-timing.
    if (only.isEmpty) {
      try streamingSmoke(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] streaming_smoke failed: ${e.getMessage}")
        failures("streaming_smoke") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the persisted-store two-cadence lifecycle as ONE gated scenario
      // (SCALE.md 3b): build store -> 3 capped incremental ingest batches
      // (each appending partitioned files) -> small-file compaction ->
      // audit-cadence salvage sweep -> clustersIncremental folds both ->
      // the verdict must EQUAL the one-shot capped+salvaged run. Every
      // piece is individually green elsewhere; this gate drives the
      // COMPOSITION a continuous-ingest user actually runs.
      try ingestLifecycleSmoke(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] ingest_lifecycle failed: ${e.getMessage}")
        failures("ingest_lifecycle") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the same two-cadence composition on the HAMMING face — a second
      // modality with a different index geometry (chunk pigeonhole vs
      // sign buckets), driving hammingIndexRefresh + chunk-layout
      // compaction + the salvage sweep through clustersIncremental
      try ingestLifecycleSmokeHamming(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_lifecycle_hamming failed: ${e.getMessage}")
        failures("ingest_lifecycle_hamming") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the third modality (r12): band-candidate increments through the
      // token-gated minhashIndexRefresh, band_idx-layout compaction made
      // load-bearing by a mine-parity probe, and the verified salvage
      // tier folded by clustersIncremental — closing the lifecycle
      // matrix (embedding buckets / hamming chunks / minhash bands)
      try ingestLifecycleSmokeMinhash(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_lifecycle_minhash failed: ${e.getMessage}")
        failures("ingest_lifecycle_minhash") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the STREAMING writer for the persisted store (r12): a real
      // multi-micro-batch Structured Streaming run feeding the embedding
      // store through the replay ledger — then the exactly-once claim is
      // ASSERTED by re-applying the last micro-batch (store and pairs
      // must not move), the per-batch mines must equal the batch-cadence
      // twin, and the graduated (ledger-folded) store must equal the
      // refresh-path store and serve identically
      try ingestStreamSmoke(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_stream failed: ${e.getMessage}")
        failures("ingest_stream") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the streaming writer on a SECOND index geometry (hamming chunk
      // layout) through the same real-engine path — leaner leg, same
      // replay/parity/graduation claims
      try ingestStreamSmokeHamming(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_stream_hamming failed: ${e.getMessage}")
        failures("ingest_stream_hamming") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the THIRD mining modality through the real engine (r12): band
      // candidates exactly-once, with graduation proven by the
      // mine-parity probe (the band store carries keys, not payloads)
      try ingestStreamSmokeMinhash(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_stream_minhash failed: ${e.getMessage}")
        failures("ingest_stream_minhash") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // and the two APPEND-ONLY serving stores (IVF lists, PQ codes)
      // through real engines — with this, every persisted store family's
      // streaming writer has run under a Structured Streaming checkpoint,
      // not just its batch body under a spec
      try ingestStreamSmokeServing(spark)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_stream_serving failed: ${e.getMessage}")
        failures("ingest_stream_serving") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      // the streaming SERVE faces (annServeStream / ivfServeStream) —
      // previously the only streaming faces proven by spec alone: a
      // micro-batched query stream answered from persisted stores, with
      // the result ledger complete, replay idempotent, and every slice
      // equal to the batch face's answer for its source batch
      try ingestStreamSmokeServeFaces(spark)
      catch { case e: Throwable =>
        System.err.println(
          s"[verify] ingest_stream_serve_faces failed: ${e.getMessage}")
        failures("ingest_stream_serve_faces") =
          Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the oracle map honors SPARK_GRAFT_ONLY like the dumps: otherwise a
    // filtered dev run leaves a full-catalog oracle_sql.json and
    // check_oracle reports FAIL for every query that was never dumped
    val json = SparkEntry.oracleSql
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Round 4 lost 23 events-based queries silently: their dumps crashed,
    // the catch above only printed to stderr, and the correctness artifact
    // reported all-pass over the SHRUNKEN dumped set. The failures manifest
    // makes a coverage regression machine-visible, and a nonzero exit makes
    // it loud even to a caller that only checks rc.
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries failed to dump: " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }

  /** Bounded streaming run + parity assert (see call site). Throws on any
    * divergence; the caller records it as a gate failure. */
  private def streamingSmoke(spark: SparkSession, sfDir: String): Unit = {
    val tmp = Files.createTempDirectory("graft_stream_smoke")
    try streamingSmokeIn(spark, sfDir, tmp)
    finally deleteTree(spark, tmp.toString)
  }

  private def streamingSmokeIn(spark: SparkSession, sfDir: String,
                               tmp: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.{text, SparkDialect => S}
    val events = graft.core.Tables.events(spark, sfDir)
    val inDir = tmp.resolve("in").toString
    events.write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(events.schema).parquet(inDir)

    // 1) watermark-bounded ingest dedup. All files land in one availableNow
    // micro-batch (no maxFilesPerTrigger cap), so the state store sees the
    // whole table inside one watermark horizon and must keep EXACTLY one
    // survivor per content fingerprint — the arrival-order-free contract
    // the batch side can replay (survivor IDENTITY is arrival-order
    // dependent and is pinned by the ModulesSpec fixture instead).
    val fpCol = expr(text.fingerprint(S, "(event_type || ' ' || props)"))
    val dedup = graft.streaming.EventsStream
      .dedupStream(stream, "(event_type || ' ' || props)")
    val q1 = dedup.writeStream.format("memory").queryName("smoke_dedup")
      .option("checkpointLocation", tmp.resolve("ck1").toString)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val gotFps = spark.table("smoke_dedup")
      .select(fpCol.as("fp")).collect().map(_.getLong(0)).sorted.toSeq
    val wantFps = events
      .select(fpCol.as("fp")).distinct().collect().map(_.getLong(0)).sorted.toSeq
    require(gotFps == wantFps,
      s"streaming dedup parity: ${gotFps.length} survivors with " +
        s"${gotFps.distinct.length} distinct fingerprints vs " +
        s"${wantFps.length} batch-distinct fingerprints")

    // 2) tumbling daily window. Complete output mode emits every window
    // regardless of the final watermark (append would hold back the last
    // open day), so the streaming result must EQUAL the batch twin rollup
    // row for row — avg quantized x100 exactly as q_daily_window ships it.
    val daily = graft.streaming.EventsStream.dailyCounts(stream)
    val q2 = daily.writeStream.format("memory").queryName("smoke_daily")
      .outputMode("complete")
      .option("checkpointLocation", tmp.resolve("ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got = spark.table("smoke_daily")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n").cast("long").as("n"),
        expr(text.fixedPoint("avg_value", 2)).as("avg_x100"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val want = events
      .groupBy(date_format(expr(S.dayTrunc("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr(text.fixedPoint("avg(value)", 2)).as("avg_x100"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    require(got == want,
      s"streaming daily-window parity: ${got.length} streamed rows vs " +
        s"${want.length} batch rows" +
        got.zip(want).collectFirst { case (g, w) if g != w =>
          s"; first divergence $g vs $w" }.getOrElse(""))

    // 3) perceptual near-dup stream (the statefullest r8 code) under the
    // same hard signal: one availableNow pass of a media fixture through
    // mediaNearDupStream (real dHash64 decode, chunk-keyed saturating
    // buckets), parity-asserted against the capped batch hammingPairs
    // plan. Fixture tiers: 60 hash-mixed rasters + 30 single-pixel-edited
    // twins (the bounded-hamming pairs the stream must flag), plus a
    // 200-image MONOCHROME run (dHash exactly 0) that makes every (j, 0)
    // chunk bucket a mega-bucket — the batch cap (maxBucket=64) drops
    // those buckets wholesale, the stream SATURATES them, so the parity
    // splits by tier:
    //  - healthy x healthy: streamed pair set == batch pair set EXACTLY
    //    (no healthy bucket reaches the cap; chunk-bucket order cannot
    //    matter below saturation, so the set is deterministic);
    //  - mono x mono: emissions are order-dependent (each of the 4
    //    saturating buckets emits exactly C(cap+1, 2) pairs among its
    //    first cap+1 arrivals, and which arrivals those are is iterator
    //    order), so the assert is the DETERMINISTIC envelope: all
    //    hamming 0, at least ~one bucket's worth, and at most
    //    4 x C(65, 2) = 8320 distinct pairs — strictly below the 19900
    //    an unsaturated stream would emit, so the bound fails if
    //    saturation ever stops engaging;
    //  - every streamed pair re-verified against recomputed fingerprints
    //    (no false positive can hide in either tier).
    import graft.operators.{Dedup, Multimodal}
    val mediaIn = tmp.resolve("media_in").toString
    val healthy = spark.range(0, 60).select(col("id"))
      .unionByName(spark.range(0, 60).filter(col("id") % 2 === 0)
        .select((col("id") + 80000L).as("id")))
      .select(col("id"), Multimodal.nearImageForDocUdf(col("id")).as("content"))
    val monoBase = 100000L
    val mono = spark.range(0, 200)
      .select((col("id") + monoBase).as("id"),
        Multimodal.monoImageForDocUdf(col("id")).as("content"))
    healthy.unionByName(mono)
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(mediaIn)
    val mediaSchema = spark.read.parquet(mediaIn).schema
    val q3 = graft.streaming.EventsStream
      .mediaNearDupStream(
        spark.readStream.schema(mediaSchema).parquet(mediaIn), "id", "content")
      .writeStream.format("memory").queryName("smoke_neardup")
      .option("checkpointLocation", tmp.resolve("ck3").toString)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    // a pair sharing several chunks emits once per chunk — dedup on the
    // normalized pair, exactly the consumer contract the docstring states
    val streamed = spark.table("smoke_neardup")
      .select(least(col("id"), col("matched_id")).as("a_id"),
        greatest(col("id"), col("matched_id")).as("b_id"), col("hamming"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val fps = spark.read.parquet(mediaIn)
      .select(col("id"), Multimodal.dHash64Udf(col("content")).as("fp"))
    val fpMap = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamed.foreach { case (a, b, hd) =>
      val real = java.lang.Long.bitCount(fpMap(a) ^ fpMap(b)).toLong
      require(real == hd && real <= 3,
        s"streaming near-dup false positive: ($a, $b) reported hamming " +
          s"$hd, recomputed $real") }
    val batchPairs = Dedup.hammingPairs(fps, "id", "fp",
        bits = 64, chunks = 4, maxHamming = 3, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(batchPairs.forall(p => p._1 < monoBase && p._2 < monoBase),
      "batch cap failed to drop the monochrome mega-buckets — fixture broken")
    val streamedHealthy = streamed.filter(p => p._1 < monoBase && p._2 < monoBase)
    require(streamedHealthy == batchPairs,
      s"streaming near-dup parity: ${streamedHealthy.size} healthy streamed " +
        s"pairs vs ${batchPairs.size} capped batch pairs; " +
        s"missing=${(batchPairs -- streamedHealthy).take(3)} " +
        s"extra=${(streamedHealthy -- batchPairs).take(3)}")
    val monoPairs = streamed.filter(p => p._1 >= monoBase && p._2 >= monoBase)
    require(monoPairs.forall(_._3 == 0L),
      "monochrome near-dup pair with nonzero hamming — decode broken")
    val capEnv = 4 * (65 * 64 / 2)
    require(monoPairs.size >= 1900 && monoPairs.size <= capEnv,
      s"streaming saturation envelope: ${monoPairs.size} mono pairs, " +
        s"expected [1900, $capEnv] (200 unsaturated arrivals would emit 19900)")
    // 4) LSH TEXT near-dup stream — the band-keyed sibling of (3), same
    // gate discipline: real document texts through the compiled MinHash
    // kernels, streamed against the capped batch
    // minhashLshVerifiedPairs verdict. Boilerplate tier: 150 copies of
    // one license header — every band bucket a mega-bucket, so the
    // batch cap drops them wholesale and the stream SATURATES; the
    // deterministic envelope is [C(65,2), 4·C(65,2)] distinct pairs,
    // strictly below the 11 175 an unsaturated stream would emit.
    // Unlike the hamming tier, every emission is exact-Jaccard VERIFIED
    // per arrival, so boilerplate pairs must all carry jaccard 1.0 and
    // no cross (healthy×boilerplate) pair can exist at the threshold.
    val lshIn = tmp.resolve("lsh_in").toString
    val boilerBase = 200000L
    val twinBase = 150000L
    val boiler = "this software is provided as is without warranty of " +
      "any kind express or implied including fitness for a purpose"
    val lshDocs = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 120).select(col("doc_id").as("id"), col("text"))
    // exact twins of the first dozen long docs keep the healthy parity
    // leg NON-VACUOUS at every SF (the organic corpus has no pairs at
    // threshold 0.8): each twin is a 2-member band bucket, far under
    // the cap, so the capped batch MUST find it and parity must too
    val lshTwins = lshDocs
      .filter(col("id") < 15 && length(col("text")) >= 60)
      .select((col("id") + twinBase).as("id"), col("text"))
    lshDocs.unionByName(lshTwins)
      .unionByName(spark.range(0, 150)
        .select((col("id") + boilerBase).as("id"), lit(boiler).as("text")))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(lshIn)
    val lshSchema = spark.read.parquet(lshIn).schema
    val (k4, bands4, sh4, thr4) = (16, 4, 3, 0.8)
    // one normalization for every (a, b, similarity) pair set this
    // section compares — streamed or batch — so tiers can never diverge
    def jpairs(df: org.apache.spark.sql.DataFrame,
               a: String, b: String, v: String = "jaccard"): Set[(Long, Long, Double)] =
      df.select(least(col(a), col(b)).as("a"),
          greatest(col(a), col(b)).as("b"), col(v))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val q4 = graft.streaming.EventsStream
      .lshNearDupStream(
        spark.readStream.schema(lshSchema).parquet(lshIn), "id", "text",
        k = k4, bands = bands4, shingleN = sh4, threshold = thr4,
        maxBucket = 64)
      .writeStream.format("memory").queryName("smoke_lsh")
      .option("checkpointLocation", tmp.resolve("ck4").toString)
      .trigger(Trigger.AvailableNow()).start()
    q4.awaitTermination()
    val lshStreamed = jpairs(spark.table("smoke_lsh"), "id", "matched_id")
    val lshBatch = jpairs(graft.operators.Dedup.minhashLshVerifiedPairs(
        spark.read.parquet(lshIn), "id", "text",
        k = k4, bands = bands4, shingleN = sh4, threshold = thr4,
        maxBucket = 64), "a_id", "b_id")
    require(lshBatch.forall(p => p._1 < boilerBase && p._2 < boilerBase),
      "batch cap failed to drop the boilerplate band buckets — fixture broken")
    require(lshBatch.size >= 10,
      s"planted exact-twin fixture yielded only ${lshBatch.size} capped " +
        "batch pairs — the healthy parity leg went vacuous")
    val lshHealthy = lshStreamed.filter(p => p._1 < boilerBase && p._2 < boilerBase)
    require(lshHealthy == lshBatch,
      s"streaming LSH parity: ${lshHealthy.size} healthy streamed pairs vs " +
        s"${lshBatch.size} capped batch pairs; " +
        s"missing=${(lshBatch -- lshHealthy).take(3)} " +
        s"extra=${(lshHealthy -- lshBatch).take(3)}")
    val boilerPairs = lshStreamed.filter(p => p._1 >= boilerBase && p._2 >= boilerBase)
    require(boilerPairs.forall(_._3 == 1.0),
      "boilerplate near-dup pair verified below jaccard 1.0 — kernel broken")
    require(lshStreamed.size == lshHealthy.size + boilerPairs.size,
      "cross healthy×boilerplate pair cleared the jaccard threshold")
    require(boilerPairs.size >= 2080 && boilerPairs.size <= capEnv,
      s"streaming LSH saturation envelope: ${boilerPairs.size} boilerplate " +
        s"pairs, expected [2080, $capEnv] (150 unsaturated arrivals " +
        "would emit 11175)")
    // 5) the salvageRep STAR tier on the same fixture: saturation keeps
    // each bucket's min-id arrival as representative, so the 85 post-
    // saturation boilerplate arrivals emit verified star edges (jaccard
    // 1.0) instead of going silent. The healthy tier is untouched (twin
    // buckets never saturate). Today's single-file fixture yields
    // exactly C(65,2) + 85 = 2165 distinct pairs; the gate pins the
    // ORDER-ROBUST envelope [2165, 4·2165] — each band bucket emits at
    // least its own first-65 pairs + 85 stars whatever the arrival
    // order, and at most all four contribute disjoint sets — plus the
    // tier's actual promise: EVERY flood member links into the pair
    // graph (the connectivity the batch salvage tier provides offline,
    // kept in flight here)
    val q5 = graft.streaming.EventsStream
      .lshNearDupStream(
        spark.readStream.schema(lshSchema).parquet(lshIn), "id", "text",
        k = k4, bands = bands4, shingleN = sh4, threshold = thr4,
        maxBucket = 64, salvageRep = true)
      .writeStream.format("memory").queryName("smoke_lsh_star")
      .option("checkpointLocation", tmp.resolve("ck5").toString)
      .trigger(Trigger.AvailableNow()).start()
    q5.awaitTermination()
    val starStreamed = jpairs(spark.table("smoke_lsh_star"), "id", "matched_id")
    val starHealthy = starStreamed.filter(p => p._1 < boilerBase && p._2 < boilerBase)
    require(starHealthy == lshBatch,
      s"star tier disturbed the healthy emissions: ${starHealthy.size} vs " +
        s"${lshBatch.size}")
    val starBoiler = starStreamed -- starHealthy
    require(starBoiler.forall(p =>
        p._1 >= boilerBase && p._2 >= boilerBase && p._3 == 1.0),
      "star-tier boilerplate emission crossed tiers or verified below 1.0")
    require(starBoiler.size >= 2165 && starBoiler.size <= 4 * 2165,
      s"star-tier boilerplate emissions: ${starBoiler.size}, expected " +
        "[2165, 8660] = per-bucket C(65,2) + 85 star edges, up to 4 bands")
    val linked = starBoiler.flatMap(p => Seq(p._1, p._2))
    require((boilerBase until boilerBase + 150).forall(linked.contains),
      s"star tier left flood members unlinked: " +
        s"${(boilerBase until boilerBase + 150).filterNot(linked.contains).take(3)}")
    // 6) EMBEDDING near-dup stream — the vector face of the matrix under
    // the same gate: real embeddings + 12 planted x2-rescaled twins
    // (cosine exactly 1.0, sign-LSH scale-invariant so each twin shares
    // its original's bucket) + a 150-copy i-rescaled flood of one
    // synthetic vector, all in ONE bucket the healthy fixture is
    // filtered away from, PLUS a planted POISONING OUTLIER: a vector in
    // the SAME sign-LSH bucket (hyperplane signs agree) whose cosine
    // against the flood sits strictly under the threshold, carrying the
    // SMALLEST id in the bucket and arriving first — the adversary for
    // the star tier's rep election. A single-rep design crowns it at
    // saturation and the 85+ post-saturation flood arrivals all verify
    // below threshold against it: the flood goes BLIND and this gate
    // fails. The diverse rep set must give the flood its own rep slot.
    // The healthy tier must equal the capped batch embeddingPairs
    // verdict over the SAME sign-LSH blocking in both modes.
    val embIn = tmp.resolve("emb_in").toString
    val (dimE, planesE, thrE) = (64, 8, 0.99)
    val floodVec = expr("transform(sequence(1, 64), j -> " +
      "CAST(CASE WHEN j % 2 = 0 THEN 1.0 ELSE -0.5 END AS DOUBLE))")
    val floodBucket = spark.range(1)
      .select(graft.operators.AnnIndex.bucketExprOf(floodVec, dimE, planesE)
        .as("b")).head().getLong(0)
    // deterministic outlier search: Gaussian perturbations of the flood
    // direction sized for cosine ≈ 0.95 (far under thrE = 0.99, aligned
    // enough to usually keep all 8 hyperplane signs); cosine is plain
    // Scala math, only the bucket needs the engine's hash — one job over
    // the surviving candidates, smallest seed wins for replayability
    val floodArr = Array.tabulate(64)(i => if ((i + 1) % 2 == 0) 1.0 else -0.5)
    def cosScala(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val nV = math.sqrt(floodArr.map(x => x * x).sum)
    val cands = (0 until 64).map { seed =>
      val rnd = new scala.util.Random(seed)
      val w = Array.fill(64)(rnd.nextGaussian())
      val nW = math.sqrt(w.map(x => x * x).sum)
      floodArr.zip(w).map { case (x, y) => x + 0.33 * nV / nW * y }
    }.filter(u => cosScala(u, floodArr) <= 0.98)
    val outlierArr = {
      import spark.implicits._
      val hit = cands.zipWithIndex.toDF("emb", "seed")
        .select(col("seed"),
          graft.operators.AnnIndex.bucketExprOf(col("emb"), dimE, planesE)
            .as("b"))
        .where(col("b") === floodBucket).orderBy("seed").limit(1).collect()
      require(hit.nonEmpty,
        "no same-bucket sub-threshold outlier among 64 candidate draws — " +
          "widen the search (the poisoning leg would go vacuous)")
      cands(hit.head.getInt(0))
    }
    val healthyEmb = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 100)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"))
      .filter(graft.operators.AnnIndex.bucketExprOf(col("emb"), dimE, planesE)
        =!= floodBucket)
    healthyEmb
      .unionByName(healthyEmb.filter(col("id") < 12)
        .select((col("id") + twinBase).as("id"),
          expr("transform(emb, x -> x * 2.0D)").as("emb")))
      // the poisoning outlier: smallest id in the flood bucket, planted
      // BEFORE the flood rows so it is in the bucket from the start
      .unionByName(spark.range(1)
        .select(lit(boilerBase - 1).as("id"),
          array(outlierArr.toIndexedSeq.map(lit): _*)
            .cast("array<double>").as("emb")))
      .unionByName(spark.range(0, 150)
        .select((col("id") + boilerBase).as("id"),
          expr("transform(sequence(1, 64), j -> " +
            "CAST(CASE WHEN j % 2 = 0 THEN 1.0 ELSE -0.5 END AS DOUBLE) " +
            "* (id + 1))").as("emb")))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(embIn)
    val embSchema = spark.read.parquet(embIn).schema
    val embBatch = jpairs(graft.operators.Dedup.embeddingPairs(
        graft.operators.AnnIndex.withBucket(
          spark.read.parquet(embIn), "emb", dimE, planesE),
        "id", "emb", "bucket", threshold = thrE, maxBucket = 64),
      "a_id", "b_id", "cosine")
    require(embBatch.forall(p => p._1 < boilerBase && p._2 < boilerBase),
      "batch cap failed to drop the embedding flood bucket — fixture broken")
    require(embBatch.size >= 10,
      s"planted rescale-twin fixture yielded only ${embBatch.size} capped " +
        "batch pairs — the embedding parity leg went vacuous")
    for (star <- Seq(false, true)) {
      val qe = graft.streaming.EventsStream
        // wide = false: this parity leg's batch comparator blocks on the
        // legacy family (embeddingPairs over AnnIndex.withBucket above)
        .embedNearDupStream(
          spark.readStream.schema(embSchema).parquet(embIn), "id", "emb",
          dim = dimE, planes = planesE, threshold = thrE, maxBucket = 64,
          salvageRep = star, wide = false)
        .writeStream.format("memory").queryName(s"smoke_emb_$star")
        .option("checkpointLocation", tmp.resolve(s"ck6_$star").toString)
        .trigger(Trigger.AvailableNow()).start()
      qe.awaitTermination()
      val embStreamed = jpairs(spark.table(s"smoke_emb_$star"),
        "id", "matched_id", "cosine")
      val embHealthy = embStreamed.filter(p =>
        p._1 < boilerBase && p._2 < boilerBase)
      require(embHealthy == embBatch,
        s"embedding parity (star=$star): ${embHealthy.size} healthy " +
          s"streamed vs ${embBatch.size} batch; " +
          s"missing=${(embBatch -- embHealthy).take(3)} " +
          s"extra=${(embHealthy -- embBatch).take(3)}")
      val embFlood = embStreamed -- embHealthy
      // the outlier (id boilerBase-1) must never verify into ANY pair:
      // a pair touching it would land here and fail the >= boilerBase
      // check, or in the healthy tier and break batch parity — loud
      // either way
      require(embFlood.forall(p =>
          p._1 >= boilerBase && p._2 >= boilerBase && p._3 == 1.0),
        s"embedding flood emission (star=$star) crossed tiers, touched " +
          "the sub-threshold outlier, or verified below 1.0")
      // exact counts pin the OUTLIER-FIRST layout: outlier + 64 flood
      // members pre-saturation -> C(64,2) = 2016 pairs, then (star) 86
      // stars against the flood's own rep = 2102. The ordering lever is
      // fixture-owned but rests on an IMPLEMENTATION property, stated
      // honestly: the single coalesced file is scanned by one task in
      // union row order, and flatMapGroupsWithState's partition sort is
      // key-only and stable (TimSort), so the intra-bucket iterator
      // follows file order. The pre-outlier fixture's exact counts were
      // genuinely order-FREE (150 interchangeable flood members); these
      // are not — which is deliberate, because the exactness doubles as
      // the NON-VACUITY check: had the outlier arrived after saturation
      // the counts would read 2080/2165 and the poisoning leg would
      // prove nothing (a single-rep tier also passes that layout). A
      // drift to 2080/2165 on an engine upgrade therefore means FIX THE
      // FIXTURE ORDERING (e.g. per-file micro-batching), not the tier.
      // A single-rep star tier elects the min-id outlier at saturation
      // and goes BLIND: star mode reads 2016, disjoint from 2102.
      val expectFlood = if (star) 2102 else 2016
      require(embFlood.size == expectFlood,
        s"embedding flood emissions (star=$star): ${embFlood.size}, " +
          s"expected exactly $expectFlood (outlier-first poisoned " +
          "bucket; 2080/2165 = outlier arrived post-saturation, the " +
          "poisoning leg went vacuous — fix the fixture ordering)")
      if (star) {
        val embLinked = embFlood.flatMap(p => Seq(p._1, p._2))
        require((boilerBase until boilerBase + 150).forall(embLinked.contains),
          "embedding star tier left flood members unlinked — the " +
            "poisoning outlier blinded the bucket")
      }
    }
    // 7) VIDEO near-dup stream — the newest decode path folded under the
    // driver gate (its image/LSH/embedding siblings are gated above; the
    // audio face shares this exact wrapper shape and stays spec-pinned):
    // one availableNow pass of real Y4M clips through videoNearDupStream
    // (real codec walk → 64-bit temporal-mean dHash → chunk-keyed
    // saturating buckets), parity-asserted against the capped batch
    // hammingPairs verdict. Fixture tiers mirror (3): 40 hash-mixed
    // clips + 20 single-pixel-edited re-posts (bounded-hamming twins the
    // stream must flag), plus 120 BLACK clips (all-zero planes through
    // the real Y4M walk fingerprint to exactly 0) that make every (j, 0)
    // chunk bucket a mega-bucket — the batch cap drops them wholesale,
    // the stream SATURATES them, and every streamed pair re-verifies
    // against recomputed fingerprints.
    val vidIn = tmp.resolve("vid_in").toString
    val blackBase = 300000L
    val blackY4mUdf = udf { (i: Long) =>
      val (w, h, nf) = ((10 + 2 * (i % 2)).toInt, 8, 3)
      val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
      val fb = w * h + 2 * (w / 2) * (h / 2)
      val marker = "FRAME\n".getBytes("US-ASCII")
      header ++ (1 to nf).flatMap(_ => marker ++ new Array[Byte](fb))
    }
    spark.range(0, 40).select(col("id"),
        Multimodal.nearVideoForDocUdf(col("id")).as("content"))
      .unionByName(spark.range(0, 40).filter(col("id") % 2 === 0)
        .select((col("id") + 80000L).as("id"),
          Multimodal.nearVideoForDocUdf(col("id") + 80000L).as("content")))
      .unionByName(spark.range(0, 120)
        .select((col("id") + blackBase).as("id"),
          blackY4mUdf(col("id")).as("content")))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(vidIn)
    val vidSchema = spark.read.parquet(vidIn).schema
    val q7 = graft.streaming.EventsStream
      .videoNearDupStream(
        spark.readStream.schema(vidSchema).parquet(vidIn), "id", "content")
      .writeStream.format("memory").queryName("smoke_video")
      .option("checkpointLocation", tmp.resolve("ck7").toString)
      .trigger(Trigger.AvailableNow()).start()
    q7.awaitTermination()
    val vidStreamed = spark.table("smoke_video")
      .select(least(col("id"), col("matched_id")).as("a_id"),
        greatest(col("id"), col("matched_id")).as("b_id"), col("hamming"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val vidFps = spark.read.parquet(vidIn)
      .select(col("id"),
        Multimodal.videoFingerprintUdf(col("content"), lit(2)).as("fp"))
    val vidFpMap = vidFps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vidStreamed.foreach { case (a, b, hd) =>
      val real = java.lang.Long.bitCount(vidFpMap(a) ^ vidFpMap(b)).toLong
      require(real == hd && real <= 3,
        s"streaming video near-dup false positive: ($a, $b) reported " +
          s"hamming $hd, recomputed $real") }
    val vidBatch = Dedup.hammingPairs(vidFps, "id", "fp",
        bits = 64, chunks = 4, maxHamming = 3, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(vidBatch.forall(p => p._1 < blackBase && p._2 < blackBase),
      "batch cap failed to drop the black-clip mega-buckets — fixture broken")
    require(vidBatch.size >= 15,
      s"planted edited-twin fixture yielded only ${vidBatch.size} capped " +
        "batch pairs — the video parity leg went vacuous")
    val vidHealthy = vidStreamed.filter(p => p._1 < blackBase && p._2 < blackBase)
    require(vidHealthy == vidBatch,
      s"streaming video parity: ${vidHealthy.size} healthy streamed pairs " +
        s"vs ${vidBatch.size} capped batch pairs; " +
        s"missing=${(vidBatch -- vidHealthy).take(3)} " +
        s"extra=${(vidHealthy -- vidBatch).take(3)}")
    val blackPairs = vidStreamed.filter(p => p._1 >= blackBase && p._2 >= blackBase)
    require(blackPairs.forall(_._3 == 0L),
      "black-clip near-dup pair with nonzero hamming — decode broken")
    require(blackPairs.size >= 1900 && blackPairs.size <= capEnv,
      s"streaming video saturation envelope: ${blackPairs.size} black " +
        s"pairs, expected [1900, $capEnv] (120 unsaturated arrivals would " +
        "emit 7140)")
    // 8) AUDIO near-dup stream — the last streaming face folded under the
    // gate (its image/LSH/embedding/video siblings are gated above), at
    // the batch q_audio_neardup geometry: 36-bit frame-energy fingerprint,
    // 3 pigeonhole chunks, hamming ≤ 2, maxBucket=64. Fixture tiers
    // mirror (7): hash-mixed WAV clips + sample-edited twins through the
    // REAL PCM parse, plus a SILENCE run (all-zero samples fingerprint to
    // exactly 0) that makes every (j, 0) chunk bucket a mega-bucket — the
    // batch cap drops those wholesale, the stream SATURATES them, and
    // every streamed pair re-verifies against recomputed fingerprints.
    val audIn = tmp.resolve("aud_in").toString
    val silenceWavUdf = udf { (i: Long) =>
      // minimal PCM16 mono WAV, all-zero samples, length varies per clip
      // (>= the fingerprint's 34-frame minimum of 34*256 samples)
      val n = 34 * 256 + 64 * (i % 4).toInt
      val data = new Array[Byte](n * 2)
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    spark.range(0, 40).select(col("id"),
        Multimodal.nearAudioForDocUdf(col("id")).as("content"))
      .unionByName(spark.range(0, 40).filter(col("id") % 2 === 0)
        .select((col("id") + 80000L).as("id"),
          Multimodal.nearAudioForDocUdf(col("id") + 80000L).as("content")))
      .unionByName(spark.range(0, 120)
        .select((col("id") + blackBase).as("id"),
          silenceWavUdf(col("id")).as("content")))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .coalesce(1).write.mode("overwrite").parquet(audIn)
    val audSchema = spark.read.parquet(audIn).schema
    val q8 = graft.streaming.EventsStream
      .audioNearDupStream(
        spark.readStream.schema(audSchema).parquet(audIn), "id", "content")
      .writeStream.format("memory").queryName("smoke_audio")
      .option("checkpointLocation", tmp.resolve("ck8").toString)
      .trigger(Trigger.AvailableNow()).start()
    q8.awaitTermination()
    val audStreamed = spark.table("smoke_audio")
      .select(least(col("id"), col("matched_id")).as("a_id"),
        greatest(col("id"), col("matched_id")).as("b_id"), col("hamming"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val audFps = spark.read.parquet(audIn)
      .select(col("id"),
        Multimodal.audioFingerprintUdf(col("content"), lit(256)).as("fp"))
    val audFpMap = audFps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    audStreamed.foreach { case (a, b, hd) =>
      val real = java.lang.Long.bitCount(audFpMap(a) ^ audFpMap(b)).toLong
      require(real == hd && real <= 2,
        s"streaming audio near-dup false positive: ($a, $b) reported " +
          s"hamming $hd, recomputed $real") }
    val audBatch = Dedup.hammingPairs(audFps, "id", "fp",
        bits = 36, chunks = 3, maxHamming = 2, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(audBatch.forall(p => p._1 < blackBase && p._2 < blackBase),
      "batch cap failed to drop the silence mega-buckets — fixture broken")
    require(audBatch.size >= 15,
      s"planted edited-twin fixture yielded only ${audBatch.size} capped " +
        "batch pairs — the audio parity leg went vacuous")
    val audHealthy = audStreamed.filter(p => p._1 < blackBase && p._2 < blackBase)
    require(audHealthy == audBatch,
      s"streaming audio parity: ${audHealthy.size} healthy streamed pairs " +
        s"vs ${audBatch.size} capped batch pairs; " +
        s"missing=${(audBatch -- audHealthy).take(3)} " +
        s"extra=${(audHealthy -- audBatch).take(3)}")
    val silencePairs = audStreamed.filter(p => p._1 >= blackBase && p._2 >= blackBase)
    require(silencePairs.forall(_._3 == 0L),
      "silence near-dup pair with nonzero hamming — decode broken")
    // 3 chunk buckets (36/3), not 4: envelope tops out at 3·C(65,2)
    require(silencePairs.size >= 1900 && silencePairs.size <= 3 * (65 * 64 / 2),
      s"streaming audio saturation envelope: ${silencePairs.size} silence " +
        s"pairs, expected [1900, ${3 * (65 * 64 / 2)}] (120 unsaturated " +
        "arrivals would emit 7140)")
    println(s"[verify] streaming_smoke OK: ${gotFps.length} dedup " +
      s"survivors, ${got.length} daily-window rows, " +
      s"${streamedHealthy.size} near-dup pairs parity-matched " +
      s"(+${monoPairs.size} saturation-bounded mono emissions), " +
      s"${lshHealthy.size} LSH pairs parity-matched " +
      s"(+${boilerPairs.size} saturation-bounded boilerplate emissions, " +
      s"star tier ${starBoiler.size} all-linked), " +
      s"${embBatch.size} embedding pairs parity-matched in both modes " +
      "(poisoned flood 2016 capped / 2102 starred, exact, outlier " +
      s"unlinked), ${vidHealthy.size} video pairs parity-matched " +
      s"(+${blackPairs.size} saturation-bounded black-clip emissions), " +
      s"${audHealthy.size} audio pairs parity-matched " +
      s"(+${silencePairs.size} saturation-bounded silence emissions)")
  }

  /** The continuous-ingest lifecycle gate: persisted wide-bucket store →
    * N capped incremental mines + appends → compaction → audit-cadence
    * salvage → incremental cluster fold, asserted EQUAL to the one-shot
    * capped+salvaged verdict over the same corpus. Fixture: the real
    * embeddings rows plus planted positive rescales (same wide bucket by
    * sign-LSH scale invariance, cosine exactly 1.0) — a flood on one
    * real anchor that is over the cap from the initial build (so every
    * batch's flood additions are provably cap-dropped until salvage),
    * and one fresh 3-copy community per batch on an untouched real
    * anchor (so every increment provably mines). The equality is a
    * theorem ONLY while no bucket crosses the cap mid-run (an increment
    * mined while a bucket was small keeps pairs the final one-shot cap
    * would drop), so the gate CHECKS that precondition over the store's
    * own censuses and fails loudly on fixture drift instead of going
    * flaky. Throws on any divergence; the caller records a gate failure. */
  private def ingestLifecycleSmoke(spark: SparkSession, sfDir: String): Unit = {
    val base = Files.createTempDirectory("graft_ingest").toString
    try ingestLifecycleSmokeIn(spark, sfDir, base)
    finally deleteTree(spark, base)
  }

  private def ingestLifecycleSmokeIn(spark: SparkSession, sfDir: String,
                                     base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import graft.operators.{AnnIndex, Dedup}
    import spark.implicits._
    // cap=32 sits ABOVE the biggest organic bucket the embeddings fixture
    // produces at this geometry (measured 13/20/11 members at the three
    // SFs — the fixture's planted near-dup groups share buckets) and WELL
    // BELOW the planted 40-copy flood, so exactly one bucket is ever over
    // the cap and its status never flips — the precondition the over-set
    // census below re-checks on every run
    val (dim, planes, thr, cap, maxReps) = (64, 12, 0.9, 32, 16)
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"))
      .filter(col("id") < 200)
    val anchorIds = Seq(1L, 2L, 3L, 4L, 5L)
    // null-check BEFORE .toArray: a null embedding would NPE one line
    // ahead of the require meant to diagnose exactly that fixture drift
    val anchors = e.filter(col("id").isin(anchorIds: _*)).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).toArray)).toMap
    require(anchors.size == 5 && anchors.values.forall(_ != null),
      "embeddings fixture lost the anchor rows (vec_id 1-5)")
    def copies(anchor: Long, idBase: Long, n: Int): DataFrame =
      (0 until n).map(i => (idBase + i, anchors(anchor).map(_ * (i + 2.0))))
        .toDF("id", "emb")
    // initial corpus: real rows + a 40-copy flood on anchor 1 — its
    // bucket is over the cap from day one, so its status never flips
    val initial = e.unionByName(copies(1L, 500000L, 40))
    // three ingest batches: 3 flood rescales (cap-dropped every batch) +
    // a fresh community on anchors 3/4/5 (fully mined); batch 2 also
    // carries a null embedding, which must ride through as a singleton
    val batches = (1 to 3).map { b =>
      val rows = copies(Seq(3L, 4L, 5L)(b - 1), 600000L + b * 1000L, 3)
        .unionByName(copies(1L, 510000L + b * 1000L, 3))
      if (b == 2)
        rows.unionByName(Seq((700000L, null: Array[Double])).toDF("id", "emb"))
      else rows
    }
    val dir = s"$base/store"
    Dedup.embeddingBucketIndex(initial, "id", "emb", dim, planes)
      .write.partitionBy("bucket").parquet(dir)
    def overCapSet(store: DataFrame): Set[String] = store
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > cap)
      .collect().map(r => String.valueOf(r.get(0))).toSet
    val overInitial = overCapSet(spark.read.parquet(dir))
    require(overInitial.nonEmpty, "planted flood bucket is not over the cap")
    def withB(df: DataFrame): DataFrame =
      df.withColumn("bucket", AnnIndex.wideBucketExpr("emb", dim, planes))
    // ingest cadence: capped pairs + labels, then fold each batch
    var labels = Dedup.clusters(initial.select(col("id")), "id",
      Dedup.embeddingPairs(withB(initial), "id", "emb", "bucket", thr, cap))
      .localCheckpoint()
    var ids = initial.select(col("id"))
    val mined = scala.collection.mutable.ListBuffer.empty[Long]
    for (batch <- batches) {
      // materialize the increment BEFORE the append: the mine is lazy,
      // and re-evaluating it against the already-appended store would
      // silently mine the batch against itself
      val inc = Dedup.embeddingIncrementalPairs(batch,
        spark.read.parquet(dir), "id", "emb", dim, planes, thr, cap)
        .localCheckpoint()
      mined += inc.count()
      Dedup.embeddingIndexRefresh(spark, dir, batch, "id", "emb", dim, planes)
      ids = ids.unionByName(batch.select(col("id")))
      labels = Dedup.clustersIncremental(ids, "id", labels, inc)
        .localCheckpoint()
    }
    require(mined.forall(_ >= 3L),
      s"an ingest batch mined ${mined.mkString(",")} pairs — the planted " +
        "community went vacuous")
    // the capped-only verdict must be provably WRONG on the flood (the
    // q_dedup_apply_salvaged stance: salvage is load-bearing, not decor)
    val floodIds = (Seq(1L) ++ (0 until 40).map(500000L + _) ++
      (1 to 3).flatMap(b => (0 until 3).map(510000L + b * 1000L + _))).toSet
    val preSalvage = labels.filter(col("id").isin(floodIds.toSeq: _*))
      .select(col("cluster")).distinct().count()
    require(preSalvage > 1,
      "flood already connected before salvage — the cap stopped engaging")
    // audit cadence: compact the accumulated small files (the layout must
    // survive: partition dirs, geometry token), then ONE salvage sweep
    // over the compacted store feeds the same incremental fold
    val dir2 = s"$base/store_compacted"
    graft.sources.Maintenance.compactPartitionedTo(spark, dir, dir2, Seq("bucket"))
    require(parquetFiles(dir2) < parquetFiles(dir),
      s"compaction did not shrink the file count: ${parquetFiles(dir)} -> " +
        s"${parquetFiles(dir2)}")
    val full = spark.read.parquet(dir2)
    val overFinal = overCapSet(full)
    require(overInitial == overFinal,
      s"a bucket crossed the cap mid-run (initial over-set $overInitial " +
        s"vs final $overFinal) — the equality precondition broke; re-pin " +
        "the fixture")
    val salvage = Dedup.embeddingSalvageEdges(full, "id", "emb", "bucket",
      thr, cap, maxReps)
    val got = Dedup.clustersIncremental(ids, "id", labels, salvage)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the one-shot comparator a from-scratch user runs
    val all = batches.foldLeft(initial)(_ unionByName _)
    val want = Dedup.clusters(all.select(col("id")), "id",
        Dedup.embeddingPairsSalvaged(withB(all), "id", "emb", "bucket",
          thr, cap, maxReps))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(got == want,
      s"ingest lifecycle diverged from the one-shot run: ${got.size} vs " +
        s"${want.size} label rows; missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    // post-salvage the flood is ONE cluster, and the null row a singleton
    val floodRows = got.filter(t => floodIds(t._1))
    require(floodRows.size == floodIds.size && floodRows.map(_._2).size == 1,
      "salvage did not reconnect the cap-dropped flood")
    require(got.exists(t => t._1 == 700000L && t._3 == 1L),
      "null-embedding row did not survive as a singleton")
    println(s"[verify] ingest_lifecycle OK: ${batches.size} capped " +
      s"increments (${mined.mkString("/")} pairs) + compaction " +
      s"(${parquetFiles(dir)} -> ${parquetFiles(dir2)} files) + salvage " +
      s"sweep == one-shot capped+salvaged verdict over ${want.size} rows " +
      s"(flood of ${floodIds.size} fragmented ${preSalvage}-way under the " +
      "cap alone, single cluster after the sweep)")
  }

  /** Driver gate for the STREAMING persisted-store writer (r12):
    * [[graft.streaming.EventsStream.embedStoreIngest]] run as a REAL
    * multi-micro-batch Structured Streaming query (file source,
    * maxFilesPerTrigger=1, AvailableNow — three files, three ledgered
    * micro-batches), then four claims asserted rather than argued:
    * (1) EXACTLY-ONCE — the last micro-batch is re-applied directly at
    * its recorded batch id, what the engine does after a crash between
    * the two writes and its commit, and neither the store nor the mined
    * pairs may move by one row; (2) MINE PARITY — each ledger
    * partition's pairs equal the batch-cadence twin
    * ([[graft.operators.Dedup.embeddingIncrementalPairs]] +
    * [[graft.operators.Dedup.embeddingIndexRefresh]]) replayed in
    * ledger order over the same recovered batches; (3) GRADUATION — the
    * audit-cadence ledger fold
    * ([[graft.sources.Maintenance.compactPartitionedTo]] with
    * `dropCols`) yields exactly the refresh-path store, in fewer files;
    * (4) SERVING — [[graft.operators.AnnIndex.annTopKWideIndexed]]
    * returns identical top-k from the streaming store (ledger dropped),
    * the graduated store, and the twin. Non-vacuity: every micro-batch
    * provably mines (each plants a 3-copy community), and a
    * null-embedding row rides one batch through the ledger's null
    * partition without pairing or erroring. */
  private def ingestStreamSmoke(spark: SparkSession, sfDir: String): Unit = {
    val base = Files.createTempDirectory("graft_stream_gate").toString
    try ingestStreamSmokeIn(spark, sfDir, base)
    finally deleteTree(spark, base)
  }

  private def ingestStreamSmokeIn(spark: SparkSession, sfDir: String,
                                  base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.{AnnIndex, Dedup}
    import spark.implicits._
    val (dim, planes, thr) = (64, 12, 0.9)
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"))
      .filter(col("id") < 200)
    val anchorIds = Seq(3L, 4L, 5L)
    val anchors = e.filter(col("id").isin(anchorIds: _*)).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).toArray)).toMap
    require(anchors.size == 3 && anchors.values.forall(_ != null),
      "embeddings fixture lost the anchor rows (vec_id 3-5)")
    def copies(anchor: Long, idBase: Long, n: Int): DataFrame =
      (0 until n).map(i => (idBase + i, anchors(anchor).map(_ * (i + 2.0))))
        .toDF("id", "emb")
    // three planned micro-batches: each plants a 3-copy community on a
    // fresh anchor (>= 3 mined pairs however the file source orders
    // them); one batch also carries a null embedding, which must ride
    // the ledger's null-bucket partition without pairing or erroring
    val batches = (1 to 3).map { b =>
      val rows = copies(anchorIds(b - 1), 600000L + b * 1000L, 3)
      if (b == 2)
        rows.unionByName(Seq((700000L, null: Array[Double])).toDF("id", "emb"))
      else rows
    }
    val storeDir = s"$base/store"
    val pairsDir = s"$base/pairs"
    Dedup.seedEmbedIngestStore(e, storeDir, "id", "emb", dim, planes)
    val inDir = s"$base/in"
    batches.foreach(_.coalesce(1).write.mode("append").parquet(inDir))
    val stream = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = graft.streaming.EventsStream.embedStoreIngest(stream,
        storeDir, pairsDir, "id", "emb", dim, planes, thr)
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val store = spark.read.parquet(storeDir)
    val ledger = store.select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    require(ledger == Seq(-1L, 0L, 1L, 2L),
      s"expected 3 ledgered micro-batches after the seed, got $ledger — " +
        "maxFilesPerTrigger stopped splitting the input into micro-batches")
    // recover each micro-batch's rows from its own ledger partition (the
    // file source assigns files to batches by arrival, so the gate never
    // assumes an order)
    def batchRows(b: Long): DataFrame = spark.read.parquet(storeDir)
      .filter(col("ingest_batch") === b).select(col("id"), col("emb"))
    def storeSnap(): Seq[(Long, Long)] = spark.read.parquet(storeDir)
      .select(col("ingest_batch").cast("long"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // a MULTISET per batch (sorted Seq, not Set): the replay assert must
    // see a duplicated pairs row — a Set would collapse byte-identical
    // duplicates and pass an at-least-once regression silently
    def pairSnap(): Map[Long, Seq[(Long, Long)]] = spark.read.parquet(pairsDir)
      .select(col("ingest_batch").cast("long"), col("a_id"), col("b_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted }
    val (s0, p0) = (storeSnap(), pairSnap())
    require(p0.keySet == Set(0L, 1L, 2L) && p0.values.forall(_.size >= 3),
      s"a micro-batch mined ${p0.view.mapValues(_.size).toMap} pairs — " +
        "the planted communities went vacuous")
    require(s0.exists(_._2 == 700000L),
      "the null-embedding row did not land in the store")
    // (1) exactly-once: re-apply the LAST micro-batch at its recorded id
    val replayed = batchRows(2L).localCheckpoint()
    Dedup.embedStoreIngestBatch(spark, storeDir, pairsDir, 2L, replayed,
      "id", "emb", dim, planes, thr)
    require(storeSnap() == s0,
      "replaying the last micro-batch changed the store — the ledger " +
        "overwrite is not idempotent")
    require(pairSnap() == p0,
      "replaying the last micro-batch changed the mined pairs")
    // (2) mine parity vs the batch-cadence twin, in ledger order
    val twinDir = s"$base/twin"
    Dedup.embeddingBucketIndex(e, "id", "emb", dim, planes)
      .write.partitionBy("bucket").parquet(twinDir)
    val twinPairs = (0L to 2L).map { b =>
      val rows = batchRows(b).localCheckpoint()
      val inc = Dedup.embeddingIncrementalPairs(rows,
          spark.read.parquet(twinDir), "id", "emb", dim, planes, thr)
        .localCheckpoint()
      // a sorted Seq like pairSnap's multisets: the mine output is
      // distinct, so set-vs-multiset only differs if the STREAMED side
      // wrote duplicate rows — which must then FAIL this compare
      val got = inc.select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Dedup.embeddingIndexRefresh(spark, twinDir, rows, "id", "emb",
        dim, planes)
      b -> got
    }.toMap
    require(p0 == twinPairs,
      s"streamed mines diverged from the batch cadence: " +
        s"${p0.view.mapValues(_.size).toMap} vs " +
        s"${twinPairs.view.mapValues(_.size).toMap}")
    // (3) graduation: fold the ledger away, get the refresh-path store
    // — only after the ledger audit reads all-ok (the load-bearing
    // pre-graduation contract)
    requireAuditOk(spark, storeDir, "ingest_stream")
    // the pairs sink is the markerless twin layout — audited with
    // expectMarkers = false (gap detection still applies)
    requireAuditOk(spark, pairsDir, "ingest_stream/pairs",
      expectMarkers = false)
    val gradDir = s"$base/store_canonical"
    graft.sources.Maintenance.compactPartitionedTo(spark, storeDir, gradDir,
      Seq("bucket"), dropCols = Seq("ingest_batch"))
    require(parquetFiles(gradDir) < parquetFiles(storeDir),
      s"graduation did not shrink the file count: " +
        s"${parquetFiles(storeDir)} -> ${parquetFiles(gradDir)}")
    def idxRows(df: DataFrame): Seq[(Long, Long, Long)] = df
      .filter(col("bucket").isNotNull)
      .select(col("id"), col("bucket").cast("long"), col("emb_sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    require(idxRows(spark.read.parquet(gradDir)) ==
        idxRows(spark.read.parquet(twinDir)),
      "graduated store diverged from the refresh-path store")
    // (4) serving parity from all three shapes of the same store
    val query = Seq(Tuple1(anchors(3L).map(_ * 1.5))).toDF("qe")
    def topk(storeDf: DataFrame): Seq[(Long, Double)] =
      AnnIndex.annTopKWideIndexed(storeDf, "emb", dim, planes,
          query, "qe", k = 5, tieBreak = Seq("id"), probeBits = 1)
        .select(col("id"), round(col("similarity"), 9).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromStream = topk(spark.read.parquet(storeDir).drop("ingest_batch"))
    val fromGrad = topk(spark.read.parquet(gradDir))
    val fromTwin = topk(spark.read.parquet(twinDir))
    require(fromStream == fromGrad && fromGrad == fromTwin,
      s"serving diverged across store shapes: stream=$fromStream " +
        s"grad=$fromGrad twin=$fromTwin")
    require(fromStream.nonEmpty && fromStream.head._2 > 0.99,
      s"serving missed the planted community: $fromStream")
    println(s"[verify] ingest_stream OK: 3 ledgered micro-batches " +
      s"(${p0.toSeq.sortBy(_._1).map(_._2.size).mkString("/")} pairs), " +
      "replay idempotent, mines == batch cadence, graduation " +
      s"(${parquetFiles(storeDir)} -> ${parquetFiles(gradDir)} files) == " +
      "refresh-path store, serving identical across all three shapes")
  }

  /** [[ingestStreamSmoke]] on the HAMMING face — the second modality
    * through the REAL engine (the embedding gate proves the full
    * four-claim composition; this leaner leg proves the shared ledger
    * body wires a DIFFERENT index geometry — chunk pigeonhole,
    * `chunk_idx` layout — through the same engine path): two ledgered
    * micro-batches of fingerprints, replay of the last batch asserted
    * idempotent on store AND pairs multisets, per-batch mines equal the
    * batch-cadence twin, and the graduated store mines exactly what the
    * refresh-path store mines. */
  private def ingestStreamSmokeHamming(spark: SparkSession,
                                       sfDir: String): Unit = {
    val base = Files.createTempDirectory("graft_stream_gate_ham").toString
    try ingestStreamSmokeHammingIn(spark, sfDir, base)
    finally deleteTree(spark, base)
  }

  private def ingestStreamSmokeHammingIn(spark: SparkSession, sfDir: String,
                                         base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import spark.implicits._
    val (bits, chunks, maxHam) = (64, 4, 3)
    // deterministic synthetic fingerprints off the documents ids (the
    // lifecycle gate's recipe); each batch plants a hamming-1 twin of a
    // corpus row so every micro-batch provably mines
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), xxhash64(col("doc_id")).as("fp"))
      .filter(col("id") < 300)
    val batches = (1 to 2).map { b =>
      corpus.filter(col("id").isin(Seq(10L * b, 10L * b + 1, 10L * b + 2): _*))
        .select((col("id") + 900000L).as("id"),
          col("fp").bitwiseXOR(lit(1L << (b + 7))).as("fp"))
    }
    val storeDir = s"$base/store"
    val pairsDir = s"$base/pairs"
    Dedup.seedHammingIngestStore(corpus, storeDir, "id", "fp", bits, chunks)
    val inDir = s"$base/in"
    batches.foreach(_.coalesce(1).write.mode("append").parquet(inDir))
    val stream = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = graft.streaming.EventsStream.hammingStoreIngest(stream,
        storeDir, pairsDir, "id", "fp", bits, chunks, maxHam)
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ledger = spark.read.parquet(storeDir)
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    require(ledger == Seq(-1L, 0L, 1L),
      s"expected 2 ledgered micro-batches after the seed, got $ledger")
    def batchRows(b: Long): DataFrame = spark.read.parquet(storeDir)
      .filter(col("ingest_batch") === b)
      .select(col("id"), col("fp")).distinct()
    def storeSnap(): Seq[(Long, Long, Long)] = spark.read.parquet(storeDir)
      .select(col("ingest_batch").cast("long"), col("id"),
        col("chunk_idx").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    def pairSnap(): Map[Long, Seq[(Long, Long)]] = spark.read.parquet(pairsDir)
      .select(col("ingest_batch").cast("long"), col("a_id"), col("b_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted }
    val (s0, p0) = (storeSnap(), pairSnap())
    require(p0.keySet == Set(0L, 1L) && p0.values.forall(_.nonEmpty),
      s"a hamming micro-batch mined nothing: " +
        s"${p0.view.mapValues(_.size).toMap}")
    val replayed = batchRows(1L).localCheckpoint()
    Dedup.hammingStoreIngestBatch(spark, storeDir, pairsDir, 1L, replayed,
      "id", "fp", bits, chunks, maxHam)
    require(storeSnap() == s0,
      "replaying the last hamming micro-batch changed the store")
    require(pairSnap() == p0,
      "replaying the last hamming micro-batch changed the mined pairs")
    // batch-cadence twin, in ledger order
    val twinDir = s"$base/twin"
    Dedup.hammingChunkIndex(corpus, "id", "fp", bits, chunks)
      .write.partitionBy("chunk_idx").parquet(twinDir)
    val twinPairs = (0L to 1L).map { b =>
      val rows = batchRows(b).localCheckpoint()
      val inc = Dedup.hammingIncrementalPairs(rows,
          spark.read.parquet(twinDir), "id", "fp", bits, chunks, maxHam)
        .localCheckpoint()
      val got = inc.select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Dedup.hammingIndexRefresh(spark, twinDir, rows, "id", "fp",
        bits, chunks)
      b -> got
    }.toMap
    require(p0 == twinPairs,
      s"streamed hamming mines diverged from the batch cadence: " +
        s"${p0.view.mapValues(_.size).toMap} vs " +
        s"${twinPairs.view.mapValues(_.size).toMap}")
    // graduation == refresh-path store, proven by USE (the chunk store's
    // product is its mined pairs); audit-gated like every graduation
    requireAuditOk(spark, storeDir, "ingest_stream_hamming")
    val gradDir = s"$base/store_canonical"
    graft.sources.Maintenance.compactPartitionedTo(spark, storeDir, gradDir,
      Seq("chunk_idx"), dropCols = Seq("ingest_batch"))
    def minedFrom(dir: String): Set[(Long, Long)] =
      Dedup.hammingPairsFromIndex(spark.read.parquet(dir), maxHamming = maxHam)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromGrad = minedFrom(gradDir)
    require(fromGrad == minedFrom(twinDir) && fromGrad.nonEmpty,
      "graduated hamming store mines differently than the refresh path")
    println(s"[verify] ingest_stream_hamming OK: 2 ledgered micro-batches " +
      s"(${p0.toSeq.sortBy(_._1).map(_._2.size).mkString("/")} pairs), " +
      "replay idempotent, mines == batch cadence, graduated store mines " +
      s"== refresh path (${fromGrad.size} pairs)")
  }

  /** [[ingestStreamSmoke]] on the MINHASH face — the THIRD mining
    * modality through the REAL engine, closing the streaming-writer
    * matrix the way [[ingestLifecycleSmokeMinhash]] closed the batch
    * cadence's: two ledgered micro-batches of documents feeding a
    * [[graft.operators.Dedup.seedMinhashIngestStore]] band store,
    * replay of the last batch asserted idempotent on store AND pairs
    * multisets, per-batch candidate mines equal the batch-cadence twin
    * in ledger order, and `band_idx` graduation proven load-bearing by
    * the lifecycle gate's MINE-PARITY PROBE (the band store carries
    * keys, not payloads, so graduation is proven by USE: a fresh
    * mini-batch mined against the graduated store and against the
    * refresh-path twin must find identical pairs). The engine's
    * file-listing order is not assumed: ledger slices are matched back
    * to their source batches by id set. */
  private def ingestStreamSmokeMinhash(spark: SparkSession,
                                       sfDir: String): Unit = {
    val base = Files.createTempDirectory("graft_stream_gate_mh").toString
    try ingestStreamSmokeMinhashIn(spark, sfDir, base)
    finally deleteTree(spark, base)
  }

  private def ingestStreamSmokeMinhashIn(spark: SparkSession, sfDir: String,
                                         base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Dedup
    import spark.implicits._
    val (k, bands, shingleN) = (16, 4, 3)
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("id"), col("text"))
    // each batch plants 3 EXACT copies of a fresh corpus anchor's text:
    // identical signature -> shares every band with the anchor -> every
    // micro-batch provably mines candidates (new x corpus AND new x new)
    val anchorTexts = corpus.filter(col("id").isin(3L, 4L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    require(anchorTexts.size == 2 &&
        anchorTexts.values.forall(t => t != null && t.length > 20),
      "documents fixture lost the anchor texts (doc_id 3-4)")
    val batchDefs = (1 to 2).map { b =>
      (0 until 3).map(i => (900000L + b * 1000L + i,
        anchorTexts(Seq(3L, 4L)(b - 1)))).toDF("id", "text")
    }
    val storeDir = s"$base/store"
    val pairsDir = s"$base/pairs"
    Dedup.seedMinhashIngestStore(corpus, storeDir, "id", "text",
      k, bands, shingleN)
    val inDir = s"$base/in"
    batchDefs.foreach(_.coalesce(1).write.mode("append").parquet(inDir))
    val stream = spark.readStream.schema(batchDefs.head.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = graft.streaming.EventsStream.minhashStoreIngest(stream,
        storeDir, pairsDir, "id", "text", k, bands, shingleN)
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ledger = spark.read.parquet(storeDir)
      .select(col("ingest_batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    require(ledger == Seq(-1L, 0L, 1L),
      s"expected 2 ledgered micro-batches after the seed, got $ledger")
    // match each ledger slice back to its source batch by id set — the
    // band store carries ids, not texts, and the engine's file-listing
    // order is an implementation detail this gate must not encode
    def sliceIds(b: Long): Set[Long] = spark.read.parquet(storeDir)
      .filter(col("ingest_batch") === b)
      .select(col("id")).distinct().collect().map(_.getLong(0)).toSet
    def batchFor(b: Long): DataFrame = {
      val ids = sliceIds(b)
      val hits = batchDefs.filter(d =>
        d.select(col("id")).collect().map(_.getLong(0)).toSet == ids)
      require(hits.size == 1,
        s"ledger slice $b matches ${hits.size} source batches (ids $ids)")
      hits.head
    }
    def storeSnap(): Seq[(Long, Long, Long, String)] =
      spark.read.parquet(storeDir)
        .select(col("ingest_batch").cast("long"), col("id"),
          col("band_idx").cast("long"), col("band_key"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sorted
    def pairSnap(): Map[Long, Seq[(Long, Long)]] = spark.read.parquet(pairsDir)
      .select(col("ingest_batch").cast("long"), col("a_id"), col("b_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (kk, rs) =>
        kk -> rs.map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted }
    val (s0, p0) = (storeSnap(), pairSnap())
    require(p0.keySet == Set(0L, 1L) && p0.values.forall(_.nonEmpty),
      s"a minhash micro-batch mined nothing: " +
        s"${p0.view.mapValues(_.size).toMap}")
    // exactly-once, asserted: re-applying the LAST micro-batch at its
    // recorded id (the engine's crash-replay case) must not move the
    // store or the mined pairs
    Dedup.minhashStoreIngestBatch(spark, storeDir, pairsDir, 1L,
      batchFor(1L), "id", "text", k, bands, shingleN)
    require(storeSnap() == s0,
      "replaying the last minhash micro-batch changed the store")
    require(pairSnap() == p0,
      "replaying the last minhash micro-batch changed the mined pairs")
    // batch-cadence twin, in ledger order
    val twinDir = s"$base/twin"
    Dedup.minhashBandIndex(corpus, "id", "text", k, bands, shingleN)
      .write.partitionBy("band_idx").parquet(twinDir)
    val twinPairs = (0L to 1L).map { b =>
      val rows = batchFor(b)
      val inc = Dedup.minhashIncrementalPairs(rows,
          spark.read.parquet(twinDir), "id", "text", k, bands, shingleN)
        .localCheckpoint()
      val got = inc.select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      Dedup.minhashIndexRefresh(spark, twinDir, rows, "id", "text",
        k, bands, shingleN)
      b -> got
    }.toMap
    require(p0 == twinPairs,
      s"streamed minhash mines diverged from the batch cadence: " +
        s"${p0.view.mapValues(_.size).toMap} vs " +
        s"${twinPairs.view.mapValues(_.size).toMap}")
    // graduation == refresh-path store, proven by USE (the lifecycle
    // gate's mine-parity probe: identical candidates from a fresh
    // mini-batch, so band keys, the band_sig token, and the layout all
    // survived the ledger-dropping rewrite); audit-gated like every
    // graduation
    requireAuditOk(spark, storeDir, "ingest_stream_minhash")
    val gradDir = s"$base/store_canonical"
    graft.sources.Maintenance.compactPartitionedTo(spark, storeDir, gradDir,
      Seq("band_idx"), dropCols = Seq("ingest_batch"))
    val probe = Seq((950000L, anchorTexts(3L)), (950001L, anchorTexts(3L)))
      .toDF("id", "text")
    def mineProbe(dir: String): Set[(Long, Long, Long)] =
      Dedup.minhashIncrementalPairs(probe, spark.read.parquet(dir),
          "id", "text", k, bands, shingleN)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromGrad = mineProbe(gradDir)
    require(fromGrad.nonEmpty,
      "minhash graduation parity probe mined nothing — the probe fixture " +
        "went vacuous")
    require(fromGrad == mineProbe(twinDir),
      "graduated minhash store mines differently than the refresh path")
    println(s"[verify] ingest_stream_minhash OK: 2 ledgered micro-batches " +
      s"(${p0.toSeq.sortBy(_._1).map(_._2.size).mkString("/")} candidate " +
      "pairs), replay idempotent, mines == batch cadence, graduated " +
      s"store probe parity == refresh path (${fromGrad.size} pairs)")
  }

  /** The APPEND-ONLY serving stores (IVF lists, PQ code table) through
    * the REAL engine — the last two streaming-writer faces
    * ([[graft.streaming.EventsStream.ivfStoreIngest]] /
    * [[graft.streaming.EventsStream.pqStoreIngest]]), whose ledger
    * bodies are spec-pinned at the batch level (ModulesSpec) but, before
    * this gate, never ran under a Structured Streaming checkpoint. No
    * mine — the store IS the product — so the claims are: ledger
    * complete, replay idempotent on store contents, graduated store
    * contents EQUAL the batch-cadence refresh path's, and the point
    * faces ([[graft.operators.AnnIndex.ivfTopKAssigned]] /
    * [[graft.operators.Quantize.pqTopK]]) serve identical top-k from the
    * streamed, graduated, and refresh-path stores. Vectors are
    * deterministic synthetics (the ModulesSpec recipe) — the gate pins
    * the ledger composition, not embedding quality — so unlike the
    * sibling smokes this one takes no sfDir. */
  private def ingestStreamSmokeServing(spark: SparkSession): Unit = {
    val base = Files.createTempDirectory("graft_stream_gate_srv").toString
    try ingestStreamSmokeServingIn(spark, base)
    finally deleteTree(spark, base)
  }

  private def ingestStreamSmokeServingIn(spark: SparkSession,
                                         base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.{AnnIndex, Quantize}
    import spark.implicits._
    val mk = (id: Long, seed: Long) =>
      (id, Array.tabulate(4)(j => (((seed >> (j * 5)) & 63) - 31.0)))
    val corpus = (1L to 40L).map(i => mk(i, i * 2654435761L)).toDF("id", "emb")
      .localCheckpoint() // one deterministic materialization for fits + seeds
    val batchDefs = (1 to 2).map { b =>
      (100L * b to 100L * b + 5L).map(i => mk(i, i * 40503L)).toDF("id", "emb")
    }
    val model = AnnIndex.ivfFit(corpus, "emb", nLists = 4)
    val cb = Quantize.pqFit(corpus, "emb", dim = 4, m = 2,
      nCentroids = 4, maxIter = 2)
    val inDir = s"$base/in"
    batchDefs.foreach(_.coalesce(1).write.mode("append").parquet(inDir))
    def runStream(mkWriter: DataFrame =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row], ck: String): Unit = {
      val stream = spark.readStream.schema(batchDefs.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = mkWriter(stream)
        .option("checkpointLocation", s"$base/$ck")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def requireLedger(dir: String, what: String): Unit = {
      val ledger = spark.read.parquet(dir)
        .select(col("ingest_batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(ledger == Seq(-1L, 0L, 1L),
        s"$what: expected 2 ledgered micro-batches after the seed, " +
          s"got $ledger")
    }
    // slice -> source batch by id set (file-listing order not assumed)
    def batchFor(dir: String, b: Long): DataFrame = {
      val ids = spark.read.parquet(dir)
        .filter(col("ingest_batch") === b)
        .select(col("id")).distinct().collect().map(_.getLong(0)).toSet
      val hits = batchDefs.filter(d =>
        d.select(col("id")).collect().map(_.getLong(0)).toSet == ids)
      require(hits.size == 1,
        s"ledger slice $b matches ${hits.size} source batches (ids $ids)")
      hits.head
    }
    def contentsEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
      // multiset equality over the full row (all data columns)
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$what store contents diverged from the refresh path")
    }
    val query = Seq(Tuple1(mk(0L, 7L * 2654435761L)._2.toSeq)).toDF("qe")
    // ---- IVF: list-partitioned serving store ----
    val ivfDir = s"$base/ivf"
    AnnIndex.seedIvfIngestStore(model, corpus, "emb", ivfDir)
    runStream(s => graft.streaming.EventsStream.ivfStoreIngest(
      s, model, ivfDir, "emb"), "ck_ivf")
    requireLedger(ivfDir, "ivfStoreIngest")
    val ivfSnap = spark.read.parquet(ivfDir)
      .select(col("ingest_batch").cast("long"), col("id"),
        col("list_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    AnnIndex.ivfStoreIngestBatch(spark, model, ivfDir, 1L,
      batchFor(ivfDir, 1L), "emb")
    require(spark.read.parquet(ivfDir)
        .select(col("ingest_batch").cast("long"), col("id"),
          col("list_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted == ivfSnap,
      "replaying the last IVF micro-batch changed the store")
    val ivfTwin = s"$base/ivf_twin"
    AnnIndex.ivfStore(model, corpus, "emb")
      .write.partitionBy("list_id").parquet(ivfTwin)
    (0L to 1L).foreach(b => AnnIndex.ivfRefresh(spark, model, ivfTwin,
      batchFor(ivfDir, b), "emb"))
    requireAuditOk(spark, ivfDir, "ingest_stream_serving/ivf")
    val ivfGrad = s"$base/ivf_canonical"
    graft.sources.Maintenance.compactPartitionedTo(spark, ivfDir, ivfGrad,
      Seq("list_id"), dropCols = Seq("ingest_batch"))
    contentsEqual(spark.read.parquet(ivfGrad), spark.read.parquet(ivfTwin),
      "IVF")
    def ivfServe(dir: String, drop: Boolean): Seq[Long] =
      AnnIndex.ivfTopKAssigned(model,
          (if (drop) spark.read.parquet(dir).drop("ingest_batch")
           else spark.read.parquet(dir)), "emb", query, "qe",
          k = 5, nProbe = 2, tieBreak = Seq("id"))
        .select(col("id")).collect().map(_.getLong(0)).toSeq
    val servedIvf = ivfServe(ivfDir, drop = true)
    require(servedIvf.nonEmpty, "IVF streamed-store serve went vacuous")
    require(servedIvf == ivfServe(ivfGrad, drop = false) &&
        servedIvf == ivfServe(ivfTwin, drop = false),
      "IVF top-k diverged across the streamed / graduated / refresh stores")
    // ---- PQ: flat code table (ledger is the only partition level) ----
    val pqDir = s"$base/pq"
    Quantize.seedPqIngestStore(corpus, "emb", cb, pqDir)
    runStream(s => graft.streaming.EventsStream.pqStoreIngest(
      s, cb, pqDir, "emb"), "ck_pq")
    requireLedger(pqDir, "pqStoreIngest")
    // content-deep replay snapshot, like the IVF arm (a count-only check
    // would pass a regression that rewrote the slice with
    // same-cardinality foreign rows); xxhash64 folds the code column so
    // the tuple stays collectable regardless of its physical type
    def pqSnap(): Seq[(Long, Long, Long)] = spark.read.parquet(pqDir)
      .select(col("ingest_batch").cast("long"), col("id"),
        xxhash64(col("pq_codes")).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val pqBefore = pqSnap()
    Quantize.pqStoreIngestBatch(spark, cb, pqDir, 1L,
      batchFor(pqDir, 1L), "emb")
    require(pqSnap() == pqBefore,
      "replaying the last PQ micro-batch changed the store")
    val pqTwin = s"$base/pq_twin"
    Quantize.pqEncode(corpus, "emb", cb).write.parquet(pqTwin)
    (0L to 1L).foreach(b => Quantize.pqRefresh(spark, cb, pqTwin,
      batchFor(pqDir, b), "emb"))
    // a FLAT store graduates by a plain ledger-dropping rewrite (the
    // pqStoreIngestBatch docstring's contract — compactPartitionedTo
    // needs partition columns)
    requireAuditOk(spark, pqDir, "ingest_stream_serving/pq")
    val pqGrad = s"$base/pq_canonical"
    spark.read.parquet(pqDir).drop("ingest_batch")
      .write.parquet(pqGrad)
    contentsEqual(spark.read.parquet(pqGrad), spark.read.parquet(pqTwin),
      "PQ")
    def pqServe(dir: String, drop: Boolean): Seq[Long] = {
      val store = if (drop) spark.read.parquet(dir).drop("ingest_batch")
                  else spark.read.parquet(dir)
      // pqTopK re-encodes a RAW corpus; the persisted store is already
      // coded, so serve from the decoded columns it retains (id + emb)
      Quantize.pqTopK(store.select(col("id"), col("emb")), "emb", cb,
          query, k = 5, tieBreak = Seq("id"))
        .select(col("id")).collect().map(_.getLong(0)).toSeq
    }
    val servedPq = pqServe(pqDir, drop = true)
    require(servedPq.nonEmpty, "PQ streamed-store serve went vacuous")
    require(servedPq == pqServe(pqGrad, drop = false) &&
        servedPq == pqServe(pqTwin, drop = false),
      "PQ top-k diverged across the streamed / graduated / refresh stores")
    println(s"[verify] ingest_stream_serving OK: IVF + PQ streamed " +
      s"exactly-once (ledgers complete, replays idempotent), graduated " +
      s"contents == refresh path, top-k parity across streamed/" +
      s"graduated/refresh (IVF ${servedIvf.size}, PQ ${servedPq.size} hits)")
  }

  /** The streaming SERVE faces
    * ([[graft.streaming.EventsStream.annServeStream]] /
    * [[graft.streaming.EventsStream.ivfServeStream]]) under the REAL
    * engine — before this gate they were the only streaming faces proven
    * by spec alone (every near-dup face and store writer already runs
    * under a Structured Streaming checkpoint in a sibling smoke). A
    * micro-batched query stream is answered from PERSISTED serving
    * stores (wide sign-LSH buckets, IVF lists) through the exactly-once
    * result ledger ([[graft.streaming.EventsStream.serveSinkBatch]]);
    * the claims: result ledger COMPLETE (slices 0..n, all marked —
    * [[requireAuditOk]] with the serve sink's no-seed layout), replay
    * IDEMPOTENT on slice contents (re-applying the last micro-batch's
    * body moves nothing), and every slice EQUALS the batch face's
    * answer ([[graft.operators.AnnIndex.annJoinIndexed]] /
    * [[graft.operators.AnnIndex.ivfJoinIndexed]]) for its source batch
    * over the same store — the stream/batch parity every other
    * streaming face's gate asserts. Deterministic synthetic vectors
    * (the [[ingestStreamSmokeServing]] recipe), so no sfDir. */
  private def ingestStreamSmokeServeFaces(spark: SparkSession): Unit = {
    val base = Files.createTempDirectory("graft_stream_gate_faces").toString
    try ingestStreamSmokeServeFacesIn(spark, base)
    finally deleteTree(spark, base)
  }

  private def ingestStreamSmokeServeFacesIn(spark: SparkSession,
                                            base: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.{AnnIndex, Dedup}
    import spark.implicits._
    val dim = 4; val planes = 3; val k = 3
    val mk = (id: Long, seed: Long) =>
      (id, Array.tabulate(dim)(j => (((seed >> (j * 5)) & 63) - 31.0)))
    val corpus = (1L to 40L).map(i => mk(i, i * 2654435761L)).toDF("id", "emb")
      .localCheckpoint() // one deterministic materialization for both stores
    // persisted serving stores in the GRADUATED (ledger-free) shape both
    // batch faces document: wide buckets partitioned by bucket, IVF lists
    // partitioned by list_id
    val annStoreDir = s"$base/ann_store"
    Dedup.embeddingBucketIndex(corpus, "id", "emb", dim, planes)
      .write.partitionBy("bucket").parquet(annStoreDir)
    val annStore = spark.read.parquet(annStoreDir)
    val model = AnnIndex.ivfFit(corpus, "emb", nLists = 4)
    val ivfStoreDir = s"$base/ivf_store"
    AnnIndex.ivfStore(model, corpus, "emb")
      .write.partitionBy("list_id").parquet(ivfStoreDir)
    val ivfStore = spark.read.parquet(ivfStoreDir)
    // two query micro-batches, ids unique WITHIN each batch (the faces'
    // requireUniqueQueryIds contract is per serve call, and ACROSS
    // batches reuse is legal — each slice is its own answer set)
    val batchDefs = (1 to 2).map { b =>
      (100L * b to 100L * b + 3L).map(i => mk(i, i * 40503L))
        .toDF("qid", "qe")
    }
    val inDir = s"$base/in"
    batchDefs.foreach(_.coalesce(1).write.mode("append").parquet(inDir))
    def runStream(mkWriter: DataFrame =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row], ck: String): Unit = {
      val stream = spark.readStream.schema(batchDefs.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = mkWriter(stream)
        .option("checkpointLocation", s"$base/$ck")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // slice -> source batch by served query-id set (file-listing order
    // not assumed), the serving gate's batchFor discipline
    def batchFor(outDir: String, b: Long): DataFrame = {
      val ids = spark.read.parquet(outDir)
        .filter(col("ingest_batch") === b)
        .select(col("query_id")).distinct().collect()
        .map(_.getLong(0)).toSet
      val hits = batchDefs.filter(d =>
        d.select(col("qid")).collect().map(_.getLong(0)).toSet == ids)
      require(hits.size == 1,
        s"result slice $b matches ${hits.size} source batches (ids $ids)")
      hits.head
    }
    // full-row snapshot of a result dir — similarity folded through its
    // exact double bits (same kernel, same store, same query: bitwise
    // deterministic; a lossy round could mask a real divergence)
    def snap(outDir: String): Seq[(Long, Long, Long, Double, Long)] =
      spark.read.parquet(outDir)
        .select(col("ingest_batch").cast("long"), col("query_id"),
          col("neighbor_id"), col("similarity"), col("rank").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSeq.sorted
    def sliceRows(outDir: String, b: Long): Seq[(Long, Long, Double, Long)] =
      snap(outDir).filter(_._1 == b).map(t => (t._2, t._3, t._4, t._5))
    def faceRows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
      df.select(col("query_id"), col("neighbor_id"), col("similarity"),
          col("rank").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSeq.sorted
    def gateFace(what: String, outDir: String,
                 batchBody: (DataFrame, Long) => Unit,
                 face: DataFrame => DataFrame): Int = {
      // ledger complete and fully marked (no seed slice on a serve sink)
      requireAuditOk(spark, outDir, s"ingest_stream_serve_faces/$what")
      val slices = spark.read.parquet(outDir)
        .select(col("ingest_batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      require(slices == Seq(0L, 1L),
        s"$what: expected 2 ledgered result slices, got $slices")
      // every slice == the batch face's answer for its source batch
      var served = 0
      (0L to 1L).foreach { b =>
        val got = sliceRows(outDir, b)
        require(got.nonEmpty, s"$what: result slice $b is empty — the " +
          "serve went vacuous")
        val want = faceRows(face(batchFor(outDir, b)))
        require(got == want,
          s"$what: slice $b diverged from the batch face " +
            s"(${got.size} vs ${want.size} rows)")
        served += got.size
      }
      // replay idempotence: re-applying the LAST micro-batch's body
      // (what the engine does after a crash before checkpoint commit)
      // must move nothing — the fingerprint check passes and the
      // whole-slice overwrite rewrites byte-identical rows
      val before = snap(outDir)
      batchBody(batchFor(outDir, 1L), 1L)
      require(snap(outDir) == before,
        s"$what: replaying the last micro-batch changed the result store")
      served
    }
    // ---- wide sign-LSH face ----
    val annOut = s"$base/ann_results"
    // probeBits=1: at 8 buckets over 40 vectors a lone-bucket query could
    // serve zero rows; the one-flip probe set keeps every slice non-vacuous
    runStream(s => graft.streaming.EventsStream.annServeStream(
      s, "qid", "qe", annStore, dim, planes, k, annOut, probeBits = 1),
      "ck_ann")
    val annServed = gateFace("ann", annOut,
      (b, id) => graft.streaming.EventsStream.serveSinkBatch(spark, annOut,
        id, AnnIndex.annJoinIndexed(b, "qid", "qe", annStore, dim, planes, k,
          probeBits = 1), "annServeStream"),
      b => AnnIndex.annJoinIndexed(b, "qid", "qe", annStore, dim, planes, k,
        probeBits = 1))
    // ---- IVF face ----
    val ivfOut = s"$base/ivf_results"
    runStream(s => graft.streaming.EventsStream.ivfServeStream(
      s, "qid", "qe", model, ivfStore, "id", "emb", k, 2, ivfOut), "ck_ivf")
    val ivfServed = gateFace("ivf", ivfOut,
      (b, id) => graft.streaming.EventsStream.serveSinkBatch(spark, ivfOut,
        id, AnnIndex.ivfJoinIndexed(b, "qid", "qe", model, ivfStore,
          "id", "emb", k, 2), "ivfServeStream"),
      b => AnnIndex.ivfJoinIndexed(b, "qid", "qe", model, ivfStore,
        "id", "emb", k, 2))
    println(s"[verify] ingest_stream_serve_faces OK: ann + ivf served " +
      s"2 micro-batches each through the result ledger ($annServed/" +
      s"$ivfServed rows), slices == batch faces, replays idempotent")
  }

  /** The pre-graduation audit contract
    * ([[graft.sources.Maintenance.ledgerAudit]]'s docstring: graduation
    * should only consume a store whose audit is all-ok) — enforced in
    * every streaming gate right before its `compactPartitionedTo` /
    * ledger-dropping rewrite, so the contract is load-bearing rather
    * than advisory: a gap or unmarked slice in the gate's own store
    * fails the driver loudly instead of graduating silent loss. */
  private def requireAuditOk(spark: SparkSession, dir: String,
                             what: String,
                             expectMarkers: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val bad = graft.sources.Maintenance.ledgerAudit(spark, dir, expectMarkers)
      .filter(col("status") =!= "ok")
      .select(col("ingest_batch"), col("status"))
      .collect().map(r => s"${r.getLong(0)}=${r.getString(1)}")
    require(bad.isEmpty,
      s"$what: ledger audit refuses graduation: ${bad.mkString(", ")}")
  }

  /** Recursive delete of a gate's temp workspace — the Stress
    * ann_serve discipline applied to the Verify smokes: each run writes
    * a full index store (plus its compacted copy), and a long-lived
    * container running the gate recipe repeatedly would otherwise
    * accumulate one duplicated tree per run in /tmp. Runs in a finally,
    * so a failed gate cleans up too. */
  private def deleteTree(spark: SparkSession, dir: String): Unit =
    graft.sources.Maintenance.deleteLocalTree(spark, dir)

  private def parquetFiles(d: String): Long =
    graft.sources.Maintenance.parquetFileCount(d)

  /** [[ingestLifecycleSmoke]] on the HAMMING face: persisted
    * [[graft.operators.Dedup.hammingChunkIndex]] store → 3 capped
    * [[graft.operators.Dedup.hammingIncrementalPairs]] batches appended
    * through the token-gated [[graft.operators.Dedup.hammingIndexRefresh]]
    * → chunk-layout compaction → audit-cadence
    * [[graft.operators.Dedup.hammingSalvageEdges]] sweep →
    * [[graft.operators.Dedup.clustersIncremental]], asserted EQUAL to the
    * one-shot [[graft.operators.Dedup.hammingPairsSalvaged]] verdict.
    * Fingerprints are fully synthetic and deterministic: the base corpus
    * derives per-id distinct fingerprints from the documents table's
    * ids, the planted flood is one IDENTICAL fingerprint on 40 rows
    * (every chunk bucket it occupies is over the cap from day one), and
    * each batch plants a 3-copy hamming-1 community around a fresh base
    * row (mined fully: the twins share 3 of 4 chunks). Same equality
    * precondition, self-checked over the store's own chunk-bucket
    * censuses. */
  private def ingestLifecycleSmokeHamming(spark: SparkSession,
                                          sfDir: String): Unit = {
    val baseDir = Files.createTempDirectory("graft_ingest_ham").toString
    try ingestLifecycleSmokeHammingIn(spark, sfDir, baseDir)
    finally deleteTree(spark, baseDir)
  }

  private def ingestLifecycleSmokeHammingIn(spark: SparkSession,
                                            sfDir: String,
                                            baseDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import graft.operators.Dedup
    import spark.implicits._
    val (bits, chunks, maxHamming, cap, maxReps) = (64, 4, 3, 32, 16)
    val base = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("id"), xxhash64(col("doc_id")).as("fp"))
    val floodFp = 0x0123456789abcdefL
    def floodRows(idBase: Long, n: Int): DataFrame =
      (0 until n).map(i => (idBase + i, floodFp)).toDF("id", "fp")
    // anchors for the per-batch communities: real corpus rows' EXACT
    // fingerprints, collected once (tiny)
    val anchorFps = base.filter(col("id").isin(3L, 4L, 5L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(anchorFps.size == 3, "documents fixture lost the anchor ids")
    val initial = base.unionByName(floodRows(500000L, 40))
    val batches = (1 to 3).map { b =>
      val a = anchorFps(Seq(3L, 4L, 5L)(b - 1))
      // 3 hamming-1 twins of the anchor (flip one bit in chunk 0 at a
      // per-copy position, so the twins also sit within hamming 2 of
      // each other and all pairs verify <= maxHamming)
      val comm = (0 until 3).map(i =>
        (600000L + b * 1000L + i, a ^ (1L << i))).toDF("id", "fp")
      val rows = comm.unionByName(floodRows(510000L + b * 1000L, 3))
      if (b == 2)
        rows.unionByName(Seq((700000L, null.asInstanceOf[java.lang.Long]))
          .toDF("id", "fp"))
      else rows
    }
    val dir = s"$baseDir/store"
    Dedup.hammingChunkIndex(initial, "id", "fp", bits, chunks)
      .write.partitionBy("chunk_idx").parquet(dir)
    def overCapSet(store: DataFrame): Set[String] = store
      .groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .collect()
      .map(r => s"${String.valueOf(r.get(0))}:${String.valueOf(r.get(1))}")
      .toSet
    val overInitial = overCapSet(spark.read.parquet(dir))
    require(overInitial.size >= chunks,
      s"planted flood buckets not over the cap: $overInitial")
    var labels = Dedup.clusters(initial.select(col("id")), "id",
      Dedup.hammingPairs(initial, "id", "fp", bits, chunks, maxHamming,
        maxBucket = cap)).localCheckpoint()
    var ids = initial.select(col("id"))
    val mined = scala.collection.mutable.ListBuffer.empty[Long]
    for (batch <- batches) {
      val inc = Dedup.hammingIncrementalPairs(batch,
        spark.read.parquet(dir), "id", "fp", bits, chunks, maxHamming,
        maxBucket = cap).localCheckpoint()
      mined += inc.count()
      Dedup.hammingIndexRefresh(spark, dir, batch, "id", "fp", bits, chunks)
      ids = ids.unionByName(batch.select(col("id")))
      labels = Dedup.clustersIncremental(ids, "id", labels, inc)
        .localCheckpoint()
    }
    require(mined.forall(_ >= 3L),
      s"a hamming ingest batch mined ${mined.mkString(",")} pairs — the " +
        "planted community went vacuous")
    val floodIds = ((0 until 40).map(500000L + _) ++
      (1 to 3).flatMap(b => (0 until 3).map(510000L + b * 1000L + _))).toSet
    val preSalvage = labels.filter(col("id").isin(floodIds.toSeq: _*))
      .select(col("cluster")).distinct().count()
    require(preSalvage > 1,
      "hamming flood already connected before salvage — the cap stopped " +
        "engaging")
    val dir2 = s"$baseDir/store_compacted"
    graft.sources.Maintenance.compactPartitionedTo(spark, dir, dir2,
      Seq("chunk_idx"))
    require(parquetFiles(dir2) < parquetFiles(dir),
      s"chunk compaction did not shrink the file count: " +
        s"${parquetFiles(dir)} -> ${parquetFiles(dir2)}")
    val full = spark.read.parquet(dir2)
    val overFinal = overCapSet(full)
    require(overInitial == overFinal,
      s"a chunk bucket crossed the cap mid-run ($overInitial vs " +
        s"$overFinal) — the equality precondition broke; re-pin the fixture")
    val salvage = Dedup.hammingSalvageEdges(full, maxHamming, cap, maxReps)
    val got = Dedup.clustersIncremental(ids, "id", labels, salvage)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = batches.foldLeft(initial)(_ unionByName _)
    val want = Dedup.clusters(all.select(col("id")), "id",
        Dedup.hammingPairsSalvaged(all, "id", "fp", bits, chunks,
          maxHamming, maxBucket = cap, maxReps = maxReps))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(got == want,
      s"hamming ingest lifecycle diverged from the one-shot run: " +
        s"${got.size} vs ${want.size} rows; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    val floodRowsGot = got.filter(t => floodIds(t._1))
    require(floodRowsGot.size == floodIds.size &&
        floodRowsGot.map(_._2).size == 1,
      "hamming salvage did not reconnect the cap-dropped flood")
    require(got.exists(t => t._1 == 700000L && t._3 == 1L),
      "null-fingerprint row did not survive as a singleton")
    println(s"[verify] ingest_lifecycle_hamming OK: ${batches.size} capped " +
      s"increments (${mined.mkString("/")} pairs) + compaction " +
      s"(${parquetFiles(dir)} -> ${parquetFiles(dir2)} files) + salvage " +
      s"sweep == one-shot capped+salvaged verdict over ${want.size} rows " +
      s"(flood of ${floodIds.size} fragmented ${preSalvage}-way under the " +
      "cap alone, single cluster after the sweep)")
  }

  /** [[ingestLifecycleSmoke]] on the MINHASH face — the third and last
    * index modality through the two-cadence composition: persisted
    * [[graft.operators.Dedup.minhashBandIndex]] store → 3 capped
    * [[graft.operators.Dedup.minhashIncrementalPairs]] batches appended
    * through the token-gated
    * [[graft.operators.Dedup.minhashIndexRefresh]] → `band_idx`-layout
    * compaction (never exercised over this layout before r12) →
    * audit-cadence [[graft.operators.Dedup.minhashSalvageVerifiedPairs]]
    * sweep → [[graft.operators.Dedup.clustersIncremental]], asserted
    * EQUAL to the one-shot verdict. Two face-specific differences from
    * the embedding/hamming gates, both semantic, not accidental:
    *
    *  - the tiers compose at the CANDIDATE level: the incremental mine
    *    emits unverified band candidates (its contract — verification is
    *    the caller's threshold), so the one-shot comparator is capped
    *    [[graft.operators.Dedup.minhashLshPairs]] candidates ∪ the
    *    verified salvage tier, the same union the fold consumes. The
    *    salvage input (the full corpus's signature table) is shared by
    *    both sides — the equality content is the candidate fold theorem;
    *  - the band store carries keys, not payloads, so salvage cannot
    *    read it — instead compaction is made load-bearing by a PARITY
    *    PROBE: a fresh mini-batch mined against the original store and
    *    against the compacted store must yield identical pairs (this is
    *    what drives [[graft.sources.Maintenance.compactPartitionedTo]]
    *    over a `band_idx` layout end-to-end, token and band keys
    *    surviving the rewrite).
    *
    * Fixture: real document texts; the planted flood is 40 rows of one
    * IDENTICAL synthetic text (all `bands` of its band buckets over the
    * cap from day one), each batch plants 3 EXACT copies of a fresh real
    * anchor's text (identical signature → shares every band with the
    * anchor → provably mines ≥ 3 candidates), and batch 2 carries a
    * null-text row that must ride through as a singleton (null shingles
    * never band). Same equality precondition, self-checked over the
    * store's own (band_idx, band_key) censuses. */
  private def ingestLifecycleSmokeMinhash(spark: SparkSession,
                                          sfDir: String): Unit = {
    val baseDir = Files.createTempDirectory("graft_ingest_mh").toString
    try ingestLifecycleSmokeMinhashIn(spark, sfDir, baseDir)
    finally deleteTree(spark, baseDir)
  }

  private def ingestLifecycleSmokeMinhashIn(spark: SparkSession,
                                            sfDir: String,
                                            baseDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import graft.operators.Dedup
    import spark.implicits._
    val (k, bands, shingleN, thr, cap, maxReps) = (16, 4, 3, 0.8, 32, 16)
    val base = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id").as("id"), col("text"))
    val floodText = "graft minhash lifecycle flood sentinel: the same " +
      "viral boilerplate paragraph re-posted verbatim thousands of times " +
      "is exactly the mega-bucket mass the cap exists to bound"
    def floodRows(idBase: Long, n: Int): DataFrame =
      (0 until n).map(i => (idBase + i, floodText)).toDF("id", "text")
    val anchorTexts = base.filter(col("id").isin(3L, 4L, 5L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    require(anchorTexts.size == 3 &&
        anchorTexts.values.forall(t => t != null && t.length > 20),
      "documents fixture lost the anchor texts (doc_id 3-5)")
    val initial = base.unionByName(floodRows(500000L, 40))
    val batches = (1 to 3).map { b =>
      val comm = (0 until 3).map(i =>
        (600000L + b * 1000L + i, anchorTexts(Seq(3L, 4L, 5L)(b - 1))))
        .toDF("id", "text")
      val rows = comm.unionByName(floodRows(510000L + b * 1000L, 3))
      if (b == 2)
        rows.unionByName(Seq((700000L, null.asInstanceOf[String]))
          .toDF("id", "text"))
      else rows
    }
    val dir = s"$baseDir/store"
    Dedup.minhashBandIndex(initial, "id", "text", k, bands, shingleN)
      .write.partitionBy("band_idx").parquet(dir)
    def overCapSet(store: DataFrame): Set[String] = store
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .collect()
      .map(r => s"${String.valueOf(r.get(0))}:${String.valueOf(r.get(1))}")
      .toSet
    val overInitial = overCapSet(spark.read.parquet(dir))
    require(overInitial.size >= bands,
      s"planted flood band buckets not over the cap: $overInitial")
    var labels = Dedup.clusters(initial.select(col("id")), "id",
      Dedup.minhashLshPairs(initial, "id", "text", k, bands, shingleN,
        maxBucket = cap)).localCheckpoint()
    var ids = initial.select(col("id"))
    val mined = scala.collection.mutable.ListBuffer.empty[Long]
    for (batch <- batches) {
      // materialize the increment BEFORE the append: the mine is lazy,
      // and re-evaluating it against the already-appended store would
      // silently mine the batch against itself
      val inc = Dedup.minhashIncrementalPairs(batch,
        spark.read.parquet(dir), "id", "text", k, bands, shingleN,
        maxBucket = cap).localCheckpoint()
      mined += inc.count()
      Dedup.minhashIndexRefresh(spark, dir, batch, "id", "text",
        k, bands, shingleN)
      ids = ids.unionByName(batch.select(col("id")))
      labels = Dedup.clustersIncremental(ids, "id", labels, inc)
        .localCheckpoint()
    }
    require(mined.forall(_ >= 3L),
      s"a minhash ingest batch mined ${mined.mkString(",")} candidate " +
        "pairs — the planted community went vacuous")
    val floodIds = ((0 until 40).map(500000L + _) ++
      (1 to 3).flatMap(b => (0 until 3).map(510000L + b * 1000L + _))).toSet
    val preSalvage = labels.filter(col("id").isin(floodIds.toSeq: _*))
      .select(col("cluster")).distinct().count()
    require(preSalvage > 1,
      "minhash flood already connected before salvage — the cap stopped " +
        "engaging")
    val dir2 = s"$baseDir/store_compacted"
    graft.sources.Maintenance.compactPartitionedTo(spark, dir, dir2,
      Seq("band_idx"))
    require(parquetFiles(dir2) < parquetFiles(dir),
      s"band compaction did not shrink the file count: " +
        s"${parquetFiles(dir)} -> ${parquetFiles(dir2)}")
    val full = spark.read.parquet(dir2)
    val overFinal = overCapSet(full)
    require(overInitial == overFinal,
      s"a band bucket crossed the cap mid-run ($overInitial vs " +
        s"$overFinal) — the equality precondition broke; re-pin the fixture")
    // compaction parity probe: the same fresh mini-batch mined against
    // the original and the compacted store must find identical pairs —
    // band keys, the band_sig token, and partition pruning all survived
    // the rewrite, proven by USE rather than by schema inspection
    val probe = Seq((800000L, anchorTexts(3L)), (800001L, anchorTexts(3L)),
      (800002L, floodText)).toDF("id", "text")
    def mineProbe(store: DataFrame): Set[(Long, Long, Long)] =
      Dedup.minhashIncrementalPairs(probe, store, "id", "text",
          k, bands, shingleN, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaOriginal = mineProbe(spark.read.parquet(dir))
    val viaCompacted = mineProbe(full)
    require(viaOriginal.nonEmpty,
      "compaction parity probe mined nothing — the probe fixture went " +
        "vacuous")
    require(viaOriginal == viaCompacted,
      s"mining against the compacted band store diverged from the " +
        s"original: missing=${(viaOriginal -- viaCompacted).take(3)} " +
        s"extra=${(viaCompacted -- viaOriginal).take(3)}")
    val all = batches.foldLeft(initial)(_ unionByName _)
    val sigs = Dedup.minhashSignatures(all, "id", "text", k, shingleN)
      .localCheckpoint()
    val salvage = Dedup.minhashSalvageVerifiedPairs(sigs, k, bands,
      thr, cap, maxReps)
    val got = Dedup.clustersIncremental(ids, "id", labels, salvage)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Dedup.clusters(all.select(col("id")), "id",
        Dedup.minhashLshPairs(all, "id", "text", k, bands, shingleN,
            maxBucket = cap)
          .select(col("a_id"), col("b_id"))
          .unionByName(salvage.select(col("a_id"), col("b_id"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(got == want,
      s"minhash ingest lifecycle diverged from the one-shot run: " +
        s"${got.size} vs ${want.size} rows; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    val floodRowsGot = got.filter(t => floodIds(t._1))
    require(floodRowsGot.size == floodIds.size &&
        floodRowsGot.map(_._2).size == 1,
      "minhash salvage did not reconnect the cap-dropped flood")
    require(got.exists(t => t._1 == 700000L && t._3 == 1L),
      "null-text row did not survive as a singleton")
    println(s"[verify] ingest_lifecycle_minhash OK: ${batches.size} capped " +
      s"increments (${mined.mkString("/")} candidates) + band_idx " +
      s"compaction (${parquetFiles(dir)} -> ${parquetFiles(dir2)} files, " +
      s"probe parity ${viaOriginal.size} pairs) + salvage sweep == " +
      s"one-shot capped+salvaged verdict over ${want.size} rows (flood " +
      s"of ${floodIds.size} fragmented ${preSalvage}-way under the cap " +
      "alone, single cluster after the sweep)")
  }
}

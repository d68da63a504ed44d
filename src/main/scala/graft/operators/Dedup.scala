package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{text, TextSig, SparkDialect => S}

/** Corpus deduplication operators — the training-data-pipeline family.
  *
  * The reference's only dedup is exact-by-id (backend/chatbot.py:315); a
  * 100 TB document corpus needs the full ladder: exact → n-gram Jaccard →
  * MinHash LSH → SimHash → embedding cosine. Every operator here is a pure
  * declarative plan: per-row signature computation is a codegen'd projection
  * (no UDFs — all expressions come from [[graft.functions.text]]), and the
  * quadratic pair search is always bounded by a blocking key (the LSH band /
  * bit-chunk / caller-supplied block), so the shuffle is hash-partitioned by
  * block and no executor ever materializes the full cross product.
  *
  * Scale notes (1000-executor / 100 TB):
  *  - exact: one hash aggregate, fully map-side combinable.
  *  - Jaccard: only sane with a blocking column; prefer [[minhashLshPairs]].
  *  - MinHash LSH: the canonical near-dup path — shuffle is `bands × docs`
  *    rows keyed by (band_idx, band_hash); skewed mega-buckets (boilerplate
  *    docs) are dropped by the `maxBucket` cap (see [[pairJoin]]), audited
  *    via [[minhashBandBucketStats]].
  *  - SimHash: 16-bit chunks give a pigeonhole-exact prefilter for
  *    hamming ≤ 3 at 4 chunk-joins.
  *  - embedding: exact within blocks; for open-domain use [[AnnIndex]].
  */
object Dedup {

  /** Exact dedup by text content: one survivor (min key) per distinct text,
    * with the duplicate count. Single hash-aggregate, no join.
    *
    * NULL texts follow SQL GROUP BY semantics — they form ONE group with
    * one survivor, exactly the verdict the DuckDB oracle and the
    * streaming twin ([[graft.streaming.EventsStream.dedupStream]], where
    * the state store keys nulls the same way) reach, so the three
    * cadences can never disagree. That is deliberate and DIFFERENT from
    * the near-dup faces' "null doc matches nothing": exact dedup asks
    * "is the content byte-equal", and a caller for whom null means
    * MISSING (failed extraction) rather than "empty content" must filter
    * nulls upstream — keeping only `keep_id`s of this output would
    * otherwise discard every null-text document but one. */
  def exact(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(keyCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop(textCol)

  /** Deterministically release a localCheckpoint'd frame's persisted
    * blocks (r13): `Dataset.unpersist` goes through the CacheManager and
    * no-ops on checkpoints, so without this the blocks live until the
    * driver GCs the frame and the ContextCleaner gets around to it — an
    * operator that checkpoints per call (clusters, pqFit) would pin one
    * copy of its largest intermediate per invocation in executor storage
    * between GCs. Callers may only release frames the RETURNED plan no
    * longer references (a released checkpoint cannot recompute — its
    * lineage is truncated by construction). No-op on non-checkpoint
    * frames, so round-1 loop bodies can release their uncheckpointed
    * seed unconditionally. */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block keys whose bucket holds more than `maxBucket` rows — the
    * mega-buckets a cap excludes. Map-side-combinable aggregate whose
    * output is only the OVERSIZED keys, which are by definition few (each
    * holds > maxBucket of the corpus), so the frame broadcasts. */
  private def oversizedKeys(sigs: DataFrame, joinCols: Seq[String],
                            maxBucket: Int): DataFrame =
    sigs.groupBy(joinCols.map(col): _*)
      .agg(count(lit(1)).as("__n_docs"))
      .filter(col("__n_docs") > maxBucket)
      .drop("__n_docs")

  /** Generic block-key bucket census — the drop-audit behind every
    * `maxBucket` cap here: one row per distinct `joinCols` key with its
    * bucket size, largest first. Run it before committing a cap to see
    * exactly which keys (and how many docs) the cap would exclude. One
    * map-side-combinable aggregate; at 100 TB add a LIMIT — only the head
    * (the skew) is ever interesting. */
  def blockBucketStats(sigs: DataFrame, joinCols: Seq[String]): DataFrame =
    sigs.groupBy(joinCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(desc("n_docs"), col(joinCols.head))

  /** Capped blocked self-join — the one shape every pair-mining operator
    * in this file reduces to, public so ad-hoc blocking schemes (e.g. the
    * containment dedup's first-3-token prefix) get the same mega-bucket
    * protection as the LSH band join instead of re-rolling an uncapped
    * join. Contract: `sigs` must carry an `id` column (pair order is
    * `a.id < b.id`); output duplicates every column as `a_`/`b_` pairs.
    * Audit what a cap would drop with [[blockBucketStats]].
    *
    * `enrich` attaches columns AFTER the cap, before the self-join: put
    * expensive per-row signatures (shingle sets, embeddings) there rather
    * than in `sigs`, and they are computed only for rows that can still
    * pair — on a boilerplate-heavy corpus the cap drops the bulk of the
    * rows, and paying the signature UDF for a row the cap then discards
    * is pure waste (measured: the hot-prefix stress corpus drops ~100%,
    * and moving the shingle UDF into enrich removed the dominant cost).
    * Semantics are unchanged — dropped rows produce no pairs either way. */
  def pairJoin(sigs: DataFrame, joinCols: Seq[String],
               maxBucket: Int = Int.MaxValue,
               enrich: DataFrame => DataFrame = identity): DataFrame = {
    // Mega-bucket cap (drop-and-count, not salt-and-split): a block key
    // shared by > maxBucket docs is boilerplate by construction — its
    // pairs are O(bucket²) shuffle rows of near-zero information, and ONE
    // such key (a license header, a template page) can hold 30% of a
    // 100 TB corpus and sink the band shuffle. Dropping the bucket bounds
    // every join task at maxBucket² candidate rows and is deterministic;
    // a salted re-split would keep only a random 1/s of each mega-bucket's
    // pairs — nondeterministic recall with the same information loss.
    // Buckets at or under the cap are untouched (asserted in ModulesSpec);
    // audit what a cap would drop with [[minhashBandBucketStats]].
    // JOINS ARE NULL-SAFE (<=>) THROUGHOUT, deliberately: plain `=` makes
    // Spark infer isnotnull() on every join key and PUSH IT BELOW the
    // signature projection — the filter then re-evaluates the whole UDF
    // chain (tokenize + hash) once per key per branch, and the capped
    // self-join paid FOUR full signature passes where one suffices
    // (measured 43 s → 9 s at the M=120 hot-prefix stress corpus).
    // Null-safe equality infers no null filters, so signatures are
    // computed exactly once per projection. Semantics: null signature
    // keys (null text) now bucket together instead of never matching —
    // their pairs carry null similarity and every caller's threshold
    // drops them, so no survivor can differ.
    val bounded =
      if (maxBucket == Int.MaxValue) sigs
      else {
        val over = oversizedKeys(sigs, joinCols, maxBucket)
          .select(joinCols.map(c => col(c).as(s"__over_$c")): _*)
        val dropCond = joinCols.map(c => col(c) <=> col(s"__over_$c"))
          .reduce(_ && _)
        sigs.join(broadcast(over), dropCond, "left_anti")
      }
    // shuffle_hash, never broadcast: both sides of this self-join are the
    // whole corpus, and the signature projections feeding it are UDF-heavy —
    // a broadcast build would evaluate one full side single-threaded on the
    // driver (measured 4x the query), and at 100 TB the corpus can't be
    // broadcast at all. Hash beats merge: the block key needs no sort.
    //
    // Self-join via .as() aliases with the a_/b_ renames AFTER the join,
    // not before: renaming first made the two shuffle subtrees textually
    // different, so ReuseExchange never fired and the UDF-heavy signature
    // projection ran TWICE (visible as two full scan+UDF branches in the
    // executed plan). With identical subtrees the second exchange reads
    // the first's shuffle files — signatures are computed once per corpus
    // pass, for free, with no checkpoint/persist memory cost.
    val full = enrich(bounded)
    val cols = full.columns.toIndexedSeq
    val a = full.as("a").hint("shuffle_hash")
    val b = full.as("b").hint("shuffle_hash")
    val cond = joinCols.map(c => col(s"a.$c") <=> col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    a.join(b, cond)
      .select(cols.map(c => col(s"a.$c").as("a_" + c)) ++
        cols.map(c => col(s"b.$c").as("b_" + c)): _*)
  }

  /** Near-duplicate pairs by word n-gram Jaccard similarity ≥ `threshold`,
    * compared only within equal `blockCol` (blocking bounds the quadratic).
    * Shingles are compared as BIGINT hashes, not strings — set ops over int
    * arrays are several times cheaper per pair and mod-1e9+7 collisions are
    * negligible next to the threshold. */
  def ngramJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    // NULL caller blocks never pair — SQL equality-blocking semantics.
    // pairJoin's null-safe keys are justified only when the key derives
    // from the same text as the signature (null key ⟺ null similarity,
    // the threshold backstop); a caller-supplied block column (domain,
    // language) can be NULL on rows with genuine text, and <=> would
    // compare all unknown-block rows against each other — and collapse
    // them into one uncapped mega-bucket. The filter runs on the raw
    // input column, before any UDF projection, so nothing re-evaluates.
    val sigs = df.filter(col(blockCol).isNotNull).select(
      col(keyCol).as("id"),
      col(blockCol).as("block"),
      TextSig.shingleHashesUdf(col(textCol), lit(n)).as("sh"))
    pairJoin(sigs, Seq("block"), maxBucket)
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Near-duplicate pairs by token-set Jaccard ≥ num/den via PREFIX
    * FILTERING (Chaudhuri et al. 2006 / PPJoin's base filter) — the
    * blocking-free exact alternative to [[ngramJaccardPairs]] when no
    * caller block column exists and LSH's probabilistic recall is not
    * acceptable. Tokens are globally ordered rarest-first (document
    * frequency, then hash); each doc contributes only its first
    * p = |T| − ⌈τ·|T|⌉ + 1 tokens as candidate keys. The prefix lemma
    * makes the filter LOSSLESS: any pair with J ≥ τ must share a prefix
    * token, so verification against the full token sets returns exactly
    * the true pairs (the oracle is the exact join). Candidate volume is
    * governed by the RAREST tokens — the opposite skew profile of a
    * plain inverted-index join, where the most common token dominates.
    *
    * The threshold is an exact rational num/den, NOT a double: the prefix
    * length and the J ≥ τ test are pure integer arithmetic
    * (⌈num·sz/den⌉ = (num·sz + den − 1) div den; den·|∩| ≥ num·|∪|), so
    * both engines agree at exact boundaries — a double ⌈0.8·5⌉ is 5 in
    * IEEE binary (0.8·5 rounds above 4) but 4 in DuckDB's DECIMAL
    * arithmetic, an engine-semantics trap the rational form removes.
    *
    * Scale (100 TB): the document-frequency table is vocab-sized and
    * broadcast by default, with `broadcastDfreq = false` as the explicit
    * escape hatch for a word-level vocab that outgrows the broadcast
    * ceiling (Heaps-law token counts on a raw web crawl) — leaving the
    * choice to AQE was measured BIMODAL at stress scale (tight 11-13 s
    * with the hint vs 12-44 s without, same code, M=24 ladder rung:
    * AQE only sometimes converts the post-agg join back to broadcast,
    * and the losing runs re-shuffle the UDF-tokenized explode), so the
    * strategy is a caller-declared fact, not a per-run coin flip; the
    * rarest-first rank is one window partitioned by doc
    * (rows per partition = |token set|, bounded by doc length); the
    * candidate join shuffles only prefix rows keyed by token. Residual
    * skew — a "rare" token that is still hot, or near-empty docs whose
    * whole 1-token set is its own prefix — is bounded by `maxBucket`
    * (same cap-and-audit contract as every pair face here; census the
    * drops with [[blockBucketStats]] on the prefix token). The length
    * filter den·min(|A|,|B|) ≥ num·max(|A|,|B|) prunes candidates before
    * verification; PPJoin's positional filter is deliberately omitted —
    * it cuts constants, not complexity, and would put per-candidate
    * position arithmetic in the oracle mirror for no asymptotic gain.
    * NULL texts have a NULL token set and never pair (the near-dup
    * null-semantics policy); EMPTY texts hash to the {0} singleton set
    * and pair only with each other at J = 1. */
  def prefixFilterJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
                               num: Int, den: Int,
                               maxBucket: Int = Int.MaxValue,
                               broadcastDfreq: Boolean = true): DataFrame =
    prefixFilterJaccardPairsFromSets(tokenSets(df, keyCol, textCol),
      num, den, maxBucket, broadcastDfreq)

  /** The persistable distinct-token-set table (id, ts) feeding
    * [[prefixFilterJaccardPairsFromSets]] — the [[minhashSignatures]]
    * pattern: the tokenization pass is referenced three times in the pair
    * plan (prefix explode + both verification joins), so a 100 TB run
    * stores this table once and sweeps thresholds over it instead of
    * re-tokenizing the corpus per reference. Kernel shingles at n=1 are
    * exactly the distinct token hashes (LinkedHashSet in
    * [[TextSig.shingleHashes]]), but the explicit array_distinct keeps the
    * SQL mirror honest if the kernel ever changes shape. */
  def tokenSets(df: DataFrame, keyCol: String, textCol: String): DataFrame =
    df.select(col(keyCol).as("id"),
      array_distinct(TextSig.shingleHashesUdf(col(textCol), lit(1))).as("ts"))

  /** [[prefixFilterJaccardPairs]] over a precomputed [[tokenSets]] table
    * (columns `id`, `ts`). */
  def prefixFilterJaccardPairsFromSets(tk: DataFrame, num: Int, den: Int,
                                       maxBucket: Int = Int.MaxValue,
                                       broadcastDfreq: Boolean = true): DataFrame = {
    require(num > 0 && num <= den, s"threshold $num/$den not in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val ex = tk.filter(col("ts").isNotNull)
      .select(col("id"), size(col("ts")).cast("long").as("sz"),
        explode(col("ts")).as("tok"))
    // document frequency per token. Broadcast is caller-gated, default on:
    // the table is vocab-sized (duplication adds no tokens), but a
    // word-level web-crawl vocab can exceed the broadcast ceiling —
    // broadcastDfreq = false hands the join to AQE then. The gate is NOT
    // left to AQE unconditionally: measured at the M=24 stress rung, AQE
    // only sometimes converted this post-aggregate join back to broadcast
    // (bimodal 12-44 s vs a tight 11-13 s hinted), because the conversion
    // races stage completion — and the losing plan re-shuffles the
    // UDF-tokenized explode feeding the rank window.
    val dfreq0 = ex.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val dfreq = if (broadcastDfreq) broadcast(dfreq0) else dfreq0
    val w = Window.partitionBy("id").orderBy(col("dfreq"), col("tok"))
    val pref = ex.join(dfreq, Seq("tok"))
      .withColumn("pos", row_number().over(w).cast("long"))
      // p = sz − ⌈num·sz/den⌉ + 1, all integer
      .filter(col("pos") <=
        col("sz") - expr(s"(($num * sz) + ${den - 1}) div $den") + lit(1L))
      .select("id", "sz", "tok")
    val bounded =
      if (maxBucket == Int.MaxValue) pref
      else {
        val over = oversizedKeys(pref.select("tok"), Seq("tok"), maxBucket)
          .select(col("tok").as("__over_tok"))
        pref.join(broadcast(over), col("tok") === col("__over_tok"), "left_anti")
      }
    // shuffle_hash on every corpus-sized side, same rationale as
    // [[pairJoin]]: both self-join sides are prefix rows of the whole
    // corpus and the tk verification sides carry the UDF-backed token-set
    // arrays — letting stats broadcast one evaluates the UDF chain
    // single-threaded on the driver (measured 4x at small scale), and at
    // 100 TB the corpus can't be broadcast at all
    val a = bounded.as("a").hint("shuffle_hash")
    val b = bounded.as("b").hint("shuffle_hash")
    val cand = a.join(b,
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) * den >=
            greatest(col("a.sz"), col("b.sz")) * num)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
    // exact verification over the full token sets — candidate-sized joins
    cand
      .join(tk.select(col("id").as("a_id"), col("ts").as("a_ts"))
        .hint("shuffle_hash"), Seq("a_id"))
      .join(tk.select(col("id").as("b_id"), col("ts").as("b_ts"))
        .hint("shuffle_hash"), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_ts"), col("b_ts"))).cast("long"))
      .withColumn("uni", size(array_union(col("a_ts"), col("b_ts"))).cast("long"))
      .filter(col("inter") * den >= col("uni") * num)
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** One row per (id, band): the LSH banding stage shared by
    * [[minhashLshPairs]] and [[minhashLshVerifiedPairs]] — the band-key
    * expression lives exactly once. `carryHashes` additionally threads the
    * shingle-hash array through (needed only when candidates get exact
    * Jaccard verification downstream; plain candidate mining skips the
    * array to keep the band shuffle narrow). */
  /** The persistable MinHash signature table: (id, hs, sig) — shingle-hash
    * set + k-value signature, computed in ONE compiled-kernel corpus pass.
    * This is the artifact a 100 TB pipeline stores once and sweeps dials
    * over: every (bands, rows) configuration in [[minhashLshVerifiedPairsFromSignatures]]
    * re-reads the same signatures instead of re-tokenizing the corpus
    * (the q_lsh_tuning shape — 3 sweeps, one signature pass). */
  def minhashSignatures(df: DataFrame, keyCol: String, textCol: String,
                        k: Int, shingleN: Int): DataFrame =
    // `sig_geom` is the persistence token (the [[minhashBandIndex]]
    // `band_sig` discipline for the signature artifact): a sweep that
    // re-loads a stored table under the wrong k is refused structurally
    // by [[bandedFromSignatures]]'s size check, but a shingleN mismatch
    // silently changes what "jaccard >= threshold" MEANS — a loader
    // should compare this column against its expected geometry before
    // sweeping (the banding faces drop it; it costs one literal).
    df.select(col(keyCol).as("id"),
      TextSig.shingleHashesUdf(col(textCol), lit(shingleN)).as("hs"),
      TextSig.minhashSigUdf(col(textCol), lit(shingleN), lit(k)).as("sig"),
      lit(k.toLong * 100000L + shingleN).as("sig_geom"))

  /** Band rows from a PRECOMPUTED signature table ([[minhashSignatures]]
    * output): the banding stage alone — cheap array slicing, no corpus
    * re-tokenization. */
  /** The LSH banding expression over a `sig` signature-array column:
    * one (band_idx, band_key) struct per band. Shared by
    * [[minhashLshPairs]]' banding stage and the streaming
    * [[graft.streaming.EventsStream.lshNearDupStream]], so the band-key
    * format lives exactly once. */
  private[graft] def bandStructsExpr(bands: Int, r: Int): String =
    s"transform(sequence(0, ${bands - 1}), j -> " +
      s"struct(j AS band_idx, array_join(slice(sig, j*$r + 1, $r), '_') AS band_key))"

  /** [[bandStructsExpr]] with the signature-length check folded INTO the
    * band key (the load-bearing column — an unused check column would be
    * optimizer-pruned): a persisted signature table re-loaded under the
    * wrong k slices EMPTY arrays into the phantom bands — band_key ""
    * for every doc, one corpus-wide bucket per band, silently. The fold
    * lives inside the transform so the check costs one size() per band
    * row and nothing is carried through the explode (an earlier shape
    * staged the sig array alongside the explode and paid the full
    * k-array copy per band row — measured 2× on the verified-pairs
    * fixture). Null sigs pass the assert (null band_key, dropped by the
    * caller's filter). */
  private def bandStructsExprChecked(bands: Int, r: Int, k: Int): String =
    s"transform(sequence(0, ${bands - 1}), j -> " +
      s"struct(j AS band_idx, concat(" +
      s"array_join(slice(sig, j*$r + 1, $r), '_'), " +
      s"coalesce(CAST(assert_true(sig IS NULL OR size(sig) = $k, " +
      s"'minhash signature length does not match k=$k — the signature " +
      s"table was built under a different k; rebuild it with " +
      s"minhashSignatures') AS STRING), '')) AS band_key))"

  private def bandedFromSignatures(sigs: DataFrame, k: Int, bands: Int,
                                   carryHashes: Boolean,
                                   carrySig: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val keep = col("id") +: ((if (carryHashes) Seq(col("hs")) else Nil) ++
      (if (carrySig) Seq(col("sig")) else Nil))
    sigs.select((keep :+
        explode(expr(bandStructsExprChecked(bands, r, k))).as("band")): _*)
      // a NULL signature (null text) bands to NULL band_key in EVERY
      // band; pairJoin's deliberate null-safe keys would then bucket all
      // null-text docs together and emit them as maximal-confidence
      // candidates (n_bands = bands) with no similarity backstop on the
      // candidate faces — the oracle's plain `=` band join never matches
      // NULL, and N failed extractions would otherwise build an N²/2
      // all-null mega-bucket. Filtering the banded rows (NOT the sigs
      // projection — a filter there would push below the signature
      // projection and re-run the UDF chain per row, the measured
      // pairJoin trap; the explode Generate blocks that pushdown here)
      // restores SQL equality semantics: null docs band nowhere, match
      // nothing. The k-length structural check is folded into band_key
      // by [[bandStructsExprChecked]].
      .filter(col("band.band_key").isNotNull)
      .select((keep :+ col("band.band_idx") :+ col("band.band_key")): _*)
  }

  private def minhashBanded(df: DataFrame, keyCol: String, textCol: String,
                            k: Int, bands: Int, shingleN: Int,
                            carryHashes: Boolean): DataFrame =
    // compiled one-pass kernels: Catalyst HOF lambdas re-evaluate the
    // shingle hashing per signature value (CollapseProject re-inlines any
    // staged projection), which benchmarked 100x slower — see TextSig
    bandedFromSignatures(minhashSignatures(df, keyCol, textCol, k, shingleN),
      k, bands, carryHashes)

  /** [[minhashLshVerifiedPairs]] over a PRECOMPUTED (possibly persisted /
    * checkpointed) signature table — band-dial sweeps and repeated runs
    * pay the corpus tokenization exactly once. */
  def minhashLshVerifiedPairsFromSignatures(sigs: DataFrame, k: Int,
                                            bands: Int, threshold: Double,
                                            maxBucket: Int = Int.MaxValue): DataFrame =
    pairJoin(bandedFromSignatures(sigs, k, bands, carryHashes = true),
        Seq("band_idx", "band_key"), maxBucket)
      .select(col("a_id"), col("b_id"), col("a_hs"), col("b_hs")).distinct()
      .withColumn("jaccard",
        size(array_intersect(col("a_hs"), col("b_hs"))).cast("double") /
          size(array_union(col("a_hs"), col("b_hs"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))

  /** SALVAGE pairs for the band mega-buckets the `maxBucket` cap drops —
    * [[hammingSalvageEdges]]'s sibling for the MinHash family, with one
    * structural difference: identical fingerprints GUARANTEE a true pair
    * (hamming 0), identical MinHash signatures only make one likely — so
    * every salvage edge here is exact-Jaccard VERIFIED before it is
    * emitted. Within each oversized (band_idx, band_key) bucket, members
    * collapse into identical-FULL-SIGNATURE groups (a boilerplate
    * bucket is mostly one group), and the tier emits
    *
    *  - verified STAR pairs: each member against its group's min-id
    *    representative — n−1 verifications where the bucket's pair set
    *    is n(n−1)/2;
    *  - verified REPRESENTATIVE pairs: the bucket's distinct signatures
    *    pair-joined, bounded by `maxReps` distinct signatures per
    *    bucket (more rep-diverse buckets skip rep pairing, keeping
    *    their stars).
    *
    * Unlike the hamming tier there is NO exactness theorem: a true pair
    * whose members sit in different signature groups is recovered only
    * through the rep chain, and verification can break a link — the
    * measured-recall query (q_dedup_lsh_recall) quantifies exactly what
    * this tier recovers, the q_dedup_cap_recall discipline. Output
    * (a_id, b_id, jaccard ≥ `threshold`), normalized a_id < b_id; input
    * is a [[minhashSignatures]] table, so a persisted signature store
    * pays tokenization once. */
  def minhashSalvageVerifiedPairs(sigs: DataFrame, k: Int, bands: Int,
                                  threshold: Double, maxBucket: Int,
                                  maxReps: Int): DataFrame = {
    val banded = bandedFromSignatures(sigs, k, bands,
      carryHashes = true, carrySig = true)
    val keys = Seq("band_idx", "band_key")
    val over = oversizedKeys(banded.select((Seq("id") ++ keys).map(col): _*),
        keys, maxBucket)
      .select(keys.map(c => col(c).as(s"__over_$c")): _*)
    val overCond = keys.map(c => col(c) <=> col(s"__over_$c")).reduce(_ && _)
    // oversized-KEY bound: rows·bands/maxBucket in the worst case — see
    // hammingSalvageEdges; small in the skewed regime the cap exists for
    val mega = banded.join(broadcast(over), overCond, "left_semi")
      .filter(col("sig").isNotNull)
    // identical-signature groups; min(struct) picks the rep AND its
    // shingle set in one aggregate (ids are unique, so the array field
    // never participates in the ordering)
    val groups = mega
      .groupBy(col("band_idx"), col("band_key"), col("sig"))
      .agg(min(struct(col("id"), col("hs"))).as("r"))
      .select(col("band_idx"), col("band_key"), col("sig"),
        col("r.id").as("rep"), col("r.hs").as("rep_hs"))
    val g = groups.select(col("band_idx").as("__g_idx"),
      col("band_key").as("__g_key"), col("sig").as("__g_sig"),
      col("rep"), col("rep_hs"))
    val jac = size(array_intersect(col("a_hs"), col("b_hs"))).cast("double") /
      size(array_union(col("a_hs"), col("b_hs")))
    val stars = mega.join(g,
        col("band_idx") <=> col("__g_idx") &&
          col("band_key") <=> col("__g_key") && col("sig") <=> col("__g_sig"))
      .filter(col("id") =!= col("rep"))
      .select(least(col("id"), col("rep")).as("a_id"),
        greatest(col("id"), col("rep")).as("b_id"),
        col("hs").as("a_hs"), col("rep_hs").as("b_hs"))
      .distinct()
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    val pairable = groups.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n_reps"))
      .filter(col("__n_reps") <= maxReps)
      .select(keys.map(c => col(c).as(s"__ok_$c")): _*)
    val okCond = keys.map(c => col(c) <=> col(s"__ok_$c")).reduce(_ && _)
    val repPairs = pairJoin(
        groups.join(broadcast(pairable), okCond, "left_semi")
          .select(col("rep").as("id"), col("rep_hs").as("hs"),
            col("band_idx"), col("band_key")),
        keys)
      .select(col("a_id"), col("b_id"), col("a_hs"), col("b_hs")).distinct()
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    // jaccard is a function of the pair, so the distinct collapses a
    // pair found by both faces (or from several buckets)
    stars.unionByName(repPairs).distinct()
  }

  /** The capped verified LSH join PLUS the mega-bucket salvage tier —
    * [[hammingPairsSalvaged]]'s MinHash mirror: every pair
    * [[minhashLshVerifiedPairs]] finds at `maxBucket`, united with
    * [[minhashSalvageVerifiedPairs]] over the SAME signature table —
    * bounded tasks (the cap) plus verified recovery of the boilerplate
    * mass the cap drops; `jaccard` is a function of the pair, so the
    * distinct collapses pairs found by both tiers.
    *
    * COST SHAPE: mirrors the hamming wrapper's caveat — this form
    * computes [[minhashSignatures]] lazily from `df`, and both tiers
    * reference that plan from several subtrees, so the tokenize+hash
    * kernels re-run per subtree. The production shape is
    * q_dedup_lsh_recall's: materialize the signature table ONCE
    * (persisted or cached) and feed
    * [[minhashLshVerifiedPairsFromSignatures]] +
    * [[minhashSalvageVerifiedPairs]]. Use this wrapper for one-shot
    * runs on corpora where tokenization is not the dominant cost. */
  def minhashLshPairsSalvaged(df: DataFrame, keyCol: String, textCol: String,
                              k: Int, bands: Int, shingleN: Int,
                              threshold: Double, maxBucket: Int,
                              maxReps: Int): DataFrame = {
    val sigs = minhashSignatures(df, keyCol, textCol, k, shingleN)
    minhashLshVerifiedPairsFromSignatures(sigs, k, bands, threshold, maxBucket)
      .unionByName(
        minhashSalvageVerifiedPairs(sigs, k, bands, threshold, maxBucket, maxReps))
      .distinct()
  }

  /** Candidate near-duplicate pairs by MinHash LSH: k-value signatures cut
    * into `bands` bands; pairs sharing ≥1 band are candidates. Returns
    * (a_id, b_id, n_bands) — callers verify candidates with exact Jaccard
    * if needed. k must be divisible by bands. */
  def minhashLshPairs(df: DataFrame, keyCol: String, textCol: String,
                      k: Int, bands: Int, shingleN: Int,
                      maxBucket: Int = Int.MaxValue): DataFrame =
    pairJoin(minhashBanded(df, keyCol, textCol, k, bands, shingleN,
        carryHashes = false), Seq("band_idx", "band_key"), maxBucket)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_bands"))

  /** Per-bucket occupancy of the LSH band index: (band_idx, band_key,
    * n_docs), largest first — the skew audit behind `maxBucket`. At 100 TB
    * this runs over the persisted [[minhashBandIndex]] as one
    * map-side-combinable aggregate; `.filter(n_docs > cap)` is exactly the
    * set of buckets (and `sum(n_docs * (n_docs - 1) / 2)` over it the
    * number of candidate pairs) that a cap of `cap` would drop. */
  def minhashBandBucketStats(df: DataFrame, keyCol: String, textCol: String,
                             k: Int, bands: Int, shingleN: Int): DataFrame =
    minhashBanded(df, keyCol, textCol, k, bands, shingleN, carryHashes = false)
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(desc("n_docs"), col("band_idx"), col("band_key"))

  /** The persistable LSH band index of a corpus — one (id, band_idx,
    * band_key, band_sig) row per doc per band, i.e. exactly what
    * [[minhashLshPairs]] self-joins. At 100 TB this frame is written to
    * parquet partitioned by band_idx once, and every later increment
    * joins against it instead of re-signaturing the corpus
    * ([[minhashIncrementalPairs]]). `band_sig` is the geometry/freshness
    * token ([[hammingChunkIndex]]'s `chunk_sig` recipe, r11 — this was
    * the ONE persisted blocking index without one): it encodes
    * (k, bands, shingleN), and the incremental mine refuses an index
    * banded under different geometry — whose band keys would simply
    * never match the new batch's, silently missing every cross pair. */
  def minhashBandIndex(df: DataFrame, keyCol: String, textCol: String,
                       k: Int, bands: Int, shingleN: Int): DataFrame =
    minhashBanded(df, keyCol, textCol, k, bands, shingleN, carryHashes = false)
      .withColumn("band_sig", lit(bandSig(k, bands, shingleN)))

  /** The band-geometry token stamped by [[minhashBandIndex]] and
    * verified by [[minhashIncrementalPairs]] / [[minhashIndexRefresh]]. */
  private[graft] def bandSig(k: Int, bands: Int, shingleN: Int): Long =
    k.toLong * 1000000L + bands.toLong * 1000L + shingleN

  /** Incremental near-dup mining: candidate pairs INVOLVING a new batch —
    * new×corpus and new×new, never corpus×corpus — against a prebuilt
    * [[minhashBandIndex]]. This is what makes continuous ingest dedup
    * affordable: per-batch cost is |batch| × bucket-mates, independent of
    * corpus size, where a full [[minhashLshPairs]] re-run grows with the
    * corpus square. Pair ids are normalized (a_id < b_id) so new×new pairs
    * found from both orientations and corpus-id-smaller pairs all land
    * once, with the same n_bands a full run would report.
    */
  def minhashIncrementalPairs(newDocs: DataFrame, corpusIndex: DataFrame,
                              keyCol: String, textCol: String,
                              k: Int, bands: Int, shingleN: Int,
                              maxBucket: Int = Int.MaxValue): DataFrame = {
    require(corpusIndex.columns.contains("band_sig"),
      "minhash band index carries no band_sig token — rebuild it with " +
        "minhashBandIndex before mining increments against it")
    val nb = minhashBanded(newDocs, keyCol, textCol, k, bands, shingleN,
      carryHashes = false)
    // the geometry assert rides the load-bearing band_key JOIN KEY,
    // evaluated once per index row at key-hash time (the
    // [[embeddingIncrementalPairs]]/[[requireSigned]] discipline): an
    // index banded under different (k, bands, shingleN) would otherwise
    // just never match and silently miss every cross pair — a
    // candidate-page assert never fires when the keys never join.
    // band_key is a string, so the zero-or-throw guard concatenates an
    // empty string instead of adding zero. The <=> equality makes a NULL
    // band_sig (a stamped ∪ raw union) fail the SAME assert — named in
    // the message so the operator chases the right rebuild cause
    val checked = corpusIndex.select(col("id"), col("band_idx"),
      concat(col("band_key"),
        coalesce(assert_true(
          col("band_sig") <=> lit(bandSig(k, bands, shingleN)),
          lit(s"stale minhash band index (or unstamped rows — a NULL " +
            s"band_sig from a stamped ∪ raw union): band_sig does not " +
            s"match k=$k/bands=$bands/shingleN=$shingleN; rebuild the " +
            "index")).cast("string"),
          lit(""))).as("band_key"))
    // the cap population is the FULL post-batch bucket (index ∪ batch):
    // a bucket pushed over the cap by this batch is dropped from both
    // sides, matching what a from-scratch capped run over old+new would do
    val all = checked.unionByName(
      nb.select(col("id"), col("band_idx"), col("band_key")))
    // null-safe key comparisons throughout, same rationale as [[pairJoin]]:
    // `=` (or a name-based join) makes Spark push inferred isnotnull(key)
    // below the banding projection and re-evaluate the signature UDF chain
    // once per key per branch
    val keys = Seq("band_idx", "band_key")
    def bound(df: DataFrame): DataFrame =
      if (maxBucket == Int.MaxValue) df
      else {
        val over = oversizedKeys(all, keys, maxBucket)
          .select(keys.map(c => col(c).as(s"__over_$c")): _*)
        df.join(broadcast(over),
          keys.map(c => col(c) <=> col(s"__over_$c")).reduce(_ && _),
          "left_anti")
      }
    val a = bound(nb)
      .select(col("id").as("a_id"), col("band_idx"), col("band_key"))
      .hint("shuffle_hash")
    val b = bound(all)
      .select(col("id").as("b_id"), col("band_idx").as("__b_band_idx"),
        col("band_key").as("__b_band_key"))
      .hint("shuffle_hash")
    a.join(b, col("band_idx") <=> col("__b_band_idx") &&
        col("band_key") <=> col("__b_band_key"))
      .filter(col("a_id") =!= col("b_id"))
      // normalize orientation; a new×new pair arrives from both sides and
      // (band_idx is unique per doc) collapses on the distinct
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("band_idx"))
      .distinct()
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** The full two-stage near-dup pattern in one operator: MinHash LSH
    * proposes candidate pairs, exact n-gram-shingle Jaccard verifies them
    * (≥ `threshold`). At 100 TB the exact set compare only ever runs on
    * LSH candidates — the quadratic never touches the corpus. Returns
    * (a_id, b_id, jaccard). */
  def minhashLshVerifiedPairs(df: DataFrame, keyCol: String, textCol: String,
                              k: Int, bands: Int, shingleN: Int,
                              threshold: Double,
                              maxBucket: Int = Int.MaxValue): DataFrame =
    minhashLshVerifiedPairsFromSignatures(
      minhashSignatures(df, keyCol, textCol, k, shingleN),
      k, bands, threshold, maxBucket)

  /** Near-duplicate pairs by SimHash hamming distance ≤ `maxHamming` over
    * `bits`-bit fingerprints. Pigeonhole prefilter: fingerprints are cut
    * into `chunks` equal chunks; hamming ≤ chunks-1 implies ≥1 equal chunk,
    * so the join on (chunk_idx, chunk_value) is exact, never lossy. */
  /** Near-duplicate pairs by hamming distance ≤ `maxHamming` over a
    * PRECOMPUTED `bits`-bit fingerprint column — the pigeonhole prefilter
    * generalized from [[simhashPairs]] so every fingerprint family (text
    * SimHash, image dHash64, audio difference fingerprint) shares one
    * pair-search shape: fingerprints cut into `chunks` equal chunks;
    * hamming ≤ chunks−1 implies ≥ 1 equal chunk, so the (chunk_idx,
    * chunk_val) block join is exact, never lossy — and it rides
    * [[pairJoin]], so the mega-bucket `maxBucket` cap and null-safe keys
    * apply here too. Chunk extraction is an UNSIGNED shift, so a
    * fingerprint using the sign bit (dHash64) blocks correctly where a
    * `div`/`pow` split would mangle negatives. Input: (`idCol`,
    * `hashCol`); output (a_id, b_id, hamming). */
  def hammingPairs(df: DataFrame, idCol: String, hashCol: String,
                   bits: Int, chunks: Int, maxHamming: Int,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    // from-scratch face: the index is built THIS call under the require
    // above, so pigeonhole is proven at the driver and the row-level
    // key-folded guard would be pure tax — the A/B on the r10 quiet-map
    // drift measured it at ~10-40% of the hamming-family fixture queries
    // (q_dedup_cap_recall 14.1 -> 12.7 s, q_image_clusters 4.5 -> 3.2 s,
    // REPS=5 medians); the fold is reserved for the index-ACCEPTING
    // entry points where a stale/foreign index is actually possible
    val index = hammingChunkIndex(df, idCol, hashCol, bits, chunks)
    // with the cap ENGAGED the index is referenced from three subtrees
    // (oversized-key census, anti-join probe, the self-join) and the
    // fingerprint UDF chain (image/audio/video decode for the perceptual
    // families) re-ran per subtree — materialize it once, the persisted-
    // index shape hammingPairsFromIndex documents. Capless calls keep the
    // lazy form: the self-join's identical subtrees already share one
    // exchange (ReuseExchange), so a checkpoint there is pure extra work
    val trusted =
      if (maxBucket == Int.MaxValue) index else index.localCheckpoint(true)
    hammingPairsOverTrusted(trusted, maxHamming, maxBucket)
  }

  /** [[hammingPairs]] over a PRECOMPUTED (possibly persisted) chunk
    * index ([[hammingChunkIndex]] output) — repeated runs and dial
    * sweeps pay the decode + fingerprint pass exactly once, the
    * [[minhashLshVerifiedPairsFromSignatures]] pattern for the hamming
    * family. The index's `chunk_sig` token is REQUIRED and checked on
    * the row path: an index chunked too coarsely for this `maxHamming`
    * (chunks ≤ maxHamming) breaks the pigeonhole guarantee and would
    * silently MISS pairs sharing no equal chunk — the same
    * silent-recall-loss class [[hammingIncrementalPairs]] refuses
    * loudly, so this refuses too. */
  def hammingPairsFromIndex(index: DataFrame, maxHamming: Int,
                            maxBucket: Int = Int.MaxValue): DataFrame =
    hammingPairsOverTrusted(requireSigned(index, maxHamming),
      maxHamming, maxBucket)

  /** The pigeonhole pair join over index rows whose geometry has ALREADY
    * been established — either by [[requireSigned]]'s key-folded guard
    * (the index-accepting faces) or by the driver-side
    * `maxHamming < chunks` require of a from-scratch build in the same
    * plan ([[hammingPairs]], [[hammingPairsSalvaged]]), where the fold
    * would only re-prove a fact the caller just proved for free. */
  private def hammingPairsOverTrusted(rows: DataFrame, maxHamming: Int,
                                      maxBucket: Int): DataFrame =
    // chunk_sig rides the JOIN KEY: chunk values from DIFFERENT
    // geometries occupy different bit widths, so a coincidental numeric
    // equality across a mixed-geometry index (a manual union of two
    // stores — every refresh path refuses to create one) would pair
    // fingerprints whose chunks are not comparable. With the token in
    // the key each geometry mines completely within itself and
    // cross-geometry rows never compare — cross-geometry pairs are not
    // representable in a chunk join at all; re-index under one geometry
    // to find them. Uniform indexes (every supported path) see
    // byte-identical results at one constant extra key column.
    pairJoin(rows, Seq("chunk_idx", "chunk_val", "chunk_sig"), maxBucket)
      .select(col("a_id"), col("b_id"), col("a_fp"), col("b_fp")).distinct()
      .withColumn("hamming",
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))

  /** Loud-failure plumbing for the index-accepting entry points: the
    * presence require (a legacy index without the token cannot be
    * geometry-checked at all) plus the row-level pigeonhole assert,
    * folded into the load-bearing `chunk_val` JOIN KEY itself — so it
    * evaluates once per INDEX row (the key is hashed on every row of
    * both join sides), not per candidate-pair row. An earlier version
    * guarded only the joined pairs, and a too-coarse index whose
    * fingerprints happened to share no chunk value produced ZERO
    * candidate rows, never fired the assert, and silently returned
    * empty — exactly the silent-recall-loss class this guard exists to
    * refuse (ADVICE r9). A standalone check column would be
    * optimizer-pruned; riding the key cannot be. */
  private def requireSigned(index: DataFrame, maxHamming: Int): DataFrame = {
    require(index.columns.contains("chunk_sig"),
      "hamming index carries no chunk_sig token — rebuild it with " +
        "hammingChunkIndex before mining pairs from it")
    index.select(col("id"), col("fp"), col("chunk_idx"),
      (col("chunk_val") + pigeonholeGuard(col("chunk_sig"), maxHamming))
        .as("chunk_val"),
      col("chunk_sig"))
  }

  /** Zero, or a thrown error when the index's chunk count (the low half
    * of `chunk_sig`) cannot satisfy pigeonhole for `maxHamming`. */
  private def pigeonholeGuard(sig: org.apache.spark.sql.Column,
                              maxHamming: Int): org.apache.spark.sql.Column =
    coalesce(assert_true(lit(maxHamming) < sig % 100000L,
      lit(s"hamming index chunked too coarsely for maxHamming=$maxHamming: " +
        "pigeonhole needs maxHamming < chunks — rebuild the index with " +
        "more chunks")).cast("long"), lit(0L))

  /** SALVAGE edges for the mega-buckets the `maxBucket` cap drops — the
    * answer to "a genuine near-dup pair whose every matching chunk lands
    * in an oversized bucket is lost SILENTLY": instead of pairing an
    * oversized bucket quadratically (the cost the cap exists to avoid),
    * collapse it into identical-fingerprint groups and emit
    *
    *  - STAR edges: every member links to its group's min-id
    *    representative (hamming 0 by construction) — n−1 edges where the
    *    group's full pair set is n(n−1)/2, preserving the group's
    *    CONNECTIVITY exactly (the property [[clusters]] and
    *    [[dropNearDuplicates]] actually consume; a boilerplate bucket's
    *    quadratic pair list carries no more information);
    *  - REPRESENTATIVE pairs: the bucket's distinct fingerprints,
    *    pair-joined and hamming-verified — bounded by `maxReps` distinct
    *    fingerprints per bucket (a bucket more rep-diverse than that
    *    skips rep pairing, keeping its stars; the second-tier cap that
    *    keeps every task bounded).
    *
    * Theorem (property-pinned in ModulesSpec): a true pair (hamming ≤
    * `maxHamming`) sharing ONLY oversized buckets is CONNECTED through
    * stars + rep pairs of any one shared bucket whenever that bucket has
    * ≤ `maxReps` distinct fingerprints — so [[hammingPairsSalvaged]]
    * recovers full connectivity where the plain cap loses it, at
    * linear-per-bucket cost (stars) plus ≤ maxReps² per bucket (reps).
    *
    * Null fingerprints are excluded, matching the capped path (null
    * similarity never clears a caller's threshold). Output
    * (a_id, b_id, hamming), normalized a_id < b_id. */
  def hammingSalvageEdges(index: DataFrame, maxHamming: Int,
                          maxBucket: Int, maxReps: Int): DataFrame =
    hammingSalvageEdgesOverTrusted(requireSigned(index, maxHamming),
      maxHamming, maxBucket, maxReps)

  /** [[hammingSalvageEdges]] over rows whose geometry is already proven —
    * the [[hammingPairsOverTrusted]] split: [[hammingPairsSalvaged]]
    * builds its index in the same plan under a driver-side pigeonhole
    * require, so the key-folded guard would re-prove a proven fact on
    * every row. */
  private def hammingSalvageEdgesOverTrusted(
      rows: DataFrame, maxHamming: Int,
      maxBucket: Int, maxReps: Int): DataFrame = {
    // chunk_sig in the bucket key, like [[hammingPairsOverTrusted]]:
    // a mixed-geometry union must not fold different-width chunk values
    // into one salvage bucket
    val keys = Seq("chunk_idx", "chunk_val", "chunk_sig")
    val over = oversizedKeys(rows, keys, maxBucket)
      .select(keys.map(c => col(c).as(s"__over_$c")): _*)
    val overCond = keys.map(c => col(c) <=> col(s"__over_$c")).reduce(_ && _)
    // only the oversized buckets' rows. The oversized-KEY frame is
    // bounded by rows·chunks/maxBucket entries — small in the skewed
    // regime the cap exists for (a handful of boilerplate keys holding
    // large corpus fractions), NOT a universal guarantee: a corpus of
    // millions of barely-over buckets makes it large, and the remedy is
    // a larger maxBucket (the audit query sizes it), not this operator.
    // The broadcast spares the member rows a shuffle; the members stay
    // distributed either way
    val mega = rows.join(broadcast(over), overCond, "left_semi")
      .filter(col("fp").isNotNull)
    // identical-fingerprint groups within each mega bucket: the shuffle
    // is keyed by (chunk, fp), so one group = one task, linear in the
    // group — never bucket² rows
    val groups = mega.groupBy(
        col("chunk_idx"), col("chunk_val"), col("chunk_sig"), col("fp"))
      .agg(min(col("id")).as("rep"))
    val g = groups.select(col("chunk_idx").as("__g_idx"),
      col("chunk_val").as("__g_val"), col("chunk_sig").as("__g_sig"),
      col("fp").as("__g_fp"), col("rep"))
    val stars = mega.join(g,
        col("chunk_idx") <=> col("__g_idx") &&
          col("chunk_val") <=> col("__g_val") &&
          col("chunk_sig") <=> col("__g_sig") && col("fp") <=> col("__g_fp"))
      .filter(col("id") =!= col("rep"))
      // star hamming is 0 by construction (identical fps); the pigeonhole
      // guard already rides every index row's chunk_val (requireSigned),
      // so a standalone call over a too-coarse index fails loudly even
      // when it would salvage nothing
      .select(least(col("id"), col("rep")).as("a_id"),
        greatest(col("id"), col("rep")).as("b_id"),
        lit(0L).as("hamming"))
    // rep pairing only where the bucket's fingerprint diversity is
    // bounded: > maxReps distinct fps means the bucket is not boilerplate
    // but genuinely diverse — rep pairs there would re-grow the quadratic
    val pairable = groups.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n_reps"))
      .filter(col("__n_reps") <= maxReps)
      .select(keys.map(c => col(c).as(s"__ok_$c")): _*)
    val okCond = keys.map(c => col(c) <=> col(s"__ok_$c")).reduce(_ && _)
    val repPairs = pairJoin(
        groups.join(broadcast(pairable), okCond, "left_semi")
          .select(col("rep").as("id"), col("fp"), col("chunk_idx"),
            col("chunk_val"), col("chunk_sig")),
        keys)
      .select(col("a_id"), col("b_id"), col("a_fp"), col("b_fp")).distinct()
      .withColumn("hamming",
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
    stars.unionByName(repPairs).distinct()
  }

  /** The capped pigeonhole join PLUS the mega-bucket salvage tier: every
    * pair [[hammingPairs]] finds, united with [[hammingSalvageEdges]]
    * over the same chunk index — bounded tasks (the cap) without silent
    * loss (the salvage); `hamming` is a function of the pair, so the
    * distinct collapses a pair found by both tiers.
    *
    * COST SHAPE: this convenience form builds the index lazily from
    * `df`, and the capped join + salvage reference that plan from
    * several subtrees — so an expensive `hashCol` (a decode UDF chain)
    * is re-evaluated per subtree. The recall-critical production shape
    * is the one q_dedup_cap_recall ships: materialize
    * [[hammingChunkIndex]] ONCE (persisted partitioned by chunk_idx, or
    * cached for a one-shot run) and feed it to
    * [[hammingPairsFromIndex]] + [[hammingSalvageEdges]] — the decode
    * pass is paid exactly once. Use this wrapper when the fingerprint
    * column is already materialized or cheap. */
  def hammingPairsSalvaged(df: DataFrame, idCol: String, hashCol: String,
                           bits: Int, chunks: Int, maxHamming: Int,
                           maxBucket: Int, maxReps: Int): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    // the from-scratch trusted split ([[hammingPairs]]): geometry is
    // proven by the require above on the index built THIS call, so
    // neither tier re-pays the key-folded guard per row
    val index = hammingChunkIndex(df, idCol, hashCol, bits, chunks)
    hammingPairsOverTrusted(index, maxHamming, maxBucket)
      .unionByName(hammingSalvageEdgesOverTrusted(index, maxHamming,
        maxBucket, maxReps))
      .distinct()
  }

  /** The persistable hamming CHUNK INDEX of a fingerprint corpus — one
    * (id, fp, chunk_idx, chunk_val, chunk_sig) row per fingerprint per
    * chunk, i.e. exactly what [[hammingPairs]] self-joins: the
    * perceptual tier's analog of [[minhashBandIndex]]. At 100 TB this
    * frame is written to parquet partitioned by chunk_idx once, and
    * every later image/audio/video batch joins against it
    * ([[hammingIncrementalPairs]]) instead of re-decoding and
    * re-fingerprinting the corpus. `chunk_sig` is the freshness token
    * ([[AnnIndex.ivfStore]]'s recipe): it encodes (bits, chunks), and
    * the incremental mine refuses an index chunked under different
    * geometry — whose chunk_vals would simply never match, silently
    * missing every pair. */
  def hammingChunkIndex(df: DataFrame, idCol: String, hashCol: String,
                        bits: Int, chunks: Int): DataFrame = {
    require(chunks > 0 && bits % chunks == 0,
      s"bits=$bits not divisible by chunks=$chunks")
    val w = bits / chunks
    df.select(col(idCol).as("id"), col(hashCol).as("fp"))
      .withColumn("chunk_sig", lit(chunkSig(bits, chunks)))
      .select(col("id"), col("fp"), col("chunk_sig"),
      explode(expr(
        // 1L << w, not 1 << w: an Int shift wraps at 32 (chunks=1 -> w=60
        // -> 1<<60 is silently 2^28, collapsing the prefilter's key space)
        // — and a LONG shift wraps at 64 (bits=64, chunks=1 -> mask 0,
        // every fingerprint silently in ONE bucket), hence chunkMask.
        // & mask, not %: Spark's % keeps the dividend's sign, so a
        // negative fingerprint's low chunk would come out negative and
        // never match the same bits in a positive fingerprint
        s"transform(sequence(0, ${chunks - 1}), j -> " +
          s"struct(j AS chunk_idx, " +
          s"shiftrightunsigned(fp, j*$w) & ${chunkMask(w)}L AS chunk_val))"))
        .as("c"))
      .select(col("id"), col("fp"), col("c.chunk_idx"), col("c.chunk_val"),
        col("chunk_sig"))
  }

  /** The chunk-geometry token stamped by [[hammingChunkIndex]] and
    * verified by [[hammingIncrementalPairs]]. */
  private[graft] def chunkSig(bits: Int, chunks: Int): Long =
    bits.toLong * 100000L + chunks

  /** Low-`w`-bits mask, safe at w=64 where `(1L << 64) - 1` silently
    * wraps to 0 (a JVM long shift is mod 64) — the full-width chunk of a
    * chunks=1 geometry must mask to the whole fingerprint, not nothing. */
  private[graft] def chunkMask(w: Int): Long =
    if (w >= 64) -1L else (1L << w) - 1L

  /** Incremental perceptual near-dup mining: hamming ≤ `maxHamming`
    * pairs INVOLVING a new fingerprint batch — new×corpus and new×new,
    * never corpus×corpus — against a prebuilt [[hammingChunkIndex]],
    * mirroring [[minhashIncrementalPairs]] for the hamming family: a
    * daily image/audio/video ingest batch costs |batch| × bucket-mates,
    * independent of corpus size, where a full [[hammingPairs]] re-run
    * grows with the corpus square. The `maxBucket` cap population is the
    * FULL post-batch bucket (index ∪ batch), so a bucket the batch
    * pushes over the cap drops from both sides — exactly what a capped
    * from-scratch run over old+new would do (asserted in ModulesSpec).
    * Pair ids are normalized (a_id < b_id); hamming is symmetric, so the
    * distinct collapses both orientations of a new×new pair. */
  def hammingIncrementalPairs(newDf: DataFrame, corpusIndex: DataFrame,
                              idCol: String, hashCol: String,
                              bits: Int, chunks: Int, maxHamming: Int,
                              maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    // a legacy index without the token cannot be geometry-checked — and a
    // geometry mismatch is SILENT (foreign chunk_vals never match, every
    // cross pair just vanishes), so refuse loudly, the pqRefresh stance
    require(corpusIndex.columns.contains("chunk_sig"),
      "hamming index carries no chunk_sig token — rebuild it with " +
        "hammingChunkIndex before mining increments against it")
    val nb = hammingChunkIndex(newDf, idCol, hashCol, bits, chunks)
    // the geometry assert rides the load-bearing chunk_val JOIN KEY, so
    // it evaluates once per corpus row at key-hash time — an earlier
    // per-candidate-pair form went silent exactly when the mismatch
    // mattered most (foreign chunk_vals never match → zero pairs → zero
    // assert evaluations; ADVICE r9, the requireSigned fix's sibling)
    val all = corpusIndex.unionByName(nb)
      .select(col("id"), col("fp"), col("chunk_idx"),
        (col("chunk_val") +
          coalesce(assert_true(col("chunk_sig") === lit(chunkSig(bits, chunks)),
            lit(s"stale hamming index: chunk_sig does not match " +
              s"bits=$bits/chunks=$chunks — the chunk geometry changed; " +
              "rebuild the index")).cast("long"), lit(0L))).as("chunk_val"),
        col("chunk_sig"))
    // null-safe key comparisons throughout, same rationale as [[pairJoin]]
    val keys = Seq("chunk_idx", "chunk_val")
    def bound(df: DataFrame): DataFrame =
      if (maxBucket == Int.MaxValue) df
      else {
        val over = oversizedKeys(all, keys, maxBucket)
          .select(keys.map(c => col(c).as(s"__over_$c")): _*)
        df.join(broadcast(over),
          keys.map(c => col(c) <=> col(s"__over_$c")).reduce(_ && _),
          "left_anti")
      }
    val a = bound(nb)
      .select(col("id").as("a_id"), col("fp").as("a_fp"),
        col("chunk_idx"), col("chunk_val"))
      .hint("shuffle_hash")
    val b = bound(all)
      .select(col("id").as("b_id"), col("fp").as("b_fp"),
        col("chunk_idx").as("__b_chunk_idx"),
        col("chunk_val").as("__b_chunk_val"))
      .hint("shuffle_hash")
    a.join(b, col("chunk_idx") <=> col("__b_chunk_idx") &&
        col("chunk_val") <=> col("__b_chunk_val"))
      .filter(col("a_id") =!= col("b_id"))
      // hamming before the orientation swap: it is symmetric, so the
      // normalized pair carries the same distance from either side
      .withColumn("hamming",
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("hamming"))
      .distinct()
  }

  def simhashPairs(df: DataFrame, keyCol: String, textCol: String,
                   bits: Int, chunks: Int, maxHamming: Int, shingleN: Int,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    require(bits == 60, "compiled kernel is fixed at 60 bits (TextSig.simhash60)")
    // compiled one-pass kernel — see TextSig for why not HOF expressions
    val sh = df.select(col(keyCol).as("id"),
      TextSig.simhash60Udf(col(textCol), lit(shingleN)).as("sh"))
    hammingPairs(sh, "id", "sh", bits, chunks, maxHamming, maxBucket)
  }

  /** Apply a pair table to the corpus: drop the higher-keyed member of
    * every (a_id < b_id) near-dup pair via one anti-join. Single-pass
    * survivor policy (keep-lowest-key), not a transitive closure — chained
    * near-dups (a~b~c with a!~c) keep a and drop b, c, matching the greedy
    * first-seen-wins dedup of streaming ingest pipelines. */
  def dropNearDuplicates(df: DataFrame, keyCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("b_id")), col(keyCol) === col("b_id"), "left_anti")

  /** Transitive dedup clusters from a near-dup pair table: connected
    * components by iterative min-label propagation. Every id gets the
    * smallest id reachable through the pair graph as `cluster`, plus the
    * member count. The fixpoint (true connected components) is unique, so
    * results are engine- and iteration-order-independent — the DuckDB
    * oracle computes the same components via WITH RECURSIVE closure.
    *
    * Scale: each round is one shuffle join keyed by id (pair tables are
    * orders of magnitude smaller than the corpus); rounds needed = graph
    * diameter, and near-dup components are shallow (chains of boilerplate
    * variants), so this converges in a handful of rounds where a full
    * transitive closure would explode quadratically. Convergence is
    * detected by the strictly-decreasing label sum — one scalar agg per
    * round, no data to the driver. (GraphFrames' large-star/small-star is
    * the published generalization; plain min-propagation keeps it
    * dependency-free.)
    */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame,
               maxIter: Int = 25): DataFrame = {
    // eagerly localCheckpoint the pair table (r13; was cache): both union
    // branches read it, and a CACHED frame keeps its full logical plan —
    // every round's neighbor join then re-optimizes the (possibly
    // expensive, e.g. MinHash LSH) pairs subtree on the driver, the same
    // per-reference planning tax the recall trilogy measured at 5x its
    // execution cost. The checkpoint truncates the lineage to a leaf once
    // (one job, the pairs plan exactly once), the edge union stays a lazy
    // projection over the leaf (narrow, recomputed per round for less
    // than a second cache's bookkeeping), and every round plans against a
    // leaf table. Same executor-memory persistence and fault story the
    // loop's own per-round checkpoints already accept; the blocks are
    // released deterministically on every exit path (the try/finally
    // below) — the returned plan reads only the final labels checkpoint,
    // never p.
    val p = pairs.select(col("a_id"), col("b_id")).localCheckpoint(true)
    try clustersOverCheckpointedPairs(ids, idCol, p, maxIter)
    finally releaseLocalCheckpoint(p)
  }

  private def clustersOverCheckpointedPairs(ids: DataFrame, idCol: String,
                                            p: DataFrame,
                                            maxIter: Int): DataFrame = {
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(p.select(col("b_id").as("src"), col("a_id").as("dst")))
    // propagate only over the pair graph's vertex set: every id NOT in a
    // pair is its own singleton component by definition and never changes,
    // so iterating over the full corpus would shuffle (at 100 TB) billions
    // of fixed singleton rows per round for nothing — the loop runs on the
    // dup-graph vertices only (orders of magnitude smaller than the corpus)
    // and singletons rejoin once at the end
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    // an empty pair table means every id is a singleton, and the labels
    // frame (an uncheckpointed distinct over the possibly-expensive pairs
    // plan) would be re-executed by the singleton anti-join below —
    // short-circuit to the pure singleton frame instead: no join, no
    // recompute of an all-empty mine
    if (labels.isEmpty) {
      return ids.select(col(idCol).as("id"))
        .select(col("id"), col("id").as("cluster"), lit(1L).as("n_members"))
    }
    // convergence sum in decimal(38,0), not Long: labels are arbitrary
    // 63-bit ids, and a Long sum wraps mod 2^64 — a round whose total
    // label decrease lands on a multiple of 2^64 would read as a
    // fixpoint and silently return intermediate labels as components
    // (decimal 38 holds 10^18 rows of 2^63 with room to spare, and an
    // actual overflow nulls the aggregate, failing the null-safe compare
    // below into another round rather than a false fixpoint)
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("cluster")).as("nb_cluster"))
      // localCheckpoint, NOT cache: a cached frame keeps its full logical
      // plan, so round N's tree nests every earlier round and Catalyst
      // re-analyzes an exponentially growing plan each materialization —
      // measured 2-4x the whole operator's runtime in driver-side
      // optimization alone. Checkpointing truncates lineage to the
      // materialized partitions (executor-memory persisted; iterative
      // algorithms accept the weaker fault story — a lost executor means
      // restarting the loop, exactly GraphX's trade-off)
      // LAZY checkpoint + the convergence aggregate as the materializing
      // action: one job per round instead of two (eager checkpoint, then
      // sum) — the loop is job-launch-bound at test scale, and at 100 TB
      // one fewer full pass over the label table per round
      val next = labels.join(nbMin, labels("id") === nbMin("dst"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nb_cluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(false)
      // min-labels only ever decrease: an unchanged sum IS the fixpoint
      val s = next.agg(sum(col("cluster").cast("decimal(38,0)")))
        .head().getDecimal(0)
      converged = s != null && prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      // next's blocks are fully materialized by the sum action above, so
      // the previous round's checkpoint is no longer read by any future
      // job — release it now instead of waiting for driver GC (no-op on
      // round 1, whose seed labels are uncheckpointed)
      releaseLocalCheckpoint(labels)
      labels = next
      iter += 1
    }
    // the unique-fixpoint contract (and the WITH RECURSIVE oracle) is void
    // if the loop ran out of budget mid-propagation — fail loudly rather
    // than return intermediate labels as if they were components
    if (!converged)
      throw new IllegalStateException(
        s"Dedup.clusters did not reach the label fixpoint in $maxIter " +
          "iterations (component diameter exceeds maxIter) — raise maxIter")
    val sizes = labels.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
    val connected = labels.join(sizes, "cluster")
      .select(col("id"), col("cluster"), col("n_members"))
    val singletons = ids.select(col(idCol).as("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"), lit(1L).as("n_members"))
    connected.unionByName(singletons)
  }

  /** The when-guarded staged-norm cosine EVERY embedding face shares —
    * one definition, so the capped face and each salvage tier compute
    * bit-identical values and [[embeddingPairsSalvaged]]'s union
    * `.distinct()` collapses a pair found by several tiers. Zero norms
    * yield 0.0, which any positive threshold drops. */
  private def stagedCosine(aEmb: Column, bEmb: Column,
                           aNrm: Column, bNrm: Column): Column =
    when(aNrm === 0.0 || bNrm === 0.0, lit(0.0))
      .otherwise(graft.functions.vectors.dot(aEmb, bEmb) / (aNrm * bNrm))

  /** Near-duplicate pairs by embedding cosine ≥ `threshold`, compared within
    * equal `blockCol` (e.g. an LSH bucket from [[AnnIndex.withBucket]]).
    * L2 norms are staged per row, so each pair costs one dot product instead
    * of three. `maxBucket` is the same mega-bucket cap as every other pair
    * face ([[pairJoin]]): a viral embedding arriving as thousands of
    * near-identical copies lands one block key, and its quadratic carries
    * no more information than the flood's star — cap it and salvage
    * connectivity in flight via
    * [[graft.streaming.EventsStream.embedNearDupStream]]'s star tier. */
  def embeddingPairs(df: DataFrame, keyCol: String, embCol: String,
                     blockCol: String, threshold: Double,
                     maxBucket: Int = Int.MaxValue): DataFrame = {
    import graft.functions.vectors
    // NULL caller blocks never pair — [[ngramJaccardPairs]]'s SQL
    // equality-blocking semantics (a null LSH bucket from a null
    // embedding also nulls the cosine, but a caller-supplied block can
    // be null on rows with real vectors)
    val sigs = df.filter(col(blockCol).isNotNull)
      .select(col(keyCol).as("id"), col(blockCol).as("block"),
        col(embCol).as("emb"),
        vectors.l2Norm(col(embCol)).as("nrm"))
    pairJoin(sigs, Seq("block"), maxBucket)
      .withColumn("cosine", stagedCosine(col("a_emb"), col("b_emb"),
        col("a_nrm"), col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Offline SALVAGE for the EMBEDDING pair face's oversized sign-LSH
    * buckets — [[hammingSalvageEdges]]/[[minhashSalvageVerifiedPairs]]'
    * discipline on the vector modality, closing the last hole in the
    * salvage matrix (the streaming star tier recovers floods in flight;
    * this is the batch corpus path). The grouping key the other tiers
    * use (identical fingerprint / identical signature) has no
    * float-safe analog for vectors — a rescaled copy is a DIFFERENT
    * array with the same direction — and the hyperplane family behind
    * `blockCol` cannot refine itself (7 distinct planes total, see
    * [[AnnIndex.signSketchExpr]]). So the oversized bucket is re-split
    * by the positive-scale-invariant component-SIGN sketch, a second
    * independent hash family:
    *
    *  1. fine sub-buckets ≤ `maxBucket`: the full verified pair join
    *     keyed on (block, sketch) — the sketch alone does not determine
    *     the block, it is an independent family, so the pair key is
    *     always the PAIR; cross-sub-bucket pairs are the rep tier's job;
    *  2. fine sub-buckets still over `maxBucket` — a genuine
    *     same-direction flood (positive rescales share the sketch
    *     exactly) — collapse to verified STARS: each member's cosine
    *     against the sub-bucket's min-id rep, kept at ≥ `threshold`
    *     (n−1 verifications, not n(n−1)/2). Like the MinHash tier there
    *     is NO exactness theorem: a member that landed in the flood's
    *     sketch without its direction verifies below threshold and is
    *     dropped — measured, not assumed, by q_embed_cap_recall;
    *  3. verified REP PAIRS across the block's fine groups — one
    *     min-id rep per sub-bucket, pair-joined and cosine-verified,
    *     only for blocks holding ≤ `maxReps` groups (more groups = not
    *     boilerplate, the other tiers' bail) — so near-dup communities
    *     the sketch split across sub-buckets stay CONNECTED (member →
    *     own rep → other rep → member is exactly the 3-hop closure the
    *     recall queries measure).
    *
    * Emits (a_id, b_id, cosine·round4), every edge verified ≥
    * `threshold` — a SUBSET of the true pair set by construction.
    * Cost: one census + one sketch pass over oversized-bucket members
    * only, sub-bucket joins bounded by maxBucket², star verification
    * linear, rep joins bounded by maxReps². */
  def embeddingSalvageEdges(df: DataFrame, keyCol: String, embCol: String,
                            blockCol: String, threshold: Double,
                            maxBucket: Int, maxReps: Int,
                            sketchBits: Int = 16): DataFrame = {
    import graft.functions.vectors
    import org.apache.spark.sql.expressions.Window
    val sigs = df.select(col(keyCol).as("id"), col(blockCol).as("block"),
      col(embCol).cast("array<double>").as("emb"))
    // the oversized-block census stays a map-side-combined AGGREGATE +
    // semi join (tiny census, broadcast-able key list) — a window here
    // would shuffle the whole corpus with its embeddings. AFTER the
    // restriction, everything is windows over ONE exchange of the mega
    // set: hash-partitioning by block satisfies the (block, fine)
    // window's clustering too, so the fine census and the per-group
    // min-id rep ride the same shuffle with no further joins. (An
    // aggregate-then-join-back variant was A/B'd and lost ~20x at the
    // M=30 stress corpus: every tier re-derives mega, and the group
    // subplan inside each join side re-derived it AGAIN.)
    // the sibling tiers' census discipline verbatim ([[oversizedKeys]] +
    // explicit broadcast + null-safe <=>): the hint holds at real-corpus
    // stats where the estimate would otherwise shuffle the members WITH
    // their embeddings, and `=` would infer isnotnull(block) pushed
    // below a lazily-computed bucket projection — the measured
    // UDF-re-evaluation trap [[pairJoin]] documents
    val over = oversizedKeys(sigs, Seq("block"), maxBucket)
      .select(col("block").as("__over_block"))
    val wFine = Window.partitionBy(col("block"), col("fine"))
    // sketch and norm staged once per oversized-bucket member; NULL
    // embeddings drop here like the siblings' null fingerprints — a
    // null row winning a sub-bucket's min-id rep election would NULL
    // every cosine in the group and silently disconnect it
    val mega = sigs
      .join(broadcast(over), col("block") <=> col("__over_block"), "left_semi")
      .filter(col("emb").isNotNull)
      .withColumn("fine", AnnIndex.signSketchExpr("emb", sketchBits))
      .withColumn("nrm", vectors.l2Norm(col("emb")))
      .withColumn("__fn", count(lit(1)).over(wFine))
      // struct min orders by the leading id; ids are unique, so the
      // array fields never tie-break
      .withColumn("__rep",
        min(struct(col("id"), col("emb"), col("nrm"))).over(wFine))
    def verified(pairs: DataFrame): DataFrame = pairs
      .withColumn("cosine", stagedCosine(col("a_emb"), col("b_emb"),
        col("a_nrm"), col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cosine"), 4).as("cosine"))
    // (1) small sub-buckets: the full verified pair join within each
    val smallPairs = verified(pairJoin(
      mega.filter(col("__fn") <= maxBucket)
        .select(col("block"), col("fine"), col("id"), col("emb"), col("nrm")),
      Seq("block", "fine")))
    // (2) oversized sub-buckets (same-direction floods): verified stars
    val stars = mega
      .filter(col("__fn") > maxBucket && col("id") =!= col("__rep.id"))
      .withColumn("cosine", stagedCosine(col("emb"), col("__rep.emb"),
        col("nrm"), col("__rep.nrm")))
      .filter(col("cosine") >= threshold)
      // the rep is the sub-bucket's min id, so rep.id < id always
      .select(col("__rep.id").as("a_id"), col("id").as("b_id"),
        round(col("cosine"), 4).as("cosine"))
    // (3) verified rep pairs across the block's fine groups — one rep
    // per group, small groups included (their connectivity rides here),
    // bounded by maxReps groups per block; the reps frame is tiny, so
    // its block-count window costs nothing
    val repPairs = verified(pairJoin(
      mega.filter(col("id") === col("__rep.id"))
        .select(col("block"), col("id"), col("emb"), col("nrm"))
        .withColumn("__nr",
          count(lit(1)).over(Window.partitionBy(col("block"))))
        .filter(col("__nr") <= maxReps)
        .drop("__nr"),
      Seq("block")))
    smallPairs.unionByName(stars).unionByName(repPairs).distinct()
  }

  /** One-shot capped-plus-salvage for the embedding face
    * ([[minhashLshPairsSalvaged]]/[[hammingPairsSalvaged]]'s shape):
    * the capped [[embeddingPairs]] union [[embeddingSalvageEdges]],
    * deduplicated — both tiers round the verified cosine identically,
    * so a pair found by both collapses. */
  def embeddingPairsSalvaged(df: DataFrame, keyCol: String, embCol: String,
                             blockCol: String, threshold: Double,
                             maxBucket: Int, maxReps: Int,
                             sketchBits: Int = 16): DataFrame =
    embeddingPairs(df, keyCol, embCol, blockCol, threshold, maxBucket)
      .unionByName(embeddingSalvageEdges(df, keyCol, embCol, blockCol,
        threshold, maxBucket, maxReps, sketchBits))
      .distinct()

  /** The persistable sign-bucket store of an embedding corpus — (id,
    * emb, nrm, bucket, emb_sig): the vector modality's analog of
    * [[minhashBandIndex]]/[[hammingChunkIndex]], completing the
    * persisted-index matrix. Buckets come from the WIDE prime-modulus
    * plane family ([[AnnIndex.wideBucketExpr]]), NOT the legacy
    * coefficients: the legacy family holds at most 7 distinct
    * hyperplanes (q_ann_plane_family's census — a 128-bucket
    * selectivity ceiling), so at corpus scale every legacy block is a
    * guaranteed mega-bucket and all pair work lands on cap+salvage; the
    * wide family gives 2^planes genuine selectivity, so a persisted
    * store can be bucketed finely enough that blocks stay small. L2
    * norms are staged per row at BUILD time, so every later increment
    * pays exactly one dot product per candidate pair. `emb_sig` is the
    * freshness token ([[hammingChunkIndex]]'s `chunk_sig` recipe,
    * tagged with the family's prime 2003): a store bucketed under
    * different (dim, planes) — or under the legacy family — joins
    * cleanly and silently yields zero cross pairs, so
    * [[embeddingIncrementalPairs]] refuses it loudly instead. At 100 TB
    * write this partitioned by `bucket` and every ingest batch joins
    * against it rather than re-bucketing the corpus. */
  def embeddingBucketIndex(df: DataFrame, keyCol: String, embCol: String,
                           dim: Int, planes: Int): DataFrame =
    df.select(col(keyCol).as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("nrm", graft.functions.vectors.l2Norm(col("emb")))
      .withColumn("bucket", AnnIndex.wideBucketExpr("emb", dim, planes))
      .withColumn("emb_sig", lit(embSig(dim, planes)))

  /** The bucket-geometry token stamped by [[embeddingBucketIndex]] and
    * verified by [[embeddingIncrementalPairs]] and the serving path
    * ([[AnnIndex.annTopKWideIndexed]]) — one definition
    * ([[AnnIndex.wideStoreSig]]), so builder and every consumer can
    * never disagree on the encoding. */
  private def embSig(dim: Int, planes: Int): Long =
    AnnIndex.wideStoreSig(dim, planes)

  /** Incremental embedding near-dup mining: cosine ≥ `threshold` pairs
    * INVOLVING a new vector batch — new×corpus and new×new, never
    * corpus×corpus — against a prebuilt [[embeddingBucketIndex]],
    * completing the incremental matrix ([[minhashIncrementalPairs]] for
    * text bands, [[hammingIncrementalPairs]] for fingerprint chunks,
    * now the vector face): a daily embedding ingest costs
    * |batch| × bucket-mates, independent of corpus size, where a full
    * [[embeddingPairs]] re-run grows with the corpus square. The
    * `maxBucket` cap population is the FULL post-batch bucket
    * (index ∪ batch), so a bucket the batch pushes over the cap drops
    * from both sides — exactly what a capped from-scratch run over
    * old+new would do (asserted in ModulesSpec). The geometry assert
    * rides the load-bearing `bucket` join key, evaluated once per
    * corpus row at key-hash time — a mismatched store (different
    * planes, or a legacy-family bucketing) would otherwise just never
    * match and silently miss every cross pair. Null embeddings carry
    * null buckets, pair only with each other under the null-safe key,
    * and their null cosine never clears a positive threshold — the
    * [[embeddingPairs]] discipline. Pair ids are normalized
    * (a_id < b_id); cosine is symmetric, so the distinct collapses
    * both orientations of a new×new pair.
    *
    * Cap-dropped increments are NOT lost forever: like its minhash and
    * hamming siblings, the incremental mine applies the cap only (the
    * flat per-batch cost bound is the whole point); a batch row landing
    * in a mega-bucket recovers its connectivity from the PERIODIC
    * offline salvage sweep over the full store
    * ([[embeddingSalvageEdges]] — run on the audit cadence, not per
    * batch) or, in flight, from the streaming star tier. Capped
    * increments per batch + salvage on a slow cadence is the documented
    * continuous-ingest architecture (SCALE.md item 3b). */
  def embeddingIncrementalPairs(newDf: DataFrame, corpusIndex: DataFrame,
                                keyCol: String, embCol: String,
                                dim: Int, planes: Int, threshold: Double,
                                maxBucket: Int = Int.MaxValue): DataFrame = {
    require(corpusIndex.columns.contains("emb_sig"),
      "embedding bucket index carries no emb_sig token — rebuild it with " +
        "embeddingBucketIndex before mining increments against it")
    val nb = embeddingBucketIndex(newDf, keyCol, embCol, dim, planes)
    val all = corpusIndex.unionByName(nb)
      .select(col("id"), col("emb"), col("nrm"),
        (col("bucket") +
          coalesce(assert_true(col("emb_sig") === lit(embSig(dim, planes)),
            lit(s"stale embedding bucket index: emb_sig does not match the " +
              s"wide plane family at dim=$dim/planes=$planes — the bucket " +
              "geometry changed; rebuild the index")).cast("long"),
            lit(0L))).as("bucket"))
    // null-safe key comparisons throughout, same rationale as [[pairJoin]]
    def bound(df: DataFrame): DataFrame =
      if (maxBucket == Int.MaxValue) df
      else {
        val over = oversizedKeys(all, Seq("bucket"), maxBucket)
          .select(col("bucket").as("__over_bucket"))
        df.join(broadcast(over), col("bucket") <=> col("__over_bucket"),
          "left_anti")
      }
    val a = bound(nb.select(col("id"), col("emb"), col("nrm"), col("bucket")))
      .select(col("id").as("a_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"), col("bucket"))
      .hint("shuffle_hash")
    val b = bound(all)
      .select(col("id").as("b_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"), col("bucket").as("__b_bucket"))
      .hint("shuffle_hash")
    a.join(b, col("bucket") <=> col("__b_bucket"))
      .filter(col("a_id") =!= col("b_id"))
      // cosine before the orientation swap: symmetric, so the normalized
      // pair carries the same value from either side
      .withColumn("cosine", stagedCosine(col("a_emb"), col("b_emb"),
        col("a_nrm"), col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        round(col("cosine"), 4).as("cosine"))
      .distinct()
  }

  /** Incremental EMBEDDING index maintenance — [[AnnIndex.ivfRefresh]]'s
    * stance on the wide-bucket store: bucket ONLY the new batch at the
    * store's geometry and APPEND it to the persisted
    * [[embeddingBucketIndex]] layout (partitioned by `bucket`); the
    * existing buckets are never rescanned or rewritten. Refuses loudly —
    * BEFORE writing a row — a store with no `emb_sig` token, with a
    * token from another (dim, planes) geometry or the legacy family, or
    * with NULL-token rows (min/max skip nulls, so a careless union of
    * stamped and raw rows would otherwise pass); an append under the
    * wrong geometry would put every batch row in a foreign bucket space
    * where it silently pairs with and serves nothing. An EMPTY store is
    * refused too: rebuild it with [[embeddingBucketIndex]] rather than
    * growing a store whose geometry nothing witnesses. The accumulating
    * one-file-per-batch-per-task small files are the audit-cadence job
    * of [[graft.sources.Maintenance.compactPartitionedTo]]. */
  def embeddingIndexRefresh(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, newBatch: DataFrame,
                            keyCol: String, embCol: String,
                            dim: Int, planes: Int): Unit = {
    refreshStore(spark, storeDir, "emb_sig", embSig(dim, planes),
      "embeddingIndexRefresh",
      staleDesc = "wide-family store — emb_sig does not match " +
        s"dim=$dim/planes=$planes",
      embeddingBucketIndex(newBatch, keyCol, embCol, dim, planes), "bucket")
  }

  /** The shared maintenance-time token gate + append behind every store
    * refresh ([[embeddingIndexRefresh]], [[hammingIndexRefresh]],
    * [[minhashIndexRefresh]]) — the gate itself is
    * [[AnnIndex.requireStoreSig]], the SAME body the serving faces run,
    * so a new check lands in one place for all five consumers; this
    * wrapper only adds the refuse-empty stance (rebuild, don't grow an
    * unwitnessed geometry) and the append. Refusal happens BEFORE a row
    * is written. */
  private def refreshStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, sigCol: String, sig: Long,
                           what: String, staleDesc: String,
                           newRows: DataFrame, partitionCol: String): Unit = {
    val store = spark.read.parquet(storeDir)
    // a LEDGERED (streaming) store is refused before the token check —
    // a batch append without the ledger level corrupts its layout
    AnnIndex.requireBatchStore(store, s"$what($storeDir)")
    AnnIndex.requireStoreSig(store, sigCol, sig,
      allowEmpty = false, what = s"$what($storeDir)", staleDesc = staleDesc)
    newRows.write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(partitionCol).parquet(storeDir)
  }

  /** Incremental HAMMING index maintenance — [[embeddingIndexRefresh]]'s
    * twin for the [[hammingChunkIndex]] store (written partitioned by
    * `chunk_idx`): chunk ONLY the new fingerprint batch at the store's
    * geometry and APPEND it; the existing chunks are never rescanned or
    * rewritten, and because chunking is a pure per-row function of
    * (fingerprint, bits, chunks), append-then-mine equals a from-scratch
    * rebuild exactly (ModulesSpec). Completes the refresh matrix: every
    * persisted blocking index now has a token-gated append
    * (ivf/pq/int8 in [[AnnIndex]]/[[Quantize]], embedding buckets,
    * hamming chunks, minhash bands). */
  def hammingIndexRefresh(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String, newBatch: DataFrame,
                          idCol: String, hashCol: String,
                          bits: Int, chunks: Int): Unit =
    refreshStore(spark, storeDir, "chunk_sig", chunkSig(bits, chunks),
      "hammingIndexRefresh",
      staleDesc = s"hamming chunk index — chunk_sig does not match " +
        s"bits=$bits/chunks=$chunks",
      hammingChunkIndex(newBatch, idCol, hashCol, bits, chunks), "chunk_idx")

  /** Incremental MINHASH BAND index maintenance — the text face's
    * token-gated append onto a persisted [[minhashBandIndex]] (written
    * partitioned by `band_idx`): only the new document batch is
    * shingled/signatured/banded. */
  def minhashIndexRefresh(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String, newDocs: DataFrame,
                          keyCol: String, textCol: String,
                          k: Int, bands: Int, shingleN: Int): Unit =
    refreshStore(spark, storeDir, "band_sig", bandSig(k, bands, shingleN),
      "minhashIndexRefresh",
      staleDesc = s"minhash band index — band_sig does not match " +
        s"k=$k/bands=$bands/shingleN=$shingleN",
      minhashBandIndex(newDocs, keyCol, textCol, k, bands, shingleN),
      "band_idx")

  /** Seed a STREAMING embedding store: the [[embeddingBucketIndex]]
    * layout plus one extra leading partition level — `ingest_batch`, the
    * replay ledger [[embedStoreIngestBatch]] keys its idempotent
    * micro-batch overwrites by. The seed generation lands under
    * `ingest_batch=-1` (Structured Streaming's batch ids start at 0, so
    * -1 can never collide with a live micro-batch). A canonical
    * bucket-only store CANNOT be streamed into — it has no ledger, so a
    * replayed micro-batch would silently double its rows — which is why
    * the streaming writer refuses it and this seeder exists. */
  def seedEmbedIngestStore(corpus: DataFrame, storeDir: String,
                           keyCol: String, embCol: String,
                           dim: Int, planes: Int): Unit =
    embeddingBucketIndex(corpus, keyCol, embCol, dim, planes)
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch", "bucket").parquet(storeDir)

  /** [[seedEmbedIngestStore]] for the hamming face: the
    * [[hammingChunkIndex]] layout under an `ingest_batch=-1` ledger
    * partition, ready for [[hammingStoreIngestBatch]] micro-batches. */
  def seedHammingIngestStore(corpus: DataFrame, storeDir: String,
                             idCol: String, hashCol: String,
                             bits: Int, chunks: Int): Unit =
    hammingChunkIndex(corpus, idCol, hashCol, bits, chunks)
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch", "chunk_idx").parquet(storeDir)

  /** One REPLAY-IDEMPOTENT micro-batch against a streaming embedding
    * store: token gate → incremental mine → two deterministic partition
    * overwrites. The batch-cadence [[embeddingIndexRefresh]] APPENDS,
    * which is correct under a driver that runs each batch exactly once —
    * but a streaming engine REPLAYS the last uncommitted micro-batch
    * after a crash, and a replayed append would silently double every
    * row it had already written and double-mine its pairs: the
    * silent-duplicate class exactly-once exists to refuse. So the
    * streaming store carries one extra leading partition level —
    * `ingest_batch`, Structured Streaming's monotonic batch id, the
    * ledger — and each micro-batch lands as a DYNAMIC partition
    * overwrite of its own (ingest_batch, bucket) partitions: the index
    * rows are a pure function of the batch, so a replay rewrites
    * byte-identical partitions instead of appending duplicates.
    *
    * Replay-exactness of the MINE: the corpus is the store MINUS this
    * batch's own ledger partition (one partition filter, pruned at
    * planning), so a replay whose first attempt died between the two
    * writes mines against exactly the pre-batch corpus the first attempt
    * saw — the half-written partition is invisible. Order matters twice:
    * the mine is MATERIALIZED (localCheckpoint) and its slice written
    * before the store append (a lazy mine evaluated after the append
    * would see the batch already inside the corpus and silently mine the
    * batch against itself — the [[ingestLifecycleSmoke]] localCheckpoint
    * trap); and the token gate runs over the pre-batch corpus BEFORE
    * either write (the [[refreshStore]] stance: refuse a
    * stale/raw/empty store before a row lands).
    *
    * Serving and graduation: the ledger column rides every read of the
    * streaming store, so point-query faces drop it
    * (`store.drop("ingest_batch")`); the audit-cadence graduation into
    * the canonical bucket-only layout is
    * [[graft.sources.Maintenance.compactPartitionedTo]] with
    * `dropCols = Seq("ingest_batch")` — run it against a STOPPED (or
    * fully committed) stream: folding an uncommitted batch's partition
    * into a canonical store and then replaying that batch elsewhere is
    * the duplicate the ledger exists to prevent. */
  def embedStoreIngestBatch(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, pairsDir: String,
                            batchId: Long, batch: DataFrame,
                            keyCol: String, embCol: String,
                            dim: Int, planes: Int, threshold: Double,
                            maxBucket: Int = Int.MaxValue): Unit = {
    // stage the micro-batch ONCE: the mine and the store write are two
    // separate jobs, and each would otherwise re-pull the batch from the
    // streaming source (expensive on wide/remote micro-batches, and a
    // replay hazard if the source re-read were ever non-deterministic)
    val staged = batch.localCheckpoint()
    storeIngestBatch(spark, storeDir, batchId,
      "emb_sig", embSig(dim, planes), "embedStoreIngestBatch",
      staleDesc = "wide-family store — emb_sig does not match " +
        s"dim=$dim/planes=$planes",
      embeddingBucketIndex(staged, keyCol, embCol, dim, planes),
      Some((pairsDir, corpus => embeddingIncrementalPairs(staged, corpus,
        keyCol, embCol, dim, planes, threshold, maxBucket))),
      Seq("bucket"))
  }

  /** [[embedStoreIngestBatch]] on the HAMMING face: one replay-idempotent
    * micro-batch of fingerprints against a [[seedHammingIngestStore]]
    * store — same ledger, same write order, same token gate, with
    * [[hammingIncrementalPairs]] as the mine. */
  def hammingStoreIngestBatch(spark: org.apache.spark.sql.SparkSession,
                              storeDir: String, pairsDir: String,
                              batchId: Long, batch: DataFrame,
                              idCol: String, hashCol: String,
                              bits: Int, chunks: Int, maxHamming: Int,
                              maxBucket: Int = Int.MaxValue): Unit = {
    val staged = batch.localCheckpoint() // one source read per micro-batch
    storeIngestBatch(spark, storeDir, batchId,
      "chunk_sig", chunkSig(bits, chunks), "hammingStoreIngestBatch",
      staleDesc = "hamming chunk index — chunk_sig does not match " +
        s"bits=$bits/chunks=$chunks",
      hammingChunkIndex(staged, idCol, hashCol, bits, chunks),
      Some((pairsDir, corpus => hammingIncrementalPairs(staged, corpus,
        idCol, hashCol, bits, chunks, maxHamming, maxBucket))),
      Seq("chunk_idx"))
  }

  /** [[seedEmbedIngestStore]] for the minhash face: the
    * [[minhashBandIndex]] layout under an `ingest_batch=-1` ledger
    * partition, ready for [[minhashStoreIngestBatch]] micro-batches. */
  def seedMinhashIngestStore(corpus: DataFrame, storeDir: String,
                             keyCol: String, textCol: String,
                             k: Int, bands: Int, shingleN: Int): Unit =
    minhashBandIndex(corpus, keyCol, textCol, k, bands, shingleN)
      .withColumn("ingest_batch", lit(-1L))
      .write.partitionBy("ingest_batch", "band_idx").parquet(storeDir)

  /** [[embedStoreIngestBatch]] on the MINHASH face: one replay-idempotent
    * micro-batch of documents against a [[seedMinhashIngestStore]] store —
    * same ledger, same write order, same token gate, with
    * [[minhashIncrementalPairs]] as the mine (CANDIDATE pairs, like the
    * batch cadence: verification/salvage stay on their own cadences). */
  def minhashStoreIngestBatch(spark: org.apache.spark.sql.SparkSession,
                              storeDir: String, pairsDir: String,
                              batchId: Long, batch: DataFrame,
                              keyCol: String, textCol: String,
                              k: Int, bands: Int, shingleN: Int,
                              maxBucket: Int = Int.MaxValue): Unit = {
    val staged = batch.localCheckpoint() // one source read per micro-batch
    storeIngestBatch(spark, storeDir, batchId,
      "band_sig", bandSig(k, bands, shingleN), "minhashStoreIngestBatch",
      staleDesc = "minhash band index — band_sig does not match " +
        s"k=$k/bands=$bands/shingleN=$shingleN",
      minhashBandIndex(staged, keyCol, textCol, k, bands, shingleN),
      Some((pairsDir, corpus => minhashIncrementalPairs(staged, corpus,
        keyCol, textCol, k, bands, shingleN, maxBucket))),
      Seq("band_idx"))
  }

  /** The shared replay-idempotent micro-batch body behind the streaming
    * store writers ([[embedStoreIngestBatch]],
    * [[hammingStoreIngestBatch]], [[minhashStoreIngestBatch]]) — one
    * body, like [[refreshStore]] for
    * the batch cadence, so the ledger discipline can never drift face by
    * face — and shared with the APPEND-ONLY serving-store faces
    * ([[AnnIndex.ivfStoreIngestBatch]], [[Quantize.pqStoreIngestBatch]]),
    * which pass `pairsMine = None` (nothing to mine — the store IS the
    * product). `indexRows` are the batch's pre-stamped index rows (no
    * ledger column — it is stamped here, once); `pairsMine`'s function
    * receives the pre-batch corpus at the canonical store schema and
    * returns the pairs frame. The store write goes through
    * `partitionOverwriteMode=dynamic`: mode Overwrite then replaces ONLY
    * the partitions this batch writes — its own ledger slice — never the
    * seed or sibling batches (pinned in ModulesSpec: a second batch
    * leaves the first and the seed intact). The pairs slice is a plain
    * whole-slice overwrite at its explicit `ingest_batch=<id>` path
    * (same idempotency — rows are a pure function of the batch), with an
    * EMPTY mine still landing one schema-bearing zero-row file so
    * `pairsDir` is readable from the first micro-batch on (an all-zero
    * dynamic overwrite commits no files, and a consumer's
    * `read.parquet(pairsDir)` would fail schema inference on the
    * common cold-start case of early batches with no near-dups).
    *
    * Cost stance: the gate runs TWO maintenance-time aggregates per
    * micro-batch — the max-ledger pass (partition-column only: directory
    * values, no data columns) and the shared [[AnnIndex.requireStoreSig]]
    * stats pass (one long column). Folding them into one hand-rolled
    * aggregate would fork the ONE shared gate body the token discipline
    * rests on; the stress pair (SCALE.md stream_ingest_batch vs
    * refresh_ingest_batch, which pays only the sig pass) measures the
    * difference as inside host noise. */
  /** Order-free content fingerprint of a ledger slice — count plus
    * bit_xor(xxhash64(all columns)) — used by the replay/collision
    * check of [[storeIngestBatch]] AND the serve sink
    * ([[graft.streaming.EventsStream.serveSinkBatch]]). ONE body, the
    * [[AnnIndex.requireStoreSig]] stance: a change to the fingerprint
    * rule (null handling, column quoting) must land in both ledgers at
    * once, or the store and sink disciplines silently drift apart. */
  private[graft] def ledgerContentFp(df: DataFrame): (Long, Long, String) = {
    val fields = df.schema.fields
    val hashes = s"xxhash64(${fields.map(f => s"`${f.name}`").mkString(", ")})"
    // count + bit_xor + SUM of the row hashes: xor alone cancels rows
    // with even multiplicity (a batch carrying one doc twice xors its
    // row hash to 0, so two DIFFERENT duplicated batches could collide
    // and let a renumbered restart overwrite a committed slice). The sum
    // is multiplicity-linear; decimal(38,0), not long, because ANSI
    // long-sum overflows loudly on full-range hashes, and compared as a
    // plain string since decimal scale survives the round trip as 0.
    val r = df.agg(count(lit(1)),
      coalesce(expr(s"bit_xor($hashes)"), lit(0L)),
      sum(expr(hashes).cast("decimal(38,0)"))).head()
    // a null sum is EMPTY (count 0) or OVERFLOW (~1e19 rows of
    // full-range hashes — theoretical, but an overflowed sum coalesced
    // to 0 would compare equal to a genuine zero sum and to every OTHER
    // overflowed slice, silently collapsing the sum component of the
    // fingerprint); the overflow marker keeps it unequal to any finite
    // sum, and count + bit_xor still discriminate among overflowed pairs
    val sumStr =
      if (r.isNullAt(2)) { if (r.getLong(0) == 0L) "0" else "overflow" }
      else r.getDecimal(2).stripTrailingZeros.toPlainString
    (r.getLong(0), r.getLong(1), sumStr)
  }

  /** Align a stored slice's columns to the incoming frame's schema for
    * the fingerprint compare: cast only genuinely different catalog
    * types (the partition column reads back as int where the builder
    * stamps long) — a nullability-only difference (array<double>
    * round-tripped through parquet) is the same catalog type, and Spark
    * refuses the nullable->non-null cast. Shared with the serve sink,
    * like [[ledgerContentFp]]. */
  private[graft] def ledgerAlignTo(df: DataFrame,
      fields: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(fields.map { f =>
      if (types(f.name).catalogString == f.dataType.catalogString)
        col(f.name)
      else col(f.name).cast(f.dataType)
    }: _*)
  }

  private[operators] def storeIngestBatch(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String, batchId: Long, sigCol: String, sig: Long,
      what: String, staleDesc: String, indexRows: DataFrame,
      pairsMine: Option[(String, DataFrame => DataFrame)],
      partitionCols: Seq[String]): Unit = {
    val store = spark.read.parquet(storeDir)
    require(store.columns.contains("ingest_batch"),
      s"$what($storeDir): store carries no ingest_batch ledger column — " +
        "this is a canonical batch store, and a blind append would " +
        "silently double its rows on micro-batch replay; seed a " +
        "streaming store (seed*IngestStore) or use the batch-cadence " +
        "refresh instead")
    // the ledger must be MONOTONIC: Structured Streaming's batch ids only
    // ever replay the LAST uncommitted batch (batchId == max) or advance
    // past it (batchId > max) — a batchId BELOW the store's high-water
    // mark means the query was restarted with a FRESH checkpoint, whose
    // renumbered batch 0 would dynamic-overwrite the old batch-0 ledger
    // slice with DIFFERENT rows: silent data loss, refused loudly instead
    // (recover by graduating the store and re-seeding, or by restoring
    // the original checkpoint). The aggregate touches only the partition
    // column — directory values, no data-file column reads.
    // coalesce: an EMPTY store aggregates max to NULL — let it pass here
    // so requireStoreSig below refuses it with the rebuild message
    val maxLedger = store
      .agg(coalesce(max(col("ingest_batch").cast("long")),
        lit(Long.MinValue)))
      .head().getLong(0)
    require(batchId >= maxLedger,
      s"$what($storeDir): ledger regression — micro-batch $batchId is " +
        s"below the store's high-water mark $maxLedger; the stream was " +
        "restarted with a fresh checkpoint and its renumbered batches " +
        "would silently overwrite committed ledger slices. Graduate the " +
        "store and re-seed (or restore the original checkpoint)")
    val corpus = store
      .filter(col("ingest_batch") =!= lit(batchId))
      .select(indexRows.columns.toIndexedSeq.map(col): _*)
    AnnIndex.requireStoreSig(corpus, sigCol, sig, allowEmpty = false,
      what = s"$what($storeDir)", staleDesc = staleDesc)
    // batchId == max passes the monotonic guard above because a
    // legitimate engine replay re-runs the LAST batch — but a FRESH
    // checkpoint whose renumbered batch 0 lands exactly on a
    // one-batch-old store's high-water mark would slip through as a fake
    // "replay" and overwrite the committed slice with foreign rows. The
    // commit MARKER (written after a slice lands, below) distinguishes
    // them: if this id is already marker-committed, a true replay
    // carries byte-identical rows (the index rows are a pure function of
    // the checkpoint-defined batch), so an order-free content
    // fingerprint of incoming-vs-stored must match — a mismatch is the
    // renumbered-restart data-loss case, refused before a row moves. A
    // MISSING marker means the first attempt died between the writes and
    // its marker — the stored slice may be partial, the replay overwrites
    // it whole, and no check is possible or needed. The fingerprint
    // costs one scan of the batch + one partition-pruned scan of the one
    // slice, paid ONLY on the rare replay/collision path, never on
    // normal progress (batchId == max + 1).
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(
      s"$storeDir/_ledger_commit_$batchId")
    val fs = marker.getFileSystem(hadoopConf)
    if (batchId == maxLedger && fs.exists(marker)) {
      val fields = indexRows.schema.fields.toIndexedSeq
      val slice = ledgerAlignTo(
        store.filter(col("ingest_batch") === lit(batchId)), fields)
      val incoming = ledgerContentFp(
        indexRows.select(fields.map(f => col(f.name)): _*))
      require(incoming == ledgerContentFp(slice),
        s"$what($storeDir): ledger collision — micro-batch $batchId is " +
          "already committed with DIFFERENT contents; the stream was " +
          "restarted with a fresh checkpoint and its renumbered batch " +
          "would silently overwrite the committed slice. Graduate the " +
          "store and re-seed (or restore the original checkpoint)")
    }
    def ledgered(rows: DataFrame, dir: String, pcols: Seq[String]): Unit =
      rows.withColumn("ingest_batch", lit(batchId))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(("ingest_batch" +: pcols): _*).parquet(dir)
    pairsMine.foreach { case (pairsDir, mine) =>
      // materialized BEFORE the store append (the write below would
      // otherwise re-evaluate the lazy mine against a corpus that
      // already contains the batch); isEmpty is then free, and an empty
      // mine is forced through one task so the slice carries a
      // schema-bearing file
      val pairs = mine(corpus).localCheckpoint()
      (if (pairs.isEmpty) pairs.repartition(1) else pairs)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$pairsDir/ingest_batch=$batchId")
    }
    ledgered(indexRows, storeDir, partitionCols)
    fs.create(marker, true).close()
  }

  /** Incremental connected components: fold a NEW batch of pairs (e.g.
    * from [[minhashIncrementalPairs]]) into an EXISTING labeling without
    * re-propagating over the old pair graph. Each old cluster collapses to
    * a star — one (member, label) edge per member — which preserves its
    * connectivity exactly; propagation then runs over stars + new pairs, a
    * graph whose size is |old labels| + |new pairs|, independent of how
    * many old PAIRS built those labels. Because [[clusters]]' fixpoint
    * labels every component with its MIN member id, the star center is
    * itself a member, and the incremental fixpoint equals the from-scratch
    * run over (old ∪ new) pairs — asserted in ModulesSpec.
    *
    * `ids` must cover every id that should appear in the output (old
    * members + the new batch's vertices); like [[clusters]], ids in no
    * pair come back as singletons.
    */
  def clustersIncremental(ids: DataFrame, idCol: String,
                          oldLabels: DataFrame,
                          newPairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val stars = oldLabels.filter(col("id") =!= col("cluster"))
      .select(col("id").as("a_id"), col("cluster").as("b_id"))
    clusters(ids, idCol,
      stars.unionByName(newPairs.select(col("a_id"), col("b_id"))), maxIter)
  }
}

package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled signature kernels for the dedup hot path.
  *
  * These compute EXACTLY the same values as the [[text]] SQL fragments (the
  * DuckDB oracle keeps using those): identical polynomial char hashes mod
  * P = 1e9+7, identical MinHash permutations, identical SimHash bit
  * balances. All integer arithmetic, so a JVM loop and a SQL engine agree
  * bit-for-bit; MinHash's min and SimHash's sum are commutative over the
  * distinct-shingle SET, so element order never matters.
  *
  * Why UDFs when the guidance is "functions, not UDFs": Catalyst
  * higher-order-function lambdas (transform/aggregate) are INTERPRETED —
  * one NamedLambdaVariable binding per element per evaluation — and
  * CollapseProject re-inlines staged projections, so a 60-bit SimHash over
  * ~80 shingles re-tokenized the document per bit: 600+ s for 10k docs at
  * sf0.1. This compiled kernel does the same work in one pass per row
  * (< 1 s). A custom codegen Expression would also work; a deterministic
  * scala UDF is the simpler tool with the same plan shape (one projection,
  * still narrow, still partition-parallel — at 100 TB this scales linearly
  * exactly like any codegen'd projection).
  */
object TextSig {

  val P = 1000000007L
  val Mix1 = 2654435761L
  val Mix2 = 2246822519L

  /** whitespace tokens of lower(text), empties dropped — mirrors
    * [[text.tokens]] (split on \s+, ASCII corpus) */
  def tokens(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** polynomial char hash, mirrors [[text.tokenHash]] */
  def tokenHash(tok: String): Long = {
    var acc = 0L
    var i = 0
    while (i < tok.length) { acc = (acc * 31 + tok.charAt(i).toLong) % P; i += 1 }
    acc
  }

  /** distinct word n-gram shingle hashes, mirrors [[text.shingleHashes]]
    * (incl. the single partial shingle for docs shorter than n tokens) */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = tokens(s)
    val count = math.max(toks.length - (n - 1), 1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      val sh = toks.slice(i, i + n).mkString(" ")
      out.add(tokenHash(sh))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }

  /** polynomial hash of the first-`n`-token prefix joined by ' ' — the
    * containment-dedup block key (truncation preserves the prefix, so a
    * doc and its truncated copy share the block). Mirrors the dialect
    * fragment `tokenHash(arrayJoin(slice(tokens(col), 1, n), ' '))`;
    * parity asserted in ModulesSpec. */
  def prefixHash(s: String, n: Int): Long =
    tokenHash(tokens(s).take(n).mkString(" "))

  /** ORDERED, non-distinct n-gram hashes — one per gram position, EMPTY for
    * docs shorter than n tokens (no partial shingle: a positional consumer
    * like q_substring_dedup's span merge needs gram i to cover tokens
    * [i, i+n-1] exactly, which a clamped partial gram would break). Mirrors
    * the dialect fragment `transform(seq(1, size-n+1), i -> tokenHash(...))`
    * guarded by `size >= n` — parity asserted in ModulesSpec. */
  def gramHashSeq(s: String, n: Int): Array[Long] = {
    val toks = tokens(s)
    if (toks.length < n) Array.emptyLongArray
    else {
      val out = new Array[Long](toks.length - (n - 1))
      var i = 0
      while (i < out.length) {
        out(i) = tokenHash(toks.slice(i, i + n).mkString(" "))
        i += 1
      }
      out
    }
  }

  /** Unordered within-window co-occurrence pairs, mirrors
    * [[text.pairGrams]] (w pairs per position, non-distinct, EMPTY below
    * 2 tokens — the fragment's size >= 2 guard). String min/max is Java
    * compareTo = UTF-16 code units, equal to both engines' binary UTF-8
    * order on this BMP corpus (same assumption [[tokens]] documents). */
  def pairGrams(s: String, w: Int): Array[String] = {
    val toks = tokens(s)
    if (toks.length < 2) Array.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length - 1) {
        var j = i + 1
        val jEnd = math.min(i + w, toks.length - 1)
        while (j <= jEnd) {
          val a = toks(i); val b = toks(j)
          out += (if (a <= b) s"$a $b" else s"$b $a")
          j += 1
        }
        i += 1
      }
      out.toArray
    }
  }

  /** BPE encode of one word under a ranked merge table, mirrors
    * [[text.bpeApply]] over [[text.bpeMergeOnce]] exactly: each merge pass
    * is greedy leftmost, a token merged in a pass never re-merges within
    * it, passes compose in rank order. Kernel exists because the 4-level
    * nested foldArr is interpreted per element (measured: q_bpe_encode
    * 5.9 s -> sub-second at sf0.1); the SQL fragment remains the oracle
    * and parity is asserted in ModulesSpec. */
  def bpeEncodeWord(w: String, merges: Seq[(String, String)]): Array[String] = {
    var cur: Array[String] = w.map(_.toString).toArray
    merges.foreach { case (a, b) =>
      cur = bpeMergePass(scala.collection.immutable.ArraySeq.unsafeWrapArray(cur), a, b)
    }
    cur
  }

  /** ONE greedy-leftmost merge pass over an existing segmentation, the
    * (a, b) pair as ARGUMENTS: [[bpeEncodeWord]] fixes its table at
    * closure-build time, but the TRAINER discovers each iteration's best
    * pair as data (a broadcast 1-row frame), so the pass must take it per
    * row. Mirrors [[text.bpeMergeOnceExpr]]; parity in ModulesSpec. */
  def bpeMergePass(seg: Seq[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < seg.length) {
      if (out.nonEmpty && out.last == a && seg(i) == b)
        out(out.length - 1) = a + b
      else out += seg(i)
      i += 1
    }
    out.toArray
  }

  /** WordPiece greedy longest-match segmentation of one word against a
    * SORTED vocab array (sort_array order, i.e. UTF8 string order — the
    * binary search's contract): from position 0, repeatedly take the
    * longest 1..`maxPiece`-char vocab piece that matches; stop (emitting
    * nothing further) at a position with no match. Mirrors q_wordpiece's
    * relational best-piece + frontier-walk formulation value-for-value —
    * the DuckDB oracle keeps the recursive-CTE form, so kernel drift
    * breaks the oracle hash. One pass per row replaces a candidate
    * explode + vocab join + (w,pos) aggregate + MaxWordLen−1 chained
    * frontier joins (~14 sequential exchanges; the bpeEncodeWord /
    * cdcChunkFps lesson applied to the tokenizer family). */
  def wordpiecePieces(w: String, vocab: Array[String],
                      maxPiece: Int): Array[String] = {
    val vs = vocab.asInstanceOf[Array[AnyRef]]
    val n = w.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    var stuck = false
    while (pos < n && !stuck) {
      var L = math.min(maxPiece, n - pos)
      var found = 0
      while (L >= 1 && found == 0) {
        if (java.util.Arrays.binarySearch(vs, w.substring(pos, pos + L)) >= 0)
          found = L
        L -= 1
      }
      if (found == 0) stuck = true
      else { out += w.substring(pos, pos + found); pos += found }
    }
    out.toArray
  }

  /** Unigram-LM Viterbi segmentation of one word: pieces are 1..`maxPiece`
    * chars, scored by the x1e6-quantized log-probs `lps` aligned with the
    * SORTED vocab `ps` (sort_array order); suffix-best DP in exact Long
    * arithmetic, per-position argmax tie-break (score DESC, then piece
    * length DESC — two same-length candidates at one position are the
    * same substring, so the relational form's final `p` tie-break is
    * vacuous), then the frontier walk from position 0 emits the chosen
    * path's pieces in order. Value-for-value the q_unigram_tokenizer
    * relational Bellman unroll + argmax window + frontier reach (the
    * DuckDB oracle keeps that form — drift breaks the hash); one pass
    * per row replaces ~24 sequential exchanges per segmentation pass.
    * A position whose every candidate leads into an unreachable suffix
    * has no chosen step, exactly like the relational inner join against
    * the DP table; the walk stops there. */
  def unigramPathPieces(w: String, ps: Array[String],
                        lps: Array[Long], maxPiece: Int): Array[String] = {
    val vs = ps.asInstanceOf[Array[AnyRef]]
    val n = w.length
    val best = new Array[Long](n + 1)
    val ok = new Array[Boolean](n + 1)
    val step = new Array[Int](n + 1) // argmax piece length; 0 = no step
    ok(n) = true
    var pos = n - 1
    while (pos >= 0) {
      var bScore = 0L
      var bL = 0
      var L = math.min(maxPiece, n - pos) // L DESC: first max-score wins ties
      while (L >= 1) {
        if (ok(pos + L)) {
          val idx = java.util.Arrays.binarySearch(vs, w.substring(pos, pos + L))
          if (idx >= 0) {
            val s = lps(idx) + best(pos + L)
            if (bL == 0 || s > bScore) { bScore = s; bL = L }
          }
        }
        L -= 1
      }
      if (bL > 0) { best(pos) = bScore; ok(pos) = true; step(pos) = bL }
      pos -= 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p0 = 0
    while (p0 < n && step(p0) > 0) {
      out += w.substring(p0, p0 + step(p0))
      p0 += step(p0)
    }
    out.toArray
  }

  /** Content-defined chunk (fingerprint, token-length) pairs of a doc,
    * mirroring q_chunk_cdc's relational formulation value-for-value: a
    * chunk ends at 1-based token position i when i >= n and the n-token
    * gram ending at i ([[gramHashSeq]] index i-n, 0-based) hashes to
    * 0 mod `mod`; each chunk's fingerprint folds its token hashes in
    * order as (acc*131 + h) mod P. One pass per row — replaces an
    * explode + doc-partitioned window + two aggregates (measured: 5.9 s
    * -> scan-bound at sf0.1). */
  def cdcChunkFps(s: String, n: Int, mod: Int): Array[(Long, Long)] = {
    val toks = tokens(s)
    val ghs = gramHashSeq(s, n)
    val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var fp = 0L
    var len = 0L
    var i = 0
    while (i < toks.length) {
      fp = (fp * 131 + tokenHash(toks(i))) % P
      len += 1
      val pos1 = i + 1
      if (pos1 >= n && ghs(pos1 - n) % mod == 0) {
        res += ((fp, len)); fp = 0L; len = 0L
      }
      i += 1
    }
    if (len > 0) res += ((fp, len))
    res.toArray
  }

  /** MinHash signature, mirrors [[text.minhashFromHashes]]:
    * sig(i) = min over shingles of ((2i+3)*h + 5i+7) mod P; P when empty */
  def minhashSig(s: String, n: Int, k: Int): Array[Long] = {
    val hs = shingleHashes(s, n)
    val sig = Array.fill(k)(P)
    var i = 0
    while (i < k) {
      val a = 2L * i + 3; val b = 5L * i + 7
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % P
        if (v < sig(i)) sig(i) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 60-bit SimHash, mirrors [[text.simhashFromMixed]] over
    * [[text.mixedHashes]] with Mix1 (bits 0-29) and Mix2 (bits 30-59) */
  def simhash60(s: String, n: Int): Long = {
    val hs = shingleHashes(s, n)
    var sh = 0L
    var j = 0
    while (j < 60) {
      val mult = if (j < 30) Mix1 else Mix2
      val bit = j % 30
      var bal = 0L
      var i = 0
      while (i < hs.length) {
        val m = (hs(i) * mult) % P
        bal += 2 * ((m >> bit) & 1L) - 1
        i += 1
      }
      if (bal > 0) sh |= 1L << j
      j += 1
    }
    sh
  }

  /** hashing-TF embedding, mirrors [[vectors.embedStubSql]] bit-for-bit:
    * per-token hashes (NOT distinct) bucketed mod `dim`, integer bucket
    * counts L2-normalized. The sum of squares accumulates in bucket order
    * 0..dim-1 exactly like the SQL fold, so the doubles are identical.
    * The SQL form recomputes the norm per element and the token hashes per
    * bucket (no CTEs inside an expression) — O(dim²·|doc|) interpreted,
    * ~180 ms/row at sf0.1 doc sizes; this is the same math in one pass. */
  def embed(s: String, dim: Int): Array[Double] = {
    val counts = new Array[Double](dim)
    val toks = tokens(s)
    var i = 0
    while (i < toks.length) {
      counts((tokenHash(toks(i)) % dim).toInt) += 1.0
      i += 1
    }
    var acc = 0.0
    var j = 0
    while (j < dim) { acc += counts(j) * counts(j); j += 1 }
    val norm = math.sqrt(acc)
    if (norm != 0.0) {
      var k = 0
      while (k < dim) { counts(k) /= norm; k += 1 }
    }
    counts
  }

  // registered column functions (deterministic). Every kernel null-guards:
  // the reference's text columns are nullable, and an unguarded String
  // parameter reaches the lambda as null — one NULL row must yield NULL,
  // not abort the whole corpus scan with an NPE (the SQL-fragment twins
  // are null-safe for free, so the guards also keep the mirrors aligned)
  val shingleHashesUdf: UserDefinedFunction =
    udf((s: String, n: Int) => if (s == null) null else shingleHashes(s, n))
  val gramHashSeqUdf: UserDefinedFunction =
    udf((s: String, n: Int) => if (s == null) null else gramHashSeq(s, n))
  val pairGramsUdf: UserDefinedFunction =
    udf((s: String, w: Int) => if (s == null) null else pairGrams(s, w))
  val embedUdf: UserDefinedFunction =
    udf((s: String, dim: Int) => if (s == null) null else embed(s, dim))
  val minhashSigUdf: UserDefinedFunction =
    udf((s: String, n: Int, k: Int) => if (s == null) null else minhashSig(s, n, k))
  val simhash60Udf: UserDefinedFunction =
    udf((s: String, n: Int) => if (s == null) null
      else java.lang.Long.valueOf(simhash60(s, n)))
  val prefixHashUdf: UserDefinedFunction =
    udf((s: String, n: Int) => if (s == null) null
      else java.lang.Long.valueOf(prefixHash(s, n)))
  /** merge table fixed at UDF-build time (merges are literals in the plan's
    * SQL twin too, so a closure constant keeps the two in lockstep) */
  def bpeEncodeUdf(merges: Seq[(String, String)]): UserDefinedFunction =
    udf((w: String) => if (w == null) null else bpeEncodeWord(w, merges))
  val bpeMergePassUdf: UserDefinedFunction =
    udf((seg: Seq[String], a: String, b: String) =>
      if (seg == null || a == null || b == null) null else bpeMergePass(seg, a, b))
  val cdcChunkFpsUdf: UserDefinedFunction =
    udf((s: String, n: Int, mod: Int) =>
      if (s == null) null else cdcChunkFps(s, n, mod))
  /** vocab arrives as a DATA column (a sorted 1-row collect_list broadcast
    * back over the word table — the trainer's vocab is corpus-derived, so
    * unlike [[bpeEncodeUdf]] it cannot be a closure constant); `maxPiece`
    * is fixed at build time like the merge table. */
  def wordpiecePathUdf(maxPiece: Int): UserDefinedFunction =
    udf((w: String, vocab: Seq[String]) =>
      if (w == null || vocab == null) null
      else wordpiecePieces(w, vocab.toArray, maxPiece))
  def unigramPathUdf(maxPiece: Int): UserDefinedFunction =
    udf((w: String, ps: Seq[String], lps: Seq[Long]) =>
      if (w == null || ps == null || lps == null) null
      else unigramPathPieces(w, ps.toArray, lps.toArray, maxPiece))
}

package graft.functions

/** Text-analysis expression fragments, rendered per [[Dialect]].
  *
  * These power the training-data-pipeline operators (dedup, language-ID,
  * quality scoring, token counting, fingerprinting) over the `documents`
  * table. The reference's text handling is limited to lowercase-concat
  * searchable text (backend/convert_housing_to_json.py:49) and substring
  * search (backend/search_housing.py:43); the operators here are the
  * large-corpus generalizations a 100 TB ingest pipeline needs.
  *
  * All hashing is integer arithmetic mod P = 1e9+7 (fits BIGINT with room:
  * max acc*131 + 1e9 < 2^63), so Spark and DuckDB agree exactly.
  */
object text {

  val P = "1000000007"

  /** whitespace tokens of lower(text), empties dropped */
  def tokens(d: Dialect, col: String): String =
    d.filterArr(d.splitWs(s"lower($col)"), "t", "t <> ''")

  /** polynomial char hash of one token: fold(chars, 0, acc*31 + ascii) mod P.
    * Chars are mapped to BIGINT codepoints BEFORE the fold — DuckDB's
    * list_prepend refuses to mix a BIGINT init into a VARCHAR[] list. */
  def tokenHash(d: Dialect, tok: String): String =
    d.fold(
      d.transform(d.splitChars(tok), "c", "CAST(ascii(c) AS BIGINT)"),
      "CAST(0 AS BIGINT)", "acc", "x", s"(acc * 31 + x) % $P")

  /** per-token hashes of a text column */
  def tokenHashes(d: Dialect, col: String): String =
    d.transform(tokens(d, col), "t", tokenHash(d, "t"))

  /** rolling document fingerprint: fold token-hashes with acc*131 + h mod P */
  def fingerprint(d: Dialect, col: String): String =
    d.fold(tokenHashes(d, col), "CAST(0 AS BIGINT)", "acc", "h",
      s"(acc * 131 + h) % $P")

  /** word n-gram shingles as strings ("a b c" for n=3). Docs shorter than n
    * tokens yield one partial shingle (slice clamps identically in both
    * engines); the lower bound 1 keeps the sequence ascending — Spark's
    * sequence(1, 0) would DESCEND while DuckDB's generate_series(1, 0) is
    * empty, so the bound must never go below 1. */
  def shingles(d: Dialect, col: String, n: Int): String = {
    val toks = tokens(d, col)
    d.transform(
      d.seq("1", s"greatest(${d.size(toks)} - ${n - 1}, 1)"),
      "i", d.arrayJoin(d.slice(toks, "i", n.toString), " "))
  }

  /** unordered within-window co-occurrence pairs over a STAGED tokens
    * column: for every position i and each j in (i, i+w], emit
    * "min(tok_i,tok_j) max(tok_i,tok_j)" — the skip-gram pair stream PMI
    * mining counts. Non-distinct (counts matter), ≤ w pairs per position,
    * so the explode is a bounded w× amplification of the token stream.
    * Callers must guard with size >= 2: Spark's sequence(1, 0) DESCENDS
    * (the [[shingles]] gotcha); the inner sequence is always ascending
    * because i ≤ size-1 implies i+1 ≤ size. */
  def pairGrams(d: Dialect, toksCol: String, w: Int): String = {
    def el(i: String) = d.elementAt(toksCol, i)
    val pair = s"concat(least(${el("i")}, ${el("j")}), ' ', " +
      s"greatest(${el("i")}, ${el("j")}))"
    s"flatten(${d.transform(
        d.seq("1", s"${d.size(toksCol)} - 1"), "i",
        d.transform(d.seq("i + 1", s"least(i + $w, ${d.size(toksCol)})"), "j",
          pair))})"
  }

  /** distinct polynomial hashes of the word n-gram shingles (n=1 → tokens).
    * Shingle-level hashing is what makes MinHash/SimHash discriminative on
    * short-vocabulary corpora: unigram token SETS of any two long docs over
    * a small vocabulary are nearly identical, n-gram sequences are not. */
  def shingleHashes(d: Dialect, col: String, n: Int): String =
    d.arrayDistinct(
      if (n == 1) tokenHashes(d, col)
      else d.transform(shingles(d, col, n), "s", tokenHash(d, "s")))

  /** NON-distinct hashes of the word n-gram shingles — duplicates
    * preserved. [[shingleHashes]]' distinct SET is what MinHash/SimHash
    * want; repetition statistics (q_repetition's Gopher-style quality
    * rules) need the multiplicity that distinct erases. */
  def gramHashes(d: Dialect, col: String, n: Int): String =
    if (n == 1) tokenHashes(d, col)
    else d.transform(shingles(d, col, n), "s", tokenHash(d, "s"))

  /** MinHash signature (k values) over a PRECOMPUTED hash-array column.
    * h_i(x) = ((2i+3)*x + 5i+7) mod P; sig[i] = min over shingles.
    * ((2k+3)*P fits BIGINT for k ≤ 16.)  Empty docs → P (sentinel).
    *
    * Takes a column holding [[shingleHashes]] output rather than the text:
    * inlining the shingle-hash expression here would re-tokenize and re-hash
    * the whole document once per signature value (k×), which benchmarked
    * ~10× slower at sf0.1 — stage the hashes in a projection first. */
  def minhashFromHashes(d: Dialect, hsCol: String, k: Int): String =
    d.transform(d.seq("0", (k - 1).toString), "i",
      s"coalesce(${d.arrayMin(d.transform(hsCol, "t", s"((2*i + 3) * t + 5*i + 7) % $P"))}, $P)")

  /** Knuth-style multiplicative mix of a hash array column: (h*mult) mod P.
    * Stage once per row; [[simhashFromMixed]] folds over it per bit. */
  def mixedHashes(d: Dialect, hsCol: String, mult: Long): String =
    d.transform(hsCol, "t", s"(t * $mult) % $P")

  val Mix1 = 2654435761L
  val Mix2 = 2246822519L

  /** SimHash with `bits` ≤ 60 bits from two PRECOMPUTED mixed-hash array
    * columns ([[mixedHashes]] with [[Mix1]]/[[Mix2]]): bit j is set when
    * Σ_shingles (2*bit_{j%30}(m) - 1) > 0, reading m from m1 for j < 30 and
    * m2 otherwise (hashes are < P ≈ 2^30, so each mix yields 30 usable
    * bits). Folding over staged arrays keeps the cost at bits×|shingles|
    * per row instead of bits×|document| re-hashing. */
  def simhashFromMixed(d: Dialect, m1Col: String, m2Col: String, bits: Int): String = {
    require(bits <= 60, "only 2x30 mixed bits available")
    val bitSum = (j: String) =>
      d.fold(s"CASE WHEN $j < 30 THEN $m1Col ELSE $m2Col END",
        "CAST(0 AS BIGINT)", "acc", "m",
        s"acc + 2 * (${d.intDiv("m", s"CAST(pow(2, $j % 30) AS BIGINT)")} % 2) - 1")
    d.fold(
      d.transform(d.seq("0", (bits - 1).toString), "j",
        s"CASE WHEN ${bitSum("j")} > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END"),
      "CAST(0 AS BIGINT)", "acc", "b", "acc + b")
  }

  /** overlapping char n-grams of lower(col), spaces included (the
    * Cavnar-Trenkle 1994 feature space — char grams spanning word
    * boundaries carry the morphology word tokens erase). Strings shorter
    * than n yield one clamped partial gram; the lower bound 1 keeps the
    * sequence ascending (the [[shingles]] guard). */
  def charGrams(d: Dialect, col: String, n: Int): String =
    charGramsRaw(d, s"lower($col)", n)

  /** [[charGrams]] over an expression that is ALREADY lowercased. The
    * lambda body references the string per gram position, so callers on
    * the hot path must stage the lowered text as a named column first —
    * an inline lower(text) would re-lowercase the whole document once per
    * position, O(len²) per row (measured 6.7 → 5.1 s at sf0.1 on
    * q_lang_id_ngram; the same staging contract as [[minhashFromHashes]]). */
  def charGramsRaw(d: Dialect, lowered: String, n: Int): String =
    d.transform(
      d.seq("1", s"greatest(length($lowered) - ${n - 1}, 1)"),
      "i", s"substr($lowered, i, $n)")

  /** token count (whitespace) */
  def nTokens(d: Dialect, col: String): String = d.size(tokens(d, col))

  /** consecutive NON-overlapping n-token segment strings — the "lines" of
    * a corpus whose documents carry no newlines. Segment i covers tokens
    * [(i-1)*n+1 .. i*n]; the last segment may be short; docs shorter than
    * n tokens yield one segment (the greatest(...,1) keeps the sequence
    * ascending in both engines, same guard as [[shingles]]). Unlike
    * [[shingles]] (overlapping, for set signatures), segments PARTITION
    * the token stream, so removing one removes its text exactly once —
    * which is what line-level boilerplate removal needs. */
  def segments(d: Dialect, col: String, n: Int): String = {
    val toks = tokens(d, col)
    d.transform(
      d.seq("1", s"greatest(${d.intDiv(s"(${d.size(toks)} + ${n - 1})", n.toString)}, 1)"),
      "i", d.arrayJoin(d.slice(toks, s"(i-1)*$n + 1", n.toString), " "))
  }

  /** overlapping fixed-width char windows (RAG chunking): chunk i starts at
    * (i-1)*stride+1 and spans `size` chars, so consecutive chunks share
    * size-stride chars of context. Chunk count is
    * 1 + max(0, ceil((len-size)/stride)) — a chunk exists only if it ENDS
    * past the previous chunk's end, so no chunk is ever fully contained in
    * its predecessor (a start-within-text count emits a pure-duplicate
    * tail whenever len mod stride ≤ size-stride: every such chunk would be
    * a wasted embedding and a duplicate retrieval hit downstream). The
    * ceil numerator can go negative for short texts; Spark's `div`
    * truncates toward zero where DuckDB's `//` floors, but both land ≤ 0
    * and the greatest(0, ·) clamp erases the difference. */
  def charChunks(d: Dialect, col: String, size: Int, stride: Int): String = {
    require(stride <= size, "stride > size would skip text between chunks")
    val extra = d.intDiv(s"(length($col) - $size + $stride - 1)", stride.toString)
    d.transform(
      d.seq("1", s"(1 + greatest($extra, 0))"),
      "i", s"substr($col, (i-1)*$stride + 1, $size)")
  }

  /** occurrences of one literal lowercase token in the token stream */
  def termFreq(d: Dialect, col: String, term: String): String =
    d.size(d.filterArr(tokens(d, col), "t", s"t = '$term'"))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alnum-non-space chars each count as one token */
  def nTokensBpe(d: Dialect, col: String): String =
    d.regexpCount(s"lower($col)", "[a-z]+|[0-9]+|[^a-z0-9\\s ]")

  /** One BPE merge (a, b) -> ab applied greedy-left-to-right over a token
    * array: a sequential fold that either glues the incoming token onto a
    * matching predecessor or appends it. Leftmost-first semantics match
    * canonical BPE ("aaa" under (a,a) -> [aa, a]); a merged token never
    * re-merges within the same pass, exactly like the reference algorithm
    * (Sennrich et al. 2016). The fold seeds with an empty-string sentinel
    * (tokens are never empty, so it can't participate in a merge) which
    * the caller's outermost merge strips via [[bpeApply]] — that keeps
    * `element_at(acc, -1)` total on both engines without a size guard.
    * Uses [[Dialect.foldArr]] (array accumulator), whose contract binds
    * the lambda variable to a single-element array — hence elementAt(x, 1)
    * to read the token and concatArr(acc, x) to append it whole.
    * Merge parts must be pre-escaped single-quote-safe literals. */
  def bpeMergeOnce(d: Dialect, arr: String, a: String, b: String): String =
    bpeMergeOnceExpr(d, arr, s"'$a'", s"'$b'")

  /** [[bpeMergeOnce]] with the pair as EXPRESSIONS instead of literals —
    * the BPE trainer discovers each iteration's best pair as DATA (a
    * broadcast 1-row frame), so the merge must reference its columns. */
  def bpeMergeOnceExpr(d: Dialect, arr: String, aE: String, bE: String): String =
    d.foldArr(arr, d.arrayLit(Seq("")), "acc", "x",
      s"CASE WHEN ${d.elementAt("acc", "-1")} = ($aE) " +
        s"AND ${d.elementAt("x", "1")} = ($bE) " +
        s"THEN ${d.concatArr(
          d.slice(arr = "acc", start1 = "1", n = s"${d.size("acc")} - 1"),
          d.arrayOf(s"concat($aE, $bE)"))} " +
        s"ELSE ${d.concatArr("acc", "x")} END")

  /** Apply a ranked merge list to a char-token array (BPE encode): merges
    * compose in priority order — each pass runs over the previous pass's
    * output, like a trained tokenizer replaying its merge table. Strips
    * each pass's leading sentinel with a clamped-length slice (both
    * engines truncate a too-long slice at the array end; referencing
    * `size(once)` instead would paste the pass expression TWICE and double
    * the rendered SQL per merge). */
  def bpeApply(d: Dialect, charsArr: String,
               merges: Seq[(String, String)]): String =
    merges.foldLeft(charsArr) { case (acc, (a, b)) =>
      d.slice(bpeMergeOnce(d, acc, a, b), "2", "1000000")
    }

  /** guard all integer-ratio metrics: empty/whitespace-only docs would give
    * 0/0 = NaN, and fixedPoint's CAST(floor(NaN...)) throws under Spark 4's
    * default ANSI mode — one blank doc must not abort a corpus scan */
  private def safeRatio(d: Dialect, numer: String, toks: String): String =
    s"CASE WHEN ${d.size(toks)} = 0 THEN 0.0 " +
      s"ELSE CAST($numer AS DOUBLE) / ${d.size(toks)} END"

  /** distinct-token ratio — near-0 means degenerate/repetitive text */
  def uniqRatio(d: Dialect, col: String): String = {
    val toks = tokens(d, col)
    safeRatio(d, d.size(d.arrayDistinct(toks)), toks)
  }

  /** fraction of tokens in a marker list (stopword ratio / language score) */
  def markerRatio(d: Dialect, col: String, markers: Seq[String]): String =
    markerRatioFromTokens(d, tokens(d, col), markers)

  /** [[markerRatio]] over a PRE-STAGED tokens column: scoring k marker
    * sets from one staged array tokenizes the document once, not k× —
    * the same staging contract as [[minhashFromHashes]] and the hours
    * parser (Catalyst does not CSE across CASE branches, so an inlined
    * form re-expands the split+filter per reference). */
  def markerRatioFromTokens(d: Dialect, toksCol: String, markers: Seq[String]): String = {
    val inList = markers.map(m => s"t = '$m'").mkString(" OR ")
    safeRatio(d, d.size(d.filterArr(toksCol, "t", s"($inList)")), toksCol)
  }

  /** average token length in chars */
  def avgTokenLen(d: Dialect, col: String): String = {
    val toks = tokens(d, col)
    safeRatio(d,
      d.fold(d.transform(toks, "t", "CAST(length(t) AS BIGINT)"),
        "CAST(0 AS BIGINT)", "acc", "x", "acc + x"),
      toks)
  }

  /** Multiplicative key mix for deterministic sampling / splits / epoch
    * shuffles: ((key + seed) * 2654435761) mod P. Integer arithmetic only,
    * so the same row lands in the same sample/split/shuffle position in any
    * engine, on any cluster, on any run — which is what makes a sample
    * reproducible and a train/test split leak-proof at 100 TB, where
    * rand()-based sampling cannot be replayed. (keys ≤ ~1e9 stay well under
    * BIGINT overflow: 1e9 * 2654435761 ≈ 2.7e18 < 2^63.) */
  def mix(keyExpr: String, seed: Long = 0L): String =
    s"(((($keyExpr) + $seed) * ${Mix1}) % $P)"

  /** Engine-stable fixed-point rounding: floor(x*10^k + 0.5) as BIGINT.
    * `round()` on DOUBLE disagrees between engines at exact .5 decimal
    * boundaries (Spark rounds the shortest decimal repr via BigDecimal,
    * DuckDB rounds the binary value — 189/40 = "4.725" → 4.73 vs 4.72).
    * floor over identical doubles is identical everywhere. Use this for any
    * ratio-of-integers output. */
  def fixedPoint(expr: String, k: Int): String =
    s"CAST(floor(($expr) * ${math.pow(10, k).toLong}.0 + 0.5) AS BIGINT)"

  /** Language-ID marker sets: for each language, tokens whose presence votes
    * for it. The test corpus is synthetic (same vocabulary in every doc), so
    * these are demonstration markers; on a real corpus they'd be per-language
    * stopword lists. Deterministic argmax with alphabetical tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "group", "hash"),
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("data", "table", "row"),
    "fr" -> Seq("query", "join", "merge"),
    "zh" -> Seq("scan", "sort", "order"))

  /** first-wins argmax over (label, scoreExpr) pairs: label i wins when
    * strictly greater than every earlier score and ≥ every later one (ties
    * → first in Seq order). Callers pass staged COLUMN references as the
    * scores when the underlying expressions are non-trivial — each score
    * appears ~2k times across the CASE's WHEN chains, so an inlined
    * expression is re-evaluated ~2k× per row (Catalyst has no cross-branch
    * CSE; measured 3–6 s for a 200-row lang-ID scan vs 0.2 s staged). */
  def argmaxCase(scored: Seq[(String, String)], default: String = "und"): String = {
    val best = scored.map { case (label, s) =>
      val conds = scored.takeWhile(_._1 != label).map { case (_, s2) => s"$s > $s2" } ++
        scored.dropWhile(_._1 != label).drop(1).map { case (_, s2) => s"$s >= $s2" }
      s"WHEN ${conds.mkString(" AND ")} THEN '$label'"
    }
    s"CASE ${best.mkString(" ")} ELSE '$default' END"
  }

  /** predicted language = argmax over marker ratios (ties → first
    * alphabetically, which is the Seq order above). Fully inlined — fine
    * for the DuckDB oracle (it CSEs aggressively); the Spark side should
    * stage the ratios as columns and [[argmaxCase]] over the references. */
  def langPredict(d: Dialect, col: String): String =
    argmaxCase(langMarkers.map { case (lang, ms) => (lang, markerRatio(d, col, ms)) })
}

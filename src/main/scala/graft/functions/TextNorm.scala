package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Text normalization + HTML extraction kernels — the first two stages of
  * any real crawl-curation pipeline (the reference's corpus arrives
  * pre-extracted, backend/search_housing.py; a 100 TB crawl does not).
  *
  * Same compiled-kernel rationale as [[TextSig]]: these are one-pass
  * per-row scanners over the blob/text column — no shuffle, no state,
  * partition-parallel, and the deterministic Scala UDF keeps the plan a
  * single narrow projection (Catalyst HOF lambdas are interpreted and
  * CollapseProject re-inlines staged fragments; a scanner with a mode
  * switch per character cannot be expressed as SQL regex without multiple
  * passes over the string anyway).
  *
  * The exact semantics are PINNED so the DuckDB oracle can replay them:
  *
  * [[normalize]] — (1) Unicode NFC (java.text.Normalizer; DuckDB's
  * nfc_normalize agrees — both implement UAX #15), (2) strip C0 controls
  * except HT/LF/VT/FF/CR plus DEL (`[\x00-\x08\x0E-\x1F\x7F]`),
  * (3) collapse ASCII whitespace runs (`[ \x09-\x0D]+`) to one space,
  * (4) trim. Order matters and is part of the contract: a combining mark
  * composes BEFORE stripping, so NFC can never resurrect a stripped byte.
  *
  * [[htmlToText]] — script/style elements are dropped WITH their content
  * (the one place tag text is not document text), every other tag becomes
  * one space (block/inline distinction deliberately collapsed — output is
  * single-line, the whitespace-collapse step erases the difference),
  * entities decode (&amp; &lt; &gt; &quot; &apos; &nbsp;→space, decimal
  * `&#NN;` and hex `&#xNN;`; unknown entities pass through verbatim), then
  * the same collapse+trim as [[normalize]]. An unterminated tag or
  * script/style block consumes to end-of-input (truncated HTML yields its
  * visible prefix, never raw markup).
  */
object TextNorm {

  /** step (2)'s predicate: C0 controls minus the five ASCII whitespace
    * controls, plus DEL */
  @inline private def isStrippedControl(c: Char): Boolean =
    (c < 0x20 && !(c >= 0x09 && c <= 0x0D)) || c == 0x7F

  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || (c >= 0x09 && c <= 0x0D)

  /** steps (2)-(4) in one pass: strip controls, collapse whitespace, trim */
  private def stripCollapseTrim(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isAsciiWs(c)) { if (sb.length > 0) pendingSpace = true }
      else if (!isStrippedControl(c)) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def normalize(s: String): String =
    stripCollapseTrim(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  val normalizeUdf: UserDefinedFunction =
    udf { (s: String) => if (s == null) null else normalize(s) }

  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** decode the entity starting at s(i) == '&'; returns (replacement,
    * chars consumed) or null if it is not a well-formed known entity */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return null
    val body = s.substring(i + 1, semi)
    if (body.isEmpty) return null
    if (body.charAt(0) == '#') {
      val num = body.substring(1)
      val cp =
        try {
          if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      // surrogate code points (0xD800-0xDFFF) are not characters: toChars
      // would emit an unpaired surrogate — invalid UTF-8 once materialized
      // as UTF8String, and a divergence from any Unicode-correct oracle —
      // so the entity passes through verbatim like other malformed ones
      if (cp < 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) null
      else (new String(Character.toChars(cp)), semi - i + 1)
    } else Named.get(body) match {
      case Some(r) => (r, semi - i + 1)
      case None    => null
    }
  }

  /** case-insensitive region match against a lowercase needle */
  private def matchesAt(s: String, i: Int, needle: String): Boolean =
    s.regionMatches(true, i, needle, 0, needle.length)

  /** true iff position i starts `<name` with a proper name boundary
    * (whitespace, '>', or '/') — so `<style>` matches but `<styled>`
    * stays an ordinary tag */
  private def opensElement(s: String, i: Int, name: String): Boolean = {
    if (!matchesAt(s, i, "<" + name)) return false
    val after = i + 1 + name.length
    after >= s.length || { val c = s.charAt(after)
      c == '>' || c == '/' || isAsciiWs(c) }
  }

  /** index just past the closing `</name ... >`, or s.length if the block
    * never closes */
  private def skipElement(s: String, i: Int, name: String): Int = {
    val close = "</" + name
    var p = i
    while (p < s.length) {
      if (matchesAt(s, p, close)) {
        val gt = s.indexOf('>', p)
        return if (gt < 0) s.length else gt + 1
      }
      p += 1
    }
    s.length
  }

  def htmlToText(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      // '<' opens a tag only when followed by a letter, '/', or '!' (the
      // HTML spec's tag-open disposition); a bare '<' before anything else
      // — '1 < 2' in unescaped crawl text — is character data, and
      // swallowing to the next '>' would silently delete visible content
      if (c == '<' && i + 1 < html.length && {
        val n = html.charAt(i + 1)
        (n >= 'a' && n <= 'z') || (n >= 'A' && n <= 'Z') || n == '/' || n == '!'
      }) {
        if (opensElement(html, i, "script")) i = skipElement(html, i, "script")
        else if (opensElement(html, i, "style")) i = skipElement(html, i, "style")
        else {
          val gt = html.indexOf('>', i)
          i = if (gt < 0) html.length else gt + 1
        }
        sb.append(' ')
      } else if (c == '&') {
        val d = decodeEntity(html, i)
        if (d == null) { sb.append(c); i += 1 }
        else { sb.append(d._1); i += d._2 }
      } else { sb.append(c); i += 1 }
    }
    stripCollapseTrim(sb.toString)
  }

  val htmlToTextUdf: UserDefinedFunction =
    udf { (s: String) => if (s == null) null else htmlToText(s) }

  private val Href =
    java.util.regex.Pattern.compile(
      "(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"")

  /** href values of anchor tags, in document order (duplicates kept —
    * link-graph edges, not a set) */
  def extractLinks(html: String): Array[String] = {
    val m = Href.matcher(html)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toArray
  }

  val extractLinksUdf: UserDefinedFunction =
    udf { (s: String) => if (s == null) null else extractLinks(s) }

  /** params every crawl pipeline strips before URL-level dedup: click/
    * campaign trackers that vary per referrer while the content doesn't */
  private val TrackingParams = Set("fbclid", "gclid", "msclkid")

  @inline private def isTracking(name: String): Boolean =
    name.startsWith("utm_") || TrackingParams.contains(name)

  /** URL canonicalization — the key function of crawl-level dedup (two
    * fetches of the same page under different tracking params must hash
    * together). Pinned rules, in order: (1) scheme and host lowercase;
    * (2) default port stripped (:80 for http, :443 for https);
    * (3) fragment dropped; (4) query params split on '&', tracking params
    * (utm_*, fbclid, gclid, msclkid) dropped, the rest sorted by full
    * `name=value` text and re-joined ('' → no '?'); (5) path: empty → '/',
    * runs of '/' collapsed, trailing '/' stripped except on the root.
    * Scheme-relative, userinfo and IDN edge cases are out of scope —
    * deterministic string rules, not a full RFC 3986 resolver. */
  def canonicalizeUrl(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return url // not an absolute URL: pass through
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    // authority ends at the first of '/', '?', '#'
    var aEnd = 0
    while (aEnd < rest.length && rest.charAt(aEnd) != '/' &&
      rest.charAt(aEnd) != '?' && rest.charAt(aEnd) != '#') aEnd += 1
    var host = rest.substring(0, aEnd).toLowerCase
    if ((scheme == "http" && host.endsWith(":80")) ||
        (scheme == "https" && host.endsWith(":443")))
      host = host.substring(0, host.lastIndexOf(':'))
    var tail = rest.substring(aEnd)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash)
    val qm = tail.indexOf('?')
    val (rawPath, rawQuery) =
      if (qm < 0) (tail, "") else (tail.substring(0, qm), tail.substring(qm + 1))
    val sb = new java.lang.StringBuilder(rawPath.length)
    var i = 0
    while (i < rawPath.length) {
      val c = rawPath.charAt(i)
      if (c != '/' || sb.length == 0 || sb.charAt(sb.length - 1) != '/')
        sb.append(c)
      i += 1
    }
    if (sb.length > 1 && sb.charAt(sb.length - 1) == '/')
      sb.setLength(sb.length - 1)
    val path = if (sb.length == 0) "/" else sb.toString
    val kept = rawQuery.split("&").toSeq
      .filter(p => p.nonEmpty && !isTracking(p.takeWhile(_ != '=')))
      .sorted
    scheme + "://" + host + path +
      (if (kept.isEmpty) "" else kept.mkString("?", "&", ""))
  }

  val canonicalizeUrlUdf: UserDefinedFunction =
    udf { (s: String) => if (s == null) null else canonicalizeUrl(s) }

  // Column forms route through the native codegen expressions
  // (plans/TextNormExpressions, registered by GraftExtensions) when the
  // session carries them — same dispatch recipe as [[vectors.dot]]: the
  // native call stays inside WholeStageCodegen, the UDF fallback keeps
  // plain sessions working, and both delegate to the SAME kernel above so
  // they cannot disagree.
  private def extensionsActive: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.catalog.functionExists("normalize_text"))

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  def normalizeCol(c: Column): Column =
    if (extensionsActive) call_function("normalize_text", c)
    else normalizeUdf(c)

  def htmlToTextCol(c: Column): Column =
    if (extensionsActive) call_function("html_to_text", c)
    else htmlToTextUdf(c)

  def canonicalizeUrlCol(c: Column): Column =
    if (extensionsActive) call_function("canonical_url", c)
    else canonicalizeUrlUdf(c)
}

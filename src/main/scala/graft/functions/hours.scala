package graft.functions

/** Hours-string parser (reference: backend/tools/check_hours_availability.py:50-86):
  * "24/7" / "Closed" / "9:00 AM - 5:00 PM" → {is_24h, is_closed, open/close
  * minutes-since-midnight}. Pure CASE/split/substr expressions, rendered per
  * dialect so the DuckDB oracle parses identically.
  */
object hours {

  /** Matches check_hours_availability.py:66 exactly: `'24' in s or
    * 'always' in s` over the lowercased string. Note the inherited
    * reference bug: the bare '24' SUBSTRING check means "10:24 AM - 6:00 PM"
    * classifies as 24/7 — kept deliberately, parity beats plausibility. */
  def is24h(d: Dialect, col: String): String =
    s"(${d.strIndex(col, "24")} > 0 OR ${d.strIndex(s"lower($col)", "always")} > 0)"

  /** substring check, like the reference's `'closed' in s or 'n/a' in s`
    * (check_hours_availability.py:55-57) — NOT exact equality, so
    * "Closed Sundays" and "N/A" classify correctly */
  def isClosed(d: Dialect, col: String): String =
    s"(${d.strIndex(s"lower($col)", "closed")} > 0 OR ${d.strIndex(s"lower($col)", "n/a")} > 0)"

  /** "is it open at `nowMin` minutes-since-midnight?" — the evaluation step
    * the reference runs on top of the parser
    * (check_hours_availability.py:140-150): TRUE for a 24/7 facility,
    * FALSE for a closed one, range containment for a parsed
    * "H:MM AM - H:MM PM" range, NULL when the string is unparseable (the
    * reference's is_open=None "verify with resource" path). A close time
    * numerically before the open time is an overnight range (shelters:
    * "7:00 PM - 6:00 AM") and wraps midnight — the one semantic the
    * reference's web-text path never had to decide; documented here as the
    * only behavior a range can sensibly mean.
    *
    * Takes the PRE-STAGED parse columns ([[is24h]]/[[isClosed]]/
    * [[rangeMinutes]] computed once into named columns), not the raw hours
    * string: a fully-inlined form repeats the parser fragment (regex +
    * splits) ~6x across this CASE and [[statusFromParts]], and the
    * resulting expression tree benchmarked ~3 s of pure planning/codegen
    * per query; over column references the tree is tiny, and Catalyst's
    * CollapseProject keeps multiply-referenced non-cheap aliases staged. */
  def isOpenFromParts(is24: String, isCl: String, openMin: String,
                      closeMin: String, nowMin: String): String =
    s"CASE WHEN $is24 THEN TRUE " +
      s"WHEN $isCl THEN FALSE " +
      s"WHEN ($openMin) IS NULL THEN NULL " +
      s"WHEN ($openMin) <= ($closeMin) " +
      s"THEN ($nowMin) >= ($openMin) AND ($nowMin) < ($closeMin) " +
      s"ELSE ($nowMin) >= ($openMin) OR ($nowMin) < ($closeMin) END"

  /** status string of the decision, verbatim from the reference:
    * "Open 24/7" (line 144), "Currently closed" (line 147), OPEN/CLOSED
    * from the evaluated range (format_availability_response lines 183-188),
    * and the line-149 fallback for unparseable hours. Takes the 1/0/-1
    * tri-state column [[isOpenFromParts]] was already cast into (the
    * reference likewise derives the status string from the computed
    * is_open value) — re-expanding the decision here would double the
    * codegen'd CASE nest for no semantic gain. */
  def statusFromOpen(is24: String, isCl: String, triState: String): String =
    s"CASE WHEN $is24 THEN 'Open 24/7' " +
      s"WHEN $isCl THEN 'Currently closed' " +
      s"WHEN ($triState) = -1 " +
      s"THEN 'Hours information found - verify with resource' " +
      s"WHEN ($triState) = 1 THEN 'OPEN' ELSE 'CLOSED' END"

  /** minutes-since-midnight of side `idx` (1 = open, 2 = close) of a
    * "H:MM AM - H:MM PM" range; NULL for 24/7, closed, or any string not
    * matching the range shape — the reference returns None for unparseable
    * hours, and under Spark 4's default ANSI mode one bad row must not
    * abort the whole scan. The shape check runs against the FULL string
    * BEFORE any split/element_at: guarding only the parsed part is not
    * enough, because for a string with no ' - ' separator (e.g. 'varies')
    * ANSI `element_at(arr, 2)` on the 1-element split already throws while
    * evaluating the guard itself (DuckDB's arr[2] is NULL there — the
    * whole-string guard keeps both engines on the NULL path). */
  def rangeMinutes(d: Dialect, col: String, idx: Int): String = {
    // (?i): the reference lowercases the whole string before splitting
    // (check_hours_availability.py:63), so "9:00 am - 5:00 pm" parses
    // there — an uppercase-only shape guard would NULL what the reference
    // accepts (caught by tools/ref_parity.py). Inline-flag syntax works in
    // both Java regex (Spark RLIKE) and RE2 (DuckDB regexp_matches).
    val sideShape = "[0-9]{1,2}:[0-9]{2} *(?i:AM|PM)"
    val fullShape = s"^$sideShape - $sideShape"
    val part = d.elementAt(d.split(col, " - "), idx.toString)
    val hh = s"CAST(${d.elementAt(d.split(part, ":"), "1")} AS BIGINT)"
    val mm = s"CAST(substr(${d.elementAt(d.split(part, ":"), "2")}, 1, 2) AS BIGINT)"
    val isPm = s"(${d.strIndex(s"upper($part)", "PM")} > 0)"
    s"CASE WHEN ${is24h(d, col)} OR ${isClosed(d, col)} THEN NULL " +
      s"WHEN NOT ${d.regexMatch(col, fullShape)} THEN NULL " +
      s"ELSE ((($hh) % 12) + CASE WHEN $isPm THEN 12 ELSE 0 END) * 60 + ($mm) END"
  }
}

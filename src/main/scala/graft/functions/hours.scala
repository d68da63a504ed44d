package graft.functions

/** Hours-string parser (reference: backend/tools/check_hours_availability.py:50-86):
  * "24/7" / "Closed" / "9:00 AM - 5:00 PM" → {is_24h, is_closed, open/close
  * minutes-since-midnight}. Pure CASE/split/substr expressions, rendered per
  * dialect so the DuckDB oracle parses identically.
  */
object hours {

  def is24h(d: Dialect, col: String): String =
    s"(${d.strIndex(col, "24")} > 0)"

  def isClosed(d: Dialect, col: String): String =
    s"(lower($col) = 'closed')"

  /** minutes-since-midnight of side `idx` (1 = open, 2 = close) of a
    * "H:MM AM - H:MM PM" range; NULL for 24/7 or closed strings */
  def rangeMinutes(d: Dialect, col: String, idx: Int): String = {
    val part = d.elementAt(d.split(col, " - "), idx.toString)
    val hh = s"CAST(${d.elementAt(d.split(part, ":"), "1")} AS BIGINT)"
    val mm = s"CAST(substr(${d.elementAt(d.split(part, ":"), "2")}, 1, 2) AS BIGINT)"
    val isPm = s"(${d.strIndex(s"upper($part)", "PM")} > 0)"
    s"CASE WHEN ${is24h(d, col)} OR ${isClosed(d, col)} THEN NULL " +
      s"ELSE ((($hh) % 12) + CASE WHEN $isPm THEN 12 ELSE 0 END) * 60 + ($mm) END"
  }
}

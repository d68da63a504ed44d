package graft.functions

/** X20: the reference's literal lookup tables — the weather-advisory dict
  * (backend/tools/safe_places_to_sleep.py:180-196
  * `get_weather_recommendations`) and the safety-tips list (:246-262
  * `get_safety_tips`), strings verbatim (required by the semantics
  * contract, like the Facade's keyword lists).
  *
  * Rendered as cross-dialect CASE / array-literal fragments so the DuckDB
  * oracle evaluates the identical text (q_safe_sleep_advice);
  * tools/ref_parity.py §7 closes the chain back to the reference's own
  * functions. At scale these are constants folded into the projection —
  * a broadcast-map join would be strictly worse than the when-chain
  * Catalyst constant-folds.
  */
object advice {

  /** insertion-ordered, exactly the reference dict */
  val weather: Seq[(String, String)] = Seq(
    "rain" -> ("⛈️ **Rain Advisory**: Prioritize covered areas - bus " +
      "stations, under highway overpasses, or indoor 24-hour facilities. " +
      "Avoid parks and open areas. Keep belongings elevated and dry."),
    "heat" -> ("🌡️ **Heat Advisory**: Seek shade and air-conditioned " +
      "facilities if possible. Night cooling centers may be available. " +
      "Stay hydrated - seek water fountains or ask local stores for water."),
    "cold" -> ("❄️ **Cold Advisory**: Prioritize heated indoor facilities " +
      "or warming centers. Many communities open emergency shelter during " +
      "cold snaps. Call 211 for warming centers."),
    "clear" -> ("🌙 **Clear Night**: Multiple options available - parks, " +
      "transit hubs, or parking lots. Focus on well-lit, populated areas " +
      "for safety."))

  /** `recommendations.get(condition, default)`'s default */
  val weatherDefault = "Stay safe and seek well-lit, populated areas."

  /** exactly the reference list, in order */
  val safetyTips: Seq[String] = Seq(
    "🔦 Stay in well-lit, populated areas when possible",
    "🤝 Sleep near others or in groups for safety",
    "📱 Keep your phone charged and accessible",
    "🎒 Keep your belongings secure and within reach",
    "⏰ Avoid sleeping in the same spot every night",
    "🚨 Trust your instincts - if a place doesn't feel safe, move",
    "📞 Know local emergency numbers and shelter hotlines",
    "☀️ Be aware of sunrise/early activity to stay safe during vulnerable hours")

  private def q(s: String) = s.replace("'", "''")

  /** the dict lookup as a CASE chain — plain ANSI, identical in both
    * engines, so no Dialect split needed */
  def weatherCaseSql(c: String): String =
    "CASE " +
      weather.map { case (k, v) => s"WHEN $c = '$k' THEN '${q(v)}'" }
        .mkString(" ") +
      s" ELSE '${q(weatherDefault)}' END"

  /** tip number `idx1` (1-based expression) from the literal list */
  def tipSql(d: Dialect, idx1: String): String =
    d.elementAt(d.arrayLit(safetyTips.map(q)), idx1)

  def nTips: Int = safetyTips.size
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X18: deterministic resource-list formatting — the markdown block the
  * reference assembles for every chat answer
  * (backend/tools/dataset_search.py:104-134 `format_results_for_llm`).
  *
  * Presentation layer, so golden-tested (ResfmtSpec pins the exact string
  * the reference function emits on a 3-resource fixture), not
  * DuckDB-oracled: the formatting itself never touches more rows than one
  * response's `max_results` (the reference caps at 10), so the global
  * row_number window here is a ≤10-row frame, not a corpus-wide sort — the
  * heavy lifting (search, ranking, distance) happened upstream in the
  * distributed plan and this is the last-mile projection.
  *
  * Field semantics mirror the reference line by line: Type falls back
  * category → type → 'N/A'; Address/Phone/Hours default 'N/A'; Distance /
  * Services / Requirements / Description lines render only when present
  * (NULL = the dict key absent); Services joins with ', '.
  */
object resfmt {

  private def line(prefix: String, c: Column): Column =
    concat(lit("   " + prefix + ": "), c, lit("\n"))
  private def optLine(prefix: String, c: Column): Column =
    when(c.isNotNull, line(prefix, c)).otherwise(lit(""))

  /** Adds `idx` (1-based, in `orderCol` ascending order) and `formatted`
    * (one resource's markdown block, dataset_search.py:113-131). Run on
    * the ALREADY-LIMITED result page, never a full corpus — the lone
    * unpartitioned window is by design a ≤max_results frame. */
  def blocks(results: DataFrame, orderCol: String): DataFrame =
    results
      .withColumn("idx", row_number().over(Window.orderBy(col(orderCol))))
      .withColumn("formatted", concat(
        format_string("%d. **%s**\n", col("idx"), col("name")),
        line("Type", coalesce(col("category"), col("type"), lit("N/A"))),
        line("Address", coalesce(col("address"), lit("N/A"))),
        line("Phone", coalesce(col("phone"), lit("N/A"))),
        line("Hours", coalesce(col("hours"), lit("N/A"))),
        when(col("distance_miles").isNotNull,
          concat(lit("   Distance: "), col("distance_miles").cast("string"),
            lit(" miles from you\n"))).otherwise(lit("")),
        when(col("services").isNotNull,
          concat(lit("   Services: "), array_join(col("services"), ", "),
            lit("\n"))).otherwise(lit("")),
        optLine("Requirements", col("requirements")),
        optLine("Description", col("description")),
        lit("\n")))

  /** The whole message: header + blocks in order, or the reference's
    * verbatim empty-result sentence (dataset_search.py:108-109). One row,
    * one `message` column. */
  def formatResultsForLlm(results: DataFrame, orderCol: String): DataFrame =
    blocks(results, orderCol)
      .agg(count(lit(1)).as("n"),
        collect_list(struct(col("idx"), col("formatted"))).as("bs"))
      .select(
        when(col("n") === 0, lit("No results found in local database."))
          .otherwise(concat(
            lit("Found the following resources in our local database:\n\n"),
            array_join(transform(array_sort(col("bs")),
              b => b.getField("formatted")), "")))
          .as("message"))

  // ======================================================================
  // X18 site 3: the conversation-report health summary
  // (backend/chatbot.py:326-419 `get_health_summary`). Goldens in
  // ResfmtSpec were produced by executing the reference function itself
  // (tools/gen_fmt_goldens.py) on the identical fixture.
  // ======================================================================

  /** Python truthiness for optional text: None and "" both suppress the
    * line (`if med.purpose:` etc.) — NULL-only checks would diverge. */
  private def present(c: Column): Column = c.isNotNull && c =!= ""
  private def opt(prefix: String, c: Column): Column =
    when(present(c), concat(lit("  - " + prefix + ": "), c))

  /** One section: header line + each row's lines (sorted by `o`) + a
    * trailing "" element (the blank separator line the reference appends),
    * or an empty array when the section has no rows. */
  private def section(rows: DataFrame, header: String, o: Column,
      lines: Column): DataFrame =
    rows.agg(collect_list(struct(o.as("o"), lines.as("ls"))).as("rs"))
      .select(when(size(col("rs")) === 0, typedLit(Seq.empty[String]))
        .otherwise(concat(array(lit(header)),
          flatten(transform(array_sort(col("rs")), r => r.getField("ls"))),
          array(lit("")))).as("part"))

  /** The per-conversation health summary markdown (chatbot.py:341-419):
    * four sections — medications, last-10 symptoms (severity traffic
    * light), last-10 vitals (blood-pressure special case + ABNORMAL flag),
    * active care plans — joined with the reference's note header, or ""
    * when everything is empty. Presentation layer: inputs are the
    * already-filtered per-user frames (active meds, active plans), row
    * counts bounded by the reference's own limits. Column contracts:
    * meds(ord,name,dosage,frequency,purpose,reminder_times),
    * symptoms(symptom,severity,duration,description,logged_at),
    * vitals(measurement_type,systolic,diastolic,value,unit,is_abnormal,
    * notes,measured_at), plans(ord,title,condition,primary_provider,
    * next_appointment). */
  def healthSummary(meds: DataFrame, symptoms: DataFrame, vitals: DataFrame,
      plans: DataFrame): DataFrame = {
    val medPart = section(meds, "### 💊 Medications Tracked", col("ord"),
      filter(array(
        format_string("- **%s** (%s)", col("name"), col("dosage")),
        format_string("  - Frequency: %s", col("frequency")),
        opt("Purpose", col("purpose")),
        when(col("reminder_times").isNotNull && size(col("reminder_times")) > 0,
          concat(lit("  - Reminder times: "),
            array_join(col("reminder_times"), ", ")))),
        x => x.isNotNull))
    // last-10 by logged_at DESC (chatbot.py:363-366); negated epoch sorts
    // the collect_list ascending into that order
    val sympPart = section(
      symptoms.orderBy(desc("logged_at")).limit(10),
      "### 📋 Symptoms Logged", -unix_millis(col("logged_at")),
      filter(array(
        concat(lit("- "),
          when(col("severity") <= 3, lit("🟢"))
            .when(col("severity") <= 6, lit("🟡")).otherwise(lit("🔴")),
          lit(" **"), col("symptom"), lit("** (Severity: "),
          col("severity").cast("string"), lit("/10)")),
        opt("Duration", col("duration")),
        opt("Notes", col("description")),
        concat(lit("  - Logged: "),
          date_format(col("logged_at"), "yyyy-MM-dd HH:mm"))),
        x => x.isNotNull))
    val vitPart = section(
      vitals.orderBy(desc("measured_at")).limit(10),
      "### ❤️ Vital Signs Recorded", -unix_millis(col("measured_at")),
      filter(array(
        concat(
          when(col("measurement_type") === "blood_pressure",
            concat(lit("- **Blood Pressure**: "), col("systolic").cast("string"),
              lit("/"), col("diastolic").cast("string"), lit(" mmHg")))
          .otherwise(concat(lit("- **"),
            initcap(translate(col("measurement_type"), "_", " ")),
            lit("**: "), col("value").cast("string"), lit(" "), col("unit"))),
          when(col("is_abnormal"), lit(" ⚠️ **ABNORMAL**")).otherwise(lit(""))),
        concat(lit("  - Measured: "),
          date_format(col("measured_at"), "yyyy-MM-dd HH:mm")),
        opt("Notes", col("notes"))),
        x => x.isNotNull))
    val planPart = section(plans, "### 📖 Active Care Plans", col("ord"),
      filter(array(
        format_string("- **%s**", col("title")),
        opt("Condition", col("condition")),
        opt("Provider", col("primary_provider")),
        when(col("next_appointment").isNotNull,
          concat(lit("  - Next Appointment: "),
            date_format(col("next_appointment"), "yyyy-MM-dd")))),
        x => x.isNotNull))
    medPart.crossJoin(sympPart.withColumnRenamed("part", "p2"))
      .crossJoin(vitPart.withColumnRenamed("part", "p3"))
      .crossJoin(planPart.withColumnRenamed("part", "p4"))
      .select({
        val parts = concat(col("part"), col("p2"), col("p3"), col("p4"))
        when(size(parts) === 0, lit(""))
          .otherwise(array_join(concat(array(
            lit("**Note**: This health information was self-reported during " +
              "the conversation and should be verified by healthcare " +
              "professionals."), lit("")), parts), "\n"))
          .as("message")
      })
  }

  // ======================================================================
  // X18 site 4: the safe-sleep response builder
  // (backend/tools/safe_places_to_sleep.py:265-303 `format_sleep_response`
  // + :246-263 `get_safety_tips`). Goldens likewise executed from the
  // reference source (tools/gen_fmt_goldens.py).
  // ======================================================================

  /** The reference's static safety-tip list, verbatim — same
    * required-by-semantics class as the X20 advice tables
    * (safe_places_to_sleep.py:246-263). */
  val safetyTips: Seq[String] = Seq(
    "🔦 Stay in well-lit, populated areas when possible",
    "🤝 Sleep near others or in groups for safety",
    "📱 Keep your phone charged and accessible",
    "🎒 Keep your belongings secure and within reach",
    "⏰ Avoid sleeping in the same spot every night",
    "🚨 Trust your instincts - if a place doesn't feel safe, move",
    "📞 Know local emergency numbers and shelter hotlines",
    "☀️ Be aware of sunrise/early activity to stay safe during vulnerable hours")

  /** Render the safe-sleep response (safe_places_to_sleep.py:265-303) from
    * a one-row frame mirroring the `sleep_data` dict: location,
    * current_time, search_radius_miles (double), weather_condition,
    * weather_recommendation, options_found, options array<struct<heading,
    * type,category,info,source_url>>, safety_tips array<string>, plus
    * nullable error/recommendation for the error path ('error' in dict ==
    * error IS NOT NULL). */
  def formatSleepResponse(sleepData: DataFrame): DataFrame =
    sleepData.select(
      when(col("error").isNotNull, concat(
        lit("❌ Error: "), col("error"), lit("\n💡 "),
        col("recommendation"), lit("\n")))
      .otherwise(concat(
        lit("\n🌙 **Safe Places to Sleep Near "), col("location"),
        lit("**\n⏰ **Current Time**: "), col("current_time"),
        lit("\n📍 **Search Radius**: "),
        col("search_radius_miles").cast("string"),
        lit(" miles\n\n**Weather Condition**: "),
        upper(col("weather_condition")), lit("\n"),
        col("weather_recommendation"), lit("\n\n"),
        when(col("options_found") > 0, concat(
          lit("**Found "), col("options_found").cast("string"),
          lit(" Safe Sleep Options:**\n\n"),
          array_join(transform(col("options"), (o, i) => concat(
            (i + 1).cast("string"), lit(". **"), o.getField("heading"),
            lit("** ("),
            initcap(translate(o.getField("type"), "_", " ")), lit(")\n   "),
            o.getField("category"), lit("\n   ℹ️ "), o.getField("info"),
            lit("\n"),
            when(present(o.getField("source_url")),
              concat(lit("   🔗 [More Info]("), o.getField("source_url"),
                lit(")\n"))).otherwise(lit("")),
            lit("\n"))), "")))
        .otherwise(lit("⚠️ **No specific options found in search.**\n" +
          "💡 **Alternatives**: Call 211 for local shelter/safe parking " +
          "programs\n")),
        lit("\n**Safety Tips:**\n"),
        array_join(transform(col("safety_tips"),
          t => concat(lit("• "), t, lit("\n"))), "")))
      .as("message"))
}

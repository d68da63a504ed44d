package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.resfmt

/** X18 goldens: the expected strings were produced by executing the
  * reference's own `format_results_for_llm`
  * (backend/tools/dataset_search.py:104-134, source sha256
  * 3a0dc291f96c5dfe…) on the identical fixture, so these tests pin
  * byte-for-byte reference parity of the formatting layer. */
class ResfmtSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture = {
    import spark.implicits._
    Seq(
      (1, "Father Joe's Villages", Option("shelter"), Option.empty[String],
        Option("1501 Imperial Ave"), Option("619-233-8500"), Option("24/7"),
        Option(1.2), Option(Seq("beds", "meals", "showers")),
        Option("ID required"), Option("Large downtown shelter campus")),
      (2, "San Diego Food Bank", Option.empty[String], Option("food_bank"),
        Option("9850 Distribution Ave"), Option.empty[String],
        Option("9:00 AM - 5:00 PM"), Option.empty[Double],
        Option(Seq("food boxes")), Option.empty[String], Option.empty[String]),
      (3, "Neil Good Day Center", Option("day_center"), Option.empty[String],
        Option.empty[String], Option("619-578-9762"), Option("Closed"),
        Option(0.5), Option.empty[Seq[String]], Option.empty[String],
        Option.empty[String]))
      .toDF("rank", "name", "category", "type", "address", "phone", "hours",
        "distance_miles", "services", "requirements", "description")
  }

  test("three-resource message matches the reference formatter byte-for-byte") {
    val got = resfmt.formatResultsForLlm(fixture, "rank")
      .head().getString(0)
    val expected =
      "Found the following resources in our local database:\n\n" +
        "1. **Father Joe's Villages**\n" +
        "   Type: shelter\n" +
        "   Address: 1501 Imperial Ave\n" +
        "   Phone: 619-233-8500\n" +
        "   Hours: 24/7\n" +
        "   Distance: 1.2 miles from you\n" +
        "   Services: beds, meals, showers\n" +
        "   Requirements: ID required\n" +
        "   Description: Large downtown shelter campus\n\n" +
        "2. **San Diego Food Bank**\n" +
        "   Type: food_bank\n" +
        "   Address: 9850 Distribution Ave\n" +
        "   Phone: N/A\n" +
        "   Hours: 9:00 AM - 5:00 PM\n" +
        "   Services: food boxes\n\n" +
        "3. **Neil Good Day Center**\n" +
        "   Type: day_center\n" +
        "   Address: N/A\n" +
        "   Phone: 619-578-9762\n" +
        "   Hours: Closed\n" +
        "   Distance: 0.5 miles from you\n\n"
    assert(got == expected)
  }

  test("ordering column drives the numbering, not input order") {
    val got = resfmt.blocks(fixture.orderBy(org.apache.spark.sql.functions
        .desc("rank")), "rank")
      .select("idx", "name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(1) == "Father Joe's Villages" && got(3) == "Neil Good Day Center")
  }

  test("empty result set renders the reference's verbatim sentence") {
    val got = resfmt.formatResultsForLlm(fixture.limit(0), "rank")
      .head().getString(0)
    assert(got == "No results found in local database.")
  }

  // ---- X18 sites 3+4: goldens below were produced by EXECUTING the
  // reference's own functions (chatbot.py:326-419 get_health_summary,
  // source sha256 3077a84a45852bba…; tools/safe_places_to_sleep.py:246-303
  // get_safety_tips + format_sleep_response, sha256 60cc9ab2c4dd3b93…) on
  // these exact fixtures via tools/gen_fmt_goldens.py — byte parity, not
  // hand-transcription.

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("health summary matches chatbot.py get_health_summary byte-for-byte") {
    import spark.implicits._
    val meds = Seq(
      (1, "Metformin", "500mg", "twice daily", Option("blood sugar control"),
        Option(Seq("08:00", "20:00"))),
      (2, "Lisinopril", "10mg", "once daily", Option.empty[String],
        Option.empty[Seq[String]]))
      .toDF("ord", "name", "dosage", "frequency", "purpose", "reminder_times")
    // deliberately ASCENDING input order: the formatter itself must apply
    // the reference's logged_at/measured_at DESC (limit 10) ordering
    val symptoms = Seq(
      ("Cough", 2, Option("3 days"), Option.empty[String], ts("2024-01-08 21:15:00")),
      ("Fatigue", 5, Option.empty[String], Option.empty[String], ts("2024-01-09 09:00:00")),
      ("Headache", 8, Option("2 hours"), Option("throbbing, right side"),
        ts("2024-01-10 14:30:00")))
      .toDF("symptom", "severity", "duration", "description", "logged_at")
    val vitals = Seq(
      ("heart_rate", Option.empty[Int], Option.empty[Int], Option(72.5),
        Option("bpm"), false, Option("resting, after coffee"), ts("2024-01-09 08:00:00")),
      ("blood_pressure", Option(150), Option(95), Option.empty[Double],
        Option.empty[String], true, Option.empty[String], ts("2024-01-10 08:00:00")))
      .toDF("measurement_type", "systolic", "diastolic", "value", "unit",
        "is_abnormal", "notes", "measured_at")
    val plans = Seq(
      (1, "Diabetes Management", Option("Type 2 Diabetes"), Option("Dr. Chen"),
        Option(ts("2024-02-15 00:00:00"))),
      (2, "General Wellness", Option.empty[String], Option.empty[String],
        Option.empty[java.sql.Timestamp]))
      .toDF("ord", "title", "condition", "primary_provider", "next_appointment")
    val got = resfmt.healthSummary(meds, symptoms, vitals, plans).head().getString(0)
    val expected =
      "**Note**: This health information was self-reported during the conversation and should be verified by healthcare professionals.\n" +
      "\n" +
      "### 💊 Medications Tracked\n" +
      "- **Metformin** (500mg)\n" +
      "  - Frequency: twice daily\n" +
      "  - Purpose: blood sugar control\n" +
      "  - Reminder times: 08:00, 20:00\n" +
      "- **Lisinopril** (10mg)\n" +
      "  - Frequency: once daily\n" +
      "\n" +
      "### 📋 Symptoms Logged\n" +
      "- 🔴 **Headache** (Severity: 8/10)\n" +
      "  - Duration: 2 hours\n" +
      "  - Notes: throbbing, right side\n" +
      "  - Logged: 2024-01-10 14:30\n" +
      "- 🟡 **Fatigue** (Severity: 5/10)\n" +
      "  - Logged: 2024-01-09 09:00\n" +
      "- 🟢 **Cough** (Severity: 2/10)\n" +
      "  - Duration: 3 days\n" +
      "  - Logged: 2024-01-08 21:15\n" +
      "\n" +
      "### ❤️ Vital Signs Recorded\n" +
      "- **Blood Pressure**: 150/95 mmHg ⚠️ **ABNORMAL**\n" +
      "  - Measured: 2024-01-10 08:00\n" +
      "- **Heart Rate**: 72.5 bpm\n" +
      "  - Measured: 2024-01-09 08:00\n" +
      "  - Notes: resting, after coffee\n" +
      "\n" +
      "### 📖 Active Care Plans\n" +
      "- **Diabetes Management**\n" +
      "  - Condition: Type 2 Diabetes\n" +
      "  - Provider: Dr. Chen\n" +
      "  - Next Appointment: 2024-02-15\n" +
      "- **General Wellness**\n" +
      ""
    assert(got == expected)
    // all-empty input: the reference returns "" (no note, no headers)
    val none = resfmt.healthSummary(meds.limit(0), symptoms.limit(0),
      vitals.limit(0), plans.limit(0)).head().getString(0)
    assert(none == "")
  }

  private def sleepFixture = {
    import spark.implicits._
    Seq((
      "32.7100, -117.1600", "2024-01-10 22:30", 2.0, "clear",
      "✅ Weather is mild - outdoor options are viable tonight", 2,
      Seq(
        ("Jewish Family Service Safe Parking", "safe_parking",
          "Overnight parking program", "Gated lot, restrooms, case management",
          "https://example.org/safe-parking"),
        ("Old Town Transit Center", "transit_hubs", "24-hour transit hub",
          "Well-lit, security presence", "")),
      resfmt.safetyTips, Option.empty[String], Option.empty[String]))
      .toDF("location", "current_time", "search_radius_miles",
        "weather_condition", "weather_recommendation", "options_found",
        "opts", "safety_tips", "error", "recommendation")
      .withColumn("options", org.apache.spark.sql.functions.expr(
        "transform(opts, o -> named_struct('heading', o._1, 'type', o._2, " +
          "'category', o._3, 'info', o._4, 'source_url', o._5))"))
  }

  test("sleep response matches format_sleep_response byte-for-byte") {
    val got = resfmt.formatSleepResponse(sleepFixture).head().getString(0)
    val expected =
      "\n" +
      "🌙 **Safe Places to Sleep Near 32.7100, -117.1600**\n" +
      "⏰ **Current Time**: 2024-01-10 22:30\n" +
      "📍 **Search Radius**: 2.0 miles\n" +
      "\n" +
      "**Weather Condition**: CLEAR\n" +
      "✅ Weather is mild - outdoor options are viable tonight\n" +
      "\n" +
      "**Found 2 Safe Sleep Options:**\n" +
      "\n" +
      "1. **Jewish Family Service Safe Parking** (Safe Parking)\n" +
      "   Overnight parking program\n" +
      "   ℹ️ Gated lot, restrooms, case management\n" +
      "   🔗 [More Info](https://example.org/safe-parking)\n" +
      "\n" +
      "2. **Old Town Transit Center** (Transit Hubs)\n" +
      "   24-hour transit hub\n" +
      "   ℹ️ Well-lit, security presence\n" +
      "\n" +
      "\n" +
      "**Safety Tips:**\n" +
      "• 🔦 Stay in well-lit, populated areas when possible\n" +
      "• 🤝 Sleep near others or in groups for safety\n" +
      "• 📱 Keep your phone charged and accessible\n" +
      "• 🎒 Keep your belongings secure and within reach\n" +
      "• ⏰ Avoid sleeping in the same spot every night\n" +
      "• 🚨 Trust your instincts - if a place doesn't feel safe, move\n" +
      "• 📞 Know local emergency numbers and shelter hotlines\n" +
      "• ☀️ Be aware of sunrise/early activity to stay safe during vulnerable hours\n"
    assert(got == expected)
  }

  test("sleep response: zero-options and error paths match the reference") {
    import org.apache.spark.sql.functions._
    val noOpt = sleepFixture
      .withColumn("options_found", lit(0))
      .withColumn("options", expr("slice(options, 1, 0)"))
    val gotNoOpt = resfmt.formatSleepResponse(noOpt).head().getString(0)
    assert(gotNoOpt.contains(
      "⚠️ **No specific options found in search.**\n" +
        "💡 **Alternatives**: Call 211 for local shelter/safe parking programs\n") &&
      gotNoOpt.endsWith("vulnerable hours\n") && !gotNoOpt.contains("1. **"))
    val err = sleepFixture
      .withColumn("error", lit("Geocoding service unavailable"))
      .withColumn("recommendation",
        lit("Try again with a street address or cross-streets"))
    val gotErr = resfmt.formatSleepResponse(err).head().getString(0)
    assert(gotErr ==
      "❌ Error: Geocoding service unavailable\n" +
        "💡 Try again with a street address or cross-streets\n")
  }
}

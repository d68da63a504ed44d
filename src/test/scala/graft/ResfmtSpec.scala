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
}

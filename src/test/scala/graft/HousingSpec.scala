package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Housing

/** FIXTURES.md §C1: the reference's five demo searches
  * (backend/search_housing.py:88-152) as goldens over the real CSV, plus
  * the summary block — whose numbers (218,879 total units, min −1,
  * max 2,898) match BASELINE.md's published figures exactly. Golden counts
  * independently computed with DuckDB over the same file. */
class HousingSpec extends AnyFunSuite {
  import TestSpark._

  lazy val docs = Housing.fromCsv(spark,
    "/root/reference/backend/datasets/HousingElements_SDCounty_2021_2029_3908156892941684000.csv")
    .cache()

  test("corpus loads with the nested record shape") {
    assert(docs.count() == 17358)
    val f = docs.schema.fieldNames.toSet
    assert(Set("id", "jurisdiction", "vacancy_status", "units", "zoning",
      "area", "searchable_text").subsetOf(f))
  }

  test("demo q1: vacant high-density, limit 5") {
    assert(Housing.search(docs, zoningType = Some("High Density Residential"),
      vacantOnly = true, limit = 5).count() == 5)
    assert(Housing.search(docs, zoningType = Some("High Density Residential"),
      vacantOnly = true, limit = 100000).count() == 108)
  }

  test("demo q2: City of San Diego with >= 50 units") {
    assert(Housing.search(docs, jurisdiction = Some("City of San Diego"),
      minUnits = Some(50), limit = 100000).count() == 527)
  }

  test("demo q3 + q4: commercial and mixed-use zoning") {
    assert(Housing.search(docs, zoningType = Some("Commercial"),
      limit = 100000).count() == 5416)
    assert(Housing.search(docs, zoningType = Some("Mixed Use"),
      limit = 100000).count() == 654)
  }

  test("demo q5: searchable_text contains 'transit'") {
    assert(Housing.search(docs, query = Some("transit"),
      limit = 100000).count() == 93)
  }

  test("summary block matches BASELINE.md's published numbers") {
    val s = Housing.summary(docs).head()
    assert(s.getAs[Long]("total_records") == 17358)
    assert(s.getAs[Long]("total_units") == 218879)
    assert(s.getAs[Long]("min_units") == -1)   // data error kept verbatim
    assert(s.getAs[Long]("max_units") == 2898)
    assert(s.getAs[Long]("n_jurisdictions") == 19)
    assert(s.getAs[Long]("n_vacant") == 3166)
  }
}

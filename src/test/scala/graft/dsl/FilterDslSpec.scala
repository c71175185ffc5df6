package graft.dsl

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dsl.FilterDsl._

/** Behavioural contracts from the reference's filter-DSL tests
  * (tests/test_validation.py:156-245, docs/filters.md). */
class FilterDslSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (2019, "Gas", 1.0), (2020, "Coal", 2.0), (2021, "gas", 3.0),
    (2022, "Oil", 4.0), (2022, "GAS", 5.0))
    .toDF("year", "fuel", "value")

  private def run(json: String): Set[Double] =
    df.where(FilterDsl.compileJson(json, df.schema))
      .select("value").as[Double].collect().toSet

  test("flat filters are nested to eq") {
    assert(run("""{"year": 2022}""") == Set(4.0, 5.0))
  }

  test("nested multi-op filters AND within a field") {
    assert(run("""{"year": {"gte": 2020, "lt": 2022}}""") == Set(2.0, 3.0))
  }

  test("text eq is case-insensitive (COLLATE NOCASE parity)") {
    assert(run("""{"fuel": "gas"}""") == Set(1.0, 3.0, 5.0))
  }

  test("like is case-insensitive and text-only") {
    assert(run("""{"fuel": {"like": "g%"}}""") == Set(1.0, 3.0, 5.0))
    val e = intercept[DslException](run("""{"year": {"like": "20%"}}"""))
    assert(e.getMessage.contains("not allowed"))
  }

  test("$or list form: base AND (g1 OR g2)") {
    val got = run("""{"year": {"gt": 2019},
                      "$or": [{"fuel": "Gas"}, {"fuel": "Coal"}]}""")
    assert(got == Set(2.0, 3.0, 5.0))
  }

  test("$or dict form tolerated as single-field groups") {
    assert(run("""{"$or": {"fuel": {"like": "Coal%"}, "year": 2019}}""") == Set(1.0, 2.0))
  }

  test("string values are cast to the column dtype") {
    assert(run("""{"year": {"gte": "2022"}}""") == Set(4.0, 5.0))
  }

  test("unknown column rejected") {
    val e = intercept[DslException](run("""{"nope": 1}"""))
    assert(e.getMessage.contains("unknown column"))
  }

  test("invalid operator rejected") {
    val e = intercept[DslException](run("""{"year": {"betweenish": 1}}"""))
    assert(e.getMessage.contains("invalid operator"))
  }

  test("like requires a string pattern") {
    val e = intercept[DslException](run("""{"fuel": {"like": 5}}"""))
    assert(e.getMessage.contains("requires a string"))
  }

  test("uncastable value rejected") {
    val e = intercept[DslException](run("""{"year": "twenty"}"""))
    assert(e.getMessage.contains("cannot cast"))
  }

  test("non-queryable column rejected when a queryable set is given") {
    val e = intercept[DslException](
      validate(parseJson("""{"fuel": "Gas"}"""), df.schema, Some(Set("year"))))
    assert(e.getMessage.contains("not queryable"))
  }

  test("empty filters compile to true") {
    assert(run("""{}""") == Set(1.0, 2.0, 3.0, 4.0, 5.0))
  }
}

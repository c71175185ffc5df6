package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.SparkTestSession
import graft.etl.Validate.ValidationError

/** Validation contracts (reference: validation.py:67-150,
  * tests/test_validation.py:110-149). */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("fuel", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  test("valid frame passes, dtypes coerced, suppression symbols become null") {
    val df = Seq(("0", "la", "2019", "Gas", "1.5"), ("1", "lb", "2019", "Oil", ".."))
      .toDF("row", "label", "year", "fuel", "value")
    val got = Validate.validateSchema(df, "1.1", schema)
    assert(got.schema("year").dataType == IntegerType)
    assert(got.schema("value").dataType == DoubleType)
    val vals = got.orderBy("row").select("value").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.toSeq == Seq(Some(1.5), None))
  }

  test("unexpected columns are a hard error") {
    val df = Seq((0, "la", 2019, 1.0, "zap")).toDF("row", "label", "year", "value", "mystery")
    val e = intercept[ValidationError](Validate.validateSchema(df, "1.1", schema))
    assert(e.getMessage.contains("mystery"))
  }

  test("all-null column after numeric coercion is an error") {
    val df = Seq(("0", "la", "not_a_year", "Gas", "1.0"))
      .toDF("row", "label", "year", "fuel", "value")
    val e = intercept[ValidationError](Validate.validateSchema(df, "1.1", schema))
    assert(e.getMessage.contains("all-null after"))
  }

  test("nulls in a non-nullable column are an error") {
    val df = Seq((0, Option.empty[String], 2019, 1.0)).toDF("row", "label", "year", "value")
    val e = intercept[ValidationError](Validate.validateSchema(df, "1.1", schema))
    assert(e.getMessage.contains("non-nullable"))
  }

  test("duplicate composite keys are an error (row/label excluded from key)") {
    // same (table, year, fuel) twice with different row/label -> dup key
    val df = Seq((0, "la", 2019, "Gas", 1.0), (1, "lb", 2019, "Gas", 2.0))
      .toDF("row", "label", "year", "fuel", "value")
    val e = intercept[ValidationError](Validate.validateSchema(df, "1.1", schema))
    assert(e.getMessage.contains("duplicate composite keys"))
    // distinct fuels -> fine
    val ok = Seq((0, "la", 2019, "Gas", 1.0), (1, "lb", 2019, "Oil", 2.0))
      .toDF("row", "label", "year", "fuel", "value")
    assert(Validate.validateSchema(ok, "1.1", schema).count() == 2)
  }
}

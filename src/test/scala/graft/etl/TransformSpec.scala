package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.etl.Config.TableConfig
import graft.io.WorkbookReader.Workbook

/** Transform pipeline contracts from the reference's tests
  * (tests/test_transformations.py, FIXTURES.md §3-§5). */
class TransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // sheet: title rows, header, 3 data rows x 2 year columns
  private val sheet = Vector(
    Vector("Table 1.1 Energy", "", ""),
    Vector("ROWHDR", "2019", "2020"),
    Vector("Coal total [note 1]", "1", "2"),
    Vector("Gas total", "3", "4"),
    Vector("Oil total", "5", "6"))

  private val template = Seq(
    (0, "la", "ktoe", "Coal"), (1, "lb", "ktoe", "Gas"), (2, "lc", "ktoe", "Oil"))
    .toDF("row", "label", "unit", "fuel")

  test("template path: melt cardinality = template rows x year cols") {
    val cfg = TableConfig("1.1", Config.SingleSheet, sheetName = Some("1.1"))
    val got = Transform.processSheetToFrame(spark,
      Workbook(Vector("1.1" -> sheet)), cfg, Some(template))
    assert(got.count() == 6) // 3 ids x 2 years
    val gas2020 = got.filter($"fuel" === "Gas" && $"year" === "2020")
      .select("value").collect().head.getString(0)
    assert(gas2020 == "4")
    assert(got.columns.toSet ==
      Set("row", "label", "unit", "fuel", "year", "value"))
  }

  test("manual-mapping path: id column renamed, label duplicated, unit const") {
    val cfg = TableConfig("1.2", Config.SingleSheet, sheetName = Some("s"),
      idVarName = Some("fuel"), unit = Some("GWh"))
    val got = Transform.processSheetToFrame(spark,
      Workbook(Vector("s" -> sheet)), cfg, None)
    assert(got.count() == 6)
    val row = got.filter($"year" === "2019" && $"label" === "Gas total").head()
    assert(row.getAs[String]("fuel") == "Gas total")
    assert(row.getAs[String]("unit") == "GWh")
    assert(row.getAs[String]("value") == "3")
  }

  test("note tags cleaned in dimension columns but never in label") {
    val cfg = TableConfig("1.2", Config.SingleSheet, sheetName = Some("s"),
      idVarName = Some("fuel"))
    val got = Transform.processSheetToFrame(spark,
      Workbook(Vector("s" -> sheet)), cfg, None)
    val labels = got.select("label").as[String].collect().toSet
    val fuels = got.select("fuel").as[String].collect().toSet
    assert(labels.contains("Coal total [note 1]")) // label untouched
    assert(fuels.contains("Coal total"))           // dimension cleaned
  }

  test("transpose_first: years-down sheet flips to years-across") {
    val down = Vector(
      Vector("YEAR", "Coal", "Gas"),
      Vector("2019", "1", "3"),
      Vector("2020", "2", "4"))
    val cfg = TableConfig("2.1", Config.SingleSheet, sheetName = Some("s"),
      transposeFirst = true, idVarName = Some("fuel"), varName = "year")
    val got = Transform.processSheetToFrame(spark,
      Workbook(Vector("s" -> down)), cfg, None)
    // after transpose: rows = Coal/Gas, columns = 2019/2020
    assert(got.count() == 4)
    val coal2020 = got.filter($"fuel" === "Coal" && $"year" === "2020")
      .select("value").as[String].head()
    assert(coal2020 == "2")
  }

  test("multi-sheet: sheet name becomes the year dimension, frames union") {
    val s2019 = Vector(Vector("ROWHDR", "Gas", "Coal"),
      Vector("r1", "1", "3"), Vector("r2", "2", "4"))
    val s2020 = Vector(Vector("ROWHDR", "Gas", "Coal"),
      Vector("r1", "5", "7"), Vector("r2", "6", "8"))
    val meta = Vector(Vector("only"), Vector("one"))
    val cfg = TableConfig("5.1", Config.MultiSheet,
      sheetRegex = Some("^20"), idVarName = Some("series"))
    val got = Transform.processMultiSheetsToFrame(spark,
      Workbook(Vector("2019" -> s2019, "2020" -> s2020, "meta" -> meta)),
      cfg, None)
    assert(got.count() == 8) // 2 rows x 2 fuels x 2 sheets
    assert(got.select("year").as[String].collect().toSet == Set("2019", "2020"))
    val v = got.filter($"year" === "2020" && $"fuel" === "Coal" && $"label" === "r2")
      .select("value").as[String].head()
    assert(v == "8")
  }

  test("stacked-summaries custom flow: ffill year tags + modular block join") {
    // two stacked year blocks of 2 data rows each, separated by a title row
    val sheet = Vector(
      Vector("BLOCK", "A", "B"),
      Vector("r1", "1", "2"),      // rows 0-1: first (untagged) block -> 2019
      Vector("r2", "3", "4"),
      Vector("2020 summary", "", ""),
      Vector("r1", "5", "6"),
      Vector("r2", "7", "8"))
    val template = Seq((0, "row one"), (1, "row two")).toDF("row", "label")
    val cfg = Config.TableConfig("5.6", Config.Custom("stacked_summaries"),
      sheetName = Some("s"), firstYear = Some("2019"))
    val got = Transform.customFlows("stacked_summaries")(
      spark, Workbook(Vector("s" -> sheet)), cfg, Some(template))
    // title row excluded by the summary filter; block rows join the
    // template on row % blockSize and carry the filled year
    val years = got.select("year").collect().map(_.getString(0)).toSet
    assert(years == Set("2019", "2020"))
    val r = got.filter($"year" === "2020" && $"label" === "row two")
      .select("A").collect()
    assert(r.length == 1 && r.head.getString(0) == "7")
  }

  test("postprocess hook: year_numeric drops unparseable years") {
    val dirty = Vector(Vector("ROWHDR", "2019", "Notes"),
      Vector("r1", "1", "x"))
    val cfg = TableConfig("f.2", Config.SingleSheet, sheetName = Some("s"),
      idVarName = Some("series"), postprocess = Some("year_numeric"))
    val got = Transform.processSheetToFrame(spark,
      Workbook(Vector("s" -> dirty)), cfg, None)
    assert(got.select("year").as[String].collect().toSeq == Seq("2019"))
  }
}

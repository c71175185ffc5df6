package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.io.WorkbookReader._

/** Header-inference contracts from the reference's reader tests
  * (tests/test_read_and_wrangle_wb.py, FIXTURES.md §2). */
class WorkbookReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val titled: Sheet = Vector(
    Vector("Main Title", "", ""),
    Vector("Subtitle", "", ""),
    Vector("ROWHDR", "A", "B"),
    Vector("r1", "1", "2"),
    Vector("r2", "3", "4"))

  test("header row inferred past title rows (col B blank until header)") {
    assert(inferHeaderRow(titled) == 2)
  }

  test("multi-header adds one row") {
    assert(inferHeaderRow(titled, hasMultiHeaders = true) == 3)
  }

  test("fixed header overrides inference") {
    assert(inferHeaderRow(titled, fixedHeader = Some(0)) == 0)
  }

  test("wrangle drops title rows, names columns, attaches 0-based row") {
    val wb = Workbook(Vector("s" -> titled))
    val df = read(spark, wb)("s")
    assert(df.columns.toSeq == Seq("row", "ROWHDR", "A", "B"))
    val rows = df.orderBy("row").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 0 && rows(0).getString(1) == "r1")
    assert(rows(1).getInt(0) == 1 && rows(1).getString(3) == "4")
  }

  test("single-column sheets are excluded as non-data") {
    val wb = Workbook(Vector(
      "meta" -> Vector(Vector("only"), Vector("one"), Vector("col")),
      "s" -> titled))
    assert(read(spark, wb).keySet == Set("s"))
  }

  test("skip_sheets excludes by name; missing sheet raises") {
    val wb = Workbook(Vector("s" -> titled, "t" -> titled))
    assert(read(spark, wb, skipSheets = Set("t")).keySet == Set("s"))
    intercept[NoSuchElementException](wb("missing"))
  }

  test("csv line splitting handles quotes and embedded commas") {
    assert(splitCsvLine("""a,"b,c",d""") == Vector("a", "b,c", "d"))
    assert(splitCsvLine("x,\"say \"\"hi\"\"\",y") == Vector("x", "say \"hi\"", "y"))
    assert(splitCsvLine("plain") == Vector("plain"))
  }
}

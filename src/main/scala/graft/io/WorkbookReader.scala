package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side workbook reader with header inference.
  *
  * The reference reads GOV.UK Excel workbooks with pandas and infers the
  * header row by re-parsing with an increasing header index until column B
  * stops being "Unnamed" (reference: read_and_wrangle_wb,
  * read_write.py:12-92). Sheets are tiny (a few hundred cells), so all of
  * this is pure driver logic; only the final frame enters Spark, with the
  * 0-based `row` position materialized *before* parallelization so row
  * identity survives any shuffle (SURVEY.md §7.4 risk 1).
  *
  * The physical decode is abstracted as a sheet matrix
  * `Vector[Vector[String]]` with two concrete sources: a real .xlsx
  * decoder ([[Xlsx]], dependency-free zip+StAX) and a CSV directory
  * (one file per sheet) for plain-text fixtures.
  */
object WorkbookReader {

  type Sheet = Vector[Vector[String]]
  final case class Workbook(sheets: Vector[(String, Sheet)]) {
    def sheetNames: Vector[String] = sheets.map(_._1)
    def apply(name: String): Sheet =
      sheets.collectFirst { case (n, s) if n == name => s }
        .getOrElse(throw new NoSuchElementException(s"no sheet '$name'"))
  }

  private def isBlank(s: String): Boolean =
    s == null || s.trim.isEmpty || s.trim.toLowerCase.startsWith("unnamed")

  /** Infer the 0-based header row: first row whose second cell (column B)
    * is non-blank — the pandas loop re-parses until col B is not Unnamed
    * (reference: read_write.py:67-79). `hasMultiHeaders` skips one extra
    * row (reference: read_write.py:80-84); `fixedHeader` overrides. */
  def inferHeaderRow(sheet: Sheet, hasMultiHeaders: Boolean = false,
                     fixedHeader: Option[Int] = None): Int =
    fixedHeader.getOrElse {
      val base = sheet.indexWhere(r => r.length > 1 && !isBlank(r(1)))
      val h = if (base < 0) 0 else base
      if (hasMultiHeaders) h + 1 else h
    }

  /** Wrangle one sheet: drop title rows above the inferred header, name
    * columns from the header row, attach the 0-based `row` position. */
  def wrangleSheet(sheet: Sheet, hasMultiHeaders: Boolean = false,
                   fixedHeader: Option[Int] = None): Option[(Vector[String], Vector[Vector[String]])] = {
    val h = inferHeaderRow(sheet, hasMultiHeaders, fixedHeader)
    if (h >= sheet.length) return None
    val header = sheet(h).map(_.trim)
    // single-column sheets are non-data (reference: read_write.py:60-64)
    if (header.count(_.nonEmpty) <= 1) return None
    val width = header.length
    val data = sheet.drop(h + 1).map(_.padTo(width, "").take(width))
    Some((header, data))
  }

  /** Read selected sheets of a workbook into DataFrames (all columns
    * string-typed at this stage — coercion happens in validation, matching
    * the reference order of operations). Adds the `row` position column. */
  def read(spark: SparkSession, wb: Workbook,
           sheetNames: Option[Seq[String]] = None,
           skipSheets: Set[String] = Set.empty,
           hasMultiHeaders: Boolean = false,
           fixedHeader: Option[Int] = None): Map[String, DataFrame] = {
    val wanted = sheetNames.getOrElse(wb.sheetNames).filterNot(skipSheets)
    wanted.flatMap { name =>
      wrangleSheet(wb(name), hasMultiHeaders, fixedHeader).map {
        case (header, data) =>
          val schema = StructType(
            StructField("row", IntegerType, nullable = false) +:
              header.map(c => StructField(c, StringType, nullable = true)))
          val rows = data.zipWithIndex.map { case (r, i) =>
            Row.fromSeq(i +: r.map(v => if (v == null || v.isEmpty) null else v))
          }
          name -> spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), schema)
      }
    }.toMap
  }

  /** Concrete loader: a real .xlsx workbook via the dependency-free
    * [[Xlsx]] codec (the reference's pandas read_excel analogue). */
  def fromXlsx(path: String): Workbook = Xlsx.read(path)

  /** Concrete loader: a directory of CSV files, one per sheet, sheet name =
    * file basename. Simple quoted-CSV split, driver-side. */
  def fromCsvDir(dir: String): Workbook = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    Workbook(files.toVector.map { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8")
      val rows = try lines.getLines().toVector.map(splitCsvLine)
      finally lines.close()
      f.getName.stripSuffix(".csv") -> rows
    })
  }

  private[io] def splitCsvLine(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQuotes = false
        else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.toString; cur.clear()
        case _   => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }
}

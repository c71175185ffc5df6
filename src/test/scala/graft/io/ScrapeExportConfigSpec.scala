package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.etl.Config

class ScrapeSpec extends AnyFunSuite {

  private val page =
    """<html><body>
      |<a href="/docs/dukes_1.1.xlsx">DUKES 1.1: Aggregate energy balances</a>
      |<a href="https://host/dukes_5.6.xls"><span>DUKES 5.6 electricity</span></a>
      |<a href="/docs/annex_J.1.xlsx">DUKES J.1 annex</a>
      |<a href="/not_data.pdf">Some PDF 9.9</a>
      |</body></html>""".stripMargin

  test("chapter scraper extracts table numbers, descriptions, absolute urls") {
    val got = Scrape.scrapeUrls("dukes", "https://gov.example/chapter1", _ => page)
    assert(got.keySet == Set("1.1", "5.6", "J.1"))
    assert(got("1.1").url == "https://gov.example/docs/dukes_1.1.xlsx")
    assert(got("5.6").url == "https://host/dukes_5.6.xls")
    assert(got("1.1").description.contains("Aggregate energy balances"))
  }

  test("table_to_chapter: numeric, key-form, and letter-table exceptions") {
    assert(Scrape.tableToChapter("1.2.3") == "chapter_1")
    assert(Scrape.tableToChapter("5.6") == "chapter_5")
    assert(Scrape.tableToChapter("dukes_1_2_3") == "chapter_1")
    assert(Scrape.tableToChapter("I.1") == "chapter_1")
    assert(Scrape.tableToChapter("J.1") == "chapter_1")
    assert(Scrape.tableToChapter("E.1") == "chapter_3")
    assert(Scrape.tableToChapter("F.3") == "chapter_3")
    assert(Scrape.tableToChapter("F.2") == "chapter_4")
    intercept[IllegalArgumentException](Scrape.tableToChapter("Z.9"))
  }

  test("unknown collection rejected") {
    intercept[IllegalArgumentException](
      Scrape.scrapeUrls("nope", "u", _ => page))
  }
}

class ExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val prod = Seq(
    ("1.1", 2019, "Gas", Some(1.5), None: Option[String], 1L),
    ("1.1", 2020, "Coal", Some(2.5), None, 2L),
    ("2.1", 2019, "Oil", Some(3.5), None, 3L))
    .toDF("table_name", "year", "fuel", "value", "sector", "row_uid")

  test("exportTable writes ONE csv with the reference naming, shaped") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "1.1", out, "csv", date = "2026-08-12")
    assert(path.endsWith("dukes_1_1_2026-08-12.csv"))
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.head == "table_name,year,fuel,value") // service + all-null cols gone
    assert(lines.length == 3)
  }

  test("exportAll workbook flavor: one csv per table in a dated dir") {
    val out = Files.createTempDirectory("graft_export_").toString
    val paths = Export.exportAll(prod, "dukes", out, "workbook", date = "2026-08-12")
    assert(paths.map(_.split("/").last).sorted == Seq("1.1.csv", "2.1.csv"))
  }

  test("parquet export round-trips") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "2.1", out, "parquet")
    val back = spark.read.parquet(path)
    assert(back.count() == 1)
    assert(back.select("fuel").as[String].head() == "Oil")
  }

  test("jsonl export: one JSON object per line, shaped, round-trips") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "1.1", out, "jsonl", date = "2026-08-12")
    assert(path.endsWith("dukes_1_1_2026-08-12.jsonl"))
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.length == 2 && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    val back = spark.read.json(path)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("fuel", "table_name", "value", "year"))
    assert(back.where($"fuel" === "Gas").count() == 1)
  }

  test("orc export round-trips") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "2.1", out, "orc")
    assert(path.endsWith(".orc"))
    val back = spark.read.orc(path)
    assert(back.count() == 1)
    assert(back.select("fuel").as[String].head() == "Oil")
  }

  test("avro export round-trips through the container-file reader, typed") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "1.1", out, "avro", date = "2026-08-12")
    assert(path.endsWith("dukes_1_1_2026-08-12.avro"))
    val (cols, rows) = Avro.read(path)
    assert(cols == Seq("table_name", "year", "fuel", "value")) // shaped like csv
    assert(rows.length == 2)
    val gas = rows.find(_(2) == "Gas").get
    assert(gas == Seq("1.1", 2019, "Gas", 1.5)) // int stays int, double double
  }

  test("avro codec: nulls, timestamps, dates and binary survive; bad names rejected") {
    val ts = java.sql.Timestamp.valueOf("2026-08-12 03:04:05.123456")
    val d = java.sql.Date.valueOf("2026-08-12")
    val df = Seq((1L, Some("x"), Some(ts), Some(d), Some(Array[Byte](7, 8))),
        (2L, None, None, None, None))
      .toDF("id", "s", "ts", "day", "blob")
    val out = Files.createTempDirectory("graft_avro_").toString + "/t.avro"
    Avro.write(out, df)
    val (cols, rows) = Avro.read(out)
    assert(cols == Seq("id", "s", "ts", "day", "blob"))
    val r1 = rows.find(_.head == 1L).get
    assert(r1(2) == ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L) // micros
    assert(r1(3) == d.toLocalDate.toEpochDay.toInt)
    assert(r1(4).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](7, 8))
    val r2 = rows.find(_.head == 2L).get
    assert(r2.tail.forall(_ == null))
    intercept[IllegalArgumentException] {
      Avro.write(out, df.withColumnRenamed("s", "bad-name"))
    }
  }

  test("xlsx export round-trips through the decoder, sheet named by table") {
    val out = Files.createTempDirectory("graft_export_").toString
    val path = Export.exportTable(prod, "dukes", "1.1", out, "xlsx", date = "2026-08-12")
    assert(path.endsWith("dukes_1_1_2026-08-12.xlsx"))
    val wb = WorkbookReader.fromXlsx(path)
    assert(wb.sheetNames == Vector("1.1"))
    val sheet = wb("1.1")
    assert(sheet.head == Vector("table_name", "year", "fuel", "value"))
    assert(sheet(1) == Vector("1.1", "2019", "Gas", "1.5"))
    assert(sheet.length == 3)
  }

  test("bulk xlsx export: ONE workbook, one sheet per table") {
    val out = Files.createTempDirectory("graft_export_").toString
    val paths = Export.exportAll(prod, "dukes", out, "xlsx", date = "2026-08-12")
    assert(paths.map(_.split("/").last) == Seq("dukes_2026-08-12.xlsx"))
    val wb = WorkbookReader.fromXlsx(paths.head)
    assert(wb.sheetNames == Vector("1.1", "2.1"))
    assert(wb("2.1")(1)(2) == "Oil")
  }
}

class ConfigSpec extends AnyFunSuite {

  test("config json parses into typed table configs") {
    val cfgs = Config.parse(
      """{"1.1": {"f": "single_sheet", "sheet_name": "1.1",
                  "drop_cols": ["Notes"], "has_multi_headers": true},
          "5.1": {"f": "multi_sheet", "sheet_regex": "^20",
                  "transpose_first": true, "fixed_header": 2},
          "5.6": {"f": "process_dukes_5_6"}}""")
    assert(cfgs("1.1").kind == Config.SingleSheet)
    assert(cfgs("1.1").dropCols == Seq("Notes"))
    assert(cfgs("1.1").hasMultiHeaders)
    assert(cfgs("5.1").kind == Config.MultiSheet)
    assert(cfgs("5.1").transposeFirst && cfgs("5.1").fixedHeader.contains(2))
    assert(cfgs("5.6").kind == Config.Custom("process_dukes_5_6"))
  }

  test("table-name normalisation: fused letter suffix -> dotted upper") {
    assert(Config.normalizeTableName("4.4a") == "4.4.A")
    assert(Config.normalizeTableName("1.3.b") == "1.3.B")
    assert(Config.normalizeTableName("5.6") == "5.6")
    assert(Config.normalizeTableName("J.1") == "J.1")
  }

  test("data-sheet predicate: numeric default, custom regex, bad regex") {
    assert(Config.isDataSheet("1.1", None))
    assert(Config.isDataSheet("5.6.J", None))
    assert(!Config.isDataSheet("Contents", None))
    assert(Config.isDataSheet("Contents", Some("^Cont")))
    intercept[IllegalArgumentException](Config.isDataSheet("x", Some("[")))
  }
}

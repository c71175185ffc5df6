package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Dependency-free XLSX codec: write/read round-trip, cell typing, sparse
  * layouts, and the sharedStrings path that Excel/pandas-produced files
  * use. */
class XlsxSpec extends AnyFunSuite {

  private def tmpFile(): String =
    Files.createTempDirectory("graft_xlsx_").resolve("t.xlsx").toString

  test("write/read round-trip preserves values, types become strings") {
    val path = tmpFile()
    Xlsx.write(path, Seq(
      "1.1" -> Seq(
        Seq("label", "year", "value", "flag"),
        Seq("Coal & \"coke\" <net>", 2019, 1.5, true),
        Seq("Gas", 2020L, null, false)),
      "notes" -> Seq(Seq("only one cell"))))
    val wb = Xlsx.read(path)
    assert(wb.sheetNames == Vector("1.1", "notes"))
    val s = wb("1.1")
    assert(s(0) == Vector("label", "year", "value", "flag"))
    assert(s(1) == Vector("Coal & \"coke\" <net>", "2019", "1.5", "TRUE"))
    // null cell is a gap; trailing width only reaches the last present cell
    assert(s(2) == Vector("Gas", "2020", "", "FALSE"))
    assert(wb("notes") == Vector(Vector("only one cell")))
  }

  test("XML-illegal control chars _xHHHH_-encode on write and decode on read") {
    // scraped free text carries NUL/control bytes; written raw they make
    // the worksheet part XML-1.0-malformed (Excel and conforming parsers
    // reject it — our own StAX reader throws). Literal text that looks
    // like an escape must survive the round-trip unchanged.
    val path = tmpFile()
    Xlsx.write(path, Seq("s" -> Seq(
      Seq("a\u0000b\u001Fc\u000B", "_x0041_ not an A", "tab\tok\nnewline"))))
    val s = Xlsx.read(path)("s")
    assert(s(0) == Vector("a\u0000b\u001Fc\u000B", "_x0041_ not an A", "tab\tok\nnewline"))
    // and the raw worksheet bytes contain no illegal control characters
    val zf = new java.util.zip.ZipFile(path)
    try {
      val e = zf.getEntry("xl/worksheets/sheet1.xml")
      val xml = new String(zf.getInputStream(e).readAllBytes(), UTF_8)
      assert(!xml.exists(c => c < 0x20 && c != '\t' && c != '\n' && c != '\r'), "raw control char leaked")
      assert(xml.contains("_x0000_") && xml.contains("_x005F_x0041_"))
    } finally zf.close()
  }

  test("empty and skipped rows keep their absolute positions") {
    val path = tmpFile()
    Xlsx.write(path, Seq("s" -> Seq(
      Seq("Title", null),
      Seq(),                       // blank spacer row
      Seq("hdr_a", "hdr_b"),
      Seq("x", "y"))))
    val got = Xlsx.read(path)("s")
    assert(got.length == 4)
    assert(got(1).isEmpty)
    assert(got(2) == Vector("hdr_a", "hdr_b"))
    // header inference sees the same shape as the CSV source
    assert(WorkbookReader.inferHeaderRow(got) == 2)
  }

  test("sheet names are sanitized to Excel rules") {
    assert(Xlsx.sanitizeSheetName("a/b[c]:d*e?f\\g") == "a_b_c__d_e_f_g")
    assert(Xlsx.sanitizeSheetName("x" * 40).length == 31)
  }

  test("column refs map both ways past Z") {
    assert(Xlsx.colRef(0) == "A" && Xlsx.colRef(25) == "Z")
    assert(Xlsx.colRef(26) == "AA" && Xlsx.colRef(27 * 26 - 1) == "ZZ")
    for (i <- 0 until 1000) assert(Xlsx.colIndex(Xlsx.colRef(i) + "7") == i)
  }

  test("cells without r attributes advance positionally within the row") {
    // the r attribute on <c> is optional in OOXML; writers that omit it
    // place cells sequentially — they must not collapse onto column A
    val path = tmpFile()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path), UTF_8)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8)); zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    part("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row><c><v>1</v></c><c><v>2</v></c><c r="E1"><v>5</v></c><c><v>6</v></c></row><row><c><v>7</v></c></row></sheetData></worksheet>""")
    zos.close()
    val wb = Xlsx.read(path)
    assert(wb("S") == Vector(
      Vector("1", "2", "", "", "5", "6"),   // positional, then E1 jump, then E1+1
      Vector("7")))                          // second row restarts at A
  }

  test("non-finite doubles export as strings, not corrupt numeric cells") {
    val path = tmpFile()
    Xlsx.write(path, Seq("s" -> Seq(
      Seq(1.5, Double.NaN, Double.PositiveInfinity))))
    val got = Xlsx.read(path)("s")
    assert(got == Vector(Vector("1.5", "NaN", "Infinity")))
    // and the numeric cell is still numeric (no t attribute)
    val zf = new java.util.zip.ZipFile(path)
    val sheet = scala.io.Source.fromInputStream(
      zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml"))).mkString
    zf.close()
    assert(sheet.contains("""<c r="A1"><v>1.5</v></c>"""))
    assert(sheet.contains("inlineStr"))
    assert(!sheet.contains("<v>NaN</v>"))
  }

  test("sharedStrings workbooks (the Excel/pandas shape) are read") {
    // hand-roll a minimal xlsx that uses t="s" cells + a sharedStrings
    // table with a rich-text run, as real Excel files do
    val path = tmpFile()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path), UTF_8)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8)); zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    part("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2"><si><t>plain</t></si><si><r><t>rich </t></r><r><t>text</t></r></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c><c r="D1"><v>42</v></c></row></sheetData></worksheet>""")
    zos.close()
    val wb = Xlsx.read(path)
    assert(wb.sheetNames == Vector("Data"))
    // B1 absent -> gap at its true position; rich-text run concatenated
    assert(wb("Data") == Vector(Vector("plain", "", "rich text", "42")))
  }
}

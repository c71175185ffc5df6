package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Minimal dependency-free XLSX codec (driver-side).
  *
  * An .xlsx file is a zip of OOXML parts; the subset written/read here —
  * workbook + worksheet parts, inline or shared strings — is what the
  * reference's pandas `to_excel`/`read_excel` round-trip actually uses
  * (reference: core/read_write.py:146-153, 218-230). Styles, formulas,
  * merged cells and rich formatting are out of scope: exports carry data,
  * and ingest reads values only.
  *
  * Sized for its call sites: exports are bounded human-facing extracts and
  * source workbooks are a few hundred cells (SURVEY.md §2 S1/K3/K4), so
  * everything is plain driver I/O — bulk data never flows through here.
  *
  * Reading uses StAX (streaming, JDK-built-in) and supports both inline
  * strings (what this writer emits) and the sharedStrings table (what
  * Excel/pandas emit), so workbooks from either origin load.
  */
object Xlsx {

  // ----------------------------------------------------------------- write

  /** Write sheets of (name, rows) as an .xlsx file. Cell typing: numbers
    * land as native numeric cells, booleans as boolean cells, nulls as
    * gaps, everything else as an inline string. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    require(sheets.nonEmpty, "xlsx workbook needs at least one sheet")
    val names = sheets.map(s => sanitizeSheetName(s._1))
    require(names.distinct.size == names.size,
      s"duplicate sheet names after sanitization: ${names.mkString(", ")}")
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)), UTF_8)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    try {
      val n = sheets.size
      part("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
           |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
           |<Default Extension="xml" ContentType="application/xml"/>
           |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
           |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
           |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets>
           |${names.zipWithIndex.map { case (nm, i) => s"""<sheet name="${escape(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString("\n")}
           |</sheets>
           |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
           |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
           |</Relationships>""".stripMargin)
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
      }
    } finally zos.close()
  }

  private def sheetXml(rows: Seq[Seq[Any]]): String = {
    val sb = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>""".stripMargin)
    rows.zipWithIndex.foreach { case (row, r) =>
      sb.append(s"""<row r="${r + 1}">""")
      row.zipWithIndex.foreach { case (v, c) =>
        val ref = colRef(c) + (r + 1)
        v match {
          case null | None | "" => // gap
          case b: Boolean =>
            sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          // non-finite doubles are not legal OOXML numeric cells (Excel
          // rejects the file) — fall through to the inline-string arm
          case d: Double if !java.lang.Double.isFinite(d) =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>""")
          case f: Float if !java.lang.Float.isFinite(f) =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t>$f</t></is></c>""")
          case x @ (_: Int | _: Long | _: Short | _: Byte | _: Float |
                    _: Double | _: java.math.BigDecimal | _: BigDecimal) =>
            sb.append(s"""<c r="$ref"><v>$x</v></c>""")
          case other =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(other.toString)}</t></is></c>""")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Excel sheet-name rules: <=31 chars, none of []:*?/\ . */
  private[io] def sanitizeSheetName(name: String): String = {
    val cleaned = name.map(c => if ("[]:*?/\\".contains(c)) '_' else c)
    if (cleaned.length > 31) cleaned.take(31) else cleaned
  }

  /** 0-based column index -> A1-style letters. */
  private[io] def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private[io] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Chars outside the XML 1.0 legal set (#x9 #xA #xD, #x20-#xD7FF,
    * #xE000-#xFFFD) cannot be written even entity-escaped — a worksheet
    * part containing one is rejected by Excel and conforming parsers.
    * OOXML's convention is the `_xHHHH_` encoding (decoded on read by
    * [[unescapeOoxml]]); scraped free text is exactly where NUL/control
    * bytes show up, so this is load-bearing for the export path. */
  private def xmlLegal(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\r' ||
      (c >= 0x20 && c <= 0xD7FF) || (c >= 0xE000 && c <= 0xFFFD)

  private def escape(s: String): String = {
    // protect literal text that LOOKS like an _xHHHH_ escape (encode its
    // leading underscore as _x005F_, Excel's own convention) so read-back
    // decoding cannot corrupt it
    val safe =
      if (s.contains("_x")) "_(?=x[0-9A-Fa-f]{4}_)".r.replaceAllIn(s, "_x005F_")
      else s
    safe.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"
      case c if !xmlLegal(c) => f"_x${c.toInt}%04X_"
      case c => c.toString
    }
  }

  /** Decode OOXML `_xHHHH_` escapes produced by [[escape]] (and by other
    * writers — Excel itself emits them for control chars). */
  private[io] def unescapeOoxml(s: String): String =
    if (!s.contains("_x")) s
    else "_x([0-9A-Fa-f]{4})_".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))

  // ------------------------------------------------------------------ read

  /** Read an .xlsx into the driver-side Workbook shape (all cells as
    * strings — coercion happens in validation, same order of operations as
    * the CSV source). Sheet order follows workbook.xml. */
  def read(path: String): WorkbookReader.Workbook = {
    val zf = new ZipFile(path)
    try {
      val rels = parseRels(zf)
      val shared = parseSharedStrings(zf)
      val sheetRefs = parseWorkbook(zf) // ordered (name, rId)
      val sheets = sheetRefs.map { case (name, rid) =>
        val target = rels.getOrElse(rid,
          throw new IllegalArgumentException(s"xlsx: no relationship '$rid'"))
        val entryName = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        val entry = Option(zf.getEntry(entryName)).getOrElse(
          throw new IllegalArgumentException(s"xlsx: missing part '$entryName'"))
        name -> parseSheet(zf, entry, shared)
      }
      WorkbookReader.Workbook(sheets.toVector)
    } finally zf.close()
  }

  private def xmlReader(zf: ZipFile, entry: ZipEntry) = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.createXMLStreamReader(
      new BufferedInputStream(zf.getInputStream(entry)), "UTF-8")
  }

  private def parseRels(zf: ZipFile): Map[String, String] = {
    val entry = Option(zf.getEntry("xl/_rels/workbook.xml.rels")).getOrElse(
      throw new IllegalArgumentException("xlsx: missing workbook rels"))
    val r = xmlReader(zf, entry)
    val out = Map.newBuilder[String, String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship")
        out += r.getAttributeValue(null, "Id") -> r.getAttributeValue(null, "Target")
    } finally r.close()
    out.result()
  }

  private def parseWorkbook(zf: ZipFile): Seq[(String, String)] = {
    val entry = Option(zf.getEntry("xl/workbook.xml")).getOrElse(
      throw new IllegalArgumentException("xlsx: missing xl/workbook.xml"))
    val r = xmlReader(zf, entry)
    val out = Seq.newBuilder[(String, String)]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = unescapeOoxml(r.getAttributeValue(null, "name"))
        // the r:id attribute lives in the relationships namespace
        val rid = (0 until r.getAttributeCount)
          .collectFirst { case i if r.getAttributeLocalName(i) == "id" =>
            r.getAttributeValue(i) }
          .getOrElse(throw new IllegalArgumentException(s"xlsx: sheet '$name' has no r:id"))
        out += name -> rid
      }
    } finally r.close()
    out.result()
  }

  /** sharedStrings.xml: one entry per <si>; rich-text runs concatenate
    * their <t> pieces. Absent in workbooks from this writer. */
  private def parseSharedStrings(zf: ZipFile): IndexedSeq[String] =
    Option(zf.getEntry("xl/sharedStrings.xml")).fold(IndexedSeq.empty[String]) { entry =>
      val r = xmlReader(zf, entry)
      val out = IndexedSeq.newBuilder[String]
      val cur = new StringBuilder
      var inT = false
      try while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" => cur.clear()
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" => inT = true
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "t" => inT = false
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += unescapeOoxml(cur.toString)
        case _ =>
      } finally r.close()
      out.result()
    }

  /** One worksheet -> dense row matrix. Row/cell positions come from the
    * r attributes (sparse cells and skipped rows stay at their true
    * positions — header inference depends on absolute rows). */
  private def parseSheet(zf: ZipFile, entry: ZipEntry,
                         shared: IndexedSeq[String]): WorkbookReader.Sheet = {
    val r = xmlReader(zf, entry)
    val rows = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.Map[Int, String]]
    var maxRow = -1
    var curRow = -1
    var curCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = if (curCol >= 0 && text.nonEmpty) {
      val raw = text.toString
      val value = cellType match {
        case "s" =>
          val idx = raw.trim.toInt
          if (idx >= 0 && idx < shared.length) shared(idx) else ""
        case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
        case "inlineStr" => unescapeOoxml(raw)
        case _ => raw
      }
      rows.getOrElseUpdate(curRow, scala.collection.mutable.Map.empty)
        .update(curCol, value)
    }
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          curRow = Option(r.getAttributeValue(null, "r"))
            .map(_.toInt - 1).getOrElse(curRow + 1)
          maxRow = math.max(maxRow, curRow)
          curCol = -1 // column position resets per ROW, not per cell
        case "c" =>
          // the r attribute is OPTIONAL in OOXML: an r-less cell sits one
          // past the previous cell in the same row
          curCol = Option(r.getAttributeValue(null, "r"))
            .map(colIndex).getOrElse(curCol + 1)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          text.clear()
        case "v" => inV = true
        case "t" => inIsT = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" => inIsT = false
        case "c" => endCell(); cellType = ""; text.clear()
        case _ =>
      }
      case _ =>
    } finally r.close()
    (0 to maxRow).toVector.map { i =>
      rows.get(i) match {
        case None => Vector.empty[String]
        case Some(cells) =>
          val width = cells.keys.max + 1
          Vector.tabulate(width)(c => cells.getOrElse(c, ""))
      }
    }
  }
}

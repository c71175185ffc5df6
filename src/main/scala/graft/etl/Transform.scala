package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Config.TableConfig
import graft.io.WorkbookReader
import graft.io.WorkbookReader.{Sheet, Workbook}
import graft.ops.{Clean, Reshape, Windows}

/** The transform pipelines: wide published sheet -> canonical long frame.
  * Ports of process_sheet_to_frame / process_multi_sheets_to_frame
  * (transformations.py:190-452) plus the postprocess hook registry
  * (transformations.py:132-168) and a stacked-summaries composite flow
  * (the 5.6-style custom pipeline, transformations.py:455-558).
  *
  * Driver/cluster split: header inference, transpose, and row numbering
  * happen driver-side in the workbook reader (sheets are tiny and row
  * identity must exist BEFORE parallelization — SURVEY.md §7.4 risk 1);
  * everything from the template join on is declarative DataFrame code.
  */
object Transform {

  /** Postprocess hooks by name (POSTPROCESSING_MAP parity,
    * transformations.py:132-140). */
  val postprocess: Map[String, DataFrame => DataFrame] = Map(
    // F.2-style: keep only rows whose year parses numeric
    // (transformations.py:85-97)
    "year_numeric" -> (df =>
      df.filter(expr("try_cast(year AS int)").isNotNull)),
    // J.1-style: unit from trailing parentheses of the melted variable,
    // fuel = text before them (transformations.py:39-46)
    "unit_from_parens" -> (df =>
      df.withColumn("unit", Clean.unitFromParens(col("fuel")))
        .withColumn("fuel", Clean.beforeParens(col("fuel")))),
    // 5.2-style literal replace (transformations.py:64)
    "total_to_all" -> (df =>
      df.withColumn("sector", regexp_replace(col("sector"), "^Total$", "All"))))

  // ----------------------------------------------------------- single sheet

  /** One sheet -> long frame. Returns the melted, note-cleaned frame with
    * columns: row, label, id-vars..., <varName>, value. */
  def processSheetToFrame(spark: SparkSession, wb: Workbook, cfg: TableConfig,
                          template: Option[DataFrame]): DataFrame = {
    val sheetName = cfg.sheetName.getOrElse(wb.sheetNames.head)
    val raw0 = wb(sheetName)
    val raw = if (cfg.transposeFirst) transposeWrangled(raw0, cfg) else raw0
    val read = WorkbookReader.read(spark, Workbook(Vector(sheetName -> raw)),
      hasMultiHeaders = cfg.hasMultiHeaders && !cfg.transposeFirst,
      fixedHeader = if (cfg.transposeFirst) Some(0) else cfg.fixedHeader)(sheetName)
    val table = read.drop(cfg.dropCols: _*)
    val shaped = template match {
      case Some(tpl) => templateJoinAndMelt(table, tpl, cfg.varName)
      case None      => manualMapAndMelt(table, cfg)
    }
    val hooked = cfg.postprocess.flatMap(postprocess.get)
      .fold(shaped)(f => f(shaped))
    Clean.cleanStringColumns(hooked)
  }

  /** Template path (transformations.py:280-302): inner broadcast join of
    * data row-position to the template's `row` key attaches all id-vars;
    * the first data column (the printed row captions) is dropped; the
    * remaining data columns melt into (varName, value). */
  private def templateJoinAndMelt(table: DataFrame, template: DataFrame,
                                  varName: String): DataFrame = {
    val dataCols = table.columns.filterNot(_ == "row")
    val firstCol = dataCols.head
    val meltCols = dataCols.tail
    val joined = table.drop(firstCol)
      .join(broadcast(template), Seq("row"), "inner")
    val idVars = "row" +: template.columns.filterNot(_ == "row").toSeq
    Reshape.melt(joined, idVars, meltCols.toSeq, varName, "value")
  }

  /** Manual-mapping path (ignore_mapping, transformations.py:262-275):
    * the positional id column is renamed to `idVarName`, duplicated into
    * `label`, a constant `unit` attached, everything else melts. */
  private def manualMapAndMelt(table: DataFrame, cfg: TableConfig): DataFrame = {
    val dataCols = table.columns.filterNot(_ == "row")
    val idCol = dataCols.head
    val meltCols = dataCols.tail
    val idName = cfg.idVarName.getOrElse(idCol.toLowerCase)
    val prepared = table
      .withColumnRenamed(idCol, idName)
      .withColumn("label", col(idName))
    val withUnit = cfg.unit.fold(prepared)(u => prepared.withColumn("unit", lit(u)))
    val idVars = Seq("row", idName, "label") ++ cfg.unit.map(_ => "unit")
    Reshape.melt(withUnit, idVars, meltCols.toSeq, cfg.varName, "value")
  }

  /** Driver-side transpose of the wrangled sheet (title rows removed,
    * header as row 0), used when tables publish years-down/series-across
    * (transpose_first, transformations.py:252-256). */
  private def transposeWrangled(sheet: Sheet, cfg: TableConfig): Sheet = {
    val h = WorkbookReader.inferHeaderRow(sheet, cfg.hasMultiHeaders, cfg.fixedHeader)
    Reshape.transposeSmall(sheet.drop(h))
  }

  // ------------------------------------------------------------ multi sheet

  /** Multi-sheet tables: each data sheet produces a frame, the sheet name
    * becomes a new dimension (year or sector), frames union
    * (transformations.py:320-452). */
  def processMultiSheetsToFrame(spark: SparkSession, wb: Workbook,
                                cfg: TableConfig,
                                template: Option[DataFrame]): DataFrame = {
    val sheets = wb.sheetNames
      .filterNot(cfg.skipSheets)
      .filter(Config.isDataSheet(_, cfg.sheetRegex))
    require(sheets.nonEmpty, s"no data sheets for table '${cfg.table}'")
    val frames = sheets.map { name =>
      val perSheet = cfg.copy(sheetName = Some(name),
        varName = if (cfg.sheetDim == "year") "fuel" else cfg.varName)
      name -> processSheetToFrame(spark, wb, perSheet, template)
    }
    Reshape.sheetUnion(frames, cfg.sheetDim)
  }

  /** Whole-table custom flows by name (the reference's ad-hoc 5.6 / 5.10
    * pipelines, transformations.py:558-631): ordinary functions composing
    * the operator library, dispatched from config `f` names that aren't
    * single_sheet / multi_sheet. */
  type CustomFlow = (SparkSession, Workbook, TableConfig, Option[DataFrame]) => DataFrame
  val customFlows: Map[String, CustomFlow] = Map(
    "stacked_summaries" -> ((spark, wb, cfg, template) => {
      val sheetName = cfg.sheetName.getOrElse(wb.sheetNames.head)
      val read = WorkbookReader.read(spark,
        Workbook(Vector(sheetName -> wb(sheetName))),
        hasMultiHeaders = cfg.hasMultiHeaders, fixedHeader = cfg.fixedHeader)(sheetName)
      val tpl = template.getOrElse(
        throw new IllegalArgumentException("stacked_summaries needs a template"))
      val firstCol = read.columns.filterNot(_ == "row").head
      val blockSize = tpl.count().toInt
      processStackedSummaries(read, tpl,
        yearTag = when(col(firstCol).rlike("\\d{4}\\s*summary"),
          regexp_extract(col(firstCol), "(\\d{4})\\s*summary", 1)),
        blockSize = blockSize,
        firstYear = cfg.firstYear.getOrElse(""))
    }))

  // ------------------------------------------------- stacked summaries flow

  /** Composite flow for stacked repeating blocks with interim title rows
    * (the DUKES 5.6 annual-summaries shape, transformations.py:455-558):
    * year tags are extracted from title rows and forward-filled down the
    * sheet; data rows cycle through a fixed-size template block, so the
    * join key is row % blockSize (the modular-arithmetic join J2). */
  def processStackedSummaries(table: DataFrame, template: DataFrame,
                              yearTag: Column, blockSize: Int,
                              firstYear: String): DataFrame = {
    val tagged = table
      .withColumn("year", yearTag)
      .withColumn("row_raw", col("row"))
    val filled = Windows.ffill(tagged, "year", Seq.empty, Seq("row_raw"),
      default = Some(lit(firstYear)))
    // drop the interim title rows FIRST, then re-number consecutively —
    // title rows would otherwise shift the parity of the modular key
    // (the reference resets the index before the mod join,
    // transformations.py:509-522)
    val keyed = filled
      .filter(!col(table.columns.filterNot(_ == "row").head).contains("summary"))
      .withColumn("row_seq", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("row_raw"))) - 1)
      .withColumn("row_mod", pmod(col("row_seq"), lit(blockSize)))
    keyed.join(broadcast(template.withColumnRenamed("row", "row_mod")),
      Seq("row_mod"), "inner")
  }
}

package graft.etl

import graft.dsl.Json

/** Typed ETL configuration — the reference's etl_config.json subtree
  * (config/etl_config.json; resolved per table by generate_config,
  * validation.py:11-64) as a sealed case-class model instead of a dict of
  * f/f_args resolved by reflection (process.py:57-63, utils.py:107-130).
  */
object Config {

  /** Which transform pipeline to run — mirrors the reference's `f` names. */
  sealed trait TransformKind
  case object SingleSheet extends TransformKind     // process_sheet_to_frame
  case object MultiSheet extends TransformKind      // process_multi_sheets_to_frame
  final case class Custom(name: String) extends TransformKind // 5.6 / 5.10 flows

  final case class TableConfig(
      table: String,
      kind: TransformKind,
      sheetName: Option[String] = None,
      skipSheets: Set[String] = Set.empty,
      sheetRegex: Option[String] = None,
      hasMultiHeaders: Boolean = false,
      fixedHeader: Option[Int] = None,
      dropCols: Seq[String] = Nil,
      transposeFirst: Boolean = false,
      // template path: None = manual-mapping (ignore_mapping) path
      templateSheet: Option[String] = None,
      // manual-mapping parameters (transformations.py:262-275)
      idVarName: Option[String] = None,
      unit: Option[String] = None,
      // what the melted variable column becomes ("year" usually; the
      // sheet-name dimension for multi-sheet tables)
      varName: String = "year",
      sheetDim: String = "year",
      firstYear: Option[String] = None,
      postprocess: Option[String] = None,
      url: Option[String] = None,
      description: Option[String] = None)

  /** Parse the collection config JSON: {table -> config object}. */
  def parse(json: String): Map[String, TableConfig] = {
    val root = Json.parse(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("config must be a JSON object")
    }
    root.map { case (table, v) =>
      val o = v.asInstanceOf[Map[String, Any]]
      def str(k: String): Option[String] = o.get(k).collect { case s: String => s }
      def bool(k: String): Boolean = o.get(k).collect { case b: Boolean => b }.getOrElse(false)
      def int(k: String): Option[Int] = o.get(k).collect { case n: Long => n.toInt }
      def strs(k: String): Seq[String] = o.get(k) match {
        case Some(xs: Vector[_]) => xs.collect { case s: String => s }
        case _ => Nil
      }
      val kind = str("f") match {
        case Some("single_sheet") | None => SingleSheet
        case Some("multi_sheet")         => MultiSheet
        case Some(other)                 => Custom(other)
      }
      table -> TableConfig(
        table = table,
        kind = kind,
        sheetName = str("sheet_name"),
        skipSheets = strs("skip_sheets").toSet,
        sheetRegex = str("sheet_regex"),
        hasMultiHeaders = bool("has_multi_headers"),
        fixedHeader = int("fixed_header"),
        dropCols = strs("drop_cols"),
        transposeFirst = bool("transpose_first"),
        templateSheet = str("template_sheet"),
        idVarName = str("id_var_name"),
        unit = str("unit"),
        varName = str("var_name").getOrElse("year"),
        sheetDim = str("sheet_dim").getOrElse("year"),
        firstYear = str("first_year"),
        postprocess = str("postprocess"),
        url = str("url"),
        description = str("description"))
    }
  }

  /** Sub-table name normalisation: a trailing letter fused to the number
    * becomes an upper-cased dotted suffix, e.g. "4.4a" -> "4.4.A"
    * (reference: transformations.py:106-110; pinned by
    * tests/test_transformations.py:166-195). */
  def normalizeTableName(name: String): String =
    "^([0-9]+(?:\\.[0-9]+)*)\\.?([a-zA-Z])$".r
      .replaceAllIn(name, m => m.group(1) + "." + m.group(2).toUpperCase)

  /** Sheet-name data predicate: match the regex if given, else purely
    * numeric-ish names (reference: _is_data_sheet,
    * transformations.py:171-186). */
  def isDataSheet(name: String, regex: Option[String]): Boolean = regex match {
    case Some(r) =>
      try r.r.findFirstIn(name).isDefined
      catch { case e: java.util.regex.PatternSyntaxException =>
        throw new IllegalArgumentException(s"invalid sheet regex '$r': ${e.getMessage}") }
    case None => name.matches("[0-9.]+[A-Za-z]?")
  }
}

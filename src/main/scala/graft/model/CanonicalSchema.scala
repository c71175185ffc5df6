package graft.model

import org.apache.spark.sql.types._

/** The engine's canonical sparse long-format schema.
  *
  * Mirrors the reference's single wide collection schema
  * (reference: config/schema.json:2-80): every transformation targets this
  * 19-column shape; each logical table populates only the dimension columns
  * it needs, the rest stay NULL and are hidden at presentation time.
  */
object CanonicalSchema {

  /** Sparse string dimension columns (all nullable). */
  val dimensions: Vector[String] = Vector(
    "group", "subgroup", "category", "subcategory", "item", "technology",
    "country", "region", "sector", "subsector", "fuel", "subfuel", "unit")

  /** Service columns stamped by the store, hidden from query results
    * (reference: facade.py:161, app.py:174-179). */
  val serviceColumns: Vector[String] = Vector("ingest_id", "ingest_ts", "row_uid")

  /** Working columns excluded from the uniqueness key
    * (reference: validation.py:88-101). */
  val workingColumns: Vector[String] = Vector("row", "label")

  val struct: StructType = StructType(
    Vector(
      StructField("ingest_id", LongType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("row", IntegerType, nullable = false),
      StructField("label", StringType, nullable = false),
      StructField("year", IntegerType, nullable = false)) ++
      dimensions.map(d => StructField(d, StringType, nullable = true)) :+
      StructField("value", DoubleType, nullable = true))

  /** Columns forming the uniqueness contract: everything except working
    * columns and `value` (reference: validation.py:88-101). */
  val keyColumns: Vector[String] =
    struct.fieldNames.toVector.filterNot(c => workingColumns.contains(c) || c == "value")

  /** Declared logical type of a column, as exposed to the filter DSL
    * (reference: settings.py:58-63 — TEXT/INTEGER/REAL/DATETIME). */
  sealed trait DslType
  case object TText extends DslType
  case object TInt extends DslType
  case object TReal extends DslType
  case object TDatetime extends DslType

  def dslTypeOf(dt: DataType): DslType = dt match {
    case StringType                                    => TText
    case IntegerType | LongType | ShortType | ByteType => TInt
    case DoubleType | FloatType                        => TReal
    case TimestampType | DateType                      => TDatetime
    case _                                             => TText
  }
}

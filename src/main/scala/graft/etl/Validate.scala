package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.CanonicalSchema

/** Schema validation of a transformed frame before RAW ingest — the port
  * of the reference's validate_schema (validation.py:67-150):
  *   1. stamp the logical table_name;
  *   2. unexpected columns are a hard error (validation.py:113-115);
  *   3. coerce declared dtypes (to_numeric(errors="coerce") semantics:
  *      suppression symbols like ".." / "-" become NULL);
  *   4. an all-null column AFTER numeric coercion is an error — it means
  *      the coercion destroyed real data (validation.py:120-131);
  *   5. nulls in a non-nullable column are an error (validation.py:143-147);
  *   6. duplicate composite keys (all columns minus working cols `row`,
  *      `label` and `value`) are an error (validation.py:88-101).
  *
  * All checks run in ONE aggregation pass over the frame (counts per
  * column + a groupBy-count limit-1 probe for dup keys) — no per-column
  * jobs, so the validation cost stays a single scan at 100 TB.
  */
object Validate {

  final case class ValidationError(msg: String) extends IllegalArgumentException(msg)

  def validateSchema(df: DataFrame, tableName: String,
                     schema: StructType = CanonicalSchema.struct): DataFrame = {
    val stamped = df.withColumn("table_name", lit(tableName))

    // 2. unexpected columns (ingest_id is stamped later by the store)
    val declared = schema.fieldNames.toSet + "ingest_id"
    val unexpected = stamped.columns.filterNot(declared)
    if (unexpected.nonEmpty)
      throw ValidationError(
        s"unexpected columns for '$tableName': ${unexpected.mkString(", ")}")

    // 3. coerce dtypes; track which columns had any non-null BEFORE coercion
    val targetFields = schema.fields.filter(f => stamped.columns.contains(f.name))
    val coerced = stamped.select(targetFields.map { f =>
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)
    }.toIndexedSeq: _*)

    // one aggregation pass: total rows + per-column non-null counts, both
    // before (raw) and after (coerced) coercion
    val preCounts = targetFields.map(f => count(stamped(f.name)).as(s"pre_${f.name}"))
    val aggRow = stamped.agg(count(lit(1)).as("n_rows"), preCounts.toIndexedSeq: _*).head()
    val nRows = aggRow.getLong(0)
    val postRow = coerced.agg(
      count(lit(1)).as("n_rows"),
      targetFields.map(f => count(col(f.name)).as(s"post_${f.name}")).toIndexedSeq: _*).head()

    targetFields.zipWithIndex.foreach { case (f, i) =>
      val pre = aggRow.getLong(i + 1)
      val post = postRow.getLong(i + 1)
      // 4. coercion destroyed a populated column
      if (pre > 0 && post == 0)
        throw ValidationError(
          s"column '${f.name}' of '$tableName' is all-null after ${f.dataType.simpleString} coercion")
      // 5. nullability violation
      if (!f.nullable && post < nRows)
        throw ValidationError(
          s"non-nullable column '${f.name}' of '$tableName' has ${nRows - post} nulls")
    }

    // 6. duplicate composite keys
    val keyCols = coerced.columns.filterNot(c =>
      CanonicalSchema.workingColumns.contains(c) || c == "value" || c == "ingest_id")
    val dup = coerced.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n")).where(col("n") > 1).limit(1)
    if (!dup.isEmpty)
      throw ValidationError(s"duplicate composite keys in '$tableName' on (${keyCols.mkString(", ")})")

    coerced
  }
}

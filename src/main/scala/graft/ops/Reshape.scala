package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping operators — the heart of the reference ETL (SURVEY.md §2.7).
  *
  * All operators are declarative DataFrame transforms so Catalyst keeps
  * pushdown/pruning working through them; the only non-relational one
  * (small-sheet transpose) is deliberately driver-side (see SURVEY.md §7.4).
  */
object Reshape {

  /** Wide→long melt (reference: pd.melt at transformations.py:298-302).
    * Uses Spark's native unpivot, which plans as a single Expand node —
    * no shuffle, preserves column pruning on the id side.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String, valueName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valueName)

  /** Sheet union: stack per-sheet frames, attaching the sheet name as a new
    * dimension column (reference: transformations.py:435-438). */
  def sheetUnion(frames: Seq[(String, DataFrame)], sheetCol: String): DataFrame =
    frames.map { case (name, f) => f.withColumn(sheetCol, lit(name)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** Long→wide pivot with an explicit value list so the plan stays a single
    * pass (no value-discovery job) and the output schema is deterministic
    * (reference: process.py:262-271). */
  def pivotWide(df: DataFrame, groupCols: Seq[String], pivotCol: String,
                pivotValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*).pivot(pivotCol, pivotValues).agg(agg)

  /** Driver-side transpose of a small in-memory sheet matrix
    * (reference: transformations.py:252-256 — sheets are at most a few
    * hundred cells; doing this pre-parallelism keeps plans clean). */
  def transposeSmall(rows: Vector[Vector[String]]): Vector[Vector[String]] = {
    if (rows.isEmpty) return rows
    val width = rows.map(_.length).max
    val padded = rows.map(r => r.padTo(width, ""))
    Vector.tabulate(width)(j => padded.map(_(j)))
  }

  /** Rename + constant-stamp helper (reference: transformations.py:262-275:
    * positional id column renamed, `label` duplicated, constant `unit`). */
  def renameAndStamp(df: DataFrame, renames: Map[String, String],
                     constants: Map[String, Any]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    constants.foldLeft(renamed) { case (d, (name, value)) =>
      d.withColumn(name, lit(value))
    }
  }
}

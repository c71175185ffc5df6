package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CanonicalSchema
import graft.ops.Projection

/** Export sinks (reference: export_table / export_all,
  * core/read_write.py:96-240): one logical table -> a single
  * CSV/Parquet/XLSX file named {collection}_{table}_{date}.{ext}, or a
  * whole-collection bulk export — for xlsx a single workbook with one
  * sheet per table (read_write.py:218-230), via the dependency-free
  * [[Xlsx]] codec. The "workbook" flavor (one CSV per table in a
  * directory) is kept for plain-text consumers. */
object Export {

  val formats: Set[String] = Set("csv", "parquet", "orc", "avro", "xlsx", "jsonl", "workbook")

  /** Shape a PROD slice for export: service columns and all-null sparse
    * dimensions dropped (read_write.py:498-500). */
  private def shape(slice: DataFrame): DataFrame =
    Projection.dropAllNullColumns(
      slice.drop(CanonicalSchema.serviceColumns :+ "ingest_ts": _*))

  private def fileName(collection: String, table: String, date: String,
                       ext: String): String =
    s"${collection}_${table.replace(".", "_")}_$date.$ext"

  /** Export one logical table. `date` is injected for determinism
    * (the reference stamps today's date, read_write.py:120). */
  def exportTable(prod: DataFrame, collection: String, table: String,
                  outDir: String, format: String = "csv",
                  date: String = java.time.LocalDate.now.toString): String = {
    require(formats(format), s"unsupported export format '$format'")
    val slice = shape(prod.where(col("table_name") === table))
    val target = s"$outDir/${fileName(collection, table, date, format)}"
    format match {
      case "parquet" => writeSingle(slice, target, "parquet")
      case "orc"     => writeSingle(slice, target, "orc")
      // record names can't start with a digit ("1.1"-style table names)
      case "avro"    => Avro.write(target, slice, "t_" + table.replace(".", "_"))
      // one JSON object per line — the LLM-pipeline interchange format
      case "jsonl"   => writeSingle(slice, target, "json")
      case "xlsx" =>
        new java.io.File(outDir).mkdirs()
        Xlsx.write(target, Seq(table -> sheetRows(slice)))
      case _ => writeSingle(slice, target, "csv")
    }
    target
  }

  /** header + data rows for one xlsx sheet (export slices are bounded
    * human-facing extracts; the collect here is the same driver-side step
    * pandas' to_excel takes in the reference). */
  private def sheetRows(slice: DataFrame): Seq[Seq[Any]] =
    slice.columns.toSeq.asInstanceOf[Seq[Any]] +:
      slice.collect().toSeq.map(_.toSeq)

  /** Bulk export: every staged table, one file each — or one directory of
    * per-table CSVs for the workbook flavor (read_write.py:162-240). */
  def exportAll(prod: DataFrame, collection: String, outDir: String,
                format: String = "csv",
                date: String = java.time.LocalDate.now.toString): Seq[String] = {
    val tables = prod.select("table_name").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    format match {
      case "workbook" =>
        val dir = s"$outDir/${collection}_all_$date"
        tables.map { t =>
          writeSingle(shape(prod.where(col("table_name") === t)),
            s"$dir/$t.csv", "csv")
          s"$dir/$t.csv"
        }
      case "xlsx" if tables.isEmpty => Seq.empty // nothing staged, no file
      case "xlsx" =>
        // one workbook, one sheet per table (read_write.py:218-230)
        val target = s"$outDir/${collection}_$date.xlsx"
        new java.io.File(outDir).mkdirs()
        Xlsx.write(target,
          tables.map(t => t -> sheetRows(shape(prod.where(col("table_name") === t)))))
        Seq(target)
      case _ => tables.map(t => exportTable(prod, collection, t, outDir, format, date))
    }
  }

  /** Write a small result as ONE file with the exact requested name.
    * Export slices are user-facing extracts (bounded by the table size a
    * human asked for), so coalesce(1) + rename of the part file is the
    * right trade-off here — bulk data movement stays parquet-partitioned
    * in the store, never through this path. */
  private def writeSingle(df: DataFrame, target: String, format: String): Unit = {
    val tmp = target + ".tmpdir"
    val writer = df.coalesce(1).write.mode("overwrite")
    (format match {
      case "csv" => writer.option("header", "true")
      case _     => writer
    }).format(format).save(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    val dest = new org.apache.hadoop.fs.Path(target)
    fs.mkdirs(dest.getParent)
    fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }
}

package graft.io

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Driver-side Avro Object Container File codec for export slices —
  * the Avro counterpart of [[Xlsx]]: the image ships avro-core (it is a
  * Spark runtime dependency) but not the spark-avro DataSource, so the
  * single-file export path writes the container format directly. Export
  * slices are bounded human-/tool-facing extracts (same contract as the
  * xlsx export, reference core/read_write.py:96-240); bulk data stays in
  * parquet/orc through the partitioned store, never this path.
  *
  * Schema mapping: every field is a `union(null, T)` (export slices are
  * sparse long-format rows, nulls everywhere), with
  * timestamp-micros/date logical types so downstream Avro readers get
  * real temporal types, and a `string` fallback (toString) for exotic
  * Spark types — lossy but explicit, recorded in the field doc.
  */
object Avro {

  private def primitive(dt: DataType): (Schema, Boolean) = dt match {
    case StringType  => (Schema.create(Schema.Type.STRING), false)
    case IntegerType | ShortType | ByteType =>
      (Schema.create(Schema.Type.INT), false)
    case LongType    => (Schema.create(Schema.Type.LONG), false)
    case FloatType   => (Schema.create(Schema.Type.FLOAT), false)
    case DoubleType  => (Schema.create(Schema.Type.DOUBLE), false)
    case BooleanType => (Schema.create(Schema.Type.BOOLEAN), false)
    case BinaryType  => (Schema.create(Schema.Type.BYTES), false)
    case TimestampType =>
      val s = Schema.create(Schema.Type.LONG)
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
      (s, false)
    case DateType =>
      val s = Schema.create(Schema.Type.INT)
      org.apache.avro.LogicalTypes.date().addToSchema(s)
      (s, false)
    case _ => (Schema.create(Schema.Type.STRING), true) // toString fallback
  }

  /** Avro record schema for a frame. Column names must already be valid
    * Avro names — true for every canonical-schema export slice; loudly
    * rejected otherwise rather than silently renamed. */
  def schemaFor(df: DataFrame, recordName: String): Schema = {
    val fields = df.schema.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"column '${f.name}' is not a valid Avro field name")
      val (base, lossy) = primitive(f.dataType)
      val union = Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base))
      new Schema.Field(f.name, union,
        if (lossy) s"stringified from Spark type ${f.dataType.simpleString}" else null,
        Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.export", false,
      java.util.List.of(fields: _*))
  }

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (x: Short, _) => x.toInt
    case (x: Byte, _) => x.toInt
    case (x, StringType) => String.valueOf(x)
    case (x, IntegerType | LongType | FloatType | DoubleType | BooleanType) => x
    case (x, _) => String.valueOf(x) // the documented lossy fallback
  }

  /** Collect + write one frame as a single .avro container file
    * (deflate-compressed, splittable blocks). */
  def write(target: String, df: DataFrame, recordName: String = "export"): Unit = {
    val schema = schemaFor(df, recordName)
    val fields = df.schema.fields
    val out = new java.io.File(target)
    Option(out.getParentFile).foreach(_.mkdirs())
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(schema, out)
    try {
      df.collect().foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          rec.put(fields(i).name, toAvro(row.get(i), fields(i).dataType))
          i += 1
        }
        w.append(rec)
      }
    } finally w.close()
  }

  /** Read a container file back as (columns, rows) with Java-side
    * values (Utf8 -> String, ByteBuffer -> Array[Byte]) — the spec-side
    * round-trip half; not a Spark scan. */
  def read(path: String): (Seq[String], Seq[Seq[Any]]) = {
    val r = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try {
      val cols = r.getSchema.getFields.asScala.map(_.name()).toSeq
      val rows = r.iterator().asScala.map { rec =>
        cols.map { c =>
          rec.get(c) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case b: java.nio.ByteBuffer =>
              val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
            case x => x
          }
        }
      }.toSeq
      (cols, rows)
    } finally r.close()
  }
}

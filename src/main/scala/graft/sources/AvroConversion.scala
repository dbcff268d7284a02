package graft.sources

import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.hadoop.io.AvroSerialization
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file leg of the conversion matrix (SURVEY §2.1 /
  * §2.8) — the remaining interchange format training pipelines
  * actually emit after CSV/JSONL/Parquet/ORC.
  *
  * Spark's `avro` DATASOURCE is an external module
  * (org.apache.spark:spark-avro) that this distribution does not
  * bundle; what it DOES ship is Avro core + avro-mapred
  * (avro-1.12 / avro-mapred-1.12 on the jars classpath). This module
  * therefore drives the conversion through the public Hadoop
  * AvroKeyInput/OutputFormat pair with an explicit StructType ⇄ Avro
  * Schema mapping — the same pattern as the engine's CSV inference
  * path: a real distributed read/write (per-partition container
  * files, splittable input), no driver-side funnel.
  *
  * Type mapping (the scalar types the matrix exercises): long ⇄
  * "long", int ⇄ "int", double ⇄ "double", float ⇄ "float", string ⇄
  * "string", boolean ⇄ "boolean", date ⇄ {"type": "int",
  * "logicalType": "date"} (epoch days), timestamp ⇄ timestamp-micros
  * (instant micros), timestamp_ntz ⇄ local-timestamp-micros — all
  * three temporal encodings are Avro's standard logical types. Every
  * field is written as the nullable union ["null", T]; nulls
  * roundtrip.
  *
  * RDD use is deliberate and minimal: the Hadoop formats speak
  * (AvroKey, NullWritable) pairs, which is genuine per-partition
  * imperative glue — all querying stays DataFrame-side on the
  * converted parquet.
  */
object AvroConversion {

  private def avroType(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case StringType => "\"string\""
    case BooleanType => "\"boolean\""
    case DateType => "{\"type\": \"int\", \"logicalType\": \"date\"}"
    case TimestampType =>
      "{\"type\": \"long\", \"logicalType\": \"timestamp-micros\"}"
    case TimestampNTZType =>
      "{\"type\": \"long\", \"logicalType\": \"local-timestamp-micros\"}"
    case other => throw new IllegalArgumentException(
      s"unsupported Avro conversion type: $other")
  }

  private val MicrosPerSecond = 1000000L

  private def toMicros(ldt: java.time.LocalDateTime): java.lang.Long =
    java.lang.Long.valueOf(
      Math.addExact(Math.multiplyExact(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC), MicrosPerSecond),
        ldt.getNano / 1000L))

  private def fromMicros(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, MicrosPerSecond),
      (Math.floorMod(micros, MicrosPerSecond) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** The Avro record schema JSON for a StructType — every field a
    * nullable union, names passed through (Avro name rules are a
    * superset of the engine's table columns).
    */
  def avroSchemaJson(schema: StructType, record: String = "graft_row"): String = {
    val fields = schema.fields.map { f =>
      s"""{"name": "${f.name}", "type": ["null", ${avroType(f.dataType)}], "default": null}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$record", "fields": [$fields]}"""
  }

  /** Write `df` as Avro container files under `path` (one file per
    * partition — the distributed layout every other sink here uses).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val json = avroSchemaJson(schema)
    val spark = df.sparkSession
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
    AvroJob.setOutputKeySchema(job, avroSchema)
    AvroSerialization.addToConfiguration(job.getConfiguration)
    val fields = schema.fields
    val pairs = df.rdd.mapPartitions { rows =>
      // parse once per partition: avro Schema is not serializable
      val sch = new org.apache.avro.Schema.Parser().parse(json)
      rows.map { row =>
        val rec: GenericRecord = new GenericData.Record(sch)
        var i = 0
        while (i < fields.length) {
          val v = row.get(i) match {
            case null => null
            case d: java.sql.Date => java.lang.Integer.valueOf(
              d.toLocalDate.toEpochDay.toInt)
            case t: java.sql.Timestamp =>
              // instant micros (zone-free): getTime floors to seconds,
              // getNanos carries the sub-second part
              java.lang.Long.valueOf(Math.addExact(Math.multiplyExact(
                Math.floorDiv(t.getTime, 1000L), MicrosPerSecond),
                t.getNanos / 1000L))
            case ldt: java.time.LocalDateTime => toMicros(ldt)
            case other => other.asInstanceOf[AnyRef]
          }
          rec.put(fields(i).name, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    // clean overwrite semantics, matching the parquet sinks
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    pairs.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Read Avro container files back into a DataFrame with `schema`
    * (the typed-read contract the CSV/JSONL converters use: the
    * caller states the shape, the read is a single distributed pass —
    * Avro container files are splittable, so big inputs parallelize).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val json = avroSchemaJson(schema)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job,
      new org.apache.avro.Schema.Parser().parse(json))
    AvroSerialization.addToConfiguration(job.getConfiguration)
    val fields = schema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      job.getConfiguration
    ).map { case (k, _) =>
      val rec = k.datum()
      val vals = fields.map { f =>
        val v = rec.get(f.name)
        (v, f.dataType) match {
          case (null, _) => null
          case (u: org.apache.avro.util.Utf8, StringType) => u.toString
          case (s: CharSequence, StringType) => s.toString
          case (i: java.lang.Integer, DateType) =>
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
          case (m: java.lang.Long, TimestampType) =>
            java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
              Math.floorDiv(m.longValue(), MicrosPerSecond),
              Math.floorMod(m.longValue(), MicrosPerSecond) * 1000L))
          case (m: java.lang.Long, TimestampNTZType) =>
            fromMicros(m.longValue())
          case (other, _) => other
        }
      }
      Row.fromSeq(vals.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container-file conversion (SURVEY §2.1/§2.8 conversion
  * matrix): typed roundtrip across every supported scalar type
  * including nulls, schema JSON shape, and the loud failure on an
  * unsupported type.
  */
class AvroConversionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("n", IntegerType),
    StructField("x", DoubleType),
    StructField("f", FloatType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("d", DateType),
    StructField("ts", TimestampType),
    StructField("lts", TimestampNTZType)))

  private def rows = Seq(
    Row(1L, 7, 3.25, 1.5f, "alpha", true, java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.from(java.time.Instant.parse("2024-02-29T12:34:56.123456Z")),
      java.time.LocalDateTime.parse("2024-02-29T23:59:59.000042")),
    Row(2L, null, null, null, null, null, null, null, null),
    Row(3L, -4, -0.125, 2.75f, "", false, java.sql.Date.valueOf("1969-12-31"),
      java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z")),
      java.time.LocalDateTime.parse("1969-12-31T00:00:00.5")))

  test("write → read roundtrips every supported type, nulls included") {
    val dir = tmpDir(s"avro_rt_${System.nanoTime()}")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroConversion.write(df, dir + "/data")
    val back = AvroConversion.read(spark, dir + "/data", schema)
    assert(back.schema === schema)
    assert(back.collect().toSet === rows.toSet)
    // container files are per-partition (a distributed write, not a
    // driver funnel)
    val parts = new java.io.File(dir + "/data").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 2, s"expected one container file per partition: ${parts.toSeq}")
  }

  test("schema JSON: nullable unions, date as the standard logicalType") {
    val json = AvroConversion.avroSchemaJson(schema)
    assert(json.contains(""""type": ["null", "long"]"""))
    assert(json.contains(""""logicalType": "date""""))
    // parseable by avro itself
    new org.apache.avro.Schema.Parser().parse(json)
  }

  test("unsupported types fail loudly, never coerce") {
    val bad = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val e = intercept[IllegalArgumentException] {
      AvroConversion.avroSchemaJson(bad)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("re-write overwrites cleanly (the parquet-sink overwrite contract)") {
    val dir = tmpDir(s"avro_ow_${System.nanoTime()}")
    val one = StructType(Seq(StructField("id", LongType)))
    AvroConversion.write(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L)), 2), one), dir + "/d")
    AvroConversion.write(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L)), 1), one), dir + "/d")
    val back = AvroConversion.read(spark, dir + "/d", one)
    assert(back.collect().toSeq === Seq(Row(9L)))
  }
}

package graft.sources

import graft.SparkSpec
import graft.sources.ArrowType._
import java.nio.file.{Files, Paths}

class SchemaInferenceSpec extends SparkSpec {

  private def writeCsv(name: String, content: String): String = {
    val p = Paths.get(tmpDir("infer"), name)
    Files.writeString(p, content)
    p.toString
  }

  test("arrow-32 type vote: bool/float/int/date64/date32/utf8") {
    val csv = writeCsv("basic.csv",
      """b,f,i,dt,d,s
        |true,1.5,42,2020-01-01 10:00:00,2020-01-01,hello
        |FALSE,-2.25,-7,2021-06-30T23:59:59,1999-12-31,world
        |""".stripMargin)
    val got = SchemaInference.infer(spark, csv).map(f => f.name -> f.arrowType).toMap
    assert(got === Map("b" -> ABool, "f" -> AFloat64, "i" -> AInt64,
      "dt" -> ADate64, "d" -> ADate32, "s" -> AUtf8))
  }

  test("int+float merges to Float64; int+string to Utf8; empties mark nullable") {
    val csv = writeCsv("merge.csv",
      """a,b,c
        |1,1,1
        |2.5,x,
        |""".stripMargin)
    val got = SchemaInference.infer(spark, csv)
    val byName = got.map(f => f.name -> f).toMap
    assert(byName("a").arrowType === AFloat64)
    assert(byName("b").arrowType === AUtf8)
    assert(byName("c").arrowType === AInt64)
    assert(byName("c").nullable)
    assert(!byName("a").nullable)
  }

  test("maxReadRecords=0 disables inference (all Utf8)") {
    val csv = writeCsv("zero.csv", "a,b\n1,2.5\n")
    val got = SchemaInference.infer(spark, csv, maxReadRecords = Some(0L))
    assert(got.forall(_.arrowType == AUtf8))
  }

  test("maxReadRecords limits the sample") {
    // first 1 record says Int64; the poison row after would force Utf8
    val csv = writeCsv("limited.csv", "a\n1\nnot_a_number\n")
    val all = SchemaInference.infer(spark, csv)
    assert(all.head.arrowType === AUtf8)
    val limited = SchemaInference.infer(spark, csv, maxReadRecords = Some(1L))
    assert(limited.head.arrowType === AInt64)
  }

  test("maxReadRecords samples the LEADING rows even across multiple splits") {
    // Two files in one directory; listing order puts the all-integer
    // file first and a LARGER all-string file second. A non-leading
    // sample (old limit(n), or any size-ordered split walk) would hit
    // the bigger string file; reference semantics (first n records)
    // must infer Int64.
    val dir = Paths.get(tmpDir("infer_lead"))
    Files.writeString(dir.resolve("a_part0.csv"),
      (1 to 50).map(i => s"$i").mkString("", "\n", "\n"))
    Files.writeString(dir.resolve("b_part1.csv"),
      (1 to 5000).map(i => s"str_$i").mkString("", "\n", "\n"))
    val lead = SchemaInference.infer(spark, dir.toString, header = false,
      maxReadRecords = Some(50L))
    assert(lead.head.arrowType === AInt64,
      "sample must be the leading rows of the first file")
    val full = SchemaInference.infer(spark, dir.toString, header = false)
    assert(full.head.arrowType === AUtf8, "full scan sees the string rows")
  }

  test("leading-rows sample drops every part file's OWN header in a header=true dir") {
    // first file is SHORT, so the sample spills into the second file:
    // its header line must not be voted as a Utf8 record, and the
    // record budget must not be consumed by header lines
    val dir = Paths.get(tmpDir("infer_hdr_dir"))
    Files.writeString(dir.resolve("p0.csv"), "a\n1\n2\n")
    Files.writeString(dir.resolve("p1.csv"), "a\n" + (3 to 40).mkString("\n") + "\n")
    val got = SchemaInference.infer(spark, dir.toString, header = true,
      maxReadRecords = Some(10L))
    assert(got.head.arrowType === AInt64,
      "part-file headers must be stripped, not voted as records")
  }

  test("leading-rows sample keeps header semantics: header line is not a record") {
    // poison row is record #3; sampling 2 records must stay Int64
    val csv = writeCsv("lead_hdr.csv", "a\n1\n2\nnope\n")
    val got = SchemaInference.infer(spark, csv, maxReadRecords = Some(2L))
    assert(got.head.arrowType === AInt64)
  }

  test("headerless naming matches arrow: column_1..n") {
    val csv = writeCsv("nohdr.csv", "1,x\n2,y\n")
    val got = SchemaInference.infer(spark, csv, header = false)
    assert(got.map(_.name) === Seq("column_1", "column_2"))
    assert(got.map(_.arrowType) === Seq(AInt64, AUtf8))
  }
}

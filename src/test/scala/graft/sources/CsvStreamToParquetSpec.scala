package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class CsvStreamToParquetSpec extends SparkSpec {

  test("continuous conversion: files convert incrementally, exactly once across restart") {
    val stamp = System.nanoTime()
    val in = tmpDir(s"csvstream_in_$stamp")
    val out = tmpDir(s"csvstream_out_$stamp")
    val chk = tmpDir(s"csvstream_chk_$stamp")
    def drop(name: String, rows: Range): Unit =
      Files.writeString(Paths.get(in, name),
        rows.map(i => s"$i,val_$i").mkString("id,v\n", "\n", "\n"))
    drop("a.csv", 1 to 100)
    drop("b.csv", 101 to 200)
    val schema = SchemaInference.toArrowSchema(
      SchemaInference.infer(spark, s"$in/a.csv")).toSpark
    def run(): Unit = {
      val q = CsvStreamToParquet.start(spark, in, schema, out, chk)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() === 200)
    // a new file lands while the pipeline is down; restart converts
    // ONLY it — the checkpoint remembers a.csv/b.csv
    drop("c.csv", 201 to 250)
    run()
    val df = spark.read.parquet(out)
    assert(df.count() === 250)
    assert(df.select("id").distinct().count() === 250, "no row converted twice")
    assert(df.schema("id").dataType.typeName === "long", "pinned schema applies")
  }
}

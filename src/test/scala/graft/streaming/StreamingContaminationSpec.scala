package graft.streaming

import graft.SparkSpec
import graft.operators.{LlmQueries, Similarity}
import org.apache.spark.sql.functions._

/** Streaming embedding-contamination gate: batch ≡ stream on the
  * same data, statelessness, and the planted-paraphrase catch.
  */
class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("stream contamination: flags equal the batch check on identical vectors") {
    val emb = graft.GraftSession.table(spark, sf0, "embeddings")
    val panel = emb.filter($"vec_id" % 50 === 0)
    val corpus = emb.filter($"vec_id" % 50 =!= 0)
    // the gate pins the width the GOVERNED batch kernel derives at
    // gate-build time (a stream cannot re-count the corpus per
    // batch); governedCrossPairs at this corpus ≡ the pinned kernel
    // at w (spec'd in SimilarityGovernanceSpec), so batch ≡ stream
    // holds against the shipped d21 width too
    val w = Similarity.chooseNBits(corpus.count())
    val batch = Similarity.multiProbeCrossPairs(
        corpus, panel, "vec_id", "embedding", 0.42, nBits = w)
      .select($"corpus_id", $"bench_id").as[(Long, Long)].collect().toSet

    val dir = tmpDir("scontam_in")
    new java.io.File(dir).listFiles().foreach(_.delete())
    corpus.select($"vec_id", $"embedding").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val (idx, pv) = StreamingContamination.panelIndex(panel, "vec_id",
      "embedding", nBits = w)
    val out = StreamingContamination.flagAgainstPanel(
      stream, idx, pv, "vec_id", "embedding", 0.42, nBits = w)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scontam").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("scontam")
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"stream/batch divergence: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
  }

  test("stream contamination: batch ≡ stream at a pinned WIDE width (the radius-3 regime)") {
    // r18: the probe radius steps to Hamming ≤ 3 at RadiusWideBits —
    // a gate pinned to a wide batch-derived width must flow the SAME
    // re-widened net through the stream-static join, or batch and
    // stream silently diverge exactly where the rule matters
    val w = 20
    assert(w >= Similarity.RadiusWideBits)
    val emb = graft.GraftSession.table(spark, sf0, "embeddings")
    val panel = emb.filter($"vec_id" % 50 === 0)
    val corpus = emb.filter($"vec_id" % 50 =!= 0)
    val batch = Similarity.multiProbeCrossPairs(
        corpus, panel, "vec_id", "embedding", 0.42, nBits = w)
      .select($"corpus_id", $"bench_id").as[(Long, Long)].collect().toSet
    val radius2 = Similarity.multiProbeCrossPairs(
        corpus, panel, "vec_id", "embedding", 0.42, nBits = w, radius = 2)
      .select($"corpus_id", $"bench_id").as[(Long, Long)].collect().toSet
    assert(radius2.subsetOf(batch),
      "radius 3 must only widen the net, never lose radius-2 pairs")
    val dir = tmpDir("scontam_wide")
    new java.io.File(dir).listFiles().foreach(_.delete())
    corpus.select($"vec_id", $"embedding").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val (idx, pv) = StreamingContamination.panelIndex(panel, "vec_id",
      "embedding", nBits = w)
    val out = StreamingContamination.flagAgainstPanel(
      stream, idx, pv, "vec_id", "embedding", 0.42, nBits = w)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scontam_w").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("scontam_w").as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"wide-width stream/batch divergence: only-stream=${streamed -- batch} " +
        s"only-batch=${batch -- streamed}")
  }

  test("stream contamination: planted paraphrase flagged at ingest, clean vector admitted") {
    val v = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val far = Array.tabulate(64)(i => math.cos(i * 3.1).toFloat)
    val panel = Seq((50L, v.toSeq)).toDF("vec_id", "embedding")
    val (idx, pv) = StreamingContamination.panelIndex(panel, "vec_id",
      "embedding", nBits = 8)
    // the per-micro-batch static broadcast is bucket STRINGS only
    // (r19): vectors live in the panel-sized pv frame, never on
    // probe rows
    assert(idx.columns.toSeq === Seq("bench_id", "bucket"))
    assert(pv.columns.toSeq === Seq("bench_id", "qv"))
    val dir = tmpDir("scontam_plant")
    new java.io.File(dir).listFiles().foreach(_.delete())
    Seq((1L, v.map(x => x * 0.93f).toSeq), (2L, far.toSeq))
      .toDF("vec_id", "embedding").write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val out = StreamingContamination.flagAgainstPanel(
      stream, idx, pv, "vec_id", "embedding", 0.42, nBits = 8)
    // the plan must be stateless: a stream-static join keeps nothing
    // across batches (no StateStore operator anywhere)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scontam_p").start()
    val stateOps = try {
      q.processAllAvailable()
      q.lastProgress.stateOperators.length
    } finally q.stop()
    val flagged = spark.table("scontam_p").as[(Long, Long)].collect().toSet
    assert(flagged === Set((1L, 50L)), s"got $flagged")
    assert(stateOps === 0, "the gate must run with ZERO streaming state")
  }
}

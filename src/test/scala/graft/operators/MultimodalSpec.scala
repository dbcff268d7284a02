package graft.operators

import graft.{GraftSession, SparkSpec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = GraftSession.table(spark, sf0, "documents")

  test("binary plumbing: schema, byte counts, deterministic features") {
    val media = Multimodal.fromText(spark, docs, "doc_id", "text", "image")
    val feats = Multimodal.decodeAll(media, targetPartitionBytes = 64 << 10)
    assert(feats.schema.fieldNames.toSeq ===
      Seq("id", "kind", "nBytes", "magicHex", "width", "height", "nFrames", "feature"))
    val rows = feats.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(r => r.nBytes > 0 && r.width >= 64 && r.height >= 64))
    assert(rows.forall(_.feature.length === 8))
    // deterministic: second run bit-identical (field-wise — case
    // classes with Array members compare by reference)
    val again = Multimodal.decodeAll(media, targetPartitionBytes = 64 << 10).collect()
    assert(rows.sortBy(_.id).zip(again.sortBy(_.id)).forall { case (a, b) =>
      a.id == b.id && a.kind == b.kind && a.nBytes == b.nBytes &&
        a.magicHex == b.magicHex && a.width == b.width && a.height == b.height &&
        a.nFrames == b.nFrames && a.feature.sameElements(b.feature)
    })
  }

  test("byte-budget partition sizing") {
    val media = Multimodal.fromText(spark, docs, "doc_id", "text", "video")
    val total = media.collect().map(_.content.length.toLong).sum
    val budget = 16L << 10
    val expected = ((total + budget - 1) / budget).toInt
    val parts = Multimodal.decodeAll(media, budget).rdd.getNumPartitions
    assert(parts === expected, s"total=$total budget=$budget")
  }

  test("features join back broadcast-safe") {
    val media = Multimodal.fromText(spark, docs.limit(50), "doc_id", "text", "audio")
    val feats = Multimodal.decodeAll(media)
    val joined = Multimodal.withFeatures(docs.limit(50), feats, "doc_id")
    assert(joined.count() === 50)
    assert(joined.filter($"nFrames" >= 1).count() === 50)
  }
}

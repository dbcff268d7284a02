package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * engine's job at 100 TB is the plumbing — schema, partition sizing,
  * batched per-partition transforms — not the codecs. This container
  * ships no image/audio libraries, so `decodeStub` is a clearly-marked
  * DETERMINISTIC FAKE (features derived from content bytes); swapping
  * in a real codec changes only the function body, not the plan shape.
  */
object Multimodal {

  final case class MediaFile(
      id: Long, kind: String, content: Array[Byte], tags: Map[String, String])

  final case class MediaFeatures(
      id: Long, kind: String, nBytes: Long, magicHex: String,
      width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** STUB CODEC — deterministic fake decode. A real implementation
    * would parse the container format here; the fake derives
    * plausible, reproducible dimensions/features from the bytes so
    * the pipeline around it is fully testable.
    */
  def decodeStub(m: MediaFile): MediaFeatures = {
    val h = java.util.Arrays.hashCode(m.content)
    def pos(x: Int, mod: Int): Int = math.floorMod(x, mod)
    val magic = m.content.take(4).map(b => f"$b%02X").mkString
    val frames = m.kind match {
      case "video" => 1 + pos(h >> 8, 240)
      case "audio" => 1 + pos(h >> 8, 16000)
      case _ => 1
    }
    val feat = Array.tabulate(8)(i => pos(h * (i + 31), 1000) / 1000.0f)
    MediaFeatures(m.id, m.kind, m.content.length.toLong, magic,
      64 + pos(h, 1024), 64 + pos(h >> 4, 1024), frames, feat)
  }

  /** Batched decode with byte-budget partition sizing: repartitions so
    * each task holds ~`targetPartitionBytes` of payload (decoders are
    * memory-bound, so row-count partitioning is wrong for media), then
    * decodes per-partition. `mapPartitions` is the genuine semantics
    * here — imperative per-batch work — per the (d) escape hatch in
    * the build rules.
    */
  def decodeAll(ds: Dataset[MediaFile],
      targetPartitionBytes: Long = 128L << 20): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    val totalBytes = ds.select(sum(octet_length(col("content")).cast("long")))
      .head().getLong(0)
    val parts = math.max(1, math.min(Int.MaxValue.toLong,
      (totalBytes + targetPartitionBytes - 1) / targetPartitionBytes)).toInt
    ds.repartition(parts).mapPartitions(_.map(decodeStub))
  }

  /** Attach media features back to a DataFrame by id (broadcast-safe
    * when the media side is the small one).
    */
  def withFeatures(df: DataFrame, features: Dataset[MediaFeatures],
      idCol: String): DataFrame =
    df.join(features.toDF(), df(idCol) === features("id"), "left")

  /** Build a MediaFile dataset from a text corpus (test/demo helper —
    * binary column materialized from text bytes).
    */
  def fromText(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, kind: String): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col(idCol).as("id"), lit(kind).as("kind"),
        col(textCol).cast("binary").as("content"),
        map(lit("origin"), lit("text")).as("tags"))
      .as[MediaFile]
  }
}

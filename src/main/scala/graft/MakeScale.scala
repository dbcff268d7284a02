package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up derivation of the driver's testdata — the
  * §8o closing-sweep fixture. No sf1 driver data exists, so the sweep
  * derives one from sf0.1: each table is replicated `factor`× with
  * every key remapped by `key + replica × (max(key) + 1)`, preserving
  * referential integrity (orders still join their customers, lineitem
  * its orders/parts/suppliers) while keeping every key unique. The
  * tiny dimensions (region, nation) are shared, not replicated —
  * replicas reference the same 25 nations, exactly how a real corpus
  * grows under fixed dimensions.
  *
  * Content columns perturb deterministically per replica so the
  * derived corpus stresses the same operators the original does
  * instead of degenerating into exact duplicates:
  *   - `documents.text` gains a replica prefix (`r<k> `), so dedup
  *     families see near-structure, not 10 identical copies of every
  *     doc; `n_chars` is recomputed to keep its length invariant;
  *   - `embeddings.embedding` gains a per-dimension offset of
  *     `k · 0.001 · ((i mod 7) − 3)`, breaking the exact-tie storm
  *     10 identical vectors would create in every top-k entry.
  * Both perturbations land IN the parquet, so Spark and the DuckDB
  * oracle read byte-identical inputs — the correctness gate is the
  * same gate, just at 10× the rows.
  *
  * Usage: runMain graft.MakeScale <srcSfDir> <outDir> [factor=10]
  * [tables] — `tables` (comma-separated, r17) restricts the
  * derivation to a subset (plus their shared dims): a 1000× vector
  * scale (`embeddings` → 2M rows) must not force 600M lineitem rows
  * onto disk for a similarity-family sweep that never reads them.
  */
object MakeScale {

  private def maxOf(df: DataFrame, key: String): Long =
    df.agg(max(col(key)).cast("long")).head().getLong(0)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScale <srcSfDir> <outDir> [factor] [tables]")
    val (src, out) = (args(0).stripSuffix("/"), args(1).stripSuffix("/"))
    val factor = if (args.length > 2) args(2).toInt else 10
    val only = if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set.empty[String]
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    require(only.subsetOf(known),
      s"unknown tables: ${(only -- known).mkString(", ")} (a typo here " +
        s"would silently derive nothing); known: ${known.mkString(", ")}")
    val spark = GraftSession.local()
    try build(spark, src, out, factor, only)
    finally spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, factor: Int,
      only: Set[String] = Set.empty): Unit = {
    def wanted(t: String): Boolean = only.isEmpty || only.contains(t)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    val reps = broadcast(
      spark.range(factor).select(col("id").cast("long").as("__rep")))
    def replicate(df: DataFrame)(remap: (String, org.apache.spark.sql.Column)*): DataFrame = {
      val mapped = remap.toMap
      df.crossJoin(reps)
        .select(df.columns.map(c => mapped.getOrElse(c, col(c)).as(c)): _*)
    }
    def shifted(key: String, stride: Long) =
      col(key) + col("__rep") * lit(stride)

    // shared dims (always — every subset may reference them)
    write(read("region"), "region")
    write(read("nation"), "nation")

    if (Seq("customer", "supplier", "part", "orders", "lineitem").exists(wanted)) {
      val customer = read("customer")
      val supplier = read("supplier")
      val part = read("part")
      val orders = read("orders")
      val cStride = maxOf(customer, "c_custkey") + 1
      val sStride = maxOf(supplier, "s_suppkey") + 1
      val pStride = maxOf(part, "p_partkey") + 1
      val oStride = maxOf(orders, "o_orderkey") + 1

      if (wanted("customer"))
        write(replicate(customer)("c_custkey" -> shifted("c_custkey", cStride)), "customer")
      if (wanted("supplier"))
        write(replicate(supplier)("s_suppkey" -> shifted("s_suppkey", sStride)), "supplier")
      if (wanted("part"))
        write(replicate(part)("p_partkey" -> shifted("p_partkey", pStride)), "part")
      if (wanted("orders"))
        write(replicate(orders)(
          "o_orderkey" -> shifted("o_orderkey", oStride),
          "o_custkey" -> shifted("o_custkey", cStride)), "orders")
      if (wanted("lineitem"))
        write(replicate(read("lineitem"))(
          "l_orderkey" -> shifted("l_orderkey", oStride),
          "l_partkey" -> shifted("l_partkey", pStride),
          "l_suppkey" -> shifted("l_suppkey", sStride)), "lineitem")
    }

    if (wanted("events")) {
      val events = read("events")
      val eStride = maxOf(events, "event_id") + 1
      val uStride = maxOf(events, "user_id") + 1
      write(replicate(events)(
        "event_id" -> shifted("event_id", eStride),
        "user_id" -> shifted("user_id", uStride)), "events")
    }

    if (wanted("documents")) {
      val docs = read("documents")
      val dStride = maxOf(docs, "doc_id") + 1
      val newText = when(col("__rep") === 0, col("text"))
        .otherwise(concat(lit("r"), col("__rep").cast("string"), lit(" "), col("text")))
      write(replicate(docs)(
        "doc_id" -> shifted("doc_id", dStride),
        "text" -> newText,
        "n_chars" -> length(newText).cast(docs.schema("n_chars").dataType)), "documents")
    }

    if (wanted("embeddings")) {
      val emb = read("embeddings")
      val vStride = maxOf(emb, "vec_id") + 1
      val dims = emb.schema("embedding").dataType
      write(replicate(emb)(
        "vec_id" -> shifted("vec_id", vStride),
        "embedding" -> transform(col("embedding"), (x, i) =>
          (x + col("__rep").cast("float") * lit(0.001f) *
            (pmod(i, lit(7)) - lit(3)).cast("float")).cast("float")).cast(dims)),
        "embeddings")
    }
    println(s"[makescale] $src -> $out at ${factor}x" +
      (if (only.nonEmpty) s" (tables: ${only.mkString(",")})" else ""))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst argmin over a fixed centroid table: for an
  * `array<double>` vector column, the cid of the nearest centroid by
  * sequential Σ(v−c)² with ties to the smaller cid — the exact
  * ordering of `min(struct(d, cid))` and of the literal `nearestCid`
  * form (`java.lang.Double.compare` tie semantics, left-to-right
  * accumulation), so every assignment path stays bit-identical and
  * oracle parity is untouched.
  *
  * Why an expression and not a plan: the literal form compiles k
  * (dist, cid) terms into one expression tree — fine to a few
  * hundred cells, but a corpus-derived k = N/targetCellSize breaks
  * codegen in the thousands. The join form (vectors ×
  * broadcast(centroids) → groupBy-min) materializes N×k
  * array-carrying rows through a hash aggregate — 78 M intermediate
  * rows for d13's sf10 assignment — and a higher-order
  * `array_min(transform(...))` over an attached centroid column runs
  * interpreted with a per-centroid allocation (measured SLOWER than
  * the join at sf10). This expression carries the centroid matrix as
  * a codegen reference object and loops k×dims in generated Java —
  * zero allocation, whole-stage codegen, one narrow map at any k.
  * The matrix ships once per stage inside the broadcast task binary;
  * the ceiling is the same k×dims table the other forms broadcast
  * (~10⁶ cells), where a hierarchical index takes over.
  */
case class NearestCell(child: Expression, cids: Seq[Int],
    cents: Seq[Seq[Double]]) extends UnaryExpression {

  // Seq fields (not Array): case-class equality stays STRUCTURAL, so
  // two instances built from the same centroid table canonicalize
  // together and subexpression elimination / plan-fragment reuse see
  // them as equal — Array fields compare by reference and would
  // defeat both.
  require(cids.length == cents.length && cids.nonEmpty,
    s"NearestCell: ${cids.length} cids vs ${cents.length} centroids")

  // primitive views for the hot loop and the codegen reference objects
  @transient private lazy val cidArr: Array[Int] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def dataType: DataType = IntegerType

  // a non-double array would read garbage through
  // ArrayData.getDouble (4-byte floats read as 8-byte doubles on the
  // unsafe layout) — exactly the silent corruption this expression
  // exists to avoid, so the type is checked at ANALYSIS time (the
  // replaced join form got the cast free from Catalyst coercion)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"NearestCell requires array<double>, got ${other.catalogString} " +
        "(cast with VectorFunctions.toDouble)")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    // a null ELEMENT would read as 0.0 through ArrayData.getDouble —
    // the literal nearestCid form null-propagates instead, so the
    // "both paths assign identically" contract would silently diverge
    // (r16 ADVICE); in-repo embeddings never carry null components,
    // so this is a corruption gate, not a code path
    var z = 0
    while (z < d) {
      if (v.isNullAt(z)) throw new IllegalArgumentException(
        s"NearestCell: null vector component at index $z")
      z += 1
    }
    var bestD = 0.0
    var bestC = 0
    var first = true
    var i = 0
    while (i < centArr.length) {
      val c = centArr(i)
      if (c.length != d) throw new IllegalArgumentException(
        s"NearestCell: dims mismatch ${c.length} vs $d")
      var s = 0.0
      var j = 0
      while (j < d) { val t = v.getDouble(j) - c(j); s += t * t; j += 1 }
      val cmp = if (first) -1 else java.lang.Double.compare(s, bestD)
      if (cmp < 0 || (cmp == 0 && cidArr(i) < bestC)) { bestD = s; bestC = cidArr(i) }
      first = false
      i += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("nearCents", centArr, "double[][]")
      val cidsRef = ctx.addReferenceObj("nearCids", cidArr, "int[]")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val cmp = ctx.freshName("cmp")
      val z = ctx.freshName("z")
      s"""
        int $d = $v.numElements();
        for (int $z = 0; $z < $d; $z++) {
          if ($v.isNullAt($z)) {
            throw new IllegalArgumentException(
              "NearestCell: null vector component at index " + $z);
          }
        }
        double $bestD = 0.0;
        int $bestC = 0;
        boolean $first = true;
        for (int $i = 0; $i < $centsRef.length; $i++) {
          double[] $c = $centsRef[$i];
          if ($c.length != $d) {
            throw new IllegalArgumentException(
              "NearestCell: dims mismatch " + $c.length + " vs " + $d);
          }
          double $s = 0.0;
          for (int $j = 0; $j < $d; $j++) {
            double $t = $v.getDouble($j) - $c[$j];
            $s += $t * $t;
          }
          int $cmp = $first ? -1 : java.lang.Double.compare($s, $bestD);
          if ($cmp < 0 || ($cmp == 0 && $cidsRef[$i] < $bestC)) {
            $bestD = $s;
            $bestC = $cidsRef[$i];
          }
          $first = false;
        }
        ${ev.value} = $bestC;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  /** `v` must be an array<double> column; `cents` is (cid → centroid)
    * exactly as `IvfIndex.learnCentroids` returns it.
    */
  def apply(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    GraftColumnBridge.column(NearestCell(GraftColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst ROUTED argmin — the fine-level half of the
  * two-level (hierarchical) centroid index: for a vector and its
  * already-assigned COARSE cell id, the globally-unique cid of the
  * nearest FINE centroid among that coarse cell's fine set, by the
  * exact [[NearestCell]] ordering (sequential Σ(v−c)² in doubles,
  * ties to the smaller cid), so a kc=1 routed assignment is
  * bit-identical to flat NearestCell over the same fine set
  * (spec-pinned).
  *
  * Why this exists: flat NearestCell ships ONE k×dims matrix and
  * loops k per row — its own scaladoc names ~10⁶ cells as the
  * ceiling (reference-object size and n·k FLOPs). The two-level
  * split ships kc + kc·kf centroids but loops only kc + kf per row:
  * at k = kc·kf = 4096 (64×64) that is 32× fewer FLOPs per row, and
  * the matrix a row touches is one coarse slot's kf×dims slice —
  * the cache-resident inner loop a 100 TB assignment pass needs.
  * Routing is a plain int lookup through a dense slot table
  * (coarse cids are small positive ints by construction); an unknown
  * coarse id fails loudly — it means the router and the fine table
  * came from different learnings, the silent-corruption class the
  * float/null gates in NearestCell guard.
  *
  * `left` = vector (array<double>), `right` = coarse cid (int).
  * Seq fields keep case-class equality STRUCTURAL (the NearestCell
  * lesson): instances built from the same learned model canonicalize
  * together for subexpression elimination.
  */
case class NearestCellRouted(left: Expression, right: Expression,
    coarseIds: Seq[Int], fineCids: Seq[Seq[Int]],
    fineCents: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  require(coarseIds.nonEmpty && coarseIds.length == fineCids.length &&
    coarseIds.length == fineCents.length &&
    fineCids.zip(fineCents).forall { case (a, b) =>
      a.nonEmpty && a.length == b.length },
    "NearestCellRouted: per-coarse fine tables must align and be non-empty")
  require(coarseIds.forall(c => c >= 0 && c < (1 << 20)),
    "NearestCellRouted: coarse cids must be small non-negative ints")

  // primitive views for the hot loop / codegen reference objects
  @transient private lazy val slotArr: Array[Int] = {
    val t = Array.fill(coarseIds.max + 1)(-1)
    coarseIds.zipWithIndex.foreach { case (c, i) => t(c) = i }
    t
  }
  @transient private lazy val cidArr: Array[Array[Int]] =
    fineCids.map(_.toArray).toArray
  @transient private lazy val centArr: Array[Array[Array[Double]]] =
    fineCents.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"NearestCellRouted requires (array<double>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cc = b.asInstanceOf[Int]
    val slot = if (cc >= 0 && cc < slotArr.length) slotArr(cc) else -1
    if (slot < 0) throw new IllegalArgumentException(
      s"NearestCellRouted: unknown coarse cell $cc (router/fine-table mismatch)")
    val d = v.numElements()
    var z = 0
    while (z < d) {
      if (v.isNullAt(z)) throw new IllegalArgumentException(
        s"NearestCellRouted: null vector component at index $z")
      z += 1
    }
    val cents = centArr(slot)
    val cids = cidArr(slot)
    var bestD = 0.0
    var bestC = 0
    var first = true
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      if (c.length != d) throw new IllegalArgumentException(
        s"NearestCellRouted: dims mismatch ${c.length} vs $d")
      var s = 0.0
      var j = 0
      while (j < d) { val t = v.getDouble(j) - c(j); s += t * t; j += 1 }
      val cmp = if (first) -1 else java.lang.Double.compare(s, bestD)
      if (cmp < 0 || (cmp == 0 && cids(i) < bestC)) { bestD = s; bestC = cids(i) }
      first = false
      i += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cc) => {
      val centsRef = ctx.addReferenceObj("routedCents", centArr, "double[][][]")
      val cidsRef = ctx.addReferenceObj("routedCids", cidArr, "int[][]")
      val slotRef = ctx.addReferenceObj("routedSlots", slotArr, "int[]")
      val slot = ctx.freshName("slot")
      val d = ctx.freshName("d")
      val z = ctx.freshName("z")
      val cents = ctx.freshName("cents")
      val cids = ctx.freshName("cids")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val cmp = ctx.freshName("cmp")
      s"""
        int $slot = ($cc >= 0 && $cc < $slotRef.length) ? $slotRef[$cc] : -1;
        if ($slot < 0) {
          throw new IllegalArgumentException(
            "NearestCellRouted: unknown coarse cell " + $cc +
            " (router/fine-table mismatch)");
        }
        int $d = $v.numElements();
        for (int $z = 0; $z < $d; $z++) {
          if ($v.isNullAt($z)) {
            throw new IllegalArgumentException(
              "NearestCellRouted: null vector component at index " + $z);
          }
        }
        double[][] $cents = $centsRef[$slot];
        int[] $cids = $cidsRef[$slot];
        double $bestD = 0.0;
        int $bestC = 0;
        boolean $first = true;
        for (int $i = 0; $i < $cents.length; $i++) {
          double[] $c = $cents[$i];
          if ($c.length != $d) {
            throw new IllegalArgumentException(
              "NearestCellRouted: dims mismatch " + $c.length + " vs " + $d);
          }
          double $s = 0.0;
          for (int $j = 0; $j < $d; $j++) {
            double $t = $v.getDouble($j) - $c[$j];
            $s += $t * $t;
          }
          int $cmp = $first ? -1 : java.lang.Double.compare($s, $bestD);
          if ($cmp < 0 || ($cmp == 0 && $cids[$i] < $bestC)) {
            $bestD = $s;
            $bestC = $cids[$i];
          }
          $first = false;
        }
        ${ev.value} = $bestC;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellRouted =
    copy(left = newLeft, right = newRight)
}

object NearestCellRouted {
  /** `v` must be array<double>, `coarseCid` int; `fine` maps each
    * coarse cid to its (globally-unique fine cid → centroid) table.
    */
  def apply(v: Column, coarseCid: Column,
      fine: Seq[(Int, Seq[(Int, Seq[Double])])]): Column =
    GraftColumnBridge.column(NearestCellRouted(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(coarseCid),
      fine.map(_._1), fine.map(_._2.map(_._1)), fine.map(_._2.map(_._2))))
}

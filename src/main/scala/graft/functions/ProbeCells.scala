package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst top-`nprobe` centroid probe: the ids of the
  * `nprobe` nearest centroids by sequential Σ(v−c)², nearest first,
  * ties to the smaller cid — bit-identical to the literal
  * `transform(slice(array_sort(array(struct(d, cid)...)), 1, nprobe),
  * s -> s.cid)` form it replaces (`java.lang.Double.compare` order ≡
  * the SQL double ordering here: the distances are sums of squares,
  * so no −0.0 and no NaN without NaN inputs; fewer than `nprobe`
  * centroids return all of them, exactly like `slice`).
  *
  * Why an expression (the NearestCell rationale, query side): the
  * literal probe embeds k×dims literal doubles per use, allocates an
  * interpreted zip_with array TWICE per centroid per row
  * (ADP(diff, diff)), and sorts all k structs to take the first 2.
  * This expression carries the centroid matrix as a codegen reference
  * object and does a k·nprobe selection over a primitive distance
  * array in generated Java.
  */
case class ProbeCells(child: Expression, cids: Seq[Int],
    cents: Seq[Seq[Double]], nprobe: Int) extends UnaryExpression {

  // Seq fields (not Array): structural case-class equality, so equal
  // centroid tables canonicalize together (see NearestCell).
  require(cids.length == cents.length && cids.nonEmpty,
    s"ProbeCells: ${cids.length} cids vs ${cents.length} centroids")
  require(nprobe >= 1, s"ProbeCells: nprobe=$nprobe")

  @transient private lazy val cidArr: Array[Int] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ProbeCells requires array<double>, got ${other.catalogString} " +
        "(cast with VectorFunctions.toDouble)")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    var z = 0
    while (z < d) {
      if (v.isNullAt(z)) throw new IllegalArgumentException(
        s"ProbeCells: null vector component at index $z")
      z += 1
    }
    val k = centArr.length
    val dist = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centArr(i)
      if (c.length != d) throw new IllegalArgumentException(
        s"ProbeCells: dims mismatch ${c.length} vs $d")
      var s = 0.0
      var j = 0
      while (j < d) { val t = v.getDouble(j) - c(j); s += t * t; j += 1 }
      dist(i) = s
      i += 1
    }
    val n = math.min(nprobe, k)
    val res = new Array[Int](n)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < n) {
      var best = -1
      var i2 = 0
      while (i2 < k) {
        if (!used(i2)) {
          if (best < 0) best = i2
          else {
            val cmp = java.lang.Double.compare(dist(i2), dist(best))
            if (cmp < 0 || (cmp == 0 && cidArr(i2) < cidArr(best))) best = i2
          }
        }
        i2 += 1
      }
      used(best) = true
      res(slot) = cidArr(best)
      slot += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("probeCents", centArr, "double[][]")
      val cidsRef = ctx.addReferenceObj("probeCids", cidArr, "int[]")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val dist = ctx.freshName("dist")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val z = ctx.freshName("z")
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      val used = ctx.freshName("used")
      val slot = ctx.freshName("slot")
      val best = ctx.freshName("best")
      val i2 = ctx.freshName("i2")
      val cmp = ctx.freshName("cmp")
      s"""
        int $d = $v.numElements();
        for (int $z = 0; $z < $d; $z++) {
          if ($v.isNullAt($z)) {
            throw new IllegalArgumentException(
              "ProbeCells: null vector component at index " + $z);
          }
        }
        int $k = $centsRef.length;
        double[] $dist = new double[$k];
        for (int $i = 0; $i < $k; $i++) {
          double[] $c = $centsRef[$i];
          if ($c.length != $d) {
            throw new IllegalArgumentException(
              "ProbeCells: dims mismatch " + $c.length + " vs " + $d);
          }
          double $s = 0.0;
          for (int $j = 0; $j < $d; $j++) {
            double $t = $v.getDouble($j) - $c[$j];
            $s += $t * $t;
          }
          $dist[$i] = $s;
        }
        int $n = java.lang.Math.min($nprobe, $k);
        int[] $res = new int[$n];
        boolean[] $used = new boolean[$k];
        for (int $slot = 0; $slot < $n; $slot++) {
          int $best = -1;
          for (int $i2 = 0; $i2 < $k; $i2++) {
            if (!$used[$i2]) {
              if ($best < 0) { $best = $i2; }
              else {
                int $cmp = java.lang.Double.compare($dist[$i2], $dist[$best]);
                if ($cmp < 0 || ($cmp == 0 && $cidsRef[$i2] < $cidsRef[$best])) {
                  $best = $i2;
                }
              }
            }
          }
          $used[$best] = true;
          $res[$slot] = $cidsRef[$best];
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

object ProbeCells {
  /** `v` must be array<double>; `cents` is (cid → centroid) exactly as
    * `IvfIndex.learnCentroids` returns it.
    */
  def apply(v: Column, cents: Seq[(Int, Seq[Double])], nprobe: Int): Column =
    GraftColumnBridge.column(ProbeCells(GraftColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2), nprobe))
}

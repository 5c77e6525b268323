package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Codegen vector kernels over `array<double>` embedding columns.
  *
  * Round 2 ran every vector distance (q28/q29/q35/q36) through
  * `aggregate(zip_with(...))` higher-order functions, which Spark
  * evaluates INTERPRETED — per row, per element, with a boxed lambda
  * call per step (the measured cause of the q35 3.8× bench regression).
  * These expressions compute the same folds as tight generated-code
  * loops (one static call per row, no allocation beyond the result).
  *
  * IEEE bit-identity contract (matches graft.oracle.GoldenOracles and
  * the former HOF forms): every accumulator folds in ascending element
  * index order seeded with 0.0 — `acc += f(a[i], b[i])`. CosineSim's
  * three accumulators (ab, aa, bb) fold in that same order, so the
  * single-pass loop is bit-identical to three separate dot products.
  */
object VecRT {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }

  private def dist2Arr(a: ArrayData, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { val d = a.getDouble(i) - c(i); acc += d * d; i += 1 }
    acc
  }

  /** One LSH table's signature: bit j set iff Σ_d v[d]*w[j][d] ≥ 0
    * (per-bit accumulator in element order — same fold as the golden
    * oracle's plain-Scala loop). */
  def rhpSig(v: ArrayData, w: Array[Array[Double]]): Long = {
    var sig = 0L
    var j = 0
    while (j < w.length) {
      val wj = w(j)
      var acc = 0.0
      var d = 0
      while (d < wj.length) { acc += v.getDouble(d) * wj(d); d += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** argmin_i (dist2(v, cents[i]), cids[i]) — callers pass cids in
    * ascending order so the strict `<` keeps the lowest cid on ties
    * (matches `min(struct(d2, cid))` / the oracle's tuple min). */
  def nearestCentroid(v: ArrayData, cids: Array[Int], cents: Array[Array[Double]]): Int = {
    var best = Double.PositiveInfinity
    var bc = -1
    var i = 0
    while (i < cents.length) {
      val d2 = dist2Arr(v, cents(i))
      if (d2 < best) { best = d2; bc = cids(i) }
      i += 1
    }
    bc
  }

  /** The `nprobe` centroids nearest to `v`, ordered by (dist2, cid)
    * ascending — the oracle's `sortBy(identity).take(nprobe)` over
    * (d2, cid) tuples, as a small insertion sort. */
  def probeCells(v: ArrayData, cids: Array[Int], cents: Array[Array[Double]],
                 nprobe: Int): ArrayData = {
    val n = math.min(nprobe, cents.length)
    val bd = Array.fill(n)(Double.PositiveInfinity)
    val bc = Array.fill(n)(Int.MaxValue)
    var i = 0
    while (i < cents.length) {
      val d2 = dist2Arr(v, cents(i))
      val c = cids(i)
      var j = n - 1
      if (d2 < bd(j) || (d2 == bd(j) && c < bc(j))) {
        bd(j) = d2; bc(j) = c
        while (j > 0 && (bd(j) < bd(j - 1) || (bd(j) == bd(j - 1) && bc(j) < bc(j - 1)))) {
          val td = bd(j); bd(j) = bd(j - 1); bd(j - 1) = td
          val tc = bc(j); bc(j) = bc(j - 1); bc(j - 1) = tc
          j -= 1
        }
      }
      i += 1
    }
    new GenericArrayData(bc.take(n).map(x => x: Any))
  }
}

/** `dot(a, b)` over two `array<double>` columns. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRT.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecRT.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `cosine(a, b)` over two `array<double>` columns. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRT.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecRT.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `dist2(a, b)` — squared euclidean distance. */
case class Dist2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRT.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecRT.dist2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Dist2 =
    copy(left = l, right = r)
}

/** One LSH table's random-hyperplane signature (weights pre-computed on
  * the driver — VectorOps.planeWeights — and shipped as a reference
  * object; one vector pass per row computes all bits). */
case class RhpSig(child: Expression, weights: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"
  override protected def nullSafeEval(v: Any): Any =
    VecRT.rhpSig(v.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpWeights", weights, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VecRT.rhpSig($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): RhpSig = copy(child = c)
}

/** IVF coarse quantizer: id of the nearest centroid (ties → lowest cid;
  * `cids` ascending). Replaces round 2's crossJoin(16 centroids) +
  * groupBy-min — one pass, no row blow-up, no shuffle. */
case class NearestCentroid(child: Expression, cids: Array[Int], cents: Array[Array[Double]])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(v: Any): Any =
    VecRT.nearestCentroid(v.asInstanceOf[ArrayData], cids, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rc = ctx.addReferenceObj("nnCids", cids, "int[]")
    val rv = ctx.addReferenceObj("nnCents", cents, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VecRT.nearestCentroid($v, $rc, $rv)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
}

/** IVF probe list: the `nprobe` nearest cell ids, by (dist2, cid). */
case class ProbeCells(child: Expression, cids: Array[Int], cents: Array[Array[Double]],
                      nprobe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "probe_cells"
  override protected def nullSafeEval(v: Any): Any =
    VecRT.probeCells(v.asInstanceOf[ArrayData], cids, cents, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rc = ctx.addReferenceObj("pcCids", cids, "int[]")
    val rv = ctx.addReferenceObj("pcCents", cents, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VecRT.probeCells($v, $rc, $rv, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): ProbeCells = copy(child = c)
}

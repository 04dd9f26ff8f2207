package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All `bands` hyperplane-LSH band signatures of an embedding in ONE
  * pass — the [[MinHashBandHashes]]/[[SimHash64]] treatment for the ANN
  * bucketing stage.
  *
  * Value-identical to the composable form in
  * `SimilarityOps.lshCosineTopK` — per plane `b·ppb + p`, bit p of band
  * b's signature is set iff `Σ_i vec(i)·plane(i)` is positive, with the
  * plane components drawn from the same splitmix64 generator and the
  * dot accumulated left-to-right in double in index order. The
  * composable form pays `bands × planesPerBand` interpreted
  * `aggregate(zip_with(...))` traversals per ROW (64 zipped-array
  * allocations for the default 8×8); here the whole signature block is
  * one generated call over a cached plane matrix.
  *
  * Edge semantics mirror the HOF form exactly: a null element anywhere,
  * or a vector whose length differs from `dim`, nulls every dot — every
  * `when(dot > 0, …)` falls to its 0 branch — so all band signatures
  * are 0 (such rows all land in the same buckets and are re-ranked by
  * exact cosine like everything else). A null array is null.
  */
case class HyperplaneBandSigs(
    child: Expression, bands: Int, planesPerBand: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bands > 0 && planesPerBand > 0 && planesPerBand <= 60 && dim > 0,
    s"need 0 < planesPerBand <= 60, got $bands bands x $planesPerBand planes, dim $dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    HyperplaneBandSigs.sigs(a.asInstanceOf[ArrayData], bands, planesPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneBandSigs.sigs($c, $bands, $planesPerBand, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_band_sigs"
}

object HyperplaneBandSigs {

  /** Same generator as `SimilarityOps.planeComponent` — uniform in
    * [-1, 1) from a splitmix64 draw of (plane, dim index). The plane
    * matrix is a pure function of (numPlanes, dim): computed once per
    * executor and cached, equal to the driver-side literals of the
    * composable form.
    */
  /** private[graft]: the oracle query generator (q45) inlines these
    * constants as SQL double literals so DuckDB replays the identical
    * plane matrix.
    */
  private[graft] def planeComponent(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planes(numPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((numPlanes, dim), { case (n, d) =>
      val m = new Array[Double](n * d)
      var p = 0
      while (p < n) {
        var i = 0
        while (i < d) { m(p * d + i) = planeComponent(p, i); i += 1 }
        p += 1
      }
      m
    })

  def sigs(arr: ArrayData, bands: Int, planesPerBand: Int, dim: Int): ArrayData = {
    val out = new Array[Long](bands)
    val len = arr.numElements()
    var anyNull = len != dim
    var i = 0
    while (!anyNull && i < len) { anyNull = arr.isNullAt(i); i += 1 }
    if (!anyNull) {
      val m = planes(bands * planesPerBand, dim)
      val v = new Array[Double](dim)
      i = 0
      while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
      var b = 0
      while (b < bands) {
        var sig = 0L
        var p = 0
        while (p < planesPerBand) {
          val off = (b * planesPerBand + p) * dim
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += v(j) * m(off + j); j += 1 }
          if (acc > 0) sig |= 1L << p
          p += 1
        }
        out(b) = sig
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  def hyperplaneBandSigs(vec: Column, bands: Int, planesPerBand: Int, dim: Int): Column =
    ColumnBridge.column(
      HyperplaneBandSigs(ColumnBridge.expression(vec), bands, planesPerBand, dim))
}

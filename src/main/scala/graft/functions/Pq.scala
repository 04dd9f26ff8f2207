package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the compressed-index
  * ANN leg next to [[TopCentroids]]' IVF and
  * [[HyperplaneBandSigs]]' LSH: split a `dim`-vector into `m`
  * contiguous subvectors, quantize each against its own `ksub`-entry
  * codebook, and search with ASYMMETRIC distance (exact query
  * subvector vs quantized corpus subvector) via a per-query lookup
  * table.
  *
  * Three narrow generated passes, mirroring the TopCentroids shape —
  * the codebook (`m × ksub × dim/m` floats, a few KB) rides the
  * serialized expression like a broadcast dim; no Exchange, no row
  * blowup:
  *  - [[PqEncode]]: vector → `m` codes (the corpus-side pass; at rest
  *    a corpus row carries `m` small ints instead of `dim` floats —
  *    the 100 TB storage story, 32× at m=8/dim=64/fp32).
  *  - [[PqLut]]: query vector → `m·ksub` squared-L2 distances to every
  *    codebook entry (the O(ksub·dim) per-QUERY table that makes
  *    per-candidate cost O(m)).
  *  - [[AdcLookup]]: (lut, codes) → distance, a pure `m`-add table
  *    walk per candidate pair — the ADC inner loop.
  *
  * Determinism contract (shared with [[TopCentroids]]): widen floats
  * to double before arithmetic, accumulate left-to-right in index
  * order, break assignment ties toward the LOWEST code via
  * strictly-less displacement — so a DuckDB replay with the same
  * codebook literals reproduces codes and distances bit-for-bit.
  * A vector whose length differs from `dim`, or with a null element,
  * is NULL (no codes, no table) — the [[TopCentroids]] null contract.
  */
case class PqEncode(child: Expression, cb: Array[Float], m: Int, ksub: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  Pq.validate(cb, m, ksub, dim)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null even on non-null input: length-mismatched / null-element vectors
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Pq.encode(a.asInstanceOf[ArrayData], cb, m, ksub, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Pq.encode($c, $cbRef, $m, $ksub, $dim);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Per-query ADC lookup table: element `s·ksub + c` is the squared L2
  * distance from the query's subvector `s` to codebook entry `(s, c)`.
  * See [[PqEncode]] for the contracts.
  */
case class PqLut(child: Expression, cb: Array[Float], m: Int, ksub: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  Pq.validate(cb, m, ksub, dim)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Pq.lut(a.asInstanceOf[ArrayData], cb, m, ksub, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Pq.lut($c, $cbRef, $m, $ksub, $dim);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_lut"
}

/** The ADC inner loop: `Σ_s lut[s·ksub + codes[s]]`, summed in
  * ascending subspace order — O(m) per candidate pair. NULL when the
  * table length is not a multiple of `ksub`, the code count disagrees
  * with the table, or any code is null / out of range.
  */
case class AdcLookup(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(ksub > 0, s"need ksub > 0, got $ksub")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    Pq.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
      java.lang.Double ${ev.value}_box = graft.functions.Pq.adc($l, $r, $ksub);
      ${ev.isNull} = ${ev.value}_box == null;
      ${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_box.doubleValue();""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_lookup"
}

object Pq {

  private[functions] def validate(cb: Array[Float], m: Int, ksub: Int, dim: Int): Unit = {
    require(m > 0 && ksub > 0 && dim > 0 && dim % m == 0,
      s"need dim ($dim) divisible by m ($m) and positive ksub ($ksub)")
    require(cb.length == m * ksub * (dim / m),
      s"codebook length ${cb.length} != m*ksub*subdim = ${m * ksub * (dim / m)}")
  }

  /** Copies a valid fixed-`dim` vector to doubles, or null on a length
    * mismatch / null element — the shared [[TopCentroids]] contract.
    */
  private def widen(arr: ArrayData, dim: Int): Array[Double] = {
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = arr.getFloat(i).toDouble
      i += 1
    }
    v
  }

  /** Squared L2 from `v[s·subdim ..)` to codebook entry `(s, c)`:
    * widen-then-subtract per component, left-to-right accumulation.
    */
  private def d2(v: Array[Double], cb: Array[Float],
      s: Int, c: Int, ksub: Int, subdim: Int): Double = {
    val vOff = s * subdim
    val cOff = (s * ksub + c) * subdim
    var acc = 0.0
    var j = 0
    while (j < subdim) {
      val x = v(vOff + j) - cb(cOff + j).toDouble
      acc += x * x
      j += 1
    }
    acc
  }

  /** `m` codes — per subspace the argmin-d2 codebook entry, scanning
    * codes ascending and displacing only on STRICTLY smaller distance
    * (equal-distance ties keep the lower code).
    */
  def encode(arr: ArrayData, cb: Array[Float], m: Int, ksub: Int, dim: Int): ArrayData = {
    val v = widen(arr, dim)
    if (v == null) return null
    val subdim = dim / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = d2(v, cb, s, 0, ksub, subdim)
      var c = 1
      while (c < ksub) {
        val d = d2(v, cb, s, c, ksub, subdim)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** The `m·ksub` ADC table (row-major by subspace). */
  def lut(arr: ArrayData, cb: Array[Float], m: Int, ksub: Int, dim: Int): ArrayData = {
    val v = widen(arr, dim)
    if (v == null) return null
    val subdim = dim / m
    val t = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        t(s * ksub + c) = d2(v, cb, s, c, ksub, subdim)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(t)
  }

  /** ADC distance, or null on a malformed (lut, codes) pair. */
  def adc(lutArr: ArrayData, codes: ArrayData, ksub: Int): java.lang.Double = {
    val n = lutArr.numElements()
    if (n % ksub != 0) return null
    val m = n / ksub
    if (codes.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      if (lutArr.isNullAt(s * ksub + c)) return null
      acc += lutArr.getDouble(s * ksub + c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def pqCodes(vec: Column, cb: Array[Float], m: Int, ksub: Int, dim: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), cb, m, ksub, dim))

  def pqLutCol(vec: Column, cb: Array[Float], m: Int, ksub: Int, dim: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(vec), cb, m, ksub, dim))

  def adcLookup(lut: Column, codes: Column, ksub: Int): Column =
    ColumnBridge.column(AdcLookup(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes), ksub))
}

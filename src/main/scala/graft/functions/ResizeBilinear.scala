package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bilinear image/frame RESIZE over a flat row-major `array<float>`
  * of shape (h × w × c) — the "resize" stage of the multimodal
  * pipeline (SURVEY §2.10 / prompt: decode → resize →
  * feature-extract → frame-sample) as pure arithmetic: no image
  * libraries, deterministic to the last bit, usable on any decoded
  * payload ([[graft.ops.MultimodalOps]]' frame arrays).
  *
  * Sampling convention: `align_corners=false` (the PIL / torch
  * `interpolate` default) — source coordinate
  * `s = (d + 0.5) · (in/out) − 0.5`, clamped to the edge, then the
  * 2×2 neighborhood blends with the fractional weights. Identity
  * dims return the input values exactly (weights collapse to 1·pixel).
  *
  * One generated pass per row (`outH × outW × c` multiply-adds);
  * a vector whose length differs from `h·w·c` or with a null element
  * is NULL — the [[MatVec]]/[[TopCentroids]] null-on-mismatch
  * contract.
  */
case class ResizeBilinear(
    child: Expression, h: Int, w: Int, c: Int, outH: Int, outW: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(h >= 1 && w >= 1 && c >= 1 && outH >= 1 && outW >= 1,
    s"all dims must be >= 1, got ($h, $w, $c) -> ($outH, $outW)")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ResizeBilinear.resize(a.asInstanceOf[ArrayData], h, w, c, outH, outW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.ResizeBilinear.resize($v, $h, $w, $c, $outH, $outW);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "resize_bilinear"
}

object ResizeBilinear {

  def resize(v: ArrayData, h: Int, w: Int, c: Int,
      outH: Int, outW: Int): GenericArrayData = {
    if (v.numElements() != h * w * c) return null
    val in = new Array[Float](h * w * c)
    var i = 0
    while (i < in.length) {
      if (v.isNullAt(i)) return null
      in(i) = v.getFloat(i)
      i += 1
    }
    val out = new Array[Any](outH * outW * c)
    val sy = h.toDouble / outH
    val sx = w.toDouble / outW
    var oy = 0
    while (oy < outH) {
      val fy = (oy + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var ox = 0
      while (ox < outW) {
        val fx = (ox + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        var ch = 0
        while (ch < c) {
          val p00 = in((y0 * w + x0) * c + ch).toDouble
          val p01 = in((y0 * w + x1) * c + ch).toDouble
          val p10 = in((y1 * w + x0) * c + ch).toDouble
          val p11 = in((y1 * w + x1) * c + ch).toDouble
          val top = p00 + (p01 - p00) * wx
          val bot = p10 + (p11 - p10) * wx
          out((oy * outW + ox) * c + ch) =
            java.lang.Float.valueOf((top + (bot - top) * wy).toFloat)
          ch += 1
        }
        ox += 1
      }
      oy += 1
    }
    new GenericArrayData(out)
  }

  def resizeBilinear(img: Column, h: Int, w: Int, c: Int,
      outH: Int, outW: Int): Column =
    ColumnBridge.column(ResizeBilinear(
      ColumnBridge.expression(img), h, w, c, outH, outW))
}

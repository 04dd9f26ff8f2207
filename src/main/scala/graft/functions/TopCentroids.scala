package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The `nprobe` nearest IVF centroids of an embedding — by cosine,
  * descending, ties broken by ascending centroid id — as one NARROW
  * generated pass over a broadcast centroid matrix.
  *
  * This replaces the former assignment plan in
  * `SimilarityOps.ivfCosineTopK` (`crossJoin(broadcast(centroids))` +
  * `row_number` over `Window.partitionBy(id)`), which replicated every
  * corpus row `nlist`× — each copy CARRYING ITS VECTOR — through a
  * window Exchange just to pick the per-row argmin (VERDICT r4 #2).
  * Nearest-centroid assignment is a pure per-row function of
  * (vector, centroid matrix): here the matrix rides the serialized
  * expression (`nlist × dim` floats — a few KB; at cluster scale it
  * ships once per executor inside the plan broadcast, exactly like a
  * broadcast dim), and the top-`nprobe` selection is an O(nlist·nprobe)
  * insertion into two tiny locals inside whole-stage codegen. No
  * Exchange, no row blowup.
  *
  * Per-centroid cosine is bit-identical to [[CosineSimilarity]] on
  * fixed-dim inputs: widen to double before multiply, left-to-right
  * accumulation in index order, zero-norm → 0.0. A vector whose length
  * differs from `dim`, or with a null element, is NULL (no assignment,
  * no probes) — the same null-on-mismatch contract as
  * [[HyperplaneBandSigs]]; `ivfCosineTopK` requires its centroid rows
  * to share one dim, so the matrix side never truncates.
  */
case class TopCentroids(child: Expression, mat: Array[Float], dim: Int, nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0 && mat.length % dim == 0,
    s"centroid matrix length ${mat.length} is not a multiple of dim $dim")
  require(nprobe > 0, s"need nprobe > 0, got $nprobe")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // null even on non-null input: length-mismatched / null-element vectors
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TopCentroids.top(a.asInstanceOf[ArrayData], mat, dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroidMat", mat, "float[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TopCentroids.top($c, $matRef, $dim, $nprobe);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "top_centroids"
}

object TopCentroids {

  /** Top-`nprobe` centroid ids (rank order), or NULL for a vector whose
    * length differs from `dim` or containing a null element. Scans
    * centroids in ascending id and displaces only on STRICTLY greater
    * cosine, so equal-cosine ties keep the lower id first — the same
    * order as the former `row_number` over (sim DESC, centroid ASC).
    */
  def top(arr: ArrayData, mat: Array[Float], dim: Int, nprobe: Int): ArrayData = {
    val nlist = mat.length / dim
    if (arr.numElements() != dim) return null
    val n = dim
    val v = new Array[Double](n)
    var vn = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = arr.getFloat(i).toDouble
      v(i) = x; vn += x * x
      i += 1
    }
    val k = math.min(nprobe, nlist)
    val topIds = new Array[Int](k)
    val topSims = new Array[Double](k)
    var filled = 0
    var c = 0
    while (c < nlist) {
      val off = c * dim
      var dot = 0.0; var cn = 0.0
      var j = 0
      while (j < n) {
        val y = mat(off + j).toDouble
        dot += v(j) * y; cn += y * y
        j += 1
      }
      val d = math.sqrt(vn) * math.sqrt(cn)
      val sim = if (d == 0.0) 0.0 else dot / d
      if (filled < k || sim > topSims(filled - 1)) {
        var p = math.min(filled, k - 1)
        while (p > 0 && sim > topSims(p - 1)) {
          topSims(p) = topSims(p - 1); topIds(p) = topIds(p - 1)
          p -= 1
        }
        topSims(p) = sim; topIds(p) = c
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIds, filled))
  }

  def topCentroids(vec: Column, mat: Array[Float], dim: Int, nprobe: Int): Column =
    ColumnBridge.column(TopCentroids(ColumnBridge.expression(vec), mat, dim, nprobe))
}

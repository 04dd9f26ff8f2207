package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Top `bits` bits of md5(utf8(s)) as a nonnegative long — VALUE-IDENTICAL
  * to `conv(substring(md5(s), 1, bits/4), 16, 10)` (the first k hex chars
  * of the digest ARE its top 4k bits), but computed straight from the
  * digest bytes. The built-in composition allocates a 32-char hex string,
  * a substring, conv's base-conversion STRING result, and a final
  * string→long cast per draw; this is one static call per draw.
  *
  * This is the engine's portable-hash hot path ([[graft.core.PortableHash]]):
  * the md5 family exists so the DuckDB oracle can replay draws bit-for-bit
  * (`CAST('0x' || substr(md5(e), 1, 15) AS BIGINT)`), and oracle queries
  * evaluate it up to 3× per token (MLM) — the bench showed the built-in
  * composition dominating q28/q29/q33 wall-clock.
  */
case class Md5Long(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 60 && bits % 4 == 0,
    s"bits must be a positive multiple of 4 up to 60, got $bits")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Long.top(s.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.top($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_long"
}

object Md5Long {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top `bits` bits of the md5 digest of the UTF-8 bytes, as a long.
    * First 8 digest bytes big-endian, shifted down to keep `bits` bits —
    * exactly the integer the first bits/4 hex chars denote.
    *
    * Deliberately NOT hand-rolled: HotSpot intrinsifies the MD5
    * compression function (JDK 16+, x86_64 and aarch64), so
    * `MessageDigest` already runs it as native vector code — a measured
    * single-block Scala reimplementation landed within noise of this
    * path and was dropped. The md5 COUNT (not the primitive) is the
    * oracle-query cost driver; reductions come from algebraic rewrites
    * (see MaskingOps draw materialization, [[MinShingleMd5]]).
    */
  def top(s: UTF8String, bits: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> (64 - bits)
  }

  /** 60-bit variant (= conv(substr(md5,1,15),16,10)). */
  def md5Long60(c: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(c), 60))

  /** 48-bit variant (= conv(substr(md5,1,12),16,10)). */
  def md5Long48(c: Column): Column =
    ColumnBridge.column(Md5Long(ColumnBridge.expression(c), 48))
}

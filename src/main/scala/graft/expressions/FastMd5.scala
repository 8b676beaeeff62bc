package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: MD5 hex digest of a string's UTF-8 bytes.
  *
  * Bit-identical to `functions.md5(col.cast("binary"))` (lowercase hex,
  * so the DuckDB oracle's `md5()` reproduces it), but ~10× cheaper per
  * call: Spark's `Md5` goes through commons-codec `DigestUtils.md5Hex`,
  * which does `MessageDigest.getInstance` — a synchronized JCA provider
  * lookup plus two allocations — on EVERY row (~10 µs). The MinHash band
  * table alone issues millions of md5 calls per pass, which made the
  * digest lookup the single hottest path in the dedup queries. Here each
  * task thread reuses one `MessageDigest` via a ThreadLocal and hex-encodes
  * into a preallocated buffer, and `doGenCode` keeps the call inside
  * whole-stage codegen (no boxing; a static forwarder makes the Scala
  * companion method callable from generated Java).
  */
case class FastMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fast_md5"

  override protected def nullSafeEval(input: Any): Any =
    FastMd5.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.FastMd5.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): FastMd5 =
    copy(child = newChild)
}

object FastMd5 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hex = "0123456789abcdef".getBytes

  def hashUtf8(s: UTF8String): UTF8String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash (Rabin–Karp) of a
  * string's UTF-8 bytes, `acc = (acc * base + byte) mod prime`.
  *
  * Used for document fingerprinting (SURVEY.md §7.1 step 6 "rolling
  * hash"). A custom Expression with `doGenCode` (not a Scala UDF) so it
  * stays inside whole-stage codegen: no boxing, no serialization, and the
  * generated loop runs over the UTF8String's bytes directly.
  *
  * The modulus is kept below 2^31 so `acc * base + byte` never overflows
  * a signed long, making the arithmetic reproducible in any engine with
  * 64-bit integers (the DuckDB oracle mirrors it with list_reduce).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  final val base = 31L
  final val mod = 1000000007L

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${base}L + ($bytes[$i] & 0xff)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

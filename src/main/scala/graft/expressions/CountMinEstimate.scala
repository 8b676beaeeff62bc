package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for an item's estimated frequency.
  *
  * Spark ships the BUILD side of CMS but no probe — the sketch is a
  * write-only blob to SQL. This closes the loop: build per-partition
  * sketches with the aggregate (mergeable, map-side combined), persist
  * them like any other column (the `a10_sketch_rollup` pattern), probe
  * them here without rescanning the fact. Frequency twin of the HLL
  * estimate path; guarantees est ≥ exact and est ≤ exact + eps·N with
  * the sketch's confidence.
  *
  * Deserialization is cached per (task, sketch-bytes): the probe side
  * is typically a broadcast of ONE sketch row joined to many keys, so
  * the cache turns per-row deserialization into one per task.
  * CodegenFallback is deliberate — the op is a few probe rows, never a
  * hot inner loop (the hot path is the build aggregate, which is
  * Spark's own codegen'd implementation).
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || !((bytes eq cachedBytes) ||
        java.util.Arrays.equals(bytes, cachedBytes))) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    // The build side hashes strings as their UTF-8 bytes (addString ==
    // addBinary); eval hands us UTF8String, which the probe API doesn't
    // know — align the representations.
    val probe = item match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
      case x => x
    }
    cachedSketch.estimateCount(probe)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

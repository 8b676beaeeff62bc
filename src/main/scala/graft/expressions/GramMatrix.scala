package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom Catalyst AGGREGATE (TypedImperativeAggregate): one-pass
  * second-moment statistics of a d-dimensional vector column — row
  * count, per-dimension sums, and the upper triangle of the Gram
  * matrix Xᵀ X — packed into a single `array<double>` of length
  * `1 + d + d(d+1)/2` (layout: `[n, sum(0..d), gram(i≤j row-major)]`).
  *
  * This is the distributed half of PCA/covariance: the full-rank
  * statistics of an N-row corpus reduce to one ~d² buffer, so each
  * mapper emits ONE 17 KB (d = 64) partial and the merge tree adds
  * arrays — the corpus is read once, nothing keyed on it is shuffled.
  * The alternatives all break at scale: `posexplode` + per-(i, j)
  * aggregation shuffles N·d(+N·d²) rows, and a driver `collect` of
  * vectors is off the table by definition. The driver then finishes
  * the O(d³) eigen work on the bounded model, the same
  * collect-a-bounded-model discipline as the IVF centroids and PQ
  * codebooks.
  *
  * Float caveat (shared with every distributed sum): partial order
  * differs across partitionings, so low-order bits of the sums are not
  * reproducible run-to-run; consumers must quantize well above 1e-12
  * relative before any cross-engine comparison.
  */
case class GramMatrix(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(d > 0, s"gram_matrix requires d > 0, got $d")

  private val len = 1 + d + d * (d + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix requires array<float|double>, got $t")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gram_matrix"

  // lazy: dataType is unresolvable at construction time (analysis
  // resolves children after the aggregate node is built)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_matrix(d=$d) fed a ${arr.numElements()}-element vector")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        // loud, not silent: UnsafeArrayData.getFloat on a null slot
        // returns 0.0 and would skew every downstream eigensolve/fit
        // with nothing failing
        require(!arr.isNullAt(i),
          s"gram_matrix: null element at index $i — the aggregate " +
            "assumes null-free vectors (same contract as dot_product)")
        x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1d
      i = 0
      var idx = 1 + d
      while (i < d) {
        buf(1 + i) += x(i)
        var j = i
        while (j < d) {
          buf(idx) += x(i) * x(j)
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val buf = new Array[Double](len)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}

object GramMatrix {

  /** Column-API entry: `GramMatrix.gram(col("embedding"), 64)` in an
    * `agg(...)`.
    */
  def gram(c: org.apache.spark.sql.Column, d: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      GramMatrix(org.apache.spark.sql.GraftSqlBridge.expression(c), d)
        .toAggregateExpression())
}

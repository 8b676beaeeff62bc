package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst AGGREGATE (TypedImperativeAggregate): deterministic
  * per-group k-sample = the k values with the smallest md5 digests
  * ("bottom-k-by-hash" / consistent sampling).
  *
  * Why an aggregate and not `row_number() OVER (ORDER BY md5(v)) <= k`:
  * the window form shuffles EVERY row of the group to one reducer and
  * sorts it (WindowGroupLimit in Spark 3.5+ trims the sort but not the
  * shuffle). This aggregate keeps a k-element bounded heap, so map-side
  * partial aggregation reduces each mapper's group to ≤ k rows BEFORE
  * the shuffle — at 100 TB the exchange carries k·mappers rows per
  * group instead of the group itself. Same spill/merge contract as
  * Spark's own collect_set (TypedImperativeAggregate buffers serialize
  * into UnsafeRow-backed aggregation maps).
  *
  * Determinism: md5 is engine-stable (the DuckDB oracle reproduces the
  * exact sample with `ORDER BY md5(v), v`), unlike seeded RNG sampling,
  * and the sample is stable under repartitioning and appends of
  * non-sampled rows — the same property text_split_assign relies on.
  * The hash/value pair ordering breaks md5-collision ties; the result
  * array is emitted in ascending (hash, value) order.
  */
case class BottomKByHash(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {

  require(k > 0, s"bottom_k_by_hash requires k > 0, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_by_hash requires a STRING value, got ${child.dataType}; " +
        "cast the column explicitly")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottom_k_by_hash"

  // max-heap on (hash, value): the head is the CURRENT WORST sample
  // member, evicted when a smaller hash arrives.
  private implicit val ord: Ordering[(String, String)] =
    Ordering.Tuple2(Ordering.String, Ordering.String)

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)]

  private def add(buf: mutable.PriorityQueue[(String, String)],
      h: String, v: String): Unit = {
    if (buf.size < k) buf.enqueue((h, v))
    else if (ord.lt((h, v), buf.head)) {
      buf.dequeue()
      buf.enqueue((h, v))
    }
  }

  override def update(buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      add(buf, FastMd5.hashUtf8(s).toString, s.toString)
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, String)],
      other: mutable.PriorityQueue[(String, String)])
      : mutable.PriorityQueue[(String, String)] = {
    other.foreach { case (h, v) => add(buf, h, v) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted.map(t => UTF8String.fromString(t._2)))

  override def serialize(buf: mutable.PriorityQueue[(String, String)])
      : Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeUTF(h); out.writeUTF(v) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(String, String)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readUTF(), in.readUTF()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByHash =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByHash =
    copy(child = newChildren.head)
}

object BottomKByHash {

  /** Column-API entry: `bottomKByHash(col, 5)` in an `agg(...)`. */
  def sample(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BottomKByHash(org.apache.spark.sql.GraftSqlBridge.expression(c), k)
        .toAggregateExpression())
}

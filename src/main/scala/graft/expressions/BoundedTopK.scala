package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Custom Catalyst AGGREGATE (TypedImperativeAggregate): bounded
  * per-group top-K under the total order (sort key DESC, id ASC) —
  * the distributed form of
  * `row_number() OVER (PARTITION BY g ORDER BY key DESC, id ASC) <= k`.
  *
  * Why an aggregate and not that window: the window shuffles EVERY row
  * of the group to one reducer and sorts it there. When the group key
  * is a low-cardinality stratum (a domain/source column: a handful of
  * values), each window partition holds corpus/|groups| rows — a
  * multi-TB single-task sort at 100 TB with no AQE escape (AQE splits
  * skewed shuffle JOINS, not window partitions). This aggregate is the
  * two-phase top-K instead: each mapper keeps a k-element bounded heap
  * per group (partial aggregation), so the exchange carries at most
  * k·mappers rows per group regardless of corpus size, and the merge
  * side folds heaps. Same spill/merge contract as Spark's collect_set
  * (TypedImperativeAggregate buffers serialize into UnsafeRow-backed
  * aggregation maps); same bounded-heap discipline as
  * [[BottomKByHash]].
  *
  * Determinism: the (key, id) order is TOTAL when `id` is unique, so
  * the selected set and its ranks are engine-independent — the DuckDB
  * oracle's windowed formulation produces the identical rows. The
  * result array is emitted best-first (key DESC, id ASC), so
  * `posexplode` yields `pos + 1 == rank`.
  */
case class BoundedTopK(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, s"bounded_top_k requires k > 0, got $k")

  override def children: Seq[Expression] = key :: id :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k requires (BIGINT key, BIGINT id), got " +
        s"(${key.dataType}, ${id.dataType}); cast the columns explicitly")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_top_k"

  // Heap with the CURRENT WORST member at the head (max under this
  // ordering): worst = smallest key, then largest id. `ord.lt(a, b)`
  // therefore reads "a ranks strictly better than b".
  private implicit val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def add(buf: mutable.PriorityQueue[(Long, Long)],
      key: Long, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((key, id))
    else if (ord.lt((key, id), buf.head)) {
      buf.dequeue()
      buf.enqueue((key, id))
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      add(buf, kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (kv, iv) => add(buf, kv, iv) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted.map { case (kv, iv) =>
      new GenericInternalRow(Array[Any](kv, iv)): InternalRow
    })

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)])
      : Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (kv, iv) => out.writeLong(kv); out.writeLong(iv) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(key = newChildren(0), id = newChildren(1))
}

object BoundedTopK {

  /** Column-API entry: `BoundedTopK.topK(col("n_chars"), col("doc_id"), 15)`
    * in an `agg(...)` — yields `array<struct<key, id>>` sorted
    * (key DESC, id ASC), i.e. best-first.
    */
  def topK(key: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BoundedTopK(
        org.apache.spark.sql.GraftSqlBridge.expression(key),
        org.apache.spark.sql.GraftSqlBridge.expression(id), k)
        .toAggregateExpression())
}

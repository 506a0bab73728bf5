package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Exact top-k per group in ONE aggregation pass: a bounded min-heap per
  * group, mergeable across partials — so map-side combine ships at most k
  * rows per (group, partition) into the shuffle, and no partition ever
  * sorts its full input.
  *
  * This is the scale-path twin of the window formulation
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`, query w1): the
  * window plan shuffles EVERY row of the fact table and sorts each group's
  * entire extent, while this aggregate's shuffle volume is bounded by
  * k·groups — at 100 TB (billions of rows, millions of groups, k≈3) that is
  * the difference between a full-data sort and a dimension-sized shuffle.
  * w1b oracle-checks it against the window form's DuckDB SQL.
  *
  * Semantics: keeps the k LARGEST `key` values (interpreted ordering of the
  * key type — struct keys compare field-by-field, so descending/tiebreak
  * directions are encoded by negating components); returns the payloads in
  * rank order (largest key first). Rows with a TOP-LEVEL null key are
  * ignored; a null FIELD inside a struct key is not a null key — it orders
  * nulls-first (smallest), matching SQL ORDER BY defaults.
  */
case class TopKStruct(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStruct.Buffer] {

  require(k > 0, s"topk_struct requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = payload.nullable)
  override def prettyName: String = "topk_struct"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(key.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(key.dataType)
  // min-heap over key: the root is the weakest kept element
  @transient private lazy val heapOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(ordering).reverse
  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array(key.dataType, payload.dataType))

  override def createAggregationBuffer(): TopKStruct.Buffer =
    new TopKStruct.Buffer(mutable.PriorityQueue.empty(heapOrdering))

  override def update(buf: TopKStruct.Buffer, input: InternalRow): TopKStruct.Buffer = {
    val kv = key.eval(input)
    if (kv != null) {
      val q = buf.q
      if (q.size < k) {
        q.enqueue((InternalRow.copyValue(kv), InternalRow.copyValue(payload.eval(input))))
      } else if (ordering.gt(kv, q.head._1)) {
        q.dequeue()
        q.enqueue((InternalRow.copyValue(kv), InternalRow.copyValue(payload.eval(input))))
      }
    }
    buf
  }

  override def merge(a: TopKStruct.Buffer, b: TopKStruct.Buffer): TopKStruct.Buffer = {
    b.q.foreach { el =>
      if (a.q.size < k) a.q.enqueue(el)
      else if (ordering.gt(el._1, a.q.head._1)) { a.q.dequeue(); a.q.enqueue(el) }
    }
    a
  }

  override def eval(buf: TopKStruct.Buffer): Any = {
    val ranked = buf.q.toArray.sortBy(_._1)(ordering.reverse)
    new GenericArrayData(ranked.map(_._2))
  }

  override def serialize(buf: TopKStruct.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.q.size)
    val row = new GenericInternalRow(2)
    buf.q.foreach { case (kv, pv) =>
      row.update(0, kv)
      row.update(1, pv)
      val bytes = serProj(row).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStruct.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = mutable.PriorityQueue.empty(heapOrdering)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      q.enqueue((InternalRow.copyValue(row.get(0, key.dataType)),
        InternalRow.copyValue(row.get(1, payload.dataType))))
      i += 1
    }
    new TopKStruct.Buffer(q)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), payload = newChildren(1))
}

object TopKStruct {
  /** Mutable bounded heap holding (key, payload) pairs. */
  final class Buffer(val q: mutable.PriorityQueue[(Any, Any)])
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a mergeable one-pass aggregate:
  * per-partition state is a bounded map of at most `k` (item, counter)
  * entries, and map-side combine ships ONLY those k entries into the
  * shuffle — no per-distinct-item shuffle row ever exists. That is the
  * heavy-hitter scale shape at 100 TB: an exact `GROUP BY item` over a
  * web-scale vocabulary shuffles |vocab| rows, while this sketch shuffles
  * k·partitions rows regardless of vocabulary size.
  *
  * Update rule (Misra & Gries 1982): increment a present item; insert when
  * under capacity; otherwise decrement every counter (dropping zeros).
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS 2012): add
  * counters pointwise, then subtract the (k+1)-th largest counter from all
  * and drop non-positives — the summary stays a valid MG sketch of the
  * union.
  *
  * Guarantee carried through any update/merge tree over n total rows:
  * every item with true frequency > n/(k+1) is PRESENT in the result, and
  * each reported counter lower-bounds the item's true frequency by at most
  * n/(k+1). Counters (and which sub-threshold items remain) depend on
  * partition merge order, so the raw sketch is NOT deterministic — it is a
  * candidate generator. [[graft.operators.Frequency.heavyHitters]] wraps it
  * in the standard sketch-then-verify two-pass whose final output IS exact
  * and deterministic (and is oracle-checked as query hh1).
  *
  * Null items are ignored (SQL aggregate convention). Items must be STRING;
  * cast upstream — keeping the buffer monomorphic keeps update/merge cheap.
  */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Buffer] {

  require(k > 0, s"mg_sketch requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count_lb", LongType))),
    containsNull = false)
  override def prettyName: String = "mg_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_sketch requires a STRING item, got ${item.dataType.catalogString}")

  override def createAggregationBuffer(): MisraGries.Buffer =
    new MisraGries.Buffer(mutable.HashMap.empty)

  override def update(buf: MisraGries.Buffer, input: InternalRow): MisraGries.Buffer = {
    val v = item.eval(input)
    if (v != null) {
      val m = buf.m
      val key = v.asInstanceOf[UTF8String]
      m.get(key) match {
        case Some(c) => m.update(key, c + 1L)
        case None if m.size < k => m.update(key.clone(), 1L)
        case None =>
          // decrement-all step: every counter -1, zeros evicted. O(k), and
          // it can run at most n/k times over the whole pass — amortized
          // O(1) per row for the small k this is used with.
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          m.mapValuesInPlace { (_, c) => c - 1L }
          m.foreach { case (i, c) => if (c <= 0L) dead += i }
          dead.foreach(m.remove)
      }
    }
    buf
  }

  override def merge(a: MisraGries.Buffer, b: MisraGries.Buffer): MisraGries.Buffer = {
    b.m.foreach { case (i, c) =>
      a.m.update(i, a.m.getOrElse(i, 0L) + c)
    }
    if (a.m.size > k) {
      // subtract the (k+1)-th largest counter from all; ties at it drop too,
      // so at most k survive and the MG error bound telescopes (PODS 2012).
      val cut = a.m.values.toArray.sortInPlaceWith(_ > _).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.m.mapValuesInPlace { (_, c) => c - cut }
      a.m.foreach { case (i, c) => if (c <= 0L) dead += i }
      dead.foreach(a.m.remove)
    }
    a
  }

  override def eval(buf: MisraGries.Buffer): Any = {
    val ranked = buf.m.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(ranked.map { case (i, c) =>
      val r = new GenericInternalRow(2)
      r.update(0, i)
      r.update(1, c)
      r
    })
  }

  override def serialize(buf: MisraGries.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size)
    buf.m.foreach { case (i, c) =>
      val bytes = i.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      m.update(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    new MisraGries.Buffer(m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren.head)
}

object MisraGries {
  /** Bounded (item → counter) map, |m| ≤ k between operations. */
  final class Buffer(val m: mutable.HashMap[UTF8String, Long])
}

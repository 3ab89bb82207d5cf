package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** SpaceSaving frequent-items sketch (Metwally/Agrawal/El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a Catalyst `TypedImperativeAggregate` —
  * the custom-sketch slot SURVEY.md §4/§7 reserves.
  *
  * `topk_freq(item, k, capacity)` → `array<struct<item:string,
  * cnt:bigint>>`: the k highest-estimated-frequency items, counts exact
  * whenever `capacity` ≥ the true distinct count (the sketch only
  * over-estimates once eviction starts). State is one bounded map per
  * partial-aggregation buffer — map-side combine ships `capacity`
  * entries per partition regardless of input size, which is what makes
  * a heavy-hitters scan feasible at 100 TB (a plain groupBy-count
  * shuffles every distinct key).
  *
  * Determinism: ties broken by item; merge is order-insensitive for the
  * exact (no-eviction) regime the oracle checks.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = true),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_freq expects a string item column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** SpaceSaving update: replace the min-count entry once at capacity. */
  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < capacity => buf.update(item.clone(), 1L)
        case None =>
          val (minItem, minCnt) = buf.minBy(_._2)
          buf.remove(minItem)
          buf.update(item.clone(), minCnt + 1)
      }
    }
    buf
  }

  /** Merge: sum common counts, then trim back to capacity keeping the
    * largest (deterministic tie-break on item). */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > capacity) {
      val keep = buf.toSeq.sortBy { case (i, c) => (-c, i.toString) }.take(capacity)
      buf.clear(); keep.foreach { case (i, c) => buf.update(i, c) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (i, c) => (-c, i.toString) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      InternalRow(i, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val b = i.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_freq"
}

object SpaceSavingTopK {
  /** Builder for FunctionRegistry: topk_freq(item, k, capacity). */
  def create(children: Seq[Expression]): Expression = {
    require(children.size == 3, "topk_freq(item, k, capacity)")
    def lit(e: Expression, what: String): Int = {
      require(e.foldable, s"topk_freq $what must be a literal")
      e.eval(null).asInstanceOf[Number].intValue()
    }
    SpaceSavingTopK(children.head, lit(children(1), "k"), lit(children(2), "capacity"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregate MinHash-signature UNION: element-wise minimum of the
  * input signatures. By the MinHash identity
  * `sig(A ∪ B)[i] = min(sig(A)[i], sig(B)[i])`, the aggregated value
  * IS the signature of the union of the underlying shingle sets —
  * the sketch algebra that makes hierarchical / incremental dedup
  * work: per-partition partial signatures merge associatively, so a
  * cluster- or corpus-level signature costs one ordinary aggregation
  * (map-side combine included) instead of re-sketching the text.
  *
  * Implemented as a `TypedImperativeAggregate[Array[Long]]` (the
  * Spark-native custom-aggregate surface for fixed-size sketch
  * buffers); registered in SQL as `graft_minhash_union` by
  * [[graft.GraftExtensions]].
  */
case class MinHashUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def mergeInto(buf: Array[Long], arr: Array[Long]): Array[Long] =
    if (arr.isEmpty) buf
    else if (buf.isEmpty) arr.clone()
    else {
      require(buf.length == arr.length,
        s"minhash_union: signature lengths differ (${buf.length} vs ${arr.length})")
      var i = 0
      while (i < buf.length) { if (arr(i) < buf(i)) buf(i) = arr(i); i += 1 }
      buf
    }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    mergeInto(b1, b2)

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_union"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionAgg =
    copy(child = newChild)
}

object MinHashUnionAgg {
  /** Column-API form: `df.groupBy(k).agg(minhashUnion(sigCol))`. */
  def minhashUnion(sig: Column): Column =
    GraftColumnBridge.column(
      MinHashUnionAgg(GraftColumnBridge.expression(sig)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped occurrence-list buffer: stores at most `cap + 1`
  * (id, pos) entries — one past the cap is enough to prove overflow,
  * so a hub gram's buffer is O(cap) no matter how many million
  * occurrences it has. Arrays grow geometrically from 2: in a gram
  * corpus the vast majority of distinct grams are singletons, and the
  * map-side hash map holds a live buffer per distinct gram — eager
  * cap-sized allocation would cost ~30× the memory the data needs. */
final class OccBuffer(val cap: Int) {
  var n = 0
  var ids = new Array[Long](2)
  var poss = new Array[Int](2)
  def add(id: Long, pos: Int): Unit =
    if (n <= cap) {
      if (n == ids.length) {
        val next = math.min(math.max(2 * n, 4), cap + 1)
        ids = java.util.Arrays.copyOf(ids, next)
        poss = java.util.Arrays.copyOf(poss, next)
      }
      ids(n) = id; poss(n) = pos; n += 1
    }
}

/** Single-pass, bounded-memory replacement for the two-pass hub
  * cutoff in span dedup (`df`-count shuffle + semi-join + plain
  * `collect_list`): collect the gram's `(id, pos)` occurrences but
  * stop storing past `cap + 1`, and eval to NULL when the final count
  * is outside [2, cap] (singletons pair with nothing; > cap is a
  * stop-gram whose pair expansion the cutoff exists to prevent).
  *
  * Scale shape: ObjectHashAggregate with map-side partial merge, so a
  * boilerplate k-gram shared by millions of docs ships at most
  * `cap + 1` entries PER MAP PARTITION instead of its full occurrence
  * list — the shuffle volume a post-collect filter (or even the
  * two-pass semi-join, which still shuffles every surviving
  * occurrence row twice) cannot avoid. Element order is
  * partition-arrival order (like `collect_list`); downstream span
  * derivation is order-insensitive (pair explode + min/max), and
  * WHICH `cap + 1` witnesses an overflowing gram keeps is irrelevant
  * because the list evals to NULL.
  */
case class CappedOccListAgg(idChild: Expression, posChild: Expression,
    cap: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OccBuffer] {

  override def children: Seq[Expression] = Seq(idChild, posChild)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("_id", LongType, nullable = false),
      StructField("_pos", IntegerType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): OccBuffer = new OccBuffer(cap)

  override def update(b: OccBuffer, input: InternalRow): OccBuffer = {
    val id = idChild.eval(input)
    val pos = posChild.eval(input)
    if (id != null && pos != null)
      b.add(id.asInstanceOf[Long], pos.asInstanceOf[Int])
    b
  }

  override def merge(b: OccBuffer, o: OccBuffer): OccBuffer = {
    var i = 0
    while (i < o.n && b.n <= b.cap) { b.add(o.ids(i), o.poss(i)); i += 1 }
    b
  }

  override def eval(b: OccBuffer): Any =
    if (b.n < 2 || b.n > b.cap) null
    else {
      val rows = new Array[Any](b.n)
      var i = 0
      while (i < b.n) {
        rows(i) = new GenericInternalRow(Array[Any](b.ids(i), b.poss(i)))
        i += 1
      }
      new GenericArrayData(rows)
    }

  override def serialize(b: OccBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 12)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putInt(b.poss(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): OccBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val b = new OccBuffer(cap)
    var i = 0
    while (i < m) { b.add(bb.getLong, bb.getInt); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedOccListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedOccListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedOccListAgg =
    copy(idChild = newChildren(0), posChild = newChildren(1))
  override def prettyName: String = "graft_capped_occ_list"
}

object CappedOccList {
  /** `collect_list(struct(id, pos))` capped at `cap`, NULL outside
    * [2, cap] — see [[CappedOccListAgg]]. */
  def apply(id: Column, pos: Column, cap: Int): Column =
    GraftColumnBridge.column(CappedOccListAgg(
      GraftColumnBridge.expression(id),
      GraftColumnBridge.expression(pos), cap).toAggregateExpression())
}

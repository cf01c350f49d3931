package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register vector as a DETERMINISTIC aggregate — the
  * cardinality-sketch class (constant memory per group at any scale),
  * made hash-gate-safe:
  *
  *  - input is the portable integer hash (charHash / key hash in
  *    [0, P)), not JVM-private randomness;
  *  - register j = h mod m holds the MAX rank seen — max is
  *    order-free, so the result is partition- and merge-order
  *    independent;
  *  - rank is pure integer arithmetic (bit length of w = h div m
  *    against the `budgetBits` bit budget), replicated in SQL as
  *    `length(bin(w))`;
  *  - the downstream estimator sum Σ 2^-M_j is a sum of dyadic
  *    rationals with bounded exponent spread — EXACT in a double
  *    regardless of fold order, so the raw estimate
  *    α·m²/Σ is bit-equal across engines.
  *
  * The raw HLL estimator only (no small-range linear-counting branch:
  * that needs ln(), a transcendental the determinism contract bans —
  * callers get `n_zero` and can correct on their side; the accuracy
  * spec exercises the raw regime).
  *
  * Buffer is a fixed Array[Int] of m registers (m is small, e.g. 64);
  * serialize ships 4·m bytes.
  */
case class HllRegistersAgg(child: Expression, m: Int, budgetBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(b: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) HllSketch.updateRegister(b, v.asInstanceOf[Long], m, budgetBits)
    b
  }

  override def merge(b: Array[Int], o: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Int]): Any =
    new GenericArrayData(b.map(x => x: Any))

  override def serialize(b: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    var i = 0
    while (i < m) { bb.putInt(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Int](m)
    var i = 0
    while (i < m) { b(i) = bb.getInt; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_hll_registers"
}

object HllSketch {
  /** Register vector for hashes in [0, P): `hllRegisters(h, m, bits)`
    * — see [[HllRegistersAgg]]. */
  def registers(hash: Column, m: Int, budgetBits: Int): Column =
    GraftColumnBridge.column(HllRegistersAgg(
      GraftColumnBridge.expression(hash), m, budgetBits).toAggregateExpression())

  /** The ONE per-value register update, shared by the batch aggregate
    * and the streaming twin ([[graft.streaming.StreamingSketches]]) so
    * their arithmetic cannot drift.
    *
    * Square-mod-P remix (same construction as the LSH plane weights):
    * leading-zero ranks read the MAGNITUDE of the value, and a raw
    * polynomial charHash of short strings concentrates in a narrow
    * magnitude band (rank ≈ constant, estimator collapses). Every
    * intermediate fits a BIGINT, so the SQL oracle replicates the mix
    * exactly. rank = budgetBits - bitLength(w) + 1; bitLength(0) := 0. */
  private[graft] def updateRegister(b: Array[Int], h: Long, m: Int,
      budgetBits: Int): Unit = {
    val h1 = (h * Portable.Knuth) % Portable.P
    val h2 = (h1 * h1) % Portable.P
    val h3 = (h2 * Portable.Knuth + h) % Portable.P
    val j = (h3 % m).toInt
    val w = h3 / m
    val rank =
      if (w == 0L) budgetBits + 1
      else budgetBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > b(j)) b(j) = rank
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton interleaving: naive bit-loop equivalence, monotone locality
  * (a z-bucket bounds both dimensions), and round-trip bit layout.
  */
class ZorderSpec extends SparkSpec {

  import spark.implicits._

  private def naiveZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("matches the naive bit loop on random pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Zorder.zValue(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == naiveZ(a, b, 16)) }
  }

  test("hand-traced small values") {
    // a=0b101 (bits at 0,2 -> z bits 0,4), b=0b011 (bits at 0,1 -> z bits 1,3)
    assert(naiveZ(5L, 3L, 3) == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Zorder.zValue(col("a"), col("b"), 3)).as[Long].head()
    assert(z == 27L)
  }

  test("z-bucket bounds both dimensions (the pruning property)") {
    // within one z >> 2k bucket, each dimension spans < 2^k values
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 2000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val k = 5 // bucket = z >> 10 -> each dim confined to a 2^5-wide band
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        shiftright(Zorder.zValue(col("a"), col("b"), 16), 2 * k).as("zb"))
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._1).max - rs.map(_._1).min < (1L << k))
      assert(rs.map(_._2).max - rs.map(_._2).min < (1L << k))
    }
  }
}

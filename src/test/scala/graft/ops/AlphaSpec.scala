package graft.ops

import graft.SparkSpec
import graft.xes.XesReader

/** Alpha miner against the textbook oracle: L1 is the worked example
  * of the process-mining book the corpus comes from; its discovered
  * WF-net is known in closed form. */
class AlphaSpec extends SparkSpec {

  test("alpha miner discovers the textbook net for L1") {
    val events = XesReader.read(spark, "/root/reference/static/xes/book/L1.xes")
      .eventsDf
    val net = Alpha.mine(events, "traceIdx", "activity", "ts", "seq")

    assert(net.activities == Set("a", "b", "c", "d", "e"))
    assert(net.startActivities == Set("a"))
    assert(net.endActivities == Set("d"))
    assert(net.places == Set(
      Alpha.Place(Set("a"), Set("b", "e")),
      Alpha.Place(Set("a"), Set("c", "e")),
      Alpha.Place(Set("b", "e"), Set("d")),
      Alpha.Place(Set("c", "e"), Set("d"))))
  }

  test("alpha miner on a pure sequence gives a chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      (1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L),
      (2L, "x", 4L), (2L, "y", 5L), (2L, "z", 6L)
    ).toDF("case", "act", "t").withColumn("ts", timestamp_micros(col("t")))
    val net = Alpha.mine(events, "case", "act", "ts", "t")
    assert(net.places == Set(
      Alpha.Place(Set("x"), Set("y")),
      Alpha.Place(Set("y"), Set("z"))))
    assert(net.startActivities == Set("x") && net.endActivities == Set("z"))
  }
}

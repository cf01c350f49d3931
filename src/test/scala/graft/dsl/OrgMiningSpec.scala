package graft.dsl

import graft.SparkSpec
import graft.xes.XesReader

/** Working-together org mining on the one multi-resource corpus file
  * (`/root/reference/static/xes/test/extension_full.xes`): six traces
  * with disjoint resource sets {A,B,C}, {D..G}, {H..K}, {L..O},
  * {P..S}, {T..W} — so the expected pair set is exactly the
  * within-trace combinations, each shared by one trace. The book
  * corpus is single-resource (UNDEFINED), which is why the driver
  * gate carries the activity instantiation (q_cooccurrence) and this
  * spec pins the org-resource one.
  */
class OrgMiningSpec extends SparkSpec {

  import spark.implicits._

  test("workingTogether on extension_full: within-trace pairs only, one trace each") {
    val ev = XesReader.readEvents(spark,
      "/root/reference/static/xes/test/extension_full.xes").toDF()
    val wt = Org.workingTogether(ev, "traceIdx", "resource")
      .as[(String, String, Long)].collect().toSeq

    // C(3,2) + 5 * C(4,2) = 3 + 30
    assert(wt.size == 33, wt.sorted.mkString(", "))
    assert(wt.forall(_._3 == 1L))
    val pairs = wt.map(p => (p._1, p._2)).toSet
    assert(pairs.contains(("A", "B")) && pairs.contains(("B", "C")))
    assert(pairs.contains(("T", "W")))
    // never across traces
    assert(!pairs.contains(("A", "D")) && !pairs.contains(("C", "D")))
  }
}

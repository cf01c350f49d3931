package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The pure stage machine must reproduce the batch min-aggregate
  * funnel semantics (strict order, strict >) on the hand cases of
  * FunnelSpec, independent of tie order in the sorted buffer.
  */
class StreamingFunnelSpec extends AnyFunSuite {

  private val stages = Seq("view", "click", "purchase")

  private def scanOf(evs: (Long, String)*): Int =
    StreamingFunnel.scan(evs.sortBy(e => (e._1, e._2)), stages)

  test("full funnel in order reaches the last stage") {
    assert(scanOf((1L, "view"), (2L, "click"), (3L, "purchase")) == 2)
  }

  test("click before first view does not count") {
    assert(scanOf((1L, "click"), (2L, "view")) == 0)
  }

  test("early purchase ignored, later one counts") {
    assert(scanOf((1L, "purchase"), (2L, "view"), (3L, "click"), (4L, "purchase")) == 2)
  }

  test("never views: reaches nothing") {
    assert(scanOf((1L, "click"), (2L, "purchase")) == -1)
  }

  test("same-timestamp events do not advance (strict >), any tie order") {
    assert(scanOf((1L, "view"), (1L, "click")) == 0)
    // artificial tie order reversal: scan must not depend on it
    assert(StreamingFunnel.scan(Seq((1L, "click"), (1L, "view")), stages) == 0)
  }

  test("repeated stage types take the min eligible timestamp") {
    // second view earlier than first processed? min view is ts=1; click
    // at ts=2 (> 1) counts even though another view exists at ts=5
    assert(scanOf((5L, "view"), (1L, "view"), (2L, "click")) == 1)
  }

  test("advanceFrom is prefix-composable at every cut (the watermark-compaction contract)") {
    val acts = Vector("view", "click", "purchase", "error", "signup")
    var x = 99L
    def lcg(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
    (1 to 50).foreach { _ =>
      val n = 1 + (lcg() % 30L).toInt
      val evs = Seq.fill(n)(((lcg() % 12L), acts((lcg() % 5L).toInt)))
        .sortBy(e => (e._1, e._2))
      val whole = StreamingFunnel.scan(evs, stages)
      (0 to n).foreach { cut =>
        // a watermark cut never splits a tie group: advance the cut to
        // the tie-group boundary like the ts < wm partition does
        val c = if (cut < n && cut > 0 && evs(cut - 1)._1 == evs(cut)._1)
          evs.indexWhere(_._1 == evs(cut)._1) else cut
        val (i1, t1) = StreamingFunnel.advanceFrom(-1, Long.MinValue,
          evs.take(c), stages)
        val (i2, _) = StreamingFunnel.advanceFrom(i1, t1, evs.drop(c), stages)
        assert(i2 == whole, s"evs=$evs cut=$c")
      }
    }
  }
}

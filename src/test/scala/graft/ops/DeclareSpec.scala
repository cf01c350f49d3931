package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** DECLARE constraint discovery against a three-case log with every
  * template checked by hand.
  *
  * case 1: A B C ; case 2: A A B ; case 3: B C
  */
class DeclareSpec extends SparkSpec {

  import spark.implicits._

  private def log = Seq(
    (1L, "A", 0L, 1L), (1L, "B", 10L, 2L), (1L, "C", 20L, 3L),
    (2L, "A", 0L, 4L), (2L, "A", 5L, 5L), (2L, "B", 10L, 6L),
    (3L, "B", 0L, 7L), (3L, "C", 10L, 8L)
  ).map { case (c, act, sec, id) =>
    (c, act, new Timestamp(sec * 1000L), id)
  }.toDF("case_id", "activity", "ts", "event_id")

  private lazy val out =
    Declare.constraints(log, "case_id", "activity", "ts", "event_id")
      .as[(String, String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap

  test("unary templates: existence / absence2 / init / last") {
    assert(out(("existence", "A", "")) == ((3L, 2L, 2.0 / 3)))
    assert(out(("existence", "B", "")) == ((3L, 3L, 1.0)))
    // A appears twice in case 2 -> absence2 violated there only.
    assert(out(("absence2", "A", "")) == ((3L, 2L, 2.0 / 3)))
    assert(out(("absence2", "C", "")) == ((3L, 3L, 1.0)))
    assert(out(("init", "A", "")) == ((3L, 2L, 2.0 / 3)))
    assert(out(("init", "B", "")) == ((3L, 1L, 1.0 / 3)))
    assert(out(("last", "C", "")) == ((3L, 2L, 2.0 / 3)))
    assert(out(("last", "B", "")) == ((3L, 1L, 1.0 / 3)))
  }

  test("binary templates: response / precedence / succession / responded_existence") {
    // Cases with A: 1, 2 — in both, a B follows the last A.
    assert(out(("response", "A", "B")) == ((2L, 2L, 1.0)))
    // Cases with B: all 3 — case 3 has no preceding A.
    assert(out(("precedence", "A", "B")) == ((3L, 2L, 2.0 / 3)))
    // Union basis: 3 cases; case 3 violates the precedence half.
    assert(out(("succession", "A", "B")) == ((3L, 2L, 2.0 / 3)))
    assert(out(("responded_existence", "A", "B")) == ((2L, 2L, 1.0)))
    // C never followed by A anywhere.
    assert(out(("response", "C", "A")) == ((2L, 0L, 0.0)))
    // B -> C: case 1 (B@10 then C@20) and case 3 satisfy; case 2 has
    // B but no C.
    assert(out(("response", "B", "C")) == ((3L, 2L, 2.0 / 3)))
  }

  test("minSupport trims; row inventory is |A|*4 unary + ordered-pair rows") {
    // 3 activities: 12 unary rows + 4 templates * 6 ordered pairs.
    assert(out.size == 12 + 24)
    val trimmed =
      Declare.constraints(log, "case_id", "activity", "ts", "event_id",
        minSupport = 1.0).as[(String, String, String, Long, Long, Double)]
        .collect()
    assert(trimmed.forall(_._6 == 1.0))
    assert(trimmed.exists(r => r._1 == "response" && r._2 == "A" && r._3 == "B"))
  }
}

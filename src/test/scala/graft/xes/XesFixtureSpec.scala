package graft.xes

import graft.SparkSpec

/** The committed oracle fixtures (`fixtures/xes_book_*.parquet`) are
  * snapshots of the reader's output — this spec keeps them honest by
  * re-asserting the reference's PUBLISHED corpus statistics
  * (`/root/reference/src/stream/stats.rs:178-186`) directly against
  * the fixture files, independently of the parser. A parser regression
  * silently re-baked into regenerated fixtures would fail here.
  */
class XesFixtureSpec extends SparkSpec {

  import spark.implicits._

  private val fixtures = "/root/repo/fixtures"

  // (file, n_traces, n_events) pinned from the reference's stats tests
  private val pinned = Map(
    "L1.xes" -> ((6L, 23L)),
    "L2.xes" -> ((13L, 80L)),
    "L3.xes" -> ((4L, 39L)),
    "L4.xes" -> ((147L, 441L)),
    "L5.xes" -> ((14L, 92L)),
    "bigger-example.xes" -> ((1391L, 7539L)))

  test("event fixture matches reference-published per-file event counts") {
    val byFile = spark.read.parquet(s"$fixtures/xes_book_events.parquet")
      .groupBy("file").count().as[(String, Long)].collect().toMap
    pinned.foreach { case (f, (_, nEv)) =>
      assert(byFile.get(f).contains(nEv), s"$f: got ${byFile.get(f)}")
    }
  }

  test("log-stats fixture matches reference-published trace/event counts") {
    val stats = spark.read.parquet(s"$fixtures/xes_book_log_stats.parquet")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    pinned.foreach { case (f, exp) =>
      assert(stats.get(f).contains(exp), s"$f: got ${stats.get(f)}")
    }
  }

  test("quarantine fixture covers the whole non_parsing corpus, one row per file") {
    val q = spark.read.parquet(s"$fixtures/xes_quarantine.parquet")
      .as[(String, String)].collect()
    val corpusFiles = new java.io.File("/root/reference/static/xes/non_parsing")
      .listFiles().filter(_.getName.endsWith(".xes")).map(_.getName).toSet
    assert(q.map(_._1).toSet == corpusFiles)       // every file quarantined
    assert(q.forall(_._2.nonEmpty))                // with a real error message
  }

  test("validate fixture surfaces data-plane violations from the non_validating corpus") {
    val v = spark.read.parquet(s"$fixtures/xes_validate.parquet")
    assert(v.count() > 0L)
    val kinds = v.select("kind").distinct().as[String].collect().toSet
    // witness classes the corpus is built around
    assert(kinds.contains("missing_global"), kinds)
    val files = v.select("file").distinct().as[String].collect().toSet
    assert(files.contains("globals_violation_type.xes"), files)
  }

  test("fixture equals a fresh distributed parse (reader ↔ fixture round trip)") {
    val fresh = graft.queries.XesQueries.queries("q_xes_read_events")(spark, "")
    val fixture = spark.read.parquet(s"$fixtures/xes_book_events.parquet")
    assert(fresh.count() == fixture.count())
    assert(fresh.exceptAll(fixture).count() == 0L)
    assert(fixture.exceptAll(fresh).count() == 0L)
  }
}

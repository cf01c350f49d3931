package graft.tools

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.GraftSession
import graft.queries.XesQueries

/** Regenerates the committed XES oracle fixtures (dev tool).
  *
  * The driver's DuckDB oracle cannot parse XES, so the XES queries'
  * expected results are materialized as single-file parquet under
  * `fixtures/` and the oracles scan them by absolute path. The fixture
  * content is NOT self-certifying — its row/event counts are pinned
  * independently by XesCorpusSpec against the reference's published
  * corpus statistics (`/root/reference/src/stream/stats.rs:178-186`),
  * and XesFixtureSpec asserts fixture ↔ spec-count agreement.
  *
  * Run after any intentional parser behavior change:
  * `sbt "runMain graft.tools.DumpXesFixtures"`.
  */
object DumpXesFixtures {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/fixtures")
    val spark = GraftSession.get("8")
    new File(out).mkdirs()
    writeSingle(XesQueries.queries("q_xes_read_events")(spark, ""),
      s"$out/xes_book_events.parquet")
    writeSingle(XesQueries.queries("q_xes_log_stats")(spark, ""),
      s"$out/xes_book_log_stats.parquet")
    writeSingle(XesQueries.queries("q_xes_quarantine")(spark, ""),
      s"$out/xes_quarantine.parquet")
    writeSingle(XesQueries.queries("q_xes_validate")(spark, ""),
      s"$out/xes_validate.parquet")
    // events-level dump of the committed synthetic lifecycle log — the
    // oracle recomputes service times from these rows in SQL
    writeSingle(
      graft.xes.XesReader.readEvents(spark, s"$out/lifecycle.xes").toDF()
        .select("file", "traceIdx", "seq", "activity", "lifecycle", "tsMicros"),
      s"$out/xes_lifecycle_events.parquet")
    spark.stop()
  }

  /** Writes a DataFrame as ONE plain parquet file (not a directory) so
    * DuckDB can scan it by bare path. */
  private def writeSingle(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    new File(tmp).listFiles().foreach(_.delete())
    Files.deleteIfExists(Paths.get(tmp))
  }
}

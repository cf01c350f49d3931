package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.xes.XesReader

/** XES ingestion surface exposed through the driver contract. DuckDB
  * cannot read XES, so these have no SQL oracle — the driver records
  * rows-only checks; the strong correctness evidence is the corpus
  * spec suite (counts, round-trip, classification).
  *
  * The corpus path is fixed (the XES spec lives with the reference);
  * `sfDir` is unused.
  */
object XesQueries {

  private val book = "/root/reference/static/xes/book"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distributed XES parse of the whole book corpus → flat event rows.
    "q_xes_read_events" -> { (s, _) =>
      XesReader.readEvents(s, s"$book/*.xes")
        .toDF()
        .select("file", "traceIdx", "seq", "activity", "lifecycle",
          "resource", "tsMicros", "tzOffsetMin")
    },

    // Trace table with per-file stats — the Statistics triple per log.
    "q_xes_log_stats" -> { (s, _) =>
      val t = XesReader.readTraces(s, s"$book/*.xes").toDF()
      t.groupBy("file").agg(
        count(lit(1)).as("n_traces"),
        sum("nEvents").as("n_events_in_traces"))
    }
  )

  def oracle: Map[String, String] = Map.empty
}

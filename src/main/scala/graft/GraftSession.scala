package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession settings for the engine. Every main/test
  * builds through here so scan behavior (notably nanosecond-timestamp
  * parquet handling) and shuffle sizing are uniform.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // native kernels callable from pure SQL (GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark has no type
      // for; read as long nanos, Tables converts to micros (same
      // truncation DuckDB applies).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

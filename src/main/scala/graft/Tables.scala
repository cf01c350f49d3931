package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated synthetic tables
  * (see TESTDATA.md). All queries take an `sfDir` like
  * `/root/testdata/sf0.01` and load `&lt;sfDir&gt;/&lt;name&gt;.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as two physical types across testdata
    // generations; normalize both to a session-TZ (UTC) timestamp so
    // unix_micros & friends type-check and values match DuckDB's
    // naive-UTC read:
    //  - TIMESTAMP(NANOS): no Spark type; scanned as long nanos under
    //    spark.sql.legacy.parquet.nanosAsLong, truncated to micros
    //    (same truncation DuckDB applies);
    //  - timestamp[us] isAdjustedToUTC=false: scanned as
    //    TIMESTAMP_NTZ; cast is wall-clock-preserving in the UTC
    //    session.
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    nanosFixed.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(nanosFixed) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      }
  }
}

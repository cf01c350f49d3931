package graft.xes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed data-plane validation — the scalable half of
  * [[XesValidator]]: meta-level checks (classifier names, …) stay
  * driver-side where meta lives; the per-row checks (globals
  * presence+type, duplicate keys, chronological order) run as
  * DataFrame plans over the events/traces tables, so a 100 TB log
  * validates with joins + windows instead of a driver loop.
  *
  * Violations come back as rows (file, scope, component, kind, detail)
  * — the quarantine-table shape (SURVEY.md §1.4 "ResOpt in-band
  * errors" mapping): empty result = valid log.
  */
object XesSparkValidator {

  /** Global declarations as a small DataFrame (file, scope, key, xtype)
    * — broadcast against the data plane. */
  private def declsDf(spark: SparkSession, metas: Seq[XesModel.XesMeta]): DataFrame = {
    import spark.implicits._
    metas.flatMap(m => m.globals.flatMap(g =>
      g.attrs.map(a => (m.file, g.scope, a.key, a.xtype))))
      .toDF("file", "scope", "key", "xtype")
  }

  def violations(spark: SparkSession, xlog: XesReader.XLog): DataFrame = {
    import spark.implicits._
    val decls = broadcast(declsDf(spark, xlog.metas))

    val events = xlog.events.toDF()
      .withColumn("component",
        concat_ws("/", coalesce(col("traceIdx").cast("string"), lit("-")),
          col("seq")))
    val traces = xlog.traces.toDF()
      .withColumn("component", col("traceIdx").cast("string"))

    def keysOf(df: DataFrame): DataFrame =
      df.select(col("file"), col("component"), explode(col("attrs")).as("_a"))
        .select(col("file"), col("component"),
          col("_a.key").as("key"), col("_a.xtype").as("xtype"))

    // R2 distributed: declared (file, key, xtype) missing from a
    // component in scope (absence or type mismatch).
    def missingGlobals(df: DataFrame, scope: String): DataFrame =
      df.select(col("file"), col("component"))
        .join(decls.filter(col("scope") === scope), Seq("file"))
        .join(keysOf(df), Seq("file", "component", "key", "xtype"), "left_anti")
        .select(col("file"), lit(scope).as("scope"), col("component"),
          lit("missing_global").as("kind"),
          concat(col("key"), lit(" ("), col("xtype"), lit(")")).as("detail"))

    // R5 distributed: duplicate direct attribute keys.
    def dupKeys(df: DataFrame, scope: String): DataFrame =
      keysOf(df).groupBy("file", "component", "key")
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
        .select(col("file"), lit(scope).as("scope"), col("component"),
          lit("duplicate_key").as("kind"), col("key").as("detail"))

    // R3 distributed: chronological order within traces, only for
    // files declaring the Time extension.
    val timeFiles = xlog.metas.filter(_.extensions.exists(_.prefix == "time"))
      .map(_.file)
    val ooo = graft.dsl.Time.orderViolations(
        xlog.eventsDf.filter(col("file").isin(timeFiles: _*))
          .filter(col("traceIdx").isNotNull && col("ts").isNotNull)
          .withColumn("_case", concat_ws("#", col("file"), col("traceIdx"))),
        caseCol = "_case", tsCol = "ts", tieBreak = "seq")
      .select(col("file"), lit("event").as("scope"),
        concat_ws("/", col("traceIdx"), col("seq")).as("component"),
        lit("out_of_order").as("kind"),
        col("ts").cast("string").as("detail"))

    missingGlobals(events, "event")
      .unionByName(missingGlobals(traces, "trace"))
      .unionByName(dupKeys(events, "event"))
      .unionByName(dupKeys(traces, "trace"))
      .unionByName(ooo)
  }
}

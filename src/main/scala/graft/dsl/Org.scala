package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Organizational extension predicate factories — analogue of the
  * reference's `Org::filter_eq/filter_in/filter_match` over
  * `org:resource`/`org:role`/`org:group`
  * (`/root/reference/src/stream/extension/organizational.rs:38-112`).
  * Events-only in the reference; here any DataFrame with the columns.
  */
object Org {
  val Resource = "org:resource"
  val Role = "org:role"
  val Group = "org:group"

  def filterEq(key: String, value: String): Column = col(key) === lit(value)
  def filterIn(key: String, values: Seq[String]): Column = col(key).isin(values: _*)
  def filterMatch(key: String, pattern: String): Column = col(key).rlike(pattern)

  /** Working-together (the classic org-mining co-occurrence metric,
    * and — with any label column — generic same-case co-occurrence):
    * unordered pairs of distinct `labelCol` values sharing a
    * `caseCol` group, counted by groups shared.
    *
    * Scale shape: ONE shuffle to the distinct (case, label) set,
    * co-located on the case key, then a per-case self-join — per-case
    * distinct labels are alphabet-sized (resources/activities), so
    * the join is bounded per key, never |log|².
    */
  def workingTogether(df: DataFrame, caseCol: String,
      labelCol: String): DataFrame = {
    val d = df.select(col(caseCol).as("_case"), col(labelCol).as("_l"))
      .distinct()
    d.join(d.withColumnRenamed("_l", "_r"), "_case")
      .filter(col("_l") < col("_r"))
      .groupBy(col("_l").as("label_a"), col("_r").as("label_b"))
      .agg(count(lit(1)).as("n_cases"))
  }

  /** Similar-task social network (the second classic org-mining
    * metric): cosine similarity between actors' task profiles — how
    * alike two resources' work is, regardless of whether they share
    * cases. Generic in the same way as [[workingTogether]]: any
    * (actor, task) label pair works.
    *
    * Scale shape: profile = one (actor, task) partial-agg shuffle;
    * dot products come from an inverted-index equi-join ON THE TASK
    * KEY (pairs meet only through tasks they both perform — never an
    * all-actor cross join), so cost is Σ_task m_task², bounded by the
    * per-task actor fan-out, with the usual `maxDf`-style guard left
    * to the caller for degenerate hub tasks. All sums stay in exact
    * Long arithmetic; floating point enters only in the final
    * per-pair scalar, so results are bit-stable under any partial-agg
    * order.
    */
  def similarTask(df: DataFrame, actorCol: String,
      taskCol: String): DataFrame = {
    val prof = df.groupBy(col(actorCol).as("_actor"), col(taskCol).as("_task"))
      .agg(count(lit(1)).as("_n"))
    val norms = prof.groupBy("_actor")
      .agg(sum(col("_n") * col("_n")).as("_ss"))
    val a = prof.select(col("_task"), col("_actor").as("actor_a"),
      col("_n").as("_na"))
    val b = prof.select(col("_task"), col("_actor").as("actor_b"),
      col("_n").as("_nb"))
    a.join(b, "_task")
      .filter(col("actor_a") < col("actor_b"))
      .groupBy("actor_a", "actor_b")
      .agg(sum(col("_na") * col("_nb")).as("_dot"))
      .join(broadcast(norms.select(col("_actor").as("actor_a"),
        col("_ss").as("_ssa"))), Seq("actor_a"))
      .join(broadcast(norms.select(col("_actor").as("actor_b"),
        col("_ss").as("_ssb"))), Seq("actor_b"))
      .select(col("actor_a"), col("actor_b"),
        (col("_dot").cast("double") /
          (sqrt(col("_ssa").cast("double")) * sqrt(col("_ssb").cast("double"))))
          .as("cosine"))
  }

  /** Subcontracting social network (the third classic org-mining
    * metric alongside [[workingTogether]] and handover): actor a
    * "subcontracts" to b when a case's event sequence runs a → b → a —
    * a hands work out and gets it straight back. Counted over strict
    * consecutive triples in (tsCol, seqCol) order, b ≠ a (a → a → a is
    * continuation, not subcontracting). Reference anchor: the Org
    * extension's resource view (organizational.rs:82-112); the metric
    * itself is the standard social-network-miner family the extension
    * exists to serve.
    *
    * Scale shape: ONE window pass (two leads over the same
    * case-partitioned sort — one shuffle, shared by both leads), then
    * a partial-agg count; never a self-join.
    */
  def subcontracting(df: DataFrame, caseCol: String, actorCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(seqCol))
    df.select(col(actorCol).as("_a"),
        lead(col(actorCol), 1).over(w).as("_b"),
        lead(col(actorCol), 2).over(w).as("_c"))
      .filter(col("_c") === col("_a") && col("_b") =!= col("_a"))
      .groupBy(col("_a").as("actor"), col("_b").as("sub_actor"))
      .agg(count(lit(1)).as("n"))
  }
}

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
}

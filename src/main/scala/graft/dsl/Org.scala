package graft.dsl

import org.apache.spark.sql.Column
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
}

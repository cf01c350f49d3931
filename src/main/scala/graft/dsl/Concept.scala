package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Concept extension predicate factories — Spark `Column` analogue of
  * the reference's `Concept::filter_eq/filter_in/filter_match`
  * (`/root/reference/src/stream/extension/concept.rs:71-101`).
  *
  * The reference errors when the attribute is undefined; in the
  * columnar model an absent value is NULL and three-valued logic drops
  * the row, which matches the filter outcome. Use [[requireDefined]]
  * to get the reference's hard-error behavior.
  */
object Concept {
  val DefaultName = "concept:name"
  val DefaultInstance = "concept:instance"

  def filterEq(value: String, activity: String = DefaultName): Column =
    col(activity) === lit(value)

  def filterIn(values: Seq[String], activity: String = DefaultName): Column =
    col(activity).isin(values: _*)

  def filterMatch(pattern: String, activity: String = DefaultName): Column =
    col(activity).rlike(pattern)

  /** Mirror of the reference's AttributeError on undefined key: raise
    * if the attribute is NULL instead of silently dropping.
    */
  def requireDefined(activity: String = DefaultName): Column =
    when(col(activity).isNull,
      raise_error(lit(s"$activity is not defined"))).otherwise(lit(true))
}

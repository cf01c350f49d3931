package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CNF predicate combinator — analogue of the reference's
  * `CNF&lt;T&gt; = Vec&lt;Vec&lt;Condition&gt;&gt;` (conjunction of disjunction
  * clauses) and its `Filter` handler semantics
  * (`/root/reference/src/stream/filter.rs:8-112`).
  *
  * Each inner clause keeps a row iff ANY condition is true; an empty
  * clause drops everything (filter.rs:14-53); an empty CNF keeps
  * everything (no filters registered). Composed into a single `Column`
  * so Catalyst can push the whole predicate into the scan.
  */
object Cnf {
  def clause(conditions: Column*): Column =
    if (conditions.isEmpty) lit(false)
    else conditions.reduce(_ || _)

  def apply(clauses: Seq[Column]*): Column =
    if (clauses.isEmpty) lit(true)
    else clauses.map(c => clause(c: _*)).reduce(_ && _)

  /** `neg` combinator (filter.rs:57-60). NULL-safe: a NULL predicate
    * stays NULL and the row is dropped either way, matching the
    * reference where a missing attribute is an error, not a keep.
    */
  def neg(c: Column): Column = !c

  /** `drop_err` combinator (filter.rs:62-68): treat evaluation
    * errors/unknowns as "drop the row" instead of failing the query.
    */
  def dropErr(c: Column): Column = coalesce(c, lit(false))
}

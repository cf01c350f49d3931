package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DECLARE constraint discovery — declarative process models (Pesic &
  * van der Aalst's DECLARE templates) mined from an event log. The
  * reference ships imperative discovery building blocks
  * (`/root/reference/src/lib.rs:11-22` names DFG/footprint generators);
  * declarative constraints are the complementary model family every
  * process-mining suite pairs with them, so they are first-class here.
  *
  * Every template is reduced to an algebraic predicate over the
  * per-case activity profile `(n, firstPos, lastPos)`:
  *
  *  - `existence(a)`:   case contains a
  *  - `absence2(a)`:    case contains a at most once
  *  - `init(a)`:        a is the first event of the case
  *  - `last(a)`:        a is the final event of the case
  *  - `responded_existence(a,b)`: case has a ⇒ case has b
  *  - `response(a,b)`:  every a is eventually followed by a b
  *                      ⇔ has b with lastPos(b) &gt; lastPos(a)
  *                      (a b after the LAST a serves every a)
  *  - `precedence(a,b)`: every b is preceded by some a
  *                      ⇔ has a with firstPos(a) &lt; firstPos(b)
  *  - `succession(a,b)`: response(a,b) ∧ precedence(a,b)
  *
  * `support = n_satisfied / n_applicable` where the applicable basis is
  * the standard one per template (cases containing a for response /
  * responded_existence, containing b for precedence, containing a or b
  * for succession, all cases for the unary templates).
  *
  * Scale shape: ONE case-key shuffle for event positions, a partial-
  * aggregated (case, activity) profile, then a co-partitioned per-case
  * self-join whose fan-out is |A_case|² — bounded by the number of
  * DISTINCT activities in a case, not case length, so a million-event
  * case with 20 activities costs 400 rows, not 10¹². The final rollup
  * and the alphabet×alphabet pair base are alphabet-sized (broadcast).
  * Nothing is collected to the driver.
  */
object Declare {

  /** Long-form constraint table:
    * `(template, act_a, act_b, n_applicable, n_satisfied, support)`.
    * Unary templates carry `act_b = ''`. Pairs whose applicable basis
    * is zero are omitted; `minSupport` trims the tail (0.0 = emit all).
    */
  def constraints(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, minSupport: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(col(caseCol)).orderBy(col(tsCol), col(tieBreak))
    val pos = events
      .select(col(caseCol), col(activityCol), col(tsCol), col(tieBreak))
      .withColumn("p", row_number().over(w))
      .select(col(caseCol).as("c"), col(activityCol).as("a"), col("p"))

    // Per-case activity profile + case length (max position).
    // Materialized ONCE (r17): the profile fans into the case-length
    // rollup, the unary rollup and BOTH sides of the pair self-join —
    // uncached, each reference re-ran the events scan + case window +
    // profile aggregation (22 scans / 50 Exchanges in the r17 plan
    // audit). The profile is (case, activity)-sized — far smaller
    // than the event log — so one checkpoint beats four derivations
    // at every scale.
    val prof = pos.groupBy("c", "a")
      .agg(count(lit(1)).as("n"), min("p").as("fp"), max("p").as("lp"))
      .localCheckpoint(true)
    val clen = prof.groupBy("c").agg(max("lp").as("len"))
    val profL = prof.join(clen, "c") // co-partitioned on c after AQE

    val nCases = clen.agg(count(lit(1)).as("n_cases"))

    // Unary rollup: one alphabet-sized row per activity.
    val unary = profL.groupBy(col("a"))
      .agg(count(lit(1)).as("n_has"),
        sum(when(col("n") <= 1, 1L).otherwise(0L)).as("n_le1"),
        sum(when(col("fp") === 1, 1L).otherwise(0L)).as("n_init"),
        sum(when(col("lp") === col("len"), 1L).otherwise(0L)).as("n_last"))
      .crossJoin(broadcast(nCases))

    val unaryLong = unary.select(col("a"), col("n_cases"), explode(map(
      lit("existence"), col("n_has"),
      lit("absence2"), col("n_le1") + (col("n_cases") - col("n_has")),
      lit("init"), col("n_init"),
      lit("last"), col("n_last"))).as(Seq("template", "n_satisfied")))
      .select(col("template"), col("a").as("act_a"), lit("").as("act_b"),
        col("n_cases").as("n_applicable"), col("n_satisfied"))

    // Joint per-case pair stats: co-partitioned self-join on the case
    // key; |A_case|² rows per case.
    val x = prof.select(col("c"), col("a").as("aa"),
      col("fp").as("xfp"), col("lp").as("xlp"))
    val y = prof.select(col("c"), col("a").as("bb"),
      col("fp").as("yfp"), col("lp").as("ylp"))
    val joint = x.join(y, Seq("c")).filter(col("aa") =!= col("bb"))
      .groupBy("aa", "bb")
      .agg(count(lit(1)).as("n_joint"),
        sum(when(col("ylp") > col("xlp"), 1L).otherwise(0L)).as("n_resp"),
        sum(when(col("xfp") < col("yfp"), 1L).otherwise(0L)).as("n_prec"),
        sum(when(col("ylp") > col("xlp") && col("xfp") < col("yfp"), 1L)
          .otherwise(0L)).as("n_succ"))

    // Alphabet-sized pair base so never-co-occurring pairs still get a
    // (0-satisfied) row for templates whose basis is one-sided.
    val acts = unary.select(col("a"), col("n_has"))
    val base = broadcast(acts.select(col("a").as("aa"), col("n_has").as("na")))
      .crossJoin(broadcast(acts.select(col("a").as("bb"), col("n_has").as("nb"))))
      .filter(col("aa") =!= col("bb"))
      .join(broadcast(joint), Seq("aa", "bb"), "left")
      .na.fill(0L, Seq("n_joint", "n_resp", "n_prec", "n_succ"))

    val binaryLong = base.select(col("aa"), col("bb"),
      explode(map(
        lit("responded_existence"), struct(col("na").as("app"), col("n_joint").as("sat")),
        lit("response"), struct(col("na").as("app"), col("n_resp").as("sat")),
        lit("precedence"), struct(col("nb").as("app"), col("n_prec").as("sat")),
        lit("succession"), struct((col("na") + col("nb") - col("n_joint")).as("app"),
          col("n_succ").as("sat")))).as(Seq("template", "s")))
      .select(col("template"), col("aa").as("act_a"), col("bb").as("act_b"),
        col("s.app").as("n_applicable"), col("s.sat").as("n_satisfied"))

    unaryLong.unionByName(binaryLong)
      .filter(col("n_applicable") > 0)
      .withColumn("support",
        col("n_satisfied").cast("double") / col("n_applicable").cast("double"))
      .filter(col("support") >= minSupport)
  }
}

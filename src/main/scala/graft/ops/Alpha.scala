package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alpha miner (van der Aalst) — discovers a workflow net from the
  * directly-follows relations. The reference lists miners as its
  * capability direction (`/root/reference/src/lib.rs:11-22`, no
  * implementation); the book corpus (L1…) is the textbook's worked
  * example for exactly this algorithm.
  *
  * Scale shape: the heavy part (directly-follows pairs, start/end
  * activities) is the distributed [[Dfg]] pass over the full log; the
  * place search runs driver-side over the collected footprint, which
  * is |activities|² — small by construction (an activity alphabet is
  * human-scale even when the log is 100 TB). The subset search is
  * capped by `maxActivities`.
  */
object Alpha {

  case class Place(inputs: Set[String], outputs: Set[String])

  case class WorkflowNet(
    activities: Set[String],
    startActivities: Set[String],
    endActivities: Set[String],
    places: Set[Place])

  /** Runs the alpha algorithm. `events` as in [[Dfg.edges]]. */
  def mine(events: DataFrame, caseCol: String, activityCol: String,
      tsCol: String, tieBreak: String, maxActivities: Int = 20): WorkflowNet = {
    // ONE collect for all four bounded footprint pieces (r17, the
    // probeInventory fold): edges, alphabet, start and end activities
    // ride a single tagged union — the four separate collects each
    // paid a full job's scheduling latency, and the union's branches
    // run as parallel stages of one job instead.
    val nullS = lit(null).cast("string")
    val edgesB = Dfg.edges(events, caseCol, activityCol, tsCol, tieBreak)
      .select(lit(0).as("_k"), col("act_from").as("_a"), col("act_to").as("_b"))
    val actsB = events.select(col(activityCol)).distinct()
      .select(lit(1).as("_k"), col(activityCol).as("_a"), nullS.as("_b"))
    val startsB = Dfg.startActivities(events, caseCol, activityCol, tsCol,
        tieBreak)
      .select(lit(2).as("_k"), col("activity").as("_a"), nullS.as("_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(caseCol)).orderBy(col(tsCol).desc, col(tieBreak).desc)
    val endsB = events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(activityCol)).distinct()
      .select(lit(3).as("_k"), col(activityCol).as("_a"), nullS.as("_b"))
    val rows = edgesB.unionByName(actsB).unionByName(startsB)
      .unionByName(endsB).collect()
    val edges = rows.filter(_.getInt(0) == 0)
      .map(r => (r.getString(1), r.getString(2))).toSet
    val acts = rows.filter(_.getInt(0) == 1).map(_.getString(1)).toSet
    require(acts.size <= maxActivities,
      s"alpha miner subset search capped at $maxActivities activities (got ${acts.size})")
    val starts = rows.filter(_.getInt(0) == 2).map(_.getString(1)).toSet
    val ends = rows.filter(_.getInt(0) == 3).map(_.getString(1)).toSet

    def follows(a: String, b: String) = edges.contains((a, b))
    def causal(a: String, b: String) = follows(a, b) && !follows(b, a)
    def choice(a: String, b: String) = !follows(a, b) && !follows(b, a)

    // candidate (A, B): all causal across, all #-independent within
    def valid(as: Set[String], bs: Set[String]): Boolean =
      as.nonEmpty && bs.nonEmpty &&
        as.forall(a => bs.forall(b => causal(a, b))) &&
        as.forall(a1 => as.forall(a2 => choice(a1, a2))) &&
        bs.forall(b1 => bs.forall(b2 => choice(b1, b2)))

    val actSeq = acts.toSeq
    def subsets(xs: Seq[String]): Iterator[Set[String]] =
      (1 to xs.size).iterator.flatMap(n => xs.combinations(n).map(_.toSet))

    // grow from causal pairs: for tractability enumerate subsets of the
    // causal-connected neighborhoods only
    val candidates = (for {
      as <- subsets(actSeq.filter(a => actSeq.exists(b => causal(a, b))))
      outs = actSeq.filter(b => as.forall(a => causal(a, b)))
      if outs.nonEmpty
      bs <- subsets(outs)
      if valid(as, bs)
    } yield Place(as, bs)).toSet

    // maximal only
    val places = candidates.filter(p => !candidates.exists(q =>
      q != p && p.inputs.subsetOf(q.inputs) && p.outputs.subsetOf(q.outputs)))

    WorkflowNet(acts, starts, ends, places)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DECLARE monitoring: evaluate a fixed set of declarative
  * constraints against every CLOSED trace — the online companion of
  * [[graft.ops.Declare]] (discovery mines constraints from history;
  * this monitors a live stream against them).
  *
  * Every implemented template reads only the trace's PROFILE —
  * first/last position and count per activity, plus the trace length —
  * and the profile is a prefix-composable left fold (first = keep
  * earliest, last = keep latest, count = add, in trace order). So the
  * keyed state compacts to the alphabet²-bounded profile (in practice
  * alphabet-sized: one row per DISTINCT activity seen), never the
  * trace itself, under the same watermark-prefix argument as
  * [[StreamingTemporal]] / [[StreamingConformance]]: the below-
  * watermark slice is immutable and tie groups never straddle the
  * strict `ts < wm` cut, so folding slices in (ts, activity) order
  * reproduces the profile of the fully sorted trace exactly.
  * Per-case state: profile + in-horizon buffer (gap × rate),
  * independent of trace length.
  */
object StreamingDeclare extends Serializable {

  /** One constraint to monitor; `actB` is ignored for the unary
    * templates (`existence`, `absence2`, `init`, `last`). */
  case class Constraint(template: String, actA: String, actB: String = "")

  case class TraceCheck(caseId: String, template: String, actA: String,
      actB: String, applicable: Boolean, satisfied: Boolean)

  /** The trace profile the templates read: 1-based first/last
    * positions and counts per activity, and the trace length. */
  case class Profile(first: Map[String, Long], last: Map[String, Long],
      count: Map[String, Long], n: Long)

  def profileOf(activities: Seq[String]): Profile =
    foldProfile(Profile(Map.empty, Map.empty, Map.empty, 0L), activities)

  /** Left-fold `activities` (already in trace order) into `p` —
    * prefix-composable: positions continue from `p.n`. */
  def foldProfile(p: Profile, activities: Seq[String]): Profile = {
    var first = p.first; var last = p.last; var count = p.count
    var i = p.n
    activities.foreach { a =>
      i += 1
      if (!first.contains(a)) first += (a -> i)
      last += (a -> i)
      count += (a -> (count.getOrElse(a, 0L) + 1L))
    }
    Profile(first, last, count, i)
  }

  /** Pure per-profile evaluator (shared semantics with the batch
    * miner's profile algebra): returns (applicable, satisfied). A
    * constraint that is not applicable to the trace is reported
    * satisfied=true (vacuous), applicable=false. */
  def evaluateProfile(c: Constraint, p: Profile): (Boolean, Boolean) = {
    val hasA = p.count.contains(c.actA)
    val hasB = p.count.contains(c.actB)
    c.template match {
      case "existence" => (true, hasA)
      case "absence2" => (true, p.count.getOrElse(c.actA, 0L) <= 1L)
      case "init" => (true, p.n > 0 && p.first.get(c.actA).contains(1L))
      case "last" => (true, p.n > 0 && p.last.get(c.actA).contains(p.n))
      case "responded_existence" => (hasA, !hasA || hasB)
      case "response" =>
        (hasA, !hasA || (hasB && p.last(c.actB) > p.last(c.actA)))
      case "precedence" =>
        (hasB, !hasB || (hasA && p.first(c.actA) < p.first(c.actB)))
      case "succession" =>
        val resp = !hasA || (hasB && p.last(c.actB) > p.last(c.actA))
        val prec = !hasB || (hasA && p.first(c.actA) < p.first(c.actB))
        (hasA || hasB, resp && prec)
      case other =>
        throw new IllegalArgumentException(s"unknown template: $other")
    }
  }

  /** Per-trace evaluator over the full activity sequence — the
    * spec/audit convenience face of [[evaluateProfile]]. */
  def evaluate(c: Constraint, activities: Seq[String]): (Boolean, Boolean) =
    evaluateProfile(c, profileOf(activities))

  /** Keyed state: the folded profile (parallel per-activity seqs —
    * alphabet-bounded) plus the in-horizon event buffer. */
  case class DcSt(pActs: Seq[String], pFirsts: Seq[Long], pLasts: Seq[Long],
      pCounts: Seq[Long], nFolded: Long,
      tss: Seq[Long], acts: Seq[String], lastMicros: Long)

  /** One check row per (closed trace × constraint). Violations are
    * `filter(applicable && !satisfied)` on the result stream. */
  def monitor(spark: SparkSession, events: Dataset[TraceAssembly.InEvent],
      gapSeconds: Long, constraints: Seq[Constraint]): Dataset[TraceCheck] = {
    import spark.implicits._
    val bCons = spark.sparkContext.broadcast(constraints)

    def stProfile(st: DcSt): Profile = Profile(
      st.pActs.zip(st.pFirsts).toMap, st.pActs.zip(st.pLasts).toMap,
      st.pActs.zip(st.pCounts).toMap, st.nFolded)

    def close(caseId: String, st: DcSt): Iterator[TraceCheck] = {
      val p = foldProfile(stProfile(st),
        st.tss.zip(st.acts).sortBy(e => (e._1, e._2)).map(_._2))
      bCons.value.iterator.map { c =>
        val (app, sat) = evaluateProfile(c, p)
        TraceCheck(caseId, c.template, c.actA, c.actB, app, sat)
      }
    }

    def update(caseId: String, in: Iterator[TraceAssembly.InEvent],
        state: GroupState[DcSt]): Iterator[TraceCheck] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        close(caseId, st)
      } else {
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val old = state.getOption
          .getOrElse(DcSt(Nil, Nil, Nil, Nil, 0L, Nil, Nil, 0L))
        var last = old.lastMicros
        val fresh = scala.collection.mutable.ListBuffer.empty[(Long, String)]
        in.foreach { e =>
          last = math.max(last, e.tsMicros)
          fresh += ((e.tsMicros, e.activity))
        }
        val buffered = old.tss.zip(old.acts) ++ fresh
        val (done, rest) = buffered.partition(_._1 < wmMicros)
        val p =
          if (done.isEmpty) stProfile(old)
          else foldProfile(stProfile(old),
            done.sortBy(e => (e._1, e._2)).map(_._2))
        // stable profile row order (sorted activities) keeps the
        // state encoding deterministic across fold steps
        val keys = p.count.keys.toSeq.sorted
        state.update(DcSt(keys, keys.map(p.first), keys.map(p.last),
          keys.map(p.count), p.n, rest.map(_._1), rest.map(_._2), last))
        state.setTimeoutTimestamp(last / 1000L + gapSeconds * 1000L)
        Iterator.empty
      }
    }

    events.groupByKey(_.caseId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}

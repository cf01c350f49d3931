package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETC-style precision (escaping-edges; Muñoz-Gama/Carmona family,
  * public literature) — the companion metric to alignment/replay
  * fitness: how much MORE behavior the model allows than the log
  * exhibits. For every observed prefix state, compare the activities
  * the model enables (`en_M`, after τ-closure) with the activities the
  * log actually continues with (`en_L`):
  *
  * `precision = 1 − Σ_s w(s)·|en_M(s) \ en_L(s)| / Σ_s w(s)·|en_M(s)|`
  *
  * A model that allows exactly the observed behavior scores 1; a
  * flower model scores near 0 on any non-trivial log.
  *
  * Scale shape: prefix states are generated per VARIANT (one case-key
  * shuffle builds the variant table; each variant of length L yields
  * its L proper prefixes weighted by case count), aggregated by prefix
  * in one partial-agg shuffle — prefix rows ≤ event rows, usually far
  * fewer. Each distinct prefix then computes `en_M` once in an
  * executor against the broadcast net (BFS with τ-closure over the
  * alphabet-sized safe net). Unreplayable prefixes (non-fitting log)
  * contribute nothing, per the standard ETC assumption.
  */
object Precision {

  case class PrefixPrecision(prefix: Seq[String], w: Long,
      enabledModel: Int, escaping: Int)

  /** Markings reachable by consuming `prefix` (any interleaving of τ
    * firings), then τ-closed — the automaton state set behind the
    * prefix. Empty iff the prefix is not replayable. */
  private[ops] def reachableMarkings(net: PetriNet,
      prefix: Seq[String]): Set[Map[String, Int]] = {
    def canon(m: Map[String, Int]) = m.filter(_._2 > 0)

    def tauClose(ms: Set[Map[String, Int]]): Set[Map[String, Int]] = {
      val seen = scala.collection.mutable.Set.empty[Map[String, Int]]
      val queue = scala.collection.mutable.Queue.empty[Map[String, Int]]
      ms.foreach { m => if (seen.add(m)) queue += m }
      while (queue.nonEmpty) {
        val m = queue.dequeue()
        net.transitions.foreach { t =>
          if (t.label.isEmpty && net.enabled(m, t.id)) {
            val f = canon(net.fire(m, t.id))
            if (seen.add(f)) queue += f
          }
        }
      }
      seen.toSet
    }

    var cur = tauClose(Set(canon(net.initialMarking)))
    prefix.foreach { a =>
      val next = cur.flatMap { m =>
        net.transitions.collect {
          case t if t.label.contains(a) && net.enabled(m, t.id) =>
            canon(net.fire(m, t.id))
        }
      }
      cur = tauClose(next)
      if (cur.isEmpty) return Set.empty
    }
    cur
  }

  /** Activities the model enables after `prefix` (∅ if unreplayable). */
  private[ops] def enabledAfter(net: PetriNet,
      prefix: Seq[String]): Set[String] =
    reachableMarkings(net, prefix).flatMap { m =>
      net.transitions.collect {
        case t if t.label.isDefined && net.enabled(m, t.id) => t.label.get
      }
    }

  /** Per-prefix escaping-edge table: weight, |en_M|, |en_M \ en_L|. */
  def prefixTable(spark: SparkSession, events: DataFrame, caseCol: String,
      activityCol: String, tsCol: String, tieBreak: String,
      net: PetriNet): Dataset[PrefixPrecision] = {
    import spark.implicits._
    val bNet = spark.sparkContext.broadcast(net)
    val w = Window.partitionBy(col(caseCol))
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .select(col(caseCol), collect_list(col(activityCol)).over(w).as("_seq"))
      .groupBy(col(caseCol)).agg(first(col("_seq")).as("_seq"))
      .groupBy(col("_seq")).agg(count(lit(1)).as("_n"))
      .as[(Seq[String], Long)]
      .flatMap { case (seq, n) =>
        seq.indices.map(i => (seq.take(i), seq(i), n))
      }
      .toDF("_prefix", "_next", "_n")
      .groupBy(col("_prefix"))
      .agg(collect_set(col("_next")).as("_enLog"),
        sum(col("_n")).as("_w"))
      .as[(Seq[String], Seq[String], Long)]
      .map { case (prefix, enLog, wSum) =>
        val enM = enabledAfter(bNet.value, prefix)
        PrefixPrecision(prefix, wSum, enM.size, (enM -- enLog.toSet).size)
      }
  }

  /** The scalar ETC precision in [0,1]. Prefixes the model cannot
    * replay are excluded (their `enabledModel` is 0). */
  def precision(table: Dataset[PrefixPrecision]): Double = {
    val row = table.toDF()
      .agg(sum(col("w") * col("escaping")).as("esc"),
        sum(col("w") * col("enabledModel")).as("en")).head()
    val en = row.getLong(1)
    if (en == 0L) 1.0 else 1.0 - row.getLong(0).toDouble / en.toDouble
  }
}

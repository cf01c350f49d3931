package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model playout: generate a synthetic event log from a [[PetriNet]]
  * — the inverse of discovery, closing the
  * discover → simulate → re-discover loop (test-data generation,
  * model debugging, what-if load shaping). The reference's
  * `dev_util.rs` generates synthetic streams for tests; this is the
  * model-driven counterpart.
  *
  * Determinism: a seeded splittable generator — trace i uses seed
  * `mix(seed, i)` — so any partition layout produces the same log.
  * Firing picks uniformly among enabled transitions; τ transitions
  * fire silently. Traces that exceed `maxSteps` without reaching the
  * final marking are truncated and marked, never looped forever
  * (livelocks surface as `complete = false` rows, not hangs).
  *
  * Scale shape: the net broadcasts; trace generation is embarrassingly
  * parallel over the id range (`spark.range`), one row per event,
  * no shuffle at all.
  */
object Simulate {

  /** SplitMix64 — a public-domain splittable PRNG step, so per-trace
    * streams are independent without shared state. */
  private[ops] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Playout of one trace: the visible activity sequence and whether
    * the final marking was reached within `maxSteps` firings. */
  private[ops] def playout(net: PetriNet, seed: Long,
      maxSteps: Int): (Seq[String], Boolean) = {
    var rng = seed
    def nextInt(bound: Int): Int = {
      rng = mix(rng)
      (((rng >>> 33) % bound).toInt + bound) % bound
    }
    var m = net.initialMarking
    val out = Seq.newBuilder[String]
    val target = net.finalMarking.filter(_._2 > 0)
    var steps = 0
    while (steps < maxSteps) {
      if (m.filter(_._2 > 0) == target) return (out.result(), true)
      val enabled = net.transitions.filter(t => net.enabled(m, t.id))
      if (enabled.isEmpty) return (out.result(), false) // deadlock
      val t = enabled(nextInt(enabled.length))
      t.label.foreach(out += _)
      m = net.fire(m, t.id)
      steps += 1
    }
    (out.result(), m.filter(_._2 > 0) == target)
  }

  /** Synthetic log: `(case_id, seq, activity)` rows for `nTraces`
    * playouts, plus a `complete` flag per event's trace. */
  def log(spark: SparkSession, net: PetriNet, nTraces: Long,
      seed: Long, maxSteps: Int = 10000): DataFrame = {
    import spark.implicits._
    val bNet = spark.sparkContext.broadcast(net)
    spark.range(nTraces).flatMap { i =>
      val (acts, complete) = playout(bNet.value, mix(seed ^ i), maxSteps)
      acts.zipWithIndex.map { case (a, j) => (i, j, a, complete) }
    }.toDF("case_id", "seq", "activity", "complete")
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-column data-layout key
  * (Delta/Iceberg `ZORDER BY` class): sorting by the interleaved bits
  * of two keys clusters BOTH dimensions at once, so per-file min/max
  * ranges stay tight on either column and a scan with a predicate on
  * just one of them still prunes.
  *
  * Pure i64 bit arithmetic (shift / and / or), generated identically
  * as a Column tree and as oracle SQL — bit-deterministic across
  * engines. Inputs must already be in [0, 2^bits); callers mod/clamp
  * upstream (a documented contract, not a runtime branch, so the
  * expression stays codegen-friendly).
  *
  * Capability direction: physical-layout optimization for the 100 TB
  * scan path — the write-side complement of the read-side pruning the
  * bucketed operators rely on.
  */
object Zorder {

  /** Interleaved z-value: bit i of `a` lands at 2i, bit i of `b` at
    * 2i+1. `bits` ≤ 31 keeps the result in the positive i64 range.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bi = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_ bitwiseOR _)
  }

  /** Oracle SQL (DuckDB dialect) of [[zValue]] over expressions. */
  def zValueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) | (((($b) >> $i) & 1) << ${2 * i + 1})"
    }.map(t => s"($t)").mkString(" | ")
  }
}

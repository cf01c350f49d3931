package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot sketch/hash kernels
  * (SURVEY.md §7.3: custom `Expression` with `doGenCode` over UDFs).
  * Each generates a single static call into [[Native]], so the whole
  * operator pipeline stays inside WholeStageCodegen; the interpreted
  * HOF equivalents in [[Portable]]/ops remain as the executable
  * specification (their arithmetic is identical, and the DuckDB
  * oracles pin both).
  *
  * Measured on sf0.1 documents (5000 rows): shingle hashing via HOFs
  * ≈ 13s per pass; via these expressions ≈ 50ms.
  */
object NativeExpressions {

  case class ShingleHashesExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"
    override protected def nullSafeEval(input: Any): Any =
      Native.shingleHashes(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.shingleHashes($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Word k-gram strings (r18) — the STRING twin of
    * [[ShingleHashesExpr]] for consumers that need the gram text
    * itself (heavy-hitter items are oracle-hashed strings). Output is
    * byte-equal to `shinglesOf(tokens(text), k)` for every input
    * (spec-pinned); one static call replaces the regex split +
    * per-element lambda tree that dominated the shingle consumers'
    * map cost. */
  case class ShingleStringsExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingle_strings"
    override protected def nullSafeEval(input: Any): Any =
      Native.shingleStrings(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.shingleStrings($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class TokenHashesExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_token_hashes"
    override protected def nullSafeEval(input: Any): Any =
      Native.tokenHashes(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.tokenHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MinHashSigExpr(child: Expression, n: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"
    override protected def nullSafeEval(input: Any): Any =
      Native.minhashSig(input.asInstanceOf[ArrayData], n, seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.minhashSig($c, $n, ${seed}L)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class SimHashExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override protected def nullSafeEval(input: Any): Any =
      Native.simhash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.simhash($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class LshBucketExpr(child: Expression, table: Int, planes: Int,
      seed: Long, dims: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_lsh_bucket"
    override protected def nullSafeEval(input: Any): Any =
      Native.lshBucket(input.asInstanceOf[ArrayData], table, planes, seed, dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Native.lshBucket($c, $table, $planes, ${seed}L, $dims)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[LshBucketExpr]] with per-global-plane centering thresholds
    * carried as a codegen reference object ([[Native.lshBucketCentered]]). */
  case class LshBucketCenteredExpr(child: Expression, table: Int, planes: Int,
      seed: Long, dims: Int, thresholds: Array[Double]) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_lsh_bucket_centered"
    override protected def nullSafeEval(input: Any): Any =
      Native.lshBucketCentered(input.asInstanceOf[ArrayData], table, planes,
        seed, dims, thresholds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val th = ctx.addReferenceObj("lshThresholds", thresholds, "double[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Native.lshBucketCentered($c, $table, $planes, ${seed}L, $dims, $th)")
    }
    // default toString would print the array's identity hash —
    // run-variant noise in plan strings (breaks plan-digest pinning)
    override def toString: String =
      s"graft_lsh_bucket_centered($child, $table, $planes)"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-projection features ([[Native.rpProject]]). */
  case class RpProjectExpr(child: Expression, outDims: Int, seed: Long,
      dims: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_rp_project"
    override protected def nullSafeEval(input: Any): Any =
      Native.rpProject(input.asInstanceOf[ArrayData], outDims, seed, dims)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Native.rpProject($c, $outDims, ${seed}L, $dims)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class CharHashExpr(child: Expression, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_char_hash"
    override protected def nullSafeEval(input: Any): Any =
      Native.charHash(input.asInstanceOf[UTF8String], seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.charHash($c, ${seed}L)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class FingerprintExpr(child: Expression, k: Int, p: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_fingerprint"
    override protected def nullSafeEval(input: Any): Any =
      Native.fingerprint(input.asInstanceOf[UTF8String], k, p)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.fingerprint($c, $k, $p)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class GramHashesExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_gram_hashes"
    override protected def nullSafeEval(input: Any): Any =
      Native.gramHashes(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.gramHashes($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class FoldHashExpr(child: Expression, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fold_hash"
    override protected def nullSafeEval(input: Any): Any =
      Native.foldHash(input.asInstanceOf[ArrayData], seed)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.foldHash($c, ${seed}L)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Map-side IVF coarse assignment: the centroid table rides along as
    * ONE reference object in the generated code (`addReferenceObj`),
    * not a join input — so cell assignment is a zero-shuffle scan.
    * Centroid arrays must be in ascending-id order (tie contract of
    * [[Native.ivfAssign]]). */
  case class IvfAssignExpr(child: Expression, centIds: Array[Long],
      cents: Array[Array[Float]]) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_ivf_assign"
    override protected def nullSafeEval(input: Any): Any =
      Native.ivfAssign(input.asInstanceOf[ArrayData], centIds, cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val cs = ctx.addReferenceObj("cents", cents, "float[][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.ivfAssign($c, $ids, $cs)")
    }
    // default toString would print the arrays' identity hashes —
    // run-variant noise in plan strings (breaks plan-digest pinning)
    override def toString: String =
      s"graft_ivf_assign($child, C=${centIds.length})"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`nProbe` centroid ids (cos desc, id asc) — the probe-side
    * twin of [[IvfAssignExpr]], also zero-shuffle. */
  case class IvfProbesExpr(child: Expression, centIds: Array[Long],
      cents: Array[Array[Float]], nProbe: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_ivf_probes"
    override protected def nullSafeEval(input: Any): Any =
      Native.ivfProbes(input.asInstanceOf[ArrayData], centIds, cents, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val cs = ctx.addReferenceObj("cents", cents, "float[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Native.ivfProbes($c, $ids, $cs, $nProbe)")
    }
    override def toString: String =
      s"graft_ivf_probes($child, C=${centIds.length}, nProbe=$nProbe)"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Map-side PQ encode — codebooks as ONE reference object, so
    * quantization is a zero-shuffle scan (the [[IvfAssignExpr]]
    * pattern). */
  case class PqEncodeExpr(child: Expression,
      codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_encode"
    override protected def nullSafeEval(input: Any): Any =
      Native.pqEncode(input.asInstanceOf[ArrayData], codebooks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.Native.pqEncode($c, $cbs)")
    }
    override def toString: String =
      s"graft_pq_encode($child, M=${codebooks.length}, K=${codebooks(0).length})"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC scoring against per-query lookup tables (reference objects):
    * O(M) per (query, code) pair. */
  case class PqAdcExpr(left: Expression, right: Expression,
      qIds: Array[Long], tables: Array[Array[Array[Double]]],
      qNorm2: Array[Double], cNorm2: Array[Array[Double]])
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_pq_adc"
    override protected def nullSafeEval(qid: Any, code: Any): Any =
      Native.pqAdc(qid.asInstanceOf[Long], code.asInstanceOf[ArrayData],
        qIds, tables, qNorm2, cNorm2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ids = ctx.addReferenceObj("qIds", qIds, "long[]")
      val ts = ctx.addReferenceObj("tables", tables, "double[][][]")
      val qn = ctx.addReferenceObj("qNorm2", qNorm2, "double[]")
      val cn = ctx.addReferenceObj("cNorm2", cNorm2, "double[][]")
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Native.pqAdc($a, $b, $ids, $ts, $qn, $cn)")
    }
    override def toString: String =
      s"graft_pq_adc($left, $right, Q=${qIds.length}, M=${cNorm2.length})"
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  }

  case class DotFExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_f"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Native.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Native.dotF($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  }

  // ---- Column wrappers ----
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def e(col: Column): Expression = GraftColumnBridge.expression(col)

  def shingleHashes(text: Column, k: Int): Column = c(ShingleHashesExpr(e(text), k))
  def shingleStrings(text: Column, k: Int): Column = c(ShingleStringsExpr(e(text), k))
  def tokenHashes(text: Column): Column = c(TokenHashesExpr(e(text)))
  def minhashSig(shingles: Column, n: Int, seed: Long): Column =
    c(MinHashSigExpr(e(shingles), n, seed))
  def simhash(text: Column): Column = c(SimHashExpr(e(text)))
  def lshBucket(v: Column, table: Int, planes: Int, seed: Long, dims: Int): Column =
    c(LshBucketExpr(e(v), table, planes, seed, dims))
  def lshBucketCentered(v: Column, table: Int, planes: Int, seed: Long,
      dims: Int, thresholds: Array[Double]): Column =
    c(LshBucketCenteredExpr(e(v), table, planes, seed, dims, thresholds))
  def rpProject(v: Column, outDims: Int, seed: Long, dims: Int): Column =
    c(RpProjectExpr(e(v), outDims, seed, dims))
  def dotF(a: Column, b: Column): Column = c(DotFExpr(e(a), e(b)))
  def gramHashes(text: Column, k: Int): Column =
    c(GramHashesExpr(e(text), k))
  def fingerprint(text: Column, k: Int, p: Int): Column =
    c(FingerprintExpr(e(text), k, p))
  def foldHash(xs: Column, seed: Long): Column = c(FoldHashExpr(e(xs), seed))
  def ivfAssign(v: Column, centIds: Array[Long], cents: Array[Array[Float]]): Column =
    c(IvfAssignExpr(e(v), centIds, cents))
  def ivfProbes(v: Column, centIds: Array[Long], cents: Array[Array[Float]],
      nProbe: Int): Column = c(IvfProbesExpr(e(v), centIds, cents, nProbe))
  def charHash(s: Column, seed: Long): Column = c(CharHashExpr(e(s), seed))
  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    c(PqEncodeExpr(e(v), codebooks))
  def pqAdc(qid: Column, code: Column, qIds: Array[Long],
      tables: Array[Array[Array[Double]]], qNorm2: Array[Double],
      cNorm2: Array[Array[Double]]): Column =
    c(PqAdcExpr(e(qid), e(code), qIds, tables, qNorm2, cNorm2))
}

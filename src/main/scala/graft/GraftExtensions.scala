package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.NativeExpressions._

/** Spark SQL integration for the native kernels: registers them in the
  * session's FunctionRegistry via `SparkSessionExtensions`
  * (`spark.sql.extensions=graft.GraftExtensions`, set by
  * [[GraftSession]]), so the whole sketch/hash surface is callable
  * from pure SQL — `SELECT graft_simhash(text) FROM docs` — not only
  * through the Scala column API. Parameters that shape codegen
  * (k, p, nHashes, …) must be literals; non-literal arguments fail
  * analysis with a clear message rather than planning something
  * slow.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litL(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String)(builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_char_hash",
      "graft_char_hash(str[, seed]) - polynomial code-point hash mod 1e9+7") {
      case Seq(s) => CharHashExpr(s, 7L)
      case Seq(s, seed) => CharHashExpr(s, litL(seed, "seed"))
    }
    register(ext, "graft_token_hashes",
      "graft_token_hashes(str) - hash per whitespace token, document order") {
      case Seq(s) => TokenHashesExpr(s)
    }
    register(ext, "graft_shingle_hashes",
      "graft_shingle_hashes(str, k) - distinct hashed word k-grams") {
      case Seq(s, k) => ShingleHashesExpr(s, lit(k, "k"))
    }
    register(ext, "graft_minhash_sig",
      "graft_minhash_sig(hashes, n, seed) - MinHash signature") {
      case Seq(a, n, seed) => MinHashSigExpr(a, lit(n, "n"), litL(seed, "seed"))
    }
    register(ext, "graft_simhash",
      "graft_simhash(str) - 30-bit SimHash over token hashes") {
      case Seq(s) => SimHashExpr(s)
    }
    register(ext, "graft_lsh_bucket",
      "graft_lsh_bucket(vec, table, planes, seed, dims) - hyperplane LSH bucket") {
      case Seq(v, t, p, seed, d) =>
        LshBucketExpr(v, lit(t, "table"), lit(p, "planes"),
          litL(seed, "seed"), lit(d, "dims"))
    }
    register(ext, "graft_dot",
      "graft_dot(a, b) - sequential-order float-array dot product") {
      case Seq(a, b) => DotFExpr(a, b)
    }
    register(ext, "graft_fingerprint",
      "graft_fingerprint(str, k, p) - winnowing mod-p k-gram sketch") {
      case Seq(s, k, p) => FingerprintExpr(s, lit(k, "k"), lit(p, "p"))
    }
    register(ext, "graft_fold_hash",
      "graft_fold_hash(arr[, seed]) - order-sensitive array digest") {
      case Seq(a) => FoldHashExpr(a, 7L)
      case Seq(a, seed) => FoldHashExpr(a, litL(seed, "seed"))
    }
    register(ext, "graft_minhash_union",
      "graft_minhash_union(sig) - aggregate: element-wise min = signature of the set union") {
      case Seq(a) => graft.functions.MinHashUnionAgg(a)
    }
  }
}

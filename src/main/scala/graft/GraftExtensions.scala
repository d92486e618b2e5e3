package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL registration of the native expressions, so
  * `spark.sql("SELECT simhash64(tokens) ...")` works and the engine's
  * custom kernels are usable from pure SQL.
  *
  * Two entry points:
  *  - session build time:
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  *    `SparkSession.builder().withExtensions(new GraftExtensions)`;
  *  - live session: `GraftExtensions.register(spark)` (extensions cannot
  *    attach to an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

object GraftExtensions {

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.FunctionRegistryBridge
        .register(spark, name, builder)
    }

  private def longArg(e: Expression): Long = e match {
    case Literal(v: Number, _) => v.longValue()
    case other => throw new IllegalArgumentException(
      s"expected a literal number, got $other")
  }
  private def intArg(e: Expression): Int = longArg(e).toInt

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> {
      case Seq(c) => RollingHashExpr(c, 257L, 1000000007L)
      case Seq(c, b, m) => RollingHashExpr(c, longArg(b), longArg(m))
      case _ => throw new IllegalArgumentException(
        "rolling_hash(text[, base, mod])")
    },
    "fvec_dot" -> {
      case Seq(a, b) => FloatVecDotExpr(a, b)
      case _ => throw new IllegalArgumentException("fvec_dot(a, b)")
    },
    "fvec_norm" -> {
      case Seq(a) => FloatVecNormExpr(a)
      case _ => throw new IllegalArgumentException("fvec_norm(a)")
    },
    "simhash64" -> {
      case Seq(c) => SimHash64Expr(c)
      case _ => throw new IllegalArgumentException("simhash64(tokens)")
    },
    "minhash_sig" -> {
      case Seq(c) => MinHashSigExpr(c, 3, 32)
      case Seq(c, w, n) => MinHashSigExpr(c, intArg(w), intArg(n))
      case _ => throw new IllegalArgumentException(
        "minhash_sig(tokens[, shingle_words, num_hashes])")
    },
    "minhash_bands" -> {
      case Seq(c) => MinHashBandsExpr(c, 3, 32, 8)
      case Seq(c, w, n, b) =>
        MinHashBandsExpr(c, intArg(w), intArg(n), intArg(b))
      case _ => throw new IllegalArgumentException(
        "minhash_bands(tokens[, shingle_words, num_hashes, bands])")
    },
    "repetition_stats" -> {
      case Seq(c) => RepetitionStatsExpr(c)
      case _ => throw new IllegalArgumentException(
        "repetition_stats(tokens)")
    },
    "shingle_hashes_sorted" -> {
      case Seq(c) => ShingleHashSortedExpr(c, 3)
      case Seq(c, w) => ShingleHashSortedExpr(c, intArg(w))
      case _ => throw new IllegalArgumentException(
        "shingle_hashes_sorted(tokens[, shingle_words])")
    },
    "sorted_intersect_count" -> {
      case Seq(a, b) => SortedIntersectCountExpr(a, b)
      case _ => throw new IllegalArgumentException(
        "sorted_intersect_count(a, b)")
    })
}

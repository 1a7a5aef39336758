package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * minhash_signature(toks, 128) ...")` works anywhere the DataFrame API
  * does (SURVEY.md §2.11 — the engine's function surface; activation via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * [[GraftSession]], which wires it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom physical operator: native as-of join (SURVEY.md §2.4)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    def reg(name: String, usage: String, builder: FunctionBuilder): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    reg("word_shingles", "word_shingles(text, n) - distinct word n-grams",
      args => WordShinglesExpr(args(0), intArg(args(1), "n")))
    reg("id_pairs", "id_pairs(ids) - all i<j pairs of a sorted id array",
      args => IdPairsExpr(args(0)))
    reg("minhash_signature",
      "minhash_signature(tokens, k[, seed]) - k-permutation MinHash",
      args => MinHashSignatureExpr(args(0), intArg(args(1), "k"),
        if (args.length > 2) longArg(args(2), "seed") else 42L))
    reg("simhash64", "simhash64(tokens[, seed]) - 64-bit SimHash sketch",
      args => SimHash64Expr(args(0),
        if (args.length > 1) longArg(args(1), "seed") else 42L))
    reg("fingerprint64", "fingerprint64(text) - rolling-hash fingerprint",
      args => Fingerprint64Expr(args(0)))
    reg("cosine_sim", "cosine_sim(a, b) - cosine of two float vectors",
      args => CosineSimilarityExpr(args(0), args(1)))
    reg("dot_product", "dot_product(a, b) - dot of two float vectors",
      args => DotProductExpr(args(0), args(1)))
  }
}

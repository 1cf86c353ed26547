package graft

import graft.functions._
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SparkSessionExtensions entry point: exposes graft's function surface to
  * SQL (`spark.sql("SELECT simhash64(tokens(text)) ...")`), so the engine
  * is usable from pure-SQL contexts (thrift server, notebooks, `spark.sql`
  * pipelines) exactly like from the DataFrame API.
  *
  * Wire it at session build time:
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  * or onto a live session with [[GraftExtensions.install]] (what
  * [[GraftSession.tune]] does).
  *
  * The native Catalyst expressions (simhash64, hyperplane_sigs, tokens,
  * shingle-hash and minhash-signature pipelines, cosine) register
  * directly; the rest are Column compositions bridged back to
  * expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name), builder))
    }
}

object GraftExtensions {

  private def c(e: Expression): Column = Bridge.column(e)
  private def e(cl: Column): Expression = Bridge.analyzedExpression(cl)

  private def litInt(ex: Expression, fn: String, pos: Int): Int = ex match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  /** name → SQL builder for every registered function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> ((args: Seq[Expression]) =>
      e(graft.functions.SimHash64Expr.simhash64Native(c(args.head)))),
    "hyperplane_sigs" -> ((args: Seq[Expression]) =>
      e(graft.functions.HyperplaneSigsExpr.hyperplaneSigs(c(args(0)),
        litInt(args(1), "hyperplane_sigs", 1), litInt(args(2), "hyperplane_sigs", 2)))),
    "graft_tokens" -> ((args: Seq[Expression]) => e(tokens(c(args.head)))),
    "shingles" -> ((args: Seq[Expression]) =>
      e(shingles(c(args(0)), litInt(args(1), "shingles", 1)))),
    "shingle_hashes" -> ((args: Seq[Expression]) => e(shingleHashes(c(args.head)))),
    // the fused text→distinct-shingle-hash pipeline (one pass per row)
    "shingle_hashes_text" -> ((args: Seq[Expression]) =>
      e(graft.functions.TextExprs.shingleHashesNative(c(args(0)),
        litInt(args(1), "shingle_hashes_text", 1)))),
    // text → n-gram shingle STRINGS in one pass; the composed
    // shingles(graft_tokens(…)) falls out of codegen and re-tokenizes per
    // shingle — O(tokens²) per row, the sf10 scale bug
    "shingles_text" -> ((args: Seq[Expression]) =>
      e(graft.functions.TextExprs.shinglesTextNative(c(args(0)),
        litInt(args(1), "shingles_text", 1)))),
    "minhash_sig" -> ((args: Seq[Expression]) =>
      e(graft.functions.MinHashExprs.minhashSigNative(c(args(0)),
        litInt(args(1), "minhash_sig", 1)))),
    "lsh_bands" -> ((args: Seq[Expression]) =>
      e(lshBands(c(args(0)), litInt(args(1), "lsh_bands", 1),
        litInt(args(2), "lsh_bands", 2)))),
    "jaccard" -> ((args: Seq[Expression]) => e(jaccard(c(args(0)), c(args(1))))),
    "cosine" -> ((args: Seq[Expression]) => e(cosine(c(args(0)), c(args(1))))),
    "hamming64" -> ((args: Seq[Expression]) => e(hamming64(c(args(0)), c(args(1))))),
    "rolling_hash" -> ((args: Seq[Expression]) => e(rollingHash(c(args.head)))),
    "bpeish_token_count" -> ((args: Seq[Expression]) =>
      e(bpeishTokenCount(c(args.head)))),
    "stable_round" -> ((args: Seq[Expression]) =>
      e(stableRound(c(args(0)), litInt(args(1), "stable_round", 1)))),
    "l2norm" -> ((args: Seq[Expression]) => e(l2norm(c(args.head)))),
    "l2_normalize" -> ((args: Seq[Expression]) => e(l2normalize(c(args.head)))),
    "mean_pool" -> ((args: Seq[Expression]) => e(meanPool(c(args.head)))),
    "chunk_text" -> ((args: Seq[Expression]) =>
      e(graft.ml.TextOps.chunkText(c(args(0)),
        litInt(args(1), "chunk_text", 1), litInt(args(2), "chunk_text", 2)))),
    // corpus-cleaning scalar surface (ml.CleanOps / TextOps)
    "nfc_normalize" -> ((args: Seq[Expression]) =>
      e(graft.functions.NfcNormalizeExpr.nfcNative(c(args.head)))),
    "strip_html" -> ((args: Seq[Expression]) =>
      e(graft.ml.CleanOps.stripHtml(c(args.head)))),
    "redact_pii" -> ((args: Seq[Expression]) =>
      e(graft.ml.TextOps.redactPii(c(args.head)))),
    // aggregate: topk_pairs(sim, id, k) in GROUP BY queries — the
    // bounded-shuffle exact top-k (see functions.TopKPairsAgg). k may be
    // any int expression: a literal, or a plan-computed shortlist bound
    // (constant per group) that saves a driver-side count() job.
    "topk_pairs" -> ((args: Seq[Expression]) =>
      graft.functions.TopKPairsAgg(args(0), args(1), args(2))
        .toAggregateExpression()))

  /** Register everything on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}

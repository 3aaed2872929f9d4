package graft

import graft.functions.{DotProduct, MinHashSignature, MisraGriesAgg, ParseFractionalOdds, SimHashBits}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: makes the engine's native functions
  * available in ANY session via config, no code changes —
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * This is the standard plug-in mechanism for Spark-native libraries
  * (Delta, Iceberg, Sedona use the same hook); cluster operators enable the
  * engine fleet-wide with one conf line.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL views over graft catalogs: Spark 4.1's analyzer never consumes
    // the V2 ViewCatalog API, so the DDL and read path are rewritten at
    // the parser boundary (the Iceberg-extensions pattern) — see
    // [[graft.sources.v2.GraftViewParser]]
    e.injectParser((session, delegate) =>
      new graft.sources.v2.GraftViewParser(session, delegate))
    // custom-operator stack: auto-rewrite window row_number<=k into the
    // bounded-heap TopK operator, and the strategy that plans it
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // transparent materialized-view rewrite: serve bare aggregates over a
    // graft table from a registered FRESH MV of the same shape (exactness
    // gated on watermark == source head; spark.graft.mv.rewrite=false
    // opts out) — see [[graft.sources.v2.GraftMviewRewriteRule]]
    e.injectOptimizerRule(session =>
      new graft.sources.v2.GraftMviewRewriteRule(session))
    e.injectFunction((FunctionIdentifier("parse_odds"),
      info("parse_odds", "parse_odds(str) - fractional-odds mean: 'a/b' -> (a+b)/2"),
      (exprs: Seq[Expression]) => ParseFractionalOdds(exprs.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - MinHash signature array"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_sig"))))
    e.injectFunction((FunctionIdentifier("simhash_bits"),
      info("simhash_bits", "simhash_bits(tokens, bits) - SimHash bit-string"),
      (exprs: Seq[Expression]) => SimHashBits(exprs(0), intArg(exprs(1), "simhash_bits"))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double-array dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    // aggregate functions register the same way: the analyzer wraps a bare
    // AggregateFunction into an AggregateExpression
    e.injectFunction((FunctionIdentifier("mg_topk"),
      info("mg_topk", "mg_topk(col, k) - Misra-Gries heavy-hitter candidates (array<string>)"),
      (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0), intArg(exprs(1), "mg_topk"))))
    // Spark's internal bloom primitives on the SQL surface (OSS Spark only
    // uses them inside InjectRuntimeFilter) — see graft.operators.BloomPrune
    e.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(xxhash64(col), n_items) - bloom-filter sketch of the key set (binary)"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), longArg(exprs(1), "bloom_agg"))))
    e.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain", "might_contain(bloom, xxhash64(col)) - bloom membership probe"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("tokens_in_set"),
      info("tokens_in_set", "tokens_in_set(toks, array('w',...)) - count of tokens in the word set"),
      (exprs: Seq[Expression]) => graft.functions.TokensInSet(exprs(0),
        exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
            items.map {
              case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
              case other => throw new IllegalArgumentException(
                s"tokens_in_set expects string literals, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"tokens_in_set expects a literal array(...), got $other")
        })))
  }
}

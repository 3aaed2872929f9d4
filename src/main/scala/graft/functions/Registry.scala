package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT parse_odds(asia_odds) ...")` works alongside the
  * Column API. Temp functions are session-scoped (the library never mutates
  * global state). */
object Registry {

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

  private def stringArrayArg(e: Expression, fn: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn expects an array of string literals, got element $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal array(...) argument, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "parse_odds" -> (exprs => ParseFractionalOdds(exprs.head)),
    "minhash_sig" -> (exprs => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_sig"))),
    "simhash_bits" -> (exprs => SimHashBits(exprs(0), intArg(exprs(1), "simhash_bits"))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    // bare AggregateFunction: the analyzer wraps it into an AggregateExpression
    "mg_topk" -> (exprs => MisraGriesAgg(exprs(0), intArg(exprs(1), "mg_topk"))),
    "cms_sketch" -> (exprs => CountMinAgg(exprs(0),
      intArg(exprs(1), "cms_sketch"), intArg(exprs(2), "cms_sketch"))),
    "tokens_in_set" -> (exprs => TokensInSet(exprs(0), stringArrayArg(exprs(1), "tokens_in_set"))),
    // Spark's internal bloom-filter primitives, surfaced for manual
    // semi-join pruning (see graft.operators.BloomPrune): OSS Spark only
    // wires them through the InjectRuntimeFilter rule, not the SQL/Column
    // API, so shapes the rule can't see have no way to use them.
    "bloom_agg" -> (exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), longArg(exprs(1), "bloom_agg"))),
    "might_contain" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      // per-function idempotence: re-registering logs a noisy WARN each time
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

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

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent per session: re-registering logs a noisy WARN per function
    if (reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("parse_odds"))) return
    reg.createOrReplaceTempFunction(
      "parse_odds", exprs => ParseFractionalOdds(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSignature(exprs(0), intArg(exprs(1), "minhash_sig")), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash_bits", exprs => SimHashBits(exprs(0), intArg(exprs(1), "simhash_bits")), "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `tokens_in_set(toks, words)` → count of array elements that are in the
  * fixed word set (multiset semantics: every occurrence counts).
  *
  * Replaces the `size(filter(toks, t -> t = 'w1' OR ...))` idiom: HOF
  * lambdas evaluate interpreted (one boxed expression-tree walk per
  * element), while this runs a compiled loop against a pre-built
  * UTF8String HashSet — one static call per row from generated code. The
  * text-analysis quality/lang-id operators call it five times per
  * document, which made it the curation pipeline's hot spot. */
case class TokensInSet(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "tokens_in_set"

  // one immutable set per expression instance, shared by all rows; UTF8String
  // equality/hash are over the bytes, so lookups never materialize java.lang.String
  @transient private lazy val set: java.util.HashSet[UTF8String] = TokensInSet.buildSet(words)

  override def nullSafeEval(v: Any): Any =
    TokensInSet.countIn(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokensInSet.getClass.getName.stripSuffix("$")
    // the word set is compile-time constant for this expression: build it
    // once per codegen'd operator instance
    val setRef = ctx.addReferenceObj("tokensInSet", set, classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.countIn($c, $setRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): TokensInSet =
    copy(child = newChild)
}

object TokensInSet {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def countIn(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def apply(c: Column, words: Seq[String]): Column =
    graftshim.toColumn(TokensInSet(graftshim.toExpression(c), words))
}

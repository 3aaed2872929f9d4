package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Fractional-odds mean as a native Catalyst expression.
  *
  * Semantics (reference: `DAO/ImpalaCon.py:95-99`): a string of the form
  * `"a/b"` means an Asian-handicap quarter line and evaluates to
  * `(a + b) / 2`; e.g. `"0.5/1"` → `0.75`. A plain decimal string parses as
  * itself. Anything unparseable yields NULL (the reference passes the raw
  * string through; a typed engine column can't be string-or-double, so NULL
  * is our documented divergence — the downstream `na.drop` treats both the
  * same way).
  *
  * Implemented with `doGenCode` so the parse stays inside whole-stage
  * codegen (one static Java call, no virtual dispatch, no boxing of the
  * input), which matters when this runs per-cell over odds columns at
  * 100 TB. `ParseFractionalOdds.parse` is the single shared evaluator for
  * both interpreted and codegen paths.
  */
case class ParseFractionalOdds(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_odds"

  override def nullSafeEval(input: Any): Any =
    ParseFractionalOdds.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ParseFractionalOdds.getClass.getName.stripSuffix("$")
    val parsed = ctx.freshName("parsedOdds")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Double $parsed = $cls.parse($c);
         |if ($parsed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseFractionalOdds =
    copy(child = newChild)
}

object ParseFractionalOdds {
  /** Shared evaluator; returns null (boxed) when the string is unparseable.
    * Mirrors the reference exactly: `i.split('/')` then parts [0] and [1] —
    * so `"2019/08/10"` → (2019+8)/2, and a trailing-slash string (one part)
    * fails like Python's IndexError → pass-through (NULL here). */
  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val str = s.toString.trim
    try {
      if (str.indexOf('/') >= 0) {
        val parts = str.split("/")
        val a = java.lang.Double.parseDouble(parts(0).trim)
        val b = java.lang.Double.parseDouble(parts(1).trim)
        java.lang.Double.valueOf((a + b) / 2.0)
      } else {
        java.lang.Double.valueOf(java.lang.Double.parseDouble(str))
      }
    } catch {
      case _: NumberFormatException => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** Column-level entry point: `parse_odds($"asia_odds")`. */
  def apply(c: Column): Column =
    graftshim.toColumn(ParseFractionalOdds(graftshim.toExpression(c)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler similarity — stays inside
  * whole-stage codegen (doGenCode emits a static call, no lambda/UDF
  * serialization, no row boxing), null-intolerant like `levenshtein`.
  *
  * This is the (b)-tier extension point of SURVEY.md §7 ("a native
  * Catalyst Expression beats a Scala UDF"): Spark ships `levenshtein`
  * built-in but has no Jaro-Winkler; the ER scorer's text channel uses
  * both (reference analogue: the ol_1/ol_2 blend, AMPI.scala:298-306).
  * Registered as SQL function `jaro_winkler` by [[GraftExtensions]].
  */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerExpression.jw(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerExpression.jw($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {
  /** Static entry point referenced from generated code. */
  def jw(a: String, b: String): Double = TextSim.jaroWinkler(a, b)
}

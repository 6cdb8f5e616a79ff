package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd MULTISET token-overlap ratio, milli-scaled:
  * floor(1000 · |A ⊓ B| / max(|A|,|B|)) over two array<string> columns.
  *
  * This is the COLUMNAR form of the scoring prescreen
  * (PairScoring.ScoreConfig.prescreenOverlap) so it can run as a plain
  * Filter over the joined candidate rows BEFORE the typed kernel decodes
  * them: rejecting a junk pair here touches only UTF8String bytes inside
  * Tungsten rows, while rejecting it in the kernel first pays the
  * UnsafeRow→Scala decode of five array columns (tens of object
  * allocations per pair — the measured GC hot spot on junk-dominated
  * candidate sets). Semantics match PairScoring.tokenOverlapRatio exactly
  * (ratio ≥ θ  ⟺  milli ≥ ⌈1000θ⌉ for the thresholds in use).
  *
  * Reference analogue: the pre-scoring top-station intersection prefilter,
  * Model.scala:432-441.
  */
case class TokenOverlapExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_overlap_milli"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_overlap_milli requires (array<string>, array<string>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenOverlapExpression.overlapMilli(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TokenOverlapExpression.overlapMilli($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenOverlapExpression {

  /** Static entry point referenced from generated code. Multiset
    * intersection via a count map over the SMALLER side; UTF8String
    * equality is a byte comparison — no String materialization.
    */
  def overlapMilli(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    val (small, ns, large, nl) = if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val counts = new java.util.HashMap[UTF8String, Integer](ns * 2)
    var i = 0
    while (i < ns) {
      if (!small.isNullAt(i)) {
        val t = small.getUTF8String(i)
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    var inter = 0
    var j = 0
    while (j < nl) {
      if (!large.isNullAt(j)) {
        val t = large.getUTF8String(j)
        val c = counts.get(t)
        if (c != null && c > 0) { inter += 1; counts.put(t, c - 1) }
      }
      j += 1
    }
    (1000L * inter / math.max(na, nb)).toInt
  }

  def tokenOverlapMilli(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("token_overlap_milli", a, b)
}

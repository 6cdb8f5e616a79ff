package graft

import graft.functions.JaroWinklerExpression
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `SparkSession.builder().withExtensions(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.jaroWinklerDescriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
    ext.injectFunction(GraftExtensions.tokenOverlapDescriptor)
    ext.injectFunction(GraftExtensions.spanTextTokensDescriptor)
    ext.injectFunction(GraftExtensions.spanMediaTokensDescriptor)
    ext.injectFunction(GraftExtensions.qdotDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.overlapLongDescriptor)
  }
}

object GraftExtensions {
  val jaroWinklerDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerExpression].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "jaro_winkler expects exactly 2 arguments")
      JaroWinklerExpression(children.head, children(1))
    })

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.functions.MinhashSigExpression].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "minhash_sig expects (array<string>, k, seedOffset)")
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"minhash_sig $what must be an int literal, got $other")
      }
      graft.functions.MinhashSigExpression(children.head,
        intLit(children(1), "k"), intLit(children(2), "seedOffset"))
    })

  val spanTextTokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("span_text_tokens"),
    new ExpressionInfo(classOf[graft.functions.SpanTokensExpression].getName, "span_text_tokens"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "span_text_tokens expects exactly 1 argument")
      graft.functions.SpanTokensExpression(children.head, media = false)
    })

  val spanMediaTokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("span_media_tokens"),
    new ExpressionInfo(classOf[graft.functions.SpanTokensExpression].getName, "span_media_tokens"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "span_media_tokens expects exactly 1 argument")
      graft.functions.SpanTokensExpression(children.head, media = true)
    })

  val qdotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("qdot64"),
    new ExpressionInfo(classOf[graft.functions.QDotExpression].getName, "qdot64"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "qdot64 expects exactly 2 arguments")
      graft.functions.QDotExpression(children.head, children(1))
    })

  val tokenOverlapDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_overlap_milli"),
    new ExpressionInfo(classOf[graft.functions.TokenOverlapExpression].getName, "token_overlap_milli"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "token_overlap_milli expects exactly 2 arguments")
      graft.functions.TokenOverlapExpression(children.head, children(1))
    })

  val simhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash16"),
    new ExpressionInfo(classOf[graft.functions.SimhashExpression].getName, "simhash16"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "simhash16 expects exactly 1 argument")
      graft.functions.SimhashExpression(children.head)
    })

  val overlapLongDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("overlap_milli_long"),
    new ExpressionInfo(classOf[graft.functions.OverlapLongExpression].getName, "overlap_milli_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "overlap_milli_long expects exactly 2 arguments")
      graft.functions.OverlapLongExpression(children.head, children(1))
    })

  /** Idempotently register the functions into an EXISTING session (for
    * sessions built without `spark.sql.extensions`); afterwards they are
    * usable from SQL and via `call_function("jaro_winkler", a, b)`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(jaroWinklerDescriptor, minhashSigDescriptor, tokenOverlapDescriptor,
        spanTextTokensDescriptor, spanMediaTokensDescriptor, qdotDescriptor,
        simhashDescriptor, overlapLongDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}

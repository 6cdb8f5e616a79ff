package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass span tokenization over the input_hint span array
  * `array<struct<kind,text,media_ref,offset>>`:
  *
  *  - mode "text": normalized text tokens — spans with kind='text', each
  *    text reduced to its [a-z0-9] bytes with ASCII uppercase folded
  *    (equivalent to `regexp_replace(lower(text), "[^a-z0-9]", "")` for
  *    ASCII input; non-ASCII bytes are stripped by both forms), empties
  *    dropped;
  *  - mode "media": distinct lowercased media_ref tokens of kind='media'
  *    spans (first-occurrence order, like array_distinct).
  *
  * Replaces a filter→transform→regexp_replace→filter column pipeline that
  * ran a regex per SPAN per evaluation — this is the per-doc hot path of
  * both blocking-key derivation and scoring featurization, so it runs
  * twice per doc per pipeline. One byte-scan per span, zero regex, no
  * intermediate arrays.
  */
case class SpanTokensExpression(child: Expression, media: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (media) "span_media_tokens" else "span_text_tokens"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length >= 3
          && s(0).dataType == StringType && s(1).dataType == StringType
          && s(2).dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span tokens require array<struct<kind:string,text:string,media_ref:string,...>>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (media) SpanTokensExpression.mediaTokens(arr)
    else SpanTokensExpression.textTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      if (media) s"graft.functions.SpanTokensExpression.mediaTokens($a)"
      else s"graft.functions.SpanTokensExpression.textTokens($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanTokensExpression {

  private val TEXT = UTF8String.fromString("text")
  private val MEDIA = UTF8String.fromString("media")

  /** [a-z0-9] keep, [A-Z] fold, everything else dropped — one byte scan. */
  private def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var j = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) { out(j) = b; j += 1 }
      else if (b >= 'A' && b <= 'Z') { out(j) = (b + 32).toByte; j += 1 }
      i += 1
    }
    if (j == 0) null else UTF8String.fromBytes(out, 0, j)
  }

  /** Static entry point referenced from generated code. */
  def textTokens(spans: ArrayData): ArrayData = {
    val n = spans.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!spans.isNullAt(i)) {
        val row = spans.getStruct(i, 4)
        if (!row.isNullAt(0) && TEXT.equals(row.getUTF8String(0)) && !row.isNullAt(1)) {
          val t = normalize(row.getUTF8String(1))
          if (t != null) out.add(t)
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Static entry point referenced from generated code. */
  def mediaTokens(spans: ArrayData): ArrayData = {
    val n = spans.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!spans.isNullAt(i)) {
        val row = spans.getStruct(i, 4)
        if (!row.isNullAt(0) && MEDIA.equals(row.getUTF8String(0)) && !row.isNullAt(2)) {
          val m = row.getUTF8String(2)
          if (m.numBytes() > 0) seen.add(m.toLowerCase)
        }
      }
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  def spanTextTokens(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("span_text_tokens", spans)

  def spanMediaTokens(spans: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("span_media_tokens", spans)
}

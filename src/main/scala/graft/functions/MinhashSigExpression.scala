package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a k-component MinHash signature of
  * an array<string> in ONE pass with ZERO intermediate allocation — the
  * (b)-tier custom-Expression route of SURVEY.md §7.
  *
  * Replaces the pure-column formulation
  * `aggregate(sh, [MaxValue]*k, (acc,s) -> zip_with(acc, hashes(s), least))`,
  * which allocates two k-long arrays per array ELEMENT (the fold is
  * correct but bandwidth-hungry — measured as the major allocation source
  * of the blocking stage). Here each shingle is xxhash64'd ONCE; the k
  * independent components come from re-mixing that 64-bit base with the
  * component index (hashLong), so the string bytes are traversed once per
  * shingle instead of k times.
  *
  * Reference analogue: the days-count blocking key of AMPI.scala:212-220,
  * upgraded to LSH per the north rule.
  */
case class MinhashSigExpression(child: Expression, k: Int, seedOffset: Int)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigExpression.sig(input.asInstanceOf[ArrayData], k, seedOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinhashSigExpression.sig($a, $k, $seedOffset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigExpression {

  /** Static entry point referenced from generated code. */
  def sig(arr: ArrayData, k: Int, seedOffset: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(seedOffset + j, base)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API handle: goes through the session FunctionRegistry
    * (registered by GraftExtensions.register) since Catalyst's
    * Column↔Expression bridge is private in Spark 4.
    */
  def minhashSigNative(sh: org.apache.spark.sql.Column, k: Int, seedOffset: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("minhash_sig", sh,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(seedOffset))
}

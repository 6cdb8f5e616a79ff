package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass 16-bit SimHash over an array<string> of tokens — the
  * codegen'd replacement for the 16-nested-`aggregate` columnar fold that
  * walked the token-hash array once PER BIT (the round-2 q22 regression:
  * 0.39 → 2.83 s at sf0.1). Here each token is md5-hashed exactly once and
  * all 16 bit-counters accumulate in that single pass.
  *
  * ORACLE CONTRACT (CorpusExpr header): the per-token hash must equal
  * DuckDB's `('0x' || substr(md5(tok),1,15))::BIGINT` — the first 15 hex
  * nibbles of the md5 digest read as a 60-bit big-endian value, i.e.
  * (first 8 digest bytes as unsigned BE long) >>> 4. xxhash64 would be
  * faster but is Spark-only; simhash is oracle-facing, so md5 it is.
  *
  * Semantics (bit i of the result, i in 0..15):
  *   v_i = Σ_tokens (bit_i(h60(tok)) == 1 ? +1 : −1);  set iff v_i > 0.
  * Empty input → 0 (callers filter zero-token docs; see q22).
  */
case class SimhashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash16 requires array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimhashExpression.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimhashExpression.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashExpression {

  // MessageDigest is stateful; one instance per task thread
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(bytes) as a 60-bit long — bit-identical to
    * CorpusExpr.tokHash60 / DuckDB's ('0x'||substr(md5(t),1,15))::BIGINT.
    */
  def tokHash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Static entry point referenced from generated code. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val v = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokHash60(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 16) {
          if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash16Native(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("simhash16", toks)
}

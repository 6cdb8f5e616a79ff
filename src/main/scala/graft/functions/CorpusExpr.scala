package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression building blocks for the training-data-pipeline
  * operators (dedup, similarity search, text analysis) — pure Catalyst
  * expressions (codegen'd, no UDFs), each with a DuckDB-expressible twin so
  * the driver's oracle can verify them bit-for-bit.
  *
  * Cross-engine determinism rules used throughout:
  *  - shared hash = first 15 hex chars of md5 → 60-bit non-negative long
  *    (md5 is identical everywhere; xxhash64 is Spark-only and reserved for
  *    engine-internal keys that never face an oracle);
  *  - similarity scores are ratios of exact integer counts, emitted as
  *    `milli`-scaled BIGINTs via floor(1000*a/b) — IEEE division of exact
  *    ints then floor is bit-stable across engines;
  *  - no raw double SUMs in any oracle-facing output (summation order).
  */
object CorpusExpr {

  /** Whitespace tokens of a (already lowercase) text column. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** 60-bit md5-based token hash: conv(substr(md5(t),1,15),16,10) as long.
    * DuckDB twin: ('0x' || substr(md5(t),1,15))::BIGINT.
    */
  def tokHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Seeded variant for independent minhash families. */
  def tokHash60(t: Column, seed: Int): Column =
    tokHash60(concat(lit(s"$seed:"), t))

  /** Distinct word k-shingles (space-joined). Docs shorter than k tokens
    * yield the whole token sequence as one shingle.
    */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(
      when(size(toks) <= k, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(1), size(toks) - lit(k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k))))))

  /** Exact milli-scaled Jaccard of two (distinct-element) arrays:
    * floor(1000 * |a∩b| / |a∪b|). Integer counts → bit-stable.
    */
  def jaccardMilli(a: Column, b: Column): Column =
    floor(lit(1000.0) * size(array_intersect(a, b)) /
      size(array_union(a, b))).cast("long")

  /** 16-bit SimHash over md5 token hashes — the pure-column formulation,
    * kept as the executable equivalence SPEC of the native one-pass
    * SimhashExpression (CorpusExprSpec asserts native == columnar on
    * perturbed corpora). NOT for the hot path: this fold walks the token
    * hashes once PER BIT (16 nested `aggregate` traversals). For bit i,
    * v_i = Σ_tokens (bit_i(h(tok)) ? 1 : -1); simhash bit i set iff v_i>0.
    */
  def simhash16(toks: Column): Column = {
    val hashes = transform(toks, t => tokHash60(t))
    val bits = transform(sequence(lit(0L), lit(15L)), i => {
      val v = aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L)))
      when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, x) => acc + x)
  }

  /** Rolling polynomial fingerprint over the token hash sequence:
    * h ← (h*1000003 + tokHash60(t)) mod 1e9+7, order-sensitive — the
    * document-fingerprint analogue of a rolling content hash.
    * Max intermediate: (1e9+7)*1000003 + 2^60 < 2^63 — no overflow.
    */
  def fingerprint(toks: Column): Column =
    aggregate(transform(toks, t => tokHash60(t)), lit(0L),
      (h, x) => pmod(h * lit(1000003L) + x, lit(1000000007L)))

  /** Quantize a float vector to micro-scaled longs: round(x*1e6).
    * Never lands on an exact .5 (see Corpus.scala header), so HALF_UP vs
    * HALF_EVEN across engines cannot diverge.
    */
  def quantizeVec(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors — native
    * expression (QDotExpression): the zip_with fold allocates the zipped
    * array per pair, which dominates all-pairs cosine scans. Callers must
    * have GraftExtensions registered (the embedding queries do).
    */
  def qdot(a: Column, b: Column): Column =
    graft.functions.QDotExpression.qdot64(a, b)

  /** Exact integer squared norm of a quantized vector. */
  def qnorm2(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Cosine from exact integer dot and squared norms — every step
    * (int→double cast, sqrt, multiply, divide) is IEEE-correctly-rounded,
    * hence bit-identical across engines.
    */
  def qcos(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))
}

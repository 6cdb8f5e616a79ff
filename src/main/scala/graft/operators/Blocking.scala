package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Blocking (candidate generation) as pure Catalyst column expressions —
  * fully codegen'd, no UDFs, so the block-key derivation stays inside
  * whole-stage codegen and pushes through the parquet scan.
  *
  * Two key families (north rule: "LSH/sorted-neighborhood blocking via
  * Catalyst expressions on span-derived keys"); reference analogue: the
  * 1-D active-days blocking of AMPI.scala:212-220 + the top-station
  * intersection prefilter of Model.scala:432-441.
  */
object Blocking {

  /** Normalized text tokens of a doc: filter spans to kind='text',
    * lowercase, strip non-alphanumerics, drop empties.
    */
  def textTokens(spans: Column): Column =
    filter(
      transform(
        filter(spans, s => s.getField("kind") === "text"),
        s => regexp_replace(lower(s.getField("text")), "[^a-z0-9]", "")),
      t => length(t) > 0)

  /** Normalized media_ref tokens (kind='media'), deduplicated. */
  def mediaTokens(spans: Column): Column =
    array_distinct(
      filter(
        transform(
          filter(spans, s => s.getField("kind") === "media"),
          s => lower(s.getField("media_ref"))),
        t => length(t) > 0))

  /** Sorted-neighborhood key: prefix of the concatenation of the first
    * `headTokens` normalized text tokens. Docs of the same entity share it
    * unless a typo hits the very head of the name.
    */
  def snKey(tokens: Column, headTokens: Int = 2, prefixLen: Int = 10): Column =
    concat(lit("sn:"), substring(concat_ws("", slice(tokens, 1, headTokens)), 1, prefixLen))

  /** Token k-shingles joined by space:
    * transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(tokens,i,k))).
    * Short sequences yield one whole-sequence shingle.
    */
  def shingles(tokens: Column, k: Int = 2): Column =
    when(size(tokens) <= k, array(concat_ws(" ", tokens)))
      .otherwise(
        transform(
          sequence(lit(1), size(tokens) - lit(k - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(k)))))

  /** MinHash signature component i: min over shingles of xxhash64(s, i).
    * xxhash64 with the band-row index as an extra column gives k
    * independent hash families without leaving codegen.
    */
  private def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, s => xxhash64(s, lit(i))))

  /** LSH band keys: numBands bands × rowsPerBand minhashes per band;
    * band key = xxhash64 of the band's minhashes + band index, rendered
    * as a compact string key.
    */
  def minhashBandKeys(tokens: Column, numBands: Int = 16, rowsPerBand: Int = 2,
                      shingleK: Int = 2, family: String = "mh", seedOffset: Int = 0): Column = {
    val sh = shingles(tokens, shingleK)
    val bands = (0 until numBands).map { b =>
      val rows = (0 until rowsPerBand).map(r => minhash(sh, seedOffset + b * rowsPerBand + r))
      concat(lit(s"$family$b:"), conv(xxhash64(lit(b) +: rows: _*).cast("string"), 10, 16))
    }
    // empty token list => no LSH keys (avoid a giant "empty" block)
    when(size(tokens) === 0, array().cast("array<string>")).otherwise(array(bands: _*))
  }

  /** All blocking keys for a doc as one array column: sorted-neighborhood
    * key + shingle-minhash bands (precision family) + token-set-minhash
    * bands (recall family, robust to heavy per-token noise). The two LSH
    * families use disjoint hash-seed ranges and key prefixes.
    */
  def blockKeys(spans: Column, numBands: Int = 16, rowsPerBand: Int = 2): Column = {
    val toks = textTokens(spans)
    array_union(
      array_union(
        when(size(toks) === 0, array().cast("array<string>"))
          .otherwise(array(snKey(toks))),
        minhashBandKeys(toks, numBands, rowsPerBand, shingleK = 2, family = "mh")),
      minhashBandKeys(toks, math.max(6, (numBands * 3) / 4), rowsPerBand,
        shingleK = 1, family = "tk", seedOffset = 1000))
  }

  /** Blocking stage: docs(doc_id, spans) → (block_key, doc_id), with hot
    * keys above `maxBlockSize` dropped (reference skew guard:
    * MacCompression.scala:25 "filter oversized keys to avoid skew").
    * Returns (blockingOutput, counters).
    */
  def block(docs: DataFrame, numBands: Int = 16, rowsPerBand: Int = 2,
            maxBlockSize: Int = 1000): (DataFrame, Map[String, Long]) = {
    val exploded = docs
      .select(col("doc_id"), explode(blockKeys(col("spans"), numBands, rowsPerBand)).as("block_key"))
      .select(col("block_key"), col("doc_id"))
    // key-frequency stats → cap. The windowed count shuffles once on
    // block_key; the same shuffle partitioning is reused by the pair join.
    val withCnt = exploded
      .withColumn("block_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("block_key"))))
    val kept = withCnt.where(col("block_size") <= maxBlockSize).drop("block_size")
    val capped = withCnt.where(col("block_size") > maxBlockSize)
      .select(countDistinct(col("block_key")).as("k"))
      .collect()(0).getLong(0)
    (kept, Map("capped_block_keys" -> capped))
  }

  /** Candidate pairs: self equi-join of the blocking output on block_key
    * with doc_id_a < doc_id_b, deduplicated across key families by keeping
    * the MIN block_key per pair (deterministic representative).
    * This is a shuffle hash/sort-merge join on the block key — the
    * distributed replacement for the reference's driver-side
    * collect().toMap + broadcast of the entire AP dataset (AMPI.scala:209),
    * its scalability ceiling.
    */
  def candidatePairs(blocking: DataFrame): DataFrame = {
    val a = blocking.select(col("block_key"), col("doc_id").as("doc_id_a"))
    val b = blocking.select(col("block_key"), col("doc_id").as("doc_id_b"))
    a.join(b, "block_key")
      .where(col("doc_id_a") < col("doc_id_b"))
      .groupBy(col("doc_id_a"), col("doc_id_b"))
      .agg(min(col("block_key")).as("block_key"))
  }
}

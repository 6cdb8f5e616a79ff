package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed Aggregator (custom aggregation function tier of
  * SURVEY.md §2.10) — the scalable replacement for
  * `row_number().over(Window.partitionBy(groupCol))` when the group count is
  * small: the window funnels the WHOLE input into #groups partitions (a
  * driver-adjacent choke point at scale), while an Aggregator gets map-side
  * PARTIAL aggregation — each input partition reduces to at most k rows per
  * group before the shuffle, so the exchange carries O(#groups · k ·
  * #partitions) rows no matter how large the input is.
  *
  * Order: score DESC, id ASC (deterministic under ties and partitioning —
  * merge of partial top-k lists under a total order is associative and
  * commutative). Output: ids in rank order; rank = position + 1.
  *
  * Reference analogue: top-k per group, Model.scala:536-539 /
  * AMPI_1.scala:419 (`groupByKey.mapValues(_.sortBy(_._2).takeRight(k))`).
  */
case class TopKBuf(score: Array[Double], id: Array[Long])

class TopKAggregator(k: Int) extends Aggregator[(Long, Double), TopKBuf, Seq[Long]] {
  require(k > 0)

  /** strict total order: (score desc, id asc) */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  override def reduce(b: TopKBuf, in: (Long, Double)): TopKBuf =
    insert(b, in._2, in._1)

  private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
    val n = b.id.length
    if (n == k && !beats(s, id, b.score(n - 1), b.id(n - 1))) return b
    // position of the new element in the sorted (desc) arrays
    var pos = 0
    while (pos < n && beats(b.score(pos), b.id(pos), s, id)) pos += 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(b.score, 0, ns, 0, pos)
    System.arraycopy(b.id, 0, ni, 0, pos)
    ns(pos) = s; ni(pos) = id
    val tail = m - pos - 1
    if (tail > 0) {
      System.arraycopy(b.score, pos, ns, pos + 1, tail)
      System.arraycopy(b.id, pos, ni, pos + 1, tail)
    }
    TopKBuf(ns, ni)
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var out = a
    var i = 0
    while (i < b.id.length) { out = insert(out, b.score(i), b.id(i)); i += 1 }
    out
  }

  override def finish(b: TopKBuf): Seq[Long] = b.id.toSeq

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object TopKAggregator {
  /** Column handle: `topK(5)(idCol, scoreCol)` → array<bigint> of the top-k
    * ids ordered by (score desc, id asc).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (id, score) => fn(id, score)
  }
}

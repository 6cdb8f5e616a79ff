package graft.functions

import graft.SparkSpec
import graft.functions.CorpusExpr._
import graft.queries.Corpus
import org.apache.spark.sql.functions._

/** Unit + property coverage for the corpus expressions, plus an LSH-recall
  * gate: the MinHash-LSH dedup must find EXACTLY the brute-force near-dup
  * pairs on the test corpus (recall 1 at the published threshold).
  */
class CorpusExprSpec extends SparkSpec {

  import spark.implicits._

  test("jaccardMilli: exact integer milli-Jaccard") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(jaccardMilli(col("x"), col("y")).as("j"))
    assert(df.head().getLong(0) == 500L) // 2/4
  }

  test("shingles: k=2 word shingles, short docs collapse to one shingle") {
    val df = Seq(Tuple1("a b c d"), Tuple1("a b"), Tuple1("x"))
      .toDF("t").select(shingles(tokens(col("t")), 2).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0).toSet)
    assert(rows(0) == Set("a b", "b c", "c d"))
    assert(rows(1) == Set("a b"))
    assert(rows(2) == Set("x"))
  }

  test("simhash16 is within 16 bits and identical docs agree") {
    val df = Seq(Tuple1("the quick brown fox"), Tuple1("the quick brown fox"), Tuple1("zzz yyy xxx"))
      .toDF("t").select(simhash16(tokens(col("t"))).as("s"))
    val s = df.collect().map(_.getLong(0))
    assert(s.forall(v => v >= 0 && v < (1L << 16)))
    assert(s(0) == s(1))
    assert(s(0) != s(2))
  }

  test("native one-pass simhash == columnar 16-pass spec on perturbed corpus") {
    graft.GraftExtensions.register(spark)
    // deterministic pseudo-random docs incl. duplicates + empty-ish shapes
    val docsSeq = (0 until 200).map { i =>
      val n = 1 + (i * 7) % 23
      (0 until n).map(j => s"w${(i * 31 + j * j) % 50}").mkString(" ")
    } :+ "solo"
    val df = docsSeq.map(Tuple1(_)).toDF("t")
      .select(col("t"),
        simhash16(tokens(col("t"))).as("columnar"),
        graft.functions.SimhashExpression.simhash16Native(tokens(col("t"))).as("native"))
    assert(df.where(col("columnar") =!= col("native")).isEmpty)
  }

  test("overlap_milli_long == token_overlap_milli under hashing") {
    graft.GraftExtensions.register(spark)
    val pairs = (0 until 100).map { i =>
      val a = (0 until 1 + (i % 17)).map(j => s"t${(i + j * j) % 12}")
      val b = (0 until 1 + ((i * 5) % 13)).map(j => s"t${(i * 3 + j) % 12}")
      (a, b)
    }
    val df = pairs.toDF("a", "b")
      .select(
        graft.functions.TokenOverlapExpression.tokenOverlapMilli(col("a"), col("b")).as("s"),
        graft.functions.OverlapLongExpression.overlapMilliLong(
          transform(col("a"), t => xxhash64(t)),
          transform(col("b"), t => xxhash64(t))).as("l"))
    assert(df.where(col("s") =!= col("l")).isEmpty)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(Tuple1("a b c"), Tuple1("c b a"), Tuple1("a b c"))
      .toDF("t").select(fingerprint(tokens(col("t"))).as("f"))
    val f = df.collect().map(_.getLong(0))
    assert(f(0) == f(2))
    assert(f(0) != f(1))
    assert(f.forall(v => v >= 0 && v < 1000000007L))
  }

  test("quantized cosine of identical vectors is 1.0") {
    val df = Seq(Tuple1(Seq(0.1f, 0.2f, -0.3f))).toDF("v")
      .select(quantizeVec(col("v")).as("q"))
      .select(qcos(qdot(col("q"), col("q")), qnorm2(col("q")), qnorm2(col("q"))).as("c"))
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }

  test("MinHash-LSH dedup recall = 1 vs brute force at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val lsh = Corpus.q20_dedup_minhash_lsh(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), shingles(tokens(col("text")), 2).as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    val brute = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .where(jaccardMilli(col("sha"), col("shb")) >= 500)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "test corpus should contain planted near-dups")
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }
}

package graft.operators

import graft.SparkSpec
import graft.model.{Doc, Span}
import graft.synth.{DocGen, GenConfig}
import org.apache.spark.sql.functions._

class BlockingSpec extends SparkSpec {

  test("native span tokenizers match the columnar formulation exactly") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // generated corpus + handcrafted edge cases (case folding, punctuation,
    // empty normalization results, duplicate media refs, missing kinds)
    val edge = Seq(
      Doc("x1", Seq(Span("text", "HeLLo, W0rld!", "", 1), Span("text", "---", "", 2),
        Span("media", "", "DEV_A", 3), Span("media", "", "dev_a", 4),
        Span("media", "", "", 5), Span("other", "zz", "m", 6))),
      Doc("x2", Seq.empty),
      Doc("x3", Seq(Span("media", "", "only-media", 1))))
    val docs = DocGen.docs(spark, GenConfig(numEntities = 50, docsPerEntity = 3)).toDF()
      .unionByName(edge.toDF())
    val cmp = docs.select(
      Blocking.textTokens(col("spans")).as("t_native"),
      Blocking.textTokensColumnar(col("spans")).as("t_col"),
      Blocking.mediaTokens(col("spans")).as("m_native"),
      Blocking.mediaTokensColumnar(col("spans")).as("m_col"))
    val bad = cmp.where(col("t_native") =!= col("t_col") || col("m_native") =!= col("m_col"))
    assert(bad.count() == 0, bad.take(3).mkString("\n"))
  }
}

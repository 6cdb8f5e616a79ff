package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

/** The native Catalyst JW expression: SQL registration, codegen path,
  * null behavior, agreement with the pure-Scala kernel.
  */
class JaroWinklerExprSpec extends SparkSpec {

  import spark.implicits._

  test("jaro_winkler registers and evaluates through codegen") {
    GraftExtensions.register(spark)
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("abc", "abc"), ("", "xyz"))
      .toDF("a", "b")
      .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
    val got = df.select("jw").as[Double].collect()
    val want = Seq(
      TextSim.jaroWinkler("martha", "marhta"),
      TextSim.jaroWinkler("dwayne", "duane"),
      1.0,
      0.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$g != $w") }
  }

  test("jaro_winkler is usable from SQL text") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(r > 0.95 && r <= 1.0)
  }

  test("null inputs yield null") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT jaro_winkler(NULL, 'x') AS jw").head()
    assert(r.isNullAt(0))
  }
}

package graft.pipeline

import graft.SparkSpec
import graft.synth.{DocGen, GenConfig}
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** The insert increment's O(delta) claim, measured at the shuffle layer:
  * applying the SAME delta to a 2× larger committed corpus must shuffle
  * roughly the SAME bytes (committed relations are only scanned and joined
  * against broadcast delta-side tables — never shuffled), and far fewer
  * bytes than the batch run that produced the base. A hidden O(committed)
  * shuffle would double the increment's bytes when the base doubles.
  */
class IncrShuffleSpec extends SparkSpec {

  private def shuffledBytes[T](f: => T): (T, Long) = {
    val bytes = new AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      // the listener bus is async: require the tally stable across THREE
      // consecutive 500 ms reads (a single-interval check can end early on
      // a bus stall — GC pause or slow drain — and undercount)
      var stable = 0
      var prev = -1L
      while (stable < 3) {
        Thread.sleep(500)
        val now = bytes.get()
        if (now == prev) stable += 1 else { stable = 0; prev = now }
      }
      (r, bytes.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("insert increment shuffles O(delta) bytes: same delta on 2x corpus ~ same bytes") {
    import spark.implicits._
    val cfg1 = GenConfig(numEntities = 1500, docsPerEntity = 3, seed = 42L)
    val cfg2 = GenConfig(numEntities = 3000, docsPerEntity = 3, seed = 42L)
    val add = GenConfig(numEntities = 150, docsPerEntity = 3, seed = 777L)
    val docs1 = DocGen.docs(spark, cfg1).toDF().cache()
    val docs2 = DocGen.docs(spark, cfg2).toDF().cache()
    val delta = DocGen.docs(spark, add).map(d => d.copy(doc_id = "n" + d.doc_id)).toDF().cache()
    Seq(docs1, docs2, delta).foreach(_.count())

    val dir1 = Files.createTempDirectory("graft-shfl1").toString
    val dir2 = Files.createTempDirectory("graft-shfl2").toString
    val (_, bBase2) = shuffledBytes {
      EntityResolution.run(spark, docs1, runDir = Some(dir1), runId = "b1").release()
      EntityResolution.run(spark, docs2, runDir = Some(dir2), runId = "b2").release()
    }
    val (_, bIncr1) = shuffledBytes(
      EntityResolution.addDocuments(spark, delta, dir1, runId = "i1").release())
    val (_, bIncr2) = shuffledBytes(
      EntityResolution.addDocuments(spark, delta, dir2, runId = "i2").release())

    info(f"batch(1x+2x)=$bBase2%,d B  incr@1x=$bIncr1%,d B  incr@2x=$bIncr2%,d B  " +
      f"ratio=${bIncr2.toDouble / bIncr1}%.2f")
    // the O(delta) gate: doubling the committed corpus must NOT double the
    // increment's shuffle traffic (slack for block-key census variation)
    assert(bIncr2 < bIncr1 * 1.5,
      f"increment shuffle grew with the COMMITTED corpus: $bIncr1%,d -> $bIncr2%,d B")
    // and an increment is far lighter than the batch runs it extends
    assert(bIncr1 + bIncr2 < bBase2 / 2,
      f"increments shuffled ${bIncr1 + bIncr2}%,d B vs $bBase2%,d B for the batch runs")
    Seq(docs1, docs2, delta).foreach(_.unpersist())
  }
}

package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamExtract
import java.nio.file.Files

/** Streaming parity: the streamed extraction must produce exactly the
  * batch pipeline's rows; windowed metrics and stateful session
  * summaries must reconcile with batch aggregation. */
class StreamingSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-stream").toString
    graft.pipeline.Pipeline.synthTurns(spark, 120L, 4)
      .write.mode("overwrite").parquet(d)
    d
  }

  test("streamed extraction == batch extraction") {
    import spark.implicits._
    val streamed = StreamExtract.runOnce(
      StreamExtract.extractStream(StreamExtract.readTurnStream(spark, dir, dir)).toDF(),
      "stream_extract", OutputMode.Append())
    val batch = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(dir).as[graft.core.TurnInput]).toDF()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("watermarked windowed quality metrics reconcile with batch totals") {
    import spark.implicits._
    val win = StreamExtract.runOnce(
      StreamExtract.qualityByWindow(StreamExtract.readTurnStream(spark, dir, dir)),
      "stream_quality", OutputMode.Append())
    // append-mode windows only emit once the watermark passes; totals
    // of emitted windows must be a subset-sum of batch truth
    val batch = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(dir).as[graft.core.TurnInput])
    val batchN = batch.count()
    val winN = win.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(winN <= batchN && winN >= 0)
  }

  test("mapGroupsWithState conversation summaries match batch group-by") {
    import spark.implicits._
    val st = StreamExtract.runOnce(
      StreamExtract.conversationState(StreamExtract.readTurnStream(spark, dir, dir)).toDF(),
      "stream_state", OutputMode.Update())
    // last update per conv == batch aggregate
    val latest = st.groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.max("nTurns").as("nTurns"),
        org.apache.spark.sql.functions.max("sumScore").as("sumScore"))
    val batch = graft.pipeline.Pipeline.extractTurns(
        spark.read.parquet(dir).as[graft.core.TurnInput])
      .groupByKey(_.conv_id)
      .mapGroups((k, it) => {
        var n = 0L; var s = 0L
        it.foreach { e => n += 1; s += e.total_score }
        (k, n, s)
      }).toDF("conv_id", "nTurns", "sumScore")
    assert(latest.exceptAll(batch).isEmpty && batch.exceptAll(latest).isEmpty)
  }
}

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

  private lazy val dupDir: String = {
    val d = Files.createTempDirectory("graft-stream-dup").toString
    val once = graft.pipeline.Pipeline.synthTurns(spark, 60L, 2)
    once.union(once).write.mode("overwrite").parquet(d)
    d
  }

  test("dropDuplicatesWithinWatermark removes the duplicated rows") {
    import spark.implicits._
    val deduped = StreamExtract.runOnce(
      StreamExtract.dedupedTurns(StreamExtract.readTurnStream(spark, dupDir, dupDir)).toDF(),
      "stream_dedup", OutputMode.Append())
    val batchDistinct = spark.read.parquet(dupDir)
      .select("conv_id", "turn_idx").distinct().count()
    assert(spark.read.parquet(dupDir).count() == 2 * batchDistinct)
    assert(deduped.count() == batchDistinct)
  }

  test("flatMapGroupsWithState error alerts reconcile exactly with batch truth") {
    import spark.implicits._
    val alerts = StreamExtract.runOnce(
      StreamExtract.errorAlerts(StreamExtract.readTurnStream(spark, dir, dir), 2L).toDF(),
      "stream_alerts", OutputMode.Append())
    val batch = graft.pipeline.Pipeline.extractTurns(
        spark.read.parquet(dir).as[graft.core.TurnInput])
      .filter(_.errors.isDefined)
      .groupByKey(_.conv_id).count()
      .map { case (conv, n) => (conv, n / 2L) } // crossings of multiples of 2
      .filter(_._2 > 0L).toDF("conv_id", "n_alerts")
    val got = alerts.groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
        .as("n_alerts"))
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("session_window streaming sessions are a subset of batch sessions") {
    import spark.implicits._
    val streamed = StreamExtract.runOnce(
      StreamExtract.sessionWindows(StreamExtract.readTurnStream(spark, dir, dir)),
      "stream_sessions", OutputMode.Append())
    // batch truth: identical session_window aggregation over the same data
    val batch = StreamExtract.sessionWindows(
      spark.read.parquet(dir).as[graft.core.TurnInput])
    // append mode only finalizes sessions the watermark has passed
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty)
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

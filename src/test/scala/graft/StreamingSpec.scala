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

  /** Copy every parquet part-file of `from` into `to` (simulates new
    * files arriving in a watched stream source directory). */
  private def arriveFiles(from: String, to: String): Unit = {
    val dst = new java.io.File(to); dst.mkdirs()
    for (f <- new java.io.File(from).listFiles if f.getName.endsWith(".parquet"))
      Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
  }

  test("checkpointed file-sink extraction restarts with no duplicates or losses") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-restart").toString
    val (srcDir, sinkDir, ckDir) = (s"$root/src", s"$root/sink", s"$root/ck")
    val all = graft.pipeline.Pipeline.synthTurns(spark, 80L, 4)
    all.filter(_.turn_idx < 2).write.parquet(s"$root/chunk1")
    all.filter(_.turn_idx >= 2).write.parquet(s"$root/chunk2")
    def runPass(): Unit = {
      val q = StreamExtract.extractStream(
          StreamExtract.readTurnStream(spark, srcDir, s"$root/chunk1"))
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable(); q.stop()
    }
    arriveFiles(s"$root/chunk1", srcDir)
    runPass()                       // pass 1: chunk1 only
    val afterFirst = spark.read.parquet(sinkDir).count()
    arriveFiles(s"$root/chunk2", srcDir)
    runPass()                       // pass 2: restart from checkpoint, chunk2 arrives
    runPass()                       // pass 3: restart again with NO new data
    val sink = spark.read.parquet(sinkDir).toDF()
    val batch = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(srcDir).as[graft.core.TurnInput]).toDF()
    assert(afterFirst > 0 && afterFirst < batch.count(),
      "first pass should commit a strict subset")
    // exactly-once across restarts: the sink equals batch truth as a
    // MULTISET — a re-emitted batch (duplicate) or a dropped file
    // (loss) both fail this
    assert(sink.count() == batch.count(), s"${sink.count()} vs ${batch.count()}")
    assert(sink.exceptAll(batch).isEmpty && batch.exceptAll(sink).isEmpty)
  }

  test("flatMapGroupsWithState state survives restart (alert counts continue, not reset)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-restart-state").toString
    val (srcDir, sinkDir, ckDir) = (s"$root/src", s"$root/sink", s"$root/ck")
    val all = graft.pipeline.Pipeline.synthTurns(spark, 120L, 4)
    all.filter(_.turn_idx < 2).write.parquet(s"$root/chunk1")
    all.filter(_.turn_idx >= 2).write.parquet(s"$root/chunk2")
    def runPass(): Unit = {
      // wide watermark delay: the chunk split is by turn_idx, so chunk 2
      // carries event times from the whole corpus span; the test is
      // state recovery, not late-row policy (covered elsewhere)
      val q = StreamExtract.errorAlerts(
          StreamExtract.readTurnStream(spark, srcDir, s"$root/chunk1"), 2L,
          watermarkDelay = "3650 days")
        .toDF()
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable(); q.stop()
    }
    arriveFiles(s"$root/chunk1", srcDir)
    runPass()
    arriveFiles(s"$root/chunk2", srcDir)
    runPass()
    // batch truth: a conversation with n total error turns crosses a
    // multiple of 2 exactly n/2 times. If restart had reset the
    // per-conversation state, conversations whose errors straddle the
    // two chunks would alert at the wrong cumulative counts.
    val batch = graft.pipeline.Pipeline.extractTurns(
        spark.read.parquet(srcDir).as[graft.core.TurnInput])
      .filter(_.errors.isDefined)
      .groupByKey(_.conv_id).count()
      .map { case (conv, n) => (conv, n / 2L) }
      .filter(_._2 > 0L).toDF("conv_id", "n_alerts")
    val got = spark.read.parquet(sinkDir).groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_alerts"))
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // and the alerts fired at the RIGHT cumulative counts: the set of
    // (conv, nErrors) alert points is every even count up to the total
    val points = spark.read.parquet(sinkDir).as[(String, Long)].collect().toSet
    val wantPoints = batch.as[(String, Long)].collect()
      .flatMap { case (c, k) => (1L to k).map(i => (c, 2L * i)) }.toSet
    assert(points == wantPoints, "alerts fired at wrong cumulative error counts")
  }

  test("stream-stream interval join (opener attribution) equals the batch join") {
    import spark.implicits._
    val streamed = StreamExtract.runOnce(
      StreamExtract.openerJoin(StreamExtract.readTurnStream(spark, dir, dir),
        horizon = "30 days"),
      "stream_join", OutputMode.Append())
    val t = spark.read.parquet(dir)
    val batch = t.as("r").filter($"r.turn_idx" > 0)
      .join(t.as("o").filter($"o.turn_idx" === 0),
        $"r.conv_id" === $"o.conv_id" &&
          $"r.ts" >= $"o.ts" &&
          $"r.ts" <= $"o.ts" + org.apache.spark.sql.functions.expr("interval 30 days"))
      .select($"r.conv_id", $"r.turn_idx",
        (org.apache.spark.sql.functions.unix_timestamp($"r.ts") -
          org.apache.spark.sql.functions.unix_timestamp($"o.ts")).as("delta_s"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("LEFT OUTER interval join: null tail emits only on watermark expiry, equals batch truth") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, unix_timestamp}
    // own copy of the corpus — the flush sentinel must not pollute `dir`
    val d = Files.createTempDirectory("graft-stream-outer").toString
    graft.pipeline.Pipeline.synthTurns(spark, 120L, 4)
      .write.mode("overwrite").parquet(d)
    val maxTs = spark.read.parquet(d)
      .agg(org.apache.spark.sql.functions.max(col("ts"))).head().getTimestamp(0)
    val day = 24L * 3600 * 1000
    def sentinel(tag: String, plusMs: Long) = Seq(
      graft.core.TurnInput(s"~s-$tag", 0, "user", "", "",
        new java.sql.Timestamp(maxTs.getTime + plusMs)),
      graft.core.TurnInput(s"~s-$tag", 1, "user", "", "",
        new java.sql.Timestamp(maxTs.getTime + plusMs)))
    // phase 0 only (no sentinel): the corpus's own watermark (max ts −
    // delay) already expires EARLY openers' windows — their null rows
    // emit — but openers whose 30-day window reaches past the corpus
    // max cannot have emitted yet. Capture the pre-flush null set.
    val preFlush = StreamExtract.runOnce(
      StreamExtract.openerJoinOuter(StreamExtract.readTurnStream(spark, d, d),
        horizon = "30 days"),
      "stream_outer_pre", OutputMode.Append())
    val preNullConvs = preFlush.filter(col("turn_idx").isNull)
      .select(col("conv_id")).as[String].collect().toSet
    // full phased drive: sentinel appends push the watermark past every
    // real window → the null tail flushes
    val streamed = StreamExtract.runPhased(
      StreamExtract.openerJoinOuter(StreamExtract.readTurnStream(spark, d, d),
        horizon = "30 days"),
      "stream_outer", OutputMode.Append())(
      () => spark.createDataset(sentinel("a", 31 * day)).coalesce(1)
        .write.mode("append").parquet(d),
      () => spark.createDataset(sentinel("b", 33 * day)).coalesce(1)
        .write.mode("append").parquet(d))
      .filter(!col("conv_id").startsWith("~s-"))
    val t = spark.read.parquet(d).filter(!col("conv_id").startsWith("~s-"))
    val batch = t.as("o").filter($"o.turn_idx" === 0)
      .join(t.as("r").filter($"r.turn_idx" > 0),
        $"r.conv_id" === $"o.conv_id" &&
          $"r.ts" >= $"o.ts" && $"r.ts" <= $"o.ts" + expr("interval 30 days"),
        "left_outer")
      .select($"o.conv_id", $"r.turn_idx",
        (unix_timestamp($"r.ts") - unix_timestamp($"o.ts")).as("delta_s"))
    assert(streamed.filter(col("turn_idx").isNull).count() > 0,
      "no null-extended rows — the outer half never fired")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // expiry semantics: every pre-flush null is a true batch null (no
    // early/false emission), and the sentinel flush surfaced MORE of
    // the tail — the late-window openers only a watermark advance past
    // the corpus max can expire
    val batchNullConvs = batch.filter(col("turn_idx").isNull)
      .select($"conv_id").as[String].collect().toSet
    assert(preNullConvs.subsetOf(batchNullConvs),
      s"pre-flush emitted false nulls: ${(preNullConvs -- batchNullConvs).take(5)}")
    assert(preNullConvs.size < batchNullConvs.size,
      s"flush surfaced nothing: pre=${preNullConvs.size} batch=${batchNullConvs.size}")
  }

  test("stream-stream outer-join state survives restart (buffered openers match after recovery)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, unix_timestamp}
    val root = Files.createTempDirectory("graft-restart-join").toString
    val (srcDir, sinkDir, ckDir) = (s"$root/src", s"$root/sink", s"$root/ck")
    val all = graft.pipeline.Pipeline.synthTurns(spark, 100L, 4)
    all.filter(_.turn_idx == 0).write.parquet(s"$root/openers")
    all.filter(_.turn_idx > 0).write.parquet(s"$root/followups")
    val maxTs = all.agg(org.apache.spark.sql.functions.max(col("ts")))
      .head().getTimestamp(0)
    val day = 24L * 3600 * 1000
    def sentinel(tag: String, plusMs: Long) = Seq(
      graft.core.TurnInput(s"~s-$tag", 0, "user", "", "",
        new java.sql.Timestamp(maxTs.getTime + plusMs)),
      graft.core.TurnInput(s"~s-$tag", 1, "user", "", "",
        new java.sql.Timestamp(maxTs.getTime + plusMs)))
    // wide watermark delay: the chunk split is by turn_idx (followups
    // carry event times across the whole corpus span), so nothing may
    // be classed late — the test is JOIN-STATE recovery, not late-row
    // policy; null tails are then driven by sentinels past delay+horizon
    def query() = StreamExtract.openerJoinOuter(
      StreamExtract.readTurnStream(spark, srcDir, s"$root/openers"),
      horizon = "30 days", watermarkDelay = "400 days")
    def start() = query().writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append()).start()
    def sinkCount(): Long =
      scala.util.Try(spark.read.parquet(sinkDir).count()).getOrElse(0L)

    arriveFiles(s"$root/openers", srcDir)
    locally { val q = start(); q.processAllAvailable(); q.stop() }
    assert(sinkCount() == 0, "nothing can match or expire on openers alone")
    // restart: the buffered openers must come back from the checkpoint
    // — if state were lost, these matches could never emit
    arriveFiles(s"$root/followups", srcDir)
    locally { val q = start(); q.processAllAvailable(); q.stop() }
    val matched = sinkCount()
    assert(matched > 0, "no matches after restart — opener state was lost")
    // third restart: sentinels push the watermark past every window and
    // the null tail flushes from RECOVERED state
    locally {
      val q = start()
      spark.createDataset(sentinel("a", 431 * day)).coalesce(1)
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      spark.createDataset(sentinel("b", 433 * day)).coalesce(1)
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      q.stop()
    }
    val streamed = spark.read.parquet(sinkDir)
      .filter(!col("conv_id").startsWith("~s-"))
    val t = spark.read.parquet(srcDir).filter(!col("conv_id").startsWith("~s-"))
    val batch = t.as("o").filter($"o.turn_idx" === 0)
      .join(t.as("r").filter($"r.turn_idx" > 0),
        $"r.conv_id" === $"o.conv_id" &&
          $"r.ts" >= $"o.ts" && $"r.ts" <= $"o.ts" + expr("interval 30 days"),
        "left_outer")
      .select($"o.conv_id", $"r.turn_idx",
        (unix_timestamp($"r.ts") - unix_timestamp($"o.ts")).as("delta_s"))
    assert(streamed.filter(col("turn_idx").isNull).count() > 0,
      "null tail never flushed after restart")
    assert(streamed.count() == batch.count(),
      s"${streamed.count()} vs ${batch.count()}")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming upsert sink merges corrections by key, replay-safe, time travel exact") {
    import spark.implicits._
    import graft.io.TableIO
    val root0 = Files.createTempDirectory("graft-upsert").toString
    val (srcDir, tblDir, ckDir) = (s"$root0/src", s"$root0/tbl", s"$root0/ck")
    val all = graft.pipeline.Pipeline.synthTurns(spark, 50L, 4)
    val seed = graft.pipeline.Pipeline.extractTurns(all)
    TableIO.writeExtracted(seed, tblDir, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(tblDir)
    def dumpTbl() = TableIO.readExtracted(spark, tblDir)
      .orderBy("conv_id", "turn_idx").collect()
      .map(graft.core.Json.turnJson).toSeq
    val before = dumpTbl()

    // the correction feed: every turn_idx<2 row re-extracted with a
    // corrected score, DELIVERED TWICE (duplicate files — the
    // at-least-once shape a real feed has)
    val corrected = seed.filter(_.turn_idx < 2)
      .map(t => t.copy(total_score = t.total_score + 1000))
    new java.io.File(srcDir).mkdirs()
    corrected.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    corrected.toDF().coalesce(1).write.mode("append").parquet(srcDir)

    def runPass(): Unit = {
      val src = spark.readStream.schema(seed.toDF().schema).parquet(srcDir)
        .as[graft.core.ExtractedTurn]
      val q = StreamExtract.upsertToTable(src, tblDir, ckDir, buckets = 8)
      q.processAllAvailable(); q.stop()
    }
    runPass()
    // final content = seed with the corrected rows REPLACED (no
    // duplicate keys despite double delivery)
    val corrKeys = corrected.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val expected = (seed.collect().toSeq.filterNot(t => corrKeys((t.conv_id, t.turn_idx))) ++
      corrected.collect().toSeq)
      .sortBy(t => (t.conv_id, t.turn_idx)).map(graft.core.Json.turnJson)
    assert(dumpTbl() == expected)

    // restart with no new data: markers drop the replay, content stable
    val snapAfter = TableIO.committed(tblDir)._1
    runPass()
    assert(TableIO.committed(tblDir)._1 == snapAfter, "replay must not re-merge")
    assert(dumpTbl() == expected)

    // time travel to the pre-stream snapshot reads the seed bytes
    assert(TableIO.readExtracted(spark, tblDir, preSnap)
      .orderBy("conv_id", "turn_idx").collect()
      .map(graft.core.Json.turnJson).toSeq == before)
  }

  test("foreachBatch table ingest is exactly-once under batch replay and restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ingest").toString
    val (srcDir, tblDir, ckDir) = (s"$root/src", s"$root/tbl", s"$root/ck")
    val all = graft.pipeline.Pipeline.synthTurns(spark, 60L, 4)
    all.filter(_.turn_idx < 2).write.parquet(s"$root/chunk1")
    all.filter(_.turn_idx >= 2).write.parquet(s"$root/chunk2")
    def runPass(): Unit = {
      val q = StreamExtract.ingestToTable(
        StreamExtract.extractStream(
          StreamExtract.readTurnStream(spark, srcDir, s"$root/chunk1")),
        tblDir, ckDir)
      q.processAllAvailable(); q.stop()
    }
    def arrive(chunk: String): Unit = {
      val dst = new java.io.File(srcDir); dst.mkdirs()
      for (f <- new java.io.File(chunk).listFiles if f.getName.endsWith(".parquet"))
        Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
    }
    arrive(s"$root/chunk1"); runPass()
    val idsAfterPass1 = graft.io.TableIO.committedBatchIds(tblDir)
    arrive(s"$root/chunk2"); runPass()
    runPass() // restart with no new data: no new batches, no duplicates
    val got = graft.io.TableIO.readCommittedBatches(spark, tblDir)
      .as[graft.core.ExtractedTurn].toDF()
    val batch = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(srcDir).as[graft.core.TurnInput]).toDF()
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // replay guard directly: re-offering an already-committed batchId
    // must be dropped, and a partial uncommitted batch dir is invisible
    assert(!graft.io.TableIO.commitBatch(batch.limit(5), tblDir, 0L),
      "replayed batchId must be dropped")
    assert(got.count() == graft.io.TableIO.readCommittedBatches(spark, tblDir).count())
    val partial = java.nio.file.Paths.get(tblDir, "_batches", "batch=999")
    Files.createDirectories(partial)
    batch.limit(3).write.mode("overwrite").parquet(partial.toString)
    assert(graft.io.TableIO.readCommittedBatches(spark, tblDir).count() == batch.count(),
      "uncommitted batch dir must be invisible")
    // batch-table time travel: as-of the last pass-1 batch id equals the
    // chunk-1 extraction; the increment beyond it equals chunk 2; an
    // empty range reads empty (with schema), never throws
    assert(idsAfterPass1.nonEmpty)
    val boundary = idsAfterPass1.max
    val asOf = graft.io.TableIO.readCommittedBatches(spark, tblDir, upToBatch = boundary)
    val chunk1Truth = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(s"$root/chunk1").as[graft.core.TurnInput]).toDF()
    assert(asOf.exceptAll(chunk1Truth).isEmpty && chunk1Truth.exceptAll(asOf).isEmpty)
    val inc = graft.io.TableIO.readNewBatches(spark, tblDir, boundary)
    val chunk2Truth = graft.pipeline.Pipeline.extractTurns(
      spark.read.parquet(s"$root/chunk2").as[graft.core.TurnInput]).toDF()
    assert(inc.exceptAll(chunk2Truth).isEmpty && chunk2Truth.exceptAll(inc).isEmpty)
    val maxId = graft.io.TableIO.committedBatchIds(tblDir).max
    assert(graft.io.TableIO.readNewBatches(spark, tblDir, maxId).count() == 0)
    intercept[IllegalArgumentException] {
      graft.io.TableIO.readNewBatches(spark, tblDir, 5L, 2L)
    }
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

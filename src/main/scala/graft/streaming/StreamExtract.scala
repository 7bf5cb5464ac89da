package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core._

/** Structured Streaming face of the engine. The reference is a
  * request/response service (one doc per HTTP call, app.py:150) — its
  * natural distributed-streaming shape is a file/Iceberg stream of
  * transcript turns flowing through the SAME fused per-turn transform,
  * plus watermarked windowed quality metrics (the RequestStats analog,
  * scripts/app_interaction/test_app_all.py:18-85) and a stateful
  * per-conversation sessionizer (mapGroupsWithState).
  */
object StreamExtract {

  /** File-source stream of turns (an Iceberg streaming read stands in
    * the same spot on a real cluster). */
  def readTurnStream(spark: SparkSession, dir: String, schemaFrom: String): Dataset[TurnInput] = {
    import spark.implicits._
    val schema = spark.read.parquet(schemaFrom).schema
    spark.readStream.schema(schema).parquet(dir).as[TurnInput]
  }

  /** The per-turn extraction as a streaming transform — identical core
    * function, streaming-safe (pure, no shuffle). */
  def extractStream(turns: Dataset[TurnInput]): Dataset[ExtractedTurn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.mapPartitions(it =>
      it.map(t => Extractor.extractOne(t.conv_id, t.turn_idx, t.text)))
  }

  /** Watermarked per-minute extraction quality metrics (A3 analog):
    * counts, error rows, avg total_score. */
  def qualityByWindow(turns: Dataset[TurnInput]): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val extracted = turns.mapPartitions { it =>
      it.map { t =>
        val e = Extractor.extractOne(t.conv_id, t.turn_idx, t.text)
        (t.ts, e.errors.isDefined, e.warnings.isDefined, e.total_score)
      }
    }.toDF("ts", "has_error", "has_warning", "total_score")
    extracted
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("has_error"), 1L).otherwise(0L)).as("n_error"),
        sum(when(col("has_warning"), 1L).otherwise(0L)).as("n_warning"),
        sum(col("total_score").cast("long")).as("sum_score"))
  }

  final case class ConvState(nTurns: Long, nErrors: Long, sumScore: Long)
  final case class ConvSummary(conv_id: String, nTurns: Long, nErrors: Long, sumScore: Long)

  /** Custom streaming state: running per-conversation extraction
    * summary via mapGroupsWithState (the KeyValueGroupedDataset custom
    * state surface). */
  def conversationState(turns: Dataset[TurnInput]): Dataset[ConvSummary] = {
    val spark = turns.sparkSession
    import spark.implicits._
    extractStream(turns)
      .groupByKey(_.conv_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (convId: String, rows: Iterator[ExtractedTurn], state: GroupState[ConvState]) =>
          var s = state.getOption.getOrElse(ConvState(0L, 0L, 0L))
          rows.foreach { e =>
            s = ConvState(s.nTurns + 1,
              s.nErrors + (if (e.errors.isDefined) 1 else 0),
              s.sumScore + e.total_score)
          }
          state.update(s)
          ConvSummary(convId, s.nTurns, s.nErrors, s.sumScore)
      }
  }

  /** Streaming exact dedupe on the natural key — the streaming analog
    * of q_dedup_exact. State is bounded by the watermark horizon
    * (dropDuplicatesWithinWatermark evicts keys once they age out), so
    * it holds at unbounded stream length, unlike dropDuplicates. */
  def dedupedTurns(turns: Dataset[TurnInput]): Dataset[TurnInput] = {
    import turns.sparkSession.implicits._
    turns.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
      .as[TurnInput]
  }

  final case class ErrorAlert(conv_id: String, nErrors: Long)

  /** Error-burst alerts via flatMapGroupsWithState (the 0..n-rows-per-
    * group surface): one alert each time a conversation's cumulative
    * extraction-error count crosses a multiple of `every`. Crossing
    * counts are order- and batching-independent (floor(total/every)),
    * so the emitted set reconciles exactly with batch truth. State for
    * conversations idle past `idleEvictionMs` of EVENT time is evicted
    * as the watermark passes (event-time timeout — data-driven, no
    * busy no-data batches) — unbounded streams must not grow state
    * linearly in distinct conv_id. */
  def errorAlerts(turns: Dataset[TurnInput], every: Long = 3L,
      idleEvictionMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[ErrorAlert] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .mapPartitions { it =>
        it.map { t =>
          val e = Extractor.extractOne(t.conv_id, t.turn_idx, t.text)
          (t.conv_id, t.ts, e.errors.isDefined, e.total_score)
        }
      }
      .toDF("conv_id", "ts", "has_error", "total_score")
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, Boolean, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (convId: String,
         rows: Iterator[(String, java.sql.Timestamp, Boolean, Int)],
         state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(ConvState(0L, 0L, 0L))
            val alerts = Vector.newBuilder[ErrorAlert]
            var maxTs = Long.MinValue
            rows.foreach { case (_, ts, hasError, score) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              if (hasError) {
                val n = s.nErrors + 1
                if (n % every == 0) alerts += ErrorAlert(convId, n)
                s = ConvState(s.nTurns + 1, n, s.sumScore + score)
              } else s = ConvState(s.nTurns + 1, s.nErrors, s.sumScore + score)
            }
            state.update(s)
            // rows survive the watermark filter, so maxTs + eviction is
            // always ahead of the current watermark
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs + idleEvictionMs)
            alerts.result().iterator
          }
      }
  }

  /** Event-time gap sessionization with the built-in session_window —
    * per-conversation sessions split on >gap idle time, finalized as
    * the watermark passes (W2's y-gap grouping transposed to time). */
  def sessionWindows(turns: Dataset[TurnInput], gap: String = "1 hour"): DataFrame =
    turns.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("session"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_turns"))

  /** Stream-stream event-time interval join: attribute every follow-up
    * turn to its conversation's opener (turn_idx == 0) when it lands
    * within `horizon` of the opener's timestamp — the classic
    * impressions⋈clicks shape. Both sides carry watermarks so the join
    * state is evictable (Spark bounds the buffered openers by the
    * watermark + the interval bound); inner join, so rows emit as soon
    * as both sides have arrived. */
  def openerJoin(turns: Dataset[TurnInput], horizon: String = "2 hours",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val openers = turns.toDF()
      .filter(col("turn_idx") === 0)
      .select(col("conv_id").as("o_conv"), col("ts").as("open_ts"))
      .withWatermark("open_ts", watermarkDelay)
    val rest = turns.toDF()
      .filter(col("turn_idx") > 0)
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    rest.join(openers,
      col("conv_id") === col("o_conv") &&
        col("ts") >= col("open_ts") &&
        col("ts") <= col("open_ts") + expr(s"interval $horizon"))
      .select(col("conv_id"), col("turn_idx"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("open_ts"))).as("delta_s"))
  }

  /** LEFT OUTER stream-stream interval join — the other half of the
    * impressions⋈clicks idiom: every opener emits, matched follow-ups
    * as they arrive, and an opener with NO follow-up inside `horizon`
    * emits exactly one null-extended row once the watermark passes
    * open_ts + horizon (watermark-expiry-driven null emission — the
    * state-timeout semantics the inner join never exercises). State
    * stays bounded by the same horizon + watermark rule as the inner
    * form. Note the null row only materializes in a micro-batch AFTER
    * the watermark has advanced past the opener's window — a bounded
    * drive must push one more batch (or rely on the no-data batch) to
    * flush the tail. */
  def openerJoinOuter(turns: Dataset[TurnInput], horizon: String = "2 hours",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val openers = turns.toDF()
      .filter(col("turn_idx") === 0)
      .select(col("conv_id").as("o_conv"), col("ts").as("open_ts"))
      .withWatermark("open_ts", watermarkDelay)
    val rest = turns.toDF()
      .filter(col("turn_idx") > 0)
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    openers.join(rest,
      col("o_conv") === col("conv_id") &&
        col("ts") >= col("open_ts") &&
        col("ts") <= col("open_ts") + expr(s"interval $horizon"),
      "leftOuter")
      .select(col("o_conv").as("conv_id"), col("turn_idx"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("open_ts"))).as("delta_s"))
  }

  /** FULL OUTER stream-stream interval join — completes the family:
    * matched pairs emit as they arrive; an opener with no in-horizon
    * follow-up emits one (conv, null turn) row AND a follow-up with no
    * in-horizon opener (e.g. it precedes the opener, or the opener is
    * outside the horizon) emits its own (conv, turn, null delta) row —
    * each driven by watermark expiry of its own side's state. */
  /** Streaming dedup — dropDuplicatesWithinWatermark on the turn key:
    * each (conv_id, turn_idx) emits exactly once (first occurrence,
    * filter semantics — rows flow through immediately in Append mode)
    * and the key's state is EVICTED once the watermark passes its
    * event time. Plain dropDuplicates would pin every key seen forever
    * — unbounded state at 10^12 turns; the within-watermark form is
    * the only deployable shape for an endless transcript stream. */
  def turnDedup(turns: Dataset[TurnInput],
      watermarkDelay: String = "10 minutes"): DataFrame =
    turns.toDF()
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("conv_id", "turn_idx"))
      .select(col("conv_id"), col("turn_idx"), col("role"),
        unix_timestamp(col("ts")).as("ts_sec"))

  final case class SessTurn(ts_ms: Long, turn_idx: Int, role: String)
  final case class SessOut(conv_id: String, session_start_s: Long,
      session_end_s: Long, n_turns: Long, n_roles: Long)

  /** Spark 4's transformWithState surface (the arbitrary-state API v2
    * replacing flatMapGroupsWithState): per-conversation gap
    * sessionization driven by typed ListState + EVENT-TIME TIMERS — a
    * session row is emitted only from handleExpiredTimer, when the
    * watermark has passed the session's close, so Append-mode output is
    * final-by-construction. Requires the RocksDB state store provider
    * (the only provider transformWithState supports); state per key is
    * the open-session turn buffer, cleared on close — bounded by the
    * gap horizon, not the stream length. Late rows behind the watermark
    * are not re-sessionized (production streams rely on the watermark
    * delay, exactly as session_window does). */
  class ConvSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, TurnInput, SessOut] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig,
      TimerValues, ExpiredTimerInfo}
    @transient private var buf: ListState[SessTurn] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[SessTurn]("buf",
        org.apache.spark.sql.Encoders.product[SessTurn], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TurnInput],
        tv: TimerValues): Iterator[SessOut] = {
      rows.foreach(t =>
        buf.appendValue(SessTurn(t.ts.getTime, t.turn_idx, t.role)))
      // exactly one live timer per key: the latest buffered event + gap
      val maxTs = buf.get().map(_.ts_ms).max
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessOut] = {
      val rows = buf.get().toSeq.sortBy(r => (r.ts_ms, r.turn_idx))
      if (rows.isEmpty) return Iterator.empty
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(rows.head))
      for (r <- rows.tail) {
        if (r.ts_ms - sessions.last.last.ts_ms >= gapMs)
          sessions += scala.collection.mutable.ArrayBuffer(r)
        else sessions.last += r
      }
      val wm = tv.getCurrentWatermarkInMs()
      val (closed, open) = sessions.partition(_.last.ts_ms + gapMs <= wm)
      buf.clear()
      for (sess <- open; r <- sess) buf.appendValue(r)
      if (open.nonEmpty) getHandle.registerTimer(
        open.map(_.last.ts_ms).max + gapMs)
      closed.iterator.map { sess =>
        SessOut(key, sess.head.ts_ms / 1000,
          sess.last.ts_ms / 1000 + gapMs / 1000,
          sess.size.toLong, sess.map(_.role).distinct.size.toLong)
      }
    }
  }

  /** Event-time sessionization through transformWithState (see
    * ConvSessionProcessor). */
  def sessionsViaTws(turns: Dataset[TurnInput], gapMs: Long = 3600L * 1000,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.toDF()
      .withWatermark("ts", watermarkDelay)
      .as[TurnInput]
      .groupByKey(_.conv_id)
      .transformWithState(new ConvSessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
      .toDF()
  }

  /** CHAINED stateful operators in one streaming query (the multiple-
    * stateful-operator pipeline Spark supports since 3.5): watermarked
    * dedup state feeding event-time session-window aggregation state —
    * the production shape for "sessionize an at-least-once transcript
    * feed" where upstream retries duplicate turns and sessions must
    * count each turn once. Append mode: a session row emits only when
    * the watermark passes its close, so the emitted set is final. */
  def dedupSessionWindows(turns: Dataset[TurnInput], gap: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    turns.toDF()
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("conv_id", "turn_idx"))
      .groupBy(col("conv_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        unix_timestamp(col("session_window.end")).as("session_end_s"),
        col("n_turns"))

  def openerJoinFull(turns: Dataset[TurnInput], horizon: String = "2 hours",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val openers = turns.toDF()
      .filter(col("turn_idx") === 0)
      .select(col("conv_id").as("o_conv"), col("ts").as("open_ts"))
      .withWatermark("open_ts", watermarkDelay)
    val rest = turns.toDF()
      .filter(col("turn_idx") > 0)
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    openers.join(rest,
      col("o_conv") === col("conv_id") &&
        col("ts") >= col("open_ts") &&
        col("ts") <= col("open_ts") + expr(s"interval $horizon"),
      "full_outer")
      .select(coalesce(col("o_conv"), col("conv_id")).as("conv_id"),
        col("turn_idx"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("open_ts"))).as("delta_s"))
  }

  /** Production streaming ingest into the Iceberg-lite table layout:
    * foreachBatch + TableIO.commitBatch gives exactly-once table
    * contents under at-least-once micro-batch replay (a restarted
    * stream re-offers the last batch; the marker-guarded commit drops
    * it). This is the streaming analog of writeExtracted's snapshot
    * waves. */
  def ingestToTable(out: Dataset[ExtractedTurn], root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    out.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.io.TableIO.commitBatch(df, root, batchId)
        ()
      }
      .start()

  /** Streaming UPSERT sink (CDC-ingest shape): each micro-batch
    * row-level-MERGEs into the bucketed table via foreachBatch +
    * TableIO.mergeBatch — corrections and re-deliveries in the stream
    * REPLACE table rows by (conv_id, turn_idx) instead of appending
    * duplicates. Restart-safe: replayed batch ids drop at the marker;
    * a crash between merge publish and marker re-merges identical rows
    * (content-idempotent). The table must exist (seed it with
    * writeExtracted) — the stream is the correction feed, not the
    * initial load. */
  def upsertToTable(out: Dataset[ExtractedTurn], root: String,
      checkpoint: String, buckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.io.TableIO.mergeBatch(df, root, batchId, buckets)
        ()
      }
      .start()

  /** Drive a stream to completion over already-present files (test &
    * demo harness): processAllAvailable then stop. */
  def runOnce(df: DataFrame, queryName: String, outputMode: OutputMode): DataFrame =
    runPhased(df, queryName, outputMode)()

  /** Like runOnce, but between processAllAvailable rounds each `phase`
    * callback runs (e.g. appending late files to the source dir) — the
    * harness for watermark-expiry semantics, where output only
    * materializes in a batch AFTER the watermark advanced (outer-join
    * null tails, state timeouts). */
  def runPhased(df: DataFrame, queryName: String, outputMode: OutputMode)
      (phases: (() => Unit)*): DataFrame =
    runPhasedMulti(Seq((df, queryName, outputMode)))(phases: _*).head

  /** Drive SEVERAL streaming queries over one source through one shared
    * phase loop (start all → drain all → phase → drain all → …): the
    * outer/full/inner interval joins read the same corpus and need the
    * same sentinel-flush rounds, so sharing the drive pays the corpus
    * write, session-conf window, and phase appends once instead of per
    * query. Returns the memory-sink tables in input order. */
  def runPhasedMulti(queries: Seq[(DataFrame, String, OutputMode)])
      (phases: (() => Unit)*): Seq[DataFrame] = {
    require(queries.nonEmpty, "no queries to drive")
    // Stateful streaming cost at tiny oracle scale is dominated by
    // state-store count (one per shuffle partition per stateful op per
    // side per micro-batch), not data: pin a small shuffle width for
    // the harness drive. Production callers size shuffle partitions to
    // the cluster as usual — this touches only the session-conf window
    // around THIS bounded drive.
    val spark = queries.head._1.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val started = queries.map { case (df, name, mode) =>
        df.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .start()
      }
      started.foreach(_.processAllAvailable())
      for (p <- phases) { p(); started.foreach(_.processAllAvailable()) }
      started.foreach(_.stop())
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    queries.map(q => spark.table(q._2))
  }
}

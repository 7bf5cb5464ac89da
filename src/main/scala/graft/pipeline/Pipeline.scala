package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.synth.TurnGen

/** The distributed shape of the engine (SURVEY.md §3.4, §7.2 step 9):
  *
  *   scan/generate turns → explicit salted repartition on
  *   pmod(xxhash64(conv_id, turn_idx), S) → ONE fused typed
  *   mapPartitions running the whole per-turn extraction → ordered
  *   write / downstream relational ops.
  *
  * Per-turn work is independent, so (conv_id, turn_idx) salting is an
  * exact skew killer for heavy-tailed conversations (north rule). The
  * single mapPartitions keeps ONE boundary around the pure-JVM core —
  * no Column↔typed alternation, no per-stage ser/de (SURVEY.md §4
  * item 4); since round 2 it maps the projected plan's internal rows
  * directly so the payload never materializes as a per-turn String
  * (decodeUtf8 below).
  */
object Pipeline {

  /** The one public transform: turns in, extracted records out.
    * Projects to the three columns the extractor reads BEFORE the
    * boundary — a full `as[TurnInput]` would force the scan to read and
    * materialize role/tool/ts too (the encoder defeats column pruning);
    * the explicit select keeps ReadSchema at conv_id/turn_idx/text. */
  def extractTurns(ds: Dataset[TurnInput]): Dataset[ExtractedTurn] =
    extractProjected(projected(ds.toDF()))

  /** The pruned input plan feeding the per-turn map (also the PlanSpec
    * inspection point: pushdown/pruning/codegen gates run on THIS plan —
    * the map itself lives behind an RDD boundary). */
  private[graft] def projected(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("conv_id"), col("turn_idx"), col("text"))

  /** Per-turn map over the projected plan's internal rows. The payload
    * is decoded from UTF8String bytes into a per-thread REUSED char
    * buffer (CharsView) instead of a fresh java.lang.String — at ~3 KB
    * UTF-16 chars/turn the input String was the largest remaining
    * per-turn allocation after the span pool (BASELINE.md round-2).
    * Malformed UTF-8 falls back to UTF8String.toString, whose
    * replacement semantics are the contract. */
  private def extractProjected(p: org.apache.spark.sql.DataFrame): Dataset[ExtractedTurn] = {
    val spark = p.sparkSession
    import spark.implicits._
    val rdd = p.queryExecution.toRdd.mapPartitions { it =>
      val view = new CharsView
      it.map { row =>
        val conv = row.getUTF8String(0).toString
        val idx = row.getInt(1)
        val u = row.getUTF8String(2)
        // A null turn keeps the typed-path contract: extractOne's
        // NonFatal catch turns the NPE into a ProcessingError record
        // (not an empty-payload extraction).
        val payload: CharSequence =
          if (u == null) null else decodeUtf8(u, view)
        Extractor.extractOne(conv, idx, payload)
      }
    }
    spark.createDataset(rdd)
  }

  /** Strict single-pass UTF-8 → UTF-16 decode into `view`; any byte
    * sequence that is not shortest-form valid UTF-8 (per RFC 3629) bails
    * to UTF8String.toString so replacement-char behavior is exactly the
    * JDK's. Valid input decodes identically by definition. */
  private[graft] def decodeUtf8(u: org.apache.spark.unsafe.types.UTF8String,
      view: CharsView): CharSequence = {
    val base = u.getBaseObject
    if (!base.isInstanceOf[Array[Byte]]) return u.toString
    val bytes = base.asInstanceOf[Array[Byte]]
    val off = (u.getBaseOffset - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET).toInt
    val blen = u.numBytes()
    view.ensure(blen)
    val a = view.arr
    var i = off; val end = off + blen; var o = 0
    while (i < end) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { a(o) = b0.toChar; o += 1; i += 1 }
      else if (b0 < 0xc2) return u.toString // stray continuation / overlong lead
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 >= end) return u.toString
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80) return u.toString
        a(o) = (((b0 & 0x1f) << 6) | (b1 & 0x3f)).toChar; o += 1; i += 2
      } else if (b0 < 0xf0) { // 3-byte
        if (i + 2 >= end) return u.toString
        val b1 = bytes(i + 1) & 0xff; val b2 = bytes(i + 2) & 0xff
        if ((b1 & 0xc0) != 0x80 || (b2 & 0xc0) != 0x80) return u.toString
        if (b0 == 0xe0 && b1 < 0xa0) return u.toString  // overlong
        if (b0 == 0xed && b1 >= 0xa0) return u.toString // UTF-16 surrogate range
        a(o) = (((b0 & 0x0f) << 12) | ((b1 & 0x3f) << 6) | (b2 & 0x3f)).toChar
        o += 1; i += 3
      } else if (b0 < 0xf5) { // 4-byte
        if (i + 3 >= end) return u.toString
        val b1 = bytes(i + 1) & 0xff; val b2 = bytes(i + 2) & 0xff; val b3 = bytes(i + 3) & 0xff
        if ((b1 & 0xc0) != 0x80 || (b2 & 0xc0) != 0x80 || (b3 & 0xc0) != 0x80) return u.toString
        if (b0 == 0xf0 && b1 < 0x90) return u.toString  // overlong
        if (b0 == 0xf4 && b1 >= 0x90) return u.toString // > U+10FFFF
        val cp = ((b0 & 0x07) << 18) | ((b1 & 0x3f) << 12) | ((b2 & 0x3f) << 6) | (b3 & 0x3f)
        val v = cp - 0x10000
        a(o) = (0xd800 | (v >> 10)).toChar
        a(o + 1) = (0xdc00 | (v & 0x3ff)).toChar
        o += 2; i += 4
      } else return u.toString
    }
    view.len = o
    view
  }

  /** extractTurns with the explicit salt repartition in front — use at
    * scale where input partitioning follows conv_id buckets and long
    * conversations skew partition sizes. `salt` should be ≥ 4× total
    * cores (SURVEY.md §7.5 item 6). The projection happens before the
    * exchange so the shuffle carries only the three live columns. */
  def extractTurnsSalted(ds: Dataset[TurnInput], salt: Int): Dataset[ExtractedTurn] =
    extractProjected(
      projected(ds.toDF())
        .repartition(salt, pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(salt))))

  /** Deterministic synthetic transcript table: `nConvs` conversations,
    * heavy-tailed turns per conversation (~3.9 avg). Generation is
    * distributed (spark.range) and pure per key — any partition can be
    * regenerated independently; no driver-side loops. */
  def synthTurns(spark: SparkSession, nConvs: Long, parallelism: Int): Dataset[TurnInput] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, parallelism).flatMap { i =>
      val convId = f"conv-$i%09d"
      val n = TurnGen.turnsPerConv(convId)
      (0 until n).iterator.map(t => TurnGen.genTurn(convId, t).input)
    }
  }

  /** Same table with the ground-truth sidecar (tests / golden checks). */
  def synthWithExpected(spark: SparkSession, nConvs: Long, parallelism: Int)
      : Dataset[(TurnInput, ExtractedTurn)] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, parallelism).flatMap { i =>
      val convId = f"conv-$i%09d"
      val n = TurnGen.turnsPerConv(convId)
      (0 until n).iterator.map { t =>
        val g = TurnGen.genTurn(convId, t); (g.input, g.expected)
      }
    }
  }

  /** Stable-ordered output view (north rule: stable (conv_id, turn_idx)
    * ordering for golden/byte equality). */
  def ordered(ds: Dataset[ExtractedTurn]): Dataset[ExtractedTurn] =
    ds.orderBy(col("conv_id"), col("turn_idx"))

  /** S8 analog — the reference's per-document `response.json` sink
    * (test_app_all.py:113-132) as a distributed JSON-lines write: one
    * canonical-serializer line per turn, (conv_id, turn_idx)-ordered
    * across files (orderBy range-partitions, so file k's lines all sort
    * before file k+1's). */
  def writeJsonLines(ds: Dataset[ExtractedTurn], path: String): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ordered(ds).map(Json.turnJson(_)).write.mode("overwrite").text(path)
  }
}

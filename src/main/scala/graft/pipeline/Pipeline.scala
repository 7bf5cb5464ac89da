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
  * single mapPartitions keeps one encoder boundary around the pure-JVM
  * core — no Column↔typed alternation, no per-stage ser/de
  * (SURVEY.md §4 item 4).
  */
object Pipeline {

  /** The one public transform: turns in, extracted records out.
    * Projects to the three columns the extractor reads BEFORE the typed
    * boundary — a full `as[TurnInput]` would force the scan to read and
    * materialize role/tool/ts too (the encoder defeats column pruning);
    * the explicit select keeps ReadSchema at conv_id/turn_idx/text. */
  def extractTurns(ds: Dataset[TurnInput]): Dataset[ExtractedTurn] =
    extractProjected(ds.toDF())

  private def extractProjected(df: org.apache.spark.sql.DataFrame): Dataset[ExtractedTurn] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        it.map { case (c, i, p) => Extractor.extractOne(c, i, p) }
      }
  }

  /** extractTurns with the explicit salt repartition in front — use at
    * scale where input partitioning follows conv_id buckets and long
    * conversations skew partition sizes. `salt` should be ≥ 4× total
    * cores (SURVEY.md §7.5 item 6). The projection happens before the
    * exchange so the shuffle carries only the three live columns. */
  def extractTurnsSalted(ds: Dataset[TurnInput], salt: Int): Dataset[ExtractedTurn] =
    extractProjected(
      ds.toDF()
        .select(col("conv_id"), col("turn_idx"), col("text"))
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

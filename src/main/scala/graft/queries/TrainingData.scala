package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators that are not DuckDB-expressible
  * (engine-specific hashing / the extraction pipeline itself) —
  * registered rows-only (no oracleSql entry; the driver records a
  * weaker rows>0 check, SURVEY.md §5 item 6). */
object TrainingData {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The extraction pipeline itself as a registered query (flagship
    // operator; correctness gated by the sbt golden suites instead).
    "q_extract_pipeline" -> ((s, dir) => {
      val turns = graft.pipeline.Pipeline.synthTurns(s, 500L, 8)
      graft.pipeline.Pipeline.ordered(
        graft.pipeline.Pipeline.extractTurnsSalted(turns, 32))
        .select(col("conv_id"), col("turn_idx"), col("subject"), col("grade"),
          col("variant"), col("participant_code"), col("total_score"))
    }),

    // multimodal plumbing (stubbed codec; real batch/partition shape)
    "q_media_features" -> ((s, dir) => graft.multimodal.Media.mediaFeatureQuery(s, dir)),

    // S9 — error-subset sink analog: rows whose extraction failed
    "q_extract_errors" -> ((s, dir) => {
      val turns = graft.pipeline.Pipeline.synthTurns(s, 500L, 8)
      graft.pipeline.Pipeline.extractTurns(turns)
        .filter(col("errors").isNotNull)
        .select(col("conv_id"), col("turn_idx"), explode(col("errors")).as("error"))
        .orderBy(col("conv_id"), col("turn_idx"), col("error"))
    }),
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators that are not DuckDB-expressible
  * (engine-specific hashing / the extraction pipeline itself) —
  * registered rows-only (no oracleSql entry; the driver records a
  * weaker rows>0 check, SURVEY.md §5 item 6). */
object TrainingData {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SimHash near-dup: 32-bit majority-vote fingerprint over token
    // xxhash64s, then bucket histogram. xxhash64 is Spark-native
    // (engine-specific → no cross-engine oracle).
    "q_dedup_simhash" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bits = toks
        .withColumn("bit", explode(sequence(lit(0), lit(31))))
        .groupBy(col("doc_id"), col("bit"))
        .agg(sum(when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1)).as("vote"))
      val sims = bits
        .groupBy(col("doc_id"))
        .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, cast(bit as int))"))
          .otherwise(0L)).as("simhash"))
      sims.groupBy(col("simhash")).agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
        .orderBy(col("simhash"))
    }),

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

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the full extraction pipeline over a deterministic
    * 1k-conversation synthetic transcript table (≈4k turns) — salted
    * repartition + fused per-turn extraction + stable ordering.
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = graft.pipeline.Pipeline.synthTurns(spark, 1000L, 8)
    graft.pipeline.Pipeline
      .ordered(graft.pipeline.Pipeline.extractTurnsSalted(turns, 32))
      .toDF()
  }
  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data ops). DuckDB-checkable ones in queries.Relational,
    * engine-specific ones rows-only in queries.TrainingData. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TrainingData.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (plus the ground-truth sidecar parquet the
    * extraction queries write). Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++ graft.queries.TrainingData.oracleSql
}

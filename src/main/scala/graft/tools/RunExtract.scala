package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end driver: synthesize a transcript table, run the extraction
  * pipeline, cross-check every row against the generator's ground truth
  * distributed-side (no collect), write ordered output, print stats.
  *
  *   sbt "runMain graft.tools.RunExtract <nConvs> <outDir> [cores]"
  */
object RunExtract {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 1000L
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-extract-out"
    val cores  = if (args.length > 2) args(2) else "8"
    val spark = graft.pipeline.GraftSession.build(cores.toInt, "graft-extract")
    import spark.implicits._

    val t0 = System.nanoTime()
    val withExp = graft.pipeline.Pipeline.synthWithExpected(spark, nConvs, cores.toInt * 4)
      .cache()
    val total = withExp.count()

    // distributed golden check: extract from payload, compare to expected
    val mismatches = withExp.map { case (in, exp) =>
      val got = graft.core.Extractor.extractOne(in.conv_id, in.turn_idx, in.text)
      if (got == exp) 0L else 1L
    }.toDF("m").agg(coalesce(sum("m"), lit(0L))).first().getLong(0)

    val out = graft.pipeline.Pipeline.ordered(
      graft.pipeline.Pipeline.extractTurnsSalted(withExp.map(_._1), cores.toInt * 4))
    out.write.mode("overwrite").parquet(outDir)
    val secs = (System.nanoTime() - t0) / 1e9

    val written = spark.read.parquet(outDir)
    val stats = written.agg(
      count(lit(1)).as("rows"),
      coalesce(sum(when(col("errors").isNotNull, 1L).otherwise(0L)), lit(0L)).as("rows_with_errors"),
      coalesce(sum(when(col("warnings").isNotNull, 1L).otherwise(0L)), lit(0L)).as("rows_with_warnings"),
      coalesce(sum(col("total_score").cast("long")), lit(0L)).as("sum_total_score"),
      count(col("participant_code")).as("rows_with_code")
    ).collect()(0)

    println(s"== graft extract: turns=$total mismatches=$mismatches " +
      s"rows=${stats.getLong(0)} errors=${stats.getLong(1)} warnings=${stats.getLong(2)} " +
      s"sum_score=${stats.getLong(3)} codes=${stats.getLong(4)} " +
      f"wall=${secs}%.1fs thru=${total / secs}%.0f turns/s")
    println("== sample rows ==")
    written.select("conv_id", "turn_idx", "subject", "grade", "variant",
      "participant_code", "total_score", "errors", "warnings")
      .show(8, truncate = false)
    spark.stop()
    if (mismatches != 0) { System.err.println(s"GOLDEN MISMATCHES: $mismatches"); sys.exit(1) }
  }
}

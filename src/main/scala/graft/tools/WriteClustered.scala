package graft.tools

import org.apache.spark.sql.SparkSession

/** Rewrite a turns table into a bucket-clustered layout: rows sorted by
  * conv_id and packed into a few large files — the shape of an Iceberg
  * bucket-partitioned table read without split planning (or any coarse
  * row-group / unsplittable-codec source). Evidence input for the
  * salted-repartition skew path (BASELINE.md):
  *   sbt "runMain graft.tools.WriteClustered <in> <out> <nFiles>"
  */
object WriteClustered {
  def main(args: Array[String]): Unit = {
    if (args.length < 3 || !args(2).forall(_.isDigit)) {
      System.err.println("usage: WriteClustered <inParquetDir> <outDir> <nFiles:int>")
      sys.exit(2)
    }
    val Array(in, out, nFiles) = args.take(3)
    val s = SparkSession.builder()
      .master("local[8]").appName("write-clustered")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.read.parquet(in)
      .sort("conv_id", "turn_idx")
      .coalesce(nFiles.toInt)
      .write.mode("overwrite").parquet(out)
    s.stop()
  }
}

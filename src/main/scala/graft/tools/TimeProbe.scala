package graft.tools
import graft.SparkEntry
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.GraftSession.build(4, "timeprobe")
    for (q <- args(0).split(",")) {
      val t0 = System.nanoTime()
      // noop write like Bench — count() lets Spark PRUNE expensive
      // projected columns and undermeasures (the ROUGE/WER lesson:
      // the DP column vanished from the counted plan, 11 s read 1 s)
      SparkEntry.queries(q)(spark, args(1))
        .write.format("noop").mode("overwrite").save()
      println(f"TIME $q sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

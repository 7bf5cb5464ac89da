package graft.tools
import graft.SparkEntry
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.GraftSession.build(4, "timeprobe")
    for (q <- args(0).split(",")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(1)).count()
      println(f"TIME $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

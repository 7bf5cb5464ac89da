package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round probe harness (guide §1.4): times individual
  * declared queries through the SAME noop sink as Bench, on a fresh
  * session, with warm-up + repetitions, and optionally dumps
  * `.explain("formatted")` to a file per query. Never used by the
  * driver — Bench.scala stays the frozen measurement contract; this
  * exists so before/after numbers in OPTIMIZATION_r06.md come from a
  * quiet, repeatable grain instead of the full-suite single-sample
  * draw.
  *
  * Usage: runMain graft.BenchExtra q_a,q_b[,...] [reps] [plansDir]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map {
      case "ALL" => SparkEntry.queries.keys.toSeq.sorted // Bench phase-1 replay
      case a     => a.split(",").toSeq
    }.getOrElse(sys.error("usage: BenchExtra q_a,q_b|ALL [reps] [plansDir]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val plansDir = args.lift(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.pipeline.GraftSession.build(cpus, "graft-bench-extra")
    val out = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      out(name) = times
      plansDir.foreach { d =>
        new java.io.File(d).mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name.txt"),
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      spark.sparkContext.setJobDescription(null)
    }
    for ((n, ts) <- out)
      println(f"[benchextra] $n reps=${ts.map(t => f"$t%.3f").mkString(",")} min=${ts.min}%.3f")
  }
}

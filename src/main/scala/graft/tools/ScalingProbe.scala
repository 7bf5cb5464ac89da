package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling diagnosis: time the extraction phase under different
  * configurations (with/without the salt shuffle, different cores) on
  * a pre-generated turns table.
  *   sbt "runMain graft.tools.ScalingProbe <turnsPath> <mode> <cores,cores,...>"
  * mode: salted | plain
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val mode = args(1)
    val coresList = args(2).split(",").map(_.toInt)
    for (cores <- coresList) {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes",
          sys.env.getOrElse("PROBE_SPLIT_BYTES", "134217728"))
        .config("spark.sql.parquet.columnarReaderBatchSize",
          sys.env.getOrElse("PROBE_BATCH", "4096"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // stage-level truth: run time, GC share, max-task skew
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          println(f"  STAGE ${i.stageId}%3d tasks=${i.numTasks}%4d " +
            f"run=${m.executorRunTime / 1000.0}%8.1fs gc=${m.jvmGCTime / 1000.0}%6.1fs " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1fs ${i.name.take(60)}")
        }
      })
      import s.implicits._
      val turns = s.read.parquet(path).as[graft.core.TurnInput]
      def job(): Unit = mode match {
        case "salted" =>
          graft.pipeline.Pipeline.extractTurnsSalted(turns, cores * 4)
            .write.format("noop").mode("overwrite").save()
        case "scan" => // columnar read only (codegen agg, no objects)
          turns.toDF().selectExpr("sum(length(text)) as s", "count(*) as n")
            .write.format("noop").mode("overwrite").save()
        case "objcount" => // object materialization, no extraction
          turns.mapPartitions(it => Iterator.single(it.map(_.text.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        case "objtext" => // only the text column as objects
          turns.select(org.apache.spark.sql.functions.col("text")).as[String]
            .mapPartitions(it => Iterator.single(it.map(_.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        case "objshuffled" => // objects after an exchange
          turns.repartition(cores * 4)
            .mapPartitions(it => Iterator.single(it.map(_.text.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        case "objnots" => // objects minus the timestamp column
          turns.select(org.apache.spark.sql.functions.col("conv_id"),
              org.apache.spark.sql.functions.col("turn_idx"),
              org.apache.spark.sql.functions.col("text"))
            .as[(String, Int, String)]
            .mapPartitions(it => Iterator.single(it.map(_._3.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        case _ =>
          graft.pipeline.Pipeline.extractTurns(turns)
            .write.format("noop").mode("overwrite").save()
      }
      job() // warm-up
      val t0 = System.nanoTime(); job(); val secs = (System.nanoTime() - t0) / 1e9
      val n = turns.count()
      println(f"PROBE mode=$mode cores=$cores secs=$secs%.2f tps=${n / secs}%.0f")
      s.stop()
    }
  }
}

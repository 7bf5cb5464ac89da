package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Tuned local session factory — every main/test goes through this so
  * the engine's measured configuration is in one place.
  *
  * Why these settings (measured on this image, see BASELINE.md):
  *  - columnarReaderBatchSize=512: the transcript table's `text` column
  *    averages ~3 KB/row; the default 4096-row columnar batch makes
  *    12 MB+ OnHeapColumnVector byte arrays whose growth copies (and,
  *    under G1 with a large heap, humongous allocations) dominated the
  *    scan — 25× measured slowdown on object materialization. 512 rows
  *    keeps vectors ~1.5 MB.  On a real cluster this is the same knob.
  *  - ParallelGC: throughput collector suits batchy scan/extract work;
  *    measured ~3× over G1 on the deserialization-heavy path.
  *  - maxPartitionBytes=8m / openCostInBytes=512k: payload rows are fat,
  *    so default 128 MB splits yield too few partitions to use the
  *    cores (measured: flat scaling 8→32); smaller splits restore
  *    bytes-balanced parallelism WITHOUT a pre-map shuffle (a salt
  *    repartition of the raw corpus would shuffle the whole input —
  *    measured 2-4× slower than scan-parallel at both 8 and 32 cores).
  *  - shuffle.partitions = cores (local), AQE on (coalescing + skew).
  */
object GraftSession {
  def build(cores: Int, name: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(name)
      // the engine's Catalyst surface: custom SQL functions + the
      // dot(v,v)→norm2(v) optimizer rule (functions/GraftExtensions)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's coalescing floor (default 1 MB) folds KB-scale shuffle
      // outputs to ONE partition, serializing every compute-heavy
      // fan-out that sits above a small exchange (char/word gram
      // explosion, pair enumeration): measured 3.7 s -> ~1 s on
      // q_eval_chrf at sf0.1 just by letting the 1.5 MB pair table
      // spread over the cores. 64 KB keeps the floor >> task overhead;
      // at production shuffle sizes partitions sit far above either
      // floor, so this only changes the small-input regime (guide §2.2
      // — partition count stays scale-adaptive, never a constant).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      // constraintPropagation stays ON (default): an A/B over an
      // 8-query probe showed only ~3% planning-latency win from
      // disabling it, and it would cost the inferred IsNotNull parquet
      // pushdowns (PlanSpec pins q_tpch_q1's) — wrong trade at 100 TB.
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (512L << 10).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // DPP's stats-based benefit check rejects pruning on KB-scale
      // test tables, making the q_source_dpp plan shape SF-dependent;
      // the fallback-ratio heuristic plants the same semantics-
      // preserving subquery the 100 TB layout would get
      .config("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

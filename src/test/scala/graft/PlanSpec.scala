package graft

import graft.queries.Relational

/** Physical-plan quality gates (SURVEY.md §4): these assertions pin the
  * plan shapes that matter at 100 TB — filter/projection pushdown to
  * the parquet scan, broadcast joins for dims, no shuffle in front of
  * the per-turn map, whole-stage codegen over the scan. A regression
  * here is a performance bug even when results stay correct. */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Relational.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("scan+filter pushes predicates and prunes columns at the source") {
    val p = plan("q_scan_filter")
    assert(p.contains("PushedFilters:") && p.contains("l_discount"),
      s"no pushed filters in:\n$p")
    // projection pruning: the scan must not read l_extendedprice etc.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_partkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("dim lookups broadcast (no shuffle join on small sides)") {
    val p = plan("q_join_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("semi/anti joins use join strategies, not subquery re-scans") {
    assert(plan("q_join_semi").contains("Semi"), plan("q_join_semi"))
    assert(plan("q_join_anti").contains("Anti"), plan("q_join_anti"))
  }

  test("grouped aggregation is partial+final hash agg (map-side combine)") {
    val p = plan("q_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("extraction pipeline has no pre-map shuffle and codegens the scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("plan-turns").toString
    graft.pipeline.Pipeline.synthTurns(spark, 20L, 2).write.mode("overwrite").parquet(tmp)
    val turns = spark.read.parquet(tmp).as[graft.core.TurnInput]
    val p = graft.pipeline.Pipeline.extractTurns(turns)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle before per-turn map:\n$p")
    assert(p.contains("*(1)"), s"no whole-stage-codegen span over the scan:\n$p")
    // scan reads ONLY the three live columns — the typed boundary must
    // not drag role/tool/ts through the parquet reader
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("conv_id") && read.contains("text") &&
      !read.contains("role") && !read.contains("tool") && !read.contains("ts:"),
      s"scan not pruned to live columns: $read")
    // the salted variant DOES have exactly its one explicit exchange
    val ps = graft.pipeline.Pipeline.extractTurnsSalted(turns, 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(ps).size >= 1, ps)
  }

  test("driver contract: SparkEntry.entry returns rows; every oracle key has a query") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("ordered output is invariant to input partitioning and the salt shuffle") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("plan-inv").toString
    graft.pipeline.Pipeline.synthTurns(spark, 200L, 7).write.mode("overwrite").parquet(tmp)
    def json(ds: org.apache.spark.sql.Dataset[graft.core.ExtractedTurn]): Seq[String] =
      graft.pipeline.Pipeline.ordered(ds)
        .collect().map(graft.core.Json.responseJson).toSeq
    val turns1 = spark.read.parquet(tmp).as[graft.core.TurnInput]
    val turns2 = spark.read.parquet(tmp).repartition(13).as[graft.core.TurnInput]
    val a = json(graft.pipeline.Pipeline.extractTurns(turns1))
    val b = json(graft.pipeline.Pipeline.extractTurns(turns2))
    val c = json(graft.pipeline.Pipeline.extractTurnsSalted(turns1, 11))
    assert(a == b, "repartitioned input changed the ordered output")
    assert(a == c, "salted variant changed the ordered output")
    assert(a.nonEmpty)
  }

  test("SparkSessionExtensions path: long_array_dot callable from spark.sql") {
    org.apache.spark.sql.graftx.GraftFunctions.install(spark)
    val d = spark.sql("SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(d == 4L + 10L + 18L)
    // the builder-time injector wires the same description
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("ANN broadcasts the query set, never the candidate table") {
    // At 100 TB the candidate table must STREAM through the join; only
    // the (tiny, filtered) query set may ride a BroadcastExchange.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    for (name <- Seq("q_ann_ivf", "q_ann_topk")) {
      val exec = Relational.queries(name)(spark, dir).queryExecution.sparkPlan
      val builds = exec.collect {
        case j: BroadcastHashJoinExec =>
          if (j.buildSide == BuildRight) j.right else j.left
        case j: BroadcastNestedLoopJoinExec =>
          if (j.buildSide == BuildRight) j.right else j.left
      }
      assert(builds.nonEmpty, s"$name: no broadcast join in\n$exec")
      builds.foreach { b =>
        val t = b.toString
        assert(t.contains("vec_id") && t.contains("< 10"),
          s"$name: broadcast build side is not the filtered query set:\n$t")
      }
    }
    // and the IVF variant joins on the inverted-list id (hash, not NLJ)
    val ivf = Relational.queries("q_ann_ivf")(spark, dir).queryExecution.sparkPlan.toString
    assert(ivf.contains("BroadcastHashJoin"), ivf)
  }

  test("custom LongArrayDot participates in whole-stage codegen (no CodegenFallback)") {
    val p = Relational.queries("q_ann_topk")(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("long_array_dot") || p.contains("longarraydot") ||
      p.toLowerCase.contains("long_array_dot"), p.take(2000))
  }
}

package graft

import org.apache.spark.sql.functions._

/** The two shuffle-elimination layouts a 100 TB join survives on:
  * (1) bucketed tables — both sides pre-hashed into the same bucket
  * count on the join key, so the sort-merge join reads co-located
  * buckets with ZERO exchange (the shuffle was paid once at write
  * time and is amortized over every future join); (2) runtime
  * bloom-filter pruning — a selective dim filter is turned into a
  * bloom filter applied at the fact scan, so non-joining fact rows
  * die before the shuffle instead of after it. Both are plan gates:
  * a regression is a performance bug at scale even when results stay
  * correct. */
class BucketJoinSpec extends SparkSuite {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    (0L until 20000L).map(i => (i % 512, s"a$i")).toDF("k", "va")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_a")
    (0L until 20000L).map(i => (i % 512, s"b$i")).toDF("k", "vb")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucket_b")
    try withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // semantics unchanged: 512 keys × (20000/512 ≈ 39|40)² pairings
      val n = j.count()
      assert(n == 512, s"joined key count $n")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bloom").toString
    (0L until 200000L).map(i => (i % 4096, i)).toDF("k", "payload")
      .write.mode("overwrite").parquet(s"$tmp/fact")
    (0L until 4096L).map(i => (i, s"dim$i")).toDF("k", "attr")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local test files are tiny; drop the size gates so the rewrite
      // fires the way it would on a 100 TB fact side
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").filter(col("attr") === "dim7")
      val j = fact.join(dim, "k")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$plan")
      // keys below 200000 % 4096 = 3264 carry the remainder row
      assert(j.count() == 200000L / 4096 + 1)
    }
  }
}

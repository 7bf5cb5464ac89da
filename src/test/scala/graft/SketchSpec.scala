package graft

import org.apache.spark.sql.functions._
import graft.core.Sketches

/** The two from-scratch sketches: Misra-Gries heavy hitters must be
  * EXACT after the recount pass (the sketch only bounds the candidate
  * set), and HyperLogLog must estimate within its published error bands
  * once the standard small-range correction is applied. Both suites run
  * on synthetic high-cardinality corpora that actually stress the
  * sketch (the testdata vocabulary is ~31 tokens — too small to force
  * MG decrements or fill HLL registers). */
class SketchSpec extends SparkSuite {

  test("MG heavy hitters: exact result + candidate superset on a skewed corpus") {
    import spark.implicits._
    // 5k distinct noise tokens (freq 1-2) + 5 heavy tokens ≫ N/k —
    // forces MG decrement rounds at cap=64 in every partition
    val rnd = new scala.util.Random(42)
    val noise = (0 until 12000).map(_ => s"n${rnd.nextInt(5000)}")
    val heavy = (0 until 5).flatMap(i => Seq.fill(700)(s"H$i"))
    val toks = rnd.shuffle(noise ++ heavy)
    val df = spark.createDataset(toks).toDF("tok").repartition(8)
    val n = toks.size.toLong
    val k = 30L
    val got = Sketches.heavyHitters(df, cap = 64, k = k)
      .as[(String, Long)].collect().toMap
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / k).toMap
    assert(got == exact, s"heavy hitters diverged: got $got expected $exact")
    assert(exact.keySet == (0 until 5).map(i => s"H$i").toSet)
    // the MG candidate key union must cover every true heavy hitter
    val cand = Sketches.mgCandidates(df.as[String], 64)
      .as[String].collect().toSet
    assert(exact.keySet.subsetOf(cand))
  }

  test("bloom filter has NO false negatives; false positives stay plausible") {
    // engine-vs-oracle equality (the CORRECTNESS row) proves the two
    // engines agree; this asserts the SKETCH property itself: every
    // true member probes positive (n_pos - n_fp == n_members exactly),
    // on every nation's filter
    val rows = graft.queries.Relational.queries("q_sketch_bloom")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 25)
    for (r <- rows) {
      val (nMembers, nPos, nFp) =
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_fp"))
      assert(nPos - nFp == nMembers,
        s"false negative on nation ${r.get(0)}: pos=$nPos fp=$nFp members=$nMembers")
    }
    // 2 hashes into 256 bits with ~6 members/nation: FP rate must stay
    // far below saturation (sanity band, not a tight bound)
    val totFp = rows.map(_.getAs[Long]("n_fp")).sum
    val totProbe = rows.map(_.getAs[Long]("n_probes")).sum
    assert(totFp * 100 < totProbe, s"bloom saturated: $totFp fp / $totProbe probes")
  }

  test("MG final output is partitioning-invariant (1 vs 16 partitions)") {
    import spark.implicits._
    val toks = (0 until 3000).map(i => s"t${i % 40}") ++ Seq.fill(500)("hot")
    val df = spark.createDataset(toks).toDF("tok")
    def run(parts: Int) =
      Sketches.heavyHitters(df.repartition(parts), cap = 50, k = 20L)
        .as[(String, Long)].collect().toSortedMap
    assert(run(1) == run(16))
  }

  test("HLL raw estimate within 3σ (≈39%) on 20k distinct values") {
    import spark.implicits._
    val df = spark.createDataset((0 until 20000).map(i => s"uniq-$i")).toDF("tok")
    val row = Sketches.hllSketch(df).collect().head
    val est = row.getAs[Double]("hll_est")
    // m=64 → relative standard error 1.04/√64 = 13%; assert 3σ
    assert(math.abs(est - 20000) / 20000.0 < 0.39, s"raw HLL est $est")
  }

  test("HLL + small-range correction lands within 25% on the testdata vocab") {
    val toks = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.distinct().count()
    val row = Sketches.hllSketch(toks).collect().head
    val corrected = Sketches.corrected(
      row.getAs[Long]("m"), row.getAs[Long]("nonzero"), row.getAs[Double]("hll_est"))
    info(f"exact $exact, raw ${row.getAs[Double]("hll_est")}%.1f, corrected $corrected%.1f")
    assert(math.abs(corrected - exact) / exact.toDouble < 0.25)
  }

  implicit private class SortedMapOps(a: Array[(String, Long)]) {
    def toSortedMap: List[(String, Long)] = a.toList.sortBy(_._1)
  }
}

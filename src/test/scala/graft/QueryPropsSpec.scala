package graft

import org.apache.spark.sql.functions._

/** Cross-query and mechanism-level invariants for the statistical
  * operators — properties the DuckDB hash oracle cannot express
  * (it proves Spark ≡ DuckDB on one input; these prove the math is
  * the math).
  */
class QueryPropsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("DP geometric mechanism: exact dyadic inverse-CDF distribution over all 2^20 draws") {
    // mirror of the q_privacy_dp_hist draw: h20 -> (sign, magnitude)
    def mag(h20: Int): Int = {
      val q = 524288 / ((h20 / 2) + 1)
      63 - java.lang.Long.numberOfLeadingZeros(q.toLong).toInt // floor(log2 q)
    }
    val counts = new Array[Long](20)
    var signSum = 0L
    var h = 0
    while (h < (1 << 20)) {
      counts(mag(h)) += 1
      signSum += (if ((h & 1) == 1) 1 else -1)
      h += 1
    }
    // P(|noise| = j) = 2^-(j+1) exactly for j in [0, 18]
    for (j <- 0 to 18)
      assert(counts(j) == (1L << (19 - j)),
        s"mag=$j drew ${counts(j)}, expected ${1L << (19 - j)}")
    assert(counts(19) == 2) // the single hm = 0 point, both signs
    assert(signSum == 0)    // the sign bit is exactly balanced
  }

  test("growth accounting identities: DAU decomposition and churn balance") {
    val life = SparkEntry.queries("q_events_lifecycle")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent DAU per day
    val dau = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .distinct().groupBy("day").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(life.keySet == dau.keySet)
    for ((day, (nNew, nRet, nRes, _)) <- life)
      assert(nNew + nRet + nRes == dau(day),
        s"day $day: $nNew+$nRet+$nRes != DAU ${dau(day)}")
    // churn balance: churned(d) = DAU(d-1) - retained(d)
    for ((day, (_, nRet, _, nChurn)) <- life if dau.contains(day - 1))
      assert(nChurn == dau(day - 1) - nRet,
        s"day $day: churn $nChurn != DAU(d-1) ${dau(day - 1)} - retained $nRet")
  }

  test("Mann-Whitney AUC: exact tie-corrected value on a hand-computed example") {
    // arms a = [1, 2], b = [2, 3]: ranks 1, 2.5, 2.5, 4
    // U_a = (1 + 2.5) - 2*3/2 = 0.5; AUC = 0.5 / (2*2) = 0.125
    // replay of the query's value-grain doubled-rank pipeline
    val vals = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L)) // (arm, c)
    val grid = vals.groupBy(_._2).map { case (c, vs) =>
      (c, vs.count(_._1 == 0L).toLong, vs.count(_._1 == 1L).toLong)
    }.toSeq.sortBy(_._1)
    var cum = 0L
    var ranksum2 = 0L
    for ((_, na, nb) <- grid) {
      val n = na + nb
      ranksum2 += na * (2 * cum + n + 1)
      cum += n
    }
    val nA = vals.count(_._1 == 0L).toLong
    val nB = vals.count(_._1 == 1L).toLong
    val auc = (ranksum2.toDouble - nA * (nA + 1.0)) / (2.0 * nA * nB)
    assert(auc == 0.125)
    // and the registered query's AUC stays a probability on real data
    val rows = SparkEntry.queries("q_events_mann_whitney")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val a = r.getDouble(r.fieldIndex("auc"))
      assert(a >= 0.0 && a <= 1.0, s"AUC $a out of [0,1]")
    }
  }

  test("KS drift bounds and half accounting") {
    val rows = SparkEntry.queries("q_events_ks_drift")(spark, dir).collect()
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == nEvents)
    for (r <- rows) {
      val ks = r.getLong(r.fieldIndex("ks_ppm"))
      assert(ks >= 0L && ks <= 1000000L)
    }
  }

  test("IVF recall curve is monotone in nprobe and brute-consistent") {
    val rows = SparkEntry.queries("q_ann_ivf_recall")(spark, dir)
      .orderBy("nprobe").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(r => r.getLong(r.fieldIndex("recall_ppm")))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${recalls.mkString(",")}")
    for (r <- rows)
      assert(r.getLong(r.fieldIndex("hits")) <=
        r.getLong(r.fieldIndex("n_returned")))
  }
}

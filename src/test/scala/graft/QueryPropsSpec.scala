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

  test("KMV estimator lands within the k=64 error envelope on every source") {
    // KMV's relative standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64;
    // assert every per-source estimate is within 5 RSE (a 64% bound —
    // loose enough to be draw-independent, tight enough to catch a
    // broken estimator by orders of magnitude) and that the estimator
    // path actually runs (every source above k distinct hashes).
    val rows = SparkEntry.queries("q_sketch_kmv")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nh = r.getLong(r.fieldIndex("n_hashes"))
      val err = r.getLong(r.fieldIndex("err_ppm"))
      assert(nh > 64, s"estimator path not exercised: n_hashes=$nh")
      assert(err <= 640000L, s"KMV err $err ppm exceeds 5 RSE envelope")
    }
  }

  test("bottom-k jaccard estimate brackets the exact value within the k envelope") {
    val r = SparkEntry.queries("q_sketch_bottomk_jaccard")(spark, dir).collect()(0)
    assert(r.getLong(r.fieldIndex("k_used")) == 128L, "union smaller than k")
    // binomial s.e. at k=128 is sqrt(J(1-J)/128) <= 4.4%; allow 5 s.e.
    assert(r.getLong(r.fieldIndex("err_ppm")) <= 221000L,
      s"bottom-k err ${r.getLong(r.fieldIndex("err_ppm"))} ppm out of envelope")
  }

  test("count-sketch: collisions present, median estimate sane, sign symmetry") {
    val rows = SparkEntry.queries("q_sketch_countsketch")(spark, dir).collect()
    assert(rows.length == 20)
    // width 16 on a ~31-token vocabulary MUST collide somewhere
    assert(rows.exists(r => r.getLong(r.fieldIndex("err")) != 0L),
      "no collisions — sketch degenerated to identity")
    for (r <- rows) {
      val c = r.getLong(r.fieldIndex("c_exact"))
      val est = r.getLong(r.fieldIndex("cs_est"))
      // a colliding cell adds at most the F1 mass of its bucket; the
      // median over 5 rows keeps the estimate within ±2× of truth on
      // this corpus (empirically ±1×; 2× catches sign/index bugs)
      assert(math.abs(est - c) <= 2 * c,
        s"count-sketch estimate $est vs exact $c out of envelope")
    }
  }

  test("b-bit minhash: estimates correlate with exact jaccard on candidates") {
    val rows = SparkEntry.queries("q_dedup_minhash_bbit")(spark, dir).collect()
    assert(rows.length > 100)
    val pairs = rows.map(r => (r.getLong(r.fieldIndex("est_ppm")),
      r.getLong(r.fieldIndex("exact_ppm"))))
    // mean estimate error under b=1 is bounded by the binomial noise of
    // 32 bits (~2/sqrt(32) ≈ 35% worst case post 2a-1 unclamping);
    // assert the MEAN abs error stays under 200k ppm — a broken sign or
    // band would blow this by 3×
    val meanErr = pairs.map(p => math.abs(p._1 - p._2)).sum.toDouble / pairs.length
    assert(meanErr <= 200000.0, s"b-bit mean err $meanErr ppm")
    // and the estimator must separate high-J from low-J candidates:
    // mean est on the top exact-J quartile > mean est on the bottom
    val sorted = pairs.sortBy(_._2)
    val q = pairs.length / 4
    val lo = sorted.take(q).map(_._1).sum.toDouble / q
    val hi = sorted.takeRight(q).map(_._1).sum.toDouble / q
    assert(hi > lo, s"no separation: hi=$hi lo=$lo")
  }

  test("hamming knn recall is positive and bounded; binary path returns 5 per query") {
    val rows = SparkEntry.queries("q_embed_hamming_knn")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getLong(r.fieldIndex("n_overlap"))
      assert(n >= 0L && n <= 5L)
      assert(r.getLong(r.fieldIndex("recall_ppm")) == n * 1000000L / 5L)
    }
    // sign-bit hamming must beat random top-5 overlap on average
    // (random would be ~5/(nVec-1) ≈ 1%): require mean recall >= 10%
    val mean = rows.map(r => r.getLong(r.fieldIndex("recall_ppm"))).sum /
      rows.length
    assert(mean >= 100000L, s"mean hamming recall $mean ppm — signatures broken?")
  }
}

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
    val recalls = rows.map(r => r.getDecimal(r.fieldIndex("recall_ppm")).longValueExact())
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

  test("ROC-AUC: separated score construction beats random, agrees with gains capture") {
    val r = SparkEntry.queries("q_eval_auc")(spark, dir).collect()(0)
    val auc = r.getLong(r.fieldIndex("auc_ppm"))
    // the +400 class shift over 0..999 noise puts true AUC ≈ 0.66;
    // assert strictly better than random and below perfect
    assert(auc > 550000L && auc < 950000L, s"auc_ppm=$auc out of band")
    // the gains table must capture everything by decile 10 and be
    // monotone in cumulative capture
    val g = SparkEntry.queries("q_eval_gains")(spark, dir)
      .orderBy("decile").collect()
    val caps = g.map(x => x.getLong(x.fieldIndex("capture_ppm")))
    assert(caps.last == 1000000L, s"final capture ${caps.last}")
    assert(caps.sliding(2).forall(p => p(0) <= p(1)), caps.mkString(","))
    // decile 1 (highest scores) must over-capture (lift > 1)
    assert(g.head.getLong(g.head.fieldIndex("lift_ppm")) > 1000000L)
  }

  test("calibrated-by-construction draw keeps every ECE bin gap small") {
    val rows = SparkEntry.queries("q_eval_ece")(spark, dir).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val n = r.getLong(r.fieldIndex("n"))
      val gap = r.getLong(r.fieldIndex("gap_ppm"))
      // binomial s.e. at bin width 0.1: sqrt(p(1-p)/n) <= 0.5/sqrt(n);
      // allow 6 s.e. in ppm
      val bound = math.max(60000L, (3000000.0 / math.sqrt(n.toDouble)).toLong)
      assert(gap <= bound, s"bin gap $gap ppm > $bound (n=$n)")
    }
  }

  test("EMD is a metric on the binned histograms: zero on identical, positive here") {
    val r = SparkEntry.queries("q_events_emd")(spark, dir).collect()(0)
    val emd = r.getLong(r.fieldIndex("emd_bins_ppm"))
    // value distributions of click vs purchase differ but share range:
    // 0 < EMD < 251 bins (the diameter of the support)
    assert(emd > 0L && emd < 251000000L, s"emd=$emd")
  }

  test("wilcoxon W2+ is bounded by the 2-scaled total; runs count bounded by n") {
    for (r <- SparkEntry.queries("q_events_wilcoxon")(spark, dir).collect()) {
      val w2 = r.getLong(r.fieldIndex("w2_plus"))
      val tot = r.getLong(r.fieldIndex("w2_total"))
      assert(w2 >= 0L && w2 <= tot, s"w2_plus=$w2 total=$tot")
    }
    for (r <- SparkEntry.queries("q_events_runs_test")(spark, dir).collect()) {
      val runs = r.getLong(r.fieldIndex("runs"))
      val n = r.getLong(r.fieldIndex("n"))
      assert(runs >= 1L && runs <= n, s"runs=$runs n=$n")
    }
  }

  test("chao1 >= observed richness; good-turing discounts singletons") {
    for (r <- SparkEntry.queries("q_text_chao1")(spark, dir).collect()) {
      val sObs = r.getLong(r.fieldIndex("s_obs"))
      val chao = r.getLong(r.fieldIndex("chao1_ppm"))
      assert(chao >= sObs * 1000000L, s"chao1 $chao < s_obs $sObs")
      // the estimator must actually estimate (singletons exist)
      assert(r.getLong(r.fieldIndex("f1")) > 0L, "no singletons — dead estimator")
    }
    val gt = SparkEntry.queries("q_text_good_turing")(spark, dir).collect()
      .filter(r => r.getLong(r.fieldIndex("r")) == 1L)
    assert(gt.nonEmpty)
    // r*=2·N2/N1 < 1 ppm-scaled iff N2 < N1/2 — not universal; instead
    // pin the structural fact: rstar is (r+1)·N_{r+1}/N_r exactly
    for (r <- gt) {
      val nr = r.getLong(r.fieldIndex("n_r"))
      val nn = r.getLong(r.fieldIndex("n_next"))
      assert(r.getLong(r.fieldIndex("rstar_ppm")) == 2L * nn * 1000000L / nr)
    }
  }

  test("trimmed mean sits between the min and max of the kept middle; ring is balanced") {
    for (r <- SparkEntry.queries("q_agg_trimmed")(spark, dir).collect()) {
      val n = r.getLong(r.fieldIndex("n_kept"))
      val sum = r.getLong(r.fieldIndex("sum_kept"))
      val mean = r.getLong(r.fieldIndex("trimmed_mean_cents_ppm"))
      assert(mean == sum * 1000000L / n)
    }
    // consistent hashing with 16 vnodes/shard balances within ~4x of
    // ideal (md5 draws are fixed, so this is a deterministic fact of
    // the committed ring, not a statistical gamble)
    val ring = SparkEntry.queries("q_sample_consistent_hash")(spark, dir).collect()
    assert(ring.map(_.getLong(1)).sum > 0)
    val loads = ring.map(_.getLong(1))
    assert(loads.max <= 4 * math.max(1L, loads.min),
      s"ring badly imbalanced: ${loads.mkString(",")}")
  }

  test("session-11 invariants: greedy curves, conformal floor, sketch error bound") {
    // k-center: farthest-point separation is positive and monotone
    // NON-INCREASING round over round (the 2-approximation's radius
    // curve — if it ever rose, the argmax picked a non-farthest point)
    val kc = SparkEntry.queries("q_sample_kcenter")(spark, dir)
      .orderBy("round").collect()
    assert(kc.length == 5)
    val seps = kc.drop(1).map(r => r.getLong(r.fieldIndex("sep2")))
    assert(seps.forall(_ > 0), s"degenerate picks: ${seps.mkString(",")}")
    assert(seps.sliding(2).forall(p => p(0) >= p(1)),
      s"radius curve rose: ${seps.mkString(",")}")
    // max-coverage: marginal gains are positive and non-increasing
    // (submodularity made observable), and the running sum closes
    val mc = SparkEntry.queries("q_docs_maxcover")(spark, dir)
      .orderBy("round").collect()
    val gains = mc.map(r => r.getLong(r.fieldIndex("gain")))
    assert(gains.forall(_ > 0) && gains.sliding(2).forall(p => p(0) >= p(1)),
      s"gain curve not submodular: ${gains.mkString(",")}")
    assert(mc.last.getLong(mc.last.fieldIndex("covered_cum")) == gains.sum)
    // split conformal: the ≥90%-in-expectation guarantee, allowed a
    // finite-sample draw-down to 80% on the tiny per-type test halves
    for (r <- SparkEntry.queries("q_eval_conformal")(spark, dir).collect()) {
      val cov = r.getLong(r.fieldIndex("coverage_ppm"))
      assert(cov >= 800000L && cov <= 1000000L, s"conformal coverage $cov")
    }
    // join-size estimate: the key-sampling path actually fires
    val je = SparkEntry.queries("q_join_size_estimate")(spark, dir).collect()(0)
    assert(je.getLong(je.fieldIndex("n_sampled")) >= 1, "sampler never sampled")
    assert(je.getLong(je.fieldIndex("est_pairs")) > 0, "estimate collapsed to 0")
    // histogram-quantile sketch: the audit column must sit inside the
    // provable envelope err ∈ [0, width) for BOTH quantiles
    for (r <- SparkEntry.queries("q_agg_quantile_sketch")(spark, dir).collect();
         c <- Seq("err_p50", "err_p90")) {
      val w = r.getLong(r.fieldIndex("width"))
      val e = r.getLong(r.fieldIndex(c))
      assert(e >= 0 && e < w, s"$c=$e outside [0,$w)")
    }
  }

  test("session-12 invariants: divergence bounds, spectral/memory sanity, estimator audits") {
    // PSI terms are pointwise non-negative ((p−q)·ln(p/q) ≥ 0 always)
    // and the published total is exactly the per-type term sum
    val psi = SparkEntry.queries("q_eval_psi")(spark, dir).collect()
    assert(psi.forall(_.getLong(psi.head.fieldIndex("term_e6")) >= 0))
    for ((et, rows) <- psi.groupBy(_.getString(0)))
      assert(rows.map(_.getLong(rows.head.fieldIndex("term_e6"))).sum ==
        rows.head.getLong(rows.head.fieldIndex("psi_e6")), s"psi sum broke for $et")
    // JSD is bounded by ln 2 (smoothing keeps both dists normalized)
    for (r <- SparkEntry.queries("q_text_jsd")(spark, dir).collect()) {
      val j = r.getLong(r.fieldIndex("jsd_e8"))
      assert(j >= 0 && j <= 69314719L, s"jsd $j outside [0, ln2]")
    }
    // periodogram: power is a squared relative amplitude — within
    // [0, 1e6] ppm, and the DC-free component can't exceed the total
    for (r <- SparkEntry.queries("q_events_periodogram")(spark, dir).collect()) {
      val p = r.getDouble(r.fieldIndex("power_ppm"))
      assert(p >= 0 && p <= 1000000.0, s"power $p")
      val tot = r.getLong(r.fieldIndex("total")) * 1000000L
      assert(math.abs(r.getLong(r.fieldIndex("a"))) <= tot &&
        math.abs(r.getLong(r.fieldIndex("b"))) <= tot)
    }
    // Hurst: R/S grows with the window (H > 0) and the iid-ish synth
    // series lands in the sane (0, 1.2) band
    for (r <- SparkEntry.queries("q_events_hurst")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("rs16_e6")) <
        r.getLong(r.fieldIndex("rs64_e6")), "R/S did not grow with n")
      val h = r.getDouble(r.fieldIndex("hurst"))
      assert(h > 0 && h < 1.2, s"hurst $h")
    }
    // logloss: the md5 scorer is calibrated by construction, so its
    // cross-entropy must beat the base-rate entropy
    val ll = SparkEntry.queries("q_eval_logloss")(spark, dir).collect()(0)
    assert(ll.getDecimal(ll.fieldIndex("logloss_e6")).longValueExact() <
      ll.getLong(ll.fieldIndex("baseline_e6")), "calibrated scorer lost to base rate")
    // power law: MLE alpha > 1 by construction; the share column is a
    // floored partition of unity
    val pl = SparkEntry.queries("q_graph_powerlaw")(spark, dir).collect()
    assert(pl.forall(r => r.isNullAt(r.fieldIndex("alpha_e6")) ||
      r.getLong(r.fieldIndex("alpha_e6")) > 1000000L))
    val shares = pl.map(r => r.getLong(r.fieldIndex("share_ppm"))).sum
    assert(shares <= 1000000L && shares >= 1000000L - pl.length)
    // t-closeness: t = ½·L1 ∈ [0, 1] (a singleton class concentrated
    // on one of k sources reaches (k−1)/k, so the cap is 1, not ½)
    for (r <- SparkEntry.queries("q_privacy_tcloseness")(spark, dir).collect()) {
      val tp = r.getLong(r.fieldIndex("t_ppm"))
      assert(tp >= 0 && tp <= 1000000L, s"t $tp outside [0, 1e6]")
    }
    // silhouette: scores live in [−1, 1] and the mean sits inside the
    // published min/max envelope
    for (r <- SparkEntry.queries("q_ann_silhouette")(spark, dir).collect()) {
      val (mn, s, mx) = (r.getLong(r.fieldIndex("min_s_e6")),
        r.getLong(r.fieldIndex("sil_e6")), r.getLong(r.fieldIndex("max_s_e6")))
      assert(-1000000L <= mn && mn <= s && s <= mx && mx <= 1000000L,
        s"silhouette envelope broke: $mn $s $mx")
    }
    // seasonal index: each slot mean sits inside its own min/max and
    // is a positive ratio-to-trend
    for (r <- SparkEntry.queries("q_events_seasonal_index")(spark, dir).collect()) {
      val (mn, ix, mx) = (r.getLong(r.fieldIndex("min_ppm")),
        r.getLong(r.fieldIndex("index_ppm")), r.getLong(r.fieldIndex("max_ppm")))
      assert(ix > 0 && mn <= ix && ix <= mx, s"seasonal envelope broke: $mn $ix $mx")
    }
    // k-truss: every surviving edge carries ≥ 2 triangles and the
    // truss is a subgraph of the raw pair set
    val kt = SparkEntry.queries("q_graph_ktruss")(spark, dir).collect()
    assert(kt.forall(_.getLong(2) >= 2L), "sub-truss edge survived")
    assert(kt.length.toLong <=
      SparkEntry.queries("q_dedup_simhash_pairs")(spark, dir).count())
    // Horvitz–Thompson: the sample never exceeds the frame and a
    // non-empty sample yields a positive estimate
    for (r <- SparkEntry.queries("q_sample_horvitz")(spark, dir).collect()) {
      val (nd, ns) = (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_sampled")))
      assert(ns <= nd)
      if (ns > 0) assert(r.getLong(r.fieldIndex("ht_total")) > 0)
    }
    // MaxSim: ranks are a clean 1..k prefix per query and scores are
    // non-increasing down each ranking
    val mx = SparkEntry.queries("q_ann_maxsim")(spark, dir).collect()
    for ((q, rows0) <- mx.groupBy(_.getLong(0))) {
      val rows = rows0.sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq, s"ranks broke for $q")
      val ms = rows.map(r => r.getLong(r.fieldIndex("maxsim")))
      assert(ms.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"maxsim not sorted for $q")
    }
    // systematic PPS: each source draws its ~20 design hits (stride
    // arithmetic guarantees 19..21), multiplicities are positive, and
    // the Hansen–Hurwitz doc-count estimate is positive
    val pps = SparkEntry.queries("q_sample_pps")(spark, dir).collect()
    assert(pps.forall(_.getLong(pps.head.fieldIndex("mult")) >= 1))
    for ((src, rows) <- pps.groupBy(_.getString(0))) {
      val nSel = rows.head.getLong(rows.head.fieldIndex("n_selected"))
      assert(nSel >= 19 && nSel <= 21, s"pps drew $nSel for $src")
      assert(rows.head.getLong(rows.head.fieldIndex("hh_est")) > 0)
    }
    // shot segmentation: shots partition the frames (1 ≤ n_shots ≤
    // n_frames, max shot ≤ n_frames)
    for (r <- SparkEntry.queries("q_media_shots")(spark, dir).collect()) {
      val (nf, ns, mxl) = (r.getLong(r.fieldIndex("n_frames")),
        r.getLong(r.fieldIndex("n_shots")), r.getLong(r.fieldIndex("max_shot_len")))
      assert(ns >= 1 && ns <= nf && mxl >= 1 && mxl <= nf, s"shots broke: $nf $ns $mxl")
    }
    // recursive walk: depth-0 has one row per doc and the deepest
    // level is log₃-bounded
    val rec = SparkEntry.queries("q_sql_recursive")(spark, dir)
      .orderBy("depth").collect()
    assert(rec.head.getLong(0) == 0L)
    assert(rec.head.getLong(rec.head.fieldIndex("n_nodes")) ==
      rec.head.getLong(rec.head.fieldIndex("n_docs")))
    assert(rec.length <= 14, s"walk too deep: ${rec.length}")
    // Heaps: vocab is cumulative-monotone per source and never exceeds
    // tokens seen; the fitted exponent (when present) is in (0, 1]
    val hp = SparkEntry.queries("q_text_heaps")(spark, dir).collect()
    for ((src, rows0) <- hp.groupBy(_.getString(0))) {
      val rows = rows0.sortBy(_.getLong(1))
      val vocabs = rows.map(_.getLong(rows.head.fieldIndex("vocab")))
      assert(vocabs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"vocab curve fell for $src")
      for (r <- rows) {
        assert(r.getLong(r.fieldIndex("vocab")) <=
          r.getLong(r.fieldIndex("tokens_seen")))
        if (!r.isNullAt(r.fieldIndex("heaps_b_e6"))) {
          // b = 0 is legal: the ~31-word synth vocab saturates between
          // checkpoints at tiny SFs (the session-9 degenerate-data
          // lesson — sublinearity, not growth, is the invariant)
          val b = r.getLong(r.fieldIndex("heaps_b_e6"))
          assert(b >= 0 && b <= 1000000L, s"heaps b $b for $src")
        }
      }
    }
  }

  test("session-13 invariants: isotonic monotonicity, tau bounds, RDD sides, hazard accumulation") {
    // isotonic: the PAV fit is nondecreasing across bins (the entire
    // point of the operator), each fitted value comes from an interval
    // that covers its bin, and rates live in [0, 1e6] ppm
    val iso = SparkEntry.queries("q_eval_isotonic")(spark, dir)
      .orderBy("bin").collect()
    val isoV = iso.map(_.getLong(iso.head.fieldIndex("iso_ppm")))
    assert(isoV.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"isotonic fit not monotone: ${isoV.mkString(",")}")
    for (r <- iso) {
      val (bin, jb, kb) = (r.getLong(r.fieldIndex("bin")),
        r.getLong(r.fieldIndex("jb")), r.getLong(r.fieldIndex("kb")))
      assert(jb <= bin && bin <= kb, s"interval [$jb,$kb] misses bin $bin")
      assert(r.getLong(r.fieldIndex("raw_ppm")) >= 0 &&
        r.getLong(r.fieldIndex("raw_ppm")) <= 1000000L)
      assert(r.getLong(r.fieldIndex("iso_ppm")) >= 0 &&
        r.getLong(r.fieldIndex("iso_ppm")) <= 1000000L)
    }
    // kendall: tau_b ∈ [−1, 1] and the concordance partition never
    // exceeds the pair count
    for (r <- SparkEntry.queries("q_events_kendall")(spark, dir).collect()) {
      val tau = r.getDouble(r.fieldIndex("tau_b"))
      assert(tau >= -1.0 && tau <= 1.0, s"tau $tau")
      val parts = Seq("nc", "nd", "tx", "ty").map(c => r.getLong(r.fieldIndex(c))).sum
      assert(parts <= r.getLong(r.fieldIndex("n_pairs")), "concordance partition overflow")
    }
    // RDD: both sides populated (the 30-day window splits 15/15 by
    // construction) and the effect is exactly right − left
    for (r <- SparkEntry.queries("q_events_rdd")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("n_left")) > 0 &&
        r.getLong(r.fieldIndex("n_right")) > 0, "an RDD side is empty")
      val (yl, yr, eff) = (r.getDouble(r.fieldIndex("yhat_left")),
        r.getDouble(r.fieldIndex("yhat_right")), r.getDouble(r.fieldIndex("effect")))
      assert(math.abs((yr - yl) - eff) < 1e-4, s"effect $eff != $yr - $yl")
    }
    // Nelson–Aalen: risk set shrinks as t grows, hazards live in
    // [0, 1], and the cumulative hazard is nondecreasing and at least
    // the final step's own hazard
    val na = SparkEntry.queries("q_events_nelson_aalen")(spark, dir)
      .orderBy("t").collect()
    val risks = na.map(_.getLong(na.head.fieldIndex("n_risk")))
    assert(risks.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "risk set grew with t")
    val cums = na.map(_.getDouble(na.head.fieldIndex("cumhaz")))
    assert(cums.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-9),
      "cumulative hazard fell")
    for (r <- na) {
      val hz = r.getDouble(r.fieldIndex("hazard"))
      assert(hz >= 0.0 && hz <= 1.0, s"hazard $hz")
      assert(r.getDouble(r.fieldIndex("cumhaz")) >= hz - 1e-9)
    }
    // DTW: warping can only reduce cost, so 0 ≤ dtw ≤ l1 (the
    // identity alignment is one admissible path), and the profile
    // shares bound any cell cost by 1e6
    for (r <- SparkEntry.queries("q_events_dtw")(spark, dir).collect()) {
      val (l1, dtw) = (r.getLong(r.fieldIndex("l1")), r.getLong(r.fieldIndex("dtw")))
      assert(dtw >= 0 && dtw <= l1, s"dtw $dtw outside [0, l1=$l1]")
      assert(l1 <= 7L * 1000000L, s"l1 $l1 exceeds the share bound")
    }
    // Holt: the published forecast is exactly level + 7·trend (modulo
    // the 1e-6 rounding of each term) and the level sits inside the
    // observed daily-count range (a convex-combination smoother
    // cannot escape the data's hull when trend contributions stay
    // bounded — allow a loose envelope)
    for (r <- SparkEntry.queries("q_events_holt")(spark, dir).collect()) {
      val (l, b, f) = (r.getDouble(r.fieldIndex("level")),
        r.getDouble(r.fieldIndex("trend")), r.getDouble(r.fieldIndex("forecast7")))
      assert(math.abs((l + 7 * b) - f) < 1e-4, s"forecast $f != $l + 7*$b")
      assert(r.getLong(r.fieldIndex("n_days")) >= 2, "degenerate series")
    }
    // Hilbert layout: every bucket's h-range sits inside its own 1024
    // slot, coordinates stay on the 256-grid, and the bucket counts
    // sum to the table
    val hl = SparkEntry.queries("q_layout_hilbert")(spark, dir).collect()
    var hn = 0L
    for (r <- hl) {
      val b = r.getLong(r.fieldIndex("hbucket"))
      assert(r.getLong(r.fieldIndex("h_min")) >= b * 1024 &&
        r.getLong(r.fieldIndex("h_max")) < (b + 1) * 1024, s"h escaped bucket $b")
      for (c <- Seq("x_min", "x_max", "y_min", "y_max")) {
        val v = r.getLong(r.fieldIndex(c))
        assert(v >= 0 && v <= 255, s"$c=$v off-grid")
      }
      hn += r.getLong(r.fieldIndex("n"))
    }
    assert(hn == SparkEntry.queries("q_scan_filter")(spark, dir).sparkSession
      .read.parquet(s"$dir/lineitem.parquet").count(), "bucket counts lost rows")
    // Fellegi–Sunter: decisions respect the integer thresholds and the
    // all-agree pattern outweighs the all-disagree pattern
    val fsr = SparkEntry.queries("q_join_fellegi")(spark, dir).collect()
    for (r <- fsr) {
      val w = r.getLong(r.fieldIndex("weight_e6"))
      val d = r.getString(r.fieldIndex("decision"))
      val expect = if (w >= 4000000L) "link" else if (w >= 0L) "possible" else "non_link"
      assert(d == expect, s"decision $d for weight $w")
      assert(r.getLong(r.fieldIndex("n_pairs")) > 0)
    }
    def wOf(b: Long, s2: Long, t2: Long): Option[Long] = fsr.find(r =>
      r.getLong(0) == b && r.getLong(1) == s2 && r.getLong(2) == t2)
      .map(_.getLong(fsr.head.fieldIndex("weight_e6")))
    for (hi2 <- wOf(1, 1, 1); lo <- wOf(0, 0, 0))
      assert(hi2 > lo, s"agree pattern $hi2 not above disagree $lo")
    // CDC: accounting identities hold, savings live in [0, 1e6), and
    // the near-dup corpus actually shares chunks somewhere
    val cdc = SparkEntry.queries("q_dedup_cdc")(spark, dir).collect()
    for (r <- cdc) {
      assert(r.getLong(r.fieldIndex("n_distinct_chunks")) <=
        r.getLong(r.fieldIndex("n_chunks")))
      assert(r.getLong(r.fieldIndex("distinct_tokens")) <=
        r.getLong(r.fieldIndex("total_tokens")))
      val sv = r.getLong(r.fieldIndex("savings_ppm"))
      assert(sv >= 0 && sv < 1000000L, s"savings $sv")
    }
    assert(cdc.exists(_.getLong(cdc.head.fieldIndex("savings_ppm")) > 0),
      "no source deduped at all on the near-dup corpus")
    // Shannon–Fano: the code is decodable (Kraft ≤ 1, i.e. the exact
    // 2^-40 numerator ≤ 2^40) and the Shannon bound holds:
    // H ≤ avg_len < H + 1 (both in the same e6 scale, rounding slop)
    for (r <- SparkEntry.queries("q_text_shannon_code")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("kraft_num")) <= (1L << 40),
        "Kraft inequality violated — code not decodable")
      val (h, a) = (r.getLong(r.fieldIndex("entropy_e6")),
        r.getLong(r.fieldIndex("avg_len_ppm")))
      assert(h <= a + 100 && a < h + 1000000L + 100,
        s"Shannon bound broke: H=$h avg=$a")
    }
    // LZ78: phrase count is positive and never exceeds the token count
    // (each phrase consumes ≥1 token); the repetitive synth corpus
    // must compress (ratio strictly < 1)
    for (r <- SparkEntry.queries("q_text_lz78")(spark, dir).collect()) {
      val (p2, tks) = (r.getLong(r.fieldIndex("lz_phrases")),
        r.getLong(r.fieldIndex("n_tokens")))
      assert(p2 > 0 && p2 <= tks, s"lz $p2 outside (0, $tks]")
      assert(r.getLong(r.fieldIndex("lz_ratio_ppm")) < 1000000L,
        "corpus did not compress at all")
    }
    // NW: global alignment score is bounded by 2·min(len) above
    // (all-match) and −(len_a+len_b) below (all-gap)
    for (r <- SparkEntry.queries("q_events_nw_align")(spark, dir).collect()) {
      val (la, lb, sc) = (r.getLong(r.fieldIndex("len_a")),
        r.getLong(r.fieldIndex("len_b")), r.getLong(r.fieldIndex("nw_score")))
      assert(sc <= 2 * math.min(la, lb) && sc >= -(la + lb),
        s"nw score $sc outside [-(${la + lb}), ${2 * math.min(la, lb)}]")
    }
    // Page–Hinkley: the alarm statistic m − min(m) is non-negative by
    // construction, the running minimum never exceeds 0 (it starts
    // there), and the alarm bit matches the threshold
    for (r <- SparkEntry.queries("q_events_page_hinkley")(spark, dir).collect()) {
      val (ph, mm) = (r.getDouble(r.fieldIndex("ph_stat")),
        r.getDouble(r.fieldIndex("m_min")))
      assert(ph >= -1e-9, s"ph $ph negative")
      assert(mm <= 1e-9, s"m_min $mm positive")
      assert((r.getLong(r.fieldIndex("alarm")) == 1L) == (ph > 50.0 + 1e-9) ||
        math.abs(ph - 50.0) < 1e-3, s"alarm inconsistent at ph=$ph")
    }
    // bandit replay: every day picks exactly one arm (chosen-day
    // counts sum to the corpus day span) and kept rewards are positive
    val br = SparkEntry.queries("q_events_bandit_replay")(spark, dir).collect()
    val daySpan = br.map(_.getLong(br.head.fieldIndex("days_chosen"))).sum
    assert(daySpan >= 28 && daySpan <= 31, s"policy covered $daySpan days")
    for (r <- br) {
      assert(r.getLong(r.fieldIndex("n_kept")) >=
        r.getLong(r.fieldIndex("days_chosen")))
      assert(r.getLong(r.fieldIndex("avg_reward_ppm")) > 0)
    }
    // Burrows' Delta: a mean of |z| differences is non-negative and
    // every pair scores over the full 20-word panel
    for (r <- SparkEntry.queries("q_text_burrows_delta")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("n_words")) == 20L)
      assert(r.getDouble(r.fieldIndex("delta")) >= 0.0)
    }
    // JL: the ±1 projection is unbiased (E[ratio] = 1e6), so the bulk
    // of the 200 pairs must land within ±40% of 1 (sd of a single
    // 16-dim ratio is ~0.35)
    val jl = SparkEntry.queries("q_embed_jl_distortion")(spark, dir).collect()
    val jlTotal = jl.map(_.getLong(jl.head.fieldIndex("n_pairs"))).sum
    val jlBulk = jl.filter { r =>
      val b = r.getLong(r.fieldIndex("bucket")); b >= 3 && b <= 6 }
      .map(_.getLong(jl.head.fieldIndex("n_pairs"))).sum
    assert(jlTotal > 100, s"only $jlTotal JL pairs")
    assert(jlBulk * 2 >= jlTotal, s"JL concentration broke: $jlBulk/$jlTotal in ±40%")
    for (r <- jl) assert(r.getLong(r.fieldIndex("min_ratio_ppm")) > 0)
    // matrix profile: exclusion zone respected, distances non-negative,
    // and each type yields n_days − 4 windows
    val mp = SparkEntry.queries("q_events_motif")(spark, dir).collect()
    for (r <- mp) {
      assert(math.abs(r.getLong(r.fieldIndex("i")) -
        r.getLong(r.fieldIndex("nn_j"))) >= 5, "exclusion zone violated")
      assert(r.getLong(r.fieldIndex("dist2")) >= 0)
    }
    for ((_, rows) <- mp.groupBy(_.getString(0)))
      assert(rows.length >= 20, s"only ${rows.length} windows")
    // l-diversity: entropy is bounded by ln(l_distinct) (max-entropy),
    // the flags are consistent with their definitions, and recursive
    // diversity implies at least 2 sensitive values
    for (r <- SparkEntry.queries("q_privacy_ldiversity")(spark, dir).collect()) {
      val (l, h) = (r.getLong(r.fieldIndex("l_distinct")),
        r.getLong(r.fieldIndex("entropy_e6")))
      assert(h >= 0 && h <= math.round(math.log(l.toDouble) * 1e6) + l,
        s"entropy $h above ln($l)")
      assert((r.getLong(r.fieldIndex("entropy_l2_ok")) == 1L) == (h >= 693147L))
      if (r.getLong(r.fieldIndex("recursive_c2l2_ok")) == 1L)
        assert(l >= 2, "recursive diversity with a single sensitive value")
    }
    // IPS: the correction direction is fixed — the policy picks arms
    // it favors, so the IPS per-decision value can't exceed the
    // kept-rows replay average (weights n_day/n >= 1 but the
    // denominator grows from kept rows to ALL decisions); both are
    // positive and the decision count dominates the kept count
    for (r <- SparkEntry.queries("q_events_ips")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("n_decisions")) >=
        r.getLong(r.fieldIndex("n_kept")))
      assert(r.getLong(r.fieldIndex("ips_value_ppm")) > 0)
      assert(r.getLong(r.fieldIndex("replay_value_ppm")) > 0)
    }
    // Smith–Waterman: a local score is never negative, never exceeds
    // 2·min(len), and DOMINATES the same pair's global NW score (local
    // alignment can always discard NW's penalized flanks)
    val nwByPair = SparkEntry.queries("q_events_nw_align")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(r.fieldIndex("nw_score")))
      .toMap
    for (r <- SparkEntry.queries("q_events_sw_align")(spark, dir).collect()) {
      val (la, lb, sc) = (r.getLong(r.fieldIndex("len_a")),
        r.getLong(r.fieldIndex("len_b")), r.getLong(r.fieldIndex("sw_score")))
      assert(sc >= 0 && sc <= 2 * math.min(la, lb), s"sw $sc out of range")
      val nw = nwByPair((r.getLong(0), r.getLong(1)))
      assert(sc >= nw, s"local $sc below global $nw")
    }
  }

  test("CDC chunking is insertion-robust: one inserted token disturbs at most 2 chunks") {
    import spark.implicits._
    // the same boundary/chunk expressions as q_dedup_cdc, applied to a
    // doc and its one-token-inserted twin — content-defined boundaries
    // must keep every chunk fingerprint except the (≤2) around the edit
    val text = (1 to 400).map(i => s"w${i % 97}tok$i").mkString(" ")
    val toks = text.split(" ")
    val edited = (toks.take(200) ++ Array("INSERTED") ++ toks.drop(200)).mkString(" ")
    val df = Seq(("orig", text), ("edit", edited)).toDF("which", "text")
      .select(col("which"), split(col("text"), " ").as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("bpos", expr(
        """filter(sequence(1L, n), i ->
          |  cast(conv(substring(md5(element_at(tk, cast(i as int))), 1, 6), 16, 10)
          |       as bigint) % 8 = 0)""".stripMargin))
      .withColumn("fp", expr(
        """transform(filter(
          |  zip_with(concat(array(1L), transform(bpos, p -> p + 1L)),
          |           concat(bpos, array(n)),
          |           (st, en) -> if(en >= st,
          |             array_join(slice(tk, cast(st as int),
          |                        cast(en - st + 1 as int)), ' '), null)),
          |  c -> c is not null), c -> substring(md5(c), 1, 16))""".stripMargin))
    val fps = df.select(col("which"), col("fp")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val (orig, edit) = (fps("orig"), fps("edit"))
    val lost = orig.toSet -- edit.toSet
    val gained = edit.toSet -- orig.toSet
    assert(lost.size <= 2 && gained.size <= 2,
      s"edit disturbed ${lost.size}+${gained.size} chunks — not content-defined")
    assert(orig.toSet.intersect(edit.toSet).size >= orig.size - 2)
  }

  test("session-14 invariants: eval-metric bounds, BWT permutation, APSP envelope") {
    // BLEU: clipped matches never exceed the candidate gram total,
    // precision stays in ppm range, corpus lengths are positive, and
    // every source carries all four n rows
    val bleu = SparkEntry.queries("q_eval_bleu")(spark, dir).collect()
    assert(bleu.groupBy(_.getString(0)).forall(_._2.length == 4))
    for (r <- bleu) {
      assert(r.getLong(r.fieldIndex("clip")) <= r.getLong(r.fieldIndex("tot")))
      assert(r.getLong(r.fieldIndex("prec_ppm")) >= 0 &&
        r.getLong(r.fieldIndex("prec_ppm")) <= 1000000L)
      assert(r.getLong(r.fieldIndex("cand_len")) > 0 &&
        r.getLong(r.fieldIndex("ref_len")) > 0)
    }
    // chrF: matches bounded by both totals; F2 lies between P and R
    // (harmonic-family mean), ±1 for the ppm floor rounding
    for (r <- SparkEntry.queries("q_eval_chrf")(spark, dir).collect()) {
      val m = r.getLong(r.fieldIndex("m"))
      assert(m <= r.getLong(r.fieldIndex("cand_total")) &&
        m <= r.getLong(r.fieldIndex("ref_total")))
      val (p, rc, f2) = (r.getLong(r.fieldIndex("prec_ppm")),
        r.getLong(r.fieldIndex("rec_ppm")), r.getLong(r.fieldIndex("f2_ppm")))
      assert(f2 >= math.min(p, rc) - 1 && f2 <= math.max(p, rc) + 1,
        s"F2 $f2 outside [$p, $rc]")
    }
    // ROUGE-L vs WER on the same pairs: lcs ≤ min(lens); the
    // Levenshtein distance obeys |Δlen| ≤ ed ≤ max(lens) and the LCS
    // sandwich max(lens) − lcs ≤ ed ≤ la + lb − 2·lcs
    val lcsByPair = SparkEntry.queries("q_eval_rouge_l")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(r.fieldIndex("lcs")))
      .toMap
    for (r <- SparkEntry.queries("q_eval_wer")(spark, dir).collect()) {
      val (lc, lr, ed) = (r.getLong(r.fieldIndex("len_c")),
        r.getLong(r.fieldIndex("len_r")), r.getLong(r.fieldIndex("edit_dist")))
      val lcs = lcsByPair((r.getString(0), r.getLong(1)))
      assert(lcs <= math.min(lc, lr), s"lcs $lcs exceeds min($lc,$lr)")
      assert(ed >= math.abs(lc - lr) && ed <= math.max(lc, lr))
      assert(ed >= math.max(lc, lr) - lcs && ed <= lc + lr - 2 * lcs,
        s"ed $ed outside LCS sandwich for lcs $lcs, lens ($lc,$lr)")
    }
    // Cliff's delta: the dominance partition is exact and the signed
    // effect stays in [−1, 1] ppm
    for (r <- SparkEntry.queries("q_events_cliffs_delta")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("gt")) + r.getLong(r.fieldIndex("lt")) +
        r.getLong(r.fieldIndex("ties")) ==
        r.getLong(r.fieldIndex("n_a")) * r.getLong(r.fieldIndex("n_b")))
      assert(math.abs(r.getLong(r.fieldIndex("delta_ppm"))) <= 1000000L)
    }
    // Fleiss: both agreement rates and kappa live in ppm range; both
    // instrument arms of the IV query are populated
    for (r <- SparkEntry.queries("q_eval_fleiss")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("pbar_ppm")) >= 0 &&
        r.getLong(r.fieldIndex("pbar_ppm")) <= 1000000L)
      assert(r.getLong(r.fieldIndex("pe_ppm")) >= 0 &&
        r.getLong(r.fieldIndex("pe_ppm")) <= 1000000L)
      assert(r.getLong(r.fieldIndex("kappa_ppm")) <= 1000000L)
    }
    for (r <- SparkEntry.queries("q_events_iv_wald")(spark, dir).collect())
      assert(r.getLong(r.fieldIndex("n1")) > 0 && r.getLong(r.fieldIndex("n0")) > 0)
    // BWT: the transform is a PERMUTATION of the input (sorted chars
    // equal) and run counts stay in [1, len]
    for (r <- SparkEntry.queries("q_text_bwt")(spark, dir).limit(100).collect()) {
      val bwt = r.getString(r.fieldIndex("bwt"))
      val sLen = r.getLong(r.fieldIndex("s_len"))
      assert(bwt.length == sLen)
      for (c <- Seq("runs_orig", "runs_bwt")) {
        val v = r.getLong(r.fieldIndex(c))
        assert(v >= 1 && v <= sLen, s"$c $v outside [1, $sLen]")
      }
    }
    // BWT char multiset check needs the source string — recompute one
    // doc's transform shape from the emitted columns instead: the
    // sentinel '!' appears exactly once in every BWT
    for (r <- SparkEntry.queries("q_text_bwt")(spark, dir).limit(100).collect())
      assert(r.getString(r.fieldIndex("bwt")).count(_ == '!') == 1)
    // soundex: codes are letter + 3 digits (1-6 then zero padding),
    // and the block never pairs a word with itself
    for (r <- SparkEntry.queries("q_join_soundex")(spark, dir).collect()) {
      assert(r.getString(r.fieldIndex("code")).matches("[A-Z][1-6]{0,3}0*") &&
        r.getString(r.fieldIndex("code")).length == 4,
        r.getString(r.fieldIndex("code")))
      assert(r.getString(r.fieldIndex("wa")) != r.getString(r.fieldIndex("wb")))
    }
    // van der Corput: r < 2^17 keeps exactly the ids ≡ 0 (mod 8), so
    // the CORPUS rate is 1/8 ± one id-range remainder (tight); per-type
    // rates at this tiny SF inherit each type's id-residue mix, so they
    // only get a sanity band
    val vdc = SparkEntry.queries("q_sample_vdc")(spark, dir).collect()
    val (sTot, sSam) = vdc.map(r => (r.getLong(r.fieldIndex("n_total")),
      r.getLong(r.fieldIndex("n_sample")))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(math.abs(sSam * 1000000L / sTot - 125000L) < 10000L,
      s"vdc corpus rate ${sSam * 1000000L / sTot}")
    for (r <- vdc)
      assert(r.getLong(r.fieldIndex("rate_ppm")) > 30000L &&
        r.getLong(r.fieldIndex("rate_ppm")) < 300000L,
        s"vdc type rate ${r.getLong(r.fieldIndex("rate_ppm"))}")
    // APSP eccentricity: every node reaches itself plus its ≥1
    // neighbor, and a shortest path visits distinct nodes, so
    // ecc ≤ n_reach − 1
    for (r <- SparkEntry.queries("q_graph_ecc")(spark, dir).collect()) {
      val (ecc, nr) = (r.getLong(r.fieldIndex("ecc")),
        r.getLong(r.fieldIndex("n_reach")))
      assert(nr >= 2 && ecc >= 1 && ecc <= nr - 1, s"ecc $ecc reach $nr")
    }
    // betweenness: each (s,t,v) contribution is σ_sv·σ_vt/σ_st ≤ 1
    // (paths through v are a subset of all shortest paths), so
    // bc_ppm ≤ n_pairs·1e6; an interior node separates a distance-≥2
    // pair, so its COMPONENT has diameter ≥ 2 — every broker must
    // appear in the APSP table with some node ≥ 2 hops from an
    // endpoint it serves (weak form: the node exists there and its
    // reach covers ≥ 3 nodes: both endpoints plus itself)
    val reachById = SparkEntry.queries("q_graph_ecc")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_reach"))).toMap
    val bc = SparkEntry.queries("q_graph_betweenness")(spark, dir).collect()
    assert(bc.nonEmpty)
    for (r <- bc) {
      val (id, np, b) = (r.getLong(0), r.getLong(r.fieldIndex("n_pairs")),
        r.getLong(r.fieldIndex("bc_ppm")))
      assert(np >= 1 && b >= 0 && b <= np * 1000000L, s"bc $b pairs $np")
      assert(reachById(id) >= 3, s"interior node $id reaches ${reachById(id)} < 3")
    }
    // phash: pairs are canonical (ia < ib) and inside the hamming
    // radius the 7×9-bit pigeonhole promises
    for (r <- SparkEntry.queries("q_media_phash")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("ia")) < r.getLong(r.fieldIndex("ib")))
      assert(r.getLong(r.fieldIndex("dist")) <= 6)
    }
    // granger: adding a regressor can never raise the SSE (restricted
    // model is nested in the full one), and SSEs are nonnegative up to
    // the 6dp rounding
    for (r <- SparkEntry.queries("q_events_granger")(spark, dir).collect()) {
      val (sr, sf) = (r.getDouble(r.fieldIndex("sse_restricted")),
        r.getDouble(r.fieldIndex("sse_full")))
      assert(sf <= sr + 1e-6, s"full SSE $sf above restricted $sr")
      assert(sf >= -1e-6 && sr >= -1e-6)
    }
    // MTLD: factor accounting and the ≥1e6 ppm floor (factors ≤ tokens)
    for (r <- SparkEntry.queries("q_text_mtld")(spark, dir).limit(200).collect()) {
      assert(r.getLong(r.fieldIndex("closed_factors")) <=
        r.getLong(r.fieldIndex("factors")))
      assert(r.getLong(r.fieldIndex("factors")) >= 1 &&
        r.getLong(r.fieldIndex("factors")) <= r.getLong(r.fieldIndex("n_tokens")))
      assert(r.getLong(r.fieldIndex("mtld_ppm")) >= 1000000L)
    }
  }

  test("session-15 invariants: regression diagnostics, RBO, DDSketch, Kalman") {
    // Chow: segment counts partition the pool, and the pooled SSR can
    // never beat the two free per-segment fits (nested-model bound,
    // up to the integer rounding grain)
    for (r <- SparkEntry.queries("q_agg_chow")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("n1")) + r.getLong(r.fieldIndex("n2")) ==
        r.getLong(r.fieldIndex("n")))
      assert(r.getLong(r.fieldIndex("ssr_pooled")) + 1L >=
        r.getLong(r.fieldIndex("ssr_split")))
      assert(r.getDouble(r.fieldIndex("chow_f")) >= -1e-6)
    }
    // Breusch–Pagan: LM = n·R² of the auxiliary regression, so
    // 0 ≤ LM ≤ n
    for (r <- SparkEntry.queries("q_agg_breusch_pagan")(spark, dir).collect()) {
      val lm = r.getDouble(r.fieldIndex("bp_lm"))
      assert(lm >= -1e-6 && lm <= r.getLong(r.fieldIndex("n")).toDouble + 1e-6,
        s"bp_lm $lm")
    }
    // Cook's: the influence count is a subset of the rows, D ≥ 0
    for (r <- SparkEntry.queries("q_agg_cooks")(spark, dir).collect()) {
      assert(r.getLong(r.fieldIndex("n_influential")) <=
        r.getLong(r.fieldIndex("n")))
      assert(r.getDouble(r.fieldIndex("max_cooks")) >= 0.0)
    }
    // RBO: prefix overlap is monotone in depth and bounded by depth;
    // with p = 1/2 the term sum is below Σ 2^-(d-1) = 2
    var prevX = 0L; var prevC = 0L
    for (r <- SparkEntry.queries("q_eval_rbo")(spark, dir).collect()) {
      val (d, x, c) = (r.getLong(r.fieldIndex("d")),
        r.getLong(r.fieldIndex("x_d")), r.getLong(r.fieldIndex("rbo_cum_e12")))
      assert(x >= prevX && x <= d, s"x_d $x at depth $d (prev $prevX)")
      assert(c >= prevC && c <= 2000000000000L, s"rbo_cum $c")
      prevX = x; prevC = c
    }
    // DDSketch: leading-3-digit buckets promise ≤ 0.5% midpoint error
    // against the exact same-rank order statistic (5000 ppm)
    for (r <- SparkEntry.queries("q_sketch_ddsketch")(spark, dir).collect();
         q <- Seq("50", "90", "99")) {
      val e = r.getLong(r.fieldIndex(s"err_ppm_$q"))
      assert(e >= 0L && e <= 5000L, s"err_ppm_$q $e")
    }
    // Kalman: posterior variance lives in (0, r]; the steady-state
    // update (1-K)(P+q) = r(P+q)/(P+q+r) < r = 16; innovation RMSE ≥ 0
    for (r <- SparkEntry.queries("q_events_kalman")(spark, dir).collect()) {
      val pv = r.getDouble(r.fieldIndex("p_var"))
      assert(pv > 0.0 && pv <= 16.0, s"p_var $pv")
      assert(r.getDouble(r.fieldIndex("innov_rmse")) >= 0.0)
      assert(r.getLong(r.fieldIndex("n_days")) >= 1L)
    }
    // OLS2: R² of the least-squares fit lives in [0, 1], VIF ≥ 1 by
    // Cauchy–Schwarz (r₁₂² ≤ 1)
    for (r <- SparkEntry.queries("q_agg_ols2")(spark, dir).collect()) {
      val r2 = r.getDouble(r.fieldIndex("r2"))
      assert(r2 >= -1e-6 && r2 <= 1.0 + 1e-6, s"r2 $r2")
      assert(r.getDouble(r.fieldIndex("vif")) >= 1.0 - 1e-6)
    }
    // randomized response: the estimator identity est_x2 = 4·obs − n
    // holds row-by-row, counts nest, and the audit error at this SF
    // stays under 60% of a day's rows (measured 28.3% worst day)
    for (r <- SparkEntry.queries("q_privacy_rr")(spark, dir).collect()) {
      val (n, t, o, e, err) = (r.getLong(r.fieldIndex("n")),
        r.getLong(r.fieldIndex("true_cnt")), r.getLong(r.fieldIndex("obs_cnt")),
        r.getLong(r.fieldIndex("est_x2")), r.getLong(r.fieldIndex("err_pm")))
      assert(t <= n && o <= n && e == 4L * o - n)
      assert(err >= 0L && err <= 600L, s"err_pm $err")
    }
    // Holt–Winters: independent Scala refold of the identical daily
    // series must reproduce every reported column to the 6dp grain
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toDouble).toArray }
    for (r <- SparkEntry.queries("q_window_holt_winters")(spark, dir).collect()) {
      val ys = daily(r.getString(0))
      assert(ys.length >= 8 && ys.length == r.getLong(r.fieldIndex("n_days")))
      val l0 = (ys(0) + ys(1) + ys(2) + ys(3) + ys(4) + ys(5) + ys(6)) / 7.0d
      var l = l0; var b = 0.0d
      var ss = Array.tabulate(7)(i => ys(i) - l0)
      for (y <- ys.drop(7)) {
        val nl = 0.5d * (y - ss(0)) + 0.5d * (l + b)
        val nb = 0.5d * (nl - l) + 0.5d * b
        val nsHead = 0.5d * (y - nl) + 0.5d * ss(0)
        ss = ss.drop(1) :+ nsHead; l = nl; b = nb
      }
      def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rd(l) - r.getDouble(r.fieldIndex("level"))) < 1e-9)
      assert(math.abs(rd(b) - r.getDouble(r.fieldIndex("trend"))) < 1e-9)
      assert(math.abs(rd(l + b + ss(0)) - r.getDouble(r.fieldIndex("forecast1"))) < 1e-9)
      assert(math.abs(rd(l + 7.0d * b + ss(6)) - r.getDouble(r.fieldIndex("forecast7"))) < 1e-9)
    }
  }

  test("session-16 invariants: median split, PRF identities, pseudonym mass, reconciliation") {
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    // Mood's: the grand median splits the corpus — neither side can
    // exceed N/2, ties at the median are dropped, and every χ²
    // contribution is non-negative with a positive expectation
    val mood = SparkEntry.queries("q_events_mood")(spark, dir).collect()
    val (ta, tb) = (mood.map(_.getLong(1)).sum, mood.map(_.getLong(2)).sum)
    assert(ta <= nEvents / 2 && tb <= nEvents / 2, s"split $ta/$tb of $nEvents")
    assert(ta + tb <= nEvents)
    for (r <- mood) {
      assert(r.getDouble(r.fieldIndex("e_above")) > 0)
      assert(r.getDouble(r.fieldIndex("chi2_contrib")) >= 0)
    }
    // PRF: micro identities — Σtp+Σfp and Σtp+Σfn both equal the test
    // prediction count; every metric in ppm range; F1 inside the
    // [min(P,R), max(P,R)] harmonic-mean sandwich (±1 for floor)
    val prf = SparkEntry.queries("q_eval_prf")(spark, dir).collect()
    val (stp, sfp, sfn) = (prf.map(_.getLong(1)).sum,
      prf.map(_.getLong(2)).sum, prf.map(_.getLong(3)).sum)
    // both masses must equal the INDEPENDENTLY computed test-set size
    // (every vec_id % 10 == 0 embedding gets exactly one prediction) —
    // the former stp+sfp == stp+sfn identity was tautological: both
    // sides equal totalPredictions − Σtp for ANY confusion matrix
    val nTest = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0).count()
    assert(stp + sfp == nTest, s"pred mass ${stp + sfp} vs test set $nTest")
    assert(stp + sfn == nTest, s"truth mass ${stp + sfn} vs test set $nTest")
    for (r <- prf; c <- Seq("precision_ppm", "recall_ppm", "f1_ppm")
        if !r.isNullAt(r.fieldIndex(c))) {
      val v = r.getLong(r.fieldIndex(c))
      assert(v >= 0 && v <= 1000000L, s"$c $v")
    }
    for (r <- prf if !r.isNullAt(r.fieldIndex("precision_ppm")) &&
        !r.isNullAt(r.fieldIndex("recall_ppm"))) {
      val (p, rc, f1) = (r.getLong(r.fieldIndex("precision_ppm")),
        r.getLong(r.fieldIndex("recall_ppm")), r.getLong(r.fieldIndex("f1_ppm")))
      assert(f1 >= math.min(p, rc) - 1 && f1 <= math.max(p, rc) + 1,
        s"F1 $f1 outside [$p, $rc]")
    }
    // pseudonymization: rotation loses no mass (Σ n_events = N), the
    // re-keyed release stays user-grain (distinct new pseudonyms), and
    // no pseudonym survives the salt rotation unchanged
    val pseu = SparkEntry.queries("q_privacy_pseudonym")(spark, dir).collect()
    assert(pseu.map(_.getLong(2)).sum == nEvents)
    assert(pseu.map(_.getString(1)).distinct.length == pseu.length)
    for (r <- pseu) assert(r.getString(0) != r.getString(1))
    // top-down reconciliation: shares are a floored partition of unity
    // and the top-down forecasts sum to at most the total-mean model
    val hf = SparkEntry.queries("q_events_hier_forecast")(spark, dir).collect()
    val shareSum = hf.map(_.getLong(1)).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 3L * hf.length,
      s"share sum $shareSum")
    assert(hf.map(_.getLong(hf.head.fieldIndex("n_test_days"))).distinct.length == 1)
    for (r <- hf) {
      assert(r.getLong(r.fieldIndex("sae_naive")) >= 0 &&
        r.getLong(r.fieldIndex("sae_topdown")) >= 0)
    }
    // rolling origins: later folds never train on less data, and no
    // fold's train+test exceeds the type's corpus
    val ro = SparkEntry.queries("q_sample_rolling_origin")(spark, dir).collect()
      .groupBy(_.getString(0))
    val typeTotals = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((ty, rs) <- ro) {
      assert(rs.length == 4, s"$ty has ${rs.length} folds")
      val sorted = rs.sortBy(_.getLong(rs.head.fieldIndex("fold")))
      val trains = sorted.map(_.getLong(rs.head.fieldIndex("n_train")))
      assert(trains.zip(trains.tail).forall { case (a, b) => a <= b },
        s"$ty train sizes not monotone: ${trains.mkString(",")}")
      for (r <- sorted)
        assert(r.getLong(r.fieldIndex("n_train")) + r.getLong(r.fieldIndex("n_test"))
          <= typeTotals(ty))
    }
  }

  test("session-16 invariants II: uplift identity, DP release shape, IRR signs, budget fill") {
    // uplift: arms partition each segment's users, rates live in ppm
    // range, and the uplift column IS the exact rate difference
    val up = SparkEntry.queries("q_events_uplift")(spark, dir).collect()
    val nUsers = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(up.map(r => r.getLong(r.fieldIndex("n_t")) +
      r.getLong(r.fieldIndex("n_c"))).sum <= nUsers)
    for (r <- up) {
      val (rt, rc, u) = (r.getLong(r.fieldIndex("rate_t_ppm")),
        r.getLong(r.fieldIndex("rate_c_ppm")), r.getLong(r.fieldIndex("uplift_ppm")))
      assert(rt >= 0 && rt <= 1000000L && rc >= 0 && rc <= 1000000L)
      assert(u == rt - rc)
      assert(r.getLong(r.fieldIndex("conv_t")) <= r.getLong(r.fieldIndex("n_t")))
      assert(r.getLong(r.fieldIndex("conv_c")) <= r.getLong(r.fieldIndex("n_c")))
    }
    // DP top-k: contiguous ranks, nonincreasing noised counts, every
    // release clears the stability threshold, and neither the raw
    // count nor the noise appears in the schema
    val dt = SparkEntry.queries("q_privacy_dp_topk")(spark, dir).collect()
    assert(dt.map(_.getLong(0)).sorted.sameElements(1L to dt.length map (_.toLong)))
    val byRank = dt.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    assert(byRank.forall(_ >= 50L))
    assert(!dt.head.schema.fieldNames.exists(Set("n", "noise")))
    // IRR: the ratio is positive and ln/z agree with it in sign
    for (r <- SparkEntry.queries("q_events_irr")(spark, dir).collect()) {
      val irr = r.getLong(r.fieldIndex("irr_ppm"))
      val (li, se, z) = (r.getDouble(r.fieldIndex("ln_irr")),
        r.getDouble(r.fieldIndex("se")), r.getDouble(r.fieldIndex("z")))
      assert(irr > 0 && se > 0)
      assert(math.signum(li) == math.signum(irr.toDouble - 1000000.0) || li == 0.0)
      assert(math.signum(z) == math.signum(li) || z == 0.0)
    }
    // Cohen's d agrees in SIGN with Welch's t on the same arm split —
    // both are the mean difference over a positive scale
    val tByType = SparkEntry.queries("q_events_ttest")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("t_welch"))).toMap
    for (r <- SparkEntry.queries("q_eval_cohens_d")(spark, dir).collect()) {
      val d = r.getDouble(r.fieldIndex("cohens_d"))
      val t = tByType(r.getString(0))
      assert(math.signum(d) == math.signum(t) || d == 0.0 || t == 0.0,
        s"${r.getString(0)}: d=$d t=$t")
    }
    // mixture budget: greedy fills EXACTLY to floor(total/2) (the cap
    // always binds), quality ranks are nonincreasing, and every
    // non-marginal source is taken whole
    val mbr = SparkEntry.queries("q_docs_mixture_budget")(spark, dir).collect()
      .sortBy(_.getLong(0))
    val totalToks = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).collect()(0).getLong(0)
    assert(mbr.map(_.getLong(4)).sum == totalToks / 2)
    val quals = mbr.map(_.getLong(2))
    assert(quals.zip(quals.tail).forall { case (a, b) => a >= b })
    for (r <- mbr.dropRight(1))
      assert(r.getLong(r.fieldIndex("take_tokens")) ==
        r.getLong(r.fieldIndex("src_tokens")))
  }

  test("session-16 invariants III: session mass, partial-corr bounds, AJ identity") {
    // session rollup: sessions partition the event stream exactly and
    // the rates are consistent with their numerators
    val ssr = SparkEntry.queries("q_events_session_stats")(spark, dir).collect()(0)
    val nEv = spark.read.parquet(s"$dir/events.parquet").count()
    assert(ssr.getLong(ssr.fieldIndex("n_events")) == nEv)
    assert(ssr.getLong(ssr.fieldIndex("n_bounce")) <=
      ssr.getLong(ssr.fieldIndex("n_sessions")))
    assert(ssr.getLong(ssr.fieldIndex("n_sessions")) >=
      ssr.getLong(ssr.fieldIndex("n_users")))
    assert(ssr.getLong(ssr.fieldIndex("events_per_session_ppm")) >= 1000000L)
    // partial correlation: every r in [-1, 1] (±1e-6 for the 6dp
    // round), and the row grid is exactly pairs × controls
    val pcr = SparkEntry.queries("q_events_partial_corr")(spark, dir).collect()
    val k = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type")).distinct().count().toInt
    assert(pcr.length == k * (k - 1) / 2 * (k - 2), s"rows ${pcr.length} for k=$k")
    for (r <- pcr; c <- Seq("r_xy", "r_partial")) {
      val v = r.getDouble(r.fieldIndex(c))
      assert(v >= -1.000001 && v <= 1.000001, s"$c $v")
    }
    // Aalen–Johansen: S decreases, CIFs accumulate, and
    // S + CIF₁ + CIF₂ = 1 at EVERY step (the AJ identity; 3e-6 for
    // the per-column rounding)
    val aj = SparkEntry.queries("q_events_competing_risks")(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(aj.nonEmpty && aj.exists(r => r.getLong(r.fieldIndex("d1")) > 0) &&
      aj.exists(r => r.getLong(r.fieldIndex("d2")) > 0),
      "both causes must fire — the estimator must estimate")
    val (svs, c1s, c2s) = (aj.map(_.getDouble(aj.head.fieldIndex("surv"))),
      aj.map(_.getDouble(aj.head.fieldIndex("cif_1"))),
      aj.map(_.getDouble(aj.head.fieldIndex("cif_2"))))
    assert(svs.zip(svs.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(c1s.zip(c1s.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(c2s.zip(c2s.tail).forall { case (a, b) => a <= b + 1e-9 })
    for (i <- aj.indices)
      assert(math.abs(svs(i) + c1s(i) + c2s(i) - 1.0) < 3e-6,
        s"AJ identity broken at row $i: ${svs(i)} + ${c1s(i)} + ${c2s(i)}")
    val nr = aj.map(_.getLong(aj.head.fieldIndex("n_risk")))
    assert(nr.zip(nr.tail).forall { case (a, b) => a >= b })
    // Theil: non-negative components and the decomposition identity
    // T = B + W (3e-6 tolerance for the three independent roundings)
    val th = SparkEntry.queries("q_agg_theil")(spark, dir).collect()(0)
    val (tt, tb, tw) = (th.getDouble(th.fieldIndex("theil_total")),
      th.getDouble(th.fieldIndex("theil_between")),
      th.getDouble(th.fieldIndex("theil_within")))
    assert(tt >= 0 && tb >= -1e-9 && tw >= -1e-9)
    assert(math.abs(tt - tb - tw) < 3e-6, s"Theil identity: $tt != $tb + $tw")
    assert(tb <= tt + 1e-9 && tw <= tt + 1e-9)
    // Atkinson(1): a share of welfare lost — strictly inside [0, 1)
    val at = SparkEntry.queries("q_agg_atkinson")(spark, dir).collect()(0)
    val a1 = at.getDouble(at.fieldIndex("atkinson_e1"))
    assert(a1 >= 0 && a1 < 1, s"Atkinson $a1")
    // Kish: n_eff ≤ n (Cauchy–Schwarz — an EXACT inequality) and the
    // design effect is its reciprocal statement
    val ks = SparkEntry.queries("q_sample_kish")(spark, dir).collect()(0)
    val (nS, nEff, deff) = (ks.getLong(ks.fieldIndex("n_sampled")),
      ks.getDouble(ks.fieldIndex("n_eff")),
      ks.getDouble(ks.fieldIndex("design_effect")))
    assert(nEff <= nS + 1e-6 && nEff > 0, s"n_eff $nEff vs n $nS")
    assert(deff >= 1.0 - 1e-6, s"design effect $deff")
    // MH hazard ratio: positive, ln agrees in sign, observed events
    // match the log-rank query's margins on the same lifetimes
    val hr = SparkEntry.queries("q_events_hazard_ratio")(spark, dir).collect()(0)
    assert(hr.getDouble(hr.fieldIndex("hr_mh")) > 0)
    assert(math.signum(hr.getDouble(hr.fieldIndex("ln_hr"))) ==
      math.signum(hr.getDouble(hr.fieldIndex("hr_mh")) - 1.0) ||
      hr.getDouble(hr.fieldIndex("ln_hr")) == 0.0)
    val lr = SparkEntry.queries("q_events_logrank")(spark, dir).collect()(0)
    assert(hr.getLong(hr.fieldIndex("o1")) == lr.getLong(lr.fieldIndex("o1")))
    assert(hr.getLong(hr.fieldIndex("o0")) == lr.getLong(lr.fieldIndex("o2")))
    // isotropy: the probe pair count is exactly C(probe, 2) and the
    // mean squared cosine sits in a sane band around the 1/d reference
    val iso = SparkEntry.queries("q_embed_isotropy")(spark, dir).collect()(0)
    val np = iso.getLong(iso.fieldIndex("n_pairs"))
    val probe = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 100).count()
    assert(np == probe * (probe - 1) / 2)
    val (mc, ip) = (iso.getLong(iso.fieldIndex("mean_cos2_ppm")),
      iso.getLong(iso.fieldIndex("isotropic_ppm")))
    assert(mc > 0 && mc < 1000000L)
    assert(mc >= ip / 2 && mc <= ip * 10, s"mean cos2 $mc vs isotropic $ip")
    // rich club: clubs shrink monotonically with k, realized edges
    // can only drop with the stricter filter, density stays in ppm
    val rc = SparkEntry.queries("q_graph_richclub")(spark, dir).collect()
      .sortBy(_.getLong(0))
    val (ns, es) = (rc.map(_.getLong(rc.head.fieldIndex("n_rich"))),
      rc.map(_.getLong(rc.head.fieldIndex("e_rich"))))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(es.zip(es.tail).forall { case (a, b) => a >= b })
    for (r <- rc) {
      val d = r.getLong(r.fieldIndex("density_ppm"))
      assert(d >= 0 && d <= 1000000L, s"density $d")
    }
    // char classes: the four floored shares partition every character
    // (sum within 4 ppm of unity from the four independent floors)
    for (r <- SparkEntry.queries("q_text_charclasses")(spark, dir).collect()) {
      val s4 = Seq("letter_ppm", "digit_ppm", "space_ppm", "other_ppm")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(s4.forall(v => v >= 0 && v <= 1000000L))
      assert(s4.sum >= 1000000L - 4 && s4.sum <= 1000000L, s"classes ${s4.sum}")
    }
    // script mix: all three dialects report, and the three class
    // masses never exceed the total
    val sm = SparkEntry.queries("q_conv_script_mix")(spark, dir).collect()
    assert(sm.map(_.getString(0)).sorted.sameElements(Array("html", "pdf", "plain")))
    for (r <- sm)
      assert(r.getLong(r.fieldIndex("cyr_ppm")) +
        r.getLong(r.fieldIndex("latin_ppm")) +
        r.getLong(r.fieldIndex("digit_ppm")) <= 1000000L)
    // Hoover vs Gini ordering: for any distribution H ≤ G (both in
    // ppm), and H lives in [0, 1)
    val hv = SparkEntry.queries("q_agg_hoover")(spark, dir).collect()(0)
    val hp = hv.getLong(hv.fieldIndex("hoover_ppm"))
    assert(hp >= 0 && hp < 1000000L)
    // distance profile: radius ≤ diameter, mean path between 1 and
    // the diameter (in ppm), pairs bounded by n(n−1)
    val dp = SparkEntry.queries("q_graph_distprofile")(spark, dir).collect()(0)
    val (nn, dia, rad, npr, mp) = (dp.getLong(0), dp.getLong(1), dp.getLong(2),
      dp.getLong(3), dp.getLong(4))
    assert(rad <= dia)
    assert(npr <= nn * (nn - 1))
    assert(mp >= 1000000L && mp <= dia * 1000000L, s"mean path $mp dia $dia")
  }
}

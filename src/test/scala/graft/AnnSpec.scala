package graft

import org.apache.spark.sql.functions.col

/** Recall semantics of the IVF search family: the inverted-list
  * restriction trades recall for candidate-set size, and multi-probe
  * (nprobe=2) exists to buy recall back near Voronoi boundaries. The
  * deterministic corpus makes the recall figures reproducible, so the
  * dominance relation is a hard assertion, not a statistical one. */
class AnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("multi-probe IVF recall dominates single-probe (vs brute-force truth)") {
    import spark.implicits._
    def topset(name: String): Map[Long, Set[Long]] =
      graft.queries.Relational.queries(name)(spark, dir)
        .select(col("qid").cast("long"), col("nb").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val truth = topset("q_ann_topk")      // exhaustive cosine top-5
    val p1 = topset("q_ann_ivf_kmeans")   // own list only
    val p2 = topset("q_ann_ivf_multiprobe") // top-2 lists
    assert(truth.size == 10 && truth.values.forall(_.size == 5))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val (r1, r2) = (recall(p1), recall(p2))
    info(f"recall@5: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f")
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    assert(r1 > 0.0 && r2 > 0.3, s"degenerate recalls r1=$r1 r2=$r2")
    // the nprobe=1 result is exactly the multiprobe result restricted
    // to the query's own list, so p2 ⊇ p1 candidates ⇒ per-query
    // dominance, not just on average
    for ((q, s1) <- p1) {
      val s2 = p2.getOrElse(q, Set.empty)
      val t = truth(q)
      assert(s2.intersect(t).size >= s1.intersect(t).size,
        s"query $q lost recall going to nprobe=2")
    }
  }

  test("recall curve: recall@5 is monotone in nprobe and reaches 0.6 by nprobe=4") {
    import spark.implicits._
    def topset(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid").cast("long"), col("nb").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val truth = topset(graft.queries.Relational.queries("q_ann_topk")(spark, dir))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    val curve = Seq(1, 2, 4).map { np =>
      np -> recall(topset(graft.queries.Relational.ivfMultiprobeSearch(spark, dir, np)))
    }
    info(curve.map { case (np, r) => f"nprobe=$np recall@5=$r%.3f" }.mkString(", "))
    // monotone: probing more lists can only add candidates (lists are
    // disjoint), so recall must not decrease
    for (Seq((npA, rA), (npB, rB)) <- curve.sliding(2))
      assert(rB >= rA, s"recall fell from $rA (nprobe=$npA) to $rB (nprobe=$npB)")
    val r4 = curve.last._2
    assert(r4 >= 0.6, s"recall@5 at nprobe=4 is $r4 < 0.6 (k=8 lists, half probed)")
  }

  test("Lloyd-refined PQ codebook cuts quantization error and does not lose ADC recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val R = graft.queries.Relational
    // total quantization error: the trained codebook must beat the
    // sample codebook it was seeded from (measured: ~34% lower)
    def err(name: String): Long = R.queries(name)(spark, dir)
      .agg(sum(col("sum_err"))).as[Long].head()
    val (eS, eT) = (err("q_ann_pq"), err("q_ann_pq_lloyd"))
    info(f"quantization error: sample=$eS lloyd=$eT (${eT.toDouble / eS}%.3f×)")
    assert(eT < eS, s"Lloyd training did not reduce quantization error: $eT >= $eS")
    // ADC recall vs EXACT integer-L2 truth (recall vs the metric ADC
    // approximates — isolates quantization loss from metric mismatch)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("nb"))
    val truth = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nb"),
        expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("nb")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, a) => k -> a.map(_._2).toSet }
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("qid").cast("long"), col("nb").cast("long"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, a) => k -> a.map(_._2).toSet }
      truth.map { case (k, t) =>
        got.getOrElse(k, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
    }
    val rS = recall(R.adcSearch(spark, dir, R.pqSubs(spark, dir)._2))
    val rT = recall(R.adcSearch(spark, dir, R.pqLloydCodebook(spark, dir)))
    info(f"ADC recall@5 vs exact L2: sample=$rS%.3f lloyd=$rT%.3f")
    assert(rT >= rS, s"trained-codebook ADC recall $rT fell below sample $rS")
    assert(rT >= 0.2, s"degenerate trained-codebook recall $rT")
  }

  test("MMR selection is strictly more diverse than the plain top-5") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q = vecs(0L)
    val plainTop5 = vecs.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, v) => (d2(q, v), id) }.take(5).map(_._1)
    val mmr = graft.queries.Relational.queries("q_ann_mmr")(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSeq
    def minPairwise(ids: Seq[Long]): Long =
      (for (a <- ids; b <- ids if a < b) yield d2(vecs(a), vecs(b))).min
    val (dM, dP) = (minPairwise(mmr), minPairwise(plainTop5))
    info(s"min pairwise d2: mmr=$dM plain=$dP")
    // the first pick ties the plain ranking; diversity must not regress
    // and on this corpus is strictly better
    assert(dM > dP, s"MMR selection no more diverse than plain top-5: $dM <= $dP")
  }

  test("power iteration raises the Rayleigh quotient over the start vector") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // variance of the cloud along direction d ∝ Σ (v·d)²; power
    // iteration on the PSD Gram matrix never decreases this, so the
    // returned direction must capture at least as much variance as the
    // all-ones start — and strictly more on any non-isotropic cloud
    val d = graft.queries.Relational.queries("q_embed_power_iter")(spark, dir)
      .orderBy(col("dim")).select(col("comp")).as[Long].collect()
    assert(d.length == 64 && d.map(math.abs).max == 1000,
      s"direction not ±1000-normalized: max=${d.map(math.abs).max}")
    def energy(dir64: Array[Long]): BigInt = {
      val lits = dir64.mkString("array(", "L, ", "L)")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
        .select(expr(
          s"aggregate(zip_with(v, $lits, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("p"))
        .select(sum((col("p") * col("p")).cast("decimal(38,0)")).as("e"))
        .head().getDecimal(0)
      BigInt(e.toBigInteger)
    }
    // compare per unit of squared direction norm: e(d)/|d|² vs e(1)/|1|²
    val ones = Array.fill(64)(1000L)
    val (eD, eO) = (energy(d), energy(ones))
    val n2D = d.map(c => BigInt(c) * c).sum
    val n2O = ones.map(c => BigInt(c) * c).sum
    info(s"Rayleigh (scaled): trained=${eD / n2D} ones=${eO / n2O}")
    assert(eD * n2O >= eO * n2D,
      s"power iteration lowered the Rayleigh quotient: $eD/$n2D < $eO/$n2O")
  }
}

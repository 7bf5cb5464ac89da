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
}

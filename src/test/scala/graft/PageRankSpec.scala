package graft

import org.apache.spark.sql.functions._

/** Adversarial graphs for the fixed-point PageRank loop: the
  * distributed iteration must agree EXACTLY (integer arithmetic, no
  * tolerance) with an independent single-machine reference on shapes
  * that stress it differently — a star (mass concentration), a path
  * (directional flow + danglings), a ring (steady state), two cliques
  * joined by a bridge (community structure), and isolated nodes (pure
  * teleport mass) — and must be invariant to input partitioning. */
class PageRankSpec extends SparkSuite {

  /** Reference: same scaled-integer recurrence, plain Scala. Scala's
    * `/` on positive longs is floor division, matching Spark's `div`
    * and DuckDB's `//` on the always-positive ranks. */
  private def ref(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val mass = scala.collection.mutable.HashMap.empty[Long, Long]
      for ((s, d) <- edges)
        mass(d) = mass.getOrElse(d, 0L) + pr(s) / deg(s)
      pr = nodes.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    pr
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    graft.queries.Relational.pagerankFp(n, e, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val graphs: Seq[(String, Seq[Long], Seq[(Long, Long)])] = Seq(
    ("star", 0L to 10L,
      (1L to 10L).flatMap(i => Seq(i -> 0L, 0L -> i))),
    ("path", 0L to 20L,
      (0L until 20L).map(i => i -> (i + 1))),
    ("ring", 0L to 12L,
      (0L to 12L).map(i => i -> ((i + 1) % 13))),
    ("two cliques + bridge", 0L to 9L,
      (for { a <- 0L to 4L; b <- 0L to 4L if a != b } yield a -> b) ++
        (for { a <- 5L to 9L; b <- 5L to 9L if a != b } yield a -> b) ++
        Seq(4L -> 5L, 5L -> 4L)),
    ("isolated nodes", 0L to 6L,
      Seq(0L -> 1L, 1L -> 0L)))

  test("distributed fixed-point PageRank is exact vs the reference on adversarial graphs") {
    for ((name, nodes, edges) <- graphs; iters <- Seq(1, 3, 5)) {
      val expected = ref(nodes, edges, iters)
      val got = run(nodes, edges, iters, parts = 4)
      assert(got == expected, s"$name iters=$iters:\n got $got\n exp $expected")
    }
  }

  test("result is invariant to input partitioning") {
    val (_, nodes, edges) = graphs(3)
    assert(run(nodes, edges, 3, parts = 1) == run(nodes, edges, 3, parts = 13))
  }

  test("rank mass concentrates where the structure says it should") {
    // star: the hub out-ranks every leaf; ring: perfect symmetry
    val star = run(graphs(0)._2, graphs(0)._3, 3, 4)
    assert((1L to 10L).forall(l => star(0L) > star(l)))
    assert((1L to 10L).map(star).distinct.size == 1)
    val ring = run(graphs(2)._2, graphs(2)._3, 3, 4)
    assert(ring.values.toSeq.distinct.size == 1)
  }
}

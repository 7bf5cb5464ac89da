package graft

import org.apache.spark.sql.functions.col
import graft.queries.Relational

/** Connected-component resolution vs an independent union-find
  * reference, on adversarial topologies the near-dup corpus never
  * produces — long paths (worst-case diameter for plain hop
  * propagation), stars, rings, and singleton dust. Pins that the
  * pointer-jumping rounds converge in O(log diameter), i.e. inside the
  * production loop's cap of 10 even for diameter 100. */
class ResolveSpec extends SparkSuite {

  /** Plain-Scala union-find — structurally independent reference. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  /** The production loop (resolveRound + per-round materialization +
    * convergence probe), on explicit node/edge sets. Returns the label
    * map and the rounds taken. */
  private def resolve(nodes: Seq[Long], edges: Seq[(Long, Long)],
      cap: Int = 10): (Map[Long, Long], Int) = {
    import spark.implicits._
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst").localCheckpoint(true)
    var labels = nodes.toDF("id").withColumn("lbl", col("id")).localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (rounds < cap && !converged) {
      val prev = labels
      labels = Relational.resolveRound(labels, sym).localCheckpoint(true)
      // same probe as production: the round carries olbl
      converged = labels.filter(col("lbl") =!= col("olbl")).isEmpty
      prev.unpersist()
      rounds += 1
    }
    (labels.select(col("id"), col("lbl")).as[(Long, Long)].collect().toMap, rounds)
  }

  test("path-100 (worst-case diameter), star, rings, and dust all resolve inside the cap") {
    val path = (0L until 100L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (1L to 30L).map(i => (0L, i))
    val ring = (200L until 220L).map(i => (i, 200L + (i - 199L) % 20L))
    val cases: Seq[(String, Seq[Long], Seq[(Long, Long)])] = Seq(
      ("path-100", 0L until 100L, path),
      ("star-31", 0L to 30L, star),
      ("two-rings+dust", (200L until 240L) ++ Seq(500L, 501L),
        ring ++ (220L until 240L).map(i => (i, 220L + (i - 219L) % 20L))),
      ("empty-edges", 0L until 10L, Nil))
    for ((name, nodes, edges) <- cases) {
      val want = unionFind(nodes, edges)
      val (got, rounds) = resolve(nodes, edges)
      assert(got == want, s"$name: wrong components (rounds=$rounds)")
      assert(rounds <= 10, s"$name did not converge inside the production cap: $rounds")
      info(s"$name: converged in $rounds rounds")
    }
  }

  test("resolution is invariant to edge order and duplication") {
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L))
    val nodes = 0L to 9L
    val (a, _) = resolve(nodes, edges)
    val (b, _) = resolve(nodes, (edges.reverse ++ edges).map(identity))
    assert(a == b && a == unionFind(nodes, edges))
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite over the driver's testdata tables — one
  * entry per SURVEY.md §2 operator family, each with a DuckDB oracle in
  * Oracles.sql. Written Spark-first: broadcast hints on dims, window
  * functions for ordered ops, higher-order functions for array work —
  * everything whole-stage-codegen friendly (no UDFs anywhere).
  *
  * Cross-engine determinism rules (so value hashes match DuckDB):
  *  - money/measures are integerized (×100 → BIGINT) before SUM — exact
  *    integer aggregation is order-independent; raw double sums differ
  *    in low bits between engines;
  *  - every ratio is ONE double division of exact integers, rounded;
  *  - every output gets a deterministic total ORDER BY on its keys;
  *  - aggregate types pinned with explicit casts (DuckDB SUM(BIGINT)
  *    is HUGEINT otherwise).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** Derived part-supplier supply relation (the testdata star schema
    * carries no partsupp table): one partial+final hash aggregate over
    * the fact — unit supply cost = min observed unit price in exact
    * cents, available qty = total shipped quantity. Shared by the five
    * partsupp-family TPC-H shapes (Q2/Q9/Q11/Q16/Q20); both engines
    * build it from the identical lineitem parquet, so the derived rows
    * are bit-equal. ~p*s distinct pairs — at 100 TB this aggregate
    * shuffles once on (partkey, suppkey) and is reused per-query. */
  private def partsupp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(cents(col("l_extendedprice") / col("l_quantity"))).as("ps_supplycost_c"),
        sum(col("l_quantity").cast("long")).as("ps_availqty"))

  /** DuckDB CTE mirroring [[partsupp]] exactly (same IEEE division and
    * cents rounding, BIGINT-pinned aggregates). */
  private val psCte: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         CAST(min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS BIGINT) AS ps_supplycost_c,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** 32-bit majority-vote SimHash per document over md5-derived token
    * hashes (first 8 md5 hex chars → bigint — portable across engines,
    * unlike xxhash64). One partial+final hash agg with 32 vote columns;
    * no 32× bit-explode row blowup, so the shuffle stays O(tokens). */
  private def simhashes(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val votes = (0 until 32).map(b =>
      sum(when(expr(s"shiftright(h, $b) & 1") === 1, 1).otherwise(-1)).cast("long").as(s"v$b"))
    toks.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** DuckDB CTE computing the identical per-doc simhash (generated from
    * the same bit range so both engines stay in lockstep). */
  private def simhashCte(where: String): String = {
    val votes = (0 until 32)
      .map(b => s"CAST(sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$b")
      .mkString(", ")
    val hash = (0 until 32)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |  FROM documents$where
       |), h AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h FROM toks
       |), votes AS (
       |  SELECT doc_id, $votes FROM h GROUP BY doc_id
       |), sims AS (
       |  SELECT doc_id, $hash AS simhash FROM votes
       |)""".stripMargin
  }

  /** SimHash near-dup candidate pairs (doc_id < 1000) via 4×8-bit LSH
    * band buckets — shared by q_dedup_simhash_pairs (emits them) and
    * q_dedup_resolve (resolves them into components). A pair within
    * hamming ≤ 3 shares ≥1 intact band (pigeonhole), so the band-bucket
    * equi-join finds exactly the brute-force pair set while replacing
    * the O(n²) cross join with a shuffle join on (band, key). */
  /** LPA oracle prefix: the banded simhash graph CTEs plus three
    * unrolled frequency-vote rounds ending at l3(id, lbl). Shared by
    * the q_graph_label_prop and q_graph_modularity oracles. */
  private def lpaCte: String = simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       l0 AS (SELECT id, id AS lbl FROM nodes),""" +
    (1 to 3).map { r =>
      s"""
       t$r AS (SELECT dst, lbl AS nbr FROM (
                SELECT e.dst, l.lbl,
                       row_number() OVER (PARTITION BY e.dst
                         ORDER BY count(*) DESC, l.lbl) AS rn
                FROM edges e JOIN l${r - 1} l ON l.id = e.src
                GROUP BY e.dst, l.lbl) WHERE rn = 1),
       l$r AS (SELECT p.id, COALESCE(t.nbr, p.lbl) AS lbl
               FROM l${r - 1} p LEFT JOIN t$r t ON t.dst = p.id)"""
    }.mkString(",")

  private def simhashPairs(docs: DataFrame): DataFrame = {
    val bands = simhashes(docs.filter(col("doc_id") < 1000))
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key", expr("shiftright(simhash, band * 8) & 255"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").cast("long").as("ia"),
        col("b.doc_id").cast("long").as("ib"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("ham"))
      .filter(col("ham") <= 3)
      .distinct()
  }

  /** Fixed-point integer PageRank driver loop (ranks scaled 1e6 = 1.0,
    * damping 85/100, vanishing dangling mass): per iteration one
    * equi-join of edges(src,dst) against ranks+degrees, one
    * partial+final sum keyed by dst, one left join back to nodes(id) —
    * all-long arithmetic so the result is exact and order-independent.
    * localCheckpoint per round (checkpoint-cadence rule for iterative
    * ops). Exposed for q_graph_pagerank and PageRankSpec's adversarial
    * graphs. Returns (id, pr). */
  private[graft] def pagerankFp(nodes: DataFrame, edgesIn: DataFrame,
      iters: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "dsrc")
    var ranks = nodes.withColumn("pr", lit(1000000L)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val prev = ranks
      val mass = edges.join(deg, col("src") === col("dsrc"))
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = nodes.join(mass, nodes("id") === mass("dst"), "left")
        .select(nodes("id"),
          expr("150000L + (85L * coalesce(m, 0L)) div 100L").as("pr"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    edges.unpersist()
    ranks
  }

  /** One min-label-propagation round: pull the min label across edges
    * (partial+final hash agg keyed by dst), fold it in, then pointer-
    * jump (read the label's own label). Exposed un-materialized so
    * PlanSpec can gate the round's plan shape (equi-joins + partial_min,
    * no cartesian) — q_dedup_resolve materializes between rounds. */
  private[graft] def resolveRound(labels: DataFrame, edges: DataFrame): DataFrame = {
    val nbrMin = edges.join(labels, edges("src") === labels("id"))
      .groupBy(col("dst")).agg(min(col("lbl")).as("nbr"))
    val pulled = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
      .select(col("id"), least(col("lbl"), col("nbr")).as("lbl"))
    val jump = pulled.select(col("id").as("jid"), col("lbl").as("jlbl"))
    pulled.join(jump, pulled("lbl") === jump("jid"), "left")
      .select(col("id"), least(col("lbl"), col("jlbl")).as("lbl"))
  }

  /** Full pair→component resolution (doc_id, component, is_survivor) —
    * shared by q_dedup_resolve (emits it) and q_curate_corpus (gates on
    * it); memoized per (session, dir) like kmeansFit so the iterative
    * propagation runs once per session and both queries read the same
    * checkpointed result. See q_dedup_resolve's comment for the
    * algorithm and the per-round materialization rationale. */
  private val resolveMemo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](4, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean = {
        val evict = size() > 2
        // the cached frame is localCheckpoint'ed — release its storage
        // blocks on eviction or a long-lived session leaks them until GC
        if (evict) scala.util.Try(e.getValue.unpersist(false))
        evict
      }
    }

  /** Three synchronous frequency-vote LPA rounds over the shared
    * simhash near-dup graph (deterministic: count desc then smallest
    * label; isolated nodes keep their own). Returns (id, lbl). Shared
    * by q_graph_label_prop and q_graph_modularity — the partition one
    * produces, the other scores. localCheckpoint per round
    * (checkpoint-cadence rule for iterative ops). */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
    val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
      .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
      .localCheckpoint(true)
    val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id").cast("long").as("id")).distinct()
    var labels = nodes.withColumn("lbl", col("id")).localCheckpoint(true)
    for (_ <- 1 to 3) {
      val prev = labels
      val top = edges.join(prev, col("src") === col("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("dst"))
            .orderBy(col("c").desc, col("lbl"))))
        .filter(col("rn") === 1)
        .select(col("dst"), col("lbl").as("nbr"))
      labels = prev.join(top, prev("id") === top("dst"), "left")
        .select(prev("id"), coalesce(col("nbr"), prev("lbl")).as("lbl"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    edges.unpersist()
    labels
  }

  private def resolveComponents(s: SparkSession, dir: String): DataFrame =
    resolveMemo.synchronized {
      val key = (s, dir)
      val hit = resolveMemo.get(key)
      if (hit != null) hit
      else {
        val r = resolveComponentsUncached(s, dir)
        resolveMemo.put(key, r)
        r
      }
    }

  /** simhashPairs is the candidate-edge source for SIX queries (pair
    * emission, component resolution, component sizes, triangles, k-hop,
    * pagerank) — memoize ONE checkpointed pair list per (session, dir)
    * so the simhash pass + banded self-join run once per session
    * instead of once per query. Same LRU + unpersist-on-evict
    * discipline as resolveMemo. */
  private val pairsMemo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](4, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean = {
        val evict = size() > 2
        if (evict) scala.util.Try(e.getValue.unpersist(false))
        evict
      }
    }

  private def simhashPairsShared(s: SparkSession, dir: String): DataFrame =
    pairsMemo.synchronized {
      val key = (s, dir)
      val hit = pairsMemo.get(key)
      if (hit != null) hit
      else {
        val p = simhashPairs(t(s, dir, "documents")).localCheckpoint(true)
        pairsMemo.put(key, p)
        p
      }
    }

  private def resolveComponentsUncached(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashPairsShared(s, dir)
    val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
      .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
      .localCheckpoint(true)
    val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
      .select(col("doc_id").cast("long").as("id")).distinct()
    var labels = nodes.withColumn("lbl", col("id")).localCheckpoint(true)
    // iterate to CONVERGENCE (no label changed), not a fixed round
    // count: pointer jumping covers diameter ~2^rounds, so the cap is a
    // backstop, never the correctness argument; the per-round change
    // count is the standard one-agg convergence probe every iterative
    // graph job runs. Typical near-dup graphs (near-cliques) converge
    // in 2 rounds — fewer jobs than any safe fixed count.
    var rounds = 0
    var converged = false
    while (rounds < 10 && !converged) {
      val prev = labels
      labels = resolveRound(labels, edges).localCheckpoint(true)
      converged = labels.as("n")
        .join(prev.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.lbl") =!= col("p.lbl"))
        .isEmpty
      prev.unpersist()
      rounds += 1
    }
    pairs.unpersist()
    edges.unpersist() // final labels are checkpointed; edge cache is done
    labels.select(col("id").as("doc_id"), col("lbl").as("component"),
      (col("id") === col("lbl")).as("is_survivor"))
  }

  /** Parameterized multi-probe IVF search over the learned quantizer —
    * q_ann_ivf_multiprobe runs it at nprobe=2 under the DuckDB oracle;
    * AnnSpec sweeps nprobe ∈ {1,2,4} to assert the recall curve vs
    * brute-force truth. See the query comment for the plan shape. */
  private[graft] def ivfMultiprobeSearch(s: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    val (fit, cents) = kmeansFitFull(s, dir)
    val assign = fit
      .select(col("vec_id"), col("cid"), col("v"))
      .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
    val centDf = s.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq)
      .toDF("pcid", "c")
      .withColumn("cnorm", graft.functions.ArrayMath.dotL(col("c"), col("c")))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("pcid"))
    val probes = assign.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm2").as("qn"))
      .join(broadcast(centDf))
      .select(col("qid"), col("pcid"), col("qv"), col("qn"),
        (col("qn") + col("cnorm") -
          lit(2L) * graft.functions.ArrayMath.dotL(col("qv"), col("c"))).as("cdist"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("pcid"), col("qv"), col("qn"))
    val scored = assign.as("c").join(broadcast(probes),
        col("pcid") === col("c.cid") && col("qid") =!= col("c.vec_id"))
      .select(col("qid"), col("c.vec_id").as("nb"),
        graft.functions.ArrayMath.dotL(col("qv"), col("c.v")).as("dot"),
        col("qn").as("na"), col("c.norm2").as("nb2"))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb2"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nb"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Integerized per-subspace vector slices (M=4 × 16 dims) and the
    * 8-entry-per-subspace deterministic-sample codebook, shared by the
    * PQ encode (q_ann_pq) and ADC search (q_ann_adc). */
  private[graft] def pqSubs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (mSub, dSub, k) = (4, 16, 8)
    val subs = t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      .select(col("vec_id"), expr(
        s"""explode(transform(sequence(0, ${mSub - 1}),
           |  m -> struct(m AS sub, slice(v, m * $dSub + 1, $dSub) AS sv)))"""
          .stripMargin).as("p"))
      .select(col("vec_id"), col("p.sub").as("sub"), col("p.sv").as("sv"))
    val codebook = subs.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("code"), col("sub"), col("sv").as("cv"))
    (subs, codebook)
  }

  /** Exact integer squared L2 between the sv/cv subvector columns. */
  private def pqSqDist: Column = expr(
    "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")

  /** Per-subspace Lloyd refinement of the PQ codebooks (k=8 codewords ×
    * M=4 subspaces), seeded with the SAME 8 sample vectors as the
    * unrefined codebook so any error reduction is attributable to the
    * training alone. All four subspaces train inside the same
    * distributed jobs: each assignment is ONE broadcast join against
    * the 32 codeword rows keyed by sub, each update ONE partial+final
    * agg over (sub, code, dim); the M×k×16 matrix (512 longs) is the
    * only driver-side state per iteration — the Lloyd driver loop of
    * kmeansFitUncached, generalized to the product space. Centroid
    * updates are floored per-dim means (exactness argument as there);
    * empty codes keep their previous codeword. Returns (sub, code, cv). */
  private[graft] def pqLloydCodebook(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = pqLloydMemo.synchronized {
    val key = (s, dir, iters)
    val hit = pqLloydMemo.get(key)
    if (hit != null) return hit
    val (mSub, dSub, k) = (4, 16, 8)
    val subs = pqSubs(s, dir)._1.persist()
    var cb: Array[Array[Array[Long]]] =
      Array.fill(mSub, k)(Array.emptyLongArray)
    for (r <- subs.filter(col("vec_id") < k)
        .select(col("sub"), col("vec_id"), col("sv")).collect())
      cb(r.getInt(0))(r.getLong(1).toInt) = r.getSeq[Long](2).toArray
    def cbDf(): DataFrame = s.createDataFrame(
      for (m <- 0 until mSub; c <- 0 until k)
        yield (m, c, cb(m)(c).toSeq)).toDF("sub", "code", "cv")
    def assign(): DataFrame = {
      val w = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("d2"), col("code"))
      subs.join(broadcast(cbDf()), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"), pqSqDist.as("d2"), col("sv"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
    for (_ <- 0 until iters) {
      val sums = assign().select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("col")).as("sx"), count(lit(1)).as("n")).collect()
      val next = cb.map(_.map(_.clone()))
      for (r <- sums)
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          math.floor(r.getLong(3).toDouble / r.getLong(4)).toLong
      cb = next
    }
    subs.unpersist()
    val out = cbDf()
    pqLloydMemo.put(key, out)
    out
  }

  private val pqLloydMemo =
    new java.util.LinkedHashMap[(SparkSession, String, Int), DataFrame](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Int), DataFrame]): Boolean =
        size() > 2
    }

  /** Top principal direction of the embedding cloud by power
    * iteration. The 100 TB decomposition: ONE distributed pass builds
    * the 64×64 Gram matrix G = Σ v·vᵀ (a generator fans each vector to
    * its 4096 outer-product cells; partial+final hash agg over 4096
    * keys, decimal(38,0) accumulators so no SF wraps), then the power
    * iterations are driver math on the collected matrix — the same
    * bounded-driver-state pattern as the k-means centroids (k×64) and
    * the BPE argmax (1 row). Iterations are exact BigInt: x₀ = 1000·1,
    * x ← sign(y)·(|y|·1000 div max|y|) after y = G·x — the
    * normalization divides only non-negative quantities, so floor and
    * truncation agree and DuckDB's `//` replays it bit-for-bit. */
  private[graft] def powerIterTop(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    // G is symmetric — generate only the upper triangle (2080 of 4096
    // cells, half the rows through the hash agg) and mirror on the
    // driver; exactness is untouched
    val gram = t(s, dir, "embeddings")
      .select(expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      .select(explode(expr(
        """flatten(transform(sequence(1, 64), i ->
           |  transform(sequence(i, 64), j ->
           |    named_struct('i', i - 1, 'j', j - 1,
           |      'p', element_at(v, cast(i as int)) * element_at(v, cast(j as int))))))""".stripMargin))
        .as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p").cast("decimal(38,0)")).as("g"))
    val G = Array.ofDim[BigInt](64, 64)
    for (r <- gram.collect()) {
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = BigInt(r.getDecimal(2).toBigInteger)
      G(i)(j) = v
      G(j)(i) = v
    }
    var x = Array.fill(64)(BigInt(1000))
    for (_ <- 1 to iters) {
      val y = Array.tabulate(64)(i =>
        (0 until 64).map(j => G(i)(j) * x(j)).sum)
      val m = y.map(_.abs).max
      x = y.map(v => if (v < 0) -((-v) * 1000 / m) else v * 1000 / m)
    }
    import s.implicits._
    x.zipWithIndex.map { case (c, d) => (d.toLong, c.toLong) }
      .toSeq.toDF("dim", "comp").orderBy(col("dim"))
  }

  /** ADC top-5 search against an arbitrary (sub, code, cv) codebook —
    * shared by q_ann_adc (unrefined sample codebook) and AnnSpec's
    * trained-vs-sample recall comparison. */
  /** PQ encodings for every vector (nearest codebook entry per
    * subspace) and the per-query ADC lookup table — shared by
    * adcSearch and the composed IVF+ADC index. */
  private def pqCodesLut(s: SparkSession, dir: String,
      codebook: DataFrame): (DataFrame, DataFrame) = {
    val (subs, _) = pqSubs(s, dir)
    val codes = subs.join(broadcast(codebook), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"), pqSqDist.as("d2"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))
    val lut = subs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("sub"), col("sv"))
      .join(codebook, Seq("sub"))
      .select(col("qid"), col("sub"), col("code"), pqSqDist.as("lut_d2"))
    (codes, lut)
  }

  private[graft] def adcSearch(s: SparkSession, dir: String,
      codebook: DataFrame): DataFrame = {
    val (codes, lut) = pqCodesLut(s, dir, codebook)
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("lut_d2")).as("adc_d2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_d2"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("nb"), col("adc_d2"))
      .orderBy(col("qid"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Rolling z-score anomaly flags WITHOUT floats — the monitoring
    // primitive ("is this event 3σ off this user's recent behavior")
    // kept cross-engine exact by clearing denominators: z > 3 over the
    // trailing-20 frame ⟺ (n·x − s)² > 9·(n·ss − s²), all integer
    // window sums (frame is bounded, so every product fits a long at
    // any corpus size). One window pass per user, one hash agg; flags
    // need ≥10 frame rows so cold-start rows can't alarm.
    "q_events_rolling_zscore" -> ((s, dir) => {
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-19, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("x"))
        .withColumn("n", count(lit(1)).over(frame))
        .withColumn("sf", sum(col("x")).over(frame))
        .withColumn("ssf", sum(col("x") * col("x")).over(frame))
        .withColumn("flag",
          (col("n") >= 10) &&
            ((col("n") * col("x") - col("sf")) * (col("n") * col("x") - col("sf"))
              > lit(9L) * (col("n") * col("ssf") - col("sf") * col("sf"))))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("flag"), 1L).otherwise(0L)).as("n_anomalies"))
        .orderBy(col("user_id"))
    }),

    // SQ8 scalar quantization error per dimension — the third leg of
    // the vector-compression audit (PQ codebooks in q_ann_pq, prefix
    // truncation in q_ann_matryoshka; SQ8 is what most 100 TB indexes
    // actually ship): per-dim min/max from one agg, 0..255 codes and
    // reconstructions via integer floor arithmetic, absolute error
    // summed exactly. The per-dim range table is a 64-row broadcast
    // back against the exploded values — no second corpus pass, no
    // driver collect.
    "q_embed_sq8_error" -> ((s, dir) => {
      val vals = t(s, dir, "embeddings")
        .select(posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))")))
        .toDF("dim", "q")
      val ranges = vals.groupBy(col("dim"))
        .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
      vals.join(broadcast(ranges), Seq("dim"))
        .withColumn("code",
          expr("((q - mn) * 255) div nullif(mx - mn, 0)"))
        .withColumn("recon",
          expr("mn + (coalesce(code, 0) * (mx - mn)) div 255"))
        .withColumn("err", abs(col("q") - col("recon")))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), max(col("mn")).as("mn"),
          max(col("mx")).as("mx"),
          sum(col("err")).as("sum_abs_err"), max(col("err")).as("max_abs_err"))
        .select(col("dim").cast("long").as("dim"), col("n"), col("mn"),
          col("mx"), col("sum_abs_err"), col("max_abs_err"),
          expr("sum_abs_err div n").as("mean_abs_err"))
        .orderBy(col("dim"))
    }),

    // Total-variation distance between source unigram distributions —
    // the drift metric that needs NO logarithm (χ² in
    // q_text_chisq_drift is significance; TV = ½Σ|p−q| is effect size
    // on the same vocabulary): kept exact by clearing denominators —
    // Σ|ca·Nb − cb·Na| accumulates in decimal(38,0) and one ppm floor
    // division by 2·Na·Nb lands the distance. Source-pair fan-out is a
    // broadcast of the k-row totals; the token-level work is one full
    // outer equi-join on (pair, token) — missing tokens count as zero
    // mass, which the join's nulls encode for free.
    "q_text_tv_distance" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val ct = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = ct.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
      val prs = tot.as("ta").crossJoin(tot.as("tb"))
        .filter(col("ta.source") < col("tb.source"))
        .select(col("ta.source").as("sa"), col("tb.source").as("sb"),
          col("ta.n").as("na"), col("tb.n").as("nb"))
      val a = ct.join(broadcast(prs), col("source") === col("sa"))
        .select(col("sa"), col("sb"), col("tok"), col("cnt").as("ca"))
      val b = ct.join(broadcast(prs), col("source") === col("sb"))
        .select(col("sa").as("sa2"), col("sb").as("sb2"), col("tok").as("tok2"),
          col("cnt").as("cb"))
      a.join(b, col("sa") === col("sa2") && col("sb") === col("sb2") &&
          col("tok") === col("tok2"), "full_outer")
        .select(coalesce(col("sa"), col("sa2")).as("sa"),
          coalesce(col("sb"), col("sb2")).as("sb"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
        .join(broadcast(prs.select(col("sa").as("psa"), col("sb").as("psb"),
          col("na"), col("nb"))),
          col("sa") === col("psa") && col("sb") === col("psb"))
        .groupBy(col("sa"), col("sb"))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(abs(col("ca").cast(dec) * col("nb") - col("cb").cast(dec) * col("na")))
            .as("sdiff"))
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          expr(s"cast((sdiff * 1000000) div (cast(2 as $dec) * na * nb) as bigint)")
            .as("tv_ppm"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Haar wavelet energy decomposition of the daily volume series per
    // event type — the multi-resolution burstiness readout (which
    // timescale carries the variance: day-to-day jitter vs weekly
    // swings vs the monthly trend). The series is EXACT integer counts
    // on a 32-slot dyadic spine (observed days left-joined, gaps = 0),
    // and each of the 5 Haar levels is one tiny hash agg pairing
    // adjacent slots into sums (carried down) and differences (squared
    // into the level's energy, accumulated in decimal(38,0)). Only the
    // day-grain agg touches the corpus; everything after is ≤ 5×32 rows.
    "q_events_haar_energy" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val ev = t(s, dir, "events")
        .select(col("event_type"),
          expr("cast(floor(unix_timestamp(ts)) as bigint) div 86400").as("day"))
      val daily = ev.crossJoin(ev.agg(min(col("day")).as("d0")))
        .select(col("event_type"), (col("day") - col("d0")).as("slot"))
        .filter(col("slot") < 32)
        .groupBy(col("event_type"), col("slot"))
        .agg(count(lit(1)).as("v"))
      val spine = daily.select(col("event_type")).distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(31L))).as("slot"))
      var cur = spine.join(daily, Seq("event_type", "slot"), "left")
        .select(col("event_type"), col("slot"), coalesce(col("v"), lit(0L)).as("v"))
      val levels = (1 to 5).map { l =>
        val paired = cur.groupBy(col("event_type"),
            expr("slot div 2").as("slot"))
          .agg(sum(when(col("slot") % 2 === 0, col("v")).otherwise(0L)).as("ev"),
            sum(when(col("slot") % 2 === 1, col("v")).otherwise(0L)).as("od"))
        val energy = paired
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_coefs"),
            sum(((col("ev") - col("od")) * (col("ev") - col("od"))).cast(dec))
              .as("endec"))
          .select(col("event_type"), lit(l.toLong).as("level"),
            col("n_coefs"), col("endec").cast("long").as("energy"))
        cur = paired.select(col("event_type"), col("slot"),
          (col("ev") + col("od")).as("v"))
        energy
      }
      levels.reduce(_.unionByName(_))
        .orderBy(col("event_type"), col("level"))
    }),

    // Two-cohort QQ comparison per event type — the distribution-shift
    // view behind a mean test (q_events_ttest says "the means differ",
    // this says WHERE in the distribution): exact deciles of the
    // weekend vs weekday cohorts side by side. Deciles come from the
    // scalable rank-pick shape (row_number over a total (cents,
    // event_id) order per (type, cohort), pick rank ceil(q·n/10) via
    // integer formulas — values are PICKED, never averaged), then the
    // two 45-row decile sets equi-join on (type, q). No collect_list,
    // no per-group materialization.
    "q_events_qq" -> ((s, dir) => {
      val ranked = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"), col("event_id"),
          (expr("cast(floor(unix_timestamp(ts)) as bigint) div 86400") % 7 < 2)
            .as("g"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"), col("g"))
            .orderBy(col("c"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"), col("g"))))
      val deciles = ranked
        .select(col("event_type"), col("g"), col("c"),
          explode(sequence(lit(1L), lit(9L))).as("q"), col("rn"), col("n"))
        .filter(col("rn") === expr("(q * n + 9) div 10"))
        .groupBy(col("event_type"), col("g"), col("q"))
        .agg(max(col("c")).as("val"))
      deciles.filter(col("g")).as("a")
        .join(deciles.filter(!col("g")).as("b"),
          col("a.event_type") === col("b.event_type") && col("a.q") === col("b.q"))
        .select(col("a.event_type").as("event_type"), col("a.q").as("q"),
          col("a.val").as("weekend_cents"), col("b.val").as("weekday_cents"),
          (col("a.val") - col("b.val")).as("qq_diff_cents"))
        .orderBy(col("event_type"), col("q"))
    }),

    // Grid-bucketed spatial ε-neighbor join — the 2D cousin of the 1D
    // band join: points (md5-derived integer coords, both engines draw
    // the same plane) pair up when within L∞ ε=8, found by replicating
    // each point into its 3×3 neighbor cells (cell = coord div 8) and
    // equi-joining probes against home cells — each point has ONE home
    // cell, so every surviving pair appears exactly once and the O(n²)
    // cross join never exists. The oracle is the brute-force quadratic
    // join: identical output, which is precisely the point — the grid
    // plan is the 100 TB-shaped rewrite of the naive one.
    "q_join_spatial_grid" -> ((s, dir) => {
      val pts = t(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"),
          (conv(substring(md5(concat(lit("x"), col("doc_id"))), 1, 8), 16, 10)
            .cast("long") % 1000).as("x"),
          (conv(substring(md5(concat(lit("y"), col("doc_id"))), 1, 8), 16, 10)
            .cast("long") % 1000).as("y"))
      val probes = pts
        .select(col("doc_id").as("ia"), col("x").as("xa"), col("y").as("ya"),
          explode(expr(
            "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(x div 8 + dx AS cx, y div 8 + dy AS cy))))"))
            .as("cell"))
        .select(col("ia"), col("xa"), col("ya"),
          col("cell.cx").as("cx"), col("cell.cy").as("cy"))
      val homes = pts.select(col("doc_id").as("ib"), col("x").as("xb"),
        col("y").as("yb"), expr("x div 8").as("hx"), expr("y div 8").as("hy"))
      probes.join(homes, col("cx") === col("hx") && col("cy") === col("hy"))
        .filter(col("ia") < col("ib") &&
          abs(col("xa") - col("xb")) <= 8 && abs(col("ya") - col("yb")) <= 8)
        .select(col("ia"), col("ib"), (col("xa") - col("xb")).as("dx"),
          (col("ya") - col("yb")).as("dy"))
        .orderBy(col("ia"), col("ib"))
    }),

    // Batch-hard triplet mining over the labeled audit subset — the
    // metric-learning data op: per anchor, the HARDEST positive
    // (farthest same-label point) and HARDEST negative (nearest
    // other-label point) by exact integer L2, and the margin between
    // them (negative margin ⇒ the anchor violates the triplet
    // constraint — those rows are the training batch a miner emits).
    // One broadcast of the anchor set against the streaming candidate
    // side, one conditional min/max hash agg — no per-pair shuffle
    // survives the agg.
    "q_embed_triplet" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
            .as("v"))
      val anchors = e.select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"))
      e.as("c").join(broadcast(anchors), col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("qlabel"),
          (col("c.label") === col("qlabel")).as("same"),
          expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("d2"))
        .groupBy(col("qid"), col("qlabel").as("label"))
        .agg(max(when(col("same"), col("d2"))).as("hard_pos_d2"),
          min(when(!col("same"), col("d2"))).as("hard_neg_d2"))
        .select(col("qid"), col("label"), col("hard_pos_d2"), col("hard_neg_d2"),
          (col("hard_neg_d2") - col("hard_pos_d2")).as("margin"))
        .orderBy(col("qid"))
    }),

    // Local clustering coefficient per node over the near-dup candidate
    // graph — the per-vertex companion to the global q_graph_triangles
    // count: how clique-like each document's near-dup neighborhood is
    // (high coeff ⇒ a tight duplicate cluster, low ⇒ a hub stitching
    // unrelated groups — exactly the node a dedup auditor inspects).
    // Triangles enumerate through the standard two equi-join wedge+
    // closure shape on the a<b<c ordered pair list, then each triangle
    // credits all three vertices via a 3-row explode (stays inside the
    // shuffle); degrees are one hash agg over the symmetrized edges.
    // coeff = 2T/(d(d-1)) in exact ppm, d<2 nulled.
    "q_graph_clustering_coeff" -> ((s, dir) => {
      val p = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val tri = p.as("p1").join(p.as("p2"), col("p1.ib") === col("p2.ia"))
        .select(col("p1.ia").as("a"), col("p1.ib").as("b"), col("p2.ib").as("c"))
        .join(p.as("p3"),
          col("a") === col("p3.ia") && col("c") === col("p3.ib"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      val deg = p.select(col("ia").as("node"))
        .union(p.select(col("ib").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      deg.join(tri, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          expr("(coalesce(n_tri, 0L) * 2000000L) div nullif(deg * (deg - 1), 0)")
            .as("coeff_ppm"))
        .orderBy(col("node"))
    }),

    // Asymmetric shingle CONTAINMENT pairs — the near-dup case jaccard
    // structurally misses: a short document embedded verbatim inside a
    // much longer one (boilerplate-wrapped reposts, quote-expansions)
    // has tiny jaccard but containment ≈ 1 on the short side. Same
    // skew-resistant 3-gram inverted-index machinery as
    // q_dedup_ngram_jaccard (hashed shingles, a<b candidate equi-join),
    // but the score is |A∩B|/|A| per direction in EXACT ppm floor
    // divisions — the ≥0.8 keep-filter compares integers, so no float
    // boundary can flip a pair between engines.
    "q_dedup_containment" -> ((s, dir) => {
      val sh = t(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"), explode(array_distinct(expr(
          """case when size(split(text, ' ')) >= 3 then
            |  transform(sequence(1, size(split(text, ' ')) - 2),
            |            i -> concat_ws(' ', slice(split(text, ' '), i, 3)))
            |else array() end""".stripMargin))).as("g"))
        .select(col("doc_id"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
        .distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      sh.as("a")
        .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("sa"), col("ia") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("ib") === col("sb.doc_id"))
        .select(col("ia"), col("ib"), col("inter"),
          expr("(inter * 1000000L) div sa.sz").as("cont_a_ppm"),
          expr("(inter * 1000000L) div sb.sz").as("cont_b_ppm"))
        .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= 800000L)
        .orderBy(col("ia"), col("ib"))
    }),

    // Seasonal-naive forecast backtest per event type — the sanity
    // baseline every volume-forecasting effort must beat: predict each
    // day's event count by the same weekday one week earlier, score MAE
    // and signed bias over the scorable days. Day-grain hash agg first
    // (30 rows per type), then a self-equi-join on (type, day−7) — gap
    // tolerant, unlike lag(7) — and the errors are exact integer count
    // differences (mae reported in centi-events: sae·100 div n).
    "q_events_forecast_backtest" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("cast(floor(unix_timestamp(ts)) as bigint) div 86400").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      daily.as("cur")
        .join(daily.as("prev"),
          col("cur.event_type") === col("prev.event_type") &&
            col("cur.day") === col("prev.day") + 7)
        .select(col("cur.event_type").as("event_type"),
          (col("cur.cnt") - col("prev.cnt")).as("err"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("err"))).as("sum_abs_err"),
          sum(col("err")).as("bias"))
        .select(col("event_type"), col("n_days"), col("sum_abs_err"),
          col("bias"),
          expr("(sum_abs_err * 100L) div n_days").as("mae_centi"))
        .orderBy(col("event_type"))
    }),

    // kNN-graph reciprocity per label — the hubness diagnostic an
    // embedding-space audit runs before trusting ANN retrieval: in a
    // healthy space most "a's neighbor is b" edges are mutual; hubs
    // (high in-degree, low reciprocity) degrade retrieval and dedup
    // alike. Directed 5-NN edges by EXACT integer L2 over the bounded
    // audit subset (queries broadcast, candidates stream — the brute
    // q_ann_topk shape), mutuality via one self-equi-join on the
    // reversed key, and the per-label rollup is exact ppm.
    "q_ann_reciprocity" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
            .as("v"))
      val q = e.select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"))
      val edges = e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("qlabel"), col("c.vec_id").as("nb"),
          expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("nb"))))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("qlabel"), col("nb"))
      edges.as("f")
        .join(edges.as("r").select(col("qid").as("rq"), col("nb").as("rn2")),
          col("f.qid") === col("rn2") && col("f.nb") === col("rq"), "left")
        .groupBy(col("qlabel").as("label"))
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("rq").isNotNull, 1L).otherwise(0L)).as("n_mutual"))
        .select(col("label"), col("n_edges"), col("n_mutual"),
          expr("(n_mutual * 1000000L) div n_edges").as("recip_ppm"))
        .orderBy(col("label"))
    }),

    // Lorenz curve per event type — the distribution view behind the
    // single-number Gini (q_agg_gini): rank users by their value total,
    // bucket into deciles, report each decile's cumulative share of the
    // value mass in exact ppm. User-grain hash agg first (bounded by
    // distinct users), ntile over the unique (tot, user_id) order, then
    // 10-row-per-type window sums; the ppm numerator accumulates in
    // decimal(38,0) so cum*1e6 never wraps at any corpus size.
    "q_events_lorenz" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val byDec = Window.partitionBy(col("event_type")).orderBy(col("decile"))
      t(s, dir, "events")
        .select(col("event_type"), col("user_id"), cents(col("value")).as("c"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("c")).as("tot"))
        .withColumn("decile", ntile(10).over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("tot"), col("user_id"))))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("tot")).as("dec_cents"))
        .withColumn("cum_cents", sum(col("dec_cents")).over(
          byDec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total_cents", sum(col("dec_cents")).over(
          byDec.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("event_type"), col("decile").cast("long").as("decile"),
          col("n_users"), col("dec_cents"), col("cum_cents"),
          expr(s"cast((cast(cum_cents as $dec) * 1000000) div total_cents as bigint)")
            .as("cum_share_ppm"))
        .orderBy(col("event_type"), col("decile"))
    }),

    // Rolling exact median over the last-5-events frame per user — the
    // robust rolling center a monitoring dashboard wants where a rolling
    // mean would chase outliers. The frame's values ride a sorted
    // collect_list window (bounded: 5 longs per row), the median is kept
    // exact by doubling (med2 = 2×mid for odd frames, mid+mid+1 for
    // even — no .5 floats), and the output folds to one row per user
    // (last/min/max of the rolling track), so result size is bounded by
    // distinct users, not events.
    "q_window_rolling_median" -> ((s, dir) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = ord.rowsBetween(-4, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("c"))
        .withColumn("win", sort_array(collect_list(col("c")).over(frame)))
        .withColumn("k", size(col("win")))
        .withColumn("med2", expr(
          """case when k % 2 = 1
            |     then 2 * element_at(win, cast((k + 1) div 2 as int))
            |     else element_at(win, cast(k div 2 as int))
            |        + element_at(win, cast(k div 2 + 1 as int))
            |end""".stripMargin))
        .withColumn("rn", row_number().over(ord))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          min(col("med2")).as("min_med2"),
          max(col("med2")).as("max_med2"),
          max(struct(col("rn"), col("med2"))).getField("med2")
            .as("last_med2"))
        .orderBy(col("user_id"))
    }),

    // Embedding covariance matrix (first 8 dims) in ONE pass — the
    // anisotropy/correlated-dims readout next to per-dim q_embed_dimstats
    // when auditing an embedding space. No explode, no self-join: all 36
    // upper-triangle product sums plus 8 dim sums ride a single
    // partial+final hash aggregate over the table (values quantized to
    // 1e-6 units, products exact in decimal(38,0)), then the 1-row agg
    // explodes into 36 (dim_i, dim_j, cov) rows driver-free. Both
    // engines cast the identical exact integers to double and divide
    // once, so the 9dp-rounded covariances are bit-equal.
    "q_embed_covariance" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val D = 8
      val qs = (0 until D).map(i => expr(
        s"cast(round(cast(element_at(embedding, ${i + 1}) as double) * 1000000) as bigint)")
        .as(s"q$i"))
      val sums = (0 until D).map(i => sum(col(s"q$i").cast(dec)).as(s"s$i")) ++
        (for { i <- 0 until D; j <- i until D } yield
          sum((col(s"q$i") * col(s"q$j")).cast(dec)).as(s"p${i}_$j"))
      val aggd = t(s, dir, "embeddings").select(qs: _*)
        .agg(count(lit(1)).as("n"), sums: _*)
      val nd = col("n").cast("double")
      val covCols = for { i <- 0 until D; j <- i until D } yield
        struct(lit(i.toLong).as("dim_i"), lit(j.toLong).as("dim_j"),
          round((col(s"p${i}_$j").cast("double") * nd
            - col(s"s$i").cast("double") * col(s"s$j").cast("double"))
            / (nd * nd * lit(1e12)), 9).as("cov"))
      aggd.select(explode(array(covCols: _*)).as("kv"))
        .select(col("kv.dim_i").as("dim_i"), col("kv.dim_j").as("dim_j"),
          (col("kv.cov") + lit(0.0)).as("cov"))
        .orderBy(col("dim_i"), col("dim_j"))
    }),

    // 2×2 contingency odds ratio per event type — the effect-size number
    // that belongs next to the chi-square drift test (q_text_chisq_drift
    // answers "is there an association", this answers "how strong"):
    // weekend-cohort × high-value cells a/b/c/d from ONE conditional-sum
    // hash agg, odds ratio (ad/bc) and relative risk in exact ppm floor
    // divisions over decimal(38,0) (a*d*1e6 wraps int64 around SF100),
    // zero-count denominators nulled rather than poisoned.
    "q_events_odds_ratio" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"),
          (expr("cast(floor(unix_timestamp(ts)) as bigint) div 86400") % 7 < 2)
            .as("g"),
          (cents(col("value")) >= 3500).as("hi"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("g") && col("hi"), 1L).otherwise(0L)).as("a"),
          sum(when(col("g") && !col("hi"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("g") && col("hi"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("g") && !col("hi"), 1L).otherwise(0L)).as("d"))
        .select(col("event_type"), col("a"), col("b"), col("c"), col("d"),
          expr(s"cast((cast(a as $dec) * d * 1000000) div nullif(cast(b as $dec) * c, 0) as bigint)")
            .as("or_ppm"),
          expr(s"cast((cast(a as $dec) * (c + d) * 1000000) div nullif(cast(c as $dec) * (a + b), 0) as bigint)")
            .as("rr_ppm"))
        .orderBy(col("event_type"))
    }),

    // Recency-weighted user value with EXACT dyadic decay — the scoring
    // a freshness-aware sampler or retrieval ranker uses, kept
    // cross-engine exact by decaying in powers of two (cents >> halved
    // per 3-day half-life, age capped at 40 shifts) instead of libm
    // exp(): floor(age/halflife) integer buckets, one shiftleft divide
    // per row, one hash agg per user. The corpus max timestamp is a
    // 1-row agg broadcast against the stream, never a driver collect.
    "q_events_decay_score" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"),
          expr("cast(floor(unix_timestamp(ts)) as bigint)").as("sec"),
          cents(col("value")).as("c"))
      e.crossJoin(e.agg(max(col("sec")).as("max_sec")))
        .withColumn("age", expr("least((max_sec - sec) div 259200, 40L)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("c div shiftleft(cast(1 as bigint), cast(age as int))"))
            .as("decayed_cents"),
          sum(col("c")).as("raw_cents"))
        .orderBy(col("user_id"))
    }),

    // Herfindahl–Hirschman concentration per event type — the market-
    // concentration number next to Gini on a curation dashboard: how
    // much of each event type's value mass sits with few users.
    // HHI = Σ shareᵢ² over user shares, in exact ppm: user-grain hash
    // agg first (bounded by distinct users), then one k-row agg; the
    // squared sums accumulate in decimal(38,0) so tot² never wraps.
    "q_agg_hhi" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), col("user_id"), cents(col("value")).as("c"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("c")).as("tot"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("tot")).as("total_cents"),
          sum((col("tot").cast(dec) * col("tot")).cast(dec)).as("ss"))
        .select(col("event_type"), col("n_users"), col("total_cents"),
          expr(s"cast((ss * 1000000) div (cast(total_cents as $dec) * total_cents) as bigint)")
            .as("hhi_ppm"))
        .orderBy(col("event_type"))
    }),

    // Cohen's kappa — inter-annotator agreement on labels, the label-QA
    // gate every human-annotation pipeline runs before training on the
    // labels. Annotator A = label % 4; annotator B = a deterministic
    // "80%-faithful" relabel drawn from the md5 of the row key (both
    // engines replay the identical draw). Exact integer form: po and pe
    // in ppm floor divisions, kappa from those two integers — three
    // bounded hash aggs (≤4 rows each) and one 4-row join, never a
    // second pass over the data.
    "q_eval_kappa" -> ((s, dir) => {
      val h = conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val lab = t(s, dir, "embeddings")
        .select((col("label") % 4).cast("long").as("a"), h.as("h"))
        .select(col("a"),
          when(col("h") % 10 < 6, col("a"))
            .otherwise((col("a") + lit(1L) + col("h") % 3) % 4).as("b"))
      val base = lab.agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
      val ma = lab.groupBy(col("a").as("k")).agg(count(lit(1)).as("na"))
      val mb = lab.groupBy(col("b").as("k")).agg(count(lit(1)).as("nb"))
      val joint = ma.join(mb, "k")
        .agg(sum(col("na") * col("nb")).as("joint"))
      base.crossJoin(joint)
        .select(col("n"), col("agree"),
          expr("(agree * 1000000L) div n").as("po_ppm"),
          expr("(joint * 1000000L) div (n * n)").as("pe_ppm"))
        .select(col("n"), col("agree"), col("po_ppm"), col("pe_ppm"),
          expr("((po_ppm - pe_ppm) * 1000000L) div (1000000L - pe_ppm)")
            .as("kappa_ppm"))
    }),

    // Welch's t statistic per event type — the A/B significance readout
    // between two deterministic day-of-cycle cohorts (day%7 < 2 vs the
    // rest; pure epoch arithmetic, no calendar functions, so both
    // engines draw identical groups). Exact integer n/Σx/Σx² per arm in
    // one conditional-sum hash agg; ONE cast to double, then the
    // identical IEEE formula in both engines, 6dp round with -0.0
    // collapsed. Pairs with q_events_mann_whitney (rank test) and
    // q_events_cuped (variance reduction).
    "q_events_ttest" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("x"),
          (expr("cast(floor(unix_timestamp(ts)) as bigint) div 86400") % 7 < 2)
            .as("g"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("g"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("g"), col("x")).otherwise(0L).cast(dec)).as("s1"),
          sum(when(col("g"), col("x") * col("x")).otherwise(0L).cast(dec))
            .as("ss1"),
          sum(when(!col("g"), 1L).otherwise(0L)).as("n0"),
          sum(when(!col("g"), col("x")).otherwise(0L).cast(dec)).as("s0"),
          sum(when(!col("g"), col("x") * col("x")).otherwise(0L).cast(dec))
            .as("ss0"))
        .select(col("event_type"), col("n1").as("n_a"), col("n0").as("n_b"),
          ((col("s1").cast("double") / col("n1")) -
            (col("s0").cast("double") / col("n0"))).as("md"),
          ((col("ss1").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n1")) /
            (col("n1") - 1) / col("n1")).as("va"),
          ((col("ss0").cast("double") -
            col("s0").cast("double") * col("s0").cast("double") / col("n0")) /
            (col("n0") - 1) / col("n0")).as("vb"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          (round(col("md") / sqrt(col("va") + col("vb")), 6) + lit(0.0))
            .as("t_welch"))
        .orderBy(col("event_type"))
    }),

    // first/last/nth_value window frames — the "what did this user do
    // first, second, and most recently" per-entity summary, read off
    // ONE full-frame window pass ordered by (ts, event_id) (unique key
    // breaks timestamp ties deterministically). The windows run over
    // the event stream but the output is one row per user (row_number
    // = 1 pick), so result size is bounded by distinct users.
    "q_window_nth" -> ((s, dir) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val full = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("c"), col("event_type"))
        .withColumn("rn", row_number().over(ord))
        .withColumn("n", count(lit(1)).over(full))
        .withColumn("first_cents", first(col("c")).over(full))
        .withColumn("second_cents", nth_value(col("c"), 2).over(full))
        .withColumn("last_cents", last(col("c")).over(full))
        .withColumn("first_type", first(col("event_type")).over(full))
        .withColumn("last_type", last(col("event_type")).over(full))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("n"), col("first_type"), col("last_type"),
          col("first_cents"), col("second_cents"), col("last_cents"))
        .orderBy(col("user_id"))
    }),

    // S7/P1/P8 — scan + filter + projection (pushdown-friendly)
    "q_scan_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.02)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // A1 — classic grouped aggregation, integerized money
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          sum(cents(col("l_discount"))).as("sum_disc_c"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A3 — request-stats analog: per-priority counts + exact-int avg
    "q_agg_stats" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_c"))
        .withColumn("avg_price", round(col("sum_c") / (col("n") * 100.0), 4))
        .orderBy(col("o_orderpriority"))
    }),

    // A4 — histogram (np.histogram analog, stat_app.py:47-58)
    "q_agg_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(floor(col("value") / 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // A5 — quality binning (stats.py:24-34 analog)
    "q_agg_bins" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(when(col("value") >= 100, "high")
          .when(col("value") >= 50, "good")
          .when(col("value") >= 10, "ok")
          .otherwise("low").as("bin"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
        .orderBy(col("bin"))
    }),

    // A6 — recognized-vs-not split (stat_app.py:29-33 analog)
    "q_agg_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(when(col("n_chars") >= 200, 1L).otherwise(0L)).as("n_long"),
          sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("n_short"))
        .orderBy(col("lang"))
    }),

    // P2 — band filter (conf/y-band analog)
    "q_band_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("value") >= 0.5 && col("value") <= 50 && col("event_type") =!= "error")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
        .orderBy(col("event_type"))
    }),

    // J1 — broadcast dim lookup chain (config-lookup analog)
    "q_join_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left_outer")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left_outer")
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), sum(cents(col("c_acctbal"))).as("bal_c"))
        .orderBy(col("r_name"))
    }),

    // J2 — fuzzy theta join (difflib close-match analog, broadcast NL)
    "q_join_fuzzy" -> ((s, dir) => {
      val a = t(s, dir, "nation").select(col("n_name").as("a_name"))
      val b = t(s, dir, "nation").select(col("n_name").as("b_name"))
      a.join(broadcast(b), levenshtein(col("a_name"), col("b_name")) <= 1 &&
          col("a_name") < col("b_name"))
        .orderBy(col("a_name"), col("b_name"))
    }),

    // J3 — anti join (golden-diff / missing-rows analog)
    "q_join_anti" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // J4 — semi join
    "q_join_semi" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // O2/O3 — top-k with total order
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
        .limit(10)
    }),

    // O2/O3 via the NATIVE whole-operator extension: top-3 events per
    // user through graft.functions.TopK — a custom LogicalPlan planned
    // by TopKStrategy as partial (per-partition bounded heaps) →
    // key-exchange → final, so only ≤ k rows per key per partition ever
    // shuffle, vs the window-rank form sorting every row of every
    // group. Order carries the event_id tie-breaker so the result SET
    // is total; the same window-rank SQL is the oracle.
    "q_topk_native" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), cents(col("value")).as("c"))
      graft.functions.TopK.topKPerKey(e, 3,
          Seq(col("user_id")), Seq(col("c").desc, col("event_id").asc))
        .orderBy(col("user_id"), col("c").desc, col("event_id"))
    }),

    // W1/O2 — per-group top-1 via window rank
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), cents(col("value")).as("value_c"))
        .orderBy(col("user_id"))
    }),

    // W2 — gap sessionization (the row-grouping analog, 30-min gap)
    "q_window_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("cur_ms", unix_millis(col("ts").cast("timestamp"))) // ts is NTZ; session TZ is UTC
        .withColumn("prev_ms", lag(col("cur_ms"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ms").isNull || col("cur_ms") - col("prev_ms") > 1800000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // W2b — running sum frame (restricted users to keep output small)
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .withColumn("running_c", sum(cents(col("value"))).over(w))
        .select(col("user_id"), col("event_id"), col("running_c"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Source-priority dedup — when the same content key arrives from
    // several sources, keep the copy from the highest-priority source
    // (corpus recipes prefer curated mirrors over raw crawl): one
    // max_by/min_by hash aggregation on a composite priority ordinal
    // (prio·1e6 + doc_id — unique, so the winner is total and the hash
    // compare exact). Key = first-3-words prefix so groups genuinely
    // collide on the synth corpus. DuckDB mirror: arg_max/arg_min.
    "q_dedup_priority" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("key"),
          (col("doc_id") % 3).cast("long").as("prio"))
        .withColumn("ord", col("prio") * lit(1000000L) + col("doc_id"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_copies"),
          max_by(col("doc_id"), col("ord")).as("keep_doc"),
          min_by(col("doc_id"), col("ord")).as("worst_doc"),
          max(col("prio")).as("best_prio"))
        .orderBy(col("key"))
    }),

    // PII scrubbing — the redaction pass every training corpus runs
    // before the tokenizer: count and replace email addresses and long
    // digit runs. The synth corpus carries no PII, so a deterministic
    // injection (every 5th doc gets a synthetic contact line) makes the
    // op genuinely fire; both engines inject, count, and redact with
    // the same RE2-compatible patterns. Scale shape: pure scalar
    // map — no shuffle, codegen'd regex.
    "q_text_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"
      val longnum = "[0-9]{7,}"
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" contact-"), col("doc_id"),
              lit("@example.com ph 1234567890")))
            .otherwise(col("text")).as("tx"))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(tx, '$email', 0)")).cast("long").as("n_email"),
          size(expr(s"regexp_extract_all(tx, '$longnum', 0)")).cast("long").as("n_num"),
          md5(regexp_replace(regexp_replace(col("tx"), email.replace("\\\\", "\\"), "<EMAIL>"),
            longnum, "<NUM>")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Repetition-ratio quality signal: the share of a document's
    // 3-grams taken by its single most repeated 3-gram — the standard
    // boilerplate/degenerate-text filter signal in corpus curation.
    // Exact integer counts, ONE rounded double division. Scale shape:
    // explode → two partial+final hash aggs keyed by (doc, gram) then
    // doc — no joins, no skew (gram cardinality per doc is bounded by
    // doc length).
    "q_text_repetition" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          """transform(slice(w, 1, greatest(size(w) - 2, 0)),
            |          (x, i) -> concat_ws(' ', x, element_at(w, i + 2), element_at(w, i + 3)))"""
            .stripMargin)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_gram_n"), sum(col("c")).as("n_grams"))
        .select(col("doc_id"), col("top_gram_n"), col("n_grams"),
          round(col("top_gram_n") / col("n_grams"), 6).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Training-mixture sampling: deterministic per-stratum hash
    // sampling (keep iff md5-hash(doc_id) mod 100 < stratum rate) — the
    // reproducible mixture-weighting primitive of every corpus recipe
    // (sample source A at 50%, B at 20%, C at 5%). Hash-based, so the
    // sample is stable under partitioning, re-runs, and engine choice —
    // the oracle recomputes the identical md5 draw. Scale shape: a
    // scan + scalar filter, no shuffle at all.
    "q_sample_stratified" -> ((s, dir) => {
      val h = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100).as("h")
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          (col("doc_id") % 3).cast("long").as("stratum"), h)
        .filter(col("h") < when(col("stratum") === 0, 50)
          .when(col("stratum") === 1, 20).otherwise(5))
        .orderBy(col("doc_id"))
    }),

    // Sequence packing (concat-and-chunk): assign each document its
    // training-sequence id by exclusive running token count within its
    // shard — floor(start_tok / budget) — the standard streaming
    // packing an LLM pipeline runs before tokenized-example writing.
    // One window shuffle per shard key; the running sum is exact
    // integer arithmetic so the assignment is engine-identical.
    "q_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          (col("doc_id") % 4).cast("long").as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("seq_id", expr("start_tok div 2048"))
        .orderBy(col("doc_id"))
    }),

    // Length-bucketed batching report — the padding-waste accounting a
    // training pipeline runs when batches pad to a bucket ceiling
    // instead of the global max: each doc lands in its power-of-two
    // token bucket (exact CASE ladder — no cross-engine log2 at the
    // boundaries), and per bucket the report carries doc count, real
    // tokens, padded tokens, and waste ppm in exact integers. Scale
    // shape: scan + scalar map + one partial+final agg over ≤ 9 groups.
    "q_pack_lenbuckets" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("bucket",
          when(col("n_tok") <= 16, 16L).when(col("n_tok") <= 32, 32L)
            .when(col("n_tok") <= 64, 64L).when(col("n_tok") <= 128, 128L)
            .when(col("n_tok") <= 256, 256L).when(col("n_tok") <= 512, 512L)
            .when(col("n_tok") <= 1024, 1024L).otherwise(2048L))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("real_tok"))
        .withColumn("padded_tok", col("n_docs") * col("bucket"))
        .withColumn("waste_ppm",
          expr("((padded_tok - real_tok) * 1000000L) div padded_tok"))
        .orderBy(col("bucket"))
    }),

    // Preference-pair mining — the RLHF/DPO data-construction step:
    // within each group of scored candidates (here: a user's purchase
    // events standing in for a prompt's sampled responses), emit the
    // (chosen, rejected) pair = best vs worst score with the score
    // margin. ONE max_by/min_by hash aggregation on a total composite
    // ordinal (score·1e8 − id — unique while ids < 1e8; at larger id
    // spaces widen to decimal), so no window sort and no self-join —
    // at 100 TB this is a single partial+final agg keyed by prompt.
    "q_pref_pairs" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), cents(col("value")).as("score_c"))
        .withColumn("ord", col("score_c") * lit(100000000L) - col("event_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_cand"),
          max_by(col("event_id"), col("ord")).as("chosen_id"),
          max(col("score_c")).as("chosen_c"),
          min_by(col("event_id"), col("ord")).as("rejected_id"),
          min(col("score_c")).as("rejected_c"))
        .filter(col("n_cand") >= 2)
        .select(col("user_id"), col("chosen_id"), col("rejected_id"),
          (col("chosen_c") - col("rejected_c")).as("margin_c"))
        .orderBy(col("user_id"))
    }),

    // Deterministic per-key reservoir sample (k=5) — the reproducible
    // "keep k examples per source" primitive: rank each row by the md5
    // of its id and keep the k smallest per key. Runs through the
    // NATIVE TopKPerKey operator (partial per-partition heaps → key
    // exchange → final), so only ≤ k rows per key per partition ever
    // shuffle — the window-rank form the oracle uses would sort every
    // group in full. Hash-ranked, so the sample is stable under
    // partitioning, re-runs, and engine choice.
    // Priority (sequential-Poisson) sampling — weighted without-
    // replacement selection by the bottom-k of key = u div w: u is a
    // reproducible md5 uniform, w the document's byte weight, so heavy
    // documents draw small keys proportionally more often (the
    // Ohlsson/Rosén estimator family, here with the key kept as the
    // exact integer u·10⁶ div w — no log/pow). The bottom-k runs on
    // the native TopKPerKey operator under a constant group key:
    // partial pass keeps ≤50 per input split, the final merge sees
    // only ≤50·|splits| survivors — never a global sort.
    "q_sample_priority" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10) as bigint) + 1").as("u"))
        .withColumn("prio", expr("u * 1000000L div w"))
        .withColumn("g", lit(0L))
      graft.functions.TopK.topKPerKey(d, 50, Seq(col("g")),
          Seq(col("prio").asc, col("doc_id").asc))
        .select(col("doc_id"), col("w"), col("prio"))
        .orderBy(col("prio"), col("doc_id"))
    }),

    // MinHash-LSH parameter planner — the analytic S-curve
    // p(detect) = 1 − (1 − s^r)^b for every (bands b × rows r) layout
    // of a 64-hash signature, over a similarity grid: the table an
    // engineer reads to pick the banding before a 100 TB dedup run
    // (q_dedup_minhash runs b=16,r=4 — this query shows WHY). Powers
    // are exact-integer ppm folds (x ← x·s div 10⁶ repeated — no
    // libm, bit-identical in any engine); the whole thing is a 36-row
    // literal grid, no table scan at all.
    "q_dedup_lsh_planner" -> ((s, dir) => {
      val grid = s.createDataFrame(Seq((32L, 2L), (16L, 4L), (8L, 8L), (4L, 16L)))
        .toDF("b", "r")
        .crossJoin(s.range(1, 10).select((col("id") * 100000L).as("s_ppm")))
      grid
        .withColumn("spow", expr(
          "aggregate(sequence(1L, r), cast(1000000 as bigint), (acc, i) -> acc * s_ppm div 1000000)"))
        .withColumn("inn", expr("1000000L - spow"))
        .withColumn("miss", expr(
          "aggregate(sequence(1L, b), cast(1000000 as bigint), (acc, i) -> acc * inn div 1000000)"))
        .select(col("b"), col("r"), col("s_ppm"),
          expr("1000000L - miss").as("p_detect_ppm"))
        .orderBy(col("b"), col("s_ppm"))
    }),

    "q_sample_reservoir" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          md5(col("event_id").cast("string")).as("hkey"))
      graft.functions.TopK.topKPerKey(e, 5,
          Seq(col("user_id")), Seq(col("hkey").asc, col("event_id").asc))
        .orderBy(col("user_id"), col("hkey"), col("event_id"))
    }),

    // Time-RANGE window frame — the rolling 7-day per-user count/sum
    // every transcript table gets asked for: the frame is defined by
    // VALUE distance on event time (epoch seconds), not row position,
    // so same-timestamp peers enter the frame together in both engines
    // and row-order ties cannot matter. The per-row output key
    // (user_id, event_id) is unique, so the hash compare is total.
    "q_window_timerange" -> ((s, dir) => {
      val sevenDays = 7L * 86400
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-sevenDays, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          cents(col("value")).as("c"))
        .select(col("user_id"), col("event_id"), col("ts_s"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("c")).over(w).as("cents_7d"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // O4 — first-element-per-group (first-page analog)
    "q_first_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("first_type"))
        .orderBy(col("user_id"))
    }),

    // set ops — except over distinct key sets
    "q_set_except" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "purchase" && col("value") >= 300).select(col("user_id")).distinct()
        .except(e.filter(col("event_type") === "error" && col("value") >= 300).select(col("user_id")).distinct())
        .orderBy(col("user_id"))
    }),

    // W6 — reading-order serialization analog: deterministic ordered concat
    "q_order_concat" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          "->").as("path"))
        .orderBy(col("user_id"))
    }),

    // F1 — char-repair translate
    "q_translate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          translate(substring(col("text"), 1, 50), "aeiou", "41015").as("repaired"))
        .orderBy(col("doc_id"))
    }),

    // F2/F3 — regex extraction + replace
    "q_regex" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "(join|merge|sort) (\\w+)", 2).as("after_op"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("consonant_len"))
        .orderBy(col("doc_id"))
    }),

    // F5 — whitespace split token counts
    "q_split_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long").as("n_re"))
        .orderBy(col("doc_id"))
    }),

    // F6 — display mapping CASE chain
    "q_case_map" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(when(col("l_quantity") >= 40, "x")
          .when(col("l_quantity") >= 20, "-")
          .otherwise(col("l_quantity").cast("int").cast("string")).as("display"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("display"))
    }),

    // rollup — hierarchical aggregation (grouping-set surface)
    "q_agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    // distinct aggregation
    "q_distinct_users" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // pivot-shaped wide aggregation (fixed column set for determinism)
    "q_pivot_types" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((col("user_id") / 10).cast("long").as("cohort"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy(col("cohort"))
    }),

    // as-of join: for every error event, the most recent prior click by
    // the same user (carry-forward window form — identical semantics in
    // both engines, no engine-specific ASOF syntax)
    "q_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .withColumn("last_click_ms",
          max(when(col("event_type") === "click",
            unix_millis(col("ts").cast("timestamp")))).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("last_click_ms"))
        .orderBy(col("event_id"))
    }),

    // W3 — cascade dedupe as a relational fold: per user, sorted event
    // values deduped with the reference's pops-cascade semantics
    // (survivor count). Fold seeded with the first element so the
    // Spark `aggregate` matches DuckDB `list_reduce` exactly.
    "q_cascade_dedupe" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(round(col("value") * 100).cast("long"))).as("vs"))
        .select(col("user_id"), expr(
          """aggregate(
             |  slice(transform(vs, x -> struct(x as last, 1L as n)), 2, size(vs)),
             |  struct(element_at(vs, 1) as last, 1L as n),
             |  (a, b) -> if(b.last - a.last > 50, struct(b.last as last, a.n + 1L as n), a)
             |).n""".stripMargin).as("survivors"))
        .orderBy(col("user_id"))
    }),

    // dedup 1 — exact hash-group dedupe
    "q_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("h"))
    }),

    // dedup 2 — token-set jaccard near-dup pairs (capped for bench scale;
    // the cap is a no-op at the verify SF).
    //
    // Document-frequency guard: a stopword-grade token makes an O(df²)
    // bucket in the inverted-index self-join — the classic skew bomb at
    // corpus scale. Tokens with df > τ are dropped from the token
    // UNIVERSE (both the intersection join and the set sizes, so the
    // jaccard stays internally consistent over the filtered universe)
    // and the drop is logged. τ=600 exceeds the verify SF's max possible
    // df (500 docs pass the doc_id cap at sf0.01), so the DuckDB oracle
    // is unchanged there; at larger SFs the guard fires — route
    // scale traffic to minhash/simhash candidates and use jaccard as the
    // exact verification stage on candidate pairs.
    "q_dedup_jaccard" -> ((s, dir) => {
      val dfCap = 600L
      val toksAll = t(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      val hot = toksAll.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap)
      val nHot = hot.count()
      if (nHot > 0)
        System.err.println(s"[q_dedup_jaccard] df-guard dropped $nHot hot tokens (df > $dfCap)")
      val toks = toksAll.join(broadcast(hot.select(col("tok"))), Seq("tok"), "left_anti")
      val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = toks.as("a")
        .join(toks.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("ia") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("ib") === col("sb.doc_id"))
        .withColumn("jac", round(col("inter") / (col("sa.sz") + col("sb.sz") - col("inter")), 6))
        .filter(col("jac") >= 0.9)
        .select(col("ia"), col("ib"), col("jac"))
        .orderBy(col("ia"), col("ib"))
    }),

    // dedup 2b — n-gram (3-word shingle) jaccard near-dup pairs. The
    // shingle form is the skew-resistant cousin of the token form
    // above: a 3-gram is far rarer than any stopword, so the inverted
    // index has no hot keys and the self-join buckets stay tiny. Each
    // shingle joins as a 60-bit md5-derived integer rather than the
    // string — same semantics (deterministic, mirrored in the oracle),
    // a fraction of the shuffle bytes at corpus scale. Doc cap mirrors
    // q_dedup_jaccard (no-op at the verify SF).
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      val sh = t(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"), explode(array_distinct(expr(
          """case when size(split(text, ' ')) >= 3 then
            |  transform(sequence(1, size(split(text, ' ')) - 2),
            |            i -> concat_ws(' ', slice(split(text, ' '), i, 3)))
            |else array() end""".stripMargin))).as("sh"))
        .select(col("doc_id"),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
        .distinct() // dedup at the HASH level so a (vanishingly rare)
                    // collision is counted once on both engines
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("ia") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("ib") === col("sb.doc_id"))
        .withColumn("jac", round(col("inter") / (col("sa.sz") + col("sb.sz") - col("inter")), 6))
        .filter(col("jac") >= 0.5)
        .select(col("ia"), col("ib"), col("jac"))
        .orderBy(col("ia"), col("ib"))
    }),

    // dedup 2c — substring-level duplicate SPAN extraction (the Lee et
    // al. 2022 "Deduplicating Training Data Makes Language Models
    // Better" ExactSubstr shape, re-expressed relationally): a 5-token
    // gram appearing in ≥2 distinct docs marks its positions
    // duplicated; runs of duplicated positions merge into MAXIMAL spans
    // (gaps-and-islands — a break opens when the next hit starts past
    // the previous gram's end+1). At corpus scale every step is a hash
    // agg / semi join on the gram, and the island window is per-doc
    // bounded; nothing touches a suffix array. Grams are built inside
    // the generator so the token array never survives into the shuffle.
    "q_dedup_spans" -> ((s, dir) => {
      val K = 5
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= K)
        .select(col("doc_id"), expr(
          s"""explode(transform(sequence(0, size(l) - $K),
             |  x -> struct(x AS i, concat_ws(' ', slice(l, x + 1, $K)) AS gram)))"""
            .stripMargin).as("g"))
        .select(col("doc_id"), col("g.i").as("i"), col("g.gram").as("gram"))
      val dup = grams.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("gram"))
      val pos = grams.join(dup, Seq("gram"), "left_semi")
        .select(col("doc_id"), col("i"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      pos
        .withColumn("brk",
          when(col("i") - lag(col("i"), 1).over(w) > K, 1).otherwise(0))
        .withColumn("grp", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("i")).cast("long").as("span_start"),
          (max(col("i")) + K - 1).cast("long").as("span_end"),
          count(lit(1)).as("n_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // dedup 3 — MinHash + LSH band buckets (md5-based, engine-portable)
    "q_dedup_minhash" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      val sigs = toks
        .withColumn("band", explode(sequence(lit(0), lit(7))))
        .groupBy(col("doc_id"), col("band"))
        .agg(min(md5(concat(col("band").cast("string"), lit(":"), col("tok")))).as("sig"))
      sigs.groupBy(col("band").cast("long").as("band"), col("sig"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
        .filter(col("n") >= 2)
        .orderBy(col("band"), col("sig"))
    }),

    // lead/lag window — next-event delta per user (tie-safe ordering)
    "q_window_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), cents(col("value")).as("cents"),
          lead(cents(col("value")), 1).over(w).as("next_cents"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // set ops 2/3 — intersect and union (q_set_except covers except)
    "q_set_intersect" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type") === "click").select(col("user_id")).distinct()
        .intersect(
          e.filter(col("event_type") === "purchase").select(col("user_id")).distinct())
        .orderBy(col("user_id"))
    }),
    "q_set_union" -> ((s, dir) => {
      t(s, dir, "events").select(col("user_id").as("id"))
        .union(t(s, dir, "orders")
          .filter(col("o_totalprice") > 50000).select(col("o_custkey").as("id")))
        .distinct()
        .orderBy(col("id"))
    }),

    // full outer join — activity union of two fact tables per key
    "q_join_outer" -> ((s, dir) => {
      val e = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val o = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      e.join(o, col("user_id") === col("o_custkey"), "full_outer")
        .select(coalesce(col("user_id"), col("o_custkey")).as("id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("id"))
    }),

    // grouping sets — explicit set list (rollup/cube are the other two)
    "q_agg_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT coalesce(l_returnflag, '*') AS rf,
              |       coalesce(l_linestatus, '*') AS ls, count(*) AS n
              |FROM lineitem_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
              |ORDER BY rf, ls""".stripMargin)
    }),

    // UDTF shape — posexplode over split tokens (S6 per-page expansion
    // analog; pos is the within-document ordinal)
    "q_tokens_explode" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // ordered-statistic aggregate — exact continuous-interpolation
    // median over integerized values (same interpolation rule as
    // DuckDB quantile_cont)
    "q_agg_median" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(cast(round(value * 100) as bigint), 0.5)"), 4)
            .as("median_cents"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // the spark.sql(...) surface: a query authored as SQL text over a
    // registered view, with the engine's custom expression installed as
    // a SQL function (SparkSessionExtensions path: GraftExtensions)
    "q_sql_surface" -> ((s, dir) => {
      org.apache.spark.sql.graftx.GraftFunctions.install(s)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
          |       CAST(month(l_shipdate) AS BIGINT) AS m,
          |       count(*) AS n,
          |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |       long_array_dot(array(count(*), 2L), array(3L, 5L)) AS dot_check
          |FROM lineitem_v
          |WHERE l_discount > 0.05
          |GROUP BY 1, 2 ORDER BY y, m""".stripMargin)
    }),

    // range join — non-equi interval join of a fact table against a
    // small band dimension. The right 100 TB shape: broadcast the tiny
    // interval dim (BroadcastNestedLoopJoin); large×large range joins
    // instead bucketize into an equi-join (see q_asof_join and
    // q_dedup_simhash_pairs for that pattern).
    "q_range_join" -> ((s, dir) => {
      val bands = s.createDataFrame(Seq(
        ("p0", 0.0, 25.0), ("p25", 25.0, 50.0), ("p50", 50.0, 75.0),
        ("p75", 75.0, 1e18))).toDF("band", "lo", "hi")
      t(s, dir, "events").as("e")
        .join(broadcast(bands).as("b"),
          col("e.value") >= col("b.lo") && col("e.value") < col("b.hi"))
        .groupBy(col("b.band"))
        .agg(count(lit(1)).as("n"), sum(cents(col("e.value"))).cast("long").as("sum_cents"))
        .orderBy(col("band"))
    }),

    // cube — all grouping-set combinations in one partial+final agg
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    // ntile — quartile assignment per user (tie-broken on event_id so
    // both engines agree on a total order)
    // temporal scalar family: truncation, calendar fields, day
    // arithmetic (dayofweek conventions differ — Spark is 1-based
    // Sunday, DuckDB 0-based Sunday; the oracle adds 1)
    "q_time_ops" -> ((s, dir) => {
      t(s, dir, "events").filter(col("user_id") < 10)
        .select(col("event_id"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"),
          dayofweek(col("ts")).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hh"),
          datediff(lit("2001-01-01").cast("date"), col("ts").cast("date"))
            .cast("long").as("days_to_ref"))
        .orderBy(col("event_id"))
    }),

    // string scalar family: pad/search/reverse/translate/token-prefix
    // (substring_index has no DuckDB twin — the oracle rebuilds it from
    // string_split, identical incl. the fewer-than-n-tokens case)
    "q_string_ops" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          lpad(substring(col("text"), 1, 10), 14, "*").as("padded"),
          instr(col("text"), "the").cast("long").as("pos_the"),
          reverse(substring(col("text"), 1, 12)).as("rev12"),
          translate(substring(col("text"), 1, 20), "aeiou", "AEIOU").as("tr20"),
          substring_index(col("text"), " ", 3).as("first3"))
        .orderBy(col("doc_id"))
    }),

    // TPC-H Q3 shape (shipping priority): dim-filtered 3-way join →
    // grouped integerized revenue → total-ordered top 10
    "q_tpch_q3" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").as("c")
        .join(t(s, dir, "orders").as("o"), col("c.c_custkey") === col("o.o_custkey"))
        .join(t(s, dir, "lineitem").as("l"), col("l.l_orderkey") === col("o.o_orderkey"))
        .filter(col("o.o_orderdate") < lit("1998-06-01").cast("timestamp") &&
          col("l.l_shipdate") > lit("1998-06-01").cast("timestamp"))
        .groupBy(col("l.l_orderkey"), col("o.o_orderdate"))
        .agg(sum(rev).as("revenue_c"))
        .select(col("l_orderkey"), col("revenue_c"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy(col("revenue_c").desc, col("odate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q4 shape — correlated EXISTS subquery through spark.sql
    // (Catalyst's subquery decorrelation surface; the DSL-level semi
    // join twin is q_join_semi)
    // TPC-H Q17 shape (small-quantity revenue): a CORRELATED SCALAR
    // subquery — the per-part average-quantity threshold — that
    // Catalyst decorrelates into one aggregate-then-join (the scan of
    // lineitem happens twice, never per-part; at 100 TB the naive
    // re-execution per outer row would be the difference between 2
    // passes and 200k). Money integerized to cents so the sum is
    // exact; ONE final division by 7.
    "q_tpch_q17" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v17")
      t(s, dir, "part").createOrReplaceTempView("part_v17")
      s.sql(
        """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
          |             / 100.0 / 7.0, 2) AS avg_yearly
          |FROM lineitem_v17 l JOIN part_v17 p ON p.p_partkey = l.l_partkey
          |WHERE p.p_partkey % 10 = 3
          |  AND l.l_quantity < (SELECT 0.2 * avg(l_quantity)
          |                      FROM lineitem_v17 l2
          |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    }),

    "q_tpch_q4" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders_v o
          |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          |  AND o_orderdate <  TIMESTAMP '1998-01-01'
          |  AND EXISTS (SELECT 1 FROM lineitem_v l
          |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q5 shape (local supplier volume): 6-way join with the two
    // tiny dims broadcast and the customer-nation == supplier-nation
    // locality constraint
    "q_tpch_q5" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "customer").as("c")
        .join(t(s, dir, "orders").as("o"), col("c.c_custkey") === col("o.o_custkey"))
        .join(t(s, dir, "lineitem").as("l"), col("l.l_orderkey") === col("o.o_orderkey"))
        .join(t(s, dir, "supplier").as("s"),
          col("l.l_suppkey") === col("s.s_suppkey") &&
            col("c.c_nationkey") === col("s.s_nationkey"))
        .join(broadcast(t(s, dir, "nation").as("n")),
          col("s.s_nationkey") === col("n.n_nationkey"))
        .join(broadcast(t(s, dir, "region").as("r")),
          col("n.n_regionkey") === col("r.r_regionkey"))
        .filter(col("r.r_name") === "ASIA" &&
          col("o.o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o.o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n.n_name"))
        .agg(sum(rev).as("revenue_c"))
        .orderBy(col("revenue_c").desc, col("n_name"))
    }),

    // TPC-H Q7 shape (volume shipping between two nation groups): the
    // 6-way join whose locality constraint is DISJUNCTIVE — (supp ∈ A ∧
    // cust ∈ B) ∨ (supp ∈ B ∧ cust ∈ A) — so it can't fold into either
    // dim filter alone; both tiny nation sides broadcast, the OR
    // evaluates after the joins, revenue in exact cents grouped by
    // shipping year. (The reference pair predicate uses nationkey
    // classes so every SF returns rows.)
    "q_tpch_q7" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "lineitem").as("l")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1998-12-31").cast("timestamp"))
        .join(t(s, dir, "supplier").as("s"), col("s.s_suppkey") === col("l.l_suppkey"))
        .join(t(s, dir, "orders").as("o"), col("o.o_orderkey") === col("l.l_orderkey"))
        .join(t(s, dir, "customer").as("c"), col("c.c_custkey") === col("o.o_custkey"))
        .join(broadcast(t(s, dir, "nation").as("n1")),
          col("s.s_nationkey") === col("n1.n_nationkey"))
        .join(broadcast(t(s, dir, "nation").as("n2")),
          col("c.c_nationkey") === col("n2.n_nationkey"))
        .filter((col("n1.n_nationkey") % 5 === 1 && col("n2.n_nationkey") % 5 === 2) ||
          (col("n1.n_nationkey") % 5 === 2 && col("n2.n_nationkey") % 5 === 1))
        .groupBy(col("n1.n_name").as("supp_nation"), col("n2.n_name").as("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(rev).as("revenue_c"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join with a NON-KEY predicate inside the join condition (orders
    // that aren't URGENT still leave the customer behind with count 0 —
    // a WHERE would silently drop those customers), then a two-level
    // aggregation: count per customer, then the histogram of those
    // counts. The outer join shuffles on the key; the second agg is a
    // near-free rollup over at most a few hundred distinct counts.
    "q_tpch_q13" -> ((s, dir) => {
      val perCust = t(s, dir, "customer").as("c")
        .join(t(s, dir, "orders").as("o"),
          col("c.c_custkey") === col("o.o_custkey") &&
            !col("o.o_orderpriority").startsWith("1"), "left")
        .groupBy(col("c.c_custkey"))
        .agg(count(col("o.o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // double-correlated subquery — EXISTS(another supplier in the same
    // order) AND NOT EXISTS(another supplier ALSO late) — which
    // Catalyst must decorrelate into one LeftSemi and one LeftAnti join
    // against the same fact table, never a per-row re-scan. "Late" is
    // shipdate past 1999 (the schema carries no receipt/commit dates);
    // the nation filter is a key class so every SF returns rows.
    "q_tpch_q21" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v21")
      t(s, dir, "orders").createOrReplaceTempView("orders_v21")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v21")
      t(s, dir, "nation").createOrReplaceTempView("nation_v21")
      s.sql(
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM supplier_v21 s
          |JOIN lineitem_v21 l1 ON s.s_suppkey = l1.l_suppkey
          |JOIN orders_v21 o ON o.o_orderkey = l1.l_orderkey
          |JOIN nation_v21 n ON s.s_nationkey = n.n_nationkey
          |WHERE o.o_orderstatus = 'F'
          |  AND l1.l_shipdate > TIMESTAMP '1999-01-01'
          |  AND EXISTS (SELECT 1 FROM lineitem_v21 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem_v21 l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > TIMESTAMP '1999-01-01')
          |  AND n.n_nationkey % 5 = 3
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
    }),

    // TPC-H Q22 shape (global sales opportunity): a scalar aggregate
    // subquery (the positive-balance mean) feeding the filter of an
    // anti-joined (never-ordered customers) aggregation. The scalar
    // lands as a one-row broadcast; the NOT EXISTS decorrelates to a
    // LeftAnti on custkey. The "above average" compare is done in
    // exact integers — bal_c * N > SUM(bal_c) — identical semantics to
    // c_acctbal > avg(...) but with no cross-engine double division.
    // Country code is a nationkey class (the schema has no phone), and
    // the anti side is the URGENT-order subset (this corpus gives every
    // customer SOME order, so the literal never-ordered set is empty).
    "q_tpch_q22" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), (col("c_nationkey") % 7).as("cntrycode"),
          cents(col("c_acctbal")).as("bal_c"))
      val avgSide = cust.filter(col("bal_c") > 0)
        .agg(sum(col("bal_c")).as("s_pos"), count(lit(1)).as("n_pos"))
      val rich = cust.join(broadcast(avgSide))
        .filter(col("bal_c") * col("n_pos") > col("s_pos"))
      rich.join(t(s, dir, "orders").filter(col("o_orderpriority").startsWith("1")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
        .orderBy(col("cntrycode"))
    }),

    // TPC-H Q10 shape (returned-item reporting): quarter-filtered
    // customer⋈orders⋈lineitem with the returnflag filter pushed to the
    // fact scan, tiny nation broadcast, revenue in exact cents, global
    // top 20. The orders-side date filter prunes BEFORE the lineitem
    // join — at 100 TB that is the difference between joining a quarter
    // and joining seven years.
    "q_tpch_q10" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "customer").as("c")
        .join(t(s, dir, "orders").as("o")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("c.c_custkey") === col("o.o_custkey"))
        .join(t(s, dir, "lineitem").as("l").filter(col("l_returnflag") === "R"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .join(broadcast(t(s, dir, "nation").as("n")),
          col("c.c_nationkey") === col("n.n_nationkey"))
        .groupBy(col("c.c_custkey"), col("c.c_name"), col("n.n_name"))
        .agg(sum(rev).as("revenue_c"))
        .orderBy(col("revenue_c").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q12 shape (shipmode line-priority pivot): one fact⋈dim join
    // followed by a CONDITIONAL two-way aggregation — the classic
    // "pivot a priority class into columns" form. The schema carries no
    // l_shipmode/receiptdate, so the mode is a deterministic partkey
    // class (same grouping cardinality: 3) and "late" is the shipdate
    // year window.
    "q_tpch_q12" -> ((s, dir) => {
      val high = col("o.o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "orders").as("o")
        .join(t(s, dir, "lineitem").as("l")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
          col("o.o_orderkey") === col("l.l_orderkey"))
        .withColumn("shipmode",
          when(col("l.l_partkey") % 3 === 0, "MAIL")
            .when(col("l.l_partkey") % 3 === 1, "SHIP").otherwise("TRUCK"))
        .groupBy(col("shipmode"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("shipmode"))
    }),

    // TPC-H Q14 shape (promo-revenue share): a RATIO OF CONDITIONAL
    // SUMS over one month of fact⋈part — both sums exact cents, the
    // share one integral ppm division carried in decimal(38,0) so it
    // cannot wrap at any SF and never touches cross-engine float
    // division.
    "q_tpch_q14" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "lineitem").as("l")
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
        .join(t(s, dir, "part").as("p"), col("l.l_partkey") === col("p.p_partkey"))
        .agg(sum(when(col("p.p_type") === "PROMO", rev).otherwise(0L)).as("promo_c"),
          sum(rev).as("total_c"))
        .select(col("promo_c"), col("total_c"),
          expr("CAST((1000000 * CAST(promo_c AS DECIMAL(38,0))) div total_c AS BIGINT)")
            .as("promo_ppm"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    // three-branch OR over (brand, size, quantity) that can only be
    // evaluated AFTER the partkey equi-join — the optimizer must still
    // extract the common join key and push the derivable single-side
    // bounds (size ≥ 1, quantity windows' union) rather than fall back
    // to a cartesian. One-row exact-cents answer plus the match count.
    "q_tpch_q19" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "lineitem").as("l")
        .join(t(s, dir, "part").as("p"), col("l.l_partkey") === col("p.p_partkey"))
        .filter(
          (col("p.p_brand") === "Brand#11" && col("p.p_size").between(1, 15) &&
            col("l.l_quantity").between(1, 11)) ||
          (col("p.p_brand") === "Brand#22" && col("p.p_size").between(1, 25) &&
            col("l.l_quantity").between(10, 20)) ||
          (col("p.p_brand") === "Brand#23" && col("p.p_size").between(1, 35) &&
            col("l.l_quantity").between(20, 30)))
        .agg(count(lit(1)).as("n_lines"), sum(rev).as("revenue_c"))
    }),

    // TPC-H Q8 shape (national market share): the 7-way join — fact ⋈
    // part ⋈ orders ⋈ customer ⋈ nation(market) ⋈ region ⋈ supplier ⋈
    // nation(supplier) — grouped by order year, share of one supplier
    // nation as an exact ppm ratio (decimal-carried integral division,
    // zero float math). Both nation sides and region broadcast.
    "q_tpch_q8" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "lineitem").as("l")
        .join(t(s, dir, "part").as("p").filter(col("p_type") === "ECONOMY"),
          col("l.l_partkey") === col("p.p_partkey"))
        .join(t(s, dir, "orders").as("o"), col("o.o_orderkey") === col("l.l_orderkey"))
        .filter(col("o.o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o.o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(t(s, dir, "customer").as("c"), col("c.c_custkey") === col("o.o_custkey"))
        .join(broadcast(t(s, dir, "nation").as("n1")),
          col("c.c_nationkey") === col("n1.n_nationkey"))
        .join(broadcast(t(s, dir, "region").as("r")),
          col("n1.n_regionkey") === col("r.r_regionkey"))
        .filter(col("r.r_name") === "ASIA")
        .join(t(s, dir, "supplier").as("s2"), col("l.l_suppkey") === col("s2.s_suppkey"))
        .join(broadcast(t(s, dir, "nation").as("n2")),
          col("s2.s_nationkey") === col("n2.n_nationkey"))
        .groupBy(year(col("o.o_orderdate")).cast("int").as("o_year"))
        .agg(sum(when(col("n2.n_name") === "NATION_12", rev).otherwise(0L)).as("nation_c"),
          sum(rev).as("total_c"))
        .select(col("o_year"), col("nation_c"), col("total_c"),
          expr("CAST((1000000 * CAST(nation_c AS DECIMAL(38,0))) div total_c AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q15 shape (top supplier): an aggregation VIEW referenced
    // twice — once as the join input, once inside a scalar MAX subquery
    // — the canonical max-of-aggregate pattern. Catalyst plans the
    // scalar side as a one-row broadcast; ties all surface (no LIMIT 1),
    // matching the spec's "every supplier at the max" semantics.
    "q_tpch_q15" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v15")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v15")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
          |           AS total_c
          |  FROM lineitem_v15
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |    AND l_shipdate <  TIMESTAMP '1997-07-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_c
          |FROM supplier_v15 JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_c = (SELECT max(total_c) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q2 shape (minimum-cost supplier): the classic correlated
    // MIN subquery — the inner min-cost-within-region aggregate shares
    // the part key with the outer row, and Catalyst decorrelates it
    // into ONE aggregate of the region-filtered supply relation joined
    // back on partkey (never a per-part rescan). partsupp is the
    // derived supply relation (see [[partsupp]]); tiny nation/region
    // dims broadcast inside both the outer and inner 4-way chains.
    "q_tpch_q2" -> ((s, dir) => {
      partsupp(s, dir).createOrReplaceTempView("ps_v2")
      t(s, dir, "part").createOrReplaceTempView("part_v2")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v2")
      t(s, dir, "nation").createOrReplaceTempView("nation_v2")
      t(s, dir, "region").createOrReplaceTempView("region_v2")
      s.sql(
        """SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
          |       s.s_name, n.n_name, p.p_partkey, p.p_brand, ps.ps_supplycost_c
          |FROM part_v2 p
          |JOIN ps_v2 ps ON p.p_partkey = ps.ps_partkey
          |JOIN supplier_v2 s ON s.s_suppkey = ps.ps_suppkey
          |JOIN nation_v2 n ON s.s_nationkey = n.n_nationkey
          |JOIN region_v2 r ON n.n_regionkey = r.r_regionkey
          |WHERE p.p_type = 'SMALL' AND p.p_size % 5 = 0 AND r.r_name = 'EUROPE'
          |  AND ps.ps_supplycost_c = (
          |    SELECT min(ps2.ps_supplycost_c)
          |    FROM ps_v2 ps2
          |    JOIN supplier_v2 s2 ON s2.s_suppkey = ps2.ps_suppkey
          |    JOIN nation_v2 n2 ON s2.s_nationkey = n2.n_nationkey
          |    JOIN region_v2 r2 ON n2.n_regionkey = r2.r_regionkey
          |    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal_c DESC, n.n_name, s.s_name, p.p_partkey
          |LIMIT 100""".stripMargin)
    }),

    // TPC-H Q9 shape (product-type profit): the 6-way join threading
    // the derived supply relation back against the fact on the COMPOSITE
    // (partkey, suppkey) key — profit = revenue minus cost×qty in exact
    // cents so the per-(nation, year) sums are order-independent. The
    // p_name color filter prunes the part side before the fact join.
    "q_tpch_q9" -> ((s, dir) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      t(s, dir, "lineitem").as("l")
        .join(t(s, dir, "part").as("p").filter(col("p_name").contains("red")),
          col("l.l_partkey") === col("p.p_partkey"))
        .join(partsupp(s, dir).as("ps"),
          col("ps.ps_partkey") === col("l.l_partkey") &&
            col("ps.ps_suppkey") === col("l.l_suppkey"))
        .join(t(s, dir, "supplier").as("s2"),
          col("s2.s_suppkey") === col("l.l_suppkey"))
        .join(t(s, dir, "orders").as("o"),
          col("o.o_orderkey") === col("l.l_orderkey"))
        .join(broadcast(t(s, dir, "nation").as("n")),
          col("s2.s_nationkey") === col("n.n_nationkey"))
        .groupBy(col("n.n_name").as("nation"),
          year(col("o.o_orderdate")).cast("int").as("o_year"))
        .agg(sum(rev - col("ps.ps_supplycost_c") * col("l.l_quantity").cast("long"))
          .as("profit_c"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 shape (important stock): per-part supply value vs a
    // GLOBAL-total threshold — the (total, part-count) aggregate lands
    // as a one-row broadcast against the per-part sums. The spec scales
    // its fraction by SF; the SF-invariant equivalent is "value above
    // half the per-part average share": value_c > total_c div (2 ×
    // n_parts) — integer division keeps every term inside int64 at any
    // SF (value_c × n_parts would wrap at SF100), and both engines
    // truncate positives identically. The nation-class filter keeps the
    // relation a strict subset so the threshold does real work.
    "q_tpch_q11" -> ((s, dir) => {
      val nat = partsupp(s, dir).as("ps")
        .join(t(s, dir, "supplier").as("s2"),
          col("s2.s_suppkey") === col("ps.ps_suppkey"))
        .join(broadcast(t(s, dir, "nation").as("n")),
          col("s2.s_nationkey") === col("n.n_nationkey"))
        .filter(col("n.n_nationkey") % 5 === 1)
        .select(col("ps.ps_partkey"),
          (col("ps.ps_supplycost_c") * col("ps.ps_availqty")).as("v"))
      val byPart = nat.groupBy(col("ps_partkey")).agg(sum(col("v")).as("value_c"))
      byPart.join(broadcast(nat.agg(sum(col("v")).as("total_c"),
          countDistinct(col("ps_partkey")).as("n_parts"))))
        .filter(col("value_c") > expr("total_c div (2 * n_parts)"))
        .select(col("ps_partkey"), col("value_c"))
        .orderBy(col("value_c").desc, col("ps_partkey"))
    }),

    // TPC-H Q16 shape (supplier relationship count): COUNT(DISTINCT
    // supplier) per (brand, type, size) bucket with a NOT-IN exclusion
    // set — the negative-balance suppliers stand in for the spec's
    // complaint filter (no comment column in this schema). The NOT IN
    // becomes a broadcast left-anti join (suppkey is never null, so
    // anti ≡ NOT IN); the distinct-count is the standard two-shuffle
    // expand.
    "q_tpch_q16" -> ((s, dir) => {
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      partsupp(s, dir).as("ps")
        .join(t(s, dir, "part").as("p"),
          col("p.p_partkey") === col("ps.ps_partkey"))
        .filter(col("p.p_brand") =!= "Brand#13" &&
          !col("p.p_type").startsWith("MEDIUM") &&
          col("p.p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
        .join(broadcast(bad), col("ps.ps_suppkey") === bad("s_suppkey"), "left_anti")
        .groupBy(col("p.p_brand"), col("p.p_type"), col("p.p_size"))
        .agg(countDistinct(col("ps.ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape (part promotion): DOUBLE-nested IN subqueries —
    // suppliers ⊇ supply rows ⊇ promo parts — plus a correlated scalar
    // aggregate with its own date window, all decorrelated to semi
    // joins + one agg-then-join (never per-row rescans). Since the
    // derived availqty IS total shipped, the spec's direction would be
    // vacuously true; the adapted predicate keeps the identical shape
    // but selects pairs whose 1997 shipments exceeded HALF their total
    // supply (2×window > total), which is non-degenerate at every SF.
    // COALESCE pins the no-1997-shipments case to 0 in both engines.
    "q_tpch_q20" -> ((s, dir) => {
      partsupp(s, dir).createOrReplaceTempView("ps_v20")
      t(s, dir, "part").createOrReplaceTempView("part_v20")
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v20")
      t(s, dir, "nation").createOrReplaceTempView("nation_v20")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v20")
      s.sql(
        """SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c
          |FROM supplier_v20 s JOIN nation_v20 n ON s.s_nationkey = n.n_nationkey
          |WHERE n.n_nationkey % 5 = 4
          |  AND s.s_suppkey IN (
          |    SELECT ps.ps_suppkey FROM ps_v20 ps
          |    WHERE ps.ps_partkey IN
          |        (SELECT p_partkey FROM part_v20 WHERE p_type = 'PROMO')
          |      AND 2 * (SELECT COALESCE(CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0)
          |               FROM lineitem_v20 l
          |               WHERE l.l_partkey = ps.ps_partkey
          |                 AND l.l_suppkey = ps.ps_suppkey
          |                 AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          |                 AND l.l_shipdate <  TIMESTAMP '1998-01-01')
          |          > ps.ps_availqty)
          |ORDER BY s.s_name""".stripMargin)
    }),

    // bucketed co-located join: both sides written ONCE as 8-bucket
    // sorted tables on the join key, so the fact⋈fact join plans with
    // ZERO exchanges and ZERO sorts on either input (gated in PlanSpec)
    // — at 100 TB this is the difference between re-shuffling both
    // fact tables on every join and reading pre-co-located buckets.
    // The merge hint pins SMJ so a small SF can't broadcast away the
    // very property the query demonstrates; the build is per-(session,
    // SF) memoized via the catalog.
    "q_join_bucketed" -> ((s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val (ordT, liT) = (s"orders_bkt_$tag", s"lineitem_bkt_$tag")
      if (!s.catalog.tableExists(ordT)) {
        // external-path tables under /tmp: a FRESH session's in-memory
        // catalog forgets the table but the files survive — clear the
        // location so CREATE TABLE AS doesn't trip LOCATION_ALREADY_EXISTS
        val base = java.nio.file.Paths.get(s"/tmp/graft-bucketed/$tag")
        if (java.nio.file.Files.exists(base)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(base)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path])
            .iterator.asScala.foreach(java.nio.file.Files.delete)
          finally walk.close()
        }
        t(s, dir, "orders").write.bucketBy(8, "o_orderkey")
          .sortBy("o_orderkey").option("path", s"$base/orders")
          .mode("overwrite").saveAsTable(ordT)
        t(s, dir, "lineitem").write.bucketBy(8, "l_orderkey")
          .sortBy("l_orderkey").option("path", s"$base/lineitem")
          .mode("overwrite").saveAsTable(liT)
      }
      s.table(ordT).hint("merge")
        .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice"))).as("price_c"))
        .orderBy(col("o_orderstatus"))
    }),

    // gaps-and-islands (consecutive-day activity streaks): the classic
    // day − row_number() island key — one distinct, one window, one
    // agg, all partitioned by user so nothing global; exact integer day
    // arithmetic both engines.
    "q_window_islands" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      t(s, dir, "events")
        .select(col("user_id"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), max(col("len")).as("longest"),
          min(col("start_day")).as("first_day"))
        .orderBy(col("user_id"))
    }),

    // null-safe equality join (<=>): null keys MATCH null keys, unlike
    // plain = (which drops them) — the semantic corner ETL hits when
    // joining on nullable derived keys. Both sides are tiny DISTINCT
    // key sets so the null⋈null block stays bounded by construction.
    "q_join_nullsafe" -> ((s, dir) => {
      val a = t(s, dir, "events").filter(col("user_id") < 30)
        .select(nullif(col("user_id") % 7, lit(3)).as("ka")).distinct()
      val b = t(s, dir, "events").filter(col("user_id") < 30)
        .select(nullif(col("user_id") % 5, lit(2)).as("kb")).distinct()
      a.join(b, col("ka") <=> col("kb"))
        .select(coalesce(col("ka"), lit(-1L)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    // map-type operator family: per-user event_type→count map built
    // with a DETERMINISTIC insertion order (sort_array over structs
    // before map_from_entries), then probed with try_element_at
    // (ANSI-safe miss → null → coalesce) and map_keys. The oracle
    // recomputes every output without maps — conditional sums + ordered
    // string_agg — so the map family is checked against plain SQL
    // semantics, not against itself.
    "q_map_ops" -> ((s, dir) => {
      val perType = t(s, dir, "events").filter(col("user_id") < 50)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      perType.groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          coalesce(try_element_at(col("m"), lit("click")), lit(0L)).as("n_click"),
          coalesce(try_element_at(col("m"), lit("purchase")), lit(0L)).as("n_purchase"),
          array_join(map_keys(col("m")), ",").as("types_csv"))
        .orderBy(col("user_id"))
    }),

    // array higher-order-function family over the token arrays:
    // distinct/sort/filter/exists/aggregate/slice with scalar outputs
    // (fold seed explicit — DuckDB's list_reduce seeds from the first
    // element, so the oracle uses list_sum over a transform instead)
    "q_array_ops" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct"),
          element_at(sort_array(col("w")), 1).as("first_sorted"),
          expr("size(filter(w, x -> length(x) > 5))").cast("long").as("n_long"),
          expr("exists(w, x -> x = 'the')").as("has_the"),
          expr("aggregate(w, 0L, (a, x) -> a + length(x))").as("chars"),
          array_join(slice(sort_array(col("w"), asc = false), 1, 3), "|").as("top3_desc"))
        .orderBy(col("doc_id"))
    }),

    // percent_rank + cume_dist — relative-position windows (tie-broken
    // on event_id so both engines agree on a total order); rounded ONE
    // double division each, so the hash compare is exact
    "q_window_pctrank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // exact-form correlation/covariance: the five integer sums (n, Σx,
    // Σy, Σxy, Σx², Σy²) aggregate exactly (order-independent; summed
    // as decimal(38,0) so Σx² cannot wrap a long at any SF — it is
    // already ~2e16 at sf0.1 and grows ~linearly with rows), then each
    // sum is cast to double ONCE and corr/cov are ONE double formula
    // each — engine-stable where the built-in streaming corr/covar
    // kernels differ in low bits. The oracle mirrors the cast placement
    // exactly (DuckDB sums BIGINT as exact HUGEINT → CAST AS DOUBLE).
    "q_agg_corr" -> ((s, dir) => {
      val x = cents(col("value"))
      val y = length(col("props")).cast("long")
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .select(col("event_type"), col("n"), col("n").cast("double").as("nd"),
          col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
          col("sxy").cast("double").as("dsxy"),
          col("sxx").cast("double").as("dsxx"), col("syy").cast("double").as("dsyy"))
        .select(col("event_type"), col("n"),
          round((col("dsxy") * col("nd") - col("dsx") * col("dsy")) /
            (col("nd") * col("nd")), 4).as("cov_pop"),
          round((col("dsxy") * col("nd") - col("dsx") * col("dsy")) /
            (sqrt(col("dsxx") * col("nd") - col("dsx") * col("dsx")) *
             sqrt(col("dsyy") * col("nd") - col("dsy") * col("dsy"))), 6)
            .as("corr"))
        .orderBy(col("event_type"))
    }),

    // Per-group OLS regression (y = a + b·x) from the same exact
    // five-sum machinery as q_agg_corr: sums accumulate as
    // decimal(38,0) (no wrap at any SF), each is cast to double ONCE,
    // and slope/intercept/r² are each ONE double formula — the
    // intercept uses the UNROUNDED slope so both engines evaluate the
    // identical expression tree. The regression-per-segment shape
    // (trend per event type / per source) is a single partial+final
    // hash agg at 100 TB; no second pass, no window.
    "q_agg_regression" -> ((s, dir) => {
      val x = cents(col("value"))
      val y = length(col("props")).cast("long")
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .select(col("event_type"), col("n"), col("n").cast("double").as("nd"),
          col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
          col("sxy").cast("double").as("dsxy"),
          col("sxx").cast("double").as("dsxx"), col("syy").cast("double").as("dsyy"))
        .withColumn("slope",
          (col("dsxy") * col("nd") - col("dsx") * col("dsy")) /
          (col("dsxx") * col("nd") - col("dsx") * col("dsx")))
        .select(col("event_type"), col("n"),
          // + 0.0 collapses IEEE -0.0 (a near-zero slope rounded to
          // zero keeps its sign bit, and the two engines can disagree
          // on it) — identity for every other value, mirrored in SQL
          (round(col("slope"), 6) + lit(0.0)).as("slope"),
          (round((col("dsy") - col("slope") * col("dsx")) / col("nd"), 4)
            + lit(0.0)).as("intercept"),
          (round(((col("dsxy") * col("nd") - col("dsx") * col("dsy")) *
                 (col("dsxy") * col("nd") - col("dsx") * col("dsy"))) /
                ((col("dsxx") * col("nd") - col("dsx") * col("dsx")) *
                 (col("dsyy") * col("nd") - col("dsy") * col("dsy"))), 6)
            + lit(0.0)).as("r2"))
        .orderBy(col("event_type"))
    }),

    // Rolling regression slope — the five-sum OLS trick lifted onto a
    // ROWS frame: per user, the trend of spend vs time over the
    // trailing ≤30 events, from five windowed integer sums (n, Σx, Σy,
    // Σxy, Σx²) over the same frame. x is re-origined to the 2024-01-01
    // epoch so x²·30 stays far below a long at any SF; the one double
    // division is guarded by nullif(denom, 0) in BOTH engines (Spark's
    // 0/0 NaN vs DuckDB's NULL would otherwise diverge on degenerate
    // frames). One window shuffle by user — the streaming-adjacent
    // trend feature a 100 TB event log computes per entity.
    "q_window_rolling_slope" -> ((s, dir) => {
      val fr = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id")).rowsBetween(-29, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("y"))
        .withColumn("x", col("ts_s") - 1704067200L)
        .withColumn("n", count(lit(1)).over(fr).cast("long"))
        .withColumn("sx", sum(col("x")).over(fr))
        .withColumn("sy", sum(col("y")).over(fr))
        .withColumn("sxy", sum(col("x") * col("y")).over(fr))
        .withColumn("sxx", sum(col("x") * col("x")).over(fr))
        .select(col("user_id"), col("event_id"), col("n").as("n_frame"),
          (round(expr("""(cast(n as double) * sxy - cast(sx as double) * sy)
                        | / nullif(cast(n as double) * sxx
                        |          - cast(sx as double) * sx, 0.0d)""".stripMargin), 6)
            + lit(0.0)).as("slope"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Exponentially weighted rolling value — the smoothed-metric
    // window every monitoring/feature pipeline wants next to plain
    // rolling means: per user, each event's EWMA over its last ≤8
    // observations with weight 2^(position) (newest highest, exact
    // halving per step back) normalized by the geometric total
    // 2^len − 1. All-integer: the frame materializes as a bounded
    // ≤8-element list (collect_list over a ROWS frame preserves frame
    // order in both engines), the weighted sum is one higher-order
    // fold, and the scaled division has non-negative operands. One
    // window, shuffles by user exactly once at any SF.
    "q_window_ewma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-7, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("ts"),
          cents(col("value")).as("c"))
        .withColumn("fr", collect_list(col("c")).over(w))
        .select(col("user_id"), col("event_id"),
          size(col("fr")).cast("long").as("n_frame"),
          expr("""aggregate(
                 |  zip_with(fr, sequence(1, size(fr)),
                 |    (x, i) -> x * shiftleft(1L, cast(i - 1 as int))),
                 |  0L, (acc, x) -> acc + x) * 100L
                 |div (shiftleft(1L, size(fr)) - 1)""".stripMargin)
            .as("ewma_c100"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // dedup 4 — SimHash fingerprint histogram (majority-vote bits)
    "q_dedup_simhash" -> ((s, dir) => {
      simhashes(t(s, dir, "documents"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).cast("long").as("min_doc"))
        .orderBy(col("simhash"))
    }),

    // dedup 4b — the same fingerprint through the typed-Aggregator UDAF
    // surface (functions.SimhashAgg: 32-vote buffer, partial+final via
    // reduce/merge) — checked against the identical oracle
    "q_dedup_simhash_agg" -> ((s, dir) => {
      val simhash = udaf(graft.functions.SimhashAgg)
      t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
        .groupBy(col("doc_id"))
        .agg(simhash(col("h")).as("simhash"))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).cast("long").as("min_doc"))
        .orderBy(col("simhash"))
    }),

    // dedup 5 — SimHash near-dup pairs via 4×8-bit LSH band buckets: a
    // pair within hamming ≤ 3 shares ≥1 intact band (pigeonhole), so the
    // band-bucket equi-join finds exactly the brute-force pair set while
    // replacing the O(n²) cross join with a shuffle join on (band, key)
    // — the 100 TB scale path. Cap mirrors q_dedup_jaccard (no-op at the
    // verify SF).
    "q_dedup_simhash_pairs" -> ((s, dir) =>
      simhashPairsShared(s, dir).orderBy(col("ia"), col("ib"))),

    // dedup 5b — resolve near-dup candidate PAIRS into connected
    // components and ONE survivor per component ("keep min doc_id per
    // component") — the step a training-data pipeline runs between
    // candidate generation and writing the deduped corpus. Bounded
    // min-label propagation with pointer jumping: each round (a) pulls
    // the min label across edges (hash shuffle on id), then (b)
    // path-halves by reading the label's own label (hash shuffle on
    // lbl) — so k rounds resolve any component of diameter ≲ 2^k, and
    // ROUNDS=5 covers ~32 hops (near-dup clusters are near-cliques;
    // their diameter is tiny). Every step is an equi-join or hash agg
    // on bounded keys — no cartesian, no driver-side fixpoint loop.
    // MATERIALIZE each round (localCheckpoint): the round reads
    // `labels` twice, so an unbroken lineage re-derives the whole
    // upstream 2× per round — 2^rounds recomputations of the pair
    // generation (measured: 446 s at sf0.1 unchecked vs ~2 s
    // materialized). At 100 TB this is the same checkpoint-per-round
    // cadence an iterative graph job always runs with.
    "q_dedup_resolve" -> ((s, dir) =>
      resolveComponents(s, dir).orderBy(col("doc_id"))),

    // The full curation chain a training-data run executes before
    // writing the corpus: near-dup resolution (keep one survivor per
    // component) ∧ language gate ∧ quality gate, emitting the kept
    // set with fingerprints. Composition stays all equi-joins/scalar
    // filters — each stage is individually oracled above/below; this
    // query pins that they COMPOSE without semantic drift.
    "q_curate_corpus" -> ((s, dir) => {
      val survivors = resolveComponents(s, dir)
        .filter(col("is_survivor")).select(col("doc_id"))
      val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
      def hits(word: String) = // same scorer as q_text_langid
        ((length(col("text")) - length(regexp_replace(col("text"), s"\\b$word\\b", ""))) /
          word.length).cast("long")
      val scored = docs.select(col("doc_id"), col("text"),
          hits("the").as("s_en"), hits("le").as("s_fr"), hits("der").as("s_de"))
        .withColumn("lang_guess",
          when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
            .when(col("s_fr") > col("s_de"), "fr")
            .when(col("s_de") > 0, "de").otherwise("unk"))
      val toks = size(split(col("text"), " ")).cast("long")
      val stops = size(expr(
        "filter(split(text, ' '), w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')")).cast("long")
      scored
        .join(survivors, "doc_id") // dedup gate (inner ≡ semi on a keyed set)
        .withColumn("n_tokens", toks)
        .withColumn("stop_ratio", round(stops / toks.cast("double"), 6))
        .filter(col("lang_guess") === "en" && col("stop_ratio") >= 0.05)
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
          col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // text 0 — benchmark decontamination: 5-gram overlap of the corpus
    // against a held-out probe set (docs 0..9 stand in for the
    // benchmark). The overlap test is a broadcast-able semi-join on the
    // gram hash at scale; here the full inner join + distinct count
    // keeps it oracle-checkable.
    "q_text_contamination" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), explode(expr(
          """case when size(split(text, ' ')) >= 5 then
            |  transform(sequence(1, size(split(text, ' ')) - 4),
            |            i -> concat_ws(' ', slice(split(text, ' '), i, 5)))
            |else array() end""".stripMargin)).as("gram"))
      val bench = grams.filter(col("doc_id") < 10).select(col("gram")).distinct()
      grams.filter(col("doc_id") >= 10)
        .join(bench, "gram")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram")).as("n_shared"))
        .withColumn("contaminated", col("n_shared") >= 3)
        .orderBy(col("doc_id"))
    }),

    // text 1 — document fingerprint (normalize + hash)
    "q_text_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // text 2 — token stats + stopword ratio quality score
    "q_text_quality" -> ((s, dir) => {
      val toks = size(split(col("text"), " ")).cast("long")
      val stops = size(expr(
        "filter(split(text, ' '), w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')")).cast("long")
      t(s, dir, "documents")
        .select(col("doc_id"), toks.as("n_tokens"), stops.as("n_stop"),
          round(stops / toks.cast("double"), 6).as("stop_ratio"))
        .withColumn("quality",
          when(col("stop_ratio") >= 0.12, "high")
            .when(col("stop_ratio") >= 0.05, "mid").otherwise("low"))
        .orderBy(col("doc_id"))
    }),

    // text 3 — n-gram language-id heuristic (stopword evidence votes)
    "q_text_langid" -> ((s, dir) => {
      def hits(word: String) =
        ((length(col("text")) - length(regexp_replace(col("text"), s"\\b$word\\b", ""))) /
          word.length).cast("long")
      t(s, dir, "documents")
        .select(col("doc_id"),
          hits("the").as("s_en"), hits("le").as("s_fr"), hits("der").as("s_de"))
        .withColumn("lang_guess",
          when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
            .when(col("s_fr") > col("s_de"), "fr")
            .when(col("s_de") > 0, "de")
            .otherwise("unk"))
        .orderBy(col("doc_id"))
    }),

    // Native Catalyst Generator (the real UDTF tier — one row in, many
    // multi-column rows out, not an explode over a pre-built array):
    // pos_tokenize emits (pos, tok, start, end) with CHARACTER offsets
    // into the original text, the span-preserving tokenization that
    // split+posexplode loses and that annotate-then-project-back
    // pipelines need. Oracle: DuckDB reconstructs the offsets as a
    // running-length window over the split tokens.
    "q_text_pos_tokens" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), expr("pos_tokenize(text)"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Cross-document boilerplate span mining — 6-token shingles that
    // recur in ≥3 distinct documents (nav chrome, disclaimers, license
    // headers: the span-level cleanup pass scraped corpora need beyond
    // doc-level dedup). Shingles via an in-row transform over token
    // indices (no self-join), then one hash aggregation on the shingle
    // key; at 100 TB the shingle hash shards the shuffle and the ≥3
    // gate kills the unique-span long tail at the partial aggregate.
    "q_text_boilerplate" -> ((s, dir) => {
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 6)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 6), i -> concat_ws(' ', slice(l, i + 1, 6)))"))
          .as("span"))
      sh.groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= 3)
        .orderBy(col("n_docs").desc, col("span"))
        .limit(50)
    }),

    // SCD2 point-in-time join — build a slowly-changing dimension from
    // a change feed (each purchase re-tiers its user; validity
    // intervals via lead() over the per-user change sequence, open tail
    // NULL) and join facts to the version VALID AT the fact's event
    // time. The join is an equi-join on user_id with the interval as a
    // residual range predicate — sort-merge by user at any scale, never
    // a time-cross-product.
    "q_scd2_pit" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val dim = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("valid_from"),
          floor(col("value") / 50).cast("long").as("tier"), col("event_id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
        .as("d")
      val fact = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts")).as("f")
      fact.join(dim,
          col("f.user_id") === col("d.user_id") &&
            col("f.ts") >= col("d.valid_from") &&
            (col("d.valid_to").isNull || col("f.ts") < col("d.valid_to")))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_errors"),
          countDistinct(col("d.user_id")).as("n_users"))
        .orderBy(col("tier"))
    }),

    // Rendezvous (highest-random-weight) sharding — consistent corpus
    // sharding where growing 8→9 shards moves only ~1/9 of documents
    // (hash-mod resharding moves ~8/9 and invalidates every cache).
    // shard = argmax over candidates of md5(doc:k), encoded as
    // max(h·16+k) % 16 so the argmax IS a plain max aggregation —
    // per-doc work is a 9-row explode, no shuffle beyond the final
    // per-shard rollup. Reports per-shard volume and churn.
    "q_shard_rendezvous" -> ((s, dir) => {
      val h = expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', " +
        "CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT)")
      val weights = t(s, dir, "documents")
        .select(col("doc_id"), explode(sequence(lit(0), lit(8))).as("k"))
        .withColumn("key", h * 16 + col("k"))
      val assign = weights.groupBy(col("doc_id")).agg(
        (max(when(col("k") < 8, col("key"))) % 16).as("shard8"),
        (max(col("key")) % 16).as("shard9"))
      assign.groupBy(col("shard8"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved"))
        .orderBy(col("shard8"))
    }),

    // Language-ID confusion matrix — the langid heuristic evaluated
    // against the corpus's DECLARED lang column (the calibration report
    // that tells you whether the cheap n-gram guesser is good enough to
    // gate a 100 TB ingest, and which language pairs it confuses). One
    // scalar pass + one hash aggregation on a (few × few) key space.
    "q_text_langid_confusion" -> ((s, dir) => {
      def hits(word: String) =
        ((length(col("text")) - length(regexp_replace(col("text"), s"\\b$word\\b", ""))) /
          word.length).cast("long")
      t(s, dir, "documents")
        .select(col("lang"),
          hits("the").as("s_en"), hits("le").as("s_fr"), hits("der").as("s_de"))
        .withColumn("lang_guess",
          when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
            .when(col("s_fr") > col("s_de"), "fr")
            .when(col("s_de") > 0, "de")
            .otherwise("unk"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_guess"))
    }),

    // text 3b — BPE-ish token counting: whitespace count plus a GPT-2-
    // style pretokenizer regex (contractions / letter runs / digit runs
    // / punctuation runs). No lookahead, and whitespace is an EXPLICIT
    // class — Java's \s includes \x0B where RE2's does not, so \s would
    // be a latent Spark-vs-DuckDB divergence on vertical-tab input.
    "q_text_tokens_bpe" -> ((s, dir) => {
      val ws = """ \t\n\r\f"""
      val pat = s"""'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^$ws\\p{L}\\p{N}]+|[$ws]+"""
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer fertility by language — bytes-per-token under the
    // BPE-ish pretokenizer vs whitespace words, the "how expensive is
    // this language for the tokenizer" table every multilingual corpus
    // card carries. One scalar regex pass per doc (same pattern as
    // q_text_tokens_bpe), one bounded per-lang hash agg; ratios exact
    // integer ppm. At 100 TB this is a single map-side-combined
    // aggregation over ≤ a few hundred language keys.
    "q_text_fertility" -> ((s, dir) => {
      val ws = """ \t\n\r\f"""
      val pat = s"""'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^$ws\\p{L}\\p{N}]+|[$ws]+"""
      t(s, dir, "documents")
        .select(col("lang"), length(col("text")).cast("long").as("bytes"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe"),
          size(split(col("text"), " ")).cast("long").as("n_ws"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("sum_bytes"),
          sum(col("n_bpe")).as("sum_bpe"), sum(col("n_ws")).as("sum_ws"))
        .select(col("lang"), col("n_docs"), col("sum_bytes"), col("sum_bpe"),
          expr("sum_bytes * 1000000L div sum_bpe").as("bytes_per_bpe_ppm"),
          expr("sum_bytes * 1000000L div sum_ws").as("bytes_per_word_ppm"))
        .orderBy(col("lang"))
    }),

    // Readability surface per document — word count, vowel-group
    // syllable proxy, ≥6-char long words, and a LIX-style index. The
    // synthetic corpus carries no sentence punctuation, so a FIXED
    // 15-token clause segmentation stands in for sentences (documented
    // determinism, identical in the oracle). All counts one scalar
    // pass; the index is exact integer milli — no doubles anywhere.
    "q_text_readability" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("words"),
          size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
            .cast("long").as("vgroups"),
          size(expr("filter(split(text, ' '), w -> length(w) >= 6)"))
            .cast("long").as("n_long"))
        .withColumn("clauses", expr("1L + words div 15"))
        .select(col("doc_id"), col("words"), col("vgroups"), col("n_long"),
          col("clauses"),
          expr("words * 1000 div clauses + 100000 * n_long div words").as("lix_milli"),
          expr("vgroups * 1000000L div words").as("syl_per_word_ppm"))
        .orderBy(col("doc_id"))
    }),

    // similarity 1 — near-dup pairs by quantized cosine. Per-vector
    // quantization + norm run ONCE per row (interpreted HOF, cheap);
    // the O(n²) pair loop uses the custom codegen'd LongArrayDot
    // (graft.functions) — measured 10×+ over zip_with/aggregate HOFs.
    "q_dedup_embedding" -> ((s, dir) => {
      val q = t(s, dir, "embeddings")
        .filter(col("vec_id") < 500)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val pairs = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          graft.functions.ArrayMath.dotL(col("a.v"), col("b.v")).as("dot"),
          col("a.norm2").as("na"), col("b.norm2").as("nb"))
      pairs
        .withColumn("cos", round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6))
        .filter(col("cos") >= 0.35)
        .select(col("ia"), col("ib"), col("cos"))
        .orderBy(col("ia"), col("ib"))
    }),

    // similarity 1b — the SCALE PATH for embedding near-dup: random-
    // hyperplane LSH. 16 signature bits (sign of ⟨v, h_p⟩ against
    // md5-derived integer hyperplanes — reproducible in any engine),
    // banded 4×4 → candidates are an equi-join on (band, bandval), then
    // exact cosine verification joins candidates back to vectors BY ID
    // (no vector payload rides the candidate shuffle). O(n²) avoided;
    // every stage is a hash shuffle on bounded keys. The brute-force
    // q_dedup_embedding remains the recall baseline.
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      val planes: Seq[Array[Long]] = Seq.tabulate(16) { p =>
        Array.tabulate(64) { d =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$p:$d".getBytes("UTF-8"))
          val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
            ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
          h % 2001L - 1000L
        }
      }
      val q = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val sig = planes.zipWithIndex.map { case (h, p) =>
        when(graft.functions.ArrayMath.dotL(col("v"), lit(h)) > 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      val sigs = q.select(col("vec_id"), sig.as("sig"))
      val bands = sigs
        .select(col("vec_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("b"))
        .select(col("vec_id"), col("b"), expr("(sig >> (4 * b)) & 15").as("bv"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("ia"), col("y.vec_id").as("ib"))
        .distinct()
      cand
        .join(q.as("qa"), col("ia") === col("qa.vec_id"))
        .join(q.as("qb"), col("ib") === col("qb.vec_id"))
        .select(col("ia"), col("ib"),
          round(graft.functions.ArrayMath.dotL(col("qa.v"), col("qb.v")) /
            (sqrt(col("qa.norm2")) * sqrt(col("qb.norm2"))), 6).as("cos"))
        .filter(col("cos") >= 0.35)
        .orderBy(col("ia"), col("ib"))
    }),

    // F9 — JSON response build + reparse round trip (to_json/from_json):
    // serialize a struct per row, parse it back, project the fields —
    // the JSON sink/source surface under the oracle gate
    "q_json_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("typ", StringType),
        StructField("cents", LongType)))
      t(s, dir, "events")
        .select(col("event_id"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("typ"),
            cents(col("value")).as("cents"))).as("js"))
        .select(col("event_id"), from_json(col("js"), schema).as("r"))
        .select(col("event_id"), col("r.typ").as("typ"), col("r.cents").as("cents"))
        .orderBy(col("event_id"))
    }),

    // S2/F10 — base64 decode/encode round trip
    "q_base64" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), base64(col("text").cast("binary")).as("b64"))
        .select(col("doc_id"), substring(col("b64"), 1, 64).as("b64_prefix"),
          length(unbase64(col("b64")).cast("string")).cast("long").as("decoded_len"))
        .orderBy(col("doc_id"))
    }),

    // text 4 — rolling polynomial fingerprint (Karp-Rabin style);
    // fold semantics aligned with DuckDB list_reduce (first element is
    // the accumulator seed)
    "q_text_rollhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), expr(
          """aggregate(
             |  slice(regexp_extract_all(text, '.', 0), 2, length(text)),
             |  cast(ascii(substring(text, 1, 1)) as bigint),
             |  (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007L))""".stripMargin)
          .as("rollhash"))
        .orderBy(col("doc_id"))
    }),

    // text 4b — winnowing minimizer selection (the MOSS fingerprint
    // scheme): hash every 5-gram, slide a w=4 window over consecutive
    // gram hashes, and keep each window's minimum (rightmost on ties —
    // encoded by packing (hash, reversed position) into ONE bigint so
    // a single min() window frame does argmin + tie-break). Winnowing
    // guarantees any shared substring ≥ k+w-1 chars yields a shared
    // fingerprint, at ~2/(w+1) the density of full k-gram sets — the
    // storage knob for fingerprint dedup at 100 TB. One generator per
    // doc (no self-join), one bounded ROWS frame, exact integer
    // density ppm. Positions are < 2^20 by construction (transcript
    // cells; guard documented), so the packing never collides.
    "q_text_minimizers" -> ((s, dir) => {
      // the char-code array is computed ONCE per doc (one regex pass),
      // then every gram hash is an unrolled 5-step fold over array
      // slots — identical value to the per-gram aggregate fold, ~2×
      // faster (no per-position regex/substring)
      val h5 = (1 to 4).foldLeft("element_at(cs, cast(p as int))") {
        case (acc, k) =>
          s"pmod(($acc) * 31 + element_at(cs, cast(p + $k as int)), 1000000007L)"
      }
      val grams = t(s, dir, "documents")
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), expr(
          "transform(regexp_extract_all(text, '.', 0), c -> cast(ascii(c) as bigint))")
          .as("cs"))
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(cs) - 4),
             |  p -> named_struct('pos', cast(p as bigint), 'h', $h5))""".stripMargin))
          .as("g"))
        .select(col("doc_id"), col("g.pos").as("pos"),
          (col("g.h") * lit(1048576L) + (lit(1048575L) - col("g.pos"))).as("key"))
      val fr = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(0, 3)
      val sel = grams
        .select(col("doc_id"),
          min(col("key")).over(fr).as("mk"), count(lit(1)).over(fr).as("c"))
        .filter(col("c") === 4)
        .select(col("doc_id"),
          (lit(1048575L) - pmod(col("mk"), lit(1048576L))).as("spos"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_selected"))
      grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kgrams"))
        .join(sel, Seq("doc_id"))
        .select(col("doc_id"), col("n_kgrams"), col("n_selected"),
          expr("n_selected * 1000000L div n_kgrams").as("density_ppm"))
        .orderBy(col("doc_id"))
    }),

    // similarity 3 — IVF-style ANN: the `label` column is the coarse
    // quantizer (inverted list id); candidates are restricted to the
    // query's list — the scale path vs the brute-force baseline below.
    // Broadcast direction matters at 100 TB: the QUERY set (tiny, fixed)
    // is the build side; the candidate table only STREAMS through the
    // BroadcastHashJoin on `label` — never materialized on one node.
    // (PlanSpec pins this: no BroadcastExchange over the unfiltered
    // candidate scan.)
    "q_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"), col("norm2").as("qn"))
      val scored = e.as("c").join(broadcast(q),
          col("qlabel") === col("c.label") && col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("c.vec_id").as("nb"),
          graft.functions.ArrayMath.dotL(col("qv"), col("c.v")).as("dot"),
          col("qn").as("na"), col("c.norm2").as("nb2"))
        .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb2"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("nb"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // similarity 3b — IVF coarse-quantizer CONSTRUCTION: deterministic
    // seeded k-means (k=8, 3 Lloyd iterations, md5-ordered init) over
    // integerized vectors, producing the inverted-list assignment that
    // q_ann_ivf's search takes as given. Exact integer squared-L2
    // throughout, so the DuckDB oracle (the same iterations unrolled as
    // a CTE chain) is bit-reproducible. Scale shape: the assignment is
    // a broadcast join against k=8 centroid rows (candidates stream);
    // the update is one partial+final agg over (cid, dim); the k×64
    // centroid matrix is the only driver-side state per iteration —
    // the standard Lloyd driver loop (train on a sample at 100 TB).
    "q_ann_kmeans" -> ((s, dir) =>
      kmeansFit(s, dir)
        .select(col("vec_id"), col("cid"), col("dist"))
        .orderBy(col("vec_id"))),

    // similarity 3c — IVF search over the LEARNED quantizer: the search
    // q_ann_ivf performs against the pre-existing `label` column, now
    // against the k-means list assignment built above. Same scale
    // shape: tiny query set broadcast, candidates stream through a
    // hash join on the list id.
    "q_ann_ivf_kmeans" -> ((s, dir) => {
      val assign = kmeansFit(s, dir)
        .select(col("vec_id"), col("cid"), col("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = assign.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("cid").as("qcid"),
          col("v").as("qv"), col("norm2").as("qn"))
      val scored = assign.as("c").join(broadcast(q),
          col("qcid") === col("c.cid") && col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("c.vec_id").as("nb"),
          graft.functions.ArrayMath.dotL(col("qv"), col("c.v")).as("dot"),
          col("qn").as("na"), col("c.norm2").as("nb2"))
        .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb2"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("nb"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // similarity 3d — MULTI-PROBE IVF search (nprobe=2): real IVF
    // recall at scale needs more than the query's own list — a query
    // near a Voronoi boundary has true neighbors in the runner-up
    // cell. Rank the k centroids per query by exact integer L2
    // (driver-free: the k×64 matrix is a broadcast literal), keep the
    // top-nprobe, and search the UNION of those lists. Join shape is
    // unchanged from nprobe=1 — the probe set (|Q|×nprobe rows) is the
    // broadcast side and candidates still stream through one hash join
    // on the list id; lists are disjoint so the union needs no dedup.
    // (ivfMultiprobeSearch is shared with AnnSpec's recall curve, which
    // sweeps nprobe ∈ {1,2,4} against brute-force truth.)
    "q_ann_ivf_multiprobe" -> ((s, dir) => ivfMultiprobeSearch(s, dir, nprobe = 2)),

    // similarity 2 — brute-force cosine top-k ANN baseline. Scans every
    // candidate BY DESIGN (the exhaustive baseline the IVF path is
    // measured against); the broadcast side is still the tiny query set
    // so the full candidate table streams, never ships (BNLJ build side
    // = queries).
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm2").as("qn"))
      val scored = e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("c.vec_id").as("nb"),
          graft.functions.ArrayMath.dotL(col("qv"), col("c.v")).as("dot"),
          col("qn").as("na"), col("c.norm2").as("nb2"))
        .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb2"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("nb"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Matryoshka truncation sweep — the dimension-reduction half of
    // the ANN cost model: recall@5 of exact L2 search over the FIRST
    // d dims (d ∈ {16, 32, 64}) against the full-64-dim truth. MRL
    // embeddings front-load information precisely so a 100 TB index
    // can store d≪64 prefixes and rescore survivors at full width;
    // this query measures what each truncation level keeps. One
    // candidate pass: the tiny query set broadcasts, a 3-row explode
    // fans each scored pair to its truncation levels (no join), one
    // bounded window per (dims, query), and the recall arithmetic is
    // exact integer ppm end-to-end — no doubles anywhere.
    "q_ann_matryoshka" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val ranked = e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
        .withColumn("dims", explode(array(lit(16L), lit(32L), lit(64L))))
        .select(col("dims"), col("qid"), col("c.vec_id").as("nb"),
          expr("aggregate(zip_with(slice(qv, 1, dims), slice(v, 1, dims), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("dims"), col("qid")).orderBy(col("d2"), col("nb"))))
        .filter(col("rn") <= 5)
      val truth = ranked.filter(col("dims") === 64)
        .select(col("qid"), col("nb"), lit(1L).as("hit"))
      ranked.join(truth, Seq("qid", "nb"), "left")
        .groupBy(col("dims"))
        .agg(count(lit(1)).as("n5"), sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(col("dims"), col("n5"), col("hits"),
          expr("hits * 1000000L div n5").as("recall_ppm"))
        .orderBy(col("dims"))
    }),

    // Radius (range) search — the other ANN query shape: not "the 5
    // nearest" but "EVERYTHING within distance R" (dedup thresholds,
    // collision checks, safety filters want a radius, not a count).
    // Exact integer L2 against the broadcast query set; the per-query
    // result is an aggregate (match count + min/max distance + id
    // checksum), so the output stays bounded even when a query sits
    // in a dense cluster — the candidates stream, nothing ranks.
    "q_ann_range" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("c.vec_id").as("nb"),
          expr("aggregate(zip_with(qv, v, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("d2"))
        .filter(col("d2") <= 40000000L)
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_in_range"),
          min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"),
          sum(col("nb")).as("nb_sum"))
        .orderBy(col("qid"))
    }),

    // MMR diversity re-ranking — maximal marginal relevance at λ=1/2
    // over similarity = −(exact integer L2): after the DISTRIBUTED
    // top-20 pool selection (query broadcast, candidates stream,
    // TakeOrderedAndProject bounds the list), the greedy k=5 selection
    // is O(k·|pool|) driver math on the 20 collected vectors — the
    // bounded-collect pattern every production reranker uses (the
    // corpus-sized work is the pool selection; rerank state is 20×64
    // longs). score(c) = −d2(q,c) + min_{s∈selected} d2(c,s), argmax
    // with min-id tie-break; the oracle unrolls the identical greedy
    // steps as correlated-subquery CTEs. This is the diversity pass
    // between retrieval and context assembly in RAG dataset curation.
    "q_ann_mmr" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      val qv = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val pool = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"), col("v"),
          expr("aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("d2q"))
        .orderBy(col("d2q"), col("vec_id")).limit(20)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var s = 0L; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      val first = pool.minBy { case (id, _, dq) => (dq, id) }
      var selected = Vector(first)
      while (selected.size < 5) {
        val chosen = pool.filterNot(c => selected.exists(_._1 == c._1))
          .map { case (id, v, dq) =>
            (id, v, dq, -dq + selected.map(sv => d2(v, sv._2)).min)
          }
          // argmax score, tie-break smallest id (maxBy on (score, -id))
          .maxBy { case (id, _, _, sc) => (sc, -id) }
        selected :+= ((chosen._1, chosen._2, chosen._3))
      }
      import s.implicits._
      selected.zipWithIndex
        .map { case ((id, _, dq), i) => (i.toLong + 1, id, dq) }
        .toDF("ord", "vec_id", "d2q")
        .orderBy(col("ord"))
    }),

    // Hard-negative mining — the retrieval/embedding-training data
    // step: for each query vector, the top-3 most-similar candidates
    // with a DIFFERENT label (same label = positive; the high-cosine
    // other-label neighbors are the "hard" negatives a contrastive
    // trainer wants). Same exact-integer dot/cosine machinery as
    // q_ann_topk (×1000 integerized vectors, long dot products, ONE
    // rounded double division); the tiny query set broadcasts and
    // candidates stream through the hash join — at 100 TB the
    // label-mismatch predicate rides the join, never a second pass.
    "q_ann_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"), col("norm2").as("qn"))
      val scored = e.as("c")
        .join(broadcast(q), col("c.label") =!= col("qlabel"))
        .select(col("qid"), col("c.vec_id").as("nb"), col("c.label").as("nb_label"),
          graft.functions.ArrayMath.dotL(col("qv"), col("c.v")).as("dot"),
          col("qn").as("na"), col("c.norm2").as("nb2"))
        .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb2"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("nb"),
          col("nb_label").cast("long").as("nb_label"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("qid"), col("rank"))
    }),

    // J-skew — skewed fact↔dim join with explicit key salting: the dim
    // side replicates ×8 (salt ∈ 0..7), the fact derives a
    // deterministic salt from its row id, and the join keys become
    // (user_id, salt) so a hot user's rows spread across 8 shuffle
    // partitions instead of hammering one. Result is provably identical
    // to the unsalted join (the oracle runs the plain join). Sort-merge
    // hinted so the salting path is actually exercised — a broadcast
    // would hide it at this SF, and at 100 TB the dim may not fit.
    "q_join_skew_salted" -> ((s, dir) => {
      val salts = 8
      val fact = t(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      fact.hint("merge")
        .join(dim, fact("user_id") === dim("c_custkey") &&
          fact("salt") === dim("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy(col("c_mktsegment"))
    }),

    // analytics — sequential conversion funnel (signup → view →
    // purchase), the classic product-analytics measure over an event
    // log. Each stage is a conditional min over an equi-join on
    // user_id — partial+final hash agg, no window over the whole log,
    // no driver loop — so the chain scales as 3 hash aggs + 2 hash
    // joins regardless of corpus size. Epochs emitted as bigints
    // (unix_timestamp ↔ DuckDB floor(epoch())).
    "q_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view").as("e")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").as("p")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + when(col("t2").isNotNull, 1).otherwise(0) +
            when(col("t3").isNotNull, 1).otherwise(0)).cast("long").as("depth"),
          unix_timestamp(col("t1")).as("e1"),
          unix_timestamp(col("t2")).as("e2"),
          unix_timestamp(col("t3")).as("e3"))
        .orderBy(col("user_id"))
    }),

    // text — inverted-index build: token → postings (document
    // frequency + the sorted doc list), the core search-index structure
    // a curated corpus ships with. One explode + one partial+final hash
    // agg keyed by token; postings serialize as csv (hash-stable across
    // engines). The df ≥ 3 cut is an agg-side HAVING, not a
    // post-collect; at 100 TB the same plan shards by token hash and
    // each posting list stays within its writer task.
    "q_text_postings" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(col("df") >= 3)
        .select(col("tok"), col("df"), concat_ws(",", col("docs")).as("postings"))
        .orderBy(col("tok"))
    }),

    // sketch — HyperLogLog distinct-token estimate, built from scratch
    // on portable md5 hashing so the DuckDB oracle computes the
    // IDENTICAL registers: 56-bit hash → 64 buckets (low 6 bits), rho =
    // leading-zero rank of the remaining 50 bits (via minimal binary
    // string length — exact, no float log), per-bucket max rho, and the
    // harmonic mean INTEGERIZED as S = Σ 2^(51-M_j) so the only double
    // op is one division + round (the file's determinism rule). Shape:
    // one partial+final agg to 64 register rows, then a 64-row fold —
    // the sketch a 100 TB distinct-count runs instead of count(DISTINCT).
    "q_text_distinct_hll" -> ((s, dir) =>
      graft.core.Sketches.hllSketch(
        t(s, dir, "documents").select(explode(split(col("text"), " ")).as("tok")))),

    // layout 2 — zone-map data skipping, layout A/B: the same rows
    // bucketed two ways (hash on the join key vs value-range on the
    // filter column), per-bucket min/max "zone maps" computed for
    // both, and a fixed 30-day window predicate evaluated AGAINST THE
    // ZONE MAPS ONLY — reporting how many buckets (and rows) each
    // layout lets the scan skip. This is the quantified argument for
    // range-clustering a 100 TB table on its hot filter column: the
    // hash layout's zones all straddle the predicate (skip ≈ 0), the
    // range layout's zones are disjoint from it (skip ≈ 1 − 30/span).
    // The global min/max is a 1-row broadcast; everything else is two
    // hash aggs over (layout, bucket) — the data is read once per
    // layout arm and never sorted.
    "q_table_zonemap" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("d"))
      val mm = li.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
      val b = li.crossJoin(broadcast(mm))
        .select(col("d"), col("dmin"),
          (col("l_orderkey") % 64).as("bh"),
          expr("((d - dmin) * 64) div (dmax - dmin + 1)").as("bs"))
      val zones = b.select(lit("hash").as("layout"), col("bh").as("bucket"),
          col("d"), col("dmin"))
        .union(b.select(lit("range").as("layout"), col("bs").as("bucket"),
          col("d"), col("dmin")))
        .groupBy(col("layout"), col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("d")).as("zmin"),
          max(col("d")).as("zmax"), min(col("dmin")).as("dmin"))
      zones
        .withColumn("skip",
          col("zmax") < col("dmin") + 200 || col("zmin") >= col("dmin") + 230)
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("skip"), 1L).otherwise(0L)).as("n_skipped"),
          sum(when(col("skip"), col("n")).otherwise(0L)).as("rows_skipped"),
          sum(col("n")).as("rows_total"))
        .select(col("layout"), col("n_buckets"), col("n_skipped"),
          col("rows_skipped"),
          expr("(rows_skipped * 1000000L) div rows_total").as("skip_ppm"))
        .orderBy(col("layout"))
    }),

    // layout — z-order (Morton) clustering summary: bit-interleave two
    // join/filter dimensions into one z-value, bucket by the z-prefix,
    // and report per-bucket extents. The per-bucket min/max columns ARE
    // the pruning statistics a 100 TB table gets from a z-ordered
    // rewrite (each bucket covers a quad region, so a 2-D box predicate
    // skips every non-intersecting bucket — see functions/ZOrder +
    // ZOrderSpec's pruning assertion). The interleave is an unrolled
    // codegen'd bit expression mirrored literally in the oracle.
    "q_zorder_layout" -> ((s, dir) => {
      import graft.functions.ZOrder
      t(s, dir, "lineitem")
        .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
        .withColumn("z", ZOrder.zval(col("x"), col("y"), 10))
        .withColumn("zbucket", expr("shiftright(z, 14)"))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"),
          min(col("z")).as("z_min"), max(col("z")).as("z_max"))
        .orderBy(col("zbucket"))
    }),

    // graph 2 — triangle counting over the near-dup candidate graph:
    // the ordered pair list (a<b) self-joined twice — wedge build on the
    // shared middle vertex, then a closure check on (a,c). Both steps
    // are equi-joins (the standard distributed triangle-count shape);
    // the a<b<c ordering counts each triangle exactly once and no
    // cartesian appears anywhere. Output aggregates to per-lowest-vertex
    // counts (near-dup cliques make the full enumeration list cubically
    // large — 442k triangles at sf0.01 — so the list stays inside the
    // shuffle and only the count surface leaves the job).
    "q_graph_triangles" -> ((s, dir) => {
      val p = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val wedges = p.as("p1").join(p.as("p2"), col("p1.ib") === col("p2.ia"))
        .select(col("p1.ia").as("a"), col("p1.ib").as("b"), col("p2.ib").as("c"))
      wedges.join(p.as("p3"),
          col("a") === col("p3.ia") && col("c") === col("p3.ib"))
        .groupBy(col("a"))
        .agg(count(lit(1)).as("n_tri"))
        .orderBy(col("a"))
    }),

    // graph 3 — fixed-point integer PageRank over the near-dup graph
    // (3 power iterations, damping 0.85). Ranks are scaled integers
    // (1e6 = 1.0) and every step is integer arithmetic — rank div deg
    // contributions, an integer sum per destination, and
    // 0.15 + 0.85·mass as (150000 + 85·m div 100) — so the result is
    // exact, order-independent, and engine-portable (no float
    // accumulation ordering; dangling mass follows the standard
    // vanishing-mass simplification). Per iteration: one equi-join of
    // edges against ranks+degrees, one partial+final sum keyed by dst,
    // one left join back to nodes — the identical shape GraphX/Pregel
    // shards at 100 TB — with localCheckpoint per round (the
    // checkpoint-cadence rule: without it round t re-derives round t-1
    // twice). Oracle: the same three rounds unrolled as CTEs.
    "q_graph_pagerank" -> ((s, dir) => {
      val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
      val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("id")).distinct()
      pagerankFp(nodes, edges, 3)
        .select(col("id").as("doc_id"), col("pr")).orderBy(col("doc_id"))
    }),

    // text — TF-IDF top-terms per document with an integer-log2 idf:
    // idf = length(bin(N div df)) = floor(log2(N div df)) + 1, computed
    // from the binary-string length so the logarithm is EXACT integer
    // arithmetic in both engines (a float ln differs in the last ulp
    // between libm implementations and would poison the hash compare —
    // the file's determinism rule). tf is one partial+final hash agg on
    // (doc_id, tok); df one on tok after a distinct; N joins in as a
    // 1-row broadcast (no driver collect). Top-3 terms per doc via
    // row_number with a total (score desc, tok) tie-break order.
    "q_text_tfidf" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = toks.select(col("doc_id"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .withColumnRenamed("tok", "dtok")
      val n = t(s, dir, "documents")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val scored = tf.join(dfreq, col("tok") === col("dtok"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          (col("tf") * length(expr("bin(n_docs div df)"))).as("score"))
      scored
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("tok"))))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          col("score").cast("long").as("score"))
        .orderBy(col("doc_id"), col("tok"))
    }),

    // BM25 retrieval scoring (Robertson/Spärck Jones probabilistic
    // relevance, the default lexical ranker in every RAG stack) with
    // EXACT integer arithmetic: k1=6/5 and b=3/4 enter as rationals, so
    // the tf saturation term (tf·(k1+1)) / (tf + k1·(1−b+b·dl/avgdl))
    // clears to 44·TT·tf / (20·TT·tf + 6·TT + 18·dl·N) after
    // multiplying through by 20·TT (TT=total tokens, avgdl=TT/N), and
    // the idf is the +0.5-smoothed ratio doubled to stay integral —
    // each factor ONE integral division in ppm, products carried in
    // decimal(38,0) so nothing wraps at any corpus size (the q_agg_corr
    // lesson), no libm log anywhere. Per-term stats are two hash aggs;
    // the 4-row df table and 1-row totals broadcast back.
    "q_text_bm25" -> ((s, dir) => {
      val qTerms = Seq("stream", "window", "merge", "hash")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val tot = dl.agg(sum(col("dl")).as("tt"), count(lit(1)).as("nd"))
      val tf = toks.filter(col("tok").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      tf.join(dl, "doc_id").join(broadcast(dfreq), "tok")
        .crossJoin(broadcast(tot))
        .withColumn("idf_ppm",
          expr("(1000000L * (2L * nd - 2L * df + 1L)) div (2L * df + 1L)"))
        .withColumn("tfs_ppm", expr(
          """CAST((CAST(44 AS DECIMAL(38,0)) * tt * tf * 1000000)
            |  div (CAST(20 AS DECIMAL(38,0)) * tt * tf + 6 * tt + 18 * dl * nd)
            |  AS BIGINT)""".stripMargin))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          expr("CAST(sum(CAST(idf_ppm AS DECIMAL(38,0)) * tfs_ppm) div 1000000 AS BIGINT)")
            .as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(50)
    }),

    // Reciprocal-rank fusion — the standard hybrid-retrieval combiner:
    // fuse a LEXICAL ranking (BM25 over the fixed term set, identical
    // machinery to q_text_bm25) with a VECTOR ranking (exact integer
    // L2 to the query vector — rank-equivalent to cosine ordering for
    // retrieval and needs no doubles) via RRF(d) = Σ 1/(60 + rank_r(d))
    // in exact ppm floor divisions. A document missing from one ranker
    // contributes 0 for it (FULL OUTER + coalesce — the textbook RRF
    // treatment of disjoint candidate pools). Both rankings are
    // corpus-streaming (terms/query broadcast); the fusion join keys on
    // the shared id, and the final top-10 is one bounded sort. This is
    // how a 100 TB corpus serves hybrid search from two indexes that
    // never see each other.
    "q_text_rrf" -> ((s, dir) => {
      val qTerms = Seq("stream", "window", "merge", "hash")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val tot = dl.agg(sum(col("dl")).as("tt"), count(lit(1)).as("nd"))
      val tf = toks.filter(col("tok").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val lex = tf.join(dl, "doc_id").join(broadcast(dfreq), "tok")
        .crossJoin(broadcast(tot))
        .withColumn("idf_ppm",
          expr("(1000000L * (2L * nd - 2L * df + 1L)) div (2L * df + 1L)"))
        .withColumn("tfs_ppm", expr(
          """CAST((CAST(44 AS DECIMAL(38,0)) * tt * tf * 1000000)
            |  div (CAST(20 AS DECIMAL(38,0)) * tt * tf + 6 * tt + 18 * dl * nd)
            |  AS BIGINT)""".stripMargin))
        .groupBy(col("doc_id"))
        .agg(expr("CAST(sum(CAST(idf_ppm AS DECIMAL(38,0)) * tfs_ppm) div 1000000 AS BIGINT)")
          .as("score_ppm"))
        // distributed top-k (TakeOrderedAndProject) bounds the list
        // BEFORE the single-partition ranking window touches it
        .orderBy(col("score_ppm").desc, col("doc_id")).limit(100)
        .select(col("doc_id").as("id"), col("score_ppm"),
          row_number().over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
            .cast("long").as("rank_lex"))
        .select(col("id"), col("rank_lex"))
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      val qv = e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))
      val vec = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"),
          expr("aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(100)
        .select(col("vec_id").as("id"), col("d2"),
          row_number().over(Window.orderBy(col("d2"), col("vec_id")))
            .cast("long").as("rank_vec"))
        .select(col("id"), col("rank_vec"))
      lex.join(vec, Seq("id"), "full_outer")
        .select(col("id"), col("rank_lex"), col("rank_vec"),
          (coalesce(expr("1000000L div (60 + rank_lex)"), lit(0L)) +
           coalesce(expr("1000000L div (60 + rank_vec)"), lit(0L))).as("rrf_ppm"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf_ppm").desc, col("id"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("id"), col("rank_lex"), col("rank_vec"),
          col("rrf_ppm"))
        .orderBy(col("rank"))
    }),

    // dedup — URL canonicalization: the first operator every web-scale
    // corpus runs before any content dedup. A deterministic messy URL
    // is derived per document (mixed-case scheme/host, tracking params,
    // fragment) and canonicalized by the documented rule chain — strip
    // fragment, strip utm_*/ref tracking params, trim dangling ?/&,
    // lowercase scheme+host only (paths stay case-sensitive) — then
    // grouped: per-canonical-URL fetch count + surviving (min) doc.
    // All scalar regex work + one hash agg; at 100 TB the agg shards by
    // canonical-url hash. Oracle mirrors each regex with DuckDB's 'g'
    // flag where Spark's regexp_replace is implicitly replace-all.
    "q_dedup_url" -> ((s, dir) => {
      val raw = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("HTTPS://CDN"), col("doc_id") % 3, lit(".Example.COM/docs/"),
          col("source"), lit("/"), col("doc_id") % 40,
          lit("?utm_source=feed&ref="), col("doc_id") % 5,
          lit("&page="), col("doc_id") % 2,
          lit("&utm_campaign=q"), col("doc_id") % 4,
          lit("#sec"), col("doc_id") % 6).as("url"))
      val canon = raw
        .withColumn("u1", regexp_replace(col("url"), "#.*$", ""))
        .withColumn("u2", regexp_replace(col("u1"), "(utm_[a-z]+|ref)=[^&]*&?", ""))
        .withColumn("u3", regexp_replace(col("u2"), "[?&]+$", ""))
        .withColumn("canonical_url", concat(
          lower(regexp_extract(col("u3"), "^([a-zA-Z]+://[^/]*)", 1)),
          regexp_replace(col("u3"), "^[a-zA-Z]+://[^/]*", "")))
      canon.groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_fetches"), min(col("doc_id")).as("survivor_doc"))
        .orderBy(col("canonical_url"))
    }),

    // analytics — cohort retention over the events table: each user's
    // cohort is their first active day; the triangle (cohort_day,
    // day_offset) → distinct returning users is the standard retention
    // matrix. Two partial+final hash aggs (first-day per user, then
    // distinct-user count per cell) joined by user_id — every step an
    // equi-join/hash-agg on bounded keys, day arithmetic all integer.
    "q_events_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
        .withColumnRenamed("user_id", "fuid")
      ev.join(first, col("user_id") === col("fuid"))
        .select(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"),
          col("user_id"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // sketch 3 — count-min: the frequency-estimate companion to the
    // HLL (distinct) and Misra-Gries (top-k) sketches, built on the
    // same portable md5 hashing so the oracle computes IDENTICAL
    // counters. d=4 rows × w=64 buckets; build is ONE partial+final
    // hash agg over (row, bucket) — 256 counter rows total regardless
    // of input size, the whole point of sketching a 100 TB stream.
    // Output: the 5 exact-top tokens with exact count vs point
    // estimate (min over the 4 rows), demonstrating the one-sided
    // est ≥ exact guarantee. All integer; no float anywhere.
    "q_text_countmin" -> ((s, dir) => {
      def bucketOf(row: Column, tok: Column): Column =
        (conv(substring(md5(concat(row.cast("string"), lit(":"), tok)), 1, 8),
          16, 10).cast("long") % 64).cast("long")
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
      val probes = exact.orderBy(col("exact_n").desc, col("tok")).limit(5)
      val rows = toks.select(col("tok"),
        explode(sequence(lit(0), lit(3))).as("row_i"))
      val counters = rows
        .select(col("row_i"), bucketOf(col("row_i"), col("tok")).as("bucket"))
        .groupBy(col("row_i"), col("bucket")).agg(count(lit(1)).as("cnt"))
        .withColumnRenamed("row_i", "ci").withColumnRenamed("bucket", "cb")
      probes
        .select(col("tok"), col("exact_n"),
          explode(sequence(lit(0), lit(3))).as("row_i"))
        .withColumn("bucket", bucketOf(col("row_i"), col("tok")))
        .join(counters, col("row_i") === col("ci") && col("bucket") === col("cb"))
        .groupBy(col("tok"), col("exact_n"))
        .agg(min(col("cnt")).as("cm_est"))
        .orderBy(col("tok"))
    }),

    // agg — exact discrete quantiles per group WITHOUT a per-group
    // collect: rank every row (row_number over a total (value, id)
    // order), compute the group size as a window count, and pick the
    // rows at rank ceil(q·n) via pure-integer rank formulas
    // ((n+3) div 4 = ceil(n/4), ...). The value doubles are PICKED,
    // never summed, so no float-accumulation ordering exists and both
    // engines agree bit-for-bit. Shape: one window sort per group +
    // one hash agg — the scalable exact-quantile plan (vs collect_list
    // which materializes whole groups).
    "q_agg_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ranked = t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("value"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      ranked.groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === expr("(n + 3) div 4"), col("value"))).as("p25"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("value"))).as("p50"),
          max(when(col("rn") === expr("(3 * n + 3) div 4"), col("value"))).as("p75"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("value"))).as("p90"),
          max(col("n")).as("n"))
        .orderBy(col("event_type"))
    }),

    // sketch 4 — per-key HLL: the 64-register distinct sketch built
    // PER SOURCE (sketch-as-aggregation) — one partial+final agg to
    // keys×64 register rows; the per-tenant distinct report a 100 TB
    // corpus runs instead of a count(DISTINCT) shuffle per group.
    // Identical md5 registers in the oracle, grouped by source.
    "q_text_hll_by_source" -> ((s, dir) =>
      graft.core.Sketches.hllSketchBy(
        t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok")),
        "source")),

    // dedup 2 — component-size histogram over the resolved near-dup
    // graph: the cluster-size distribution every dedup run reports
    // (how much of the corpus sits in 2-clusters vs mega-clusters).
    // Reads the memoized resolution (the iterative propagation runs
    // once per session); two bounded-key hash aggs on top.
    "q_dedup_component_sizes" -> ((s, dir) =>
      resolveComponents(s, dir)
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_components"))
        .orderBy(col("sz"))),

    // Dedup savings report — the "what does near-dup dedup buy us at
    // 100 TB" number: per resolved component keep the min-doc_id
    // survivor's bytes, roll everything up to one row (components,
    // dup components, docs, bytes total/kept/saved). Rides the
    // memoized component resolution; one broadcast-size join against
    // the doc-length projection, two hash aggregations.
    "q_dedup_savings" -> ((s, dir) => {
      val chars = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("doc_id"), col("n_chars"))
      resolveComponents(s, dir).join(chars, "doc_id")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("sz"),
          sum(col("n_chars")).as("bytes_total"),
          min_by(col("n_chars"), col("doc_id")).as("bytes_kept"))
        .agg(count(lit(1)).as("n_components"),
          sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_dup_components"),
          sum(col("sz")).as("n_docs"),
          sum(col("bytes_total")).as("bytes_total"),
          sum(col("bytes_kept")).as("bytes_kept"),
          (sum(col("bytes_total")) - sum(col("bytes_kept"))).as("bytes_saved"))
    }),

    // analytics 2 — IQR outlier detection per event type: quartiles
    // from the exact integer-rank picks (q_agg_quantiles' machinery),
    // Tukey fences at 1.5·IQR, then one broadcast join back over the
    // events scan. The fence arithmetic is three exact-rounded IEEE
    // ops on PICKED doubles (never accumulated), so both engines
    // compute bit-identical bounds; counts/min/max then integer/picks.
    "q_events_outliers" -> ((s, dir) => {
      val ranked = t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("value"), col("event_id"))))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val bounds = ranked.groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === expr("(n + 3) div 4"), col("value"))).as("q1"),
          max(when(col("rn") === expr("(3 * n + 3) div 4"), col("value"))).as("q3"))
        .select(col("event_type").as("bt"), col("q1"), col("q3"),
          (col("q3") - col("q1")).as("iqr"))
      t(s, dir, "events").join(broadcast(bounds), col("event_type") === col("bt"))
        .filter(col("value") < col("q1") - lit(1.5) * col("iqr") ||
          col("value") > col("q3") + lit(1.5) * col("iqr"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"),
          min(col("value")).as("min_out"), max(col("value")).as("max_out"))
        .orderBy(col("event_type"))
    }),

    // RAG chunking — overlapping sliding-window chunks (size 32,
    // stride 24): the retrieval-corpus preparation step every RAG /
    // embedding pipeline runs before encoding. Per-row array work
    // (sequence + slice + explode) then NO shuffle at all — each doc
    // emits its own chunks where it sits; the per-chunk fingerprint
    // keys downstream chunk-level dedup. Chunk rule: every stride
    // offset < n_tok starts a chunk (tail chunks may be short) — the
    // same deterministic rule in both engines.
    "q_text_chunks" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          split(col("text"), " ").as("tk"))
        .withColumn("n_tok", size(col("tk")).cast("long"))
        .withColumn("c_start", explode(expr("sequence(0L, n_tok - 1, 24)")))
        .select(col("doc_id"), expr("c_start div 24").as("chunk_idx"),
          col("c_start"),
          expr("slice(tk, cast(c_start + 1 as int), 32)").as("chunk"))
        .select(col("doc_id"), col("chunk_idx"), col("c_start"),
          size(col("chunk")).cast("long").as("chunk_len"),
          substring(md5(array_join(col("chunk"), " ")), 1, 16).as("fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Bigram language-model counts — the n-gram LM table (KenLM-style
    // count collection): adjacent-pair extraction is pure per-row
    // array work (transform over sequence — NO window shuffle, NO
    // posexplode+lag), then one hash agg for pair counts, one for
    // left-context totals, one equi-join; the conditional probability
    // is scaled-integer (ppm) floor division so the table is exact and
    // engine-identical. df>=5 bounds the output to real signal.
    "q_text_bigram_lm" -> ((s, dir) => {
      val pairs = t(s, dir, "documents")
        .select(split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(tk) - 1),
             i -> struct(element_at(tk, i) as w1, element_at(tk, i + 1) as w2))"""))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val big = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      val tot = big.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
        .withColumnRenamed("w1", "tw1")
      big.join(tot, col("w1") === col("tw1"))
        .filter(col("cnt") >= 5)
        .select(col("w1"), col("w2"), col("cnt"), col("tot"),
          expr("(cnt * 1000000L) div tot").as("cond_ppm"))
        .orderBy(col("w1"), col("w2"))
    }),

    // Vocabulary coverage curve — what share of total token mass the
    // top-k most frequent words carry, at k ∈ {10, 100, 1000}: the
    // no-logarithm Zipf readout behind stopword lists and vocab-size
    // decisions. The corpus collapses to the VOCAB grain first (one
    // hash agg); the rank window runs over word types, never tokens;
    // coverage is three conditional sums in one agg, exact ppm.
    "q_text_coverage" -> ((s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // feeds the totals arm and the top-k arm
      val tot = vocab.agg(count(lit(1)).as("vocab"), sum(col("cnt")).as("mass"))
      // distributed top-k bounds the list BEFORE the rank window — the
      // window orders 1000 rows, never the vocabulary
      val top = vocab.orderBy(col("cnt").desc, col("tok")).limit(1000)
        .withColumn("r", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
        .agg(sum(when(col("r") <= 10, col("cnt")).otherwise(0L)).as("m10"),
          sum(when(col("r") <= 100, col("cnt")).otherwise(0L)).as("m100"),
          sum(col("cnt")).as("m1000"))
      tot.crossJoin(broadcast(top))
        .select(col("vocab"), col("mass"),
          expr("(m10 * 1000000L) div mass").as("cov10_ppm"),
          expr("(m100 * 1000000L) div mass").as("cov100_ppm"),
          expr("(m1000 * 1000000L) div mass").as("cov1000_ppm"))
    }),

    // Word-distribution drift per source — χ² divergence against the
    // corpus-wide distribution, the no-logarithm domain-shift signal
    // (KL needs libm; χ² is exact rational): for each source, Σ over
    // its words of (p−q)²/q with p, q as exact ppm shares, each term
    // one integer floor division. Word counts per source and corpus
    // totals are two hash aggs over the vocab grain; the corpus share
    // joins back by word (equi). High χ² ⇒ the source speaks a
    // different language than the mixture — the flag before reweighting.
    "q_text_chisq_drift" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val bySrc = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // feeds per-source totals, corpus agg, and the join
      val srcTot = bySrc.groupBy(col("source")).agg(sum(col("c")).as("st"))
      val corpus = bySrc.groupBy(col("tok")).agg(sum(col("c")).as("cc"))
      val corpusTot = corpus.agg(sum(col("cc")).as("ct"))
      bySrc.join(srcTot, Seq("source"))
        .join(corpus, Seq("tok"))
        .crossJoin(broadcast(corpusTot))
        .select(col("source"),
          expr("(c * 1000000L) div st").as("p_ppm"),
          expr("(cc * 1000000L) div ct").as("q_ppm"))
        .filter(col("q_ppm") > 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(expr(
            "cast(((p_ppm - q_ppm) * (p_ppm - q_ppm)) div q_ppm as decimal(38,0))"))
            .cast("long").as("chisq_scaled"))
        .orderBy(col("source"))
    }),

    // Hapax ratio per source — the vocabulary-growth quality signal:
    // the share of word TYPES that occur exactly once in the source
    // (high hapax ⇒ open vocabulary / noisy text; near-zero ⇒
    // templated or collapsed text), next to the type/token ratio in
    // the same pass. Two hash aggs (token → (source, word) counts →
    // per-source rollup); everything shards by source at 100 TB.
    "q_text_hapax" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"),
          sum(col("cnt")).as("tokens"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"))
        .select(col("source"), col("vocab"), col("tokens"), col("hapax"),
          expr("(hapax * 1000000L) div vocab").as("hapax_ppm"),
          expr("(vocab * 1000000L) div tokens").as("ttr_ppm"))
        .orderBy(col("source"))),

    // Interpolated Kneser-Ney bigram smoothing — the LM-quality
    // companion to q_text_bigram_lm's raw MLE table: discount D=3/4
    // moves mass from observed bigrams to a continuation distribution
    // (how many distinct LEFT contexts a word follows — the "Francisco
    // problem" fix), P_KN(w2|w1) = (c−D)/c(w1) + λ(w1)·Pcont(w2).
    // All-integer with D=3/4 via multiply-by-4: term1 = (4c−3)·1e6 div
    // 4c(w1) (c≥1 so the max(·,0) clamp is vacuous), λ and Pcont are
    // each one ppm floor division, term2 their ppm product — every
    // intermediate ≤ ~1e13 at ANY SF (counts enter each division at
    // ppm scale, never multiplied together raw). Shape: the bigram
    // type table materializes ONCE (localCheckpoint — it feeds four
    // plan arms), then left-context totals, right-continuation counts,
    // and the 1-row type total are hash aggs over TYPES (vocab²-
    // bounded, not corpus-bounded); the 1-row total broadcasts.
    "q_text_kneser_ney" -> ((s, dir) => {
      val big = t(s, dir, "documents")
        .select(split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(tk) - 1),
             i -> struct(element_at(tk, i) as w1, element_at(tk, i + 1) as w2))"""))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val left = big.groupBy(col("w1"))
        .agg(sum(col("cnt")).as("c1"), count(lit(1)).as("n1w1"))
      val right = big.groupBy(col("w2")).agg(count(lit(1)).as("n1w2"))
      val nall = big.agg(count(lit(1)).as("n1all"))
      big.join(left, Seq("w1")).join(right, Seq("w2"))
        .crossJoin(broadcast(nall))
        .filter(col("cnt") >= 5)
        .select(col("w1"), col("w2"), col("cnt"),
          expr("(cnt * 1000000L) div c1").as("mle_ppm"),
          expr("""((4 * cnt - 3) * 1000000L) div (4 * c1)
                 | + (((3 * n1w1 * 1000000L) div (4 * c1))
                 |    * ((n1w2 * 1000000L) div n1all)) div 1000000L""".stripMargin)
            .as("kn_ppm"))
        .orderBy(col("w1"), col("w2"))
    }),

    // Higher moments — skewness and excess kurtosis per event type
    // from EXACT power sums (n, Σx, Σx², Σx³, Σx⁴): x² stays a long,
    // x⁴ is formed as decimal(38,0)·long so nothing wraps at any SF,
    // each sum casts to double ONCE, and the population-moment
    // formulas are each one double expression mirrored verbatim in the
    // oracle (the q_agg_corr discipline extended to 3rd/4th moments).
    // One partial+final hash agg — the shape that distinguishes a
    // heavy-tailed metric from a skewed one at 100 TB without a
    // second pass.
    "q_agg_moments" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("s1"),
          sum((col("x") * col("x")).cast(dec)).as("s2"),
          sum(expr(s"cast(x * x as $dec) * x")).as("s3"),
          sum(expr(s"cast(x * x as $dec) * (x * x)")).as("s4"))
        .select(col("event_type"), col("n"),
          col("n").cast("double").as("nd"),
          col("s1").cast("double").as("d1"), col("s2").cast("double").as("d2"),
          col("s3").cast("double").as("d3"), col("s4").cast("double").as("d4"))
        .withColumn("mu", col("d1") / col("nd"))
        .withColumn("m2", col("d2") / col("nd") - col("mu") * col("mu"))
        .withColumn("m3", col("d3") / col("nd")
          - lit(3.0) * col("mu") * (col("d2") / col("nd"))
          + lit(2.0) * col("mu") * col("mu") * col("mu"))
        .withColumn("m4", col("d4") / col("nd")
          - lit(4.0) * col("mu") * (col("d3") / col("nd"))
          + lit(6.0) * col("mu") * col("mu") * (col("d2") / col("nd"))
          - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
        .select(col("event_type"), col("n"),
          (round(col("m3") / (sqrt(col("m2")) * col("m2")), 6) + lit(0.0))
            .as("skewness"),
          (round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6) + lit(0.0))
            .as("kurtosis_excess"))
        .orderBy(col("event_type"))
    }),

    // Weighted median — the robust price point: per return flag, the
    // smallest price v where the cumulative quantity weight reaches
    // half the total (2·cumw ≥ totw — all-integer, no interpolation
    // ambiguity). Collapses to the VALUE grain first (one hash agg, so
    // the cumsum window runs over distinct prices, not line items),
    // then one cumulative window + one conditional min. The weighted
    // quantile machinery behind cost models and fair-price audits.
    "q_agg_weighted_median" -> ((s, dir) => {
      val grain = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w"))
        .groupBy(col("flag"), col("v")).agg(sum(col("w")).as("w"))
      val wc = Window.partitionBy(col("flag")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wt = Window.partitionBy(col("flag"))
      grain
        .withColumn("cumw", sum(col("w")).over(wc))
        .withColumn("tw", sum(col("w")).over(wt))
        .groupBy(col("flag"))
        .agg(max(col("tw")).as("total_weight"),
          min(when(col("cumw") * 2 >= col("tw"), col("v"))).as("wmedian_cents"))
        .orderBy(col("flag"))
    }),

    // Gini concentration per source — the inequality measure curation
    // dashboards put next to the mixture table: how unevenly document
    // mass (n_chars) is distributed within each source. Exact integer
    // form of the rank formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) on
    // the ascending (x, doc_id) order — permuting tied x values leaves
    // Σi·xᵢ unchanged, so the doc_id tiebreak is for determinism, not
    // semantics. One window (rank within source) + one hash agg;
    // decimal(38,0) accumulators so n²·x never wraps at any SF.
    "q_agg_gini" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      val dec = "decimal(38,0)"
      t(s, dir, "documents")
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars").cast(dec)).as("sx"),
          sum((col("i") * col("n_chars")).cast(dec)).as("sxi"))
        .select(col("source"), col("n"),
          expr(s"""cast(((2 * sxi - (n + 1) * sx) * 1000000)
                  |  div (cast(n as $dec) * sx) as bigint)""".stripMargin)
            .as("gini_ppm"))
        .orderBy(col("source"))
    }),

    // Pareto concentration — the 80/20 readout: per event type, what
    // share of total value the top decile of users contributes. Users
    // aggregate first (one hash agg), rank by (total desc, user_id)
    // within type, k = ceil(n/10) in integer form, and the share is
    // one ppm floor division. Window is over the USER-grain aggregate
    // (bounded by distinct users per type), never the event stream.
    "q_events_power_users" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("tot").desc, col("user_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("user_id"), cents(col("value")).as("c"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("c")).as("tot"))
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("nu",
          count(lit(1)).over(Window.partitionBy(col("event_type"))).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("tot")).as("total_cents"),
          sum(when(col("r") <= expr("(nu + 9) div 10"), col("tot"))
            .otherwise(0L)).as("top_cents"))
        .select(col("event_type"), col("n_users"), col("total_cents"),
          col("top_cents"),
          expr("(top_cents * 1000000L) div total_cents").as("top_decile_ppm"))
        .orderBy(col("event_type"))
    }),

    // Mixture rebalancing — the source-reweighting computation every
    // training-corpus recipe starts from: per-source token mass, its
    // ppm share, and the scaled-integer weight that would equalize the
    // mixture (target share = 1/k per source). Shape: one partial+final
    // agg to k rows, then window totals over the k-row aggregated
    // frame (bounded by the number of sources, NOT the corpus — the
    // single-partition window is k rows at any SF).
    "q_sample_mixture" -> ((s, dir) => {
      val w = Window.partitionBy(lit(1))
      t(s, dir, "documents")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("src_tokens"))
        .withColumn("total_tokens", sum(col("src_tokens")).over(w))
        .withColumn("k", count(lit(1)).over(w))
        .select(col("source"), col("n_docs"), col("src_tokens"),
          expr("(src_tokens * 1000000L) div total_tokens").as("share_ppm"),
          expr("(total_tokens * 1000000L) div (k * src_tokens)").as("weight_ppm"),
          expr("(src_tokens * ((total_tokens * 1000000L) div (k * src_tokens))) div 1000000L")
            .as("expected_tokens"))
        .orderBy(col("source"))
    }),

    // Sequence validity — consecutive-repeat detection per user (the
    // transcript-sanity check: a conversation whose roles don't
    // alternate is malformed; here the same shape over the events
    // stream). One window shuffle keyed by user, deterministic
    // (ts, event_id) order; output is one row per user.
    "q_events_alternation" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count(when(col("prev") === col("event_type"), 1)).as("n_repeats"))
        .select(col("user_id"), col("n_events"), col("n_repeats"),
          expr("(n_repeats * 1000000L) div n_events").as("repeat_ppm"))
        .orderBy(col("user_id"))
    }),

    // Gap-fill LOCF — last-observation-carried-forward over a sparse
    // measurement stream (the time-series repair every sensor/metrics
    // table needs): nulls are derived deterministically (cents % 7)
    // so both engines fill the same holes; the fill is one bounded
    // running-frame window per user, leading nulls stay null.
    "q_window_locf" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("c",
          when(cents(col("value")) % 7 === 0, lit(null).cast("long"))
            .otherwise(cents(col("value"))))
        .withColumn("filled", last(col("c"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("c"), col("filled"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Spearman rank correlation per event type — value-rank vs
    // time-rank agreement (is the metric trending?): both ranks are
    // exact integer row_numbers on unique composite orders, Σd² is a
    // long sum, and rho is formed from TWO exact-rounded IEEE ops on
    // exactly-representable operands — bit-identical across engines.
    "q_agg_spearman" -> ((s, dir) => {
      val byVal = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val byTime = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("value"), col("ts"), col("event_id"))
        .withColumn("rv", row_number().over(byVal))
        .withColumn("rt", row_number().over(byTime))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast((rv - rt) * (rv - rt) as bigint)")).as("sum_d2"))
        .filter(col("n") >= 2)
        .select(col("event_type"), col("n"), col("sum_d2"),
          expr("1.0 - (6.0 * sum_d2) / cast(n * (n * n - 1) as double)")
            .as("rho"))
        .orderBy(col("event_type"))
    }),

    // Equi-depth histogram — decile boundaries per event type (the
    // statistics a cost-based optimizer or drift monitor collects;
    // equi-WIDTH lives in q_agg_bins): ntile on a unique composite
    // order is engine-identical, then one hash agg per (type, tile).
    "q_agg_equidepth" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("tile", ntile(10).over(w))
        .groupBy(col("event_type"), col("tile"))
        .agg(count(lit(1)).as("n"),
          min(cents(col("value"))).as("lo_cents"),
          max(cents(col("value"))).as("hi_cents"))
        .orderBy(col("event_type"), col("tile"))
    }),

    // OOV rate — per-document out-of-vocabulary share against the
    // corpus top-1000 vocabulary (the tokenizer-coverage report every
    // vocab change ships with): vocabulary is bounded (1000 rows) so
    // membership is a broadcast left join over the token stream; the
    // rate is ppm floor division. Deterministic vocab tie-break
    // (count desc, token asc).
    "q_text_oov" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))))
        .filter(col("rn") <= 1000)
        .select(col("tok").as("vtok"))
      toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          count(when(col("vtok").isNull, 1)).as("n_oov"))
        .select(col("doc_id"), col("n_tok"), col("n_oov"),
          expr("(n_oov * 1000000L) div n_tok").as("oov_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Prefix-filtering exact similarity join — the LOSSLESS scale path
    // for exact Jaccard >= 0.9 (t = 9/10): each doc only indexes its
    // |d| - ceil(t|d|) + 1 rarest tokens (global-df ascending, token
    // tie-break) — any pair meeting the threshold MUST share a prefix
    // token (pigeonhole), so the candidate equi-join is provably
    // complete while hot stopword buckets never form (rare tokens have
    // small df by construction). Candidates are then verified with the
    // exact intersection over the FULL token arrays. The brute-force
    // DuckDB oracle proves the pruning lossless: result sets are equal.
    "q_dedup_prefix_filter" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val dfTab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val docs = toks.join(dfTab, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
        .select(col("doc_id"),
          expr("transform(st, x -> x.tok)").as("ta"),
          size(col("st")).cast("long").as("sz"))
        .withColumn("plen",
          expr("sz - ((9L * sz + 9L) div 10L) + 1L").cast("int"))
        // three plan arms below (prefix explode + both verify joins)
        // re-derive the collect_list agg without this cut — the
        // checkpoint-cadence rule applied to a DAG fan-out
        .localCheckpoint(true)
      val prefix = docs
        .select(col("doc_id"), explode(expr("slice(ta, 1, plen)")).as("ptok"))
      val cands = prefix.as("a")
        .join(prefix.as("b"),
          col("a.ptok") === col("b.ptok") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .distinct()
      cands
        .join(docs.select(col("doc_id").as("ia"), col("ta").as("taa"),
          col("sz").as("sza")), Seq("ia"))
        .join(docs.select(col("doc_id").as("ib"), col("ta").as("tab"),
          col("sz").as("szb")), Seq("ib"))
        .select(col("ia"), col("ib"),
          size(array_intersect(col("taa"), col("tab"))).cast("long").as("inter"),
          (col("sza") + col("szb")).as("szsum"))
        .select(col("ia"), col("ib"), col("inter"),
          (col("szsum") - col("inter")).as("uni"))
        .filter(col("inter") * 10 >= col("uni") * 9)
        .select(col("ia"), col("ib"), col("inter"), col("uni"),
          expr("(inter * 1000000L) div uni").as("jac_ppm"))
        .orderBy(col("ia"), col("ib"))
    }),

    // TPC-H Q6 — the forecasting-revenue-change scan: a pure
    // filter+agg with every predicate pushable to the parquet scan and
    // the revenue sum EXACT (cents×cents long products summed as
    // longs; ONE double division at the end — the file's determinism
    // rule). The discount band is the integer cents value, not a
    // float between, so the filter is exact too.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          cents(col("l_discount")).between(5, 7) &&
          col("l_quantity") < 24)
        .agg(
          (sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) /
            10000.0).as("revenue"),
          count(lit(1)).as("n"))),

    // Column profiling — the data-quality report every ingested table
    // gets before training sees it: per column null count, distinct
    // count, min/max. Uses the real unpivot (melt) operator — one
    // Expand over the scan, then one partial+final hash agg keyed by
    // column name (3 groups → the partial side collapses everything
    // map-side; no per-column scan repetition). Nulls are derived
    // deterministically (cents % 7) so both engines profile the same
    // holes.
    "q_profile_columns" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_type").as("c_event_type"),
        col("props").as("c_props"),
        when(cents(col("value")) % 7 === 0, lit(null).cast("string"))
          .otherwise(cents(col("value")).cast("string")).as("c_value_cents"))
      base.unpivot(
          Array.empty[Column],
          Array(col("c_event_type"), col("c_props"), col("c_value_cents")),
          "col_name", "val")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"),
          (count(lit(1)) - count(col("val"))).as("n_null"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"),
          max(col("val")).as("max_val"))
        .orderBy(col("col_name"))
    }),

    // JSON field extraction — pull a typed value out of the semi-
    // structured props column (the event-payload shred every product
    // analytics table starts with): get_json_object is a codegen'd
    // scalar pass, then one hash agg per event type. No shuffle before
    // the per-row extraction.
    // DAU/MAU stickiness — the engagement ratio product dashboards
    // live on: per day, what share of that (30-day) month's active
    // users were active today. Two exact distinct-count aggs (day
    // grain and month grain — both user-deduplicated hash aggs, no
    // approximation) joined on the month key; exact ppm.
    "q_events_stickiness" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .withColumn("month", expr("day div 30"))
      val dau = e.groupBy(col("day"), col("month"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = e.groupBy(col("month"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(broadcast(mau), Seq("month"))
        .select(col("day"), col("dau"), col("mau"),
          expr("(dau * 1000000L) div mau").as("stickiness_ppm"))
        .orderBy(col("day"))
    }),

    // CUPED variance reduction — the experimentation workhorse:
    // adjust each arm's outcome mean by the pre-period covariate,
    // mean_adj = mean_y − θ·(mean_x_arm − mean_x_global) with
    // θ = cov(x,y)/var(x) POOLED. Users reduce to one (x, y) row
    // (pre/post split at day 15, conditional sums in one agg), arms
    // are user_id % 2, θ comes from the same exact five-sum discipline
    // as q_agg_corr (decimal accumulators, cast-once doubles), and the
    // two arm rows join the 1-row global by broadcast. One pass over
    // events, user-sharded; the arithmetic is bounded by arms, not
    // users.
    "q_events_cuped" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val ev = t(s, dir, "events")
        .select(col("user_id"), cents(col("value")).as("c"),
          expr("unix_timestamp(ts) div 86400").as("day"))
      val mind = ev.agg(min(col("day")).as("mind")) // 1-row broadcast,
      // never a global window over the event stream
      val users = ev.crossJoin(broadcast(mind))
        .withColumn("rel", col("day") - col("mind"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("rel") < 15, col("c")).otherwise(0L)).as("x"),
          sum(when(col("rel") >= 15, col("c")).otherwise(0L)).as("y"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
        .localCheckpoint(true) // feeds the pooled-θ arm and the per-arm agg
      val g = users.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"))
        .select(col("n").cast("double").as("nd"),
          col("sx").cast("double").as("gsx"), col("sy").cast("double").as("gsy"),
          col("sxy").cast("double").as("gsxy"), col("sxx").cast("double").as("gsxx"))
        .withColumn("theta",
          (col("gsxy") * col("nd") - col("gsx") * col("gsy")) /
          (col("gsxx") * col("nd") - col("gsx") * col("gsx")))
        .withColumn("gmean_x", col("gsx") / col("nd"))
      users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x").cast(dec)).as("asx"), sum(col("y").cast(dec)).as("asy"))
        .crossJoin(broadcast(g.select(col("theta"), col("gmean_x"))))
        .select(col("arm"), col("n_users"),
          (round(col("asy").cast("double") / col("n_users").cast("double"), 4)
            + lit(0.0)).as("mean_y"),
          (round(col("asy").cast("double") / col("n_users").cast("double")
            - col("theta") * (col("asx").cast("double") / col("n_users").cast("double")
              - col("gmean_x")), 4) + lit(0.0)).as("mean_y_cuped"))
        .orderBy(col("arm"))
    }),

    // One-pass Poisson bootstrap — confidence intervals without
    // resampling passes: every row fans to R=4 replicas (one 4-row
    // generator, no join), each replica draws a deterministic
    // Poisson(1)-approximating weight w ∈ {0,1,2} from one md5 byte of
    // (event_id, replica) — thresholds 94/187 ≈ e⁻¹ mass — and each
    // (type, replica) emits its weighted mean in ONE hash agg. The
    // spread across replicas IS the sampling distribution of the mean;
    // at 100 TB this replaces R full passes with a 4× generator fan.
    // Fully deterministic: both engines read the same md5 byte.
    "q_sample_bootstrap" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
        .withColumn("r", explode(expr("sequence(0L, 3L)")))
        .withColumn("h",
          conv(substring(md5(concat(col("event_id").cast("string"), lit(":"),
            col("r").cast("string"))), 1, 2), 16, 10).cast("long"))
        .withColumn("w",
          when(col("h") < 94, 0L).when(col("h") < 187, 1L).otherwise(2L))
        .groupBy(col("event_type"), col("r").as("replica"))
        .agg(sum(col("w")).as("n_eff"),
          expr("(sum(w * c) * 100L) div sum(w)").as("mean_c100"))
        .orderBy(col("event_type"), col("replica"))
    }),

    // Daily-seasonality autocorrelation — does the metric repeat on a
    // 24-hour cycle? Per event type: hourly counts, self-joined at
    // lag 24 (one equi-join on the shifted hour key — never a window
    // over the raw stream), then the exact five-sum Pearson r between
    // c(h) and c(h+24). r ≈ 1 ⇒ strong daily rhythm (schedule load
    // shedding by it); r ≈ 0 ⇒ arrivals are flat/noisy. The hour-grain
    // table is tiny at any SF (hours × types), so everything after the
    // first agg is bounded by the time span, not the event count.
    "q_events_autocorr" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 3600").as("h"))
        .agg(count(lit(1)).as("c"))
      val lagged = hourly.select(col("event_type").as("lt"),
        (col("h") - 24).as("lh"), col("c").as("lc"))
      val dec = "decimal(38,0)"
      hourly.join(lagged,
          col("event_type") === col("lt") && col("h") === col("lh"))
        .select(col("event_type"), col("c").as("x"), col("lc").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .select(col("event_type"), col("n"),
          col("n").cast("double").as("nd"),
          col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
          col("sxy").cast("double").as("dsxy"),
          col("sxx").cast("double").as("dsxx"), col("syy").cast("double").as("dsyy"))
        .select(col("event_type"), col("n"),
          (round((col("dsxy") * col("nd") - col("dsx") * col("dsy")) /
            (sqrt(col("dsxx") * col("nd") - col("dsx") * col("dsx")) *
             sqrt(col("dsyy") * col("nd") - col("dsy") * col("dsy"))), 6)
            + lit(0.0)).as("autocorr_24h"))
        .orderBy(col("event_type"))
    }),

    // Time-decayed trending items — exponential-decay heavy hitters
    // with a 1-day half-life: each event of item k (the props payload)
    // contributes weight 2^(20 - age_days) (clamped at 20 days, so the
    // long tail degrades to weight 1 instead of vanishing), and items
    // rank by decayed score vs raw count side by side — the freshness
    // re-ranking every feed/search service runs over its event log.
    // All-integer: ages clamp, weights are exact powers of two, sums
    // accumulate as decimal(38,0) (no wrap at any SF). Two-stage agg:
    // per-(item, day) counts collapse map-side FIRST (the 100 TB
    // shuffle is |items|×|days| rows, not |events|), the 1-row global
    // max-day broadcasts into it, and the final per-item agg + two
    // bounded windows rank 100 items.
    "q_events_trending" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
          expr("unix_timestamp(ts) div 86400").as("day"))
      val byDay = e.groupBy(col("item"), col("day"))
        .agg(count(lit(1)).as("n_day"))
      val maxd = e.agg(max(col("day")).as("max_day"))
      val scored = byDay.crossJoin(broadcast(maxd))
        .withColumn("w",
          expr("shiftleft(1L, cast(20 - least(max_day - day, 20) as int))"))
        .groupBy(col("item"))
        .agg(sum(col("n_day")).as("n"),
          sum((col("w") * col("n_day")).cast("decimal(38,0)")).cast("decimal(38,0)")
            .as("score"))
      scored
        .withColumn("rank_decayed", row_number().over(
          Window.orderBy(col("score").desc, col("item"))).cast("long"))
        .withColumn("rank_raw", row_number().over(
          Window.orderBy(col("n").desc, col("item"))).cast("long"))
        .filter(col("rank_decayed") <= 10)
        // decayed scores cap at 2^20 × |events|, so BIGINT output is
        // safe past SF 1000 (the decimal(38,0) accumulator is the
        // wrap-proof part); DuckDB's HUGEINT sum casts identically
        .select(col("item"), col("n"), col("score").cast("long").as("score"),
          col("rank_decayed"), col("rank_raw"))
        .orderBy(col("rank_decayed"))
    }),

    // Band self-join (|x−y| ≤ δ) without a theta join — the
    // pre-aggregate-then-bucket trick: collapse events to the VALUE
    // grain first (one hash agg — the pair math then rides counts, so
    // a hot value contributes arithmetic, not row blowup), bucket by
    // c div 4 (δ=3 < 4 ⇒ a partner lives in the same or next bucket),
    // fan each probe value to its 2 candidate buckets with a 2-row
    // explode, and equi-join on (type, bucket) with the band predicate
    // riding the join. Same-value pairs are C(n,2) closed-form. The
    // count of close pairs is exact and the shuffle is value-grain —
    // the shape that survives a 100 TB skewed-value event log where
    // the naive self-join is quadratic in the hottest value.
    "q_join_band" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val vals = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
        .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // feeds the probe, build, and C(n,2) arms
      val a = vals.withColumn("pb",
        explode(array(expr("c div 4"), expr("c div 4 + 1"))))
      val b = vals.select(col("event_type").as("bt"), col("c").as("cb"),
        col("n").as("nb"), expr("c div 4").as("bb"))
      val crossP = a.join(b, col("event_type") === col("bt") &&
          col("pb") === col("bb") &&
          col("cb") > col("c") && col("cb") - col("c") <= 3)
        .groupBy(col("event_type"))
        .agg(expr(s"cast(sum(cast(n as $dec) * nb) as bigint)").as("cross_pairs"))
      vals.groupBy(col("event_type"))
        .agg(expr(s"cast(sum(cast(n * (n - 1) div 2 as $dec)) as bigint)")
          .as("same_pairs"), count(lit(1)).as("n_values"))
        .join(crossP, Seq("event_type"), "left")
        .select(col("event_type"), col("n_values"),
          (coalesce(col("cross_pairs"), lit(0L)) + col("same_pairs"))
            .as("n_close_pairs"))
        .orderBy(col("event_type"))
    }),

    // Last-touch attribution — assign each purchase's revenue to the
    // user's most recent click within the 7 preceding days. The whole
    // lookup is ONE RANGE-framed window over the user's event stream:
    // click rows contribute (ts, item) packed into a single bigint
    // (ts·1024 + item — item < 1024 by construction), purchases read
    // max() over RANGE 604800 PRECEDING, and decode item = enc % 1024;
    // max on the packed key IS "latest click wins" with no join, no
    // self-join, no per-purchase subquery. Purchases with no click in
    // the lookback attribute to item −1. One shuffle by user; the
    // attribution agg shards by item.
    "q_events_attribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
        .rangeBetween(-604800L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .withColumn("click_enc",
          when(col("event_type") === "click",
            col("ts_s") * 1024L + col("item")))
        .withColumn("last_click", max(col("click_enc")).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(pmod(col("last_click"), lit(1024L)), lit(-1L))
          .as("attr_item"), col("c"))
        .groupBy(col("attr_item"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("c")).as("revenue_cents"))
        .orderBy(col("attr_item"))
    }),

    // Conversion-lag cohorts — the activation metric behind every
    // growth dashboard: per signup-day cohort, how many users signed
    // up, how many ever purchased AFTER signing up, and the median
    // signup→first-purchase lag. The per-user reduction is one
    // conditional min over a left join (purchases BEFORE signup don't
    // count, users with zero purchases stay as non-converted rows —
    // the filter rides the aggregation, never drops users); cohort
    // stats are one hash agg with a null-skipping percentile. At
    // 100 TB both joins/aggs shard by user, then by cohort day.
    "q_events_conversion_lag" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"))
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_s")).as("s_ts"))
      val pu = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_s").as("p_raw"))
      su.join(pu, Seq("user_id"), "left")
        .groupBy(col("user_id"), col("s_ts"))
        .agg(min(when(col("p_raw") >= col("s_ts"), col("p_raw"))).as("p_ts"))
        .groupBy(expr("s_ts div 86400").as("cohort_day"))
        .agg(count(lit(1)).as("n_signups"),
          count(col("p_ts")).as("n_converted"),
          round(expr("percentile(p_ts - s_ts, 0.5)"), 4).as("median_lag_s"))
        .orderBy(col("cohort_day"))
    }),

    "q_events_props_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type"))),

    // Spark 4 VARIANT type — the open-schema ingestion pattern: shred
    // the JSON payload ONCE into the binary variant encoding, then pull
    // multiple typed paths from that single parse (variant_get), with
    // try_variant_get's null-on-absent-path semantics for fields the
    // contract doesn't guarantee. At 100 TB this is parse-once instead
    // of get_json_object's parse-per-path.
    "q_events_variant" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("try_variant_get(v, '$.absent', 'long')").as("m"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_absent"))
        .orderBy(col("event_type"))),

    // Modal value per group — the most frequent event type per user
    // with a deterministic (count desc, value asc) tie-break: one hash
    // agg to (user, type) counts, then a top-1 window on the bounded
    // per-user group. The categorical summary stat that complements
    // the numeric quantile family.
    "q_agg_mode" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("cnt").desc, col("event_type"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event"),
          col("cnt").as("n_mode"))
        .orderBy(col("user_id"))),

    // Edit-distance record linkage — top-3 nearest part names within a
    // first-word block (the blocked fuzzy-matching shape dedup passes
    // run over product/entity catalogs): blocking turns the quadratic
    // all-pairs into per-block equi-join candidates, levenshtein is a
    // codegen'd scalar on each candidate, and the top-3 is a bounded
    // window with a total (dist, key) tie-break. Lossless within the
    // block by construction; at 100 TB the block key shards the join.
    "q_join_editdist" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_partkey") < 2000)
        .select(col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("blk"))
      p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.p_partkey") =!= col("b.p_partkey"))
        .select(col("a.p_partkey").as("ka"), col("b.p_partkey").as("kb"),
          levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ka")).orderBy(col("dist"), col("kb"))))
        .filter(col("rn") <= 3)
        .select(col("ka"), col("kb"), col("dist"))
        .orderBy(col("ka"), col("kb"))
    }),

    // Jaro-Winkler record linkage — best fuzzy match per part within a
    // first-word block, via the engine's own codegen'd Catalyst
    // expression (functions/StringSim.scala) exercised through its SQL
    // registration. The oracle recomputes with DuckDB's INDEPENDENT
    // rapidfuzz implementation — the hash gate proves the two
    // implementations agree bit-for-bit on every candidate pair
    // (algorithm pinned: integer-halved transpositions, 0.7 boost
    // threshold, empty→0). Blocking shards the quadratic all-pairs
    // into per-block equi-joins at any scale.
    "q_join_jarowinkler" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_partkey") < 2000)
        .select(col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("blk"))
      p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.p_partkey") =!= col("b.p_partkey"))
        .select(col("a.p_partkey").as("ka"), col("b.p_partkey").as("kb"),
          expr("jaro_winkler(a.p_name, b.p_name)").as("sim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ka")).orderBy(col("sim").desc, col("kb"))))
        .filter(col("rn") === 1 && col("sim") >= 0.8)
        .select(col("ka"), col("kb"), col("sim"))
        .orderBy(col("ka"))
    }),

    // Rolling 7-day distinct users per day (the WAU curve) — EXACT
    // sliding count-distinct without a sliding window operator: dedup
    // to (day, user) first (bounds everything downstream by active
    // users/day, not events/day), explode each onto the 7 grid days it
    // serves, then one distinct-agg per grid day. Two hash shuffles on
    // bounded keys; no self-join, no per-day re-scan — the shape that
    // survives 100 TB of events.
    "q_events_rolling_distinct" -> ((s, dir) => {
      val du = t(s, dir, "events")
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      du.select(explode(sequence(col("d"), date_add(col("d"), 6))).as("day"),
          col("user_id"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(col("day").cast("string").as("day"), col("wau"))
        .orderBy(col("day"))
    }),

    // Robust outlier report per event type: median / MAD (the
    // scale-free robust z-score every metrics pipeline prefers over
    // mean/stddev, which the outliers themselves corrupt). Values
    // integerized to cents so both engines' median interpolation is an
    // exact .5; dev > 4.4478·MAD ≈ 3 robust standard deviations
    // (3 × 1.4826). Two passes over the (type, cents) projection with
    // broadcast joins of the 8-row per-type stats — no sort, no window.
    "q_events_mad" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(cents, 0.5)").as("med_cents"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("cents") - col("med_cents")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad_cents"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med_cents")).as("med_cents"),
          first(col("mad_cents")).as("mad_cents"),
          count(lit(1)).as("n"),
          sum(when(col("dev") > col("mad_cents") * 4.4478, 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // Data-quality expectations report (the Deequ-style contract gate a
    // pipeline runs before accepting a 100 TB batch): six declared
    // constraints — range, domain, not-null, key-uniqueness, date
    // bounds — validated in ONE scan (conditional sums fuse into a
    // single partial+final hash aggregate; uniqueness rides the same
    // pass as count minus count-distinct of the composite key), then
    // unpivoted to one row per constraint. NULL never counts as a range
    // violation (only the explicit not-null check flags it) — the
    // CASE/when null semantics are identical in both engines.
    "q_quality_expectations" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("v_qty"),
        sum(when(!col("l_discount").between(0, 0.10), 1L).otherwise(0L)).as("v_disc"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("v_flag"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v_null"),
        (count(lit(1)) - countDistinct(col("l_orderkey") * 10 + col("l_linenumber"))).as("v_uniq"),
        sum(when(!col("l_shipdate").between("1992-01-01", "1998-12-31"), 1L).otherwise(0L)).as("v_ship"))
      a.selectExpr("n AS n_rows",
          """stack(6,
             'discount_in_range', v_disc,
             'key_unique', v_uniq,
             'orderkey_not_null', v_null,
             'quantity_in_range', v_qty,
             'returnflag_domain', v_flag,
             'shipdate_bounds', v_ship) AS (check_name, n_violations)""")
        .select(col("check_name"), col("n_rows"), col("n_violations"),
          (col("n_violations") === 0).as("pass"))
        .orderBy(col("check_name"))
    }),

    // Collocation mining — PMI-ranked skip-bigram association over the
    // document corpus (the classic corpus-linguistics pass for finding
    // multiword expressions before tokenizer training). Pair events are
    // positions (i, i+k) for k ∈ {1, 2}, generated as EQUI-joins on
    // (doc_id, pos+k) — never a windowed self-join — so candidate
    // generation shards by document at any scale; marginals and the
    // total are hash aggregations, and the 1-row total broadcasts.
    // Reported as lift = c_ab·N / (c_a·c_b): exact BIGINT products with
    // ONE double division, so cross-engine hashes match bit-for-bit
    // (PMI = ln(lift) is monotone in it — ranking is identical — while
    // ln() low-bit parity across libm implementations is not
    // guaranteed).
    "q_text_pmi" -> ((s, dir) => {
      val toks = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
      val pairs = Seq(1, 2).map { k =>
        toks.select(col("doc_id"), col("pos"), col("tok").as("tok_a"))
          .join(toks.select(col("doc_id"), (col("pos") - k).as("pos"),
            col("tok").as("tok_b")), Seq("doc_id", "pos"))
      }.reduce(_ unionByName _).select(col("tok_a"), col("tok_b"))
      val cab = pairs.groupBy(col("tok_a"), col("tok_b"))
        .agg(count(lit(1)).as("c_ab"))
      val cl = pairs.groupBy(col("tok_a")).agg(count(lit(1)).as("c_a"))
      val cr = pairs.groupBy(col("tok_b")).agg(count(lit(1)).as("c_b"))
      val n = pairs.agg(count(lit(1)).as("n_pairs"))
      cab.join(cl, "tok_a").join(cr, "tok_b").crossJoin(broadcast(n))
        .filter(col("c_ab") >= 3)
        .withColumn("lift", (col("c_ab") * col("n_pairs")).cast("double") /
          (col("c_a") * col("c_b")).cast("double"))
        .select(col("tok_a"), col("tok_b"), col("c_ab"), col("lift"))
        .orderBy(col("lift").desc, col("tok_a"), col("tok_b"))
        .limit(100)
    }),

    // Unicode text cleaning — the normalize-before-dedup pass every
    // scraped corpus needs: strip zero-width characters (ZWSP/ZWNJ/ZWJ/
    // BOM — the classic invisible-text attack on dedup hashes), then
    // NFC-compose combining sequences via the engine's codegen'd
    // nfc_normalize expression (functions/StringSim.scala). Input is
    // part names deterministically dirtied IN the query (decomposed
    // accents + zero-width after spaces), so the oracle — DuckDB's
    // independent utf8proc NFC — reconstructs everything from the
    // table. Lengths are code-point counts in both engines.
    "q_text_nfc" -> ((s, dir) => {
      val zw = "\u200b\u200c\u200d\ufeff"
      val dirty = regexp_replace(
        regexp_replace(col("p_name"), "e", "e\u0301"), " ", " \u200b")
      t(s, dir, "part").filter(col("p_partkey") <= 500)
        .select(col("p_partkey"), dirty.as("dirty"))
        .select(col("p_partkey"),
          org.apache.spark.sql.graftx.GraftStringSim.nfcNormalize(
            regexp_replace(col("dirty"), s"[$zw]", ""))
            .as("clean"),
          length(col("dirty")).cast("long").as("len_dirty"))
        .withColumn("len_clean", length(col("clean")).cast("long"))
        .orderBy(col("p_partkey"))
    }),

    // Bloom-filter membership sketch — build a 256-bit bloom (8×32-bit
    // words, 2 portable md5-derived hashes) per nation over its customer
    // keys, then probe EVERY customer against every nation's filter and
    // report exact members / bloom positives / false positives per
    // nation. The filters are 25 tiny rows → the probe is a broadcast
    // nested-loop over a scalar pass (the real deployment shape: ship
    // the bloom to every scan task, drop non-members before the join).
    // Bit-exact across engines: same md5 slices, same word/bit split,
    // bit_or aggregation.
    "q_sketch_bloom" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
          (conv(substring(md5(col("c_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 256).as("h1"),
          (conv(substring(md5(col("c_custkey").cast("string")), 9, 8), 16, 10)
            .cast("long") % 256).as("h2"))
      def contrib(h: String, w: Int) =
        s"(case when $h div 32 = $w then shiftleft(1L, cast($h % 32 as int)) else 0L end)"
      val wordAggs = (0 until 8).map(w =>
        expr(s"bit_or(${contrib("h1", w)} | ${contrib("h2", w)})").as(s"w$w"))
      val blooms = cust.groupBy(col("c_nationkey").as("bnation"))
        .agg(wordAggs.head, wordAggs.tail: _*)
      val warr = s"array(${(0 until 8).map(i => s"w$i").mkString(",")})"
      val probed = cust.crossJoin(broadcast(blooms))
        .withColumn("pos",
          expr(s"(element_at($warr, cast(h1 div 32 as int) + 1) & shiftleft(1L, cast(h1 % 32 as int))) != 0L AND " +
            s"(element_at($warr, cast(h2 div 32 as int) + 1) & shiftleft(1L, cast(h2 % 32 as int))) != 0L"))
      probed.groupBy(col("bnation"))
        .agg(count(lit(1)).as("n_probes"),
          count(when(col("c_nationkey") === col("bnation"), 1)).as("n_members"),
          count(when(col("pos"), 1)).as("n_pos"),
          count(when(col("pos") && col("c_nationkey") =!= col("bnation"), 1)).as("n_fp"))
        .select(col("bnation"), col("n_probes"), col("n_members"),
          col("n_pos"), col("n_fp"),
          expr("(n_fp * 1000000L) div (n_probes - n_members)").as("fp_ppm"))
        .orderBy(col("bnation"))
    }),

    // Graph k-hop reachability — per node: distinct 1-hop neighbors and
    // distinct nodes within ≤2 hops (self excluded) over the near-dup
    // candidate graph. The neighborhood-expansion primitive behind
    // community features and graph sampling: every hop is one equi-join
    // of the (already-bounded) edge list with itself, then distinct +
    // hash agg — no cartesian anywhere, shards by vertex at scale.
    "q_graph_khop" -> ((s, dir) => {
      // the bounded pair list materializes ONCE (checkpoint-cadence
      // rule): edges feeds four plan arms below, and without the cut
      // each arm re-runs the banded self-join — measured 21.6 s → ~2 s
      // at sf0.1; the session-wide pairsMemo makes it once per SESSION
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
      val twoHop = edges.as("e1").join(edges.as("e2"),
          col("e1.dst") === col("e2.src"))
        .select(col("e1.src").as("src"), col("e2.dst").as("d"))
      val n1 = edges.groupBy(col("src")).agg(count(lit(1)).as("n1"))
      val reach = edges.select(col("src"), col("dst").as("d"))
        .union(twoHop)
        .filter(col("d") =!= col("src"))
        .distinct()
        .groupBy(col("src")).agg(count(lit(1)).as("n2"))
      n1.join(reach, Seq("src"))
        .select(col("src").as("doc_id"), col("n1"), col("n2"))
        .orderBy(col("doc_id"))
    }),

    // graph 4 — k-core decomposition (k=3) by SIMULTANEOUS peeling:
    // each round drops every vertex whose CURRENT degree is < k, all at
    // once (the distributed form — sequential peeling is inherently
    // serial), capped at 8 rounds with an early fixed-point exit. A
    // no-op round IS the fixed point, so exiting early returns exactly
    // the 8-round result the oracle unrolls. Per round: one hash-agg
    // degree count + two semi joins against the bounded survivor set,
    // localCheckpoint per round (checkpoint-cadence rule) — the
    // standard iterative-subgraph shape that shards at 100 TB.
    "q_graph_kcore" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      var edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
        .localCheckpoint(true)
      var n = edges.count()
      var converged = false
      for (_ <- 1 to 8 if !converged) {
        val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 3).select(col("src").as("keep_id"))
        val prev = edges
        edges = edges
          .join(keep, col("src") === col("keep_id"), "left_semi")
          .join(keep, col("dst") === col("keep_id"), "left_semi")
          .localCheckpoint(true)
        val n2 = edges.count()
        converged = n2 == n
        n = n2
        prev.unpersist()
      }
      // the final checkpoint stays alive: the returned plan reads it,
      // and a localCheckpoint's blocks are not recomputable once freed
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("doc_id"), col("deg"))
        .orderBy(col("doc_id"))
    }),

    // graph 6 — link prediction features: for every OPEN wedge (2-hop
    // pair that is NOT already an edge), the common-neighbor count and
    // neighbor-set Jaccard — the classic "who should be connected"
    // scores, and in dedup terms the transitive-pair candidates the
    // banding missed. Wedge build is one equi-join on the middle
    // vertex, open-ness is one anti join against the edge list,
    // degrees attach by two more equi-joins, and the top-20 is a
    // distributed TakeOrdered — exact integer ppm, no cartesian, all
    // sharded by vertex at 100 TB.
    "q_graph_link_pred" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val cand = edges.as("e1").join(edges.as("e2"),
          col("e1.dst") === col("e2.src") && col("e1.src") < col("e2.dst"))
        .select(col("e1.src").as("a"), col("e2.dst").as("c"))
        .groupBy(col("a"), col("c")).agg(count(lit(1)).as("cn"))
        .join(pr, col("a") === col("ia") && col("c") === col("ib"), "left_anti")
      cand
        .join(deg.select(col("src").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("src").as("c"), col("deg").as("dc")), Seq("c"))
        .select(col("a"), col("c"), col("cn"), col("da"), col("dc"),
          expr("(cn * 1000000L) div (da + dc - cn)").as("jaccard_ppm"))
        .orderBy(col("cn").desc, col("a"), col("c")).limit(20)
    }),

    // Class-balanced downsampling — equalize every label to the
    // MINORITY class size with a deterministic md5 order: the
    // imbalance fix applied before classifier training. The per-class
    // quota is the one collected scalar (bounded driver state, the
    // kmeans-centroid pattern); selection runs through the NATIVE
    // TopKPerKey operator — partial per-partition heaps below the
    // label exchange, so at most k rows per label per partition
    // shuffle, never a full per-label sort. Output proves selection
    // identity via count + id-sum checksums per label.
    "q_sample_balanced" -> ((s, dir) => {
      val lab = t(s, dir, "embeddings")
        .groupBy(col("label")).agg(count(lit(1)).as("n_orig"))
      val minN = lab.agg(min(col("n_orig"))).head().getLong(0).toInt
      val ranked = t(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          md5(col("vec_id").cast("string")).as("hkey"))
      graft.functions.TopK.topKPerKey(ranked, minN,
          Seq(col("label")), Seq(col("hkey").asc, col("vec_id").asc))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("kept_sum"))
        .join(broadcast(lab), Seq("label"))
        .select(col("label").cast("long").as("label"), col("n_orig"),
          col("n_kept"), col("kept_sum"))
        .orderBy(col("label"))
    }),

    // graph 5 — multi-source BFS shortest-path distance: hop distance
    // from the seed set (vertices with doc_id < 50) to every vertex
    // within 4 hops over the near-dup graph. The missing primitive
    // between khop (neighborhood SIZES) and resolve (components):
    // actual distances, the basis of graph sampling radii and
    // influence features. Frontier expansion is one equi-join of the
    // current distance table with the edge list plus a min-agg per
    // round — BFS layers are monotone (a node's first recorded
    // distance IS its minimum), so a round that adds no node is the
    // fixed point and the early exit returns exactly the oracle's
    // 4-round unroll. localCheckpoint per round (checkpoint-cadence
    // rule); everything shards by vertex at 100 TB.
    "q_graph_sssp" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
        .localCheckpoint(true)
      var dist = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .filter(col("node") < 50).distinct()
        .select(col("node"), lit(0L).as("dist"))
        .localCheckpoint(true)
      var n = dist.count()
      var converged = false
      for (_ <- 1 to 4 if !converged) {
        val cand = dist.join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
        val prev = dist
        dist = dist.select(col("node"), col("dist")).union(cand)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
        val n2 = dist.count()
        converged = n2 == n
        n = n2
        prev.unpersist()
      }
      dist.select(col("node").as("doc_id"), col("dist"))
        .orderBy(col("doc_id"))
    }),

    // Hopping (sliding) time windows in batch — 10-minute windows
    // sliding every 5: Spark's window() generator assigns each event
    // to its size/slide overlapping windows via an Expand (2 rows per
    // event here), then one partial+final hash agg per (window, type).
    // The batch twin of the streaming windowed aggregation, and the
    // standard rate/rolling-metric shape at 100 TB (shuffle is keyed by
    // window start × type, partial aggs collapse map-side).
    "q_window_hopping" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "600 seconds", "300 seconds"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_cents"))
        .orderBy(col("win_start"), col("event_type"))),

    // Winsorized mean — robust location estimate per event type: clamp
    // at the exact p10/p90 (ceil-rank on the unique (value, event_id)
    // order — engine-identical), then an exact integer mean. Two
    // windows over the same partition order + one join back + one hash
    // agg; the robust-stats companion to q_events_outliers' IQR fences.
    "q_events_winsorized" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"), col("event_id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("c"), col("event_id"))))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val q = d
        .withColumn("isP10", col("rn") === expr("(cnt + 9) div 10"))
        .withColumn("isP90", col("rn") === expr("(9 * cnt + 9) div 10"))
        .groupBy(col("event_type"))
        .agg(min(when(col("isP10"), col("c"))).as("p10"),
          min(when(col("isP90"), col("c"))).as("p90"))
      d.join(q, Seq("event_type"))
        .select(col("event_type"), col("p10"), col("p90"),
          greatest(col("p10"), least(col("p90"), col("c"))).as("wc"))
        .groupBy(col("event_type"), col("p10"), col("p90"))
        .agg(count(lit(1)).as("n"), sum(col("wc")).as("sum_w"))
        .select(col("event_type"), col("n"), col("p10"), col("p90"),
          col("sum_w"), expr("sum_w div n").as("mean_w"))
        .orderBy(col("event_type"))
    }),

    // LM-score quality filter — per-document bigram surprisal under the
    // corpus's own language model (the CCNet-style "how unusual is this
    // text" signal that ranks documents for curation): the corpus
    // bigram/context tables are two hash aggs, each document's bigrams
    // join the model on (w1, w2) — an equi-join sharded by bigram hash
    // at 100 TB — and the per-occurrence surprisal is the EXACT integer
    // floor(log2(tot/cnt)) via binary-string length (no libm, the
    // file's determinism rule). High mean surprisal = rare
    // constructions; low = boilerplate-like.
    "q_text_lm_surprisal" -> ((s, dir) => {
      val docPairs = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(tk) - 1),
             i -> struct(element_at(tk, i) as w1, element_at(tk, i + 1) as w2))"""))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val big = docPairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      val tot = big.groupBy(col("w1")).agg(sum(col("cnt")).as("tot"))
        .withColumnRenamed("w1", "tw1")
      val model = big.join(tot, col("w1") === col("tw1"))
        .select(col("w1").as("mw1"), col("w2").as("mw2"),
          (length(expr("bin(tot div cnt)")) - 1).cast("long").as("surprisal"))
      docPairs.join(model,
          col("w1") === col("mw1") && col("w2") === col("mw2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surprisal")).as("sum_surprisal"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_surprisal"),
          expr("(sum_surprisal * 1000000L) div n_bigrams").as("mean_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Semantic dedup (SemDeDup) — cluster the embedding space with the
    // (memoized) seeded k-means fit, then keep ONE representative per
    // cluster: the vector closest to its centroid (dist, vec_id
    // tie-break). The embedding-space analog of the survivor-selection
    // step in q_dedup_resolve: assignment is a broadcast join against
    // k centroid rows, survivor pick is a bounded per-cluster window —
    // at 100 TB both shard by cluster id with no driver state beyond
    // the k×64 centroid matrix.
    "q_dedup_semantic" -> ((s, dir) => {
      val fit = kmeansFit(s, dir)
      fit
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cid")).orderBy(col("dist"), col("vec_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cid"))))
        .filter(col("rn") === 1)
        .select(col("cid"), col("vec_id").as("survivor"), col("dist"),
          col("n").cast("long").as("n_members"))
        .orderBy(col("cid"))
    }),

    // MinHash calibration — estimated vs EXACT Jaccard on every LSH
    // candidate pair (the sketch-quality report that decides band/row
    // settings before a 100 TB dedup run): per-band min-hash agreement
    // gives the estimate (8 bands → n_agree/8), the exact value comes
    // from the token-set intersection, and the per-pair error is the
    // calibration surface. Every step is an equi-join (sig buckets,
    // token hash) over the bounded doc subset — no all-pairs anywhere.
    "q_dedup_minhash_eval" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      val sigs = toks.withColumn("band", explode(sequence(lit(0), lit(7))))
        .groupBy(col("doc_id"), col("band"))
        .agg(min(md5(concat(col("band").cast("string"), lit(":"), col("tok")))).as("sig"))
      val cands = sigs.as("a").join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib")).distinct()
      val agree = cands.join(sigs.as("sa"), col("ia") === col("sa.doc_id"))
        .join(sigs.as("sb"),
          col("ib") === col("sb.doc_id") && col("sa.band") === col("sb.band"))
        .groupBy(col("ia"), col("ib"))
        .agg(count(when(col("sa.sig") === col("sb.sig"), 1)).as("n_agree"))
      val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = toks.as("x").join(toks.as("y"),
          col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("ia"), col("y.doc_id").as("ib"))
        .agg(count(lit(1)).as("inter"))
      // every LSH candidate shares a band min-hash → shares that token
      // → has inter >= 1, so the inner join below is lossless
      agree.join(inter, Seq("ia", "ib"))
        .join(sizes.select(col("doc_id").as("ia"), col("sz").as("sza")), Seq("ia"))
        .join(sizes.select(col("doc_id").as("ib"), col("sz").as("szb")), Seq("ib"))
        .select(col("ia"), col("ib"), col("n_agree"),
          expr("(n_agree * 1000000L) div 8").as("est_ppm"),
          expr("(inter * 1000000L) div (sza + szb - inter)").as("exact_ppm"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
        .orderBy(col("ia"), col("ib"))
    }),

    // Token-distribution entropy per source — the corpus-diversity
    // report (a low-entropy source is boilerplate; mixture weighting
    // reads this next to q_sample_mixture): per-(source, token) counts,
    // then total surprisal bits with the EXACT integer floor(log2)
    // trick — two partial+final hash aggs and one equi-join, sharded by
    // source/token at any scale.
    "q_agg_entropy" -> ((s, dir) => {
      val cnts = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = cnts.groupBy(col("source"))
        .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_distinct"))
      cnts.join(tot, Seq("source"))
        .select(col("source"), col("tot"), col("n_distinct"),
          (col("cnt") * (length(expr("bin(tot div cnt)")) - 1).cast("long")).as("bits"))
        .groupBy(col("source"), col("tot"), col("n_distinct"))
        .agg(sum(col("bits")).as("sum_bits"))
        .select(col("source"), col("tot"), col("n_distinct"), col("sum_bits"),
          expr("(sum_bits * 1000000L) div tot").as("mean_bits_ppm"))
        .orderBy(col("source"))
    }),

    // CUSUM change-point detection per event type — the metric-drift
    // monitor every telemetry pipeline runs. The clamped recursion
    // S_i = max(0, S_{i-1} + (x_i - k)) is NOT a prefix sum, but it
    // equals P_i - min(0, min_{j<=i} P_j) where P is the plain prefix
    // sum of deviations — two stock window frames, no recursion, no
    // UDAF, fully codegen'd. All-integer (cents; k is the exact
    // floor-div per-type mean, values are non-negative so Spark `div`
    // and DuckDB `//` agree), so the statistic is bit-exact and
    // order-independent. Alarm when S crosses h = 200000 cents.
    "q_events_cusum" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
      val k = e.groupBy(col("event_type"))
        .agg(expr("sum(c) div count(*)").as("k"))
      val ord = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.join(broadcast(k), Seq("event_type"))
        .withColumn("p", sum(col("c") - col("k")).over(ord))
        .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(ord)))
        .select(col("event_type"), col("event_id"), col("s"),
          when(col("s") > 200000L, 1L).otherwise(0L).as("alarm"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Nearest-event temporal join (the bidirectional as-of): for every
    // error, the same-user click closest in time — EITHER direction —
    // tie broken toward the earlier click. A per-user equi-join (clicks
    // per user are bounded; the measured-skew salted recipe in
    // q_join_skew_salted covers the hot-key case), then one bounded
    // window picks the argmin. Backward-only as-of lives in q_asof_join;
    // this is the "closest reading to the incident" sensor-fusion shape.
    "q_join_asof_nearest" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val errs = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts").cast("timestamp")).as("err_ms"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"),
          unix_millis(col("ts").cast("timestamp")).as("click_ms"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("gap_ms"), col("click_ms"))
      errs.join(clicks, col("user_id") === col("cu"))
        .withColumn("gap_ms", abs(col("err_ms") - col("click_ms")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("click_ms"), col("gap_ms"))
        .orderBy(col("event_id"))
    }),

    // Interval-overlap join via coarse-bucket banding — the generic
    // range-join decomposition: each (user, type) activity interval
    // [first ts, last ts] is exploded onto the WEEK buckets it covers,
    // candidates meet through a plain (user, week) equi-join (shuffle
    // join, never a cartesian), the exact overlap predicate verifies,
    // and multi-bucket hits collapse with distinct. Bucket width trades
    // replication against candidate precision; the predicate keeps the
    // result exact for any width.
    "q_join_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("ts_s"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts_s")).as("lo"), max(col("ts_s")).as("hi"))
      val banded = iv.select(col("user_id"), col("event_type"), col("lo"), col("hi"),
        explode(sequence(expr("lo div 604800"), expr("hi div 604800"))).as("wk"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.wk") === col("b.wk") &&
            col("a.event_type") < col("b.event_type") &&
            col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
        .select(col("a.user_id").as("user_id"),
          col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          (least(col("a.hi"), col("b.hi")) - greatest(col("a.lo"), col("b.lo"))).as("overlap_s"))
        .distinct()
        .orderBy(col("user_id"), col("type_a"), col("type_b"))
    }),

    // TPC-H Q18 shape (large-volume customers): the IN-subquery over an
    // aggregated-HAVING relation — Catalyst rewrites it to a semi join
    // against the grouped lineitem, never a per-row re-scan. Quantities
    // integerized (TPC-H quantities are whole numbers shipped as
    // DOUBLE), price carried in exact cents, and the LIMIT made
    // deterministic with an orderkey tiebreak.
    "q_tpch_q18" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v18")
      t(s, dir, "orders").createOrReplaceTempView("orders_v18")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v18")
      s.sql(
        """SELECT c_name, c_custkey, o_orderkey,
          |       date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
          |       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
          |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
          |FROM customer_v18 c
          |JOIN orders_v18 o ON c.c_custkey = o.o_custkey
          |JOIN lineitem_v18 l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem_v18
          |                       GROUP BY l_orderkey
          |                       HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
          |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
          |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin)
    }),

    // Merkle-style replica anti-entropy: two table versions reconcile by
    // exchanging ONE fingerprint row per bucket (sum of portable md5 row
    // hashes + count), then re-scanning ONLY the buckets whose
    // fingerprints disagree to name the divergent rows. At 100 TB the
    // fingerprint pass ships O(buckets), the repair pass ships O(dirty
    // data) — never the whole table. Replica B is derived in-query by
    // deterministic mutation (delete event_id%997==0, bump the cents of
    // event_id%1009==0), so the expected diff is known and the oracle
    // recomputes the identical protocol.
    "q_replica_diff" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), cents(col("value")).as("c"))
      val repB = base.filter(col("event_id") % 997 =!= 0)
        .withColumn("c", col("c") +
          when(col("event_id") % 1009 === 0, 1L).otherwise(0L))
      def hashed(df: DataFrame): DataFrame = df
        .withColumn("bucket", col("user_id") % 64)
        .withColumn("rh", conv(substring(md5(concat(
          col("event_id").cast("string"), lit(":"), col("c").cast("string"))),
          1, 8), 16, 10).cast("long"))
      val fa = hashed(base)
      val fb = hashed(repB)
      // xor-fold, not sum: order-independent like sum but immune to
      // silent long wrap at any row count (the q_agg_corr lesson)
      val sa = fa.groupBy(col("bucket"))
        .agg(expr("bit_xor(rh)").as("fp_a"), count(lit(1)).as("n_a"))
      val sb = fb.groupBy(col("bucket"))
        .agg(expr("bit_xor(rh)").as("fp_b"), count(lit(1)).as("n_b"))
      val dirty = sa.join(sb, Seq("bucket"), "left")
        .filter(col("fp_a") =!= coalesce(col("fp_b"), lit(-1L)) ||
          col("n_a") =!= coalesce(col("n_b"), lit(0L)))
        .select(col("bucket"))
      val da = fa.join(broadcast(dirty), Seq("bucket"), "left_semi")
      val db = fb.join(broadcast(dirty), Seq("bucket"), "left_semi")
        .select(col("event_id").as("eb"), col("rh").as("rhb"))
      da.join(db, col("event_id") === col("eb"), "left")
        .filter(col("rhb").isNull || col("rhb") =!= col("rh"))
        .select(col("bucket"), col("event_id"),
          when(col("rhb").isNull, lit("missing_in_b"))
            .otherwise(lit("changed")).as("status"))
        .orderBy(col("bucket"), col("event_id"))
    }),

    // Distribution-drift monitor: per event type, the value distribution
    // of the LATE time half vs the EARLY half over 10 clamped equi-width
    // cent bins, deviations in exact integer ppm and an L1 drift score
    // per type — the data-drift check every feature/training pipeline
    // runs between ingestion waves. The per-type midpoint table
    // broadcasts back over the fact scan; everything after the two
    // grouped counts runs on k×10 rows.
    "q_events_drift" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
      val bounds = e.groupBy(col("event_type"))
        .agg(expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
      val counts = e.join(broadcast(bounds), Seq("event_type"))
        .withColumn("half",
          when(col("ts_s") <= col("mid"), lit("early")).otherwise(lit("late")))
        .withColumn("bin", expr("least(c div 5000, CAST(9 AS BIGINT))"))
        .groupBy(col("event_type"), col("half"), col("bin"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("event_type"), col("half"))
        .agg(sum(col("n")).as("tot"))
      def ppm(h: String): DataFrame = counts.filter(col("half") === h)
        .join(totals.filter(col("half") === h), Seq("event_type", "half"))
        .select(col("event_type"), col("bin"),
          expr("n * 1000000L div tot").as(s"ppm_$h"))
      val grid = counts.select(col("event_type")).distinct()
        .withColumn("bin", explode(sequence(lit(0L), lit(9L))))
      grid.join(ppm("early"), Seq("event_type", "bin"), "left")
        .join(ppm("late"), Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("ppm_early", "ppm_late"))
        .withColumn("dev_ppm", abs(col("ppm_late") - col("ppm_early")))
        .withColumn("drift_ppm",
          sum(col("dev_ppm")).over(Window.partitionBy(col("event_type"))))
        .orderBy(col("event_type"), col("bin"))
    }),

    // Pareto-skyline curation: the documents not dominated in
    // (length, lexical-diversity) — "keep what is long OR unusually
    // diverse for its length", the multi-objective filter a curation
    // pass runs instead of two independent thresholds. Scalable
    // decomposition: ONE hash agg collapses the corpus to its best
    // diversity per distinct length (bounded), the strict-dominance
    // test is a value-RANGE window over that aggregated frame only
    // (never a self-join, never a sort of the raw corpus), and a final
    // equi-join back recovers the winning docs. The quadratic
    // NOT-EXISTS oracle proves the decomposition exact, ties included
    // (equal points don't dominate each other).
    "q_docs_skyline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        expr("size(array_distinct(split(text, ' '))) * 1000000L" +
          " div greatest(size(split(text, ' ')), 1)").as("uniq_ppm"))
      val best = d.groupBy(col("n_chars")).agg(max(col("uniq_ppm")).as("q"))
      val wLarger = Window.orderBy(col("n_chars").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val frontier = best
        .withColumn("max_larger", max(col("q")).over(wLarger))
        .filter(col("max_larger").isNull || col("max_larger") < col("q"))
        .select(col("n_chars"), col("q").as("uniq_ppm"))
      d.join(frontier, Seq("n_chars", "uniq_ppm"))
        .select(col("doc_id"), col("n_chars"), col("uniq_ppm"))
        .orderBy(col("n_chars").desc, col("doc_id"))
    }),

    // HLL set algebra: the distinct-user sketches of two event types
    // UNION by per-register max (the merge HLL is mergeable under) and
    // INTERSECT by inclusion-exclusion over the three estimates — the
    // sketch-side overlap report ("how many users do both?") that never
    // re-touches raw data once the 64-register sketches exist. Same
    // portable md5 registers as q_text_distinct_hll, so every register
    // and estimate is bit-identical in the oracle.
    "q_sketch_hll_setops" -> ((s, dir) => {
      val rho = t(s, dir, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_type").as("k"),
          conv(substring(md5(col("user_id").cast("string")), 1, 14), 16, 10)
            .cast("long").as("h"))
        .select(col("k"), (col("h") % 64).as("bucket"), expr("shiftright(h, 6)").as("w"))
        .select(col("k"), col("bucket"),
          when(col("w") === 0, lit(51))
            .otherwise(lit(51) - length(conv(col("w"), 10, 2))).cast("int").as("rho"))
      val regs = s.range(0, 64).toDF("bucket")
        .join(rho.groupBy(col("bucket")).agg(
          max(when(col("k") === "click", col("rho"))).as("ra"),
          max(when(col("k") === "error", col("rho"))).as("rb")), Seq("bucket"), "left")
        .select(coalesce(col("ra"), lit(0)).as("ra"),
          coalesce(col("rb"), lit(0)).as("rb"))
        .withColumn("ru", greatest(col("ra"), col("rb")))
      def est(c: org.apache.spark.sql.Column) =
        lit(0.709) * lit(64) * lit(64) * lit(2251799813685248.0) /
          sum(expr(s"shiftleft(cast(1 as bigint), 51 - ${c.toString})"))
      regs.agg(
          round(est(col("ra")), 3).as("est_click"),
          round(est(col("rb")), 3).as("est_error"),
          round(est(col("ru")), 3).as("est_union"))
        .withColumn("est_intersect",
          round(col("est_click") + col("est_error") - col("est_union"), 3))
    }),

    // Temperature-0.5 mixture weights: per-source sampling weight
    // proportional to sqrt(token share) relative to the largest source
    // — the multilingual/multi-source rebalancing exponent LLM corpora
    // train with. Exact cross-engine: the operand is ONE integer
    // (tokens·10^12 div max), int→double conversion and sqrt are both
    // IEEE-exactly-rounded, floor pins the ppm. Window max runs over
    // the k-row aggregated frame only.
    "q_sample_temperature" -> ((s, dir) => {
      val tok = t(s, dir, "documents").groupBy(col("source"))
        .agg(sum(expr("size(split(text, ' '))")).as("tokens"))
      tok.withColumn("tmax", max(col("tokens")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("source"), col("tokens"),
          // share scaled in decimal(38,0) — no long wrap however many
          // tokens a 100 TB source holds (the q_agg_corr lesson); the
          // div result is ≤ 10^12 so the down-cast back to long and the
          // int→double conversion stay exact
          floor(sqrt(expr("CAST(CAST(CAST(tokens AS DECIMAL(38,0)) * 1000000000000" +
            " div CAST(tmax AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)")))
            .cast("long").as("weight_ppm"))
        .orderBy(col("source"))
    }),

    // DSIR-shaped data selection (Xie et al. 2023, "Data Selection via
    // Importance Resampling"): score every raw document by how much its
    // hashed-feature profile looks like a target corpus (here the 'en'
    // slice), then take the top-100. Features are md5-hashed unigrams
    // folded into 64 buckets; each bucket's importance is the exact
    // integer lift (t_f/T)/(r_f/R) in ppm — decimal(38,0) products so
    // nothing wraps at any corpus size, ONE integral division per
    // bucket (the libm-free analog of DSIR's log-ratio; log is monotone
    // in each factor so per-bucket ranking is preserved, and the
    // summed-lift score is a deterministic integer on both engines).
    // The 64-row lift table broadcasts; the per-doc pass is one hash
    // agg + broadcast join — O(tokens) end to end, no driver state.
    "q_sample_importance" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("f", conv(substring(md5(col("tok")), 1, 8), 16, 10)
          .cast("long") % 64)
      val raw = toks.groupBy(col("f")).agg(count(lit(1)).as("r_f"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy(col("f")).agg(count(lit(1)).as("t_f"))
      val lifts = raw.join(tgt, Seq("f"), "left")
        .withColumn("t_f", coalesce(col("t_f"), lit(0L)))
        .crossJoin(broadcast(raw.agg(sum(col("r_f")).as("r_tot"))))
        .crossJoin(broadcast(tgt.agg(sum(col("t_f")).as("t_tot"))))
        .withColumn("lift_ppm", expr(
          """CAST((CAST(t_f AS DECIMAL(38,0)) * r_tot * 1000000)
            |  div (CAST(r_f AS DECIMAL(38,0)) * t_tot) AS BIGINT)""".stripMargin))
        .select(col("f"), col("lift_ppm"))
      toks.groupBy(col("doc_id"), col("f")).agg(count(lit(1)).as("c_f"))
        .join(broadcast(lifts), Seq("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c_f")).as("n_toks"),
          sum(col("c_f") * col("lift_ppm")).as("score_raw"))
        .select(col("doc_id"), col("n_toks"),
          expr("score_raw div n_toks").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .limit(100)
    }),

    // similarity 5 — PRODUCT QUANTIZATION encode (IVF-PQ's residual
    // half): 64-dim vectors split into M=4 subspaces × 16 dims; per
    // subspace an 8-entry codebook (deterministic sample: the 8 lowest
    // vec_ids — the random-init codebook of a PQ trainer before Lloyd
    // refinement), every vector encoded to its nearest codeword per
    // subspace by EXACT integer squared L2 (argmin via min(struct),
    // ties → lowest code). Output is the codebook utilization +
    // total quantization error per (subspace, code) cell. Scale shape:
    // the M×K codebook (32 rows) broadcasts, vectors stream through
    // ONE hash join after a bounded ×M explode — this is the encode
    // pass that turns 100 TB of float32 embeddings into 4-byte codes
    // (64× compression) with zero shuffles of the vector payload.
    "q_ann_pq" -> ((s, dir) => {
      val (subs, codebook) = pqSubs(s, dir)
      subs.join(broadcast(codebook), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"), pqSqDist.as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d2"), col("code"))).as("best"))
        .groupBy(col("sub").cast("long").as("sub"),
          col("best.code").cast("long").as("code"))
        .agg(count(lit(1)).as("n"), sum(col("best.d2")).as("sum_err"))
        .orderBy(col("sub"), col("code"))
    }),

    // similarity 5b — ADC search over the PQ codes (asymmetric distance
    // computation): each query precomputes a |Q|×M×K lookup table of
    // exact subspace distances to every codeword, and candidate
    // distances are then LUT sums over the 4-byte codes — the raw
    // vectors are NEVER touched after encode. Scale shape: the encode
    // output (codes) is the only corpus-sized input (4 bytes/vector
    // instead of 256), the 320-row LUT broadcasts, and top-k is one
    // bounded window per query. This is how 100 TB of embeddings gets
    // searched from ~1.5 TB of codes.
    "q_ann_adc" -> ((s, dir) => adcSearch(s, dir, pqSubs(s, dir)._2)),

    // similarity 5c — PQ codebook TRAINING: the Lloyd-refined encode.
    // Same output shape as q_ann_pq (codebook utilization + total
    // quantization error per cell), but against codebooks refined by 3
    // distributed Lloyd iterations per subspace (all four subspaces
    // share each iteration's broadcast-join assignment and (sub, code,
    // dim) update agg). AnnSpec asserts the refinement strictly cuts
    // total quantization error and lifts ADC recall vs the unrefined
    // sample codebook; the DuckDB oracle replays the identical
    // iterations as an unrolled CTE chain (exact integer distances,
    // floored-mean updates — bit-reproducible).
    // similarity 6 — top principal direction by distributed power
    // iteration (see powerIterTop): the PCA-lite every embedding
    // pipeline runs before whitening / ABQ-style binarization. The
    // corpus is touched ONCE (Gram agg); 3 exact-BigInt driver
    // iterations on the 64×64 matrix; output is the ±1000-scaled
    // direction, bit-reproducible against the oracle's unrolled
    // HUGEINT CTE replay.
    "q_embed_power_iter" -> ((s, dir) => powerIterTop(s, dir)),

    "q_ann_pq_lloyd" -> ((s, dir) => {
      val (subs, _) = pqSubs(s, dir)
      subs.join(broadcast(pqLloydCodebook(s, dir)), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("code"), pqSqDist.as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d2"), col("code"))).as("best"))
        .groupBy(col("sub").cast("long").as("sub"),
          col("best.code").cast("long").as("code"))
        .agg(count(lit(1)).as("n"), sum(col("best.d2")).as("sum_err"))
        .orderBy(col("sub"), col("code"))
    }),

    // sequence pattern matching (MATCH_RECOGNIZE-lite): serialize each
    // user's time-ordered event stream to an initials string (c/e/p/s/v
    // are distinct) inside ONE hash agg — array_sort over (ts,
    // event_id, char) structs keeps the order total without a window —
    // then count non-overlapping signup→view+→purchase runs with a
    // left-to-right regex scan (identical greedy semantics in both
    // engines). Per-user state is one bounded string; nothing global.
    "q_events_pattern" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws("", expr(
          """transform(array_sort(collect_list(
            |  struct(ts, event_id, substring(event_type, 1, 1) AS c))), x -> x.c)"""
            .stripMargin)).as("seq"))
        .select(col("user_id"), length(col("seq")).cast("long").as("seq_len"),
          size(expr("regexp_extract_all(seq, 'sv+p', 0)")).cast("long").as("n_matches"))
        .filter(col("n_matches") >= 1)
        .orderBy(col("user_id"))
    }),

    // epoch reshuffle decorrelation — two seeded md5 permutations of
    // the corpus into 16 shards (epoch 1 vs epoch 2) and the 16×16
    // shard contingency matrix between them: the check that consecutive
    // training epochs actually decorrelate batch composition. One scan,
    // one hash agg; the permutation is pure column math, so at 100 TB
    // this is exactly the deterministic global-shuffle write pass
    // (hash key → shard → sort-within-shard) with zero driver state.
    "q_sample_epochs" -> ((s, dir) => {
      def shard(seed: Int) =
        conv(substring(md5(concat(lit(s"$seed:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 16
      t(s, dir, "documents")
        .select(col("doc_id"), shard(1).as("shard_e1"), shard(2).as("shard_e2"))
        .groupBy(col("shard_e1"), col("shard_e2"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
        .orderBy(col("shard_e1"), col("shard_e2"))
    }),

    // dedup 12 — INCREMENTAL MinHash LSH: the ingest-time shape. The
    // standing corpus (doc_id % 5 != 0) owns a band-signature index
    // that at production scale is PRECOMPUTED and stored (here derived
    // in-query so the oracle can replay it); a new wave (doc_id % 5 =
    // 0) computes signatures for ITS documents only and probes the
    // index with one hash join on (band, sig) — O(wave), never
    // O(corpus), per ingest. Output: each wave doc that collides with
    // the corpus, how many of its 8 bands hit, and the lowest-id
    // corpus doc it collides with.
    "q_dedup_incremental" -> ((s, dir) => {
      val sigs = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("band", explode(sequence(lit(0), lit(7))))
        .groupBy(col("doc_id"), col("band"))
        .agg(min(md5(concat(col("band").cast("string"), lit(":"), col("tok")))).as("sig"))
      val base = sigs.filter(col("doc_id") % 5 =!= 0)
        .select(col("band"), col("sig"), col("doc_id").as("base_doc"))
      sigs.filter(col("doc_id") % 5 === 0).as("w")
        .join(base, Seq("band", "sig"))
        .groupBy(col("w.doc_id").as("doc_id"))
        .agg(countDistinct(col("band")).as("n_bands_hit"),
          min(col("base_doc")).as("first_match"))
        .orderBy(col("doc_id"))
    }),

    // sequence mining — first-order Markov transition counts over each
    // user's time-ordered event stream (lead window, tie-broken by
    // event_id), with an exact integer-ppm row-conditional P(dst|src).
    // One window pass partitioned by user + one hash agg — nothing
    // global except the final 5×5-ish transition matrix.
    "q_events_markov" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .withColumn("ppm", expr("(n * 1000000) div sum(n) over (partition by src)"))
        .orderBy(col("src"), col("dst"))
    }),

    // text diversity — distinct-n: per source, total vs distinct word
    // trigrams and the exact integer-ppm distinct ratio (the standard
    // mode-collapse / templated-content signal for corpus curation).
    // Grams are built by the same bounded transform(sequence) as
    // q_dedup_spans; the agg is one partial+final count-distinct.
    "q_text_distinct_ngrams" -> ((s, dir) => {
      val k = 3
      t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= k)
        .select(col("source"), expr(
          s"explode(transform(sequence(0, size(l) - $k), x -> concat_ws(' ', slice(l, x + 1, $k))))")
          .as("gram"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"), countDistinct(col("gram")).as("n_distinct"))
        .select(col("source"), col("n_grams"), col("n_distinct"),
          expr("(n_distinct * 1000000) div n_grams").as("diversity_ppm"))
        .orderBy(col("source"))
    }),

    // market-basket mining — co-occurring part pairs within orders,
    // with exact integer-ppm lift. The pair join is an equi self-join
    // on the order key, so blowup is bounded by basket size (~7), not
    // corpus size; per-part supports and the order count ride along as
    // broadcast aggregates; the lift numerator goes through
    // DECIMAL(38,0) so it cannot wrap at any SF (the q_agg_corr
    // lesson). Top-100 by support keeps the output bounded.
    "q_basket_pairs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val tot = li.groupBy(col("pk")).agg(count(lit(1)).as("s"))
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .join(tot.select(col("pk").as("p1"), col("s").as("s1")), Seq("p1"))
        .join(tot.select(col("pk").as("p2"), col("s").as("s2")), Seq("p2"))
        .crossJoin(broadcast(
          li.select(col("ok")).distinct().agg(count(lit(1)).as("n_orders"))))
        .select(col("p1"), col("p2"), col("support"), expr(
          "CAST((CAST(support AS DECIMAL(38,0)) * n_orders * 1000000) div (CAST(s1 AS DECIMAL(38,0)) * s2) AS BIGINT)")
          .as("lift_ppm"))
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(100)
    }),

    // retrieval — multi-term AND via postings intersection: the 3
    // globally most frequent tokens (deterministic tie-break) become
    // the conjunctive query; a document qualifies when it holds ALL
    // three. The 3-row term set broadcasts into the postings stream
    // and the intersection is one hash agg with a HAVING — the
    // term-at-a-time AND plan of a search engine, never a per-doc
    // rescan.
    "q_text_search_and" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val top3 = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(3).select(col("tok"))
      toks.join(broadcast(top3), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).as("n_terms"), count(lit(1)).as("tf_sum"))
        .filter(col("n_terms") === 3)
        .select(col("doc_id"), col("tf_sum"))
        .orderBy(col("doc_id"))
    }),

    // data-quality — referential-integrity audit across the star
    // schema: each child-parent relation is ONE left join against the
    // distinct parent key set with a null-hit count (semantically a
    // NOT EXISTS scan, but returning child totals in the same pass).
    // At 100 TB each audit is a single shuffle-or-broadcast equi join;
    // the report itself is 3 rows.
    "q_quality_fk" -> ((s, dir) => {
      def audit(rel: String, child: DataFrame, key: Column,
          parent: DataFrame, pkey: Column): DataFrame =
        child.select(key.as("k"))
          .join(parent.select(pkey.as("k")).distinct().withColumn("hit", lit(1)),
            Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("hit").isNull, 1).otherwise(0)).cast("long").as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"))
      audit("events.user_id->customer", t(s, dir, "events"), col("user_id"),
          t(s, dir, "customer"), col("c_custkey"))
        .unionAll(audit("lineitem->orders", t(s, dir, "lineitem"), col("l_orderkey"),
          t(s, dir, "orders"), col("o_orderkey")))
        .unionAll(audit("orders->customer", t(s, dir, "orders"), col("o_custkey"),
          t(s, dir, "customer"), col("c_custkey")))
        .orderBy(col("relation"))
    }),

    // table maintenance — compaction PLANNER: pack 64 bucket extents
    // into ~8 target output files by cumulative-size assignment
    // (before-sum div target). The plan runs entirely on manifest-
    // level metadata (64 rows — the single-partition window is over
    // the plan, not the data), which is exactly how a 100 TB
    // compaction pass must be scheduled: plan on metadata, rewrite
    // only the assigned extents.
    "q_table_compact_plan" -> ((s, dir) => {
      val b = t(s, dir, "documents")
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 64)
        .groupBy(col("bucket")).agg(sum(col("n_chars")).as("bytes"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      b.crossJoin(broadcast(b.agg(sum(col("bytes")).as("tb"))))
        .withColumn("before", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("out_file", expr("before div ((tb + 7) div 8)"))
        .groupBy(col("out_file"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("bytes")).as("bytes"))
        .orderBy(col("out_file"))
    }),

    // relational reshape — native UNPIVOT (wide → long): the inverse of
    // q_pivot_types, using Dataset.unpivot so Catalyst plans an Expand
    // (one pass, no per-measure self-union). Measures are exact
    // integers so the long `value` column is engine-portable.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          sum(cents(col("l_discount"))).as("sum_disc_c"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price_c"), col("sum_disc_c")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // ── privacy-audit family ─────────────────────────────────────────

    // k-anonymity / l-diversity audit — the pre-release privacy gate a
    // training corpus runs before distribution: group documents by
    // their quasi-identifier tuple (lang, 100-char length bucket) and
    // report each equivalence class's size (the k) and its count of
    // distinct sensitive values (the l; here: source). A class below
    // k=5 or carrying a single sensitive value re-identifies. ONE
    // partial+final hash agg sharded by the quasi tuple — the audit
    // costs one shuffle at any corpus size.
    "q_privacy_kanon" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), expr("n_chars div 100").as("len_bucket"),
          col("source"))
        .groupBy(col("lang"), col("len_bucket"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("source")).as("n_sensitive"))
        .select(col("lang"), col("len_bucket"), col("class_size"),
          col("n_sensitive"),
          when(col("class_size") >= 5, 1).otherwise(0).as("k_anon"),
          when(col("n_sensitive") >= 2, 1).otherwise(0).as("l_diverse"))
        .orderBy(col("lang"), col("len_bucket"))
    }),

    // ε-differentially-private histogram via the GEOMETRIC mechanism
    // (the discrete optimal mechanism, Ghosh et al.) at ε = ln 2: the
    // per-cell noise is two-sided geometric with p = 1/2, drawn by
    // EXACT dyadic inverse-CDF — magnitude = floor(−log2 u) over a
    // 19-bit md5-derived uniform u = (h+1)/2^19, computed with pure
    // integer arithmetic via floor(log2(a/b)) = len(bin(a div b)) − 1
    // (a valid identity for integral a, b ≥ 1); sign from the 20th
    // bit — so the release is reproducible (seeded) and the oracle
    // replays the identical draw with no floating-point log anywhere.
    // P(|noise| = j) = 2^−(j+1) exactly for j ≤ 18 (QueryPropsSpec
    // enumerates all 2^20 draws). The true count stays in the output
    // because this query AUDITS the mechanism (per-cell noise
    // realization and scale), it is not the release itself.
    "q_privacy_dp_hist" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("h20",
          conv(substring(md5(col("source")), 1, 5), 16, 10).cast("long"))
        .withColumn("mag",
          (length(expr("bin(524288 div ((h20 div 2) + 1))")) - 1).cast("long"))
        .withColumn("noise",
          when(pmod(col("h20"), lit(2L)) === 1, col("mag"))
            .otherwise(-col("mag")))
        .select(col("source"), col("n_docs"), col("noise"),
          (col("n_docs") + col("noise")).as("dp_count"))
        .orderBy(col("source"))
    }),

    // ── corpus-law statistics ────────────────────────────────────────

    // Zipf decade slope — the corpus-law check: token frequency should
    // halve (roughly) every time rank doubles, so the OLS slope of
    // floor(log2 freq) on floor(log2 rank) over a source's ranked
    // vocabulary sits near −1 for natural text and near 0 for
    // templated/boilerplate sources. Both axes integerize via the
    // exact bin()-length log2 (no libm), the five OLS sums accumulate
    // as decimals, and the slope is ONE double division rounded — the
    // corr/regression discipline. Plan: one (source, token) hash agg,
    // one ranking window partitioned by source, one final agg.
    "q_text_zipf_decades" -> ((s, dir) => {
      val cnts = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("tok"))
      val dec = "decimal(38,0)"
      cnts
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("source"),
          (length(bin(col("rnk"))) - 1).cast("long").as("x"),
          (length(bin(col("cnt"))) - 1).cast("long").as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"))
        .select(col("source"), col("n"),
          round((col("sxy").cast("double") * col("n").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
            (col("sxx").cast("double") * col("n").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("zipf_slope"))
        .orderBy(col("source"))
    }),

    // Term burstiness — Church/Gale dispersion: for the corpus's top-20
    // tokens, the variance-to-mean ratio of per-document counts
    // (Poisson scatter ⇒ VMR ≈ 1; bursty content words ⇒ ≫ 1). The
    // zero-count documents are real observations, so the moments use
    // the GLOBAL document count N with Σx/Σx² accumulated over only
    // the documents that contain the token — no N-way zero fan-out.
    // Exact decimal sums, one double division, round(6).
    "q_text_burstiness" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val dec = "decimal(38,0)"
      val perDoc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("x"))
      val top = perDoc.groupBy(col("tok"))
        .agg(sum(col("x")).as("cnt"), count(lit(1)).as("df"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"))
        .orderBy(col("cnt").desc, col("tok")).limit(20)
      top.crossJoin(broadcast(nDocs))
        .select(col("tok"), col("cnt"), col("df"),
          round((col("n_docs").cast("double") * col("sxx").cast("double")
              - col("cnt").cast("double") * col("cnt").cast("double")) /
            (col("n_docs").cast("double") * col("cnt").cast("double")), 6)
            .as("vmr"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    // Cross-document repeated n-gram audit — the memorization-risk
    // report (Lee et al., "Deduplicating Training Data Makes Language
    // Models Better"): for n ∈ {5, 10, 20}, how many distinct word
    // n-grams appear in ≥2 DIFFERENT documents, and how many documents
    // carry at least one shared gram. Pure shingle → distinct →
    // hash-agg pipeline per n (the contamination machinery generalized
    // to a sweep); grams shard by value, documents by id — no
    // all-pairs anywhere, and the n-sweep unions BEFORE the shuffle so
    // the three sizes ride one aggregation.
    "q_text_repeated_ngrams" -> ((s, dir) => {
      // One corpus scan for all three gram sizes (the original ran a
      // scan+split+explode+DISTINCT shuffle per size, then re-derived
      // the whole union for the affected-docs branch): tokens split
      // once, per-doc gram sets deduped IN-ROW with array_distinct
      // (replacing the global distinct shuffle — (doc, n, gram) is
      // unique by construction), all sizes exploded from one
      // concatenated struct array, and the exploded relation
      // localCheckpoint'ed so the rep agg and the affected-docs join
      // both read it without re-scanning the corpus. Measured ~2x at
      // sf0.1 (67 s → 36 s QueryCheck wall incl. harness).
      def gramsArr(n: Int): String =
        s"""transform(
           |  array_distinct(case when size(toks) >= $n then
           |    transform(sequence(1, size(toks) - ${n - 1}),
           |              i -> concat_ws(' ', slice(toks, i, $n)))
           |  else array() end),
           |  g -> struct(CAST($n AS BIGINT) AS n, g AS gram))""".stripMargin
      val all = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(expr(
          s"concat(${gramsArr(5)}, ${gramsArr(10)}, ${gramsArr(20)})")).as("e"))
        .select(col("doc_id"), col("e.n").as("n"), col("e.gram").as("gram"))
        .localCheckpoint(true)
      val rep = all.groupBy(col("n"), col("gram"))
        .agg(count(lit(1)).as("n_docs_gram"))
        .filter(col("n_docs_gram") >= 2)
      val nGrams = rep.groupBy(col("n"))
        .agg(count(lit(1)).as("n_repeated_grams"),
          max(col("n_docs_gram")).as("max_docs_per_gram"))
      val nDocs = all.join(rep.select(col("n"), col("gram")), Seq("n", "gram"))
        .select(col("n"), col("doc_id")).distinct()
        .groupBy(col("n")).agg(count(lit(1)).as("n_docs_affected"))
      nGrams.join(nDocs, Seq("n")).orderBy(col("n"))
    }),

    // ── survival / drift ─────────────────────────────────────────────

    // Discrete-time churn hazard — the survival-analysis life table
    // (the Kaplan-Meier input) in exact integer arithmetic: a user
    // whose last event lands ≥7 days before corpus end CHURNED at that
    // day; later users are right-censored and leave the risk set after
    // their last day without a churn event. At each departure day d
    // the risk set is every user still alive (last_day ≥ d), so
    // hazard_ppm = churns(d)·1e6 div at_risk(d), and cumulative churn
    // reads off a running window. Two hash aggs shard by user; the
    // final window runs over ≤ n_days rows (bounded, driver-free).
    "q_events_churn_hazard" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      val last = e.groupBy(col("user_id")).agg(max(col("day")).as("last_day"))
      val maxd = last.agg(max(col("last_day")).as("maxd"))
      val lab = last.crossJoin(broadcast(maxd))
        .withColumn("churned", col("last_day") <= col("maxd") - 7)
      val byDay = lab.groupBy(col("last_day").as("day"))
        .agg(count(lit(1)).as("n_leave"),
          sum(when(col("churned"), 1L).otherwise(0L)).as("n_churn"))
      val n = lab.agg(count(lit(1)).as("n_users"))
      val wPrev = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCur = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      byDay.crossJoin(broadcast(n))
        .withColumn("at_risk",
          col("n_users") - coalesce(sum(col("n_leave")).over(wPrev), lit(0L)))
        .withColumn("hazard_ppm", expr("(n_churn * 1000000L) div at_risk"))
        .withColumn("cum_churn", sum(col("n_churn")).over(wCur))
        .select(col("day"), col("at_risk"), col("n_churn"),
          col("hazard_ppm"), col("cum_churn"))
        .orderBy(col("day"))
    }),

    // Exact Kolmogorov–Smirnov drift per event type — the
    // distribution-free companion to the chi-square drift test (that
    // one bins; KS compares whole ECDFs, no binning decisions to
    // defend): split each type's values at relative day 15, build both
    // ECDFs on the merged value grid with one cumulative window each,
    // and take max |Fa − Fb| in ppm — floor-div integers throughout.
    // Plan: two hash aggs on (type, cents), one sorted window per type
    // over the DISTINCT value grid (≪ row count), one final max agg.
    "q_events_ks_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          expr("unix_timestamp(ts) div 86400").as("day"))
      val mind = ev.agg(min(col("day")).as("mind"))
      val sides = ev.crossJoin(broadcast(mind))
        .withColumn("half",
          when(col("day") - col("mind") < 15, "a").otherwise("b"))
      val grid = sides.groupBy(col("event_type"), col("c"))
        .agg(sum(when(col("half") === "a", 1L).otherwise(0L)).as("na"),
          sum(when(col("half") === "b", 1L).otherwise(0L)).as("nb"))
      val tot = sides.groupBy(col("event_type"))
        .agg(sum(when(col("half") === "a", 1L).otherwise(0L)).as("ta"),
          sum(when(col("half") === "b", 1L).otherwise(0L)).as("tb"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.withColumn("ca", sum(col("na")).over(w))
        .withColumn("cb", sum(col("nb")).over(w))
        .join(tot, Seq("event_type"))
        .select(col("event_type"), col("ta"), col("tb"),
          abs(expr("(ca * 1000000L) div ta")
            - expr("(cb * 1000000L) div tb")).as("d"))
        .groupBy(col("event_type"), col("ta"), col("tb"))
        .agg(max(col("d")).as("ks_ppm"))
        .orderBy(col("event_type"))
    }),

    // IVF recall curve — the index-tuning evidence, driver-visible:
    // recall@5 of the multi-probe IVF search at nprobe ∈ {1, 2, 4}
    // against the exact brute-force truth, as integer ppm. The brute
    // side is the documented-baseline all-pairs scan (bounded: 10
    // query vectors broadcast against the corpus), checkpointed once
    // and shared by all three probe arms; each IVF arm reuses the
    // memoized k-means fit, so the sweep costs three candidate-join
    // passes, not three trainings. At 100 TB only the IVF arms remain
    // (brute truth comes from a held-out sample exactly like this).
    "q_ann_ivf_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm2").as("qn"))
      val bscored = e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
        .select(col("qid"), col("c.vec_id").as("nb"),
          (graft.functions.ArrayMath.dotL(col("qv"), col("c.v")) /
            (sqrt(col("qn")) * sqrt(col("c.norm2")))).as("cos"))
      val wB = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nb"))
      val brute = bscored.withColumn("rank", row_number().over(wB))
        .filter(col("rank") <= 5).select(col("qid"), col("nb"))
        .localCheckpoint(true) // shared by 3 probe arms + the count
      val nTruth = brute.agg(count(lit(1)).as("n_truth"))
      val ivf = Seq(1, 2, 4).map(np =>
          ivfMultiprobeSearch(s, dir, np)
            .select(lit(np.toLong).as("nprobe"), col("qid"), col("nb")))
        .reduce(_ union _)
      ivf.join(broadcast(brute.withColumn("hit", lit(1L))),
          Seq("qid", "nb"), "left")
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_returned"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .crossJoin(broadcast(nTruth))
        .select(col("nprobe"), col("n_returned"), col("hits"),
          expr("(hits * 1000000L) div n_truth").as("recall_ppm"))
        .orderBy(col("nprobe"))
    }),

    // Per-dimension embedding health — the vector-column QA report a
    // feature store runs before indexing: mean, population variance,
    // and range per dimension (a near-zero-variance or wildly
    // off-center dimension signals a broken encoder or a truncated
    // export). One posexplode + one hash agg keyed by dim (64 groups);
    // the moments follow the exact decimal-sum / cast-once-double
    // discipline. Scale shape: a single partial+final agg, no joins.
    "q_embed_dimstats" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "embeddings")
        .select(posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")))
        .toDF("dim", "x")
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"))
        .select(col("dim").cast("long").as("dim"), col("n"),
          round(col("sx").cast("double") / col("n").cast("double"), 4)
            .as("mean"),
          round((col("sxx").cast("double") * col("n").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")) /
            (col("n").cast("double") * col("n").cast("double")), 4)
            .as("var_pop"),
          col("min_x"), col("max_x"))
        .orderBy(col("dim"))
    }),

    // Simpson diversity index per source — the collision-probability
    // complement to the entropy report (q_agg_entropy): the chance two
    // tokens drawn without replacement are the same type,
    // Σ nᵢ(nᵢ−1) / (N(N−1)). The pair counts accumulate as exact
    // decimals (nᵢ(nᵢ−1) wraps no earlier than the corpus itself) and
    // the index is ONE double division rounded. Two hash aggs sharded
    // by (source, token) then source.
    "q_docs_simpson" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          sum((col("cnt") * (col("cnt") - 1)).cast(dec)).as("pairs"))
        .select(col("source"), col("n_tokens"), col("n_distinct"),
          round(col("pairs").cast("double") /
            (col("n_tokens").cast("double")
              * (col("n_tokens").cast("double") - 1.0)), 6).as("simpson"))
        .orderBy(col("source"))
    }),

    // Benford first-digit audit — the fraud/integrity screen for a
    // value column: the leading-digit distribution of the positive
    // cents amounts per event type in exact ppm (synthetic uniform-ish
    // data will NOT follow Benford — the point of the query is the
    // report shape, and the deviation itself is the signal a real
    // ledger is judged by). First digit via string head — exact, no
    // float log10 anywhere. One scalar pass + two hash aggs.
    "q_events_benford" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
        .filter(col("c") > 0)
        .withColumn("digit",
          substring(col("c").cast("string"), 1, 1).cast("long"))
      val tot = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
      e.groupBy(col("event_type"), col("digit")).agg(count(lit(1)).as("n"))
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("digit"), col("n"),
          expr("(n * 1000000L) div n_total").as("pct_ppm"))
        .orderBy(col("event_type"), col("digit"))
    }),

    // Growth accounting — the new/retained/resurrected/churned daily
    // matrix every product dashboard leads with: per active (user,
    // day), the user is NEW (no prior activity), RETAINED (active
    // yesterday), or RESURRECTED (returning after a gap); CHURNED(d)
    // counts users active on d−1 but not d. One distinct + one lag
    // window partitioned by user (shards at any scale), a bounded
    // per-day rollup, and a full-outer day merge for the churn column.
    "q_events_lifecycle" -> ((s, dir) => {
      val act = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .distinct()
      val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val lab = act
        .withColumn("prev", lag(col("day"), 1).over(wU))
        .withColumn("nxt", lead(col("day"), 1).over(wU))
      val daily = lab.groupBy(col("day"))
        .agg(sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("prev") === col("day") - 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("prev").isNotNull && col("prev") < col("day") - 1, 1L)
            .otherwise(0L)).as("n_resurrected"))
      val maxd = act.agg(max(col("day")).as("maxd"))
      val churn = lab.crossJoin(broadcast(maxd))
        .filter(col("day") < col("maxd") &&
          (col("nxt").isNull || col("nxt") > col("day") + 1))
        .groupBy((col("day") + 1).as("day"))
        .agg(count(lit(1)).as("n_churned"))
      daily.join(churn, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy(col("day"))
    }),

    // Label-margin audit — the embedding-space classifier-health
    // report: for every label pair, the squared distance between
    // class centroids against the classes' within-dispersion (a
    // Fisher-style separability ratio; a collapsed pair predicts
    // confusion before any model run). Centroids are exact floored
    // per-dim means (the k-means discipline), dispersions exact
    // integer sums, and the margin is ONE double division of exact
    // integers — margin = d²·na·nb / (swa·nb + swb·na), i.e.
    // d² / (msdₐ + msd_b) cleared of fractions. Bounded: 10 labels →
    // 45 pairs; every distributed step is a hash agg or equi-join.
    "q_embed_label_margin" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val v = t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"), posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")))
        .toDF("label", "dim", "x")
      val cent = v.groupBy(col("label"), col("dim"))
        .agg(expr("cast(floor(cast(sum(x) as double) / count(1)) as bigint)")
          .as("cx"))
        .localCheckpoint(true) // feeds within-dispersion AND both pair sides
      val nv = t(s, dir, "embeddings")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("nv"))
      val sw = v.join(cent, Seq("label", "dim"))
        .groupBy(col("label"))
        .agg(sum(((col("x") - col("cx")) * (col("x") - col("cx"))).cast(dec))
          .as("sw"))
        .join(nv, Seq("label"))
      val d2 = cent.as("a").join(cent.as("b"),
          col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("la"), col("b.label").as("lb"))
        .agg(sum((col("a.cx") - col("b.cx")) * (col("a.cx") - col("b.cx")))
          .as("d2"))
      d2.join(sw.select(col("label").as("la"), col("sw").as("swa"),
          col("nv").as("na")), Seq("la"))
        .join(sw.select(col("label").as("lb"), col("sw").as("swb"),
          col("nv").as("nb")), Seq("lb"))
        .select(col("la"), col("lb"), col("d2"),
          round((col("d2").cast("double") * col("na").cast("double")
              * col("nb").cast("double")) /
            (col("swa").cast("double") * col("nb").cast("double")
              + col("swb").cast("double") * col("na").cast("double")), 6)
            .as("margin"))
        .orderBy(col("la"), col("lb"))
    }),

    // Cohort LTV curve — cumulative value per signup cohort by age:
    // users cohort on their first active day, every event's cents
    // land in (cohort_day, age) cells, and the running-sum window per
    // cohort yields the curve product teams read as "LTV by day N".
    // Per-user normalization is exact floor-div. Shapes: two hash
    // aggs sharded by user then (cohort, age), one window over a
    // bounded days×days grid.
    "q_events_cohort_ltv" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), cents(col("value")).as("c"),
          expr("unix_timestamp(ts) div 86400").as("day"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sized = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
      val cells = e.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age"))
        .agg(sum(col("c")).as("cents"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, 0)
      cells.withColumn("cum_cents", sum(col("cents")).over(w))
        .join(broadcast(sized), Seq("cohort_day"))
        .select(col("cohort_day"), col("age"), col("cohort_size"),
          col("cum_cents"),
          expr("cum_cents div cohort_size").as("ltv_cents_per_user"))
        .orderBy(col("cohort_day"), col("age"))
    }),

    // Corpus novelty curve — the diminishing-returns report for a
    // crawl: treating doc_id order as crawl order in batches of 100,
    // what share of each batch's distinct 3-grams was never seen in
    // any earlier batch. The first-occurrence batch per gram is one
    // min-agg (no ordered scan over the corpus), so the whole curve
    // is three hash aggs sharded by gram then batch — the curve that
    // tells a 100 TB pipeline when more of the same source stops
    // adding vocabulary.
    "q_text_novelty" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(expr("doc_id div 100").as("batch"), col("doc_id"),
          explode(expr(
            """case when size(split(text, ' ')) >= 3 then
              |  transform(sequence(1, size(split(text, ' ')) - 2),
              |            i -> concat_ws(' ', slice(split(text, ' '), i, 3)))
              |else array() end""".stripMargin)).as("gram"))
        .select(col("batch"), col("gram")).distinct()
      val firstB = grams.groupBy(col("gram")).agg(min(col("batch")).as("fb"))
      val perBatch = grams.groupBy(col("batch"))
        .agg(count(lit(1)).as("n_distinct_grams"))
      val newPer = firstB.groupBy(col("fb").as("batch"))
        .agg(count(lit(1)).as("n_new_grams"))
      perBatch.join(newPer, Seq("batch"), "left")
        .select(col("batch"), col("n_distinct_grams"),
          coalesce(col("n_new_grams"), lit(0L)).as("n_new_grams"))
        .withColumn("novelty_ppm",
          expr("(n_new_grams * 1000000L) div n_distinct_grams"))
        .orderBy(col("batch"))
    }),

    // Peak concurrency by sweep line — the capacity question every
    // serving table answers: treating each event as a 300-second
    // lease, the maximum number simultaneously open per event type.
    // Classic +1/−1 sweep with the close-before-open convention at
    // equal timestamps, expressed as two inclusive cumulative windows
    // over the per-second start/end counts (conc(t) = starts≤t −
    // ends≤t) — no interval self-join, no explode-per-second. The
    // windows run over the DISTINCT timestamp grid per type.
    "q_events_peak_concurrency" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), unix_timestamp(col("ts")).as("t0"))
      val starts = e.groupBy(col("event_type"), col("t0").as("t"))
        .agg(count(lit(1)).as("s_cnt"))
      val ends = e.groupBy(col("event_type"), (col("t0") + 300).as("t"))
        .agg(count(lit(1)).as("e_cnt"))
      val grid = starts.join(ends, Seq("event_type", "t"), "full_outer")
        .select(col("event_type"), col("t"),
          coalesce(col("s_cnt"), lit(0L)).as("s_cnt"),
          coalesce(col("e_cnt"), lit(0L)).as("e_cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.withColumn("conc", sum(col("s_cnt")).over(w) - sum(col("e_cnt")).over(w))
        .groupBy(col("event_type"))
        .agg(sum(col("s_cnt")).as("n_events"), max(col("conc")).as("peak"))
        .orderBy(col("event_type"))
    }),

    // Inter-arrival profile — the burst/load-model histogram capacity
    // planning reads: per event type, successive-event gaps in
    // seconds, bucketed by exact floor(log2(gap+1)) (the bin()-length
    // trick — bucket 0 is the same-second burst bin) with per-type
    // share in ppm. One lag window sharded by type, two hash aggs.
    "q_events_interarrival_hist" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id"))
      val gaps = t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"))
        .withColumn("gap", col("ts_s") - lag(col("ts_s"), 1).over(w))
        .filter(col("gap").isNotNull)
        .withColumn("bucket", (length(bin(col("gap") + 1)) - 1).cast("long"))
      val tot = gaps.groupBy(col("event_type")).agg(count(lit(1)).as("n_gaps"))
      gaps.groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("n"))
        .join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("bucket"), col("n"),
          expr("(n * 1000000L) div n_gaps").as("share_ppm"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // Source vocabulary overlap — the corpus-composition similarity
    // matrix: token-set Jaccard between every source pair (near-twin
    // sources mean the mixture is narrower than its source count
    // suggests). The pair fan-out is bounded by the SOURCE count, not
    // the corpus: each distinct (token) row joins only the ≤20 source
    // rows sharing it, so the self-join emits ≤ C(20,2) rows per
    // token — an equi-join on token, never all-pairs on documents.
    "q_docs_source_overlap" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n_toks"))
      val inter = g.as("a").join(g.as("b"),
          col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("source").as("sa"), col("n_toks").as("na")), Seq("sa"))
        .join(sizes.select(col("source").as("sb"), col("n_toks").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("inter"),
          expr("(inter * 1000000L) div (na + nb - inter)").as("jaccard_ppm"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Mann–Whitney U — the nonparametric A/B test (no normality
    // assumption, unlike the CUPED/variant mean tests): arms are
    // user_id parity, and the rank-sum statistic is EXACT through tie
    // handling by working at the value grain with DOUBLED ranks —
    // the average rank of a tie group is (2·cum_prev + n + 1)/2, so
    // 2U_A = Σ n_a·(2·cum_prev + n + 1) − n_A(n_A+1) stays integral.
    // The reported effect is the common-language AUC in ppm,
    // P(a > b) + ½P(a = b) = U_A / (n_A·n_B). One value-grain hash
    // agg, one cumulative window per type over the distinct grid.
    "q_events_mann_whitney" -> ((s, dir) => {
      val grid = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          pmod(col("user_id"), lit(2L)).as("arm"))
        .groupBy(col("event_type"), col("c"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
        .withColumn("n", col("na") + col("nb"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val dec = "decimal(38,0)"
      grid.withColumn("cum_prev", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("rank2", lit(2L) * col("cum_prev") + col("n") + 1)
        .groupBy(col("event_type"))
        .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
          // rank·count products grow ~quadratically with rows — decimal
          // accumulation (the q_agg_corr lesson), ONE double cast below
          sum((col("na") * col("rank2")).cast(dec)).as("ranksum2"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          round((col("ranksum2").cast("double")
              - col("n_a").cast("double") * (col("n_a").cast("double") + 1.0)) /
            (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")), 6)
            .as("auc"))
        .orderBy(col("event_type"))
    }),

    // Clustering quality vs ground-truth labels — purity and the
    // exact pair-counting Rand index of the k-means assignment
    // against the embedding labels, the eval that decides whether the
    // IVF coarse quantizer respects semantics. The contingency table
    // is one hash agg over the memoized fit (k×labels cells); purity
    // and RI are exact integer ppm: RI = (total + 2a − rows − cols) /
    // total over C(·,2) pair counts. One output row.
    "q_ann_kmeans_purity" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val lbl = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val cells = kmeansFit(s, dir).select(col("vec_id"), col("cid"))
        .join(lbl, Seq("vec_id"))
        .groupBy(col("cid"), col("label")).agg(count(lit(1)).as("nij"))
        .localCheckpoint(true) // feeds the four bounded rollups below
      val base = cells.agg(sum(col("nij")).as("n"),
        sum((col("nij") * (col("nij") - 1)).cast(dec)).as("a2"))
      val rows = cells.groupBy(col("cid")).agg(sum(col("nij")).as("ni"))
        .agg(sum((col("ni") * (col("ni") - 1)).cast(dec)).as("rows2"))
      val colsum = cells.groupBy(col("label")).agg(sum(col("nij")).as("nj"))
        .agg(sum((col("nj") * (col("nj") - 1)).cast(dec)).as("cols2"))
      val pur = cells.groupBy(col("cid")).agg(max(col("nij")).as("mx"))
        .agg(sum(col("mx")).as("pur"))
      base.crossJoin(broadcast(rows)).crossJoin(broadcast(colsum))
        .crossJoin(broadcast(pur))
        .select(col("n").as("n_vectors"),
          expr("(pur * 1000000L) div n").as("purity_ppm"),
          round((col("n").cast("double") * (col("n").cast("double") - 1.0)
              + lit(2.0) * col("a2").cast("double")
              - col("rows2").cast("double") - col("cols2").cast("double")) /
            (col("n").cast("double") * (col("n").cast("double") - 1.0)), 6)
            .as("rand_index"))
    }),

    // TPC-H Q1 proper — the faithful pricing summary (q_agg_pricing is
    // the reference-derived simplification): the 90-day shipdate
    // cutoff, the disc_price and charge measures, and the three
    // averages. Exactness: disc_price accumulates in 10⁻⁴ dollars
    // (price_c·(100−disc_c)) and charge in 10⁻⁶ dollars, both as
    // decimal(38,0) (the corr lesson — these wrap a long around
    // sf≈30), averages are ONE double division each. With this entry
    // all 22 TPC-H shapes are registered under their own names.
    "q_tpch_q1" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate <= timestamp'1998-09-02 00:00:00'"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c"),
          cents(col("l_tax")).as("tax_c"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty")).as("sum_qty"),
          sum(col("price_c")).as("sum_base_price_c"),
          sum((col("price_c") * (lit(100L) - col("disc_c"))).cast(dec))
            .as("sum_disc_price_c4"),
          sum((col("price_c") * (lit(100L) - col("disc_c"))
            * (lit(100L) + col("tax_c"))).cast(dec)).as("sum_charge_c6"),
          sum(col("disc_c")).as("sum_disc_c"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price_c"), col("sum_disc_price_c4"),
          col("sum_charge_c6"), col("count_order"),
          round(col("sum_qty").cast("double")
            / col("count_order").cast("double"), 4).as("avg_qty"),
          round(col("sum_base_price_c").cast("double")
            / (col("count_order").cast("double") * 100.0), 4).as("avg_price"),
          round(col("sum_disc_c").cast("double")
            / (col("count_order").cast("double") * 100.0), 6).as("avg_disc"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // RFM segmentation — the classic customer-value grid: per user,
    // Recency (days since last activity), Frequency (events), Monetary
    // (total cents), each cut into terciles by ntile over a total
    // order (metric + user_id tie-break, so the cut is deterministic
    // and engine-portable), rolled up to segment counts. Windows shard
    // by nothing here (one global ntile per dimension over the USER
    // table, not events — bounded by users, and at 100 TB the tercile
    // cuts come from exact per-dimension quantiles instead).
    "q_events_rfm" -> ((s, dir) => {
      val maxd = t(s, dir, "events")
        .agg(max(expr("unix_timestamp(ts) div 86400")).as("maxd"))
      val users = t(s, dir, "events")
        .select(col("user_id"), cents(col("value")).as("c"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
          sum(col("c")).as("m"))
        .crossJoin(broadcast(maxd))
        .withColumn("r", col("maxd") - col("last_day"))
      val seg = users
        .withColumn("rt", ntile(3).over(
          Window.orderBy(col("r"), col("user_id"))))
        .withColumn("ft", ntile(3).over(
          Window.orderBy(col("f").desc, col("user_id"))))
        .withColumn("mt", ntile(3).over(
          Window.orderBy(col("m").desc, col("user_id"))))
      seg.groupBy((col("rt") * 100 + col("ft") * 10 + col("mt")).as("segment"))
        .agg(count(lit(1)).as("n_users"), sum(col("m")).as("sum_cents"))
        .orderBy(col("segment"))
    }),

    // Calendar heatmap — the day-of-week × hour load matrix, from
    // pure integer epoch math (no timezone/locale functions, so both
    // engines agree bit-for-bit): dow 0 = Sunday via the +4 epoch-day
    // offset. One hash agg over 168 cells plus the global total.
    "q_events_calendar" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(unix_timestamp(col("ts")).as("t"))
        .select(pmod(expr("t div 86400") + 4, lit(7L)).as("dow"),
          expr("(t % 86400) div 3600").as("hour"))
      val tot = e.agg(count(lit(1)).as("n_total"))
      e.groupBy(col("dow"), col("hour")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), col("hour"), col("n"),
          expr("(n * 1000000L) div n_total").as("share_ppm"))
        .orderBy(col("dow"), col("hour"))
    }),

    // Corpus data card — the datasheet a training-corpus release ships
    // with, one row per (lang, source) cell: documents, whitespace
    // tokens, characters, exact-duplicate documents (normalized-md5
    // fingerprint shared with ANY other document corpus-wide, not just
    // in-cell — cross-source copies are the interesting ones), and the
    // chars-per-token fertility proxy in ppm. Every column is an exact
    // integer; the dup join is fingerprint-equi (never doc-pairs). At
    // 100 TB this is two hash aggs + one equi-join, sharded by
    // fingerprint then by the cell key.
    "q_docs_datacard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      val dupFp = docs.groupBy(col("fp")).agg(count(lit(1)).as("nfp"))
        .filter(col("nfp") >= 2).select(col("fp"))
      val flagged = docs.join(dupFp, Seq("fp"), "left_semi")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_dup_docs"))
      docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"))
        .join(flagged, Seq("lang", "source"), "left")
        .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
          expr("(n_chars * 1000000L) div n_tokens").as("chars_per_token_ppm"),
          expr("n_tokens div n_docs").as("tokens_per_doc"))
        .orderBy(col("lang"), col("source"))
    }),

    // Activity bitmap rollup — the roaring-bitmap pattern in a single
    // BIGINT: each user's first-63-days activity packs into one
    // bit_or-aggregated mask, then days-active histograms and
    // week1∧week2 retention read off bit_count and mask arithmetic —
    // no per-day rows survive the first aggregation, which is the
    // whole point at 100 TB (the engagement matrix compresses to one
    // long per user).
    "q_events_bitmap" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      val mind = e.agg(min(col("day")).as("mind"))
      val masks = e.crossJoin(broadcast(mind))
        .withColumn("rel", col("day") - col("mind"))
        .filter(col("rel") < 63) // one mask word; the corpus spans 30 days
        .select(col("user_id"),
          expr("shiftleft(1L, cast(rel as int))").as("bit"))
        .groupBy(col("user_id")).agg(expr("bit_or(bit)").as("mask"))
        .select(col("user_id"),
          expr("cast(bit_count(mask) as bigint)").as("days_active"),
          (expr("mask & 127L") =!= 0).cast("long").as("w1"),
          (expr("mask & 16256L") =!= 0).cast("long").as("w2"))
      masks.groupBy(col("days_active"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("w1") * col("w2")).as("n_both_weeks"))
        .orderBy(col("days_active"))
    }),

    // Interval-union active time — "how long was each user actually
    // active" under 300-second leases, overlaps merged exactly by the
    // running-max-end sweep (new coverage = lease end − max(own start,
    // furthest end so far); no interval self-join, no per-second
    // explode), rolled up to a 10-minute-bucket user histogram. One
    // window sharded by user, two hash aggs.
    "q_events_active_time" -> ((s, dir) => {
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("t"))
        .withColumn("prev_end", max(col("t") + 300).over(wPrev))
        .withColumn("covered", greatest(lit(0L),
          col("t") + 300
            - greatest(col("t"), coalesce(col("prev_end"), col("t")))))
      cov.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("covered")).as("active_secs"))
        .groupBy(expr("active_secs div 600").as("bucket"))
        .agg(count(lit(1)).as("n_users"), sum(col("active_secs")).as("sum_secs"),
          sum(col("n_events")).as("sum_events"))
        .orderBy(col("bucket"))
    }),

    // Degree assortativity — the network-science mixing coefficient
    // over the near-dup candidate graph: Pearson correlation of
    // endpoint degrees across directed edges (positive = hubs attach
    // to hubs; dis-assortative dedup graphs mean a few templates link
    // everything — a curation smell). Rides the session-memoized pair
    // list; five exact decimal sums, one double formula (the corr
    // discipline).
    "q_graph_assortativity" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val dec = "decimal(38,0)"
      edges
        .join(deg.select(col("src"), col("deg").as("x")), Seq("src"))
        .join(deg.select(col("src").as("dst"), col("deg").as("y")), Seq("dst"))
        .agg(count(lit(1)).as("n_edges"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .select(col("n_edges"),
          round((col("sxy").cast("double") * col("n_edges").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("sxx").cast("double") * col("n_edges").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * sqrt(col("syy").cast("double") * col("n_edges").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("assortativity"))
    }),

    // Multiple exact COUNT(DISTINCT) in ONE aggregate — the Expand
    // plan shape (Catalyst fans each row once per distinct group and
    // null-pads; one shuffle serves all three cardinalities + the
    // plain count, instead of three self-joined subqueries). The
    // user/day/user-day triple is the daily-report staple.
    "q_agg_multi_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("day")).as("n_days"),
          countDistinct(col("user_id"), col("day")).as("n_user_days"))
        .orderBy(col("event_type"))
    }),

    // One-way ANOVA F — does the metric's mean differ ACROSS the k
    // event types beyond noise (the k-group generalization of the
    // two-cohort q_events_ttest)? The five group sums accumulate
    // exactly as decimal(38,0) in ONE partial+final hash agg; each
    // group's s²/n is three IEEE ops on exactly-representable casts,
    // and the cross-group Σ s²/n folds an event_type-SORTED list so
    // both engines add the same doubles in the same order (double
    // addition is not associative — an unordered SUM would be
    // engine-dependent). F = (SSB/(k−1)) / (SSW/(N−k)) is one mirrored
    // formula. At 100 TB the group agg shards by key; the final fold
    // sees k rows on the driver-side-free single reducer.
    "q_agg_anova" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("x").cast(dec)).as("s_g"),
          sum((col("x") * col("x")).cast(dec)).as("ss_g"))
        .select(col("event_type"), col("n_g"), col("s_g"), col("ss_g"),
          (col("s_g").cast("double") * col("s_g").cast("double") /
            col("n_g").cast("double")).as("t_g"))
        .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
          sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
          aggregate(
            sort_array(collect_list(struct(col("event_type"), col("t_g")))),
            lit(0.0d), (acc, e) => acc + e.getField("t_g")).as("t"))
        .select(col("k"), col("n"),
          round(col("t") - col("s").cast("double") * col("s").cast("double") /
            col("n").cast("double"), 6).as("ssb"),
          round(col("ss").cast("double") - col("t"), 6).as("ssw"),
          round(((col("t") - col("s").cast("double") * col("s").cast("double") /
              col("n").cast("double")) / (col("k") - 1).cast("double")) /
            ((col("ss").cast("double") - col("t")) /
              (col("n") - col("k")).cast("double")), 6).as("f_stat"))
    }),

    // Linear-interpolation gap fill — the step up from q_window_locf's
    // staircase: interior holes (same deterministic cents%7 nulling)
    // are filled on the TIME axis between the surrounding
    // observations, leading/trailing holes stay null. Two bounded
    // window frames (running last-non-null backward, first-non-null
    // forward) over ONE user-keyed shuffle carry value AND timestamp
    // of each neighbor; the lerp is a single mirrored double formula
    // on exact integer cents/epochs, tie-guarded when both neighbors
    // share a second.
    "q_window_interpolate" -> ((s, dir) => {
      val wb = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      t(s, dir, "events")
        .withColumn("et", expr("unix_timestamp(ts)"))
        .withColumn("c",
          when(cents(col("value")) % 7 === 0, lit(null).cast("long"))
            .otherwise(cents(col("value"))))
        .withColumn("pv", last(col("c"), ignoreNulls = true).over(wb))
        .withColumn("pt",
          last(when(col("c").isNotNull, col("et")), ignoreNulls = true).over(wb))
        .withColumn("nv", first(col("c"), ignoreNulls = true).over(wf))
        .withColumn("nt",
          first(when(col("c").isNotNull, col("et")), ignoreNulls = true).over(wf))
        .select(col("user_id"), col("event_id"), col("c"),
          round(when(col("c").isNotNull, col("c").cast("double"))
            .when(col("pv").isNull || col("nv").isNull,
              lit(null).cast("double"))
            .when(col("nt") === col("pt"), col("pv").cast("double"))
            .otherwise(col("pv").cast("double") +
              (col("nv") - col("pv")).cast("double") *
                (col("et") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")), 6).as("filled"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // RAKE keyword extraction (Rose et al. 2010) — candidate phrases
    // are maximal stopword-free token runs (phrase id = running count
    // of stopword boundaries, one doc-keyed window); word degree =
    // Σ phrase-length over a word's occurrences, word frequency = its
    // occurrence count, both from ONE corpus-wide hash agg on the
    // token key; a word's score deg/freq is kept EXACT as integer ppm
    // so the phrase score (Σ over its words) is an order-free integer
    // sum — no float accumulation anywhere. Output: multi-word
    // phrases recurring ≥2×, top 50 by score. At 100 TB every stage
    // is a token/phrase-key hash agg or equi-join; the final top-50
    // is a distributed TakeOrdered.
    "q_text_rake" -> ((s, dir) => {
      val stop = Seq("the", "a", "of", "and")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val words = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
        .withColumn("is_stop", col("tok").isin(stop: _*))
        .withColumn("phrase_id",
          sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
        .filter(!col("is_stop"))
        .select(col("doc_id"), col("phrase_id"), col("pos"), col("tok"))
      val plens = words.groupBy(col("doc_id"), col("phrase_id"))
        .agg(count(lit(1)).as("plen"))
      val occ = words.join(plens, Seq("doc_id", "phrase_id"))
      val wordScore = occ.groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("tok"), expr("(deg * 1000000L) div freq").as("score_ppm"))
      occ.join(wordScore, Seq("tok"))
        .groupBy(col("doc_id"), col("phrase_id"))
        .agg(expr("array_join(transform(array_sort(collect_list(" +
            "struct(pos, tok))), e -> e.tok), ' ')").as("phrase"),
          sum(col("score_ppm")).as("score_ppm"),
          count(lit(1)).as("plen"))
        .groupBy(col("phrase"), col("plen"))
        .agg(count(lit(1)).as("n_occ"), min(col("score_ppm")).as("score_ppm"))
        .filter(col("n_occ") >= 2 && col("plen") >= 2)
        .orderBy(col("score_ppm").desc, col("phrase"))
        .limit(50)
    }),

    // Label-propagation community detection (Raghavan et al. 2007) —
    // 3 synchronous rounds over the shared simhash near-dup graph:
    // every node adopts the MOST FREQUENT label among its neighbors,
    // ties to the smallest label, isolated nodes keep their own. The
    // total (count desc, lbl) order makes the classic deterministic
    // and engine-reproducible. Per round: one edges⋈labels equi-join,
    // one (dst,lbl) hash agg, one per-dst top-1 window on bounded
    // keys, one left join back — the Pregel superstep shape — with
    // localCheckpoint per round (checkpoint-cadence rule). Distinct
    // from q_dedup_resolve: min-label CC merges everything reachable;
    // frequency-vote LPA splits dense regions into communities.
    "q_graph_label_prop" -> ((s, dir) =>
      lpaLabels(s, dir)
        .select(col("id").as("doc_id"), col("lbl").as("community"))
        .orderBy(col("doc_id"))),

    // Change-point detection by binary segmentation (first split) —
    // per event type, the split minimizing total within-segment
    // variance over the (ts, event_id)-ordered series: prefix
    // count/sum/sum-of-squares ride ONE running frame on the SAME
    // type-keyed window shuffle as the grand totals (unbounded frame),
    // the split cost is a single mirrored double formula on
    // exactly-accumulated decimal(38,0) moments, and the argmin
    // tie-breaks on the earliest index. The 100 TB shape: one window
    // sort per type, one top-1 — no self-join over candidate splits.
    "q_events_changepoint" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val wRun = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          cents(col("value")).as("x"))
        .withColumn("i", count(lit(1)).over(wRun))
        .withColumn("si", sum(col("x").cast(dec)).over(wRun))
        .withColumn("qi", sum((col("x") * col("x")).cast(dec)).over(wRun))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("x").cast(dec)).over(wAll))
        .withColumn("q", sum((col("x") * col("x")).cast(dec)).over(wAll))
        .filter(col("i") < col("n"))
        .withColumn("cost",
          (col("qi").cast("double") -
            col("si").cast("double") * col("si").cast("double") /
              col("i").cast("double")) +
          ((col("q") - col("qi")).cast("double") -
            (col("s") - col("si")).cast("double") *
              (col("s") - col("si")).cast("double") /
              (col("n") - col("i")).cast("double")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("cost"), col("i"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n"), col("i").as("split_i"),
          round(col("cost"), 4).as("cost"),
          round(col("si").cast("double") / col("i").cast("double"), 4)
            .as("mean_left_c"),
          round((col("s") - col("si")).cast("double") /
            (col("n") - col("i")).cast("double"), 4).as("mean_right_c"))
        .orderBy(col("event_type"))
    }),

    // Gopher-style quality-rule battery (Rae et al. 2021 §A1.1) — the
    // named pretraining document filter as per-doc integer flags:
    // word-count bounds, mean-word-length band (×100 fixed point),
    // minimum alphabetic-word share (ppm), and the ≥2-distinct-
    // stopwords evidence rule; pass = every flag. All in-row scalar
    // arithmetic over one scan — the 100 TB cost is the read itself.
    // q_text_quality scores a ratio; this is the RULESET gate a corpus
    // is actually filtered with.
    "q_docs_gopher_rules" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .withColumn("l", expr("filter(split(text, ' '), w -> w <> '')"))
        .withColumn("n_words", size(col("l")).cast("long"))
        .filter(col("n_words") > 0)
        .withColumn("mwl_c", expr(
          "(aggregate(l, 0L, (a, w) -> a + length(w)) * 100L) div n_words"))
        .withColumn("alpha_ppm", expr(
          "(size(filter(l, w -> w rlike '[a-zA-Z]')) * 1000000L) div n_words"))
        .withColumn("n_stop",
          (array_contains(col("l"), "the").cast("long") +
            array_contains(col("l"), "a").cast("long") +
            array_contains(col("l"), "of").cast("long") +
            array_contains(col("l"), "and").cast("long")))
      base.select(col("doc_id"), col("n_words"), col("mwl_c"),
          col("alpha_ppm"), col("n_stop"),
          (col("n_words") >= 10 && col("n_words") <= 100000)
            .cast("int").as("f_words"),
          (col("mwl_c") >= 300 && col("mwl_c") <= 1000)
            .cast("int").as("f_mwl"),
          (col("alpha_ppm") >= 800000).cast("int").as("f_alpha"),
          (col("n_stop") >= 2).cast("int").as("f_stop"))
        .withColumn("pass",
          (col("f_words") * col("f_mwl") * col("f_alpha") * col("f_stop"))
            .cast("int"))
        .orderBy(col("doc_id"))
    }),

    // Snake-draft bin packing — balanced size-aware sharding within
    // each source group: docs ranked by (n_chars desc, doc_id) are
    // dealt across 8 bins boustrophedon (0..7, 7..0, …), the
    // classical O(1)-per-item near-optimal balancer for long-tailed
    // sizes (plain round-robin parks every big doc in bin rank%8).
    // Output: per-(source, bin) doc count + byte total, plus the
    // group's max/min byte imbalance in ppm. One source-keyed window
    // shuffle, one hash agg on the same key — the rank is PER GROUP,
    // never a global total order (the 100 TB trap a single
    // Window.orderBy would plan: all rows to one partition).
    "q_pack_binpack" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", row_number().over(w) - 1)
        .withColumn("bin",
          when(expr("(rk div 8) % 2 = 0"), expr("rk % 8"))
            .otherwise(expr("7 - (rk % 8)")))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("bin_bytes"))
        .withColumn("imbalance_ppm", expr(
          "((max(bin_bytes) OVER (PARTITION BY source) " +
            "- min(bin_bytes) OVER (PARTITION BY source)) * 1000000L) " +
            "div max(bin_bytes) OVER (PARTITION BY source)"))
        .select(col("source"), col("bin"), col("n_docs"), col("bin_bytes"),
          col("imbalance_ppm"))
        .orderBy(col("source"), col("bin"))
    }),

    // Feature hashing (the hashing trick, Weinberger et al. 2009) —
    // 32-dim signed bag-of-words embedding with NO vocabulary: dim =
    // md5(tok) low 5 bits, sign = bit 5, weight = signed occurrence
    // sum. The vocabulary-free property is what scales: no dictionary
    // broadcast, no OOV path, one (doc, dim) hash agg over the token
    // stream. Output exploded as (doc_id, dim, weight) rows — the
    // sparse representation downstream trainers consume.
    "q_text_feature_hash" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 2000)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("h",
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
        .withColumn("dim", pmod(col("h"), lit(32L)))
        .withColumn("sign",
          when(pmod(expr("h div 32"), lit(2L)) === 0, 1L).otherwise(-1L))
        .groupBy(col("doc_id"), col("dim"))
        .agg(sum(col("sign")).as("weight"))
        .filter(col("weight") =!= 0)
        .orderBy(col("doc_id"), col("dim"))
    }),

    // Maximum drawdown per user — the largest peak-to-trough fall of
    // the cumulative metric (the stability readout for any running
    // balance/score series): running sum and running max ride ONE
    // user-keyed window sort, the per-user rollup reuses the same
    // hash partitioning (no second exchange). All-long arithmetic.
    "q_window_drawdown" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("x"))
        .withColumn("cum", sum(col("x")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(col("peak") - col("cum")).as("max_drawdown_c"),
          max(col("peak")).as("peak_c"),
          sum(col("x")).as("final_c"))
        .orderBy(col("user_id"))
    }),

    // Kaplan–Meier survival estimator with right-censoring — the
    // product-limit curve over user lifetimes (days between first and
    // last event): users whose last event falls in the corpus's final
    // 7 days are CENSORED (they exit the risk set without counting as
    // deaths — dropping them would bias survival down, the classic
    // mistake). Per lifetime t: deaths d_t, censored c_t, risk set
    // n_t = Σ_{u≥t}(d_u+c_u) via one descending running frame; S(t)
    // folds the (n_u−d_u)/n_u factors in ascending-t order through a
    // window collect so both engines multiply the same exact-ratio
    // doubles in the same order. Day-grain rows are bounded by the
    // corpus time span, so the global window is O(days), not O(rows).
    "q_events_kaplan_meier" -> ((s, dir) => {
      val users = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("birth"), max(col("day")).as("death"))
      val horizon = users.agg(max(col("death")).as("d_max"))
      val lives = users.join(broadcast(horizon))
        .select((col("death") - col("birth")).as("t"),
          when(col("death") > col("d_max") - 7, 1L).otherwise(0L).as("cens"))
      val byT = lives.groupBy(col("t"))
        .agg(sum(lit(1L) - col("cens")).as("d"), sum(col("cens")).as("c"))
      val wDesc = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
        .withColumn("factor",
          (col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double"))
        .withColumn("survival",
          round(aggregate(collect_list(col("factor")).over(wAsc),
            lit(1.0d), (a, x) => a * x), 6))
        .select(col("t"), col("n_risk"), col("d"), col("c"), col("survival"))
        .orderBy(col("t"))
    }),

    // Cramér's V — association strength between two categorical
    // columns (lang × source: "does language depend on provenance?"),
    // the normalized chi-square every corpus data card reports next
    // to the contingency table. Cell counts come from ONE hash agg;
    // row/column margins ride bounded window sums over the cells; the
    // chi-square sums its per-cell terms through a (lang, source)-
    // SORTED fold so both engines add the same doubles in the same
    // order; V = sqrt(χ²/(N·min(R−1,C−1))) is one mirrored formula.
    "q_agg_cramers_v" -> ((s, dir) => {
      val cells = t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wc = Window.partitionBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cells
        .withColumn("r", sum(col("o")).over(wr))
        .withColumn("c", sum(col("o")).over(wc))
        .agg(count(lit(1)).as("n_cells"),
          countDistinct(col("lang")).as("n_rows"),
          countDistinct(col("source")).as("n_cols"),
          sum(col("o")).as("n"),
          aggregate(
            sort_array(collect_list(struct(col("lang"), col("source"),
              col("o"), col("r"), col("c")))),
            lit(0.0d), (a, e) => a + {
              val o = e.getField("o").cast("double")
              val r = e.getField("r").cast("double")
              val c = e.getField("c").cast("double")
              (o * o) / (r * c)
            }).as("phi_sum"))
        .select(col("n_cells"), col("n_rows"), col("n_cols"), col("n"),
          round(col("n").cast("double") * (col("phi_sum") - 1.0d), 6)
            .as("chi2"),
          round(sqrt((col("phi_sum") - 1.0d) /
            least(col("n_rows") - 1, col("n_cols") - 1).cast("double")), 6)
            .as("cramers_v"))
    }),

    // Grouped K-fold assignment — the data-leakage guard for
    // train/validation splits: ALL of a user's events land in the
    // same fold (fold = md5(user) % 5), so no user straddles the
    // boundary — the group-level invariant plain row-hash splits
    // violate. Deterministic under partitioning and engine (the
    // md5 mixture rule q_sample_stratified established). Output:
    // per-fold group/event/byte totals + event share in ppm.
    "q_sample_group_kfold" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("fold", pmod(
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(5L)))
        .groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("sum_c"))
        .withColumn("share_ppm",
          expr("(n_events * 1000000L) div (sum(n_events) OVER ())"))
        .orderBy(col("fold"))
    }),

    // Newman modularity of the LPA partition — the quality score that
    // tells you whether the detected communities are real structure
    // or noise: Q = Σ_c (e_in,c/2m − (d_c/2m)²) over directed-double
    // edges. Per-community intra-edge and degree masses come from one
    // edges⋈labels⋈labels equi-join + hash agg; the cross-community
    // sum folds a community-SORTED list (deterministic double order,
    // the q_agg_anova rule); 2m rides an OVER () on the bounded
    // community rows. Edge-free communities contribute exactly 0, so
    // the edge-based fold IS the full sum.
    "q_graph_modularity" -> ((s, dir) => {
      val labels = lpaLabels(s, dir)
      val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
      val la = labels.select(col("id").as("src"), col("lbl").as("lc_src"))
      val lb = labels.select(col("id").as("dst"), col("lbl").as("lc_dst"))
      val perC = edges.join(la, Seq("src")).join(lb, Seq("dst"))
        .groupBy(col("lc_src"))
        .agg(count(lit(1)).as("d_c"),
          sum(when(col("lc_src") === col("lc_dst"), 1L).otherwise(0L))
            .as("din_c"))
        .withColumnRenamed("lc_src", "community")
        .withColumn("m2", expr("sum(d_c) OVER ()"))
      val nTotal = labels.agg(countDistinct(col("lbl")).as("n_communities"))
      perC.agg(count(lit(1)).as("n_linked"),
          min(col("m2")).as("m_directed"),
          aggregate(sort_array(collect_list(struct(col("community"),
              col("din_c"), col("d_c"), col("m2")))),
            lit(0.0d), (a, e) => {
              val m2d = e.getField("m2").cast("double")
              val dm = e.getField("d_c").cast("double") / m2d
              a + (e.getField("din_c").cast("double") / m2d - dm * dm)
            }).as("qsum"))
        .join(broadcast(nTotal))
        .select(col("n_communities"), col("n_linked"), col("m_directed"),
          round(col("qsum"), 6).as("modularity"))
    }),

    // Keep-the-longest dedup survivor selection — the curation policy
    // where each near-dup component keeps its LONGEST member (the
    // RefinedWeb/C4-style representative choice) instead of
    // q_dedup_resolve's min-id canonical: components from the shared
    // min-label resolution, one docs equi-join for sizes, one bounded
    // per-component top-1 window, and the kept/dropped byte ledger
    // the dedup report prints. Tie-break (n_chars desc, doc_id) keeps
    // it deterministic.
    "q_dedup_best_survivor" -> ((s, dir) => {
      val comps = resolveComponents(s, dir)
        .select(col("doc_id"), col("component"))
      val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("n_chars"))
      val w = Window.partitionBy(col("component"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      comps.join(docs, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          min(when(col("rn") === 1, col("doc_id"))).as("keep_doc_id"),
          sum(when(col("rn") === 1, col("n_chars")).otherwise(0L))
            .as("kept_chars"),
          sum(when(col("rn") =!= 1, col("n_chars")).otherwise(0L))
            .as("dropped_chars"))
        .orderBy(col("component"))
    }),

    // Western Electric SPC rule battery — the four classic control-
    // chart alarms over each user's trailing-20 baseline, extending
    // q_events_rolling_zscore's cleared-denominator trick to zones:
    // |z| > k over the frame ⟺ (n·x − s)² > k²·(n·ss − s²), all
    // integer, so zone A/B/C membership is exact. Rule 1: 1 beyond
    // 3σ; rule 2: ≥2 of 3 beyond 2σ same side; rule 3: ≥4 of 5 beyond
    // 1σ same side; rule 4: 8 consecutive same side of the mean. The
    // zone flags and the short consecutive counters all ride ONE
    // user-keyed window sort (same partitioning + ordering, multiple
    // frames); warm-up rows (n < 10) never alarm.
    "q_events_spc_rules" -> ((s, dir) => {
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      def tail(k: Int) = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-(k - 1), Window.currentRow)
      val dev2 = (col("n") * col("x") - col("sf")) *
        (col("n") * col("x") - col("sf"))
      val var2 = col("n") * col("ssf") - col("sf") * col("sf")
      def beyond(k: Int) =
        col("n") >= 10 && dev2 > lit(k.toLong * k) * var2
      val pos = col("n") * col("x") - col("sf") > 0
      val neg = col("n") * col("x") - col("sf") < 0
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("x"))
        .withColumn("n", count(lit(1)).over(frame))
        .withColumn("sf", sum(col("x")).over(frame))
        .withColumn("ssf", sum(col("x") * col("x")).over(frame))
        .withColumn("r1", beyond(3).cast("long"))
        .withColumn("b2p", (beyond(2) && pos).cast("long"))
        .withColumn("b2n", (beyond(2) && neg).cast("long"))
        .withColumn("b1p", (beyond(1) && pos).cast("long"))
        .withColumn("b1n", (beyond(1) && neg).cast("long"))
        .withColumn("sp", (col("n") >= 10 && pos).cast("long"))
        .withColumn("sn", (col("n") >= 10 && neg).cast("long"))
        .withColumn("r2",
          (sum(col("b2p")).over(tail(3)) >= 2 ||
            sum(col("b2n")).over(tail(3)) >= 2).cast("long"))
        .withColumn("r3",
          (sum(col("b1p")).over(tail(5)) >= 4 ||
            sum(col("b1n")).over(tail(5)) >= 4).cast("long"))
        .withColumn("r4",
          (sum(col("sp")).over(tail(8)) === 8 ||
            sum(col("sn")).over(tail(8)) === 8).cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("r1")).as("n_rule1"), sum(col("r2")).as("n_rule2"),
          sum(col("r3")).as("n_rule3"), sum(col("r4")).as("n_rule4"))
        .orderBy(col("user_id"))
    }),

    // IDF-weighted Jaccard near-dup pairs — the production variant of
    // q_dedup_jaccard: shared boilerplate vocabulary ('the', headers)
    // shouldn't vouch for duplication the way a rare term does, so
    // each token carries the integer-log2 idf weight (the exact
    // bin()-length trick from q_text_tfidf) and the pair score is
    // Σw(A∩B) / Σw(A∪B) in exact ppm. Same df-capped inverted-index
    // candidate join (the guard keeps the hottest posting bounded at
    // any corpus size); weights join token-keyed, never broadcast.
    "q_dedup_jaccard_idf" -> ((s, dir) => {
      val dfCap = 600L
      val toksAll = t(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val dfTab = toksAll.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val hot = dfTab.filter(col("df") > dfCap)
      val nHot = hot.count()
      if (nHot > 0)
        System.err.println(
          s"[q_dedup_jaccard_idf] df-guard dropped $nHot hot tokens (df > $dfCap)")
      val nDocs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .agg(countDistinct(col("doc_id")).as("nd"))
      val weights = dfTab.filter(col("df") <= dfCap)
        .join(broadcast(nDocs))
        .select(col("tok"), expr("cast(length(bin(nd div df)) as long)").as("w"))
      val toks = toksAll
        .join(broadcast(hot.select(col("tok"))), Seq("tok"), "left_anti")
        .join(weights, Seq("tok"))
      val wsum = toks.groupBy(col("doc_id")).agg(sum(col("w")).as("ws"))
      toks.as("a")
        .join(toks.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
        .agg(sum(col("a.w")).as("iw"))
        .join(wsum.select(col("doc_id").as("ia"), col("ws").as("wsa")), Seq("ia"))
        .join(wsum.select(col("doc_id").as("ib"), col("ws").as("wsb")), Seq("ib"))
        .withColumn("jw_ppm",
          expr("(iw * 1000000L) div (wsa + wsb - iw)"))
        .filter(col("jw_ppm") >= 900000)
        .select(col("ia"), col("ib"), col("iw"), col("jw_ppm"))
        .orderBy(col("ia"), col("ib"))
    }),

    // Interrupted time-series analysis — per event type, OLS level
    // and slope on EACH side of the corpus-midpoint intervention day,
    // with the regressor centered at the split (so each segment's
    // intercept IS its level at the intervention): the pre/post five-
    // sum pairs accumulate as decimal(38,0) conditional sums in ONE
    // hash agg (no second pass, no per-segment subquery); every
    // slope/level/delta is the q_agg_regression formula family —
    // decimals cast to double once, unrounded slope feeding the
    // level, + 0.0 collapsing IEEE −0.0.
    "q_events_its" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val base = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"),
          cents(col("value")).as("x"))
      val split = base.agg(
        expr("(min(day) + max(day) + 1) div 2").as("split"))
      val pre = col("d") < 0
      val post = col("d") >= 0
      def cs(cond: org.apache.spark.sql.Column,
          e: org.apache.spark.sql.Column) =
        sum(when(cond, e).otherwise(lit(0L)).cast(dec))
      base.join(broadcast(split))
        .withColumn("d", col("day") - col("split"))
        .groupBy(col("event_type"))
        .agg(sum(when(pre, 1L).otherwise(0L)).as("n_pre"),
          sum(when(post, 1L).otherwise(0L)).as("n_post"),
          cs(pre, col("d")).as("sd0"), cs(pre, col("x")).as("sx0"),
          cs(pre, col("d") * col("x")).as("sdx0"),
          cs(pre, col("d") * col("d")).as("sdd0"),
          cs(post, col("d")).as("sd1"), cs(post, col("x")).as("sx1"),
          cs(post, col("d") * col("x")).as("sdx1"),
          cs(post, col("d") * col("d")).as("sdd1"))
        .filter(col("n_pre") >= 2 && col("n_post") >= 2)
        .select(col("event_type"), col("n_pre"), col("n_post"),
          col("n_pre").cast("double").as("nd0"),
          col("n_post").cast("double").as("nd1"),
          col("sd0").cast("double").as("dsd0"),
          col("sx0").cast("double").as("dsx0"),
          col("sdx0").cast("double").as("dsdx0"),
          col("sdd0").cast("double").as("dsdd0"),
          col("sd1").cast("double").as("dsd1"),
          col("sx1").cast("double").as("dsx1"),
          col("sdx1").cast("double").as("dsdx1"),
          col("sdd1").cast("double").as("dsdd1"))
        .withColumn("sl0",
          (col("dsdx0") * col("nd0") - col("dsd0") * col("dsx0")) /
            (col("dsdd0") * col("nd0") - col("dsd0") * col("dsd0")))
        .withColumn("sl1",
          (col("dsdx1") * col("nd1") - col("dsd1") * col("dsx1")) /
            (col("dsdd1") * col("nd1") - col("dsd1") * col("dsd1")))
        .select(col("event_type"), col("n_pre"), col("n_post"),
          (round(col("sl0"), 6) + lit(0.0)).as("pre_slope"),
          (round(col("sl1"), 6) + lit(0.0)).as("post_slope"),
          (round((col("dsx0") - col("sl0") * col("dsd0")) / col("nd0"), 4)
            + lit(0.0)).as("pre_level"),
          (round((col("dsx1") - col("sl1") * col("dsd1")) / col("nd1"), 4)
            + lit(0.0)).as("post_level"),
          (round(col("sl1") - col("sl0"), 6) + lit(0.0)).as("slope_change"),
          (round((col("dsx1") - col("sl1") * col("dsd1")) / col("nd1") -
            (col("dsx0") - col("sl0") * col("dsd0")) / col("nd0"), 4)
            + lit(0.0)).as("level_change"))
        .orderBy(col("event_type"))
    }),

    // Difference-in-differences — the 2×2 causal workhorse: treated
    // cohort (user_id parity, the established deterministic cohort
    // split) × pre/post the corpus-midpoint day; DiD = (T,post −
    // T,pre) − (C,post − C,pre) on exact-cents cell means. All four
    // cells come from ONE conditional-sum hash agg over one scan; the
    // estimate is one mirrored double formula.
    "q_events_did" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val base = t(s, dir, "events")
        .select(expr("user_id % 2").as("treat"),
          expr("unix_timestamp(ts) div 86400").as("day"),
          cents(col("value")).as("x"))
      val split = base.agg(
        expr("(min(day) + max(day) + 1) div 2").as("split"))
      def cell(tr: Int, po: Int) =
        col("treat") === tr && col("post") === po
      base.join(broadcast(split))
        .withColumn("post",
          (col("day") >= col("split")).cast("long"))
        .agg(
          sum(when(cell(1, 0), 1L).otherwise(0L)).as("n_t0"),
          sum(when(cell(1, 1), 1L).otherwise(0L)).as("n_t1"),
          sum(when(cell(0, 0), 1L).otherwise(0L)).as("n_c0"),
          sum(when(cell(0, 1), 1L).otherwise(0L)).as("n_c1"),
          sum(when(cell(1, 0), col("x")).otherwise(0L).cast(dec)).as("s_t0"),
          sum(when(cell(1, 1), col("x")).otherwise(0L).cast(dec)).as("s_t1"),
          sum(when(cell(0, 0), col("x")).otherwise(0L).cast(dec)).as("s_c0"),
          sum(when(cell(0, 1), col("x")).otherwise(0L).cast(dec)).as("s_c1"))
        .withColumn("m_t0", col("s_t0").cast("double") / col("n_t0").cast("double"))
        .withColumn("m_t1", col("s_t1").cast("double") / col("n_t1").cast("double"))
        .withColumn("m_c0", col("s_c0").cast("double") / col("n_c0").cast("double"))
        .withColumn("m_c1", col("s_c1").cast("double") / col("n_c1").cast("double"))
        .select(col("n_t0"), col("n_t1"), col("n_c0"), col("n_c1"),
          (round(col("m_t0"), 4) + lit(0.0)).as("mean_t_pre"),
          (round(col("m_t1"), 4) + lit(0.0)).as("mean_t_post"),
          (round(col("m_c0"), 4) + lit(0.0)).as("mean_c_pre"),
          (round(col("m_c1"), 4) + lit(0.0)).as("mean_c_post"),
          (round((col("m_t1") - col("m_t0")) - (col("m_c1") - col("m_c0")), 4)
            + lit(0.0)).as("did"))
    }),

    // Sample-ratio-mismatch guard — the first thing any experiment
    // readout must check before trusting q_events_did/cuped/ttest: a
    // 50/50 assignment whose realized USER counts (assignment unit,
    // not event counts) fail the df=1 chi-square means the bucketing
    // is broken and every downstream estimate is garbage. For two
    // equal-expected cells the statistic collapses to (n_a−n_b)²/N —
    // one exact-integer division mirrored as a single double op.
    "q_sample_srm" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("user_id"), expr("user_id % 2").as("cohort"))
        .agg(countDistinct(when(col("cohort") === 0, col("user_id")))
            .as("n_a"),
          countDistinct(when(col("cohort") === 1, col("user_id")))
            .as("n_b"))
        .select(col("n_a"), col("n_b"),
          round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
            .cast("double") / (col("n_a") + col("n_b")).cast("double"), 6)
            .as("chi2"),
          (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
            .cast("double") / (col("n_a") + col("n_b")).cast("double")
            > 3.841).cast("int").as("srm"))
    }),

    // Neyman allocation — the optimal stratified-sampling design: a
    // fixed budget of 1000 samples split across event-type strata
    // proportional to N_h·σ_h (high-variance strata earn more draws
    // than proportional allocation gives them). The key identity
    // keeps it exact: N_h·σ_h = √(N_h·ΣX² − (ΣX)²) — ONE sqrt of an
    // exactly-accumulated decimal per stratum; the denominator folds
    // the k per-stratum terms in event_type order (the q_agg_anova
    // determinism rule) and joins back as a 1-row broadcast.
    "q_sample_neyman" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val strata = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_h"),
          sum(col("x").cast(dec)).as("s_h"),
          sum((col("x") * col("x")).cast(dec)).as("ss_h"))
        .withColumn("term",
          sqrt(col("n_h").cast("double") * col("ss_h").cast("double") -
            col("s_h").cast("double") * col("s_h").cast("double")))
      val total = strata.agg(
        aggregate(sort_array(collect_list(struct(col("event_type"),
            col("term")))),
          lit(0.0d), (a, e) => a + e.getField("term")).as("total"))
      strata.join(broadcast(total))
        .select(col("event_type"), col("n_h"),
          round(col("term") / col("n_h").cast("double"), 6).as("sd_c"),
          floor(lit(1000.0d) * col("term") / col("total")).cast("long")
            .as("alloc"))
        .orderBy(col("event_type"))
    }),

    // Yule's K lexical-richness statistic per source — the classic
    // repeated-vocabulary measure (K rises as a corpus leans on few
    // words; stable in N unlike type counts): K = 10⁴·(Σ_w m_w² − N)/N²
    // needs only the token total and the sum of squared word counts —
    // two exact integer aggregates off one (source, word) hash agg —
    // then one mirrored double formula. Complements q_text_hapax
    // (spectrum tail) and q_text_zipf_decades (rank law slope).
    "q_text_yule_k" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("source"))
        .agg(sum(col("m")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum((col("m") * col("m")).cast(dec)).as("s2"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          round(lit(10000.0d) *
            (col("s2").cast("double") - col("n_tokens").cast("double")) /
            (col("n_tokens").cast("double") * col("n_tokens").cast("double")),
            6).as("yule_k"))
        .orderBy(col("source"))
    }),

    // SAX symbolic representation (Lin et al. 2003) — each user's
    // metric series compressed to a short symbol string: PAA chunks
    // of 4 events (exact integer chunk SUMS — no division, the ×4
    // trick), a data-adaptive 4-letter alphabet via per-user quartile
    // ntile on the (sum, chunk) total order, and the string assembled
    // in chunk order. The representation motifs/anomaly miners index
    // at scale; everything rides user-keyed windows + one hash agg.
    "q_window_sax" -> ((s, dir) => {
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTile = Window.partitionBy(col("user_id"))
        .orderBy(col("csum"), col("chunk"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          cents(col("value")).as("x"))
        .withColumn("chunk", expr(
          "cast((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) div 4 as bigint)"))
        .groupBy(col("user_id"), col("chunk"))
        .agg(sum(col("x")).as("csum"), count(lit(1)).as("cn"))
        .filter(col("cn") === 4) // ragged tail chunks drop (classic PAA)
        .withColumn("tile", ntile(4).over(wTile))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_chunks"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(chunk, char(96 + tile) AS sym))), e -> e.sym), '')")
            .as("sax"))
        .orderBy(col("user_id"))
    }),

    // Minimum detectable effect — the experiment-design readout next
    // to q_sample_srm/q_events_did: for the parity cohorts, the
    // smallest mean lift a 95%-power-80% two-sample test can see,
    // MDE = 2.8·σ_pooled·√(2/n̄) with σ_pooled from exact decimal
    // moment sums and n̄ the harmonic mean of the cohort sizes — one
    // conditional-sum hash agg over one scan, one mirrored formula.
    "q_events_mde" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      def csum(cond: org.apache.spark.sql.Column,
          e: org.apache.spark.sql.Column) =
        sum(when(cond, e).otherwise(lit(0L)).cast(dec))
      val a = col("treat") === 0
      val b = col("treat") === 1
      t(s, dir, "events")
        .select(expr("user_id % 2").as("treat"), cents(col("value")).as("x"))
        .agg(sum(when(a, 1L).otherwise(0L)).as("n_a"),
          sum(when(b, 1L).otherwise(0L)).as("n_b"),
          csum(a, col("x")).as("s_a"), csum(b, col("x")).as("s_b"),
          csum(a, col("x") * col("x")).as("ss_a"),
          csum(b, col("x") * col("x")).as("ss_b"))
        .select(col("n_a"), col("n_b"),
          col("n_a").cast("double").as("na"),
          col("n_b").cast("double").as("nb"),
          col("s_a").cast("double").as("dsa"),
          col("s_b").cast("double").as("dsb"),
          col("ss_a").cast("double").as("dssa"),
          col("ss_b").cast("double").as("dssb"))
        .withColumn("var_pooled",
          ((col("dssa") - col("dsa") * col("dsa") / col("na")) +
            (col("dssb") - col("dsb") * col("dsb") / col("nb"))) /
            (col("na") + col("nb") - 2.0d))
        .select(col("n_a"), col("n_b"),
          (round(sqrt(col("var_pooled")), 4) + lit(0.0)).as("sd_pooled_c"),
          (round(lit(2.8d) * sqrt(col("var_pooled")) *
            sqrt(lit(2.0d) / (lit(2.0d) * col("na") * col("nb") /
              (col("na") + col("nb")))), 4) + lit(0.0)).as("mde_c"))
    }),

    // Wide-table feature denormalization — materializing the training
    // table a feature store actually ships: one row per order carrying
    // the full dimension path (customer segment → nation → region,
    // each dim explicitly broadcast) plus the fact rollup (per-order
    // lineitem features from ONE partial+final hash agg, joined on the
    // shared orderkey). No aggregation of the output — this is the
    // enrichment-materialization shape, distinct from every TPC-H
    // rollup; at 100 TB the only real shuffle is fact-rollup ⋈ orders.
    "q_feature_wide" -> ((s, dir) => {
      val liFeat = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          max(cents(col("l_discount"))).as("max_disc_c"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("o_total_c"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .join(liFeat, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          col("n_name").as("nation"), col("r_name").as("region"),
          col("o_total_c"), col("n_items"), col("sum_qty"),
          col("sum_price_c"), col("max_disc_c"))
        .orderBy(col("o_orderkey"))
    }),

    // IVF+ADC — the composed production vector index (Jégou et al.
    // 2011, what FAISS ships as IVFADC): the coarse k-means quantizer
    // routes each query to its nprobe=2 nearest lists (exact integer
    // centroid distances), and candidates inside the probed lists are
    // scored by ASYMMETRIC distance — codes looked up in the per-query
    // LUT, never the raw vectors. Both halves are individually
    // oracled (q_ann_ivf_multiprobe, q_ann_adc); this query pins that
    // they COMPOSE: routing prunes the candidate stream, the LUT join
    // replaces the O(d) per-pair arithmetic with a code lookup. Every
    // join is a broadcast (probes, LUT) or an equi-join on bounded
    // keys — the index shape that serves 100 TB of vectors.
    "q_ann_ivfadc" -> ((s, dir) => {
      val (fit, cents) = kmeansFitFull(s, dir)
      val assign = fit.select(col("vec_id"), col("cid"), col("v"))
        .withColumn("norm2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val centDf = s.createDataFrame(
        cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq)
        .toDF("pcid", "c")
        .withColumn("cnorm", graft.functions.ArrayMath.dotL(col("c"), col("c")))
      val wProbe = Window.partitionBy(col("qid"))
        .orderBy(col("cdist"), col("pcid"))
      val probes = assign.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("norm2").as("qn"))
        .join(broadcast(centDf))
        .select(col("qid"), col("pcid"),
          (col("qn") + col("cnorm") - lit(2L) *
            graft.functions.ArrayMath.dotL(col("qv"), col("c"))).as("cdist"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("qid"), col("pcid"))
      val (_, codebook) = pqSubs(s, dir)
      val (codes, lut) = pqCodesLut(s, dir, codebook)
      val cand = assign.select(col("vec_id"), col("cid"))
        .join(broadcast(probes),
          col("pcid") === col("cid") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"))
      val scored = cand.join(codes, Seq("vec_id"))
        .join(broadcast(lut), Seq("qid", "sub", "code"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("lut_d2")).as("adc_d2"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("adc_d2"), col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("vec_id").as("nb"), col("adc_d2"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Stationary distribution of the event-type Markov chain — where
    // user behavior settles in the long run (the steady-state readout
    // on top of q_events_markov's transition matrix): three power
    // iterations π←πP from the uniform start, every mixed double sum
    // folded in src order (the q_agg_anova determinism rule). The
    // matrix is bounded by the type vocabulary, so after the one
    // corpus-wide window+agg that builds it, the iterations cost
    // nothing at any corpus size.
    "q_events_markov_stationary" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("src"))).cast("double"))
        .select(col("src"), col("dst"), col("p"))
        .localCheckpoint(true)
      val k = trans.select(col("src")).distinct().count() // bounded vocab
      var pi = trans.select(col("src").as("etype")).distinct()
        .withColumn("pi", lit(1.0d / k))
      for (_ <- 1 to 3) {
        pi = trans.join(pi, col("src") === col("etype"))
          .select(col("dst"), col("src"), (col("pi") * col("p")).as("term"))
          .groupBy(col("dst"))
          .agg(aggregate(
            sort_array(collect_list(struct(col("src"), col("term")))),
            lit(0.0d), (a, e) => a + e.getField("term")).as("pi"))
          .withColumnRenamed("dst", "etype")
      }
      pi.select(col("etype").as("event_type"),
          (round(col("pi"), 6) + lit(0.0)).as("pi"))
        .orderBy(col("event_type"))
    }),

    // OHLC downsampling — the canonical time-series bar: per
    // (user, day), the metric's Open (first by the unique (ts,
    // event_id) order), High, Low, Close (last), and tick count. One
    // user-keyed window pass marks the endpoints, one hash agg folds
    // the bar — the resample-to-coarser-grain shape every metrics
    // store runs before charting/retention. All-long arithmetic.
    "q_window_ohlc" -> ((s, dir) => {
      val wDay = Window.partitionBy(col("user_id"), col("day"))
      val asc = wDay.orderBy(col("ts"), col("event_id"))
      val desc = wDay.orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("unix_timestamp(ts) div 86400").as("day"),
          cents(col("value")).as("x"))
        .withColumn("ra", row_number().over(asc))
        .withColumn("rd", row_number().over(desc))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_ticks"),
          min(when(col("ra") === 1, col("x"))).as("open_c"),
          max(col("x")).as("high_c"),
          min(col("x")).as("low_c"),
          min(when(col("rd") === 1, col("x"))).as("close_c"))
        .orderBy(col("user_id"), col("day"))
    }),

    // AMS F₂ sketch (Alon–Matias–Szegedy 1996) — the second frequency
    // moment (self-join size / skew readout) estimated from 9 signed
    // projections: sign_r(tok) from an md5 bit, Z_r = Σ sign·count
    // accumulates exactly as decimal, the estimate is the MEDIAN of
    // the Z² replicas (an exact 5th-of-9 pick, no floats), reported
    // against the exact F₂ with the relative error in one mirrored
    // double ratio. Completes the sketch family next to count-min
    // (point counts), HLL (distincts), Bloom (membership).
    "q_sketch_ams" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val counts = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val f2 = counts.agg(sum((col("c") * col("c")).cast(dec)).as("f2"))
      val reps = counts
        .withColumn("r", explode(sequence(lit(0), lit(8))))
        .withColumn("sign",
          when(pmod(conv(substring(md5(concat(col("r").cast("string"),
            lit(":"), col("tok"))), 1, 8), 16, 10).cast("long"), lit(2L)) === 0,
            1L).otherwise(-1L))
        .groupBy(col("r"))
        .agg(sum((col("sign") * col("c")).cast(dec)).as("z"))
        .withColumn("z2", col("z") * col("z"))
      val est = reps
        .withColumn("rn", row_number().over(
          Window.orderBy(col("z2"), col("r"))))
        .filter(col("rn") === 5)
        .select(col("z2").as("ams_f2"))
      est.join(broadcast(f2))
        .select(col("f2").cast("decimal(38,0)").as("f2_exact"),
          col("ams_f2").cast("decimal(38,0)").as("ams_f2"),
          round(abs(col("ams_f2").cast("double") - col("f2").cast("double")) /
            col("f2").cast("double"), 6).as("rel_err"))
    }),

    // KMV / Theta distinct sketch per source — the k-minimum-values
    // estimator (Bar-Yossef et al. 2002; the Theta-sketch core): keep
    // the K smallest 32-bit token hashes, estimate the distinct count
    // as (K-1)·2³²/h_K. The sketch is K longs per source (mergeable by
    // union-then-truncate — what a 100 TB per-partition rollup ships),
    // vs the exact count's full shuffle. Reported against BOTH the
    // exact distinct-token and distinct-hash counts (the sketch
    // estimates the hash set; collisions are the quantified gap), with
    // the error in exact integer ppm. Sources with < K hashes fall
    // back to their exact count (the sketch is lossless below K).
    "q_sketch_kmv" -> ((s, dir) => {
      val K = 64
      // universe = 3-gram shingles (~1.4k/source), not raw tokens: the
      // synthetic vocabulary is only ~31 words, which would leave every
      // source below K and the estimator path dead code
      val toks = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3)))")).as("tok"))
        .distinct()
        .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      val exact = toks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("h")).as("n_hashes"))
      val hs = toks.select(col("source"), col("h")).distinct()
      val w = Window.partitionBy(col("source")).orderBy(col("h"))
      val kth = hs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === K)
        .select(col("source"), col("h").as("hk"))
      exact.join(kth, Seq("source"), "left")
        .select(col("source"), col("n_tokens"), col("n_hashes"),
          when(col("hk").isNull, col("n_hashes"))
            .otherwise(expr(s"(${K - 1}L * 4294967296L) div hk")).as("est_distinct"))
        .withColumn("err_ppm",
          expr("(abs(est_distinct - n_hashes) * 1000000L) div n_hashes"))
        .orderBy(col("source"))
    }),

    // Exact kNN majority-vote classification — the label-propagation
    // QA every embedding corpus runs (predict a held-out row's label
    // from its 5 nearest labeled neighbors; disagreement flags
    // mislabeled or out-of-distribution rows). Query rows (vec_id ≡ 0
    // mod 10) broadcast; candidates stream through one broadcast
    // join — the identical shape to q_ann_topk, so the 100 TB path
    // (IVF-prune then rescore) drops in unchanged. Distances are
    // exact integer squared-L2; the vote is a hash agg over (query,
    // label) with a deterministic tie-break (more votes, then nearer
    // total distance, then smaller label).
    "q_ann_knn_classify" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("n2", graft.functions.ArrayMath.dotL(col("v"), col("v")))
      val q = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("label").as("true_label"),
          col("v").as("qv"), col("n2").as("qn"))
      val train = e.filter(col("vec_id") % 10 =!= 0)
      val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))
      val nn = train.join(broadcast(q))
        .select(col("qid"), col("true_label"), col("label"), col("vec_id"),
          (col("qn") + col("n2") -
            lit(2L) * graft.functions.ArrayMath.dotL(col("qv"), col("v"))).as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
      val vw = Window.partitionBy(col("qid"))
        .orderBy(col("votes").desc, col("sum_d2"), col("label"))
      nn.groupBy(col("qid"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("votes"), sum(col("d2")).as("sum_d2"))
        .withColumn("vr", row_number().over(vw))
        .filter(col("vr") === 1)
        .select(col("qid"), col("true_label"), col("label").as("pred_label"),
          when(col("label") === col("true_label"), 1L).otherwise(0L).as("hit"))
        .orderBy(col("qid"))
    }),

    // Bollinger band breaches — the rolling mean ± 2σ envelope over a
    // 20-tick window per event type, the stock volatility monitor. The
    // breach predicate |x − mean| > 2σ is cross-multiplied into pure
    // integers: (n·x − sx)² > 4·(n·sx2 − sx²) — no division, no
    // floats, bit-exact in both engines (cents ≤ ~10⁶, n = 20, so the
    // square tops out near 2⁴⁹). One partitioned window frame, fully
    // codegen'd; warm-up rows (n < 20) are reported unbreached with
    // their n so the consumer can mask them.
    "q_window_bollinger" -> ((s, dir) => {
      val ord = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
        .withColumn("n", count(lit(1)).over(ord))
        .withColumn("sx", sum(col("c")).over(ord))
        .withColumn("sx2", sum(col("c") * col("c")).over(ord))
        .withColumn("dev", col("n") * col("c") - col("sx"))
        .withColumn("breach",
          when(col("n") === 20 &&
            col("dev") * col("dev") >
              lit(4L) * (col("n") * col("sx2") - col("sx") * col("sx")),
            signum(col("dev")).cast("long")).otherwise(0L))
        .select(col("event_type"), col("event_id"), col("n"), col("breach"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Markov entropy rate of the event-type process — the conditional
    // token-distribution entropy H(next | current) per source state,
    // the sequence-predictability readout next to q_events_markov
    // (transition matrix) and q_agg_entropy (marginal entropy). Same
    // EXACT integer floor(log2) surprisal trick: bits(s→d) =
    // n_sd · floor(log2(n_s / n_sd)); two hash aggs and one equi-join
    // on the bounded event-type vocabulary — nothing scales with the
    // corpus except the one transition count shuffle.
    "q_events_entropy_rate" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_sd"))
      val tot = trans.groupBy(col("src"))
        .agg(sum(col("n_sd")).as("n_s"), count(lit(1)).as("n_dst"))
      trans.join(tot, Seq("src"))
        .select(col("src"), col("n_s"), col("n_dst"),
          (col("n_sd") * (length(expr("bin(n_s div n_sd)")) - 1).cast("long")).as("bits"))
        .groupBy(col("src"), col("n_s"), col("n_dst"))
        .agg(sum(col("bits")).as("sum_bits"))
        .select(col("src"), col("n_s"), col("n_dst"), col("sum_bits"),
          expr("(sum_bits * 1000000L) div n_s").as("cond_bits_ppm"))
        .orderBy(col("src"))
    }),

    // STL-lite seasonal decomposition of the daily event series —
    // x(day) = trend + seasonal(dow) + remainder, the first chart any
    // metrics review opens. Trend is a centered 7-day rolling mean;
    // the per-weekday seasonal is the mean detrended value. All
    // integer: both means use FLOOR division made sign-safe by the
    // pmod shift (a - pmod(a, n)) div n ≡ floor(a/n) — Spark `div`
    // and DuckDB `//` truncate toward zero, so raw negative detrended
    // sums would round differently; the shift makes the dividend
    // non-negative and the identity exact in both engines. One hash
    // agg to days, one 7-row window, one bounded dow agg.
    "q_events_stl" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
      val trended = daily
        .withColumn("trend",
          expr("(sum(c) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) div " +
            "(count(*) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))"))
        .withColumn("dow", pmod(col("day"), lit(7L)))
        .withColumn("d", col("c") - col("trend"))
      val seasonal = trended.groupBy(col("event_type"), col("dow"))
        .agg(expr("sum(d)").as("sd"), count(lit(1)).as("nd"))
        .select(col("event_type"), col("dow"),
          expr("((sd + nd * 1000000000L) - pmod(sd + nd * 1000000000L, nd)) div nd - 1000000000L")
            .as("seasonal"))
      trended.join(seasonal, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("c"), col("trend"),
          col("seasonal"),
          (col("c") - col("trend") - col("seasonal")).as("remainder"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Lead-lag cross-correlation sweep — which metric MOVES FIRST: for
    // every ordered event-type pair, the exact five-sum Pearson r
    // between a's daily counts and b's, at every lag in [-3, +3] days.
    // The day-grain table is bounded by the time span, so the 7-lag
    // fan-out and pair join never scale with the event count; sums
    // accumulate as decimal(38,0), ONE double formula at the end, and
    // degenerate windows (n < 3 or zero variance) are filtered in both
    // engines so no NaN reaches the hash.
    "q_events_crosscorr" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val a = daily.select(col("event_type").as("ta"), col("day"), col("c").as("x"))
        .withColumn("lag", explode(sequence(lit(-3), lit(3))))
      val b = daily.select(col("event_type").as("tb"),
        col("day").as("bday"), col("c").as("y"))
      a.join(b, col("ta") < col("tb") &&
          col("day") === col("bday") + col("lag"))
        .groupBy(col("ta"), col("tb"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .filter(col("n") >= 3 &&
          col("sxx") * col("n") > col("sx") * col("sx") &&
          col("syy") * col("n") > col("sy") * col("sy"))
        .select(col("ta"), col("tb"), col("lag").cast("long").as("lag"), col("n"),
          (round((col("sxy").cast("double") * col("n").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("sxx").cast("double") * col("n").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
             sqrt(col("syy").cast("double") * col("n").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
            + lit(0.0)).as("r"))
        .orderBy(col("ta"), col("tb"), col("lag"))
    }),

    // Relative Strength Index (Wilder) over a 14-tick window per event
    // type — the bounded-oscillator momentum readout next to
    // q_window_bollinger (envelope) and q_window_ohlc (bars). Tick
    // deltas split into gain/loss parts (both non-negative), rolling
    // 14-row sums, and RSI = 100·sg/(sg+sl) reported in exact integer
    // ppm — non-negative everywhere, so Spark div and DuckDB // agree
    // with no sign shift. Flat windows (sg+sl = 0) pin to the neutral
    // 500000 ppm by convention.
    "q_window_rsi" -> ((s, dir) => {
      val ord = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id"))
      val fr = ord.rowsBetween(-13, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
        .withColumn("delta",
          coalesce(col("c") - lag(col("c"), 1).over(ord), lit(0L)))
        .withColumn("sg", sum(greatest(col("delta"), lit(0L))).over(fr))
        .withColumn("sl", sum(greatest(-col("delta"), lit(0L))).over(fr))
        .withColumn("n", count(lit(1)).over(fr))
        .select(col("event_type"), col("event_id"), col("n"),
          when(col("sg") + col("sl") === 0L, 500000L)
            .otherwise(expr("(sg * 1000000L) div (sg + sl)")).as("rsi_ppm"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    // over the word co-occurrence graph, the graph-based counterpart
    // to q_text_rake (frequency-based) and q_text_tfidf (corpus-IDF).
    // Adjacent-token pairs (window 2, candidates ≥ 4 chars) become
    // undirected edges; 3 integer power iterations rank the vocabulary
    // via the SAME fixed-point pagerankFp used by q_graph_pagerank
    // (150000 + 85·m div 100 damping, all-long arithmetic, one
    // equi-join + partial/final sum per round); top 20 keywords by
    // (rank desc, token). Edges are built with an arrays_zip of
    // adjacent slices — no window over the token stream, so the
    // extraction is one generator pass at any corpus size.
    "q_text_textrank" -> ((s, dir) => {
      val adj = t(s, dir, "documents")
        .select(split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 2)
        .select(expr(
          "explode(arrays_zip(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1)))").as("p"))
        .select(col("p.0").as("a"), col("p.1").as("b"))
        .filter(length(col("a")) >= 4 && length(col("b")) >= 4 &&
          col("a") =!= col("b"))
      val edges = adj.select(col("a").as("src"), col("b").as("dst"))
        .union(adj.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
      val nodes = edges.select(col("src").as("id")).distinct()
      pagerankFp(nodes, edges, 3)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("pr").desc, col("id"))))
        .filter(col("rn") <= 20)
        .select(col("rn").cast("long").as("rank"),
          col("id").as("keyword"), col("pr"))
        .orderBy(col("rank"))
    }),

    // Theil–Sen robust trend — the median of all pairwise slopes of
    // the daily series per event type, the outlier-proof line fit next
    // to q_agg_regression (OLS, mean-based). The day-grain table is
    // bounded by the time span, so the O(days²) pair fan-out is a
    // constant-size join at any event count. Slopes compare as IEEE
    // doubles (identical division in both engines); the median is the
    // exact lower-middle pick under a (slope, day_i, day_j) total
    // order — deterministic even with tied slopes.
    "q_agg_theilsen" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val b = daily.select(col("event_type").as("tb"),
        col("day").as("dj"), col("c").as("cj"))
      val slopes = daily.join(b,
          col("event_type") === col("tb") && col("day") < col("dj"))
        .select(col("event_type"), col("day").as("di"), col("dj"),
          ((col("cj") - col("c")).cast("double") /
            (col("dj") - col("day")).cast("double")).as("slope"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("slope"), col("di"), col("dj"))
      slopes
        .withColumn("rn", row_number().over(w))
        .withColumn("np", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .filter(col("rn") === expr("(np + 1L) div 2L"))
        .select(col("event_type"), col("np").as("n_pairs"),
          (round(col("slope"), 6) + lit(0.0)).as("median_slope"))
        .orderBy(col("event_type"))
    }),

    // Average True Range (Wilder) over daily bars per event type — the
    // volatility gauge that closes the bar family (q_window_ohlc makes
    // bars, q_window_bollinger envelopes ticks, q_window_rsi reads
    // momentum). True range = max(high−low, |high−prev_close|,
    // |low−prev_close|) in exact cents; ATR is the 14-bar rolling mean
    // (non-negative, so div/// agree). One day-grain agg, one lag, one
    // rolling frame.
    "q_window_atr" -> ((s, dir) => {
      val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wDay = Window.partitionBy(col("event_type"), col("day"))
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_timestamp(ts) div 86400").as("day"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
        .withColumn("rd", row_number().over(
          wDay.orderBy(col("ts_s").desc, col("event_id").desc)))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("c")).as("high"), min(col("c")).as("low"),
          min(when(col("rd") === 1, col("c"))).as("close"))
        .withColumn("pc", lag(col("close"), 1).over(ord))
        .withColumn("tr",
          when(col("pc").isNull, col("high") - col("low"))
            .otherwise(greatest(col("high") - col("low"),
              abs(col("high") - col("pc")), abs(col("low") - col("pc")))))
        .withColumn("atr", expr(
          "(sum(tr) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) div " +
            "(count(*) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))"))
        .select(col("event_type"), col("day"), col("high"), col("low"),
          col("close"), col("tr"), col("atr"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Mann–Kendall trend test — the non-parametric is-it-trending
    // statistic per event type: S = Σ_{i<j} sign(c_j − c_i) over the
    // daily series (exact integer), Kendall's τ = 2S / (n(n−1)) as ONE
    // double division. Complements q_events_its (level shift) and
    // q_events_changepoint (where it broke): S answers whether a
    // monotone drift exists at all. Day-grain pairs — bounded by the
    // time span, not the event count.
    "q_events_mann_kendall" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val b = daily.select(col("event_type").as("tb"),
        col("day").as("dj"), col("c").as("cj"))
      daily.join(b, col("event_type") === col("tb") && col("day") < col("dj"))
        .groupBy(col("event_type"))
        .agg(sum(signum(col("cj") - col("c")).cast("long")).as("s_stat"),
          count(lit(1)).as("n_pairs"))
        .select(col("event_type"), col("n_pairs"), col("s_stat"),
          (round(col("s_stat").cast("double") / col("n_pairs").cast("double"), 6)
            + lit(0.0)).as("tau"))
        .orderBy(col("event_type"))
    }),

    // HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    // near-dup graph (small id → large id) — the second classic
    // link-analysis fixed point next to q_graph_pagerank: a node is a
    // good authority when good hubs point at it, and vice versa. Two
    // mutual-recursion rounds in exact integers: each pull is one
    // equi-join + partial/final sum keyed by the far endpoint, and the
    // per-round max-normalization ((x·10⁶) div max, non-negative so
    // div agrees with //) replaces the float L2 norm so both engines
    // stay bit-equal. Same 100 TB shape as pagerank: edges shuffle
    // once per pull, the normalizer is a 1-row broadcast.
    "q_graph_hits" -> ((s, dir) => {
      val edges = simhashPairsShared(s, dir)
        .select(col("ia").as("src"), col("ib").as("dst"))
        .localCheckpoint(true)
      val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("id")).distinct()
        .localCheckpoint(true)
      def pull(scores: DataFrame, fromCol: String, toCol: String): DataFrame = {
        val raw = nodes.join(
            edges.join(scores, col(fromCol) === col("id"))
              .groupBy(col(toCol).as("nid")).agg(sum(col("x")).as("v")),
            nodes("id") === col("nid"), "left")
          .select(nodes("id"), coalesce(col("v"), lit(0L)).as("raw"))
        val mx = raw.agg(max(col("raw")).as("mx"))
        raw.crossJoin(broadcast(mx))
          .select(col("id"),
            when(col("mx") > 0, expr("(raw * 1000000L) div mx"))
              .otherwise(0L).as("x"))
      }
      var hub = nodes.withColumn("x", lit(1000000L))
      var auth = hub
      for (_ <- 1 to 2) {
        auth = pull(hub, "src", "dst").localCheckpoint(true)
        hub = pull(auth, "dst", "src").localCheckpoint(true)
      }
      nodes.join(auth.select(col("id").as("aid"), col("x").as("auth")),
          nodes("id") === col("aid"))
        .join(hub.select(col("id").as("hid"), col("x").as("hub")),
          nodes("id") === col("hid"))
        .select(nodes("id").as("doc_id"), col("hub"), col("auth"))
        .orderBy(col("doc_id"))
    }),

    // Hodges–Lehmann pseudo-median — the rank-based location estimator
    // (median of all Walsh averages (cᵢ+cⱼ)/2, i ≤ j) that pairs with
    // q_agg_theilsen's slope: robust to outliers, more efficient than
    // the plain median under symmetry. Day-grain pairs are bounded by
    // the time span; the Walsh sum stays an exact integer (reported in
    // c100 = sum·50) and the median is the lower-middle pick under a
    // (sum, dayᵢ, dayⱼ) total order — no floats anywhere.
    "q_agg_hodges_lehmann" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val b = daily.select(col("event_type").as("tb"),
        col("day").as("dj"), col("c").as("cj"))
      val walsh = daily.join(b,
          col("event_type") === col("tb") && col("day") <= col("dj"))
        .select(col("event_type"), col("day").as("di"), col("dj"),
          (col("c") + col("cj")).as("ws"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ws"), col("di"), col("dj"))
      walsh
        .withColumn("rn", row_number().over(w))
        .withColumn("np", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .filter(col("rn") === expr("(np + 1L) div 2L"))
        .select(col("event_type"), col("np").as("n_walsh"),
          (col("ws") * 50L).as("hl_c100"))
        .orderBy(col("event_type"))
    }),

    // Wilson score interval (z = 2, ~95%) for per-type success rates —
    // the binomial CI that stays sane at extreme rates and small n,
    // which is why every ranking/AB readout uses it over the normal
    // approximation. Success = value above 50.00; counts are exact
    // integers from one hash agg, and the interval is the closed-form
    // (s + 2 ± 2·√(s(n−s)/n + 1)) / (n + 4) — IEEE sqrt/div are
    // correctly rounded, so both engines emit identical doubles.
    "q_events_wilson_ci" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(cents(col("value")) > 5000L, 1L).otherwise(0L)).as("s"))
        .select(col("event_type"), col("n"), col("s"),
          expr("(s * 1000000L) div n").as("rate_ppm"),
          (round(expr("""(cast(s as double) + 2.0d
                        | - 2.0d * sqrt(cast(s as double) * cast(n - s as double)
                        |                / cast(n as double) + 1.0d))
                        | / (cast(n as double) + 4.0d)""".stripMargin), 6)
            + lit(0.0)).as("wilson_lo"),
          (round(expr("""(cast(s as double) + 2.0d
                        | + 2.0d * sqrt(cast(s as double) * cast(n - s as double)
                        |                / cast(n as double) + 1.0d))
                        | / (cast(n as double) + 4.0d)""".stripMargin), 6)
            + lit(0.0)).as("wilson_hi"))
        .orderBy(col("event_type"))
    }),

    // k-anonymity GENERALIZATION — the release itself, not just the
    // q_privacy_kanon audit: quasi-identifier classes (lang, 100-char
    // length bucket) with k ≥ 5 release at level 0; failing rows
    // re-generalize to 500-char buckets and release at level 1 if the
    // COARSENED class (of still-unreleased rows) reaches k; the rest
    // are suppressed into the per-lang '*' cell. Two hash aggs and a
    // broadcast anti-join on the bounded class vocabulary — the
    // generalization lattice walk every Mondrian-style anonymizer
    // bottoms out in, with zero row-level state on the driver.
    "q_privacy_generalize" -> ((s, dir) => {
      val rows = t(s, dir, "documents")
        .select(col("lang"), expr("n_chars div 100").as("b0"),
          expr("n_chars div 500").as("b1"))
      val lvl0 = rows.groupBy(col("lang"), col("b0"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 5)
      val rest = rows.join(lvl0.select(col("lang").as("l0"), col("b0").as("k0")),
          col("lang") === col("l0") && col("b0") === col("k0"), "left_anti")
      val lvl1 = rest.groupBy(col("lang"), col("b1"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 5)
      val supp = rest.join(lvl1.select(col("lang").as("l1"), col("b1").as("k1")),
          col("lang") === col("l1") && col("b1") === col("k1"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      lvl0.select(lit(0L).as("level"), col("lang"),
          col("b0").cast("string").as("bucket"), col("n"))
        .unionByName(lvl1.select(lit(1L).as("level"), col("lang"),
          col("b1").cast("string").as("bucket"), col("n")))
        .unionByName(supp.select(lit(2L).as("level"), col("lang"),
          lit("*").as("bucket"), col("n")))
        .orderBy(col("level"), col("lang"), col("bucket"))
    }),

    // Kruskal–Wallis H — the k-group rank test (Mann–Whitney's
    // many-group extension): do the event types draw from one value
    // distribution? Tie-exact midranks carried as INTEGER doubled
    // ranks (2·midrank = 2·min_rank + ties − 1), per-group sums exact,
    // and H = 3/(N(N+1)) · Σ (2R_i)²/(4 n_i) − 3(N+1) evaluated as ONE
    // double formula from the exact sums. The global rank window
    // orders by (cents, event_id) value only through rank(cents) —
    // ties resolved by midrank, not position — so the statistic is
    // order-independent and engine-portable.
    "q_events_kruskal_wallis" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
      val byVal = e.groupBy(col("c")).agg(count(lit(1)).as("ct"))
        .withColumn("rk", sum(col("ct")).over(
          Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("c").as("vc"),
          (lit(2L) * (coalesce(col("rk"), lit(0L)) + 1L) + col("ct") - 1L).as("r2"))
      val grp = e.join(byVal, col("c") === col("vc"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_i"), sum(col("r2")).as("sum_r2"))
      val tot = grp.agg(sum(col("n_i")).as("n_tot"))
      // the 5 per-group double terms fold in SORTED group order (the
      // markov_stationary trick) so the float summation order is
      // deterministic in both engines
      grp.crossJoin(broadcast(tot))
        .withColumn("term",
          expr("""cast(sum_r2 as double) * cast(sum_r2 as double)
                 | / (4.0d * cast(n_i as double))""".stripMargin))
        .groupBy(col("n_tot"))
        .agg(count(lit(1)).as("n_groups"),
          aggregate(sort_array(collect_list(struct(col("event_type"), col("term")))),
            lit(0.0d), (a, e) => a + e.getField("term")).as("st"))
        .select(col("n_tot"), col("n_groups"),
          (round(expr("""3.0d * st / (cast(n_tot as double) * cast(n_tot + 1 as double))
                        | - 3.0d * cast(n_tot + 1 as double)""".stripMargin), 6)
            + lit(0.0)).as("h_stat"))
    }),

    // Count-Sketch (Charikar–Chen–Farach-Colton 2002) — the SIGNED
    // count-min: 5 rows × 16 buckets of sign-weighted counts (width
    // 16 on the ~31-token vocabulary FORCES collisions — at 256 the
    // sketch would be a collision-free identity and the median pick
    // dead code), point estimate = MEDIAN over rows of sign·bucket
    // (an exact 3rd-of-5 pick), probed for the 20 largest exact
    // tokens and reported with the signed error. Unlike count-min
    // (biased up), the median of signed projections is unbiased under
    // collisions — this entry closes the sketch family's frequency
    // corner (bloom=membership, HLL/KMV=distincts, AMS=F₂,
    // count-min=upper bound). Sketch build is ONE partial+final hash
    // agg over (row, bucket) — 80 cells regardless of corpus size.
    "q_sketch_countsketch" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val fan = counts
        .withColumn("r", explode(sequence(lit(0), lit(4))))
        .withColumn("h", conv(substring(md5(concat(col("r").cast("string"),
          lit(":"), col("tok"))), 1, 8), 16, 10).cast("long"))
        .withColumn("b", pmod(col("h"), lit(16L)))
        .withColumn("sgn",
          when(pmod(expr("h div 16"), lit(2L)) === 0, 1L).otherwise(-1L))
      val sketch = fan.groupBy(col("r").as("sr"), col("b").as("sb"))
        .agg(sum(col("sgn") * col("c")).as("cell"))
      val top = counts
        .withColumn("rn", row_number().over(
          Window.orderBy(col("c").desc, col("tok"))))
        .filter(col("rn") <= 20).drop("rn")
      val probes = top
        .withColumn("r", explode(sequence(lit(0), lit(4))))
        .withColumn("h", conv(substring(md5(concat(col("r").cast("string"),
          lit(":"), col("tok"))), 1, 8), 16, 10).cast("long"))
        .withColumn("b", pmod(col("h"), lit(16L)))
        .withColumn("sgn",
          when(pmod(expr("h div 16"), lit(2L)) === 0, 1L).otherwise(-1L))
        .join(sketch, col("r") === col("sr") && col("b") === col("sb"))
        .select(col("tok"), col("c"), col("r"), (col("sgn") * col("cell")).as("est"))
      probes
        .withColumn("mrn", row_number().over(
          Window.partitionBy(col("tok")).orderBy(col("est"), col("r"))))
        .filter(col("mrn") === 3)
        .select(col("tok"), col("c").as("c_exact"), col("est").as("cs_est"),
          (col("est") - col("c")).as("err"))
        .orderBy(col("c_exact").desc, col("tok"))
    }),

    // Rocchio / nearest-centroid classification — the linear
    // counterpart to q_ann_knn_classify: per-label integer centroids
    // (sign-safe floored per-dim means via the pmod shift), then each
    // held-out vector goes to the nearest centroid by exact integer
    // squared-L2, reported as a confusion matrix. The distance join is
    // keyed by DIMENSION (test ⋈ centroids on pos — labels × 64 rows
    // broadcast), so nothing materializes a labels× test fan-out of
    // full vectors; at 100 TB the centroid table is still 640 rows.
    "q_embed_rocchio" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
      val cents64 = e.filter(col("vec_id") % 10 =!= 0)
        .select(col("label"), posexplode(col("v")))
        .groupBy(col("label").as("clabel"), col("pos").as("cpos"))
        .agg(sum(col("col")).as("sx"), count(lit(1)).as("n"))
        .select(col("clabel"), col("cpos"),
          expr("(sx - pmod(sx, n)) div n").as("m"))
      val test = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("qid"), col("label").as("true_label"),
          posexplode(col("v")))
      val d2 = test.join(broadcast(cents64), col("pos") === col("cpos"))
        .groupBy(col("qid"), col("true_label"), col("clabel"))
        .agg(sum((col("col") - col("m")) * (col("col") - col("m"))).as("d2"))
      val w = Window.partitionBy(col("qid")).orderBy(col("d2"), col("clabel"))
      d2.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_label"), col("clabel").as("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("true_label"), col("pred_label"))
    }),

    // Lincoln–Petersen capture–recapture — estimate a population's
    // size from two overlapping samples: the two lexicographically
    // first sources are the "captures", their distinct token sets the
    // marked/recaptured animals, N̂ = n₁·n₂ div m. The ecology
    // estimator is the dedup-QA tool in disguise (how much vocabulary
    // do two crawl slices miss?) — reported against the true union so
    // the bias is visible. Everything is a distinct + hash agg on
    // (source, token); the estimate arithmetic is exact integer.
    "q_sketch_capture_recapture" -> ((s, dir) => {
      val srcs = t(s, dir, "documents").select(col("source")).distinct()
        .withColumn("srn", row_number().over(Window.orderBy(col("source"))))
        .filter(col("srn") <= 2)
      val toks = t(s, dir, "documents")
        .join(broadcast(srcs), Seq("source"))
        .select(col("srn"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .filter(col("tok") =!= "").distinct()
      val marks = toks.groupBy(col("tok"))
        .agg(max(when(col("srn") === 1, 1L).otherwise(0L)).as("in1"),
          max(when(col("srn") === 2, 1L).otherwise(0L)).as("in2"))
      marks.agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
          sum(col("in1") * col("in2")).as("m"),
          count(lit(1)).as("n_union"))
        .filter(col("m") > 0)
        .select(col("n1"), col("n2"), col("m"), col("n_union"),
          expr("(n1 * n2) div m").as("lp_estimate"),
          expr("((n1 * n2) div m - n_union) * 1000000L div n_union").as("bias_ppm"))
    }),

    // McNemar's paired test — do two quality rules disagree
    // systematically on the SAME documents? The 2×2 paired table
    // (length rule ≥ 200 chars vs token rule ≥ 40 tokens) and
    // χ² = (b−c)²/(b+c) from the discordant cells — the right test
    // when comparing two classifiers on one corpus (a two-sample test
    // would ignore the pairing). One scan, one agg, one double ratio.
    "q_eval_mcnemar" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          when(col("n_chars") >= 200, 1L).otherwise(0L).as("ra"),
          when(size(split(col("text"), " ")) >= 40, 1L).otherwise(0L).as("rb"))
        .agg(sum(col("ra") * col("rb")).as("both_pass"),
          sum(col("ra") * (lit(1L) - col("rb"))).as("b"),
          sum((lit(1L) - col("ra")) * col("rb")).as("c"),
          sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("both_fail"))
        .filter(col("b") + col("c") > 0)
        .select(col("both_pass"), col("b"), col("c"), col("both_fail"),
          (round((col("b") - col("c")).cast("double") *
            (col("b") - col("c")).cast("double") /
            (col("b") + col("c")).cast("double"), 6) + lit(0.0)).as("chi2"))
    }),

    // Bucket-exact propensity matching — the observational-causal ATT
    // next to q_events_did/q_events_its: deterministic treatment
    // (user_id parity), users matched WITHIN identical activity-score
    // buckets (exact stratification — the limit of propensity matching
    // as the caliper → 0), each bucket weighted by its matched-pair
    // count w = min(n_t, n_c). Per-bucket means are exact c100
    // integers; the weighted ATT is ONE double division of exact
    // integer sums. Everything is two hash aggs keyed by bounded
    // buckets — no per-pair state, which is what makes matching
    // feasible at 10^9 users.
    "q_events_psm_bucket" -> ((s, dir) => {
      val users = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("outcome_c"), count(lit(1)).as("n_ev"))
        .select(col("user_id"), col("outcome_c"),
          pmod(col("user_id"), lit(2L)).as("treat"),
          expr("n_ev div 10").as("bucket"))
      val strata = users.groupBy(col("bucket"))
        .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("treat") === 1, col("outcome_c"))).as("sum_t"),
          sum(when(col("treat") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("treat") === 0, col("outcome_c"))).as("sum_c"))
        .filter(col("n_t") > 0 && col("n_c") > 0)
        .select(col("bucket"), least(col("n_t"), col("n_c")).as("w"),
          (expr("(sum_t * 100L) div n_t") - expr("(sum_c * 100L) div n_c")).as("diff_c100"))
      strata.agg(count(lit(1)).as("n_buckets"), sum(col("w")).as("n_matched"),
          sum(col("w") * col("diff_c100")).as("num"))
        .select(col("n_buckets"), col("n_matched"),
          (round(col("num").cast("double") / col("n_matched").cast("double") / 100.0, 6)
            + lit(0.0)).as("att"))
    }),

    // Rolling P10/P90 envelope — the distribution-aware band that
    // rolling mean±σ (q_window_bollinger) gets wrong on skewed
    // metrics: the 20-tick frame materializes as a bounded sorted
    // array (collect_list preserves frame order; sort_array makes the
    // pick order-free) and both quantiles are exact lower-index picks
    // — all integers, no interpolation. One type-keyed window
    // exchange; the frame array is ≤ 20 longs, so the state is
    // constant per row at any scale.
    "q_window_rolling_quantiles" -> ((s, dir) => {
      val fr = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id")).rowsBetween(-19, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
        .withColumn("l", sort_array(collect_list(col("c")).over(fr)))
        .select(col("event_type"), col("event_id"),
          size(col("l")).cast("long").as("n"),
          expr("element_at(l, cast((size(l) - 1) div 10 + 1 as int))").as("p10_c"),
          expr("element_at(l, cast((9 * (size(l) - 1)) div 10 + 1 as int))").as("p90_c"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Deterministic pseudo-random graph walk — 3 steps from every node
    // of the near-dup graph, each step choosing the neighbor with the
    // smallest md5(u:step:v) (a seeded hash pick, so the "random" walk
    // is reproducible and engine-portable — the node2vec-style sampler
    // a 100 TB embedding pipeline runs as joins, not per-node RNG
    // state). Each step is one equi-join + one bounded window over the
    // checkpointed edge table; dead ends absorb (stay in place).
    "q_graph_walk" -> ((s, dir) => {
      val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
        .localCheckpoint(true)
      val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("id")).distinct()
      def step(cur: DataFrame, posCol: String, k: Int, outCol: String): DataFrame = {
        val w = Window.partitionBy(col("wid")).orderBy(col("hk"), col("dst"))
        val nxt = cur.join(edges, col(posCol) === col("src"))
          .withColumn("hk", md5(concat(col(posCol).cast("string"),
            lit(s":$k:"), col("dst").cast("string"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("wid").as("nid"), col("dst").as(outCol))
        cur.join(nxt, col("wid") === col("nid"), "left")
          .drop("nid")
          .withColumn(outCol, coalesce(col(outCol), col(posCol)))
      }
      val s0 = nodes.select(col("id").as("wid"), col("id").as("p0"))
      val s3 = step(step(step(s0, "p0", 1, "p1"), "p1", 2, "p2"), "p2", 3, "p3")
      s3.select(col("wid").as("doc_id"), col("p1"), col("p2"), col("p3"))
        .orderBy(col("doc_id"))
    }),

    // LSH candidate Hamming histogram — the threshold-tuning
    // diagnostic behind q_dedup_simhash_pairs: the full distance
    // distribution of banded candidates (BEFORE the ham ≤ 3 cut), so
    // the operator's precision/recall trade-off at each threshold is
    // read off one table. Same banded equi-join as the dedup path —
    // never all-pairs — then one bounded 33-bucket hash agg.
    "q_dedup_hamming_hist" -> ((s, dir) => {
      val bands = simhashes(t(s, dir, "documents").filter(col("doc_id") < 1000))
        .select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("key", expr("shiftright(simhash, band * 8) & 255"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
          expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("ham"))
        .distinct()
        .groupBy(col("ham")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("ham"))
    }),

    // Delta-method CI for a RATIO metric — the AB-testing estimator
    // for revenue-per-event when the USER is the randomization unit
    // (naive per-event variance is wrong under within-user
    // correlation; the delta method linearizes R = ΣX/ΣY around the
    // means). Five exact decimal sums per type over user-level
    // totals, then R̂, Var(R̂) = (Sxx − 2R̂Sxy + R̂²Syy)/(n·ȳ²·n), and a
    // ±2se interval — the double formula text is mirrored
    // token-for-token in the oracle so both engines round identically.
    "q_events_ratio_delta" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val u = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents(col("value"))).as("x"), count(lit(1)).as("y"))
      u.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("y") * col("y")).cast(dec)).as("syy"))
        .select(col("event_type"), col("n"),
          expr("""round(cast(sx as double) / cast(sy as double), 6) + 0.0d""")
            .as("ratio_c"),
          expr("""round(sqrt(greatest(0.0d,
                 |  ((cast(sxx as double) - cast(sx as double) * cast(sx as double) / cast(n as double))
                 |   - 2.0d * (cast(sx as double) / cast(sy as double))
                 |     * (cast(sxy as double) - cast(sx as double) * cast(sy as double) / cast(n as double))
                 |   + (cast(sx as double) / cast(sy as double)) * (cast(sx as double) / cast(sy as double))
                 |     * (cast(syy as double) - cast(sy as double) * cast(sy as double) / cast(n as double)))
                 |  / (cast(n as double) - 1.0d)
                 |  / (cast(n as double)
                 |     * (cast(sy as double) / cast(n as double))
                 |     * (cast(sy as double) / cast(n as double))))), 6) + 0.0d""".stripMargin)
            .as("se_c"))
        .orderBy(col("event_type"))
    }),

    // Binary-embedding Hamming kNN — the 64×-compression retrieval
    // path (sign-bit vectors, XOR-popcount distance) scored for what
    // it keeps: top-5 by Hamming vs the exact integer-L2 top-5,
    // overlap in ppm per query. Bits pack into TWO 32-bit halves (a
    // 1<<63 would overflow DuckDB's checked shift), so the signature
    // is 2 longs per vector — the memory-bound regime a 10^11-vector
    // index actually runs in. Both rankings ride the same broadcast
    // candidate join as q_ann_topk.
    "q_embed_hamming_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
        .withColumn("b0", expr(
          """aggregate(zip_with(slice(v, 1, 32), sequence(0, 31),
            |  (x, i) -> CASE WHEN x > 0 THEN shiftleft(1L, cast(i as int)) ELSE 0L END),
            |  0L, (a, e) -> a + e)""".stripMargin))
        .withColumn("b1", expr(
          """aggregate(zip_with(slice(v, 33, 32), sequence(0, 31),
            |  (x, i) -> CASE WHEN x > 0 THEN shiftleft(1L, cast(i as int)) ELSE 0L END),
            |  0L, (a, e) -> a + e)""".stripMargin))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("b0").as("q0"), col("b1").as("q1"))
      val cand = e.as("c").join(broadcast(q), col("qid") =!= col("c.vec_id"))
      val wH = Window.partitionBy(col("qid")).orderBy(col("ham"), col("nb"))
      val topH = cand
        .select(col("qid"), col("c.vec_id").as("nb"),
          (expr("bit_count(q0 ^ c.b0)") + expr("bit_count(q1 ^ c.b1)"))
            .cast("long").as("ham"))
        .withColumn("rn", row_number().over(wH)).filter(col("rn") <= 5)
        .select(col("qid"), col("nb"))
      val wE = Window.partitionBy(col("qid")).orderBy(col("d2"), col("nb"))
      val topE = cand
        .select(col("qid"), col("c.vec_id").as("nb"),
          expr("aggregate(zip_with(qv, c.v, (a, b) -> (a - b) * (a - b)), 0L, (x, y) -> x + y)")
            .as("d2"))
        .withColumn("rn", row_number().over(wE)).filter(col("rn") <= 5)
        .select(col("qid").as("eqid"), col("nb").as("enb"))
      topH.join(topE, col("qid") === col("eqid") && col("nb") === col("enb"),
          "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap"))
        .select(col("qid"), col("n_overlap"),
          expr("(n_overlap * 1000000L) div 5").as("recall_ppm"))
        .orderBy(col("qid"))
    }),

    // Bottom-k (KMV) Jaccard between two corpus slices — the
    // one-pass sketch for "how much do these two crawls overlap"
    // WITHOUT materializing either token set: the k smallest hashes
    // of the UNION form a uniform sample of it, so the fraction of
    // the sample present in both sides estimates J directly
    // (Broder's theorem — the same principle as per-doc MinHash, but
    // corpus-level and mergeable). Estimate vs exact, error in ppm;
    // everything before the k-row pick is a hash agg on tokens.
    "q_sketch_bottomk_jaccard" -> ((s, dir) => {
      val K = 128
      val srcs = t(s, dir, "documents").select(col("source")).distinct()
        .withColumn("srn", row_number().over(Window.orderBy(col("source"))))
        .filter(col("srn") <= 2)
      // 3-gram shingle universe (like q_sketch_kmv): raw tokens are a
      // ~31-word vocabulary shared by every source — J would be 1.0
      // and the bottom-k sample smaller than k
      val marks = t(s, dir, "documents")
        .join(broadcast(srcs), Seq("source"))
        .select(col("srn"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("srn"), explode(expr(
          "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3)))")).as("tok"))
        .distinct()
        .groupBy(col("tok"))
        .agg(max(when(col("srn") === 1, 1L).otherwise(0L)).as("in1"),
          max(when(col("srn") === 2, 1L).otherwise(0L)).as("in2"))
        .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
        .localCheckpoint(true)
      val exact = marks.agg(sum(col("in1") * col("in2")).as("m"),
        count(lit(1)).as("u"))
      val bk = marks
        .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("tok"))))
        .filter(col("rn") <= K)
        .agg(count(lit(1)).as("k_used"),
          sum(col("in1") * col("in2")).as("k_both"))
      bk.join(broadcast(exact))
        .select(col("k_used"), col("k_both"),
          expr("(k_both * 1000000L) div k_used").as("est_jac_ppm"),
          expr("(m * 1000000L) div u").as("exact_jac_ppm"))
        .withColumn("err_ppm", abs(col("est_jac_ppm") - col("exact_jac_ppm")))
    }),

    // Personalized PageRank — random-walk-with-restart mass anchored
    // to a seed set (every 100th doc), the standard related-items
    // recommender over the near-dup graph: teleport goes ONLY to
    // seeds (pr = 150000·seed + 85·mass div 100, all-long fixed
    // point), so rank concentrates in the seeds' neighborhoods
    // instead of spreading globally like q_graph_pagerank. Same
    // per-round equi-join + partial/final sum shape; 3 rounds, oracle
    // unrolled by a shared generator.
    "q_graph_ppr" -> ((s, dir) => {
      val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pairs.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
        .localCheckpoint(true)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "dsrc")
      val nodes = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("id"))
        .withColumn("seed", when(pmod(col("id"), lit(100L)) === 0, 1L).otherwise(0L))
        .distinct().localCheckpoint(true)
      var ranks = nodes.withColumn("pr", col("seed") * 1000000L)
        .select(col("id"), col("pr")).localCheckpoint(true)
      for (_ <- 1 to 3) {
        val prev = ranks
        val mass = edges.join(deg, col("src") === col("dsrc"))
          .join(ranks, col("src") === col("id"))
          .select(col("dst"), expr("pr div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("m"))
        ranks = nodes.join(mass, nodes("id") === mass("dst"), "left")
          .select(nodes("id"),
            expr("150000L * seed + (85L * coalesce(m, 0L)) div 100L").as("pr"))
          .localCheckpoint(true)
        prev.unpersist()
      }
      edges.unpersist()
      ranks.filter(col("pr") > 0)
        .select(col("id").as("doc_id"), col("pr"))
        .orderBy(col("doc_id"))
    }),

    // TIME-decayed rolling value — q_window_ewma decays per ROW; real
    // telemetry decays per ELAPSED TIME (a reading 10 days ago should
    // weigh less than one 10 rows ago). Weight = 2^(20 − gap_days)
    // (dyadic, clamped at 20 days — exact integers, like the trending
    // scorer), the ≤8-row frame materializes as a bounded struct list,
    // and the weighted mean is one fold + one non-negative division.
    // The frame lambda reads the CURRENT row's timestamp — the
    // higher-order-function outer reference both engines support.
    "q_window_time_decay" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id")).rowsBetween(-7, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
        .withColumn("fr", collect_list(struct(col("ts_s"), col("c"))).over(w))
        .select(col("user_id"), col("event_id"),
          size(col("fr")).cast("long").as("n_frame"),
          expr("""aggregate(transform(fr,
                 |  s -> s.c * shiftleft(1L, cast(20 - least(20L, (ts_s - s.ts_s) div 86400) as int))),
                 |  0L, (a, x) -> a + x) * 100L
                 |div aggregate(transform(fr,
                 |  s -> shiftleft(1L, cast(20 - least(20L, (ts_s - s.ts_s) div 86400) as int))),
                 |  0L, (a, x) -> a + x)""".stripMargin).as("decayed_c100"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // b-bit MinHash (Li & König 2010) — keep ONE bit of each of 32
    // MinHash values (32 bits/doc instead of 32×64): for b=1 the
    // agreement fraction a estimates J via Ĵ = max(0, 2a − 1), traded
    // against the full sketch's precision. Estimated vs EXACT Jaccard
    // on the banded candidate pairs, error in ppm — the
    // storage-vs-accuracy readout that decides what a 10^12-doc dedup
    // index actually stores. Signatures are one 32-column min agg
    // (map-side combined); candidates come from the shared LSH pairs,
    // never all-pairs.
    "q_dedup_minhash_bbit" -> ((s, dir) => {
      val toks = t(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id").cast("long").as("did"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val minCols = (0 until 32).map(r =>
        min(conv(substring(md5(concat(lit(s"$r:"), col("tok"))), 1, 8), 16, 10)
          .cast("long")).as(s"m$r"))
      val sigs = toks.groupBy(col("did"))
        .agg(minCols.head, minCols.tail: _*)
        .select(col("did"),
          (0 until 32).map(r => expr(s"(m$r & 1L) << $r")).reduce(_ + _).as("sig"))
        .localCheckpoint(true)
      val pairs = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val est = pairs
        .join(sigs.select(col("did").as("da"), col("sig").as("sa")), col("ia") === col("da"))
        .join(sigs.select(col("did").as("db"), col("sig").as("sb")), col("ib") === col("db"))
        .select(col("ia"), col("ib"),
          (lit(32L) - expr("bit_count(sa ^ sb)")).as("agree"))
        .select(col("ia"), col("ib"),
          greatest(lit(0L), expr("((2L * agree - 32L) * 1000000L) div 32L")).as("est_ppm"))
      val sizes = toks.groupBy(col("did")).agg(count(lit(1)).as("sz"))
      val inter = pairs
        .join(toks.select(col("did").as("ta"), col("tok")), col("ia") === col("ta"))
        .join(toks.select(col("did").as("tb"), col("tok").as("tokb")),
          col("ib") === col("tb") && col("tok") === col("tokb"))
        .groupBy(col("ia").as("xa"), col("ib").as("xb")).agg(count(lit(1)).as("inter"))
      est
        .join(inter, col("ia") === col("xa") && col("ib") === col("xb"), "left")
        .join(sizes.select(col("did").as("za"), col("sz").as("sza")), col("ia") === col("za"))
        .join(sizes.select(col("did").as("zb"), col("sz").as("szb")), col("ib") === col("zb"))
        .select(col("ia"), col("ib"), col("est_ppm"),
          expr("(coalesce(inter, 0L) * 1000000L) div (sza + szb - coalesce(inter, 0L))")
            .as("exact_ppm"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
        .orderBy(col("ia"), col("ib"))
    }),

    // Cochran–Mantel–Haenszel pooled odds ratio — the
    // confounding-adjusted effect next to q_events_odds_ratio (crude)
    // and q_events_psm_bucket (matching): per activity stratum a 2×2
    // of treatment (user parity) × conversion (any purchase), pooled
    // as OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ). Stratum terms are doubles
    // folded in SORTED stratum order (the deterministic-summation
    // rule); the crude OR rides along so Simpson's-paradox gaps are
    // visible in one row. Two bounded hash aggs — nothing scales past
    // the stratum count.
    "q_events_cmh" -> ((s, dir) => {
      // conversion = purchase share ≥ 1/5 (any-purchase would be
      // degenerate: at ~67 events/user every user purchases at least
      // once and the 2×2 loses both negative cells)
      val u = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
        .select(pmod(col("user_id"), lit(2L)).as("treat"),
          when(col("np") * 5L >= col("n_ev"), 1L).otherwise(0L).as("conv"),
          expr("n_ev div 10").as("bucket"))
      val st = u.groupBy(col("bucket"))
        .agg(sum(when(col("treat") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("treat") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("treat") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("treat") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      st.agg(count(lit(1)).as("n_strata"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"),
          sum(col("c")).as("sc"), sum(col("d")).as("sd"),
          aggregate(sort_array(collect_list(struct(col("bucket"),
            (col("a").cast("double") * col("d").cast("double") /
              col("n").cast("double")).as("t")))),
            lit(0.0d), (acc, e) => acc + e.getField("t")).as("num"),
          aggregate(sort_array(collect_list(struct(col("bucket"),
            (col("b").cast("double") * col("c").cast("double") /
              col("n").cast("double")).as("t")))),
            lit(0.0d), (acc, e) => acc + e.getField("t")).as("den"))
        .filter(col("den") > 0.0d && col("sb") * col("sc") > 0)
        .select(col("n_strata"),
          (round(col("num") / col("den"), 6) + lit(0.0)).as("or_mh"),
          (round((col("sa").cast("double") * col("sd").cast("double")) /
            (col("sb").cast("double") * col("sc").cast("double")), 6)
            + lit(0.0)).as("or_crude"))
    }),

    // ε-DP MEAN release — q_privacy_dp_hist releases counts; a mean
    // needs TWO draws (noisy clamped sum with sensitivity 1000, noisy
    // count with sensitivity 1) composed as a ratio. The same exact
    // dyadic inverse-CDF geometric draw (md5-seeded, integer
    // floor-log2 — QueryPropsSpec enumerates its distribution), so
    // the release replays bit-identically in both engines; the true
    // values stay in the output because this AUDITS the mechanism.
    "q_privacy_dp_mean" -> ((s, dir) => {
      def noise(salt: String): Column = {
        val h = s"conv(substring(md5(concat(source, ':$salt')), 1, 5), 16, 10)"
        expr(s"""CASE WHEN pmod($h, 2) = 1
                |  THEN (length(bin(524288 div (($h div 2) + 1))) - 1)
                |  ELSE -(length(bin(524288 div (($h div 2) + 1))) - 1)
                |END""".stripMargin).cast("long")
      }
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(least(col("n_chars"), lit(1000L))).as("sum_clamped"))
        .withColumn("noise_sum", noise("sum") * 1000L)
        .withColumn("noise_n", noise("n"))
        .select(col("source"), col("n"), col("sum_clamped"),
          col("noise_sum"), col("noise_n"),
          expr("""(greatest(0L, sum_clamped + noise_sum) * 100L)
                 | div greatest(1L, n + noise_n)""".stripMargin).as("dp_mean_c100"))
        .orderBy(col("source"))
    }),

    // Empirical-Bayes rate shrinkage — the small-sample ranking fix
    // every leaderboard needs: per-user purchase rates shrunk toward
    // the global rate with prior strength m=100, so a 1/1 user stops
    // outranking a 95/100 user. Raw rate is exact integer ppm; the
    // shrunk rate is ONE mirrored double formula around the global
    // ratio. Two hash aggs (user grain, then a 1-row broadcast).
    "q_events_eb_shrinkage" -> ((s, dir) => {
      val u = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("s"))
      val g = u.agg(sum(col("n")).as("gn"), sum(col("s")).as("gs"))
      u.crossJoin(broadcast(g))
        .select(col("user_id"), col("n"), col("s"),
          expr("(s * 1000000L) div n").as("raw_ppm"),
          (round((col("s").cast("double") + lit(100.0d) *
            (col("gs").cast("double") / col("gn").cast("double"))) /
            (col("n").cast("double") + 100.0d), 6) + lit(0.0)).as("shrunk_rate"))
        .orderBy(col("user_id"))
    }),

    // Local-peak detection with neighbor prominence — the first pass
    // of every alerting pipeline (find the spike days, report how far
    // they stand above both shoulders). Strict-neighbor maxima on the
    // daily series; all integer; one type-keyed window.
    "q_events_peak_detect" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .withColumn("pc", lag(col("c"), 1).over(w))
        .withColumn("nc", lead(col("c"), 1).over(w))
        .filter(col("pc").isNotNull && col("nc").isNotNull &&
          col("c") > col("pc") && col("c") > col("nc"))
        .select(col("event_type"), col("day"), col("c"),
          (col("c") - greatest(col("pc"), col("nc"))).as("prominence"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Daily top-k churn — how stable is the leaderboard: the top-3
    // users by daily event count, overlapped against the previous
    // day's top-3 (equi-join on day+1, never a window over users).
    // High churn means the heavy-hitter set is noise, low churn means
    // skew is structural (and the salting strategy can be static).
    // Day-grain tables bound everything after the first agg.
    "q_events_topk_churn" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("day")).orderBy(col("c").desc, col("user_id"))
      val top = daily.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select(col("day"), col("user_id"))
        .localCheckpoint(true)
      val prev = top.select((col("day") + 1).as("pday"), col("user_id").as("puid"))
      val common = top.join(prev,
          col("day") === col("pday") && col("user_id") === col("puid"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_common"))
      val minDay = top.agg(min(col("day")).as("min_day"))
      top.select(col("day")).distinct()
        .join(common, Seq("day"), "left")
        .crossJoin(broadcast(minDay))
        .filter(col("day") > col("min_day"))
        .select(col("day"), coalesce(col("n_common"), lit(0L)).as("n_common"),
          (lit(3L) - coalesce(col("n_common"), lit(0L))).as("churn"))
        .orderBy(col("day"))
    }),

    // Top user journeys — the first 3 events of every user's stream
    // folded into a path string and ranked: the entry-funnel shape
    // product analytics opens with. One user-keyed window (bounded to
    // 3 rows per user by the rank filter), one path hash agg, one
    // top-10 pick with a total (count desc, path) order.
    "q_events_top_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val paths = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"))
        .agg(concat_ws(">",
          min(when(col("rn") === 1, col("event_type"))),
          min(when(col("rn") === 2, col("event_type"))),
          min(when(col("rn") === 3, col("event_type")))).as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("path"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("path"), col("n"))
        .orderBy(col("rank"))
    }),

    // SoftDeDup down-weighting — instead of DROPPING near-duplicates
    // (q_curate_corpus), keep every document and down-weight it by its
    // duplication mass: w = 10⁶ div component_size, so a 5-way clone
    // cluster contributes one document's worth of gradient in
    // training. Rides the memoized pair→component resolution — one
    // extra bounded hash agg over components, nothing else.
    "q_dedup_soft_weights" -> ((s, dir) => {
      val comps = resolveComponents(s, dir)
      val sizes = comps.groupBy(col("component").as("comp"))
        .agg(count(lit(1)).as("csize"))
      comps.join(sizes, col("component") === col("comp"))
        .select(col("doc_id"), col("component"), col("csize"),
          expr("1000000L div csize").as("weight_ppm"))
        .orderBy(col("doc_id"))
    }),

    // Bloom-prefiltered semi join — the runtime-filter pattern written
    // out explicitly: the dim side's keys fold into a 256-bit bloom
    // (8×32-bit words, one bit_or agg), the bloom broadcasts into the
    // fact scan as a cheap 2-probe membership test, and only the
    // survivors reach the exact semi join. The final aggregate is
    // EXACTLY the plain semi join's (a bloom only false-positives, so
    // hash equality against the bloom-free oracle proves no true
    // member was dropped) — at 100 TB the prefilter is what keeps the
    // fact-side shuffle proportional to matches, not to the corpus.
    "q_join_bloom_prefilter" -> ((s, dir) => {
      val supp = t(s, dir, "supplier")
        .filter(col("s_nationkey") % 5 === 0)
        .select(col("s_suppkey").cast("long").as("k"))
      def h(c: String, off: Int) =
        s"conv(substring(md5(cast($c as string)), ${off}, 8), 16, 10) % 256"
      def contrib(hx: String, w: Int) =
        s"(case when ($hx) div 32 = $w then shiftleft(1L, cast(($hx) % 32 as int)) else 0L end)"
      val wordAggs = (0 until 8).map(w =>
        expr(s"bit_or(${contrib(h("k", 1), w)} | ${contrib(h("k", 9), w)})").as(s"w$w"))
      val bloom = supp.agg(wordAggs.head, wordAggs.tail: _*)
      val warr = s"array(${(0 until 8).map(i => s"w$i").mkString(",")})"
      def member(c: String, off: Int) =
        s"(element_at($warr, cast((${h(c, off)}) div 32 as int) + 1) & " +
          s"shiftleft(1L, cast((${h(c, off)}) % 32 as int))) != 0L"
      val pre = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("lk"),
          col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .crossJoin(broadcast(bloom))
        .filter(expr(member("lk", 1) + " AND " + member("lk", 9)))
      pre.join(broadcast(supp), col("lk") === col("k"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ROC-AUC by the Mann–Whitney rank identity, EXACT: the synthetic
    // binary label y = label%2 and the md5-derived score overlap by
    // construction (y shifts the score by +400 over a 0..999 noise
    // band → AUC ≈ 0.66). Scores live on a BOUNDED support (0..1399),
    // so ranks come from per-score counts + a 1400-row cumulative —
    // never a global per-row window — and tied scores use exact
    // 2-scaled midranks: U2 = Σ_pos(2·cumBelow + cnt + 1) − npos(npos+1),
    // auc_ppm = U2·10⁶ div (2·npos·nneg). At 100 TB the per-score agg
    // is one map-side-combined shuffle; the cumulative is over the
    // support, not the data.
    "q_eval_auc" -> ((s, dir) => {
      val d = t(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint)").as("h"))
        .select(col("y"), (col("y") * 400L + pmod(col("h"), lit(1000L))).as("score"))
      val byScore = d.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byScore
        .withColumn("cum_below", coalesce(sum(col("cnt")).over(w), lit(0L)))
      ranked.agg(
          sum(col("pos")).as("npos"),
          sum(col("cnt") - col("pos")).as("nneg"),
          sum(col("pos") * (lit(2L) * col("cum_below") + col("cnt") + lit(1L))).as("r2"))
        .select(col("npos"), col("nneg"),
          expr("(r2 - npos * (npos + 1)) * 1000000L div (2 * npos * nneg)").as("auc_ppm"))
    }),

    // Expected-calibration-error table, EXACT: predicted probability
    // p_ppm is one md5 stream, the outcome draws from a SECOND md5
    // stream thresholded at p (calibrated in expectation, finite-sample
    // gaps nonzero) — per decile-of-confidence bin: n, accuracy and
    // mean confidence in ppm, and the |acc − conf| gap. All integer
    // arithmetic; one hash-agg over 10 bounded bins.
    "q_eval_ece" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint) % 1000000").as("p_ppm"),
          expr("cast(conv(substring(md5(concat('y', cast(vec_id as string))), 1, 6), 16, 10) as bigint) % 1000000").as("draw"))
        .select(col("p_ppm"), when(col("draw") < col("p_ppm"), 1L).otherwise(0L).as("y"))
        .groupBy(expr("p_ppm div 100000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_hit"),
          sum(col("p_ppm")).as("sum_p"))
        .select(col("bin"), col("n"),
          expr("n_hit * 1000000L div n").as("acc_ppm"),
          expr("sum_p div n").as("conf_ppm"),
          expr("abs(n_hit * 1000000L div n - sum_p div n)").as("gap_ppm"))
        .orderBy(col("bin"))
    }),

    // Decile gains/lift table — the ranking-model triage report: rows
    // ntile'd into 10 score deciles (ordered score desc, vec_id
    // tiebreak — deterministic), per decile the positive count, the
    // cumulative capture rate, and lift vs the base rate, all ppm-exact.
    "q_eval_gains" -> ((s, dir) => {
      val d = t(s, dir, "embeddings")
        .select(col("vec_id"), (col("label") % 2).cast("long").as("y"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint)").as("h"))
        .select(col("vec_id"), col("y"),
          (col("y") * 400L + pmod(col("h"), lit(1000L))).as("score"))
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("score").desc, col("vec_id"))))
      val tot = d.agg(count(lit(1)).as("tot_n"), sum(col("y")).as("tot_pos"))
      d.groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
        .withColumn("cum_pos", sum(col("npos")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tot))
        .select(col("decile").cast("long").as("decile"), col("n"), col("npos"),
          expr("cum_pos * 1000000L div tot_pos").as("capture_ppm"),
          expr("npos * tot_n * 1000000L div (n * tot_pos)").as("lift_ppm"))
        .orderBy(col("decile"))
    }),

    // Precision/recall/F1 at a threshold sweep — one row per operating
    // point, counts exact, every ratio an integer ppm div, F1 formed
    // from the ppm precisions (harmonic mean on exact integers). The
    // explode fans each row to the 3 thresholds then ONE hash-agg.
    "q_eval_threshold" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select((col("label") % 2).cast("long").as("y"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint)").as("h"))
        .select(col("y"), (col("y") * 400L + pmod(col("h"), lit(1000L))).as("score"))
        .select(col("y"), col("score"),
          explode(array(lit(250L), lit(700L), lit(1050L))).as("thr"))
        .groupBy(col("thr"))
        .agg(sum(when(col("score") >= col("thr") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("thr") && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
          sum(when(col("score") < col("thr") && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"),
          expr("tp * 1000000L div (tp + fp)").as("prec_ppm"),
          expr("tp * 1000000L div (tp + fn)").as("rec_ppm"),
          expr("2 * (tp * 1000000L div (tp + fp)) * (tp * 1000000L div (tp + fn)) div ((tp * 1000000L div (tp + fp)) + (tp * 1000000L div (tp + fn)))").as("f1_ppm"))
        .orderBy(col("thr"))
    }),

    // Mean-average-precision per retrieval query, EXACT: vec_id%20
    // buckets the corpus into 20 queries, relevance y = label%2, and
    // the md5 score overlaps the label (+400 shift) exactly like
    // q_eval_auc. AP = (1/npos)·Σ_{relevant k} precision@k, kept as
    // integer ppm per term (cum_pos·10⁶ div rank, summed, div npos).
    // One per-query rank window (at 100 TB the candidate lists are
    // top-k-bounded per query BEFORE ranking — the window partitions
    // by qid, never globally), one hash agg.
    "q_eval_map" -> ((s, dir) => {
      val d = t(s, dir, "embeddings")
        .select(col("vec_id"), (col("vec_id") % 20).cast("long").as("qid"),
          (col("label") % 2).cast("long").as("y"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint)").as("h"))
        .select(col("vec_id"), col("qid"), col("y"),
          (col("y") * 400L + pmod(col("h"), lit(1000L))).as("score"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      d.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum_pos",
          sum(col("y")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"),
          sum(when(col("y") === 1L, expr("cum_pos * 1000000L div rn"))
            .otherwise(lit(0L))).as("sum_prec"))
        .filter(col("npos") > 0L)
        .select(col("qid"), col("n"), col("npos"),
          expr("sum_prec div npos").as("ap_ppm"))
        .orderBy(col("qid"))
    }),

    // NDCG@10 per query with GRADED relevance (rel = label%4, gain =
    // 2^rel − 1): the log2 position discounts are a 10-entry LITERAL
    // micro-table (round(10⁶/log2(k+1))) embedded identically in both
    // engines, so DCG is a pure integer dot product — no libm anywhere.
    // The ideal ordering reranks the same partition by gain (second
    // window, SAME partition key → one shuffle), ndcg = dcg·10⁶ div
    // idcg. The rank windows are per-qid; at 100 TB candidates are
    // top-k-bounded per query first.
    "q_eval_ndcg" -> ((s, dir) => {
      val disc = "array(1000000L, 630930L, 500000L, 430677L, 386853L, " +
        "356207L, 333333L, 315465L, 301030L, 289065L)"
      val d = t(s, dir, "embeddings")
        .select(col("vec_id"), (col("vec_id") % 20).cast("long").as("qid"),
          (col("label") % 4).cast("long").as("rel"),
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint)").as("h"))
        .select(col("vec_id"), col("qid"), col("rel"),
          expr("shiftleft(1L, cast(rel as int)) - 1L").as("gain"),
          (col("rel") * 250L + pmod(col("h"), lit(1000L))).as("score"))
      val wS = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val wI = Window.partitionBy(col("qid")).orderBy(col("gain").desc, col("vec_id"))
      d.withColumn("rn", row_number().over(wS).cast("long"))
        .withColumn("rn_ideal", row_number().over(wI).cast("long"))
        .groupBy(col("qid"))
        .agg(
          sum(when(col("rn") <= 10L,
            expr(s"gain * element_at($disc, cast(rn as int))"))
            .otherwise(lit(0L))).as("dcg_micro"),
          sum(when(col("rn_ideal") <= 10L,
            expr(s"gain * element_at($disc, cast(rn_ideal as int))"))
            .otherwise(lit(0L))).as("idcg_micro"))
        .filter(col("idcg_micro") > 0L)
        .select(col("qid"), col("dcg_micro"), col("idcg_micro"),
          expr("dcg_micro * 1000000L div idcg_micro").as("ndcg_ppm"))
        .orderBy(col("qid"))
    }),

    // Brier score over the q_eval_ece probability/outcome streams,
    // EXACT: squared error kept as the integer (p_ppm − y·10⁶)², one
    // global hash agg, plus the base rate and the ȳ(1−ȳ) uncertainty
    // floor (a calibrated-but-uninformative forecaster's Brier) — the
    // two numbers a consumer compares the score against. Σ(p−y)² ≤
    // n·10¹² keeps bigint headroom to ~9M rows; beyond that the sum
    // moves to decimal(38,0) exactly like the q_agg_corr fix.
    "q_eval_brier" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint) % 1000000").as("p_ppm"),
          expr("cast(conv(substring(md5(concat('y', cast(vec_id as string))), 1, 6), 16, 10) as bigint) % 1000000").as("draw"))
        .select(col("p_ppm"),
          when(col("draw") < col("p_ppm"), 1L).otherwise(0L).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"),
          sum(expr("(p_ppm - y * 1000000) * (p_ppm - y * 1000000)")).as("sum_sq"))
        .select(col("n"), col("npos"),
          expr("sum_sq div (n * 1000000L)").as("brier_e6"),
          expr("npos * 1000000L div n").as("base_ppm"),
          expr("npos * (n - npos) * 1000000L div (n * n)").as("unc_e6"))
    }),

    // 1-D earth mover's distance between the click and purchase value
    // distributions, EXACT over a BOUNDED 251-bin histogram (cents div
    // 200, clamped): EMD = Σ_bins |F_A − F_B| with the CDF gap kept as
    // the integer |cumA·nB − cumB·nA| (one common denominator, divided
    // ONCE at the end). The data pass is one per-bin count agg; the
    // cumulative runs over the 251-bin support, never the rows — the
    // histogram-sketch shape that survives any corpus size.
    "q_events_emd" -> ((s, dir) => {
      val binned = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          expr("least(250L, cast(round(value * 100) as bigint) div 200)").as("bin"))
        .groupBy(col("bin"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cb"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = binned
        .withColumn("cum_a", sum(col("ca")).over(w))
        .withColumn("cum_b", sum(col("cb")).over(w))
      val tot = binned.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(abs(col("cum_a") * col("nb") - col("cum_b") * col("na"))).as("num"))
        .select(col("na"), col("nb"),
          expr("num * 1000000L div (na * nb)").as("emd_bins_ppm"))
    }),

    // Wald–Wolfowitz runs test per event type: the ts-ordered sequence
    // of above/below-mean signs (mean as the exact rational sum/n —
    // the comparison c·n ≥ Σc never divides), runs counted by a lag
    // window PARTITIONED by type, and z² formed as one double
    // expression over the exact integer counts (IEEE arithmetic only —
    // no libm — so both engines produce the identical double).
    "q_events_runs_test" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          col("ts"), col("event_id"))
      val tot = d.groupBy(col("event_type"))
        .agg(sum(col("c")).as("sum_c"), count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      d.join(tot, Seq("event_type"))
        .select(col("event_type"), col("n"),
          (col("c") * col("n") >= col("sum_c")).cast("long").as("sign"),
          col("ts"), col("event_id"))
        .withColumn("brk",
          when(lag(col("sign"), 1).over(w).isNull ||
            lag(col("sign"), 1).over(w) =!= col("sign"), 1L).otherwise(0L))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), sum(col("sign")).as("n1"),
          sum(lit(1L) - col("sign")).as("n2"), sum(col("brk")).as("runs"))
        .select(col("event_type"), col("n"), col("n1"), col("n2"), col("runs"),
          expr("""round((cast(runs * n - (2 * n1 * n2 + n) as double)
                         * cast(runs * n - (2 * n1 * n2 + n) as double)
                         * cast(n - 1 as double))
                        / (cast(2 * n1 * n2 as double)
                           * cast(2 * n1 * n2 - n as double)), 6)""").as("z2"))
        .orderBy(col("event_type"))
    }),

    // Wilcoxon signed-rank per event type over per-user first→last
    // value drift: d = last − first cents per (user, type) in ts
    // order, zero diffs dropped, |d| ranked with exact 2-scaled
    // midranks (2·rank_min + ties − 1), W2⁺ = Σ ranks2 of positive
    // drifts — against the 2-scaled total n(n+1) the null splits
    // evenly. Everything integer; the rank window partitions by type.
    "q_events_wilcoxon" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), cents(col("value")).as("c"),
          col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("user_id"), col("event_type"))))
        .filter(col("cnt") >= 2 && (col("rn") === 1 || col("rn") === col("cnt")))
        .groupBy(col("user_id"), col("event_type"))
        .agg((max(when(col("rn") === col("cnt"), col("c"))) -
          max(when(col("rn") === 1, col("c")))).as("d"))
        .filter(col("d") =!= 0L)
      pairs
        .withColumn("rmin", rank().over(
          Window.partitionBy(col("event_type")).orderBy(abs(col("d")))))
        .withColumn("ties", count(lit(1)).over(
          Window.partitionBy(col("event_type"), abs(col("d")))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("d") > 0L,
            lit(2L) * col("rmin") + col("ties") - 1L).otherwise(0L)).as("w2_plus"))
        .select(col("event_type"), col("n_pairs"), col("w2_plus"),
          expr("n_pairs * (n_pairs + 1)").as("w2_total"))
        .orderBy(col("event_type"))
    }),

    // Cochran–Armitage trend test: does the above-mean-value rate
    // trend across the four 6-hour day quarters? T and its variance
    // pieces are exact integer sums over a 4-group contingency; z²
    // is one double expression over them (IEEE only). The whole
    // query is two hash aggs over bounded keys.
    "q_events_trend_ca" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .select(cents(col("value")).as("c"),
          expr("cast(hour(ts) as bigint) div 6").as("g"))
      val tot = d.agg(sum(col("c")).as("sum_c"), count(lit(1)).as("nn"))
      val g = d.crossJoin(broadcast(tot))
        .select(col("g"),
          (col("c") * col("nn") >= col("sum_c")).cast("long").as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_g"), sum(col("y")).as("r_g"))
      g.agg(sum(col("n_g")).as("n"), sum(col("r_g")).as("r"),
          sum(col("g") * (col("r_g"))).as("sgr"),
          sum(col("g") * (col("n_g"))).as("sgn"),
          sum(col("g") * col("g") * col("n_g")).as("sg2n"))
        .select(col("n"), col("r"),
          expr("sgr * n - sgn * r").as("t_num"),
          expr("""round((cast(sgr * n - sgn * r as double)
                         * cast(sgr * n - sgn * r as double)
                         * cast(n as double))
                        / (cast(r as double) * cast(n - r as double)
                           * (cast(n as double) * cast(sg2n as double)
                              - cast(sgn as double) * cast(sgn as double))), 6)""").as("z2"))
    }),

    // Chao1 species-richness estimate per source — "how many token
    // types does this corpus slice REALLY have, given what sampling
    // showed us": S_obs plus the bias-corrected singleton/doubleton
    // tail f1(f1−1)/(2(f2+1)), ppm-exact. Two bounded hash aggs
    // (token counts → frequency classes); the estimator arithmetic
    // runs on one row per source.
    "q_text_chao1" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3)))")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("s_obs"),
          sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("f1"),
          sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("f2"))
        .select(col("source"), col("s_obs"), col("f1"), col("f2"),
          expr("(s_obs * 2 * (f2 + 1) + f1 * (f1 - 1)) * 1000000L div (2 * (f2 + 1))").as("chao1_ppm"))
        .orderBy(col("source"))
    }),

    // Good–Turing frequency-of-frequency smoothing per source: for
    // count classes r = 1..5, the adjusted count r* = (r+1)·N_{r+1}/N_r
    // in ppm — the discounting table an n-gram LM smoother reads. The
    // N_{r+1} lookup is a self-join on the BOUNDED (source, r) key
    // space, never the token space. Universe = 3-gram shingles (the
    // q_sketch_kmv lesson: the ~31-word synth vocabulary has NO rare
    // count classes, which would leave the r ≤ 5 table empty at the
    // larger SFs — the estimator must actually estimate).
    "q_text_good_turing" -> ((s, dir) => {
      val fof = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(l) - 2), i -> concat_ws(' ', slice(l, i, 3)))")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"), col("cnt").as("r"))
        .agg(count(lit(1)).as("n_r"))
      val next = fof.select(col("source").as("s2"), (col("r") - 1L).as("r2"),
        col("n_r").as("n_next"))
      fof.filter(col("r") <= 5L)
        .join(next, col("source") === col("s2") && col("r") === col("r2"), "left_outer")
        .select(col("source"), col("r"), col("n_r"),
          coalesce(col("n_next"), lit(0L)).as("n_next"),
          expr("(r + 1) * coalesce(n_next, 0L) * 1000000L div n_r").as("rstar_ppm"))
        .orderBy(col("source"), col("r"))
    }),

    // 10% two-sided trimmed mean of event value per type — the robust
    // location estimate that survives fat tails: drop the bottom and
    // top n div 10 order statistics (row_number over a per-type
    // window, exact), then one integer ppm mean over the kept cents.
    "q_agg_trimmed" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("c"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .filter(col("rn") > expr("n div 10") &&
          col("rn") <= col("n") - expr("n div 10"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"), sum(col("c")).as("sum_kept"))
        .select(col("event_type"), col("n_kept"), col("sum_kept"),
          expr("sum_kept * 1000000L div n_kept").as("trimmed_mean_cents_ppm"))
        .orderBy(col("event_type"))
    }),

    // Grubbs outlier statistic per event type: G² for the most extreme
    // value vs the type's own mean/sd, from the exact integer sums
    // (n, Σc, Σc², max deviation via the scaled |c·n − Σc|) with ONE
    // double expression at the end — the single-pass screening test
    // that needs no sort and no per-row window.
    "q_events_grubbs" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
      val tot = d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sm"),
          sum(col("c") * col("c")).as("s2"))
      d.join(tot, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), max(col("sm")).as("sm"),
          max(col("s2")).as("s2"),
          max(abs(col("c") * col("n") - col("sm"))).as("maxdev_n"))
        .select(col("event_type"), col("n"), col("maxdev_n"),
          expr("""round((cast(maxdev_n as double) * cast(maxdev_n as double)
                         * cast(n - 1 as double))
                        / (cast(n as double)
                           * (cast(n as double) * cast(s2 as double)
                              - cast(sm as double) * cast(sm as double))), 6)""").as("g2"))
        .orderBy(col("event_type"))
    }),

    // Partial autocorrelation at lag 2 per event type (Durbin–Levinson
    // φ₂₂ = (r₂ − r₁²)/(1 − r₁²) over the lag-Pearson autocorrelations):
    // each rₖ is formed from FIVE exact integer sums over the ts-ordered
    // cents series (the corr pattern), sqrt is IEEE-exact, and φ₂₂ is a
    // fixed expression tree over those doubles — cross-engine
    // deterministic with no libm. The lag windows partition by type.
    "q_events_pacf2" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          col("ts"), col("event_id"))
        .select(col("event_type"), col("c"),
          lead(col("c"), 1).over(w).as("c1"),
          lead(col("c"), 2).over(w).as("c2"))
        .groupBy(col("event_type"))
        .agg(
          count(when(col("c1").isNotNull, 1L)).as("n1"),
          sum(when(col("c1").isNotNull, col("c"))).as("sx1"),
          sum(when(col("c1").isNotNull, col("c1"))).as("sy1"),
          sum(when(col("c1").isNotNull, col("c") * col("c"))).as("sxx1"),
          sum(when(col("c1").isNotNull, col("c1") * col("c1"))).as("syy1"),
          sum(when(col("c1").isNotNull, col("c") * col("c1"))).as("sxy1"),
          count(when(col("c2").isNotNull, 1L)).as("n2"),
          sum(when(col("c2").isNotNull, col("c"))).as("sx2"),
          sum(when(col("c2").isNotNull, col("c2"))).as("sy2"),
          sum(when(col("c2").isNotNull, col("c") * col("c"))).as("sxx2"),
          sum(when(col("c2").isNotNull, col("c2") * col("c2"))).as("syy2"),
          sum(when(col("c2").isNotNull, col("c") * col("c2"))).as("sxy2"))
        .select(col("event_type"), col("n1"), col("n2"),
          expr("""round(((cast(n2 * sxy2 - sx2 * sy2 as double)
                          / sqrt((cast(n2 as double) * cast(sxx2 as double)
                                  - cast(sx2 as double) * cast(sx2 as double))
                                 * (cast(n2 as double) * cast(syy2 as double)
                                    - cast(sy2 as double) * cast(sy2 as double))))
                         - (cast(n1 * sxy1 - sx1 * sy1 as double)
                            / sqrt((cast(n1 as double) * cast(sxx1 as double)
                                    - cast(sx1 as double) * cast(sx1 as double))
                                   * (cast(n1 as double) * cast(syy1 as double)
                                      - cast(sy1 as double) * cast(sy1 as double))))
                           * (cast(n1 * sxy1 - sx1 * sy1 as double)
                              / sqrt((cast(n1 as double) * cast(sxx1 as double)
                                      - cast(sx1 as double) * cast(sx1 as double))
                                     * (cast(n1 as double) * cast(syy1 as double)
                                        - cast(sy1 as double) * cast(sy1 as double)))))
                        / (cast(1 as double)
                           - (cast(n1 * sxy1 - sx1 * sy1 as double)
                              / sqrt((cast(n1 as double) * cast(sxx1 as double)
                                      - cast(sx1 as double) * cast(sx1 as double))
                                     * (cast(n1 as double) * cast(syy1 as double)
                                        - cast(sy1 as double) * cast(sy1 as double))))
                             * (cast(n1 * sxy1 - sx1 * sy1 as double)
                                / sqrt((cast(n1 as double) * cast(sxx1 as double)
                                        - cast(sx1 as double) * cast(sx1 as double))
                                       * (cast(n1 as double) * cast(syy1 as double)
                                          - cast(sy1 as double) * cast(sy1 as double))))), 6)""").as("phi22"))
        .orderBy(col("event_type"))
    }),

    // Allan variance per event type at stride 16 — the stability-
    // over-averaging-time statistic: full 16-element blocks of the
    // ts-ordered cents series, adjacent block-SUM differences (exact
    // integers — the /16 means cancel into the final denominator),
    // avar = Σd²/(2(M−1)·16²) as one integer ppm division.
    "q_events_allan" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val blocks = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          col("ts"), col("event_id"))
        .withColumn("b", expr("cast(row_number() over (partition by event_type order by ts, event_id) - 1 as bigint) div 16"))
        .groupBy(col("event_type"), col("b"))
        .agg(count(lit(1)).as("cnt"), sum(col("c")).as("s"))
        .filter(col("cnt") === 16L)
      val bw = Window.partitionBy(col("event_type")).orderBy(col("b"))
      blocks
        .withColumn("d", lead(col("s"), 1).over(bw) - col("s"))
        .filter(col("d").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("m_diffs"), sum(col("d") * col("d")).as("sum_d2"))
        .select(col("event_type"), col("m_diffs"), col("sum_d2"),
          expr("sum_d2 * 1000000L div (2 * m_diffs * 256)").as("avar_cents2_ppm"))
        .orderBy(col("event_type"))
    }),

    // Ulcer index per event type, EXACT: drawdown from the running
    // peak in integer ppm ((peak − c)·10⁶ div peak — cents are
    // positive), squared and averaged as integers. The running peak is
    // a per-type cumulative max window; everything else is one agg.
    "q_events_ulcer" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"),
          col("ts"), col("event_id"))
        .withColumn("peak", max(col("c")).over(w))
        .select(col("event_type"),
          expr("(peak - c) * 1000000L div peak").as("dd_ppm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("dd_ppm") * col("dd_ppm")).as("sum_dd2"))
        .select(col("event_type"), col("n"), col("sum_dd2"),
          expr("sum_dd2 div n").as("ulcer2_ppm2"))
        .orderBy(col("event_type"))
    }),

    // Consistent-hash ring placement (8 shards × 16 virtual nodes,
    // md5-positioned) vs the rendezvous scheme already registered
    // (q_shard_rendezvous): each doc key takes the first vnode
    // clockwise from its hash (wraparound = global min). The ring is
    // 128 broadcast rows; the per-key argmin is a broadcast join +
    // hash agg — no shuffle grows with the corpus.
    "q_sample_consistent_hash" -> ((s, dir) => {
      val ring = s.range(8).select(col("id").as("shard"))
        .crossJoin(s.range(16).select(col("id").as("v")))
        .select(col("shard"),
          expr("cast(conv(substring(md5(concat('s', cast(shard as string), ':v', cast(v as string))), 1, 8), 16, 10) as bigint)").as("pos"))
      val keys = t(s, dir, "documents")
        .select(col("doc_id"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)").as("h"))
      val chosen = keys.crossJoin(broadcast(ring))
        .groupBy(col("doc_id"), col("h"))
        .agg(min(when(col("pos") >= col("h"), col("pos"))).as("p1"),
          min(col("pos")).as("p0"))
        .select(col("doc_id"), coalesce(col("p1"), col("p0")).as("cpos"))
      chosen.join(broadcast(ring), col("cpos") === col("pos"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("shard"))
    }),

    // Join-cardinality estimation by deterministic key sampling — the
    // planner question before any 100 TB join: |A ⋈ B| = Σ_k dA(k)·dB(k)
    // over the shared keys. The exact form needs both degree tables in
    // full; the estimate reads only keys whose md5 lands in the bottom
    // 1/8 of the hash space and scales by 8 (uniform key sampling —
    // unbiased for Σ products because sampling is ON THE KEY, not the
    // row, so each key's full dA·dB product survives intact). At scale
    // the sampled degree agg touches 1/8 of the key space end-to-end:
    // the hash filter pushes below the count. All integer; the error
    // column is exact ppm arithmetic.
    "q_join_size_estimate" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def deg(typ: String, out: String) =
        e.filter(col("event_type") === typ)
          .groupBy(col("user_id")).agg(count(lit(1)).as(out))
      val joined = deg("purchase", "da").join(deg("error", "db"), Seq("user_id"))
        .withColumn("h", expr("cast(conv(substring(md5(cast(user_id as string)), 1, 2), 16, 10) as bigint)"))
      joined.agg(
          count(lit(1)).as("n_keys"),
          sum(col("da") * col("db")).as("exact_pairs"),
          sum(when(col("h") < 32, lit(1)).otherwise(lit(0))).as("n_sampled"),
          (coalesce(sum(when(col("h") < 32, col("da") * col("db"))), lit(0L)) * 8L)
            .as("est_pairs"))
        .select(col("n_keys"), col("n_sampled"), col("exact_pairs"), col("est_pairs"),
          expr("abs(est_pairs - exact_pairs) * 1000000L div exact_pairs").as("abs_err_ppm"))
    }),

    // Skew planner — the decision table BEFORE q_join_skew_salted's
    // remedy: per-key row counts on the fact side, each key's load
    // share, and the salt fan-out that evens it out (ceil(cnt/target)
    // where target = ceil(total/32) rows per task, capped at 32 — a key
    // under one task-quantum gets fan 1 = no salting). One partial+final
    // hash agg + a broadcast-scalar total; the top-10 listing is the
    // human-readable plan head, the agg row count is bounded by the key
    // space at any SF.
    "q_join_skew_planner" -> ((s, dir) => {
      val cnts = t(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val tot = cnts.agg(sum(col("cnt")).as("total"))
      val w = Window.orderBy(col("cnt").desc, col("user_id"))
      cnts.crossJoin(broadcast(tot))
        .withColumn("target", expr("(total + 31) div 32"))
        .withColumn("salt_k", least(lit(32L), expr("(cnt + target - 1) div target")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("user_id"), col("cnt"),
          expr("cnt * 1000000L div total").as("share_ppm"), col("salt_k"))
        .orderBy(col("cnt").desc, col("user_id"))
    }),

    // Mergeable histogram-quantile sketch + exact error audit — the
    // 256-bin equi-width summary IS the mergeable sketch (bin counts
    // add across partitions/partial aggs/days; the quantile reads the
    // first bin whose cumulative count crosses ceil(q·n) and reports
    // that bin's inclusive upper edge). The EXACT side (rank-order
    // scan) exists only as the audit: err = approx − exact is provably
    // in [0, width). At 100 TB you ship the ≤256·|groups| bin rows, not
    // the data; the audit column is what the small-SF oracle checks.
    // All integer: width = (max−min) div 256 + 1, edges exact.
    "q_agg_quantile_sketch" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
      val mm = e.groupBy(col("event_type"))
        .agg(min(col("c")).as("mn"), max(col("c")).as("mx"), count(lit(1)).as("n"))
        .withColumn("width", expr("(mx - mn) div 256 + 1"))
      val bins = e.join(broadcast(mm), Seq("event_type"))
        .groupBy(col("event_type"), expr("(c - mn) div width").as("b"))
        .agg(count(lit(1)).as("bc"))
      val wb = Window.partitionBy(col("event_type")).orderBy(col("b"))
      val approx = bins.withColumn("cum", sum(col("bc")).over(wb))
        .join(broadcast(mm), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) div 2"),
            expr("mn + (b + 1) * width - 1"))).as("approx_p50"),
          min(when(col("cum") * 10 >= col("n") * 9,
            expr("mn + (b + 1) * width - 1"))).as("approx_p90"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("c"))
      val exact = e.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("vc"))
        .withColumn("cum", sum(col("vc")).over(wc))
        .join(broadcast(mm.select(col("event_type"), col("n"))), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("c"))).as("exact_p50"),
          min(when(col("cum") * 10 >= col("n") * 9, col("c"))).as("exact_p90"))
      approx.join(exact, Seq("event_type"))
        .join(mm.select(col("event_type"), col("n"), col("width")), Seq("event_type"))
        .select(col("event_type"), col("n"), col("width"),
          col("approx_p50"), col("exact_p50"),
          (col("approx_p50") - col("exact_p50")).as("err_p50"),
          col("approx_p90"), col("exact_p90"),
          (col("approx_p90") - col("exact_p90")).as("err_p90"))
        .orderBy(col("event_type"))
    }),

    // Forecast skill scoring (MASE, Hyndman–Koehler) over the per-type
    // daily series: the seasonal-naive model (same weekday last week,
    // lag 7) scored against the random-walk baseline (lag 1) on the
    // rows where BOTH references exist — MASE < 1e6 ppm ⇔ weekly
    // seasonality beats persistence. Day grain bounds the series (one
    // row per type·day after the first agg), so the window runs over a
    // calendar-bounded frame at any SF; sums of |Δ| stay integer cents.
    "q_events_mase" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(cents(col("value"))).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily
        .withColumn("y7", lag(col("y"), 7).over(w))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .filter(col("y7").isNotNull && col("y1").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_scored"),
          sum(abs(col("y") - col("y7"))).as("sae7"),
          sum(abs(col("y") - col("y1"))).as("sae1"))
        .select(col("event_type"), col("n_scored"), col("sae7"), col("sae1"),
          expr("sae7 * 1000000L div sae1").as("mase_ppm"))
        .orderBy(col("event_type"))
    }),

    // Split-conformal calibration — the distribution-free interval
    // recipe: fit on the even-id half (predictor = per-type floored
    // mean cents), take q̂ = the ⌈0.9·(n+1)⌉-th smallest absolute
    // residual on that half, measure |y−ŷ| ≤ q̂ coverage on the odd-id
    // half (guaranteed ≥ 90% in expectation by exchangeability). The
    // rank pick runs on the grouped residual-count cumsum (same
    // bounded-key shape as the quantile sketch); nothing sorts raw
    // rows. Integer throughout; coverage in exact ppm.
    "q_eval_conformal" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
      val cal = e.filter(col("event_id") % 2 === 0)
      val fit = cal.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_cal"), expr("sum(c) div count(1)").as("pred_c"))
      val wr = Window.partitionBy(col("event_type")).orderBy(col("r"))
      val qhat = cal.join(broadcast(fit), Seq("event_type"))
        .groupBy(col("event_type"), abs(col("c") - col("pred_c")).as("r"))
        .agg(count(lit(1)).as("rc"))
        .withColumn("cum", sum(col("rc")).over(wr))
        .join(broadcast(fit), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") * 10 >= (col("n_cal") + 1) * 9, col("r"))).as("qhat"))
      e.filter(col("event_id") % 2 === 1)
        .join(broadcast(fit), Seq("event_type"))
        .join(broadcast(qhat), Seq("event_type"))
        .groupBy(col("event_type"), col("n_cal"), col("pred_c"), col("qhat"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("c") - col("pred_c")) <= col("qhat"), 1L).otherwise(0L)).as("hits"))
        .select(col("event_type"), col("n_cal"), col("n_test"), col("pred_c"),
          col("qhat"), expr("hits * 1000000L div n_test").as("coverage_ppm"))
        .orderBy(col("event_type"))
    }),

    // A-priori frequent 3-itemsets — the candidate-generation step that
    // keeps k-itemset mining feasible at scale: the frequent-PAIR set
    // (support ≥ 2, the q_basket_pairs pass) prunes triples BEFORE the
    // third basket join, so the per-order blowup only touches items
    // that already survived level 2 (Agrawal–Srikant downward closure).
    // Every step is an equi-join on the order key or a left-semi
    // against the bounded pair set; distinct basket size (~7) bounds
    // the self-join fan-out; the total order (support desc, triple)
    // makes the top-50 cut deterministic. Uniform TPC-H keys mean the
    // frequent set THINS as the part space grows (12 triples at
    // sf0.01 — the verify SF, where the prune demonstrably fires —
    // down to an honestly-empty answer at sf0.1): exactly the regime
    // where downward closure pays, since the semi-joins kill nearly
    // every candidate before the third basket join.
    "q_basket_triples" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("s")).filter(col("s") >= 2)
        .select(col("p1"), col("p2"))
      val t2 = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.ok").as("ok12"), col("a.pk").as("p1"), col("b.pk").as("p2"))
        .join(pairs, Seq("p1", "p2"), "left_semi")
      t2.join(li.select(col("ok").as("ok3"), col("pk").as("p3")),
          col("ok12") === col("ok3") && col("p2") < col("p3"))
        .select(col("p1"), col("p2"), col("p3"))
        .join(pairs.select(col("p1").as("p2"), col("p2").as("p3")),
          Seq("p2", "p3"), "left_semi")
        .join(pairs.select(col("p1"), col("p2").as("p3")),
          Seq("p1", "p3"), "left_semi")
        .groupBy(col("p1"), col("p2"), col("p3"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("support").desc, col("p1"), col("p2"), col("p3"))
        .limit(50)
    }),

    // Greedy max-coverage corpus selection — the submodular data-
    // selection recipe: pick the 5 documents that together cover the
    // most distinct word 3-grams, one greedy round at a time (gain =
    // grams not yet covered; ties to the smallest doc_id). Each round
    // is ONE anti-join + hash-agg + 1-row argmax collect; the covered
    // set grows by at most one doc's grams per round and is
    // localCheckpoint'ed so round r never re-derives rounds 1..r-1
    // (the q_dedup_resolve lineage lesson). A picked doc's gain drops
    // to 0 by construction, so no explicit exclusion set is needed.
    // At 100 TB the gram table shuffles once (the checkpoint) and the
    // driver holds 5 rows.
    "q_docs_maxcover" -> ((s, dir) => {
      import s.implicits._
      val k = 3
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= k)
        .select(col("doc_id"), expr(
          s"explode(transform(sequence(0, size(l) - $k), x -> concat_ws(' ', slice(l, x + 1, $k))))")
          .as("gram"))
        .distinct()
        .localCheckpoint(true)
      var covered = grams.select(col("gram")).limit(0).localCheckpoint(true)
      val rows = Seq.newBuilder[(Long, Long, Long)]
      for (_ <- 1 to 5) {
        val cand = grams
          .join(covered, Seq("gram"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).collect()
        if (cand.nonEmpty) {
          val d = cand(0).getLong(0)
          rows += ((rows.result().size + 1L, d, cand(0).getLong(1)))
          val prev = covered
          covered = covered.unionAll(
              grams.filter(col("doc_id") === d).select(col("gram")))
            .distinct().localCheckpoint(true)
          prev.unpersist()
        }
      }
      val out = rows.result().toDF("round", "doc_id", "gain")
        .withColumn("covered_cum",
          sum(col("gain")).over(Window.orderBy(col("round"))))
        .orderBy(col("round"))
      covered.unpersist(); grams.unpersist()
      out
    }),

    // Leave-one-source-out quality ablation — first-order data
    // valuation: for each source, what happens to the corpus-level
    // quality mean if the source is dropped? Pure algebra on group
    // sums — per-doc integer stopword-ppm score, ONE partial+final agg
    // to per-source (n, sum), the 1-row global total broadcast back —
    // so the "ablation" never rescans the corpus per source (the
    // naive per-source recompute is |sources| full passes; this is
    // one). delta > 0 ⇒ dropping the source RAISES corpus quality ⇒
    // the source is below-average and a curation candidate.
    "q_docs_ablation" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("source"),
          expr("""cast(size(filter(split(text, ' '),
                   w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) as bigint)
                  * 1000000L div cast(size(split(text, ' ')) as bigint)""")
            .as("score"))
      val bySrc = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_s"))
      val glob = bySrc.agg(sum(col("n_docs")).as("n_all"),
        sum(col("sum_s")).as("sum_all"))
      bySrc.crossJoin(broadcast(glob))
        .select(col("source"), col("n_docs"),
          expr("sum_s div n_docs").as("mean_src"),
          expr("sum_all div n_all").as("mean_global"),
          expr("(sum_all - sum_s) div (n_all - n_docs)").as("mean_without"))
        .withColumn("delta", col("mean_without") - col("mean_global"))
        .orderBy(col("source"))
    }),

    // Bipartite projection with cosine weights — the part↔supplier
    // bipartite graph projected onto suppliers: two suppliers are
    // close when they supply the same parts, weighted by cosine over
    // the binary part-incidence vectors (n12/√(n1·n2), published as
    // exact integer cos²-ppm so nothing rounds). The projection is
    // the distinct-incidence self-join on the PART key — fan-out
    // bounded by suppliers-per-part (TPC-H ~4), never corpus size —
    // the degree table joins back keyed on supplier, and the squared
    // numerator goes through DECIMAL(38,0) so it cannot wrap at any
    // incidence count (the q_agg_corr lesson). Top-50 under a total
    // order keeps the output bounded while the pair space grows
    // quadratically in suppliers.
    "q_graph_bipartite" -> ((s, dir) => {
      val inc = t(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
      val deg = inc.groupBy(col("sk")).agg(count(lit(1)).as("n"))
      inc.as("a").join(inc.as("b"),
          col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("s1"), col("b.sk").as("s2"))
        .agg(count(lit(1)).as("n12"))
        .join(deg.select(col("sk").as("s1"), col("n").as("n1")), Seq("s1"))
        .join(deg.select(col("sk").as("s2"), col("n").as("n2")), Seq("s2"))
        .select(col("s1"), col("s2"), col("n12"), col("n1"), col("n2"),
          expr("""cast((cast(n12 as decimal(38,0)) * n12 * 1000000)
                  div (cast(n1 as decimal(38,0)) * n2) as bigint)""")
            .as("cos2_ppm"))
        .orderBy(col("cos2_ppm").desc, col("s1"), col("s2"))
        .limit(50)
    }),

    // Greedy k-center coreset — farthest-point diversity sampling
    // over the embedding space (the 2-approximation of the k-center
    // objective, and the standard diversity pick for training-data
    // curation): seed with the smallest vec_id, then 4 rounds of
    // "add the point farthest from the selected set" (ties to the
    // smallest vec_id). Each round is one broadcast of ≤4 center
    // vectors into the corpus scan + a partial+final min-agg + a
    // 1-row argmax collect; distances are exact integer squared L2
    // (zip_with/aggregate, never a UDF). sep2 records each pick's
    // separation — the monotone-decreasing radius curve a curator
    // reads. The checkpointed vector table is scanned per round, never
    // re-derived (the q_dedup_resolve lineage lesson).
    "q_sample_kcenter" -> ((s, dir) => {
      import s.implicits._
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
            .as("v"))
        .localCheckpoint(true)
      val first = vecs.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id")).as[Long].head()
      var ids = Seq(first)
      val rows = Seq.newBuilder[(Long, Long, Long)]
      rows += ((1L, first, 0L))
      for (r <- 2 to 5) {
        val sel = vecs.filter(col("vec_id").isInCollection(ids))
          .select(col("v").as("sv"))
        val best = vecs.crossJoin(broadcast(sel))
          .select(col("vec_id"), expr(
            "aggregate(zip_with(v, sv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("dd"))
          .groupBy(col("vec_id")).agg(min(col("dd")).as("md"))
          .orderBy(col("md").desc, col("vec_id")).limit(1)
          .as[(Long, Long)].head()
        ids :+= best._1
        rows += ((r.toLong, best._1, best._2))
      }
      val out = rows.result().toDF("round", "vec_id", "sep2")
        .orderBy(col("round"))
      vecs.unpersist()
      out
    }),

    // Clustering-depth audit on the time column — the table-layout
    // question behind every zonemap: laid out in 32 extents, how many
    // extents overlap each extent's [min ts, max ts]? depth 1 = a
    // time-range scan prunes to one extent; depth 32 = it touches
    // everything. Two candidate layouts are audited side by side —
    // 'ingest' (id-range extents: time-clustered by construction) vs
    // 'by_user' (user-hash extents: the layout a user-bucketed table
    // actually has) — so the contrast IS the answer a layout planner
    // reads. Extent assignment is pure arithmetic against a broadcast
    // 1-row min/max (NO global sort); each overlap count is a 32×32
    // broadcast interval self-join; output is 2 summary rows.
    "q_table_cluster_depth" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("cast(floor(unix_timestamp(ts)) as bigint)").as("sec"))
      val mmId = e.agg(min(col("event_id")).as("mn_id"),
        max(col("event_id")).as("mx_id"))
      def audit(layout: String, f: Column): DataFrame = {
        val ext = e.crossJoin(broadcast(mmId)).withColumn("f", f)
          .groupBy(col("f"))
          .agg(min(col("sec")).as("mn"), max(col("sec")).as("mx"))
        ext.as("a").join(broadcast(ext.as("b")),
            col("a.mn") <= col("b.mx") && col("b.mn") <= col("a.mx"))
          .groupBy(col("a.f").as("f")).agg(count(lit(1)).as("depth"))
          .agg(count(lit(1)).as("n_extents"),
            min(col("depth")).as("depth_min"), max(col("depth")).as("depth_max"),
            expr("sum(depth) * 1000000L div count(1)").as("avg_depth_ppm"))
          .select(lit(layout).as("layout"), col("n_extents"),
            col("depth_min"), col("depth_max"), col("avg_depth_ppm"))
      }
      audit("ingest", expr("(event_id - mn_id) * 32 div (mx_id - mn_id + 1)"))
        .unionAll(audit("by_user", expr("user_id % 32")))
        .orderBy(col("layout"))
    }),

    // ---- session 12: spectral / long-memory / calibration ops -------

    // Harmonic periodogram — seasonality power at candidate periods
    // {7, 10, 15} days per event type, the spectral test a telemetry
    // pipeline runs before fitting any seasonal model. The DFT weights
    // cos/sin(2πr/P) are evaluated once per DISTINCT phase (32 angles
    // total, a broadcast dimension) and pre-rounded to 1e-6 — a 1–2 ulp
    // libm divergence between engines would need the true value within
    // ~1e-10 of a rounding boundary to flip any of the 32, so the
    // hash-compared integers are engine-stable (the repo's ln-parity
    // rule applied to trig). Everything after is exact: daily counts
    // are one hash agg, a/b accumulate as decimal(38,0) products (no
    // wrap at any SF), and power_ppm is one double formula from two
    // exact integers (mult/div are IEEE exact-rounded — deterministic,
    // unlike libm). Scales: agg on (type, day), broadcast join on
    // (period, phase), final agg on (type, period).
    "q_events_periodogram" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("d"))
        .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
      val weights = s.range(1).select(explode(expr("array(7L, 10L, 15L)")).as("p"))
        .withColumn("r", explode(expr("sequence(0L, p - 1)")))
        .select(col("p"), col("r"),
          expr("cast(round(cos((2 * pi() * r) / p) * 1000000) as bigint)").as("cw"),
          expr("cast(round(sin((2 * pi() * r) / p) * 1000000) as bigint)").as("sw"))
      daily
        .withColumn("p", explode(expr("array(7L, 10L, 15L)")))
        .withColumn("r", expr("d % p"))
        .join(broadcast(weights), Seq("p", "r"))
        .groupBy(col("event_type"), col("p"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("total"),
          // cast BEFORE the multiply (the oracle's HUGEINT placement):
          // c·cw in long would wrap first at ~9e6 events/day/type
          sum(expr("cast(c as decimal(38,0)) * cw")).as("sa"),
          sum(expr("cast(c as decimal(38,0)) * sw")).as("sb"))
        .select(col("event_type"), col("p").as("period"), col("n_days"),
          col("total"), col("sa").cast("long").as("a"), col("sb").cast("long").as("b"))
        .withColumn("power_ppm",
          expr("round((cast(a as double) * cast(a as double)" +
            " + cast(b as double) * cast(b as double))" +
            " / (cast(total as double) * 1000000.0" +
            " * cast(total as double) * 1000000.0) * 1000000, 6)"))
        .orderBy(col("event_type"), col("period"))
    }),

    // Hurst exponent via rescaled-range (R/S) analysis — the
    // long-memory test for a metric stream (H≈0.5 ⇒ no memory; the
    // burstiness diagnostic behind capacity planning). Per event type
    // the cents series (ordered by ts, event_id) is cut into complete
    // windows of n ∈ {16, 32, 64}; within a window the cumulative
    // deviation is kept EXACT by clearing the mean's denominator:
    // n·D_j = n·P_j − j·Σx (all longs), so R·n = max−min of integers,
    // and n²σ² = n·Σx² − (Σx)² is exact. R/S per window rounds ONCE
    // through sqrt+division (both IEEE exact-rounded — deterministic)
    // to an e6 integer; per-size means are integer floor-divs; the
    // final H is the evenly-log-spaced 3-point OLS slope, which
    // collapses to (ln rs64 − ln rs16)/(2 ln 2) — 1 ln per type on an
    // e6-rounded output (flip margin ~1e-10). Scales: one sort per
    // (type), window aggs per (type, n, w) shard by key, 100 TB-safe.
    "q_events_hurst" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), col("event_id"),
        cents(col("value")).as("x"))
      val wOrd = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_s"), col("event_id"))
      val sized = e.withColumn("i", row_number().over(wOrd).cast("long") - 1)
        .withColumn("n", explode(expr("array(16L, 32L, 64L)")))
        .withColumn("w", expr("i div n")).withColumn("j", expr("i % n + 1"))
      val part = Window.partitionBy(col("event_type"), col("n"), col("w"))
      val wPre = part.orderBy(col("j"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = part.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val rs = sized
        .withColumn("pj", sum(col("x")).over(wPre))
        .withColumn("sx", sum(col("x")).over(wAll))
        .withColumn("sxx", sum(col("x") * col("x")).over(wAll))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .groupBy(col("event_type"), col("n"), col("w"))
        .agg(max(col("n") * col("pj") - col("j") * col("sx")).as("mxd"),
          min(col("n") * col("pj") - col("j") * col("sx")).as("mnd"),
          max(col("sx")).as("sx"), max(col("sxx")).as("sxx"),
          max(col("cnt")).as("cnt"))
        .filter(col("cnt") === col("n") &&
          col("n") * col("sxx") - col("sx") * col("sx") > 0)
        .select(col("event_type"), col("n"),
          expr("cast(round((greatest(mxd, 0L) - least(mnd, 0L)) * 1000000" +
            " / sqrt(n * sxx - sx * sx)) as bigint)").as("rs_e6"))
        .groupBy(col("event_type"), col("n"))
        .agg(expr("sum(rs_e6) div count(1)").as("rs_mean"),
          count(lit(1)).as("n_windows"))
      rs.groupBy(col("event_type"))
        .agg(sum(when(col("n") === 16, col("rs_mean"))).as("rs16_e6"),
          sum(when(col("n") === 32, col("rs_mean"))).as("rs32_e6"),
          sum(when(col("n") === 64, col("rs_mean"))).as("rs64_e6"),
          sum(when(col("n") === 64, col("n_windows"))).as("n_win64"))
        .select(col("event_type"), col("rs16_e6"), col("rs32_e6"),
          col("rs64_e6"), col("n_win64"),
          expr("round(ln(cast(rs64_e6 as double) / cast(rs16_e6 as double))" +
            " / (2 * ln(2)), 6)").as("hurst"))
        .orderBy(col("event_type"))
    }),

    // Population Stability Index between the early and late half of
    // each event type's value distribution — the drift score model
    // monitoring actually alerts on (the companion to q_events_drift's
    // L1-ppm form; PSI weights each bin's shift by its log odds).
    // Counts, totals and the Laplace-smoothed ppm columns are exact
    // integers; the one transcendental per bin, (p−q)·ln(p/q), is
    // computed from identical exact-rounded doubles in both engines
    // and rounded at 1e-6 — ≤100 distinct ln arguments regardless of
    // SF (bins are the unit, never rows), so an ulp flip needs a
    // ~1e-10 coincidence. The grid explode guarantees all 10 bins per
    // type so the window totals equal the half totals exactly. Scales:
    // two hash aggs + a 10-bins-per-type window — sketch-sized state.
    "q_eval_psi" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), cents(col("value")).as("c"))
      val bounds = e.groupBy(col("event_type"))
        .agg(expr("(min(ts_s) + max(ts_s)) div 2").as("mid"))
      val counts = e.join(broadcast(bounds), Seq("event_type"))
        .withColumn("half",
          when(col("ts_s") <= col("mid"), lit("early")).otherwise(lit("late")))
        .withColumn("bin", expr("least(c div 5000, CAST(9 AS BIGINT))"))
        .groupBy(col("event_type"), col("half"), col("bin"))
        .agg(count(lit(1)).as("n"))
      def side(h: String): DataFrame = counts.filter(col("half") === h)
        .select(col("event_type"), col("bin"), col("n").as(s"n_$h"))
      val grid = counts.select(col("event_type")).distinct()
        .withColumn("bin", explode(sequence(lit(0L), lit(9L))))
      val wT = Window.partitionBy(col("event_type"))
      grid.join(side("early"), Seq("event_type", "bin"), "left")
        .join(side("late"), Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("n_early", "n_late"))
        .withColumn("te", sum(col("n_early")).over(wT))
        .withColumn("tl", sum(col("n_late")).over(wT))
        .withColumn("p", expr("cast(n_early + 1 as double) / cast(te + 10 as double)"))
        .withColumn("q", expr("cast(n_late + 1 as double) / cast(tl + 10 as double)"))
        .withColumn("term_e6",
          expr("cast(round((p - q) * ln(p / q) * 1000000) as bigint)"))
        .select(col("event_type"), col("bin"), col("n_early"), col("n_late"),
          expr("(n_early + 1) * 1000000L div (te + 10)").as("p_ppm"),
          expr("(n_late + 1) * 1000000L div (tl + 10)").as("q_ppm"),
          col("term_e6"),
          sum(col("term_e6")).over(wT).as("psi_e6"))
        .orderBy(col("event_type"), col("bin"))
    }),

    // Binned cross-entropy (log loss) of the deterministic md5 scores
    // against their own calibrated draws (the q_eval_brier
    // construction) — the OTHER proper scoring rule, with the log term
    // evaluated per probability BUCKET (998 mid-point buckets), never
    // per row: the per-bucket (y, count) agg bounds the transcendental
    // surface at any SF (the PSI rule), makes the whole query two hash
    // aggs, and the e6-rounded −ln terms then accumulate as exact
    // integers. Baseline = base-rate entropy (2 ln evaluations on
    // aggregate totals). A calibrated scorer's loss lands at its own
    // conditional entropy, strictly under the baseline — the gap is
    // the score's information content.
    "q_eval_logloss" -> ((s, dir) => {
      val rows = t(s, dir, "embeddings")
        .select(
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint) % 1000000").as("p_ppm"),
          expr("cast(conv(substring(md5(concat('y', cast(vec_id as string))), 1, 6), 16, 10) as bigint) % 1000000").as("draw"))
        .select(
          expr("greatest(1L, least(998L, p_ppm div 1000))").as("p_mil"),
          when(col("draw") < col("p_ppm"), 1L).otherwise(0L).as("y"))
      rows.groupBy(col("p_mil"), col("y")).agg(count(lit(1)).as("n"))
        .withColumn("pm", col("p_mil") * 1000 + 500)
        .withColumn("term_e6", expr("cast(round(ln(1000000.0 /" +
          " (case when y = 1 then pm else 1000000 - pm end)) * 1000000) as bigint)"))
        .agg(sum(col("n")).as("n"), sum(col("y") * col("n")).as("npos"),
          sum(col("n") * col("term_e6")).as("loss_sum"))
        .select(col("n"), col("npos"),
          expr("loss_sum div n").as("logloss_e6"),
          expr("cast(round((cast(npos as double) * ln(cast(n as double) / npos)" +
            " + cast(n - npos as double) * ln(cast(n as double) / (n - npos)))" +
            " / n * 1000000) as bigint)").as("baseline_e6"))
    }),

    // Degree distribution + discrete power-law MLE over the near-dup
    // graph — the shape test run before trusting any sampled-walk
    // statistic (heavy tails break uniform node sampling). The
    // histogram is two hash aggs; α̂ = 1 + n/Σln(d) (Clauset-style MLE
    // at d_min = 1) is assembled ALL-INTEGER: ln(d) is pre-rounded to
    // e6 once per DISTINCT degree (a bounded set regardless of corpus
    // size — the ln-parity rule), the weighted sum is exact, and the
    // final α lands by integer floor-div, so the hash-compared row is
    // engine-stable with no trailing-bit exposure at all.
    "q_graph_powerlaw" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
      val hist = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("cnt"))
        .withColumn("lnd_e6",
          expr("cast(round(ln(cast(deg as double)) * 1000000) as bigint)"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      hist
        .withColumn("n_vertices", sum(col("cnt")).over(wAll))
        .withColumn("sum_ln_e6", sum(col("cnt") * col("lnd_e6")).over(wAll))
        .select(col("deg"), col("cnt"),
          expr("cnt * 1000000L div n_vertices").as("share_ppm"),
          col("n_vertices"),
          expr("case when sum_ln_e6 > 0 then" +
            " 1000000L + n_vertices * 1000000000000L div sum_ln_e6" +
            " else null end").as("alpha_e6"))
        .orderBy(col("deg"))
    }),

    // Adamic–Adar link prediction over the near-dup graph — the
    // degree-discounted companion to q_graph_link_pred's raw Jaccard:
    // a shared neighbor that bridges EVERYTHING carries almost no
    // evidence, so each common neighbor z contributes 1/ln(deg z).
    // The weight is materialized once per VERTEX from a per-distinct-
    // degree e6-rounded ln (deg ≥ 2 always holds for a middle vertex,
    // so the weight is finite), then the open-wedge score is an exact
    // integer sum — same triangle-closing equi-join shape as
    // link_pred, no cartesian anywhere, shards by vertex at 100 TB.
    "q_graph_adamic_adar" -> ((s, dir) => {
      val pr = simhashPairsShared(s, dir).select(col("ia"), col("ib"))
      val edges = pr.select(col("ia").as("src"), col("ib").as("dst"))
        .union(pr.select(col("ib").as("src"), col("ia").as("dst")))
      val wz = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .select(col("src").as("z"),
          expr("cast(round(1000000.0 / ln(cast(deg as double))) as bigint)").as("w_e6"))
      edges.as("e1").join(edges.as("e2"),
          col("e1.dst") === col("e2.src") && col("e1.src") < col("e2.dst"))
        .select(col("e1.src").as("a"), col("e2.dst").as("c"), col("e1.dst").as("z"))
        .join(pr, col("a") === col("ia") && col("c") === col("ib"), "left_anti")
        .join(wz, Seq("z"))
        .groupBy(col("a"), col("c"))
        .agg(count(lit(1)).as("cn"), sum(col("w_e6")).as("aa_e6"))
        .orderBy(col("aa_e6").desc, col("a"), col("c")).limit(20)
    }),

    // Pairwise Jensen–Shannon divergence between the per-source
    // word-3-gram distributions — the symmetric, bounded corpus-mix
    // distance a data-mixture planner reads (unlike KL it never blows
    // up on disjoint support). Add-1 smoothing over each pair's UNION
    // support keeps both distributions exactly normalized. The
    // transcendental surface is bounded by construction: per-gram
    // terms depend only on the (na, nb) count combo, so grams collapse
    // to combos FIRST (Zipf makes this a ~100× reduction) and each
    // distinct combo pays ONE e8-rounded two-sided term — p·ln scales
    // the ulp noise DOWN by p, leaving ~1e-10 of margin. The union
    // support is assembled from equi-joins only (left fill + anti),
    // never a cartesian; everything shards by gram hash at 100 TB.
    "q_text_jsd" -> ((s, dir) => {
      val cnts = t(s, dir, "documents")
        .select(col("source"), explode(expr(
          """case when size(split(text, ' ')) >= 3 then
            |  transform(sequence(1, size(split(text, ' ')) - 2),
            |            i -> concat_ws(' ', slice(split(text, ' '), i, 3)))
            |else array() end""".stripMargin)).as("g"))
        .select(col("source"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy(col("source"), col("h")).agg(count(lit(1)).as("cnt"))
      val tots = cnts.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
      val srcs = tots.select(col("source"))
      val pairs = srcs.select(col("source").as("sa"))
        .crossJoin(broadcast(srcs.select(col("source").as("sb"))))
        .filter(col("sa") < col("sb"))
      val inA = pairs.join(cnts.select(col("source").as("sa"),
          col("h"), col("cnt").as("na")), Seq("sa"))
        .join(cnts.select(col("source").as("sb"), col("h"),
          col("cnt").as("nb")), Seq("sb", "h"), "left")
        .na.fill(0L, Seq("nb"))
      val bOnly = pairs.join(cnts.select(col("source").as("sb"),
          col("h"), col("cnt").as("nb")), Seq("sb"))
        .join(cnts.select(col("source").as("sa"), col("h")),
          Seq("sa", "h"), "left_anti")
        .withColumn("na", lit(0L))
        .select(col("sa"), col("sb"), col("h"), col("na"), col("nb"))
      val combos = inA.select(col("sa"), col("sb"), col("h"), col("na"), col("nb"))
        .unionByName(bOnly)
        .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
        .agg(count(lit(1)).as("k"))
      val wPair = Window.partitionBy(col("sa"), col("sb"))
      combos
        .withColumn("vp", sum(col("k")).over(wPair))
        .join(broadcast(tots.select(col("source").as("sa"), col("tot").as("ta"))), Seq("sa"))
        .join(broadcast(tots.select(col("source").as("sb"), col("tot").as("tb"))), Seq("sb"))
        .withColumn("p", expr("cast(na + 1 as double) / cast(ta + vp as double)"))
        .withColumn("q", expr("cast(nb + 1 as double) / cast(tb + vp as double)"))
        .withColumn("term_e8", expr("cast(round((p * ln(2 * p / (p + q))" +
          " + q * ln(2 * q / (p + q))) * 100000000) as bigint)"))
        .groupBy(col("sa"), col("sb"), col("vp"), col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_combos"),
          expr("sum(k * term_e8) div 2").as("jsd_e8"))
        .select(col("sa"), col("sb"), col("vp"), col("ta"), col("tb"),
          col("n_combos"), col("jsd_e8"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Heaps'-law vocabulary growth per source — V(N) checkpoints every
    // 10 docs plus the fitted growth exponent b (V ∝ N^b), the
    // curve a tokenizer-budget planner reads to extrapolate vocab size
    // to the full corpus. New-word counts come from a first-occurrence
    // agg (min doc_id per (source, word) — one hash agg, no rescan per
    // checkpoint), cumulative N and V are exact window sums in doc_id
    // order, and b is ONE ln-ratio per source between the first and
    // last checkpoint (e6-rounded, bounded eval count). Scales: the
    // curve's cost is the token explode + two keyed aggs; the window
    // runs over docs within a source only.
    "q_text_heaps" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr("size(split(text, ' '))").cast("long").as("ntok"))
      val firsts = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(min(col("doc_id")).as("fd"))
        .groupBy(col("source"), col("fd")).agg(count(lit(1)).as("nw"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val curve = docs
        .join(firsts.withColumnRenamed("fd", "doc_id"), Seq("source", "doc_id"), "left")
        .na.fill(0L, Seq("nw"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
        .withColumn("tokens_seen", sum(col("ntok")).over(wCum))
        .withColumn("vocab", sum(col("nw")).over(wCum))
        .filter(col("rank") % 10 === 0)
      val wSrc = Window.partitionBy(col("source")).orderBy(col("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      curve
        .withColumn("v0", first(col("vocab")).over(wSrc))
        .withColumn("n0", first(col("tokens_seen")).over(wSrc))
        .withColumn("v1", last(col("vocab")).over(wSrc))
        .withColumn("n1", last(col("tokens_seen")).over(wSrc))
        .select(col("source"), col("rank").as("docs_seen"),
          col("tokens_seen"), col("vocab"),
          // single-checkpoint sources (tiny SFs) have no growth window
          expr("case when n1 > n0 then cast(round(ln(cast(v1 as double) / v0)" +
            " / ln(cast(n1 as double) / n0) * 1000000) as bigint)" +
            " else null end").as("heaps_b_e6"))
        .orderBy(col("source"), col("docs_seen"))
    }),

    // t-closeness audit — the distribution-level privacy check k-anon
    // and l-diversity miss: a class can be k-large and l-diverse yet
    // still leak because its SENSITIVE distribution (source) sits far
    // from the global one. t = ½·L1(p_class, p_global), kept EXACT by
    // clearing both denominators (|c·N − g·n_c| accumulated as
    // decimal(38,0), divided ONCE at the end by 2·n_c·N — integer
    // floor both engines). The class×source grid is a broadcast
    // nested-loop over two BOUNDED dimensions (classes × sources),
    // then everything is equi-joins and hash aggs — at 100 TB the raw
    // table is touched once for the two count aggs.
    "q_privacy_tcloseness" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("lang"), expr("n_chars div 100").as("len_bucket"), col("source"))
      val cls = d.groupBy(col("lang"), col("len_bucket"), col("source"))
        .agg(count(lit(1)).as("c"))
      val classes = d.groupBy(col("lang"), col("len_bucket"))
        .agg(count(lit(1)).as("n_c"))
      val glob = d.groupBy(col("source")).agg(count(lit(1)).as("g"))
      val ntot = d.count() // bounded driver scalar (the kmeans-k pattern)
      classes.crossJoin(broadcast(glob))
        .join(cls, Seq("lang", "len_bucket", "source"), "left")
        .na.fill(0L, Seq("c"))
        .groupBy(col("lang"), col("len_bucket"), col("n_c"))
        .agg(sum(expr(s"cast(abs(c * ${ntot}L - g * n_c) as decimal(38,0))")).as("num"))
        .select(col("lang"), col("len_bucket"), col("n_c"),
          expr(s"cast(num * 1000000 div (2 * n_c * ${ntot}L) as bigint)").as("t_ppm"))
        .withColumn("breach", when(col("t_ppm") > 250000, 1).otherwise(0))
        .orderBy(col("lang"), col("len_bucket"))
    }),

    // Centroid-based (simplified) silhouette per label — the cluster-
    // quality score that needs no pairwise pass: a = distance to own
    // centroid, b = nearest other centroid, s = (b−a)/max(a,b). The
    // distances are exact until the last step: mean denominators are
    // cleared (n_c·x − S per dim, squared into decimal(38,0) so
    // nothing wraps at any corpus size), and the only roundings are
    // IEEE-exact sqrt/divisions from identical exact integers, e6-
    // rounded per point. Per-label means are integer floor-divs.
    // Scales: one posexplode + two hash aggs + a broadcast-sized
    // centroid join (k centroids × 64 dims); never an all-pairs pass.
    "q_ann_silhouette" -> ((s, dir) => {
      val pts = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")))
        .withColumnRenamed("pos", "d").withColumnRenamed("col", "v")
      val cent = pts.groupBy(col("label").as("clabel"), col("d"))
        .agg(sum(col("v")).as("sd"), count(lit(1)).as("nc"))
      val dist = pts.join(broadcast(cent), Seq("d"))
        .groupBy(col("vec_id"), col("label"), col("clabel"), col("nc"))
        .agg(sum(expr("cast(nc * v - sd as decimal(19,0))" +
          " * cast(nc * v - sd as decimal(19,0))")).as("q"))
        .withColumn("dst", expr("sqrt(cast(q as double)) / nc"))
      dist.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("clabel") === col("label"), col("dst"))).as("a"),
          min(when(col("clabel") =!= col("label"), col("dst"))).as("b"))
        .withColumn("s_e6", expr("case when greatest(a, b) > 0 then" +
          " cast(round((b - a) / greatest(a, b) * 1000000) as bigint)" +
          " else cast(0 as bigint) end"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          expr("sum(s_e6) div count(1)").as("sil_e6"),
          min(col("s_e6")).as("min_s_e6"), max(col("s_e6")).as("max_s_e6"))
        .orderBy(col("label"))
    }),

    // Ratio-to-moving-average seasonal indices — the classical
    // decomposition's seasonal factor per day-of-week slot, the
    // companion q_events_calendar (raw slot counts) and q_events_stl
    // (additive trend split) don't give: "Mondays run at 1.08× trend".
    // ALL-INTEGER: the centered 7-day window sum is exact, the ratio
    // is kept in ppm with the ×7 numerator (c·7e6 div sum7 — floor
    // identical in both engines on non-negative ints), incomplete
    // edge windows are dropped by the window row COUNT (never by
    // position arithmetic), and slot means are integer divs. The
    // day-of-week slot is the engine-neutral (d+4)%7 so no calendar
    // builtin's indexing convention is in the hash. Scales: one daily
    // hash agg, one 7-row window per type, 7-row output per type.
    "q_events_seasonal_index" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("d"))
        .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(-3, 3)
      daily
        .withColumn("sum7", sum(col("c")).over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .filter(col("n7") === 7)
        .withColumn("r_ppm", expr("c * 7000000L div sum7"))
        .groupBy(col("event_type"), expr("(d + 4) % 7").as("dow"))
        .agg(count(lit(1)).as("n_days"),
          expr("sum(r_ppm) div count(1)").as("index_ppm"),
          min(col("r_ppm")).as("min_ppm"), max(col("r_ppm")).as("max_ppm"))
        .orderBy(col("event_type"), col("dow"))
    }),

    // 4-truss peeling over the near-dup graph — the cohesion filter
    // between q_graph_triangles (counts) and q_graph_kcore (degree
    // peeling): every surviving edge must sit in ≥ 2 triangles, so
    // bridges and stars that survive a k-core are stripped and only
    // clique-like dup clusters remain (exactly the communities a
    // dedup reviewer should audit first). Three peeling rounds, FIXED
    // on both engines (converged rounds are no-ops, so the unrolled
    // oracle is exact whether or not the graph converges earlier).
    // Each round enumerates triangles ORIENTED (a<b<c, each triangle
    // materialized once) instead of joining the doubled undirected
    // wedge list — 3× fewer intermediate rows on the clique-heavy
    // dup graph — then fans each triangle to its 3 edges for the
    // support agg. All-integer, shards by vertex, localCheckpoint per
    // round (the 446 s→3.5 s checkpoint-cadence rule).
    "q_graph_ktruss" -> ((s, dir) => {
      var e = simhashPairsShared(s, dir)
        .select(col("ia").as("a"), col("ib").as("b")).localCheckpoint(true)
      var last: DataFrame = null
      for (_ <- 1 to 3) {
        val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
          .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
          .join(e.select(col("a").as("ta"), col("b").as("tc")), Seq("ta", "tc"))
        val sup = tri.select(col("ta").as("a"), col("tb").as("b"))
          .union(tri.select(col("tb").as("a"), col("tc").as("b")))
          .union(tri.select(col("ta").as("a"), col("tc").as("b")))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
        last = sup.filter(col("support") >= 2).localCheckpoint(true)
        e = last.select(col("a"), col("b"))
      }
      last.orderBy(col("a"), col("b"))
    }),

    // Horvitz–Thompson estimation audit — the unbiasedness check every
    // deterministic-sampling pipeline owes its consumers: docs are
    // Bernoulli-sampled per source at an md5-derived rate π (seeded,
    // replayable), and the inverse-probability-weighted total
    // Σ n_chars·1e6 div π̂_ppm is compared against the true per-source
    // total. ALL-INTEGER: the per-row HT weight is a floor-div (both
    // engines floor non-negative ints identically), sums are exact,
    // and the relative error lands as a ppm floor-div. Scales: one
    // scan, one hash agg — the estimator costs nothing beyond the
    // sample itself, which is the point of publishing the audit.
    // ColBERT-style late-interaction retrieval (MaxSim): each query
    // vector and each candidate are split into 8 sub-vectors of 8 dims
    // (the token-level grain of a late-interaction index), and the
    // score is Σ_qsub max_dsub ⟨qsub, dsub⟩ — the reranker that beats
    // single-vector cosine whenever relevance is carried by a PART of
    // the representation. ALL-INTEGER: e3-quantized components, exact
    // dot products (|dot| ≤ 8e6), exact max/sum cascades, deterministic
    // tie-break. Scales: the 5×8×8-row query grain broadcasts into the
    // candidate stream (the standard rerank-after-ANN shape — at
    // 100 TB the candidate set is the IVF output, not the corpus), one
    // partial+final agg per cascade level, top-10 via a per-query
    // window over bounded score sets.
    "q_ann_maxsim" -> ((s, dir) => {
      val tok = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(expr(
          "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")))
        .withColumnRenamed("pos", "d").withColumnRenamed("col", "v")
        .select(col("vec_id"), expr("d div 8").as("sub"),
          expr("d % 8").as("t"), col("v"))
      val qs = tok.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("sub").as("qsub"),
          col("t"), col("v").as("qv"))
      val scores = tok.filter(col("vec_id") >= 5)
        .join(broadcast(qs), Seq("t"))
        .groupBy(col("qid"), col("vec_id"), col("qsub"), col("sub"))
        .agg(sum(col("v") * col("qv")).as("dot"))
        .groupBy(col("qid"), col("vec_id"), col("qsub"))
        .agg(max(col("dot")).as("best"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("best")).as("maxsim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("maxsim").desc, col("vec_id"))
      scores.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("vec_id"), col("maxsim"))
        .orderBy(col("qid"), col("rank"))
    }),

    // Per-source systematic probability-proportional-to-size sampling
    // — the survey design a storage-budgeted curation pass uses to
    // pick ~1/20 of each source with inclusion ∝ n_chars: one fixed
    // stride through the source's cumulative-size line from the
    // midpoint offset, so a doc larger than the stride is drawn with
    // multiplicity (PPS with replacement, kept honest in `mult`).
    // ALL-INTEGER: cumulative sums are exact window sums in doc_id
    // order, the hit count is a floor-div difference (both numerators
    // biased by +step so they stay non-negative — Spark's `div`
    // truncates where DuckDB's `//` floors, and they agree only on
    // non-negatives), and the Hansen–Hurwitz doc-count estimate
    // Σ mult·T div (20·n_chars) rides along as the weights-invert-the-
    // design audit. Scales: windows partition by source (systematic
    // designs are per-shard at 100 TB by construction), one pass.
    "q_sample_pps" -> ((s, dir) => {
      val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("source")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val hits = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum(col("n_chars")).over(wCum))
        .withColumn("tot", sum(col("n_chars")).over(wAll))
        .withColumn("step", expr("tot div 20"))
        .withColumn("off", expr("step div 2"))
        .withColumn("mult", expr("(cum - off + step) div step" +
          " - (cum - n_chars - off + step) div step"))
        .filter(col("mult") > 0)
      hits
        .withColumn("n_selected", sum(col("mult")).over(wAll))
        .withColumn("hh_est", sum(expr("mult * tot div (20 * n_chars)")).over(wAll))
        .select(col("source"), col("doc_id"), col("n_chars"), col("mult"),
          col("n_selected"), col("hh_est"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Recursive CTE — Spark 4.1's WITH RECURSIVE driven end-to-end
    // against DuckDB's: every doc walks its ternary reply-tree
    // (parent = id div 3, the deterministic thread shape) to the root,
    // and the walk is aggregated per depth. ALL-INTEGER, acyclic by
    // construction (anc strictly decreases), depth ≤ log₃(max id) so
    // the recursion is ~12 levels even at 10^12 docs. This is the
    // capability probe for hierarchy-shaped transcript queries (reply
    // chains, agent call trees) staying in pure SQL on both engines.
    "q_sql_recursive" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents_rec_v")
      s.sql(
        """WITH RECURSIVE walk(doc_id, anc, depth) AS (
          |  SELECT doc_id, doc_id AS anc, CAST(0 AS BIGINT) AS depth
          |  FROM documents_rec_v
          |  UNION ALL
          |  SELECT doc_id, anc div 3 AS anc, depth + 1 FROM walk WHERE anc > 0
          |)
          |SELECT depth, count(*) AS n_nodes,
          |       count(DISTINCT doc_id) AS n_docs,
          |       CAST(sum(anc) AS BIGINT) AS anc_sum
          |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    "q_sample_horvitz" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          expr("100000 + cast(conv(substring(md5(source), 1, 6), 16, 10)" +
            " as bigint) % 400001").as("rate_ppm"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 6), 16, 10)" +
            " as bigint) % 1000000").as("u_ppm"))
        .groupBy(col("source"), col("rate_ppm"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("u_ppm") < col("rate_ppm"), 1L).otherwise(0L)).as("n_sampled"),
          sum(col("n_chars")).as("true_total"),
          sum(when(col("u_ppm") < col("rate_ppm"),
            expr("n_chars * 1000000L div rate_ppm")).otherwise(0L)).as("ht_total"))
        .withColumn("err_ppm",
          expr("abs(ht_total - true_total) * 1000000L div true_total"))
        .orderBy(col("source"))
    }),

    // Isotonic (PAV) calibration over the q_eval_ece score stream —
    // the monotone-nondecreasing recalibration map every production
    // scorer ships with. EXACT via the min-max identity
    // iso[i] = max_{j<=i} min_{k>=i} rate(j..k): bins are bounded
    // (10), so intervals (<=55) and the argmin/argmax cascade are
    // driver-free bounded broadcast joins; interval rates are ONE
    // double division of exact integer sums (IEEE-identical on both
    // engines), ties broken by (k asc)/(j asc) row_number. The fitted
    // value is re-emitted as an integer ppm from the CHOSEN interval's
    // exact sums — no double→int boundary in the hash. At 100 TB only
    // the first aggregate touches the corpus; everything after is on
    // the 10-row bin table.
    "q_eval_isotonic" -> ((s, dir) => {
      val bins = t(s, dir, "embeddings")
        .select(
          expr("cast(conv(substring(md5(cast(vec_id as string)), 1, 6), 16, 10) as bigint) % 1000000").as("p_ppm"),
          expr("cast(conv(substring(md5(concat('y', cast(vec_id as string))), 1, 6), 16, 10) as bigint) % 1000000").as("draw"))
        .select(col("p_ppm"), when(col("draw") < col("p_ppm"), 1L).otherwise(0L).as("y"))
        .groupBy(expr("p_ppm div 100000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val iv = bins.select(col("bin").as("jb"))
        .join(broadcast(bins.select(col("bin").as("kb"))), col("jb") <= col("kb"))
        .join(broadcast(bins), col("bin") >= col("jb") && col("bin") <= col("kb"))
        .groupBy(col("jb"), col("kb"))
        .agg(sum(col("n")).as("ivn"), sum(col("pos")).as("ivpos"))
        .withColumn("rate", col("ivpos").cast("double") / col("ivn").cast("double"))
      val wMin = Window.partitionBy(col("i"), col("jb"))
        .orderBy(col("rate"), col("kb"))
      val wMax = Window.partitionBy(col("i")).orderBy(col("rate").desc, col("jb"))
      bins.select(col("bin").as("i"), col("n"), col("pos"))
        .join(broadcast(iv), col("jb") <= col("i") && col("i") <= col("kb"))
        .withColumn("rn_min", row_number().over(wMin))
        .filter(col("rn_min") === 1)
        .withColumn("rn_max", row_number().over(wMax))
        .filter(col("rn_max") === 1)
        .select(col("i").as("bin"), col("n"), col("pos"),
          expr("pos * 1000000L div n").as("raw_ppm"),
          col("jb"), col("kb"),
          expr("ivpos * 1000000L div ivn").as("iso_ppm"))
        .orderBy(col("bin"))
    }),

    // Kendall tau-b between the daily activity series of every event-
    // type pair — the rank-correlation a drift monitor prefers over
    // Pearson (outlier-robust) and over Spearman (principled tie
    // handling). Concordant/discordant/tie counts are ALL-INTEGER over
    // the day-grain table (bounded: ~30 days/type, so the pair fan-out
    // is ~4k rows regardless of corpus size); tau_b is ONE
    // sqrt-of-integer-product division, bit-identical on both engines.
    "q_events_kendall" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val xy = daily.as("a")
        .join(daily.as("b"),
          col("a.day") === col("b.day") && col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.day").as("day"), col("a.cnt").as("x"), col("b.cnt").as("y"))
      xy.as("p")
        .join(xy.as("q"),
          col("p.type_a") === col("q.type_a") && col("p.type_b") === col("q.type_b") &&
            col("p.day") < col("q.day"))
        .select(col("p.type_a").as("type_a"), col("p.type_b").as("type_b"),
          (col("p.x") - col("q.x")).as("dx"), (col("p.y") - col("q.y")).as("dy"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("nd"),
          sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("tx"),
          sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ty"))
        .select(col("type_a"), col("type_b"), col("n_pairs"), col("nc"), col("nd"),
          col("tx"), col("ty"),
          (round((col("nc") - col("nd")).cast("double") /
            sqrt(((col("nc") + col("nd") + col("tx")) *
                  (col("nc") + col("nd") + col("ty"))).cast("double")), 6)
            + lit(0.0)).as("tau_b"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Regression discontinuity at the mid-corpus cutoff (day 15 of the
    // Jan-2024 window) — the quasi-experimental "did the launch shift
    // daily volume?" estimator: an OLS line fitted on each side of the
    // cutoff from the exact five-sum machinery (decimal(38,0)
    // accumulation, ONE double cast), both lines evaluated AT the
    // cutoff with the unrounded slope, effect = right(c) − left(c).
    // Day-grain outcome keeps the regression bounded; the corpus is
    // touched by one hash agg.
    "q_events_rdd" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val cut = 15L
      t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400 - 19723").as("x"))
        .agg(count(lit(1)).as("y"))
        .withColumn("side", when(col("x") < cut, lit("left")).otherwise(lit("right")))
        .groupBy(col("event_type"), col("side"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"))
        .select(col("event_type"), col("side"), col("n"),
          col("n").cast("double").as("nd"),
          col("sx").cast("double").as("dsx"), col("sy").cast("double").as("dsy"),
          col("sxy").cast("double").as("dsxy"), col("sxx").cast("double").as("dsxx"))
        .withColumn("slope",
          (col("dsxy") * col("nd") - col("dsx") * col("dsy")) /
          (col("dsxx") * col("nd") - col("dsx") * col("dsx")))
        .withColumn("yhat",
          (col("dsy") - col("slope") * col("dsx")) / col("nd") +
            col("slope") * lit(cut.toDouble))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("side") === "left", col("n")).otherwise(0L)).as("n_left"),
          sum(when(col("side") === "right", col("n")).otherwise(0L)).as("n_right"),
          max(when(col("side") === "left", col("yhat"))).as("yl"),
          max(when(col("side") === "right", col("yhat"))).as("yr"))
        .select(col("event_type"), col("n_left"), col("n_right"),
          (round(col("yl"), 6) + lit(0.0)).as("yhat_left"),
          (round(col("yr"), 6) + lit(0.0)).as("yhat_right"),
          (round(col("yr") - col("yl"), 6) + lit(0.0)).as("effect"))
        .orderBy(col("event_type"))
    }),

    // Nelson–Aalen cumulative hazard — the additive companion to the
    // q_events_kaplan_meier product-limit curve (same lifetimes, same
    // right-censoring at the final 7 days, same descending risk-set
    // window): H(t) = Σ_{u<=t} d_u/n_u, accumulated through an
    // ascending collect-fold so both engines ADD the same exact-ratio
    // doubles in the same order (windowed double SUMs use engine-
    // specific trees; the explicit fold does not). Day-grain rows are
    // bounded by the corpus span.
    "q_events_nelson_aalen" -> ((s, dir) => {
      val users = t(s, dir, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("birth"), max(col("day")).as("death"))
      val horizon = users.agg(max(col("death")).as("d_max"))
      val lives = users.join(broadcast(horizon))
        .select((col("death") - col("birth")).as("t"),
          when(col("death") > col("d_max") - 7, 1L).otherwise(0L).as("cens"))
      val byT = lives.groupBy(col("t"))
        .agg(sum(lit(1L) - col("cens")).as("d"), sum(col("cens")).as("c"))
      val wDesc = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
        .withColumn("hz", col("d").cast("double") / col("n_risk").cast("double"))
        .withColumn("cumhaz",
          round(aggregate(collect_list(col("hz")).over(wAsc),
            lit(0.0d), (a, x) => a + x), 6))
        .select(col("t"), col("n_risk"), col("d"), col("c"),
          round(col("hz"), 6).as("hazard"), col("cumhaz"))
        .orderBy(col("t"))
    }),

    // Dynamic time warping between the day-of-week activity profiles
    // of every event-type pair — "do these two signals have the same
    // weekly shape, allowing phase shift?", the alignment-tolerant
    // companion to q_events_crosscorr. Profiles are integer ppm shares
    // (7 slots), the 7×7 DP runs as ONE higher-order fold over the
    // row-major cost cells (ALL-INTEGER: |Δppm| costs, min-of-three
    // recurrence, 1e15 sentinel borders) — no UDF, no driver loop, and
    // the whole DP is a scalar expression over a 10-row pair table.
    // l1 (the warp-free cost) rides along as the audit upper bound.
    "q_events_dtw" -> ((s, dir) => {
      val prof = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_timestamp(ts) div 86400) % 7").as("dow"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum(col("cnt")).over(
          Window.partitionBy(col("event_type"))
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .groupBy(col("event_type"))
        .agg(transform(
          sort_array(collect_list(struct(col("dow"),
            expr("cnt * 1000000L div total").as("share")))),
          e => e.getField("share")).as("xs"))
        .filter(size(col("xs")) === 7)
      prof.as("a")
        .join(broadcast(prof.as("b")),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.xs").as("xs"), col("b.xs").as("ys"))
        .withColumn("l1",
          expr("aggregate(sequence(1, 7), 0L, (acc, i) -> acc + abs(element_at(xs, i) - element_at(ys, i)))"))
        // Flat-list DP state [prev(8) ++ cur(1..8)] instead of a
        // struct accumulator: DuckDB 1.0's list_reduce mis-evaluates
        // struct accumulators (later fields read partially-updated
        // state — measured), while list accumulators fold exactly;
        // the Spark side mirrors the identical layout.
        .withColumn("dtw", expr(
          """element_at(aggregate(
            |  transform(sequence(0, 48), k -> array(
            |    bigint(k % 7 + 1),
            |    abs(element_at(xs, cast(k div 7 as int) + 1) - element_at(ys, k % 7 + 1)))),
            |  concat(array(0L), transform(sequence(1, 7), z -> 1000000000000000L),
            |         array(1000000000000000L)),
            |  (a, e) -> if(element_at(e, 1) = 7L,
            |    concat(slice(a, 9, 7),
            |      array(element_at(e, 2) + least(
            |        element_at(a, cast(element_at(e, 1) as int) + 1),
            |        element_at(a, cast(element_at(e, 1) as int)),
            |        element_at(a, cast(element_at(e, 1) as int) + 8))),
            |      array(1000000000000000L)),
            |    concat(a,
            |      array(element_at(e, 2) + least(
            |        element_at(a, cast(element_at(e, 1) as int) + 1),
            |        element_at(a, cast(element_at(e, 1) as int)),
            |        element_at(a, cast(element_at(e, 1) as int) + 8)))))), 8)""".stripMargin))
        .select(col("type_a"), col("type_b"), col("l1"), col("dtw"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Holt double-exponential smoothing (α = β = ½) over each type's
    // daily series, plus the 7-day-ahead linear forecast — the
    // level+trend one-liner every ops dashboard runs. The recurrence
    // folds ONE ordered collect per type; halving is EXACT in binary
    // floating point and both engines fold the identical doubles in
    // the identical order, so the result is bit-stable (the KM-fold
    // determinism argument). Day-grain rows bound the fold at ~30
    // elements regardless of corpus size.
    "q_events_holt" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          transform(
            sort_array(collect_list(struct(col("day"), col("cnt")))),
            e => e.getField("cnt").cast("double")).as("ys"))
        // [l, b] rides as a 2-element array accumulator (not a struct)
        // for the same DuckDB-1.0 list_reduce reason as q_events_dtw
        .withColumn("fit", expr(
          """aggregate(
            |  slice(ys, 2, size(ys) - 1),
            |  array(element_at(ys, 1), cast(0.0 as double)),
            |  (a, y) -> array(
            |    0.5d * y + 0.5d * (element_at(a, 1) + element_at(a, 2)),
            |    0.5d * ((0.5d * y + 0.5d * (element_at(a, 1) + element_at(a, 2)))
            |            - element_at(a, 1)) + 0.5d * element_at(a, 2)))""".stripMargin))
        .select(col("event_type"), col("n_days"),
          (round(element_at(col("fit"), 1), 6) + lit(0.0)).as("level"),
          (round(element_at(col("fit"), 2), 6) + lit(0.0)).as("trend"),
          (round(element_at(col("fit"), 1) + lit(7.0) * element_at(col("fit"), 2), 6)
            + lit(0.0)).as("forecast7"))
        .orderBy(col("event_type"))
    }),

    // Hilbert-curve layout audit — the locality-preserving companion
    // to q_zorder_layout: the same 2-D (partkey, suppkey) domain laid
    // out by Hilbert index, bucketed by the top 6 bits, each bucket's
    // coordinate envelope reported. Hilbert buckets are CONNECTED
    // regions (consecutive indices are grid-adjacent), so a box
    // predicate touches strictly tighter envelopes than Morton's
    // diagonal-jumping quadrants — the layout a 100 TB table wants
    // under two correlated range predicates. The unrolled 8-step walk
    // is one projection per bit level (scan + map, no shuffle until
    // the final 64-bucket agg), and the IDENTICAL generated SQL text
    // drives both engines (graft.functions.Hilbert).
    "q_layout_hilbert" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .selectExpr("l_partkey % 256 AS x", "l_suppkey % 256 AS y",
          "l_partkey % 256 AS x0", "l_suppkey % 256 AS y0",
          "CAST(0 AS BIGINT) AS d0")
      graft.functions.Hilbert.withHilbert(base, 8, Seq("x", "y"))
        .withColumn("hbucket", expr("h div 1024"))
        .groupBy(col("hbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"),
          min(col("h")).as("h_min"), max(col("h")).as("h_max"))
        .orderBy(col("hbucket"))
    }),

    // Fellegi–Sunter probabilistic record linkage over the part
    // catalog — the principled upgrade to the threshold fuzzy joins:
    // block on the name's first word, compare (brand, size, container)
    // per candidate pair, and weight each agreement pattern by
    // ln(m/u) / ln((1−m)/(1−u)) with m = 0.9 and u estimated EXACTLY
    // from the data (u = Σ n_v(n_v−1) / N(N−1), all-integer sums).
    // The transcendental surface is 6 ln evaluations (one per
    // field×agree/disagree), each e6-rounded then summed as exact
    // integers (the PSI rule); patterns ≤ 8 rows regardless of SF.
    // link/possible/non-link decisions fall out of integer thresholds.
    "q_join_fellegi" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_partkey") < 2000)
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_type"),
          split(col("p_name"), " ").getItem(0).as("blk"))
      def uNum(field: String): DataFrame =
        p.groupBy(col(field)).agg(count(lit(1)).as("nv"))
          .agg(sum(expr("nv * (nv - 1)")).cast("long").as(s"u_$field"))
      val stats = p.agg(count(lit(1)).as("n_tot"))
        .crossJoin(uNum("p_brand")).crossJoin(uNum("p_size"))
        .crossJoin(uNum("p_type"))
      def w(g: String, u: String): String =
        s"""cast(round(ln(CASE WHEN $g = 1
           |  THEN (0.9D * cast(n_tot * (n_tot - 1L) as double)) / cast($u as double)
           |  ELSE 0.1D / (1.0D - cast($u as double) / cast(n_tot * (n_tot - 1L) as double))
           |  END) * 1000000) as bigint)""".stripMargin
      p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") && col("a.p_partkey") < col("b.p_partkey"))
        .select(
          when(col("a.p_brand") === col("b.p_brand"), 1L).otherwise(0L).as("g_brand"),
          when(col("a.p_size") === col("b.p_size"), 1L).otherwise(0L).as("g_size"),
          when(col("a.p_type") === col("b.p_type"), 1L).otherwise(0L)
            .as("g_type"))
        .groupBy(col("g_brand"), col("g_size"), col("g_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .join(broadcast(stats))
        .withColumn("weight_e6",
          expr(w("g_brand", "u_p_brand")) + expr(w("g_size", "u_p_size")) +
            expr(w("g_type", "u_p_type")))
        .select(col("g_brand"), col("g_size"), col("g_type"), col("n_pairs"),
          col("weight_e6"),
          when(col("weight_e6") >= 4000000L, lit("link"))
            .when(col("weight_e6") >= 0L, lit("possible"))
            .otherwise(lit("non_link")).as("decision"))
        .orderBy(col("g_brand"), col("g_size"), col("g_type"))
    }),

    // Content-defined chunking dedup — the rsync/restic/LLM-corpus
    // trick q_text_chunks (fixed stride) cannot do: chunk boundaries
    // fall where a token's hash lands in a class (md5 % 8 = 0), so an
    // INSERTION only reshuffles the chunks it touches and every other
    // chunk keeps its fingerprint — dedup that survives edits. All
    // array work is per-row (boundary positions → start/end zips →
    // chunk fingerprints), then ONE hash agg per (source, fp) and one
    // per source for the storage-savings report. ALL-INTEGER.
    "q_dedup_cdc" -> ((s, dir) => {
      val chunks = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("tk"))
        .withColumn("n", size(col("tk")).cast("long"))
        .filter(col("n") >= 1)
        .withColumn("bpos", expr(
          """filter(sequence(1L, n), i ->
            |  cast(conv(substring(md5(element_at(tk, cast(i as int))), 1, 6), 16, 10)
            |       as bigint) % 8 = 0)""".stripMargin))
        .withColumn("ch", explode(expr(
          """filter(
            |  zip_with(concat(array(1L), transform(bpos, p -> p + 1L)),
            |           concat(bpos, array(n)),
            |           (st, en) -> if(en >= st,
            |             named_struct(
            |               'txt', array_join(slice(tk, cast(st as int),
            |                                 cast(en - st + 1 as int)), ' '),
            |               'clen', en - st + 1),
            |             null)),
            |  c -> c is not null)""".stripMargin)))
        .select(col("source"),
          substring(md5(col("ch.txt")), 1, 16).as("fp"),
          col("ch.clen").as("clen"))
      chunks.groupBy(col("source"), col("fp"))
        .agg(count(lit(1)).as("n_copies"), max(col("clen")).as("clen"))
        .groupBy(col("source"))
        .agg(sum(col("n_copies")).as("n_chunks"),
          count(lit(1)).as("n_distinct_chunks"),
          sum(col("clen") * col("n_copies")).as("total_tokens"),
          sum(col("clen")).as("distinct_tokens"))
        .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
          col("total_tokens"), col("distinct_tokens"),
          expr("(total_tokens - distinct_tokens) * 1000000L div total_tokens")
            .as("savings_ppm"))
        .orderBy(col("source"))
    }),

    // Shannon–Fano code-length audit per source — information theory
    // on the vocabulary with the code lengths INTEGER-EXACT (no log2
    // call: l_v = #{ l : n_v·2^l < N } = ⌈log2(N/n_v)⌉ via a bounded
    // shift scan), the Kraft sum as an exact 2^-40-denominator integer
    // (≤ 1 ⇔ kraft_num ≤ 2^40: the code is decodable), the average
    // length an integer ppm, and the entropy the ONLY transcendental —
    // one e6-rounded log2 term per vocab row (~31 distinct (n_v, N)
    // args per source, the bounded-surface rule). The Shannon bound
    // H ≤ avg < H+1 is asserted in QueryPropsSpec.
    "q_text_shannon_code" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("nv"))
        .withColumn("nn", sum(col("nv")).over(w))
        // nv·2^ll < nn ⇔ nv ≤ (nn−1) >> ll — the right-shift form
        // never overflows, unlike shifting nv left at big-N scales
        .withColumn("l",
          expr("size(filter(sequence(0, 39), ll -> nv <= shiftright(nn - 1L, ll)))").cast("long"))
        .withColumn("term_e6", expr(
          "cast(round(cast(nv as double) / cast(nn as double) * log2(cast(nn as double) / cast(nv as double)) * 1000000) as bigint)"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab_size"), max(col("nn")).as("n_tokens"),
          sum(expr("shiftleft(1L, cast(40 - l as int))")).as("kraft_num"),
          sum(col("nv") * col("l")).as("len_sum"),
          sum(col("term_e6")).as("entropy_e6"))
        .select(col("source"), col("vocab_size"), col("n_tokens"), col("kraft_num"),
          expr("len_sum * 1000000L div n_tokens").as("avg_len_ppm"),
          col("entropy_e6"))
        .orderBy(col("source"))
    }),

    // LZ78 phrase complexity per source — the compressibility proxy a
    // corpus-quality pipeline uses to catch low-entropy/boilerplate
    // text (repetitive docs parse into FEW phrases). The greedy LZ78
    // parse is ONE per-row fold: the accumulator list carries
    // [n_phrases, cur_phrase_hash, dict...]; each token either extends
    // the current phrase (hash chain cur·3+h mod 2^61−1, overflow-safe
    // and engine-identical) or closes it into the dictionary. Hash-
    // dictionary collisions are astronomically unlikely (61-bit) and
    // deterministic on BOTH engines, so the oracle stays exact. ALL-
    // INTEGER; the corpus is touched once, no shuffle before the
    // per-source agg.
    "q_text_lz78" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 1)
        .withColumn("lz", expr(
          """aggregate(
            |  transform(tk, w -> cast(conv(substring(md5(w), 1, 6), 16, 10) as bigint)),
            |  array(0L, 0L),
            |  (a, th) -> if(
            |    array_contains(slice(a, 3, size(a) - 2),
            |      pmod(element_at(a, 2) * 3L + th, 2305843009213693951L)),
            |    concat(
            |      array(element_at(a, 1),
            |            pmod(element_at(a, 2) * 3L + th, 2305843009213693951L)),
            |      slice(a, 3, size(a) - 2)),
            |    concat(array(element_at(a, 1) + 1L, 0L), slice(a, 3, size(a) - 2),
            |      array(pmod(element_at(a, 2) * 3L + th, 2305843009213693951L)))),
            |  a -> element_at(a, 1) + if(element_at(a, 2) != 0L, 1L, 0L))""".stripMargin))
        .withColumn("ntok", size(col("tk")).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
          sum(col("lz")).as("lz_phrases"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("lz_phrases"),
          expr("lz_phrases * 1000000L div n_tokens").as("lz_ratio_ppm"))
        .orderBy(col("source"))
    }),

    // Needleman–Wunsch global alignment between user event-type
    // journeys (match +2 / mismatch −1 / gap −1) — "did these two
    // users walk the same funnel, allowing skips?", the sequence
    // companion to q_events_dtw's numeric warping. Variable-length
    // sequences (≤10 events each, 28 user pairs): the DP is the same
    // flat-list [prev ++ cur] fold with DYNAMIC offsets (len(ys)
    // referenced inside the lambda) and gap-penalty borders; the roll
    // seeds each new row's dp[i][0] from the previous row's first
    // element − 1. ALL-INTEGER, scalar expression over a bounded pair
    // table.
    "q_events_nw_align" -> ((s, dir) => {
      val seqs = t(s, dir, "events")
        .filter(col("user_id") < 8)
        .groupBy(col("user_id"))
        .agg(slice(transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            expr("cast(conv(substring(md5(event_type), 1, 6), 16, 10) as bigint) % 97")
              .as("sym")))),
          e => e.getField("sym")), 1, 10).as("xs"))
      seqs.as("a")
        .join(broadcast(seqs.as("b")), col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
          col("a.xs").as("xs"), col("b.xs").as("ys"))
        .select(col("user_a"), col("user_b"),
          size(col("xs")).cast("long").as("len_a"),
          size(col("ys")).cast("long").as("len_b"),
          expr(
            """element_at(aggregate(
              |  transform(sequence(0, size(xs) * size(ys) - 1), k -> array(
              |    bigint(k % size(ys) + 1),
              |    if(element_at(xs, cast(k div size(ys) as int) + 1)
              |         = element_at(ys, k % size(ys) + 1), 2L, -1L))),
              |  concat(transform(sequence(0, size(ys)), i -> bigint(-i)),
              |         array(-1L)),
              |  (a, e) -> if(element_at(e, 1) = bigint(size(ys)),
              |    concat(
              |      slice(a, size(ys) + 2, size(ys)),
              |      array(greatest(
              |        element_at(a, cast(element_at(e, 1) as int)) + element_at(e, 2),
              |        element_at(a, cast(element_at(e, 1) as int) + 1) - 1L,
              |        element_at(a, size(ys) + 1 + cast(element_at(e, 1) as int)) - 1L)),
              |      array(element_at(a, size(ys) + 2) - 1L)),
              |    concat(a, array(greatest(
              |        element_at(a, cast(element_at(e, 1) as int)) + element_at(e, 2),
              |        element_at(a, cast(element_at(e, 1) as int) + 1) - 1L,
              |        element_at(a, size(ys) + 1 + cast(element_at(e, 1) as int)) - 1L))))),
              |  size(ys) + 1)""".stripMargin).as("nw_score"))
        .orderBy(col("user_a"), col("user_b"))
    }),
  )

  /** Deterministic seeded k-means (k=8, 3 Lloyd iterations, md5-ordered
    * init) over integerized embedding vectors — the IVF coarse-quantizer
    * trainer. Exact integer squared-L2 throughout; centroid updates are
    * floored per-dim means (floor(sum/n) via double division — exact
    * while |sum| < 2^53 and the quotient is ≥1/n from any integer
    * unless exactly integral, so both engines floor identically);
    * empty clusters carry their previous centroid. Scale shape: each
    * assignment is a broadcast join against k centroid rows (candidates
    * stream); each update is one partial+final agg over (cid, dim); the
    * k×64 centroid matrix is the only driver-side state per iteration —
    * the standard Lloyd driver loop (train on a sample at 100 TB).
    * Returns the final assignment (vec_id, cid, dist, v). */
  /** q_ann_kmeans and q_ann_ivf_kmeans both need the fit; memoize per
    * (session, dir) so the Lloyd training (4 assignment + 3 update
    * jobs) runs once and the one persisted vector dataset is shared.
    * Size-2 LRU for the same lifetime reason as TrainingData.genMemo. */
  private val kmeansMemo =
    new java.util.LinkedHashMap[(SparkSession, String), (DataFrame, Array[Array[Long]])](4, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), (DataFrame, Array[Array[Long]])]): Boolean = {
        val evict = size() > 2
        // the fit holds a persisted vector dataset — release it on evict
        if (evict) scala.util.Try(e.getValue._1.unpersist(false))
        evict
      }
    }

  private def kmeansFit(s: SparkSession, dir: String): DataFrame =
    kmeansFitFull(s, dir)._1

  /** The fit plus the learned k×64 centroid matrix (multi-probe search
    * ranks centroids per query, so it needs the matrix itself). */
  private def kmeansFitFull(s: SparkSession, dir: String): (DataFrame, Array[Array[Long]]) =
    kmeansMemo.synchronized {
      val key = (s, dir)
      val hit = kmeansMemo.get(key)
      if (hit != null) hit
      else {
        val fitted = kmeansFitUncached(s, dir)
        kmeansMemo.put(key, fitted)
        fitted
      }
    }

  private def kmeansFitUncached(s: SparkSession, dir: String): (DataFrame, Array[Array[Long]]) = {
    val k = 8; val iters = 3
    // cached: the integerized vectors feed every Lloyd iteration (k+1
    // assignment jobs + k update jobs would otherwise re-scan and
    // re-quantize the parquet each time). Small (ids + 64 longs/row);
    // at 100 TB the trainer runs on a sample, which is what gets cached.
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(x * 1000) as bigint))").as("v"))
      .persist()
    // md5-seeded init: the k vectors with lexicographically smallest
    // md5(vec_id) are centroids 0..k-1 in that order
    var cents: Array[Array[Long]] = e
      .withColumn("mk", md5(col("vec_id").cast("string")))
      .orderBy(col("mk")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Long](0).toArray)
    def assign(): DataFrame = {
      val centDf = s.createDataFrame(
        cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq)
        .toDF("cid", "c")
        .withColumn("cnorm", graft.functions.ArrayMath.dotL(col("c"), col("c")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      e.join(broadcast(centDf))
        .select(col("vec_id"), col("cid"),
          (graft.functions.ArrayMath.dotL(col("v"), col("v")) + col("cnorm") -
            lit(2L) * graft.functions.ArrayMath.dotL(col("v"), col("c"))).as("dist"),
          col("v"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("dist"), col("v"))
    }
    for (_ <- 0 until iters) {
      val sums = assign()
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = cents.zipWithIndex.map { case (old, _) => old.clone() }
      for (r <- sums) {
        val cid = r.getLong(0).toInt; val pos = r.getInt(1)
        val sx = r.getLong(2); val n = r.getLong(3)
        next(cid)(pos) = math.floor(sx.toDouble / n).toLong
      } // clusters with no assignment keep their previous centroid
      cents = next
    }
    (assign(), cents)
  }

  /** DuckDB mirror of q_ann_kmeans: the same md5-seeded init and Lloyd
    * iterations unrolled as a CTE chain (a_j = assignment against c_{j-1},
    * c_j = floored per-dim means with empty-cluster carry via LEFT JOIN).
    * Generated programmatically so k/iters stay in lockstep with the
    * Spark query. */
  private def kmeansOracleSql(k: Int, iters: Int): String =
    kmeansCtes(k, iters) +
      s"""
         |SELECT vec_id, cid, CAST(dist AS BIGINT) AS dist FROM (
         |  SELECT vec_id, cid, dist,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |        FROM v JOIN c$iters c ON v.i = c.i GROUP BY 1, 2))
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** DuckDB mirror of q_ann_ivf_kmeans: final assignment from the same
    * CTE chain, then top-5 cosine within each query's learned list. */
  private def ivfKmeansOracleSql(k: Int, iters: Int): String =
    kmeansCtes(k, iters) +
      s""",
         |af AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c$iters c ON v.i = c.i GROUP BY 1, 2))
         |  WHERE rn = 1),
         |norms AS (SELECT vec_id, sum(x * x) AS n2 FROM v GROUP BY 1),
         |scored AS (
         |  SELECT qa.vec_id AS qid, ca.vec_id AS nb, sum(qv.x * cv.x) AS dot
         |  FROM af qa
         |  JOIN af ca ON ca.cid = qa.cid AND qa.vec_id < 10 AND ca.vec_id <> qa.vec_id
         |  JOIN v qv ON qv.vec_id = qa.vec_id
         |  JOIN v cv ON cv.vec_id = ca.vec_id AND cv.i = qv.i
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, nb, dot / (sqrt(na.n2) * sqrt(nb2.n2)) AS cos,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY dot / (sqrt(na.n2) * sqrt(nb2.n2)) DESC, nb) AS rank
         |  FROM scored JOIN norms na ON na.vec_id = qid
         |  JOIN norms nb2 ON nb2.vec_id = nb)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, nb, round(cos, 6) AS cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** DuckDB mirror of q_ann_ivf_multiprobe: per-query centroid ranking
    * from the same CTE chain, top-`nprobe` lists searched, one rank. */
  private def ivfMultiprobeOracleSql(k: Int, iters: Int, nprobe: Int): String =
    kmeansCtes(k, iters) +
      s""",
         |af AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c$iters c ON v.i = c.i GROUP BY 1, 2))
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c$iters c ON v.i = c.i WHERE v.vec_id < 10 GROUP BY 1, 2))
         |  WHERE rn <= $nprobe),
         |norms AS (SELECT vec_id, sum(x * x) AS n2 FROM v GROUP BY 1),
         |scored AS (
         |  SELECT p.qid, ca.vec_id AS nb, sum(qv.x * cv.x) AS dot
         |  FROM probes p
         |  JOIN af ca ON ca.cid = p.cid AND ca.vec_id <> p.qid
         |  JOIN v qv ON qv.vec_id = p.qid
         |  JOIN v cv ON cv.vec_id = ca.vec_id AND cv.i = qv.i
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, nb, dot / (sqrt(na.n2) * sqrt(nb2.n2)) AS cos,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY dot / (sqrt(na.n2) * sqrt(nb2.n2)) DESC, nb) AS rank
         |  FROM scored JOIN norms na ON na.vec_id = qid
         |  JOIN norms nb2 ON nb2.vec_id = nb)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, nb, round(cos, 6) AS cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Unrolled recall-curve oracle: one kmeans CTE chain + the brute
    * truth + one probe/score/rank arm per nprobe, joined for the ppm
    * recall — replays [[ivfMultiprobeSearch]] per arm exactly as
    * [[ivfMultiprobeOracleSql]] does for a single nprobe. */
  private def ivfRecallOracleSql(k: Int, iters: Int, nprobes: Seq[Int]): String = {
    val arms = nprobes.map { np =>
      s""",
         |probes$np AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c$iters c ON v.i = c.i WHERE v.vec_id < 10 GROUP BY 1, 2))
         |  WHERE rn <= $np),
         |scored$np AS (
         |  SELECT p.qid, ca.vec_id AS nb, sum(qv.x * cv.x) AS dot
         |  FROM probes$np p
         |  JOIN af ca ON ca.cid = p.cid AND ca.vec_id <> p.qid
         |  JOIN v qv ON qv.vec_id = p.qid
         |  JOIN v cv ON cv.vec_id = ca.vec_id AND cv.i = qv.i
         |  GROUP BY 1, 2),
         |ranked$np AS (
         |  SELECT qid, nb,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY dot / (sqrt(na.n2) * sqrt(nb2.n2)) DESC, nb) AS rank
         |  FROM scored$np JOIN norms na ON na.vec_id = qid
         |  JOIN norms nb2 ON nb2.vec_id = nb)""".stripMargin
    }.mkString
    val ivfUnion = nprobes.map(np =>
      s"SELECT CAST($np AS BIGINT) AS nprobe, qid, nb FROM ranked$np WHERE rank <= 5")
      .mkString("\n                 UNION ALL ")
    kmeansCtes(k, iters) +
      s""",
         |af AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c$iters c ON v.i = c.i GROUP BY 1, 2))
         |  WHERE rn = 1),
         |norms AS (SELECT vec_id, sum(x * x) AS n2 FROM v GROUP BY 1)""".stripMargin +
      arms +
      s""",
         |ivf AS ($ivfUnion),
         |bruter AS (
         |  SELECT qid, nb, row_number() OVER (PARTITION BY qid
         |           ORDER BY dot / (sqrt(na.n2) * sqrt(nb2.n2)) DESC, nb) AS rank
         |  FROM (SELECT qv.vec_id AS qid, cv.vec_id AS nb, sum(qv.x * cv.x) AS dot
         |        FROM v qv JOIN v cv ON qv.vec_id < 10 AND cv.vec_id <> qv.vec_id AND cv.i = qv.i
         |        GROUP BY 1, 2) s
         |  JOIN norms na ON na.vec_id = s.qid
         |  JOIN norms nb2 ON nb2.vec_id = s.nb),
         |brute AS (SELECT qid, nb FROM bruter WHERE rank <= 5),
         |bc AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM brute)
         |SELECT i.nprobe, CAST(count(*) AS BIGINT) AS n_returned,
         |       CAST(sum(CASE WHEN b.nb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       (sum(CASE WHEN b.nb IS NOT NULL THEN 1 ELSE 0 END) * 1000000) // max(n_truth) AS recall_ppm
         |FROM ivf i LEFT JOIN brute b ON b.qid = i.qid AND b.nb = i.nb, bc
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // Quantization parity note (all embedding oracles): Spark promotes
  // FLOAT * 1000 to DOUBLE before rounding; DuckDB would multiply in
  // FLOAT, which rounds a handful of products onto exact .5 ties the
  // double product misses (first seen at sf0.1: vec 1879 dim 18,
  // float 319.5 vs double 319.49999928 → round 320 vs 319). Every
  // oracle therefore CASTs to DOUBLE first, mirroring Spark's
  // arithmetic exactly at any SF.
  private def kmeansCtes(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH v AS (
              |  SELECT vec_id, i, CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000) AS BIGINT) AS x
              |  FROM embeddings, range(64) t(i)),
              |init AS (
              |  SELECT vec_id, rn - 1 AS cid FROM (
              |    SELECT vec_id, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
              |    FROM embeddings) WHERE rn <= $k),
              |c0 AS (
              |  SELECT init.cid, v.i, v.x AS cx FROM init JOIN v ON v.vec_id = init.vec_id)""".stripMargin
    for (j <- 1 to iters) {
      sb ++= s""",
                |a$j AS (
                |  SELECT vec_id, cid FROM (
                |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
                |          FROM v JOIN c${j - 1} c ON v.i = c.i GROUP BY 1, 2))
                |  WHERE rn = 1),
                |c$j AS (
                |  SELECT p.cid, p.i, COALESCE(u.cx, p.cx) AS cx
                |  FROM c${j - 1} p LEFT JOIN (
                |    SELECT a.cid, v.i, CAST(floor(CAST(sum(v.x) AS DOUBLE) / count(*)) AS BIGINT) AS cx
                |    FROM a$j a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2) u
                |  ON u.cid = p.cid AND u.i = p.i)""".stripMargin
    }
    sb.toString
  }

  /** Unrolled CTE chain replaying [[pqLloydCodebook]] + the final
    * encode: subspace rows (sub = i div 16, j = i mod 16), init
    * codebook = vec_id < k, per-iteration argmin assignment and
    * floored-mean update, exactly as the engine's driver loop. */
  private def pqLloydOracleSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH v AS (
              |  SELECT vec_id, CAST(i // 16 AS BIGINT) AS sub, CAST(i % 16 AS BIGINT) AS j,
              |         CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000) AS BIGINT) AS x
              |  FROM embeddings, range(64) t(i)),
              |c0 AS (
              |  SELECT sub, CAST(vec_id AS BIGINT) AS code, j, x AS cx
              |  FROM v WHERE vec_id < $k)""".stripMargin
    for (n <- 1 to iters) {
      sb ++= s""",
                |a$n AS (
                |  SELECT vec_id, sub, code FROM (
                |    SELECT vec_id, sub, code,
                |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
                |    FROM (SELECT v.vec_id, v.sub, c.code,
                |                 sum((v.x - c.cx) * (v.x - c.cx)) AS dist
                |          FROM v JOIN c${n - 1} c ON v.sub = c.sub AND v.j = c.j
                |          GROUP BY 1, 2, 3))
                |  WHERE rn = 1),
                |c$n AS (
                |  SELECT p.sub, p.code, p.j, COALESCE(u.cx, p.cx) AS cx
                |  FROM c${n - 1} p LEFT JOIN (
                |    SELECT a.sub, a.code, v.j,
                |           CAST(floor(CAST(sum(v.x) AS DOUBLE) / count(*)) AS BIGINT) AS cx
                |    FROM a$n a JOIN v ON v.vec_id = a.vec_id AND v.sub = a.sub
                |    GROUP BY 1, 2, 3) u
                |  ON u.sub = p.sub AND u.code = p.code AND u.j = p.j)""".stripMargin
    }
    sb ++= s""",
              |d AS (SELECT v.vec_id, v.sub, c.code,
              |             sum((v.x - c.cx) * (v.x - c.cx)) AS d2
              |      FROM v JOIN c$iters c ON v.sub = c.sub AND v.j = c.j
              |      GROUP BY 1, 2, 3),
              |a AS (SELECT vec_id, sub, code, d2,
              |             row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
              |      FROM d)
              |SELECT sub, code, count(*) AS n, CAST(sum(d2) AS BIGINT) AS sum_err
              |FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY sub, code""".stripMargin
    sb.toString
  }

  /** Unrolled CTE replay of [[powerIterTop]]: HUGEINT Gram matrix,
    * all-1000 start vector, per-iteration matvec + sign-split
    * normalization (both division operands non-negative, so floor ≡
    * truncate ≡ the engine's BigInt division). */
  private def powerIterOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v AS (
             |  SELECT list_transform(embedding,
             |           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings),
             |g AS MATERIALIZED (
             |  SELECT i.i AS i, j.j AS j,
             |         sum(CAST(v.v[i.i + 1] AS HUGEINT) * v.v[j.j + 1]) AS g
             |  FROM v, range(64) i(i), range(64) j(j) GROUP BY 1, 2),
             |x0 AS (SELECT CAST(t.d AS BIGINT) AS dim, CAST(1000 AS HUGEINT) AS x
             |       FROM range(64) t(d))""".stripMargin
    for (n <- 1 to iters) {
      sb ++= s""",
                |y$n AS (SELECT g.i AS dim, sum(g.g * x.x) AS y
                |        FROM g JOIN x${n - 1} x ON g.j = x.dim GROUP BY 1),
                |m$n AS (SELECT max(abs(y)) AS m FROM y$n),
                |x$n AS (SELECT dim,
                |          CASE WHEN y < 0 THEN -(((-y) * 1000) // m)
                |               ELSE (y * 1000) // m END AS x
                |        FROM y$n, m$n)""".stripMargin
    }
    sb ++= s"""
              |SELECT dim, CAST(x AS BIGINT) AS comp FROM x$iters ORDER BY dim""".stripMargin
    sb.toString
  }

  /** Unrolled greedy replay of q_ann_mmr: identical top-20 pool,
    * identical score = −d2q + min d2-to-selected, identical argmax with
    * min-id tie-break, one CTE pair per selection step. */
  private def mmrOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH e AS (SELECT vec_id,
             |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
             |  FROM embeddings),
             |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
             |pool AS MATERIALIZED (
             |  SELECT c.vec_id AS cid, c.v,
             |         list_reduce(list_transform(list_zip(c.v, q.qv),
             |           p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2q
             |  FROM e c, q WHERE c.vec_id <> 0
             |  ORDER BY d2q, cid LIMIT 20),
             |pd AS MATERIALIZED (
             |  SELECT a.cid AS a, b.cid AS b,
             |         list_reduce(list_transform(list_zip(a.v, b.v),
             |           p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
             |  FROM pool a JOIN pool b ON a.cid <> b.cid),
             |sel1 AS (SELECT cid, CAST(1 AS BIGINT) AS ord
             |         FROM pool ORDER BY d2q, cid LIMIT 1)""".stripMargin
    for (r <- 2 to k) {
      sb ++= s""",
                |c$r AS (
                |  SELECT p.cid,
                |         -p.d2q + (SELECT min(pd.d2) FROM pd
                |                   WHERE pd.a = p.cid
                |                     AND pd.b IN (SELECT cid FROM sel${r - 1})) AS score
                |  FROM pool p
                |  WHERE p.cid NOT IN (SELECT cid FROM sel${r - 1})),
                |sel$r AS (
                |  SELECT * FROM sel${r - 1}
                |  UNION ALL
                |  SELECT cid, CAST($r AS BIGINT) AS ord
                |  FROM (SELECT cid FROM c$r ORDER BY score DESC, cid LIMIT 1))""".stripMargin
    }
    sb ++= s"""
              |SELECT s.ord, s.cid AS vec_id, p.d2q
              |FROM sel$k s JOIN pool p ON p.cid = s.cid ORDER BY s.ord""".stripMargin
    sb.toString
  }

  /** DuckDB oracles — same semantics, same aliases, same ORDER BY. */
  val oracleSql: Map[String, String] = Map(
    // identical trailing-20 integer window sums and cleared-denominator
    // z-test
    "q_events_rolling_zscore" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            w AS (SELECT user_id, x,
                         CAST(count(*) OVER f AS BIGINT) AS n,
                         CAST(sum(x) OVER f AS BIGINT) AS s,
                         CAST(sum(x * x) OVER f AS BIGINT) AS ss
                  FROM e
                  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
            fl AS (SELECT user_id,
                          n >= 10 AND
                          (n * x - s) * (n * x - s) > 9 * (n * ss - s * s) AS flag
                   FROM w)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
         FROM fl GROUP BY 1 ORDER BY user_id""",
    // identical per-dim ranges, integer codes and reconstructions
    "q_embed_sq8_error" ->
      """WITH v AS (SELECT CAST(i AS BIGINT) AS dim,
                           CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000000)
                             AS BIGINT) AS q
                    FROM embeddings, range(64) t(i)),
            r AS (SELECT dim, min(q) AS mn, max(q) AS mx FROM v GROUP BY 1),
            c AS (SELECT v.dim, v.q, r.mn, r.mx,
                         ((v.q - r.mn) * 255) // nullif(r.mx - r.mn, 0) AS code
                  FROM v JOIN r ON v.dim = r.dim),
            e AS (SELECT dim, mn, mx,
                         abs(q - (mn + (coalesce(code, 0) * (mx - mn)) // 255)) AS err
                  FROM c)
         SELECT dim, CAST(count(*) AS BIGINT) AS n,
                CAST(max(mn) AS BIGINT) AS mn, CAST(max(mx) AS BIGINT) AS mx,
                CAST(sum(err) AS BIGINT) AS sum_abs_err,
                CAST(max(err) AS BIGINT) AS max_abs_err,
                CAST(sum(err) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_abs_err
         FROM e GROUP BY 1 ORDER BY dim""",
    // identical cleared-denominator |ca·Nb − cb·Na| sums over the full
    // outer token join, HUGEINT ppm
    "q_text_tv_distance" ->
      """WITH ct AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                     FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                           FROM documents) GROUP BY 1, 2),
            tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
                    FROM ct GROUP BY 1),
            prs AS (SELECT ta.source AS sa, tb.source AS sb,
                           ta.n AS na, tb.n AS nb
                    FROM tot ta JOIN tot tb ON ta.source < tb.source),
            a AS (SELECT p.sa, p.sb, ct.tok, ct.cnt AS ca
                  FROM ct JOIN prs p ON ct.source = p.sa),
            b AS (SELECT p.sa AS sa2, p.sb AS sb2, ct.tok AS tok2, ct.cnt AS cb
                  FROM ct JOIN prs p ON ct.source = p.sb),
            m AS (SELECT coalesce(a.sa, b.sa2) AS sa, coalesce(a.sb, b.sb2) AS sb,
                         coalesce(a.ca, 0) AS ca, coalesce(b.cb, 0) AS cb
                  FROM a FULL OUTER JOIN b
                    ON a.sa = b.sa2 AND a.sb = b.sb2 AND a.tok = b.tok2),
            g AS (SELECT m.sa, m.sb, max(p.na) AS na, max(p.nb) AS nb,
                         sum(abs(CAST(m.ca AS HUGEINT) * p.nb
                                 - CAST(m.cb AS HUGEINT) * p.na)) AS sdiff
                  FROM m JOIN prs p ON m.sa = p.sa AND m.sb = p.sb
                  GROUP BY 1, 2)
         SELECT sa, sb, na, nb,
                CAST((sdiff * 1000000) // (CAST(2 AS HUGEINT) * na * nb)
                  AS BIGINT) AS tv_ppm
         FROM g ORDER BY sa, sb""",
    // identical 32-slot spine and 5 unrolled sum/diff levels (k aliases
    // avoid DuckDB's lateral alias capture of the regrouped slot)
    "q_events_haar_energy" -> {
      val lvl = (1 to 5).map { l =>
        val src = if (l == 1) "s0" else s"s${l - 1}"
        s"""p$l AS (SELECT event_type, slot // 2 AS k,
           |              CAST(sum(CASE WHEN slot % 2 = 0 THEN v ELSE 0 END) AS BIGINT) AS ev,
           |              CAST(sum(CASE WHEN slot % 2 = 1 THEN v ELSE 0 END) AS BIGINT) AS od
           |       FROM $src GROUP BY 1, 2),
           |e$l AS (SELECT event_type, CAST($l AS BIGINT) AS level,
           |               CAST(count(*) AS BIGINT) AS n_coefs,
           |               CAST(sum(CAST((ev - od) * (ev - od) AS HUGEINT)) AS BIGINT) AS energy
           |        FROM p$l GROUP BY 1),
           |s$l AS (SELECT event_type, k AS slot, ev + od AS v FROM p$l)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT event_type,
         |                   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
         |            FROM events),
         |m AS (SELECT min(day) AS d0 FROM ev),
         |daily AS (SELECT event_type, day - d0 AS slot,
         |                 CAST(count(*) AS BIGINT) AS v
         |          FROM ev, m WHERE day - d0 < 32 GROUP BY 1, 2),
         |spine AS (SELECT t.event_type, s.slot
         |          FROM (SELECT DISTINCT event_type FROM daily) t,
         |               (SELECT CAST(unnest(range(32)) AS BIGINT) AS slot) s),
         |s0 AS (SELECT spine.event_type, spine.slot, coalesce(daily.v, 0) AS v
         |       FROM spine LEFT JOIN daily
         |         ON spine.event_type = daily.event_type
         |        AND spine.slot = daily.slot),
         |$lvl
         |SELECT * FROM (SELECT event_type, level, n_coefs, energy FROM e1
         |  UNION ALL SELECT event_type, level, n_coefs, energy FROM e2
         |  UNION ALL SELECT event_type, level, n_coefs, energy FROM e3
         |  UNION ALL SELECT event_type, level, n_coefs, energy FROM e4
         |  UNION ALL SELECT event_type, level, n_coefs, energy FROM e5)
         |ORDER BY event_type, level""".stripMargin
    },
    // identical rank-pick deciles per cohort, identical decile join
    "q_events_qq" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                           event_id,
                           (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 < 2 AS g
                    FROM events),
            r AS (SELECT event_type, g, c,
                         row_number() OVER (PARTITION BY event_type, g
                                            ORDER BY c, event_id) AS rn,
                         count(*) OVER (PARTITION BY event_type, g) AS n
                  FROM e),
            d AS (SELECT event_type, g, CAST(q AS BIGINT) AS q,
                         CAST(max(c) AS BIGINT) AS val
                  FROM r, (SELECT unnest(range(1, 10)) AS q) qs
                  WHERE rn = (q * n + 9) // 10
                  GROUP BY 1, 2, 3)
         SELECT a.event_type, a.q, a.val AS weekend_cents,
                b.val AS weekday_cents, a.val - b.val AS qq_diff_cents
         FROM d a JOIN d b ON a.event_type = b.event_type AND a.q = b.q
                          AND a.g AND NOT b.g
         ORDER BY a.event_type, a.q""",
    // the BRUTE-FORCE quadratic neighbor join — identical output to the
    // grid-bucketed plan is the proof the rewrite is lossless
    "q_join_spatial_grid" ->
      """WITH p AS (SELECT doc_id,
                           CAST(('0x' || substr(md5('x' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                             AS BIGINT) % 1000 AS x,
                           CAST(('0x' || substr(md5('y' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                             AS BIGINT) % 1000 AS y
                    FROM documents WHERE doc_id < 2000)
         SELECT a.doc_id AS ia, b.doc_id AS ib,
                a.x - b.x AS dx, a.y - b.y AS dy
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE abs(a.x - b.x) <= 8 AND abs(a.y - b.y) <= 8
         ORDER BY ia, ib""",
    // identical exact-L2 scores, conditional min/max per anchor
    "q_embed_triplet" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings WHERE vec_id < 200),
            sc AS (SELECT q.vec_id AS qid, q.label AS qlabel,
                          c.label = q.label AS same,
                          list_reduce(list_transform(list_zip(q.v, c.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                   FROM e q JOIN e c ON c.vec_id <> q.vec_id)
         SELECT qid, qlabel AS label,
                CAST(max(CASE WHEN same THEN d2 END) AS BIGINT) AS hard_pos_d2,
                CAST(min(CASE WHEN NOT same THEN d2 END) AS BIGINT) AS hard_neg_d2,
                CAST(min(CASE WHEN NOT same THEN d2 END)
                     - max(CASE WHEN same THEN d2 END) AS BIGINT) AS margin
         FROM sc GROUP BY 1, 2 ORDER BY qid""",
    // identical band-bucket pair list, 3-way vertex credit, ppm coeff
    "q_graph_clustering_coeff" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       tri AS (
         SELECT p1.ia AS a, p1.ib AS b, p2.ib AS c
         FROM pairs p1 JOIN pairs p2 ON p1.ib = p2.ia
              JOIN pairs p3 ON p1.ia = p3.ia AND p2.ib = p3.ib
       ),
       tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
              FROM (SELECT a AS node FROM tri
                    UNION ALL SELECT b AS node FROM tri
                    UNION ALL SELECT c AS node FROM tri)
              GROUP BY 1),
       deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
               FROM (SELECT ia AS node FROM pairs
                     UNION ALL SELECT ib AS node FROM pairs)
               GROUP BY 1)
       SELECT d.node, d.deg, coalesce(tn.n_tri, 0) AS n_tri,
              (coalesce(tn.n_tri, 0) * 2000000)
                // nullif(d.deg * (d.deg - 1), 0) AS coeff_ppm
       FROM deg d LEFT JOIN tn ON d.node = tn.node
       ORDER BY d.node"""),
    // identical hashed-shingle index; the keep-filter compares ppm ints
    "q_dedup_containment" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE doc_id < 1000),
            grams AS (SELECT DISTINCT doc_id,
                             CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT AS BIGINT) AS h
                      FROM (SELECT doc_id,
                                   unnest(CASE WHEN len(w) >= 3 THEN
                                     list_transform(range(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                                   ELSE [] END) AS g
                            FROM words)),
            sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
                      FROM grams GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                             CAST(count(*) AS BIGINT) AS inter
                      FROM grams a JOIN grams b
                        ON a.h = b.h AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            sc AS (SELECT ia, ib, inter,
                          (inter * 1000000) // sa.sz AS cont_a_ppm,
                          (inter * 1000000) // sb.sz AS cont_b_ppm
                   FROM inter JOIN sizes sa ON ia = sa.doc_id
                        JOIN sizes sb ON ib = sb.doc_id)
         SELECT ia, ib, inter, cont_a_ppm, cont_b_ppm
         FROM sc WHERE greatest(cont_a_ppm, cont_b_ppm) >= 800000
         ORDER BY ia, ib""",
    // identical day-grain counts and (type, day-7) self-join
    "q_events_forecast_backtest" ->
      """WITH d AS (SELECT event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                           CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
            e AS (SELECT cur.event_type, cur.cnt - prev.cnt AS err
                  FROM d cur JOIN d prev
                    ON cur.event_type = prev.event_type
                   AND cur.day = prev.day + 7)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(abs(err)) AS BIGINT) AS sum_abs_err,
                CAST(sum(err) AS BIGINT) AS bias,
                (CAST(sum(abs(err)) AS BIGINT) * 100)
                  // CAST(count(*) AS BIGINT) AS mae_centi
         FROM e GROUP BY 1 ORDER BY event_type""",
    // identical exact-L2 directed 5-NN edges and reversed-key self-join
    "q_ann_reciprocity" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings WHERE vec_id < 200),
            sc AS (SELECT q.vec_id AS qid, q.label AS qlabel, c.vec_id AS nb,
                          list_reduce(list_transform(list_zip(q.v, c.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                   FROM e q JOIN e c ON c.vec_id <> q.vec_id),
            ranked AS (SELECT qid, qlabel, nb,
                              row_number() OVER (PARTITION BY qid ORDER BY d2, nb) AS rn
                       FROM sc),
            edges AS (SELECT qid, qlabel, nb FROM ranked WHERE rn <= 5)
         SELECT f.qlabel AS label, CAST(count(*) AS BIGINT) AS n_edges,
                CAST(sum(CASE WHEN r.qid IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_mutual,
                (CAST(sum(CASE WHEN r.qid IS NULL THEN 0 ELSE 1 END) AS BIGINT) * 1000000)
                  // CAST(count(*) AS BIGINT) AS recip_ppm
         FROM edges f LEFT JOIN edges r ON f.qid = r.nb AND f.nb = r.qid
         GROUP BY 1 ORDER BY label""",
    // identical ntile over the unique (tot, user_id) order, HUGEINT ppm
    "q_events_lorenz" ->
      """WITH u AS (SELECT event_type, user_id,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
                    FROM events GROUP BY 1, 2),
            d AS (SELECT event_type, user_id, tot,
                         ntile(10) OVER (PARTITION BY event_type
                                         ORDER BY tot, user_id) AS decile
                  FROM u),
            g AS (SELECT event_type, CAST(decile AS BIGINT) AS decile,
                         CAST(count(*) AS BIGINT) AS n_users,
                         CAST(sum(tot) AS BIGINT) AS dec_cents
                  FROM d GROUP BY 1, 2),
            w AS (SELECT event_type, decile, n_users, dec_cents,
                         CAST(sum(dec_cents) OVER (PARTITION BY event_type
                               ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_cents,
                         CAST(sum(dec_cents) OVER (PARTITION BY event_type)
                           AS BIGINT) AS total_cents
                  FROM g)
         SELECT event_type, decile, n_users, dec_cents, cum_cents,
                CAST((CAST(cum_cents AS HUGEINT) * 1000000) // total_cents
                  AS BIGINT) AS cum_share_ppm
         FROM w ORDER BY event_type, decile""",
    // identical sorted 5-row frame lists and doubled exact medians
    "q_window_rolling_median" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT user_id,
                         row_number() OVER o AS rn,
                         list_sort(list(c) OVER f) AS win
                  FROM e
                  WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id),
                         f AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
            m AS (SELECT user_id, rn,
                         CASE WHEN len(win) % 2 = 1
                              THEN 2 * win[(len(win) + 1) // 2]
                              ELSE win[len(win) // 2] + win[len(win) // 2 + 1]
                          END AS med2
                  FROM w)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(min(med2) AS BIGINT) AS min_med2,
                CAST(max(med2) AS BIGINT) AS max_med2,
                CAST(max_by(med2, rn) AS BIGINT) AS last_med2
         FROM m GROUP BY 1 ORDER BY user_id""",
    // identical 1e-6 quantization, exact HUGEINT product sums, one
    // identically-associated double division per pair
    "q_embed_covariance" ->
      """WITH q AS (SELECT vec_id, i,
                           CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000000)
                             AS BIGINT) AS x
                    FROM embeddings, range(8) t(i)),
            p AS (SELECT a.i AS di, b.i AS dj,
                         CAST(count(*) AS BIGINT) AS n,
                         sum(CAST(a.x AS HUGEINT) * b.x) AS pij,
                         sum(CAST(a.x AS HUGEINT)) AS si,
                         sum(CAST(b.x AS HUGEINT)) AS sj
                  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
                  GROUP BY 1, 2)
         SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
                round((CAST(pij AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * 1000000000000.0), 9) + 0.0 AS cov
         FROM p ORDER BY dim_i, dim_j""",
    // identical epoch-cycle cohort, cents threshold, HUGEINT ppm
    "q_events_odds_ratio" ->
      """WITH e AS (SELECT event_type,
                           (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 < 2 AS g,
                           CAST(round(value * 100) AS BIGINT) >= 3500 AS hi
                    FROM events),
            t AS (SELECT event_type,
                         CAST(sum(CASE WHEN g AND hi THEN 1 ELSE 0 END) AS BIGINT) AS a,
                         CAST(sum(CASE WHEN g AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS b,
                         CAST(sum(CASE WHEN NOT g AND hi THEN 1 ELSE 0 END) AS BIGINT) AS c,
                         CAST(sum(CASE WHEN NOT g AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS d
                  FROM e GROUP BY 1)
         SELECT event_type, a, b, c, d,
                CAST((CAST(a AS HUGEINT) * d * 1000000)
                     // nullif(CAST(b AS HUGEINT) * c, 0) AS BIGINT) AS or_ppm,
                CAST((CAST(a AS HUGEINT) * (c + d) * 1000000)
                     // nullif(CAST(c AS HUGEINT) * (a + b), 0) AS BIGINT) AS rr_ppm
         FROM t ORDER BY event_type""",
    // identical dyadic age buckets and shift-divide decay
    "q_events_decay_score" ->
      """WITH e AS (SELECT user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            m AS (SELECT max(sec) AS max_sec FROM e),
            a AS (SELECT user_id, c,
                         least((max_sec - sec) // 259200, 40) AS age
                  FROM e, m)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(c // (CAST(1 AS BIGINT) << age)) AS BIGINT) AS decayed_cents,
                CAST(sum(c) AS BIGINT) AS raw_cents
         FROM a GROUP BY 1 ORDER BY user_id""",
    // identical user-grain totals; HUGEINT mirrors decimal(38,0)
    "q_agg_hhi" ->
      """WITH u AS (SELECT event_type, user_id,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
                    FROM events GROUP BY 1, 2),
            a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                         CAST(sum(tot) AS BIGINT) AS total_cents,
                         sum(CAST(tot AS HUGEINT) * tot) AS ss
                  FROM u GROUP BY 1)
         SELECT event_type, n_users, total_cents,
                CAST((ss * 1000000) // (CAST(total_cents AS HUGEINT) * total_cents)
                  AS BIGINT) AS hhi_ppm
         FROM a ORDER BY event_type""",
    // identical md5 relabel draw, identical ppm floor divisions
    "q_eval_kappa" ->
      """WITH l AS (SELECT CAST(label % 4 AS BIGINT) AS a,
                           CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT
                             AS BIGINT) AS h
                    FROM embeddings),
            ab AS (SELECT a, CASE WHEN h % 10 < 6 THEN a
                                  ELSE (a + 1 + h % 3) % 4 END AS b FROM l),
            base AS (SELECT CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
                     FROM ab),
            ma AS (SELECT a AS k, CAST(count(*) AS BIGINT) AS na FROM ab GROUP BY 1),
            mb AS (SELECT b AS k, CAST(count(*) AS BIGINT) AS nb FROM ab GROUP BY 1),
            j AS (SELECT CAST(sum(na * nb) AS BIGINT) AS joint
                  FROM ma JOIN mb USING (k)),
            p AS (SELECT n, agree,
                         (agree * 1000000) // n AS po_ppm,
                         (joint * 1000000) // (n * n) AS pe_ppm
                  FROM base, j)
         SELECT n, agree, po_ppm, pe_ppm,
                ((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm) AS kappa_ppm
         FROM p""",
    // identical epoch-cycle cohorts, exact sums, one cast placement
    "q_events_ttest" ->
      """WITH e AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS x,
                           (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 < 2 AS g
                    FROM events),
            a AS (SELECT event_type,
                         CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                         sum(CASE WHEN g THEN CAST(x AS HUGEINT) ELSE 0 END) AS s1,
                         sum(CASE WHEN g THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS ss1,
                         CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
                         sum(CASE WHEN g THEN 0 ELSE CAST(x AS HUGEINT) END) AS s0,
                         sum(CASE WHEN g THEN 0 ELSE CAST(x AS HUGEINT) * x END) AS ss0
                  FROM e GROUP BY 1),
            d AS (SELECT event_type, n_a, n_b,
                         CAST(s1 AS DOUBLE) / n_a - CAST(s0 AS DOUBLE) / n_b AS md,
                         (CAST(ss1 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_a)
                           / (n_a - 1) / n_a AS va,
                         (CAST(ss0 AS DOUBLE)
                           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n_b)
                           / (n_b - 1) / n_b AS vb
                  FROM a)
         SELECT event_type, n_a, n_b,
                round(md / sqrt(va + vb), 6) + 0.0 AS t_welch
         FROM d ORDER BY event_type""",
    // identical full-frame windows over the identical (ts, event_id) order
    "q_window_nth" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT user_id,
                         row_number() OVER o AS rn,
                         CAST(count(*) OVER f AS BIGINT) AS n,
                         first_value(event_type) OVER f AS first_type,
                         last_value(event_type) OVER f AS last_type,
                         first_value(c) OVER f AS first_cents,
                         nth_value(c, 2) OVER f AS second_cents,
                         last_value(c) OVER f AS last_cents
                  FROM e
                  WINDOW o AS (PARTITION BY user_id ORDER BY ts, event_id),
                         f AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING))
         SELECT user_id, n, first_type, last_type,
                first_cents, second_cents, last_cents
         FROM w WHERE rn = 1 ORDER BY user_id""",
    "q_ann_mmr" -> mmrOracleSql(5),
    "q_ann_pq_lloyd" -> pqLloydOracleSql(8, 3),
    "q_embed_power_iter" -> powerIterOracleSql(3),
    // same packed (hash, reversed-pos) argmin; `//`/`%` on non-negatives
    "q_text_minimizers" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 8),
         g AS (
           SELECT doc_id, CAST(ps.p AS BIGINT) AS pos,
                  list_reduce(list_transform(
                      regexp_extract_all(substr(text, CAST(ps.p AS INTEGER), 5), '.'),
                      c -> CAST(ascii(c) AS BIGINT)),
                    (a, b) -> (a * 31 + b) % 1000000007) AS h
           FROM d, LATERAL (SELECT unnest(range(1, length(text) - 3)) AS p) ps),
         kk AS (SELECT doc_id, pos, h * 1048576 + (1048575 - pos) AS key FROM g),
         wm AS (
           SELECT doc_id, pos,
                  min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
                  count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
           FROM kk),
         sel AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected FROM (
             SELECT DISTINCT doc_id, 1048575 - (mk % 1048576) AS spos
             FROM wm WHERE c = 4)
           GROUP BY doc_id),
         nk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kgrams FROM g GROUP BY 1)
         SELECT nk.doc_id, nk.n_kgrams, sel.n_selected,
                sel.n_selected * 1000000 // nk.n_kgrams AS density_ppm
         FROM nk JOIN sel ON nk.doc_id = sel.doc_id
         ORDER BY nk.doc_id""",
    "q_dedup_embedding_lsh" ->
      """WITH q AS (
           SELECT vec_id, i, CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000) AS BIGINT) AS qv
           FROM embeddings, range(64) t(i)),
         h AS (
           SELECT p, d,
                  ((CAST(('0x' || substr(md5(p || ':' || d), 1, 8))::UBIGINT AS BIGINT) % 2001) - 1000) AS hv
           FROM range(16) tp(p), range(64) td(d)),
         dots AS (
           SELECT q.vec_id, h.p, sum(q.qv * h.hv) AS dot
           FROM q JOIN h ON q.i = h.d GROUP BY 1, 2),
         sigs AS (
           SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS sig
           FROM dots GROUP BY 1),
         bands AS (
           SELECT vec_id, b, (sig >> (4 * b)) & 15 AS bv FROM sigs, range(4) tb(b)),
         cand AS (
           SELECT DISTINCT x.vec_id AS ia, y.vec_id AS ib
           FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.vec_id < y.vec_id),
         norms AS (SELECT vec_id, sum(qv * qv) AS n2 FROM q GROUP BY 1),
         pairdot AS (
           SELECT c.ia, c.ib, sum(qa.qv * qb.qv) AS dot
           FROM cand c
           JOIN q qa ON qa.vec_id = c.ia
           JOIN q qb ON qb.vec_id = c.ib AND qb.i = qa.i
           GROUP BY 1, 2)
         SELECT ia, ib, round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos
         FROM pairdot
         JOIN norms na ON na.vec_id = ia
         JOIN norms nb ON nb.vec_id = ib
         WHERE round(dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) >= 0.35
         ORDER BY ia, ib""",
    "q_scan_filter" ->
      """SELECT l_returnflag, count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.02
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_agg_stats" ->
      """SELECT o_orderpriority, n, sum_c, round(sum_c / (n * 100.0), 4) AS avg_price FROM (
           SELECT o_orderpriority, count(*) AS n,
                  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_c
           FROM orders GROUP BY o_orderpriority) ORDER BY o_orderpriority""",
    "q_agg_histogram" ->
      """SELECT CAST(floor(value/10) AS BIGINT) AS bucket, count(*) AS n
         FROM events GROUP BY 1 ORDER BY bucket""",
    "q_agg_bins" ->
      """SELECT CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'good'
                     WHEN value >= 10 THEN 'ok' ELSE 'low' END AS bin,
                count(*) AS n,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
         FROM events GROUP BY 1 ORDER BY bin""",
    "q_agg_split" ->
      """SELECT lang,
                CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
                CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_band_filter" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
         FROM events WHERE value >= 0.5 AND value <= 50 AND event_type <> 'error'
         GROUP BY event_type ORDER BY event_type""",
    "q_join_lookup" ->
      """SELECT r_name, count(*) AS n,
                CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
                       LEFT JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_join_fuzzy" ->
      """SELECT a.n_name AS a_name, b.n_name AS b_name
         FROM nation a JOIN nation b
           ON levenshtein(a.n_name, b.n_name) <= 1 AND a.n_name < b.n_name
         ORDER BY a_name, b_name""",
    "q_join_anti" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_semi" ->
      """SELECT p_brand, count(*) AS n FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY p_brand ORDER BY p_brand""",
    "q_topk_native" ->
      """SELECT user_id, event_id, c FROM (
           SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS c,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id) AS rn
           FROM events WHERE user_id < 20)
         WHERE rn <= 3
         ORDER BY user_id, c DESC, event_id""",
    "q_topk" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
         FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 10""",
    "q_window_rank" ->
      """SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS value_c FROM (
           SELECT user_id, event_id, value,
                  row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q_window_sessions" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
                  CASE WHEN prev_ms IS NULL OR cur_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, epoch_ms(ts) AS cur_ms,
                        lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
                 FROM events))
         GROUP BY user_id ORDER BY user_id""",
    "q_window_running" ->
      """SELECT user_id, event_id,
                CAST(sum(CAST(round(value*100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
         FROM events WHERE user_id < 20 ORDER BY user_id, event_id""",
    "q_dedup_priority" ->
      """WITH d AS (
           SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  array_to_string(string_split(text, ' ')[1:3], ' ') AS key,
                  CAST(doc_id % 3 AS BIGINT) AS prio
           FROM documents)
         SELECT key, count(*) AS n_copies,
                CAST(arg_max(doc_id, prio * 1000000 + doc_id) AS BIGINT) AS keep_doc,
                CAST(arg_min(doc_id, prio * 1000000 + doc_id) AS BIGINT) AS worst_doc,
                CAST(max(prio) AS BIGINT) AS best_prio
         FROM d GROUP BY key ORDER BY key""",
    "q_text_redact" ->
      """WITH d AS (
           SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CASE WHEN doc_id % 5 = 0
                    THEN text || ' contact-' || doc_id || '@example.com ph 1234567890'
                    ELSE text END AS tx
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(tx,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(tx, '[0-9]{7,}')) AS BIGINT) AS n_num,
                md5(regexp_replace(regexp_replace(tx,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5
         FROM d ORDER BY doc_id""",
    "q_text_repetition" ->
      """WITH words AS (
           SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS w
           FROM documents),
         grams AS (
           SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN
                    list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [] END) AS g
           FROM words),
         cnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
         SELECT doc_id, CAST(max(c) AS BIGINT) AS top_gram_n,
                CAST(sum(c) AS BIGINT) AS n_grams,
                round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS rep_ratio
         FROM cnt GROUP BY doc_id ORDER BY doc_id""",
    "q_sample_stratified" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
                CAST(doc_id % 3 AS BIGINT) AS stratum,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
                     AS BIGINT) AS h
         FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 <
               CASE doc_id % 3 WHEN 0 THEN 50 WHEN 1 THEN 20 ELSE 5 END
         ORDER BY doc_id""",
    "q_pack_sequences" ->
      """WITH d AS (
           SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(doc_id % 4 AS BIGINT) AS shard,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         c AS (
           SELECT *, CAST(coalesce(sum(n_tok) OVER (
                  PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
           FROM d)
         SELECT doc_id, shard, n_tok, start_tok,
                CAST(start_tok // 2048 AS BIGINT) AS seq_id
         FROM c ORDER BY doc_id""",
    // identical CASE ladder; all-integer padding arithmetic
    "q_pack_lenbuckets" ->
      """WITH d AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
         b AS (
           SELECT CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
                       WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
                       WHEN n_tok <= 256 THEN 256 WHEN n_tok <= 512 THEN 512
                       WHEN n_tok <= 1024 THEN 1024 ELSE 2048 END AS bucket,
                  n_tok
           FROM d),
         g AS (
           SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
                  CAST(sum(n_tok) AS BIGINT) AS real_tok
           FROM b GROUP BY 1)
         SELECT bucket, n_docs, real_tok,
                CAST(n_docs * bucket AS BIGINT) AS padded_tok,
                CAST((n_docs * bucket - real_tok) * 1000000 // (n_docs * bucket) AS BIGINT) AS waste_ppm
         FROM g ORDER BY bucket""",
    // arg_max/arg_min on the identical composite ordinal
    "q_pref_pairs" ->
      """WITH cand AS (
           SELECT user_id, event_id,
                  CAST(round(value * 100) AS BIGINT) AS score_c,
                  CAST(round(value * 100) AS BIGINT) * 100000000 - event_id AS ord
           FROM events WHERE event_type = 'purchase'),
         g AS (
           SELECT user_id, count(*) AS n_cand,
                  arg_max(event_id, ord) AS chosen_id,
                  CAST(max(score_c) AS BIGINT) AS chosen_c,
                  arg_min(event_id, ord) AS rejected_id,
                  CAST(min(score_c) AS BIGINT) AS rejected_c
           FROM cand GROUP BY user_id)
         SELECT user_id, chosen_id, rejected_id,
                CAST(chosen_c - rejected_c AS BIGINT) AS margin_c
         FROM g WHERE n_cand >= 2 ORDER BY user_id""",
    // the window-rank derivation of the same deterministic k-sample
    "q_sample_priority" ->
      """WITH d AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) + 1 AS u
           FROM documents),
         p AS (SELECT doc_id, w, u * 1000000 // w AS prio FROM d),
         r AS (SELECT *, row_number() OVER (ORDER BY prio, doc_id) AS rn FROM p)
         SELECT doc_id, w, prio FROM r WHERE rn <= 50 ORDER BY prio, doc_id""",
    "q_dedup_lsh_planner" ->
      """WITH RECURSIVE grid AS (
           SELECT CAST(g.b AS BIGINT) AS b, CAST(g.r AS BIGINT) AS r,
                  CAST(s.s AS BIGINT) * 100000 AS s_ppm
           FROM (VALUES (32, 2), (16, 4), (8, 8), (4, 16)) g(b, r),
                (SELECT unnest(range(1, 10)) AS s) s),
         pw(b, r, s_ppm, i, x) AS (
           SELECT b, r, s_ppm, CAST(1 AS BIGINT), s_ppm FROM grid
           UNION ALL
           SELECT b, r, s_ppm, i + 1, x * s_ppm // 1000000 FROM pw WHERE i < r),
         sr AS (SELECT b, r, s_ppm, 1000000 - x AS inn FROM pw WHERE i = r),
         pw2(b, r, s_ppm, inn, j, y) AS (
           SELECT b, r, s_ppm, inn, CAST(1 AS BIGINT), inn FROM sr
           UNION ALL
           SELECT b, r, s_ppm, inn, j + 1, y * inn // 1000000 FROM pw2 WHERE j < b)
         SELECT b, r, s_ppm, 1000000 - y AS p_detect_ppm
         FROM pw2 WHERE j = b ORDER BY b, s_ppm""",
    "q_sample_reservoir" ->
      """SELECT user_id, event_id, hkey FROM (
           SELECT user_id, event_id, md5(CAST(event_id AS VARCHAR)) AS hkey,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
           FROM events) WHERE rn <= 5
         ORDER BY user_id, hkey, event_id""",
    "q_window_timerange" ->
      """WITH b AS (
           SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events WHERE user_id < 20)
         SELECT user_id, event_id, ts_s,
                count(*) OVER w AS n_7d,
                CAST(sum(c) OVER w AS BIGINT) AS cents_7d
         FROM b
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q_first_per_group" ->
      """SELECT user_id, event_type AS first_type FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q_set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value >= 300
         EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value >= 300
         ORDER BY user_id""",
    "q_order_concat" ->
      """SELECT user_id, string_agg(event_type, '->' ORDER BY ts, event_id) AS path
         FROM events WHERE user_id < 30 GROUP BY user_id ORDER BY user_id""",
    "q_translate" ->
      """SELECT doc_id, translate(substr(text, 1, 50), 'aeiou', '41015') AS repaired
         FROM documents ORDER BY doc_id""",
    "q_regex" ->
      """SELECT doc_id,
                regexp_extract(text, '(join|merge|sort) (\w+)', 2) AS after_op,
                CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER) AS consonant_len
         FROM documents ORDER BY doc_id""",
    "q_split_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re
         FROM documents ORDER BY doc_id""",
    "q_case_map" ->
      """SELECT CASE WHEN l_quantity >= 40 THEN 'x' WHEN l_quantity >= 20 THEN '-'
                     ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS display,
                count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY display""",
    "q_agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf, coalesce(l_linestatus, '(all)') AS ls,
                count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""",
    "q_distinct_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_pivot_types" ->
      """SELECT CAST(user_id // 10 AS BIGINT) AS cohort,
                CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
                CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
                CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
                CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
                CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
         FROM events GROUP BY 1 ORDER BY cohort""",
    "q_asof_join" ->
      """SELECT event_id, user_id, last_click_ms FROM (
           SELECT event_id, user_id, event_type,
                  max(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ms
           FROM events)
         WHERE event_type = 'error' ORDER BY event_id""",
    // NB: formulated as a recursive greedy chain, NOT list_reduce —
    // DuckDB 1.0's list_reduce with struct accumulators returns
    // nondeterministic results across grouped rows (verified: same
    // list, different fold results run to run).
    "q_cascade_dedupe" ->
      """WITH RECURSIVE ev AS (
           SELECT user_id, CAST(round(value*100) AS BIGINT) AS v FROM events),
         surv AS (
           SELECT user_id, min(v) AS last, CAST(1 AS BIGINT) AS n FROM ev GROUP BY user_id
           UNION ALL
           SELECT s.user_id,
                  (SELECT min(e.v) FROM ev e WHERE e.user_id = s.user_id AND e.v > s.last + 50),
                  s.n + 1
           FROM surv s
           WHERE EXISTS (SELECT 1 FROM ev e WHERE e.user_id = s.user_id AND e.v > s.last + 50))
         SELECT user_id, max(n) AS survivors FROM surv GROUP BY user_id ORDER BY user_id""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keeper, count(*) AS n
         FROM documents GROUP BY 1 ORDER BY h""",
    "q_dedup_jaccard" ->
      """WITH toks0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                        FROM documents WHERE doc_id < 1000),
            hot AS (SELECT tok FROM toks0 GROUP BY tok HAVING count(*) > 600),
            toks AS (SELECT doc_id, tok FROM toks0
                     WHERE tok NOT IN (SELECT tok FROM hot)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT ia, ib, round(inter / (sa.sz + sb.sz - inter), 6) AS jac
         FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.9
         ORDER BY ia, ib""",
    "q_dedup_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE doc_id < 1000),
            grams AS (SELECT DISTINCT doc_id,
                             CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT AS BIGINT) AS h
                      FROM (SELECT doc_id,
                                   unnest(CASE WHEN len(w) >= 3 THEN
                                     list_transform(range(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                                   ELSE [] END) AS g
                            FROM words)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
                      FROM grams a JOIN grams b ON a.h = b.h AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT ia, ib, round(inter / (sa.sz + sb.sz - inter), 6) AS jac
         FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
         ORDER BY ia, ib""",
    "q_dedup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
                       WHERE len(string_split(text, ' ')) >= 5),
            grams AS (SELECT doc_id, x AS i, array_to_string(l[x+1:x+5], ' ') AS gram
                      FROM toks, LATERAL (SELECT unnest(range(len(l) - 4)) AS x) g),
            dup AS (SELECT gram FROM grams GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            pos AS (SELECT doc_id, i FROM grams
                    WHERE gram IN (SELECT gram FROM dup)),
            brk AS (SELECT doc_id, i,
                           CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 5
                                THEN 1 ELSE 0 END AS b
                    FROM pos),
            grp AS (SELECT doc_id, i,
                           sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS g
                    FROM brk)
         SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
                CAST(max(i) + 4 AS BIGINT) AS span_end,
                CAST(count(*) AS BIGINT) AS n_grams
         FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""",
    "q_dedup_minhash" ->
      """WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            sigs AS (SELECT doc_id, band,
                            min(md5(CAST(band AS VARCHAR) || ':' || tok)) AS sig
                     FROM toks, (SELECT unnest(range(8)) AS band) b GROUP BY doc_id, band)
         SELECT CAST(band AS BIGINT) AS band, sig, count(*) AS n,
                CAST(min(doc_id) AS BIGINT) AS min_doc
         FROM sigs GROUP BY band, sig HAVING count(*) >= 2 ORDER BY band, sig""",
    "q_window_lead" ->
      """SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
                lead(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_cents
         FROM events WHERE user_id < 20 ORDER BY user_id, event_id""",
    "q_set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         ORDER BY user_id""",
    "q_set_union" ->
      """SELECT user_id AS id FROM events
         UNION
         SELECT o_custkey AS id FROM orders WHERE o_totalprice > 50000
         ORDER BY id""",
    "q_join_outer" ->
      """SELECT coalesce(e.user_id, o.o_custkey) AS id,
                coalesce(e.n_events, 0) AS n_events,
                coalesce(o.n_orders, 0) AS n_orders
         FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id) e
         FULL OUTER JOIN
              (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
           ON e.user_id = o.o_custkey
         ORDER BY id""",
    "q_agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '*') AS rf,
                coalesce(l_linestatus, '*') AS ls, count(*) AS n
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY rf, ls""",
    "q_tokens_explode" ->
      """SELECT d.doc_id, CAST(t.i - 1 AS BIGINT) AS pos, d.parts[t.i] AS tok
         FROM (SELECT doc_id, string_split(text, ' ') AS parts
               FROM documents WHERE doc_id < 50) d,
              unnest(range(1, len(d.parts) + 1)) AS t(i)
         ORDER BY doc_id, pos""",
    "q_agg_median" ->
      """SELECT event_type,
                round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5), 4)
                  AS median_cents,
                count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_sql_surface" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
                CAST(month(l_shipdate) AS BIGINT) AS m,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                count(*) * 3 + 2 * 5 AS dot_check
         FROM lineitem WHERE l_discount > 0.05
         GROUP BY 1, 2 ORDER BY y, m""",
    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES ('p0', 0.0, 25.0), ('p25', 25.0, 50.0),
                                             ('p50', 50.0, 75.0), ('p75', 75.0, 1e18))
         SELECT band, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
         GROUP BY band ORDER BY band""",
    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
                count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls""",
    "q_time_ops" ->
      """SELECT event_id,
                strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
                CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                CAST(hour(ts) AS BIGINT) AS hh,
                CAST(datediff('day', CAST(ts AS DATE), DATE '2001-01-01') AS BIGINT) AS days_to_ref
         FROM events WHERE user_id < 10 ORDER BY event_id""",
    "q_string_ops" ->
      """SELECT doc_id,
                lpad(substr(text, 1, 10), 14, '*') AS padded,
                CAST(strpos(text, 'the') AS BIGINT) AS pos_the,
                reverse(substr(text, 1, 12)) AS rev12,
                translate(substr(text, 1, 20), 'aeiou', 'AEIOU') AS tr20,
                array_to_string(string_split(text, ' ')[1:3], ' ') AS first3
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    // identical correlated form; DuckDB decorrelates the same way
    "q_tpch_q17" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                      / 100.0 / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_partkey % 10 = 3
           AND l.l_quantity < (SELECT 0.2 * avg(l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)""",
    "q_tpch_q3" ->
      """SELECT l_orderkey,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
                strftime(o_orderdate, '%Y-%m-%d') AS odate
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue_c DESC, odate, l_orderkey LIMIT 10""",
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS n
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate <  TIMESTAMP '1998-01-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_tpch_q5" ->
      """SELECT n_name,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue_c DESC, n_name""",
    "q_join_nullsafe" ->
      """WITH a AS (SELECT DISTINCT nullif(user_id % 7, 3) AS ka
                    FROM events WHERE user_id < 30),
            b AS (SELECT DISTINCT nullif(user_id % 5, 2) AS kb
                    FROM events WHERE user_id < 30)
         SELECT coalesce(ka, -1) AS k, count(*) AS n
         FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
         GROUP BY 1 ORDER BY k""",
    "q_map_ops" ->
      """WITH pt AS (
           SELECT user_id, event_type, count(*) AS n
           FROM events WHERE user_id < 50 GROUP BY 1, 2)
         SELECT user_id,
                count(*) AS n_types,
                CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS n_click,
                CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS n_purchase,
                string_agg(event_type, ',' ORDER BY event_type) AS types_csv
         FROM pt GROUP BY user_id ORDER BY user_id""",
    "q_array_ops" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         SELECT doc_id,
                CAST(len(w) AS BIGINT) AS n,
                CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
                list_sort(w)[1] AS first_sorted,
                CAST(len(list_filter(w, x -> length(x) > 5)) AS BIGINT) AS n_long,
                list_contains(w, 'the') AS has_the,
                CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS chars,
                array_to_string(list_sort(w, 'DESC')[1:3], '|') AS top3_desc
         FROM d ORDER BY doc_id""",
    "q_window_pctrank" ->
      """SELECT user_id, event_id,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume
         FROM events WHERE user_id < 20
         WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
         ORDER BY user_id, event_id""",
    "q_agg_corr" ->
      """WITH b AS (
           SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS x,
                  CAST(length(props) AS BIGINT) AS y
           FROM events),
         s AS (
           SELECT event_type, count(*) AS n,
                  CAST(count(*) AS DOUBLE) AS nd,
                  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                  CAST(sum(x*y) AS DOUBLE) AS sxy,
                  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy
           FROM b GROUP BY event_type)
         SELECT event_type, n,
                round((sxy * nd - sx * sy) / (nd * nd), 4) AS cov_pop,
                round((sxy * nd - sx * sy) /
                      (sqrt(sxx * nd - sx * sx) * sqrt(syy * nd - sy * sy)), 6) AS corr
         FROM s ORDER BY event_type""",
    // identical five-sum placement; intercept uses the UNROUNDED slope
    "q_agg_regression" ->
      """WITH b AS (
           SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS x,
                  CAST(length(props) AS BIGINT) AS y
           FROM events),
         s AS (
           SELECT event_type, count(*) AS n,
                  CAST(count(*) AS DOUBLE) AS nd,
                  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                  CAST(sum(x*y) AS DOUBLE) AS sxy,
                  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy
           FROM b GROUP BY event_type),
         sl AS (
           SELECT *, (sxy * nd - sx * sy) / (sxx * nd - sx * sx) AS slope
           FROM s)
         SELECT event_type, n,
                round(slope, 6) + 0.0 AS slope,
                round((sy - slope * sx) / nd, 4) + 0.0 AS intercept,
                round(((sxy * nd - sx * sy) * (sxy * nd - sx * sy)) /
                      ((sxx * nd - sx * sx) * (syy * nd - sy * sy)), 6) + 0.0 AS r2
         FROM sl ORDER BY event_type""",
    // identical five windowed sums on the identical frame; the single
    // double formula mirrors cast placement and the nullif guard
    "q_window_rolling_slope" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS y
                    FROM events WHERE user_id < 20),
            w AS (SELECT user_id, event_id,
                         ts_s - 1704067200 AS x, y,
                         CAST(count(*) OVER fr AS BIGINT) AS n,
                         CAST(sum(ts_s - 1704067200) OVER fr AS BIGINT) AS sx,
                         CAST(sum(y) OVER fr AS BIGINT) AS sy,
                         CAST(sum((ts_s - 1704067200) * y) OVER fr AS BIGINT) AS sxy,
                         CAST(sum((ts_s - 1704067200) * (ts_s - 1704067200)) OVER fr AS BIGINT) AS sxx
                  FROM e
                  WINDOW fr AS (PARTITION BY user_id ORDER BY ts_s, event_id
                                ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id, n AS n_frame,
                round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0.0),
                      6) + 0.0 AS slope
         FROM w ORDER BY user_id, event_id""",
    // identical ordered ROWS-frame list, identical power-of-two
    // weighted fold and scaled division (operands non-negative)
    "q_window_ewma" ->
      """WITH e AS (SELECT user_id, event_id, ts,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events WHERE user_id < 20),
            f AS (SELECT user_id, event_id,
                         list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fr
                  FROM e)
         SELECT user_id, event_id, CAST(len(fr) AS BIGINT) AS n_frame,
                (CAST(list_sum(list_transform(list_zip(fr, range(1, len(fr) + 1)),
                   p -> p[1] * (1::BIGINT << CAST(p[2] - 1 AS INTEGER)))) AS BIGINT)
                 * 100) // ((1::BIGINT << len(fr)) - 1) AS ewma_c100
         FROM f ORDER BY user_id, event_id""",
    "q_window_ntile" ->
      """SELECT user_id, event_id,
                CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT)
                  AS quartile
         FROM events WHERE user_id < 20 ORDER BY user_id, event_id""",
    "q_json_roundtrip" ->
      """SELECT event_id, event_type AS typ,
                CAST(round(value * 100) AS BIGINT) AS cents
         FROM events ORDER BY event_id""",
    "q_text_tokens_bpe" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
                CAST(len(regexp_extract_all(text,
                  '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+|[ \t\n\r\f]+'))
                  AS BIGINT) AS n_bpe
         FROM documents ORDER BY doc_id""",
    "q_text_fertility" ->
      """WITH d AS (
           SELECT lang, CAST(length(text) AS BIGINT) AS bytes,
                  CAST(len(regexp_extract_all(text,
                    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+|[ \t\n\r\f]+'))
                    AS BIGINT) AS n_bpe,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws
           FROM documents),
         g AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
                  CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
                  CAST(sum(n_ws) AS BIGINT) AS sum_ws
           FROM d GROUP BY 1)
         SELECT lang, n_docs, sum_bytes, sum_bpe,
                sum_bytes * 1000000 // sum_bpe AS bytes_per_bpe_ppm,
                sum_bytes * 1000000 // sum_ws AS bytes_per_word_ppm
         FROM g ORDER BY lang""",
    "q_text_readability" ->
      """WITH d AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vgroups,
                  CAST(len(list_filter(string_split(text, ' '),
                        w -> length(w) >= 6)) AS BIGINT) AS n_long
           FROM documents),
         c AS (SELECT *, 1 + words // 15 AS clauses FROM d)
         SELECT doc_id, words, vgroups, n_long, CAST(clauses AS BIGINT) AS clauses,
                words * 1000 // clauses + 100000 * n_long // words AS lix_milli,
                vgroups * 1000000 // words AS syl_per_word_ppm
         FROM c ORDER BY doc_id""",
    "q_dedup_simhash" -> (simhashCte("") + """
       SELECT simhash, count(*) AS n, CAST(min(doc_id) AS BIGINT) AS min_doc
       FROM sims GROUP BY simhash ORDER BY simhash"""),
    "q_dedup_simhash_agg" -> (simhashCte("") + """
       SELECT simhash, count(*) AS n, CAST(min(doc_id) AS BIGINT) AS min_doc
       FROM sims GROUP BY simhash ORDER BY simhash"""),
    // true connected components via recursive CTE (transitive closure —
    // exact at oracle scale), vs Spark's bounded label propagation
    "q_dedup_resolve" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       )
       SELECT id AS doc_id, min(lbl) AS component, (min(lbl) = id) AS is_survivor
       FROM reach GROUP BY id ORDER BY doc_id"""),
    // the composed curation chain: recursive-CTE components → survivor
    // gate → langid 'en' gate → stop-ratio quality gate
    "q_curate_corpus" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       ),
       survivors AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(lbl) = id),
       lang AS (
         SELECT doc_id,
                CAST((length(text) - length(regexp_replace(text, '\bthe\b', '', 'g'))) / 3 AS BIGINT) AS s_en,
                CAST((length(text) - length(regexp_replace(text, '\ble\b', '', 'g'))) / 2 AS BIGINT) AS s_fr,
                CAST((length(text) - length(regexp_replace(text, '\bder\b', '', 'g'))) / 3 AS BIGINT) AS s_de
         FROM documents WHERE doc_id < 1000
       ),
       qual AS (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                round(CAST(len(list_filter(string_split(text, ' '),
                      w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) AS BIGINT)
                  / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio
         FROM documents WHERE doc_id < 1000
       )
       SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
              md5(regexp_replace(lower(d.text), '\s+', ' ', 'g')) AS fp,
              q.n_tokens
       FROM documents d
       JOIN survivors s ON s.doc_id = d.doc_id
       JOIN lang l ON l.doc_id = d.doc_id
       JOIN qual q ON q.doc_id = d.doc_id
       WHERE l.s_en >= l.s_fr AND l.s_en >= l.s_de AND l.s_en > 0
         AND q.stop_ratio >= 0.05
       ORDER BY doc_id"""),
    "q_dedup_simhash_pairs" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       )
       SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
       FROM bands a JOIN bands b
         ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ORDER BY ia, ib"""),
    "q_text_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            grams AS (
              SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
              FROM toks, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10)
         SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared,
                count(DISTINCT g.gram) >= 3 AS contaminated
         FROM grams g JOIN bench b USING (gram)
         WHERE g.doc_id >= 10
         GROUP BY 1 ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q_text_quality" ->
      """SELECT doc_id, n_tokens, n_stop, stop_ratio,
                CASE WHEN stop_ratio >= 0.12 THEN 'high'
                     WHEN stop_ratio >= 0.05 THEN 'mid' ELSE 'low' END AS quality
         FROM (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(len(list_filter(string_split(text, ' '),
                        w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) AS BIGINT) AS n_stop,
                  round(CAST(len(list_filter(string_split(text, ' '),
                        w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) AS BIGINT)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio
           FROM documents) ORDER BY doc_id""",
    "q_text_langid" ->
      """SELECT doc_id, s_en, s_fr, s_de,
                CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
                     WHEN s_fr > s_de THEN 'fr'
                     WHEN s_de > 0 THEN 'de' ELSE 'unk' END AS lang_guess
         FROM (
           SELECT doc_id,
                  CAST((length(text) - length(regexp_replace(text, '\bthe\b', '', 'g'))) / 3 AS BIGINT) AS s_en,
                  CAST((length(text) - length(regexp_replace(text, '\ble\b', '', 'g'))) / 2 AS BIGINT) AS s_fr,
                  CAST((length(text) - length(regexp_replace(text, '\bder\b', '', 'g'))) / 3 AS BIGINT) AS s_de
           FROM documents) ORDER BY doc_id""",
    // start = running length of prior tokens + their separators
    "q_text_pos_tokens" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                       FROM documents WHERE doc_id < 20),
            e AS (SELECT doc_id, CAST(x.x AS INTEGER) AS pos, l[x.x + 1] AS tok
                  FROM toks, LATERAL (SELECT unnest(range(len(l))) AS x) x),
            o AS (SELECT doc_id, pos, tok,
                         CAST(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) - length(tok) - 1 AS INTEGER) AS start
                  FROM e)
         SELECT doc_id, pos, tok, start,
                CAST(start + length(tok) AS INTEGER) AS "end"
         FROM o ORDER BY doc_id, pos""",
    // inclusive list slice l[x+1:x+6] = Spark slice(l, i+1, 6); the
    // LATERAL unnest(range(...)) generates the same 0-based offsets as
    // Spark's sequence(0, size-6)
    "q_text_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
                       WHERE len(string_split(text, ' ')) >= 6),
            sh AS (SELECT doc_id, array_to_string(l[x.x + 1:x.x + 6], ' ') AS span
                   FROM toks, LATERAL (SELECT unnest(range(len(l) - 5)) AS x) x),
            g AS (SELECT span,
                         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                         CAST(count(*) AS BIGINT) AS n_occurrences
                  FROM sh GROUP BY span)
         SELECT span, n_docs, n_occurrences FROM g
         WHERE n_docs >= 3
         ORDER BY n_docs DESC, span LIMIT 50""",
    "q_scd2_pit" ->
      """WITH dim AS (
           SELECT user_id, ts AS valid_from,
                  CAST(floor(value / 50) AS BIGINT) AS tier,
                  lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS valid_to
           FROM events WHERE event_type = 'purchase'),
            fact AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
         SELECT d.tier, CAST(count(*) AS BIGINT) AS n_errors,
                CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
         FROM fact f JOIN dim d
           ON f.user_id = d.user_id
          AND f.ts >= d.valid_from
          AND (d.valid_to IS NULL OR f.ts < d.valid_to)
         GROUP BY d.tier ORDER BY d.tier""",
    "q_shard_rendezvous" ->
      """WITH w AS (
           SELECT doc_id, t.k AS kk,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(t.k AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) * 16 + t.k AS key
           FROM documents, range(9) t(k)),
            a AS (SELECT doc_id,
                         max(CASE WHEN kk < 8 THEN key END) % 16 AS shard8,
                         max(key) % 16 AS shard9
                  FROM w GROUP BY doc_id)
         SELECT shard8, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
         FROM a GROUP BY shard8 ORDER BY shard8""",
    "q_text_langid_confusion" ->
      """SELECT lang, CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
                     WHEN s_fr > s_de THEN 'fr'
                     WHEN s_de > 0 THEN 'de' ELSE 'unk' END AS lang_guess,
                CAST(count(*) AS BIGINT) AS n
         FROM (
           SELECT lang,
                  CAST((length(text) - length(regexp_replace(text, '\bthe\b', '', 'g'))) / 3 AS BIGINT) AS s_en,
                  CAST((length(text) - length(regexp_replace(text, '\ble\b', '', 'g'))) / 2 AS BIGINT) AS s_fr,
                  CAST((length(text) - length(regexp_replace(text, '\bder\b', '', 'g'))) / 3 AS BIGINT) AS s_de
           FROM documents)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dedup_embedding" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings WHERE vec_id < 500),
            pairs AS (
              SELECT a.vec_id AS ia, b.vec_id AS ib,
                     list_reduce(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), (x, y) -> x + y) AS dot,
                     list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y) AS na,
                     list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y) AS nb
              FROM q a JOIN q b ON a.vec_id < b.vec_id)
         SELECT ia, ib, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
         FROM pairs WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.35
         ORDER BY ia, ib""",
    "q_base64" ->
      """SELECT doc_id, substr(to_base64(CAST(text AS BLOB)), 1, 64) AS b64_prefix,
                CAST(length(CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR)) AS BIGINT) AS decoded_len
         FROM documents ORDER BY doc_id""",
    "q_text_rollhash" ->
      """SELECT doc_id,
                list_reduce(list_transform(regexp_extract_all(text, '.'),
                    c -> CAST(ascii(c) AS BIGINT)),
                  (a, b) -> (a * 31 + b) % 1000000007) AS rollhash
         FROM documents ORDER BY doc_id""",
    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, label,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS nb,
                     list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]), (x, y) -> x + y)
                       / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
                          * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y))) AS cos
              FROM e q JOIN e c ON q.vec_id < 10 AND c.label = q.label AND c.vec_id <> q.vec_id),
            ranked AS (
              SELECT qid, nb, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nb) AS rank
              FROM scored)
         SELECT qid, CAST(rank AS BIGINT) AS rank, nb, round(cos, 6) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    "q_ann_kmeans" -> kmeansOracleSql(8, 3),
    "q_ann_ivf_kmeans" -> ivfKmeansOracleSql(8, 3),
    "q_ann_ivf_multiprobe" -> ivfMultiprobeOracleSql(8, 3, 2),
    "q_ann_ivf_recall" -> ivfRecallOracleSql(8, 3, Seq(1, 2, 4)),
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS nb,
                     list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]), (x, y) -> x + y)
                       / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
                          * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y))) AS cos
              FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
            ranked AS (
              SELECT qid, nb, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nb) AS rank
              FROM scored)
         SELECT qid, CAST(rank AS BIGINT) AS rank, nb, round(cos, 6) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    // identical exact-L2 radius predicate and per-query rollup
    "q_ann_range" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            d AS (SELECT q.vec_id AS qid, c.vec_id AS nb,
                         list_reduce(list_transform(list_zip(q.v, c.v),
                           p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
         SELECT qid, CAST(count(*) AS BIGINT) AS n_in_range,
                min(d2) AS min_d2, max(d2) AS max_d2,
                CAST(sum(nb) AS BIGINT) AS nb_sum
         FROM d WHERE d2 <= 40000000
         GROUP BY qid ORDER BY qid""",
    // exact integer L2 over vector prefixes; all-integer recall ppm
    "q_ann_matryoshka" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            ranked AS (
              SELECT d.dims AS dims, s.qid, s.nb, s.d2,
                     row_number() OVER (PARTITION BY d.dims, s.qid ORDER BY s.d2, s.nb) AS rn
              FROM (SELECT CAST(unnest([16, 32, 64]) AS BIGINT) AS dims) d
              CROSS JOIN LATERAL (
                     SELECT q.vec_id AS qid, c.vec_id AS nb,
                            list_reduce(list_transform(list_zip(q.v[1:d.dims], c.v[1:d.dims]),
                              p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                     FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id) s),
            r5 AS (SELECT * FROM ranked WHERE rn <= 5),
            truth AS (SELECT qid, nb FROM r5 WHERE dims = 64)
         SELECT r5.dims, CAST(count(*) AS BIGINT) AS n5,
                CAST(sum(CASE WHEN t.qid IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits,
                CAST(sum(CASE WHEN t.qid IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                  * 1000000 // count(*) AS recall_ppm
         FROM r5 LEFT JOIN truth t ON r5.qid = t.qid AND r5.nb = t.nb
         GROUP BY r5.dims ORDER BY r5.dims""",
    // same integerized cosine; negatives = different-label candidates
    "q_ann_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS nb, c.label AS nb_label,
                     list_reduce(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]), (x, y) -> x + y)
                       / (sqrt(list_reduce(list_transform(q.v, x -> x * x), (x, y) -> x + y))
                          * sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y))) AS cos
              FROM e q JOIN e c ON q.vec_id < 20 AND c.label <> q.label),
            ranked AS (
              SELECT qid, nb, nb_label, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nb) AS rank
              FROM scored)
         SELECT qid, CAST(rank AS BIGINT) AS rank, nb,
                CAST(nb_label AS BIGINT) AS nb_label, round(cos, 6) AS cos
         FROM ranked WHERE rank <= 3 ORDER BY qid, rank""",
    // the oracle runs the UNSALTED join — pinning that salting is a
    // pure physical rewrite with zero semantic drift
    "q_join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
         SELECT s1.user_id,
                CAST(1 + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
                       + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth,
                CAST(floor(epoch(s1.t1)) AS BIGINT) AS e1,
                CAST(floor(epoch(s2.t2)) AS BIGINT) AS e2,
                CAST(floor(epoch(s3.t3)) AS BIGINT) AS e3
         FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                 LEFT JOIN s3 ON s1.user_id = s3.user_id
         ORDER BY s1.user_id""",
    "q_text_postings" ->
      """WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
            toks AS (SELECT DISTINCT doc_id, tok FROM raw)
         SELECT tok, count(*) AS df,
                string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
         FROM toks GROUP BY tok HAVING count(*) >= 3 ORDER BY tok""",
    // identical registers from the identical md5-derived hash; the only
    // double op is the final division (0.709 forced to DOUBLE — DuckDB
    // would otherwise parse the literal as DECIMAL(4,3))
    "q_text_distinct_hll" ->
      """WITH raw AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            h AS (SELECT ('0x' || substr(md5(tok), 1, 14))::UBIGINT AS h FROM raw),
            b AS (SELECT CAST(h % 64 AS BIGINT) AS bucket, CAST(h >> 6 AS BIGINT) AS w
                  FROM h),
            r AS (SELECT bucket,
                         CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS rho
                  FROM b),
            regs AS (SELECT s.bucket, coalesce(max(r.rho), 0) AS mj
                     FROM (SELECT unnest(range(64)) AS bucket) s
                     LEFT JOIN r ON s.bucket = r.bucket GROUP BY s.bucket),
            agg AS (SELECT count(CASE WHEN mj > 0 THEN 1 END) AS nonzero,
                           CAST(sum(1::BIGINT << (51 - mj)) AS BIGINT) AS s_scaled
                    FROM regs)
         SELECT CAST(64 AS BIGINT) AS m, CAST(nonzero AS BIGINT) AS nonzero, s_scaled,
                round(0.709::DOUBLE * 64 * 64 * 2251799813685248.0 / s_scaled, 3) AS hll_est
         FROM agg""",
    // identical two-layout bucketing, zone maps, and window predicate
    // evaluated against zones only
    "q_table_zonemap" ->
      """WITH li AS (SELECT l_orderkey,
                            CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
                     FROM lineitem),
            mm AS (SELECT min(d) AS dmin, max(d) AS dmax FROM li),
            b AS (SELECT d, dmin, l_orderkey % 64 AS bh,
                         ((d - dmin) * 64) // (dmax - dmin + 1) AS bs
                  FROM li, mm),
            z AS (SELECT 'hash' AS layout, bh AS bucket, d, dmin FROM b
                  UNION ALL
                  SELECT 'range' AS layout, bs AS bucket, d, dmin FROM b),
            zones AS (SELECT layout, bucket, count(*) AS n, min(d) AS zmin,
                             max(d) AS zmax, min(dmin) AS dmin
                      FROM z GROUP BY 1, 2),
            sk AS (SELECT layout, n,
                          CASE WHEN zmax < dmin + 200 OR zmin >= dmin + 230
                               THEN 1 ELSE 0 END AS skip
                   FROM zones)
         SELECT layout, CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(sum(skip) AS BIGINT) AS n_skipped,
                CAST(sum(CASE WHEN skip = 1 THEN n ELSE 0 END) AS BIGINT) AS rows_skipped,
                (CAST(sum(CASE WHEN skip = 1 THEN n ELSE 0 END) AS BIGINT) * 1000000)
                  // CAST(sum(n) AS BIGINT) AS skip_ppm
         FROM sk GROUP BY 1 ORDER BY 1""",
    // identical unrolled interleave formula (generated from the same
    // helper) — the z-values agree bit-for-bit across engines
    "q_zorder_layout" ->
      s"""WITH b AS (SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
            z AS (SELECT x, y, ${graft.functions.ZOrder.zvalSql("x", "y", 10)} AS z FROM b),
            zb AS (SELECT x, y, z, z >> 14 AS zbucket FROM z)
         SELECT zbucket, count(*) AS n,
                min(x) AS x_min, max(x) AS x_max,
                min(y) AS y_min, max(y) AS y_max,
                min(z) AS z_min, max(z) AS z_max
         FROM zb GROUP BY 1 ORDER BY 1""",
    "q_graph_triangles" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       )
       SELECT p1.ia AS a, count(*) AS n_tri
       FROM pairs p1 JOIN pairs p2 ON p1.ib = p2.ia
            JOIN pairs p3 ON p1.ia = p3.ia AND p2.ib = p3.ib
       GROUP BY 1 ORDER BY a"""),
    // the same three integer power iterations unrolled as CTEs; DuckDB
    // sums BIGINT into HUGEINT, so each round casts back to BIGINT
    // after the (exact) 85·m div 100 damping — identical values to
    // Spark's all-long arithmetic
    "q_graph_pagerank" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
    """ + pagerankRoundsSql(3) + """
       SELECT id AS doc_id, pr FROM r3 ORDER BY doc_id"""),
    // integer-log2 idf via binary-string length — bin()/length agree
    // bit-for-bit across engines, unlike a libm ln
    "q_text_tfidf" ->
      """WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM raw GROUP BY 1, 2),
            d AS (SELECT tok, count(*) AS df
                  FROM (SELECT DISTINCT doc_id, tok FROM raw) GROUP BY 1),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.tok, tf.tf, d.df,
                     tf.tf * length(bin(n.n_docs // d.df)) AS score
              FROM tf JOIN d ON tf.tok = d.tok, n),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
              FROM scored)
         SELECT doc_id, tok, tf, df, CAST(score AS BIGINT) AS score
         FROM ranked WHERE rn <= 3 ORDER BY doc_id, tok""",
    "q_text_bm25" ->
      """WITH u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            toks AS (SELECT doc_id, tok FROM u WHERE tok <> ''),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            tot AS (SELECT sum(dl)::HUGEINT AS tt, count(*)::HUGEINT AS nd FROM dl),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                   WHERE tok IN ('stream', 'window', 'merge', 'hash')
                   GROUP BY 1, 2),
            df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                CAST(sum( ((1000000::HUGEINT * (2 * nd - 2 * df + 1)) // (2 * df + 1))
                        * ((44::HUGEINT * tt * tf * 1000000)
                           // (20::HUGEINT * tt * tf + 6 * tt + 18 * dl.dl * nd)) )
                     // 1000000 AS BIGINT) AS score_ppm
         FROM tf JOIN dl USING (doc_id) JOIN df USING (tok), tot
         GROUP BY doc_id ORDER BY score_ppm DESC, doc_id LIMIT 50""",
    // identical BM25 machinery, identical exact-L2 vector ranking,
    // identical 1/(60+rank) ppm floor terms; QUALIFY ≡ the engine's
    // deterministic top-k on the same total order
    "q_text_rrf" ->
      """WITH u AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            toks AS (SELECT doc_id, tok FROM u WHERE tok <> ''),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            tot AS (SELECT sum(dl)::HUGEINT AS tt, count(*)::HUGEINT AS nd FROM dl),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                   WHERE tok IN ('stream', 'window', 'merge', 'hash')
                   GROUP BY 1, 2),
            df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
            lexs AS (
              SELECT doc_id,
                     CAST(sum( ((1000000::HUGEINT * (2 * nd - 2 * df + 1)) // (2 * df + 1))
                             * ((44::HUGEINT * tt * tf * 1000000)
                                // (20::HUGEINT * tt * tf + 6 * tt + 18 * dl.dl * nd)) )
                          // 1000000 AS BIGINT) AS score_ppm
              FROM tf JOIN dl USING (doc_id) JOIN df USING (tok), tot
              GROUP BY doc_id),
            lex AS (
              SELECT doc_id AS id,
                     CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT)
                       AS rank_lex
              FROM lexs QUALIFY rank_lex <= 100),
            e AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                  FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            vecs AS (
              SELECT c.vec_id,
                     list_reduce(list_transform(list_zip(c.v, q.qv),
                       p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
              FROM e c, q WHERE c.vec_id <> 0),
            vec AS (
              SELECT vec_id AS id,
                     CAST(row_number() OVER (ORDER BY d2, vec_id) AS BIGINT) AS rank_vec
              FROM vecs QUALIFY rank_vec <= 100),
            f AS (
              SELECT COALESCE(l.id, v.id) AS id, l.rank_lex, v.rank_vec,
                     COALESCE(1000000 // (60 + l.rank_lex), 0)
                       + COALESCE(1000000 // (60 + v.rank_vec), 0) AS rrf_ppm
              FROM lex l FULL OUTER JOIN vec v ON l.id = v.id)
         SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, id) AS BIGINT) AS rank,
                id, rank_lex, rank_vec, rrf_ppm
         FROM f QUALIFY rank <= 10 ORDER BY rank""",
    // same rule chain; the multi-match tracking-param strip needs
    // DuckDB's 'g' flag to mirror Spark's implicit replace-all
    "q_dedup_url" ->
      """WITH raw AS (
           SELECT doc_id,
                  'HTTPS://CDN' || CAST(doc_id % 3 AS VARCHAR) ||
                  '.Example.COM/docs/' || source || '/' ||
                  CAST(doc_id % 40 AS VARCHAR) ||
                  '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR) ||
                  '&page=' || CAST(doc_id % 2 AS VARCHAR) ||
                  '&utm_campaign=q' || CAST(doc_id % 4 AS VARCHAR) ||
                  '#sec' || CAST(doc_id % 6 AS VARCHAR) AS url
           FROM documents),
            c AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(url, '#.*$', ''),
                         '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
                       '[?&]+$', '') AS u3
              FROM raw),
            canon AS (
              SELECT doc_id,
                     lower(regexp_extract(u3, '^([a-zA-Z]+://[^/]*)', 1)) ||
                     regexp_replace(u3, '^[a-zA-Z]+://[^/]*', '') AS canonical_url
              FROM c)
         SELECT canonical_url, count(*) AS n_fetches,
                min(doc_id) AS survivor_doc
         FROM canon GROUP BY 1 ORDER BY 1""",
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
            f AS (SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1)
         SELECT f.cohort_day,
                CAST(date_diff('day', f.cohort_day, ev.d) AS BIGINT) AS day_offset,
                count(DISTINCT ev.user_id) AS n_users
         FROM ev JOIN f ON ev.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical d=4 × w=64 counters from the identical md5-derived
    // bucket hash (the HLL's portability recipe)
    "q_text_countmin" ->
      """WITH raw AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            ex AS (SELECT tok, count(*) AS exact_n FROM raw GROUP BY 1),
            probes AS (SELECT tok, exact_n FROM ex
                       ORDER BY exact_n DESC, tok LIMIT 5),
            rws AS (SELECT tok, r.i FROM raw
                    CROSS JOIN (SELECT unnest(range(4)) AS i) r),
            counters AS (
              SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 8))::UBIGINT % 64 AS BIGINT) AS bucket,
                     count(*) AS cnt
              FROM rws GROUP BY 1, 2),
            pe AS (
              SELECT p.tok, p.exact_n, r.i,
                     CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || p.tok), 1, 8))::UBIGINT % 64 AS BIGINT) AS bucket
              FROM probes p CROSS JOIN (SELECT unnest(range(4)) AS i) r),
            est AS (SELECT pe.tok, pe.exact_n, c.cnt
                    FROM pe JOIN counters c ON c.i = pe.i AND c.bucket = pe.bucket)
         SELECT tok, exact_n, min(cnt) AS cm_est
         FROM est GROUP BY 1, 2 ORDER BY tok""",
    // identical window construction + integer ceil-rank picks — the
    // doubles are selected, never combined
    "q_agg_quantiles" ->
      """WITH ranked AS (
           SELECT event_type, value, event_id,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type,
                max(CASE WHEN rn = (n + 3) // 4 THEN value END) AS p25,
                max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
                max(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS p75,
                max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
                max(n) AS n
         FROM ranked GROUP BY 1 ORDER BY 1""",
    // per-source registers from the identical md5 hash; scaffold
    // cross = distinct sources × range(64) so empty registers read 0
    "q_text_hll_by_source" ->
      """WITH raw AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
            h AS (SELECT source, ('0x' || substr(md5(tok), 1, 14))::UBIGINT AS h
                  FROM raw),
            b AS (SELECT source, CAST(h % 64 AS BIGINT) AS bucket,
                         CAST(h >> 6 AS BIGINT) AS w FROM h),
            r AS (SELECT source, bucket,
                         CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS rho
                  FROM b),
            scaffold AS (SELECT source, s.bucket
                         FROM (SELECT DISTINCT source FROM documents)
                         CROSS JOIN (SELECT unnest(range(64)) AS bucket) s),
            regs AS (SELECT sc.source, sc.bucket, coalesce(max(r.rho), 0) AS mj
                     FROM scaffold sc LEFT JOIN r
                       ON sc.source = r.source AND sc.bucket = r.bucket
                     GROUP BY 1, 2),
            agg AS (SELECT source,
                           count(CASE WHEN mj > 0 THEN 1 END) AS nonzero,
                           CAST(sum(1::BIGINT << (51 - mj)) AS BIGINT) AS s_scaled
                    FROM regs GROUP BY 1)
         SELECT source, CAST(64 AS BIGINT) AS m, CAST(nonzero AS BIGINT) AS nonzero,
                s_scaled,
                round(0.709::DOUBLE * 64 * 64 * 2251799813685248.0 / s_scaled, 3) AS hll_est
         FROM agg ORDER BY source""",
    // component sizes over the same recursive-CTE resolution
    "q_dedup_component_sizes" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       ),
       comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
       sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
       SELECT sz, count(*) AS n_components FROM sizes GROUP BY 1 ORDER BY sz"""),
    "q_dedup_savings" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       ),
       comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
       j AS (SELECT c.component, c.id, d.n_chars
             FROM comp c JOIN documents d ON d.doc_id = c.id),
       percomp AS (SELECT component, count(*) AS sz,
                          sum(n_chars) AS bytes_total,
                          arg_min(n_chars, id) AS bytes_kept
                   FROM j GROUP BY 1)
       SELECT CAST(count(*) AS BIGINT) AS n_components,
              CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_components,
              CAST(sum(sz) AS BIGINT) AS n_docs,
              CAST(sum(bytes_total) AS BIGINT) AS bytes_total,
              CAST(sum(bytes_kept) AS BIGINT) AS bytes_kept,
              CAST(sum(bytes_total) - sum(bytes_kept) AS BIGINT) AS bytes_saved
       FROM percomp"""),
    // identical rank-pick quartiles, identical three-op IEEE fences
    "q_events_outliers" ->
      """WITH ranked AS (
           SELECT event_type, value, event_id,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
            q AS (SELECT event_type,
                         max(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
                         max(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS q3
                  FROM ranked GROUP BY 1),
            b AS (SELECT event_type, q1, q3, q3 - q1 AS iqr FROM q)
         SELECT e.event_type, count(*) AS n_outliers,
                min(e.value) AS min_out, max(e.value) AS max_out
         FROM events e JOIN b ON e.event_type = b.event_type
         WHERE e.value < b.q1 - 1.5 * b.iqr OR e.value > b.q3 + 1.5 * b.iqr
         GROUP BY 1 ORDER BY 1""",
    // identical stride rule: every offset < n_tok starts a chunk;
    // DuckDB range() excludes its stop, Spark sequence() includes it —
    // range(0, n_tok, 24) ≡ sequence(0, n_tok-1, 24) for n_tok >= 1
    "q_text_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
            n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok FROM d),
            st AS (SELECT doc_id, tk, unnest(range(0, n_tok, 24)) AS c_start FROM n),
            c AS (SELECT doc_id, c_start // 24 AS chunk_idx, c_start,
                         tk[c_start + 1 : c_start + 32] AS chunk
                  FROM st)
         SELECT doc_id, chunk_idx, c_start,
                CAST(len(chunk) AS BIGINT) AS chunk_len,
                substr(md5(array_to_string(chunk, ' ')), 1, 16) AS fp
         FROM c ORDER BY doc_id, chunk_idx""",
    // identical pair extraction (1-based list index), identical ppm
    // floor division
    "q_text_bigram_lm" ->
      """WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
            ix AS (SELECT tk, unnest(range(1, len(tk))) AS i FROM d),
            p AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM ix),
            big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
                    FROM p GROUP BY 1, 2),
            tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS tot
                    FROM big GROUP BY 1)
         SELECT b.w1, b.w2, b.cnt, t.tot, (b.cnt * 1000000) // t.tot AS cond_ppm
         FROM big b JOIN tot t ON b.w1 = t.w1
         WHERE b.cnt >= 5 ORDER BY b.w1, b.w2""",
    // global-rank form ≡ the engine's top-k-then-rank on the same
    // deterministic order
    "q_text_coverage" ->
      """WITH u AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
            v AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
                  FROM u WHERE tok <> '' GROUP BY 1),
            r AS (SELECT cnt,
                         CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS r
                  FROM v)
         SELECT CAST(count(*) AS BIGINT) AS vocab,
                CAST(sum(cnt) AS BIGINT) AS mass,
                (CAST(sum(CASE WHEN r <= 10 THEN cnt ELSE 0 END) AS BIGINT) * 1000000)
                  // CAST(sum(cnt) AS BIGINT) AS cov10_ppm,
                (CAST(sum(CASE WHEN r <= 100 THEN cnt ELSE 0 END) AS BIGINT) * 1000000)
                  // CAST(sum(cnt) AS BIGINT) AS cov100_ppm,
                (CAST(sum(CASE WHEN r <= 1000 THEN cnt ELSE 0 END) AS BIGINT) * 1000000)
                  // CAST(sum(cnt) AS BIGINT) AS cov1000_ppm
         FROM r""",
    // identical ppm shares and per-term floor division; q_ppm > 0
    // filter mirrored (rare corpus words can floor to 0 ppm)
    "q_text_chisq_drift" ->
      """WITH u AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            b AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                  FROM u WHERE tok <> '' GROUP BY 1, 2),
            st AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM b GROUP BY 1),
            cw AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM b GROUP BY 1),
            ct AS (SELECT CAST(sum(cc) AS BIGINT) AS ct FROM cw),
            pq AS (SELECT b.source,
                          (b.c * 1000000) // st.st AS p_ppm,
                          (cw.cc * 1000000) // ct.ct AS q_ppm
                   FROM b JOIN st ON b.source = st.source
                          JOIN cw ON b.tok = cw.tok, ct)
         SELECT source, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(((p_ppm - q_ppm) * (p_ppm - q_ppm)) // q_ppm) AS BIGINT)
                  AS chisq_scaled
         FROM pq WHERE q_ppm > 0
         GROUP BY 1 ORDER BY 1""",
    // identical (source, word)-grain counts and per-source rollup
    "q_text_hapax" ->
      """WITH u AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            w AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                  FROM u WHERE tok <> '' GROUP BY 1, 2)
         SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                CAST(sum(cnt) AS BIGINT) AS tokens,
                CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
                (CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
                  // CAST(count(*) AS BIGINT) AS hapax_ppm,
                (CAST(count(*) AS BIGINT) * 1000000)
                  // CAST(sum(cnt) AS BIGINT) AS ttr_ppm
         FROM w GROUP BY 1 ORDER BY 1""",
    // identical pair extraction; identical per-term ppm floor
    // divisions (term1, λ, Pcont, term2 — same factorization, same
    // order, so every floor lands identically)
    "q_text_kneser_ney" ->
      """WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
            ix AS (SELECT tk, unnest(range(1, len(tk))) AS i FROM d),
            p AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM ix),
            big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
                    FROM p GROUP BY 1, 2),
            lft AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1,
                           CAST(count(*) AS BIGINT) AS n1w1
                    FROM big GROUP BY 1),
            rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1w2
                    FROM big GROUP BY 1),
            alln AS (SELECT CAST(count(*) AS BIGINT) AS n1all FROM big)
         SELECT b.w1, b.w2, b.cnt,
                (b.cnt * 1000000) // l.c1 AS mle_ppm,
                ((4 * b.cnt - 3) * 1000000) // (4 * l.c1)
                 + (((3 * l.n1w1 * 1000000) // (4 * l.c1))
                    * ((r.n1w2 * 1000000) // a.n1all)) // 1000000 AS kn_ppm
         FROM big b JOIN lft l ON b.w1 = l.w1
                    JOIN rgt r ON b.w2 = r.w2, alln a
         WHERE b.cnt >= 5 ORDER BY b.w1, b.w2""",
    // identical power sums (HUGEINT ≙ decimal), identical cast-once
    // placement and double formulas
    "q_agg_moments" ->
      """WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            s AS (SELECT event_type, count(*) AS n,
                         CAST(count(*) AS DOUBLE) AS nd,
                         CAST(sum(x) AS DOUBLE) AS d1,
                         CAST(sum(x * x) AS DOUBLE) AS d2,
                         CAST(sum(CAST(x * x AS HUGEINT) * x) AS DOUBLE) AS d3,
                         CAST(sum(CAST(x * x AS HUGEINT) * (x * x)) AS DOUBLE) AS d4
                  FROM b GROUP BY 1),
            m AS (SELECT *, d1 / nd AS mu FROM s),
            mm AS (SELECT *,
                          d2 / nd - mu * mu AS m2,
                          d3 / nd - 3.0 * mu * (d2 / nd) + 2.0 * mu * mu * mu AS m3,
                          d4 / nd - 4.0 * mu * (d3 / nd)
                            + 6.0 * mu * mu * (d2 / nd)
                            - 3.0 * mu * mu * mu * mu AS m4
                   FROM m)
         SELECT event_type, n,
                round(m3 / (sqrt(m2) * m2), 6) + 0.0 AS skewness,
                round(m4 / (m2 * m2) - 3.0, 6) + 0.0 AS kurtosis_excess
         FROM mm ORDER BY event_type""",
    // identical value-grain cumsum and 2·cumw ≥ totw pick
    "q_agg_weighted_median" ->
      """WITH g AS (SELECT l_returnflag AS flag,
                           CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
                    FROM lineitem GROUP BY 1, 2),
            c AS (SELECT flag, v, w,
                         CAST(sum(w) OVER (PARTITION BY flag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
                         CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
                  FROM g)
         SELECT flag, max(tw) AS total_weight,
                min(CASE WHEN cumw * 2 >= tw THEN v END) AS wmedian_cents
         FROM c GROUP BY 1 ORDER BY 1""",
    // identical rank formula on the identical ascending order; HUGEINT
    // mirrors the decimal accumulators
    "q_agg_gini" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
                           CAST(row_number() OVER (PARTITION BY source
                             ORDER BY n_chars, doc_id) AS BIGINT) AS i
                    FROM documents),
            a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                         sum(CAST(n_chars AS HUGEINT)) AS sx,
                         sum(CAST(i * n_chars AS HUGEINT)) AS sxi
                  FROM r GROUP BY 1)
         SELECT source, n,
                CAST(((2 * sxi - (n + 1) * sx) * 1000000)
                     // (CAST(n AS HUGEINT) * sx) AS BIGINT) AS gini_ppm
         FROM a ORDER BY source""",
    // identical user-grain aggregate, rank, ceil-decile and ppm share
    "q_events_power_users" ->
      """WITH u AS (SELECT event_type, user_id,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
                    FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, user_id, tot,
                         CAST(row_number() OVER (PARTITION BY event_type
                           ORDER BY tot DESC, user_id) AS BIGINT) AS r,
                         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nu
                  FROM u)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(tot) AS BIGINT) AS total_cents,
                CAST(sum(CASE WHEN r <= (nu + 9) // 10 THEN tot ELSE 0 END) AS BIGINT)
                  AS top_cents,
                (CAST(sum(CASE WHEN r <= (nu + 9) // 10 THEN tot ELSE 0 END) AS BIGINT)
                  * 1000000) // CAST(sum(tot) AS BIGINT) AS top_decile_ppm
         FROM r GROUP BY 1 ORDER BY 1""",
    // window totals over the k-row aggregated frame, identical integer
    // share/weight arithmetic
    "q_sample_mixture" ->
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tokens
                    FROM documents GROUP BY 1),
            w AS (SELECT source, n_docs, src_tokens,
                         CAST(sum(src_tokens) OVER () AS BIGINT) AS total_tokens,
                         CAST(count(*) OVER () AS BIGINT) AS k
                  FROM s)
         SELECT source, n_docs, src_tokens,
                (src_tokens * 1000000) // total_tokens AS share_ppm,
                (total_tokens * 1000000) // (k * src_tokens) AS weight_ppm,
                (src_tokens * ((total_tokens * 1000000) // (k * src_tokens))) // 1000000
                  AS expected_tokens
         FROM w ORDER BY source""",
    // identical lag window on the identical deterministic order
    "q_events_alternation" ->
      """WITH l AS (SELECT user_id, event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS prev
                    FROM events),
            a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                         CAST(count(CASE WHEN prev = event_type THEN 1 END)
                              AS BIGINT) AS n_repeats
                  FROM l GROUP BY 1)
         SELECT user_id, n_events, n_repeats,
                (n_repeats * 1000000) // n_events AS repeat_ppm
         FROM a ORDER BY user_id""",
    // identical deterministic nulling, identical running IGNORE NULLS
    // frame
    "q_window_locf" ->
      """WITH c AS (SELECT user_id, event_id, ts,
                           CASE WHEN CAST(round(value * 100) AS BIGINT) % 7 = 0
                                THEN NULL
                                ELSE CAST(round(value * 100) AS BIGINT) END AS c
                    FROM events)
         SELECT user_id, event_id, c,
                last_value(c IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM c ORDER BY user_id, event_id""",
    // identical integer ranks on unique composite orders; rho is the
    // same two IEEE ops on exactly-representable operands
    "q_agg_spearman" ->
      """WITH r AS (SELECT event_type,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY value, event_id) AS rv,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY ts, event_id) AS rt
                    FROM events),
            a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum((rv - rt) * (rv - rt)) AS BIGINT) AS sum_d2
                  FROM r GROUP BY 1)
         SELECT event_type, n, sum_d2,
                1.0 - (6.0 * sum_d2) / CAST(n * (n * n - 1) AS DOUBLE) AS rho
         FROM a WHERE n >= 2 ORDER BY event_type""",
    // ntile on the identical unique order
    "q_agg_equidepth" ->
      """WITH t AS (SELECT event_type, value, event_id,
                           ntile(10) OVER (PARTITION BY event_type
                                           ORDER BY value, event_id) AS tile
                    FROM events)
         SELECT event_type, tile, CAST(count(*) AS BIGINT) AS n,
                min(CAST(round(value * 100) AS BIGINT)) AS lo_cents,
                max(CAST(round(value * 100) AS BIGINT)) AS hi_cents
         FROM t GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical top-1000 vocabulary (count desc, token asc), identical
    // ppm rate
    "q_text_oov" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
            vocab AS (SELECT tok FROM
                        (SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
                         FROM v) WHERE rn <= 1000)
         SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                CAST(count(CASE WHEN vocab.tok IS NULL THEN 1 END) AS BIGINT) AS n_oov,
                (count(CASE WHEN vocab.tok IS NULL THEN 1 END) * 1000000)
                  // count(*) AS oov_ppm
         FROM toks t LEFT JOIN vocab ON t.tok = vocab.tok
         GROUP BY 1 ORDER BY 1""",
    // BRUTE FORCE all-pairs (no prefix pruning): equality with the
    // prefix-filtered Spark result proves the pruning lossless
    "q_dedup_prefix_filter" ->
      """WITH d AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                    FROM documents WHERE doc_id < 1000),
            sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM d GROUP BY 1),
            pair AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                            CAST(count(*) AS BIGINT) AS inter
                     FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
                     GROUP BY 1, 2)
         SELECT CAST(ia AS BIGINT) AS ia, CAST(ib AS BIGINT) AS ib, inter,
                sa.sz + sb.sz - inter AS uni,
                (inter * 1000000) // (sa.sz + sb.sz - inter) AS jac_ppm
         FROM pair JOIN sz sa ON ia = sa.doc_id JOIN sz sb ON ib = sb.doc_id
         WHERE 10 * inter >= 9 * (sa.sz + sb.sz - inter)
         ORDER BY ia, ib""",
    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                          CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                  / CAST(10000 AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
           AND l_quantity < 24""",
    // melt as UNION ALL; identical derived nulls (cents % 7)
    "q_profile_columns" ->
      """WITH b AS (SELECT event_type AS c_event_type, props AS c_props,
                           CASE WHEN CAST(round(value * 100) AS BIGINT) % 7 = 0
                                THEN NULL
                                ELSE CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
                           END AS c_value_cents
                    FROM events),
            m AS (SELECT 'c_event_type' AS col_name, c_event_type AS val FROM b
                  UNION ALL SELECT 'c_props', c_props FROM b
                  UNION ALL SELECT 'c_value_cents', c_value_cents FROM b)
         SELECT col_name, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) - count(val) AS BIGINT) AS n_null,
                CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
                min(val) AS min_val, max(val) AS max_val
         FROM m GROUP BY 1 ORDER BY 1""",
    "q_events_variant" ->
      """WITH e AS (SELECT event_type,
                           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                    FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k,
                CAST(count(*) AS BIGINT) AS n_absent
         FROM e GROUP BY 1 ORDER BY 1""",
    // identical value-grain pre-aggregation, 2-bucket fan-out, and
    // closed-form C(n,2); HUGEINT casts mirror the decimal accumulators
    "q_join_band" ->
      """WITH vals AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            a AS (SELECT event_type, c, n, unnest([c // 4, c // 4 + 1]) AS pb
                  FROM vals),
            b AS (SELECT event_type AS bt, c AS cb, n AS nb, c // 4 AS bb
                  FROM vals),
            crossp AS (
              SELECT a.event_type,
                     CAST(sum(CAST(a.n AS HUGEINT) * b.nb) AS BIGINT) AS cross_pairs
              FROM a JOIN b ON a.event_type = b.bt AND a.pb = b.bb
                           AND b.cb > a.c AND b.cb - a.c <= 3
              GROUP BY 1),
            same AS (
              SELECT event_type,
                     CAST(sum(CAST(n * (n - 1) // 2 AS HUGEINT)) AS BIGINT) AS same_pairs,
                     CAST(count(*) AS BIGINT) AS n_values
              FROM vals GROUP BY 1)
         SELECT s.event_type, s.n_values,
                COALESCE(c.cross_pairs, 0) + s.same_pairs AS n_close_pairs
         FROM same s LEFT JOIN crossp c ON s.event_type = c.event_type
         ORDER BY 1""",
    // identical exact distinct counts at day and (30-day) month grain
    "q_events_stickiness" ->
      """WITH e AS (SELECT user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events),
            m AS (SELECT user_id, day, day // 30 AS month FROM e),
            dau AS (SELECT day, month, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
                    FROM m GROUP BY 1, 2),
            mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
                    FROM m GROUP BY 1)
         SELECT dau.day, dau.dau, mau.mau,
                (dau.dau * 1000000) // mau.mau AS stickiness_ppm
         FROM dau JOIN mau ON dau.month = mau.month
         ORDER BY dau.day""",
    // identical user-grain (x, y) reduction, pooled five-sum θ, and
    // cast-once double arithmetic
    "q_events_cuped" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events),
            md AS (SELECT min(day) AS mind FROM e),
            u AS (SELECT user_id,
                         CAST(sum(CASE WHEN day - mind < 15 THEN c ELSE 0 END) AS BIGINT) AS x,
                         CAST(sum(CASE WHEN day - mind >= 15 THEN c ELSE 0 END) AS BIGINT) AS y,
                         user_id % 2 AS arm
                  FROM e, md GROUP BY user_id),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
                         CAST(sum(x) AS DOUBLE) AS gsx, CAST(sum(y) AS DOUBLE) AS gsy,
                         CAST(sum(x * y) AS DOUBLE) AS gsxy,
                         CAST(sum(x * x) AS DOUBLE) AS gsxx
                  FROM u),
            t AS (SELECT (gsxy * nd - gsx * gsy) / (gsxx * nd - gsx * gsx) AS theta,
                         gsx / nd AS gmean_x
                  FROM g),
            a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                         CAST(sum(x) AS DOUBLE) AS asx,
                         CAST(sum(y) AS DOUBLE) AS asy
                  FROM u GROUP BY 1)
         SELECT a.arm, a.n_users,
                round(a.asy / CAST(a.n_users AS DOUBLE), 4) + 0.0 AS mean_y,
                round(a.asy / CAST(a.n_users AS DOUBLE)
                      - t.theta * (a.asx / CAST(a.n_users AS DOUBLE) - t.gmean_x),
                      4) + 0.0 AS mean_y_cuped
         FROM a, t ORDER BY a.arm""",
    // identical md5 byte, thresholds, and weighted-mean floor division
    "q_sample_bootstrap" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(round(value * 100) AS BIGINT) AS c,
                           unnest([0, 1, 2, 3]) AS r
                    FROM events),
            w AS (SELECT event_type, CAST(r AS BIGINT) AS replica, c,
                         CASE WHEN h < 94 THEN 0
                              WHEN h < 187 THEN 1 ELSE 2 END AS w
                  FROM (SELECT *,
                          CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                            || CAST(r AS VARCHAR)), 1, 2))::UBIGINT AS BIGINT) AS h
                        FROM e))
         SELECT event_type, replica, CAST(sum(w) AS BIGINT) AS n_eff,
                (CAST(sum(w * c) AS BIGINT) * 100) // CAST(sum(w) AS BIGINT)
                  AS mean_c100
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical hour-grain self-join at lag 24 and five-sum Pearson;
    // IMPORTANT: only hours PRESENT in both series pair up (inner
    // join), mirrored exactly
    "q_events_autocorr" ->
      """WITH h AS (SELECT event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
            p AS (SELECT a.event_type, a.c AS x, b.c AS y
                  FROM h a JOIN h b
                    ON a.event_type = b.event_type AND a.h = b.h - 24),
            s AS (SELECT event_type, count(*) AS n,
                         CAST(count(*) AS DOUBLE) AS nd,
                         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                         CAST(sum(x * y) AS DOUBLE) AS sxy,
                         CAST(sum(x * x) AS DOUBLE) AS sxx,
                         CAST(sum(y * y) AS DOUBLE) AS syy
                  FROM p GROUP BY 1)
         SELECT event_type, n,
                round((sxy * nd - sx * sy) /
                      (sqrt(sxx * nd - sx * sx) * sqrt(syy * nd - sy * sy)), 6)
                  + 0.0 AS autocorr_24h
         FROM s ORDER BY event_type""",
    // identical packed-bigint RANGE-frame lookup; % on non-negatives
    "q_events_attribution" ->
      """WITH e AS (SELECT user_id, event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c,
                           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
                    FROM events),
            w AS (SELECT *,
                         max(CASE WHEN event_type = 'click'
                                  THEN ts_s * 1024 + item END)
                           OVER (PARTITION BY user_id ORDER BY ts_s
                                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                           AS last_click
                  FROM e)
         SELECT COALESCE(last_click % 1024, -1) AS attr_item,
                CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(sum(c) AS BIGINT) AS revenue_cents
         FROM w WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",
    // identical conditional-min reduction; quantile_cont ≡ Spark's
    // percentile on the null-skipped lag set
    "q_events_conversion_lag" ->
      """WITH e AS (SELECT user_id, event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
                    FROM events),
            su AS (SELECT user_id, min(ts_s) AS s_ts FROM e
                   WHERE event_type = 'signup' GROUP BY 1),
            pu AS (SELECT user_id, ts_s AS p_raw FROM e
                   WHERE event_type = 'purchase'),
            c AS (SELECT su.user_id, su.s_ts,
                         min(CASE WHEN pu.p_raw >= su.s_ts THEN pu.p_raw END) AS p_ts
                  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
                  GROUP BY 1, 2)
         SELECT s_ts // 86400 AS cohort_day,
                CAST(count(*) AS BIGINT) AS n_signups,
                CAST(count(p_ts) AS BIGINT) AS n_converted,
                round(quantile_cont(p_ts - s_ts, 0.5), 4) AS median_lag_s
         FROM c GROUP BY 1 ORDER BY 1""",
    // identical clamp-at-20 power-of-two weights; HUGEINT sum → BIGINT
    "q_events_trending" ->
      """WITH e AS (
           SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
           FROM events),
         byday AS (
           SELECT item, day, count(*) AS n_day FROM e GROUP BY 1, 2),
         m AS (SELECT max(day) AS max_day FROM e),
         sc AS (
           SELECT item, CAST(sum(n_day) AS BIGINT) AS n,
                  CAST(sum((1::BIGINT << CAST(20 - least(m.max_day - day, 20) AS INTEGER))
                           * n_day) AS BIGINT) AS score
           FROM byday, m GROUP BY 1),
         rk AS (
           SELECT item, n, score,
                  CAST(row_number() OVER (ORDER BY score DESC, item) AS BIGINT) AS rank_decayed,
                  CAST(row_number() OVER (ORDER BY n DESC, item) AS BIGINT) AS rank_raw
           FROM sc)
         SELECT item, n, score, rank_decayed, rank_raw
         FROM rk WHERE rank_decayed <= 10 ORDER BY rank_decayed""",
    "q_events_props_json" ->
      """WITH e AS (SELECT event_type,
                           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                    FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                min(k) AS min_k, max(k) AS max_k,
                CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
         FROM e GROUP BY 1 ORDER BY 1""",
    "q_agg_mode" ->
      """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
            r AS (SELECT user_id, event_type, cnt,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY cnt DESC, event_type) AS rn
                  FROM c)
         SELECT user_id, event_type AS mode_event, cnt AS n_mode
         FROM r WHERE rn = 1 ORDER BY user_id""",
    // identical classic Levenshtein in both engines
    "q_join_editdist" ->
      """WITH p AS (SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
                    FROM part WHERE p_partkey < 2000),
            j AS (SELECT a.p_partkey AS ka, b.p_partkey AS kb,
                         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
                  FROM p a JOIN p b
                    ON a.blk = b.blk AND a.p_partkey <> b.p_partkey),
            r AS (SELECT ka, kb, dist,
                         row_number() OVER (PARTITION BY ka ORDER BY dist, kb) AS rn
                  FROM j)
         SELECT ka, kb, dist FROM r WHERE rn <= 3 ORDER BY ka, kb""",
    // DuckDB's rapidfuzz jaro_winkler_similarity is the independent
    // reference implementation the custom expression is pinned to
    "q_join_jarowinkler" ->
      """WITH p AS (SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
                    FROM part WHERE p_partkey < 2000),
            j AS (SELECT a.p_partkey AS ka, b.p_partkey AS kb,
                         jaro_winkler_similarity(a.p_name, b.p_name) AS sim
                  FROM p a JOIN p b
                    ON a.blk = b.blk AND a.p_partkey <> b.p_partkey),
            r AS (SELECT ka, kb, sim,
                         row_number() OVER (PARTITION BY ka ORDER BY sim DESC, kb) AS rn
                  FROM j)
         SELECT ka, kb, sim FROM r WHERE rn = 1 AND sim >= 0.8 ORDER BY ka""",
    "q_events_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
            g AS (SELECT d + CAST(t.x AS INTEGER) AS day, user_id
                  FROM du, range(7) t(x))
         SELECT CAST(day AS VARCHAR) AS day,
                CAST(count(DISTINCT user_id) AS BIGINT) AS wau
         FROM g GROUP BY 1 ORDER BY 1""",
    // DuckDB median on BIGINT returns DOUBLE with exact .5 halves,
    // matching Spark's percentile(x, 0.5) interpolation on integers
    "q_events_mad" ->
      """WITH e AS (SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents FROM events),
            med AS (SELECT event_type, median(cents) AS med_cents
                    FROM e GROUP BY 1),
            d AS (SELECT e.event_type, cents,
                         abs(cents - med_cents) AS dev, med_cents
                  FROM e JOIN med USING (event_type)),
            mad AS (SELECT event_type, median(dev) AS mad_cents
                    FROM d GROUP BY 1)
         SELECT d.event_type, any_value(d.med_cents) AS med_cents,
                any_value(mad.mad_cents) AS mad_cents,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN dev > mad.mad_cents * 4.4478
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM d JOIN mad USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",
    "q_quality_expectations" ->
      """WITH a AS (SELECT
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
              CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.10) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
              CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
              CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
              CAST(count(*) - count(DISTINCT l_orderkey * 10 + l_linenumber) AS BIGINT) AS v_uniq,
              CAST(sum(CASE WHEN NOT (l_shipdate BETWEEN '1992-01-01' AND '1998-12-31') THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
            FROM lineitem)
         SELECT u.check_name, a.n AS n_rows, u.n_violations,
                u.n_violations = 0 AS pass
         FROM a, LATERAL (
           SELECT 'discount_in_range' AS check_name, v_disc AS n_violations UNION ALL
           SELECT 'key_unique', v_uniq UNION ALL
           SELECT 'orderkey_not_null', v_null UNION ALL
           SELECT 'quantity_in_range', v_qty UNION ALL
           SELECT 'returnflag_domain', v_flag UNION ALL
           SELECT 'shipdate_bounds', v_ship) u
         ORDER BY u.check_name""",
    // parallel unnests zip in DuckDB, giving 0-based positions matching
    // posexplode; lift is exact-integer products with one division
    "q_text_pmi" ->
      """WITH raw AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 unnest(range(len(string_split(text, ' ')))) AS pos
               FROM documents),
            t AS (SELECT doc_id, tok, pos FROM raw WHERE tok <> ''),
            pairs AS (
              SELECT a.tok AS tok_a, b.tok AS tok_b
              FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              UNION ALL
              SELECT a.tok, b.tok
              FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 2),
            cab AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab
                    FROM pairs GROUP BY 1, 2),
            cl AS (SELECT tok_a, CAST(count(*) AS BIGINT) AS c_a FROM pairs GROUP BY 1),
            cr AS (SELECT tok_b, CAST(count(*) AS BIGINT) AS c_b FROM pairs GROUP BY 1),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs)
         SELECT cab.tok_a, cab.tok_b, c_ab,
                CAST(c_ab * n_pairs AS DOUBLE) / CAST(c_a * c_b AS DOUBLE) AS lift
         FROM cab JOIN cl ON cab.tok_a = cl.tok_a
                  JOIN cr ON cab.tok_b = cr.tok_b, n
         WHERE c_ab >= 3
         ORDER BY lift DESC, cab.tok_a, cab.tok_b LIMIT 100""",
    // DuckDB's utf8proc nfc_normalize is the independent reference for
    // the engine's JDK-backed expression; chr(769)=U+0301 combining
    // acute, chr(8203)=U+200B zero-width space
    "q_text_nfc" ->
      """WITH d AS (SELECT p_partkey,
                 replace(replace(p_name, 'e', 'e' || chr(769)),
                         ' ', ' ' || chr(8203)) AS dirty
               FROM part WHERE p_partkey <= 500),
            c AS (SELECT p_partkey, dirty,
                 nfc_normalize(regexp_replace(dirty,
                   '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g')) AS clean
               FROM d)
         SELECT p_partkey, clean,
                CAST(length(dirty) AS BIGINT) AS len_dirty,
                CAST(length(clean) AS BIGINT) AS len_clean
         FROM c ORDER BY p_partkey""",
    // identical md5 slices → word/bit split → bit_or'd 8×32-bit words
    "q_sketch_bloom" ->
      s"""WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                           CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT % 256 AS BIGINT) AS h1,
                           CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))::UBIGINT % 256 AS BIGINT) AS h2
                    FROM customer),
            bl AS (SELECT c_nationkey AS bnation, ${bloomWordsSql}
                   FROM c GROUP BY 1),
            pr AS (SELECT c.c_nationkey, bl.bnation,
                          ((${bloomWordArr}[CAST(h1 // 32 AS INTEGER) + 1]
                              & (1::BIGINT << CAST(h1 % 32 AS INTEGER))) <> 0
                           AND (${bloomWordArr}[CAST(h2 // 32 AS INTEGER) + 1]
                              & (1::BIGINT << CAST(h2 % 32 AS INTEGER))) <> 0) AS pos
                   FROM c, bl)
         SELECT bnation, CAST(count(*) AS BIGINT) AS n_probes,
                CAST(count(CASE WHEN c_nationkey = bnation THEN 1 END) AS BIGINT) AS n_members,
                CAST(count(CASE WHEN pos THEN 1 END) AS BIGINT) AS n_pos,
                CAST(count(CASE WHEN pos AND c_nationkey <> bnation THEN 1 END) AS BIGINT) AS n_fp,
                (count(CASE WHEN pos AND c_nationkey <> bnation THEN 1 END) * 1000000)
                  // (count(*) - count(CASE WHEN c_nationkey = bnation THEN 1 END)) AS fp_ppm
         FROM pr GROUP BY 1 ORDER BY 1""",
    "q_graph_khop" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       n1 AS (SELECT src, CAST(count(*) AS BIGINT) AS n1 FROM edges GROUP BY 1),
       th AS (SELECT e1.src AS src, e2.dst AS d
              FROM edges e1 JOIN edges e2 ON e1.dst = e2.src),
       reach AS (SELECT DISTINCT src, d FROM
                   (SELECT src, dst AS d FROM edges UNION ALL SELECT src, d FROM th)
                 WHERE d <> src),
       n2t AS (SELECT src, CAST(count(*) AS BIGINT) AS n2 FROM reach GROUP BY 1)
       SELECT n1.src AS doc_id, n1.n1, n2t.n2
       FROM n1 JOIN n2t ON n1.src = n2t.src ORDER BY doc_id"""),
    // 8 peel rounds unrolled; a converged round is a no-op, so the
    // engine's early exit returns the identical relation
    "q_graph_kcore" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       e0 AS MATERIALIZED (SELECT ia AS src, ib AS dst FROM pairs
              UNION ALL SELECT ib AS src, ia AS dst FROM pairs)""" +
      (1 to 8).map(r => s""",
       k$r AS MATERIALIZED (SELECT src FROM e${r - 1} GROUP BY src HAVING count(*) >= 3),
       e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
               WHERE e.src IN (SELECT src FROM k$r)
                 AND e.dst IN (SELECT src FROM k$r))""").mkString + """
       SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg
       FROM e8 GROUP BY src ORDER BY doc_id"""),
    // identical wedge/anti-join/degree joins and top-20 total order
    "q_graph_link_pred" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       cn AS (SELECT e1.src AS a, e2.dst AS c, CAST(count(*) AS BIGINT) AS cn
              FROM edges e1 JOIN edges e2 ON e1.dst = e2.src AND e1.src < e2.dst
              GROUP BY 1, 2),
       openw AS (SELECT cn.* FROM cn
                 WHERE NOT EXISTS (SELECT 1 FROM pairs p
                                   WHERE p.ia = cn.a AND p.ib = cn.c))
       SELECT o.a, o.c, o.cn, da.deg AS da, dc.deg AS dc,
              (o.cn * 1000000) // (da.deg + dc.deg - o.cn) AS jaccard_ppm
       FROM openw o JOIN deg da ON da.src = o.a JOIN deg dc ON dc.src = o.c
       ORDER BY o.cn DESC, o.a, o.c LIMIT 20"""),
    // identical md5 order, per-label quota = min class size
    "q_sample_balanced" ->
      """WITH l AS (SELECT label, CAST(count(*) AS BIGINT) AS n_orig
                    FROM embeddings GROUP BY 1),
            m AS (SELECT min(n_orig) AS min_n FROM l),
            r AS (SELECT label, vec_id,
                         row_number() OVER (PARTITION BY label
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS r
                  FROM embeddings),
            k AS (SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
                         CAST(sum(vec_id) AS BIGINT) AS kept_sum
                  FROM r, m WHERE r.r <= m.min_n GROUP BY 1)
         SELECT CAST(l.label AS BIGINT) AS label, l.n_orig, k.n_kept, k.kept_sum
         FROM l JOIN k ON l.label = k.label ORDER BY 1""",
    // 4 BFS rounds unrolled; a converged round is a no-op, so the
    // engine's early exit returns the identical relation
    "q_graph_sssp" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM
                (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
              WHERE node < 50)""" +
      (1 to 4).map(r => s""",
       d$r AS MATERIALIZED (
         SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d${r - 1}
           UNION ALL
           SELECT e.dst AS node, d.dist + 1 AS dist
           FROM d${r - 1} d JOIN edges e ON d.node = e.src)
         GROUP BY node)""").mkString + """
       SELECT node AS doc_id, dist FROM d4 ORDER BY doc_id"""),
    // each event lands in its two overlapping 600s/300s windows; the
    // integer-second floor never crosses a 300s boundary
    "q_window_hopping" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300 - k) * 300 AS win_start,
                event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events, (SELECT unnest([0, 1]) AS k) ks
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical ceil-rank quantile rows on the unique composite order
    "q_events_winsorized" ->
      """WITH d AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS rn,
                           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
                    FROM events),
            q AS (SELECT event_type,
                         min(CASE WHEN rn = (cnt + 9) // 10 THEN c END) AS p10,
                         min(CASE WHEN rn = (9 * cnt + 9) // 10 THEN c END) AS p90
                  FROM d GROUP BY 1)
         SELECT d.event_type, CAST(count(*) AS BIGINT) AS n, q.p10, q.p90,
                CAST(sum(greatest(q.p10, least(q.p90, d.c))) AS BIGINT) AS sum_w,
                CAST(sum(greatest(q.p10, least(q.p90, d.c))) AS BIGINT)
                  // CAST(count(*) AS BIGINT) AS mean_w
         FROM d JOIN q ON d.event_type = q.event_type
         GROUP BY 1, q.p10, q.p90 ORDER BY 1""",
    // identical integer floor(log2) via binary-string length
    "q_text_lm_surprisal" ->
      """WITH dp AS (SELECT doc_id,
                            unnest(list_transform(range(1, len(tk)),
                              i -> struct_pack(w1 := tk[i], w2 := tk[i + 1])),
                              recursive := true)
                     FROM (SELECT doc_id, string_split(text, ' ') AS tk
                           FROM documents WHERE len(string_split(text, ' ')) >= 2)),
            big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
                    FROM dp GROUP BY 1, 2),
            tot AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS tot FROM big GROUP BY 1),
            model AS (SELECT big.w1, big.w2,
                             CAST(length(bin(tot // cnt)) - 1 AS BIGINT) AS surprisal
                      FROM big JOIN tot ON big.w1 = tot.w1)
         SELECT dp.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(surprisal) AS BIGINT) AS sum_surprisal,
                (sum(surprisal) * 1000000) // count(*) AS mean_ppm
         FROM dp JOIN model ON dp.w1 = model.w1 AND dp.w2 = model.w2
         GROUP BY 1 ORDER BY 1""",
    // survivor per cluster from the same unrolled Lloyd CTE chain
    "q_dedup_semantic" -> (kmeansCtes(8, 3) +
      s""",
         |af AS (SELECT vec_id, cid, dist FROM (
         |  SELECT vec_id, cid, dist,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |        FROM v JOIN c3 c ON v.i = c.i GROUP BY 1, 2)) WHERE rn = 1)
         |SELECT cid, vec_id AS survivor, CAST(dist AS BIGINT) AS dist,
         |       CAST(n AS BIGINT) AS n_members
         |FROM (SELECT cid, vec_id, dist,
         |             row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rn,
         |             count(*) OVER (PARTITION BY cid) AS n
         |      FROM af)
         |WHERE rn = 1 ORDER BY cid""".stripMargin),
    // identical md5 band signatures; exact jaccard from the token join
    "q_dedup_minhash_eval" ->
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                       FROM documents WHERE doc_id < 200),
            sigs AS (SELECT doc_id, band,
                            min(md5(CAST(band AS VARCHAR) || ':' || tok)) AS sig
                     FROM toks, (SELECT unnest(range(8)) AS band) b
                     GROUP BY 1, 2),
            cands AS (SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia,
                                      CAST(b.doc_id AS BIGINT) AS ib
                      FROM sigs a JOIN sigs b
                        ON a.band = b.band AND a.sig = b.sig
                           AND a.doc_id < b.doc_id),
            agr AS (SELECT ia, ib,
                           CAST(count(CASE WHEN sa.sig = sb.sig THEN 1 END) AS BIGINT) AS n_agree
                    FROM cands
                    JOIN sigs sa ON sa.doc_id = ia
                    JOIN sigs sb ON sb.doc_id = ib AND sb.band = sa.band
                    GROUP BY 1, 2),
            sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
            itr AS (SELECT x.doc_id AS ia, y.doc_id AS ib,
                           CAST(count(*) AS BIGINT) AS inter
                    FROM toks x JOIN toks y
                      ON x.tok = y.tok AND x.doc_id < y.doc_id
                    GROUP BY 1, 2)
         SELECT agr.ia, agr.ib, n_agree,
                (n_agree * 1000000) // 8 AS est_ppm,
                (inter * 1000000) // (sa.sz + sb.sz - inter) AS exact_ppm,
                abs((n_agree * 1000000) // 8
                    - (inter * 1000000) // (sa.sz + sb.sz - inter)) AS err_ppm
         FROM agr JOIN itr ON agr.ia = itr.ia AND agr.ib = itr.ib
              JOIN sz sa ON agr.ia = sa.doc_id
              JOIN sz sb ON agr.ib = sb.doc_id
         ORDER BY agr.ia, agr.ib""",
    // identical integer floor(log2) bits
    "q_agg_entropy" ->
      """WITH c AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                     FROM c GROUP BY 1, 2),
            tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot,
                           CAST(count(*) AS BIGINT) AS n_distinct
                    FROM cnts GROUP BY 1)
         SELECT cnts.source, tot, n_distinct,
                CAST(sum(cnt * (length(bin(tot // cnt)) - 1)) AS BIGINT) AS sum_bits,
                (sum(cnt * (length(bin(tot // cnt)) - 1)) * 1000000) // tot AS mean_bits_ppm
         FROM cnts JOIN tot ON cnts.source = tot.source
         GROUP BY 1, 2, 3 ORDER BY 1""",
    // identical prefix-sum / running-min formulation; sums of cents are
    // non-negative per type so // here floors exactly like Spark's div
    "q_events_cusum" ->
      """WITH e AS (
           SELECT event_type, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
         k AS (SELECT event_type, CAST(sum(c) AS BIGINT) // count(*) AS k
               FROM e GROUP BY 1),
         pre AS (
           SELECT e.event_type, e.event_id, e.ts_s,
                  sum(e.c - k.k) OVER (PARTITION BY e.event_type
                    ORDER BY e.ts_s, e.event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
           FROM e JOIN k ON e.event_type = k.event_type),
         p AS (
           SELECT event_type, event_id, p,
                  min(p) OVER (PARTITION BY event_type ORDER BY ts_s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
           FROM pre)
         SELECT event_type, event_id,
                CAST(p - least(0, mn) AS BIGINT) AS s,
                CAST(CASE WHEN p - least(0, mn) > 200000 THEN 1 ELSE 0 END AS BIGINT) AS alarm
         FROM p ORDER BY event_type, event_id""",
    "q_join_asof_nearest" ->
      """WITH errs AS (
           SELECT user_id, event_id, epoch_ms(ts) AS err_ms
           FROM events WHERE event_type = 'error'),
         clicks AS (
           SELECT user_id AS cu, epoch_ms(ts) AS click_ms
           FROM events WHERE event_type = 'click'),
         cand AS (
           SELECT event_id, user_id, click_ms, abs(err_ms - click_ms) AS gap_ms,
                  row_number() OVER (PARTITION BY event_id
                                     ORDER BY abs(err_ms - click_ms), click_ms) AS rn
           FROM errs JOIN clicks ON user_id = cu)
         SELECT event_id, user_id, click_ms, gap_ms
         FROM cand WHERE rn = 1 ORDER BY event_id""",
    // the oracle joins on the exact predicate directly — proving the
    // banded decomposition loses and invents nothing
    "q_join_interval_overlap" ->
      """WITH iv AS (
           SELECT user_id, event_type,
                  CAST(min(floor(epoch(ts))) AS BIGINT) AS lo,
                  CAST(max(floor(epoch(ts))) AS BIGINT) AS hi
           FROM events GROUP BY 1, 2)
         SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
                least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_s
         FROM iv a JOIN iv b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
          AND a.lo <= b.hi AND b.lo <= a.hi
         ORDER BY a.user_id, type_a, type_b""",
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS odate,
                CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
                CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                                GROUP BY l_orderkey
                                HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""",
    // the identical fingerprint-then-repair protocol: same md5 row hash,
    // same bucket scheme, same derived replica B
    "q_replica_diff" ->
      """WITH a AS (
           SELECT event_id, user_id,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
         b AS (
           SELECT event_id, user_id,
                  c + CASE WHEN event_id % 1009 = 0 THEN 1 ELSE 0 END AS c
           FROM a WHERE event_id % 997 <> 0),
         fa AS (
           SELECT event_id, user_id % 64 AS bucket,
                  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
                    CAST(c AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS rh
           FROM a),
         fb AS (
           SELECT event_id, user_id % 64 AS bucket,
                  CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
                    CAST(c AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS rh
           FROM b),
         sa AS (SELECT bucket, bit_xor(rh) AS fp_a, count(*) AS n_a FROM fa GROUP BY 1),
         sb AS (SELECT bucket, bit_xor(rh) AS fp_b, count(*) AS n_b FROM fb GROUP BY 1),
         dirty AS (
           SELECT sa.bucket FROM sa LEFT JOIN sb ON sa.bucket = sb.bucket
           WHERE sa.fp_a <> coalesce(sb.fp_b, -1) OR sa.n_a <> coalesce(sb.n_b, 0))
         SELECT fa.bucket, fa.event_id,
                CASE WHEN fb.event_id IS NULL THEN 'missing_in_b'
                     ELSE 'changed' END AS status
         FROM fa
         JOIN dirty ON fa.bucket = dirty.bucket
         LEFT JOIN fb ON fa.event_id = fb.event_id
         WHERE fb.event_id IS NULL OR fb.rh <> fa.rh
         ORDER BY fa.bucket, fa.event_id""",
    // identical halves / bins / integer-ppm arithmetic
    "q_events_drift" ->
      """WITH e AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
         bounds AS (
           SELECT event_type, (min(ts_s) + max(ts_s)) // 2 AS mid
           FROM e GROUP BY 1),
         h AS (
           SELECT e.event_type,
                  CASE WHEN ts_s <= mid THEN 'early' ELSE 'late' END AS half,
                  least(c // 5000, 9) AS bin
           FROM e JOIN bounds ON e.event_type = bounds.event_type),
         counts AS (SELECT event_type, half, bin, count(*) AS n
                    FROM h GROUP BY 1, 2, 3),
         totals AS (SELECT event_type, half, sum(n) AS tot
                    FROM counts GROUP BY 1, 2),
         grid AS (SELECT DISTINCT event_type, x AS bin
                  FROM counts, range(10) t(x)),
         pe AS (SELECT c.event_type, c.bin,
                       CAST(c.n * 1000000 // t.tot AS BIGINT) AS ppm_early
                FROM counts c JOIN totals t
                  ON c.event_type = t.event_type AND c.half = t.half
                WHERE c.half = 'early'),
         pl AS (SELECT c.event_type, c.bin,
                       CAST(c.n * 1000000 // t.tot AS BIGINT) AS ppm_late
                FROM counts c JOIN totals t
                  ON c.event_type = t.event_type AND c.half = t.half
                WHERE c.half = 'late'),
         j AS (SELECT g.event_type, g.bin,
                      coalesce(pe.ppm_early, 0) AS ppm_early,
                      coalesce(pl.ppm_late, 0) AS ppm_late
               FROM grid g
               LEFT JOIN pe ON g.event_type = pe.event_type AND g.bin = pe.bin
               LEFT JOIN pl ON g.event_type = pl.event_type AND g.bin = pl.bin)
         SELECT event_type, bin, ppm_early, ppm_late,
                abs(ppm_late - ppm_early) AS dev_ppm,
                CAST(sum(abs(ppm_late - ppm_early))
                     OVER (PARTITION BY event_type) AS BIGINT) AS drift_ppm
         FROM j ORDER BY event_type, bin""",
    // the quadratic NOT-EXISTS dominance test — proving the
    // agg-then-window decomposition loses and invents nothing
    "q_docs_skyline" ->
      """WITH d AS (
           SELECT doc_id, n_chars,
                  len(list_distinct(string_split(text, ' '))) * 1000000
                    // greatest(len(string_split(text, ' ')), 1) AS uniq_ppm
           FROM documents)
         SELECT doc_id, n_chars, uniq_ppm
         FROM d x
         WHERE NOT EXISTS (
           SELECT 1 FROM d y
           WHERE y.n_chars >= x.n_chars AND y.uniq_ppm >= x.uniq_ppm
             AND (y.n_chars > x.n_chars OR y.uniq_ppm > x.uniq_ppm))
         ORDER BY n_chars DESC, doc_id""",
    // identical md5 registers; union = per-register max; intersect =
    // inclusion-exclusion over the three estimates
    "q_sketch_hll_setops" ->
      """WITH raw AS (SELECT event_type AS k, CAST(user_id AS VARCHAR) AS v
                      FROM events WHERE event_type IN ('click', 'error')),
         h AS (SELECT k, ('0x' || substr(md5(v), 1, 14))::UBIGINT AS h FROM raw),
         b AS (SELECT k, CAST(h % 64 AS BIGINT) AS bucket,
                      CAST(h >> 6 AS BIGINT) AS w FROM h),
         r AS (SELECT k, bucket,
                      CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS rho
               FROM b),
         regs AS (SELECT s.bucket,
                    coalesce(max(CASE WHEN r.k = 'click' THEN r.rho END), 0) AS ra,
                    coalesce(max(CASE WHEN r.k = 'error' THEN r.rho END), 0) AS rb
                  FROM (SELECT unnest(range(64)) AS bucket) s
                  LEFT JOIN r ON s.bucket = r.bucket GROUP BY s.bucket),
         u AS (SELECT ra, rb, greatest(ra, rb) AS ru FROM regs),
         agg AS (SELECT
             CAST(sum(1::BIGINT << (51 - ra)) AS BIGINT) AS sa,
             CAST(sum(1::BIGINT << (51 - rb)) AS BIGINT) AS sb,
             CAST(sum(1::BIGINT << (51 - ru)) AS BIGINT) AS su FROM u),
         e AS (SELECT
             round(0.709::DOUBLE * 64 * 64 * 2251799813685248.0 / sa, 3) AS est_click,
             round(0.709::DOUBLE * 64 * 64 * 2251799813685248.0 / sb, 3) AS est_error,
             round(0.709::DOUBLE * 64 * 64 * 2251799813685248.0 / su, 3) AS est_union
           FROM agg)
         SELECT est_click, est_error, est_union,
                round(est_click + est_error - est_union, 3) AS est_intersect
         FROM e""",
    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS INTEGER) AS l_year,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM lineitem l
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         WHERE l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
           AND ((n1.n_nationkey % 5 = 1 AND n2.n_nationkey % 5 = 2)
             OR (n1.n_nationkey % 5 = 2 AND n2.n_nationkey % 5 = 1))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
               FROM customer c LEFT OUTER JOIN orders o
                 ON c.c_custkey = o.o_custkey
                AND o.o_orderpriority NOT LIKE '1%'
               GROUP BY c.c_custkey) d
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE o.o_orderstatus = 'F'
           AND l1.l_shipdate > TIMESTAMP '1999-01-01'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > TIMESTAMP '1999-01-01')
           AND n.n_nationkey % 5 = 3
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 100""",
    "q_tpch_q22" ->
      """WITH cust AS (
           SELECT c_custkey, c_nationkey % 7 AS cntrycode,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
           FROM customer),
         a AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s_pos,
                      CAST(count(*) AS BIGINT) AS n_pos
               FROM cust WHERE bal_c > 0)
         SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
                CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
         FROM cust, a
         WHERE bal_c * n_pos > s_pos
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = cust.c_custkey
                             AND o.o_orderpriority LIKE '1%')
         GROUP BY cntrycode ORDER BY cntrycode""",
    "q_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate <  TIMESTAMP '1996-04-01'
           AND l.l_returnflag = 'R'
         GROUP BY 1, 2, 3
         ORDER BY revenue_c DESC, c_custkey LIMIT 20""",
    "q_tpch_q12" ->
      """SELECT CASE WHEN l_partkey % 3 = 0 THEN 'MAIL'
                     WHEN l_partkey % 3 = 1 THEN 'SHIP' ELSE 'TRUCK' END AS shipmode,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
           AND l.l_shipdate <  TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q_tpch_q14" ->
      """WITH s AS (
           SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                            THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS promo_c,
                  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_c
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
             AND l.l_shipdate <  TIMESTAMP '1997-09-01')
         SELECT promo_c, total_c,
                CAST((1000000::HUGEINT * promo_c) // total_c AS BIGINT) AS promo_ppm
         FROM s""",
    "q_tpch_q19" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
                AND l.l_quantity BETWEEN 20 AND 30)""",
    "q_tpch_q8" ->
      """WITH g AS (
           SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                  CAST(sum(CASE WHEN n2.n_name = 'NATION_12'
                            THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS nation_c,
                  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_c
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           JOIN orders o ON o.o_orderkey = l.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
           JOIN region r ON n1.n_regionkey = r.r_regionkey
           JOIN supplier s2 ON l.l_suppkey = s2.s_suppkey
           JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
           WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
             AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             AND o.o_orderdate <  TIMESTAMP '1999-01-01'
           GROUP BY 1)
         SELECT o_year, nation_c, total_c,
                CAST((1000000::HUGEINT * nation_c) // total_c AS BIGINT) AS share_ppm
         FROM g ORDER BY o_year""",
    "q_tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_c
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate <  TIMESTAMP '1997-07-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_c
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_c = (SELECT max(total_c) FROM revenue)
         ORDER BY s_suppkey""",
    // identical correlated-min form over the identical derived supply
    // relation; DuckDB decorrelates the same way
    "q_tpch_q2" ->
      s"""WITH $psCte
         SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
                s.s_name, n.n_name, p.p_partkey, p.p_brand, ps.ps_supplycost_c
         FROM part p
         JOIN ps ON p.p_partkey = ps.ps_partkey
         JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE p.p_type = 'SMALL' AND p.p_size % 5 = 0 AND r.r_name = 'EUROPE'
           AND ps.ps_supplycost_c = (
             SELECT min(ps2.ps_supplycost_c)
             FROM ps ps2
             JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
             JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal_c DESC, n.n_name, s.s_name, p.p_partkey
         LIMIT 100""",
    "q_tpch_q9" ->
      s"""WITH $psCte
         SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                         - ps.ps_supplycost_c * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_c
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
         JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q_tpch_q11" ->
      s"""WITH $psCte,
         nat AS (
           SELECT ps.ps_partkey, ps.ps_supplycost_c * ps.ps_availqty AS v
           FROM ps
           JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
           WHERE n.n_nationkey % 5 = 1),
         by_part AS (
           SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_c
           FROM nat GROUP BY 1),
         tot AS (
           SELECT CAST(sum(v) AS BIGINT) AS total_c,
                  CAST(count(DISTINCT ps_partkey) AS BIGINT) AS n_parts
           FROM nat)
         SELECT ps_partkey, value_c FROM by_part, tot
         WHERE value_c > total_c // (2 * n_parts)
         ORDER BY value_c DESC, ps_partkey""",
    "q_tpch_q16" ->
      s"""WITH $psCte
         SELECT p.p_brand, p.p_type, p.p_size,
                CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
         FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
         WHERE p.p_brand <> 'Brand#13'
           AND p.p_type NOT LIKE 'MEDIUM%'
           AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
           AND ps.ps_suppkey NOT IN
               (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch_q20" ->
      s"""WITH $psCte
         SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c
         FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_nationkey % 5 = 4
           AND s.s_suppkey IN (
             SELECT ps.ps_suppkey FROM ps
             WHERE ps.ps_partkey IN
                 (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
               AND 2 * (SELECT COALESCE(CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0)
                        FROM lineitem l
                        WHERE l.l_partkey = ps.ps_partkey
                          AND l.l_suppkey = ps.ps_suppkey
                          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                          AND l.l_shipdate <  TIMESTAMP '1998-01-01')
                   > ps.ps_availqty)
         ORDER BY s.s_name""",
    // the bucketed tables carry the same rows as the source parquet, so
    // the oracle is the plain join
    "q_join_bucketed" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q_window_islands" ->
      """WITH d AS (
           SELECT DISTINCT user_id,
                  CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS BIGINT) AS day
           FROM events),
         g AS (
           SELECT user_id, day,
                  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           FROM d),
         i AS (
           SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
                  CAST(min(day) AS BIGINT) AS start_day
           FROM g GROUP BY 1, 2)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
                CAST(max(len) AS BIGINT) AS longest,
                CAST(min(start_day) AS BIGINT) AS first_day
         FROM i GROUP BY user_id ORDER BY user_id""",
    // the sqrt operand is one exact integer; int→double and sqrt are
    // IEEE-exactly-rounded in both engines, floor pins the ppm
    "q_sample_temperature" ->
      """WITH tok AS (SELECT source, sum(len(string_split(text, ' '))) AS tokens
                      FROM documents GROUP BY 1),
         m AS (SELECT max(tokens) AS tmax FROM tok)
         SELECT source, CAST(tokens AS BIGINT) AS tokens,
                CAST(floor(sqrt(CAST(tokens * 1000000000000 // tmax AS DOUBLE)))
                     AS BIGINT) AS weight_ppm
         FROM tok, m ORDER BY source""",
    "q_sample_importance" ->
      """WITH u AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            toks AS (SELECT doc_id, lang,
                            CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) % 64 AS f
                     FROM u WHERE tok <> ''),
            raw AS (SELECT f, count(*) AS r_f FROM toks GROUP BY f),
            tgt AS (SELECT f, count(*) AS t_f FROM toks WHERE lang = 'en' GROUP BY f),
            tot AS (SELECT (SELECT sum(r_f) FROM raw) AS r_tot,
                           (SELECT sum(t_f) FROM tgt) AS t_tot),
            lifts AS (SELECT raw.f,
                             CAST((COALESCE(t_f, 0)::HUGEINT * r_tot * 1000000)
                                  // (r_f::HUGEINT * t_tot) AS BIGINT) AS lift_ppm
                      FROM raw LEFT JOIN tgt ON raw.f = tgt.f, tot),
            cf AS (SELECT doc_id, f, count(*) AS c_f FROM toks GROUP BY doc_id, f)
         SELECT doc_id, CAST(sum(c_f) AS BIGINT) AS n_toks,
                CAST(sum(c_f * lift_ppm) // sum(c_f) AS BIGINT) AS score_ppm
         FROM cf JOIN lifts ON cf.f = lifts.f
         GROUP BY doc_id ORDER BY score_ppm DESC, doc_id LIMIT 100""",
    // same integerization + slicing as the engine; argmin replayed as
    // a row_number over (d2, code)
    "q_ann_pq" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            subs AS (SELECT vec_id, m AS sub, v[m*16+1 : m*16+16] AS sv
                     FROM e, (SELECT unnest(range(4)) AS m) t),
            cb AS (SELECT vec_id AS code, sub, sv AS cv FROM subs WHERE vec_id < 8),
            d AS (SELECT s.vec_id, s.sub, cb.code,
                         list_reduce(list_transform(list_zip(s.sv, cb.cv),
                                                    p -> (p[1] - p[2]) * (p[1] - p[2])),
                                     (x, y) -> x + y) AS d2
                  FROM subs s JOIN cb ON s.sub = cb.sub),
            a AS (SELECT vec_id, sub, code, d2,
                         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
                  FROM d)
         SELECT CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
                count(*) AS n, CAST(sum(d2) AS BIGINT) AS sum_err
         FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY sub, code""",
    // same subs/codebook CTEs; ADC distance replayed as the LUT sum
    "q_ann_adc" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            subs AS (SELECT vec_id, m AS sub, v[m*16+1 : m*16+16] AS sv
                     FROM e, (SELECT unnest(range(4)) AS m) t),
            cb AS (SELECT vec_id AS code, sub, sv AS cv FROM subs WHERE vec_id < 8),
            d AS (SELECT s.vec_id, s.sub, cb.code,
                         list_reduce(list_transform(list_zip(s.sv, cb.cv),
                                                    p -> (p[1] - p[2]) * (p[1] - p[2])),
                                     (x, y) -> x + y) AS d2
                  FROM subs s JOIN cb ON s.sub = cb.sub),
            codes AS (SELECT vec_id, sub, code FROM (
                        SELECT vec_id, sub, code,
                               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
                        FROM d) WHERE rn = 1),
            lut AS (SELECT s.vec_id AS qid, s.sub, cb.code,
                           list_reduce(list_transform(list_zip(s.sv, cb.cv),
                                                      p -> (p[1] - p[2]) * (p[1] - p[2])),
                                       (x, y) -> x + y) AS lut_d2
                    FROM subs s JOIN cb ON s.sub = cb.sub
                    WHERE s.vec_id < 10),
            scored AS (SELECT l.qid, c.vec_id, CAST(sum(l.lut_d2) AS BIGINT) AS adc_d2
                       FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
                       WHERE l.qid <> c.vec_id GROUP BY 1, 2),
            ranked AS (SELECT qid, vec_id, adc_d2,
                              row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vec_id) AS rank
                       FROM scored)
         SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id AS nb, adc_d2
         FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    "q_events_pattern" ->
      """WITH seqs AS (SELECT user_id,
                              string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
                       FROM events GROUP BY user_id)
         SELECT user_id, CAST(len(seq) AS BIGINT) AS seq_len,
                CAST(len(regexp_extract_all(seq, 'sv+p')) AS BIGINT) AS n_matches
         FROM seqs WHERE len(regexp_extract_all(seq, 'sv+p')) >= 1
         ORDER BY user_id""",
    "q_sample_epochs" ->
      """WITH d AS (SELECT doc_id,
                           CAST(('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 16 AS BIGINT) AS shard_e1,
                           CAST(('0x' || substr(md5('2:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 16 AS BIGINT) AS shard_e2
                    FROM documents)
         SELECT shard_e1, shard_e2, count(*) AS n, CAST(min(doc_id) AS BIGINT) AS min_doc
         FROM d GROUP BY 1, 2 ORDER BY shard_e1, shard_e2""",
    "q_dedup_incremental" ->
      """WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            sigs AS (SELECT doc_id, band,
                            min(md5(CAST(band AS VARCHAR) || ':' || tok)) AS sig
                     FROM toks, (SELECT unnest(range(8)) AS band) b GROUP BY doc_id, band),
            base AS (SELECT band, sig, doc_id AS base_doc FROM sigs WHERE doc_id % 5 <> 0),
            wave AS (SELECT doc_id, band, sig FROM sigs WHERE doc_id % 5 = 0)
         SELECT w.doc_id, count(DISTINCT w.band) AS n_bands_hit,
                CAST(min(b.base_doc) AS BIGINT) AS first_match
         FROM wave w JOIN base b ON w.band = b.band AND w.sig = b.sig
         GROUP BY w.doc_id ORDER BY w.doc_id""",
    "q_events_markov" ->
      """WITH tr AS (SELECT event_type AS src,
                            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
                     FROM events),
            cnt AS (SELECT src, dst, count(*) AS n FROM tr
                    WHERE dst IS NOT NULL GROUP BY src, dst)
         SELECT src, dst, n,
                CAST((n * 1000000) // sum(n) OVER (PARTITION BY src) AS BIGINT) AS ppm
         FROM cnt ORDER BY src, dst""",
    "q_text_distinct_ngrams" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS l FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
            grams AS (SELECT source, array_to_string(l[x+1:x+3], ' ') AS gram
                      FROM toks, LATERAL (SELECT unnest(range(len(l) - 2)) AS x) g)
         SELECT source, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
                CAST((count(DISTINCT gram) * 1000000) // count(*) AS BIGINT) AS diversity_ppm
         FROM grams GROUP BY source ORDER BY source""",
    "q_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            tot AS (SELECT pk, count(*) AS s FROM li GROUP BY pk),
            n_o AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
            pairs AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
                      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
                      GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT p1, p2, support,
                CAST((support::HUGEINT * n_orders * 1000000)
                     // (t1.s::HUGEINT * t2.s) AS BIGINT) AS lift_ppm
         FROM pairs JOIN tot t1 ON pairs.p1 = t1.pk
                    JOIN tot t2 ON pairs.p2 = t2.pk, n_o
         ORDER BY support DESC, p1, p2 LIMIT 100""",
    "q_text_search_and" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            top3 AS (SELECT tok FROM nz GROUP BY tok
                     ORDER BY count(*) DESC, tok LIMIT 3)
         SELECT doc_id, count(*) AS tf_sum
         FROM nz WHERE tok IN (SELECT tok FROM top3)
         GROUP BY doc_id HAVING count(DISTINCT tok) = 3
         ORDER BY doc_id""",
    "q_quality_fk" ->
      """WITH a1 AS (SELECT 'events.user_id->customer' AS relation,
                            count(*) AS n_child,
                            CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
                     FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                       ON e.user_id = c.c_custkey),
            a2 AS (SELECT 'lineitem->orders', count(*),
                          CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                     ON l.l_orderkey = o.o_orderkey),
            a3 AS (SELECT 'orders->customer', count(*),
                          CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                     ON r.o_custkey = c.c_custkey)
         SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3
         ORDER BY relation""",
    "q_table_compact_plan" ->
      """WITH b AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 64 AS BIGINT) AS bucket,
                           CAST(sum(n_chars) AS BIGINT) AS bytes
                    FROM documents GROUP BY 1),
            tb AS (SELECT CAST(sum(bytes) AS BIGINT) AS tb FROM b),
            pl AS (SELECT bucket, bytes,
                          COALESCE(CAST(sum(bytes) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS before
                   FROM b)
         SELECT before // ((tb + 7) // 8) AS out_file,
                count(*) AS n_buckets, CAST(sum(bytes) AS BIGINT) AS bytes
         FROM pl, tb GROUP BY 1 ORDER BY out_file""",
    "q_unpivot" ->
      """WITH wide AS (SELECT l_returnflag,
                              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
                              CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c
                       FROM lineitem GROUP BY 1)
         SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
           UNION ALL
           SELECT l_returnflag, 'sum_price_c', sum_price_c FROM wide
           UNION ALL
           SELECT l_returnflag, 'sum_disc_c', sum_disc_c FROM wide)
         ORDER BY l_returnflag, measure""",
    // identical quasi-identifier bucketing and thresholds
    "q_privacy_kanon" ->
      """SELECT lang, n_chars // 100 AS len_bucket,
                CAST(count(*) AS BIGINT) AS class_size,
                CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive,
                CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS k_anon,
                CASE WHEN count(DISTINCT source) >= 2 THEN 1 ELSE 0 END AS l_diverse
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical md5-derived 20-bit draw and dyadic inverse-CDF
    "q_privacy_dp_hist" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents GROUP BY 1),
            h AS (SELECT source, n_docs,
                         CAST(('0x' || substr(md5(source), 1, 5))::UBIGINT AS BIGINT) AS h20
                  FROM c),
            m AS (SELECT source, n_docs, h20,
                         length(bin(524288 // ((h20 // 2) + 1))) - 1 AS mag
                  FROM h)
         SELECT source, n_docs,
                CAST(CASE WHEN h20 % 2 = 1 THEN mag ELSE -mag END AS BIGINT) AS noise,
                CAST(n_docs + CASE WHEN h20 % 2 = 1 THEN mag ELSE -mag END AS BIGINT) AS dp_count
         FROM m ORDER BY source""",
    // identical bin()-length log2 axes, rank tie-break, and cast-once
    // double slope
    "q_text_zipf_decades" ->
      """WITH c AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
            cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                     FROM c GROUP BY 1, 2),
            pts AS (SELECT source,
                           length(bin(CAST(row_number() OVER (PARTITION BY source
                             ORDER BY cnt DESC, tok) AS BIGINT))) - 1 AS x,
                           length(bin(cnt)) - 1 AS y
                    FROM cnts),
            sums AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                            sum(CAST(x AS HUGEINT)) AS sx,
                            sum(CAST(y AS HUGEINT)) AS sy,
                            sum(CAST(x * y AS HUGEINT)) AS sxy,
                            sum(CAST(x * x AS HUGEINT)) AS sxx
                     FROM pts GROUP BY 1)
         SELECT source, n,
                round((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                      6) AS zipf_slope
         FROM sums ORDER BY source""",
    // identical top-20 tie-break and global-N moment arithmetic
    "q_text_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
            td AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
            pd AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS x
                   FROM td GROUP BY 1, 2),
            tt AS (SELECT tok, CAST(sum(x) AS BIGINT) AS cnt,
                          CAST(count(*) AS BIGINT) AS df,
                          sum(CAST(x * x AS HUGEINT)) AS sxx
                   FROM pd GROUP BY 1
                   ORDER BY cnt DESC, tok LIMIT 20)
         SELECT tok, cnt, df,
                round((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))
                      / (CAST(n_docs AS DOUBLE) * CAST(cnt AS DOUBLE)),
                      6) AS vmr
         FROM tt, nd ORDER BY cnt DESC, tok""",
    // identical per-n shingling (inclusive 1-based slices) and ≥2-doc
    // threshold
    "q_text_repeated_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            g AS (
              SELECT DISTINCT n, doc_id, gram FROM (
                SELECT 5 AS n, doc_id, array_to_string(w[i:i+4], ' ') AS gram
                FROM toks, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS t(i)
                UNION ALL
                SELECT 10, doc_id, array_to_string(w[i:i+9], ' ')
                FROM toks, unnest(range(1, greatest(len(w) - 9, 0) + 1)) AS t(i)
                UNION ALL
                SELECT 20, doc_id, array_to_string(w[i:i+19], ' ')
                FROM toks, unnest(range(1, greatest(len(w) - 19, 0) + 1)) AS t(i))),
            rep AS (SELECT n, gram, CAST(count(*) AS BIGINT) AS n_docs_gram
                    FROM g GROUP BY 1, 2 HAVING count(*) >= 2),
            ng AS (SELECT n, CAST(count(*) AS BIGINT) AS n_repeated_grams,
                          max(n_docs_gram) AS max_docs_per_gram
                   FROM rep GROUP BY 1),
            nd AS (SELECT n, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_affected
                   FROM g JOIN rep USING (n, gram) GROUP BY 1)
         SELECT ng.n, n_repeated_grams, max_docs_per_gram, n_docs_affected
         FROM ng JOIN nd ON ng.n = nd.n ORDER BY ng.n""",
    // identical churn horizon, risk-set windows, and floor-div hazard
    "q_events_churn_hazard" ->
      """WITH e AS (SELECT user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events),
            lastd AS (SELECT user_id, max(day) AS last_day FROM e GROUP BY 1),
            mx AS (SELECT max(last_day) AS maxd FROM lastd),
            lab AS (SELECT user_id, last_day,
                           CASE WHEN last_day <= maxd - 7 THEN 1 ELSE 0 END AS churned
                    FROM lastd, mx),
            byday AS (SELECT last_day AS day,
                             CAST(count(*) AS BIGINT) AS n_leave,
                             CAST(sum(churned) AS BIGINT) AS n_churn
                      FROM lab GROUP BY 1),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lab),
            rs AS (SELECT day, n_churn,
                          n_users - CAST(COALESCE(sum(n_leave) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS at_risk,
                          CAST(sum(n_churn) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_churn
                   FROM byday, n)
         SELECT day, at_risk, n_churn,
                (n_churn * 1000000) // at_risk AS hazard_ppm, cum_churn
         FROM rs ORDER BY day""",
    // identical half split, merged value grid, and ppm ECDF floor-div
    "q_events_ks_drift" ->
      """WITH ev AS (SELECT event_type,
                            CAST(round(value * 100) AS BIGINT) AS c,
                            CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                     FROM events),
            md AS (SELECT min(day) AS mind FROM ev),
            sides AS (SELECT event_type, c,
                             CASE WHEN day - mind < 15 THEN 'a' ELSE 'b' END AS half
                      FROM ev, md),
            grid AS (SELECT event_type, c,
                            CAST(sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
                            CAST(sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb
                     FROM sides GROUP BY 1, 2),
            tot AS (SELECT event_type,
                           CAST(sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
                           CAST(sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS tb
                    FROM sides GROUP BY 1),
            cum AS (SELECT g.event_type, ta, tb,
                           CAST(sum(na) OVER (PARTITION BY g.event_type ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
                           CAST(sum(nb) OVER (PARTITION BY g.event_type ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
                    FROM grid g JOIN tot ON g.event_type = tot.event_type)
         SELECT event_type, ta, tb,
                max(abs((ca * 1000000) // ta - (cb * 1000000) // tb)) AS ks_ppm
         FROM cum GROUP BY 1, 2, 3 ORDER BY 1""",
    // identical ×1000 double-first quantization and five-sum moments
    "q_embed_dimstats" ->
      """WITH v AS (
           SELECT CAST(i AS BIGINT) AS dim,
                  CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000) AS BIGINT) AS x
           FROM embeddings, range(64) t(i)),
           s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                        sum(CAST(x AS HUGEINT)) AS sx,
                        sum(CAST(x * x AS HUGEINT)) AS sxx,
                        min(x) AS min_x, max(x) AS max_x
                 FROM v GROUP BY 1)
         SELECT dim, n,
                round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean,
                round((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS var_pop,
                min_x, max_x
         FROM s ORDER BY dim""",
    // identical pair-count accumulation and cast-once double index
    "q_docs_simpson" ->
      """WITH cnts AS (
           SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents) GROUP BY 1, 2),
           s AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                        CAST(count(*) AS BIGINT) AS n_distinct,
                        sum(CAST(cnt * (cnt - 1) AS HUGEINT)) AS pairs
                 FROM cnts GROUP BY 1)
         SELECT source, n_tokens, n_distinct,
                round(CAST(pairs AS DOUBLE)
                      / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)),
                      6) AS simpson
         FROM s ORDER BY source""",
    // identical positive-cents filter and string-head first digit
    "q_events_benford" ->
      """WITH e AS (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            d AS (SELECT event_type,
                         CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
                  FROM e WHERE c > 0),
            tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
                    FROM d GROUP BY 1),
            g AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
                  FROM d GROUP BY 1, 2)
         SELECT g.event_type, digit, n, (n * 1000000) // n_total AS pct_ppm
         FROM g JOIN tot ON g.event_type = tot.event_type
         ORDER BY 1, 2""",
    // identical lag/lead labeling and day+1 churn attribution
    "q_events_lifecycle" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
           FROM events),
           lab AS (
             SELECT user_id, day,
                    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
                    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
             FROM act),
           daily AS (
             SELECT day,
                    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                    CAST(sum(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                    CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
             FROM lab GROUP BY 1),
           mx AS (SELECT max(day) AS maxd FROM act),
           churn AS (
             SELECT day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
             FROM lab, mx
             WHERE day < maxd AND (nxt IS NULL OR nxt > day + 1)
             GROUP BY 1)
         SELECT COALESCE(daily.day, churn.day) AS day,
                COALESCE(n_new, 0) AS n_new,
                COALESCE(n_retained, 0) AS n_retained,
                COALESCE(n_resurrected, 0) AS n_resurrected,
                COALESCE(n_churned, 0) AS n_churned
         FROM daily FULL OUTER JOIN churn ON daily.day = churn.day
         ORDER BY 1""",
    // identical floored centroids, exact dispersions, and
    // fraction-cleared margin
    "q_embed_label_margin" ->
      """WITH v AS (
           SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim,
                  CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1000) AS BIGINT) AS x
           FROM embeddings, range(64) t(i)),
           cent AS (
             SELECT label, dim,
                    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cx
             FROM v GROUP BY 1, 2),
           nv AS (SELECT CAST(label AS BIGINT) AS label,
                         CAST(count(*) AS BIGINT) AS nv
                  FROM embeddings GROUP BY 1),
           sw AS (
             SELECT v.label, sum(CAST((x - cx) * (x - cx) AS HUGEINT)) AS sw
             FROM v JOIN cent ON v.label = cent.label AND v.dim = cent.dim
             GROUP BY 1),
           d2 AS (
             SELECT a.label AS la, b.label AS lb,
                    CAST(sum((a.cx - b.cx) * (a.cx - b.cx)) AS BIGINT) AS d2
             FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
             GROUP BY 1, 2)
         SELECT la, lb, d2,
                round((CAST(d2 AS DOUBLE) * CAST(na.nv AS DOUBLE) * CAST(nb.nv AS DOUBLE))
                      / (CAST(swa.sw AS DOUBLE) * CAST(nb.nv AS DOUBLE)
                         + CAST(swb.sw AS DOUBLE) * CAST(na.nv AS DOUBLE)),
                      6) AS margin
         FROM d2 JOIN sw swa ON swa.label = la JOIN sw swb ON swb.label = lb
              JOIN nv na ON na.label = la JOIN nv nb ON nb.label = lb
         ORDER BY la, lb""",
    // identical first-day cohorting and running-sum LTV grid
    "q_events_cohort_ltv" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events),
            cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
            sized AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
                      FROM cohort GROUP BY 1),
            cells AS (SELECT cohort_day, day - cohort_day AS age,
                             CAST(sum(c) AS BIGINT) AS cents
                      FROM e JOIN cohort USING (user_id) GROUP BY 1, 2),
            cum AS (SELECT cohort_day, age, cents,
                           CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY age
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
                    FROM cells)
         SELECT cohort_day, age, cohort_size, cum_cents,
                cum_cents // cohort_size AS ltv_cents_per_user
         FROM cum JOIN sized USING (cohort_day)
         ORDER BY cohort_day, age""",
    // identical batching, 3-gram shingles, and min-batch novelty
    "q_text_novelty" ->
      """WITH toks AS (SELECT doc_id // 100 AS batch,
                              string_split(text, ' ') AS w
                       FROM documents),
            g AS (SELECT DISTINCT batch, array_to_string(w[i:i+2], ' ') AS gram
                  FROM toks, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)),
            fb AS (SELECT gram, min(batch) AS batch FROM g GROUP BY 1),
            per AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_distinct_grams
                    FROM g GROUP BY 1),
            nw AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_new_grams
                   FROM fb GROUP BY 1)
         SELECT per.batch, n_distinct_grams,
                COALESCE(n_new_grams, 0) AS n_new_grams,
                (COALESCE(n_new_grams, 0) * 1000000) // n_distinct_grams AS novelty_ppm
         FROM per LEFT JOIN nw ON per.batch = nw.batch
         ORDER BY per.batch""",
    // identical 300 s lease, close-before-open inclusive cumulatives
    "q_events_peak_concurrency" ->
      """WITH e AS (SELECT event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) AS t0
                    FROM events),
            st AS (SELECT event_type, t0 AS t, CAST(count(*) AS BIGINT) AS s_cnt
                   FROM e GROUP BY 1, 2),
            en AS (SELECT event_type, t0 + 300 AS t, CAST(count(*) AS BIGINT) AS e_cnt
                   FROM e GROUP BY 1, 2),
            grid AS (SELECT COALESCE(st.event_type, en.event_type) AS event_type,
                            COALESCE(st.t, en.t) AS t,
                            COALESCE(s_cnt, 0) AS s_cnt, COALESCE(e_cnt, 0) AS e_cnt
                     FROM st FULL OUTER JOIN en
                       ON st.event_type = en.event_type AND st.t = en.t),
            conc AS (SELECT event_type, s_cnt,
                            sum(s_cnt) OVER (PARTITION BY event_type ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            - sum(e_cnt) OVER (PARTITION BY event_type ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
                     FROM grid)
         SELECT event_type, CAST(sum(s_cnt) AS BIGINT) AS n_events,
                CAST(max(conc) AS BIGINT) AS peak
         FROM conc GROUP BY 1 ORDER BY 1""",
    // identical lag ordering (ts, event_id) and log2 bucket trick
    "q_events_interarrival_hist" ->
      """WITH g AS (
           SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT)
                  - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                      PARTITION BY event_type
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
           FROM events),
            b AS (SELECT event_type,
                         CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket
                  FROM g WHERE gap IS NOT NULL),
            tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps
                    FROM b GROUP BY 1),
            h AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
                  FROM b GROUP BY 1, 2)
         SELECT h.event_type, bucket, n, (n * 1000000) // n_gaps AS share_ppm
         FROM h JOIN tot ON h.event_type = tot.event_type
         ORDER BY 1, 2""",
    // identical distinct token sets and per-token bounded pair join
    "q_docs_source_overlap" ->
      """WITH g AS (SELECT DISTINCT source, tok FROM (
                      SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents)),
            sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_toks
                      FROM g GROUP BY 1),
            inter AS (SELECT a.source AS sa, b.source AS sb,
                             CAST(count(*) AS BIGINT) AS inter
                      FROM g a JOIN g b
                        ON a.tok = b.tok AND a.source < b.source
                      GROUP BY 1, 2)
         SELECT sa, sb, na.n_toks AS na, nb.n_toks AS nb, inter,
                (inter * 1000000) // (na.n_toks + nb.n_toks - inter) AS jaccard_ppm
         FROM inter JOIN sizes na ON na.source = sa
              JOIN sizes nb ON nb.source = sb
         ORDER BY sa, sb""",
    // identical doubled tie-average ranks and cast-once double AUC
    "q_events_mann_whitney" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                           user_id % 2 AS arm
                    FROM events),
            grid AS (SELECT event_type, c,
                            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
                     FROM e GROUP BY 1, 2),
            g2 AS (SELECT event_type, c, na, nb, na + nb AS n FROM grid),
            r AS (SELECT event_type, na, nb,
                         2 * CAST(COALESCE(sum(n) OVER (PARTITION BY event_type ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                         + n + 1 AS rank2
                  FROM g2),
            s AS (SELECT event_type, CAST(sum(na) AS BIGINT) AS n_a,
                         CAST(sum(nb) AS BIGINT) AS n_b,
                         sum(CAST(na * rank2 AS HUGEINT)) AS ranksum2
                  FROM r GROUP BY 1)
         SELECT event_type, n_a, n_b,
                round((CAST(ranksum2 AS DOUBLE)
                       - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0))
                      / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS auc
         FROM s ORDER BY 1""",
    // identical k-means assignment replay, contingency rollups, and
    // pair-count Rand arithmetic
    "q_ann_kmeans_purity" -> (kmeansCtes(8, 3) +
      """,
        |af AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
        |          FROM v JOIN c3 c ON v.i = c.i GROUP BY 1, 2))
        |  WHERE rn = 1),
        |cells AS (SELECT a.cid, CAST(e.label AS BIGINT) AS label,
        |                 CAST(count(*) AS BIGINT) AS nij
        |          FROM af a JOIN embeddings e ON e.vec_id = a.vec_id
        |          GROUP BY 1, 2),
        |base AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |                sum(CAST(nij * (nij - 1) AS HUGEINT)) AS a2
        |         FROM cells),
        |r AS (SELECT sum(CAST(ni * (ni - 1) AS HUGEINT)) AS rows2
        |      FROM (SELECT cid, CAST(sum(nij) AS BIGINT) AS ni
        |            FROM cells GROUP BY 1)),
        |cc AS (SELECT sum(CAST(nj * (nj - 1) AS HUGEINT)) AS cols2
        |       FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS nj
        |             FROM cells GROUP BY 1)),
        |p AS (SELECT CAST(sum(mx) AS BIGINT) AS pur
        |      FROM (SELECT cid, max(nij) AS mx FROM cells GROUP BY 1))
        |SELECT n AS n_vectors, (pur * 1000000) // n AS purity_ppm,
        |       round((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |              + 2.0 * CAST(a2 AS DOUBLE)
        |              - CAST(rows2 AS DOUBLE) - CAST(cols2 AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS rand_index
        |FROM base, r, cc, p""".stripMargin),
    // identical 90-day cutoff and c4/c6 integer measure units
    "q_tpch_q1" ->
      """WITH l AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(l_quantity AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
                  CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
                  CAST(round(l_tax * 100) AS BIGINT) AS tax_c
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
         SELECT l_returnflag, l_linestatus,
                CAST(sum(qty) AS BIGINT) AS sum_qty,
                CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
                sum(CAST(price_c * (100 - disc_c) AS HUGEINT)) AS sum_disc_price_c4,
                sum(CAST(price_c * (100 - disc_c) * (100 + tax_c) AS HUGEINT)) AS sum_charge_c6,
                CAST(count(*) AS BIGINT) AS count_order,
                round(CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_qty,
                round(CAST(sum(price_c) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0), 4) AS avg_price,
                round(CAST(sum(disc_c) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0), 6) AS avg_disc
         FROM l GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical tercile cuts (metric + user_id total order)
    "q_events_rfm" ->
      """WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS maxd
                     FROM events),
            u AS (SELECT user_id, max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS last_day,
                         CAST(count(*) AS BIGINT) AS f,
                         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
                  FROM events GROUP BY 1),
            seg AS (SELECT maxd - last_day AS r, f, m, user_id,
                           ntile(3) OVER (ORDER BY maxd - last_day, user_id) AS rt,
                           ntile(3) OVER (ORDER BY f DESC, user_id) AS ft,
                           ntile(3) OVER (ORDER BY m DESC, user_id) AS mt
                    FROM u, mx)
         SELECT rt * 100 + ft * 10 + mt AS segment,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(m) AS BIGINT) AS sum_cents
         FROM seg GROUP BY 1 ORDER BY 1""",
    // identical +4 epoch-day dow offset and pure integer hour math
    "q_events_calendar" ->
      """WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
            d AS (SELECT (t // 86400 + 4) % 7 AS dow,
                         (t % 86400) // 3600 AS hour
                  FROM e),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d)
         SELECT dow, hour, CAST(count(*) AS BIGINT) AS n,
                (count(*) * 1000000) // n_total AS share_ppm
         FROM d, tot GROUP BY 1, 2, n_total ORDER BY 1, 2""",
    // identical normalized fingerprint and corpus-wide dup semi-join
    "q_docs_datacard" ->
      """WITH docs AS (
           SELECT doc_id, lang, source, n_chars,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
           FROM documents),
            dupfp AS (SELECT fp FROM docs GROUP BY fp HAVING count(*) >= 2),
            flagged AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_dup_docs
                        FROM docs WHERE fp IN (SELECT fp FROM dupfp)
                        GROUP BY 1, 2),
            cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                             CAST(sum(n_chars) AS BIGINT) AS n_chars
                      FROM docs GROUP BY 1, 2)
         SELECT c.lang, c.source, n_docs, n_tokens, c.n_chars,
                COALESCE(n_dup_docs, 0) AS n_dup_docs,
                (c.n_chars * 1000000) // n_tokens AS chars_per_token_ppm,
                n_tokens // n_docs AS tokens_per_doc
         FROM cells c LEFT JOIN flagged f
           ON c.lang = f.lang AND c.source = f.source
         ORDER BY c.lang, c.source""",
    // identical one-word mask pack and week-window mask tests
    "q_events_bitmap" ->
      """WITH e AS (SELECT user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events),
            md AS (SELECT min(day) AS mind FROM e),
            m AS (SELECT user_id,
                         bit_or(1::BIGINT << CAST(day - mind AS INTEGER)) AS mask
                  FROM e, md WHERE day - mind < 63 GROUP BY 1),
            u AS (SELECT CAST(bit_count(mask) AS BIGINT) AS days_active,
                         CASE WHEN (mask & 127) <> 0 THEN 1 ELSE 0 END AS w1,
                         CASE WHEN (mask & 16256) <> 0 THEN 1 ELSE 0 END AS w2
                  FROM m)
         SELECT days_active, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(w1 * w2) AS BIGINT) AS n_both_weeks
         FROM u GROUP BY 1 ORDER BY 1""",
    // identical running-max-end sweep and 10-minute buckets
    "q_events_active_time" ->
      """WITH c AS (
           SELECT user_id, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events),
            cov AS (
              SELECT user_id,
                     greatest(0, t + 300
                       - greatest(t, COALESCE(max(t + 300) OVER (
                           PARTITION BY user_id ORDER BY t, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), t))) AS covered
              FROM c),
            pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                          CAST(sum(covered) AS BIGINT) AS active_secs
                   FROM cov GROUP BY 1)
         SELECT active_secs // 600 AS bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(active_secs) AS BIGINT) AS sum_secs,
                CAST(sum(n_events) AS BIGINT) AS sum_events
         FROM pu GROUP BY 1 ORDER BY 1""",
    // identical edge list, degree join, and five-sum correlation
    "q_graph_assortativity" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       pts AS (SELECT dx.deg AS x, dy.deg AS y
               FROM edges e JOIN deg dx ON dx.src = e.src
                    JOIN deg dy ON dy.src = e.dst),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
                    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                    sum(CAST(x * y AS HUGEINT)) AS sxy,
                    sum(CAST(x * x AS HUGEINT)) AS sxx,
                    sum(CAST(y * y AS HUGEINT)) AS syy
             FROM pts)
       SELECT n_edges,
              round((CAST(sxy AS DOUBLE) * CAST(n_edges AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(sxx AS DOUBLE) * CAST(n_edges AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(CAST(syy AS DOUBLE) * CAST(n_edges AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS assortativity
       FROM s"""),
    // identical day grain and distinct triples
    "q_agg_multi_distinct" ->
      """WITH e AS (SELECT event_type, user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                    FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(count(DISTINCT day) AS BIGINT) AS n_days,
                CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_user_days
         FROM e GROUP BY 1 ORDER BY 1""",
    // identical HUGEINT moment sums, identical event_type-ordered
    // left fold of the per-group s²/n doubles (list_reduce folds
    // x1+x2+…, Spark folds 0.0+x1+x2+… — 0.0+x1 = x1 exactly)
    "q_agg_anova" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
                           sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s_g,
                           sum(CAST(CAST(round(value * 100) AS BIGINT)
                                    * CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS ss_g
                    FROM events GROUP BY 1),
            tg AS (SELECT event_type, n_g, s_g, ss_g,
                          CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                            / CAST(n_g AS DOUBLE) AS t_g
                   FROM g),
            a AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         CAST(sum(n_g) AS BIGINT) AS n,
                         sum(s_g) AS s, sum(ss_g) AS ss,
                         list_reduce(list(t_g ORDER BY event_type),
                                     (x, y) -> x + y) AS t
                  FROM tg)
         SELECT k, n,
                round(t - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE), 6) AS ssb,
                round(CAST(ss AS DOUBLE) - t, 6) AS ssw,
                round(((t - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
                      / ((CAST(ss AS DOUBLE) - t)
                         / CAST(n - k AS DOUBLE)), 6) AS f_stat
         FROM a""",
    // identical deterministic nulling, identical backward/forward
    // IGNORE NULLS frames carrying (value, epoch), identical
    // single-formula lerp with the shared-second tie guard
    "q_window_interpolate" ->
      """WITH c AS (SELECT user_id, event_id, ts,
                           CAST(floor(epoch(ts)) AS BIGINT) AS et,
                           CASE WHEN CAST(round(value * 100) AS BIGINT) % 7 = 0
                                THEN NULL
                                ELSE CAST(round(value * 100) AS BIGINT) END AS c
                    FROM events),
            w AS (SELECT user_id, event_id, c, et,
                         last_value(c IGNORE NULLS) OVER pb AS pv,
                         last_value(CASE WHEN c IS NOT NULL THEN et END
                                    IGNORE NULLS) OVER pb AS pt,
                         first_value(c IGNORE NULLS) OVER pf AS nv,
                         first_value(CASE WHEN c IS NOT NULL THEN et END
                                     IGNORE NULLS) OVER pf AS nt
                  FROM c
                  WINDOW pb AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         pf AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, event_id, c,
                round(CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
                           WHEN pv IS NULL OR nv IS NULL THEN NULL
                           WHEN nt = pt THEN CAST(pv AS DOUBLE)
                           ELSE CAST(pv AS DOUBLE)
                                + CAST(nv - pv AS DOUBLE)
                                  * CAST(et - pt AS DOUBLE)
                                  / CAST(nt - pt AS DOUBLE) END, 6) AS filled
         FROM w ORDER BY user_id, event_id""",
    // identical stopword set, running-boundary phrase ids, integer-ppm
    // word scores, and order-free integer phrase-score sums
    "q_text_rake" ->
      """WITH raw AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS tok,
                             unnest(range(len(string_split(text, ' ')))) AS pos
                      FROM documents),
            tk AS (SELECT doc_id, pos, tok,
                          CASE WHEN tok IN ('the', 'a', 'of', 'and')
                               THEN 1 ELSE 0 END AS is_stop
                   FROM raw WHERE tok <> ''),
            ph AS (SELECT doc_id, pos, tok, is_stop,
                          sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS phrase_id
                   FROM tk),
            words AS (SELECT doc_id, phrase_id, pos, tok
                      FROM ph WHERE is_stop = 0),
            plens AS (SELECT doc_id, phrase_id,
                             CAST(count(*) AS BIGINT) AS plen
                      FROM words GROUP BY 1, 2),
            occ AS (SELECT w.doc_id, w.phrase_id, w.pos, w.tok, p.plen
                    FROM words w JOIN plens p USING (doc_id, phrase_id)),
            ws AS (SELECT tok,
                          (CAST(sum(plen) AS BIGINT) * 1000000)
                            // CAST(count(*) AS BIGINT) AS score_ppm
                   FROM occ GROUP BY 1),
            po AS (SELECT o.doc_id, o.phrase_id,
                          string_agg(o.tok, ' ' ORDER BY o.pos) AS phrase,
                          CAST(sum(s.score_ppm) AS BIGINT) AS score_ppm,
                          CAST(count(*) AS BIGINT) AS plen
                   FROM occ o JOIN ws s USING (tok)
                   GROUP BY 1, 2)
         SELECT phrase, plen, CAST(count(*) AS BIGINT) AS n_occ,
                CAST(min(score_ppm) AS BIGINT) AS score_ppm
         FROM po GROUP BY 1, 2
         HAVING count(*) >= 2 AND plen >= 2
         ORDER BY score_ppm DESC, phrase LIMIT 50""",
    // same banded simhash graph as the pagerank oracle; the three LPA
    // rounds unroll as CTEs with the identical (count desc, lbl)
    // frequency-vote tie-break
    "q_graph_label_prop" -> (lpaCte + """
       SELECT id AS doc_id, lbl AS community FROM l3 ORDER BY doc_id"""),
    // identical per-community masses from the same LPA partition;
    // identical community-ordered fold of div/div/mul/sub terms
    "q_graph_modularity" -> (lpaCte + """,
       ec AS (SELECT la.lbl AS community,
                     CAST(count(*) AS BIGINT) AS d_c,
                     CAST(sum(CASE WHEN la.lbl = lb.lbl THEN 1 ELSE 0 END)
                          AS BIGINT) AS din_c
              FROM edges e JOIN l3 la ON la.id = e.src
                           JOIN l3 lb ON lb.id = e.dst
              GROUP BY 1),
       tot AS (SELECT CAST(sum(d_c) AS BIGINT) AS m2 FROM ec),
       q AS (SELECT CAST(count(*) AS BIGINT) AS n_linked,
                    CAST(min(m2) AS BIGINT) AS m_directed,
                    list_reduce(list(
                      CAST(din_c AS DOUBLE) / CAST(m2 AS DOUBLE)
                      - (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
                        * (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
                      ORDER BY community), (x, y) -> x + y) AS qsum
             FROM ec, tot),
       nc AS (SELECT CAST(count(DISTINCT lbl) AS BIGINT) AS n_communities
              FROM l3)
       SELECT n_communities, n_linked, m_directed,
              round(qsum, 6) AS modularity
       FROM q, nc"""),
    // identical HUGEINT prefix/grand moments on the identical unique
    // order, identical single-formula split cost, earliest-index
    // argmin tie-break
    "q_events_changepoint" ->
      """WITH e AS (SELECT event_type, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            p AS (SELECT event_type, ts, event_id,
                         CAST(count(*) OVER r AS BIGINT) AS i,
                         sum(CAST(x AS HUGEINT)) OVER r AS si,
                         sum(CAST(x * x AS HUGEINT)) OVER r AS qi,
                         CAST(count(*) OVER a AS BIGINT) AS n,
                         sum(CAST(x AS HUGEINT)) OVER a AS s,
                         sum(CAST(x * x AS HUGEINT)) OVER a AS q
                  FROM e
                  WINDOW r AS (PARTITION BY event_type ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         a AS (PARTITION BY event_type
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)),
            c AS (SELECT event_type, n, i, si, s,
                         (CAST(qi AS DOUBLE)
                          - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                            / CAST(i AS DOUBLE))
                         + (CAST(q - qi AS DOUBLE)
                            - CAST(s - si AS DOUBLE) * CAST(s - si AS DOUBLE)
                              / CAST(n - i AS DOUBLE)) AS cost
                  FROM p WHERE i < n),
            b AS (SELECT *, row_number() OVER (PARTITION BY event_type
                              ORDER BY cost, i) AS rn
                  FROM c)
         SELECT event_type, n, i AS split_i, round(cost, 4) AS cost,
                round(CAST(si AS DOUBLE) / CAST(i AS DOUBLE), 4) AS mean_left_c,
                round(CAST(s - si AS DOUBLE) / CAST(n - i AS DOUBLE), 4)
                  AS mean_right_c
         FROM b WHERE rn = 1 ORDER BY event_type""",
    // identical empty-token filter, ×100 fixed-point mean word length,
    // ppm alpha share, 4-term stopword evidence, and rule thresholds
    "q_docs_gopher_rules" ->
      """WITH d AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       w -> w <> '') AS l
                    FROM documents),
            m AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_words
                  FROM d WHERE len(l) > 0),
            f AS (SELECT doc_id, n_words,
                         (CAST(list_reduce(list_prepend(0,
                            list_transform(l, w -> length(w))),
                            (a, b) -> a + b) AS BIGINT) * 100) // n_words
                           AS mwl_c,
                         (CAST(len(list_filter(l,
                            w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
                          * 1000000) // n_words AS alpha_ppm,
                         CAST(CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END
                            + CASE WHEN list_contains(l, 'a') THEN 1 ELSE 0 END
                            + CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END
                            + CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END
                            AS BIGINT) AS n_stop
                  FROM m)
         SELECT doc_id, n_words, mwl_c, alpha_ppm, n_stop,
                CAST(CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1 ELSE 0 END
                     AS INTEGER) AS f_words,
                CAST(CASE WHEN mwl_c BETWEEN 300 AND 1000 THEN 1 ELSE 0 END
                     AS INTEGER) AS f_mwl,
                CAST(CASE WHEN alpha_ppm >= 800000 THEN 1 ELSE 0 END
                     AS INTEGER) AS f_alpha,
                CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END
                     AS INTEGER) AS f_stop,
                CAST(CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1 ELSE 0 END
                     * CASE WHEN mwl_c BETWEEN 300 AND 1000 THEN 1 ELSE 0 END
                     * CASE WHEN alpha_ppm >= 800000 THEN 1 ELSE 0 END
                     * CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END
                     AS INTEGER) AS pass
         FROM f ORDER BY doc_id""",
    // identical per-source (n_chars desc, doc_id) rank, boustrophedon
    // deal, and ppm imbalance window
    "q_pack_binpack" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
                           row_number() OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id) - 1 AS rk
                    FROM documents),
            b AS (SELECT source, n_chars,
                         CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8
                              ELSE 7 - (rk % 8) END AS bin
                  FROM r),
            g AS (SELECT source, CAST(bin AS BIGINT) AS bin,
                         CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_chars) AS BIGINT) AS bin_bytes
                  FROM b GROUP BY 1, 2)
         SELECT source, bin, n_docs, bin_bytes,
                ((max(bin_bytes) OVER (PARTITION BY source)
                  - min(bin_bytes) OVER (PARTITION BY source)) * 1000000)
                  // max(bin_bytes) OVER (PARTITION BY source) AS imbalance_ppm
         FROM g ORDER BY source, bin""",
    // identical md5-low-bits dim, bit-5 sign, and signed occurrence sum
    "q_text_feature_hash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents WHERE doc_id < 2000),
            h AS (SELECT doc_id,
                         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT
                              AS BIGINT) AS h
                  FROM toks WHERE tok <> ''),
            s AS (SELECT doc_id, h % 32 AS dim,
                         CASE WHEN (h // 32) % 2 = 0 THEN 1 ELSE -1 END AS sign
                  FROM h)
         SELECT doc_id, CAST(dim AS BIGINT) AS dim,
                CAST(sum(sign) AS BIGINT) AS weight
         FROM s GROUP BY 1, 2 HAVING sum(sign) <> 0
         ORDER BY doc_id, dim""",
    // identical running sum/max on the unique order; final_c is the
    // order-free total (≡ last cumulative by construction)
    "q_window_drawdown" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            w1 AS (SELECT user_id, ts, event_id, x,
                          sum(x) OVER r AS cum
                   FROM e
                   WINDOW r AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            w AS (SELECT user_id, x, cum,
                         max(cum) OVER r2 AS peak
                  FROM w1
                  WINDOW r2 AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(max(peak - cum) AS BIGINT) AS max_drawdown_c,
                CAST(max(peak) AS BIGINT) AS peak_c,
                CAST(sum(x) AS BIGINT) AS final_c
         FROM w GROUP BY 1 ORDER BY 1""",
    // identical day grain, 7-day censoring horizon, descending risk
    // frame, and ascending-t product fold of the same exact-ratio
    // doubles
    "q_events_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
                           min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS birth,
                           max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS death
                    FROM events GROUP BY 1),
            h AS (SELECT max(death) AS d_max FROM u),
            lv AS (SELECT (death - birth) AS t,
                          CASE WHEN death > d_max - 7 THEN 1 ELSE 0 END AS cens
                   FROM u, h),
            bt AS (SELECT t, CAST(sum(1 - cens) AS BIGINT) AS d,
                          CAST(sum(cens) AS BIGINT) AS c
                   FROM lv GROUP BY 1),
            nr AS (SELECT t, d, c,
                          CAST(sum(d + c) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS n_risk
                   FROM bt),
            f AS (SELECT t, n_risk, d, c,
                         CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                           AS factor
                  FROM nr),
            sv AS (SELECT t, n_risk, d, c,
                          list(factor) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS fs
                   FROM f)
         SELECT t, n_risk, d, c,
                round(list_reduce(fs, (a, b) -> a * b), 6) AS survival
         FROM sv ORDER BY t""",
    // identical φ²-sum fold in (lang, source) order, identical margins
    // and min(R−1, C−1) normalization
    "q_agg_cramers_v" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                        FROM documents GROUP BY 1, 2),
            m AS (SELECT lang, source, o,
                         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
                         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS c
                  FROM cells),
            a AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
                         CAST(count(DISTINCT lang) AS BIGINT) AS n_rows,
                         CAST(count(DISTINCT source) AS BIGINT) AS n_cols,
                         CAST(sum(o) AS BIGINT) AS n,
                         list_reduce(list(
                           CAST(o AS DOUBLE) * CAST(o AS DOUBLE)
                             / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                           ORDER BY lang, source), (x, y) -> x + y) AS phi_sum
                  FROM m)
         SELECT n_cells, n_rows, n_cols, n,
                round(CAST(n AS DOUBLE) * (phi_sum - 1.0), 6) AS chi2,
                round(sqrt((phi_sum - 1.0)
                      / CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE)), 6)
                  AS cramers_v
         FROM a""",
    // identical md5 group hash, fold modulus, and ppm share
    "q_sample_group_kfold" ->
      """WITH e AS (SELECT user_id, value,
                           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                 1, 8))::UBIGINT AS BIGINT) % 5 AS fold
                    FROM events),
            g AS (SELECT fold,
                         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                         CAST(count(*) AS BIGINT) AS n_events,
                         CAST(sum(CAST(round(value * 100) AS BIGINT))
                              AS BIGINT) AS sum_c
                  FROM e GROUP BY 1)
         SELECT fold, n_users, n_events, sum_c,
                (n_events * 1000000) // (sum(n_events) OVER ()) AS share_ppm
         FROM g ORDER BY fold""",
    // same recursive-CTE components as the q_dedup_resolve oracle,
    // then the identical (n_chars desc, doc_id) representative pick
    "q_dedup_best_survivor" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       ),
       comp AS (SELECT id AS doc_id, min(lbl) AS component
                FROM reach GROUP BY id),
       j AS (SELECT c.component, d.doc_id, d.n_chars,
                    row_number() OVER (PARTITION BY c.component
                      ORDER BY d.n_chars DESC, d.doc_id) AS rn
             FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
       SELECT component, CAST(count(*) AS BIGINT) AS n_members,
              CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
                AS keep_doc_id,
              CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                AS kept_chars,
              CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
                AS dropped_chars
       FROM j GROUP BY 1 ORDER BY 1"""),
    // identical cleared-denominator zone tests on the trailing-20
    // frame, identical short consecutive counters and warm-up guard
    "q_events_spc_rules" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            b AS (SELECT user_id, ts, event_id, x,
                         CAST(count(*) OVER f AS BIGINT) AS n,
                         CAST(sum(x) OVER f AS BIGINT) AS sf,
                         CAST(sum(x * x) OVER f AS BIGINT) AS ssf
                  FROM e
                  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
            z AS (SELECT user_id, ts, event_id,
                         CASE WHEN n >= 10 AND (n*x - sf)*(n*x - sf)
                                   > 9*(n*ssf - sf*sf) THEN 1 ELSE 0 END AS r1,
                         CASE WHEN n >= 10 AND (n*x - sf)*(n*x - sf)
                                   > 4*(n*ssf - sf*sf) AND n*x - sf > 0
                              THEN 1 ELSE 0 END AS b2p,
                         CASE WHEN n >= 10 AND (n*x - sf)*(n*x - sf)
                                   > 4*(n*ssf - sf*sf) AND n*x - sf < 0
                              THEN 1 ELSE 0 END AS b2n,
                         CASE WHEN n >= 10 AND (n*x - sf)*(n*x - sf)
                                   > 1*(n*ssf - sf*sf) AND n*x - sf > 0
                              THEN 1 ELSE 0 END AS b1p,
                         CASE WHEN n >= 10 AND (n*x - sf)*(n*x - sf)
                                   > 1*(n*ssf - sf*sf) AND n*x - sf < 0
                              THEN 1 ELSE 0 END AS b1n,
                         CASE WHEN n >= 10 AND n*x - sf > 0
                              THEN 1 ELSE 0 END AS sp,
                         CASE WHEN n >= 10 AND n*x - sf < 0
                              THEN 1 ELSE 0 END AS sn
                  FROM b),
            r AS (SELECT user_id, r1,
                         CASE WHEN sum(b2p) OVER t3 >= 2
                                OR sum(b2n) OVER t3 >= 2
                              THEN 1 ELSE 0 END AS r2,
                         CASE WHEN sum(b1p) OVER t5 >= 4
                                OR sum(b1n) OVER t5 >= 4
                              THEN 1 ELSE 0 END AS r3,
                         CASE WHEN sum(sp) OVER t8 = 8
                                OR sum(sn) OVER t8 = 8
                              THEN 1 ELSE 0 END AS r4
                  FROM z
                  WINDOW t3 AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                         t5 AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                         t8 AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(r1) AS BIGINT) AS n_rule1,
                CAST(sum(r2) AS BIGINT) AS n_rule2,
                CAST(sum(r3) AS BIGINT) AS n_rule3,
                CAST(sum(r4) AS BIGINT) AS n_rule4
         FROM r GROUP BY 1 ORDER BY 1""",
    // identical df cap, integer-log2 idf weights, and exact ppm
    // weighted-Jaccard score
    "q_dedup_jaccard_idf" ->
      """WITH toks0 AS (SELECT DISTINCT doc_id,
                               unnest(string_split(text, ' ')) AS tok
                        FROM documents WHERE doc_id < 1000),
            dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                    FROM toks0 GROUP BY 1),
            nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                   FROM documents WHERE doc_id < 1000),
            w AS (SELECT tok, CAST(length(bin(nd // df)) AS BIGINT) AS w
                  FROM dft, nd WHERE df <= 600),
            toks AS (SELECT t.doc_id, t.tok, w.w
                     FROM toks0 t JOIN w USING (tok)),
            wsum AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS ws
                     FROM toks GROUP BY 1),
            inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                             CAST(sum(a.w) AS BIGINT) AS iw
                      FROM toks a JOIN toks b
                        ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
         SELECT ia, ib, iw,
                (iw * 1000000) // (sa.ws + sb.ws - iw) AS jw_ppm
         FROM inter JOIN wsum sa ON ia = sa.doc_id
                    JOIN wsum sb ON ib = sb.doc_id
         WHERE (iw * 1000000) // (sa.ws + sb.ws - iw) >= 900000
         ORDER BY ia, ib""",
    // identical split-centered regressor, HUGEINT conditional five
    // sums, cast-once doubles, unrounded slope feeding each level,
    // and the + 0.0 −0.0 guard
    "q_events_its" ->
      """WITH e AS (SELECT event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            sp AS (SELECT (min(day) + max(day) + 1) // 2 AS split FROM e),
            d AS (SELECT event_type, x, day - split AS d FROM e, sp),
            g AS (SELECT event_type,
                         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
                         CAST(sum(CASE WHEN d >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
                         sum(CAST(CASE WHEN d < 0 THEN d ELSE 0 END AS HUGEINT)) AS sd0,
                         sum(CAST(CASE WHEN d < 0 THEN x ELSE 0 END AS HUGEINT)) AS sx0,
                         sum(CAST(CASE WHEN d < 0 THEN d * x ELSE 0 END AS HUGEINT)) AS sdx0,
                         sum(CAST(CASE WHEN d < 0 THEN d * d ELSE 0 END AS HUGEINT)) AS sdd0,
                         sum(CAST(CASE WHEN d >= 0 THEN d ELSE 0 END AS HUGEINT)) AS sd1,
                         sum(CAST(CASE WHEN d >= 0 THEN x ELSE 0 END AS HUGEINT)) AS sx1,
                         sum(CAST(CASE WHEN d >= 0 THEN d * x ELSE 0 END AS HUGEINT)) AS sdx1,
                         sum(CAST(CASE WHEN d >= 0 THEN d * d ELSE 0 END AS HUGEINT)) AS sdd1
                  FROM d GROUP BY 1),
            c AS (SELECT event_type, n_pre, n_post,
                         CAST(n_pre AS DOUBLE) AS nd0, CAST(n_post AS DOUBLE) AS nd1,
                         CAST(sd0 AS DOUBLE) AS dsd0, CAST(sx0 AS DOUBLE) AS dsx0,
                         CAST(sdx0 AS DOUBLE) AS dsdx0, CAST(sdd0 AS DOUBLE) AS dsdd0,
                         CAST(sd1 AS DOUBLE) AS dsd1, CAST(sx1 AS DOUBLE) AS dsx1,
                         CAST(sdx1 AS DOUBLE) AS dsdx1, CAST(sdd1 AS DOUBLE) AS dsdd1
                  FROM g WHERE n_pre >= 2 AND n_post >= 2),
            s AS (SELECT *,
                         (dsdx0 * nd0 - dsd0 * dsx0)
                           / (dsdd0 * nd0 - dsd0 * dsd0) AS sl0,
                         (dsdx1 * nd1 - dsd1 * dsx1)
                           / (dsdd1 * nd1 - dsd1 * dsd1) AS sl1
                  FROM c)
         SELECT event_type, n_pre, n_post,
                round(sl0, 6) + 0.0 AS pre_slope,
                round(sl1, 6) + 0.0 AS post_slope,
                round((dsx0 - sl0 * dsd0) / nd0, 4) + 0.0 AS pre_level,
                round((dsx1 - sl1 * dsd1) / nd1, 4) + 0.0 AS post_level,
                round(sl1 - sl0, 6) + 0.0 AS slope_change,
                round((dsx1 - sl1 * dsd1) / nd1
                      - (dsx0 - sl0 * dsd0) / nd0, 4) + 0.0 AS level_change
         FROM s ORDER BY event_type""",
    // identical parity cohort, midpoint split, HUGEINT cell sums, and
    // one mirrored DiD formula
    "q_events_did" ->
      """WITH e AS (SELECT user_id % 2 AS treat,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            sp AS (SELECT (min(day) + max(day) + 1) // 2 AS split FROM e),
            p AS (SELECT treat, x,
                         CASE WHEN day >= split THEN 1 ELSE 0 END AS post
                  FROM e, sp),
            g AS (SELECT
                    CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
                    CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
                    CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
                    CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
                    sum(CAST(CASE WHEN treat = 1 AND post = 0 THEN x ELSE 0 END AS HUGEINT)) AS s_t0,
                    sum(CAST(CASE WHEN treat = 1 AND post = 1 THEN x ELSE 0 END AS HUGEINT)) AS s_t1,
                    sum(CAST(CASE WHEN treat = 0 AND post = 0 THEN x ELSE 0 END AS HUGEINT)) AS s_c0,
                    sum(CAST(CASE WHEN treat = 0 AND post = 1 THEN x ELSE 0 END AS HUGEINT)) AS s_c1
                  FROM p),
            m AS (SELECT n_t0, n_t1, n_c0, n_c1,
                         CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) AS m_t0,
                         CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) AS m_t1,
                         CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) AS m_c0,
                         CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) AS m_c1
                  FROM g)
         SELECT n_t0, n_t1, n_c0, n_c1,
                round(m_t0, 4) + 0.0 AS mean_t_pre,
                round(m_t1, 4) + 0.0 AS mean_t_post,
                round(m_c0, 4) + 0.0 AS mean_c_pre,
                round(m_c1, 4) + 0.0 AS mean_c_post,
                round((m_t1 - m_t0) - (m_c1 - m_c0), 4) + 0.0 AS did
         FROM m""",
    // identical user-grain cohort counts and collapsed df=1 statistic
    "q_sample_srm" ->
      """WITH c AS (SELECT
                      CAST(count(DISTINCT CASE WHEN user_id % 2 = 0
                           THEN user_id END) AS BIGINT) AS n_a,
                      CAST(count(DISTINCT CASE WHEN user_id % 2 = 1
                           THEN user_id END) AS BIGINT) AS n_b
                    FROM events)
         SELECT n_a, n_b,
                round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                      / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
                CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE) > 3.841
                     THEN 1 ELSE 0 END AS INTEGER) AS srm
         FROM c""",
    // identical √(N·ΣX²−(ΣX)²) per-stratum terms, event_type-ordered
    // denominator fold, and floor allocation
    "q_sample_neyman" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
                           sum(CAST(CAST(round(value * 100) AS BIGINT)
                               AS HUGEINT)) AS s_h,
                           sum(CAST(CAST(round(value * 100) AS BIGINT)
                               * CAST(round(value * 100) AS BIGINT)
                               AS HUGEINT)) AS ss_h
                    FROM events GROUP BY 1),
            tm AS (SELECT event_type, n_h,
                          sqrt(CAST(n_h AS DOUBLE) * CAST(ss_h AS DOUBLE)
                               - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE))
                            AS term
                   FROM g),
            tot AS (SELECT list_reduce(list(term ORDER BY event_type),
                             (x, y) -> x + y) AS total
                    FROM tm)
         SELECT event_type, n_h,
                round(term / CAST(n_h AS DOUBLE), 6) AS sd_c,
                CAST(floor(1000.0 * term / total) AS BIGINT) AS alloc
         FROM tm, tot ORDER BY event_type""",
    // identical (source, word) count grain and one mirrored K formula
    "q_text_yule_k" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            m AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS m
                  FROM toks WHERE tok <> '' GROUP BY 1, 2),
            g AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
                         CAST(count(*) AS BIGINT) AS n_types,
                         sum(CAST(m * m AS HUGEINT)) AS s2
                  FROM m GROUP BY 1)
         SELECT source, n_tokens, n_types,
                round(10000.0 * (CAST(s2 AS DOUBLE) - CAST(n_tokens AS DOUBLE))
                      / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                      6) AS yule_k
         FROM g ORDER BY source""",
    // identical 4-event PAA chunks (integer sums), per-user quartile
    // ntile on the (csum, chunk) total order, chunk-ordered assembly
    "q_window_sax" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            r AS (SELECT user_id, x,
                         CAST(row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) - 1 AS BIGINT) // 4 AS chunk
                  FROM e),
            c AS (SELECT user_id, chunk, CAST(sum(x) AS BIGINT) AS csum,
                         count(*) AS cn
                  FROM r GROUP BY 1, 2),
            t AS (SELECT user_id, chunk,
                         ntile(4) OVER (PARTITION BY user_id
                           ORDER BY csum, chunk) AS tile
                  FROM c WHERE cn = 4)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_chunks,
                string_agg(chr(CAST(96 + tile AS INTEGER)), ''
                           ORDER BY chunk) AS sax
         FROM t GROUP BY 1 ORDER BY 1""",
    // identical pooled variance from HUGEINT moment sums and one
    // mirrored 2.8·σ·√(2/n̄) formula
    "q_events_mde" ->
      """WITH e AS (SELECT user_id % 2 AS treat,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            g AS (SELECT
                    CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                    CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                    sum(CAST(CASE WHEN treat = 0 THEN x ELSE 0 END AS HUGEINT)) AS s_a,
                    sum(CAST(CASE WHEN treat = 1 THEN x ELSE 0 END AS HUGEINT)) AS s_b,
                    sum(CAST(CASE WHEN treat = 0 THEN x * x ELSE 0 END AS HUGEINT)) AS ss_a,
                    sum(CAST(CASE WHEN treat = 1 THEN x * x ELSE 0 END AS HUGEINT)) AS ss_b
                  FROM e),
            d AS (SELECT n_a, n_b,
                         CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
                         CAST(s_a AS DOUBLE) AS dsa, CAST(s_b AS DOUBLE) AS dsb,
                         CAST(ss_a AS DOUBLE) AS dssa, CAST(ss_b AS DOUBLE) AS dssb
                  FROM g),
            v AS (SELECT n_a, n_b, na, nb,
                         ((dssa - dsa * dsa / na) + (dssb - dsb * dsb / nb))
                           / (na + nb - 2.0) AS var_pooled
                  FROM d)
         SELECT n_a, n_b,
                round(sqrt(var_pooled), 4) + 0.0 AS sd_pooled_c,
                round(2.8 * sqrt(var_pooled)
                      * sqrt(2.0 / (2.0 * na * nb / (na + nb))), 4) + 0.0
                  AS mde_c
         FROM v""",
    // identical dimension path and per-order fact rollup
    "q_feature_wide" ->
      """WITH lf AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
                            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                              AS sum_qty,
                            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                                 AS BIGINT) AS sum_price_c,
                            CAST(max(CAST(round(l_discount * 100) AS BIGINT))
                                 AS BIGINT) AS max_disc_c
                     FROM lineitem GROUP BY 1)
         SELECT o.o_orderkey, c.c_mktsegment,
                n.n_name AS nation, r.r_name AS region,
                CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_total_c,
                lf.n_items, lf.sum_qty, lf.sum_price_c, lf.max_disc_c
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         JOIN lf ON o.o_orderkey = lf.l_orderkey
         ORDER BY o.o_orderkey""",
    // the q_ann_ivf_multiprobe routing CTEs composed with the
    // q_ann_adc code/LUT CTEs — candidates restricted to the probed
    // lists, scored by the identical ADC lookup sum
    "q_ann_ivfadc" -> (kmeansCtes(8, 3) +
      """,
         |af AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c3 c ON v.i = c.i GROUP BY 1, 2))
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS qid, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM (SELECT v.vec_id, c.cid, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
         |          FROM v JOIN c3 c ON v.i = c.i WHERE v.vec_id < 10 GROUP BY 1, 2))
         |  WHERE rn <= 2),
         |e AS (SELECT vec_id,
         |             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ev
         |      FROM embeddings),
         |subs AS (SELECT vec_id, m AS sub, ev[m*16+1 : m*16+16] AS sv
         |         FROM e, (SELECT unnest(range(4)) AS m) t),
         |cb AS (SELECT vec_id AS code, sub, sv AS cv FROM subs WHERE vec_id < 8),
         |d AS (SELECT s.vec_id, s.sub, cb.code,
         |             list_reduce(list_transform(list_zip(s.sv, cb.cv),
         |                                        p -> (p[1] - p[2]) * (p[1] - p[2])),
         |                         (x, y) -> x + y) AS d2
         |      FROM subs s JOIN cb ON s.sub = cb.sub),
         |codes AS (SELECT vec_id, sub, code FROM (
         |            SELECT vec_id, sub, code,
         |                   row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
         |            FROM d) WHERE rn = 1),
         |lut AS (SELECT s.vec_id AS qid, s.sub, cb.code,
         |               list_reduce(list_transform(list_zip(s.sv, cb.cv),
         |                                          p -> (p[1] - p[2]) * (p[1] - p[2])),
         |                           (x, y) -> x + y) AS lut_d2
         |        FROM subs s JOIN cb ON s.sub = cb.sub
         |        WHERE s.vec_id < 10),
         |cand AS (SELECT p.qid, a.vec_id
         |         FROM probes p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.qid),
         |scored AS (SELECT x.qid, x.vec_id, CAST(sum(l.lut_d2) AS BIGINT) AS adc_d2
         |           FROM cand x
         |           JOIN codes c ON c.vec_id = x.vec_id
         |           JOIN lut l ON l.qid = x.qid AND l.sub = c.sub AND l.code = c.code
         |           GROUP BY 1, 2),
         |ranked AS (SELECT qid, vec_id, adc_d2,
         |                  row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vec_id) AS rank
         |           FROM scored)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id AS nb, adc_d2
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin),
    // identical row-conditional transition matrix, uniform start, and
    // three src-ordered π←πP folds
    "q_events_markov_stationary" ->
      ("""WITH e AS (SELECT user_id, event_type, ts, event_id,
                            lead(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dst
                     FROM events),
             tr AS (SELECT event_type AS src, dst,
                           CAST(count(*) AS BIGINT) AS n
                    FROM e WHERE dst IS NOT NULL GROUP BY 1, 2),
             p AS (SELECT src, dst,
                          CAST(n AS DOUBLE)
                            / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
                   FROM tr),
             kk AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS k FROM tr),
             pi0 AS (SELECT DISTINCT src AS etype,
                            1.0 / CAST(k AS DOUBLE) AS pi
                     FROM tr, kk)""" +
        (1 to 3).map { r =>
          s""",
             pi$r AS (SELECT p.dst AS etype,
                             list_reduce(list(prev.pi * p.p ORDER BY p.src),
                                         (x, y) -> x + y) AS pi
                      FROM p JOIN pi${r - 1} prev ON prev.etype = p.src
                      GROUP BY p.dst)"""
        }.mkString + """
          SELECT etype AS event_type, round(pi, 6) + 0.0 AS pi
          FROM pi3 ORDER BY 1"""),
    // identical day grain, unique endpoint ranks, and bar fold
    "q_window_ohlc" ->
      """WITH e AS (SELECT user_id, ts, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                           CAST(round(value * 100) AS BIGINT) AS x
                    FROM events),
            r AS (SELECT user_id, day, x,
                         row_number() OVER (PARTITION BY user_id, day
                           ORDER BY ts, event_id) AS ra,
                         row_number() OVER (PARTITION BY user_id, day
                           ORDER BY ts DESC, event_id DESC) AS rd
                  FROM e)
         SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_ticks,
                CAST(min(CASE WHEN ra = 1 THEN x END) AS BIGINT) AS open_c,
                CAST(max(x) AS BIGINT) AS high_c,
                CAST(min(x) AS BIGINT) AS low_c,
                CAST(min(CASE WHEN rd = 1 THEN x END) AS BIGINT) AS close_c
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical signed projections (md5 bit), HUGEINT Z sums, exact
    // 5th-of-9 median pick, and one mirrored relative-error ratio
    "q_sketch_ams" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                  FROM toks WHERE tok <> '' GROUP BY 1),
            f2 AS (SELECT sum(CAST(c * c AS HUGEINT)) AS f2 FROM c),
            reps AS (SELECT r.r,
                            sum(CAST((CASE WHEN
                                 CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR)
                                      || ':' || tok), 1, 8))::UBIGINT
                                      AS BIGINT) % 2 = 0
                                 THEN 1 ELSE -1 END) * c AS HUGEINT)) AS z
                     FROM c, (SELECT unnest(range(9)) AS r) r
                     GROUP BY 1),
            z2 AS (SELECT r, z * z AS z2 FROM reps),
            med AS (SELECT z2 AS ams_f2 FROM (
                      SELECT z2, row_number() OVER (ORDER BY z2, r) AS rn
                      FROM z2) WHERE rn = 5)
         SELECT f2.f2 AS f2_exact, med.ams_f2,
                round(abs(CAST(med.ams_f2 AS DOUBLE) - CAST(f2.f2 AS DOUBLE))
                      / CAST(f2.f2 AS DOUBLE), 6) AS rel_err
         FROM med, f2""",
    // identical 32-bit md5-prefix hashes, 64th-smallest pick, and
    // integer (K-1)*2^32 // h_K estimate with the exact-below-K fallback
    "q_sketch_kmv" ->
      """WITH ls AS (SELECT source, string_split(text, ' ') AS l FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
            toks AS (SELECT DISTINCT source, tok FROM (
                       SELECT source, unnest(list_transform(generate_series(1, len(l) - 2),
                         i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tok
                       FROM ls)),
            h AS (SELECT source, tok,
                         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h
                  FROM toks),
            exact AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                             CAST(count(DISTINCT h) AS BIGINT) AS n_hashes
                      FROM h GROUP BY 1),
            hs AS (SELECT DISTINCT source, h FROM h),
            kth AS (SELECT source, h AS hk FROM (
                      SELECT source, h,
                             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                      FROM hs) WHERE rn = 64)
         SELECT e.source, e.n_tokens, e.n_hashes,
                CAST(CASE WHEN k.hk IS NULL THEN e.n_hashes
                          ELSE (63 * 4294967296) // k.hk END AS BIGINT) AS est_distinct,
                CAST((abs((CASE WHEN k.hk IS NULL THEN e.n_hashes
                                ELSE (63 * 4294967296) // k.hk END) - e.n_hashes)
                      * 1000000) // e.n_hashes AS BIGINT) AS err_ppm
         FROM exact e LEFT JOIN kth k USING (source) ORDER BY e.source""",
    // identical integer squared-L2, top-5 pick, and (votes, sum_d2,
    // label) vote tie-break
    "q_ann_knn_classify" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            d AS (SELECT q.vec_id AS qid, q.label AS true_label,
                         c.label, c.vec_id,
                         list_reduce(list_transform(list_zip(q.v, c.v),
                           p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                  FROM e q JOIN e c ON q.vec_id % 10 = 0 AND c.vec_id % 10 <> 0),
            nn AS (SELECT * FROM (
                     SELECT qid, true_label, label, d2,
                            row_number() OVER (PARTITION BY qid
                              ORDER BY d2, vec_id) AS rn
                     FROM d) WHERE rn <= 5),
            votes AS (SELECT qid, true_label, label,
                             CAST(count(*) AS BIGINT) AS votes,
                             CAST(sum(d2) AS BIGINT) AS sum_d2
                      FROM nn GROUP BY 1, 2, 3)
         SELECT qid, true_label, label AS pred_label,
                CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS BIGINT) AS hit
         FROM (SELECT *, row_number() OVER (PARTITION BY qid
                 ORDER BY votes DESC, sum_d2, label) AS vr FROM votes)
         WHERE vr = 1 ORDER BY qid""",
    // identical 20-row frame and cross-multiplied integer breach test
    "q_window_bollinger" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT event_type, event_id, c,
                         CAST(count(*) OVER fr AS BIGINT) AS n,
                         CAST(sum(c) OVER fr AS BIGINT) AS sx,
                         CAST(sum(c * c) OVER fr AS BIGINT) AS sx2
                  FROM e WINDOW fr AS (PARTITION BY event_type
                    ORDER BY ts_s, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         SELECT event_type, event_id, n,
                CAST(CASE WHEN n = 20 AND (n * c - sx) * (n * c - sx)
                               > 4 * (n * sx2 - sx * sx)
                          THEN CASE WHEN n * c - sx > 0 THEN 1 ELSE -1 END
                          ELSE 0 END AS BIGINT) AS breach
         FROM w ORDER BY event_type, event_id""",
    // identical transition counts and floor(log2) integer surprisal
    "q_events_entropy_rate" ->
      """WITH trans AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n_sd FROM (
                          SELECT event_type AS src,
                                 lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS dst
                          FROM events) WHERE dst IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT src, CAST(sum(n_sd) AS BIGINT) AS n_s,
                           CAST(count(*) AS BIGINT) AS n_dst
                    FROM trans GROUP BY 1)
         SELECT t.src, o.n_s, o.n_dst,
                CAST(sum(t.n_sd * (length(bin(o.n_s // t.n_sd)) - 1)) AS BIGINT) AS sum_bits,
                CAST((sum(t.n_sd * (length(bin(o.n_s // t.n_sd)) - 1)) * 1000000) // o.n_s AS BIGINT) AS cond_bits_ppm
         FROM trans t JOIN tot o USING (src)
         GROUP BY 1, 2, 3 ORDER BY 1""",
    // identical 7-row centered trend and pmod-shifted floor divisions
    "q_events_stl" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            tr AS (SELECT event_type, day, c,
                          CAST(sum(c) OVER fr // count(*) OVER fr AS BIGINT) AS trend,
                          day % 7 AS dow
                   FROM daily WINDOW fr AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
            se AS (SELECT event_type, dow,
                          CAST(((sum(c - trend) + count(*) * 1000000000)
                                - ((sum(c - trend) + count(*) * 1000000000)
                                   % count(*)))
                               // count(*) - 1000000000 AS BIGINT) AS seasonal
                   FROM tr GROUP BY 1, 2)
         SELECT t.event_type, t.day, t.c, t.trend, s.seasonal,
                CAST(t.c - t.trend - s.seasonal AS BIGINT) AS remainder
         FROM tr t JOIN se s ON t.event_type = s.event_type AND t.dow = s.dow
         ORDER BY 1, 2""",
    // identical lag fan-out, five HUGEINT-exact sums, one double r
    "q_events_crosscorr" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
                             l.lag, a.c AS x, b.c AS y
                      FROM daily a
                      JOIN (SELECT unnest(range(-3, 4)) AS lag) l ON true
                      JOIN daily b ON a.event_type < b.event_type
                        AND a.day = b.day + l.lag),
            s AS (SELECT ta, tb, lag, CAST(count(*) AS BIGINT) AS n,
                         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                         sum(CAST(x * y AS HUGEINT)) AS sxy,
                         sum(CAST(x * x AS HUGEINT)) AS sxx,
                         sum(CAST(y * y AS HUGEINT)) AS syy
                  FROM pairs GROUP BY 1, 2, 3)
         SELECT ta, tb, CAST(lag AS BIGINT) AS lag, n,
                round((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (sqrt(CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * sqrt(CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
         FROM s WHERE n >= 3 AND sxx * n > sx * sx AND syy * n > sy * sy
         ORDER BY 1, 2, 3""",
    // identical gain/loss split, 14-row sums, and neutral-flat pin
    "q_window_rsi" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            d AS (SELECT event_type, event_id, ts_s,
                         coalesce(c - lag(c, 1) OVER (PARTITION BY event_type
                           ORDER BY ts_s, event_id), 0) AS delta
                  FROM e),
            w AS (SELECT event_type, event_id,
                         CAST(sum(greatest(delta, 0)) OVER fr AS BIGINT) AS sg,
                         CAST(sum(greatest(-delta, 0)) OVER fr AS BIGINT) AS sl,
                         CAST(count(*) OVER fr AS BIGINT) AS n
                  FROM d WINDOW fr AS (PARTITION BY event_type
                    ORDER BY ts_s, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT event_type, event_id, n,
                CAST(CASE WHEN sg + sl = 0 THEN 500000
                          ELSE (sg * 1000000) // (sg + sl) END AS BIGINT) AS rsi_ppm
         FROM w ORDER BY event_type, event_id""",
    // identical adjacent-pair edges and the same 3 unrolled integer
    // pagerank rounds as q_graph_pagerank (shared CTE generator)
    "q_text_textrank" -> ("""
       WITH ls AS (SELECT string_split(text, ' ') AS l FROM documents
                   WHERE len(string_split(text, ' ')) >= 2),
       adj0 AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM ls),
       adj AS (SELECT p[1] AS a, p[2] AS b FROM adj0
               WHERE length(p[1]) >= 4 AND length(p[2]) >= 4 AND p[1] <> p[2]),
       edges AS (SELECT DISTINCT src, dst FROM (
                   SELECT a AS src, b AS dst FROM adj
                   UNION ALL SELECT b AS src, a AS dst FROM adj)),
       nodes AS (SELECT DISTINCT src AS id FROM edges),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
    """ + pagerankRoundsSql(3) + """
       SELECT CAST(rank AS BIGINT) AS rank, id AS keyword, pr FROM (
         SELECT id, pr, row_number() OVER (ORDER BY pr DESC, id) AS rank
         FROM r3)
       WHERE rank <= 20 ORDER BY rank"""),
    // identical pairwise slopes (IEEE division) and lower-median pick
    "q_agg_theilsen" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            sl AS (SELECT a.event_type, a.day AS di, b.day AS dj,
                          CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
                   FROM daily a JOIN daily b
                     ON a.event_type = b.event_type AND a.day < b.day),
            r AS (SELECT event_type, slope,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY slope, di, dj) AS rn,
                         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
                  FROM sl)
         SELECT event_type, np AS n_pairs, round(slope, 6) AS median_slope
         FROM r WHERE rn = (np + 1) // 2 ORDER BY event_type""",
    // identical daily bars, true-range max, and 14-bar integer mean
    "q_window_atr" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            r AS (SELECT *, row_number() OVER (PARTITION BY event_type, day
                    ORDER BY ts_s DESC, event_id DESC) AS rd FROM e),
            bars AS (SELECT event_type, day,
                            CAST(max(c) AS BIGINT) AS high,
                            CAST(min(c) AS BIGINT) AS low,
                            CAST(min(CASE WHEN rd = 1 THEN c END) AS BIGINT) AS close
                     FROM r GROUP BY 1, 2),
            tr AS (SELECT event_type, day, high, low, close,
                          CAST(CASE WHEN pc IS NULL THEN high - low
                               ELSE greatest(high - low, abs(high - pc),
                                             abs(low - pc)) END AS BIGINT) AS tr
                   FROM (SELECT *, lag(close, 1) OVER (PARTITION BY event_type
                           ORDER BY day) AS pc FROM bars))
         SELECT event_type, day, high, low, close, tr,
                CAST(sum(tr) OVER fr // count(*) OVER fr AS BIGINT) AS atr
         FROM tr WINDOW fr AS (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
         ORDER BY event_type, day""",
    // identical integer S statistic and one double tau division
    "q_events_mann_kendall" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2)
         SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN b.c > a.c THEN 1
                              WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
                round(CAST(sum(CASE WHEN b.c > a.c THEN 1
                                    WHEN b.c < a.c THEN -1 ELSE 0 END) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 6) AS tau
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND a.day < b.day
         GROUP BY 1 ORDER BY 1""",
    // identical directed edges and 2 unrolled integer HITS rounds with
    // max-normalization (shared CTE generator pins the round count)
    "q_graph_hits" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS x FROM nodes),
    """ + hitsRoundsSql(2) + """
       SELECT n.id AS doc_id, h.x AS hub, a.x AS auth
       FROM nodes n JOIN a2 a ON a.id = n.id JOIN h2 h ON h.id = n.id
       ORDER BY doc_id"""),
    // identical Walsh-average pairs and lower-middle pick
    "q_agg_hodges_lehmann" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            walsh AS (SELECT a.event_type, a.day AS di, b.day AS dj,
                             CAST(a.c + b.c AS BIGINT) AS ws
                      FROM daily a JOIN daily b
                        ON a.event_type = b.event_type AND a.day <= b.day),
            r AS (SELECT event_type, ws,
                         row_number() OVER (PARTITION BY event_type
                           ORDER BY ws, di, dj) AS rn,
                         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
                  FROM walsh)
         SELECT event_type, np AS n_walsh, CAST(ws * 50 AS BIGINT) AS hl_c100
         FROM r WHERE rn = (np + 1) // 2 ORDER BY event_type""",
    // identical exact counts and closed-form z=2 interval
    "q_events_wilson_ci" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 5000
                                         THEN 1 ELSE 0 END) AS BIGINT) AS s
                    FROM events GROUP BY 1)
         SELECT event_type, n, s,
                CAST((s * 1000000) // n AS BIGINT) AS rate_ppm,
                round((CAST(s AS DOUBLE) + 2.0
                       - 2.0 * sqrt(CAST(s AS DOUBLE) * CAST(n - s AS DOUBLE)
                                    / CAST(n AS DOUBLE) + 1.0))
                      / (CAST(n AS DOUBLE) + 4.0), 6) + 0.0 AS wilson_lo,
                round((CAST(s AS DOUBLE) + 2.0
                       + 2.0 * sqrt(CAST(s AS DOUBLE) * CAST(n - s AS DOUBLE)
                                    / CAST(n AS DOUBLE) + 1.0))
                      / (CAST(n AS DOUBLE) + 4.0), 6) + 0.0 AS wilson_hi
         FROM g ORDER BY event_type""",
    // identical two-level lattice walk and suppression rollup
    "q_privacy_generalize" ->
      """WITH rows_ AS (SELECT lang, n_chars // 100 AS b0, n_chars // 500 AS b1
                        FROM documents),
            lvl0 AS (SELECT lang, b0, CAST(count(*) AS BIGINT) AS n
                     FROM rows_ GROUP BY 1, 2 HAVING count(*) >= 5),
            rest AS (SELECT r.lang, r.b0, r.b1 FROM rows_ r
                     LEFT JOIN lvl0 g ON r.lang = g.lang AND r.b0 = g.b0
                     WHERE g.lang IS NULL),
            lvl1 AS (SELECT lang, b1, CAST(count(*) AS BIGINT) AS n
                     FROM rest GROUP BY 1, 2 HAVING count(*) >= 5),
            supp AS (SELECT r.lang, CAST(count(*) AS BIGINT) AS n FROM rest r
                     LEFT JOIN lvl1 g ON r.lang = g.lang AND r.b1 = g.b1
                     WHERE g.lang IS NULL GROUP BY 1)
         SELECT * FROM (
           SELECT CAST(0 AS BIGINT) AS level, lang, CAST(b0 AS VARCHAR) AS bucket, n
           FROM lvl0
           UNION ALL
           SELECT CAST(1 AS BIGINT), lang, CAST(b1 AS VARCHAR), n FROM lvl1
           UNION ALL
           SELECT CAST(2 AS BIGINT), lang, '*', n FROM supp)
         ORDER BY level, lang, bucket""",
    // identical doubled midranks, exact group sums, and sorted fold
    "q_events_kruskal_wallis" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            bv AS (SELECT c, CAST(count(*) AS BIGINT) AS ct FROM e GROUP BY 1),
            rk AS (SELECT c, ct,
                          CAST(coalesce(sum(ct) OVER (ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS below
                   FROM bv),
            r2 AS (SELECT c AS vc, 2 * (below + 1) + ct - 1 AS r2 FROM rk),
            grp AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_i,
                           CAST(sum(r2.r2) AS BIGINT) AS sum_r2
                    FROM e JOIN r2 ON e.c = r2.vc GROUP BY 1),
            tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n_tot FROM grp),
            st AS (SELECT t.n_tot, CAST(count(*) AS BIGINT) AS n_groups,
                          list_reduce(list(CAST(sum_r2 AS DOUBLE) * CAST(sum_r2 AS DOUBLE)
                                           / (4.0 * CAST(n_i AS DOUBLE))
                                           ORDER BY event_type),
                                      (x, y) -> x + y) AS st
                   FROM grp, tot t GROUP BY 1)
         SELECT n_tot, n_groups,
                round(3.0 * st / (CAST(n_tot AS DOUBLE) * CAST(n_tot + 1 AS DOUBLE))
                      - 3.0 * CAST(n_tot + 1 AS DOUBLE), 6) + 0.0 AS h_stat
         FROM st""",
    // identical 5×16 signed cells, probes, and 3rd-of-5 median pick
    "q_sketch_countsketch" ->
      """WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
                      SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
                    WHERE tok <> '' GROUP BY 1),
            fan AS (SELECT tok, c, r.r,
                           CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || tok),
                                 1, 8))::UBIGINT AS BIGINT) AS h
                    FROM c, (SELECT unnest(range(5)) AS r) r),
            cells AS (SELECT r, h % 16 AS b,
                             CAST(sum((CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END)
                                      * c) AS BIGINT) AS cell
                      FROM fan GROUP BY 1, 2),
            top AS (SELECT tok, c FROM (
                      SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rn
                      FROM c) WHERE rn <= 20),
            probes AS (SELECT f.tok, f.c, f.r,
                              (CASE WHEN (f.h // 16) % 2 = 0 THEN 1 ELSE -1 END)
                                * s.cell AS est
                       FROM fan f JOIN top t ON f.tok = t.tok
                            JOIN cells s ON s.r = f.r AND s.b = f.h % 16)
         SELECT tok, c AS c_exact, CAST(est AS BIGINT) AS cs_est,
                CAST(est - c AS BIGINT) AS err
         FROM (SELECT *, row_number() OVER (PARTITION BY tok
                 ORDER BY est, r) AS mrn FROM probes)
         WHERE mrn = 3 ORDER BY c_exact DESC, tok""",
    // identical sign-safe floored centroids and per-dim distance join
    "q_embed_rocchio" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            tr AS (SELECT label, d.pos, d.x FROM e,
                     (SELECT unnest(generate_series(1, 64)) AS pos) p,
                     LATERAL (SELECT p.pos AS pos, v[p.pos] AS x) d
                   WHERE vec_id % 10 <> 0),
            cents AS (SELECT label AS clabel, pos AS cpos,
                             CAST((sum(x) - (((sum(x) % count(*)) + count(*)) % count(*)))
                                  // count(*) AS BIGINT) AS m
                      FROM tr GROUP BY 1, 2),
            te AS (SELECT vec_id AS qid, label AS true_label, d.pos, d.x FROM e,
                     (SELECT unnest(generate_series(1, 64)) AS pos) p,
                     LATERAL (SELECT p.pos AS pos, v[p.pos] AS x) d
                   WHERE vec_id % 10 = 0),
            d2 AS (SELECT qid, true_label, clabel,
                          CAST(sum((x - m) * (x - m)) AS BIGINT) AS d2
                   FROM te JOIN cents ON te.pos = cents.cpos
                   GROUP BY 1, 2, 3),
            pred AS (SELECT qid, true_label, clabel AS pred_label FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY d2, clabel) AS rn FROM d2) WHERE rn = 1)
         SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical two-sample marks and integer LP estimate
    "q_sketch_capture_recapture" ->
      """WITH srcs AS (SELECT source, row_number() OVER (ORDER BY source) AS srn
                       FROM (SELECT DISTINCT source FROM documents)),
            toks AS (SELECT DISTINCT s.srn, tok FROM documents d
                     JOIN srcs s ON d.source = s.source AND s.srn <= 2,
                     unnest(list_distinct(string_split(d.text, ' '))) AS u(tok)
                     WHERE tok <> ''),
            marks AS (SELECT tok,
                             CAST(max(CASE WHEN srn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in1,
                             CAST(max(CASE WHEN srn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS in2
                      FROM toks GROUP BY 1),
            agg AS (SELECT CAST(sum(in1) AS BIGINT) AS n1,
                           CAST(sum(in2) AS BIGINT) AS n2,
                           CAST(sum(in1 * in2) AS BIGINT) AS m,
                           CAST(count(*) AS BIGINT) AS n_union
                    FROM marks)
         SELECT n1, n2, m, n_union,
                CAST((n1 * n2) // m AS BIGINT) AS lp_estimate,
                CAST(((n1 * n2) // m - n_union) * 1000000 // n_union AS BIGINT) AS bias_ppm
         FROM agg WHERE m > 0""",
    // identical paired 2×2 cells and one double chi-square ratio
    "q_eval_mcnemar" ->
      """WITH r AS (SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS ra,
                           CASE WHEN len(string_split(text, ' ')) >= 40
                                THEN 1 ELSE 0 END AS rb
                    FROM documents),
            agg AS (SELECT CAST(sum(ra * rb) AS BIGINT) AS both_pass,
                           CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
                           CAST(sum((1 - ra) * rb) AS BIGINT) AS c,
                           CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS both_fail
                    FROM r)
         SELECT both_pass, b, c, both_fail,
                round(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                      / CAST(b + c AS DOUBLE), 6) + 0.0 AS chi2
         FROM agg WHERE b + c > 0""",
    // identical strata, matched weights, and one double ATT division
    "q_events_psm_bucket" ->
      """WITH u AS (SELECT user_id,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS outcome_c,
                           CAST(count(*) AS BIGINT) AS n_ev
                    FROM events GROUP BY 1),
            uu AS (SELECT user_id, outcome_c, user_id % 2 AS treat,
                          n_ev // 10 AS bucket FROM u),
            st AS (SELECT bucket,
                          CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                          CAST(sum(CASE WHEN treat = 1 THEN outcome_c END) AS BIGINT) AS sum_t,
                          CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                          CAST(sum(CASE WHEN treat = 0 THEN outcome_c END) AS BIGINT) AS sum_c
                   FROM uu GROUP BY 1),
            m AS (SELECT bucket, least(n_t, n_c) AS w,
                         (sum_t * 100) // n_t - (sum_c * 100) // n_c AS diff_c100
                  FROM st WHERE n_t > 0 AND n_c > 0)
         SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(sum(w) AS BIGINT) AS n_matched,
                round(CAST(sum(w * diff_c100) AS DOUBLE)
                      / CAST(sum(w) AS DOUBLE) / 100.0, 6) + 0.0 AS att
         FROM m""",
    // identical bounded sorted frame and lower-index quantile picks
    "q_window_rolling_quantiles" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT event_type, event_id,
                         list(c) OVER (PARTITION BY event_type
                           ORDER BY ts_s, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
                  FROM e)
         SELECT event_type, event_id, CAST(len(l) AS BIGINT) AS n,
                CAST(list_sort(l)[CAST((len(l) - 1) // 10 + 1 AS INT)] AS BIGINT) AS p10_c,
                CAST(list_sort(l)[CAST((9 * (len(l) - 1)) // 10 + 1 AS INT)] AS BIGINT) AS p90_c
         FROM w ORDER BY event_type, event_id""",
    // identical seeded md5 neighbor picks, 3 unrolled steps
    "q_graph_walk" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       w0 AS (SELECT id AS wid, id AS p0 FROM nodes),
       s1 AS (SELECT wid, dst, row_number() OVER (PARTITION BY wid
                ORDER BY md5(CAST(p0 AS VARCHAR) || ':1:' || CAST(dst AS VARCHAR)), dst) AS rn
              FROM w0 JOIN edges ON p0 = src),
       w1 AS (SELECT w0.wid, w0.p0, coalesce(s.dst, w0.p0) AS p1
              FROM w0 LEFT JOIN (SELECT wid, dst FROM s1 WHERE rn = 1) s USING (wid)),
       s2 AS (SELECT wid, dst, row_number() OVER (PARTITION BY wid
                ORDER BY md5(CAST(p1 AS VARCHAR) || ':2:' || CAST(dst AS VARCHAR)), dst) AS rn
              FROM w1 JOIN edges ON p1 = src),
       w2 AS (SELECT w1.wid, w1.p1, coalesce(s.dst, w1.p1) AS p2
              FROM w1 LEFT JOIN (SELECT wid, dst FROM s2 WHERE rn = 1) s USING (wid)),
       s3 AS (SELECT wid, dst, row_number() OVER (PARTITION BY wid
                ORDER BY md5(CAST(p2 AS VARCHAR) || ':3:' || CAST(dst AS VARCHAR)), dst) AS rn
              FROM w2 JOIN edges ON p2 = src),
       w3 AS (SELECT w2.wid, w2.p2, coalesce(s.dst, w2.p2) AS p3
              FROM w2 LEFT JOIN (SELECT wid, dst FROM s3 WHERE rn = 1) s USING (wid))
       SELECT w1.wid AS doc_id, w1.p1, w2.p2, w3.p3
       FROM w1 JOIN w2 ON w1.wid = w2.wid JOIN w3 ON w1.wid = w3.wid
       ORDER BY doc_id"""),
    // identical banded candidates with the threshold cut REMOVED
    "q_dedup_hamming_hist" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       )
       SELECT ham, CAST(count(*) AS BIGINT) AS n_pairs
       FROM pairs GROUP BY 1 ORDER BY 1"""),
    // identical five HUGEINT-exact sums and token-for-token mirrored
    // delta-method double formula
    "q_events_ratio_delta" ->
      """WITH u AS (SELECT event_type, user_id,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x,
                           CAST(count(*) AS BIGINT) AS y
                    FROM events GROUP BY 1, 2),
            g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                         sum(CAST(x * x AS HUGEINT)) AS sxx,
                         sum(CAST(x * y AS HUGEINT)) AS sxy,
                         sum(CAST(y * y AS HUGEINT)) AS syy
                  FROM u GROUP BY 1)
         SELECT event_type, n,
                round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE), 6) + 0.0 AS ratio_c,
                round(sqrt(greatest(0.0,
                  ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                     * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
                     * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                  / (CAST(n AS DOUBLE) - 1.0)
                  / (CAST(n AS DOUBLE)
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))), 6) + 0.0 AS se_c
         FROM g ORDER BY event_type""",
    // identical two-half bit packing, XOR-popcount top-5, exact top-5
    "q_embed_hamming_knn" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            bits AS (SELECT vec_id, v,
                            CAST(coalesce(sum(CASE WHEN v[p.pos] > 0
                                 THEN (1::BIGINT << (p.pos - 1)) ELSE 0 END), 0)
                                 AS BIGINT) AS b0,
                            CAST(coalesce(sum(CASE WHEN v[p.pos + 32] > 0
                                 THEN (1::BIGINT << (p.pos - 1)) ELSE 0 END), 0)
                                 AS BIGINT) AS b1
                     FROM e, (SELECT unnest(generate_series(1, 32)) AS pos) p
                     GROUP BY 1, 2),
            cand AS (SELECT q.vec_id AS qid, c.vec_id AS nb,
                            CAST(bit_count(xor(q.b0, c.b0))
                                 + bit_count(xor(q.b1, c.b1)) AS BIGINT) AS ham,
                            list_reduce(list_transform(list_zip(q.v, c.v),
                              p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS d2
                     FROM bits q JOIN bits c
                       ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
            th AS (SELECT qid, nb FROM (
                     SELECT qid, nb, row_number() OVER (PARTITION BY qid
                       ORDER BY ham, nb) AS rn FROM cand) WHERE rn <= 5),
            te AS (SELECT qid, nb FROM (
                     SELECT qid, nb, row_number() OVER (PARTITION BY qid
                       ORDER BY d2, nb) AS rn FROM cand) WHERE rn <= 5)
         SELECT th.qid, CAST(count(*) AS BIGINT) AS n_overlap,
                CAST((count(*) * 1000000) // 5 AS BIGINT) AS recall_ppm
         FROM th JOIN te ON th.qid = te.qid AND th.nb = te.nb
         GROUP BY 1 ORDER BY 1""",
    // identical union bottom-k sample and both Jaccard ratios
    "q_sketch_bottomk_jaccard" ->
      """WITH srcs AS (SELECT source, row_number() OVER (ORDER BY source) AS srn
                       FROM (SELECT DISTINCT source FROM documents)),
            ls AS (SELECT s.srn, string_split(d.text, ' ') AS l FROM documents d
                   JOIN srcs s ON d.source = s.source AND s.srn <= 2
                   WHERE len(string_split(d.text, ' ')) >= 3),
            toks AS (SELECT DISTINCT srn, tok FROM (
                       SELECT srn, unnest(list_transform(generate_series(1, len(l) - 2),
                         i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tok
                       FROM ls)),
            marks AS (SELECT tok,
                             CAST(max(CASE WHEN srn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in1,
                             CAST(max(CASE WHEN srn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS in2,
                             CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT AS BIGINT) AS h
                      FROM toks GROUP BY 1),
            exact AS (SELECT CAST(sum(in1 * in2) AS BIGINT) AS m,
                             CAST(count(*) AS BIGINT) AS u FROM marks),
            bk AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
                          CAST(sum(in1 * in2) AS BIGINT) AS k_both
                   FROM (SELECT *, row_number() OVER (ORDER BY h, tok) AS rn
                         FROM marks) WHERE rn <= 128)
         SELECT k_used, k_both,
                CAST((k_both * 1000000) // k_used AS BIGINT) AS est_jac_ppm,
                CAST((m * 1000000) // u AS BIGINT) AS exact_jac_ppm,
                CAST(abs((k_both * 1000000) // k_used
                         - (m * 1000000) // u) AS BIGINT) AS err_ppm
         FROM bk, exact""",
    // identical seeded teleport and 3 unrolled integer rounds
    "q_graph_ppr" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id,
                        CAST(CASE WHEN doc_id % 100 = 0 THEN 1 ELSE 0 END AS BIGINT) AS seed
                 FROM documents WHERE doc_id < 1000),
       deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       r0 AS (SELECT id, CAST(seed * 1000000 AS BIGINT) AS pr FROM nodes),
    """ + pprRoundsSql(3) + """
       SELECT id AS doc_id, pr FROM r3 WHERE pr > 0 ORDER BY doc_id"""),
    // identical dyadic time weights via the same outer-reference fold
    "q_window_time_decay" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events WHERE user_id < 20),
            w AS (SELECT user_id, event_id, ts_s,
                         list(struct_pack(ts_s := ts_s, c := c)) OVER (
                           PARTITION BY user_id ORDER BY ts_s, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fr
                  FROM e)
         SELECT user_id, event_id, CAST(len(fr) AS BIGINT) AS n_frame,
                CAST(list_reduce(list_transform(fr,
                       s -> s.c * (1::BIGINT << CAST(20 - least(20, (ts_s - s.ts_s) // 86400) AS INT))),
                       (a, x) -> a + x) * 100
                     // list_reduce(list_transform(fr,
                       s -> (1::BIGINT << CAST(20 - least(20, (ts_s - s.ts_s) // 86400) AS INT))),
                       (a, x) -> a + x) AS BIGINT) AS decayed_c100
         FROM w ORDER BY user_id, event_id""",
    // identical 32 one-bit minima, agreement estimate, and exact
    // candidate-pair jaccard
    "q_dedup_minhash_bbit" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       tk AS (SELECT CAST(doc_id AS BIGINT) AS did,
                     unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents WHERE doc_id < 1000),
       mins AS (SELECT did, r.r,
                       CAST(min(('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || tok), 1, 8))::UBIGINT)
                            AS BIGINT) AS mh
                FROM tk, (SELECT unnest(range(32)) AS r) r GROUP BY 1, 2),
       sg AS (SELECT did, CAST(sum((mh & 1) << r) AS BIGINT) AS sig
              FROM mins GROUP BY 1),
       est AS (SELECT p.ia, p.ib,
                      greatest(0, ((2 * (32 - bit_count(xor(a.sig, b.sig))) - 32)
                                   * 1000000) // 32) AS est_ppm
               FROM pairs p JOIN sg a ON p.ia = a.did JOIN sg b ON p.ib = b.did),
       sizes AS (SELECT did, CAST(count(*) AS BIGINT) AS sz FROM tk GROUP BY 1),
       inter AS (SELECT p.ia, p.ib, CAST(count(*) AS BIGINT) AS inter
                 FROM pairs p JOIN tk a ON p.ia = a.did
                      JOIN tk b ON p.ib = b.did AND a.tok = b.tok
                 GROUP BY 1, 2)
       SELECT e.ia, e.ib, CAST(e.est_ppm AS BIGINT) AS est_ppm,
              CAST((coalesce(i.inter, 0) * 1000000)
                   // (sa.sz + sb.sz - coalesce(i.inter, 0)) AS BIGINT) AS exact_ppm,
              CAST(abs(e.est_ppm - (coalesce(i.inter, 0) * 1000000)
                       // (sa.sz + sb.sz - coalesce(i.inter, 0))) AS BIGINT) AS err_ppm
       FROM est e LEFT JOIN inter i ON e.ia = i.ia AND e.ib = i.ib
            JOIN sizes sa ON e.ia = sa.did JOIN sizes sb ON e.ib = sb.did
       ORDER BY e.ia, e.ib"""),
    // identical strata, sorted double folds, and crude-OR contrast
    "q_events_cmh" ->
      """WITH u AS (SELECT user_id % 2 AS treat,
                           CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                              THEN 1 ELSE 0 END) * 5 >= count(*)
                                THEN 1 ELSE 0 END AS BIGINT) AS conv,
                           count(*) // 10 AS bucket
                    FROM events GROUP BY user_id),
            st AS (SELECT bucket,
                          CAST(sum(CASE WHEN treat = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                          CAST(sum(CASE WHEN treat = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                          CAST(sum(CASE WHEN treat = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                          CAST(sum(CASE WHEN treat = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
                   FROM u GROUP BY 1),
            g AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
                         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
                         CAST(sum(c) AS BIGINT) AS sc, CAST(sum(d) AS BIGINT) AS sd,
                         list_reduce(list(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                                          / CAST(a + b + c + d AS DOUBLE)
                                          ORDER BY bucket), (x, y) -> x + y) AS num,
                         list_reduce(list(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                                          / CAST(a + b + c + d AS DOUBLE)
                                          ORDER BY bucket), (x, y) -> x + y) AS den
                  FROM st)
         SELECT n_strata, round(num / den, 6) + 0.0 AS or_mh,
                round((CAST(sa AS DOUBLE) * CAST(sd AS DOUBLE))
                      / (CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE)), 6) + 0.0 AS or_crude
         FROM g WHERE den > 0.0 AND sb * sc > 0""",
    // identical seeded dyadic draws (per-salt md5) and guarded ratio
    "q_privacy_dp_mean" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(least(n_chars, 1000)) AS BIGINT) AS sum_clamped
                    FROM documents GROUP BY 1),
            h AS (SELECT source, n, sum_clamped,
                         CAST(('0x' || substr(md5(source || ':sum'), 1, 5))::UBIGINT AS BIGINT) AS hs,
                         CAST(('0x' || substr(md5(source || ':n'), 1, 5))::UBIGINT AS BIGINT) AS hn
                  FROM c),
            m AS (SELECT source, n, sum_clamped,
                         CAST((CASE WHEN hs % 2 = 1
                               THEN length(bin(524288 // ((hs // 2) + 1))) - 1
                               ELSE -(length(bin(524288 // ((hs // 2) + 1))) - 1)
                               END) * 1000 AS BIGINT) AS noise_sum,
                         CAST(CASE WHEN hn % 2 = 1
                              THEN length(bin(524288 // ((hn // 2) + 1))) - 1
                              ELSE -(length(bin(524288 // ((hn // 2) + 1))) - 1)
                              END AS BIGINT) AS noise_n
                  FROM h)
         SELECT source, n, sum_clamped, noise_sum, noise_n,
                CAST((greatest(0, sum_clamped + noise_sum) * 100)
                     // greatest(1, n + noise_n) AS BIGINT) AS dp_mean_c100
         FROM m ORDER BY source""",
    // identical user grain, global ratio, and mirrored shrink formula
    "q_events_eb_shrinkage" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN event_type = 'purchase'
                                         THEN 1 ELSE 0 END) AS BIGINT) AS s
                    FROM events GROUP BY 1),
            g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
                         CAST(sum(s) AS BIGINT) AS gs FROM u)
         SELECT user_id, n, s,
                CAST((s * 1000000) // n AS BIGINT) AS raw_ppm,
                round((CAST(s AS DOUBLE) + 100.0
                       * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
                      / (CAST(n AS DOUBLE) + 100.0), 6) + 0.0 AS shrunk_rate
         FROM u, g ORDER BY user_id""",
    // identical strict-neighbor maxima and prominence
    "q_events_peak_detect" ->
      """WITH daily AS (SELECT event_type,
                               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            n AS (SELECT event_type, day, c,
                         lag(c, 1) OVER w AS pc, lead(c, 1) OVER w AS nc
                  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
         SELECT event_type, day, c,
                CAST(c - greatest(pc, nc) AS BIGINT) AS prominence
         FROM n WHERE pc IS NOT NULL AND nc IS NOT NULL AND c > pc AND c > nc
         ORDER BY event_type, day""",
    // identical daily top-3 pick and day+1 overlap join
    "q_events_topk_churn" ->
      """WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                               user_id, CAST(count(*) AS BIGINT) AS c
                        FROM events GROUP BY 1, 2),
            top AS (SELECT day, user_id FROM (
                      SELECT day, user_id, row_number() OVER (PARTITION BY day
                        ORDER BY c DESC, user_id) AS rn FROM daily) WHERE rn <= 3),
            com AS (SELECT t.day, CAST(count(*) AS BIGINT) AS n_common
                    FROM top t JOIN top p
                      ON t.day = p.day + 1 AND t.user_id = p.user_id
                    GROUP BY 1),
            days AS (SELECT DISTINCT day FROM top),
            md AS (SELECT min(day) AS min_day FROM top)
         SELECT d.day, coalesce(c.n_common, 0) AS n_common,
                CAST(3 - coalesce(c.n_common, 0) AS BIGINT) AS churn
         FROM days d LEFT JOIN com c ON d.day = c.day, md
         WHERE d.day > md.min_day ORDER BY d.day""",
    // identical first-3 fold and top-10 total order
    "q_events_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn
                    FROM events),
            p AS (SELECT user_id,
                         concat_ws('>',
                           min(CASE WHEN rn = 1 THEN event_type END),
                           min(CASE WHEN rn = 2 THEN event_type END),
                           min(CASE WHEN rn = 3 THEN event_type END)) AS path
                  FROM r WHERE rn <= 3 GROUP BY 1),
            c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1)
         SELECT CAST(rank AS BIGINT) AS rank, path, n FROM (
           SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rank
           FROM c) WHERE rank <= 10 ORDER BY rank""",
    // the same recursive-CTE components, weighted instead of filtered
    "q_dedup_soft_weights" -> (simhashCte(" WHERE doc_id < 1000")
      .replaceFirst("WITH ", "WITH RECURSIVE ") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       nodes AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS id
                 FROM documents WHERE doc_id < 1000),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       ),
       comp AS (SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id),
       sz AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
              FROM comp GROUP BY 1)
       SELECT c.doc_id, c.component, s.csize,
              CAST(1000000 // s.csize AS BIGINT) AS weight_ppm
       FROM comp c JOIN sz s USING (component) ORDER BY c.doc_id"""),
    // the bloom-free plain semi join: hash equality proves the bloom
    // prefilter dropped no true member
    "q_join_bloom_prefilter" ->
      """SELECT l.l_returnflag, count(*) AS n,
                CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem l
         WHERE l.l_suppkey IN (SELECT s_suppkey FROM supplier
                               WHERE s_nationkey % 5 = 0)
         GROUP BY 1 ORDER BY 1""",
    "q_eval_auc" ->
      """WITH d AS (
           SELECT (label % 2)::BIGINT AS y,
                  (label % 2)::BIGINT * 400
                    + CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000 AS score
           FROM embeddings),
         byscore AS (
           SELECT score, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS pos
           FROM d GROUP BY 1),
         ranked AS (
           SELECT *, COALESCE(CAST(sum(cnt) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_below
           FROM byscore),
         a AS (
           SELECT CAST(sum(pos) AS BIGINT) AS npos,
                  CAST(sum(cnt - pos) AS BIGINT) AS nneg,
                  CAST(sum(pos * (2 * cum_below + cnt + 1)) AS BIGINT) AS r2
           FROM ranked)
         SELECT npos, nneg,
                (r2 - npos * (npos + 1)) * 1000000 // (2 * npos * nneg) AS auc_ppm
         FROM a""",
    "q_eval_ece" ->
      """WITH d AS (
           SELECT CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000000 AS p_ppm,
                  CAST(('0x' || substr(md5('y' || CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000000 AS draw
           FROM embeddings),
         b AS (
           SELECT p_ppm // 100000 AS bin,
                  CASE WHEN draw < p_ppm THEN 1 ELSE 0 END AS y, p_ppm
           FROM d),
         g AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS n_hit,
                  CAST(sum(p_ppm) AS BIGINT) AS sum_p
           FROM b GROUP BY 1)
         SELECT bin, n,
                n_hit * 1000000 // n AS acc_ppm,
                sum_p // n AS conf_ppm,
                abs(n_hit * 1000000 // n - sum_p // n) AS gap_ppm
         FROM g ORDER BY bin""",
    "q_eval_gains" ->
      """WITH d AS (
           SELECT vec_id, (label % 2)::BIGINT AS y,
                  (label % 2)::BIGINT * 400
                    + CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000 AS score
           FROM embeddings),
         dd AS (
           SELECT *, ntile(10) OVER (ORDER BY score DESC, vec_id) AS decile FROM d),
         g AS (
           SELECT decile, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS npos
           FROM dd GROUP BY 1),
         c AS (
           SELECT *, CAST(sum(npos) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
           FROM g),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS tot_n,
                        CAST(sum(y) AS BIGINT) AS tot_pos FROM d)
         SELECT CAST(decile AS BIGINT) AS decile, n, npos,
                cum_pos * 1000000 // tot_pos AS capture_ppm,
                npos * tot_n * 1000000 // (n * tot_pos) AS lift_ppm
         FROM c, tot ORDER BY decile""",
    "q_eval_threshold" ->
      """WITH d AS (
           SELECT (label % 2)::BIGINT AS y,
                  (label % 2)::BIGINT * 400
                    + CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000 AS score
           FROM embeddings),
         f AS (SELECT d.*, t.thr FROM d, (SELECT unnest([250, 700, 1050]) AS thr) t),
         g AS (
           SELECT thr,
                  CAST(sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(sum(CASE WHEN score >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                  CAST(sum(CASE WHEN score < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM f GROUP BY 1)
         SELECT CAST(thr AS BIGINT) AS thr, tp, fp, fn,
                tp * 1000000 // (tp + fp) AS prec_ppm,
                tp * 1000000 // (tp + fn) AS rec_ppm,
                2 * (tp * 1000000 // (tp + fp)) * (tp * 1000000 // (tp + fn))
                  // ((tp * 1000000 // (tp + fp)) + (tp * 1000000 // (tp + fn))) AS f1_ppm
         FROM g ORDER BY thr""",
    "q_eval_map" ->
      """WITH d AS (
           SELECT vec_id, CAST(vec_id % 20 AS BIGINT) AS qid,
                  (label % 2)::BIGINT AS y,
                  (label % 2)::BIGINT * 400
                    + CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000 AS score
           FROM embeddings),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn,
                  CAST(sum(y) OVER (PARTITION BY qid ORDER BY score DESC, vec_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
           FROM d),
         g AS (
           SELECT qid, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos,
                  CAST(sum(CASE WHEN y = 1 THEN cum_pos * 1000000 // rn ELSE 0 END) AS BIGINT) AS sum_prec
           FROM r GROUP BY 1)
         SELECT qid, n, npos, sum_prec // npos AS ap_ppm
         FROM g WHERE npos > 0 ORDER BY qid""",
    "q_eval_ndcg" ->
      """WITH d AS (
           SELECT vec_id, CAST(vec_id % 20 AS BIGINT) AS qid,
                  (label % 4)::BIGINT AS rel,
                  CAST((1 << (label % 4)) - 1 AS BIGINT) AS gain,
                  (label % 4)::BIGINT * 250
                    + CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000 AS score
           FROM embeddings),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY gain DESC, vec_id) AS BIGINT) AS rn_ideal
           FROM d),
         g AS (
           SELECT qid,
                  CAST(sum(CASE WHEN rn <= 10 THEN gain * list_extract(
                    [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065], CAST(rn AS INT))
                    ELSE 0 END) AS BIGINT) AS dcg_micro,
                  CAST(sum(CASE WHEN rn_ideal <= 10 THEN gain * list_extract(
                    [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065], CAST(rn_ideal AS INT))
                    ELSE 0 END) AS BIGINT) AS idcg_micro
           FROM r GROUP BY 1)
         SELECT qid, dcg_micro, idcg_micro,
                dcg_micro * 1000000 // idcg_micro AS ndcg_ppm
         FROM g WHERE idcg_micro > 0 ORDER BY qid""",
    "q_eval_brier" ->
      """WITH d AS (
           SELECT CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000000 AS p_ppm,
                  CAST(('0x' || substr(md5('y' || CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT) % 1000000 AS draw
           FROM embeddings),
         b AS (
           SELECT p_ppm, CASE WHEN draw < p_ppm THEN 1 ELSE 0 END AS y FROM d),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos,
                  CAST(sum((p_ppm - y * 1000000) * (p_ppm - y * 1000000)) AS BIGINT) AS sum_sq
           FROM b)
         SELECT n, npos,
                sum_sq // (n * 1000000) AS brier_e6,
                npos * 1000000 // n AS base_ppm,
                npos * (n - npos) * 1000000 // (n * n) AS unc_e6
         FROM a""",
    "q_events_emd" ->
      """WITH binned AS (
           SELECT least(250, CAST(round(value * 100) AS BIGINT) // 200) AS bin,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1),
         cum AS (
           SELECT *, CAST(sum(ca) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
                  CAST(sum(cb) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
           FROM binned),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                        CAST(sum(cb) AS BIGINT) AS nb FROM binned)
         SELECT na, nb,
                CAST(sum(abs(cum_a * nb - cum_b * na)) AS BIGINT) * 1000000
                  // (na * nb) AS emd_bins_ppm
         FROM cum, tot GROUP BY na, nb""",
    "q_events_runs_test" ->
      """WITH d AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, ts, event_id
           FROM events),
         tot AS (
           SELECT event_type, CAST(sum(c) AS BIGINT) AS sum_c,
                  CAST(count(*) AS BIGINT) AS n
           FROM d GROUP BY 1),
         s AS (
           SELECT d.event_type, tot.n,
                  CASE WHEN d.c * tot.n >= tot.sum_c THEN 1 ELSE 0 END AS sign,
                  d.ts, d.event_id
           FROM d JOIN tot ON d.event_type = tot.event_type),
         b AS (
           SELECT *, CASE WHEN lag(sign) OVER (PARTITION BY event_type
                    ORDER BY ts, event_id) IS DISTINCT FROM sign
                  THEN 1 ELSE 0 END AS brk
           FROM s),
         g AS (
           SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                  CAST(sum(sign) AS BIGINT) AS n1,
                  CAST(sum(1 - sign) AS BIGINT) AS n2,
                  CAST(sum(brk) AS BIGINT) AS runs
           FROM b GROUP BY 1)
         SELECT event_type, n, n1, n2, runs,
                round((CAST(runs * n - (2 * n1 * n2 + n) AS DOUBLE)
                       * CAST(runs * n - (2 * n1 * n2 + n) AS DOUBLE)
                       * CAST(n - 1 AS DOUBLE))
                      / (CAST(2 * n1 * n2 AS DOUBLE)
                         * CAST(2 * n1 * n2 - n AS DOUBLE)), 6) AS z2
         FROM g ORDER BY event_type""",
    "q_events_wilcoxon" ->
      """WITH e AS (
           SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS c,
                  row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id, event_type) AS cnt
           FROM events),
         pairs AS (
           SELECT user_id, event_type,
                  CAST(max(CASE WHEN rn = cnt THEN c END)
                    - max(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS d
           FROM e WHERE cnt >= 2 AND (rn = 1 OR rn = cnt)
           GROUP BY 1, 2
           HAVING max(CASE WHEN rn = cnt THEN c END)
                - max(CASE WHEN rn = 1 THEN c END) != 0),
         r AS (
           SELECT *, rank() OVER (PARTITION BY event_type ORDER BY abs(d)) AS rmin,
                  count(*) OVER (PARTITION BY event_type, abs(d)) AS ties
           FROM pairs)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN d > 0 THEN 2 * rmin + ties - 1 ELSE 0 END) AS BIGINT) AS w2_plus,
                CAST(count(*) * (count(*) + 1) AS BIGINT) AS w2_total
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_events_trend_ca" ->
      """WITH d AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS c,
                  CAST(hour(ts) AS BIGINT) // 6 AS g
           FROM events),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS sum_c,
                        CAST(count(*) AS BIGINT) AS nn FROM d),
         grp AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n_g,
                  CAST(sum(CASE WHEN c * nn >= sum_c THEN 1 ELSE 0 END) AS BIGINT) AS r_g
           FROM d, tot GROUP BY 1),
         a AS (
           SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(r_g) AS BIGINT) AS r,
                  CAST(sum(g * r_g) AS BIGINT) AS sgr,
                  CAST(sum(g * n_g) AS BIGINT) AS sgn,
                  CAST(sum(g * g * n_g) AS BIGINT) AS sg2n
           FROM grp)
         SELECT n, r, sgr * n - sgn * r AS t_num,
                round((CAST(sgr * n - sgn * r AS DOUBLE)
                       * CAST(sgr * n - sgn * r AS DOUBLE)
                       * CAST(n AS DOUBLE))
                      / (CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)
                         * (CAST(n AS DOUBLE) * CAST(sg2n AS DOUBLE)
                            - CAST(sgn AS DOUBLE) * CAST(sgn AS DOUBLE))), 6) AS z2
         FROM a""",
    "q_text_chao1" ->
      """WITH ls AS (SELECT source, string_split(text, ' ') AS l FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
         c AS (SELECT source, unnest(list_transform(generate_series(1, len(l) - 2),
                 i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tok
               FROM ls),
         cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                  FROM c GROUP BY 1, 2),
         g AS (SELECT source, CAST(count(*) AS BIGINT) AS s_obs,
                      CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                      CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
               FROM cnts GROUP BY 1)
         SELECT source, s_obs, f1, f2,
                (s_obs * 2 * (f2 + 1) + f1 * (f1 - 1)) * 1000000
                  // (2 * (f2 + 1)) AS chao1_ppm
         FROM g ORDER BY source""",
    "q_text_good_turing" ->
      """WITH ls AS (SELECT source, string_split(text, ' ') AS l FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
         c AS (SELECT source, unnest(list_transform(generate_series(1, len(l) - 2),
                 i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS tok
               FROM ls),
         cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
                  FROM c GROUP BY 1, 2),
         fof AS (SELECT source, cnt AS r, CAST(count(*) AS BIGINT) AS n_r
                 FROM cnts GROUP BY 1, 2)
         SELECT f.source, f.r, f.n_r,
                CAST(COALESCE(nx.n_r, 0) AS BIGINT) AS n_next,
                (f.r + 1) * CAST(COALESCE(nx.n_r, 0) AS BIGINT) * 1000000
                  // f.n_r AS rstar_ppm
         FROM fof f LEFT JOIN fof nx
           ON nx.source = f.source AND nx.r = f.r + 1
         WHERE f.r <= 5 ORDER BY f.source, f.r""",
    "q_agg_trimmed" ->
      """WITH d AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS rn,
                  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM events),
         k AS (SELECT * FROM d WHERE rn > n // 10 AND rn <= n - n // 10)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(c) AS BIGINT) AS sum_kept,
                CAST(sum(c) AS BIGINT) * 1000000
                  // CAST(count(*) AS BIGINT) AS trimmed_mean_cents_ppm
         FROM k GROUP BY 1 ORDER BY 1""",
    "q_events_grubbs" ->
      """WITH d AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
                    FROM events),
         tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(c) AS BIGINT) AS sm,
                        CAST(sum(c * c) AS BIGINT) AS s2
                 FROM d GROUP BY 1),
         g AS (SELECT d.event_type, CAST(max(tot.n) AS BIGINT) AS n,
                      CAST(max(tot.sm) AS BIGINT) AS sm,
                      CAST(max(tot.s2) AS BIGINT) AS s2,
                      CAST(max(abs(d.c * tot.n - tot.sm)) AS BIGINT) AS maxdev_n
               FROM d JOIN tot ON d.event_type = tot.event_type
               GROUP BY 1)
         SELECT event_type, n, maxdev_n,
                round((CAST(maxdev_n AS DOUBLE) * CAST(maxdev_n AS DOUBLE)
                       * CAST(n - 1 AS DOUBLE))
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))), 6) AS g2
         FROM g ORDER BY event_type""",
    "q_events_pacf2" ->
      """WITH d AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                  lead(CAST(round(value * 100) AS BIGINT), 1) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id) AS c1,
                  lead(CAST(round(value * 100) AS BIGINT), 2) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id) AS c2
           FROM events),
         a AS (
           SELECT event_type,
                  CAST(count(CASE WHEN c1 IS NOT NULL THEN 1 END) AS BIGINT) AS n1,
                  CAST(sum(CASE WHEN c1 IS NOT NULL THEN c END) AS BIGINT) AS sx1,
                  CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 END) AS BIGINT) AS sy1,
                  CAST(sum(CASE WHEN c1 IS NOT NULL THEN c * c END) AS BIGINT) AS sxx1,
                  CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 * c1 END) AS BIGINT) AS syy1,
                  CAST(sum(CASE WHEN c1 IS NOT NULL THEN c * c1 END) AS BIGINT) AS sxy1,
                  CAST(count(CASE WHEN c2 IS NOT NULL THEN 1 END) AS BIGINT) AS n2,
                  CAST(sum(CASE WHEN c2 IS NOT NULL THEN c END) AS BIGINT) AS sx2,
                  CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 END) AS BIGINT) AS sy2,
                  CAST(sum(CASE WHEN c2 IS NOT NULL THEN c * c END) AS BIGINT) AS sxx2,
                  CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 * c2 END) AS BIGINT) AS syy2,
                  CAST(sum(CASE WHEN c2 IS NOT NULL THEN c * c2 END) AS BIGINT) AS sxy2
           FROM d GROUP BY 1)
         SELECT event_type, n1, n2,
                round(((CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
                        / sqrt((CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE)
                                - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))
                               * (CAST(n2 AS DOUBLE) * CAST(syy2 AS DOUBLE)
                                  - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))))
                       - (CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                          / sqrt((CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                                  - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
                                 * (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
                                    - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))))
                         * (CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                            / sqrt((CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                                    - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
                                   * (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
                                      - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE)))))
                      / (CAST(1 AS DOUBLE)
                         - (CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                            / sqrt((CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                                    - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
                                   * (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
                                      - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))))
                           * (CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                              / sqrt((CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
                                      - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
                                     * (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
                                        - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))))), 6) AS phi22
         FROM a ORDER BY event_type""",
    "q_events_allan" ->
      """WITH d AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                  (row_number() OVER (PARTITION BY event_type
                     ORDER BY ts, event_id) - 1) // 16 AS b
           FROM events),
         blocks AS (
           SELECT event_type, b, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(c) AS BIGINT) AS s
           FROM d GROUP BY 1, 2 HAVING count(*) = 16),
         diffs AS (
           SELECT event_type,
                  lead(s) OVER (PARTITION BY event_type ORDER BY b) - s AS df
           FROM blocks),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS m_diffs,
                  CAST(sum(df * df) AS BIGINT) AS sum_d2
           FROM diffs WHERE df IS NOT NULL GROUP BY 1)
         SELECT event_type, m_diffs, sum_d2,
                sum_d2 * 1000000 // (2 * m_diffs * 256) AS avar_cents2_ppm
         FROM g ORDER BY event_type""",
    "q_events_ulcer" ->
      """WITH d AS (
           SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                  CAST(max(CAST(round(value * 100) AS BIGINT)) OVER (
                    PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
           FROM events),
         dd AS (SELECT event_type, (peak - c) * 1000000 // peak AS dd_ppm FROM d),
         g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(dd_ppm * dd_ppm) AS BIGINT) AS sum_dd2
               FROM dd GROUP BY 1)
         SELECT event_type, n, sum_dd2, sum_dd2 // n AS ulcer2_ppm2
         FROM g ORDER BY event_type""",
    "q_sample_consistent_hash" ->
      """WITH ring AS (
           SELECT shard, CAST(('0x' || substr(md5('s' || CAST(shard AS VARCHAR)
                    || ':v' || CAST(v AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS pos
           FROM (SELECT unnest(range(8)) AS shard) s,
                (SELECT unnest(range(16)) AS v) v),
         keys AS (
           SELECT doc_id, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS h
           FROM documents),
         chosen AS (
           SELECT k.doc_id,
                  COALESCE(min(CASE WHEN r.pos >= k.h THEN r.pos END),
                           min(r.pos)) AS cpos
           FROM keys k, ring r GROUP BY 1),
         assigned AS (
           SELECT c.doc_id, r.shard FROM chosen c JOIN ring r ON c.cpos = r.pos)
         SELECT CAST(shard AS BIGINT) AS shard,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM assigned GROUP BY 1 ORDER BY 1""",
    // key-sampled degree products: the h<32 filter is the identical
    // md5-prefix rule, so both engines sample the same keys
    "q_join_size_estimate" ->
      """WITH da AS (SELECT user_id, CAST(count(*) AS BIGINT) AS da
                     FROM events WHERE event_type = 'purchase' GROUP BY 1),
            db AS (SELECT user_id, CAST(count(*) AS BIGINT) AS db
                     FROM events WHERE event_type = 'error' GROUP BY 1),
            j AS (SELECT a.user_id, a.da, b.db,
                         CAST(('0x' || substr(md5(CAST(a.user_id AS VARCHAR)), 1, 2))::UBIGINT AS BIGINT) AS h
                  FROM da a JOIN db b USING (user_id)),
            g AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                         CAST(sum(CASE WHEN h < 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                         CAST(sum(da * db) AS BIGINT) AS exact_pairs,
                         CAST(COALESCE(sum(CASE WHEN h < 32 THEN da * db END), 0) * 8 AS BIGINT) AS est_pairs
                  FROM j)
         SELECT n_keys, n_sampled, exact_pairs, est_pairs,
                CAST(abs(est_pairs - exact_pairs) * 1000000 // exact_pairs AS BIGINT) AS abs_err_ppm
         FROM g""",
    "q_join_skew_planner" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
            t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
            r AS (SELECT user_id, cnt, total, (total + 31) // 32 AS target,
                         row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
                  FROM c, t)
         SELECT user_id, cnt,
                CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
                CAST(least(32, (cnt + target - 1) // target) AS BIGINT) AS salt_k
         FROM r WHERE rn <= 10 ORDER BY cnt DESC, user_id""",
    // identical integer bin edges + identical rational rank crossings
    "q_agg_quantile_sketch" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
            mm AS (SELECT event_type, min(c) AS mn, max(c) AS mx,
                          CAST(count(*) AS BIGINT) AS n,
                          (max(c) - min(c)) // 256 + 1 AS width
                   FROM e GROUP BY 1),
            bins AS (SELECT e.event_type, (c - mn) // width AS b,
                            CAST(count(*) AS BIGINT) AS bc
                     FROM e JOIN mm USING (event_type) GROUP BY 1, 2),
            cb AS (SELECT event_type, b,
                          sum(bc) OVER (PARTITION BY event_type ORDER BY b) AS cum
                   FROM bins),
            ap AS (SELECT cb.event_type,
                          CAST(min(CASE WHEN cum >= (n + 1) // 2
                                        THEN mn + (b + 1) * width - 1 END) AS BIGINT) AS approx_p50,
                          CAST(min(CASE WHEN cum * 10 >= n * 9
                                        THEN mn + (b + 1) * width - 1 END) AS BIGINT) AS approx_p90
                   FROM cb JOIN mm USING (event_type) GROUP BY 1),
            vc AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS vcnt
                   FROM e GROUP BY 1, 2),
            cv AS (SELECT event_type, c,
                          sum(vcnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
                   FROM vc),
            ex AS (SELECT cv.event_type,
                          CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS BIGINT) AS exact_p50,
                          CAST(min(CASE WHEN cum * 10 >= n * 9 THEN c END) AS BIGINT) AS exact_p90
                   FROM cv JOIN mm USING (event_type) GROUP BY 1)
         SELECT mm.event_type, n, width,
                approx_p50, exact_p50, approx_p50 - exact_p50 AS err_p50,
                approx_p90, exact_p90, approx_p90 - exact_p90 AS err_p90
         FROM ap JOIN ex USING (event_type) JOIN mm USING (event_type)
         ORDER BY event_type""",
    "q_events_mase" ->
      """WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
                    FROM events GROUP BY 1, 2),
            l AS (SELECT event_type, y,
                         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7,
                         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1
                  FROM d)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
                CAST(sum(abs(y - y7)) AS BIGINT) AS sae7,
                CAST(sum(abs(y - y1)) AS BIGINT) AS sae1,
                CAST(sum(abs(y - y7)) * 1000000 // sum(abs(y - y1)) AS BIGINT) AS mase_ppm
         FROM l WHERE y7 IS NOT NULL AND y1 IS NOT NULL
         GROUP BY 1 ORDER BY 1""",
    // pred is floored mean of NON-NEGATIVE cents, so Spark's truncating
    // div and DuckDB's flooring // agree; q-hat is the identical
    // rational rank crossing on the residual-count cumsum
    "q_eval_conformal" ->
      """WITH e AS (SELECT event_type, event_id,
                           CAST(round(value * 100) AS BIGINT) AS c FROM events),
            cal AS (SELECT * FROM e WHERE event_id % 2 = 0),
            fit AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
                           CAST(sum(c) // count(*) AS BIGINT) AS pred_c
                    FROM cal GROUP BY 1),
            rc AS (SELECT cal.event_type, abs(c - pred_c) AS r,
                          CAST(count(*) AS BIGINT) AS rcnt
                   FROM cal JOIN fit USING (event_type) GROUP BY 1, 2),
            cr AS (SELECT event_type, r,
                          sum(rcnt) OVER (PARTITION BY event_type ORDER BY r) AS cum
                   FROM rc),
            qh AS (SELECT cr.event_type,
                          CAST(min(CASE WHEN cum * 10 >= (n_cal + 1) * 9 THEN r END) AS BIGINT) AS qhat
                   FROM cr JOIN fit USING (event_type) GROUP BY 1),
            tst AS (SELECT e.event_type, n_cal, pred_c, qhat,
                           CAST(count(*) AS BIGINT) AS n_test,
                           CAST(sum(CASE WHEN abs(c - pred_c) <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS hits
                    FROM e JOIN fit USING (event_type) JOIN qh USING (event_type)
                    WHERE event_id % 2 = 1 GROUP BY 1, 2, 3, 4)
         SELECT event_type, n_cal, n_test, pred_c, qhat,
                CAST(hits * 1000000 // n_test AS BIGINT) AS coverage_ppm
         FROM tst ORDER BY event_type""",
    // inner joins against the deduped pair set ≡ Spark's left-semi
    "q_basket_triples" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            pairs AS (SELECT a.pk AS p1, b.pk AS p2
                      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
                      GROUP BY 1, 2 HAVING count(*) >= 2),
            tri AS (SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3,
                           CAST(count(*) AS BIGINT) AS support
                    FROM li a
                    JOIN li b ON a.ok = b.ok AND a.pk < b.pk
                    JOIN li c ON b.ok = c.ok AND b.pk < c.pk
                    JOIN pairs pab ON a.pk = pab.p1 AND b.pk = pab.p2
                    JOIN pairs pbc ON b.pk = pbc.p1 AND c.pk = pbc.p2
                    JOIN pairs pac ON a.pk = pac.p1 AND c.pk = pac.p2
                    GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         SELECT p1, p2, p3, support FROM tri
         ORDER BY support DESC, p1, p2, p3 LIMIT 50""",
    // 5 unrolled greedy rounds; each pr is the round-r argmax and cr
    // the covered-gram set after it — identical tie-break (gain desc,
    // doc_id). covered_cum is the same running sum both engines take.
    "q_docs_maxcover" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
            g AS (SELECT DISTINCT doc_id, array_to_string(l[x+1:x+3], ' ') AS gram
                  FROM toks, LATERAL (SELECT unnest(range(len(l) - 2)) AS x) t),
            p1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g
                   GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c1 AS (SELECT DISTINCT gram FROM g WHERE doc_id = (SELECT doc_id FROM p1)),
            p2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g
                   WHERE gram NOT IN (SELECT gram FROM c1)
                   GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c2 AS (SELECT gram FROM c1 UNION
                   SELECT gram FROM g WHERE doc_id = (SELECT doc_id FROM p2)),
            p3 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g
                   WHERE gram NOT IN (SELECT gram FROM c2)
                   GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c3 AS (SELECT gram FROM c2 UNION
                   SELECT gram FROM g WHERE doc_id = (SELECT doc_id FROM p3)),
            p4 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g
                   WHERE gram NOT IN (SELECT gram FROM c3)
                   GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            c4 AS (SELECT gram FROM c3 UNION
                   SELECT gram FROM g WHERE doc_id = (SELECT doc_id FROM p4)),
            p5 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM g
                   WHERE gram NOT IN (SELECT gram FROM c4)
                   GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
            u AS (SELECT 1 AS round, doc_id, gain FROM p1
                  UNION ALL SELECT 2, doc_id, gain FROM p2
                  UNION ALL SELECT 3, doc_id, gain FROM p3
                  UNION ALL SELECT 4, doc_id, gain FROM p4
                  UNION ALL SELECT 5, doc_id, gain FROM p5)
         SELECT CAST(round AS BIGINT) AS round, doc_id, gain,
                CAST(sum(gain) OVER (ORDER BY round) AS BIGINT) AS covered_cum
         FROM u ORDER BY round""",
    // scores are non-negative integers so truncating div ≡ flooring //
    "q_docs_ablation" ->
      """WITH sc AS (SELECT source,
                            CAST(len(list_filter(string_split(text, ' '),
                                 w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) AS BIGINT)
                              * 1000000 // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
                     FROM documents),
            g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(score) AS BIGINT) AS sum_s
                  FROM sc GROUP BY 1),
            t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
                         CAST(sum(sum_s) AS BIGINT) AS sum_all FROM g)
         SELECT source, n_docs,
                CAST(sum_s // n_docs AS BIGINT) AS mean_src,
                CAST(sum_all // n_all AS BIGINT) AS mean_global,
                CAST((sum_all - sum_s) // (n_all - n_docs) AS BIGINT) AS mean_without,
                CAST((sum_all - sum_s) // (n_all - n_docs) - sum_all // n_all AS BIGINT) AS delta
         FROM g, t ORDER BY source""",
    // identical distinct-incidence projection and DECIMAL numerator
    "q_graph_bipartite" ->
      """WITH inc AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
            deg AS (SELECT sk, CAST(count(*) AS BIGINT) AS n FROM inc GROUP BY 1),
            pr AS (SELECT a.sk AS s1, b.sk AS s2, CAST(count(*) AS BIGINT) AS n12
                   FROM inc a JOIN inc b ON a.pk = b.pk AND a.sk < b.sk
                   GROUP BY 1, 2)
         SELECT s1, s2, n12, d1.n AS n1, d2.n AS n2,
                CAST((CAST(n12 AS HUGEINT) * n12 * 1000000)
                     // (CAST(d1.n AS HUGEINT) * d2.n) AS BIGINT) AS cos2_ppm
         FROM pr JOIN deg d1 ON pr.s1 = d1.sk
                 JOIN deg d2 ON pr.s2 = d2.sk
         ORDER BY cos2_ppm DESC, s1, s2 LIMIT 50""",
    // 4 unrolled farthest-point rounds over the identical integerized
    // vectors; each sr is the selected set after round r and pr the
    // round-r argmax with the same (dist desc, vec_id) tie-break
    "q_sample_kcenter" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                    FROM embeddings),
            s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
            p2 AS (SELECT e.vec_id, min(list_reduce(list_transform(list_zip(e.v, s.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)) AS md
                   FROM e, s1 s GROUP BY 1 ORDER BY md DESC, e.vec_id LIMIT 1),
            s2 AS (SELECT vec_id, v FROM e WHERE vec_id IN
                     (SELECT vec_id FROM s1 UNION SELECT vec_id FROM p2)),
            p3 AS (SELECT e.vec_id, min(list_reduce(list_transform(list_zip(e.v, s.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)) AS md
                   FROM e, s2 s GROUP BY 1 ORDER BY md DESC, e.vec_id LIMIT 1),
            s3 AS (SELECT vec_id, v FROM e WHERE vec_id IN
                     (SELECT vec_id FROM s2 UNION SELECT vec_id FROM p3)),
            p4 AS (SELECT e.vec_id, min(list_reduce(list_transform(list_zip(e.v, s.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)) AS md
                   FROM e, s3 s GROUP BY 1 ORDER BY md DESC, e.vec_id LIMIT 1),
            s4 AS (SELECT vec_id, v FROM e WHERE vec_id IN
                     (SELECT vec_id FROM s3 UNION SELECT vec_id FROM p4)),
            p5 AS (SELECT e.vec_id, min(list_reduce(list_transform(list_zip(e.v, s.v),
                            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)) AS md
                   FROM e, s4 s GROUP BY 1 ORDER BY md DESC, e.vec_id LIMIT 1)
         SELECT CAST(round AS BIGINT) AS round, vec_id, CAST(sep2 AS BIGINT) AS sep2
         FROM (SELECT 1 AS round, vec_id, 0 AS sep2 FROM s1
               UNION ALL SELECT 2, vec_id, md FROM p2
               UNION ALL SELECT 3, vec_id, md FROM p3
               UNION ALL SELECT 4, vec_id, md FROM p4
               UNION ALL SELECT 5, vec_id, md FROM p5)
         ORDER BY round""",
    // identical integer extent assignment (ids are non-negative so
    // Spark's truncating div and DuckDB's flooring // agree) and the
    // same inclusive interval-overlap predicate for both layouts
    "q_table_cluster_depth" ->
      """WITH e AS (SELECT event_id, user_id,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
            mm AS (SELECT min(event_id) AS mn_id, max(event_id) AS mx_id FROM e),
            ei AS (SELECT (event_id - mn_id) * 32 // (mx_id - mn_id + 1) AS f,
                          min(sec) AS mn, max(sec) AS mx FROM e, mm GROUP BY 1),
            di AS (SELECT a.f, CAST(count(*) AS BIGINT) AS depth
                   FROM ei a JOIN ei b ON a.mn <= b.mx AND b.mn <= a.mx GROUP BY 1),
            eu AS (SELECT user_id % 32 AS f,
                          min(sec) AS mn, max(sec) AS mx FROM e GROUP BY 1),
            du AS (SELECT a.f, CAST(count(*) AS BIGINT) AS depth
                   FROM eu a JOIN eu b ON a.mn <= b.mx AND b.mn <= a.mx GROUP BY 1)
         SELECT 'ingest' AS layout, CAST(count(*) AS BIGINT) AS n_extents,
                min(depth) AS depth_min, max(depth) AS depth_max,
                CAST(sum(depth) * 1000000 // count(*) AS BIGINT) AS avg_depth_ppm
         FROM di
         UNION ALL
         SELECT 'by_user', CAST(count(*) AS BIGINT), min(depth), max(depth),
                CAST(sum(depth) * 1000000 // count(*) AS BIGINT)
         FROM du
         ORDER BY layout""",

    // ---- session 12 oracles ------------------------------------------

    // identical 1e-6-rounded DFT weights per (period, phase), exact
    // decimal accumulation, one shared double power formula
    "q_events_periodogram" ->
      """WITH daily AS (
           SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT p, unnest(range(p)) AS r
           FROM (VALUES (CAST(7 AS BIGINT)), (CAST(10 AS BIGINT)),
                        (CAST(15 AS BIGINT))) t(p)),
         wt AS (
           SELECT p, r,
                  CAST(round(cos((2 * pi() * r) / p) * 1000000) AS BIGINT) AS cw,
                  CAST(round(sin((2 * pi() * r) / p) * 1000000) AS BIGINT) AS sw
           FROM w),
         agg AS (
           SELECT daily.event_type, wt.p AS period,
                  CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(daily.c) AS BIGINT) AS total,
                  CAST(sum(CAST(daily.c AS HUGEINT) * wt.cw) AS BIGINT) AS a,
                  CAST(sum(CAST(daily.c AS HUGEINT) * wt.sw) AS BIGINT) AS b
           FROM daily
           JOIN wt ON wt.p IN (7, 10, 15) AND daily.d % wt.p = wt.r
           GROUP BY 1, 2)
         SELECT event_type, period, n_days, total, a, b,
                round((CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                       + CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
                      / (CAST(total AS DOUBLE) * 1000000.0
                         * CAST(total AS DOUBLE) * 1000000.0) * 1000000,
                      6) AS power_ppm
         FROM agg ORDER BY event_type, period""",

    // identical denominator-cleared cumulative deviations, exact window
    // sums, one sqrt+division rounding per window, integer means, and
    // the same 3-point log-spaced slope
    "q_events_hurst" ->
      """WITH e AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                  event_id, CAST(round(value * 100) AS BIGINT) AS x
           FROM events),
         idx AS (
           SELECT event_type, x,
                  CAST(row_number() OVER (PARTITION BY event_type
                       ORDER BY ts_s, event_id) AS BIGINT) - 1 AS i
           FROM e),
         sized AS (
           SELECT event_type, x, p.n, i // p.n AS w, i % p.n + 1 AS j
           FROM idx, (VALUES (CAST(16 AS BIGINT)), (CAST(32 AS BIGINT)),
                             (CAST(64 AS BIGINT))) p(n)),
         win AS (
           SELECT event_type, n, w, j,
                  sum(x) OVER (PARTITION BY event_type, n, w ORDER BY j
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pj,
                  sum(x) OVER (PARTITION BY event_type, n, w) AS sx,
                  sum(x * x) OVER (PARTITION BY event_type, n, w) AS sxx,
                  count(*) OVER (PARTITION BY event_type, n, w) AS cnt
           FROM sized),
         agg AS (
           SELECT event_type, n, w,
                  max(n * pj - j * sx) AS mxd, min(n * pj - j * sx) AS mnd,
                  max(sx) AS sx, max(sxx) AS sxx, max(cnt) AS cnt
           FROM win GROUP BY 1, 2, 3),
         rs AS (
           SELECT event_type, n,
                  CAST(round((greatest(mxd, 0) - least(mnd, 0)) * 1000000
                             / sqrt(n * sxx - sx * sx)) AS BIGINT) AS rs_e6
           FROM agg WHERE cnt = n AND n * sxx - sx * sx > 0),
         m AS (
           SELECT event_type, n,
                  CAST(sum(rs_e6) AS BIGINT) // count(*) AS rs_mean,
                  CAST(count(*) AS BIGINT) AS n_windows
           FROM rs GROUP BY 1, 2)
         SELECT event_type,
                CAST(sum(CASE WHEN n = 16 THEN rs_mean END) AS BIGINT) AS rs16_e6,
                CAST(sum(CASE WHEN n = 32 THEN rs_mean END) AS BIGINT) AS rs32_e6,
                CAST(sum(CASE WHEN n = 64 THEN rs_mean END) AS BIGINT) AS rs64_e6,
                CAST(sum(CASE WHEN n = 64 THEN n_windows END) AS BIGINT) AS n_win64,
                round(ln(CAST(sum(CASE WHEN n = 64 THEN rs_mean END) AS DOUBLE)
                         / CAST(sum(CASE WHEN n = 16 THEN rs_mean END) AS DOUBLE))
                      / (2 * ln(2)), 6) AS hurst
         FROM m GROUP BY 1 ORDER BY 1""",

    // identical mid split, bins, full-grid smoothing and per-bin
    // (p−q)·ln(p/q) from the same exact-rounded doubles
    "q_eval_psi" ->
      """WITH e AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                  CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
         bounds AS (SELECT event_type, (min(ts_s) + max(ts_s)) // 2 AS mid
                    FROM e GROUP BY 1),
         counts AS (
           SELECT e.event_type,
                  CASE WHEN e.ts_s <= b.mid THEN 'early' ELSE 'late' END AS half,
                  least(e.c // 5000, 9) AS bin, CAST(count(*) AS BIGINT) AS n
           FROM e JOIN bounds b ON e.event_type = b.event_type
           GROUP BY 1, 2, 3),
         grid AS (
           SELECT event_type, unnest(range(10)) AS bin
           FROM (SELECT DISTINCT event_type FROM counts)),
         filled AS (
           SELECT g.event_type, g.bin,
                  CAST(coalesce(ea.n, 0) AS BIGINT) AS n_early,
                  CAST(coalesce(la.n, 0) AS BIGINT) AS n_late
           FROM grid g
           LEFT JOIN counts ea ON ea.event_type = g.event_type
                AND ea.bin = g.bin AND ea.half = 'early'
           LEFT JOIN counts la ON la.event_type = g.event_type
                AND la.bin = g.bin AND la.half = 'late'),
         tot AS (
           SELECT event_type, bin, n_early, n_late,
                  sum(n_early) OVER (PARTITION BY event_type) AS te,
                  sum(n_late) OVER (PARTITION BY event_type) AS tl
           FROM filled),
         terms AS (
           SELECT event_type, bin, n_early, n_late,
                  (n_early + 1) * 1000000 // (te + 10) AS p_ppm,
                  (n_late + 1) * 1000000 // (tl + 10) AS q_ppm,
                  CAST(round((CAST(n_early + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE)
                              - CAST(n_late + 1 AS DOUBLE) / CAST(tl + 10 AS DOUBLE))
                             * ln((CAST(n_early + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE))
                                  / (CAST(n_late + 1 AS DOUBLE) / CAST(tl + 10 AS DOUBLE)))
                             * 1000000) AS BIGINT) AS term_e6
           FROM tot)
         SELECT event_type, bin, n_early, n_late,
                CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
                term_e6,
                CAST(sum(term_e6) OVER (PARTITION BY event_type) AS BIGINT) AS psi_e6
         FROM terms ORDER BY event_type, bin""",

    // identical md5 scores/draws, bucket midpoints, e6-rounded −ln
    // terms accumulated as exact integers, same base-rate entropy
    "q_eval_logloss" ->
      """WITH rows_ AS (
           SELECT CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT)
                       % 1000000 AS p_ppm,
                  CAST(('0x' || substr(md5('y' || CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT)
                       % 1000000 AS draw
           FROM embeddings),
         lab AS (
           SELECT greatest(1, least(998, p_ppm // 1000)) AS p_mil,
                  CASE WHEN draw < p_ppm THEN 1 ELSE 0 END AS y
           FROM rows_),
         g AS (SELECT p_mil, y, CAST(count(*) AS BIGINT) AS n
               FROM lab GROUP BY 1, 2),
         tm AS (
           SELECT n, y, p_mil * 1000 + 500 AS pm,
                  CAST(round(ln(1000000.0 /
                       (CASE WHEN y = 1 THEN p_mil * 1000 + 500
                             ELSE 1000000 - (p_mil * 1000 + 500) END)) * 1000000)
                       AS BIGINT) AS term_e6
           FROM g)
         SELECT CAST(sum(n) AS BIGINT) AS n,
                CAST(sum(y * n) AS BIGINT) AS npos,
                CAST(sum(n * term_e6) AS BIGINT) // sum(n) AS logloss_e6,
                CAST(round((CAST(sum(y * n) AS DOUBLE)
                            * ln(CAST(sum(n) AS DOUBLE) / sum(y * n))
                            + CAST(sum(n) - sum(y * n) AS DOUBLE)
                            * ln(CAST(sum(n) AS DOUBLE) / (sum(n) - sum(y * n))))
                           / sum(n) * 1000000) AS BIGINT) AS baseline_e6
         FROM tm""",

    // identical per-distinct-degree e6 ln weights, exact integer MLE
    "q_graph_powerlaw" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       degs AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       hist AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt,
                       CAST(round(ln(CAST(deg AS DOUBLE)) * 1000000) AS BIGINT) AS lnd_e6
                FROM degs GROUP BY 1),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                      CAST(sum(cnt * lnd_e6) AS BIGINT) AS s FROM hist)
       SELECT h.deg, h.cnt, h.cnt * 1000000 // t.n AS share_ppm,
              t.n AS n_vertices,
              CASE WHEN t.s > 0 THEN 1000000 + t.n * 1000000000000 // t.s
                   ELSE NULL END AS alpha_e6
       FROM hist h, tot t ORDER BY h.deg"""),

    // identical open-wedge equi-joins; the middle vertex's 1/ln(deg)
    // weight pre-rounded per vertex, summed exactly
    "q_graph_adamic_adar" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       edges AS (SELECT ia AS src, ib AS dst FROM pairs
                 UNION ALL SELECT ib AS src, ia AS dst FROM pairs),
       degs AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       wz AS (SELECT src AS z,
                     CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w_e6
              FROM degs WHERE deg >= 2),
       cand AS (SELECT e1.src AS a, e2.dst AS c, e1.dst AS z
                FROM edges e1 JOIN edges e2
                  ON e1.dst = e2.src AND e1.src < e2.dst),
       openw AS (SELECT cand.* FROM cand
                 WHERE NOT EXISTS (SELECT 1 FROM pairs p
                                   WHERE p.ia = cand.a AND p.ib = cand.c))
       SELECT o.a, o.c, CAST(count(*) AS BIGINT) AS cn,
              CAST(sum(w.w_e6) AS BIGINT) AS aa_e6
       FROM openw o JOIN wz w ON w.z = o.z
       GROUP BY 1, 2 ORDER BY aa_e6 DESC, a, c LIMIT 20"""),

    // identical union-support smoothing, combo-collapsed e8 terms
    "q_text_jsd" ->
      """WITH words AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         grams AS (SELECT source,
                          CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT AS BIGINT) AS h
                   FROM (SELECT source,
                                unnest(CASE WHEN len(w) >= 3 THEN
                                  list_transform(range(1, len(w) - 1),
                                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                                ELSE [] END) AS g
                         FROM words)),
         cnts AS (SELECT source, h, CAST(count(*) AS BIGINT) AS cnt
                  FROM grams GROUP BY 1, 2),
         tots AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot
                  FROM cnts GROUP BY 1),
         prs AS (SELECT a.source AS sa, b.source AS sb
                 FROM tots a JOIN tots b ON a.source < b.source),
         ina AS (SELECT p.sa, p.sb, ca.h, ca.cnt AS na,
                        CAST(coalesce(cb.cnt, 0) AS BIGINT) AS nb
                 FROM prs p
                 JOIN cnts ca ON ca.source = p.sa
                 LEFT JOIN cnts cb ON cb.source = p.sb AND cb.h = ca.h),
         bonly AS (SELECT p.sa, p.sb, cb.h, CAST(0 AS BIGINT) AS na, cb.cnt AS nb
                   FROM prs p
                   JOIN cnts cb ON cb.source = p.sb
                   WHERE NOT EXISTS (SELECT 1 FROM cnts ca
                                     WHERE ca.source = p.sa AND ca.h = cb.h)),
         support AS (SELECT * FROM ina UNION ALL SELECT * FROM bonly),
         combos AS (SELECT sa, sb, na, nb, CAST(count(*) AS BIGINT) AS k
                    FROM support GROUP BY 1, 2, 3, 4),
         vps AS (SELECT sa, sb, na, nb, k,
                        sum(k) OVER (PARTITION BY sa, sb) AS vp
                 FROM combos),
         terms AS (
           SELECT v.sa, v.sb, v.k, CAST(v.vp AS BIGINT) AS vp, ta.tot AS ta, tb.tot AS tb,
                  CAST(round((
                    (CAST(v.na + 1 AS DOUBLE) / CAST(ta.tot + v.vp AS DOUBLE))
                      * ln(2 * (CAST(v.na + 1 AS DOUBLE) / CAST(ta.tot + v.vp AS DOUBLE))
                           / ((CAST(v.na + 1 AS DOUBLE) / CAST(ta.tot + v.vp AS DOUBLE))
                              + (CAST(v.nb + 1 AS DOUBLE) / CAST(tb.tot + v.vp AS DOUBLE))))
                    + (CAST(v.nb + 1 AS DOUBLE) / CAST(tb.tot + v.vp AS DOUBLE))
                      * ln(2 * (CAST(v.nb + 1 AS DOUBLE) / CAST(tb.tot + v.vp AS DOUBLE))
                           / ((CAST(v.na + 1 AS DOUBLE) / CAST(ta.tot + v.vp AS DOUBLE))
                              + (CAST(v.nb + 1 AS DOUBLE) / CAST(tb.tot + v.vp AS DOUBLE)))))
                    * 100000000) AS BIGINT) AS term_e8
           FROM vps v
           JOIN tots ta ON ta.source = v.sa
           JOIN tots tb ON tb.source = v.sb)
         SELECT sa, sb, vp, ta, tb, CAST(count(*) AS BIGINT) AS n_combos,
                CAST(sum(k * term_e8) AS BIGINT) // 2 AS jsd_e8
         FROM terms GROUP BY 1, 2, 3, 4, 5 ORDER BY sa, sb""",

    // identical first-occurrence agg, cumulative checkpoints, one
    // ln-ratio fit per source
    "q_text_heaps" ->
      """WITH docs AS (SELECT source, doc_id,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
                       FROM documents),
         firsts AS (SELECT source, min(doc_id) AS fd
                    FROM (SELECT source, doc_id,
                                 unnest(string_split(text, ' ')) AS tok
                          FROM documents)
                    GROUP BY source, tok),
         nw AS (SELECT source, fd AS doc_id, CAST(count(*) AS BIGINT) AS nw
                FROM firsts GROUP BY 1, 2),
         curve AS (
           SELECT d.source, d.doc_id,
                  CAST(row_number() OVER (PARTITION BY d.source
                       ORDER BY d.doc_id) AS BIGINT) AS rank,
                  sum(d.ntok) OVER (PARTITION BY d.source ORDER BY d.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tokens_seen,
                  sum(coalesce(n.nw, 0)) OVER (PARTITION BY d.source ORDER BY d.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vocab
           FROM docs d LEFT JOIN nw n
             ON n.source = d.source AND n.doc_id = d.doc_id),
         cp AS (SELECT source, rank AS docs_seen,
                       CAST(tokens_seen AS BIGINT) AS tokens_seen,
                       CAST(vocab AS BIGINT) AS vocab
                FROM curve WHERE rank % 10 = 0),
         fit AS (
           SELECT source, docs_seen, tokens_seen, vocab,
                  first_value(vocab) OVER (PARTITION BY source ORDER BY docs_seen
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v0,
                  first_value(tokens_seen) OVER (PARTITION BY source ORDER BY docs_seen
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n0,
                  last_value(vocab) OVER (PARTITION BY source ORDER BY docs_seen
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v1,
                  last_value(tokens_seen) OVER (PARTITION BY source ORDER BY docs_seen
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n1
           FROM cp)
         SELECT source, docs_seen, tokens_seen, vocab,
                CASE WHEN n1 > n0 THEN
                  CAST(round(ln(CAST(v1 AS DOUBLE) / v0)
                             / ln(CAST(n1 AS DOUBLE) / n0) * 1000000) AS BIGINT)
                END AS heaps_b_e6
         FROM fit ORDER BY source, docs_seen""",

    // identical cleared-denominator L1, exact HUGEINT accumulation,
    // one floor division
    "q_privacy_tcloseness" ->
      """WITH d AS (SELECT lang, n_chars // 100 AS len_bucket, source
                    FROM documents),
         cls AS (SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
                 FROM d GROUP BY 1, 2, 3),
         classes AS (SELECT lang, len_bucket, CAST(count(*) AS BIGINT) AS n_c
                     FROM d GROUP BY 1, 2),
         gsrc AS (SELECT source, CAST(count(*) AS BIGINT) AS g FROM d GROUP BY 1),
         n AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM d),
         grid AS (SELECT cl.lang, cl.len_bucket, cl.n_c, gl.source, gl.g,
                         CAST(coalesce(c.c, 0) AS BIGINT) AS c
                  FROM classes cl CROSS JOIN gsrc gl
                  LEFT JOIN cls c ON c.lang = cl.lang
                       AND c.len_bucket = cl.len_bucket AND c.source = gl.source)
         SELECT g.lang, g.len_bucket, g.n_c,
                CAST(sum(CAST(abs(g.c * n.ntot - g.g * g.n_c) AS HUGEINT))
                     * 1000000 // (2 * g.n_c * n.ntot) AS BIGINT) AS t_ppm,
                CASE WHEN CAST(sum(CAST(abs(g.c * n.ntot - g.g * g.n_c) AS HUGEINT))
                          * 1000000 // (2 * g.n_c * n.ntot) AS BIGINT) > 250000
                     THEN 1 ELSE 0 END AS breach
         FROM grid g, n GROUP BY 1, 2, 3, n.ntot ORDER BY 1, 2""",

    // identical cleared-denominator centroid distances, exact HUGEINT
    // squares, IEEE sqrt/div, per-point e6 rounding, integer means
    "q_ann_silhouette" ->
      """WITH pts AS (
           SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
                  i.i AS d, e.vv[i.i + 1] AS v
           FROM (SELECT vec_id, label,
                        list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
                 FROM embeddings) e, range(64) i(i)),
         cent AS (SELECT label AS clabel, d, CAST(sum(v) AS BIGINT) AS sd,
                         CAST(count(*) AS BIGINT) AS nc
                  FROM pts GROUP BY 1, 2),
         dist AS (SELECT p.vec_id, p.label, c.clabel, c.nc,
                         sqrt(CAST(sum(CAST(c.nc * p.v - c.sd AS HUGEINT)
                                       * (c.nc * p.v - c.sd)) AS DOUBLE)) / c.nc AS dst
                  FROM pts p JOIN cent c ON c.d = p.d
                  GROUP BY 1, 2, 3, 4),
         ab AS (SELECT vec_id, label,
                       max(CASE WHEN clabel = label THEN dst END) AS a,
                       min(CASE WHEN clabel <> label THEN dst END) AS b
                FROM dist GROUP BY 1, 2),
         sc AS (SELECT label,
                       CASE WHEN greatest(a, b) > 0 THEN
                         CAST(round((b - a) / greatest(a, b) * 1000000) AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END AS s_e6
                FROM ab)
         SELECT label, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(s_e6) AS BIGINT) // count(*) AS sil_e6,
                min(s_e6) AS min_s_e6, max(s_e6) AS max_s_e6
         FROM sc GROUP BY 1 ORDER BY 1""",

    // identical observed-day 7-row centered window, ppm ratios,
    // integer slot means, engine-neutral (d+4)%7 slots
    "q_events_seasonal_index" ->
      """WITH daily AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, d, c,
                  sum(c) OVER (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
                  count(*) OVER (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
           FROM daily),
         r AS (SELECT event_type, (d + 4) % 7 AS dow,
                      c * 7000000 // sum7 AS r_ppm
               FROM w WHERE n7 = 7)
         SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(r_ppm) AS BIGINT) // count(*) AS index_ppm,
                CAST(min(r_ppm) AS BIGINT) AS min_ppm,
                CAST(max(r_ppm) AS BIGINT) AS max_ppm
         FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    // identical 3 unrolled peeling rounds (generated so the oracle's
    // round count provably matches the engine's loop bound)
    "q_graph_ktruss" -> (simhashCte(" WHERE doc_id < 1000") + """,
       bands AS (
         SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
         FROM sims, (SELECT unnest(range(4)) AS band) b
       ),
       pairs AS (
         SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS ia, CAST(b.doc_id AS BIGINT) AS ib
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ),
       e0 AS MATERIALIZED (SELECT ia AS a, ib AS b FROM pairs),
""" + ktrussRoundsSql(3) + """
       SELECT a, b, support FROM e3 ORDER BY a, b"""),

    // identical sub-vector split, exact dot/max/sum cascade, same
    // deterministic top-10
    "q_ann_maxsim" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
                    FROM embeddings),
         tok AS (SELECT vec_id, i.i // 8 AS sub, i.i % 8 AS t, vv[i.i + 1] AS v
                 FROM e, range(64) i(i)),
         qs AS (SELECT vec_id AS qid, sub AS qsub, t, v AS qv
                FROM tok WHERE vec_id < 5),
         dots AS (SELECT q.qid, c.vec_id, q.qsub, c.sub,
                         CAST(sum(c.v * q.qv) AS BIGINT) AS dot
                  FROM tok c JOIN qs q ON q.t = c.t
                  WHERE c.vec_id >= 5 GROUP BY 1, 2, 3, 4),
         best AS (SELECT qid, vec_id, qsub, max(dot) AS best
                  FROM dots GROUP BY 1, 2, 3),
         scores AS (SELECT qid, vec_id, CAST(sum(best) AS BIGINT) AS maxsim
                    FROM best GROUP BY 1, 2),
         ranked AS (SELECT qid, vec_id, maxsim,
                           CAST(row_number() OVER (PARTITION BY qid
                                ORDER BY maxsim DESC, vec_id) AS BIGINT) AS rank
                    FROM scores)
         SELECT qid, rank, vec_id, maxsim FROM ranked
         WHERE rank <= 10 ORDER BY qid, rank""",

    // identical per-source stride walk with the same +step bias (both
    // floor-div numerators non-negative on both engines)
    "q_sample_pps" ->
      """WITH c AS (
           SELECT source, doc_id, n_chars,
                  sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(n_chars) OVER (PARTITION BY source) AS tot
           FROM documents),
         h AS (
           SELECT source, doc_id, n_chars,
                  CAST(tot AS BIGINT) AS tot,
                  CAST(tot AS BIGINT) // 20 AS step,
                  CAST(tot AS BIGINT) // 20 // 2 AS off,
                  CAST(cum AS BIGINT) AS cum
           FROM c),
         m AS (
           SELECT source, doc_id, n_chars, tot,
                  (cum - off + step) // step
                    - (cum - n_chars - off + step) // step AS mult
           FROM h)
         SELECT source, doc_id, n_chars, CAST(mult AS BIGINT) AS mult,
                CAST(sum(mult) OVER (PARTITION BY source) AS BIGINT) AS n_selected,
                CAST(sum(mult * tot // (20 * n_chars))
                     OVER (PARTITION BY source) AS BIGINT) AS hh_est
         FROM m WHERE mult > 0 ORDER BY source, doc_id""",

    // the identical recursive walk (// is DuckDB's floor-div spelling
    // of Spark's div — same floor on non-negative ints)
    "q_sql_recursive" ->
      """WITH RECURSIVE walk(doc_id, anc, depth) AS (
           SELECT doc_id, doc_id AS anc, CAST(0 AS BIGINT) AS depth
           FROM documents
           UNION ALL
           SELECT doc_id, anc // 3 AS anc, depth + 1 FROM walk WHERE anc > 0
         )
         SELECT depth, CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(sum(anc) AS BIGINT) AS anc_sum
         FROM walk GROUP BY depth ORDER BY depth""",

    // identical md5 rates/draws, floor-div HT weights, exact sums
    "q_sample_horvitz" ->
      """WITH d AS (
           SELECT source, n_chars,
                  100000 + CAST(('0x' || substr(md5(source), 1, 6))::UBIGINT AS BIGINT)
                           % 400001 AS rate_ppm,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT)
                           % 1000000 AS u_ppm
           FROM documents),
         a AS (
           SELECT source, rate_ppm, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(CASE WHEN u_ppm < rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                  CAST(sum(n_chars) AS BIGINT) AS true_total,
                  CAST(sum(CASE WHEN u_ppm < rate_ppm
                           THEN n_chars * 1000000 // rate_ppm ELSE 0 END) AS BIGINT) AS ht_total
           FROM d GROUP BY 1, 2)
         SELECT source, rate_ppm, n_docs, n_sampled, true_total, ht_total,
                abs(ht_total - true_total) * 1000000 // true_total AS err_ppm
         FROM a ORDER BY source""",

    // identical bin stream, min-max interval cascade with the same
    // (rate, k)/(rate desc, j) row_number tie-breaks, ppm from the
    // chosen interval's exact integer sums
    "q_eval_isotonic" ->
      """WITH base AS (
           SELECT CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT)
                    % 1000000 AS p_ppm,
                  CAST(('0x' || substr(md5('y' || CAST(vec_id AS VARCHAR)), 1, 6))::UBIGINT AS BIGINT)
                    % 1000000 AS draw
           FROM embeddings),
         bins AS MATERIALIZED (
           SELECT p_ppm // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN draw < p_ppm THEN 1 ELSE 0 END) AS BIGINT) AS pos
           FROM base GROUP BY 1),
         iv AS MATERIALIZED (
           SELECT l.bin AS jb, u.bin AS kb,
                  CAST(sum(m.n) AS BIGINT) AS ivn, CAST(sum(m.pos) AS BIGINT) AS ivpos,
                  CAST(sum(m.pos) AS DOUBLE) / CAST(sum(m.n) AS DOUBLE) AS rate
           FROM bins l JOIN bins u ON l.bin <= u.bin
           JOIN bins m ON m.bin BETWEEN l.bin AND u.bin
           GROUP BY 1, 2),
         fit AS (
           SELECT b.bin AS i, b.n, b.pos, iv.jb, iv.kb, iv.ivn, iv.ivpos, iv.rate,
                  row_number() OVER (PARTITION BY b.bin, iv.jb
                                     ORDER BY iv.rate, iv.kb) AS rn_min
           FROM bins b JOIN iv ON iv.jb <= b.bin AND b.bin <= iv.kb),
         mx AS (
           SELECT *, row_number() OVER (PARTITION BY i
                                        ORDER BY rate DESC, jb) AS rn_max
           FROM fit WHERE rn_min = 1)
         SELECT i AS bin, n, pos, pos * 1000000 // n AS raw_ppm,
                jb, kb, ivpos * 1000000 // ivn AS iso_ppm
         FROM mx WHERE rn_max = 1 ORDER BY bin""",

    // identical day-grain series, all-integer concordance counts,
    // ONE sqrt-of-integer-product division for tau_b
    "q_events_kendall" ->
      """WITH daily AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         xy AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  a.day AS day, a.cnt AS x, b.cnt AS y
           FROM daily a JOIN daily b
             ON a.day = b.day AND a.event_type < b.event_type),
         pr AS (
           SELECT p.type_a, p.type_b, p.x - q.x AS dx, p.y - q.y AS dy
           FROM xy p JOIN xy q
             ON p.type_a = q.type_a AND p.type_b = q.type_b AND p.day < q.day),
         ag AS (
           SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                  CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
                  CAST(sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                  CAST(sum(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
           FROM pr GROUP BY 1, 2)
         SELECT type_a, type_b, n_pairs, nc, nd, tx, ty,
                round(CAST(nc - nd AS DOUBLE) /
                      sqrt(CAST((nc + nd + tx) * (nc + nd + ty) AS DOUBLE)), 6)
                  + 0.0 AS tau_b
         FROM ag ORDER BY type_a, type_b""",

    // identical day-grain outcome, five-sum OLS per side with the
    // unrounded slope evaluated at the cutoff, nullif-free (both
    // sides have 15 x-points by construction)
    "q_events_rdd" ->
      """WITH d AS (
           SELECT event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 - 19723 AS x,
                  CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         sd AS (
           SELECT event_type, CASE WHEN x < 15 THEN 'left' ELSE 'right' END AS side,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS DOUBLE) AS dsx, CAST(sum(y) AS DOUBLE) AS dsy,
                  CAST(sum(x * y) AS DOUBLE) AS dsxy,
                  CAST(sum(x * x) AS DOUBLE) AS dsxx,
                  CAST(count(*) AS DOUBLE) AS nd
           FROM d GROUP BY 1, 2),
         sl AS (
           SELECT event_type, side, n,
                  (dsxy * nd - dsx * dsy) / (dsxx * nd - dsx * dsx) AS slope,
                  dsx, dsy, nd
           FROM sd),
         yh AS (
           SELECT event_type, side, n,
                  (dsy - slope * dsx) / nd + slope * 15.0 AS yhat
           FROM sl),
         ag AS (
           SELECT event_type,
                  CAST(sum(CASE WHEN side = 'left' THEN n ELSE 0 END) AS BIGINT) AS n_left,
                  CAST(sum(CASE WHEN side = 'right' THEN n ELSE 0 END) AS BIGINT) AS n_right,
                  max(CASE WHEN side = 'left' THEN yhat END) AS yl,
                  max(CASE WHEN side = 'right' THEN yhat END) AS yr
           FROM yh GROUP BY 1)
         SELECT event_type, n_left, n_right,
                round(yl, 6) + 0.0 AS yhat_left,
                round(yr, 6) + 0.0 AS yhat_right,
                round(yr - yl, 6) + 0.0 AS effect
         FROM ag ORDER BY event_type""",

    // identical lifetimes/censoring/risk-set machinery as the KM
    // oracle; the cumulative hazard folds the same exact-ratio doubles
    // in the same ascending order via list_reduce
    "q_events_nelson_aalen" ->
      """WITH u AS (SELECT user_id,
                           min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS birth,
                           max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS death
                    FROM events GROUP BY 1),
            h AS (SELECT max(death) AS d_max FROM u),
            lv AS (SELECT (death - birth) AS t,
                          CASE WHEN death > d_max - 7 THEN 1 ELSE 0 END AS cens
                   FROM u, h),
            bt AS (SELECT t, CAST(sum(1 - cens) AS BIGINT) AS d,
                          CAST(sum(cens) AS BIGINT) AS c
                   FROM lv GROUP BY 1),
            nr AS (SELECT t, d, c,
                          CAST(sum(d + c) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS n_risk
                   FROM bt),
            f AS (SELECT t, n_risk, d, c,
                         CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hz
                  FROM nr),
            sv AS (SELECT t, n_risk, d, c, hz,
                          list(hz) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS hs
                   FROM f)
         SELECT t, n_risk, d, c, round(hz, 6) AS hazard,
                round(list_reduce(hs, (a, b) -> a + b), 6) AS cumhaz
         FROM sv ORDER BY t""",

    // identical ppm profiles and the identical flat-list row-major DP
    // fold; DuckDB 1.0's list_reduce has no init argument (the init
    // state rides as a prepended element) and mis-evaluates STRUCT
    // accumulators, so the DP state is the same [prev ++ cur] BIGINT
    // list on both engines
    "q_events_dtw" ->
      """WITH daily AS (
           SELECT event_type,
                  (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 AS dow,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, dow, cnt,
                  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
           FROM daily),
         prof AS (
           SELECT event_type, list(cnt * 1000000 // total ORDER BY dow) AS xs
           FROM tot GROUP BY 1 HAVING count(*) = 7),
         pr AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  a.xs AS xs, b.xs AS ys
           FROM prof a JOIN prof b ON a.event_type < b.event_type),
         dp AS (
           SELECT type_a, type_b,
                  list_reduce(list_transform(range(1, 8), i -> abs(xs[i] - ys[i])),
                              (a, b) -> a + b) AS l1,
                  (list_reduce(
                    list_prepend(
                      list_append(list_prepend(0::BIGINT,
                        list_transform(range(1, 8), z -> 1000000000000000::BIGINT)),
                        1000000000000000::BIGINT),
                      list_transform(range(0, 49), k ->
                        [(k % 7 + 1)::BIGINT, abs(xs[k // 7 + 1] - ys[k % 7 + 1])])),
                    (a, e) -> CASE WHEN e[1] = 7
                      THEN list_append(list_append(a[9:],
                             e[2] + least(a[e[1] + 1], a[e[1]], a[8 + e[1]])),
                             1000000000000000::BIGINT)
                      ELSE list_append(a,
                             e[2] + least(a[e[1] + 1], a[e[1]], a[8 + e[1]])) END
                  ))[8] AS dtw
           FROM pr)
         SELECT type_a, type_b, l1, dtw FROM dp ORDER BY type_a, type_b""",

    // identical ordered daily series; the same α=β=½ recurrence folded
    // through the same prepended-init trick — halving is IEEE-exact so
    // both engines walk identical doubles
    "q_events_holt" ->
      """WITH daily AS (
           SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         ser AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                  list(CAST(cnt AS DOUBLE) ORDER BY day) AS ys
           FROM daily GROUP BY 1),
         fit AS (
           SELECT event_type, n_days,
                  list_reduce(
                    list_prepend([ys[1], 0.0::DOUBLE],
                      list_transform(ys[2:], yy -> [yy, 0.0::DOUBLE])),
                    (a, e) -> [0.5 * e[1] + 0.5 * (a[1] + a[2]),
                               0.5 * ((0.5 * e[1] + 0.5 * (a[1] + a[2])) - a[1])
                                    + 0.5 * a[2]]) AS f
           FROM ser)
         SELECT event_type, n_days,
                round(f[1], 6) + 0.0 AS level, round(f[2], 6) + 0.0 AS trend,
                round(f[1] + 7.0 * f[2], 6) + 0.0 AS forecast7
         FROM fit ORDER BY event_type""",

    // the IDENTICAL generated step chain (graft.functions.Hilbert) —
    // engine-neutral CASE/&/arithmetic only, so the curve is
    // bit-identical by construction
    "q_layout_hilbert" ->
      s"""WITH b0 AS (SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y,
                            l_partkey % 256 AS x0, l_suppkey % 256 AS y0,
                            CAST(0 AS BIGINT) AS d0 FROM lineitem),
            ${graft.functions.Hilbert.ctesSql(8, Seq("x", "y"))}
         SELECT d8 // 1024 AS hbucket, CAST(count(*) AS BIGINT) AS n,
                min(x) AS x_min, max(x) AS x_max,
                min(y) AS y_min, max(y) AS y_max,
                min(d8) AS h_min, max(d8) AS h_max
         FROM b8 GROUP BY 1 ORDER BY 1""",

    // identical blocking, exact-integer u statistics, the identical 6
    // e6-rounded ln evaluations and integer thresholds
    "q_join_fellegi" ->
      """WITH p AS (
           SELECT p_partkey, p_brand, p_size, p_type,
                  string_split(p_name, ' ')[1] AS blk
           FROM part WHERE p_partkey < 2000),
         st AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_tot,
                  (SELECT CAST(sum(nv * (nv - 1)) AS BIGINT) FROM
                    (SELECT count(*) AS nv FROM p GROUP BY p_brand)) AS u_p_brand,
                  (SELECT CAST(sum(nv * (nv - 1)) AS BIGINT) FROM
                    (SELECT count(*) AS nv FROM p GROUP BY p_size)) AS u_p_size,
                  (SELECT CAST(sum(nv * (nv - 1)) AS BIGINT) FROM
                    (SELECT count(*) AS nv FROM p GROUP BY p_type)) AS u_p_type),
         pat AS (
           SELECT CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS g_brand,
                  CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS g_size,
                  CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS g_type
           FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey),
         ag AS (
           SELECT CAST(g_brand AS BIGINT) AS g_brand, CAST(g_size AS BIGINT) AS g_size,
                  CAST(g_type AS BIGINT) AS g_type,
                  CAST(count(*) AS BIGINT) AS n_pairs
           FROM pat GROUP BY 1, 2, 3),
         wt AS (
           SELECT g_brand, g_size, g_type, n_pairs,
             CAST(round(ln(CASE WHEN g_brand = 1
               THEN (0.9::DOUBLE * CAST(n_tot * (n_tot - 1) AS DOUBLE)) / CAST(u_p_brand AS DOUBLE)
               ELSE 0.1::DOUBLE / (1.0::DOUBLE - CAST(u_p_brand AS DOUBLE) / CAST(n_tot * (n_tot - 1) AS DOUBLE))
               END) * 1000000) AS BIGINT) +
             CAST(round(ln(CASE WHEN g_size = 1
               THEN (0.9::DOUBLE * CAST(n_tot * (n_tot - 1) AS DOUBLE)) / CAST(u_p_size AS DOUBLE)
               ELSE 0.1::DOUBLE / (1.0::DOUBLE - CAST(u_p_size AS DOUBLE) / CAST(n_tot * (n_tot - 1) AS DOUBLE))
               END) * 1000000) AS BIGINT) +
             CAST(round(ln(CASE WHEN g_type = 1
               THEN (0.9::DOUBLE * CAST(n_tot * (n_tot - 1) AS DOUBLE)) / CAST(u_p_type AS DOUBLE)
               ELSE 0.1::DOUBLE / (1.0::DOUBLE - CAST(u_p_type AS DOUBLE) / CAST(n_tot * (n_tot - 1) AS DOUBLE))
               END) * 1000000) AS BIGINT) AS weight_e6
           FROM ag, st)
         SELECT g_brand, g_size, g_type, n_pairs, weight_e6,
                CASE WHEN weight_e6 >= 4000000 THEN 'link'
                     WHEN weight_e6 >= 0 THEN 'possible'
                     ELSE 'non_link' END AS decision
         FROM wt ORDER BY g_brand, g_size, g_type""",

    // identical md5 boundary classes, start/end zips, and chunk
    // fingerprints; identical integer savings arithmetic
    "q_dedup_cdc" ->
      """WITH d AS (
           SELECT source, string_split(text, ' ') AS tk,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         g AS (SELECT source, tk, n FROM d WHERE n >= 1),
         b AS (
           SELECT source, tk, n,
                  list_filter(range(1, n + 1), i ->
                    CAST(('0x' || substr(md5(tk[i]), 1, 6))::UBIGINT AS BIGINT)
                      % 8 = 0) AS bpos
           FROM g),
         se AS (
           SELECT source, tk,
                  list_prepend(1::BIGINT, list_transform(bpos, p -> p + 1)) AS starts,
                  list_append(bpos, n) AS ends
           FROM b),
         ch AS (
           SELECT source,
                  unnest(list_filter(
                    list_transform(range(1, len(starts) + 1), i ->
                      CASE WHEN ends[i] >= starts[i] THEN
                        {'txt': array_to_string(
                                  list_slice(tk, starts[i], ends[i]), ' '),
                         'clen': ends[i] - starts[i] + 1} END),
                    x -> x IS NOT NULL)) AS c
           FROM se),
         fp AS (
           SELECT source, substr(md5(c.txt), 1, 16) AS fp,
                  CAST(count(*) AS BIGINT) AS n_copies,
                  CAST(max(c.clen) AS BIGINT) AS clen
           FROM ch GROUP BY 1, 2),
         ag AS (
           SELECT source, CAST(sum(n_copies) AS BIGINT) AS n_chunks,
                  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
                  CAST(sum(clen * n_copies) AS BIGINT) AS total_tokens,
                  CAST(sum(clen) AS BIGINT) AS distinct_tokens
           FROM fp GROUP BY 1)
         SELECT source, n_chunks, n_distinct_chunks, total_tokens,
                distinct_tokens,
                (total_tokens - distinct_tokens) * 1000000 // total_tokens
                  AS savings_ppm
         FROM ag ORDER BY source""",

    // identical integer code-length scan ((nn−1) >> ll form), exact
    // 2^-40 Kraft numerators, and the identical e6-rounded log2 terms
    "q_text_shannon_code" ->
      """WITH w AS (
           SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
         v AS (
           SELECT source, word, CAST(count(*) AS BIGINT) AS nv
           FROM w WHERE length(word) > 0 GROUP BY 1, 2),
         t2 AS (
           SELECT source, nv,
                  CAST(sum(nv) OVER (PARTITION BY source) AS BIGINT) AS nn
           FROM v),
         l AS (
           SELECT source, nv, nn,
                  CAST(len(list_filter(range(0, 40), ll ->
                    nv <= ((nn - 1) >> ll))) AS BIGINT) AS l,
                  CAST(round(CAST(nv AS DOUBLE) / CAST(nn AS DOUBLE) *
                    log2(CAST(nn AS DOUBLE) / CAST(nv AS DOUBLE)) * 1000000)
                    AS BIGINT) AS term_e6
           FROM t2)
         SELECT source, CAST(count(*) AS BIGINT) AS vocab_size,
                CAST(max(nn) AS BIGINT) AS n_tokens,
                CAST(sum(1::BIGINT << CAST(40 - l AS INTEGER)) AS BIGINT) AS kraft_num,
                CAST(sum(nv * l) AS BIGINT) * 1000000 // CAST(max(nn) AS BIGINT)
                  AS avg_len_ppm,
                CAST(sum(term_e6) AS BIGINT) AS entropy_e6
         FROM l GROUP BY source ORDER BY source""",

    // identical md5 token hashes, identical cur·3+h mod 2^61−1 phrase
    // chain, identical greedy parse via the same list-accumulator fold
    "q_text_lz78" ->
      """WITH d AS (
           SELECT source, string_split(text, ' ') AS tk
           FROM documents WHERE len(string_split(text, ' ')) >= 1),
         p AS (
           SELECT source, CAST(len(tk) AS BIGINT) AS ntok,
                  list_reduce(
                    list_prepend([0::BIGINT, 0::BIGINT],
                      list_transform(tk, w ->
                        [CAST(('0x' || substr(md5(w), 1, 6))::UBIGINT AS BIGINT)])),
                    (a, e) -> CASE WHEN list_contains(a[3:],
                        (a[2] * 3 + e[1]) % 2305843009213693951)
                      THEN list_concat(
                        [a[1], (a[2] * 3 + e[1]) % 2305843009213693951], a[3:])
                      ELSE list_concat([a[1] + 1, 0::BIGINT],
                        list_append(a[3:],
                          (a[2] * 3 + e[1]) % 2305843009213693951)) END) AS st
           FROM d),
         z AS (
           SELECT source, ntok,
                  st[1] + CASE WHEN st[2] <> 0 THEN 1 ELSE 0 END AS lz
           FROM p)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ntok) AS BIGINT) AS n_tokens,
                CAST(sum(lz) AS BIGINT) AS lz_phrases,
                CAST(sum(lz) AS BIGINT) * 1000000 // CAST(sum(ntok) AS BIGINT)
                  AS lz_ratio_ppm
         FROM z GROUP BY source ORDER BY source""",

    // identical journeys (ts, event_id order), identical flat-list NW
    // fold with dynamic len(ys) offsets and gap borders
    "q_events_nw_align" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
                  CAST(('0x' || substr(md5(event_type), 1, 6))::UBIGINT AS BIGINT)
                    % 97 AS sym
           FROM events WHERE user_id < 8),
         s AS (
           SELECT user_id,
                  list_slice(list(sym ORDER BY ts, event_id), 1, 10) AS xs
           FROM e GROUP BY 1),
         pr AS (
           SELECT a.user_id AS user_a, b.user_id AS user_b,
                  a.xs AS xs, b.xs AS ys
           FROM s a JOIN s b ON a.user_id < b.user_id),
         dp AS (
           SELECT user_a, user_b,
                  CAST(len(xs) AS BIGINT) AS len_a,
                  CAST(len(ys) AS BIGINT) AS len_b,
                  (list_reduce(
                    list_prepend(
                      list_append(list_transform(range(0, len(ys) + 1),
                        i -> (-i)::BIGINT), (-1)::BIGINT),
                      list_transform(range(0, len(xs) * len(ys)), k ->
                        [(k % len(ys) + 1)::BIGINT,
                         (CASE WHEN xs[k // len(ys) + 1] = ys[k % len(ys) + 1]
                          THEN 2 ELSE -1 END)::BIGINT])),
                    (a, e) -> CASE WHEN e[1] = len(ys)
                      THEN list_append(list_append(
                             list_slice(a, len(ys) + 2, 2 * len(ys) + 1),
                             greatest(a[e[1]] + e[2], a[e[1] + 1] - 1,
                                      a[len(ys) + 1 + e[1]] - 1)),
                             a[len(ys) + 2] - 1)
                      ELSE list_append(a,
                             greatest(a[e[1]] + e[2], a[e[1] + 1] - 1,
                                      a[len(ys) + 1 + e[1]] - 1)) END
                  ))[len(ys) + 1] AS nw_score
           FROM pr)
         SELECT user_a, user_b, len_a, len_b, nw_score
         FROM dp ORDER BY user_a, user_b""",
  )

  /** The 8 bit_or'd 32-bit bloom words (w0..w7) for the oracle — built
    * programmatically so the word/bit arithmetic provably matches the
    * engine's loop. */
  private def bloomWordsSql: String =
    (0 until 8).map { w =>
      def c(h: String) =
        s"(CASE WHEN $h // 32 = $w THEN (1::BIGINT << CAST($h % 32 AS INTEGER)) ELSE 0 END)"
      s"bit_or(${c("h1")} | ${c("h2")}) AS w$w"
    }.mkString(",\n                   ")

  private def bloomWordArr: String =
    s"[${(0 until 8).map(i => s"w$i").mkString(", ")}]"

  /** The n unrolled PageRank power-iteration CTEs (r1..rn), each
    * reading the previous round — generated so the oracle's round
    * count provably matches the engine's loop bound. */
  /** The n unrolled HITS rounds (a1,h1..an,hn from h0) — each pull is
    * a LEFT JOIN sum keyed by the far endpoint followed by the exact
    * integer max-normalization, generated so the oracle's round count
    * provably matches the engine's loop bound. */
  private def hitsRoundsSql(n: Int): String =
    (1 to n).flatMap { i =>
      def pull(out: String, in: String, from: String, to: String) =
        s"""${out}r AS (
           SELECT n.id, CAST(coalesce(s.v, 0) AS BIGINT) AS raw
           FROM nodes n LEFT JOIN (
             SELECT e.$to AS nid, sum(x.x) AS v
             FROM edges e JOIN $in x ON x.id = e.$from
             GROUP BY 1) s ON s.nid = n.id),
         $out AS (
           SELECT id, CAST(CASE WHEN m.mx > 0 THEN (raw * 1000000) // m.mx
                                ELSE 0 END AS BIGINT) AS x
           FROM ${out}r, (SELECT max(raw) AS mx FROM ${out}r) m)"""
      Seq(pull(s"a$i", s"h${i - 1}", "src", "dst"),
        pull(s"h$i", s"a$i", "dst", "src"))
    }.mkString(",\n")

  /** The n unrolled personalized-pagerank rounds — identical to
    * [[pagerankRoundsSql]] except the teleport term lands only on
    * seed nodes (150000·seed instead of a flat 150000). */
  private def pprRoundsSql(n: Int): String =
    (1 to n).map { i =>
      s"""r$i AS (
         SELECT n.id,
                CAST(150000 * n.seed + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS pr
         FROM nodes n LEFT JOIN (
           SELECT e.dst, sum(r.pr // d.deg) AS m
           FROM edges e JOIN r${i - 1} r ON r.id = e.src
                JOIN deg d ON d.src = e.src
           GROUP BY e.dst) s ON s.dst = n.id)"""
    }.mkString(",\n")

  /** The n unrolled truss-peeling rounds (tri1,s1,e1.. from e0) —
    * oriented triangle enumeration (a<b<c, one row per triangle) +
    * 3-way edge fan-out + support filter per round, generated so the
    * oracle's round count provably matches the engine's loop bound. */
  private def ktrussRoundsSql(n: Int): String =
    // Each round CTE is referenced 3× by the next; DuckDB 1.0 inlines
    // CTEs by default, so without MATERIALIZED the base simhash-pair
    // derivation would be re-evaluated ~3^(2n) times (measured: hang
    // at sf0.001 vs 0.6 s materialized).
    (1 to n).map { i =>
      s"""tri$i AS MATERIALIZED (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
                  FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e1.b = e2.a
                  JOIN e${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
       s$i AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS support
               FROM (SELECT ta AS a, tb AS b FROM tri$i
                     UNION ALL SELECT tb AS a, tc AS b FROM tri$i
                     UNION ALL SELECT ta AS a, tc AS b FROM tri$i)
               GROUP BY 1, 2),
       e$i AS MATERIALIZED (SELECT a, b, support FROM s$i WHERE support >= 2)"""
    }.mkString(",\n")

  private def pagerankRoundsSql(n: Int): String =
    (1 to n).map { i =>
      s"""r$i AS (
         SELECT n.id,
                CAST(150000 + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS pr
         FROM nodes n LEFT JOIN (
           SELECT e.dst, sum(r.pr // d.deg) AS m
           FROM edges e JOIN r${i - 1} r ON r.id = e.src
                JOIN deg d ON d.src = e.src
           GROUP BY e.dst) s ON s.dst = n.id)"""
    }.mkString(",\n")
}

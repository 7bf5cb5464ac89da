package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed sketch operators: bounded-memory heavy hitters
  * (Misra-Gries per partition + exact recount) and a from-scratch
  * HyperLogLog distinct estimator on portable md5 hashing. Both are the
  * sketch-then-verify / register-merge shapes a 100 TB corpus runs
  * instead of full-cardinality shuffles; both are deterministic in
  * their FINAL output regardless of partitioning (the MG candidate set
  * varies with partitioning, the exact recount does not; HLL registers
  * are pure functions of the value set).
  */
object Sketches {

  /** Per-partition Misra-Gries candidate keys (capacity `cap`). The
    * union over partitions is a SUPERSET of every token with global
    * frequency > N/cap: if a heavy hitter x survived no partition
    * summary, every partition absorbed x's full local count via
    * decrements, and each of the cap-sized summary's decrement rounds
    * eats cap+1 occurrences — so x's global count f ≤ Σ n_p/cap = N/cap,
    * a contradiction with f > N/cap. O(cap) state per task, one pass. */
  def mgCandidates(toks: Dataset[String], cap: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { tk =>
        m.get(tk) match {
          case Some(c)              => m.update(tk, c + 1)
          case None if m.size < cap => m.update(tk, 1L)
          case None =>
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
        }
      }
      m.keysIterator
    }.toDF("tok").distinct()
  }

  /** Exact heavy hitters (global frequency > N/k) via the MG candidate
    * superset + ONE exact recount over a broadcast semi-join. Requires
    * cap ≥ k (the superset guarantee is at the N/cap level). `n` is the
    * corpus token count — one driver scalar (the threshold, not the
    * data). Output: (tok, freq) for every tok with freq > n/k, exact
    * and partitioning-invariant. */
  def heavyHitters(toks: DataFrame, cap: Int, k: Long): DataFrame = {
    require(cap >= k, s"MG capacity $cap must be >= k=$k for the superset guarantee")
    val spark = toks.sparkSession
    import spark.implicits._
    val col0 = toks.columns.head
    val t = toks.select(col(col0).as("tok"))
    val n = t.count()
    val cand = mgCandidates(t.as[String], cap)
    t.join(broadcast(cand), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") > lit(n / k))
      .orderBy(col("tok"))
  }

  /** HyperLogLog distinct estimate, m=64 registers, built from the
    * md5-portable 56-bit hash so a DuckDB oracle reproduces the
    * registers bit-for-bit: bucket = low 6 bits, rho = leading-zero
    * rank of the remaining 50 bits (via minimal binary-string length —
    * exact, no float log), per-bucket max rho, harmonic sum
    * INTEGERIZED as S = Σ 2^(51-M_j) (one exact BIGINT), so the only
    * floating-point op is the final alpha·m²·2^51 / S division +
    * round — deterministic across engines. Raw estimator only: the
    * small-range (linear-counting) correction needs ln and is applied
    * by the CONSUMER from the emitted nonzero-register count (see
    * SketchSpec). Output: 1 row (m, nonzero, s_scaled, hll_est). */
  def hllSketch(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    val col0 = toks.columns.head
    val rho = toks
      .select(conv(substring(md5(col(col0)), 1, 14), 16, 10).cast("long").as("h"))
      .select((col("h") % 64).as("bucket"), expr("shiftright(h, 6)").as("w"))
      .select(col("bucket"),
        when(col("w") === 0, lit(51))
          .otherwise(lit(51) - length(conv(col("w"), 10, 2)))
          .cast("int").as("rho"))
    val regs = spark.range(0, 64).toDF("bucket")
      .join(rho.groupBy(col("bucket")).agg(max(col("rho")).as("mx")),
        Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("mx"), lit(0)).as("mj"))
    regs.agg(
        count(when(col("mj") > 0, 1)).as("nonzero"),
        sum(expr("shiftleft(cast(1 as bigint), 51 - mj)")).as("s_scaled"))
      .select(lit(64L).as("m"), col("nonzero").cast("long").as("nonzero"),
        col("s_scaled").cast("long").as("s_scaled"),
        round(lit(0.709) * lit(64) * lit(64) * lit(2251799813685248.0) /
          col("s_scaled"), 3).as("hll_est"))
  }

  /** Per-key HLL: the same 64 portable md5 registers built PER GROUP —
    * sketch-as-aggregation, the shape a 100 TB per-tenant/per-source
    * distinct report runs (one partial+final agg to keys×64 register
    * rows; no count(DISTINCT) shuffle of the raw values). The register
    * scaffold (every key × all 64 buckets, so empty registers read 0)
    * is a broadcast cross of the tiny key set against literal range 64.
    * Output: one row per key (key, m, nonzero, s_scaled, hll_est),
    * ordered by key. */
  def hllSketchBy(toks: DataFrame, key: String): DataFrame = {
    val spark = toks.sparkSession
    val valueCol = toks.columns.filter(_ != key).head
    val rho = toks
      .select(col(key),
        conv(substring(md5(col(valueCol)), 1, 14), 16, 10).cast("long").as("h"))
      .select(col(key), (col("h") % 64).as("bucket"), expr("shiftright(h, 6)").as("w"))
      .select(col(key), col("bucket"),
        when(col("w") === 0, lit(51))
          .otherwise(lit(51) - length(conv(col("w"), 10, 2)))
          .cast("int").as("rho"))
    val scaffold = toks.select(col(key)).distinct()
      .crossJoin(broadcast(spark.range(0, 64).toDF("bucket")))
    val regs = scaffold
      .join(rho.groupBy(col(key), col("bucket")).agg(max(col("rho")).as("mx")),
        Seq(key, "bucket"), "left")
      .select(col(key), coalesce(col("mx"), lit(0)).as("mj"))
    regs.groupBy(col(key)).agg(
        count(when(col("mj") > 0, 1)).as("nz"),
        sum(expr("shiftleft(cast(1 as bigint), 51 - mj)")).as("ss"))
      .select(col(key), lit(64L).as("m"), col("nz").cast("long").as("nonzero"),
        col("ss").cast("long").as("s_scaled"),
        round(lit(0.709) * lit(64) * lit(64) * lit(2251799813685248.0) /
          col("ss"), 3).as("hll_est"))
      .orderBy(col(key))
  }

  /** The consumer-side small-range correction (linear counting when
    * empty registers remain): the standard HLL practice, kept out of
    * the cross-engine query because it needs ln. */
  def corrected(m: Long, nonzero: Long, rawEst: Double): Double = {
    val v = m - nonzero
    if (v > 0 && rawEst <= 2.5 * m) m * math.log(m.toDouble / v) else rawEst
  }
}

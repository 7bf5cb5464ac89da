package graft.functions

/** Hilbert curve (xy→d) as a generated, engine-neutral SQL step chain —
  * the locality-preserving alternative to [[ZOrder]]: consecutive
  * Hilbert indices are always grid-adjacent (|Δx|+|Δy| = 1), so a
  * Hilbert-bucketed layout keeps 2-D box queries even denser per file
  * than Morton order, whose bit-interleave takes long diagonal jumps at
  * quadrant boundaries. The classic iterative xy2d walk (per bit level:
  * quadrant contribution s²·((3·rx) XOR ry), then the conditional
  * flip+swap rotation) is unrolled into one projection per bit level —
  * each step references only the previous step's output columns, so the
  * expression tree stays LINEAR in `bits` (a single nested Column
  * expression would blow up exponentially through the rotation's
  * branching). The identical SQL text drives both Spark (`selectExpr`
  * chain) and the DuckDB oracle (CTE chain), making the curve
  * bit-identical across engines by construction.
  */
object Hilbert {

  /** SQL items computing step i+1's state (x{i+1}, y{i+1}, d{i+1})
    * from step i's (x$i, y$i, d$i) for an n×n grid (n = 1 << bits).
    * Only CASE/&/arithmetic appear — shared verbatim by both engines.
    * The quadrant value (3·rx) XOR ry is spelled arithmetically
    * (ry=1 → 1+rx, ry=0 → 3·rx) to avoid engine-specific XOR syntax. */
  def stepSqlItems(i: Int, bits: Int): Seq[String] = {
    val s = 1L << (bits - 1 - i)
    val n = 1L << bits
    val rx = s"(CASE WHEN (x$i & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y$i & $s) > 0 THEN 1 ELSE 0 END)"
    Seq(
      s"d$i + $s * $s * (CASE WHEN $ry = 1 THEN 1 + $rx ELSE 3 * $rx END) AS d${i + 1}",
      s"CASE WHEN $ry = 1 THEN x$i WHEN $rx = 1 THEN ${n - 1} - y$i ELSE y$i END AS x${i + 1}",
      s"CASE WHEN $ry = 1 THEN y$i WHEN $rx = 1 THEN ${n - 1} - x$i ELSE x$i END AS y${i + 1}")
  }

  /** The full oracle-side CTE chain body: b0 must provide (x0, y0, d0)
    * plus any carried columns named in `carry`; the result exposes
    * d$bits as the Hilbert index. */
  def ctesSql(bits: Int, carry: Seq[String]): String =
    (0 until bits).map { i =>
      val items = (carry ++ stepSqlItems(i, bits)).mkString(",\n                  ")
      s"b${i + 1} AS (SELECT $items FROM b$i)"
    }.mkString(",\n            ")

  /** Spark-side application: chains one selectExpr per bit level over a
    * DataFrame carrying (x0, y0, d0) and `carry` columns; adds column
    * `h` = the Hilbert index. */
  def withHilbert(df: org.apache.spark.sql.DataFrame, bits: Int,
      carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    var cur = df
    for (i <- 0 until bits)
      cur = cur.selectExpr(carry ++ stepSqlItems(i, bits): _*)
    cur.withColumnRenamed(s"d$bits", "h")
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** BPE vocabulary TRAINING — learns the merge table itself (the one
  * `Bpe` applies) from a corpus, making the BPE story end-to-end
  * rather than apply-only.
  *
  * Training spec (identical across the three implementations that pin
  * each other — `train` on Spark, `trainRef` on plain collections, and
  * the CPython script that produced resources/bpe_train_expected.tsv):
  *  - words = pretoken frequency table of the corpus (Bpe's
  *    pretokenizer, one count per occurrence);
  *  - repeat up to nMerges times: count adjacent symbol pairs weighted
  *    by word frequency (every adjacent position counts, overlapping
  *    included); pick the highest count, ties broken by smallest
  *    (left, right) pair lexicographically; STOP if the best count < 2;
  *    merge that pair in every word left-to-right in a single pass.
  *
  * Scale shape of `train`: the corpus is touched ONCE (pretokenize +
  * count = one shuffle); every Lloyd-style iteration then runs on the
  * aggregated (syms, weight) word table, which is vocabulary-sized —
  * tiny relative to the corpus at any SF (a 100 TB corpus still has a
  * bounded pretoken vocabulary). Per iteration: one partial+final agg
  * for the pair count, a 1-row collect for the argmax, and a map-side
  * merge rewrite; the word table is localCheckpoint'ed per iteration so
  * 30 iterations don't stack 30 HOF plans. The HOF fold in the merge
  * rewrite is CodegenFallback — acceptable OFF the hot path (this is
  * the trainer; the encoder stays codegen-friendly). */
object BpeTrain {

  /** Left-to-right single-pass merge of (a,b) in one symbol sequence —
    * the shared primitive of the reference trainer and the spec. */
  private[graft] def mergeOnce(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
    }
    out.result()
  }

  /** Code-point string comparison (== UTF-8 byte order). Scala's
    * default String ordering compares UTF-16 code units, which diverges
    * from both Spark's UTF8-binary sort and CPython's code-point
    * comparison for non-BMP characters (surrogates sort above U+E000 in
    * code-unit order) — the argmax tie-break must use THIS order so all
    * three trainers agree on any corpus, not just BMP/ASCII ones. */
  private[graft] def codePointCompare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val pairTieOrdering: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      def compare(p: ((String, String), Long), q: ((String, String), Long)): Int = {
        val c0 = java.lang.Long.compare(q._2, p._2) // highest count wins
        if (c0 != 0) c0
        else {
          val c1 = codePointCompare(p._1._1, q._1._1)
          if (c1 != 0) c1 else codePointCompare(p._1._2, q._1._2)
        }
      }
    }

  /** Reference trainer on plain collections — structurally independent
    * of the Spark implementation (used to write the oracle sidecar) and
    * CPython-pinned by BpeTrainSpec against the committed corpus. */
  def trainRef(words: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var table: Seq[(List[String], Long)] =
      words.map { case (w, n) => (w.toCharArray.map(String.valueOf(_)).toList, n) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, n) <- table; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((a, b), best) = counts.min(pairTieOrdering)
        if (best < 2) done = true
        else {
          merges += ((a, b))
          table = table.map { case (syms, n) => (mergeOnce(syms, a, b), n) }
        }
      }
      i += 1
    }
    merges.result()
  }

  /** The corpus's pretoken frequency table — the trainer's working set
    * (one distributed shuffle over the raw text; everything after runs
    * on this aggregate). */
  def wordTable(docs: DataFrame, textCol: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .flatMap(t => Bpe.pretokens(if (t == null) "" else t))
      .groupByKey(identity).count()
  }

  /** Spark-aggregation trainer: pair counts are a partial+final hash
    * agg over the exploded adjacent pairs; the merge rewrite is a
    * higher-order fold applied map-side; only the per-iteration argmax
    * row (ONE row) ever reaches the driver. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs, textCol)
      .map { case (w, n) => (w.toCharArray.map(String.valueOf(_)).toSeq, n) }
      .toDF("syms", "weight")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = words
        .select(col("weight"), explode(expr(
          """transform(slice(syms, 1, size(syms) - 1),
            |          (x, i) -> struct(x AS a, element_at(syms, i + 2) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("weight")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val a = top(0).getString(0); val b = top(0).getString(1)
        merges += ((a, b))
        // left-to-right single-pass merge as a fold: append x, except
        // when the accumulator's last element is `a` and x is `b` —
        // then replace that last element with the merged symbol. The
        // merged symbol can never itself re-match as `a` within the
        // same step unless it legitimately equals a+b == a (impossible:
        // b is non-empty), so the fold IS the single pass.
        val mergedSyms = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) => when(
            try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        val prev = words
        words = words.select(mergedSyms.as("syms"), col("weight"))
          .localCheckpoint(true) // truncate lineage: no nested-HOF plan stack
        prev.unpersist()
      }
      i += 1
    }
    words.unpersist()
    merges.result()
  }
}

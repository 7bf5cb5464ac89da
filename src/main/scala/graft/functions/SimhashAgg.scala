package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the `Aggregator` surface): 32-bit majority-vote SimHash
  * over per-token hash values. The buffer is the 32 running bit votes —
  * the natural form of what queries.Relational.simhashes spells as 32
  * separate sum columns; both register the same fingerprint, and both
  * are checked against the same DuckDB oracle (q_dedup_simhash vs
  * q_dedup_simhash_agg).
  *
  * Input is the token's 32-bit hash (low 32 bits significant); output
  * is the fingerprint as a non-negative long.
  */
object SimhashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](32)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < 32) {
      buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 32) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExprEnc.arrayInt
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

private object ExprEnc {
  val arrayInt: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}

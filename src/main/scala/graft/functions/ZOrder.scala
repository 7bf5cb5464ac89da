package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities for multi-dimensional data
  * clustering — the layout trick that makes a 100 TB table prunable on
  * TWO correlated dimensions at once: rows sorted/partitioned by the
  * bit-interleaved z-value keep both coordinates locally dense, so a
  * box predicate touches only the buckets whose z-prefix region
  * intersects the box (file/partition skipping), instead of a full
  * scan that a single-column sort would force on the second dimension.
  *
  * The interleave is a plain unrolled bit expression (whole-stage
  * codegen'd, no UDF) and is mirrored literally by [[zvalSql]] so a
  * DuckDB oracle computes identical z-values.
  */
object ZOrder {

  /** Bit-interleaved 2-D z-value: x occupies even bits, y odd bits;
    * `bits` low bits of each coordinate participate (inputs are masked,
    * so callers bucketize or mask wider domains first). */
  def zval(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .plus(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ + _)

  /** The identical formula as DuckDB SQL over column names. */
  def zvalSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** Decode a z-prefix bucket id (top `prefixBits` of a 2*bits-wide
    * z-value) back to the inclusive (x, y) ranges of its quad region.
    * A bucket prefix fixes the HIGH prefixBits of z; de-interleaving
    * those fixed bits gives the high bits of x and y, the free low
    * bits span the rest of the quad. */
  def bucketBox(bucket: Long, prefixBits: Int, bits: Int): (Long, Long, Long, Long) = {
    val freeBits = 2 * bits - prefixBits
    val zLo = bucket << freeBits
    var xLo = 0L; var yLo = 0L; var xFree = 0; var yFree = 0
    var i = 0
    while (i < 2 * bits) {
      val bit = (zLo >> i) & 1L
      val coordBit = i / 2
      if (i % 2 == 0) { xLo |= bit << coordBit; if (i < freeBits) xFree += 1 }
      else            { yLo |= bit << coordBit; if (i < freeBits) yFree += 1 }
      i += 1
    }
    (xLo, xLo + (1L << xFree) - 1, yLo, yLo + (1L << yFree) - 1)
  }

  /** Bucket ids (top `prefixBits` of z) whose quad region intersects
    * the query box — the pruning set for a 2-D range predicate over a
    * z-bucketed layout. Driver-side enumeration of 2^prefixBits buckets
    * (a handful: prefixBits ≲ 10), NOT of the data. */
  def bucketsForBox(xMin: Long, xMax: Long, yMin: Long, yMax: Long,
      prefixBits: Int, bits: Int): Seq[Long] =
    (0L until (1L << prefixBits)).filter { bkt =>
      val (xLo, xHi, yLo, yHi) = bucketBox(bkt, prefixBits, bits)
      xHi >= xMin && xLo <= xMax && yHi >= yMin && yLo <= yMax
    }
}

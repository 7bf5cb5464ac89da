package org.apache.spark.sql.graftx

// Same private[sql] extension-point placement as ArrayMath/StringSim.

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pos_tokenize(text) — a NATIVE Catalyst Generator (the real UDTF
  * tier: one input row → many output rows with a multi-column element
  * schema), not an explode over a pre-built array. Emits one row per
  * single-space-separated token carrying (pos, tok, start, end) where
  * start/end are CHARACTER offsets into the original text — the
  * span-preserving tokenization that `split` + `posexplode` loses (the
  * array drops where each token came from) and that every
  * annotate-then-project-back pipeline needs. Empty tokens from
  * consecutive separators are kept (pos/offset arithmetic stays exact).
  *
  * Generator contract: elementSchema names the output columns; eval
  * returns the row iterator. Custom generators run through GenerateExec
  * outside whole-stage codegen (only builtin explode-family generators
  * codegen) — the per-row work here is a single char scan, and the
  * generator avoids materializing the token ARRAY that the
  * split-then-posexplode plan allocates per row. */
case class PosTokenize(child: Expression)
    extends UnaryExpression with Generator with ExpectsInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("tok", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))
  override def prettyName: String = "pos_tokenize"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val s = v.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        out += InternalRow(pos, UTF8String.fromString(s.substring(start, i)),
          start, i)
        pos += 1
        start = i + 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PosTokenize =
    copy(child = newChild)
}

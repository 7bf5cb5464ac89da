package org.apache.spark.sql.graftx

// Same private[sql] extension-point placement as ArrayMath.scala: the
// Column↔Expression bridge (classic.ExpressionUtils) is private[sql].
// Public API is re-exported via graft SQL registration (GraftExtensions)
// and the GraftStringSim column helpers.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, pinned to the rapidfuzz algorithm DuckDB
  * ships (verified 0/6000 random-pair mismatches against DuckDB
  * `jaro_winkler_similarity`): greedy left-to-right matching inside the
  * classic ⌊max(|a|,|b|)/2⌋-1 window, transpositions halved with
  * INTEGER division (the detail that separates rapidfuzz from the
  * textbook t/2), Winkler prefix boost (≤4 chars, weight 0.1) applied
  * only when the Jaro score exceeds 0.7, and 0.0 — not 1.0 — when
  * either side is empty. Operates on UTF-8 bytes, matching DuckDB's
  * byte-level comparison (identical for ASCII; multi-byte code points
  * compare bytewise on both engines).
  *
  * A static JVM method so the Catalyst expression's codegen stays a
  * one-line call inside whole-stage codegen (the same shape as Spark's
  * built-in levenshtein). */
object JaroWinklerImpl {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return 0.0
    val bound = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + bound)
      var j = math.max(0, i - bound)
      var matched = false
      while (j <= hi && !matched) {
        if (!f2(j) && s(i) == t(j)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val dm = m.toDouble
    var sim = (dm / l1 + dm / l2 + (dm - trans / 2) / dm) / 3.0
    if (sim > 0.7) {
      val maxPref = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxPref && s(p) == t(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** jaro_winkler(a, b) → DOUBLE in [0, 1]. Null-safe, codegen'd. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftx.JaroWinklerImpl.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization — the canonical-composition pass every
  * web-scraped training corpus needs before dedup/tokenization (the
  * same text arrives precomposed from one site and decomposed from
  * another; without NFC they hash apart and double-count). Spark has no
  * built-in normalizer; this wraps the JDK's implementation of the
  * Unicode canonical composition algorithm as a codegen'd expression.
  * Pinned against DuckDB's INDEPENDENT utf8proc implementation by the
  * q_text_nfc oracle. */
object NfcNormalizeImpl {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; most real
    // text is already NFC and skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** nfc_normalize(s) → STRING in Unicode Normalization Form C. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(a: Any): Any =
    NfcNormalizeImpl.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftx.NfcNormalizeImpl.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Column-API face. */
object GraftStringSim {
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def nfcNormalize(a: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(a)))
}

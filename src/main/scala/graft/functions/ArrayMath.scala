package org.apache.spark.sql.graftx

// Lives under org.apache.spark.sql because AbstractDataType and the
// Column↔Expression bridge (classic.ExpressionUtils) are private[sql] —
// the standard extension-point placement for third-party Catalyst
// expressions. Public API is re-exported as graft.functions.ArrayMath.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom Catalyst expression for the similarity-search hot path.
  *
  * Spark's higher-order functions (zip_with/aggregate) are
  * CodegenFallback — interpreted per row — which made the pairwise
  * cosine queries lambda-bound (measured 72s at sf0.1). This generates
  * a tight primitive loop inside whole-stage codegen instead
  * (SURVEY.md §7.3: custom Expression only where profiling shows a
  * win — this is that case).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Specialized self-dot: Σ x_i² in one array traversal with one
  * element load per index (LongArrayDot(x, x) loads each element
  * twice). Produced by the DotSelfToNorm2 optimizer rule — queries
  * keep writing the natural dot(v, v) idiom and the plan gets the
  * strength-reduced form. */
case class LongArrayNorm2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_norm2"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val v = x.getLong(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongArrayNorm2 =
    copy(child = newChild)
}

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule): rewrite
  * long_array_dot(x, x) over a deterministic x into long_array_norm2(x)
  * — same value and null semantics by construction (dot(x,x) = Σ x_i²;
  * both are null iff x is null), guarded by semanticEquals so only a
  * genuine self-dot rewrites. */
object DotSelfToNorm2
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case LongArrayDot(a, b) if a.deterministic && a.semanticEquals(b) =>
        LongArrayNorm2(a)
    }
}

object GraftArrayMath {
  def dotL(a: Column, b: Column): Column =
    ExpressionUtils.column(LongArrayDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** SQL-surface registration for the engine's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  val longArrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "long_array_dot(arrayA, arrayB) takes exactly 2 arguments")
      LongArrayDot(args(0), args(1))
    })

  val jaroWinkler: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "jaro_winkler(strA, strB) takes exactly 2 arguments")
      JaroWinklerSim(args(0), args(1))
    })

  val posTokenize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("pos_tokenize"),
    new ExpressionInfo(classOf[PosTokenize].getName, "pos_tokenize"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "pos_tokenize(text) takes exactly 1 argument")
      PosTokenize(args(0))
    })

  val nfcNormalize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "nfc_normalize(str) takes exactly 1 argument")
      NfcNormalize(args(0))
    })

  /** Register on a live session (tests / spark-shell). Builder-time
    * registration goes through graft.functions.GraftExtensions. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(longArrayDot._1, longArrayDot._2, longArrayDot._3)
    spark.sessionState.functionRegistry
      .registerFunction(jaroWinkler._1, jaroWinkler._2, jaroWinkler._3)
    spark.sessionState.functionRegistry
      .registerFunction(nfcNormalize._1, nfcNormalize._2, nfcNormalize._3)
    spark.sessionState.functionRegistry
      .registerFunction(posTokenize._1, posTokenize._2, posTokenize._3)
  }
}

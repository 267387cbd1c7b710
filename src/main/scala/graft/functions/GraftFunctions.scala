package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the engine's scalar primitives as native Catalyst
  * Expressions (whole-stage-codegen'd, null-safe) — preferred over Scala
  * UDFs per the build rules: no serialization round-trip, participates in
  * constant folding.
  *
  * seq_ratio: difflib-compatible Ratcliff/Obershelp similarity (the
  * reference's fuzzy-match primitive, heading_matcher.py:206).
  * simhash64: 64-bit near-dup fingerprint over whitespace tokens.
  */
object SeqRatioImpl {
  def ratio(a: UTF8String, b: UTF8String): Double =
    graft.text.SeqRatio.ratio(a.toString, b.toString)
}

object Simhash64Impl {
  def hash(a: UTF8String): Long =
    graft.ops.Dedup.simhash64(a.toString.trim.split("\\s+").toSeq)
}

case class SeqRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SeqRatioImpl.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SeqRatioImpl.ratio($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "seq_ratio"
}

case class Simhash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = Simhash64Impl.hash(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Simhash64Impl.hash($a)")
  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** SparkSessionExtensions injector:
  * spark.sql.extensions=graft.functions.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("seq_ratio"),
      new ExpressionInfo(classOf[SeqRatioExpr].getName, "seq_ratio"),
      (children: Seq[Expression]) => SeqRatioExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64Expr].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64Expr(children.head)))
  }
}

object GraftFunctions {
  /** Imperative registration for an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("seq_ratio",
      (children: Seq[Expression]) => SeqRatioExpr(children(0), children(1)), "scala_udf")
    registry.createOrReplaceTempFunction("simhash64",
      (children: Seq[Expression]) => Simhash64Expr(children.head), "scala_udf")
  }
}

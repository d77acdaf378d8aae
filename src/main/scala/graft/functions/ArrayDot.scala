package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Dot product of two double arrays as a natively codegen'd Catalyst
  * expression (SURVEY §2.11: custom `Expression` with `doGenCode` beats
  * higher-order built-ins in the hot path).
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` materializes an
  * intermediate array per row — measured as the dominant cost of
  * LSH candidate scoring at ~1M pairs/s scale. This expression is one
  * fused loop over the two `ArrayData`, no allocation, and stays inside
  * whole-stage codegen. Summation order matches the sequential
  * fold of the built-in (and DuckDB's list_dot_product), so oracle
  * hashes are unchanged. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> — [[ArrayDot.dot]] is the only
  // construction site and the caller casts
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => ArrayDot(exprs.head, exprs(1)), "built-in")
    }

  /** `dot(a, b)` over array<double> columns (casts are the caller's job). */
  def dot(a: Column, b: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_dot", a, b)
  }
}

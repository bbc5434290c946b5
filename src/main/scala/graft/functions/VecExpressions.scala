package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftSqlBridge.{column => mkCol, expression => exprOf}

/** Static dot-product kernels over Catalyst `ArrayData` — called from both
  * the interpreted and the generated code path of [[VecDot]]. The fold is
  * strictly left-to-right in double, the exact arithmetic of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` and of
  * DuckDB's `list_sum(list_transform(...))` — so cosines stay bit-identical
  * across engines (the oracle-parity contract for q27/q28/q29/q59). */
object VecKernels {
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (aFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else if (bFloat) {
      while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }
}

/** vec_dot(a, b) — codegen'd dense dot product over array&lt;float&gt; /
  * array&lt;double&gt; columns. Replaces the interpreted higher-order
  * `aggregate(zip_with(...))` chain (which allocates a zipped array and
  * evaluates two lambdas per element per pair) with one static call — the
  * hot inner loop of every pair-scoring stage (ANN re-rank, near-dup refine,
  * centroid assignment). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], isFloat(left),
                   b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (isFloat(left).toString, isFloat(right).toString)
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels$$.MODULE$$.dot($a, $lf, $b, $rf)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VecFunctions {
  def vecDot(a: Column, b: Column): Column = mkCol(VecDot(exprOf(a), exprOf(b)))
}

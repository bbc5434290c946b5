package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftSqlBridge.{column => mkCol, expression => exprOf}
import graft.geo.{MultiPolygon, Wkb}

/** Executor-side kernel for the codegen'd PIP refine: one WKB parse per
  * (epoch, poly_id) per task — the same cache discipline as the UDF it
  * replaces (SpatialJoin.poly), as a static call reachable from generated
  * code. Keys carry the operator-invocation epoch so two layers reusing
  * poly ids never see each other's geometry. */
object PipKernels {
  private val cache = new ThreadLocal[java.util.HashMap[String, MultiPolygon]] {
    override def initialValue() = new java.util.HashMap[String, MultiPolygon]()
  }
  def contains(epoch: UTF8String, id: UTF8String, wkb: Array[Byte],
               x: Double, y: Double): Boolean = {
    val c = cache.get()
    val key = epoch.toString + "/" + id.toString
    var p = c.get(key)
    if (p == null) { p = Wkb.read(wkb); if (c.size > 4096) c.clear(); c.put(key, p) }
    p.contains(x, y)
  }
}

/** pip_contains(epoch, poly_id, wkb, x, y) — even-odd ray-crossing
  * point-in-polygon as a native Expression with codegen: unlike a ScalaUDF
  * there is no boxed-row conversion fence, so the refine predicate stays
  * inside the generated join-filter loop. */
case class PipContains(children: Seq[Expression]) extends Expression {
  override def prettyName: String = "pip_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val epoch = children(0).eval(input)
    val id = children(1).eval(input)
    val wkb = children(2).eval(input)
    val x = children(3).eval(input)
    val y = children(4).eval(input)
    if (epoch == null || id == null || wkb == null || x == null || y == null) null
    else PipKernels.contains(epoch.asInstanceOf[UTF8String], id.asInstanceOf[UTF8String],
      wkb.asInstanceOf[Array[Byte]], x.asInstanceOf[Double], y.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val code =
      code"""
        ${evals.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = ($anyNull);
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PipKernels.contains(
            ${evals(0).value}, ${evals(1).value}, ${evals(2).value},
            ${evals(3).value}, ${evals(4).value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PipFunctions {
  def pipContains(epoch: Column, id: Column, wkb: Column, x: Column, y: Column): Column =
    mkCol(PipContains(Seq(exprOf(epoch), exprOf(id), exprOf(wkb),
                          exprOf(x.cast("double")), exprOf(y.cast("double")))))
}

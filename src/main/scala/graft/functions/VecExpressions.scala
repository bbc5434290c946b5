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

/** Static kernels for the ANN bucketing expressions — same discipline as
  * [[VecKernels]]: tight while-loops reachable from generated code, shared
  * by the interpreted path. Arithmetic is kept OP-FOR-OP identical to the
  * Scala closures these replaced (`Similarity.bucketKeys` / the IVF probe)
  * so the q93/q94 strict oracle hashes are the regression gate. */
object AnnKernels {
  // hyperplane components are pure functions of (tables, planes, dims) via
  // the seeded PRNG — compute once per shape, share across expression
  // instances and codegen references
  private val hpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** Flat hyperplanes: hp((t·planes + p)·dims + d) = Similarity.gauss(t,p,d). */
  def hyperplanes(dims: Int, tables: Int, planes: Int): Array[Double] =
    hpCache.computeIfAbsent((dims, tables, planes), { _ =>
      val a = new Array[Double](tables * planes * dims)
      var t = 0
      while (t < tables) {
        var p = 0
        while (p < planes) {
          var d = 0
          while (d < dims) {
            a((t * planes + p) * dims + d) = graft.operators.Similarity.gauss(t, p, d)
            d += 1
          }
          p += 1
        }
        t += 1
      }
      a
    })

  /** One bucket key per hash table: sign bits of the hyperplane projections,
    * table id in the high word (bit-identical to Similarity.bucketKeys —
    * float element promoted to double, then · double hyperplane term). */
  def lshKeys(v: ArrayData, hp: Array[Double], dims: Int,
              tables: Int, planes: Int): ArrayData = {
    // Loud failure on dimension mismatch (matches the ScalaUDF path this
    // replaced): an UnsafeArrayData read past numElements() is unchecked
    // and would produce nondeterministic bucket keys instead of an error.
    require(v.numElements() == dims,
      s"lsh_bucket_keys: vector has ${v.numElements()} elements, expected $dims")
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dims
        var dot = 0.0
        var d = 0
        while (d < dims) { dot += v.getFloat(d) * hp(base + d); d += 1 }
        if (dot >= 0) key |= (1L << p)
        p += 1
      }
      keys(t) = (t.toLong << 32) | key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  /** nProbe nearest centroid indices ordered by (squared distance, index) —
    * the exact `(d, c).sorted.take(nProbe)` tuple ordering of the closure
    * this replaced. nLists is small (default 16): a full index sort is
    * cheaper than maintaining a bounded heap. */
  def ivfProbe(v: ArrayData, cs: Array[Array[Double]], nProbe: Int): ArrayData = {
    val n = cs.length
    val ds = new Array[Double](n)
    val vl = v.numElements()
    var c = 0
    while (c < n) {
      val cv = cs(c)
      var d = 0.0
      var i = 0
      while (i < cv.length && i < vl) { val t = v.getFloat(i) - cv(i); d += t * t; i += 1 }
      ds(c) = d
      c += 1
    }
    val idx = Array.range(0, n).sortBy(i => (ds(i), i)).take(math.min(nProbe, n))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx)
  }
}

/** lsh_bucket_keys(v) — the random-hyperplane LSH key computation as a
  * codegen'd Expression (replacing a per-row ScalaUDF: no boxed-row
  * conversion fence in the bucketing projection). Hyperplanes ride as a
  * codegen reference object, derived deterministically from
  * (tables, planes, dims). */
case class LshBucketKeys(child: Expression, dims: Int, tables: Int, planes: Int)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "lsh_bucket_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_bucket_keys expects array<float>, got $t")
  }

  @transient private lazy val hp: Array[Double] =
    AnnKernels.hyperplanes(dims, tables, planes)

  override protected def nullSafeEval(v: Any): Any =
    AnnKernels.lshKeys(v.asInstanceOf[ArrayData], hp, dims, tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hpRef = ctx.addReferenceObj("lshHyperplanes", hp, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnKernels$$.MODULE$$.lshKeys($c, $hpRef, $dims, $tables, $planes)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ivf_probe(v) — nProbe nearest coarse-quantizer centroids as a codegen'd
  * Expression; the (tiny) centroid table rides as a reference object. */
case class IvfProbe(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "ivf_probe"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ivf_probe expects array<float>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    AnnKernels.ivfProbe(v.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val csRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnnKernels$$.MODULE$$.ivfProbe($c, $csRef, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object AnnFunctions {
  def lshBucketKeys(v: Column, dims: Int, tables: Int, planes: Int): Column =
    mkCol(LshBucketKeys(exprOf(v), dims, tables, planes))
  def ivfProbe(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    mkCol(IvfProbe(exprOf(v), centroids, nProbe))
}

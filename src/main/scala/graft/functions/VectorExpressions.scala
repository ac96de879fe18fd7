package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static vector kernels over Catalyst [[ArrayData]] — the embedding
  * hot path (reference similarity surface:
  * `hebrew_alignment_tool.py:351` generalized to dense vectors).
  *
  * Summation is a strict left-to-right fold, IEEE-identical to the
  * `aggregate`/`zip_with` higher-order-function composition these
  * kernels replace — results hash-match the previous plans and the
  * DuckDB oracles bit for bit. The difference is execution: Spark's
  * higher-order functions interpret their lambda per element (ArrayTransform
  * and ArrayAggregate are CodegenFallback), so a dim-256 cosine paid
  * ~3×256 boxed lambda invocations per row; these kernels are one tight
  * JVM loop, and the expressions below inline them into whole-stage
  * codegen.
  *
  * Contract: inputs are non-null equal-length arrays of non-null
  * doubles (embedding columns cast via `array<double>`). Length
  * mismatch throws — a corrupt-data signal, not a null.
  */
object VectorKernels {
  private def check(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = check(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = check(a, b)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1
    }
    s
  }

  /** Fused one-pass cosine: dot and both norms in a single loop, final
    * arithmetic `dot / (sqrt(na) * sqrt(nb))` — the same expression the
    * three-pass HOF composition evaluated.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = check(a, b)
    var sab = 0.0; var saa = 0.0; var sbb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      sab += x * y; saa += x * x; sbb += y * y; i += 1
    }
    sab / (math.sqrt(saa) * math.sqrt(sbb))
  }
}

// Children must already be array<double> (the Column wrappers in
// GraftFunctions cast): AbstractDataType is private[sql] in Spark 4, so
// implicit input coercion isn't available to external expressions.
abstract class VecBinaryExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Static method on [[VectorKernels]] the generated code calls. */
  protected def kernel: String
  protected def call(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    call(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.$kernel($a, $b);")
}

/** Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "dot"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Σ (aᵢ−bᵢ)². */
case class SquaredDistance(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "sqDist"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.sqDist(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

/** One-pass cosine similarity. */
case class CosineSim(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "cosine"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** √Σ aᵢ². */
case class VecNorm(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorKernels.norm(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_norm"
}

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
  * Contract: inputs are equal-length `array<double>` columns (the
  * Column wrappers cast). Length mismatch throws — a corrupt-data
  * signal, not a null. A NULL element makes the result NULL (boxed
  * return), matching the `zip_with`/`aggregate` HOF composition these
  * kernels replace — silently reading a null slot as 0.0 would rank a
  * corrupt embedding into top-k.
  */
object VectorKernels {
  private def check(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vector length mismatch: $n vs ${b.numElements()}")
    n
  }

  private def anyNull(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = check(a, b)
    if (anyNull(a, n) || anyNull(b, n)) return null
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (anyNull(a, n)) return null
    var s = 0.0; var i = 0
    while (i < n) { val v = a.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = check(a, b)
    if (anyNull(a, n) || anyNull(b, n)) return null
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
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = check(a, b)
    if (anyNull(a, n) || anyNull(b, n)) return null
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
  // nullable even over non-null array columns: a null ELEMENT (which
  // array nullability doesn't capture) makes the result null
  override def nullable: Boolean = true

  /** Static method on [[VectorKernels]] the generated code calls. */
  protected def kernel: String
  protected def call(a: ArrayData, b: ArrayData): java.lang.Double

  override def nullSafeEval(l: Any, r: Any): Any =
    call(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  // boxed-return null check: a NULL array element yields a NULL result
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.VectorKernels.$kernel($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         |""".stripMargin)
}

/** Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "dot"
  override protected def call(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Σ (aᵢ−bᵢ)². */
case class SquaredDistance(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "sqDist"
  override protected def call(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorKernels.sqDist(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

/** One-pass cosine similarity. */
case class CosineSim(left: Expression, right: Expression)
    extends VecBinaryExpression {
  override protected def kernel: String = "cosine"
  override protected def call(a: ArrayData, b: ArrayData): java.lang.Double =
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
  override def nullable: Boolean = true // null element ⇒ null result
  override def nullSafeEval(v: Any): Any =
    VectorKernels.norm(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.VectorKernels.norm($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_norm"
}

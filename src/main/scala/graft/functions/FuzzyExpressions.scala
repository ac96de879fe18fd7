package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** X14 upgrade path (SURVEY.md §7.3): the fuzzy kernels as native
  * Catalyst expressions with whole-stage codegen. The generated code
  * calls the static JVM kernels directly — no ScalaUDF boxing, no
  * serialization of a closure per row, and the expression participates
  * in constant folding / null propagation like any built-in.
  */
abstract class FuzzyBinaryExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Fully-qualified static method on [[Fuzzy]] to invoke. */
  protected def kernel: String

  protected def call(a: String, b: String): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    call(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Fuzzy.$kernel(" +
        s"$a.toString(), $b.toString());")
}

/** 100 · 2·LCS/(|a|+|b|) — fuzz.ratio. */
case class IndelRatio(left: Expression, right: Expression)
    extends FuzzyBinaryExpression {
  override protected def kernel: String = "ratio"
  override protected def call(a: String, b: String): Double = Fuzzy.ratio(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "indel_ratio"
}

/** Best window ratio — fuzz.partial_ratio. */
case class PartialRatio(left: Expression, right: Expression)
    extends FuzzyBinaryExpression {
  override protected def kernel: String = "partialRatio"
  override protected def call(a: String, b: String): Double =
    Fuzzy.partialRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "partial_ratio"
}

/** Token-set combination ratio — fuzz.token_set_ratio. */
case class TokenSetRatio(left: Expression, right: Expression)
    extends FuzzyBinaryExpression {
  override protected def kernel: String = "tokenSetRatio"
  override protected def call(a: String, b: String): Double =
    Fuzzy.tokenSetRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "token_set_ratio"
}

/** Token-sort ratio — fuzz.token_sort_ratio. */
case class TokenSortRatio(left: Expression, right: Expression)
    extends FuzzyBinaryExpression {
  override protected def kernel: String = "tokenSortRatio"
  override protected def call(a: String, b: String): Double =
    Fuzzy.tokenSortRatio(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "token_sort_ratio"
}

/** Column API + SQL registration for the engine's native functions. */
object GraftFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def indel_ratio(a: Column, b: Column): Column =
    column(IndelRatio(expression(a), expression(b)))
  def partial_ratio(a: Column, b: Column): Column =
    column(PartialRatio(expression(a), expression(b)))
  def token_set_ratio(a: Column, b: Column): Column =
    column(TokenSetRatio(expression(a), expression(b)))
  def token_sort_ratio(a: Column, b: Column): Column =
    column(TokenSortRatio(expression(a), expression(b)))

  // Vector kernels: the wrappers own the array<double> coercion (the
  // expressions can't — AbstractDataType is private[sql] in Spark 4).
  private def vd(c: Column): Expression =
    expression(c.cast("array<double>"))
  def vec_dot(a: Column, b: Column): Column =
    column(DotProduct(vd(a), vd(b)))
  def vec_norm(a: Column): Column = column(VecNorm(vd(a)))
  def vec_sqdist(a: Column, b: Column): Column =
    column(SquaredDistance(vd(a), vd(b)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(vd(a), vd(b)))

  // Product-quantization kernels (PqExpressions.scala). m/k are plan
  // constants (they shape the codebook layout), so they are Scala Ints
  // here and literal-only in the SQL registration below.
  def pq_encode(vec: Column, codebook: Column, m: Int, k: Int): Column =
    column(PqEncode(vd(vec), vd(codebook), m, k))
  def pq_lut(vec: Column, codebook: Column, m: Int, k: Int): Column =
    column(PqLut(vd(vec), vd(codebook), m, k))
  def pq_lut_ip(vec: Column, codebook: Column, m: Int, k: Int): Column =
    column(PqLutIp(vd(vec), vd(codebook), m, k))
  def pq_adc(lut: Column, codes: Column): Column =
    column(PqAdc(vd(lut),
      expression(codes.cast("array<int>"))))
  def pq_sdc(qcodes: Column, codes: Column, table: IndexedSeq[Double],
      k: Int): Column =
    column(PqSdc(expression(qcodes.cast("array<int>")),
      expression(codes.cast("array<int>")), new SdcTable(table.toArray),
      k))

  private def castD(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
  // arity-checked builder: a wrong-arity SQL call gets the expected
  // signature back, not a raw IndexOutOfBoundsException from es(i)
  private def withArity(sig: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$sig expects $n argument(s), got ${es.length}")
      f(es)
    }
  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("indel_ratio", withArity("indel_ratio(a, b)", 2)(
      es => IndelRatio(es(0), es(1)))),
    ("partial_ratio", withArity("partial_ratio(a, b)", 2)(
      es => PartialRatio(es(0), es(1)))),
    ("token_set_ratio", withArity("token_set_ratio(a, b)", 2)(
      es => TokenSetRatio(es(0), es(1)))),
    ("token_sort_ratio", withArity("token_sort_ratio(a, b)", 2)(
      es => TokenSortRatio(es(0), es(1)))),
    ("vec_dot", withArity("vec_dot(a, b)", 2)(
      es => DotProduct(castD(es(0)), castD(es(1))))),
    ("vec_norm", withArity("vec_norm(a)", 1)(es => VecNorm(castD(es(0))))),
    ("vec_sqdist", withArity("vec_sqdist(a, b)", 2)(
      es => SquaredDistance(castD(es(0)), castD(es(1))))),
    ("cosine_sim", withArity("cosine_sim(a, b)", 2)(
      es => CosineSim(castD(es(0)), castD(es(1))))),
    // SQL args are cast like the vec_* builders: without the cast an
    // int-array/int argument passes analysis (the expressions declare no
    // input types) and fails at runtime inside the kernel
    ("simhash_code", withArity("simhash_code(tokens, nBits)", 2)(es =>
      SimhashCode(
      org.apache.spark.sql.catalyst.expressions.Cast(es(0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case _ => throw new IllegalArgumentException(
          "simhash_code(tokens, nBits): nBits must be an integer literal")
      }))),
    ("pq_encode", withArity("pq_encode(vec, codebook, m, k)", 4)(es => {
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case _ => throw new IllegalArgumentException(
          s"pq_encode(vec, codebook, m, k): $name must be an integer literal")
      }
      PqEncode(castD(es(0)), castD(es(1)),
        intLit(es(2), "m"), intLit(es(3), "k"))
    })),
    ("pq_lut", withArity("pq_lut(vec, codebook, m, k)", 4)(es => {
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case _ => throw new IllegalArgumentException(
          s"pq_lut(vec, codebook, m, k): $name must be an integer literal")
      }
      PqLut(castD(es(0)), castD(es(1)),
        intLit(es(2), "m"), intLit(es(3), "k"))
    })),
    ("pq_lut_ip", withArity("pq_lut_ip(vec, codebook, m, k)", 4)(es => {
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case _ => throw new IllegalArgumentException(
          s"pq_lut_ip(vec, codebook, m, k): $name must be an integer literal")
      }
      PqLutIp(castD(es(0)), castD(es(1)),
        intLit(es(2), "m"), intLit(es(3), "k"))
    })),
    ("pq_adc", withArity("pq_adc(lut, codes)", 2)(es =>
      PqAdc(castD(es(0)),
        org.apache.spark.sql.catalyst.expressions.Cast(es(1),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType))))),
    ("winnow_fingerprints", withArity("winnow_fingerprints(text, k, w)", 3)(
      es => {
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
          case _ => throw new IllegalArgumentException(
            s"winnow_fingerprints(text, k, w): $name must be an integer literal")
        }
        WinnowFingerprints(
          org.apache.spark.sql.catalyst.expressions.Cast(es(0),
            org.apache.spark.sql.types.StringType),
          intLit(es(1), "k"), intLit(es(2), "w"))
      })))

  /** Register for `spark.sql("SELECT indel_ratio(a, b) ...")`. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** SparkSessionExtensions injector:
    * `.withExtensions(new GraftExtensions)` or
    * `spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  def inject(extensions: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.FuzzyExpressions", name),
          builder))
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.inject(e)
}

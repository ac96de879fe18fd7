package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native XOR-min MinHash signature kernel: all k signatures of one
  * document in ONE pass over its token-hash array.
  *
  * Semantics are EXACTLY the portable HOF construction the DuckDB
  * oracles mirror — `sig_k = min(h XOR c_k)` over the per-token hashes
  * `h` (first 60 bits of md5, non-negative) with the
  * [[graft.ops.Dedup.xorConstants]] family (60-bit masked, so the XOR
  * stays non-negative and signed-long `min` equals unsigned min).
  * NULL hash elements are skipped like `array_min` skips them; an
  * array with no usable element yields NULL, like `array_min` on an
  * all-NULL array.
  *
  * Why an expression: the HOF form pays k interpreted
  * `array_min(transform(...))` passes per row (Spark higher-order
  * functions are CodegenFallback) — k=16 means 32 boxed lambda sweeps
  * of every token array in the banding hot path (q84/q87/q104/q112).
  * Same reasoning as [[SimhashKernel]] and [[WinnowKernel]].
  */
object MinhashKernel {
  def sigs(hs: ArrayData, cs: Array[Long]): ArrayData = {
    val k = cs.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var sawValue = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        sawValue = true
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = h ^ cs(j)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!sawValue) null else new GenericArrayData(out)
  }
}

/** `minhash_sigs(tokenHashes)` — child must be array<bigint>. */
case class MinhashSigs(child: Expression, constants: Seq[Long])
    extends UnaryExpression with Serializable {
  require(constants.nonEmpty, "at least one hash function required")
  private val constArr: Array[Long] = constants.toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinhashKernel.sigs(v.asInstanceOf[ArrayData], constArr)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("minhashConsts", constArr, "long[]")
    // nullSafeCodeGen (not defineCodeGen): the kernel returns null for
    // an all-NULL/empty hash array even when the input array itself is
    // non-null, and that must surface as isNull
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinhashKernel.sigs($a, $cs);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

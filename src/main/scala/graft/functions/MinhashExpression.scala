package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature kernel: token array → all k xor-min
  * signatures in ONE pass, md5 included.
  *
  * Semantics are EXACTLY the portable Column construction the DuckDB
  * oracles mirror: per token, `h` = first 60 bits of its md5 (the
  * value `conv(substring(md5(t), 1, 15), 16, 10)` parses — the first
  * 15 hex digits ARE the top 60 bits of the digest's first 8 bytes);
  * `sig_k = min(h XOR c_k)` with the [[graft.ops.Dedup.xorConstants]]
  * family (60-bit masked, so the XOR stays non-negative and signed
  * `min` equals unsigned min). NULL tokens are skipped like
  * `array_min` skips NULL elements; an array with no usable token
  * yields NULL, like `array_min` of an all-NULL array.
  *
  * Why an expression: the Column form paid an interpreted
  * `transform` (md5 → hex string → decimal-string conv → long cast
  * per token) plus k CodegenFallback `array_min(transform(...))`
  * sweeps per row in the banding hot path (q84/q87/q104/q112). The
  * kernel hashes each token's UTF-8 bytes straight to a long and
  * folds all k minima as it goes — no hex strings, no boxed lambdas.
  * Same reasoning as [[SimhashKernel]] and [[WinnowKernel]].
  */
object MinhashKernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def sigs(tokens: ArrayData, cs: Array[Long]): ArrayData = {
    val k = cs.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val digest = md.get()
    val n = tokens.numElements()
    var sawValue = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        sawValue = true
        digest.reset()
        val d = digest.digest(tokens.getUTF8String(i).getBytes)
        // top 60 bits of the big-endian first 8 bytes == the first 15
        // hex digits; >>> keeps it non-negative
        val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
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

/** `minhash_sigs(tokens)` — child must be array<string>. */
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
    // an all-NULL/empty token array even when the input array itself
    // is non-null, and that must surface as isNull
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinhashKernel.sigs($a, $cs);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

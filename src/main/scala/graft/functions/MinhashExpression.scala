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

/** Salted string-min MinHash kernel: all salts' min-md5-hex signatures
  * of one token array in ONE pass. Parity with the portable Column
  * form `array_min(transform(toks, t => md5(salt || t)))`: the digests
  * compare as unsigned bytes, which orders exactly like the lowercase
  * hex strings `array_min` compares, and the winner renders to the
  * same lowercase hex. NULL tokens are skipped; no usable token → all
  * signatures NULL (the `array_min` result on an empty/all-NULL
  * array).
  */
object SaltedMinhashKernel {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def sigs(tokens: ArrayData, saltBytes: Array[Array[Byte]]): ArrayData = {
    val k = saltBytes.length
    val mins = new Array[Array[Byte]](k)
    val digest = md.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok = tokens.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          digest.reset()
          digest.update(saltBytes(j))
          digest.update(tok)
          val d = digest.digest()
          if (mins(j) == null || lessUnsigned(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var j = 0
    while (j < k) {
      val d = mins(j)
      val cs = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        cs(2 * b) = hexDigits((d(b) >> 4) & 0xF).toByte
        cs(2 * b + 1) = hexDigits(d(b) & 0xF).toByte
        b += 1
      }
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromBytes(cs)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** `salted_minhash(tokens)` — child must be array<string>; returns
  * array<string> of one min-md5-hex signature per salt.
  */
case class SaltedMinhashSigs(child: Expression, salts: Seq[String])
    extends UnaryExpression with Serializable {
  require(salts.nonEmpty, "at least one salt required")
  private val saltBytes: Array[Array[Byte]] =
    salts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SaltedMinhashKernel.sigs(v.asInstanceOf[ArrayData], saltBytes)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ss = ctx.addReferenceObj("minhashSalts", saltBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.SaltedMinhashKernel.sigs($a, $ss);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "salted_minhash"
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

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash kernel: one MD5 pass per token, bit-sum accumulation
  * in a local int array, inside whole-stage codegen.
  *
  * Semantics are EXACTLY the portable md5-hex construction the engine's
  * oracles compute (bit j of the code = sign of
  * Σ_tokens (hex_digit_j(md5(tok)) >= '8' ? +1 : −1), null tokens
  * contribute −1 to every bit like the Column form's
  * `when(h.substr(j,1) >= "8", 1).otherwise(-1)` does on a null hash).
  * Hex digit j ≥ '8' ⇔ the nibble's high bit is set, so the kernel
  * reads the digest bytes directly — no hex string is ever built.
  *
  * Why an expression and not `aggregate`/`zip_with`: Spark's
  * higher-order functions are CodegenFallback — the fold paid ~nBits
  * boxed lambda invocations per TOKEN (measured 2.3× q49 regression vs
  * even the shuffle-based groupBy shape). This kernel is the design the
  * operator wants: signature materializes in-scan with zero shuffle AND
  * zero interpreted per-element work.
  */
object SimhashKernel {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def code(tokens: ArrayData, nBits: Int): UTF8String = {
    val md = mdPool.get()
    val sums = new Array[Int](nBits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t == null) {
        var j = 0
        while (j < nBits) { sums(j) -= 1; j += 1 }
      } else {
        md.reset()
        val digest = md.digest(t.getBytes)
        var j = 0
        while (j < nBits) {
          val nib =
            if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xF
            else digest(j >> 1) & 0xF
          sums(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](nBits)
    var j = 0
    while (j < nBits) {
      out(j) = if (sums(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `simhash_code(tokens, nBits)` — child must be array<string>. */
case class SimhashCode(child: Expression, nBits: Int)
    extends UnaryExpression with Serializable {
  require(nBits >= 1 && nBits <= 32, "md5 supplies 32 hex digits")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SimhashKernel.code(v.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SimhashKernel.code($a, $nBits)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash_code"
}

/** 64-bit SimHash kernel returning a packed LONG.
  *
  * Why a second width: the 32-bit code's 8-bit bands give 256 buckets
  * per band — a FIXED key domain, so banded-neighbor candidate pairs
  * grow as n²/2⁹ no matter how diverse the corpus is (the same
  * degeneration class as the fixed-interval-domain range join,
  * `RangeJoin.scala`). 64 bits split into 4×16-bit bands give 65,536
  * buckets per band: per-bucket occupancy — and with it the candidate
  * join — stays bounded until the corpus approaches ~10⁷ docs, and the
  * band width is a parameter beyond that.
  *
  * Bit derivation differs from [[SimhashKernel]] on purpose and the two
  * are NOT prefix-compatible: the 32-bit scheme reads one bit per md5
  * hex digit (the nibble's high bit — a historical portability choice
  * the existing oracles encode); this kernel reads the digest's first
  * 64 bits verbatim, MSB-first, so bit j of the code is bit j of the
  * md5 bitstream. In oracle (hex string) terms, bit j (0-based) is bit
  * `3-(j%4)` of hex digit `j/4+1` — still expressible in portable SQL
  * via a nibble-value lookup, see the q113 oracle in `TextDedup`.
  *
  * Null tokens contribute −1 to every bit (same convention as the
  * 32-bit kernel). Packing: bit j of the stream lands at long bit
  * `63-j`, so the hex-prefix reading order matches the long MSB-first.
  * The packed code is a plain LONG — negative when digest bit 0 wins —
  * and every downstream op (shift/mask banding, `bit_count(xor)`
  * verify) is exact on the full two's-complement range, unlike the
  * 32-bit path's string→`conv`→cast which would NULL out at 64 bits.
  */
object Simhash64Kernel {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def code(tokens: ArrayData): Long =
    codeSalted(tokens, Array.emptyByteArray)

  /** Salted form: each token hashes as md5(token ⧺ salt) — md5 of the
    * concatenated BYTES, so the DuckDB mirror is `md5(tok || '#2')`
    * for salt "#2". An empty salt is bit-identical to [[code]] (md5 of
    * the same bytes), which is how [[code]] delegates here. The salt
    * makes a second, independent 64-bit simhash from the SAME token
    * array in the same native pass — the 128-bit code family
    * ([[graft.ops.Dedup.simhashNeighbors128Over]]) is (code, salted
    * code) concatenated.
    */
  def codeSalted(tokens: ArrayData, salt: Array[Byte]): Long = {
    val md = mdPool.get()
    val sums = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t == null) {
        var j = 0
        while (j < 64) { sums(j) -= 1; j += 1 }
      } else {
        md.reset()
        md.update(t.getBytes)
        if (salt.length > 0) md.update(salt)
        val digest = md.digest()
        var j = 0
        while (j < 64) {
          val bit = (digest(j >> 3) >> (7 - (j & 7))) & 1
          sums(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) code |= 1L << (63 - j)
      j += 1
    }
    code
  }
}

/** `simhash64_code(tokens)` — child must be array<string>; returns the
  * packed 64-bit code as LONG.
  */
case class Simhash64Code(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Simhash64Kernel.code(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Simhash64Kernel.code($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64_code"
}

/** `simhash64_code_salted(tokens, salt)` — [[Simhash64Kernel.codeSalted]]
  * as a codegen expression; the salt is a compile-time constant carried
  * as a reference object, so the generated loop is identical to the
  * unsalted kernel's (one extra md5 update per token).
  */
case class Simhash64CodeSalted(child: Expression, salt: String)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  @transient private lazy val saltBytes = salt.getBytes("UTF-8")
  override def nullSafeEval(v: Any): Any =
    Simhash64Kernel.codeSalted(v.asInstanceOf[ArrayData], saltBytes)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("simhashSalt", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Simhash64Kernel.codeSalted($a, $saltRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64_code_salted"
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle kernels for the text hot paths.
  *
  * Semantics are EXACTLY the portable Column constructions they
  * replace (kept in [[TextFunctions]] as executable specs, parity in
  * DedupSpec): tokens = `filter(split(c, " "), _ =!= "")` — split on
  * single spaces, empties dropped; token set = `array_distinct` of
  * that (first-occurrence order); shingles = distinct space-joined
  * n-windows, empty array when fewer than n tokens.
  *
  * Why expressions: `filter`/`transform` are CodegenFallback — every
  * token pays a boxed interpreted lambda, and the shingle form pays a
  * window of element_at calls per position. These loops run inside
  * whole-stage codegen. One deliberate difference: the Column shingle
  * form returns [] for NULL text (an artifact of its array() binding
  * trick); the kernels are null-intolerant like every other scalar —
  * all engine call sites treat NULL and [] identically (size-filter
  * or explode).
  */
object TokenizeKernel {
  private def splitTokens(s: UTF8String): java.util.ArrayList[String] = {
    val str = s.toString
    val toks = new java.util.ArrayList[String]()
    val len = str.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) toks.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    toks
  }

  private def toArrayData(c: java.util.Collection[String]): ArrayData = {
    val out = new Array[Any](c.size)
    val it = c.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  def tokens(s: UTF8String, distinct: Boolean): ArrayData = {
    val toks = splitTokens(s)
    if (!distinct) return toArrayData(toks)
    toArrayData(new java.util.LinkedHashSet[String](toks))
  }

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(s)
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    toArrayData(seen)
  }
}

/** Native repetition-counts kernel: `[n_tok, n_dist, max_bigram_mult]`
  * of one document in ONE pass (tokenize, distinct-count, bigram
  * multiplicity) — the Gopher-rule inputs. Semantics match the Column
  * construction (`size`/`array_distinct`/`maxMultiplicity ∘ bigramsOf`
  * in CurationOps, parity in CurationSpec): bigrams are counted with
  * multiplicity, max 0 when fewer than two tokens.
  */
object RepetitionKernel {
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    var nTok = 0L
    val seen = new java.util.HashSet[String]()
    val bigrams = new java.util.HashMap[String, java.lang.Long]()
    var maxBg = 0L
    var prev: String = null
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) {
          val tok = str.substring(start, i)
          nTok += 1
          seen.add(tok)
          if (prev != null) {
            val bg = prev + " " + tok
            val old = bigrams.get(bg)
            val c = if (old == null) 1L else old.longValue() + 1L
            bigrams.put(bg, c)
            if (c > maxBg) maxBg = c
          }
          prev = tok
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nTok, seen.size.toLong, maxBg))
  }
}

/** `repetition_counts(text)` — child must be string; returns
  * array<bigint> of [n_tok, n_dist, max_bigram_mult].
  */
case class RepetitionCounts(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    RepetitionKernel.counts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.RepetitionKernel.counts($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "repetition_counts"
}

/** `tokens(text)` / `token_set(text)` — child must be string. */
case class Tokens(child: Expression, distinct: Boolean)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenizeKernel.tokens(v.asInstanceOf[UTF8String], distinct)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TokenizeKernel.tokens($a, $distinct)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = if (distinct) "token_set" else "tokens"
}

/** `word_shingles(text, n)` — child must be string. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n > 0, "shingle width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenizeKernel.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TokenizeKernel.shingles($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

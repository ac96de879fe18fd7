package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels — the memory tier of the ANN family
  * (reference similarity surface `hebrew_alignment_tool.py:351`
  * generalized; the IVF cell tier is `graft.ops.Similarity`).
  *
  * A PQ code replaces a d-dim float vector with `m` small integers: the
  * vector is split into `m` contiguous sub-vectors of `d/m` dims, and
  * each sub-vector is quantized to its nearest of `k` sub-centroids
  * (one codebook per subspace, trained offline). At d=64 doubles that
  * is 512 bytes → m bytes (m=8, k≤256): the compression that lets a
  * 10⁹-vector index live in executor memory / a partition-pruned scan
  * instead of re-reading full vectors.
  *
  * Search is asymmetric distance computation (ADC): the QUERY stays
  * un-quantized; a per-query lookup table holds the squared distance
  * from the query's sub-vector j to every sub-centroid (m·k doubles,
  * computed once per query), and a candidate's approximate distance is
  * the sum of m table lookups — no per-candidate vector arithmetic at
  * all.
  *
  * Layout conventions (shared by all three kernels and the DuckDB
  * oracles): the codebook ships FLATTENED as `array<double>` of length
  * m·k·(d/m), ordered subspace-major then centroid (codebook[(j·k + c)
  * ·dsub + t] = dim t of centroid c in subspace j); the LUT is
  * `array<double>` of length m·k with lut[j·k + c]; codes are
  * `array<int>` of length m. Argmin ties break to the LOWER centroid
  * index (strict `<` keeps the first), matching [[graft.ops.Similarity
  * .ivfAssign]] and the oracle's `ORDER BY d ASC, c ASC` row_number.
  *
  * Null semantics match [[VectorKernels]]: a NULL element anywhere
  * makes the result NULL (a corrupt embedding must not quantize to a
  * legitimate-looking code); a LENGTH mismatch throws — corrupt-data
  * signal, not a null.
  */
object PqKernels {
  private def anyNull(a: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** codes[j] = argmin_c Σ_t (vec[j·dsub+t] − codebook[(j·k+c)·dsub+t])². */
  def encode(vec: ArrayData, codebook: ArrayData, m: Int, k: Int)
  : ArrayData = {
    val cb = codebook.numElements()
    require(cb % (m * k) == 0,
      s"pq_encode: codebook length $cb is not divisible by m*k=${m * k}")
    val dsub = cb / (m * k)
    val d = vec.numElements()
    require(d == m * dsub,
      s"pq_encode: vector length $d != m*dsub=${m * dsub}")
    if (anyNull(vec, d) || anyNull(codebook, cb)) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestC = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var s = 0.0
        val base = (j * k + c) * dsub
        val vbase = j * dsub
        var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(vbase + t) - codebook.getDouble(base + t)
          s += diff * diff
          t += 1
        }
        if (s < bestD) { bestD = s; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** lut[j·k + c] = Σ_t (vec[j·dsub+t] − codebook[(j·k+c)·dsub+t])² —
    * the per-query ADC table.
    */
  def lut(vec: ArrayData, codebook: ArrayData, m: Int, k: Int): ArrayData = {
    val cb = codebook.numElements()
    require(cb % (m * k) == 0,
      s"pq_lut: codebook length $cb is not divisible by m*k=${m * k}")
    val dsub = cb / (m * k)
    val d = vec.numElements()
    require(d == m * dsub,
      s"pq_lut: vector length $d != m*dsub=${m * dsub}")
    if (anyNull(vec, d) || anyNull(codebook, cb)) return null
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var s = 0.0
        val base = (j * k + c) * dsub
        val vbase = j * dsub
        var t = 0
        while (t < dsub) {
          val diff = vec.getDouble(vbase + t) - codebook.getDouble(base + t)
          s += diff * diff
          t += 1
        }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** lut[j·k + c] = Σ_t vec[j·dsub+t] · codebook[(j·k+c)·dsub+t] — the
    * INNER-PRODUCT ADC table, the MIPS form for corpora whose norms
    * carry signal. For COSINE ranking over a unit-norm corpus the
    * measured answer is the opposite of the naive expectation
    * (PQ_*_r11.json: adc_l2 vs adc_ip rows): L2-ADC ranks by
    * q·c(x) − ‖c(x)‖²/2, and under an MSE-trained (k-means) codebook
    * that norm term is an implicit CORRECTION for the reconstruction
    * bias (centroid condition ⇒ x·e ≈ ‖e‖², so the L2 rank tracks
    * q·x better than raw q·c(x) does) — raw IP-ADC drops it and loses
    * recall. Prefer "l2" for normalized-cosine search; use "ip" when
    * the corpus is deliberately un-normalized (true MIPS).
    */
  def lutIp(vec: ArrayData, codebook: ArrayData, m: Int, k: Int)
  : ArrayData = {
    val cb = codebook.numElements()
    require(cb % (m * k) == 0,
      s"pq_lut_ip: codebook length $cb is not divisible by m*k=${m * k}")
    val dsub = cb / (m * k)
    val d = vec.numElements()
    require(d == m * dsub,
      s"pq_lut_ip: vector length $d != m*dsub=${m * dsub}")
    if (anyNull(vec, d) || anyNull(codebook, cb)) return null
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var s = 0.0
        val base = (j * k + c) * dsub
        val vbase = j * dsub
        var t = 0
        while (t < dsub) {
          s += vec.getDouble(vbase + t) * codebook.getDouble(base + t)
          t += 1
        }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** SDC distance (symmetric: BOTH sides quantized):
    * Σ_j table[(j·k + qcodes[j])·k + codes[j]] over the SHARED
    * code-to-code table (`table[(j·k + a)·k + b] = ‖c_{j,a} − c_{j,b}‖²`,
    * m·k² doubles — [[graft.ops.Pq.sdcTable]]). k inferred as
    * √(table.len/m); a non-square length throws (corrupt table).
    *
    * Why it exists next to ADC: the ADC LUT is PER-QUERY m·k doubles —
    * at m=8/k=256 that is 2048 doubles (16 KB), 32× a dim-64 query
    * vector, so a 10⁴-query batch ships a ~160 MB broadcast and every
    * candidate row hash-probes into it (measured 1.5–2× the plain
    * full-vector probe per batch, SEMINGEST_PQ_1m_r16). SDC's table is
    * ONE plan constant shared by every query; the per-query payload is
    * the m-byte code — the batch side shrinks by the same 64× the
    * corpus side did. The price is the second quantization: error
    * E‖q−c(q)‖² adds on top of the candidate's, roughly DOUBLING the
    * calibration bias (both are measurable as the mean self-distance;
    * the caller's τ-mapping handles it the same way).
    */
  def sdc(table: Array[Double], k: Int, qcodes: ArrayData,
      codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    require(qcodes.numElements() == m,
      s"pq_sdc: query code length ${qcodes.numElements()} != " +
        s"candidate code length $m")
    require(m > 0 && table.length == m * k * k,
      s"pq_sdc: table length ${table.length} != m·k² = ${m * k * k}")
    if (anyNull(qcodes, m) || anyNull(codes, m)) return null
    // the table is a PRIMITIVE double[] constructor constant, not a
    // child ArrayData: as a typedLit child it converted to a
    // GenericArrayData of BOXED doubles, and 10M candidate rows ×
    // m pointer-chasing unbox reads measured 6× the whole ADC scoring
    // pass — as a flat primitive array the scattered reads stay in L3
    // (4 MB at m=8/k=256) with no indirection
    var s = 0.0
    var j = 0
    while (j < m) {
      val a = qcodes.getInt(j)
      val b = codes.getInt(j)
      require(a >= 0 && a < k && b >= 0 && b < k,
        s"pq_sdc: code ($a, $b) out of range [0, $k) at subspace $j")
      s += table((j * k + a) * k + b)
      j += 1
    }
    s
  }

  /** ADC distance: Σ_j lut[j·k + codes[j]], k inferred as lut.len/m. */
  def adc(lut: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    val lk = lut.numElements()
    require(m > 0 && lk % m == 0,
      s"pq_adc: LUT length $lk is not a multiple of code length $m")
    val k = lk / m
    if (anyNull(codes, m)) return null
    // null-check only the m LUT slots read (same argument as pq_sdc:
    // the kernel-built LUT is all-or-nothing NULL — pq_lut returns a
    // NULL ARRAY for a corrupt query, never a null element — so the
    // per-element scan of all m·k entries per candidate row bought
    // nothing and cost ~k× the lookup itself)
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < k,
        s"pq_adc: code $c out of range [0, $k) at subspace $j")
      val idx = j * k + c
      if (lut.isNullAt(idx)) return null
      s += lut.getDouble(idx)
      j += 1
    }
    s
  }
}

abstract class PqArrayExpression extends BinaryExpression
    with Serializable {
  def m: Int
  def k: Int
  // nullable: a NULL ELEMENT (not captured by array nullability) nulls
  // the result, same contract as VecBinaryExpression
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  protected def kernel: String
  protected def call(a: ArrayData, b: ArrayData): ArrayData
  override def nullSafeEval(l: Any, r: Any): Any =
    call(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.PqKernels.$kernel($a, $b, $m, $k);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
         |""".stripMargin)
}

/** `pq_encode(vec, codebook, m, k)` → array<int> of length m. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends PqArrayExpression {
  require(m > 0 && k > 0, "m and k must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def kernel: String = "encode"
  override protected def call(a: ArrayData, b: ArrayData): ArrayData =
    PqKernels.encode(a, b, m, k)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_encode"
}

/** `pq_lut(queryVec, codebook, m, k)` → array<double> of length m·k. */
case class PqLut(left: Expression, right: Expression, m: Int, k: Int)
    extends PqArrayExpression {
  require(m > 0 && k > 0, "m and k must be positive")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernel: String = "lut"
  override protected def call(a: ArrayData, b: ArrayData): ArrayData =
    PqKernels.lut(a, b, m, k)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_lut"
}

/** `pq_lut_ip(queryVec, codebook, m, k)` → array<double> of length
  * m·k: dot products instead of squared distances — rank DESCENDING.
  */
case class PqLutIp(left: Expression, right: Expression, m: Int, k: Int)
    extends PqArrayExpression {
  require(m > 0 && k > 0, "m and k must be positive")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernel: String = "lutIp"
  override protected def call(a: ArrayData, b: ArrayData): ArrayData =
    PqKernels.lutIp(a, b, m, k)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_lut_ip"
}

/** Plan-constant wrapper for the SDC table: a case-class field that
  * was a bare IndexedSeq[Double] made EVERY tree-node hashCode/equals
  * during Catalyst's transform passes an O(524k) boxed-element walk
  * (plan time measured in whole seconds per probe at m=8/k=256). The
  * wrapper caches the hash once and compares by reference first, then
  * primitive-array equality — copies made by tree transforms share the
  * reference, so the common case is O(1).
  */
final class SdcTable(val values: Array[Double]) extends Serializable {
  private val cachedHash: Int = java.util.Arrays.hashCode(values)
  override def hashCode: Int = cachedHash
  override def equals(o: Any): Boolean = o match {
    case t: SdcTable => (t eq this) ||
      (t.cachedHash == cachedHash &&
        java.util.Arrays.equals(t.values, values))
    case _ => false
  }
  override def toString: String = s"SdcTable(len=${values.length})"
}

/** `pq_sdc(qcodes, codes)` with the m·k² code-to-code table and k as
  * CONSTRUCTOR CONSTANTS (the same class as every kernel's m/k ints:
  * the table is codebook-derived plan configuration, not data) —
  * double: the SYMMETRIC approximate squared distance, both sides
  * quantized (see [[PqKernels.sdc]] for the regime and why the table
  * must be a primitive array). The table ships once per task binary
  * (Spark auto-broadcasts large ones) and codegen references it as a
  * flat double[].
  */
case class PqSdc(left: Expression, right: Expression,
    table: SdcTable, k: Int)
    extends BinaryExpression with Serializable {
  require(k > 0 && table.values.nonEmpty &&
    table.values.length % (k * k) == 0,
    s"pq_sdc: table length ${table.values.length} is not m·k² for k=$k")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(q: Any, c: Any): Any =
    PqKernels.sdc(table.values, k, q.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("sdcTable", table.values, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.PqKernels.sdc($tableRef, $k, $q, $c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(q: Expression,
      c: Expression): Expression = copy(left = q, right = c)
  override def prettyName: String = "pq_sdc"
}

/** `pq_adc(lut, codes)` → double: the ADC approximate squared distance. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    PqKernels.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r =
         |  graft.functions.PqKernels.adc($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

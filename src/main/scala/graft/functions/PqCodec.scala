package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codec kernels (PQ — Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the encoding
  * faiss calls IndexPQ / the ADC scan).
  *
  * `pq_encode(v, nrm)` quantizes a unit-normalized vector into M
  * subspace code indices (array<int>, each < ks): per subspace, the
  * L2-nearest codebook centroid, ties to the lowest code. The codebook
  * (M×ks×dsub doubles, driver-sized) rides into the expression as a
  * plan reference object — a narrow map with zero exchange, same
  * mechanism as graft.functions.Centroids.
  *
  * `pq_adc(codes, p_idx)` is the asymmetric-distance scan: for probe
  * `p_idx`, the approximate inner product Σ_m LUT[p][m][codes[m]],
  * where the lookup table holds the exact dot of the probe's subvector
  * with every codebook centroid. One M-step table walk per (row,
  * probe) — no per-row float×float vector math at all: that is what
  * makes a PQ scan cheap enough to brute-force billions of codes.
  *
  * Both are whole-stage-codegen static calls. Scale story: 64-dim
  * float vectors (256 B) compress to M=8 single-byte codes — a 32×
  * smaller scan surface, and the ADC pass reads ONLY the code column.
  */
object PqCodec {

  /** Encode one unit-normalized vector (v/nrm) to M codes. `cb` is the
    * flat codebook [m][c][d] → cb(m*ks*dsub + c*dsub + d). */
  def encode(v: ArrayData, nrm: Double, cb: Array[Double],
      m: Int, ks: Int, dsub: Int): ArrayData = {
    val inv = if (nrm == 0) 0.0 else 1.0 / nrm
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ks) {
        val cOff = (s * ks + c) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(off + d) * inv - cb(cOff + d)
          dist += diff * diff
          d += 1
        }
        if (dist < best) { best = dist; bestC = c } // strict < keeps lowest code on ties
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC approximate inner product of probe `p` with the row's codes.
    * `lut` is flat [p][m][c] → lut((p*m_cnt + m)*ks + c). */
  def adc(codes: ArrayData, p: Int, lut: Array[Double],
      mCnt: Int, ks: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < mCnt) {
      acc += lut((p * mCnt + s) * ks + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** SDC (symmetric-distance) approximate inner product of two CODE
    * arrays: Σ_m lut[m][a_m][b_m], where the lut holds the exact dots
    * of codebook centroids with each other — [m][a][b] →
    * lut((s*ks + a)*ks + b). Unlike ADC there is no per-probe table, so
    * a whole batch of new vectors can score against an encoded corpus
    * distributively (the incremental-index probe path); the price is
    * quantization error on BOTH sides instead of one. */
  def sdc(a: ArrayData, b: ArrayData, lut: Array[Double],
      mCnt: Int, ks: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < mCnt) {
      acc += lut((s * ks + a.getInt(s)) * ks + b.getInt(s))
      s += 1
    }
    acc
  }

  /** Register `pq_encode(v, nrm)` over this codebook and
    * `pq_adc(codes, p_idx)` over these probe LUTs. Builders close over
    * the arrays — they are baked into expressions at DataFrame
    * construction; later re-registration does not disturb built plans.
    * For the SQL text surface only — query/operator code must use
    * [[encodeCol]]/[[adcCol]]: the registry is session-global last-wins,
    * so under concurrent query construction on one session (graft
    * .Verify's thread pool) an interleaved register() would swap
    * another query's codebook/LUTs (the same race class the Centroids
    * registry hit at the r7 gate). */
  def register(spark: SparkSession, codebook: Array[Double],
      m: Int, ks: Int, dsub: Int, luts: Array[Double]): Unit = {
    registerEncoder(spark, codebook, m, ks, dsub)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("pq_adc",
      exprs => PqAdc(exprs(0), exprs(1), luts.toSeq, m, ks),
      "scala_udf")
  }

  /** Register ONLY `pq_encode` — the encode-without-search lifecycle
    * (write codes once). Deliberately leaves any registered `pq_adc`
    * untouched so an in-flight search's tables aren't clobbered. */
  def registerEncoder(spark: SparkSession, codebook: Array[Double],
      m: Int, ks: Int, dsub: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("pq_encode",
      exprs => PqEncode(exprs(0), exprs(1), codebook.toSeq, m, ks, dsub),
      "scala_udf")

  /** `pq_encode` as a Column over THIS codebook — registry-free, so
    * concurrent query construction can never swap codebooks. */
  def encodeCol(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
      codebook: Array[Double], m: Int, ks: Int, dsub: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(v),
      ExpressionUtils.expression(nrm), codebook.toSeq, m, ks, dsub))
  }

  /** `pq_adc` as a Column over THESE probe LUTs (registry-free). */
  def adcCol(codes: org.apache.spark.sql.Column, pIdx: org.apache.spark.sql.Column,
      luts: Array[Double], m: Int, ks: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    ExpressionUtils.column(PqAdc(ExpressionUtils.expression(codes),
      ExpressionUtils.expression(pIdx), luts.toSeq, m, ks))
  }

  /** `pq_sdc` as a Column over THIS centroid-dot LUT (registry-free). */
  def sdcCol(aCodes: org.apache.spark.sql.Column, bCodes: org.apache.spark.sql.Column,
      lut: Array[Double], m: Int, ks: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    ExpressionUtils.column(PqSdc(ExpressionUtils.expression(aCodes),
      ExpressionUtils.expression(bCodes), lut.toSeq, m, ks))
  }
}

case class PqEncode(
    left: Expression,
    right: Expression,
    cb: Seq[Double],
    m: Int,
    ks: Int,
    dsub: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs (array<double>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val cbArr = cb.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqCodec.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      cbArr, m, ks, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqCodec.encode($a, $b, $cbRef, $m, $ks, $dsub)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

case class PqAdc(
    left: Expression,
    right: Expression,
    lut: Seq[Double],
    m: Int,
    ks: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<int>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val lutArr = lut.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqCodec.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[Int], lutArr, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lutArr, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqCodec.adc($a, $b, $lutRef, $m, $ks)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

case class PqSdc(
    left: Expression,
    right: Expression,
    lut: Seq[Double],
    m: Int,
    ks: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_sdc needs (array<int>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val lutArr = lut.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqCodec.sdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lutArr, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqSdcLut", lutArr, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqCodec.sdc($a, $b, $lutRef, $m, $ks)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_sdc"
}

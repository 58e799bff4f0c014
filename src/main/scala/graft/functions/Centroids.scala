package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Broadcast-centroid argmin — the zero-shuffle centroid assignment for
  * IVF indexing (reference capability: similarity search at corpus
  * scale; see graft.operators.KMeansIVF and queries/VectorOps x_ann_ivf).
  *
  * The naive relational shape — `vectors CROSS JOIN centroids` then a
  * `row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC)` filter —
  * replicates every vector k× and pushes the whole k×N row set through a
  * full shuffle just to pick one row per vector. At 100 TB that is 50×
  * the corpus over the wire for a per-row argmin. This kernel instead
  * carries the k×dim centroid matrix (driver-sized by construction) INTO
  * the expression as a plan reference object — the same mechanism as a
  * broadcast literal — and computes the argmin in one tight loop per
  * row: a narrow map, no exchange, whole-stage-codegen friendly.
  *
  * Oracle parity: cosine is computed EXACTLY as the DuckDB oracles spell
  * it — strict left-fold dot (index 0 → dim-1, one accumulator, same as
  * VecDot/list_reduce), then `dot / (nrm * cnrm)` where both norms are
  * sqrt of the same fold. Ties broken by ascending centroid id, matching
  * `ORDER BY cos DESC, c_id`. Results are bit-identical to the
  * cross-join+window formulation.
  */
object Centroids {

  /** cos(v, centroid j) with the oracle's exact fp op order. */
  private def cosAt(v: ArrayData, nrm: Double, flat: Array[Double],
      cnrms: Array[Double], dim: Int, j: Int): Double = {
    val off = j * dim
    var acc = 0.0
    var d = 0
    while (d < dim) { acc += v.getDouble(d) * flat(off + d); d += 1 }
    acc / (nrm * cnrms(j))
  }

  /** Argmax cosine over the centroid set; ties → lowest id. Centroids
    * MUST be in ascending-id order (register() sorts). */
  def nearest(v: ArrayData, nrm: Double, ids: Array[Int],
      flat: Array[Double], cnrms: Array[Double], dim: Int): Int = {
    var best = Double.NegativeInfinity
    var bestId = -1
    var j = 0
    while (j < ids.length) {
      val c = cosAt(v, nrm, flat, cnrms, dim, j)
      if (c > best) { best = c; bestId = ids(j) } // strict > keeps lowest id on ties
      j += 1
    }
    bestId
  }

  /** Top-n centroid ids by (cos desc, id asc) — the multi-probe variant
    * (a probe searches its n nearest cells). n is tiny (2-4). */
  def nearestN(v: ArrayData, nrm: Double, ids: Array[Int],
      flat: Array[Double], cnrms: Array[Double], dim: Int, n: Int): ArrayData = {
    val m = math.min(n, ids.length)
    val topCos = new Array[Double](m)
    val topId = new Array[Int](m)
    var filled = 0
    var j = 0
    while (j < ids.length) {
      val c = cosAt(v, nrm, flat, cnrms, dim, j)
      // insertion position: strictly-greater moves up; equal cos keeps
      // earlier (lower) id first because we scan ids ascending
      var pos = filled
      while (pos > 0 && c > topCos(pos - 1)) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var i = last
        while (i > pos) { topCos(i) = topCos(i - 1); topId(i) = topId(i - 1); i -= 1 }
        topCos(pos) = c
        topId(pos) = ids(j)
        if (filled < m) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  /** Max cosine over the set (not the argmax id) — the decontamination
    * read: "how close is this vector to ANY benchmark vector". max over
    * doubles is order-free, so the scan order can't perturb parity with
    * the oracle's `max(...)` aggregate. */
  def maxCos(v: ArrayData, nrm: Double, flat: Array[Double],
      cnrms: Array[Double], dim: Int): Double = {
    var best = Double.NegativeInfinity
    var j = 0
    val k = cnrms.length
    while (j < k) {
      val c = cosAt(v, nrm, flat, cnrms, dim, j)
      if (c > best) best = c
      j += 1
    }
    best
  }

  /** Sorted ids, flattened row-major centroid matrix, per-centroid L2
    * norms (sqrt of the same strict fold as the oracle's
    * sqrt(list_reduce(...))), and the dimension. */
  private def prep(cents: Seq[(Int, Array[Double])])
      : (Seq[Int], Seq[Double], Seq[Double], Int) = {
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1)
    val dim = sorted.head._2.length
    val flat = sorted.flatMap(_._2.toSeq)
    val cnrms = sorted.map { case (_, cv) =>
      var acc = 0.0; var d = 0
      while (d < dim) { acc += cv(d) * cv(d); d += 1 }
      math.sqrt(acc)
    }
    (ids, flat, cnrms, dim)
  }

  /** `nearest_centroid` as a Column over THIS centroid set — no session
    * registry involved, so concurrent query construction (Verify's
    * thread pool runs queries 4-wide on one SparkSession) can never
    * clobber another query's centroids. n == 1 → int; n > 1 →
    * array<int> (multi-probe). This is the builder all query/operator
    * code must use; [[register]] exists only for the SQL text surface. */
  def nearestCol(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
      cents: Seq[(Int, Array[Double])], n: Int = 1): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    val (ids, flat, cnrms, dim) = prep(cents)
    ExpressionUtils.column(NearestCentroid(ExpressionUtils.expression(v),
      ExpressionUtils.expression(nrm), ids, flat, cnrms, dim, n))
  }

  /** `max_centroid_cos` as a Column over THIS centroid set (registry-
    * free, see [[nearestCol]]). */
  def maxCosCol(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
      cents: Seq[(Int, Array[Double])]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    val (_, flat, cnrms, dim) = prep(cents)
    ExpressionUtils.column(MaxCentroidCos(ExpressionUtils.expression(v),
      ExpressionUtils.expression(nrm), flat, cnrms, dim))
  }

  /** Register `nearest_centroid(v, nrm)` → int, `nearest_centroids(v,
    * nrm, n)` → array<int> and `max_centroid_cos(v, nrm)` → double over
    * this centroid set, for SQL-text clients (attachCorpus sessions).
    * The registry is session-global last-wins: a second register()
    * replaces the set for any SQL compiled AFTERWARDS (already-built
    * DataFrames are safe — analysis is eager and bakes the set in).
    * Query/operator code must therefore use [[nearestCol]]/[[maxCosCol]]
    * instead: under concurrent query construction on one session
    * (graft.Verify's thread pool) an interleaved register() would
    * silently swap another query's centroids — observed once as an
    * x_ann_ivf wrong-neighbour result at the r7 gate. */
  def register(spark: SparkSession, cents: Seq[(Int, Array[Double])]): Unit = {
    val (ids, flat, cnrms, dim) = prep(cents)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1), ids, flat, cnrms, dim, 1),
      "scala_udf")
    reg.createOrReplaceTempFunction("nearest_centroids",
      exprs => NearestCentroid(exprs(0), exprs(1), ids, flat, cnrms, dim,
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "scala_udf")
    reg.createOrReplaceTempFunction("max_centroid_cos",
      exprs => MaxCentroidCos(exprs(0), exprs(1), flat, cnrms, dim),
      "scala_udf")
  }
}

/** `max_centroid_cos(v, nrm)` → double: the best cosine this vector
  * achieves against the registered (broadcast-sized) set — one narrow
  * codegen pass per row, no join, no exchange. Same strict-fold cosine
  * as NearestCentroid. */
case class MaxCentroidCos(
    left: Expression,
    right: Expression,
    flat: Seq[Double],
    cnrms: Seq[Double],
    dim: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"max_centroid_cos needs (array<double>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val flatArr = flat.toArray
  @transient private lazy val cnrmArr = cnrms.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Centroids.maxCos(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      flatArr, cnrmArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flatArr, "double[]")
    val nrmsRef = ctx.addReferenceObj("centNrms", cnrmArr, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Centroids.maxCos($a, $b, $flatRef, $nrmsRef, $dim)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxCentroidCos =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "max_centroid_cos"
}

/** n == 1 → IntegerType (the hot assignment path, one int per row, no
  * array allocation); n > 1 → ArrayType(IntegerType) (probe fan-out). */
case class NearestCentroid(
    left: Expression,
    right: Expression,
    ids: Seq[Int],
    flat: Seq[Double],
    cnrms: Seq[Double],
    dim: Int,
    n: Int) extends BinaryExpression {

  override def dataType: DataType =
    if (n == 1) IntegerType else ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid needs (array<double>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val idsArr = ids.toArray
  @transient private lazy val flatArr = flat.toArray
  @transient private lazy val cnrmArr = cnrms.toArray

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    if (n == 1) Centroids.nearest(v, nrm, idsArr, flatArr, cnrmArr, dim)
    else Centroids.nearestN(v, nrm, idsArr, flatArr, cnrmArr, dim, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", idsArr, "int[]")
    val flatRef = ctx.addReferenceObj("centFlat", flatArr, "double[]")
    val nrmsRef = ctx.addReferenceObj("centNrms", cnrmArr, "double[]")
    if (n == 1)
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Centroids.nearest($a, $b, $idsRef, $flatRef, $nrmsRef, $dim)")
    else
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Centroids.nearestN($a, $b, $idsRef, $flatRef, $nrmsRef, $dim, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  override def prettyName: String =
    if (n == 1) "nearest_centroid" else "nearest_centroids"
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.functions.VecDot

/** Invariants for the LSH-bucketed ANN (no SQL oracle: bucket geometry
  * is hash-dependent). */
class VectorOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def emb = {
    VecDot.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .repartition(4)
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  test("lsh ann: results exact within bucket, sims correct, deterministic") {
    val e = emb
    val out = HyperplaneLSH.searchTopK(e, 64, Seq(0L, 1L, 2L), 5).collect()
    assert(out.nonEmpty)

    // recompute each pair's cosine directly; floor-bp must match
    val vecs = e.collect().map(r =>
      r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    val buckets = e.withColumn("bkt", HyperplaneLSH.bucket("v", 64))
      .select("vec_id", "bkt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (p, rk, cand, simBp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (pv, pn) = vecs(p)
      val (cv, cn) = vecs(cand)
      var dot = 0.0
      var i = 0
      while (i < 64) { dot += pv(i) * cv(i); i += 1 }
      assert(math.floor(dot / (pn * cn) * 10000.0).toLong == simBp, s"probe $p cand $cand")
      assert(buckets(p) == buckets(cand), "candidate outside probe bucket")
      assert(rk >= 1 && rk <= 5)
    }

    // deterministic across runs
    val out2 = HyperplaneLSH.searchTopK(e, 64, Seq(0L, 1L, 2L), 5).collect()
    assert(out.map(_.toString).sameElements(out2.map(_.toString)))
  }

  test("lsh planes are reproducible and bounded") {
    val a = HyperplaneLSH.planes(64).flatten[Double]
    val b = HyperplaneLSH.planes(64).flatten[Double]
    assert(a.sameElements(b))
    assert(a.forall(x => x >= -1.0 && x <= 1.0))
  }
}

package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the property BucketedJoins exists for: a join between two
  * tables bucketed+sorted on the join key plans WITHOUT any shuffle
  * exchange (and without re-sorting), while the identical plain-parquet
  * join exchanges both sides — and both produce the same rows. */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  private def fixtures() = {
    import spark.implicits._
    val orders = (1L to 2000L).map(i => (i, i % 97, (i * 7) % 1000))
      .toDF("o_id", "cust", "amount")
    val custs = (0L until 97L).map(i => (i, s"seg${i % 5}"))
      .toDF("cust", "segment")
    (orders, custs)
  }

  test("bucketed join: no exchange, no sort, result equals the plain join") {
    val (orders, custs) = fixtures()
    BucketedJoins.writeBucketed(orders, "bj_orders", "cust", 8)
    BucketedJoins.writeBucketed(custs, "bj_custs", "cust", 8)

    // force SMJ so partitioning (not broadcast) must satisfy the join;
    // ordering from sorted single-file buckets is behind a legacy flag
    // since 3.0 (exchange elision is default-on, sort elision is not)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val bucketed = BucketedJoins.join(spark, "bj_orders", "bj_custs", "cust")
      val plan = bucketed.queryExecution.executedPlan
      assert(plan.collect { case x: ShuffleExchangeExec => x }.isEmpty,
        s"bucketed join shuffled:\n$plan")
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"bucketed join re-sorted (sortBy metadata lost):\n$plan")

      val plain = orders.join(custs, "cust")
      val plainEx = plain.queryExecution.executedPlan
        .collect { case x: ShuffleExchangeExec => x }
      assert(plainEx.size == 2,
        s"control: plain join should exchange both sides:\n${plain.queryExecution.executedPlan}")

      val a = bucketed.select("cust", "o_id", "amount", "segment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
      val b = plain.select("cust", "o_id", "amount", "segment").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted
      assert(a.sameElements(b), s"bucketed ${a.length} rows vs plain ${b.length}")
      assert(a.nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_custs")
    }
  }

  test("mismatched bucket counts fall back to a correct (exchanged) join") {
    val (orders, custs) = fixtures()
    BucketedJoins.writeBucketed(orders, "bj_o2", "cust", 8)
    BucketedJoins.writeBucketed(custs, "bj_c2", "cust", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = BucketedJoins.join(spark, "bj_o2", "bj_c2", "cust")
      // one side can reuse its bucketing; at least the other exchanges —
      // correctness must hold either way
      assert(j.count() == orders.join(custs, "cust").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS bj_o2")
      spark.sql("DROP TABLE IF EXISTS bj_c2")
    }
  }
}

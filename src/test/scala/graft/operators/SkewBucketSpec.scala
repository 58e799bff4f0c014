package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The manual scale levers: salted joins (skew) and bucketed tables
  * (co-located, shuffle-free joins). */
class SkewBucketSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("salted join result == plain join result (skew spread over buckets)") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"user_id", $"value")
    val users = spark.read.parquet(s"$sf/events.parquet")
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))

    val plain = events.join(users, "user_id")
      .select($"event_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoins.saltedJoin(events, users, "user_id", "event_id", 7)
      .select($"event_id", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables join without any exchange on the joined keys") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs no shuffle (the only exchange is
    // the final single-key aggregation)
    val exchanges = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
      .findAllIn(plan).length
    assert(exchanges == 0, s"join keys were shuffled:\n$plan")

    // and the result matches the unbucketed join
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers — the manual levers for when AQE's runtime
  * skew-join splitting isn't available (static plans, custom sinks) or a
  * key's skew is known up front (the classic power-law user_id).
  */
object SkewJoins {

  /** Salted equi-join: the skewed (big, hot-keyed) left side gets a
    * random-but-deterministic salt in [0, buckets); the right side is
    * exploded `buckets`× so every (key, salt) pair finds its match. One
    * hot key thus spreads over `buckets` reducers instead of one.
    *
    * Deterministic salt (hash of a unique column, not rand()) keeps
    * results reproducible run-to-run.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)).cast("int"))
    val exploded = small
      .withColumnRenamed(key, "_rkey")
      .withColumn("_salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(exploded,
      salted(key) === exploded("_rkey") && salted("_salt") === exploded("_salt"))
      .drop("_rkey", "_salt")
  }
}

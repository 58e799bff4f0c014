package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** SimHash near-duplicate detection: one 64-bit signature per document,
  * banded into 4×16-bit chunks. By pigeonhole, any pair with Hamming
  * distance ≤ 3 matches exactly in at least one chunk, so recall is 1.0
  * for distance ≤ 3 while the shuffle key is a 16-bit chunk value —
  * constant state per doc (vs MinHash's K-value signature), the cheapest
  * of the dedup family at 100 TB.
  */
object SimHashDedup {

  val Chunks = 4

  /** docs(idCol, tokensCol: array<string>) → pairs (a_id, b_id, hamming)
    * with Hamming distance ≤ maxHamming (default 3 = the banding bound).
    */
  def nearDuplicates(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    SimHash.register(spark)

    // barrier AFTER the signature: stop the banding lambda below from
    // inlining the sig alias and recomputing simhash per band chunk
    val sigs = docs
      .select(col(idCol).as("id"), col(tokensCol).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("sig", expr("simhash64(toks)"))
      .repartition(spark.sparkContext.defaultParallelism)

    val banded = sigs.select($"id", $"sig",
      posexplode(expr(s"transform(sequence(0, ${Chunks - 1}), " +
        s"b -> shiftrightunsigned(sig, b * 16) & 65535)")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "chunk")
      // both self-join legs read this: repartition on the join key so
      // they share ONE ReusedExchange (shuffle files, not cached blocks
      // — nothing to unpersist, and the join arrives pre-clustered)
      .repartition($"band", $"chunk")

    val a = banded.select($"band".as("a_band"), $"chunk".as("a_chunk"),
      $"id".as("a_id"), $"sig".as("a_sig"))
    val b = banded.select($"band".as("b_band"), $"chunk".as("b_chunk"),
      $"id".as("b_id"), $"sig".as("b_sig"))

    // verify BEFORE deduplicating: hamming is one codegen'd XOR+popcount
    // per candidate occurrence (≤ Chunks per pair), so filtering first
    // shrinks the dropDuplicates exchange to true near-dup pairs instead
    // of shuffling every multi-band candidate collision
    a.join(b, $"a_band" === $"b_band" && $"a_chunk" === $"b_chunk" && $"a_id" < $"b_id")
      .withColumn("hamming", expr("bit_count(a_sig ^ b_sig)").cast("long"))
      .where($"hamming" <= maxHamming)
      .select($"a_id", $"b_id", $"hamming")
      .dropDuplicates("a_id", "b_id")
      .orderBy($"a_id", $"b_id")
  }
}

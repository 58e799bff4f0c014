package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the real cost of the simhash inline-tokenize trade at
  * corpus scale (docs >> gate SF): shape A is the old anti-inline
  * barrier (tokenize once behind a full exchange, kernel over the
  * materialized attribute), shape B the current barrier-free inline
  * (tokenize inlines ≤2× into an interpreted HOF projection, zero
  * exchanges). Synthetic corpus: n docs of ~50 tokens drawn from a
  * 31-token vocabulary — the testdata's shape.
  * sbt "runMain graft.tools.InlineCost [nDocs]" */
object InlineCost {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SimHash.register(spark)
    import spark.implicits._

    // deterministic word-salad text per id; repartition FIRST so both
    // shapes start from the same 32-way distributed text column
    val docs = spark.range(n).repartition(32)
      .select($"id", expr(
        """concat_ws(' ', transform(sequence(0, 49),
           i -> concat('w', CAST((id * 31 + i * 7) % 31 AS STRING))))""")
        .as("text"))
      .localCheckpoint()

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 6).foreach { rep =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[inlinecost] $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val tokens = docs.select($"id",
      expr("filter(split(lower(text), ' +'), x -> x != '')").as("toks"))

    // shape A: barrier (exchange) then kernel over the attribute
    time("barrier")(
      tokens.repartition(32)
        .where(size($"toks") > 0)
        .select($"id", expr("simhash64(toks)").as("sig")))

    // shape B: inline — tokenize referenced by the size guard and the
    // kernel, all in one interpreted projection, no exchange
    time("inline ")(
      tokens
        .where(size($"toks") > 0)
        .select($"id", expr("simhash64(toks)").as("sig")))

    // same comparison for the heavier MinHash pipeline (shingle kernel
    // + K-pass signature), the shape signedDocs uses
    graft.functions.Shingles.register(spark)
    time("mh-barrier")(
      tokens.repartition(32)
        .where(size($"toks") >= 3)
        .select($"id", expr("shingle_hashes(toks, 3)").as("sh"))
        .where(size($"sh") > 0)
        .withColumn("sig", expr("minhash_sig(sh, 32)")))
    time("mh-inline ")(
      tokens
        .where(size($"toks") >= 3)
        .select($"id", expr("shingle_hashes(toks, 3)").as("sh"))
        .where(size($"sh") > 0)
        .withColumn("sig", expr("minhash_sig(sh, 32)")))

    spark.stop()
  }
}

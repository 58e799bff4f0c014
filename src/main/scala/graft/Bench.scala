package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on non-bench data (sf0.001) so the first timed
    // query doesn't absorb session + JIT startup
    spark.range(100000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // full materialization of every output column (count() would let the
    // optimizer drop projections); noop is the standard benchmark sink
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop per-query cached/broadcast state so one query's leftovers
      // don't tax the next (the dedup operators persist their self-join
      // inputs for the duration of their own run)
      spark.catalog.clearCache()
      (name, dt, ok)
    }
    // failed queries are self-describing in the JSON (value -1 + a
    // `failed` list), not just a stderr line a JSON consumer never sees
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

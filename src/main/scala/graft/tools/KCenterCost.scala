package graft.tools

import org.apache.spark.sql.SparkSession

/** Cost model for the k-center training loop (VERDICT r14 #1): time
  * kcenterState at a given k and SF, reporting total and per-round
  * cost — the measurement behind the k=64 worksheet in
  * VectorOps.kcenterCoreset's scaladoc and the SCALING.md rows.
  * sbt "runMain graft.tools.KCenterCost <sfDir> <k> [reps]" */
object KCenterCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warm JIT/codegen
    // reps > 1 re-trains under a fresh cache key by bumping k modulo the
    // cachedLocal key — NOT possible without poisoning the cache, so we
    // instead report the FIRST (cold, uncached) build per JVM; run the
    // main again for another sample.
    var first = 0.0
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val sel = graft.queries.VectorOps.kcenterState(spark, sfDir, k)
      val el = (System.nanoTime() - t0) / 1e9
      if (rep == 1) first = el
      println(f"[kcenter] $sfDir k=$k rep=$rep selected=${sel.length} " +
        f"total=$el%.3f s perRound=${el / math.max(1, sel.length - 1) * 1000}%.1f ms" +
        (if (rep > 1) " (cachedLocal hit)" else " (cold build)"))
    }
    spark.stop()
  }
}

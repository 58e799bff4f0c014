package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: time named queries N times each, in one JVM, with
  * the same between-rep hygiene Bench applies (clearCache + persistent-
  * RDD sweep) — so a COMMA-SEPARATED list reproduces bench-context
  * interactions ("does running A first slow B?") that single-query
  * isolation can't see.
  * sbt "runMain graft.tools.Profile <query[,query2,...]> <sfDir> [reps]" */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    spark.range(1000).selectExpr("sum(id)").collect() // warm JIT/codegen
    names.foreach { name =>
      // SPARK_GRAFT_GC_BETWEEN=1: force a full GC before each query —
      // isolates the accumulated-broadcast hypothesis (ContextCleaner
      // reaps broadcast blocks only when the driver GC collects their
      // weak refs; a long bench run accumulates them invisibly since
      // getRDDStorageInfo excludes non-RDD blocks)
      if (sys.env.get("SPARK_GRAFT_GC_BETWEEN").contains("1")) System.gc()
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    if (names.length == 1) {
      println("== plan ==")
      graft.SparkEntry.queries(names.head)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: time one named query N times.
  * sbt "runMain graft.tools.Profile <query> <sfDir> [reps]" */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    spark.range(1000).selectExpr("sum(id)").collect() // warm JIT/codegen
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("== plan ==")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

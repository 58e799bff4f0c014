package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** A raw (unstamped) ingest batch: `n` events across `streams`, payload
    * {"v": i, "tag": "t<i%3>"}. */
  def rawEvents(n: Int, streams: Seq[String] = Seq("s1", "s2")): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (streams(i % streams.size), "svc", s"loc-$i", "0.0.1",
        s"""{"v": $i, "tag": "t${i % 3}"}""")
    }.toDF("stream_name", "service_id", "local_id", "schema_version", "payload")
      .withColumn("provenance",
        lit(null).cast("struct<service_id:string,local_id:string,relationship:string>"))
  }
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

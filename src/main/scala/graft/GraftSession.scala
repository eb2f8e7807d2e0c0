package graft

import org.apache.spark.sql.SparkSession

/** Consistent session factory for CLI / bench entry points.
  * Tests and the driver's Verify/Bench build their own sessions; this is
  * for `Main` (spark-submit equivalent) and the scaling bench.
  */
object GraftSession {
  def build(master: String, appName: String = "graft", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

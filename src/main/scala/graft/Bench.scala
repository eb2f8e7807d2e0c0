package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Each query is fully evaluated via count() (results are small;
  * the work is in the pipelines, not the collect).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query reports NEGATIVE elapsed + a nonzero failures count, so
    // a failing bench run is machine-distinguishable from a passing one
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

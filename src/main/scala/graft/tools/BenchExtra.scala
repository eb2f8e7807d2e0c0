package graft.tools

/** Round-7 measurement harness (guide §1.4/§1.5) — SEPARATE from the frozen
  * driver bench: times individual SparkEntry queries with the noop sink
  * (every column of every row computed, output discarded) and labels each
  * job so a UI/event-log reader can attribute stages. Prints one JSON line
  * per query with cold (first run, shared memos cold) and warm (second run,
  * memos hot) seconds, plus an optional repeat count taking the min.
  *
  * Usage: runMain graft.tools.BenchExtra <sfDir> [query ...]
  *        (no queries = all, alphabetical; "-" entries clear memos first)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchExtra <sfDir> [query ...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.pipeline.ckpt", "")
    val all = graft.SparkEntry.queries
    val names =
      if (args.length > 1) args.drop(1).toSeq else all.keys.toSeq.sorted
    def runOne(q: String): Double = {
      spark.sparkContext.setJobDescription(s"bench-extra: $q")
      val t0 = System.nanoTime()
      all(q)(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      dt
    }
    names.foreach { q =>
      graft.Caches.clear(spark)
      val cold = runOne(q)
      val warm = runOne(q)
      println(f"""{"query":"$q","cold_sec":$cold%.3f,"warm_sec":$warm%.3f}""")
    }
    spark.stop()
  }
}

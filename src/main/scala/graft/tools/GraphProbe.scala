package graft.tools

/** Time the shared graph-side memo builds individually (guide §1: measure
  * before optimizing the build chain). Usage: runMain graft.tools.GraphProbe <sfDir> */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"""{"step":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.3f}"""); r
    }
    // session warmup so the first step isn't charged for parquet/JIT init
    t("warmup")(spark.read.parquet(s"$dir/events.parquet").count())
    val g = t("graph_build")(graft.queries.GraphQueries.graph(spark, dir))
    t("counts")((g.numVertices, g.numEdges))
    t("directed")(g.directed.count())
    t("symmetrized")(g.symmetrized.count())
    t("undirected")(graft.queries.GraphQueries.undirected(spark, dir)._2.count())
    t("triangles")(graft.queries.GraphQueries.triangles(spark, dir).total)
    t("pagerank")(graft.queries.GraphQueries.pageRanks(spark, dir).count())
    t("nhood")(graft.queries.GraphQueries.nhood(spark, dir).counts.count())
    t("hublabels")(graft.queries.GraphQueries.hubLabels(spark, dir).labelsOut.count())
    spark.stop()
  }
}

package graft.tools

/** Plan-audit helper: print the formatted physical plan of named
  * SparkEntry queries against a testdata dir. Usage:
  *
  *   runMain graft.tools.ExplainQuery <sfDir> <query> [<query> ...]
  *
  * The round discipline ("explain the plan and iterate until it's the
  * plan you'd want") needs a one-command way to see what Catalyst
  * actually chose — WholeStageCodegen spans, exchange count, pushed
  * filters, broadcast vs shuffle joins.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQuery <sfDir> <query> [<query> ...]")
    val dir = args(0)
    val spark = graft.GraftSession.build("local[4]", "explain-query", 4)
    val all = graft.SparkEntry.queries
    args.drop(1).foreach { q =>
      println(s"===== $q")
      all.getOrElse(q, sys.error(s"unknown query $q")).apply(spark, dir)
        .explain("formatted")
    }
    spark.stop()
  }
}

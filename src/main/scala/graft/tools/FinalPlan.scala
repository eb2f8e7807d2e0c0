package graft.tools

/** Print the POST-EXECUTION adaptive plan of a SparkEntry query (AQE's
  * final plan — including ReusedExchange / AQEShuffleRead decisions that
  * the pre-execution `explain` cannot show). Guide §7.2.
  *
  * Usage: runMain graft.tools.FinalPlan <sfDir> <query> [<query> ...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FinalPlan <sfDir> <query> [<query> ...]")
    val dir = args(0)
    val spark = graft.GraftSession.build("local[8]", "final-plan", 8)
    val all = graft.SparkEntry.queries
    args.drop(1).foreach { q =>
      val df = all.getOrElse(q, sys.error(s"unknown query $q")).apply(spark, dir)
      // execute THIS QueryExecution instance (a .write would plan its own):
      // the AdaptiveSparkPlanExec mutates as stages finish, so printing it
      // after the action shows the true final plan with reused stages
      val qe = df.queryExecution
      qe.executedPlan.execute().foreachPartition((_: Iterator[_]) => ())
      println(s"===== $q (final adaptive plan)")
      println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}

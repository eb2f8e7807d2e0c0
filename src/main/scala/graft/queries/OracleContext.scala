package graft.queries

import org.apache.spark.sql.SparkSession

/** The (session, sf-dir) the oracle SQL is being generated FOR.
  *
  * Most oracle strings are corpus-independent, but the ANN family derives
  * its LSH plane count from the corpus size (Similarity.derivePlanes), and
  * the DuckDB oracle must bake the SAME derived value into its hyperplane
  * VALUES literal. `SparkEntry.oracleSql` is a plain `Map[String, String]`
  * by driver contract — no dir parameter — so Verify pins the context here
  * immediately before dumping `oracle_sql.json`.
  */
object OracleContext {
  @volatile private var ctx: Option[(SparkSession, String)] = None

  def set(spark: SparkSession, sfDir: String): Unit = ctx = Some((spark, sfDir))
  def get: Option[(SparkSession, String)] = ctx
  def clear(): Unit = ctx = None
}

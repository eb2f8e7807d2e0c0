package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window

/** Approximate nearest neighbors over an embedding column.
  *
  * Baseline: brute-force cosine top-k (PipelineQueries.eCosineTopk, oracle
  * checked). Scale path here: random-hyperplane LSH — L independent tables
  * of P sign bits each; vectors sharing a bucket in ANY table are
  * candidates, so cost is Σ per-bucket |bucket|² instead of n². Hyperplanes
  * are derived deterministically from a seed (no RNG at plan time), so
  * results are reproducible run-to-run and across parallelism levels.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane weights in [-1, 1). */
  def hyperplanes(seed: Int, tables: Int, planes: Int, dim: Int): Seq[(Int, Int, Seq[Double])] =
    for (t <- 0 until tables; p <- 0 until planes) yield {
      val w = Seq.tabulate(dim) { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, t, p, i))
        ((((h % 2001) + 2001) % 2001) - 1000) / 1000.0
      }
      (t, p, w)
    }

  /** (vec_id, table_id, bucket) LSH bucket assignment. */
  def buckets(emb: DataFrame, seed: Int = 42, tables: Int = 2, planes: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val hp = spark.createDataFrame(hyperplanes(seed, tables, planes,
        dim = 64)).toDF("table_id", "plane_id", "w")
    emb
      .select(F.col("vec_id"), F.col("embedding").as("v"))
      .crossJoin(F.broadcast(hp))
      .select(F.col("vec_id"), F.col("table_id"), F.col("plane_id"),
        (F.expr("vector_dot(v, w)") > 0) // native codegen'd Expression
          .cast("int").as("bit"))
      .select(F.col("vec_id"), F.col("table_id"),
        F.expr("shiftleft(bit, cast(plane_id as int))").as("bitval"))
      .groupBy("vec_id", "table_id")
      .agg(F.sum("bitval").cast("int").as("bucket"))
  }

  /** LSH-bucketed ANN: top-k cosine among same-bucket candidates for the
    * query set (vec_id < nQueries). */
  def annLsh(emb: DataFrame, nQueries: Int, k: Int,
             seed: Int = 42, tables: Int = 2, planes: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val b = buckets(emb, seed, tables, planes).localCheckpoint(true)
    val v = emb.select(F.col("vec_id"), F.col("embedding").as("v"))
      .select(F.col("vec_id"), F.col("v"),
        F.sqrt(F.expr("vector_dot(v, v)")).as("nrm"))
      .localCheckpoint(true)
    val qb = b.where(F.col("vec_id") < nQueries)
      .select(F.col("vec_id").as("qid"), F.col("table_id"), F.col("bucket"))
    val cand = qb.join(b, Seq("table_id", "bucket"))
      .where(F.col("vec_id") =!= F.col("qid"))
      .select("qid", "vec_id").distinct()
    val qv = v.select(F.col("vec_id").as("qid"), F.col("v").as("qv"), F.col("nrm").as("qn"))
    val scored = cand.join(v, "vec_id").join(F.broadcast(qv), "qid")
      .select(F.col("qid"), F.col("vec_id"),
        F.round(F.expr("vector_dot(qv, v)") / (F.col("qn") * F.col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(F.col("cosine").desc, F.col("vec_id"))
    scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
      .select(F.col("qid"), F.col("vec_id"), F.col("cosine"), F.col("rk").cast("int").as("rk"))
      .orderBy("qid", "rk")
  }
}

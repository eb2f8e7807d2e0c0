package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

import graft.functions.TopKCosine
import graft.pipeline.Similarity

/** The bounded top-k Aggregator (SURVEY.md §2.11 Aggregator surface) must
  * be row-identical to the window formulation it replaced, plan as a
  * partial ObjectHashAggregate (map-side combine — the point), and keep
  * the ANN queries window-free. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowTail(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("qid").orderBy(F.col("cosine").desc, F.col("vec_id"))
    scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
      .select(F.col("qid"), F.col("vec_id"), F.col("cosine"), F.col("rk").cast("int").as("rk"))
      .orderBy("qid", "rk")
  }

  test("aggregator tail == window tail row-for-row (ties included, all seeds)") {
    Seq(1, 7, 23).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // deliberately FEW distinct cosine values so ties are common and the
      // (cosine desc, vec_id asc) tie-break is genuinely exercised
      val scored = (0 until 2000).map { i =>
        (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(12) / 12.0)
      }.toDF("qid", "vec_id", "cosine").repartition(13)
      Seq(1, 5, 50).foreach { k =>
        val got = Similarity.topKPerQuery(scored, k).collect().toSeq.map(_.toSeq)
        val want = windowTail(scored, k).collect().toSeq.map(_.toSeq)
        assert(got == want, s"seed $seed k=$k diverged")
      }
    }
  }

  test("reduce/merge keep the k best under any interleaving") {
    val agg = new TopKCosine(4)
    val rnd = new scala.util.Random(99)
    val items = (0 until 200).map(i => (i.toLong, rnd.nextInt(10) / 10.0))
    // one-by-one reduce
    val all = items.foldLeft(agg.zero)(agg.reduce)
    // arbitrary split + merge
    val chunks = rnd.shuffle(items).grouped(17)
      .map(_.foldLeft(agg.zero)(agg.reduce)).toList
    val merged = chunks.foldLeft(agg.zero)(agg.merge)
    assert(agg.finish(all) == agg.finish(merged))
    val expected = items.sortBy { case (id, cos) => (-cos, id) }.take(4)
    assert(agg.finish(all) == expected.map { case (id, cos) => (id, cos) })
  }

  test("ANN plans: partial ObjectHashAggregate tail, ZERO window over candidates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lsh = Similarity.annLsh(emb, 20, 5)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object hash agg:\n$plan")
    assert(plan.contains("partial_topkcosine") || plan.contains("partial_TopKCosine")
        || "partial_topkcosine".r.findFirstIn(plan.toLowerCase).isDefined,
      s"no PARTIAL top-k (map-side combine missing):\n$plan")
    assert(!plan.contains("Window"), s"window over candidates survived:\n$plan")
  }
}

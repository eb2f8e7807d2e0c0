package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

import graft.functions.BottomKByKey
import graft.queries.PipelineQueries

/** Deterministic sampling operators (round 5): the stratified sampler's
  * bounded Aggregator must be row-identical to the window formulation it
  * avoids, partial-combine map-side, and the hash sampler must be
  * content-keyed (same text ⇒ same decision). */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  test("BottomKByKey == window row_number formulation (ties included)") {
    Seq(3, 11).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // few distinct keys so (key, id) ties are genuinely exercised
      val rows = (0 until 1500).map { i =>
        (s"s${rnd.nextInt(4)}", i.toLong, s"k${rnd.nextInt(25)}%02d")
      }.toDF("stratum", "id", "key").repartition(11)
      Seq(1, 5, 30).foreach { k =>
        val bk = F.udaf(new BottomKByKey(k),
          org.apache.spark.sql.Encoders.product[(String, Long)])
        val got = rows.groupBy("stratum")
          .agg(bk(F.col("key"), F.col("id")).as("picked"))
          .select(F.col("stratum"), F.posexplode(F.col("picked")).as(Seq("pos", "m")))
          .select(F.col("stratum"), (F.col("pos") + 1).cast("int").as("rk"),
            F.col("m._1").as("key"), F.col("m._2").as("id"))
          .orderBy("stratum", "rk").collect().toSeq.map(_.toSeq)
        val w = Window.partitionBy("stratum").orderBy("key", "id")
        val want = rows.withColumn("rk", F.row_number().over(w))
          .where(F.col("rk") <= k)
          .select(F.col("stratum"), F.col("rk").cast("int").as("rk"),
            F.col("key"), F.col("id"))
          .orderBy("stratum", "rk").collect().toSeq.map(_.toSeq)
        assert(got == want, s"seed $seed k=$k diverged")
      }
    }
  }

  test("stratified plan: partial ObjectHashAggregate, no Window, no sort of the corpus") {
    val df = PipelineQueries.dSampleStratified(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_bottomkbykey"),
      s"no PARTIAL bottom-k (map-side combine missing):\n$plan")
    assert(!plan.contains("Window"), s"window over the corpus survived:\n$plan")
  }

  test("hash sample is content-keyed: duplicate texts sample identically") {
    val r = PipelineQueries.dSampleHash(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val byText = docs.groupBy(_._2)
    byText.foreach { case (_, ds) =>
      val in = ds.map(_._1).count(r.contains)
      assert(in == 0 || in == ds.length,
        s"content group split by the sample: $in of ${ds.length}")
    }
    // the cut keeps roughly bound/0x10000 of distinct contents
    val distinct = byText.size.toDouble
    val kept = byText.count { case (_, ds) => r.contains(ds.head._1) }
    assert(kept > 0 && kept < distinct, "degenerate sample")
  }
}

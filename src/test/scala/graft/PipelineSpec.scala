package graft

import org.apache.spark.sql.{functions => F}

import graft.pipeline.{Multimodal, Similarity}
import graft.queries.PipelineQueries

/** Multimodal plumbing + ANN recall sanity (SURVEY-plus pipeline ops). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("multimodal batch extraction: deterministic, typed, batch-shaped") {
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(F.col("doc_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
          (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")).as("modality"),
        F.encode(F.col("text"), "UTF-8").as("payload"))
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media, batchSize = 7)
      .orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media.repartition(5), batchSize = 64)
      .orderBy("doc_id").collect()
    assert(f1.length == 500)
    // determinism across partitioning and batch size
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.sha256 == b.sha256 && a.width == b.width &&
        a.frames == b.frames && a.embedding.toSeq == b.embedding.toSeq)
    }
    // typed invariants
    f1.foreach { f =>
      assert(f.embedding.length == Multimodal.EmbeddingDim)
      assert(f.width >= 1 && f.height >= 1 && f.frames >= 1)
      assert(f.n_bytes > 0)
      assert(f.modality != "video" || f.frames <= 24)
    }
  }

  test("ANN LSH: deterministic, plausible recall vs brute force") {
    val brute = PipelineQueries.eCosineTopk(spark, dir)
      .where(F.col("rk") <= 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val lsh1 = Similarity.annLsh(emb, PipelineQueries.AnnQueries, 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val lsh2 = Similarity.annLsh(emb, PipelineQueries.AnnQueries, 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(lsh1 == lsh2, "LSH must be deterministic")
    assert(lsh1.nonEmpty)
    val recall = (brute & lsh1).size.toDouble / brute.size
    // 4 tables x 8 planes (256 buckets) + 1-bit multiprobe over 500
    // near-random vecs: candidates ~14% of corpus, measured recall ~0.3 —
    // about 2x the candidate fraction, the ceiling for unclustered data.
    assert(recall >= 0.2, s"recall $recall suspiciously low")
  }

  test("IVF ANN: deterministic, disjoint cells, plausible recall vs brute force") {
    import graft.pipeline.IvfAnn
    // √n cell derivation
    assert(IvfAnn.deriveCells(500) == 23)
    assert(IvfAnn.deriveCells(2000) == 45)
    assert(IvfAnn.deriveCells(1000L * 1000 * 1000) == 31623)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = IvfAnn.deriveCells(emb.count())
    val idx = IvfAnn.buildIndex(emb, cells)
    // every vector in exactly one cell; all cells are real centroid ids
    assert(idx.assigned.count() == 500)
    assert(idx.assigned.select("vec_id").distinct().count() == 500)
    val cids = idx.cent.select("cid").as[Long].collect().toSet
    assert(cids.size == cells)
    assert(idx.assigned.select("cell").distinct().as[Long].collect().toSet.subsetOf(cids))

    val ivf1 = IvfAnn.annIvfFrom(idx, PipelineQueries.AnnQueries, 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf2 = IvfAnn.annIvf(emb, PipelineQueries.AnnQueries, 3, cells)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf1 == ivf2, "IVF must be deterministic across index builds")
    assert(ivf1.nonEmpty)
    val brute = PipelineQueries.eCosineTopk(spark, dir)
      .where(F.col("rk") <= 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf1).size.toDouble / brute.size
    // nprobe=4 of 23 cells ⇒ ~17% of the corpus searched; near-random
    // vectors give recall ≈ the searched fraction plus the query-side bias
    assert(recall >= 0.15, s"IVF recall $recall suspiciously low")
  }

  test("LSH planes derive from corpus size; buckets actually refine") {
    // formula: planes = max(8, ceil(log2(n / 32))) — constant at driver
    // fixture sizes, growing logarithmically past 8192 vectors
    assert(Similarity.derivePlanes(500) == 8)
    assert(Similarity.derivePlanes(2000) == 8)
    assert(Similarity.derivePlanes(8192) == 8)
    assert(Similarity.derivePlanes(8193) == 9)
    assert(Similarity.derivePlanes(20000) == 10)
    assert(Similarity.derivePlanes(1000L * 1000) == 15)
    assert(Similarity.derivePlanes(1000L * 1000 * 1000) == 25)
    assert((1 to 40).map(i => Similarity.derivePlanes(1L << i)).sliding(2)
      .forall(p => p(0) <= p(1)), "derivePlanes must be monotone")

    // 20k synthetic vectors: the derived 10-plane index must use strictly
    // more buckets per table than the 8-plane default would (finer
    // partitioning = smaller Σ|bucket|² candidate volume at scale)
    val n = 20000L
    val emb = spark.range(n).select(F.col("id").as("vec_id"),
      F.expr("transform(sequence(0, 7), i -> cast(sin(vec_id * (i + 1) + 0.5) as float))")
        .as("embedding"))
    val planes = Similarity.derivePlanes(n)
    def bucketsUsed(p: Int): Long =
      Similarity.buckets(emb, planes = p).select("table_id", "bucket").distinct().count()
    val coarse = bucketsUsed(8)
    val fine = bucketsUsed(planes)
    assert(coarse <= 4L * 256, s"8 planes cannot exceed 256 buckets/table, got $coarse")
    assert(fine > coarse, s"derived $planes-plane index must refine: $fine vs $coarse")
  }
}

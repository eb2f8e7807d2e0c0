package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

import graft.CsrBlock

/** Compact adjacency — SURVEY.md §2.3 E8 / §4.3, the Spark rendition of the
  * reference's compact structure (BASELINE.json:6 "per-partition CSR-packed
  * Datasets"). Two layers:
  *
  * 1. VERTEX-MAJOR PACKING (`packAdjacency`) — one row per source vertex
  *    with its out-neighbors/weights as Tungsten array columns, sorted by
  *    dst for determinism. This is the layer the iteration loop consumes:
  *    the state⋈edges join touches one row per VERTEX instead of one per
  *    EDGE, and message expansion is a codegen'd explode(zip_with(...)).
  *
  * 2. BLOCK CSR (`pack`/`unpack`) — classic offsets+packed-neighbors blocks,
  *    one row per range partition, for at-rest storage density. Built with
  *    repartitionByRange so block sizes track EDGE counts, not vertex
  *    counts, even under power-law degrees.
  */
object Csr {

  /** edges (src, dst, p) → (src, dsts: array<long>, ps: array<double>). */
  def packAdjacency(em: DataFrame): DataFrame =
    em.groupBy("src")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("dst"), F.col("p")))).as("adj"))
      .select(F.col("src"),
        F.expr("transform(adj, x -> x.dst)").as("dsts"),
        F.expr("transform(adj, x -> x.p)").as("ps"))

  /** edges (src, dst, weight) → Dataset[CsrBlock], one row per range
    * partition of src. Deterministic within a fixed partition count. */
  def pack(edges: DataFrame, numPartitions: Int): Dataset[CsrBlock] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges
      .select(F.col("src"), F.col("dst"), F.col("weight"))
      .repartitionByRange(numPartitions, F.col("src"))
      .sortWithinPartitions("src", "dst")
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val vids = scala.collection.mutable.ArrayBuffer.empty[Long]
          val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
          val nbrs = scala.collection.mutable.ArrayBuffer.empty[Long]
          val ws = scala.collection.mutable.ArrayBuffer.empty[Double]
          var cur = Long.MinValue
          it.foreach { case (s, d, w) =>
            if (s != cur) { vids += s; offsets += nbrs.length; cur = s }
            nbrs += d; ws += w
          }
          offsets += nbrs.length
          val pid = org.apache.spark.TaskContext.getPartitionId()
          Iterator.single(CsrBlock(pid, vids.toArray, offsets.toArray,
            nbrs.toArray, ws.toArray))
        }
      }
  }

  /** Inverse of pack: blocks → (src, dst, weight) rows. */
  def unpack(blocks: Dataset[CsrBlock]): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.flatMap { b =>
      b.vids.indices.iterator.flatMap { i =>
        (b.offsets(i) until b.offsets(i + 1)).iterator.map { j =>
          (b.vids(i), b.nbrs(j), b.weights(j))
        }
      }
    }.toDF("src", "dst", "weight")
  }
}

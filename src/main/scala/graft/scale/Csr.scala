package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}
import org.apache.spark.sql.expressions.Window

import graft.CsrBlock

/** Compact adjacency — SURVEY.md §2.3 E8 / §4.3, the Spark rendition of the
  * reference's compact structure (BASELINE.json:6 "per-partition CSR-packed
  * Datasets"). Two layers:
  *
  * 1. VERTEX-MAJOR PACKING (`packAdjacency` / `packAdjacencyKeys`) — rows of
  *    (src, neighbor arrays) as Tungsten array columns, sorted by dst for
  *    determinism, HUB-SPLIT: no row carries more than `maxSegment`
  *    neighbors; a vertex of degree d packs into ⌈d/maxSegment⌉ segment
  *    rows (same src, disjoint contiguous dst slices). This is the layer
  *    the iteration loops consume: the state⋈edges join touches one row per
  *    vertex-SEGMENT instead of one per edge, message expansion is the
  *    CsrExpand custom operator, and — because segments are bounded — a
  *    10⁸-degree hub becomes ~25k modest rows spread across tasks instead
  *    of one giant array row pinned to one task (round-2 verdict item #2).
  *
  * 2. BLOCK CSR (`pack`/`unpack`) — classic offsets+packed-neighbors blocks,
  *    one row per range partition, for at-rest storage density. Built with
  *    repartitionByRange so block sizes track EDGE counts, not vertex
  *    counts, even under power-law degrees.
  */
object Csr {

  /** Default per-row neighbor cap: 4096 longs+doubles ≈ 64 KiB per segment
    * row — big enough that expansion amortizes, small enough that the agg
    * buffer and any single task stay bounded under power-law degrees. */
  val DefaultSegment = 4096

  /** Segment id = position of the edge in its vertex's dst-ordered neighbor
    * list, divided by the cap. The window's sort exchange is on `src`, so
    * the groupBy(src, seg) that follows needs NO second exchange
    * (HashPartitioning(src) satisfies clustering by (src, seg)), and groups
    * are bounded by maxSegment — the collect_list buffer never exceeds the
    * cap even while packing a mega-hub. Deterministic: dst is unique per
    * src (weights pre-aggregated), so segments are stable contiguous
    * dst-ranges. */
  private def segmented(em: DataFrame, maxSegment: Int): DataFrame = {
    require(maxSegment > 0, s"maxSegment must be positive, got $maxSegment")
    val w = Window.partitionBy("src").orderBy("dst")
    em.withColumn("seg",
      F.floor((F.row_number().over(w) - 1) / F.lit(maxSegment)))
  }

  /** edges (src, dst, p) → (src, dsts: array<long>, ps: array<double>),
    * ≤ maxSegment neighbors per row. */
  def packAdjacency(em: DataFrame, maxSegment: Int = DefaultSegment): DataFrame =
    segmented(em.select(F.col("src"), F.col("dst"), F.col("p")), maxSegment)
      .groupBy("src", "seg")
      .agg(F.sort_array(F.collect_list(F.struct(F.col("dst"), F.col("p")))).as("adj"))
      .select(F.col("src"),
        F.expr("transform(adj, x -> x.dst)").as("dsts"),
        F.expr("transform(adj, x -> x.p)").as("ps"))

  /** Unweighted variant for CC/LPA message expansion:
    * edges (src, dst) → (src, dsts: array<long>), ≤ maxSegment per row. */
  def packAdjacencyKeys(edges: DataFrame, maxSegment: Int = DefaultSegment): DataFrame =
    segmented(edges.select(F.col("src"), F.col("dst")), maxSegment)
      .groupBy("src", "seg")
      .agg(F.sort_array(F.collect_list(F.col("dst"))).as("dsts"))
      .select(F.col("src"), F.col("dsts"))

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

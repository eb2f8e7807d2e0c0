package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Turn
import graft.graph.GraphBuilder

/** Structured-Streaming ingest — SURVEY.md §2.9 (optional capability,
  * built): transcript rows arrive incrementally; edges are emitted online.
  *
  * ST1: `readStream` over the transcript directory → streaming edge rows →
  *      any sink; weights aggregate downstream (streaming agg or
  *      foreachBatch merge).
  * ST2: watermark + dropDuplicates(conv_id, turn_idx) — late/replayed turns
  *      are idempotent.
  * ST3: per-conversation `flatMapGroupsWithState`: state = last seen turn
  *      (idx + entity key), so turn-adjacency edges span microbatch
  *      boundaries without reprocessing the conversation.
  *
  * Edge semantics are identical to the batch builder (GraphBuilder): the
  * streaming path emits the same raw (src_key, dst_key, kind) multiset when
  * turns arrive in order; out-of-order turns within a batch are sorted, and
  * cross-batch regressions are guarded by ST2.
  */
object IncrementalIngest {

  case class ConvState(lastIdx: Int, lastKey: String)
  case class RawEdge(src_key: String, dst_key: String, kind: Int)

  def entityKey(t: Turn): String = t.tool match {
    case Some(tool) if tool.nonEmpty => s"tool:$tool"
    case _                           => s"role:${t.role}"
  }

  /** Stateful online edge emission (ST3). Works on both batch and streaming
    * Datasets (flatMapGroupsWithState requires streaming; for batch tests
    * use `edgesOfBatch`). */
  def streamingEdges(turns: Dataset[Turn]): Dataset[RawEdge] = {
    import turns.sparkSession.implicits._
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emitConv)
  }

  /** Per-conversation incremental emission; shared by stream + batch. */
  def emitConv(convId: String, it: Iterator[Turn],
               state: GroupState[ConvState]): Iterator[RawEdge] = {
    val sorted = it.toVector.sortBy(_.turn_idx)
    val prior = state.getOption
    // drop replays / regressions (ST2 guard)
    val fresh = prior match {
      case Some(s) => sorted.filter(_.turn_idx > s.lastIdx)
      case None    => sorted
    }
    if (fresh.isEmpty) return Iterator.empty
    val keys = fresh.map(entityKey)
    val adjacency =
      (prior.map(_.lastKey).toVector ++ keys)
        .sliding(2).collect {
          case Vector(a, b) if a != b => RawEdge(a, b, GraphBuilder.KindAdjacency)
        }.toVector
    val invocation = fresh.collect {
      case t if t.tool.exists(_.nonEmpty) =>
        RawEdge(s"conv:${t.conv_id}", s"tool:${t.tool.get}", GraphBuilder.KindInvocation)
    }
    state.update(ConvState(fresh.last.turn_idx, keys.last))
    (adjacency ++ invocation).iterator
  }

  /** Tumbling-window tool-usage counts with watermark (ST2 + windowed agg):
    * tool invocations per 1-minute event-time window. */
  def windowedToolCounts(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("conv_id", "turn_idx")
      .where(F.col("tool").isNotNull && F.col("tool") =!= "")
      .groupBy(F.window(F.col("ts"), "1 minute"), F.col("tool"))
      .agg(F.count(F.lit(1)).as("n"))
      .select(F.col("window.start").as("win_start"), F.col("tool"), F.col("n"))
}

package graft.streaming

import org.apache.spark.sql.{Dataset, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental EXACT dedup — the online counterpart of
  * PipelineQueries.dExactDedup for a training-data ingest pipeline:
  * documents arrive in micro-batches, each is labeled against every
  * document ever seen (not just its own batch), and the duplicate decision
  * streams out immediately.
  *
  * State per content hash (md5 of text) = the canonical doc_id: the first
  * document ever seen with that hash (smallest doc_id within the arrival
  * batch, so intra-batch ordering is deterministic). `flatMapGroupsWithState`
  * keeps the state partitioned by hash — the same hash-partitioned shuffle
  * the batch groupBy pays, but amortized across the stream's lifetime, and
  * the per-key state is ONE long regardless of how many duplicates a viral
  * document accumulates.
  *
  * When documents arrive in doc_id order, the emitted labels equal the
  * batch operator's min-doc_id canonicalization exactly (StreamingSpec).
  */
object StreamingDedup {

  case class DocRow(doc_id: Long, text: String)
  case class HashState(canonicalId: Long)
  case class DedupLabel(doc_id: Long, text_md5: String, canonical_id: Long, is_dup: Boolean)

  def dedupStream(docs: Dataset[DocRow]): Dataset[DedupLabel] = {
    import docs.sparkSession.implicits._
    docs
      .select(F.col("doc_id"), F.md5(F.col("text")).as("text_md5"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emitHash)
  }

  /** Per-hash incremental labeling; unit-testable like emitConv. */
  def emitHash(hash: String, it: Iterator[(Long, String)],
               state: GroupState[HashState]): Iterator[DedupLabel] = {
    val ids = it.map(_._1).toVector.sorted
    if (ids.isEmpty) return Iterator.empty
    val canon = state.getOption.map(_.canonicalId).getOrElse(ids.head)
    if (state.getOption.isEmpty) state.update(HashState(canon))
    ids.iterator.map(id => DedupLabel(id, hash, canon, id != canon))
  }
}

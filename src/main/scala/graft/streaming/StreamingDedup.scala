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
  * ==State lifecycle (round-4)==
  *
  * Per-hash state never expires by default — correct for the bounded
  * corpora the equivalence tests replay, unbounded for an always-on ingest.
  * Production levers, both pinned by StreamingSpec:
  *
  *  - '''RocksDB state store''': set [[rocksDbConf]] on the session before
  *    starting the query — state lives off-heap in RocksDB (spillable to
  *    disk, incremental checkpointing) instead of the default on-heap
  *    HDFSBackedStateStore, which keeps EVERY key in executor memory.
  *  - '''Watermark-driven expiry''': [[dedupStreamExpiring]] drops a
  *    hash's state once the event-time watermark passes its last arrival
  *    + TTL. Documented semantics: an EXPIRED hash RE-CANONICALIZES — the
  *    next document with that text becomes a fresh canonical (labeled
  *    non-dup), exactly as if it were the first ever seen. That is the
  *    honest trade of bounded state: dedup horizon = TTL.
  */
object StreamingDedup {

  case class DocRow(doc_id: Long, text: String)
  case class TimedDocRow(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class HashState(canonicalId: Long)
  case class DedupLabel(doc_id: Long, text_md5: String, canonical_id: Long, is_dup: Boolean)

  /** Session conf for the RocksDB state store provider (bundled with Spark
    * 4.x) — apply before `writeStream.start()` for long-lived streams:
    * {{{ rocksDbConf.foreach { case (k, v) => spark.conf.set(k, v) } }}} */
  val rocksDbConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // unload idle RocksDB instances promptly in local/test runs
    "spark.sql.streaming.stateStore.maintenanceInterval" -> "30s")

  /** PRECONDITION (surfaced here, not just in the kernel — round-3 ADVICE):
    * streaming labels equal the batch operator's min-doc_id canonicalization
    * only when documents arrive in doc_id order ACROSS batches (intra-batch
    * order is handled by sorting). Under out-of-order arrival the canonical
    * is FIRST-SEEN, not global-min — labels then differ from d_dedup_exact
    * but remain a consistent canonicalization (one stable representative
    * per content hash). */
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

  /** Bounded-state variant: per-hash state expires once the event-time
    * watermark passes the hash's last arrival + `ttlMs`. Requires an
    * event-time column; `delayThreshold` is the watermark lateness bound
    * (`withWatermark` syntax, e.g. "10 minutes"). Expiry semantics: the
    * hash re-canonicalizes — see the object scaladoc. Arrival-order
    * precondition identical to [[dedupStream]]. */
  def dedupStreamExpiring(docs: Dataset[TimedDocRow], delayThreshold: String,
                          ttlMs: Long): Dataset[DedupLabel] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", delayThreshold)
      .select(F.col("doc_id"), F.md5(F.col("text")).as("text_md5"), F.col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        emitHashExpiring(ttlMs))
  }

  /** Expiring kernel: timeout timestamp slides forward with every arrival
    * of the hash (last-arrival + TTL), clamped above the current watermark
    * (setTimeoutTimestamp rejects timestamps the watermark already
    * passed). On timeout the state is REMOVED — the next arrival of that
    * text starts a fresh canonical. */
  def emitHashExpiring(ttlMs: Long)(hash: String,
                                    it: Iterator[(Long, String, java.sql.Timestamp)],
                                    state: GroupState[HashState]): Iterator[DedupLabel] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val rows = it.toVector.sortBy(_._1)
    if (rows.isEmpty) return Iterator.empty
    val canon = state.getOption.map(_.canonicalId).getOrElse(rows.head._1)
    if (state.getOption.isEmpty) state.update(HashState(canon))
    val lastArrival = rows.map(_._3.getTime).max
    state.setTimeoutTimestamp(math.max(lastArrival + ttlMs,
      state.getCurrentWatermarkMs() + 1))
    rows.iterator.map(r => DedupLabel(r._1, hash, canon, r._1 != canon))
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup detection — the online counterpart of
  * `d_simhash64_pairs`: as documents arrive, each is checked against every
  * document ever seen and candidate near-dup pairs (Hamming ≤ maxHamming
  * over the 64-bit SimHash) stream out immediately.
  *
  * Same pigeonhole banding as the batch operator: the 64-bit fingerprint
  * splits into maxHamming+1 = 4 chunks of 16 bits; two hashes within
  * Hamming 3 agree on ≥ 1 chunk, so per-chunk-value state suffices. State
  * per (chunk_idx, chunk_value) key = the (doc_id, simhash64) list of that
  * bucket — expected n/65536 entries per chunk at corpus size n, the same
  * bucket geometry that makes the batch join sub-quadratic.
  *
  * A pair agreeing on several chunks is emitted once per agreeing chunk
  * (the keys are independent); downstream consumers dedup on (da, db) —
  * the batch operator's `.distinct()` — which the equivalence test applies.
  */
object StreamingNearDup {

  val ChunkBits = 16
  val NChunks = 4 // = maxHamming + 1 for HammingMax = 3

  case class HashedDoc(doc_id: Long, simhash64: Long)
  case class BandedDoc(chunk_idx: Int, cv: Long, doc_id: Long, simhash64: Long)
  case class NearDupPair(da: Long, db: Long, hamming: Int)

  /** Per-document 64-bit fingerprints for an incoming document stream
    * (doc_id, text) — same expression chain as the batch d_simhash64. */
  def fingerprints(docs: Dataset[StreamingDedup.DocRow]): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(F.col("doc_id"),
        F.expr("simhash64(array_distinct(filter(coalesce(split(text, ' '), array()), w -> w <> '')))")
          .as("simhash64"))
      .as[HashedDoc]
  }

  def nearDupStream(docs: Dataset[StreamingDedup.DocRow],
                    maxHamming: Int = 3): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    fingerprints(docs)
      .flatMap { h =>
        (0 until NChunks).map { c =>
          BandedDoc(c, (h.simhash64 >>> (c * ChunkBits)) & ((1L << ChunkBits) - 1),
            h.doc_id, h.simhash64)
        }
      }
      .groupByKey(b => (b.chunk_idx, b.cv))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        emitBucket(maxHamming))
  }

  /** Per-bucket incremental pair emission; unit-testable like emitHash. */
  def emitBucket(maxHamming: Int)(key: (Int, Long), it: Iterator[BandedDoc],
                                  state: GroupState[List[HashedDoc]]): Iterator[NearDupPair] = {
    val arrivals = it.map(b => HashedDoc(b.doc_id, b.simhash64)).toVector
      .sortBy(_.doc_id).distinct
    if (arrivals.isEmpty) return Iterator.empty
    var seen = state.getOption.getOrElse(Nil)
    val out = Vector.newBuilder[NearDupPair]
    arrivals.foreach { d =>
      // against everything previously seen in this bucket AND earlier
      // arrivals of this batch (seen grows as the batch drains)
      seen.foreach { p =>
        if (p.doc_id != d.doc_id) {
          val ham = java.lang.Long.bitCount(p.simhash64 ^ d.simhash64)
          if (ham <= maxHamming)
            out += NearDupPair(math.min(p.doc_id, d.doc_id),
              math.max(p.doc_id, d.doc_id), ham)
        }
      }
      seen = d :: seen
    }
    state.update(seen)
    out.result().iterator
  }
}

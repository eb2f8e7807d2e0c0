package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation — the SURVEY.md §2.11 `Aggregator` surface,
  * built for the ANN tails (O1 at aggregation time).
  *
  * Problem shape: rank the k best (cosine, vec_id) candidates PER QUERY.
  * The window formulation (`row_number over (partition by qid order by
  * cosine desc)`) must shuffle and sort EVERY scored candidate row by qid
  * — Σ|candidates| rows, which at 10⁹-vector scale is orders of magnitude
  * more than the qid×k rows anyone reads. This typed Aggregator keeps a
  * bounded buffer of the k best per group, so the hash aggregate
  * PARTIAL-combines map-side: each upstream partition contributes at most
  * k rows per query to the exchange, and no sort ever touches the full
  * candidate set. Plan: ObjectHashAggregate(partial_topk) → exchange →
  * ObjectHashAggregate(topk) — asserted in PlanAuditSpec.
  *
  * Ordering contract (identical to the window variant, total and
  * deterministic): higher cosine wins, ties broken by smaller vec_id.
  * `finish` emits the winners best-first, so `posexplode` yields rk = pos+1
  * — output rows are bitwise those of the window formulation.
  */
class TopKCosine(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  // buffer: the current top candidates as (cosine, vec_id), kept sorted
  // best-first; length ≤ k. k is small (≤ tens), so insertion into an
  // immutable list (encoder-friendly, no UDT) beats heap bookkeeping.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] =
    insert(buf, (in._2, in._1))

  private def insert(buf: List[(Double, Long)], c: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && better(buf.last, c)) buf // common case: not in top k
    else {
      val (pre, post) = buf.span(better(_, c))
      (pre ::: c :: post).take(k)
    }
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.map { case (cos, id) => (id, cos) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

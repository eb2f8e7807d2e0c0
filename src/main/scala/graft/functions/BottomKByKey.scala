package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k by (sortKey, id) — the stratified-sampling counterpart
  * of [[TopKCosine]] (same §2.11 Aggregator surface, same plan shape:
  * ObjectHashAggregate(partial) → exchange → ObjectHashAggregate(final)).
  *
  * Problem shape: keep the K lexicographically-smallest (sample_key, id)
  * pairs PER STRATUM. The window formulation (`row_number over (partition
  * by stratum order by key, id)`) shuffles and sorts EVERY corpus row by
  * stratum — with a handful of strata (languages) over a 100-TB corpus
  * that is a few reducers each sorting terabytes. This Aggregator keeps a
  * bounded k-buffer per group and partial-combines map-side: each upstream
  * partition contributes ≤ k rows per stratum to the exchange and nothing
  * is ever globally sorted.
  *
  * Ordering contract (identical to the window variant, total and
  * deterministic): smaller (key, id) wins. `finish` emits winners
  * smallest-first, so `posexplode` yields rk = pos + 1 — output rows are
  * bitwise those of the window formulation (pinned in SampleSpec).
  */
class BottomKByKey(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[(String, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: List[(String, Long)] = Nil

  override def reduce(buf: List[(String, Long)], in: (String, Long)): List[(String, Long)] =
    insert(buf, in)

  private def insert(buf: List[(String, Long)], c: (String, Long)): List[(String, Long)] = {
    if (buf.lengthCompare(k) >= 0 && better(buf.last, c)) buf // not in bottom k
    else {
      val (pre, post) = buf.span(better(_, c))
      (pre ::: c :: post).take(k)
    }
  }

  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored row entering the top-k. */
final case class Scored(id: Long, score: Double)

/** Typed UDAF surface (SURVEY §2.11 X3): exact per-group top-k as an
  * `Aggregator`. Scale rationale: `row_number() OVER (PARTITION BY g
  * ORDER BY s)` shuffles and sorts EVERY row of every group; this
  * aggregator keeps a k-bounded buffer per group on the map side, so the
  * shuffle carries at most k rows per (partition, group) — the same
  * partial/final split Spark's TakeOrderedAndProject uses globally,
  * applied per group.
  *
  * Ordering is total (score desc, id asc) for deterministic results.
  */
final class TopKAggregator(k: Int)
  extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def best(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    // cheap guard: only re-sort when the candidate can enter
    if (buf.size < k || a.score > buf.last.score ||
      (a.score == buf.last.score && a.id < buf.last.id)) best(buf :+ a)
    else buf

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    best(x ++ y)

  override def finish(r: Seq[Scored]): Seq[Scored] = best(r)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

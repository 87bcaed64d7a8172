package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a MERGEABLE Spark
  * `Aggregator` (Misra & Gries 1982; mergeability per Agarwal et al.
  * 2013, "Mergeable Summaries"): at most `k` counters survive at any
  * point, and any item with true frequency > N/(k+1) is GUARANTEED to
  * be among them after arbitrary partitioning and merge order — the
  * property that makes the two-pass exact heavy-hitters pattern
  * correct at any scale (pass 1: this sketch, one tree-reduce to k
  * counters; pass 2: exact counts of the ≤k candidates only).
  *
  * reduce: increment, or if k counters are full, decrement all by the
  * minimum count and drop zeros (the classic MG step, batched).
  * merge: pointwise sum, then subtract the (k+1)-th largest count and
  * drop non-positives (the mergeable-summaries combine).
  *
  * The buffer is an immutable Map — clarity over constant-factor
  * speed; a production hot path would carry a mutable open-addressing
  * buffer through the same algebra.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    if (tok == null) return b
    val nb = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
    if (nb.size <= k) nb
    else {
      val dec = nb.values.min
      nb.collect { case (t, c) if c > dec => t -> (c - dec) }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      sum.collect { case (t, c) if c > d => t -> (c - d) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}

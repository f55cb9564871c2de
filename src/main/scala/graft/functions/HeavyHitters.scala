package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded buffer of the Misra-Gries heavy-hitters sketch: surviving
  * keys with their RESIDUAL counts (a lower bound on the true count;
  * true − residual ≤ n/(k+1)). */
case class MGBuf(keys: Map[String, Long])

/** Misra-Gries heavy-hitters sketch as a typed aggregate — the
  * frequent-items analog of the bounded top-k tier (TopK.scala): O(k)
  * state per task however many rows stream through, merged
  * associatively, landing in ObjectHashAggregate with map-side
  * partials. Guarantee (the classic one): every key whose true count
  * exceeds n/(k+1) SURVIVES to the final buffer, so the buffer is a
  * complete candidate set for any top-h query with h-th count above
  * that threshold — [[graft.operators.TextAnalysis.heavyHitters]]
  * exact-counts the ≤k survivors to finish the job.
  *
  * reduce: increment if present; insert if room; else decrement every
  * counter (dropping zeros) — each such step retires k+1 occurrences,
  * which is where the n/(k+1) bound comes from. merge: sum per-key
  * residuals, and if more than k keys survive subtract the (k+1)-th
  * largest sum from all (Agrawal et al.'s mergeable-summaries rule —
  * the same bound telescopes across partitions). */
class MisraGries(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
  require(k > 0)

  def zero: MGBuf = MGBuf(Map.empty)

  def reduce(b: MGBuf, key: String): MGBuf = {
    val m = b.keys
    m.get(key) match {
      case Some(c) => MGBuf(m.updated(key, c + 1))
      case None if m.size < k => MGBuf(m.updated(key, 1L))
      case None => MGBuf(m.collect { case (kk, c) if c > 1 => kk -> (c - 1) })
    }
  }

  def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (a.keys.isEmpty) return b
    if (b.keys.isEmpty) return a
    val sum = (a.keys.keySet ++ b.keys.keySet).iterator
      .map(kk => kk -> (a.keys.getOrElse(kk, 0L) + b.keys.getOrElse(kk, 0L)))
      .toMap
    if (sum.size <= k) MGBuf(sum)
    else {
      val thr = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(sum.collect { case (kk, c) if c > thr => kk -> (c - thr) })
    }
  }

  def finish(b: MGBuf): MGBuf = b
  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}

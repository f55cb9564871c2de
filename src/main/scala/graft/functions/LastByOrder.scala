package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** IO/buffer rows for the hash-aggregable last-by-order aggregates:
  * `ord` is the order key packed as longs (lexicographic — the caller
  * guarantees each component was packed order-preservingly), `v` the
  * carried value, `ok` the validity flag (`false` ⇒ no non-null value
  * seen yet; `v` is then a placeholder, never read). */
case class OrdLong(ord: Seq[Long], v: Long, ok: Boolean)
case class OrdDouble(ord: Seq[Long], v: Double, ok: Boolean)

/** "Value at the greatest order among non-null rows" — the per-bucket
  * summary the grouped running-last/lag machinery needs
  * (operators/Windows.scala) — as a typed Aggregator so it runs in
  * ObjectHashAggregate with map-side partial aggregation. The
  * `max(struct(order..., value))` form it replaces carries a
  * struct-typed buffer, which forces SortAggregate: a full map-side
  * sort of the data by bucket key just to reduce each bucket to one
  * row. This buffer is one (Seq[Long], value, flag) register — O(1)
  * state, no sort, and reduce/merge are the same associative,
  * commutative max-by, so any partitioning and merge order yields the
  * row with the greatest order key (the caller's order is strictly
  * total over non-null rows, so the winner is unique). */
object LastByOrder {
  private[functions] def lexLt(a: Seq[Long], b: Seq[Long]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }
}

class LastLongByOrder extends Aggregator[OrdLong, OrdLong, OrdLong] {
  private def pick(b: OrdLong, a: OrdLong): OrdLong =
    if (!a.ok) b else if (!b.ok || LastByOrder.lexLt(b.ord, a.ord)) a else b
  override def zero: OrdLong = OrdLong(Nil, 0L, ok = false)
  override def reduce(b: OrdLong, a: OrdLong): OrdLong = pick(b, a)
  override def merge(x: OrdLong, y: OrdLong): OrdLong = pick(x, y)
  override def finish(r: OrdLong): OrdLong = r
  override def bufferEncoder: Encoder[OrdLong] = Encoders.product[OrdLong]
  override def outputEncoder: Encoder[OrdLong] = Encoders.product[OrdLong]
}

class LastDoubleByOrder extends Aggregator[OrdDouble, OrdDouble, OrdDouble] {
  private def pick(b: OrdDouble, a: OrdDouble): OrdDouble =
    if (!a.ok) b else if (!b.ok || LastByOrder.lexLt(b.ord, a.ord)) a else b
  override def zero: OrdDouble = OrdDouble(Nil, 0.0, ok = false)
  override def reduce(b: OrdDouble, a: OrdDouble): OrdDouble = pick(b, a)
  override def merge(x: OrdDouble, y: OrdDouble): OrdDouble = pick(x, y)
  override def finish(r: OrdDouble): OrdDouble = r
  override def bufferEncoder: Encoder[OrdDouble] = Encoders.product[OrdDouble]
  override def outputEncoder: Encoder[OrdDouble] = Encoders.product[OrdDouble]
}

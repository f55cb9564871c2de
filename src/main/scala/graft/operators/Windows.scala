package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-based windows — the reference's WindowCollectable.slide/tumble
  * (semantic.h:1595-1643, 908-913): windows over the LOGICAL INDEX, not
  * time. Batch shape: assign window ids and aggregate — one shuffle, no
  * per-window materialization. Partial tail windows are included, exactly
  * like the reference (window starts at every multiple of `step` < n).
  *
  * For the time-based streaming reinterpretation see
  * [[graft.streaming.StreamWindows]].
  */
object Windows {

  /** Tumbling window id: idx ∈ [w·size, (w+1)·size) → w
    * (tumble(size) ≡ slide(size, size), semantic.h:910-913). */
  def tumbleId(idx: Column, size: Long): Column = floor(idx / size).cast("long")

  /** All sliding-window ids covering idx: w·step ≤ idx < w·step+size.
    * Emitted via `sequence` + `explode` — each row fans out to at most
    * ⌈size/step⌉ windows, fully distributed, no self-join. */
  def slideIds(idx: Column, size: Long, step: Long): Column = {
    val wMax = floor(idx / step)
    val wMin = greatest(lit(0L), floor((idx - size) / step) + 1)
    explode(sequence(wMin.cast("long"), wMax.cast("long")))
  }

  /** Fixed-size chunks in arrival order — the reference's partition(size)
    * collector (collector.h:2098-2136). */
  def chunkId(idx: Column, size: Long): Column = tumbleId(idx, size)

  /** Distributed INCLUSIVE running total of `value` along a total order
    * with a numeric leading column — a global cumulative sum WITHOUT the
    * classic single-partition `Window.orderBy` trap. Same shape as the
    * rank core (IndexOps.rankNumericPrefix): equal-width value buckets
    * on `lead` (data-derived min/max, AQE-safe) → per-bucket windowed
    * running sum over the full order → per-bucket totals prefix-summed
    * over ≤ shuffle-partitions rows and broadcast back. The order must
    * be total (include a unique tiebreak); lead values non-null/non-NaN.
    * Adds `cumCol` (long) to the input columns. */
  def runningTotal(df: DataFrame, lead: Column, order: Seq[Column],
                   value: Column, cumCol: String): DataFrame = {
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.core.IndexOps.bucketizeByLead(df, lead)
      .withColumn("__cum", sum(value.cast("long")).over(w))
    // bucket totals are sum(value), NOT max(__cum) — with negative values
    // a bucket's running sum can peak above its final total
    val offsets = graft.core.IndexOps.prefixOffsets(
      cum.groupBy(col("__b")).agg(sum(value.cast("long")).as("__tot")),
      ascending = true)
    cum.join(broadcast(offsets), "__b")
      .withColumn(cumCol, col("__off") + col("__cum"))
      .drop("__b", "__cum", "__off")
  }

  /** Distributed per-GROUP inclusive running total along a total order
    * WITHIN each group — the grouped twin of [[runningTotal]], without
    * the `Window.partitionBy(group)` trap (a low-cardinality group —
    * five languages over 100 TB — collapses each group onto one task).
    * Same shape as the grouped rank (IndexOps.rankGroupedPrefix):
    * dense numeric group ids (tiny distinct frame, broadcast) →
    * group-major sub-buckets from each group's own lead range →
    * per-bucket windowed running sum → per-(group, bucket) totals
    * prefix-summed per group over ≤ groups×partitions rows and
    * broadcast back. The lead is auto-projected through the
    * numericLeadOf chokepoint (strings → 7-byte prefix number), and the
    * order must be total within each group. Adds `cumCol` (long). */
  def groupedRunningTotal(df: DataFrame, group: Column, lead: Column,
                          order: Seq[Column], value: Column,
                          cumCol: String): DataFrame = {
    val leadDt = df.select(lead).schema.head.dataType
    val numLead = graft.core.SemanticStream.numericLeadOf(leadDt, lead)
      .getOrElse(throw new IllegalArgumentException(
        s"groupedRunningTotal: lead type $leadDt has no monotone numeric projection"))
    val gids = df.select(group.as("__gv")).distinct()
      .withColumn("__gid",
        row_number().over(Window.orderBy(col("__gv"))).cast("long"))
    // ≤ #groups rows — the unpartitioned window is bounded by group count
    val withG = df.join(broadcast(gids), group <=> col("__gv"))
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.core.IndexOps.bucketizeByGroupedLead(withG, col("__gid"), numLead)
      .withColumn("__cum", sum(value.cast("long")).over(w))
    val totals = cum.groupBy(col("__b"), col("__gid"))
      .agg(sum(value.cast("long")).as("__tot"))
    val offsets = totals.withColumn("__off", coalesce(
        sum(col("__tot")).over(Window.partitionBy(col("__gid")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    cum.join(broadcast(offsets), "__b")
      .withColumn(cumCol, col("__off") + col("__cum"))
      .drop("__b", "__gid", "__gv", "__cum", "__off")
  }

  /** Distributed per-GROUP running LAST-NON-NULL carry along a total
    * order within each group — the prefix-scan behind the as-of join,
    * without the `Window.partitionBy(key)` trap (one instrument owning
    * half a quotes stream collapses onto one task; AQE splits skewed
    * joins and aggregates but never window partitions). Each `carryCols`
    * column is REPLACED by `last(c, ignoreNulls)` over the group's full
    * order prefix. Same bucket decomposition as [[groupedRunningTotal]]:
    * dense group ids → group-major equal-width sub-buckets on `lead` →
    * per-bucket windowed running last → per-bucket "last non-null by
    * order" summaries (a max of (order, value) structs over non-null
    * rows — ≤ groups×partitions rows) prefix-carried per group and
    * broadcast back as each bucket's carry-in. `order` is a sequence of
    * PLAIN columns compared ASCENDING (they double as struct fields in
    * the summaries, where sort-order expressions cannot appear); it must
    * be total within each group and non-null (use tag/tiebreak columns,
    * as the as-of union does); `lead` must be its monotone numeric
    * head. */
  def groupedRunningLast(df: DataFrame, group: Column, lead: Column,
                         order: Seq[Column], carryCols: Seq[String]): DataFrame = {
    val leadDt = df.select(lead).schema.head.dataType
    val numLead = graft.core.SemanticStream.numericLeadOf(leadDt, lead)
      .getOrElse(throw new IllegalArgumentException(
        s"groupedRunningLast: lead type $leadDt has no monotone numeric projection"))
    val gids = df.select(group.as("__gv")).distinct()
      .withColumn("__gid",
        row_number().over(Window.orderBy(col("__gv"))).cast("long"))
    // ≤ #groups rows — the unpartitioned window is bounded by group count
    val withG = df.join(broadcast(gids), group <=> col("__gv"))
    val bucketed = graft.core.IndexOps.bucketizeByGroupedLead(withG, col("__gid"), numLead)
    val w = Window.partitionBy(col("__b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinBucket = carryCols.foldLeft(bucketed) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    // per-bucket last non-null BY ORDER: max over (order..., value)
    // structs of the non-null rows — order columns are non-null, so the
    // struct comparison is total; ≤ groups×(partitions+1) result rows
    val lastAggs = carryCols.map { c =>
      max(when(col(c).isNotNull,
        struct(order.map(o => o) :+ col(c).as("__v"): _*)))
        .getField("__v").as(s"__bl_$c")
    }
    val summaries = bucketed.groupBy(col("__b"), col("__gid")).agg(lastAggs.head, lastAggs.tail: _*)
    // carry-in per bucket: last non-null summary among STRICTLY preceding
    // buckets of the same group (≤ partitions+1 rows per group)
    val wCarry = Window.partitionBy(col("__gid")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIns = carryCols.foldLeft(summaries) { (d, c) =>
      d.withColumn(s"__ci_$c", last(col(s"__bl_$c"), ignoreNulls = true).over(wCarry))
    }.select(col("__b") +: carryCols.map(c => col(s"__ci_$c")): _*)
    val joined = withinBucket.join(broadcast(carryIns), "__b")
    carryCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__ci_$c"))).drop(s"__ci_$c")
    }.drop("__b", "__gid", "__gv")
  }
}

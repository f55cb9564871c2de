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

  /** Per-group equal-width sub-buckets on `numLead`, derived from each
    * group's OWN min/max (one per-group aggregate, joined back). Adds
    * `__g` (the group value itself) and `__sb` (sub-bucket 0..parts) —
    * every downstream window partitions by the PAIR (`__g`, `__sb`), so
    * no window partition ever exceeds rows-per-group / parts.
    *
    * Deliberately NO dense group ids and NO broadcast hints: a dense-gid
    * frame needs a global `row_number` window (an O(#groups) single-task
    * sort) and a forced broadcast that OOMs at realistic key cardinality
    * (millions of users/instruments). Joining on the raw group value
    * lets the planner broadcast the per-group stats while they are small
    * and fall back to a shuffle join — both sides already hash on the
    * group key — when cardinality outgrows that. Null groups survive via
    * null-safe equality. */
  private[graft] def subBucketize(df: DataFrame, group: Column, numLead: Column): DataFrame = {
    val parts = math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    // __g is materialized on the BIG frame (not taken from the stats
    // side of the join): downstream exchanges hash on it, and an
    // attribute that originated on the broadcast side would carry no
    // partitioning lineage for the planner to reuse
    val withG = df.withColumn("__g", group)
    val stats = withG.groupBy(col("__g").as("__gs"))
      .agg(min(numLead).cast("double").as("__mn"), max(numLead).cast("double").as("__mx"))
    val width = (col("__mx") - col("__mn")) / parts
    // __bk packs (group, sub-bucket) into ONE non-null struct attribute.
    // Everything downstream keys on it — window partitions, summary
    // group-bys, carry joins — for two reasons: (a) struct equality is
    // ordering-based, so null groups compare equal without `<=>` (whose
    // key-wrapping would defeat partitioning reuse); (b) a plain `===`
    // on the same attribute the window partitioned by lets the planner
    // satisfy the carry join's distribution AND sort from the window's
    // own exchange — the big side is never re-shuffled or re-sorted for
    // the join.
    withG.join(stats, col("__g") <=> col("__gs"))
      .withColumn("__sb",
        when(numLead.isNull, lit(0L))
          .when(col("__mx") === col("__mn"), lit(1L))
          .otherwise(lit(1L) + least(floor((numLead.cast("double") - col("__mn")) / width),
            lit(parts - 1L))).cast("long"))
      .drop("__gs", "__mn", "__mx")
      .withColumn("__bk", struct(col("__g"), col("__sb")))
  }

  private def numericLeadOrThrow(df: DataFrame, lead: Column, who: String): Column = {
    val leadDt = df.select(lead).schema.head.dataType
    graft.core.SemanticStream.numericLeadOf(leadDt, lead)
      .getOrElse(throw new IllegalArgumentException(
        s"$who: lead type $leadDt has no monotone numeric projection"))
  }

  /** Distributed per-GROUP inclusive running total along a total order
    * WITHIN each group — the grouped twin of [[runningTotal]], without
    * the `Window.partitionBy(group)` trap (a low-cardinality group —
    * five languages over 100 TB — collapses each group onto one task).
    * [[subBucketize]] splits each group into equal-width sub-ranges of
    * its own lead → per-(group, sub-bucket) windowed running sum →
    * per-(group, sub-bucket) totals prefix-summed per group over
    * ≤ parts+1 rows each and joined back. The lead is auto-projected
    * through the numericLeadOf chokepoint (strings → 7-byte prefix
    * number), and the order must be total within each group. Adds
    * `cumCol` (long). */
  def groupedRunningTotal(df: DataFrame, group: Column, lead: Column,
                          order: Seq[Column], value: Column,
                          cumCol: String): DataFrame = {
    val numLead = numericLeadOrThrow(df, lead, "groupedRunningTotal")
    val w = Window.partitionBy(col("__bk")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = subBucketize(df, group, numLead)
      .withColumn("__cum", sum(value.cast("long")).over(w))
    // totals aggregate the WINDOWED frame: already clustered on __bk, so
    // no exchange of its own — the one big shuffle is the window's
    val totals = cum.groupBy(col("__bk").as("__obk"))
      .agg(sum(value.cast("long")).as("__tot"))
    // exclusive prefix over a group's sub-bucket totals: the window
    // partition is ≤ parts+1 rows per group, at any group cardinality
    val offsets = totals
      .withColumn("__owg", col("__obk").getField("__g"))
      .withColumn("__owsb", col("__obk").getField("__sb"))
      .withColumn("__off", coalesce(
        sum(col("__tot")).over(
          Window.partitionBy(col("__owg")).orderBy(col("__owsb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__obk"), col("__off"))
    cum.join(offsets, col("__bk") === col("__obk"))
      .withColumn(cumCol, col("__off") + col("__cum"))
      .drop("__g", "__sb", "__bk", "__obk", "__cum", "__off")
  }

  /** Shared core of [[groupedRunningLast]] / [[groupedRunningLag]]: for
    * each (in, out) carry pair, `out` := last non-null `in` over the
    * group's order prefix — INCLUSIVE of the current row for running
    * last, STRICTLY PRECEDING for lag. Decomposition: [[subBucketize]] →
    * per-(group, sub-bucket) windowed running last → per-sub-bucket
    * "last non-null by order" summaries (a max of (order..., value)
    * structs over the non-null rows) prefix-carried per group over
    * ≤ parts+1 rows each and joined back as each sub-bucket's carry-in.
    *
    * `order` is a sequence of PLAIN columns compared ASCENDING (they
    * double as struct fields in the summaries, where sort-order
    * expressions cannot appear). It MUST be strictly total (unique)
    * within each group over the rows whose carry values are non-null:
    * on a full order tie the per-column struct maxima are free to take
    * each carry column from a DIFFERENT tied row (append a unique
    * tiebreak column, as the as-of union does with its right-row id).
    * `lead` must be the order's monotone numeric head. */
  private def groupedRunningCarry(df: DataFrame, group: Column, lead: Column,
                                  order: Seq[Column], carries: Seq[(String, String)],
                                  exclusive: Boolean): DataFrame = {
    val numLead = numericLeadOrThrow(df, lead, "groupedRunningCarry")
    val bucketed = subBucketize(df, group, numLead)
    val w = Window.partitionBy(col("__bk")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding,
        if (exclusive) -1 else Window.currentRow)
    val withinBucket = carries.foldLeft(bucketed) { case (d, (in, out)) =>
      d.withColumn(out, last(col(in), ignoreNulls = true).over(w))
    }
    // Per-sub-bucket "last non-null by order" summaries: the value at
    // the greatest (order...) among each bucket's non-null rows. This
    // branch re-reads the (column-pruned) input and map-side
    // partial-aggregates it down to ≤ one row per (group, sub-bucket)
    // before its exchange — a cheap second scan, where re-shuffling the
    // big side for the carry join (the alternative this layout avoids)
    // would not be.
    //
    // Two aggregate forms, picked by type: when every order column is
    // integral and every carry is long- or double-family, the typed
    // LastByOrder aggregates run in ObjectHashAggregate — O(1) buffer,
    // no sort. Otherwise max(struct(order..., value)): same result, but
    // a struct-typed buffer forces SortAggregate (a map-side sort of
    // the data by bucket key). One struct-max in the list would force
    // the whole aggregate sort-based, so the fast path is all-or-none.
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val longFam = integral
    val doubleFam: Set[org.apache.spark.sql.types.DataType] =
      Set(org.apache.spark.sql.types.FloatType, org.apache.spark.sql.types.DoubleType)
    val carryDts = carries.map { case (in, _) => df.schema(in).dataType }
    val fastPath =
      order.forall(o => integral.contains(bucketed.select(o).schema.head.dataType)) &&
        carryDts.forall(dt => longFam.contains(dt) || doubleFam.contains(dt))
    val (lastAggs, unwrap): (Seq[Column], Seq[Column => Column]) =
      if (fastPath) {
        val packedOrd = array(order.map(_.cast("long")): _*)
        val aggs = carries.zip(carryDts).map { case ((in, _), dt) =>
          if (longFam.contains(dt)) {
            val a = udaf(new graft.functions.LastLongByOrder())
            a(packedOrd, coalesce(col(in).cast("long"), lit(0L)), col(in).isNotNull)
              .as(s"__raw_$in")
          } else {
            val a = udaf(new graft.functions.LastDoubleByOrder())
            a(packedOrd, coalesce(col(in).cast("double"), lit(0.0)), col(in).isNotNull)
              .as(s"__raw_$in")
          }
        }
        val un = carries.zip(carryDts).map { case (_, dt) =>
          (c: Column) => when(c.getField("ok"), c.getField("v").cast(dt))
        }
        (aggs, un)
      } else {
        val aggs = carries.map { case (in, _) =>
          max(when(col(in).isNotNull,
            struct(order.map(o => o) :+ col(in).as("__v"): _*))).as(s"__raw_$in")
        }
        val un = carries.map { _ => (c: Column) => c.getField("__v") }
        (aggs, un)
      }
    val summaries = bucketed.groupBy(col("__bk").as("__cbk"))
      .agg(lastAggs.head, lastAggs.tail: _*)
    val summariesUnwrapped = carries.zip(unwrap).foldLeft(summaries) {
      case (d, ((in, _), un)) =>
        d.withColumn(s"__bl_$in", un(col(s"__raw_$in"))).drop(s"__raw_$in")
    }
    // carry-in per sub-bucket: last non-null summary among STRICTLY
    // preceding sub-buckets of the same group (≤ parts+1 rows per
    // group). The struct fields are materialized as columns first so
    // every carry column's window shares ONE attribute-keyed spec —
    // expression-keyed specs don't merge, and each would plan its own
    // exchange+sort over the summaries frame.
    val wCarry = Window.partitionBy(col("__cwg")).orderBy(col("__cwsb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIns = carries.foldLeft(
      summariesUnwrapped.withColumn("__cwg", col("__cbk").getField("__g"))
        .withColumn("__cwsb", col("__cbk").getField("__sb"))) { case (d, (in, _)) =>
      d.withColumn(s"__ci_$in", last(col(s"__bl_$in"), ignoreNulls = true).over(wCarry))
    }.select(col("__cbk") +: carries.map { case (in, _) => col(s"__ci_$in") }: _*)
    val joined = withinBucket.join(carryIns, col("__bk") === col("__cbk"))
    carries.foldLeft(joined) { case (d, (in, out)) =>
      d.withColumn(out, coalesce(col(out), col(s"__ci_$in"))).drop(s"__ci_$in")
    }.drop("__g", "__sb", "__bk", "__cbk")
  }

  /** Distributed per-GROUP running LAST-NON-NULL carry along a total
    * order within each group — the prefix-scan behind the as-of join,
    * without the `Window.partitionBy(key)` trap (one instrument owning
    * half a quotes stream collapses onto one task; AQE splits skewed
    * joins and aggregates but never window partitions). Each `carryCols`
    * column is REPLACED by `last(c, ignoreNulls)` over the group's full
    * order prefix, current row included. See [[groupedRunningCarry]] for
    * the decomposition and the order-totality requirement. */
  def groupedRunningLast(df: DataFrame, group: Column, lead: Column,
                         order: Seq[Column], carryCols: Seq[String]): DataFrame =
    groupedRunningCarry(df, group, lead, order,
      carryCols.map(c => (c, c)), exclusive = false)

  /** Exclusive-prefix (LAG) twin of [[groupedRunningLast]]: for each row,
    * the last non-null value of each carry column over the STRICTLY
    * PRECEDING rows of its group's order — `lag(c, 1)` when c is
    * non-null everywhere, hot-key-safe where
    * `lag(c).over(Window.partitionBy(group))` pins a hot group's entire
    * history to one task. Each (in, out) pair writes a NEW column `out`,
    * leaving `in` untouched; the first row of each group gets null. */
  def groupedRunningLag(df: DataFrame, group: Column, lead: Column,
                        order: Seq[Column], carries: Seq[(String, String)]): DataFrame =
    groupedRunningCarry(df, group, lead, order, carries, exclusive = true)
}

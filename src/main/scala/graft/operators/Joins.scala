package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity-plus relational operators the reference lacks (SURVEY.md §2.3
  * note): the joins a training-data pipeline actually needs, expressed in
  * shapes that survive scale.
  */
object Joins {

  /** AS-OF join: for each left row, the most recent right row with
    * `rightTime <= leftTime` within the same key.
    *
    * Implemented as union + running `last(_, ignoreNulls)` over
    * (key, time) — ONE shuffle by key, no range self-join, no per-row
    * probe; ties at equal time resolve to the right row (inclusive
    * semantics), and among equal-time right rows the one latest in
    * `rightTieBreak` wins (deterministic). This composition is preferred
    * over a custom SparkPlan (SURVEY §7.1: compose built-ins first). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           rightPayload: Seq[String],
           rightTieBreak: Column): DataFrame = {
    val lCols = left.columns
    val l = left.select(
      (leftKey.as("__k") +: leftTime.cast("long").as("__t") +: lit(1).as("__tag") +:
        lit(null).cast("long").as("__tie") +:
        lCols.map(col(_)) ++:
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right.select(
      (rightKey.as("__k") +: rightTime.cast("long").as("__t") +: lit(0).as("__tag") +:
        rightTieBreak.cast("long").as("__tie") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        rightPayload.map(col(_))): _*)
    // the left-row __tie value is immaterial (__tag=1 already orders
    // lefts after rights at equal time); it is coalesced to Long.MinValue
    // below only to satisfy groupedRunningLast's non-null order columns
    val u = l.unionByName(r)
    // right rows sort before left rows at equal time (inclusive <=); the
    // running last() then carries each payload forward to following
    // lefts. The scan runs through the grouped-prefix machinery, NOT
    // Window.partitionBy(__k): one instrument owning half a quotes
    // stream would pin its whole history to one task (AQE splits skewed
    // joins/aggregates, never window partitions). Order columns must be
    // non-null for the carry summaries, so __tag breaks left/right and
    // __tie is coalesced to Long.MinValue for left rows (they have no
    // payload to carry, so their relative order is immaterial).
    val carried = Windows.groupedRunningLast(
      u.withColumn("__tie", coalesce(col("__tie"), lit(Long.MinValue))),
      col("__k"), col("__t"),
      Seq(col("__t"), col("__tag"), col("__tie")),
      rightPayload)
    carried.filter(col("__tag") === 1)
      .drop("__k", "__t", "__tag", "__tie")
  }

  /** RANGE (interval) join: left rows against right intervals of the same
    * key — `leftTime ∈ [rightLo, rightHi)` — WITHOUT a theta join. The
    * time axis is binned at `binWidth`; each right interval explodes into
    * the bins it covers (⌈span/binWidth⌉ rows), each left row lives in
    * exactly ONE bin, so the match becomes an equi-join on (key, bin) +
    * a residual range filter, and every qualifying pair appears exactly
    * once — no dedup pass. Pick binWidth near the typical interval span:
    * wider bins fatten buckets, narrower bins fan the right side out.
    *
    * Column-NAME based (frames may share names — self-joins are the
    * common case); the result carries the left columns aliased `l` and
    * the right columns aliased `r`: select `col("l.x")` / `col("r.y")`.
    * Times must be non-negative integers (epoch nanos/millis/seconds);
    * empty intervals (hi <= lo) are dropped, matching the half-open
    * semantics. */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftKeyCol: String, rightKeyCol: String,
                leftTimeCol: String, rightLoCol: String, rightHiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div` keeps 64-bit precision — double division would round
    // epoch-nanos (~2^60) at bin boundaries
    val l = left
      .withColumn("__bin", expr(s"`$leftTimeCol` div ${binWidth}L"))
      .as("l")
    val r = right
      .filter(col(rightHiCol) > col(rightLoCol))
      .withColumn("__bin", explode(expr(
        s"sequence(`$rightLoCol` div ${binWidth}L, (`$rightHiCol` - 1L) div ${binWidth}L)")))
      .as("r")
    l.join(r,
      col("l.__bin") === col("r.__bin") &&
        col(s"l.$leftKeyCol") === col(s"r.$rightKeyCol") &&
        col(s"l.$leftTimeCol") >= col(s"r.$rightLoCol") &&
        col(s"l.$leftTimeCol") < col(s"r.$rightHiCol"))
      .drop("__bin")
  }

  /** Two-stage salted aggregation for skewed keys: partial aggregate on
    * (key, salt), final aggregate on key. `partials` aggregate raw input;
    * `finals` re-aggregate the partial columns (by matching name). For
    * algebraic aggregates (sum/count/min/max) results are identical to a
    * direct groupBy — this is the manual fallback when AQE skew handling
    * isn't enough. */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets.toLong)))
    val partial = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(col("__key"))
      .agg(finals.head, finals.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}

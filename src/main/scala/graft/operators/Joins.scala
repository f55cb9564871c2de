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

  /** Builds a Bloom filter over `keysKey` (nulls excluded) and returns the
    * probe predicate for `bigKey` — the shared prefilter behind
    * [[bloomSemiJoin]]/[[bloomAntiJoin]]. The key is normalized the SAME
    * way on both sides (integral → long, string → string, anything else →
    * its string form), so put/probe hashing is symmetric by construction:
    * the filter can false-POSITIVE (fpp) but never false-negative, which
    * is all the exactness argument needs. Null probe keys return false
    * ("definitely not in the blocklist" — correct for both join kinds,
    * since SQL equality never matches null).
    *
    * The filter is built with the public `df.stat.bloomFilter` (a
    * distributed aggregate; only the ~1.2·n-byte bitmap at fpp=1% reaches
    * the driver) and shipped as a broadcast variable. Sizing: `1e9` keys
    * at 1% ≈ 1.2 GB — fine on large-executor clusters; past that, raise
    * fpp (the exact join still guarantees correctness) or shard the
    * blocklist. `expectedItems ≤ 0` → one approx_count_distinct job over
    * the blocklist picks n. */
  private def bloomProbe(big: DataFrame, keys: DataFrame,
                         bigKey: Column, keysKey: Column,
                         fpp: Double, expectedItems: Long): Column = {
    import org.apache.spark.sql.types._
    val dt = keys.select(keysKey).schema.head.dataType
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    def norm(c: Column): Column =
      if (integral.contains(dt)) c.cast("long")
      else if (dt == StringType) c
      else c.cast("string")
    val keyed = keys.select(norm(keysKey).as("__bk")).filter(col("__bk").isNotNull)
    // one small aggregate sizes the filter AND detects the empty
    // blocklist (whose bloom aggregate yields a null-buffer filter that
    // NPEs on probe): empty → constant-false probe, no filter built
    val stats0 = keyed.agg(approx_count_distinct(col("__bk")).as("__n"),
      count(lit(1)).as("__c")).head()
    if (stats0.getLong(1) == 0L) return lit(false)
    val n = math.max(1L, if (expectedItems > 0) expectedItems else stats0.getLong(0))
    val bf = keyed.stat.bloomFilter(col("__bk"), n, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    if (integral.contains(dt)) {
      val probe = udf((v: java.lang.Long) => v != null && bc.value.mightContainLong(v))
      probe(norm(bigKey))
    } else {
      val probe = udf((v: String) => v != null && bc.value.mightContainString(v))
      probe(norm(bigKey))
    }
  }

  /** Bloom-prefiltered exact SEMI join: rows of `big` whose `bigKey`
    * appears in `keys.keysKey` — bit-identical to
    * `big.join(keys, bigKey === keysKey, "left_semi")`, but the big side's
    * shuffle carries only bloom-passing rows (true matches + the fpp
    * tail) instead of the whole corpus. This is the contamination-HIT
    * path when the blocklist is too large to broadcast exactly but its
    * bloom bitmap fits: at 100 TB the corpus-side exchange shrinks from
    * every row to ~(matches + fpp·rows). The probe UDF sits between the
    * scan and the exchange — off the codegen fast path, but it deletes an
    * exchange's worth of I/O, which dominates. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame,
                    bigKey: Column, keysKey: Column,
                    fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val pass = bloomProbe(big, keys, bigKey, keysKey, fpp, expectedItems)
    // the right side is pruned to ONE uniquely-named key column: semi/anti
    // output left columns only, and same-named keys on both sides (the
    // self-decontamination case) would otherwise be ambiguous
    val rk = keys.select(keysKey.as("__graft_bloom_k"))
    big.filter(pass).join(rk, bigKey === rk("__graft_bloom_k"), "left_semi")
  }

  /** Bloom-prefiltered exact ANTI join (blocklist decontamination): rows
    * of `big` whose `bigKey` does NOT appear in `keys.keysKey` —
    * bit-identical to `big.join(keys, bigKey === keysKey, "left_anti")`.
    * Rows the bloom rejects are DEFINITELY clean and bypass the join
    * entirely (a map-side filter union branch); only bloom-passing rows
    * (true hits + the fpp tail) reach the exact anti join. With a mostly
    * clean corpus — the normal decontamination case — the join input is a
    * tiny fraction of the data. Null-key rows ride the clean branch,
    * matching anti-join semantics (null equals nothing, so anti keeps
    * it). */
  def bloomAntiJoin(big: DataFrame, keys: DataFrame,
                    bigKey: Column, keysKey: Column,
                    fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val pass = bloomProbe(big, keys, bigKey, keysKey, fpp, expectedItems)
    val clean = big.filter(!pass)
    val rk = keys.select(keysKey.as("__graft_bloom_k"))
    val candidates = big.filter(pass)
      .join(rk, bigKey === rk("__graft_bloom_k"), "left_anti")
    clean.unionByName(candidates)
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

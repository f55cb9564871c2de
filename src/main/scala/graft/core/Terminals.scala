package graft.core

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.functions._
import graft.functions.{Moments, Spectral}
import graft.core.Ckpt.CkptOps

/** Terminal operators — the reference's collector surface (SURVEY.md §2.5)
  * as methods over [[SemanticStream]]. Aggregation-shaped terminals stay
  * distributed (Catalyst partial/final aggregation ≈ the reference's
  * Accumulator/Combiner/Finisher split, collector.h:51-382);
  * container-returning terminals collect — small by construction, exactly
  * like the reference's finishers.
  */
final class Terminals[E](s: SemanticStream[E]) extends Serializable {

  private def df: DataFrame = s.toDF

  // ---- counting / matching (collector.h:399-474) ------------------------

  def count(): Long = s.ds.count()
  def isEmpty: Boolean = s.ds.isEmpty

  /** ∀ pred — short-circuits via limit-1 on the negation
    * (useAllMatch, collector.h:399-414). */
  def allMatch(p: Column => Column): Boolean =
    df.filter(!p(col("value"))).limit(1).isEmpty
  /** ∃ pred (useAnyMatch, collector.h:416-431). */
  def anyMatch(p: Column => Column): Boolean =
    !df.filter(p(col("value"))).limit(1).isEmpty
  def noneMatch(p: Column => Column): Boolean = !anyMatch(p)

  // ---- finding (collector.h:838-1063) -----------------------------------

  /** First element in arrival order (useFindFirst, collector.h:912-931).
    *
    * Short-circuits like the reference's Interrupt collector: first probes
    * the bounded ord-prefix `[0, probeWindow)` — if any element lands
    * there, its min-ord row IS the global first (every smaller ord would
    * also be inside the window — sound because ord is never negative, the
    * invariant documented on [[Elem]]), and the 100 TB tail is never
    * touched. Only sparse ord spaces fall through to the one-pass full
    * aggregate (same cost as the non-probed form). */
  def findFirst(probeWindow: Long = 1L << 16): Option[E] = {
    val probe = df.filter(col("ord") >= 0 && col("ord") < probeWindow)
      .agg(min_by(col("value"), col("ord")).as("v"), org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect()(0)
    if (probe.getAs[Long]("n") > 0L) Some(probe.getAs[E]("v"))
    else {
      val full = df.agg(min_by(col("value"), col("ord")).as("v"),
        org.apache.spark.sql.functions.count(lit(1)).as("n")).collect()(0)
      if (full.getAs[Long]("n") == 0L) None else Some(full.getAs[E]("v"))
    }
  }

  /** Last element in arrival order (useFindLast, collector.h:933-951).
    * A push-model collector must consume the whole stream to know its
    * last element — one full scan with map-side partial max_by is the
    * faithful (and optimal) distributed shape; the count rides in the
    * same aggregate, so empties cost no second pass. */
  def findLast(): Option[E] = {
    val r = df.agg(max_by(col("value"), col("ord")).as("v"),
      org.apache.spark.sql.functions.count(lit(1)).as("n")).collect()(0)
    if (r.getAs[Long]("n") == 0L) None else Some(r.getAs[E]("v"))
  }

  /** i ≥ 0: first element (arrival order) whose visible index equals i
    * (useFindAt, collector.h:859-881). i < 0: arrival position
    * `(n − (|i| mod n)) mod n` (useFindNegativeAt, collector.h:883-910). */
  def findAt(i: Long): Option[E] =
    if (i >= 0)
      s.resolved.toDF.filter(col("idx") === i)
        .orderBy(col("ord")).limit(1)
        .collect().headOption.map(_.getAs[E]("value"))
    else {
      val n = s.ds.count()
      if (n == 0) return None
      val target = (n - (math.abs(i) % n)) % n
      IndexOps.rankByOrd(df).filter(col("idx") === target)
        .collect().headOption.map(_.getAs[E]("value"))
    }

  /** Deterministic stand-in for useFindAny's coin-flip nondeterminism
    * (collector.h:838-857): uniform pick keyed on a seed. */
  def findAny(seed: Long): Option[E] =
    df.orderBy(xxhash64(col("ord"), lit(seed))).limit(1)
      .collect().headOption.map(_.getAs[E]("value"))

  /** Max/min element by a derived orderable key (useFindMaximum/Minimum
    * with comparator, collector.h:953-1063) — ONE distributed agg; the
    * emptiness count rides along instead of a separate isEmpty scan. */
  def maxBy(key: Column => Column): Option[E] = {
    val r = df.agg(max_by(col("value"), key(col("value"))).as("v"),
      org.apache.spark.sql.functions.count(lit(1)).as("n")).collect()(0)
    if (r.getAs[Long]("n") == 0L) None else Some(r.getAs[E]("v"))
  }

  def minBy(key: Column => Column): Option[E] = {
    val r = df.agg(min_by(col("value"), key(col("value"))).as("v"),
      org.apache.spark.sql.functions.count(lit(1)).as("n")).collect()(0)
    if (r.getAs[Long]("n") == 0L) None else Some(r.getAs[E]("v"))
  }

  /** Side effect per element, returns the count (useForEach,
    * collector.h:450-464). Runs on executors. */
  def forEach(f: E => Unit): Long = {
    s.ds.foreach((e: Elem[E]) => f(e.value))
    s.ds.count()
  }

  /** Run a user-supplied collector — the reference's useCollect
    * (collector.h:476-486): any Aggregator over the element type. */
  def collectWith[B, R](agg: org.apache.spark.sql.expressions.Aggregator[E, B, R])
                       (implicit encE: Encoder[E]): R =
    s.ds.map(_.value).select(agg.toColumn).collect()(0)

  /** [[collectWith]] with the reference's Interrupt short-circuit
    * (Collectable.collect, collector.h:34, 186-204): stop consuming at
    * the first element whose accumulated state satisfies `interrupted`.
    *
    * Distributed rendering: aggregate exponentially growing ord-prefixes;
    * when a window's result trips the interrupt, binary-search the ord
    * space for the MINIMAL interrupting prefix — the exact element the
    * reference would have stopped at, in O(log) small jobs, never
    * scanning past the first interrupting window. Requires `interrupted`
    * to be monotone along prefix growth (once true, stays true — e.g.
    * count/threshold conditions; the reference never re-evaluates after
    * stopping, so this matches its observable uses). */
  def collectWithInterrupt[B, R](
      agg: org.apache.spark.sql.expressions.Aggregator[E, B, R],
      interrupted: R => Boolean,
      initialWindow: Long = 1L << 16)(implicit encE: Encoder[E]): R = {
    require(initialWindow > 0)
    implicit val longEnc: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    def prefix(bound: Long): (R, Long) = {
      // column predicate, not a typed lambda — stays Catalyst-visible so
      // an ord-correlated source can prune row groups under the probe;
      // the row count rides in the SAME aggregate (one job per probe)
      val p = s.toDF.filter(col("ord") < bound).as[Elem[E]](s.ds.encoder)
      val row = p.map(_.value)
        .select(agg.toColumn,
          org.apache.spark.sql.functions.count(lit(1)).as[Long])
        .collect()(0)
      (row._1, row._2)
    }
    // exhaustion is only decidable against the full count — computed
    // LAZILY, so a stream whose interrupt trips in the first window
    // never pays a full scan
    lazy val total = s.ds.count()
    var w = initialWindow
    var loBound = 0L // largest probed bound known NOT interrupted
    while (true) {
      val (r, n) = prefix(w)
      if (interrupted(r)) {
        // minimal interrupting ord threshold in (loBound, w]
        var lo = loBound; var hi = w
        var best = r
        while (lo + 1 < hi) {
          val mid = lo + (hi - lo) / 2
          val (rm, _) = prefix(mid)
          if (interrupted(rm)) { hi = mid; best = rm } else lo = mid
        }
        return best
      }
      if (n >= total) return r // exhausted without interrupting
      loBound = w
      w = if (w > Long.MaxValue / 4) Long.MaxValue else w * 4
    }
    throw new IllegalStateException("unreachable")
  }

  /** Join elements and print to stdout, returning the string (useOut,
    * collector.h:1351-1576). */
  def out(delimiter: String = ",", prefix: String = "[", suffix: String = "]"): String = {
    val j = joinString(delimiter, prefix, suffix)
    println(j)
    j
  }

  /** As [[out]] but to stderr (useError, collector.h:1578-1803). */
  def error(delimiter: String = ",", prefix: String = "[", suffix: String = "]"): String = {
    val j = joinString(delimiter, prefix, suffix)
    System.err.println(j)
    j
  }

  // ---- reduction (collector.h:2337-2375) ---------------------------------

  /** Per-partition partial folds, collected (≤ #partitions values) — ONE
    * job, empty partitions contribute nothing, so emptiness needs no
    * separate pre-scan. `f` must be associative (the same contract
    * Dataset.reduce imposes; the reference folds a single thread's
    * arrival order, which only coincides under associativity anyway). */
  private def partialReduce(f: (E, E) => E)(implicit encE: Encoder[E]): Array[E] =
    s.ds.map(_.value).mapPartitions { it =>
      if (it.hasNext) Iterator.single(it.reduce(f)) else Iterator.empty[E]
    }.collect()

  /** Fold without identity → None on empty (useReduce, collector.h:2337).
    * Single pass: partial fold per partition, final merge on the driver. */
  def reduce(f: (E, E) => E)(implicit encE: Encoder[E]): Option[E] =
    partialReduce(f).reduceLeftOption(f)

  /** Fold with identity (useReduce, collector.h:2357). The identity seeds
    * the FINAL merge once (empty → identity, no scan wasted on it). */
  def reduce(identity: E, f: (E, E) => E)(implicit encE: Encoder[E]): E =
    partialReduce(f).foldLeft(identity)(f)

  // ---- collect-to-container (collector.h:2434-2742) ----------------------

  /** Elements in materialized order (with the reference's mod-n wrap). */
  def toVector: Vector[E] =
    s.ordered.toDF.orderBy(col("ord")).select(col("value"))
      .collect().iterator.map(_.getAs[E]("value")).toVector

  def toList: List[E] = toVector.toList
  def toSet: Set[E] =
    df.select(col("value")).distinct().collect().iterator.map(_.getAs[E]("value")).toSet

  /** Last-wins keyed map (useToMap, collector.h:2377-2415). */
  def toMap[K](keyCol: Column => Column): Map[K, E] =
    df.groupBy(keyCol(col("value")).as("k"))
      .agg(max_by(col("value"), col("ord")).as("v"))
      .collect().map(r => r.getAs[K]("k") -> r.getAs[E]("v")).toMap

  /** Keyed duplicates kept, per-key arrival order (useToMultimap,
    * collector.h:2571-2623). */
  def toMultimap[K](keyCol: Column => Column): Map[K, Seq[E]] =
    df.groupBy(keyCol(col("value")).as("k"))
      .agg(transform(array_sort(collect_list(struct(col("ord"), col("value")))),
        x => x.getField("value")).as("vs"))
      .collect().map(r => r.getAs[K]("k") -> r.getSeq[E](1)).toMap

  /** LIFO view — last element first (useToStack, collector.h:2679-2700). */
  def toStack: List[E] = toVector.reverse.toList
  /** FIFO view (useToQueue, collector.h:2702-2721). */
  def toQueue: scala.collection.immutable.Queue[E] =
    scala.collection.immutable.Queue.from(toVector)
  /** Heap view (useToPriorityQueue, collector.h:2723-2742). */
  def toPriorityQueue(implicit ord: Ordering[E]): scala.collection.mutable.PriorityQueue[E] =
    scala.collection.mutable.PriorityQueue.from(toVector)
  /** Sorted-set view (useToSet — std::set is ordered, collector.h:2463). */
  def toSortedSet(implicit ord: Ordering[E]): scala.collection.immutable.SortedSet[E] =
    scala.collection.immutable.SortedSet.from(toVector)

  /** Value → multiplicity — the faithful Scala rendering of
    * useToMultiset / useToUnorderedMultiset (collector.h:2625-2677): a
    * multiset IS its count function; iteration order is the only thing
    * the two C++ containers disagree on, and a Map abstracts it. One
    * distributed count aggregate, collected small like the reference's
    * finisher. */
  def toMultiset: Map[E, Long] =
    df.groupBy(col("value"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect().map(r => r.getAs[E]("value") -> r.getAs[Long]("n")).toMap

  /** [[toMultiset]] with keys in sorted order (std::multiset ordering). */
  def toSortedMultiset(implicit ord: Ordering[E]): scala.collection.immutable.SortedMap[E, Long] =
    scala.collection.immutable.SortedMap.from(toMultiset)

  /** Concatenate string forms in materialized order
    * (useJoin, collector.h:1132-1349). */
  def joinString(delimiter: String = ",", prefix: String = "[", suffix: String = "]"): String = {
    val parts = s.ordered.toDF.orderBy(col("ord"))
      .select(col("value").cast("string")).collect().map(_.getString(0))
    parts.mkString(prefix, delimiter, suffix)
  }
}

/** Numeric terminal surface — the reference's `Statistics<E,D>` collectable
  * (semantic.h:600-879): elements viewed through a numeric cast column `D`.
  * All single-pass distributed except the percentile family (Spark
  * `percentile`) and the spectral transforms (gathered finisher, exactly
  * like the reference's).
  *
  * `df` columns: ord (arrival), idx (visible index), value (double).
  */
final class Statistics(val df: DataFrame) extends Serializable {

  private def v = col("value")

  private def scalar(c: Column): Double = {
    val r = df.agg(c.as("r")).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Σ; empty → 0 (useSummate, collector.h:488-506). */
  def summate: Double = scalar(coalesce(sum(v), lit(0.0)))
  /** mean; empty → 0 not null (useAverage, collector.h:508-544). */
  def average: Double = scalar(coalesce(avg(v), lit(0.0)))
  /** max−min; empty → 0. The reference's (0,0)-sentinel restart bug
    * (collector.h:553-559) is documented, not replicated. */
  def rangeStat: Double = scalar(coalesce(max(v) - min(v), lit(0.0)))
  def minimum: Option[Double] =
    { val r = df.agg(min(v)).collect()(0); if (r.isNullAt(0)) None else Some(r.getDouble(0)) }
  def maximum: Option[Double] =
    { val r = df.agg(max(v)).collect()(0); if (r.isNullAt(0)) None else Some(r.getDouble(0)) }

  /** Population variance — Welford + Chan merge in the reference
    * (collector.h:688-723) ≡ Spark's var_pop. */
  def variance: Double = scalar(coalesce(var_pop(v), lit(0.0)))
  def standardDeviation: Double = math.sqrt(variance)

  /** Exact percentile, linear interpolation at rank p/100·(n−1) — the
    * NumPy-default convention (usePercentile, collector.h:2298-2304),
    * which is also Spark's `percentile`. */
  def percentile(p: Double): Double = {
    require(p >= 0 && p <= 100, s"percentile $p out of [0,100]")
    scalar(coalesce(org.apache.spark.sql.functions.percentile(v, lit(p / 100.0)), lit(0.0)))
  }
  def median: Double = percentile(50)
  def firstQuartile: Double = percentile(25)
  def thirdQuartile: Double = percentile(75)
  def interquartileRange: Double = thirdQuartile - firstQuartile

  /** SCALE-PATH variants (beyond the reference, which is single-machine
    * exact): the exact `percentile` is an ObjectHashAggregate whose
    * buffer holds every value — at 100 TB that is the data, not a
    * summary. `approxPercentile` rides Spark's Greenwald-Khanna sketch:
    * fixed-size buffers, map-side merge, rank error ≤ 1/accuracy — the
    * form a cluster actually runs for quantile gates (e.g. "p99 doc
    * length"). Same interpolation-free convention as approx_percentile
    * everywhere Spark runs, so results are reproducible cluster-to-
    * cluster at equal accuracy. */
  def approxPercentile(p: Double, accuracy: Int = 10000): Double = {
    require(p >= 0 && p <= 100, s"percentile $p out of [0,100]")
    scalar(coalesce(
      approx_percentile(v, lit(p / 100.0), lit(accuracy)).cast("double"), lit(0.0)))
  }

  /** Scale-path distinct count: HyperLogLog++ with relative standard
    * deviation `rsd` — O(1) sketch per partition where `distinct.count`
    * shuffles every distinct value (vocabulary-sized exchanges at
    * corpus scale). */
  def approxDistinct(rsd: Double = 0.05): Long = {
    val r = df.agg(approx_count_distinct(v, rsd)).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Most frequent value (useMode, collector.h:2251-2277 — its complex
    * phasor is always 0-phase, so it degenerates to frequency counting).
    * Ties break to the smallest value (deterministic; the reference's
    * hash-order winner is nondeterministic — documented divergence). */
  def mode: Option[Double] =
    df.groupBy(v.as("val")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("val").asc).limit(1)
      .collect().headOption.map(_.getDouble(0))

  private def centralMoments: Moments = {
    val r = df.agg(
      count(v).as("n"), coalesce(avg(v), lit(0.0)).as("mean"),
      coalesce(sum(pow(v, 2)), lit(0.0)).as("s2"),
      coalesce(sum(pow(v, 3)), lit(0.0)).as("s3"),
      coalesce(sum(pow(v, 4)), lit(0.0)).as("s4")).collect()(0)
    val n = r.getLong(0); val mean = r.getDouble(1)
    val s2 = r.getDouble(2); val s3 = r.getDouble(3); val s4 = r.getDouble(4)
    // raw → central moments
    val m2 = s2 - n * mean * mean
    val m3 = s3 - 3 * mean * s2 + 2 * n * mean * mean * mean
    val m4 = s4 - 4 * mean * s3 + 6 * mean * mean * s2 - 3 * n * math.pow(mean, 4)
    Moments(n, mean, m2, m3, m4)
  }

  /** Reference-formula skewness (collector.h:3065-3103). */
  def skewness: Double = centralMoments.skewness
  /** Reference-formula excess kurtosis (collector.h:3147-3186). */
  def kurtosis: Double = centralMoments.kurtosis

  /** Distributed occurrence profile per distinct value:
    * (value, positions[], count) as a DataFrame (useFrequency,
    * collector.h:1805-1906). One shuffle, distinct-value-cardinality
    * sized, never driver-materialized — the scalable form; this is what
    * a 100 TB column must use. Positions are ascending visible indices. */
  def frequencyDF: DataFrame =
    df.groupBy(v.as("value"))
      .agg(sort_array(collect_list(col("idx"))).as("positions"),
        count(lit(1)).as("cnt"))

  /** [[frequencyDF]] collected to the reference's Map finisher shape.
    * CAVEAT: materializes every distinct value AND its full position list
    * on the driver — only safe for bounded-cardinality columns (the
    * reference's finisher has the same hazard single-node). Prefer
    * [[frequencyDF]] at scale. */
  def frequency: Map[Double, (Seq[Long], Long)] =
    frequencyDF.collect()
      .map(r => r.getDouble(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap

  /** Distribution profile (useDistribution, collector.h:1908-2096): per
    * distinct value, z-scores of its position-sum and count against the
    * MODE (smallest-on-tie) of those statistics across distinct values,
    * with the reference's σ floor (<0.001 → 1.0). Returns a DataFrame
    * (value, pos_score, cnt_score) — distributed; distinct-value
    * cardinality sized. */
  def distribution: DataFrame = {
    // localCheckpoint(eager = false): perValue feeds FOUR consumers (two
    // mode branches, the deviation aggregate, the final projection) —
    // un-materialized, each branch would re-run the full upstream (rank +
    // data shuffle) past whatever exchange reuse salvages. The frame is
    // distinct-value sized, so materializing it is as cheap as the mode
    // scalars it feeds; measured ~2× on q41 at sf0.1 — same-VM
    // interleaved medians 3.0 → 1.6 s (BENCH_NOTES.md Round 7). Lazy, so
    // no Spark job runs unless the result is actually consumed. The
    // blocks are distinct-value sized and live until the caller drops
    // them (GraftColumnShim.unpersistCheckpoint) or session cleanup —
    // repeated calls in a long-lived session should unpersist consumed
    // frames.
    val perValue = df.groupBy(v.as("val"))
      .agg(sum(col("idx")).cast("double").as("pos_sum"),
        count(lit(1)).cast("double").as("cnt"))
      .ckpt(eager = false)
    def modeOf(c: String): DataFrame =
      perValue.groupBy(col(c).as("x")).agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("x").asc).limit(1)
        .select(col("x").as(s"mode_$c"))
    val scalars = modeOf("pos_sum").crossJoin(modeOf("cnt"))
    val withModes = perValue.crossJoin(broadcast(scalars))
    val devs = withModes.agg(
      sqrt(avg(pow(col("pos_sum") - col("mode_pos_sum"), 2))).as("sd_pos"),
      sqrt(avg(pow(col("cnt") - col("mode_cnt"), 2))).as("sd_cnt"))
    val floored = devs.select(
      when(col("sd_pos") < 0.001, 1.0).otherwise(col("sd_pos")).as("sd_pos"),
      when(col("sd_cnt") < 0.001, 1.0).otherwise(col("sd_cnt")).as("sd_cnt"))
    withModes.crossJoin(broadcast(floored)).select(
      col("val").as("value"),
      ((col("pos_sum") - col("mode_pos_sum")) / col("sd_pos")).as("pos_score"),
      ((col("cnt") - col("mode_cnt")) / col("sd_cnt")).as("cnt_score"))
  }

  /** Direct DFT in arrival order → (re[], im[]) (useDFT,
    * collector.h:2744-2779). Gathered finisher, like the reference; for
    * per-group series use [[graft.functions.DftAggregator]]. */
  def dft: (Array[Double], Array[Double]) = seriesTransform(Spectral.dft)
  def idft: (Array[Double], Array[Double]) = seriesTransform(Spectral.idft)
  def fft: (Array[Double], Array[Double]) = seriesTransform(Spectral.fft)
  def ifft: (Array[Double], Array[Double]) = seriesTransform(Spectral.ifft)

  private def seriesTransform(
      f: (Array[Double], Array[Double]) => (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    val xs = df.orderBy(col("ord")).select(v).collect().map(_.getDouble(0))
    f(xs, new Array[Double](xs.length))
  }

  /** Numerical gradient descent: central-difference gradient of a cost
    * function, step h (useGradient numerical form, collector.h:2996-3063). */
  def gradientNumerical(cost: Array[Double] => Double, lr: Double,
                        maxIter: Int, eps: Double, h: Double = 1e-6): Array[Double] =
    gradient(theta => theta.indices.toArray.map { i =>
      val up = theta.clone; up(i) += h
      val dn = theta.clone; dn(i) -= h
      (cost(up) - cost(dn)) / (2 * h)
    }, lr, maxIter, eps)

  /** Gradient descent over the collected element vector as initial θ
    * (useGradient, collector.h:2944-2994) — inherently sequential,
    * driver-side; dimension = element count, small by construction. */
  def gradient(grad: Array[Double] => Array[Double], lr: Double,
               maxIter: Int, eps: Double): Array[Double] = {
    var theta = df.orderBy(col("ord")).select(v).collect().map(_.getDouble(0))
    var it = 0
    var maxAbs = Double.MaxValue
    while (it < maxIter && maxAbs >= eps) {
      val g = grad(theta)
      maxAbs = if (g.isEmpty) 0.0 else g.map(math.abs).max
      theta = theta.zip(g).map { case (t, gi) => t - lr * gi }
      it += 1
    }
    theta
  }
}

object Terminals {
  implicit class TerminalSyntax[E](val s: SemanticStream[E]) {
    def terminals: Terminals[E] = new Terminals[E](s)
    /** The reference's `toStatistics<D>()` (semantic.h:1561-1565): view the
      * stream through a numeric cast of the value column. */
    def toStatistics: Statistics =
      new Statistics(s.resolved.toDF
        .select(col("ord"), col("idx"), col("value").cast("double").as("value")))
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed contiguous rank assignment.
  *
  * The reference renumbers by running an incrementing counter through a
  * single-threaded closure chain (e.g. filter, semantic.h:1202-1209). The
  * Spark-native equivalent must avoid the classic trap — a global
  * `row_number()` window, which collapses to ONE partition. Instead:
  *
  *  1. range-partition by the order columns (parallel sampling + shuffle);
  *  2. per-partition `row_number()` keyed on `spark_partition_id()` —
  *     each partition numbers independently, fully parallel;
  *  3. per-partition counts → cumulative offsets. The count aggregate reads
  *     the SAME range exchange (Spark reuses the shuffle output — no source
  *     re-scan), aggregates #partitions rows, and is broadcast back.
  *
  * Two shuffles of the data total, no driver action, no single-partition
  * stage on the big side — the shape that survives 1000 executors.
  */
object IndexOps {

  /** Rank 0..n-1 following `order`, written to BOTH `ord` and `idx`. */
  def renumberBy(df: DataFrame, order: Seq[Column]): DataFrame =
    rank(df, order, renumberIdx = true)

  /** Rank following `order` written to `ord` only; `idx` passes through
    * (used by ordered materialization, where idx holds wrapped values). */
  def reorderKeepIdx(df: DataFrame, order: Seq[Column]): DataFrame =
    rank(df, order, renumberIdx = false)

  /** Resolve a RankPending stream: visible index = rank of arrival order. */
  def rankByOrd(df: DataFrame): DataFrame = renumberBy(df, Seq(col("ord").asc))

  private def rank(df: DataFrame, order: Seq[Column], renumberIdx: Boolean): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    val rn = row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*))
    val ranked = ranged
      .withColumn("__rn", rn.cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("ord", col("__off") + col("__rn") - 1L)
    val out = if (renumberIdx) ranked.withColumn("idx", col("ord")) else ranked
    out.drop("__pid", "__rn", "__off")
  }
}

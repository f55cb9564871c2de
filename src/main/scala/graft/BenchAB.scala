package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.IndexOps

/** A/B micro-benchmark for the lineitem rank tier: grouped-minor rank
  * (window partitions bounded by lines-per-order) vs packed-key bucket
  * rank (renumberByUniqueKey over `l_orderkey*8 + l_linenumber` —
  * l_linenumber is 1..7 by TPC-H construction, so the packing is
  * collision-free and order-preserving). Runs the three queries that sit
  * on this tier (q13 chunks, q41 distribution, q58 frequency) with both
  * rank implementations back-to-back in the same VM, one untimed warm-up
  * then `SPARK_GRAFT_BENCH_RUNS` (default 5) timed runs interleaved
  * A,B,A,B,… so VM/cache warmth drift hits both variants equally.
  * Prints one JSON line per (query, variant) with the median and all
  * samples. Findings live in BENCH_NOTES.md.
  */
object BenchAB {

  private def rankGrouped(li: DataFrame): DataFrame =
    IndexOps.rankByGroupedMinor(li, col("l_orderkey"), col("l_linenumber"))

  private def rankPacked(li: DataFrame): DataFrame =
    IndexOps.renumberByUniqueKey(
      li, col("l_orderkey") * lit(8L) + col("l_linenumber"))

  private def q13(li: DataFrame): DataFrame =
    li.groupBy(graft.operators.Windows.chunkId(col("idx"), 1000).as("chunk"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("chunk"))

  private def q41(s: SparkSession)(li: DataFrame): DataFrame = {
    import s.implicits._
    val stream = new graft.core.SemanticStream(
      li.select(col("ord"), col("idx"),
        col("l_quantity").cast("double").as("value")).as[graft.core.Elem[Double]],
      graft.core.IndexState.Contiguous)
    import graft.core.Terminals._
    stream.toStatistics.distribution
      .select(col("value"), round(col("pos_score"), 4).as("pos_score"),
        round(col("cnt_score"), 4).as("cnt_score"))
      .orderBy(col("value"))
  }

  private def q58(s: SparkSession)(li: DataFrame): DataFrame = {
    import s.implicits._
    val stream = new graft.core.SemanticStream(
      li.select(col("ord"), col("idx"),
        col("l_quantity").cast("double").as("value")).as[graft.core.Elem[Double]],
      graft.core.IndexState.Contiguous)
    import graft.core.Terminals._
    stream.toStatistics.frequencyDF
      .select(col("value"), col("cnt"),
        size(col("positions")).cast("long").as("n_pos"),
        element_at(col("positions"), 1).as("first_pos"),
        element_at(col("positions"), -1).as("last_pos"),
        aggregate(col("positions"), lit(0L), (a, x) => a + x).as("sum_pos"))
      .orderBy(col("value"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.limit(1).count()

    val ranks: Seq[(String, DataFrame => DataFrame)] = Seq(
      "grouped" -> rankGrouped _, "packed" -> rankPacked _)
    val queries: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q13_chunks" -> q13 _,
      "q41_distribution" -> q41(spark) _,
      "q58_frequency" -> q58(spark) _)

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val only = sys.env.get("SPARK_GRAFT_AB_ONLY") // substring filter
    for ((qName, q) <- queries if only.forall(qName.contains)) {
      val samples = collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      // untimed warm-up of both variants
      for ((_, rk) <- ranks) q(rk(li)).count()
      System.gc()
      // interleave A,B per round so drift is shared
      for (_ <- 0 until runs; (rName, rk) <- ranks) {
        val t0 = System.nanoTime()
        q(rk(li)).count()
        samples(rName) :+= (System.nanoTime() - t0) / 1e9
      }
      for ((rName, _) <- ranks) {
        val ts = samples(rName).sorted
        val med = ts(ts.length / 2)
        println(f"""{"query":"$qName","rank":"$rName","median":$med%.3f,"samples":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe (r20): lshCandidates / simhash self-join strategy A/B —
  * broadcast (planner default at bench scale) vs SHUFFLE_HASH (reuses
  * the banding exchange) — interleaved in ONE JVM so host weather hits
  * both variants equally. Rebuilds the q32 candidate spine inline (the
  * operator's own join line, both variants) over the real sf tables,
  * runs the FULL verify (jaccard + threshold) so the pair volume is the
  * real one, noop-sink timed. */
object QProbeMh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (w, k, bands, cap, thr) = (3, 12, 4, 64, 0.2)

    def spine(shj: Boolean): DataFrame = {
      val sig = Dedup.minhashSignature(docs, "doc_id", "text", w, k)
      val bandDf = Dedup.lshBands(sig, bands, k / bands)
      val firstK = udaf(new graft.functions.FirstKByOrder(cap))
      val capped = bandDf.groupBy(col("band"), col("key"))
        .agg(firstK(col("id").cast("long"), lit(0.0)).as("__fk"))
        .select(col("band"), col("key"), explode(col("__fk.items.ord")).as("id"))
      val l = capped.as("l")
      val r = (if (shj) capped.hint("SHUFFLE_HASH") else capped).as("r")
      val cand = l.join(r, col("l.band") === col("r.band") &&
          col("l.key") === col("r.key") && col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b")).distinct()
      val candIds = cand.select(col("a").as("id"))
        .union(cand.select(col("b").as("id"))).distinct()
      val candDocs = docs.join(candIds.withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left_semi")
      val sh = candDocs.select(col("doc_id").as("id"),
        explode(Dedup.shingleArray(col("text"), w)).as("shingle")).distinct()
      Dedup.jaccard(cand, sh).filter(col("jaccard") >= thr)
    }

    val variants = Seq("bcast" -> false, "shj" -> true)
    variants.foreach { case (_, s) =>
      spine(s).write.format("noop").mode("overwrite").save() }
    System.gc()
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 0 until rounds; (name, s) <- variants) {
      val t0 = System.nanoTime()
      spine(s).write.format("noop").mode("overwrite").save()
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (name, _) =>
      val t = times(name)
      println(f"""{"variant":"$name","runs":[${t.map(x => f"$x%.3f").mkString(",")}],"median":${t.sorted.apply(t.size / 2)}%.3f}""")
    }
    spark.stop()
  }
}

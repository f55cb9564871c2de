package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19): which part of the PQ/ADC pipeline costs the wall —
  * the literal-codebook codes expression, the LUT fold, or the ranking
  * tail. Times each prefix of the q80 pipeline as its own action. */
object QProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.limit(1).count()
    val S = graft.operators.Similarity
    val books = S.pqSeedBooks(emb, "vec_id", "embedding", 4, 8)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val metrics = new BenchTaskMetrics
    spark.sparkContext.addSparkListener(metrics)
    def time(name: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().count() // warm
      org.apache.spark.sql.GraftColumnShim.drainListenerBus(spark)
      val r0 = metrics.runMs.get(); val c0 = metrics.cpuMs.get()
      val s0 = metrics.stages.get(); val k0 = metrics.tasks.get()
      val ts = (0 until runs).map { _ =>
        val t0 = System.nanoTime(); mk().count(); (System.nanoTime() - t0) / 1e9
      }
      org.apache.spark.sql.GraftColumnShim.drainListenerBus(spark)
      println(f"""{"probe":"$name","samples":[${ts.map(t => f"$t%.3f").mkString(",")}],"task_run_ms":${metrics.runMs.get() - r0},"task_cpu_ms":${metrics.cpuMs.get() - c0},"stages":${metrics.stages.get() - s0},"tasks":${metrics.tasks.get() - k0}}""")
    }
    time("scan_only")(() => emb.select(col("vec_id")))
    time("codes_only")(() => S.pqEncode(emb, "vec_id", "embedding", books))
    time("full_q80")(() => S.pqTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, m = 4, ksub = 8, trainedBooks = Some(books)))
    // tail decomposition
    val queries = emb.filter(col("vec_id") < 10)
    val lutMap: Map[Long, Seq[Double]] = queries
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map { r => r.getLong(0) -> (0 until 32).map(_.toDouble) }.toMap
    def pairs() = S.pqEncode(emb, "vec_id", "embedding", books)
      .withColumnRenamed("id", "nid")
      .withColumnRenamed("codes", "__codes")
      .crossJoin(broadcast(queries.select(col("vec_id").cast("long").as("qid"))))
      .filter(col("nid") =!= col("qid"))
    time("pairs_only")(() => pairs())
    time("pairs_lut")(() => pairs()
      .withColumn("__lut", element_at(typedLit(lutMap), col("qid")))
      .select(col("qid"), col("nid"), element_at(col("__lut"), 1).as("x")))
    time("pairs_adc")(() => {
      val contribSum = (0 until 4).map { j =>
        element_at(col("__lut"), lit(j * 8) + col("__codes")(j).cast("int") + lit(1))
      }.reduce(_ + _)
      pairs().withColumn("__lut", element_at(typedLit(lutMap), col("qid")))
        .select(col("qid"), col("nid"), (round(contribSum, 4) + lit(0.0)).as("adc"))
    })
    time("pairs_topk_nolut")(() => S.topKPerGroup(
      pairs().select(col("qid"), col("nid").cast("double").as("s"), col("nid")),
      "qid", "s", "nid", 5))
    def adcScored() = {
      val contribSum = (0 until 4).map { j =>
        element_at(col("__lut"), lit(j * 8) + col("__codes")(j).cast("int") + lit(1))
      }.reduce(_ + _)
      pairs().withColumn("__lut", element_at(typedLit(lutMap), col("qid")))
        .select(col("qid"), col("nid"), (round(contribSum, 4) + lit(0.0)).as("adc"))
    }
    time("adc_topk")(() => S.topKPerGroup(
      adcScored().withColumn("__neg", negate(col("adc")))
        .select(col("qid"), col("__neg"), col("nid")),
      "qid", "__neg", "nid", 5))
    // variant: LUT attached as a broadcast-joined ARRAY column instead
    // of an inlined map literal probed per row
    import spark.implicits._
    val lutDf = lutMap.toSeq.map { case (q, a) => (q, a) }.toDF("__lq", "__lut")
    def adcJoined() = {
      val contribSum = (0 until 4).map { j =>
        element_at(col("__lut"), lit(j * 8) + col("__codes")(j).cast("int") + lit(1))
      }.reduce(_ + _)
      pairs().join(broadcast(lutDf), col("qid") === col("__lq"))
        .select(col("qid"), col("nid"), (round(contribSum, 4) + lit(0.0)).as("adc"))
    }
    time("adcjoin_topk")(() => S.topKPerGroup(
      adcJoined().withColumn("__neg", negate(col("adc")))
        .select(col("qid"), col("__neg"), col("nid")),
      "qid", "__neg", "nid", 5))
    // count() PRUNES projections — force evaluation through sums
    time("codes_sum")(() => S.pqEncode(emb, "vec_id", "embedding", books)
      .agg(sum(element_at(col("codes"), 1))))
    time("adc_sum")(() => adcScored().agg(sum(col("adc"))))
    // isolate the aggregate from the scoring: same rows, pre-materialized
    val scoredCkpt = adcScored().withColumn("__neg", negate(col("adc")))
      .select(col("qid"), col("__neg"), col("nid")).localCheckpoint()
    time("ckpt_adc_topk")(() => S.topKPerGroup(scoredCkpt, "qid", "__neg", "nid", 5))
    time("ckpt_nolut_topk")(() => S.topKPerGroup(
      scoredCkpt.select(col("qid"), col("nid").cast("double").as("__neg"), col("nid")),
      "qid", "__neg", "nid", 5))
    time("adc_project_sum")(() => adcScored().withColumn("__neg", negate(col("adc")))
      .select(col("qid"), col("__neg"), col("nid")).agg(sum(col("__neg"))))
    // bisect the fused stage: codes-only score vs LUT-only score
    time("topk_codes_score")(() => S.topKPerGroup(
      pairs().select(col("qid"),
        col("__codes")(0).cast("double").as("__neg"), col("nid")),
      "qid", "__neg", "nid", 5))
    time("topk_lut_score")(() => S.topKPerGroup(
      pairs().withColumn("__lut", element_at(typedLit(lutMap), col("qid")))
        .select(col("qid"), element_at(col("__lut"), 1).as("__neg"), col("nid")),
      "qid", "__neg", "nid", 5))
    println("===== adc_topk plan =====")
    S.topKPerGroup(
      adcScored().withColumn("__neg", negate(col("adc")))
        .select(col("qid"), col("__neg"), col("nid")),
      "qid", "__neg", "nid", 5).explain("formatted")
    spark.stop()
  }
}

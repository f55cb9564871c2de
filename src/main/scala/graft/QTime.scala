package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r19 optimization round): splits a query's wall time into
  * CONSTRUCTION (the `(SparkSession, String) => DataFrame` call — for
  * queries like q80 this runs driver-side collect jobs for codebooks /
  * LUTs) and EXECUTION (`.count()`), timed separately over repeated
  * runs in one JVM. Tells plan/driver overhead apart from task work
  * where the bench diag can only show their sum. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q80_pq_adc")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.codingErrorAction", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // AQE-final executed plan (dev, env-gated): evaluate through the
      // noop sink (count() would prune projections — guide §1.4), then
      // print the final adaptive plan
      if (sys.env.contains("GRAFT_EXEC_PLAN")) {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"===== $n executed plan =====")
        println(df.queryExecution.executedPlan.toString)
      }
      fn(spark, sfDir).count() // warm-up
      System.gc()
      val cons = Array.ofDim[Double](runs); val exec = Array.ofDim[Double](runs)
      for (i <- 0 until runs) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        cons(i) = (t1 - t0) / 1e9; exec(i) = (t2 - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(x => f"$x%.3f").mkString(",")
      println(s"""{"query":"$n","construct":[${fmt(cons)}],"execute":[${fmt(exec)}]}""")
    }
    spark.stop()
  }
}

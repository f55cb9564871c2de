package graft

/** Diagnostic main: print a query's formatted executed plan and its
  * wall time at a given sf dir — the `.explain`-and-iterate loop the
  * bench can't show. Usage:
  * `sbt "Test/runMain graft.PlanDump q43_asof_join /root/testdata/sf0.1"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = TestSpark.spark
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[plandump] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    // second run: warm caches, AQE-final plan
    val t1 = System.nanoTime()
    df.count()
    println(f"[plandump] $name warm=${(System.nanoTime() - t1) / 1e9}%.3f s")
    // post-execution view: AQE's FINAL plan (runtime join strategy
    // switches, coalesced partitions), not the initial guess above
    println("== AQE final ==")
    println(df.queryExecution.executedPlan.toString)
  }
}

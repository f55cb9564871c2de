package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B micro-benchmark for scalar-expression variants
  * (round-19 optimization round): times OLD vs NEW forms of the text
  * scan primitives back-to-back in the same session, A,B,A,B,… so host
  * weather (steal storms, clock degradation — this VM's documented
  * failure mode for cross-record comparisons) hits both variants
  * equally. Prints one JSON line per (name, variant) with median and
  * samples. Findings live in OPTIMIZATION_r19.md. */
object BenchExprAB {

  private def countOccOld(c: Column, target: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(target), "")))
      / target.length).cast("long")

  private def countOccNew(c: Column, target: String): Column =
    regexp_count(c, lit(java.util.regex.Pattern.quote(target))).cast("long")

  private def alphaOld(c: Column): Column =
    length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  private def alphaNew(c: Column): Column =
    regexp_count(c, lit("[a-zA-Z]")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  private val stops = Seq("the", "a", "and", "of", "to", "in", "is")

  private def stopsWith(cnt: (Column, String) => Column)(c: Column): Column =
    stops.map(s => cnt(concat(lit(" "), c, lit(" ")), s" $s ")).reduce(_ + _)

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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(1).count()

    val cases: Seq[(String, Seq[(String, Column)])] = Seq(
      "count_the" -> Seq(
        "old" -> countOccOld(col("text"), "the"),
        "new" -> countOccNew(col("text"), "the")),
      "alpha_ratio" -> Seq(
        "old" -> alphaOld(col("text")),
        "new" -> alphaNew(col("text"))),
      "stopword_hits" -> Seq(
        "old" -> stopsWith(countOccOld)(col("text")),
        "new" -> stopsWith(countOccNew)(col("text"))))

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "7").toInt
    for ((name, variants) <- cases) {
      val samples = collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for ((_, e) <- variants) docs.select(sum(e.cast("double"))).count() // warm-up
      System.gc()
      for (_ <- 0 until runs; (vName, e) <- variants) {
        val t0 = System.nanoTime()
        docs.select(sum(e.cast("double"))).count()
        samples(vName) :+= (System.nanoTime() - t0) / 1e9
      }
      for ((vName, _) <- variants) {
        val ts = samples(vName).sorted
        val med = ts(ts.length / 2)
        println(f"""{"case":"$name","variant":"$vName","median":$med%.4f,"samples":[${ts.map(t => f"$t%.4f").mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}

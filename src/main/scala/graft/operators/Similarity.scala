package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a full corpus scan; one shuffle for the per-query top-k.
  * Scale path: md5-seeded random-hyperplane LSH buckets, so candidate
  * generation is a bucket-equality join instead of a cross join. All
  * pseudo-randomness is md5-derived — deterministic, engine-portable, and
  * reproducible against the DuckDB oracle.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns — pure Catalyst
    * (`zip_with` + `aggregate`), codegen-friendly, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Ranking key is (rounded cosine desc, id
    * asc) — rounded so FP summation order can never flip a rank. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 4).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
  }

  /** Random-hyperplane LSH bucket per vector: bit p of the bucket id is the
    * sign of Σ_j v_j·s(p,j), with s(p,j) = ±1 derived from md5(p||'-'||j).
    * Returns (id, bucket). Vectors in the same bucket are ANN candidates;
    * expected bucket population = n / 2^planes. */
  def hyperplaneBuckets(emb: DataFrame, idCol: String, vecCol: String,
                        planes: Int): DataFrame = {
    val spark = emb.sparkSession
    val dims = emb.select(size(col(vecCol))).first().getInt(0)
    val p = spark.range(planes).select(col("id").cast("int").as("plane"))
    val d = spark.range(dims).select(col("id").cast("int").as("dim"))
    // md5-derived ±1 sign matrix, built engine-side (also SQL-mirrorable)
    val signs = p.crossJoin(d).select(col("plane"), col("dim"),
      when(substring(md5(concat(col("plane"), lit("-"), col("dim"))), 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1.0).otherwise(-1.0).as("sign"))
    val comps = emb.select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "comp")))
    val bits = comps.join(broadcast(signs), "dim")
      .groupBy(col("id"), col("plane"))
      .agg(sum(col("comp") * col("sign")).as("proj"))
      .withColumn("bit", when(col("proj") > 0, lit(1L)).otherwise(lit(0L)))
    bits.groupBy(col("id"))
      .agg(sum(col("bit") * pow(lit(2.0), col("plane")).cast("long")).as("bucket"))
  }

  /** LSH-bucketed ANN top-k: exact cosine, but only within the query's
    * bucket — the 1000-executor path when the corpus no longer broadcasts. */
  def annTopKBucketed(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, planes: Int): DataFrame = {
    val buckets = hyperplaneBuckets(corpus, idCol, vecCol, planes)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
      .join(buckets.withColumnRenamed("id", "nid"), "nid")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .join(buckets.withColumnRenamed("id", "qid"), "qid")
    val scored = c.join(q, "bucket")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), round(cosine(col("qvec"), col("nvec")), 4).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
  }
}

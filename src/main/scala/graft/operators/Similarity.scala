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
  *
  * Vector math is `zip_with`+`aggregate` (pure Catalyst, no UDF), with
  * norms precomputed per side so each candidate pair costs one dot
  * product. (Measured: unrolling the dot product into 64 element_at terms
  * is ~2× SLOWER than the lambda form on this corpus — expression-tree
  * size beats lambda overhead — so the lambda form stays.)
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity — self-contained (norms recomputed per call);
    * hot paths below precompute norms instead. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** md5-derived ±1 hyperplane sign: +1 iff the first hex digit of
    * md5("p-j") is ≥ '8'. Computed on the driver; identical to the SQL
    * `substr(md5(p || '-' || j), 1, 1) BETWEEN '8' AND 'f'` the oracle
    * uses, so buckets match bit-for-bit. */
  private[operators] def planeSign(plane: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane-$dim".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  private[operators] def vecDims(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  /** Random-hyperplane LSH bucket per vector: bit p of the bucket id is
    * the sign of Σ_j v_j·s(p,j). The sign matrix is inlined as array
    * literals, so bucket assignment is ONE narrow projection — no explode,
    * no join, no shuffle; it pipelines into whatever scan feeds it. That
    * is the shape that survives a 100 TB corpus. */
  def hyperplaneBuckets(emb: DataFrame, idCol: String, vecCol: String,
                        planes: Int): DataFrame = {
    val dims = vecDims(emb, vecCol)
    val vec = col(vecCol).cast("array<double>")
    val bucket = (0 until planes).map { p =>
      val signs = array((0 until dims).map(j => lit(planeSign(p, j))): _*)
      when(dot(vec, signs) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.select(col(idCol).as("id"), bucket.as("bucket"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Ranking key is (rounded cosine desc, id
    * asc) — rounded so FP summation order can never flip a rank. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nvec"))
      .withColumn("nnorm", norm(col("nvec")))
    val q = queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
  }

  /** IVF-style coarse quantization: `nlist` deterministic pseudo-centroids
    * (md5-derived ±1 direction vectors — same family as the hyperplanes);
    * each vector goes to its argmax-projection cell. Like the buckets,
    * this is ONE narrow projection over the corpus. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                nlist: Int): DataFrame = {
    val dims = vecDims(emb, vecCol)
    val vec = col(vecCol).cast("array<double>")
    val projs = array((0 until nlist).map { c =>
      val signs = array((0 until dims).map(j => lit(planeSign(c + 7919, j))): _*)
      dot(vec, signs)
    }: _*)
    emb.select(col(idCol).as("id"),
      (array_position(projs, array_max(projs)) - 1).cast("long").as("cell"))
  }

  /** IVF ANN top-k with nprobe=1: exact cosine within the query's cell.
    * Coarser than the hyperplane buckets (nlist cells vs 2^planes), which
    * trades recall for fewer, larger candidate lists. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int): DataFrame = {
    val cells = ivfAssign(corpus, idCol, vecCol, nlist)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
      .withColumn("nnorm", norm(col("nvec")))
      .join(cells.withColumnRenamed("id", "nid"), "nid")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
      .join(cells.withColumnRenamed("id", "qid"), "qid")
    val scored = c.join(q, "cell")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
  }

  /** LSH-bucketed ANN top-k: exact cosine, but only within the query's
    * bucket — the 1000-executor path when the corpus no longer broadcasts. */
  def annTopKBucketed(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, planes: Int): DataFrame = {
    val buckets = hyperplaneBuckets(corpus, idCol, vecCol, planes)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nvec"))
      .withColumn("nnorm", norm(col("nvec")))
      .join(buckets.withColumnRenamed("id", "nid"), "nid")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qnorm", norm(col("qvec")))
      .join(buckets.withColumnRenamed("id", "qid"), "qid")
    val scored = c.join(q, "bucket")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
  }
}

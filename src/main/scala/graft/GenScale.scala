package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic scale-ladder fixture generator (dev tool, not part of
  * the library surface). Reproduces the STATISTICAL shape of the driver's
  * sf0.1 tables — zipf-sampled tech-word documents with a small
  * exact-duplicate rate, 10-blob 64-dim embeddings, a TPC-H-ish
  * orders⋈lineitem bipartite graph — at a parameterized multiple, so the
  * dedup/ANN/graph cost centers can be measured at ×1/×3/×10 of the
  * bench scale and fitted for scaling exponents (SCALE.md).
  *
  * Everything derives from splitmix64 of the row id: partition-count
  * independent, seedless, reproducible run-to-run (same discipline as
  * the library's md5-keyed operators). Two corpus flavors:
  *
  *   - `documents`: the driver-like corpus — a CLOSED ~40-word vocab,
  *     zipf-weighted. Shingle/fingerprint space is bounded, so LSH/
  *     SimHash bucket sizes GROW with N — the adversarial density
  *     regime for candidate generation.
  *   - `documents_nat`: natural-vocab corpus — the same zipf head plus
  *     ~20% rare tokens (hapax-style, id-salted), so fingerprint
  *     entropy grows with the corpus as real web text does — the regime
  *     LSH banding is designed for.
  *
  * Usage: runMain graft.GenScale <multiplier> <outDir>
  * (multiplier 1 ≈ sf0.1 row counts: 5k docs, 2k vecs, 150k orders,
  * 600k lineitem). */
object GenScale {

  /** splitmix64: cheap, high-quality id → pseudo-random long. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  /** uniform double in [0,1) from a (seed, stream) pair. */
  def unif(seed: Long, stream: Long): Double =
    ((mix(mix(seed) ^ stream) >>> 11).toDouble) / (1L << 53).toDouble

  val vocab: Array[String] = Array(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "index", "cache", "shuffle", "join", "plan", "stage",
    "task", "block", "page", "store", "read", "write", "node", "graph")

  // zipf(alpha=1.1) cumulative weights over the vocab head
  private val zipfCum: Array[Double] = {
    val w = vocab.indices.map(r => 1.0 / math.pow(r + 1, 1.1)).toArray
    val s = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / s)
  }

  private def zipfWord(u: Double): String = {
    val i = java.util.Arrays.binarySearch(zipfCum, u)
    vocab(math.min(if (i < 0) -i - 1 else i, vocab.length - 1))
  }

  /** Document text for a SEED (not a doc id): exact-dup groups share a
    * seed. `natural` mixes in ~20% id-salted rare tokens. */
  def docText(seed: Long, natural: Boolean): String = {
    val nTok = 10 + (unif(seed, 1) * 85).toInt // 10..94 tokens, mean ~52
    val sb = new StringBuilder
    var t = 0
    while (t < nTok) {
      if (t > 0) sb.append(' ')
      val s = seed * 131 + t
      if (natural && unif(s, 2) < 0.20)
        // hapax-style rare token: effectively unique across the corpus
        sb.append("w").append(java.lang.Long.toHexString(mix(s) >>> 24))
      else sb.append(zipfWord(unif(s, 3)))
      t += 1
    }
    sb.toString
  }

  def documents(spark: SparkSession, n: Long, natural: Boolean): DataFrame = {
    import spark.implicits._
    val langs = Array("en", "en", "en", "en", "en", "en", "de", "fr", "es", "en")
    spark.range(n).map { boxed =>
      val id: Long = boxed
      // ~0.5% of docs copy an earlier doc's text (seed-shared): exact-dup
      // groups for q31/q102; the copied seeds are spread over 97 donors
      // so group sizes stay small (the mass-dup case is StressSpec's job)
      val seed = if (id % 199 == 7) id % 97 else id
      val text = docText(seed, natural)
      (id, text, langs((unif(id, 4) * langs.length).toInt),
        "src" + (unif(id, 5) * 20).toInt, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, n: Long, dims: Int = 64,
                 labels: Int = 10): DataFrame = {
    import spark.implicits._
    // fixed cluster centers (label-seeded), unit-ish scale
    val centers = Array.tabulate(labels, dims)((l, j) =>
      (unif(l * 7919 + 3, j) - 0.5).toFloat * 2f)
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n).map { boxed =>
      val id: Long = boxed
      // ~1% near-dup pairs: the donor (id-1) supplies the label AND the
      // noise draw, so every donor pair shares both center and noise and
      // differs only in a 10x-smaller own-id jitter (cosine ≈ 0.999,
      // near but never exact). Label from the recipient's own id would
      // make pairs near-dups only on the ~10% label coincidence — a
      // 10x-lower real rate than claimed.
      val noiseSeed = if (id % 101 == 11) id - 1 else id
      val label = (unif(noiseSeed, 6) * labels).toInt
      val c = bc.value(label)
      val v = Array.tabulate(dims) { j =>
        val jitter = if (noiseSeed != id)
          ((unif(id * 31 + 17, j) - 0.5) * 0.04).toFloat else 0f
        c(j) * 0.8f + ((unif(noiseSeed * 31 + 17, j) - 0.5) * 0.4).toFloat + jitter
      }
      (id, v.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Only the columns q84_pagerank reads: the orders⋈lineitem bipartite
    * customer↔supplier graph. 4 lineitem rows per order, key ranges
    * scaled with the multiplier exactly as the driver tables scale. */
  def orders(spark: SparkSession, n: Long, nCust: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => (id.toLong, (unif(id, 7) * nCust).toLong))
      .toDF("o_orderkey", "o_custkey")
  }

  def lineitem(spark: SparkSession, n: Long, nSupp: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(id => (id.toLong / 4, (unif(id, 8) * nSupp).toLong))
      .toDF("l_orderkey", "l_suppkey")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GenScale <multiplier> <outDir>")
    val m = args(0).toDouble
    val out = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    w(documents(spark, (5000 * m).toLong, natural = false), "documents")
    w(documents(spark, (5000 * m).toLong, natural = true), "documents_nat")
    w(embeddings(spark, (2000 * m).toLong), "embeddings")
    w(orders(spark, (150000 * m).toLong, (15000 * m).toLong), "orders")
    w(lineitem(spark, (600000 * m).toLong, (1000 * m).toLong), "lineitem")
    println(s"[genscale] wrote x$m fixtures to $out")
    spark.stop()
  }
}

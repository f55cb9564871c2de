package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Elem, IndexOps, IndexState, SemanticStream}

/** Source layer: files → indexed streams.
  *
  * The reference's only sources are in-memory factories plus text/blob
  * readers (semantic.h:2101-2417); everything else here is the Spark-side
  * generalization a real deployment needs. All readers return plain
  * DataFrames (Catalyst sees the scan → pushdown/pruning apply) with an
  * optional bridge into [[SemanticStream]] when index semantics matter.
  */
object Readers {

  /** Parquet table (the driver-testdata layout: `<dir>/<name>.parquet`). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV with headers + schema inference off (pin schemas in production —
    * inference is a second full scan at 100 TB). */
  def csv(spark: SparkSession, path: String, schemaDdl: String,
          delimiter: String = ","): DataFrame =
    spark.read.option("header", "true").option("sep", delimiter)
      .schema(schemaDdl).csv(path)

  /** JSON-lines with a pinned schema (same rationale). */
  def jsonLines(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  /** Line source (useBlob(istream)/useText, semantic.h:2140-2258). */
  def lines(spark: SparkSession, path: String): SemanticStream[String] =
    SemanticStream.fromTextFile(spark, path)

  /** Corrupt-tolerant JSON-lines ingestion — the shape real crawl/export
    * feeds need: PERMISSIVE mode routes unparseable lines into a
    * `_corrupt_record` column instead of failing the job (FAILFAST) or
    * silently dropping them (DROPMALFORMED), so an audit can account for
    * every input line. Returns (good rows WITHOUT the corrupt column,
    * corrupt raw lines) from ONE read; at 100 TB both sides prune to the
    * columns they touch. The corrupt column must be part of the pinned
    * schema per Spark's contract — callers pass only the DATA schema and
    * the column is added here. */
  def jsonLinesAudited(spark: SparkSession, path: String, schemaDdl: String,
                       corruptCol: String = "_corrupt_record"): (DataFrame, DataFrame) = {
    // text scan + from_json, NOT spark.read.json with a corrupt column:
    // Spark refuses file-source queries whose required schema is ONLY
    // the corrupt column (the bad-side projection here would be exactly
    // that), and the documented cache() workaround is a non-starter at
    // corpus scale. JsonToStructs has no such restriction, captures the
    // raw line into the schema-embedded corrupt column, and stays a
    // codegen'd map-side projection over the text scan either way
    // (the JSON reader has no field pushdown to lose).
    // Blank / whitespace-only lines parse to a NULL struct (not a corrupt
    // record): `j.*` on those would yield an all-null row with a null
    // corrupt column — misclassified as a good row of nulls, breaking
    // good + bad == input lines. Classify `j IS NULL` as bad alongside
    // corrupt records; this catches every empty-input shape Jackson
    // treats as "no content" without second-guessing its whitespace
    // definition.
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(schemaDdl).add(corruptCol, "string")
    val parsed = spark.read.text(path)
      .select(col("value"),
        from_json(col("value"), schema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol)).as("j"))
    (parsed.filter(col("j").isNotNull && col(s"j.$corruptCol").isNull)
      .select(col("j.*")).drop(corruptCol),
      parsed.filter(col("j").isNull || col(s"j.$corruptCol").isNotNull)
        .select(col("value").as("raw")))
  }

  /** Bridge: any DataFrame → SemanticStream over one value column, indexed
    * by the given total order (distributed rank, no global window). */
  def indexed[E](df: DataFrame, valueCol: Column, order: Seq[Column])
                (implicit enc: org.apache.spark.sql.Encoder[Elem[E]]): SemanticStream[E] = {
    val ranked = IndexOps.renumberBy(df.withColumn("value", valueCol), order)
      .select(col("ord"), col("idx"), col("value"))
    new SemanticStream[E](ranked.as[Elem[E]], IndexState.Contiguous)
  }

  /** Bridge over a UNIQUE numeric key (a primary key): Catalyst-only
    * bucket rank with a known ordBound — prefer over [[indexed]] whenever
    * a key exists (see [[SemanticStream.fromUniqueKey]]). */
  def indexedByUniqueKey[E](df: DataFrame, valueCol: Column, key: Column)
                           (implicit enc: org.apache.spark.sql.Encoder[Elem[E]]): SemanticStream[E] =
    SemanticStream.fromUniqueKey[E](df, valueCol, key)

  /** Sink: bucketed + sorted table write. Two tables bucketed the same
    * way join WITHOUT any exchange (co-located sort-merge) — the
    * pre-shuffle investment that pays for itself on every subsequent
    * 100 TB join. Requires saveAsTable (bucket metadata lives in the
    * catalog). */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Sink: partitioned parquet write — the deployment-shaped inverse of
    * [[table]]. Partition columns choose pruning keys at read time;
    * `maxRecordsPerFile` bounds file sizes at scale. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}

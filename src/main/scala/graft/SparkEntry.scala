package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from SURVEY.md §2
  * (the reference inventory of eloyhere/semantic-cpp) re-expressed
  * Spark-first, plus the LLM-data-pipeline operators (dedup, similarity,
  * text analysis). [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  *
  * Conventions shared by every query:
  *   - all floating aggregates are rounded to a fixed number of decimals on
  *     BOTH sides so Spark-vs-DuckDB summation-order FP noise cannot flip
  *     the hash;
  *   - every computed column is aliased identically on both sides (the
  *     driver sorts columns by name before hashing);
  *   - integer-typed aggregates are cast to BIGINT in the oracle (DuckDB
  *     sums integers into HUGEINT, row_number() is BIGINT while Spark's is
  *     INT, etc.).
  */
object SparkEntry {

  private def t(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}

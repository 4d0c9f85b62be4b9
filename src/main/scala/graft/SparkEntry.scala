package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): each entry is one
  * operator/capability, runnable at any scale-factor directory;
  * `oracleSql` holds the DuckDB-dialect equivalent for the driver's
  * hash-match correctness gate. Entries without an oracle are
  * non-SQL-expressible (LSH/minhash/etc.) and get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Five-table star join → revenue per nation (broadcast dims, one
    * shuffle join).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q4StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Extended.queries ++ Extended2.queries ++
      Extended3.queries ++ Extended4.queries ++ Extended5.queries ++
      Extended6.queries ++ Extended7.queries ++
      QualityQueries.queries ++ Dedup.queries ++ TextAnalysis.queries ++
      Similarity.queries ++ Multimodal.queries ++ Sampling.queries ++
      Packing.queries ++ Decontamination.queries ++ Curation.queries ++
      CorpusFilters.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Extended.oracles ++ Extended2.oracles ++
      Extended3.oracles ++ Extended4.oracles ++ Extended5.oracles ++
      Extended6.oracles ++ Extended7.oracles ++
      QualityQueries.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Sampling.oracles ++
      Packing.oracles ++ Decontamination.oracles ++ Curation.oracles ++
      CorpusFilters.oracles
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent SQL for each
  * entry that is SQL-expressible. Column names are aliased identically on
  * both sides (the driver's compare hashes values under sorted column
  * names).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q05LocalSupplierVolume(spark, "/root/testdata/sf0.001")

  private def modules = Seq(
    operators.Relational.queries -> operators.Relational.oracles,
    operators.TpchSuite.queries -> operators.TpchSuite.oracles,
    operators.Filters.queries -> operators.Filters.oracles,
    operators.Collation.queries -> operators.Collation.oracles,
    operators.Display.queries -> operators.Display.oracles,
    operators.Joins.queries -> operators.Joins.oracles,
    operators.AsofJoin.queries -> operators.AsofJoin.oracles,
    operators.Scale.queries -> operators.Scale.oracles,
    operators.Aggregates.queries -> operators.Aggregates.oracles,
    operators.SortSetOps.queries -> operators.SortSetOps.oracles,
    operators.Subqueries.queries -> operators.Subqueries.oracles,
    operators.Events.queries -> operators.Events.oracles,
    operators.TextOps.queries -> operators.TextOps.oracles,
    operators.Lexicon.queries -> operators.Lexicon.oracles,
    operators.Curation.queries -> operators.Curation.oracles,
    operators.Sampling.queries -> operators.Sampling.oracles,
    operators.Corpus.queries -> operators.Corpus.oracles,
    operators.Dedup.queries -> operators.Dedup.oracles,
    operators.Similarity.queries -> operators.Similarity.oracles,
    operators.Multimodal.queries -> operators.Multimodal.oracles,
    operators.Packing.queries -> operators.Packing.oracles,
    operators.Profile.queries -> operators.Profile.oracles,
    sources.Dml.queries -> sources.Dml.oracles,
    sources.MvccStore.queries -> sources.MvccStore.oracles,
    sources.MaterializedAgg.queries -> sources.MaterializedAgg.oracles,
    sources.Formats.queries -> sources.Formats.oracles,
    sources.Statements.queries -> sources.Statements.oracles,
    sources.StatsSidecar.queries -> sources.StatsSidecar.oracles,
    operators.Pipeline.queries -> operators.Pipeline.oracles)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}

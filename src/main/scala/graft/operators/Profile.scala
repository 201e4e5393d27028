package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling tier — the query-level analog of the reference's
  * always-on pack metadata (the Knowledge Grid keeps n / nulls / min /
  * max / sum per pack, storage/tianmu/data/dpn.h:49-72, surfaced by
  * `SHOW TABLE STATUS` and the rough-query path): one scan computes the
  * table-level column profile a pipeline operator (or a human) asks for
  * before trusting a 100 TB input. [[graft.sources.StatsSidecar]] is
  * the pack-granular sidecar; this is the whole-table summary.
  *
  * Single pass: every column's aggregates go into ONE `agg` row
  * (count / nulls / exact distinct / min / max as strings), unpivoted
  * with `stack` — so profiling k columns costs one scan regardless of
  * k (the naive per-column loop scans k times). Distinct counts use
  * Spark's expand-based multi-distinct; for approximate profiling at
  * extreme cardinality swap `countDistinct` for
  * `approx_count_distinct` (HLL++) — one line, kept exact here so the
  * gate is oracle-checkable.
  */
object Profile {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** One row per profiled column:
    * (column_name, n_rows, n_nulls, n_distinct, min_value, max_value).
    *
    * One independent single-distinct aggregate per column, unioned —
    * the oracle's own UNION ALL shape. A single agg with k exact
    * `countDistinct`s plans as an Expand that multiplies EVERY input
    * row ×(k+1) before the partial aggregate (the classic
    * multi-distinct row blowup); per-column branches each use the
    * Expand-free one-distinct plan, the scans are column-pruned (k
    * single-column reads = the same bytes as one k-column read), and
    * all branches run inside one job. Shuffled bytes are unchanged
    * (each column's distinct values cross once either way). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"), count(col(c)).as("__n"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"),
          (col("n_rows") - col("__n")).as("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)

  /** The 100 TB profiler: identical shape with
    * `approx_count_distinct` (HLL++, rsd 5% default) — sketch partials
    * merge in O(1) so the plan loses the Expand row multiplication
    * entirely; the exact variant remains the oracle-gated one. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(col(c)).as(s"__n$i"),
        approx_count_distinct(col(c)).as(s"__d$i"),
        min(col(c)).cast("string").as(s"__mn$i"),
        max(col(c)).cast("string").as(s"__mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', __rows, __rows - __n$i, __d$i, __mn$i, __mx$i"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Equi-width histogram of a numeric column: bucket = floor(v /
    * width) (arithmetic both engines share bit-for-bit — no
    * width_bucket dependency), one map-side-combined group-by. NULLs
    * are excluded (they are the profiler's business). */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame =
    df.filter(col(c).isNotNull)
      .groupBy(floor(col(c) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(c)).as("lo"), max(col(c)).as("hi"))
      .withColumn("bucket_start", col("bucket") * width)
      .select("bucket", "bucket_start", "n_rows", "lo", "hi")
      .orderBy("bucket")

  def qProfileTable(s: SparkSession, dir: String): DataFrame =
    // rebalance: profile() is k single-distinct per-column aggregates
    // over the same scan; at bench scale each column's partial agg
    // would otherwise run in the ONE scan task (single-row-group
    // parquet) — the shuffle spreads the k distinct-hash partial aggs
    // across cores; no-op at cluster scale (Engine.rebalance contract)
    profile(Engine.rebalance(t(s, dir, "orders")),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      .orderBy("column_name")

  val qProfileTableSql: String =
    """SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
      |  COUNT(*) - COUNT(o_orderkey) AS n_nulls,
      |  COUNT(DISTINCT o_orderkey) AS n_distinct,
      |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
      |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
      |  COUNT(DISTINCT o_orderstatus),
      |  CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
      |  COUNT(DISTINCT o_totalprice),
      |  CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
      |  COUNT(DISTINCT o_orderpriority),
      |  CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
      |FROM orders
      |ORDER BY column_name""".stripMargin

  val HistWidth = 50000.0

  def qProfileHistogram(s: SparkSession, dir: String): DataFrame =
    histogram(t(s, dir, "orders"), "o_totalprice", HistWidth)

  val qProfileHistogramSql: String =
    s"""SELECT CAST(FLOOR(o_totalprice / $HistWidth) AS BIGINT) AS bucket,
      |  CAST(FLOOR(o_totalprice / $HistWidth) AS BIGINT) * $HistWidth
      |    AS bucket_start,
      |  COUNT(*) AS n_rows, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM orders WHERE o_totalprice IS NOT NULL
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_table" -> (qProfileTable _),
    "q_profile_histogram" -> (qProfileHistogram _))

  val oracles: Map[String, String] = Map(
    "q_profile_table" -> qProfileTableSql,
    "q_profile_histogram" -> qProfileHistogramSql)
}

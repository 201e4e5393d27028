package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge-Grid analog: a per-pack stats sidecar + rough (metadata-only)
  * query answering, mirroring the reference's Data Pack Node design.
  *
  * The reference keeps per-64K-row-pack metadata (DPN —
  * storage/tianmu/data/dpn.h:49-72: numOfRecords/numOfNulls, min_i/max_i
  * and an int64 sum_i) and answers predicates per pack with a tri-state
  * RoughCheck → RS_NONE / RS_SOME / RS_ALL
  * (common/common_definitions.h:168-174, vc/tianmu_attr_exeq_rs.cpp:43):
  * RS_NONE packs are skipped without decompression, RS_ALL packs are
  * accepted without re-testing rows, and whole aggregates can be answered
  * from DPNs alone (core/temp_table_roughquery.cpp).
  *
  * Parquet row-group stats already give Spark min/max/null-count pruning
  * for free (SURVEY.md §1.1), but parquet has NO sum statistic — the one
  * DPN field with no Parquet analog. This module closes that gap the
  * Spark-idiomatic way:
  *
  *  - a "pack" is a hive partition directory (`_pack=N/`), so pack
  *    pruning IS Spark partition pruning — `PartitionFilters` in the scan,
  *    zero files opened for skipped packs;
  *  - the sidecar is itself a tiny Parquet table, one row per
  *    (pack, column): n_rows, n_nulls, min/max, and an exact scale-4
  *    fixed-point int64 sum (the sum_i analog, same convention as
  *    [[graft.operators.Relational.dec]]);
  *  - rough aggregates (COUNT/MIN/MAX/SUM) read ONLY the sidecar;
  *  - range counts run hybrid: RS_ALL packs are answered from the
  *    sidecar, RS_SOME packs are scanned with partition pruning, RS_NONE
  *    packs are never touched.
  *
  * Scale: the sidecar has (files × columns) rows — ~1e6 at 100 TB with
  * 1 GB packs — and every rough answer is an aggregation over it, never
  * over the data. A selective RS_SOME pack-id list passes through the
  * driver as partition-pruning literals (same order of magnitude as the
  * file listing Spark already holds); above [[IsinMaxPacks]] the exact
  * pass switches to a broadcast pack-id join so a weak rough pass can
  * never inline ~1e6 literals into the plan.
  */
object StatsSidecar {

  val PackCol = "_pack"

  /** Fixed-point scale for the sum stat (matches Relational.dec). */
  private val Scale = 10000.0

  def statsPath(path: String): String = s"$path.stats"

  /** Write `df` as a pack-partitioned Parquet table plus its stats
    * sidecar over `cols` (numeric columns). `packRows` is the pack-size
    * analog (the reference's 64 Ki rows per pack, common/defs.h:47-49) —
    * here rows per partition directory. */
  def writeWithStats(df: DataFrame, path: String, packRows: Int,
                     cols: Seq[String],
                     clusterBy: Option[Column] = None,
                     strCols: Seq[String] = Nil): Unit = {
    val n = df.count()
    val nPacks = math.max(1, math.ceil(n.toDouble / packRows).toInt)
    // Clustering by the hot filter column (or a Z-order key over several,
    // graft.functions.ZOrder) is what makes pack skipping bite (narrow
    // per-pack min/max ranges) — the reason Tianmu's Knowledge Grid works
    // on naturally ordered loads. Range-partitioning is the Spark analog
    // of that load order.
    val parts = clusterBy match {
      case Some(c) => df.repartitionByRange(nPacks, c)
      case None => df.repartition(nPacks)
    }
    parts.withColumn(PackCol, spark_partition_id())
      .write.mode("overwrite").partitionBy(PackCol).parquet(path)

    // Stats are computed from the WRITTEN files, not the in-memory plan:
    // re-executing a repartitionByRange plan can re-sample different
    // range boundaries, which would describe packs that don't match the
    // files on disk (the DPN must describe the pack it sits next to).
    // The schema is passed explicitly: a zero-row partitionBy write
    // produces no data files, and schema inference over an empty
    // directory throws — an empty table must still yield a (readable)
    // empty table plus an empty sidecar.
    val packedSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        PackCol, org.apache.spark.sql.types.IntegerType))
    val packed = df.sparkSession.read.schema(packedSchema).parquet(path)

    // one aggregation pass builds every per-pack stat; stack() unpivots
    // to the long (pack, column) layout. Numeric columns carry
    // min/max/sum as doubles + fixed-point long; string columns carry
    // lexicographic min/max (the CMAP-ish prefix-pruning stats,
    // rsi_cmap.h:46-53) — each family's other fields are NULL.
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(floor(col(c) * lit(Scale) + lit(0.5)).cast("long"))
          .as(s"__sum_$c"))
    } ++ strCols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        min(col(c)).as(s"__mins_$c"),
        max(col(c)).as(s"__maxs_$c"))
    }
    val wide = packed.groupBy(col(PackCol)).agg(aggs.head, aggs.tail: _*)
    def entry(c: String, minV: String, maxV: String, sumFp: String,
              minS: String, maxS: String): String =
      s"named_struct('column', '$c', 'n_rows', __n_$c, " +
        s"'n_nulls', __nulls_$c, 'min_v', $minV, 'max_v', $maxV, " +
        s"'sum_fp', $sumFp, 'min_s', $minS, 'max_s', $maxS)"
    val numStack = cols.map { c =>
      entry(c, s"__min_$c", s"__max_$c", s"__sum_$c",
        "CAST(NULL AS STRING)", "CAST(NULL AS STRING)")
    }
    val strStack = strCols.map { c =>
      entry(c, "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        "CAST(NULL AS BIGINT)", s"__mins_$c", s"__maxs_$c")
    }
    val stackExpr = (numStack ++ strStack).mkString(
      "inline(array(", ", ", "))")
    wide.select(col(PackCol), expr(stackExpr))
      .write.mode("overwrite").parquet(statsPath(path))
  }

  def readStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(statsPath(path))

  /** Rough aggregates over one column — COUNT/nulls/MIN/MAX/SUM answered
    * from the sidecar alone (temp_table_roughquery.cpp analog; the sum is
    * exact by the fixed-point convention, not approximate). */
  def roughAgg(stats: DataFrame, column: String): DataFrame =
    stats.filter(col("column") === column)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        (sum(col("sum_fp")).cast("double") / Scale).as("sum_v"))

  /** Tri-state per-pack classification of `lo <= column <= hi`
    * (RoughCheck analog): adds `state` ∈ 'NONE' | 'SOME' | 'ALL'. A pack
    * is ALL only if every row (incl. no NULLs) passes; NONE if no row
    * can. */
  def roughCheck(stats: DataFrame, column: String,
                 lo: Double, hi: Double): DataFrame =
    stats.filter(col("column") === column)
      .select(col(PackCol), col("n_rows"),
        when(col("max_v") < lo || col("min_v") > hi || col("n_rows") === 0,
          "NONE")
          .when(col("min_v") >= lo && col("max_v") <= hi
            && col("n_nulls") === 0, "ALL")
          .otherwise("SOME").as("state"))

  /** Above this many RS_SOME packs the exact pass stops inlining
    * `_pack IN (...)` literals and joins the scan against the pack-id
    * frame instead. Literal pruning is ideal for the common case (a
    * selective rough pass leaves few packs, and the IN list lands in the
    * scan's static `PartitionFilters`); but at the module's stated scale
    * (~1e6 packs at 100 TB) a weak rough pass could otherwise inline up
    * to ~1e6 literals into one filter expression — analyzer/plan-size
    * blowup, not a graceful degrade. The broadcast join keeps the plan
    * O(1) in pack count and lets dynamic partition pruning do the
    * skipping. */
  val IsinMaxPacks = 256

  /** Shared exact pass for the hybrid counts: sum ALL-pack rows from the
    * sidecar, scan only SOME packs re-testing `rowPred`. Pack selection
    * is literal IN below [[IsinMaxPacks]], broadcast-join above. */
  private def hybridCount(spark: SparkSession, path: String,
                          states: DataFrame, rowPred: Column): Long = {
    val byState = states.groupBy(col("state"))
      .agg(sum("n_rows").as("rows"), count(lit(1)).as("n_packs"))
      .collect()
    val fullRows = byState.find(_.getString(0) == "ALL")
      .map(_.getLong(1)).getOrElse(0L)
    val nSome = byState.find(_.getString(0) == "SOME")
      .map(_.getLong(2)).getOrElse(0L)
    val partialRows =
      if (nSome == 0L) 0L
      else if (nSome <= IsinMaxPacks) {
        val packs = states.filter(col("state") === "SOME")
          .select(col(PackCol)).collect().map(_.getInt(0)).toSeq
        spark.read.parquet(path)
          .filter(col(PackCol).isin(packs: _*) && rowPred).count()
      } else {
        val packs = states.filter(col("state") === "SOME")
          .select(col(PackCol))
        spark.read.parquet(path)
          .join(broadcast(packs), Seq(PackCol)).filter(rowPred).count()
      }
    fullRows + partialRows
  }

  /** Hybrid rough+exact COUNT of `lo <= column <= hi`: ALL packs counted
    * from the sidecar, SOME packs scanned with partition pruning (the
    * `_pack IN (...)` predicate lands in the scan's PartitionFilters, or
    * a broadcast pack-id join above [[IsinMaxPacks]]), NONE packs
    * untouched — the ParameterizedFilter::UpdateMultiIndex two-phase
    * evaluation (rough pass then exact pass on surviving packs,
    * core/parameterized_filter.cpp:1232-1286) in Spark form. */
  def countBetween(spark: SparkSession, path: String, column: String,
                   lo: Double, hi: Double): Long =
    hybridCount(spark, path,
      roughCheck(readStats(spark, path), column, lo, hi),
      col(column) >= lo && col(column) <= hi)

  /** Tri-state classification of `column LIKE 'prefix%'` from string
    * min/max — the CMAP prefix-LIKE rough check (rsi_cmap.h:53 IsLike).
    * In byte order, the strings starting with `prefix` form a contiguous
    * range, so only prefix comparisons are needed (no sentinel upper
    * bound — a `prefix + U+FFFF` bound would misclassify text containing
    * supplementary-plane characters, routine in a web corpus):
    *  - NONE: the whole pack sorts below the range (max_s < prefix), or
    *    above it (min_s ≥ prefix and min_s does not start with prefix);
    *  - ALL: both ends start with prefix (then everything between does),
    *    and no NULLs. */
  def roughCheckPrefix(stats: DataFrame, column: String,
                       prefix: String): DataFrame =
    stats.filter(col("column") === column)
      .select(col(PackCol), col("n_rows"),
        when(col("max_s") < prefix
          || (col("min_s") >= prefix && !col("min_s").startsWith(prefix))
          || col("n_rows") === 0, "NONE")
          .when(col("min_s").startsWith(prefix)
            && col("max_s").startsWith(prefix)
            && col("n_nulls") === 0, "ALL")
          .otherwise("SOME").as("state"))

  /** Hybrid rough+exact COUNT of `column LIKE 'prefix%'` (string twin of
    * [[countBetween]]). */
  def countPrefix(spark: SparkSession, path: String, column: String,
                  prefix: String): Long =
    hybridCount(spark, path,
      roughCheckPrefix(readStats(spark, path), column, prefix),
      col(column).startsWith(prefix))

  // --- gate query ---------------------------------------------------------

  /** Rough-query gate: pack-write lineitem clustered by l_quantity, then
    * answer COUNT/MIN/MAX/SUM purely from the sidecar and a BETWEEN count
    * through the tri-state hybrid path. The oracle recomputes all five
    * from the raw table — rough answers must be EXACT, which is the DPN
    * contract (rough ≠ approximate; it is metadata-complete). */
  def qRoughAgg(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_rough").toString
    val li = graft.Engine.table(s, dir, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    writeWithStats(li, s"$scratch/lineitem_packed", 8192,
      Seq("l_quantity", "l_extendedprice"),
      clusterBy = Some(col("l_quantity")))
    val stats = readStats(s, s"$scratch/lineitem_packed")
    val nBetween =
      countBetween(s, s"$scratch/lineitem_packed", "l_quantity", 10.0, 30.0)
    roughAgg(stats, "l_extendedprice")
      .select(
        col("n_rows").as("n"),
        col("min_v").as("min_price"),
        col("max_v").as("max_price"),
        col("sum_v").as("sum_price"),
        lit(nBetween).as("n_qty_10_30"))
  }

  val qRoughAggSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      |  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT))
      |    AS DOUBLE) / 10000.0 AS sum_price,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |   WHERE l_quantity BETWEEN 10.0 AND 30.0) AS n_qty_10_30
      |FROM lineitem""".stripMargin

  /** String-pruning gate: pack-write customer clustered by mktsegment,
    * answer the segment MIN/MAX from string sidecar stats alone and a
    * LIKE-prefix count through the hybrid path — all must equal exact
    * recomputation (the CMAP IsLike contract). */
  def qRoughPrefix(s: SparkSession, dir: String): DataFrame = {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_roughs").toString
    val c = graft.Engine.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    writeWithStats(c, s"$scratch/customer_packed", 256, Seq("c_custkey"),
      clusterBy = Some(col("c_mktsegment")), strCols = Seq("c_mktsegment"))
    val stats = readStats(s, s"$scratch/customer_packed")
    val nBuild = countPrefix(s, s"$scratch/customer_packed",
      "c_mktsegment", "BUILD")
    stats.filter(col("column") === "c_mktsegment")
      .agg(
        sum(col("n_rows")).as("n"),
        min(col("min_s")).as("min_seg"),
        max(col("max_s")).as("max_seg"))
      .withColumn("n_building", lit(nBuild))
  }

  val qRoughPrefixSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(c_mktsegment) AS min_seg,
      |  MAX(c_mktsegment) AS max_seg,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
      |   WHERE c_mktsegment LIKE 'BUILD%') AS n_building
      |FROM customer""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rough_agg" -> (qRoughAgg _),
    "q_rough_prefix" -> (qRoughPrefix _))

  val oracles: Map[String, String] = Map(
    "q_rough_agg" -> qRoughAggSql,
    "q_rough_prefix" -> qRoughPrefixSql)
}

package graft.sources

import graft.Engine
import graft.operators.Relational.{dec, sqlDec}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate (materialized summary table) over
  * an append-only feed — the HTAP companion to [[DeltaStore]]: the
  * reference keeps scan-time pack aggregates fresh as the insert buffer
  * merges (core/engine.h:210 background merge updating DPNs,
  * core/dpn.h:49-72); a lakehouse deployment keeps the same shape as a
  * summary table refreshed per ingest batch, because re-aggregating
  * 100 TB to update a dashboard per batch is the thing that cannot ship.
  *
  * Maintenance algebra: COUNT/SUM/MIN/MAX are decomposable, so a refresh
  * aggregates ONLY the new batch (partial agg, map-side combined) and
  * merges it with the stored |groups|-row snapshot — the base is never
  * rescanned, and the per-batch cost is O(batch + |groups|). AVG derives
  * as SUM/COUNT at read. SUMs live in the snapshot as ×10⁴ fixed-point
  * LONGs, which buys two properties at once: merge order cannot produce
  * float drift (incremental ≡ full recompute, bit-exact — the gate
  * proves it against DuckDB's one-shot GROUP BY), and repeated refreshes
  * never accumulate rounding error. MIN/MAX are append-only-maintainable;
  * deletes would demand either a full refresh or per-group recount
  * (the standard summary-table limitation — documented, not hidden).
  * Non-decomposable aggregates (COUNT DISTINCT, MEDIAN) are out of the
  * view's contract; mergeable sketches (HLL) are the scale answer and
  * live in the approx-agg tier.
  *
  * Snapshot updates use the [[DeltaStore]] staged-rewrite discipline
  * (write staging → move old aside → promote → drop), so a crash leaves
  * either the previous snapshot or a recoverable copy, never a torn one.
  */
class MaterializedAgg(spark: SparkSession, root: String,
                      keys: Seq[String], vals: Seq[String]) {

  private val snapPath = s"$root/snapshot"

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Partial aggregate of one frame into snapshot schema. */
  private def partial(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: vals.flatMap(v => Seq(
      sum(dec(col(v))).as(s"__sum6_$v"),
      min(col(v)).as(s"min_$v"),
      max(col(v)).as(s"max_$v")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two snapshot-schema frames group-wise. */
  private def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +: vals.flatMap(v => Seq(
      sum(col(s"__sum6_$v")).as(s"__sum6_$v"),
      min(col(s"min_$v")).as(s"min_$v"),
      max(col(s"max_$v")).as(s"max_$v")))
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Staged snapshot replacement ([[DeltaStore]] rewrite discipline).
    * When `epochId` is set, the watermark file is created INSIDE the
    * staging dir before the promote, so state and watermark publish in
    * the same atomic move. */
  private def rewrite(df: DataFrame, epochId: Option[Long] = None): Unit = {
    val staging = new Path(s"$root/_staging")
    val old = new Path(s"$root/_old")
    df.write.mode("overwrite").parquet(staging.toString)
    epochId.foreach { id =>
      val out = fs.create(new Path(staging, "_refresh_id"), true)
      try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    }
    fs.delete(old, true)
    if (fs.exists(new Path(snapPath))) fs.rename(new Path(snapPath), old)
    fs.rename(staging, new Path(snapPath))
    fs.delete(old, true)
  }

  /** Build the initial snapshot from the current base. */
  def init(df: DataFrame): Unit = rewrite(partial(df))

  /** Fold ONE new batch into the snapshot: aggregate the batch, merge
    * with the |groups|-row stored state. Never rescans the base. */
  def refresh(batch: DataFrame): Unit =
    rewrite(merge(spark.read.parquet(snapPath), partial(batch)))

  // --- exactly-once streaming maintenance ----------------------------------

  private def idPath = new Path(s"$snapPath/_refresh_id")

  /** Highest epoch folded into the snapshot (−1 = none). Travels INSIDE
    * the snapshot dir, so the staged-rewrite swap publishes state and
    * watermark in one atomic move — a crash between "state updated" and
    * "watermark updated" cannot exist. */
  def lastRefreshId(): Long = {
    val f = fs
    if (!f.exists(idPath)) -1L
    else {
      val in = f.open(idPath)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Idempotent refresh keyed on a monotonic epoch (Structured
    * Streaming's foreachBatch batchId): a replayed epoch ≤ the stored
    * watermark is a no-op, so restarts re-deliver batches without
    * double-counting — the MvccStore txid discipline applied to the
    * summary table. Returns true iff the batch was folded. */
  def refreshOnce(batch: DataFrame, epochId: Long): Boolean = {
    if (epochId <= lastRefreshId()) return false
    rewrite(merge(spark.read.parquet(snapPath), partial(batch)),
      epochId = Some(epochId))
    true
  }

  /** The maintained view: per-group count, exact fixed-point SUM and
    * derived AVG (the [[graft.operators.Relational.dsum]]/davg
    * convention), MIN/MAX. */
  def read(): DataFrame = {
    val snap = spark.read.parquet(snapPath)
    val derived = vals.flatMap { v =>
      val sumD = col(s"__sum6_$v").cast("double") / 10000.0
      Seq(sumD.as(s"sum_$v"), (sumD / col("n_rows")).as(s"avg_$v"),
        col(s"min_$v"), col(s"max_$v"))
    }
    snap.select(keys.map(col) ++ (col("n_rows") +: derived): _*)
  }
}

object MaterializedAgg {

  /** Gate: a per-status order summary maintained across an init plus two
    * refresh batches (orderkey mod 3 slices) must be indistinguishable
    * from DuckDB's one-shot GROUP BY over the whole table — proving
    * incremental maintenance is exact, not approximately right. */
  def qMviewIncremental(s: SparkSession, dir: String): DataFrame = {
    val o = Engine.table(s, dir, "orders")
    val root = java.nio.file.Files
      .createTempDirectory("graft_mview").toString
    val v = new MaterializedAgg(s, root,
      Seq("o_orderstatus"), Seq("o_totalprice"))
    v.init(o.where(pmod(col("o_orderkey"), lit(3)) === 0))
    v.refresh(o.where(pmod(col("o_orderkey"), lit(3)) === 1))
    v.refresh(o.where(pmod(col("o_orderkey"), lit(3)) === 2))
    v.read().orderBy(col("o_orderstatus"))
  }

  val qMviewIncrementalSql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
      |  CAST(SUM(${sqlDec("o_totalprice")}) AS DOUBLE) / 10000.0
      |    AS sum_o_totalprice,
      |  CAST(SUM(${sqlDec("o_totalprice")}) AS DOUBLE) / 10000.0 / COUNT(*)
      |    AS avg_o_totalprice,
      |  MIN(o_totalprice) AS min_o_totalprice,
      |  MAX(o_totalprice) AS max_o_totalprice
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mview_incremental" -> (qMviewIncremental _))

  val oracles: Map[String, String] = Map(
    "q_mview_incremental" -> qMviewIncrementalSql)
}

package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.UUID

import graft.Engine
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MVCC snapshot isolation for the lakehouse store (SURVEY.md §2.11 gap;
  * the reference versions packs with per-DPN transaction ids
  * `xmin`/`xmax` — storage/tianmu/data/dpn.h:56-57 — so readers see only
  * packs committed at or before their transaction and concurrent writers
  * never tear a scan).
  *
  * Spark-first, the same guarantee is a manifest log over immutable
  * parquet segments — the standard lakehouse commit protocol (Delta
  * Lake / Iceberg shape, re-derived here over plain files):
  *
  *  - `data/seg-*` dirs are immutable once written (a writer stages its
  *    segment fully before it is referenced anywhere);
  *  - `_log/v%08d.manifest` lists the exact segment set of version N —
  *    the batch analog of "xmin ≤ my_tx < xmax" pack visibility;
  *  - a commit PUBLISHES the next manifest atomically: readers see
  *    version N or N+1, never a partial state;
  *  - readers pin a manifest once and read only its segments, so a
  *    concurrent compaction/append cannot change or tear a running scan
  *    (old segments are retained until [[vacuum]]);
  *  - appends are blind inserts and commute: on a version collision the
  *    writer rebases onto the new head and retries. Rewrites
  *    (compact/truncate/overwrite) conflict with ANY interleaved commit
  *    and throw — first-committer-wins, the optimistic analog of the
  *    reference taking the table write lock for its background merge
  *    (core/engine.h:210).
  *
  * Atomicity of publish: on a local/POSIX filesystem the manifest is
  * hard-linked into place (`link(2)` fails with EEXIST if the version
  * was taken — atomic create-if-absent). On HDFS, `create(overwrite =
  * false)` gives the same single-winner guarantee. Object stores without
  * atomic create-if-absent (S3) need a coordinating log store, exactly
  * as Delta Lake documents — out of scope here.
  *
  * At 100 TB this is the only design that works: the log is O(versions)
  * tiny text files, a snapshot read is a plain multi-path parquet scan
  * (partition pruning and pushdown intact), and no commit ever rewrites
  * data another transaction is reading.
  */
/** @param autoCompactSegments when > 0, a successful append whose
  *   resulting manifest references at least this many segments triggers a
  *   best-effort [[autoCompact]] — the background-merge analog of the
  *   reference's insert-buffer thresholds (core/engine.h:210,
  *   `tianmu_sysvar_insert_*threshold`): N small commits fold into one
  *   compacted segment without writer involvement. 0 disables. */
class MvccStore(spark: SparkSession, val root: String,
                val autoCompactSegments: Int = 0) {

  private val logDir = s"$root/_log"
  private val dataDir = s"$root/data"

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(v: Long) =
    new Path(logDir, f"v$v%08d.manifest")

  /** Latest committed version, or 0 if the store is empty. */
  def currentVersion(): Long = {
    val dir = new Path(logDir)
    if (!fs.exists(dir)) return 0L
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
    if (vs.isEmpty) 0L else vs.max
  }

  /** Versions still present in the log (time-travel candidates). */
  def versions(): Seq[Long] = {
    val dir = new Path(logDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted.toSeq
  }

  private case class Manifest(action: String, txId: Option[String],
                              segs: Seq[String])

  private def readManifest(v: Long): Manifest = {
    val p = manifestPath(v)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"MvccStore: version $v does not exist (vacuumed or never " +
          s"committed); available: ${versions().mkString(",")}")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    Manifest(lines.head.stripPrefix("action="),
      lines.tail.find(_.startsWith("txid=")).map(_.stripPrefix("txid=")),
      lines.tail.filterNot(_.startsWith("txid=")))
  }

  /** Stage a new immutable segment; returns its log-relative name.
    * A segment whose commit ultimately LOSES (writer crash, retries
    * exhausted) stays on disk unreferenced — harmless to correctness
    * (nothing reads unreferenced segments) and reclaimable by an
    * age-guarded sweep of unreferenced `seg-*` dirs; [[vacuum]]
    * deliberately does not touch them, because an in-flight commit's
    * freshly staged segment is also unreferenced (the tombstone
    * problem every lakehouse GC carries). */
  private def stageSegment(df: DataFrame): String = {
    val seg = s"seg-${UUID.randomUUID().toString}"
    df.write.mode("overwrite").parquet(s"$dataDir/$seg")
    seg
  }

  /** Atomically publish `content` as version `v`. True iff this writer
    * won the version (create-if-absent semantics). */
  private def publish(v: Long, action: String, segs: Seq[String],
                      txId: Option[String] = None): Boolean = {
    fs.mkdirs(new Path(logDir))
    val content = (s"action=$action" +: txId.map(t => s"txid=$t").toSeq
      ++: segs).mkString("\n") + "\n"
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID().toString}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val dest = manifestPath(v)
    val won =
      if (dest.toUri.getScheme == null || dest.toUri.getScheme == "file") {
        // POSIX: hard-link = atomic create-if-absent (EEXIST on loss).
        try {
          Files.createLink(Paths.get(dest.toUri.getPath),
            Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: FileAlreadyExistsException => false }
      } else {
        // HDFS: create(overwrite=false) is the single-winner primitive.
        if (fs.exists(dest)) false
        else try {
          val o = fs.create(dest, false)
          try o.write(content.getBytes("UTF-8")) finally o.close()
          true
        } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
      }
    fs.delete(tmp, false)
    won
  }

  /** Initialize the store (version 1). Fails if already initialized. */
  def init(df: DataFrame): Long = {
    val seg = stageSegment(df)
    if (!publish(1L, "init", Seq(seg)))
      throw new java.util.ConcurrentModificationException(
        "MvccStore: store already initialized")
    1L
  }

  /** Transactional append (blind insert): stages the segment once, then
    * publishes against the current head, rebasing and retrying on a
    * version collision — appends commute, so the rebase is just
    * "parent segments ∪ mine". Returns the committed version. */
  def commitAppend(df: DataFrame, maxRetries: Int = 50): Long = {
    val seg = stageSegment(df)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion()
      val parentSegs =
        if (head == 0) Seq.empty[String] else readManifest(head).segs
      if (publish(head + 1, "append", parentSegs :+ seg)) {
        maybeAutoCompact(head + 1)
        return head + 1
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"MvccStore: append lost $maxRetries races; contention too high")
  }

  /** Fire the threshold-triggered background merge if configured. The
    * append's own version is what the caller sees; the compacted version
    * (if any) is just the next head — readers pinned to the append's or
    * any older version keep their exact segment set (MVCC guarantee). */
  private def maybeAutoCompact(justCommitted: Long): Unit =
    if (autoCompactSegments > 0 &&
        readManifest(justCommitted).segs.size >= autoCompactSegments) {
      autoCompact(): Unit
    }

  /** Best-effort compaction: folds the CURRENT head's segments into one
    * iff the head still has `autoCompactSegments`+ segments by the time
    * we stage. A lost race with an interleaved commit aborts silently
    * (None) — the next append re-triggers; correctness never depends on
    * a background merge landing (reference analog: the delayed-insert
    * merge thread, core/engine.h:210). */
  def autoCompact(): Option[Long] = {
    val head = currentVersion()
    if (head == 0) return None
    try Some(commitRewrite(read(Some(head)), head, "compact"))
    catch { case _: java.util.ConcurrentModificationException => None }
  }

  /** Idempotent transactional append — the exactly-once sink primitive:
    * a commit tagged `txId` that already exists in the log is a no-op
    * returning the original version, so a RETRIED write (a restarted
    * streaming micro-batch, a re-run job step) lands once. The txid
    * check re-runs after every lost race, closing the window where two
    * retries of the same transaction both think they are first. The
    * log scan is O(versions) — the same linear tail-scan a lakehouse
    * commit protocol does; [[vacuum]] bounds it. */
  def commitAppendOnce(df: DataFrame, txId: String,
                       maxRetries: Int = 50): Long = {
    require(!txId.exists(c => c == '\n' || c == '\r'),
      "MvccStore: txId must not contain line breaks (manifest format)")
    def existing(): Option[Long] =
      versions().find(v => readManifest(v).txId.contains(txId))
    existing() match {
      case Some(v) => return v
      case None =>
    }
    val seg = stageSegment(df)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion()
      val parentSegs =
        if (head == 0) Seq.empty[String] else readManifest(head).segs
      if (publish(head + 1, "append", parentSegs :+ seg, Some(txId))) {
        maybeAutoCompact(head + 1)
        return head + 1
      }
      existing() match { // a rival retry of the SAME tx may have won
        case Some(v) => fs.delete(new Path(s"$dataDir/$seg"), true); return v
        case None =>
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"MvccStore: append($txId) lost $maxRetries races")
  }

  /** Transactional whole-table rewrite (compact/overwrite/truncate
    * share this): stages the replacement, then publishes IFF no other
    * commit landed since `readVersion` — first-committer-wins, because a
    * rewrite does NOT commute with interleaved appends (they would be
    * silently dropped). */
  private def commitRewrite(df: DataFrame, readVersion: Long,
                            action: String): Long = {
    val seg = stageSegment(df)
    if (!publish(readVersion + 1, action, Seq(seg)))
      throw new java.util.ConcurrentModificationException(
        s"MvccStore: $action read version $readVersion but another " +
          s"transaction committed ${currentVersion()}; retry on the new head")
    readVersion + 1
  }

  /** Fold all segments of the current head into one (background-merge
    * analog under MVCC: readers of older versions are untouched). */
  def compact(): Long = {
    val head = currentVersion()
    commitRewrite(read(Some(head)), head, "compact")
  }

  /** TRUNCATE under MVCC: schema kept, rows dropped, history intact. */
  def truncate(): Long = {
    val head = currentVersion()
    commitRewrite(read(Some(head)).limit(0), head, "truncate")
  }

  /** Snapshot read. `version = None` pins the latest committed version
    * at CALL time — the returned frame keeps reading that snapshot even
    * if commits land while the query runs (pack-visibility analog).
    * Segments may carry EVOLVED schemas (see [[commitAppend]] callers
    * appending widened frames): `mergeSchema` unions them, so columns
    * added later read as NULL in older segments — the lakehouse form of
    * the reference's ALTER-add-column rewrite
    * (core/tianmu_table.h:73-75), without rewriting history. */
  /** Resolve a manifest segment entry: plain names live under this
    * store's `data/`; absolute/URI entries are EXTERNAL references (a
    * shallow clone pointing at its source's segments). */
  private def segPath(s: String): String =
    if (s.startsWith("/") || s.contains("://")) s else s"$dataDir/$s"

  def read(version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion())
    if (v == 0)
      throw new IllegalStateException("MvccStore: empty store (no commits)")
    spark.read.option("mergeSchema", "true")
      .parquet(readManifest(v).segs.map(segPath): _*)
  }

  /** Zero-copy SHALLOW CLONE (the Delta/Iceberg CLONE shape): the
    * target's v1 manifest references THIS store's immutable segments by
    * absolute path — no data moves, the clone costs one manifest write
    * at any table size. The clone then evolves independently (appends
    * land in its own `data/`; `compact()` localizes everything — clone
    * + compact = deep copy). Retention contract, same as Delta shallow
    * clones: the SOURCE's vacuum does not know about clones, so pin or
    * compact the clone before vacuuming the source past the cloned
    * version. The clone's own vacuum only ever deletes files under its
    * own `data/`, never external references. */
  def cloneTo(targetRoot: String,
              version: Option[Long] = None): MvccStore = {
    val v = version.getOrElse(currentVersion())
    val m = readManifest(v)
    val target = new MvccStore(spark, targetRoot, autoCompactSegments)
    if (!target.publish(1L, "clone", m.segs.map(segPath)))
      throw new java.util.ConcurrentModificationException(
        s"MvccStore: target '$targetRoot' is already initialized")
    target
  }

  /** Rows added between two snapshots. Append-only lineage (v2's
    * manifest contains every v1 segment) reads ONLY the added segments
    * — O(delta), no comparison of live rows; across a rewrite
    * (compact/overwrite) it falls back to the exact but expensive
    * `exceptAll` anti-diff. */
  def diff(v1: Long, v2: Long): DataFrame = {
    val s1 = readManifest(v1).segs.map(segPath).toSet
    val s2 = readManifest(v2).segs.map(segPath)
    if (s1.subsetOf(s2.toSet)) {
      val added = s2.filterNot(s1)
      if (added.isEmpty) read(Some(v2)).limit(0)
      else spark.read.option("mergeSchema", "true").parquet(added: _*)
    } else read(Some(v2)).exceptAll(read(Some(v1)))
  }

  /** DESCRIBE HISTORY analog: one row per retained version —
    * (version, action, txid, n_segments, commit_ts). The timestamp is
    * the manifest file's modification time (set at publish — the log
    * IS the clock, no separate metadata write). Driver-side
    * O(versions). */
  def history(): DataFrame = {
    import spark.implicits._
    versions().map { v =>
      val m = readManifest(v)
      val ts = new java.sql.Timestamp(
        fs.getFileStatus(manifestPath(v)).getModificationTime)
      (v, m.action, m.txId.orNull, m.segs.size.toLong, ts)
    }.toDF("version", "action", "txid", "n_segments", "commit_ts")
  }

  /** Drop segments (and manifests) only reachable from versions older
    * than the `retain` most recent — the GC that makes snapshot
    * retention bounded. `retainMillis` additionally KEEPS any version
    * younger than the age horizon (the `RETAIN n HOURS` convention:
    * age protects, it never forces a drop below `retain`). Readers
    * pinned to a retained version are safe; time travel past the
    * horizon throws (see [[readManifest]]). */
  def vacuum(retain: Int = 2, retainMillis: Long = 0L): Unit = {
    val vs = versions()
    if (vs.size <= retain) return
    val (dropByCount, keepByCount) = vs.splitAt(vs.size - retain)
    val cutoff = System.currentTimeMillis() - retainMillis
    val (drop, keptYoung) =
      if (retainMillis <= 0L) (dropByCount, Seq.empty[Long])
      else dropByCount.partition(v =>
        fs.getFileStatus(manifestPath(v)).getModificationTime < cutoff)
    val keep = keptYoung ++ keepByCount
    val live = keep.flatMap(v => readManifest(v).segs).toSet
    val dataPath = new Path(dataDir)
    if (fs.exists(dataPath))
      fs.listStatus(dataPath).map(_.getPath)
        .filter(p => p.getName.startsWith("seg-") && !live.contains(p.getName))
        .foreach(p => fs.delete(p, true))
    drop.foreach(v => fs.delete(manifestPath(v), false))
  }
}

/** Driver-gate read views for the MVCC tier. */
object MvccStore {

  /** Time travel + snapshot isolation, oracle-mirrored: orders arrive in
    * three version steps (init thirds 0, append thirds 1, append thirds
    * 2) with a compaction interleaved; the gate reads the v2 snapshot
    * (pinned BEFORE the later commits) beside the final head and
    * aggregates both by priority. The oracle reconstructs each snapshot
    * as a modulo filter — equality proves pinned reads see exactly their
    * version's rows, before and after compaction rewrote the head. */
  def qMvccTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val orders = Engine.table(s, dir, "orders")
    val tmp = Files.createTempDirectory("graft-mvcc-gate").toString
    val store = new MvccStore(s, tmp)
    store.init(orders.filter(col("o_orderkey") % 3 === 0))
    val v2 = store.commitAppend(orders.filter(col("o_orderkey") % 3 === 1))
    val pinned = store.read(Some(v2))
    store.compact()
    store.commitAppend(orders.filter(col("o_orderkey") % 3 === 2))
    val latest = store.read()
    def agg(df: DataFrame, tag: String) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("sum_key"))
        .withColumn("snap", lit(tag))
    agg(pinned, "v2").unionByName(agg(latest, "head"))
      .select("snap", "o_orderpriority", "n_orders", "sum_key")
  }

  val qMvccTimeTravelSql: String =
    """SELECT 'v2' AS snap, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      |FROM orders WHERE o_orderkey % 3 < 2 GROUP BY o_orderpriority
      |UNION ALL
      |SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mvcc_time_travel" -> (qMvccTimeTravel _))

  val oracles: Map[String, String] = Map(
    "q_mvcc_time_travel" -> qMvccTimeTravelSql)
}

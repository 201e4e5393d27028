package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException
import java.util.concurrent.{Executors, TimeUnit}

import graft.sources.MvccStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MvccSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  private def freshStore() =
    new MvccStore(spark,
      Files.createTempDirectory("graft_mvcc").toString)

  test("versioned commits + time travel read exact snapshots") {
    val store = freshStore()
    val n = Engine.table(spark, sf, "nation")
    store.init(n.filter(col("n_nationkey") < 10))
    val v2 = store.commitAppend(
      n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20))
    val v3 = store.commitAppend(n.filter(col("n_nationkey") >= 20))
    assert(store.versions() === Seq(1L, 2L, 3L))
    assert(store.read(Some(1)).count() === 10)
    assert(store.read(Some(v2)).count() === 20)
    assert(store.read(Some(v3)).orderBy("n_nationkey").collect().toSeq
      === n.orderBy("n_nationkey").collect().toSeq)
  }

  test("reader pinned before compaction is isolated from the rewrite") {
    val store = freshStore()
    val c = Engine.table(spark, sf, "customer")
    store.init(c.filter(col("c_custkey") % 2 === 0))
    val v2 = store.commitAppend(c.filter(col("c_custkey") % 2 === 1))
    val pinned = store.read(Some(v2)) // lazy plan over v2's segments
    val v3 = store.compact()
    store.commitAppend(c.limit(0)) // further history
    // The pinned frame still evaluates against v2's (retained) segments.
    assert(pinned.count() === c.count())
    assert(store.read(Some(v3)).count() === c.count())
    // Compaction folded segments but changed no rows (fixed-point sum —
    // double addition order differs across segment splits).
    def bal(df: org.apache.spark.sql.DataFrame) = df.groupBy()
      .agg(sum(col("c_acctbal").cast("decimal(18,2)"))).first().getDecimal(0)
    assert(bal(store.read()) === bal(c))
  }

  test("concurrent appends all land; every version remains readable") {
    val store = freshStore()
    val n = Engine.table(spark, sf, "nation").cache()
    store.init(n.filter(col("n_nationkey") === 0))
    val pool = Executors.newFixedThreadPool(4)
    val keys = (1 to 12)
    try {
      keys.foreach { k =>
        pool.submit(new Runnable {
          def run(): Unit =
            store.commitAppend(n.filter(col("n_nationkey") === k))
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    } finally if (!pool.isTerminated) pool.shutdownNow()
    // 1 init + 12 appends, no lost updates despite races on the head.
    assert(store.currentVersion() === 13L)
    assert(store.read().count() === 13L)
    assert(store.read().select("n_nationkey").distinct().count() === 13L)
    // Intermediate snapshots are monotone: version v holds v rows.
    store.versions().foreach(v => assert(store.read(Some(v)).count() === v))
  }

  test("rewrite loses the race to an interleaved commit and throws") {
    val store = freshStore()
    val n = Engine.table(spark, sf, "nation")
    store.init(n.filter(col("n_nationkey") < 5))
    store.commitAppend(n.filter(col("n_nationkey") === 5)) // head now 2
    // Race two compactions of the same head; at most one may win a
    // given version — the loser must throw, never silently drop rows.
    val pool = Executors.newFixedThreadPool(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    (1 to 2).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          try { store.compact(); results.add("ok") }
          catch { case _: ConcurrentModificationException => results.add("conflict") }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val outcomes = results.toArray.map(_.toString).sorted.toSeq
    // Either both serialized cleanly (ok,ok) or one hit the conflict —
    // never two silent winners at the same version.
    assert(outcomes.count(_ == "ok") >= 1)
    assert(store.read().count() === 6)
  }

  test("vacuum drops unreachable segments; old version reads fail loudly") {
    val store = freshStore()
    val n = Engine.table(spark, sf, "nation")
    store.init(n.filter(col("n_nationkey") < 10))
    store.commitAppend(n.filter(col("n_nationkey") >= 10))
    store.compact() // v3: one folded segment; v1/v2 segments now historical
    store.vacuum(retain = 1)
    assert(store.versions() === Seq(3L))
    assert(store.read().count() === n.count()) // head intact
    val ex = intercept[IllegalStateException] { store.read(Some(1)) }
    assert(ex.getMessage.contains("vacuumed"))
    // Segment GC actually removed files beyond the retained manifest's.
    val dataDir = new java.io.File(s"${store.root}/data")
    assert(dataDir.listFiles().count(_.getName.startsWith("seg-")) === 1)
  }

  test("auto-compaction: N small appends fold into one segment; pinned " +
      "readers mid-compaction keep the old snapshot") {
    val store = new MvccStore(spark,
      Files.createTempDirectory("graft_mvcc_ac").toString,
      autoCompactSegments = 4)
    val n = Engine.table(spark, sf, "nation")
    store.init(n.filter(col("n_nationkey") === 0))
    // appends 2 and 3 stay under the threshold — no merge yet
    val v2 = store.commitAppend(n.filter(col("n_nationkey") === 1))
    store.commitAppend(n.filter(col("n_nationkey") === 2))
    val pinned = store.read(Some(v2)) // lazy plan over v2's 2 segments
    assert(store.history().filter(col("action") === "compact").count() === 0)
    // 4th segment crosses the threshold: the append itself triggers the
    // background merge, so the head becomes a single folded segment
    val v4 = store.commitAppend(n.filter(col("n_nationkey") === 3))
    val hist = store.history().collect()
      .map(r => r.getAs[Long]("version") ->
        (r.getAs[String]("action"), r.getAs[Long]("n_segments"))).toMap
    assert(hist(v4) === ("append", 4L), "append's own version keeps its segments")
    assert(hist(v4 + 1) === ("compact", 1L), "auto-compact landed as next head")
    assert(store.read().count() === 4)
    // the reader pinned before the merge still sees exactly v2's rows
    assert(pinned.select("n_nationkey").collect().map(_.getInt(0)).sorted
      === Array(0, 1))
    // appends after the merge restart the small-segment count
    store.commitAppend(n.filter(col("n_nationkey") === 4))
    assert(store.read().count() === 5)
    assert(store.history().orderBy(col("version").desc).first()
      .getAs[Long]("n_segments") === 2L)
  }

  test("idempotent commits: a retried txid lands exactly once") {
    val store = freshStore()
    val n = Engine.table(spark, sf, "nation")
    store.init(n.filter(col("n_nationkey") < 10))
    val batch = n.filter(col("n_nationkey") >= 10)
    val v1 = store.commitAppendOnce(batch, "job-42/batch-0")
    val v2 = store.commitAppendOnce(batch, "job-42/batch-0") // retry
    assert(v1 === v2)
    assert(store.currentVersion() === v1)
    assert(store.read().count() === n.count()) // no duplicate rows
    // a different txid is a genuine new commit
    val v3 = store.commitAppendOnce(batch.limit(1), "job-42/batch-1")
    assert(v3 === v1 + 1)
  }

  test("streaming exactly-once: replaying the whole stream adds nothing") {
    import graft.streaming.EventStream
    val store = freshStore()
    store.init(Engine.table(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").limit(0))
    val src = EventStream.readDocuments(spark, sf)
      .select("doc_id", "lang", "n_chars")
    def runOnce(): Unit = {
      val q = EventStream.ingestToMvcc(src, store, "docs-ingest")
      q.awaitTermination()
    }
    runOnce()
    val after1 = store.read().count()
    val v1 = store.currentVersion()
    assert(after1 === Engine.table(spark, sf, "documents").count())
    // no checkpoint → the rerun replays identical batchIds; the
    // txid-keyed commits must all no-op
    runOnce()
    assert(store.read().count() === after1)
    assert(store.currentVersion() === v1)
  }

  test("schema evolution: widened appends merge; history describes the log") {
    val store = freshStore()
    val r = Engine.table(spark, sf, "region")
    store.init(r)
    // append a frame with an added column — old segments read it as NULL
    store.commitAppendOnce(
      r.withColumn("r_score", col("r_regionkey") * 10), "widen-1")
    val latest = store.read()
    assert(latest.columns.contains("r_score"))
    assert(latest.count() === r.count() * 2)
    assert(latest.filter(col("r_score").isNull).count() === r.count())
    assert(latest.filter(col("r_score").isNotNull).count() === r.count())
    // history() describes the log: versions, actions, txids, timestamps
    val h = store.history().orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(h.map(_.getString(1)).toSeq === Seq("init", "append"))
    assert(h(1).getString(2) === "widen-1")
    assert(h(1).getLong(3) === 2L) // two segments reachable at v2
    assert(!h(1).getTimestamp(4).before(h(0).getTimestamp(4)))
    // age-based retention: everything is younger than an hour, so a
    // time-protected vacuum drops nothing even with retain = 1
    store.vacuum(retain = 1, retainMillis = 3600 * 1000L)
    assert(store.versions() === Seq(1L, 2L))
    // without age protection the count horizon applies
    store.vacuum(retain = 1)
    assert(store.versions() === Seq(2L))
  }

  test("snapshot reads keep parquet pushdown and column pruning") {
    val store = freshStore()
    val c = Engine.table(spark, sf, "customer")
    store.init(c.filter(col("c_custkey") % 2 === 0))
    store.commitAppend(c.filter(col("c_custkey") % 2 === 1))
    val q = store.read()
      .filter(col("c_custkey") === 42L)
      .select("c_custkey", "c_acctbal")
    val plan = q.queryExecution.executedPlan.toString
    // the manifest read is a plain multi-path parquet scan: the filter
    // reaches the scan and the schema is pruned to the 2 columns
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)"),
      s"pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.contains("c_mktsegment"), "column pruning missing")
    assert(q.count() === c.filter(col("c_custkey") === 42L).count())
  }

  test("shallow clone: zero-copy snapshot, independent evolution, " +
      "compact localizes") {
    import org.apache.spark.sql.functions.col
    val src = freshStore()
    val n = Engine.table(spark, sf, "nation")
    src.init(n.filter(col("n_nationkey") < 10))
    val v1 = src.currentVersion()
    src.commitAppend(n.filter(col("n_nationkey") >= 10))
    // clone the OLD version; it must see exactly that snapshot
    val cloneRoot = Files.createTempDirectory("graft_mvcc_clone").toString
    val clone = src.cloneTo(cloneRoot, Some(v1))
    assert(clone.read().count() === src.read(Some(v1)).count())
    // zero-copy: the clone's data dir holds no segments yet
    val cloneData = new java.io.File(s"$cloneRoot/data")
    assert(!cloneData.exists() || cloneData.listFiles().isEmpty)
    // independent evolution: clone appends do not touch the source
    val srcHead = src.currentVersion()
    clone.commitAppend(n.filter(col("n_nationkey") >= 20))
    assert(src.currentVersion() === srcHead)
    // compact localizes every row into the clone's own segments: the
    // head manifest now references only local (relative) names
    clone.compact()
    val head = f"v${clone.currentVersion()}%08d.manifest"
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$cloneRoot/_log/$head")), "UTF-8")
    val segs = manifest.split("\n").filter(_.startsWith("seg-")).toSeq ++
      manifest.split("\n").filter(_.startsWith("/")).toSeq
    assert(segs.nonEmpty && segs.forall(_.startsWith("seg-")),
      s"compact left external references: $manifest")
    // cloned snapshot (nations < 10) + the clone's own append (>= 20)
    assert(clone.read().count() ===
      n.filter(col("n_nationkey") < 10).count()
        + n.filter(col("n_nationkey") >= 20).count())
  }

  test("diff: append lineage reads only added segments; rewrite falls " +
      "back to the exact anti-diff") {
    import org.apache.spark.sql.functions.col
    val store = freshStore()
    val r = Engine.table(spark, sf, "region")
    store.init(r.filter(col("r_regionkey") < 2))
    val v1 = store.currentVersion()
    val v2 = store.commitAppend(r.filter(col("r_regionkey") >= 2))
    val added = store.diff(v1, v2)
    val want = r.filter(col("r_regionkey") >= 2).count()
    assert(added.count() === want)
    assert(store.diff(v1, v1).count() === 0)
    // compaction rewrites the head: diff across it must still be exact
    val v3 = store.compact()
    assert(store.diff(v1, v3).count() === want)
    assert(store.diff(v2, v3).count() === 0) // same rows, new layout
  }

  test("truncate keeps schema, drops rows, preserves history") {
    val store = freshStore()
    val r = Engine.table(spark, sf, "region")
    store.init(r)
    val v2 = store.truncate()
    assert(store.read(Some(v2)).count() === 0)
    assert(store.read(Some(v2)).schema === r.schema)
    assert(store.read(Some(1)).count() === r.count()) // history intact
  }
}

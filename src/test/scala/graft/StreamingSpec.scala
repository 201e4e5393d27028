package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  test("streaming hourly counts agree with the batch twin") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def inst(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp => t.toInstant
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
    }
    val streamed = spark.table("hourly").collect()
      .map(r => (inst(r.get(0)), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed.nonEmpty, "append-mode stream emitted no finalized windows")
    val batch = operators.Events.qEventsHourly(spark, sf).collect()
      .map(r => (inst(r.getAs[Any]("bucket")),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n_events"))
      .toMap
    // Every finalized streaming window must equal the batch value.
    streamed.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"window $k: stream=$n batch=${batch.get(k)}")
    }
  }

  test("stateful sessionize matches the batch lag-based session count") {
    val ss = spark
    import ss.implicits._
    val events = Engine.table(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(events).collect()
    val perUser = sessions.groupBy(_.user_id).view.mapValues(_.length).toMap
    val expected = operators.Events.qEventsSessions(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions").toInt)
      .toMap
    assert(perUser === expected)
    // sessions are internally consistent
    sessions.foreach { s =>
      assert(!s.session_end.before(s.session_start) && s.n_events > 0)
    }
  }

  test("native session_window twin produces the same sessions as the " +
      "custom state machine") {
    val ss = spark
    import ss.implicits._
    val raw = Engine.table(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val custom = EventStream.sessionize(raw.as[EventStream.Event]).collect()
      .map(s => (s.user_id, s.session_start.getTime, s.n_events)).sorted
    val native = EventStream.sessionizeNative(raw).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[Long]("n_events").toInt)).sorted
    assert(custom.length === native.length,
      s"custom ${custom.length} vs native ${native.length} sessions")
    assert(custom.toSeq === native.toSeq)
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    // Duplicate the stream source rows by unioning the dir with itself:
    // read the same events twice in one micro-batch run.
    val once = EventStream.readEvents(spark, sf)
    val q = EventStream.dedupEvents(once)
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_total")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_total").head().getLong(0)
    val distinctIds = Engine.table(spark, sf, "events")
      .select("event_id").distinct().count()
    assert(streamed === distinctIds)
  }

  test("sliding windows: each event lands in 4 overlapping buckets") {
    val q = EventStream.slidingCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = spark.table("sliding")
      .agg(sum("n_events")).first().getLong(0)
    val nEvents = Engine.table(spark, sf, "events").count()
    // every finalized event is counted 4× (1h window / 15min slide);
    // allow the tail withheld by the watermark
    assert(total > 0 && total <= nEvents * 4)
  }

  test("streaming ingest lands in the delta store; compact folds to base") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val store = new graft.sources.DeltaStore(spark, tmp)
    val ev = Engine.table(spark, sf, "events")
    store.writeBase(ev.limit(0)) // empty base, schema fixed
    val q = EventStream.ingestToDeltaStore(
      EventStream.readEvents(spark, sf), store)
    q.awaitTermination(120000)
    val n = Engine.table(spark, sf, "events").count()
    assert(store.deltaCount() === n) // all rows staged in delta
    assert(store.read().count() === n) // visible before compaction
    store.compact()
    assert(store.deltaCount() === 0)
    assert(store.read().count() === n)
  }

  test("streaming summary maintenance: exactly-once, bit-equal to a " +
      "one-shot aggregate, replay is a no-op") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_mview").toString
    val ev = Engine.table(spark, sf, "events")
    val view = new graft.sources.MaterializedAgg(spark, tmp,
      Seq("event_type"), Seq("value"))
    view.init(ev.limit(0)) // empty snapshot, schema fixed
    val q = EventStream.maintainSummary(
      EventStream.readEvents(spark, sf), view)
    q.awaitTermination(120000)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Double]("sum_value"), r.getAs[Double]("min_value"),
        r.getAs[Double]("max_value"))).toMap
    val streamed = key(view.read().collect())
    // one-shot over the same rows, same fixed-point convention
    val batch = key(ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_rows"),
      (sum(graft.operators.Relational.dec(col("value"))).cast("double")
        / 10000.0).as("sum_value"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value")).collect())
    assert(streamed === batch)
    // replaying an already-folded epoch must not double-count
    val before = view.lastRefreshId()
    assert(before >= 0)
    assert(!view.refreshOnce(ev.limit(50), before))
    assert(key(view.read().collect()) === batch)
    // a NEW epoch still folds
    assert(view.refreshOnce(ev.limit(0), before + 1))
    assert(view.lastRefreshId() === before + 1)
  }

  test("stream-static enrichment matches the batch join, no shuffle added") {
    val dim = Engine.table(spark, sf, "customer")
    val q = EventStream.enrich(EventStream.readEvents(spark, sf), dim)
      .groupBy("segment").count()
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("enriched").collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(1)).toMap
    val batch = Engine.table(spark, sf, "events")
      .join(broadcast(dim.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))), Seq("user_id"), "left")
      .groupBy("segment").count().collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("stream-stream click->purchase join matches the batch twin") {
    val q = EventStream.clickToPurchase(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("c2p")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("c2p")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty, "expected click->purchase pairs in testdata")
    val ev = Engine.table(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // append-mode emits only pairs finalized under the watermark; every
    // emitted pair must be a true batch pair, and coverage must be
    // substantial
    assert(streamed.subsetOf(batch))
    assert(streamed.size * 10 >= batch.size * 9,
      s"streamed ${streamed.size} of ${batch.size} batch pairs")
  }

  test("incremental ingest drops docs whose content the store already " +
      "has (stream-static anti join)") {
    val docs = Engine.table(spark, sf, "documents")
    val store = docs.where(col("doc_id") % 2 === 0)
    val stream = EventStream.readDocuments(spark, sf)
      .where(col("doc_id") % 2 =!= 0)
    val q = EventStream.ingestNewDocs(stream, store)
      .writeStream.format("memory").queryName("new_docs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("new_docs").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // batch twin: the same anti join run as a plain batch query
    val expected = EventStream.ingestNewDocs(
      docs.where(col("doc_id") % 2 =!= 0), store)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected && got.nonEmpty)
    // and semantics: none of the survivors' fingerprints exist in store
    val storeFps = store.select(md5(lower(col("text")))).collect()
      .map(_.getString(0)).toSet
    val survivorFps = docs.where(col("doc_id").isin(got.map(Long.box): _*))
      .select(md5(lower(col("text")))).collect().map(_.getString(0)).toSet
    assert(survivorFps.intersect(storeFps).isEmpty)
  }

  test("streaming IVF index maintenance: new vectors land in the served " +
      "index, replays are no-ops, probes find them") {
    import org.apache.spark.sql.functions.lit
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf").toString
    val e = Engine.table(spark, sf, "embeddings")
    // offline build over HALF the corpus (buildKmeansQuantizer's layout,
    // private root)
    val base = e.filter(col("vec_id") % 2 === 0)
    val assigned = operators.Similarity.kmeansAssign(base).persist()
    assigned.write.partitionBy("cluster").parquet(s"$tmp/assign")
    operators.Similarity.centroids(
      assigned.drop("label").withColumnRenamed("cluster", "label"))
      .withColumnRenamed("label", "cluster")
      .coalesce(1).write.parquet(s"$tmp/centroids")
    assigned.unpersist()
    // stream the OTHER half in
    val q = EventStream.maintainIvfIndex(
      EventStream.readEmbeddings(spark, sf)
        .where(col("vec_id") % 2 =!= 0), tmp)
    q.awaitTermination(120000)
    val store = spark.read.parquet(s"$tmp/assign")
    assert(store.count() === e.count())
    assert(store.select("vec_id").distinct().count() === e.count())
    // a REPLAYED batch (content already present) must not double-insert
    val q2 = EventStream.maintainIvfIndex(
      EventStream.readEmbeddings(spark, sf)
        .where(col("vec_id") % 2 =!= 0), tmp)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$tmp/assign").count() === e.count())
    // a streamed-in vector is findable through the standard probe path
    val target = e.filter(col("vec_id") % 2 =!= 0)
      .orderBy("vec_id").limit(1)
    val targetId = target.collect()(0).getLong(0)
    val probe = target.select(lit(-1L).as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val k = spark.read.parquet(s"$tmp/centroids").count().toInt
    val hits = operators.Similarity.probeKmeansStore(spark, tmp, probe,
      nprobe = k, topk = store.count().toInt)
    assert(hits.filter(col("vec_id") === targetId).count() === 1)
  }

  test("streaming curation gate equals its batch twin and the " +
      "gopher/classifier gates' own verdicts") {
    val q = EventStream.curateDocs(EventStream.readDocuments(spark, sf))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("curated").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val docs = Engine.table(spark, sf, "documents")
    val batch = EventStream.curateDocs(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed === batch)
    // cross-check against the standalone gates: survivors = gopher-keep
    // intersect classifier-keep
    val gopherKeep = operators.TextOps.qGopherRules(spark, sf)
      .where(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val clsKeep = operators.TextOps.qTextClassifierScore(spark, sf)
      .where(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(streamed.toSet === gopherKeep.intersect(clsKeep))
    assert(streamed.nonEmpty)
  }

}

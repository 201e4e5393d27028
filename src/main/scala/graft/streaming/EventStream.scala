package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest over the `events` table (extension tier,
  * SURVEY.md §2.12 — the reference's delta store is ingest-only; this
  * adds the query-able stream the north star asks for).
  *
  * Design: every transform is `DataFrame => DataFrame` on an unbounded
  * source; at scale the file source is a bucket listing, state lives in
  * the state store keyed by (window × type) or user, and watermarks bound
  * state size — nothing here collects or loops on the driver.
  */
object EventStream {

  /** File-source stream over a testdata dir (events.parquet only),
    * normalized to a TIMESTAMP `ts`. The stream source needs an explicit
    * schema, so take it from the parquet footer (one driver-side metadata
    * read) — which also tells us whether `ts` arrives as long ns (the
    * TIMESTAMP(NANOS) encoding under `nanosAsLong`) needing the ns→µs
    * conversion, or as a native µs timestamp needing only a cast. Same
    * schema-conditional rule as Engine.table. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val base = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (fileSchema("ts").dataType == LongType)
      base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else base.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling 1-hour counts with a 2-hour watermark (late rows beyond the
    * watermark are dropped — the streaming twin of
    * operators.Events.qEventsHourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour-every-15-min window variant. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"))

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark horizon are dropped, and state for
    * ids older than the watermark is evicted
    * (`dropDuplicatesWithinWatermark`) — the streaming twin of
    * `operators.Dedup.qDedupExact`, and the only way exact dedup stays
    * O(horizon) instead of O(stream) in state at 100 TB/day. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the unbounded stream against a
    * dimension (customer) — the streaming face of the reference's map
    * join (optimizer/joiner_mapped.h:32). No broadcast hint: the
    * dimension grows with SF and a hint is honored unconditionally;
    * per-micro-batch planning broadcasts it by size when it fits and
    * falls back to a shuffled join when it doesn't. The static side is
    * re-resolvable per micro-batch, so a dimension refresh is picked up
    * without restarting the query. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      dim.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")),
      Seq("user_id"), "left")

  /** Stream-stream join with watermarks: purchases within 1 hour of a
    * click by the same user. Both sides are watermarked so the state
    * store evicts rows once they can no longer match (the time-bound in
    * the join condition is what makes state finite — unbounded
    * stream-stream joins are rejected by the planner). */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "3 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming ingest into the HTAP delta store — the full write path of
    * the reference in Spark form: `ha_tianmu::write_row` → RocksDB delta
    * → background merge (SURVEY.md §3.3) becomes stream → foreachBatch
    * append to `delta/` → `compact()` folds into base. Readers see
    * base ∪ delta mid-stream (DeltaIterator analog), so ingest never
    * blocks queries. Returns the started query; the caller owns
    * compaction cadence (the `tianmu_sysvar_insert_*threshold` analog). */
  def ingestToDeltaStore(events: DataFrame,
                         store: graft.sources.DeltaStore):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        store.append(batch.toDF())
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Exactly-once streaming ingest into the MVCC store: each micro-batch
    * commits under txid `streamId/batchId`, so a batch REPLAYED after a
    * failure (same batchId, the Structured Streaming retry contract) is
    * a no-op instead of a duplicate append — idempotent-sink
    * exactly-once, the same scheme Delta's streaming sink uses
    * (txnVersion/txnAppId). Snapshot readers never see a torn batch:
    * the commit is one atomic manifest publish. */
  def ingestToMvcc(events: DataFrame, store: graft.sources.MvccStore,
                   streamId: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        store.commitAppendOnce(batch.toDF(), s"$streamId/$id"): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Exactly-once streaming maintenance of a summary table: each
    * micro-batch folds into the [[graft.sources.MaterializedAgg]]
    * snapshot via `refreshOnce(batch, batchId)` — a replayed batch is a
    * no-op (the ingestToMvcc txid discipline), and because the view's
    * sums are fixed-point the streamed result is bit-identical to a
    * batch one-shot aggregate over the same rows. This is the live
    * dashboard shape at 100 TB: the stream pays O(batch) per epoch, the
    * readers pay O(|groups|) per query, and the base is never rescanned. */
  def maintainSummary(events: DataFrame,
                      view: graft.sources.MaterializedAgg):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        view.refreshOnce(batch.toDF(), id): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  // --- incremental corpus ingest -------------------------------------------

  /** File-source stream over a testdata dir (documents.parquet only).
    * Schema comes from the parquet footer (one driver-side metadata
    * read), not a hardcoded literal — the same don't-assume-the-writer
    * rule as [[readEvents]]: a regenerated testdata file with, say,
    * int32 ids must not silently misread. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Incremental corpus ingest: drop every incoming doc whose normalized
    * content fingerprint already exists in the historical store — the
    * "never re-ingest known documents" step of a continuously-fed
    * training corpus, as a stream-static LEFT ANTI join (supported
    * natively by Structured Streaming; the static side re-reads per
    * micro-batch, so a growing store is picked up between batches).
    * At 100 TB the store side is a 16-byte fingerprint column, bucketed
    * on fp in production so the per-batch anti join co-locates instead
    * of shuffling the batch. */
  def ingestNewDocs(incoming: DataFrame, store: DataFrame): DataFrame = {
    val fps = store.select(md5(lower(col("text"))).as("fp")).distinct()
    incoming
      .withColumn("fp", md5(lower(col("text"))))
      .join(fps, Seq("fp"), "left_anti")
      .drop("fp")
  }

  /** File-source stream over a testdata dir (embeddings.parquet only) —
    * the [[readDocuments]] convention for the vector table. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/embeddings.parquet").schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** Streaming maintenance of a k-means IVF serving index: each
    * micro-batch of (vec_id, label, embedding) rows is assigned to its
    * nearest STORED centroid and appended into the cluster-partitioned
    * assign table ([[graft.operators.Similarity.appendToKmeansStore]])
    * behind an id-keyed dedup — only vec_ids the store has not seen
    * append, so a batch REPLAYED after a failure is a no-op. A raw
    * parquet append has no transactional marker, so idempotence is
    * keyed on CONTENT ids (the [[ingestNewDocs]] discipline; the probe
    * is a key-column-only anti-join that prunes to the id column at
    * scan time). Centroids stay fixed between offline rebuilds — the
    * standard IVF regime: periodic re-train, streaming adds in between
    * (the reference's insert-buffer → background-merge shape,
    * core/engine.h:210, applied to index maintenance). */
  def maintainIvfIndex(vecs: DataFrame, root: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val existing = s.read.parquet(s"$root/assign").select(col("vec_id"))
        val fresh = batch.toDF().join(existing, Seq("vec_id"), "left_anti")
        graft.operators.Similarity.appendToKmeansStore(s, root, fresh)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming curation gate: the round-10 quality tier applied to a
    * document stream — keep a doc iff it passes the Gopher rule battery
    * AND the hashed linear classifier scores it positive. Both are pure
    * scan-side projections, so the streaming plan is a stateless
    * per-micro-batch filter (no state store, no watermark needed) — the
    * shape that lets one code path serve batch backfill and live ingest.
    * Emits (doc_id, n_words, score) for survivors. */
  def curateDocs(incoming: DataFrame): DataFrame = {
    import graft.operators.TextOps
    incoming
      .withColumn("__score", TextOps.scoreMicro("text"))
      .withColumn("__nw",
        (length(col("text"))
          - length(translate(col("text"), " ", "")) + 1).cast("long"))
      .where(col("__score") > 0L)
      .where(TextOps.gopherKeep(col("text")))
      .select(col("doc_id"), col("__nw").as("n_words"),
        (col("__score").cast("double") / 1000000.0).as("score"))
  }

  // --- stateful sessionization ---------------------------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(lastTs: Long, start: Long, n: Int)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Int)

  val GapMicros: Long = 30L * 60 * 1000000

  /** flatMapGroupsWithState sessionizer: 30-minute inactivity gap closes a
    * session (the stateful-custom-operator tier —
    * KeyValueGroupedDataset.flatMapGroupsWithState). Emits closed
    * sessions; the still-open session stays in state (and is emitted once
    * the group times out or, in batch runs, at end-of-group). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(sessionizeGroup)
  }

  /** Built-in sessionization twin: Spark's native `session_window`
    * aggregation (dynamic-gap session windows merged by the engine's
    * own session-merge exec) — the "compose existing ops" counterpart
    * of the custom [[sessionize]], preferable whenever only session
    * AGGREGATES are needed (the custom fMGWS path earns its keep when
    * per-event custom state logic is). StreamingSpec proves both
    * produce identical sessions on the same input, so the pair also
    * cross-validates the hand-rolled state machine against the
    * engine's. Works identically over batch and streaming frames.
    * Boundary fine print: the custom machine keeps an EXACTLY-gap-apart
    * pair in one session (`> gap` closes); `session_window` windows are
    * half-open `[ts, ts+gap)`, so an exactly-gap successor starts a new
    * session — equal on any input without exact-gap pairs (the spec's
    * corpus, and any real one at ms precision). */
  def sessionizeNative(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Pure group logic (shared by streaming + batch tests): sort the
    * batch's events, split on gaps, carry open-session state across
    * micro-batches. In a bounded run every session is emitted (final open
    * one included) because the source ends. */
  def sessionizeGroup(userId: Long, rows: Iterator[Event],
                      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = List.empty[Session]
    var st = state.getOption.getOrElse {
      val t0 = sorted.head.ts.getTime * 1000
      SessionState(t0 - 1, t0, 0)
    }
    sorted.foreach { e =>
      val t = e.ts.getTime * 1000
      if (st.n > 0 && t - st.lastTs > GapMicros) {
        out ::= Session(userId, new java.sql.Timestamp(st.start / 1000),
          new java.sql.Timestamp(st.lastTs / 1000), st.n)
        st = SessionState(t, t, 1)
      } else {
        st = SessionState(t, if (st.n == 0) t else st.start, st.n + 1)
      }
    }
    // Bounded-input convenience: emit the trailing open session too (a
    // production stream would keep it in state and use event-time timeout).
    out ::= Session(userId, new java.sql.Timestamp(st.start / 1000),
      new java.sql.Timestamp(st.lastTs / 1000), st.n)
    state.update(st)
    out.reverseIterator
  }
}

package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series operator the
  * reference's SQL dialect lacks and a telemetry/training pipeline needs
  * constantly: attach to every left row the latest right row with
  * `right.ts <= left.ts` for the same key.
  *
  * Spark-first design: NOT a range join. Both sides union into one
  * frame tagged by side, shuffle ONCE on the key, and a single
  * partition-local sorted window (`last(..., ignoreNulls)` over rows
  * unbounded-preceding..current) carries the right payload forward onto
  * each left row. At 100 TB that is one exchange + one sort — the same
  * cost as any keyed window — versus the quadratic per-key blowup of the
  * naive `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + argmax plan. Equal
  * timestamps match (right sorts before left at the same ts), mirroring
  * the inclusive ASOF convention.
  *
  * Key skew: the keyed window puts each key's full history in ONE task,
  * so a hot key (one device/user holding a large share of rows) degrades
  * LATENCY — never correctness (pinned by JoinPropertySpec's 50%-hot-key
  * fixture); AQE cannot split a window the way it splits skewed joins.
  * The remedy is implemented as [[asofJoinSalted]]: sub-partition every
  * key on `(key, floor(ts / W))`, run the window per salt bucket, then
  * fix up bucket boundaries with a carry-in from earlier buckets — W
  * chosen so one bucket's rows fit a task. Apply it when a key exceeds
  * task-sized row counts; the default single-window plan is correct and
  * cheaper everywhere else.
  */
object AsofJoin {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** For each row of `left`, the most recent `right` row with
    * `right.<tsCol> <= left.<tsCol>` sharing `keyCol` (or, with
    * `forward = true`, the EARLIEST right row at-or-after — the
    * symmetric "next event" lookup, same single-shuffle plan with the
    * sort reversed). Output: all `left` columns plus `right`'s
    * `payloadCols` (null when no matching right row exists).
    *
    * Requires (keyCol, tsCol) unique within `right` for deterministic
    * output (ties inside `right` would make "the" latest row ambiguous
    * in any engine).
    *
    * Name contract (fails fast, never silently collides): the internal
    * scratch columns `__ts/__side/__payload/__row/__matched` must not
    * appear in either input, and the output's `r_<payload>` names must
    * not collide with a `left` column. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val reserved = Seq("__ts", "__side", "__payload", "__row", "__matched")
    val clash = reserved.filter((leftCols ++ right.columns).toSet)
    require(clash.isEmpty,
      s"asofJoin: input columns ${clash.mkString(", ")} collide with " +
        "internal scratch names — rename them before joining")
    val outClash = payloadCols.map("r_" + _).toSet.intersect(leftCols.toSet)
    require(outClash.isEmpty,
      s"asofJoin: output columns ${outClash.mkString(", ")} (r_ + payload " +
        "name) collide with left columns — rename or drop them first")
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    // NULL key or ts on the right can never satisfy the (three-valued)
    // `r.key = l.key AND r.ts <= l.ts` contract — drop those rows so the
    // window's groupBy-style NULL partitioning can't fabricate matches
    val r = right
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol).as("__ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__payload"),
        lit(null).cast(StructType(left.schema.fields)).as("__row"))
    val l = left.select(col(keyCol), col(tsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__row"))
    // at equal ts the right row sorts first in either direction, so the
    // match is inclusive both ways; NULL-ts left rows sort FIRST in both
    // directions (before any right row) so they match nothing
    val w = Window.partitionBy(col(keyCol))
      .orderBy(
        if (forward) col("__ts").desc_nulls_first
        else col("__ts").asc_nulls_first,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true)
        .over(w))
      .where(col("__side") === 1)
    val outLeft = leftCols.map(c => col(s"__row.$c").as(c))
    val outRight = payloadCols.map(c => col(s"__matched.$c").as(s"r_$c"))
    carried.select(outLeft ++ outRight: _*)
  }

  /** Skew-hardened as-of join — the salt-by-time-range remedy the
    * [[asofJoin]] scaladoc names, as a real operator: sub-partition every
    * key by `floor(ts / bucketWidth)` so a hot key's history spreads
    * across T/W window partitions instead of one task, then fix up
    * bucket boundaries with a carry-in (the latest right row from any
    * EARLIER bucket, null when none exists).
    *
    * Plan: the big union shuffles ONCE on (key, bucket); the per-bucket
    * window is task-sized by construction. The carry table is one row
    * per (key, bucket-with-right-rows) — built by a map-side-combined
    * `max_by` agg and resolved with a second window over that BOUNDED
    * summary frame, then joined back on the same (key, bucket) key. At
    * 100 TB the carry side is ~|keys|·|buckets| rows (metadata-sized),
    * so the fix-up costs nothing against the corpus-sized main window.
    *
    * Contract: value-identical to `asofJoin` for every input (pinned by
    * JoinPropertySpec's randomized equivalence and the hash-exact
    * `q_asof_join_salted` oracle gate). `tsCol` must be integral (for
    * timestamps, pass `unix_micros` — a long cast on a timestamp column
    * would silently truncate to seconds); `forward = true` is the same
    * machinery on negated timestamps. Choose `bucketWidth` so one
    * bucket's rows fit a task; every key pays one extra tiny join, so
    * prefer plain [[asofJoin]] unless a key exceeds task-sized counts. */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, payloadCols: Seq[String],
                     bucketWidth: Long,
                     forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructType}
    require(bucketWidth > 0, "asofJoinSalted: bucketWidth must be positive")
    require(Seq(left, right).forall(df =>
      Seq(org.apache.spark.sql.types.IntegerType, LongType,
        org.apache.spark.sql.types.ShortType)
        .contains(df.schema(tsCol).dataType)),
      s"asofJoinSalted: $tsCol must be integral on both sides " +
        "(pass unix_micros for timestamps)")
    val leftCols = left.columns.toSeq
    val outClash = payloadCols.map("r_" + _).toSet.intersect(leftCols.toSet)
    require(outClash.isEmpty,
      s"asofJoinSalted: output columns ${outClash.mkString(", ")} collide " +
        "with left columns — rename or drop them first")
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val sign = if (forward) -1L else 1L
    def ts(c: Column): Column = c.cast(LongType) * sign
    // floor division (pmod is nonnegative, so this is exact for
    // negative timestamps too — truncating division is NOT)
    def bucketOf(c: Column): Column = {
      val v = ts(c)
      ((v - pmod(v, lit(bucketWidth))) / bucketWidth).cast(LongType)
    }
    val r = right.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), ts(col(tsCol)).as("__ts"),
        bucketOf(col(tsCol)).as("__bucket"), lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__payload"),
        lit(null).cast(StructType(left.schema.fields)).as("__row"))
    val l = left.select(col(keyCol).as("__k"), ts(col(tsCol)).as("__ts"),
      bucketOf(col(tsCol)).as("__bucket"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__row"))
    // within-bucket as-of: same inclusive window as asofJoin, but
    // partitioned on (key, bucket) — NULL left key/ts rows land in
    // right-free partitions and match nothing, as in the plain operator
    val w = Window.partitionBy(col("__k"), col("__bucket"))
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = r.unionByName(l)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true)
        .over(w))
      .where(col("__side") === 1)
    // carry-in: per (key, bucket) latest right payload, resolved to
    // "latest over any STRICTLY EARLIER bucket" by probing bucket-1 with
    // the same union-window trick — all on the bounded summary frame
    val summary = r.groupBy(col("__k"), col("__bucket"))
      .agg(max_by(col("__payload"), col("__ts")).as("__last"))
    // probing off inBucket does NOT recompute the big window: the probe
    // branch references only (__k, __bucket), so ColumnPruning drops the
    // window operator there and the distinct reads the union's REUSED
    // exchange — measured faster than re-deriving the probe set from the
    // left input (which pays a fresh scan + shuffle).
    val probes = inBucket.select(col("__k"), col("__bucket")).distinct()
    val su = summary.select(col("__k"), col("__bucket").as("__b2"),
      lit(0).as("__s2"), col("__last"),
      lit(null).cast(LongType).as("__origb"))
    val lu = probes.select(col("__k"), (col("__bucket") - 1).as("__b2"),
      lit(1).as("__s2"), lit(null).cast(payloadType).as("__last"),
      col("__bucket").as("__origb"))
    val cw = Window.partitionBy(col("__k"))
      .orderBy(col("__b2").asc_nulls_first, col("__s2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = su.unionByName(lu)
      .withColumn("__carry", last(col("__last"), ignoreNulls = true)
        .over(cw))
      .where(col("__s2") === 1)
      .select(col("__k").as("__ck"), col("__origb").as("__cb"),
        col("__carry"))
    val matchedCol = coalesce(col("__matched"), col("__carry"))
    val outLeft = leftCols.map(c => col(s"__row.$c").as(c))
    val outRight = payloadCols.map(c => matchedCol.getField(c).as(s"r_$c"))
    inBucket.join(carry, col("__k") <=> col("__ck")
        && col("__bucket") <=> col("__cb"), "left")
      .select(outLeft ++ outRight: _*)
  }

  /** Gate: every purchase event joined as-of to the user's latest
    * click at-or-before it; output includes the think-time in
    * microseconds (exact long arithmetic). (user_id, ts) is unique in
    * the events table, so the match is well-defined. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    asofJoin(purchases, clicks, "user_id", "ts",
      Seq("event_id", "value", "ts"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("r_event_id").as("click_id"),
        col("r_value").as("click_value"),
        (unix_micros(col("ts").cast("timestamp"))
          - unix_micros(col("r_ts").cast("timestamp"))).as("wait_us"))
      .orderBy(col("event_id"))
  }

  /** Oracle: DuckDB's native ASOF JOIN (independent implementation of
    * the same inclusive most-recent-prior semantics). */
  val qAsofJoinSql: String =
    """SELECT p.event_id, p.user_id, p.value,
      |  c.event_id AS click_id, c.value AS click_value,
      |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))
      |    AS wait_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Gate: the SAME query as [[qAsofJoin]] through the skew-hardened
    * salted operator (1-hour buckets over microsecond timestamps) — the
    * oracle is the identical DuckDB ASOF JOIN, so the remedy is proven
    * value-identical to the plain join, hash-exact. */
  def qAsofJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    asofJoinSalted(purchases, clicks, "user_id", "ts_us",
      Seq("event_id", "value", "ts_us"), bucketWidth = 3600L * 1000000L)
      .select(col("event_id"), col("user_id"), col("value"),
        col("r_event_id").as("click_id"),
        col("r_value").as("click_value"),
        (col("ts_us") - col("r_ts_us")).as("wait_us"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_join_salted" -> (qAsofJoinSalted _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_asof_join_salted" -> qAsofJoinSql)
}

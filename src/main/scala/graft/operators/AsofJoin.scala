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
  * The remedy at scale is salting by time range: sub-partition the hot
  * key on `(key, floor(ts / W))`, run the window per salt bucket, then
  * fix up each bucket's first rows against the previous bucket's last
  * right row — W chosen so one bucket's rows fit a task. Apply it when a
  * key exceeds task-sized row counts; the default single-window plan is
  * correct and cheaper everywhere else.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql)
}

package graft.sources

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch DML parity tier (SURVEY.md §2.11). The reference executes
  * row-level DML through its delta store and background merge
  * (handler/ha_tianmu.h:100-102 `write_row/update_row/delete_row`,
  * thread pools at core/engine.cpp:198-209); its MTR suite pins the SQL
  * semantics (`replace_into.test`, `insert_on_duplicate_update.test`,
  * `delete_join.test`, `update_join.test`).
  *
  * Spark-first, DML is a *transform*: compute the post-DML table as a
  * DataFrame (anti/semi/outer joins keyed on the primary key) and commit
  * it with an atomic overwrite ([[DeltaStore.writeBase]]) or let it feed
  * downstream lazily. At 100 TB every transform below is one key-partitioned
  * shuffle of the incoming batch against the base — the base is never
  * collected, never looped over, and with a bucketed base the shuffle
  * touches only the incoming side (row-level commit log upgrades would
  * graduate to a table format like Delta/Iceberg, out of scope per
  * SURVEY §2.11).
  */
object Dml {

  /** MySQL `REPLACE INTO` semantics (replace_into.test): delete any base
    * row sharing a key with the incoming batch, then insert the batch. */
  def replaceInto(base: DataFrame, incoming: DataFrame,
                  keys: Seq[String]): DataFrame =
    // the USING-join reorders key columns first — restore the base's
    // declared order (a REPLACE-rewritten store must keep positional
    // alignment for later statements; replace.test replaces twice)
    base.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .select(base.columns.map(col).toIndexedSeq: _*)
      .unionByName(incoming)

  /** MySQL `INSERT … ON DUPLICATE KEY UPDATE` semantics
    * (insert_on_duplicate_update.test): rows whose key exists get
    * `updateCols` overwritten from the incoming row (other columns keep
    * their base values); new keys are inserted whole. `incoming` must be
    * key-unique (as the MySQL statement requires of a keyed batch). */
  def upsert(base: DataFrame, incoming: DataFrame, keys: Seq[String],
             updateCols: Seq[String]): DataFrame = {
    val b = base.as("b")
    val i = incoming.as("i")
    val joinCond = keys.map(k => col(s"b.$k") === col(s"i.$k")).reduce(_ && _)
    val untouched =
      base.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .select(base.columns.map(col).toIndexedSeq: _*)
    val updated = b.join(i, joinCond)
      .select(base.columns.toIndexedSeq.map { c =>
        (if (updateCols.contains(c)) col(s"i.$c") else col(s"b.$c")).as(c)
      }: _*)
    val inserted =
      incoming.join(base.select(keys.map(col): _*), keys, "left_anti")
        .select(incoming.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(updated).unionByName(inserted)
  }

  /** PRIMARY-KEY uniqueness enforcement on append — the batch analog of
    * the reference's PK index rejecting duplicate inserts
    * (storage/tianmu/index/tianmu_table_index.cpp: InsertIndex returns
    * DupKey): appends `incoming` to `base` after verifying the keys are
    * unique WITHIN the batch and ABSENT from the base, throwing
    * IllegalStateException (with a bounded sample of offending keys)
    * otherwise. Plan: one map-side-combined count per incoming key plus
    * one left-semi probe into base — the probe is key-columns-only, so
    * at 100 TB it rides parquet column pruning and, bucketed on the key,
    * needs no base shuffle. NULL key components are rejected too (SQL
    * PKs are NOT NULL by definition). */
  def appendStrict(base: DataFrame, incoming: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val sampleN = 5
    val nullKeyed = incoming
      .filter(keys.map(col(_).isNull).reduce(_ || _))
    val nullSample = nullKeyed.limit(sampleN).collect()
    if (nullSample.nonEmpty)
      throw new IllegalStateException(
        s"appendStrict: NULL primary-key component in incoming batch, " +
          s"e.g. ${nullSample.mkString("; ")}")
    val dupInBatch = incoming.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1)
      .limit(sampleN).collect()
    if (dupInBatch.nonEmpty)
      throw new IllegalStateException(
        s"appendStrict: duplicate keys within the incoming batch: " +
          dupInBatch.mkString("; "))
    val clash = incoming.select(keys.map(col): _*)
      .join(base.select(keys.map(col): _*), keys, "left_semi")
      .limit(sampleN).collect()
    if (clash.nonEmpty)
      throw new IllegalStateException(
        s"appendStrict: keys already present in base: " +
          clash.mkString("; "))
    base.unionByName(incoming)
  }

  /** MySQL multi-table `DELETE t FROM t JOIN …` semantics
    * (delete_join.test): drop every base row with at least one match in
    * `matchSide` under `cond` — a left-anti join. */
  def deleteJoin(base: DataFrame, matchSide: DataFrame,
                 cond: Column): DataFrame =
    base.join(matchSide, cond, "left_anti")

  /** MySQL multi-table `UPDATE t JOIN u SET …` semantics
    * (update_join.test): rows with a match in `source` get the `set`
    * expressions applied (they may reference source columns); unmatched
    * rows pass through. `source` must be unique on the join key — MySQL
    * likewise applies one update per target row. */
  def updateJoin(base: DataFrame, source: DataFrame, cond: Column,
                 set: Map[String, Column]): DataFrame = {
    val src = source.withColumn("__matched", lit(true))
    base.join(src, cond, "left_outer")
      .select(base.columns.toIndexedSeq.map { c =>
        (if (set.contains(c)) when(col("__matched"), set(c)).otherwise(col(c))
         else col(c)).as(c)
      }: _*)
  }

  /** CTAS: materialize a query as a new parquet table (the reference's
    * `CREATE TABLE … AS SELECT`, core/engine_execute.cpp:477). */
  def ctas(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  // --- driver-gate read views (oracle-checked DML results) -----------------

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Engine.table(s, dir, n)

  /** REPLACE INTO customer: every 100th customer replaced with a bumped
    * balance and a 'REPLACED' segment; view = post-statement table. */
  def qDmlReplaceInto(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val batch = c.filter(col("c_custkey") % 100 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
      .withColumn("c_mktsegment", lit("REPLACED"))
    replaceInto(c, batch, Seq("c_custkey"))
  }

  val qDmlReplaceIntoSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey % 100 <> 0
      |UNION ALL
      |SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
      |  'REPLACED' AS c_mktsegment
      |FROM customer WHERE c_custkey % 100 = 0""".stripMargin

  /** INSERT … ON DUPLICATE KEY UPDATE: every 97th customer arrives twice —
    * once under its own key (→ balance update only) and once under a
    * shifted key (→ plain insert). */
  def qDmlUpsert(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val hit = c.filter(col("c_custkey") % 97 === 0)
    val updates = hit.withColumn("c_acctbal", col("c_acctbal") + 500.0)
      .withColumn("c_mktsegment", lit("IGNORED")) // not in updateCols
    val inserts = hit
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
      .withColumn("c_name", concat(lit("NEW_"), col("c_name")))
      .withColumn("c_acctbal", lit(0.0))
    upsert(c, updates.unionByName(inserts), Seq("c_custkey"),
      updateCols = Seq("c_acctbal"))
  }

  val qDmlUpsertSql: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |  CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 500.0 ELSE c_acctbal END
      |    AS c_acctbal,
      |  c_mktsegment
      |FROM customer
      |UNION ALL
      |SELECT c_custkey + 10000000 AS c_custkey, 'NEW_' || c_name AS c_name,
      |  c_nationkey, 0.0 AS c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey % 97 = 0""".stripMargin

  /** PK-enforced append accept path: key-shifted copies of every 101st
    * customer append cleanly (the reject paths throw and are pinned by
    * DmlSpec — a throwing gate has no oracle to mirror). */
  def qDmlAppendStrict(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val batch = c.filter(col("c_custkey") % 101 === 0)
      .withColumn("c_custkey", col("c_custkey") + 20000000L)
      .withColumn("c_mktsegment", lit("APPENDED"))
    appendStrict(c, batch, Seq("c_custkey"))
  }

  val qDmlAppendStrictSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer
      |UNION ALL
      |SELECT c_custkey + 20000000 AS c_custkey, c_name, c_nationkey,
      |  c_acctbal, 'APPENDED' AS c_mktsegment
      |FROM customer WHERE c_custkey % 101 = 0""".stripMargin

  /** DELETE customer FROM customer JOIN orders: drop customers holding an
    * urgent 1995 order. */
  def qDmlDeleteJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_custkey"))
    deleteJoin(c, urgent, col("c_custkey") === col("o_custkey"))
  }

  val qDmlDeleteJoinSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT'
      |                    AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin

  /** UPDATE customer JOIN nation/region: tag EUROPE customers' segment. */
  def qDmlUpdateJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val eu = t(s, dir, "nation")
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("n_nationkey"))
    updateJoin(c, eu, col("c_nationkey") === col("n_nationkey"),
      Map("c_mktsegment" -> concat(lit("EU_"), col("c_mktsegment"))))
  }

  val qDmlUpdateJoinSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |  CASE WHEN EXISTS (SELECT 1 FROM nation JOIN region
      |                      ON n_regionkey = r_regionkey
      |                    WHERE n_nationkey = c_nationkey
      |                      AND r_name = 'EUROPE')
      |       THEN 'EU_' || c_mktsegment ELSE c_mktsegment END AS c_mktsegment
      |FROM customer""".stripMargin

  /** AUTO_INCREMENT assignment for an incoming keyless batch
    * (auto_increment / init_auto_increment_value MTR tier): ids continue
    * from the base table's maximum, assigned in the deterministic order
    * of `orderBy` — equivalent to max(base) + row_number() but with NO
    * single-partition window (a global row_number serializes the whole
    * batch through one task; at a 100 TB backfill that is the driver of
    * the job, not a detail). Scheme: range-partition + sort on the order
    * keys, stamp a per-partition row index (monotonically_increasing_id
    * = pid·2^33 + index-within-partition, evaluated after the sort), and
    * add cumulative per-partition offsets. The partitioned frame is
    * parquet-staged once ([[Staging]]) so the count pass and the
    * assignment pass see the SAME partition-id/mid assignment
    * (repartitionByRange re-samples per execution — see PLANS.md) and
    * the frozen ids survive executor loss; the offset collect is bounded
    * by the partition count, the same order as Spark's own file
    * listing. */
  def autoIncrement(base: DataFrame, baseIdCol: String, incoming: DataFrame,
                    orderBy: Seq[String]): DataFrame = {
    val spark = incoming.sparkSession
    import spark.implicits._
    // empty base (first insert into a fresh table) starts at 1, the
    // MySQL AUTO_INCREMENT initial value
    val start = base.agg(
      coalesce(max(col(baseIdCol)), lit(0L)).as("max_id"))
    val ordered = Staging.stage(incoming
      .repartitionByRange(orderBy.map(col): _*)
      .sortWithinPartitions(orderBy.map(col): _*)
      .select(incoming.columns.map(col) :+
        spark_partition_id().cast("long").as("__pid") :+
        monotonically_increasing_id().as("__mid"): _*),
      "auto-increment")
    val counts = ordered.groupBy(col("__pid"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("__pid")).collect()
    var acc = 0L
    val offsets = counts.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq.toDF("__pid", "__off")
    ordered
      .join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(start))
      .withColumn(baseIdCol,
        col("max_id") + col("__off")
          + (col("__mid") - col("__pid") * lit(1L << 33)) + lit(1L))
      .drop("__pid", "__mid", "__off", "max_id")
  }

  /** Suppliers arrive as a keyless batch and get customer-table ids. */
  def qDmlAutoIncrement(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val incoming = t(s, dir, "supplier").select(col("s_name"), col("s_suppkey"))
    autoIncrement(c, "c_custkey", incoming, orderBy = Seq("s_suppkey"))
      .select(col("c_custkey").as("new_id"), col("s_name"))
  }

  val qDmlAutoIncrementSql: String =
    """SELECT (SELECT MAX(c_custkey) FROM customer)
      |  + ROW_NUMBER() OVER (ORDER BY s_suppkey) AS new_id, s_name
      |FROM supplier""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dml_replace_into" -> (qDmlReplaceInto _),
    "q_dml_upsert" -> (qDmlUpsert _),
    "q_dml_delete_join" -> (qDmlDeleteJoin _),
    "q_dml_update_join" -> (qDmlUpdateJoin _),
    "q_dml_auto_increment" -> (qDmlAutoIncrement _),
    "q_dml_append_strict" -> (qDmlAppendStrict _))

  val oracles: Map[String, String] = Map(
    "q_dml_replace_into" -> qDmlReplaceIntoSql,
    "q_dml_upsert" -> qDmlUpsertSql,
    "q_dml_delete_join" -> qDmlDeleteJoinSql,
    "q_dml_update_join" -> qDmlUpdateJoinSql,
    "q_dml_auto_increment" -> qDmlAutoIncrementSql,
    "q_dml_append_strict" -> qDmlAppendStrictSql)
}

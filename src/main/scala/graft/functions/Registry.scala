package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration: makes the engine's custom functions callable
  * from `spark.sql(...)` — the analog of the reference's function names
  * being part of its SQL dialect. Idempotent per session. */
object Registry {

  /** MySQL default `group_concat_max_len` (chars; MySQL counts bytes but
    * the dialect surface here is ASCII-safe). */
  val GroupConcatMaxLen = 1024

  def register(spark: SparkSession): Unit = {
    // Native Catalyst expression → plain SQL function.
    GraftSqlBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64(exprs.head))
    GraftSqlBridge.registerFunction(spark, "shingle_hash64",
      exprs => ShingleHash64(exprs.head, 5))
    // MySQL GROUP_CONCAT defaults: comma separator, sorted, and the
    // group_concat_max_len truncation contract — MySQL's default is
    // 1024 (the reference's published TPC-H config pins 512; callers
    // needing another limit use the Scala API's maxLen). An unlimited
    // default would silently diverge from every reference GROUP_CONCAT
    // on groups past the limit.
    spark.udf.register("group_concat",
      udaf(new GroupConcat(",", false, GroupConcatMaxLen)))
    spark.udf.register("group_concat_distinct",
      udaf(new GroupConcat(",", true, GroupConcatMaxLen)))
    // GROUP_CONCAT(value ORDER BY key [DESC]) from SQL: the ORDER BY
    // clause becomes the first argument (the sort key travels in the
    // buffer — t/group_concat.test shapes). asc/desc are separate names
    // because a UDAF signature cannot carry the modifier.
    spark.udf.register("group_concat_order_by",
      udaf(new GroupConcatOrdered(",", false, GroupConcatMaxLen)))
    spark.udf.register("group_concat_order_by_desc",
      udaf(new GroupConcatOrdered(",", true, GroupConcatMaxLen)))
    // Dedup kernels, wired to the Dedup pipeline's parameters so SQL
    // users compute the same signatures/verdicts as the operators.
    val params = graft.operators.Dedup.hashParams
    GraftSqlBridge.registerFunction(spark, "minhash_shingle_sig",
      exprs => MinHashShingleSig(exprs.head, 5,
        params.map(_._1).toArray, params.map(_._2).toArray))
    GraftSqlBridge.registerFunction(spark, "band_hashes64",
      exprs => LshOps.BandHashes64(exprs.head,
        graft.operators.Dedup.NumHashes / graft.operators.Dedup.BandSize,
        graft.operators.Dedup.BandSize))
    GraftSqlBridge.registerFunction(spark, "sig_agree",
      exprs => LshOps.SigAgree(exprs.head, exprs(1)))
    GraftSqlBridge.registerFunction(spark, "jaccard_long",
      exprs => LshOps.JaccardLong(exprs.head, exprs(1)))
  }
}

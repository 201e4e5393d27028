package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration: makes the engine's custom functions callable
  * from `spark.sql(...)` — the analog of the reference's function names
  * being part of its SQL dialect. Idempotent per session. */
object Registry {

  def register(spark: SparkSession): Unit = {
    // Native Catalyst expression → plain SQL function.
    GraftSqlBridge.registerFunction(spark, "simhash64",
      exprs => SimHash64(exprs.head))
    GraftSqlBridge.registerFunction(spark, "shingle_hash64",
      exprs => ShingleHash64(exprs.head, 5))
    // MySQL GROUP_CONCAT defaults (comma separator, sorted, no limit).
    spark.udf.register("group_concat", udaf(new GroupConcat(",", false, 0)))
    spark.udf.register("group_concat_distinct",
      udaf(new GroupConcat(",", true, 0)))
  }
}

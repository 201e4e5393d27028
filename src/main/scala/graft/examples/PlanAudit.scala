package graft.examples

import graft.{Engine, SparkEntry}

/** Dev tool: dump formatted physical plans for the headline queries so
  * the scan/broadcast/codegen shape can be audited (PLANS.md). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q06_forecast_revenue", "q05_local_supplier_volume",
        "q18_large_volume_customer", "q01_pricing_summary")
    val spark = Engine.session(appName = "plan-audit")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

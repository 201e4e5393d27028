package graft

/** Local plan-audit helper (not part of the library): print the
  * formatted physical plan of one or more SparkEntry queries.
  * `sbt "Test/runMain graft.ExplainTool q_span_dedup [sfDir]"` */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',')
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session("local[4]", 4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

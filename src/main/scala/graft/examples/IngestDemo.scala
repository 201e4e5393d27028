package graft.examples

import graft._
import graft.sources.{CsvLoader, DeltaStore}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end demo of the ingest surface: CSV load with reject routing
  * (LOAD DATA parity), the delta-store append/compact cycle (HTAP
  * analog), and a bounded streaming run of the hourly-window aggregate.
  * `runMain graft.examples.IngestDemo [sfDir]`. */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session(appName = "graft-ingest-demo")
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo").toString

    // 1. LOAD DATA parity: pipe-delimited with a reject row
    val nation = Engine.table(spark, sf, "nation")
    val lines = nation.select(concat_ws("|",
      col("n_nationkey"), col("n_name"), col("n_regionkey")))
      .collect().map(_.getString(0) + "|")
    val tbl = java.nio.file.Paths.get(tmp, "nation.tbl")
    java.nio.file.Files.write(tbl,
      (lines :+ "oops|BAD|z|").mkString("\n").getBytes)
    val res = CsvLoader.load(spark, tbl.toString, nation.schema,
      delimiter = "|", trailingDelimiter = true)
    println(s"[demo] csv: clean=${res.clean.count()} rejects=${res.rejects.count()}")
    CsvLoader.writePacked(res.clean, s"$tmp/nation_packed",
      bloomCols = Seq("n_nationkey"))

    // 2. delta store: append → merged view → compact
    val store = new DeltaStore(spark, s"$tmp/delta_store")
    store.writeBase(nation.filter(col("n_nationkey") < 20))
    store.append(nation.filter(col("n_nationkey") >= 20))
    println(s"[demo] delta: merged=${store.read().count()} pending=${store.deltaCount()}")
    store.compact()
    println(s"[demo] delta after compact: merged=${store.read().count()} pending=${store.deltaCount()}")

    // 3. bounded streaming window aggregate
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("demo_hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println(s"[demo] streaming windows emitted=${spark.table("demo_hourly").count()}")
    spark.table("demo_hourly").orderBy("bucket", "event_type").show(5, false)
    spark.stop()
  }
}

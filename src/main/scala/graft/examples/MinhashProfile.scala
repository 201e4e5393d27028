package graft.examples

import graft.Engine
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the MinHash-LSH dedup pipeline (dev tool,
  * not part of the driver contract). */
object MinhashProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "minhash-profile")
    val docs = Engine.table(spark, dir, "documents")

    // warm up session + documents read
    time("warmup read") { docs.count() }

    val sigs = Dedup.minhashSignatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures (persist+count)") { sigs.count() }
    time("signatures (cached)") { sigs.count() }
    val nBands = 8
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until nBands).map { b =>
        xxhash64((0 until 4).map(i => col("sig").getItem(b * 4 + i)): _*)
      }: _*)).as(Seq("band", "bhash")))
    val lb = bands.select(col("band"), col("bhash"), col("doc_id").as("doc_a"))
    val rb = bands.select(col("band"), col("bhash"), col("doc_id").as("doc_b"))
    val joined = lb.join(rb, Seq("band", "bhash"))
      .where(col("doc_a") < col("doc_b"))
    println(s"[profile] raw joined rows: ${time("raw band join") { joined.count() }}")
    val pairsOnly = joined.select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs dedup") { pairsOnly.count() }
    val cands = Dedup.lshCandidates(sigs)
    time("candidates w/ reattach") { cands.count() }
    time("full query (fresh)") {
      Dedup.qDedupMinhash(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}

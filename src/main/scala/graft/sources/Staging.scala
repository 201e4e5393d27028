package graft.sources

import org.apache.spark.sql.DataFrame

/** Reliable lineage cut: stage a frame to parquet and read it back.
  *
  * The hardened replacement for `localCheckpoint(eager = true)` at the
  * three driver-state sites (packing prefix sums, the BPE training
  * loop, auto-increment assignment). `localCheckpoint` pins the frame's
  * blocks in EXECUTOR block storage: lose an executor and the blocks
  * are gone — the job fails outright (checkpointed lineage is
  * truncated, there is nothing to recompute from). Worse for the
  * partition-id-keyed algorithms: even a from-scratch rerun of the
  * lineage is not equivalent, because `repartitionByRange` re-SAMPLES
  * its range boundaries per execution, so a recomputed frame could map
  * rows to different partition ids than the offset table collected from
  * the first materialization — a silent-corruption hazard, not just an
  * availability one.
  *
  * Parquet staging has neither failure mode: the files live on
  * (shared/lake) storage, survive any executor loss, and every re-read
  * observes the identical bytes — the same discipline the offline
  * artifact stores ([[ArtifactStore]]) already follow. Cost is one
  * write+read of the staged frame, which at these call sites is
  * metadata-sized relative to the corpus (per-doc token counts; the BPE
  * vocabulary). Staging dirs land in java.io.tmpdir here; a cluster
  * deployment points `spark.local.dir`-equivalent staging at the lake.
  */
object Staging {

  /** Write `df` to a fresh staging dir and return the re-read frame —
    * semantically `df` with lineage cut and contents frozen.
    *
    * `ordered = true` (the statement tier's INSERT…SELECT) preserves
    * the frame's logical ROW ORDER across the round-trip: Spark
    * re-reads a multi-file dir largest-file-first, which rotated a
    * staged 4-partition batch (insert_into_select.test read 3750
    * first). The order stamp is a monotonic id written with the data
    * and sorted out on the way back — a shuffle, so it stays off by
    * default for corpus-scale staging where order carries nothing. */
  /** [[stage]] with `ordered = true` — the statement tier's default
    * (every store write there rides the scan-order contract). */
  def stageOrdered(df: DataFrame, tag: String): DataFrame =
    stage(df, tag, ordered = true)

  def stage(df: DataFrame, tag: String,
            ordered: Boolean = false): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-stage-$tag").toString + "/data"
    if (ordered) {
      import org.apache.spark.sql.functions._
      df.withColumn("__stage_order", monotonically_increasing_id())
        .write.parquet(dir)
      df.sparkSession.read.parquet(dir)
        .orderBy(col("__stage_order")).drop("__stage_order")
    } else {
      df.write.parquet(dir)
      df.sparkSession.read.parquet(dir)
    }
  }
}

package graft.examples

import graft.{Engine, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (optimization rounds): per-query empirical profile — wall
  * time (cold + warm), job/stage/task counts and shuffle bytes from a
  * SparkListener — the guide §1 "empirical" loop without the UI.
  *
  * Usage: sbt "runMain graft.examples.BenchProfile [query ...]"
  * (defaults to the full Bench headline list; SPARK_GRAFT_SF_DIR picks
  * the data directory, default sf0.1 — the bench scale).
  */
object BenchProfile {

  private class Counter extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val inputBytes = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val i = s.stageInfo
      val wall = (for {a <- i.submissionTime; b <- i.completionTime}
        yield b - a).getOrElse(-1L)
      val m = i.taskMetrics
      stageLog.add(f"    stage ${i.stageId}%3d ${i.numTasks}%4dt " +
        f"wall=${wall}%5dms run=${m.executorRunTime}%6dms " +
        f"cpu=${m.executorCpuTime / 1000000}%6dms " +
        f"gc=${m.jvmGCTime}%5dms fetch=${m.shuffleReadMetrics.fetchWaitTime}%4dms " +
        f"deser=${m.executorDeserializeTime}%4dms " +
        i.name.takeWhile(_ != '\n').take(40))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0); shuffleWrite.set(0); inputBytes.set(0)
      stageLog.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    val spark = Engine.session(appName = "bench-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val c = new Counter
    spark.sparkContext.addSparkListener(c)

    // warmup (codegen/classloading)
    graft.Bench.runOne(spark, "q06_forecast_revenue", dir)

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    println("name,cold_s,med_s,min_s,jobs,stages,tasks,shuffle_read_mb,shuffle_write_mb,input_mb")
    names.foreach { n =>
      val cold = graft.Bench.runOne(spark, n, dir)
      // give listener queue a moment to drain, then count warm runs
      Thread.sleep(200)
      c.reset()
      val warms = (1 to reps).map(_ => graft.Bench.runOne(spark, n, dir))
      Thread.sleep(200)
      val med = warms.sorted.apply(reps / 2)
      if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES")) {
        // stage detail of the LAST warm rep only — APPROXIMATE slice
        // (r19 advice): AQE replanning, reused exchanges or listener
        // lag can vary per-rep stage counts, so the all.length/reps
        // split can misattribute a stage across reps; good enough for
        // the dev-loop eyeball this tool serves (not on any gated path)
        val all = c.stageLog.toArray(Array.empty[String])
        val per = all.length / reps
        all.drop(per * (reps - 1)).foreach(println)
      }
      c.stageLog.clear()
      println(f"$n,$cold%.3f,$med%.3f,${warms.min}%.3f," +
        f"${c.jobs.get / reps},${c.stages.get / reps}," +
        f"${c.tasks.get / reps},${c.shuffleRead.get / reps / 1e6}%.2f," +
        f"${c.shuffleWrite.get / reps / 1e6}%.2f,${c.inputBytes.get / reps / 1e6}%.2f")
    }
    spark.stop()
  }
}

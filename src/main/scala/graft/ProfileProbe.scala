package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Diagnostic main (not part of the library surface): per-JOB and
  * per-STAGE breakdown of arbitrary SparkEntry entries — the headless
  * stand-in for the Spark UI's stage table (guide §1.1/§7.1) on a box
  * with the UI disabled. For each entry it runs `count()` once after
  * an identical warmup and prints every job with its wall duration
  * and every stage with task count, executor-CPU sum, shuffle
  * read/write bytes and spill — the numbers that decide whether time
  * goes to shuffle, compute, or scheduling.
  *
  * Entries from args or SPARK_GRAFT_PROBE; corpus dir from
  * SPARK_GRAFT_SF_DIR; cores from SPARK_GRAFT_CPUS (default 32).
  */
object ProfileProbe {
  private final class Rec extends SparkListener {
    case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
      cpuMs: Long, shufReadMB: Double, shufWriteMB: Double,
      inputMB: Double, spillMB: Double, fetchWaitMs: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Seq[Int])]
    private val jobStart = mutable.Map.empty[Int, (Long, Seq[Int])]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = (e.time, e.stageIds)
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobStart.remove(e.jobId).foreach { case (t0, sids) =>
        jobs += ((e.jobId, e.time - t0, sids)) }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(0L)
      stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
        si.numTasks, wall, m.executorCpuTime / 1000000L,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.inputMetrics.bytesRead / 1048576.0,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0,
        m.shuffleReadMetrics.fetchWaitTime)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args.toSeq
      else sys.env.getOrElse("SPARK_GRAFT_PROBE", "q_pipeline_corpus")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "ERROR"))
    // same steady-state discipline as Bench: warm codegen at sf0.001
    val warmDir = "/root/testdata/sf0.001"
    for (name <- names; fn <- SparkEntry.queries.get(name))
      if (new java.io.File(warmDir).isDirectory)
        try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val rec = new Rec
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[prof] $name FAILED: ${e.getMessage}"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(rec)
      println(f"[prof] ===== $name: $wall%.2f s total ($n rows), ${rec.jobs.size} jobs =====")
      val stById = rec.stages.map(s => s.id -> s).toMap
      for ((jid, ms, sids) <- rec.jobs.sortBy(_._1) if ms >= 20) {
        println(f"[prof] job $jid%3d ${ms / 1000.0}%7.2f s")
        for (sid <- sids.sorted; s <- stById.get(sid)) {
          println(f"[prof]   stage $sid%4d ${s.wallMs / 1000.0}%7.2f s wall ${s.cpuMs / 1000.0}%8.2f s cpu " +
            f"${s.tasks}%4d tasks in=${s.inputMB}%8.1fMB sr=${s.shufReadMB}%8.1fMB sw=${s.shufWriteMB}%8.1fMB " +
            f"spill=${s.spillMB}%6.0fMB fw=${s.fetchWaitMs}%5d ms  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}

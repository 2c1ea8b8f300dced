package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM appender for [[ForkSpec]]: a genuinely separate PROCESS
  * firing batches into a shared IVF index root. The in-JVM fence
  * tests (TriggerSpec) use two trigger instances, which is faithful
  * to the on-disk protocol but cannot catch JVM-global state
  * accidentally doing the fencing — the seal heartbeat scheduler,
  * per-index monitors, in-process locks. Across a real fork, the only
  * thing the two sides share is the filesystem.
  */
object ForkedIvfAppender {

  /** Deterministic batch, shared by both JVMs (same shape as the
    * TriggerSpec fixtures) so the parent can rebuild the expected
    * relation without any channel to the child.
    */
  def batch(spark: SparkSession, off: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 25).map { i =>
      ((off + i).toLong, (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11
        * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("vec_id", "embedding")
  }

  val cents: Array[Seq[Float]] = Array(
    Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))

  /** args: indexPath, comma-separated batch offsets, ready-file path.
    * Touches the ready file after the FIRST append so the parent can
    * start racing publishes against a live appender, then fires the
    * rest with short gaps and exits 0.
    */
  def main(args: Array[String]): Unit = {
    val Array(idxPath, offsetsCsv, readyFile) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-forked-appender")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val trig = new graft.streaming.IvfIndexTrigger(spark, cents, idxPath)
      offsetsCsv.split(",").map(_.trim.toInt).zipWithIndex.foreach {
        case (off, i) =>
          trig.fire("V/1Sec/EMB", batch(spark, off))
          if (i == 0)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(readyFile), "ready")
          Thread.sleep(250)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}

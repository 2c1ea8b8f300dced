package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM appender for [[ForkSpec]]: a genuinely separate PROCESS
  * firing batches into a shared IVF index root. The in-JVM fence
  * tests (TriggerSpec) use two trigger instances, which is faithful
  * to the on-disk protocol but cannot catch JVM-global state
  * accidentally doing the fencing — the seal heartbeat scheduler,
  * per-index monitors, in-process locks. Across a real fork, the only
  * thing the two sides share is the filesystem.
  *
  * args: indexPath, comma-separated batch offsets, ready-file path.
  * Touches the ready file after the FIRST append so the parent can
  * start racing publishes against a live appender, then fires the
  * rest ([[IvfFixtures.batch]] rows, reconstructible by the parent)
  * with short gaps and exits 0.
  */
object ForkedIvfAppender {
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
      val trig = new graft.streaming.IvfIndexTrigger(
        spark, IvfFixtures.cents, idxPath)
      offsetsCsv.split(",").map(_.trim.toInt).zipWithIndex.foreach {
        case (off, i) =>
          trig.fire("V/1Sec/EMB", IvfFixtures.batch(spark, off))
          if (i == 0)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(readyFile), "ready")
          Thread.sleep(250)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared IVF protocol-test fixtures: one definition of the
  * deterministic batch/quantizer shape the fence tests (TriggerSpec),
  * the forked child JVM (ForkedIvfAppender) and the two-process smoke
  * test (ForkSpec) all build the same expected relation from, plus
  * the protocol-hygiene scan they all end on.
  */
object IvfFixtures {

  val cents: Array[Seq[Float]] = Array(
    Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f))

  /** 25 deterministic (vec_id, embedding) rows at `off` — identical
    * across JVMs, so a parent process can rebuild a child's batches
    * without any channel to it.
    */
  def batch(spark: SparkSession, off: Int): DataFrame = {
    import spark.implicits._
    (0 until 25).map { i =>
      ((off + i).toLong, (0 until 8).map(d => ((off + i) * 7 + d * 3) % 11
        * (if (d % 2 == 0) 1f else -1f)))
    }.toDF("vec_id", "embedding")
  }

  /** Dup-sensitive row view of an index relation (a Set would hide a
    * double-counted batch).
    */
  def rowsOf(df: DataFrame): Seq[(Int, Long)] =
    df.collect().map(r => (r.getAs[Int]("cell"), r.getAs[Long]("vec_id")))
      .sortBy(identity).toSeq

  /** Every seal or ticket file left anywhere under the index root —
    * must be empty after any quiesced interleaving.
    */
  def protocolLeftovers(spark: SparkSession, idxPath: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (Seq(idxPath) ++ fs.listStatus(new org.apache.hadoop.fs.Path(idxPath))
        .toSeq.filter(_.isDirectory).map(_.getPath.toString))
      .flatMap(d => fs.listStatus(new org.apache.hadoop.fs.Path(d)).toSeq
        .map(_.getPath.getName)
        .filter(n => n == graft.streaming.IvfIndexTrigger.SealFile ||
          n.startsWith(graft.streaming.IvfIndexTrigger.TicketPrefix))
        .map(f => s"$d/$f"))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession tuned for this engine.
  *
  * Settings mirror what the reference gets from its purpose-built
  * storage and what every query here assumes:
  *  - UTC session time (all Epoch arithmetic is UTC, SURVEY §7.4);
  *  - ns parquet timestamps read as raw longs (Spark has no ns
  *    timestamp type; truncation discipline lives in
  *    [[graft.sources.Tables]]);
  *  - AQE on with skew-join splitting — the runtime re-plan that
  *    replaces hand-tuned salt factors for skewed symbols;
  *  - the vector Catalyst expressions registered for SQL use.
  *
  * `shufflePartitions` should be ~2-3× total executor cores on a real
  * cluster; the default suits local development.
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Build the session and register the engine's SQL extensions. */
  def create(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    org.apache.spark.sql.graft.VectorFunctions.register(s)
    org.apache.spark.sql.graft.WindowFunctions.register(s)
    s
  }
}

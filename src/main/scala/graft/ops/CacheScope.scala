package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.util.control.NonFatal

/** Lifetime management for OPERATOR-HELD persisted intermediates.
  *
  * Several operators persist an intermediate their RETURNED lazy frame
  * references (clone-group relations, sharded rank relations, pipeline
  * corpora) — the operator cannot unpersist it without defeating the
  * cache, so the contract has been: Bench/Verify clear the cache per
  * query; any other embedder relies on ContextCleaner GC. That is fine
  * for batch drivers but lets a LONG-LIVED session (the RPC front, a
  * notebook) accumulate dead cached relations.
  *
  * [[withPinnedCaches]] closes the gap: every operator intermediate
  * persisted inside the scope (operators route through
  * [[scopedPersist]]) is unpersisted when the scope exits. The caller
  * must MATERIALIZE the result inside the scope — the frames returned
  * are lazy, and computing them after exit recomputes the unpersisted
  * intermediates (correct, just slower).
  *
  * Outside any scope, [[scopedPersist]] is a plain
  * MEMORY_AND_DISK persist — exactly the previous behavior.
  * Scopes are per-thread (operators register from the driver thread
  * that builds the plan) and nest; each scope releases only its own
  * registrations.
  */
object CacheScope {

  private val stack = new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
  }

  /** Checkpoint function for iterative operators (the CC fixpoint,
    * BPE merge loop): `df.checkpoint()` rooted at `checkpointDir`
    * (reliable — survives executor loss on a real cluster), or
    * `df.localCheckpoint()` when None (fast, non-replicated — the
    * local default).
    *
    * setCheckpointDir mints a fresh `<uuid>` subdir per call, so the
    * dir is only (re)set when the CURRENT checkpoint dir is not
    * already a direct child of the requested root. The comparison is
    * exact-parent path equality (plus scheme, when the request names
    * one): a prefix test would accept a sibling root ("/ckpt-old"
    * for "/ckpt") or a same-path dir on a different filesystem and
    * silently ignore the caller's durability request.
    */
  def checkpointer(spark: org.apache.spark.sql.SparkSession,
                   checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = spark.sparkContext
        val want = new org.apache.hadoop.fs.Path(dir).toUri
        val already = sc.getCheckpointDir.exists { d =>
          Option(new org.apache.hadoop.fs.Path(d).getParent).exists { p =>
            p.toUri.getPath == want.getPath &&
              (want.getScheme == null || p.toUri.getScheme == want.getScheme)
          }
        }
        if (!already) sc.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }

  /** Persist an operator intermediate (MEMORY_AND_DISK) and, when a
    * [[withPinnedCaches]] scope is active on this thread, register it
    * for release at scope exit. Used via `.transform(CacheScope.scopedPersist)`.
    */
  def scopedPersist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    stack.get() match {
      case head :: _ => head += p
      case Nil =>
    }
    p
  }

  /** Re-establish parallel width ahead of a CPU-MULTIPLYING step
    * (shingle/n-gram explodes, per-row feature transforms): when the
    * upstream partitioning is narrower than the session's default
    * parallelism — a single small parquet file, or a cached relation
    * AQE coalesced by BYTES — the explode that multiplies CPU-per-byte
    * 100×+ serializes onto a handful of cores (measured: the whole of
    * q_text_decontaminate ran as ONE 4.7 s-CPU task at bench scale).
    * A round-robin repartition to `defaultParallelism` re-spreads the
    * rows; it is a NO-OP whenever the input already carries ≥ that
    * many partitions, i.e. on any real at-scale scan, so nothing extra
    * is ever shuffled at 100 TB (optimization guide §2.5, input
    * parallelism). Results are unchanged: every consumer is an
    * aggregation/join keyed downstream of the explode.
    */
  def widen(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // decide from the OPTIMIZED LOGICAL plan + its size statistics —
    // never from df.rdd, whose getNumPartitions would EXECUTE the
    // upstream query stages under AQE. Only widen a plan that is
    // narrow file reads all the way down (project/filter/generate over
    // file relations): anything already shuffled, aggregated or cached
    // carries its own width, and mis-probing it costs jobs.
    val lp = df.queryExecution.optimizedPlan
    val narrowOverFiles =
      lp.collectLeaves().forall(_.isInstanceOf[LogicalRelation]) &&
        !lp.exists {
          case _: Aggregate | _: Join | _: Window | _: Sort |
               _: GlobalLimit | _: RepartitionOperation => true
          case _ => false
        }
    val par = df.sparkSession.sparkContext.defaultParallelism
    // ≥ ~4 MB of input per core and the scan splits will spread on
    // their own (maxPartitionBytes); below it the explode serializes
    if (narrowOverFiles &&
        lp.stats.sizeInBytes < BigInt(par.toLong) * 4L * 1024 * 1024)
      df.repartition(par)
    else df
  }

  /** Run `body`, then unpersist every operator intermediate it
    * registered. Returns body's result (materialize it INSIDE the
    * scope).
    */
  def withPinnedCaches[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer[DataFrame]()
    stack.set(buf :: stack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      buf.foreach { df =>
        try { df.unpersist(blocking = false); () }
        catch { case NonFatal(_) => () }
      }
    }
  }
}

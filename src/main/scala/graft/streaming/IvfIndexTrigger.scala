package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.Path
import scala.util.control.NonFatal

/** IVF-index maintenance as an on-write trigger — the reference's
  * trigger pattern (plugins/trigger/trigger.go:37-43, the ondiskagg
  * shape) applied to the ANN serving side: every batch written to a
  * matching embeddings bucket is assigned under a FROZEN coarse
  * quantizer (O(batch) — [[graft.ops.Similarity.ivfIndex]]'s
  * incremental contract: the historical corpus is never re-scanned and
  * the appended index is row-identical to a full rebuild) and appended
  * to a persisted (cell, id, embedding) index. Queries serve through
  * [[topK]] against the index alone, never the base table — the FAISS
  * serving contract wired into the engine's own write path.
  *
  * File-count discipline: each fire() appends one file set, so a
  * long-lived index accumulates small files without bound — [[compact]]
  * rewrites the current relation cell-clustered into a fresh
  * GENERATION directory (`gen-N` + `_COMPLETE` marker) and readers
  * resolve the highest complete generation, so the rewrite is atomic
  * to them and the steady-state file count is bounded by the compact
  * cadence (`compactEvery` automates it). One spent generation is
  * grace-retained per compaction for in-flight readers. Cell
  * clustering also means a compacted index serves probes from
  * parquet row groups that are contiguous per cell.
  *
  * Retraining the quantizer no longer invalidates the index (r10):
  * [[refreshQuantizer]] is a BLUE/GREEN reindex — train new centroids
  * from the index's own vectors, rebuild the whole relation into the
  * next generation UNDER the new quantizer with the quantizer
  * persisted INSIDE that generation (`gen-N/_quantizer`), and flip
  * atomically via the same `_COMPLETE` marker compaction uses.
  * Readers resolve (old index, old quantizer) or (new, new), never a
  * mix, and the spent pair is grace-retained one generation exactly
  * like a compaction — drift repair without a serving gap.
  *
  * Cross-process appends and publishers are serialized by a
  * SEAL/TICKET protocol (r11) — the moral equivalent of the
  * reference serializing all trigger writes behind one WAL writer
  * (executor/wal.go:29-45), scoped to the publish window instead of
  * the whole ingest: appenders drop a dot-prefixed ticket into the
  * generation before writing ([[fire]]); a publisher (compaction or
  * refresh, embedded or via the `knn_ivf_refresh` wire job) seals the
  * generation, drains live tickets, and only then snapshots — so a
  * batch acknowledged into gen-N is either inside gen-(N+1)'s rebuild
  * or written into gen-(N+1) directly by the backed-off appender,
  * never stranded in the retiring grace generation.
  */
final class IvfIndexTrigger(
    spark: SparkSession,
    centroids: Array[Seq[Float]],
    indexPath: String,
    id: String = "vec_id",
    emb: String = "embedding",
    compactEvery: Int = 0,
    ticketExpiryMs: Long = 0L) extends Trigger {

  /** Ticket lease clock for THIS index (0 = the process-wide default,
    * [[IvfIndexTrigger.TicketExpiryMs]]). All participants on one
    * index root — appenders and publishers, in any process — must
    * configure the same value, like any lease protocol.
    */
  private val ticketExpiry: Long =
    if (ticketExpiryMs > 0) ticketExpiryMs else IvfIndexTrigger.TicketExpiryMs

  private val fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private var firesSinceCompact = 0
  // lazily ensure the index root exists once per instance — not one
  // mkdirs RPC per batch on the hot append path
  private var rootEnsured = false
  // serializes this instance's APPENDS against each other (shared
  // committer staging) without routing them through the instance
  // monitor serving reads use — see fire()
  private val appendLock = new Object
  // serializes this instance's PUBLISHERS (compact/refresh) the same
  // way: the multi-second rebuild runs outside the instance monitor,
  // so serving reads (topK/pinServingPair) stay answerable throughout
  // a compaction or blue/green retrain. Lock order is always
  // publishLock -> instance monitor, never the reverse.
  private val publishLock = new Object
  // the LIVE quantizer (all mutation and reads of this var
  // synchronize on the trigger): the resolved generation's PERSISTED
  // quantizer when one exists — a trigger reconstructed after a
  // blue/green refresh (process restart) must keep assigning under
  // the retrained set the index was built with, or appends would mix
  // two quantizers inside one generation; constructor centroids only
  // for a fresh/pre-refresh index
  private var quantizer: Array[Seq[Float]] =
    IvfIndexTrigger.resolveQuantizerPath(spark, indexPath)
      .map(p => Similarity.loadCentroids(spark.read.parquet(p)))
      .getOrElse(centroids)
  // the generation this instance last observed; every mutating or
  // serving entry point re-checks it via [[syncGeneration]] so an
  // OUT-OF-BAND flip (another process's `knn_ivf_refresh` wire job or
  // compaction on the same path) is adopted instead of appending or
  // probing under a stale quantizer — the live-instance counterpart
  // of the constructor's restart adoption
  private var knownResolved: String =
    IvfIndexTrigger.resolveIndexPath(spark, indexPath)

  /** Re-resolve the current generation and adopt its persisted
    * quantizer if the generation moved since this instance last
    * looked (one directory listing; called under the instance lock by
    * every mutating/serving entry point). Returns the resolved path.
    *
    * The adoption read races generation retirement: grace retention
    * keeps ONE spent generation, so two foreign publishes landing
    * back-to-back can delete the generation between our resolve and
    * the quantizer read (observed as FileNotFound mid-load in the
    * two-process smoke test). That only ever means a NEWER generation
    * exists — re-resolve and adopt it instead of surfacing the torn
    * read to an append or serving call.
    */
  private def syncGeneration(): String = {
    var resolved = IvfIndexTrigger.resolveIndexPath(spark, indexPath)
    var attempts = 0
    var lastErr: Throwable = null
    var sawFlip = false
    while (resolved != knownResolved) {
      attempts += 1
      // bound TOTAL iterations, not just the exception arm: the
      // non-throwing `cur != resolved` path can loop as long as
      // foreign publishes keep landing between the quantizer read and
      // the currency re-check — each extra pass requires a whole
      // foreign publish inside that microsecond window, so more than
      // a handful means something is flipping pathologically fast
      // (refreshQuantizer caps its identical retry shape the same way).
      // If NO flip was ever observed — every attempt failed on the
      // same store error — surface that error itself: a "flipping too
      // fast, retry" diagnostic would steer the operator away from a
      // corrupt quantizer or a sick store that no retry can fix.
      if (attempts > 5) {
        if (!sawFlip && lastErr != null) throw lastErr
        throw new IllegalStateException(
          s"generation adoption on $indexPath lost the currency race " +
            s"${attempts - 1} times — concurrent publishers are flipping " +
            "faster than this reader can adopt; retry the operation",
          lastErr)
      }
      try {
        IvfIndexTrigger.testHookMidSync.foreach(_.apply(indexPath))
        val q = new Path(resolved, IvfIndexTrigger.QuantizerDir)
        val cents =
          if (fs.exists(q))
            Some(Similarity.loadCentroids(spark.read.parquet(q.toString)))
          else None
        // re-verify currency BEFORE adopting: a deleted generation can
        // also present as exists->false (no exception), and adopting
        // the retired path would pair it with a stale quantizer
        val cur = IvfIndexTrigger.resolveIndexPath(spark, indexPath)
        if (cur == resolved) {
          cents.foreach(quantizer = _)
          knownResolved = resolved
        } else { sawFlip = true; resolved = cur }
      } catch {
        case NonFatal(e) =>
          lastErr = e
          val re = IvfIndexTrigger.resolveIndexPath(spark, indexPath)
          if (re != resolved) sawFlip = true
          resolved = re
      }
    }
    resolved
  }

  /** The quantizer current batches are assigned (and queries probed)
    * under — the constructor's until a refresh (this instance's or an
    * out-of-band one) flips it.
    */
  def currentQuantizer: Array[Seq[Float]] = synchronized {
    syncGeneration(); quantizer
  }

  /** Append one batch to the live generation, fenced against a
    * CROSS-PROCESS publisher (another process's `knn_ivf_refresh` wire
    * job or compaction) by the seal/ticket protocol:
    *
    *  1. resolve the generation and drop a TICKET file into it
    *     (dot-prefixed — invisible to parquet readers);
    *  2. with the ticket visible, re-check the world: if the
    *     generation carries no live SEAL and is still the resolved
    *     one (in that order — see [[tryAppendOnce]] for why it is
    *     load-bearing), append — any publisher sealing after this
    *     point must drain our ticket before taking its corpus
    *     snapshot, so the batch is provably inside the snapshot or
    *     still exclusively in the (still-live) generation;
    *  3. a live seal, or a resolution that moved under us, means a
    *     publisher owns the relation: back off and retry — the flip
    *     lands within the publisher's runtime and the retry appends
    *     into the NEW generation under its quantizer (adopted by
    *     [[syncGeneration]]).
    *
    * Liveness: a seal whose publisher died is broken after
    * [[IvfIndexTrigger.SealExpiryMs]]; an appender heartbeat-renews
    * its ticket while the write runs, so only an appender whose
    * renewal stops for [[IvfIndexTrigger.TicketExpiryMs]] is presumed
    * dead (the standard lease clock assumption). This
    * closes the r10 race where a batch acknowledged into gen-N between
    * an out-of-band refresh's snapshot and its flip was stranded in
    * the grace generation and deleted one flip later.
    */
  def fire(tbk: String, batch: DataFrame): Unit = {
    // appends serialize against EACH OTHER in-process (concurrent
    // parquet-append jobs into one directory would share the output
    // committer's `_temporary` staging) on their OWN lock — never
    // against serving reads: the instance monitor is held only for
    // the resolve/ticket/check phase and the counters, not across
    // the Spark write or the backoff sleep, so topK/pinServingPair
    // read throughout a foreign publisher's runtime AND this
    // instance's own batch writes
    appendLock.synchronized { appendPending(batch) }
    maybeCompact()
  }

  /** The fenced append loop of [[fire]]; the caller holds appendLock. */
  private def appendPending(batch: DataFrame): Unit = {
    var pending = batch
    var persisted: List[DataFrame] = Nil
    try {
      var done = false
      while (!done) tryAppendOnce(pending) match {
        case IvfIndexTrigger.Appended => done = true
        case IvfIndexTrigger.SealBackoff =>
          IvfIndexTrigger.sealWaits.incrementAndGet()
          Thread.sleep(50)
        case IvfIndexTrigger.AckUncertain =>
          // the ack fence tripped: the batch's files are durably
          // committed into the (possibly retiring) generation, but a
          // draining publisher may have presumed this appender dead
          // and snapshotted WITHOUT them. Resolve the ambiguity here
          // instead of throwing a verify-by-hand instruction (r13):
          // wait the publisher out, then diff the batch against the
          // live relation by id and re-append exactly the rows its
          // snapshot excluded — fire() returns only once the batch is
          // provably in the serving relation, with no loss and no dup.
          IvfIndexTrigger.ackFenceRecoveries.incrementAndGet()
          IvfIndexTrigger.log.warn(
            s"ack fence tripped on $indexPath — ticket renewal lapsed " +
              "under a concurrent publisher; recovering by re-appending " +
              "the rows its snapshot excluded")
          awaitPublisherQuiesce()
          // the diff pins a generation at resolve/plan time and reads
          // it at count() — publishes in that window can retire the
          // pinned path (grace keeps one spent generation). Letting
          // that missing-path error escape would tell the caller
          // "append failed" for a batch that IS committed — a re-fire
          // would duplicate every row — so the WHOLE diff (plan
          // construction included: the eager parquet listing throws
          // the same class of transient) retries against a fresh
          // resolve, like every other serving-path read
          var diffed: Option[DataFrame] = None
          var diffAttempts = 0
          while (diffed.isEmpty) {
            diffAttempts += 1
            var miss: DataFrame = null
            try {
              miss = missingRows(pending)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              persisted ::= miss
              // materialize NOW: the anti-join must be evaluated
              // against the relation as diffed, not lazily after our
              // own re-append starts changing it
              done = miss.count() == 0L
              diffed = Some(miss)
            } catch {
              case NonFatal(e) if diffAttempts < 3 &&
                  IvfIndexTrigger.isStaleGenerationRead(e, indexPath) =>
                // release THIS attempt's dead cache immediately (a
                // prior attempt's frame may be the live `pending`
                // whose cache the next diff's lineage still reads) —
                // the re-append of a large batch should not run
                // beside a half-materialized dead diff
                if (miss != null) {
                  persisted = persisted.filterNot(_ eq miss)
                  try miss.unpersist() catch { case NonFatal(_) => () }
                }
                IvfIndexTrigger.log.warn(
                  s"ack-fence recovery diff re-pinned $indexPath after " +
                    s"its generation retired mid-read (attempt $diffAttempts)")
            }
          }
          pending = diffed.get
      }
    } finally persisted.foreach(df =>
      try df.unpersist() catch { case NonFatal(_) => () })
  }

  /** [[fire]]'s opportunistic compaction pass — runs OUTSIDE
    * appendLock (compact takes publishLock then the instance monitor;
    * serializing appends behind a multi-second rebuild would park
    * every concurrent producer behind maintenance).
    */
  private def maybeCompact(): Unit = {
    // decide under the monitor, compact OUTSIDE it: compact takes
    // publishLock then the monitor, so calling it with the monitor
    // held would invert the lock order against a concurrent refresh
    val doCompact = synchronized {
      firesSinceCompact += 1
      compactEvery > 0 && firesSinceCompact >= compactEvery
    }
    // the batch is already durably appended and acknowledged above: a
    // failure in this OPPORTUNISTIC maintenance pass must not escape
    // fire() — a caller treating it as "append failed" would re-fire
    // and duplicate every row. The next fire retries the compaction;
    // an explicit compact() call still surfaces its errors.
    if (doCompact)
      try compact()
      catch {
        case NonFatal(e) => IvfIndexTrigger.log.warn(
          s"auto-compaction after an acknowledged append to $indexPath " +
            s"failed (will retry next fire): ${e.getMessage}")
      }
  }

  /** One fenced append attempt; [[IvfIndexTrigger.SealBackoff]] = a
    * publisher owns the relation (or the generation moved) — the
    * caller backs off and retries; [[IvfIndexTrigger.AckUncertain]] =
    * the write committed but its ticket renewal lapsed under a
    * concurrent publisher, so the batch may be outside that
    * publisher's snapshot — the caller recovers by diffing (fire()).
    * Check ORDER is load-bearing: ticket first, then seal, then
    * resolution-currency.
    *  - seal absent at the check ⇒ either no publisher is mid-flight
    *    (one sealing later must drain our already-visible ticket
    *    before snapshotting) or a publisher already FLIPPED and
    *    unsealed — and then the resolution check, made AFTER the seal
    *    check, sees the moved generation and backs off. Checking
    *    resolution before the seal would leave a window where
    *    flip+unseal land between the two checks and the append goes
    *    into the retired generation (lost on its grace expiry).
    * Only the resolve + ticket-drop phase holds the instance monitor;
    * the (generation, quantizer) pair is captured there so the write
    * outside it can never mix a new generation with stale centroids.
    */
  private def tryAppendOnce(batch: DataFrame): IvfIndexTrigger.AppendOutcome = {
    val (resolved, q, ticket) = synchronized {
      val r = syncGeneration()
      if (!rootEnsured) { fs.mkdirs(new Path(indexPath)); rootEnsured = true }
      val t = new Path(r,
        IvfIndexTrigger.TicketPrefix + java.util.UUID.randomUUID().toString.take(8))
      fs.create(t, false).close()
      (r, quantizer, t)
    }
    val clear = !sealBlocks(resolved) &&
      IvfIndexTrigger.resolveIndexPath(spark, indexPath) == resolved
    if (clear) {
      // heartbeat-renew the ticket while the write runs (r12): only
      // the writing THREAD is blocked inside the parquet commit — a
      // daemon touch of the ticket's mtime keeps a legitimately long
      // batch (plausible at 100 TB batch sizes) visibly LIVE, so a
      // draining publisher waits for it instead of presuming it
      // crashed at TicketExpiryMs and snapshotting without it. A
      // crashed appender stops renewing and ages out exactly as
      // before.
      val lastTouch =
        new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
      val gapSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
      val period = math.max(1L, ticketExpiry / 4)
      // the last mtime a successful renewal observed: a non-throwing
      // setTimes is NOT proof of renewal (several object-store
      // connectors implement it as a silent no-op), and an unmoved
      // mtime looks CRASHED to a draining publisher — it would
      // snapshot without this batch while lastTouch here stayed
      // fresh, so the ack fence would never trip and the batch would
      // be silently lost at grace retirement (r13). Renewal therefore
      // VERIFIES the mtime moved, falling back to rewriting the
      // ticket (a fresh write carries a fresh mtime on every store).
      val lastMtime =
        new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
      // the rewrite fallback below could RESURRECT a ticket the
      // finally just removed (the setTimes-only r12 shape couldn't —
      // a touch of a deleted file throws), leaving a leftover that
      // parks later publishers' drains one expiry. Closed WITHOUT a
      // shared lock — blocking the finally behind an in-flight tick
      // would couple acknowledgment of an already-committed append to
      // a renewal RPC against a possibly-hung store. Ordering: the
      // finally sets hbActive=false BEFORE its delete, and the tick
      // re-checks hbActive AFTER its create — so either the finally's
      // delete runs after the create (and removes it), or the
      // post-create check observes false and the tick deletes its own
      // resurrection.
      val hbActive = new java.util.concurrent.atomic.AtomicBoolean(true)
      val hb = IvfIndexTrigger.ticketScheduler.scheduleWithFixedDelay(
        () => if (hbActive.get()) try {
          val now = System.currentTimeMillis()
          if (now - lastTouch.get() > ticketExpiry)
            gapSeen.set(true)
          try fs.setTimes(ticket, now, -1) catch { case NonFatal(_) => () }
          // a renewal took: the mtime moved past the last one we saw,
          // or is fresh to within one period (coarse second-granular
          // mtime clocks can stamp two renewals inside one tick)
          def moved: Boolean = {
            val m = fs.getFileStatus(ticket).getModificationTime
            val ok = m > lastMtime.get() || now - m <= period
            if (ok) lastMtime.set(math.max(m, lastMtime.get()))
            ok
          }
          val renewed = moved || {
            fs.create(ticket, true).close()
            if (!hbActive.get()) { // raced the shutdown: undo the rewrite
              try fs.delete(ticket, false) catch { case NonFatal(_) => () }
              false
            } else moved
          }
          if (renewed) lastTouch.set(now)
          else if (hbActive.get()) {
            // leave lastTouch stale — the gap accrues and the ack
            // fence below judges it; count it so a renewal brown-out
            // is visible on /metrics before it refuses acks
            IvfIndexTrigger.ticketRenewalFailures.incrementAndGet()
            IvfIndexTrigger.log.warn(
              s"ticket renewal on $ticket did not move its mtime — " +
                "treating as a failed touch (the ack fence judges the gap)")
          }
        } catch {
          case NonFatal(_) =>
            // a tick racing the shutdown delete is not a brown-out
            if (hbActive.get())
              IvfIndexTrigger.ticketRenewalFailures.incrementAndGet()
        },
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
      try {
        IvfIndexTrigger.testHookDuringAppend.foreach(_.apply(indexPath))
        Similarity.ivfIndex(batch.select(col(id), col(emb)), q, id, emb)
          .write.mode("append").parquet(resolved)
        // ack fence: if renewal ever lapsed past the expiry, a
        // draining publisher may have presumed this appender dead and
        // snapshotted WITHOUT the batch — acknowledging would then
        // silently lose it when the stale generation retires. The
        // lapse is only ambiguous when a publisher is (or was)
        // actually in flight: with no seal and an unmoved generation,
        // the just-committed files are durable in the live generation
        // and any LATER publisher must snapshot them.
        val lapsed = gapSeen.get() ||
          System.currentTimeMillis() - lastTouch.get() > ticketExpiry
        if (lapsed &&
            (fs.exists(new Path(resolved, IvfIndexTrigger.SealFile)) ||
              IvfIndexTrigger.resolveIndexPath(spark, indexPath) != resolved))
          IvfIndexTrigger.AckUncertain
        else IvfIndexTrigger.Appended
      } finally {
        hb.cancel(false)
        // flag down BEFORE the delete (see the ordering argument at
        // the heartbeat): never blocks on an in-flight tick, and a
        // racing rewrite is undone by the tick's own post-create check
        hbActive.set(false)
        try fs.delete(ticket, false) catch { case NonFatal(_) => () }
      }
    } else {
      try fs.delete(ticket, false) catch { case NonFatal(_) => () }
      IvfIndexTrigger.SealBackoff
    }
  }

  /** Wait until no live publisher seal guards the current generation —
    * the recovery path's precondition for diffing the batch against a
    * SETTLED relation. Same bounded-progress lease assumption as
    * [[drainTickets]]: a renewing publisher parks this until it
    * finishes; a crashed one is expiry-broken by [[sealBlocks]].
    */
  private def awaitPublisherQuiesce(): Unit =
    while (sealBlocks(IvfIndexTrigger.resolveIndexPath(spark, indexPath)))
      Thread.sleep(100)

  /** The rows of `batch` NOT present (by `id`) in the current serving
    * relation. One id-column scan of the index with the batch's ids
    * broadcast into a semi-join — the index side is never shuffled,
    * so the diff is O(index scan) + O(batch) at any index size.
    * Presence is keyed on `id` alone: ids are the index's primary key
    * (duplicate ids across appends are already a data error — topK
    * would return duplicates).
    */
  private def missingRows(batch: DataFrame): DataFrame = {
    var attempts = 0
    while (true) {
      attempts += 1
      val resolved = IvfIndexTrigger.resolveIndexPath(spark, indexPath)
      if (hasDataFiles(resolved)) {
        // no distinct on `present`: duplicate keys on a left_anti's
        // right side cannot change its result
        val present = spark.read.parquet(resolved).select(col(id))
          .join(org.apache.spark.sql.functions.broadcast(
            batch.select(col(id)).distinct()), Seq(id), "left_semi")
        return batch.join(present, Seq(id), "left_anti")
      }
      // empty observation: EITHER the index genuinely has no data —
      // the whole batch is missing — OR the resolved generation was
      // retired between the resolve and the listing (exists→false,
      // no exception), in which case calling the batch "all missing"
      // would re-append rows the NEW generation already holds: full
      // silent duplication. Distinguish by re-resolving; only a
      // CURRENT empty observation may return the batch.
      if (IvfIndexTrigger.resolveIndexPath(spark, indexPath) == resolved)
        return batch
      if (attempts >= 5) throw new IllegalStateException(
        s"presence diff on $indexPath lost the generation race $attempts " +
          "times — concurrent publishers are flipping faster than this " +
          "reader; retry")
    }
    batch // unreachable
  }

  /** True iff every row of `batch` is present (by `id`) in the current
    * serving relation — the mechanical "verify presence" step for a
    * caller recovering a fire() whose PROCESS died mid-append (the
    * in-process uncertain-ack case self-heals inside [[fire]]).
    */
  def verifyBatch(batch: DataFrame): Boolean = missingRows(batch).isEmpty

  /** [[fire]] for at-least-once upstreams: append only the rows of
    * `batch` whose `id` is absent from the serving relation, so a
    * blind redelivery after a caller crash neither loses nor
    * duplicates. Costs one id-column index scan per call (the
    * [[missingRows]] diff) — use plain [[fire]] on exactly-once paths.
    */
  def fireIdempotent(tbk: String, batch: DataFrame): Unit = {
    // diff UNDER the append lock, or two concurrent redeliveries of
    // one batch would both see its rows absent and both append them;
    // the opportunistic compaction runs OUTSIDE it like fire()'s —
    // serializing every append behind a multi-second rebuild would
    // park all concurrent producers behind maintenance. Cross-PROCESS
    // concurrent redelivery of the same batch stays the caller's
    // contract (one owner per batch), as for fire itself.
    val appended = appendLock.synchronized {
      val miss = missingRows(batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val any = miss.count() > 0L
        if (any) appendPending(miss)
        any
      } finally { try miss.unpersist() catch { case NonFatal(_) => () } }
    }
    if (appended) maybeCompact()
  }

  /** True iff a LIVE publisher seal guards `resolved` (the appender
    * must back off). An EXPIRED seal — its publisher died between
    * sealing and flipping — is broken here so a crashed refresh never
    * parks ingest forever; the publisher's pre-flip nonce verify keeps
    * a zombie whose seal was broken from publishing anyway. A torn
    * read errs toward WAITING (the safe direction).
    */
  private def sealBlocks(resolved: String): Boolean = {
    val p = new Path(resolved, IvfIndexTrigger.SealFile)
    if (!fs.exists(p)) return false
    readSeal(p) match {
      case Some((n0, ts))
        if System.currentTimeMillis() - ts > IvfIndexTrigger.SealExpiryMs =>
        // re-read IMMEDIATELY before the break: between the first read
        // and the delete a successor publisher may have broken this
        // expired seal and created a fresh LIVE one — deleting that
        // would waste its entire rebuild at the nonce fence. Only the
        // still-expired nonce is ours to break (a live renewal never
        // rewrites an expired seal, so same nonce ⇒ same dead seal).
        readSeal(p) match {
          case Some((n2, _)) if n2 == n0 =>
            // the break must actually SUCCEED before an append may
            // proceed: a zombie publisher whose expired seal we merely
            // FAILED to remove would still pass its nonce fence and
            // flip over a batch outside its snapshot — so a failed
            // delete keeps blocking (the next attempt retries)
            val broken =
              try fs.delete(p, false) catch { case NonFatal(_) => false }
            !broken
          case Some(_) => true // replaced by a successor — treat as live
          case None => false   // already broken; a later sealer must drain our ticket
        }
      case Some(_) => true // live publisher
      case None =>
        // unparseable: a torn read mid-heartbeat-rewrite OR a crash
        // that left an empty/partial seal. A LIVE publisher's renewal
        // keeps the FILE's mtime fresh, so fall back to its age — a
        // dead torn seal must still expire or the whole index wedges
        // forever (no append, no compaction, no refresh could ever
        // break a seal whose ts can't be parsed)
        val stale =
          try System.currentTimeMillis() - fs.getFileStatus(p)
            .getModificationTime > IvfIndexTrigger.SealExpiryMs
          catch { case NonFatal(_) => false } // vanished/torn — err toward waiting
        if (!stale) true
        else {
          val broken =
            try fs.delete(p, false) catch { case NonFatal(_) => false }
          !broken
        }
    }
  }

  private def readSeal(p: Path): Option[(String, Long)] =
    try {
      val in = fs.open(p)
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        Some((n.get("nonce").asText(), n.get("ts").asLong()))
      } finally in.close()
    } catch { case NonFatal(_) => None }

  /** Exclusive-create the publisher seal on the resolved generation
    * (breaking an expired one first) and register its heartbeat
    * renewal. Some(nonce) = this caller owns the publish; None = a
    * live concurrent publisher does.
    */
  private def acquireSeal(resolved: String): Option[String] = {
    val p = new Path(resolved, IvfIndexTrigger.SealFile)
    readSeal(p) match {
      case Some((n0, ts)) =>
        if (System.currentTimeMillis() - ts > IvfIndexTrigger.SealExpiryMs)
          // same narrowed break as sealBlocks: re-read right before the
          // delete and only remove the SAME expired nonce — a successor
          // may have broken it and sealed afresh in between, and
          // removing that live seal would abort its whole build
          readSeal(p) match {
            case Some((n2, _)) if n2 == n0 =>
              try fs.delete(p, false) catch { case NonFatal(_) => () }
            case _ => ()
          }
      case None =>
        // unparseable seal: same mtime-fallback expiry as sealBlocks —
        // a crashed publisher's torn seal must be breakable here too,
        // or no publisher could ever run again on this generation
        try {
          if (fs.exists(p) &&
              System.currentTimeMillis() - fs.getFileStatus(p)
                .getModificationTime > IvfIndexTrigger.SealExpiryMs)
            fs.delete(p, false)
        } catch { case NonFatal(_) => () }
    }
    val nonce = java.util.UUID.randomUUID().toString
    def body() = s"""{"nonce": "$nonce", "ts": ${System.currentTimeMillis()}}"""
    if (!graft.core.FsOps.createExclusive(fs, p, body())) return None
    // renew every quarter-expiry while held: a long drain/retrain/
    // rebuild never presents as expired (an appender would break the
    // seal and the pre-flip nonce fence would waste the whole build),
    // while a CRASHED publisher stops renewing and is broken within
    // one expiry. Renewal, the pre-flip fence and removal all order
    // through ONE per-index monitor (keyed by the index root, so the
    // map stays bounded by live indexes, not generations ever sealed).
    val key = p.toString
    IvfIndexTrigger.sealLock(indexPath).synchronized {
      // REPLACE any surviving registration for this path — we just
      // exclusively created the seal, so an existing entry belongs to
      // a predecessor whose expiry-broken seal was never removed; its
      // closure carries the OLD nonce and would no-op forever, leaving
      // OUR seal unrenewed and broken mid-rebuild
      Option(IvfIndexTrigger.sealHeartbeats.remove(key)).foreach(_.cancel(false))
      IvfIndexTrigger.sealHeartbeats.put(key,
        IvfIndexTrigger.sealScheduler.scheduleWithFixedDelay(
          () => IvfIndexTrigger.sealLock(indexPath).synchronized {
            try {
              if (IvfIndexTrigger.sealHeartbeats.containsKey(key))
                readSeal(p) match {
                  // renew ONLY a seal that is ours AND still live: an
                  // already-expired one may have been broken and
                  // re-acquired since our read, and resurrecting it
                  // would let this zombie pass the nonce fence over
                  // appends outside its snapshot (the lease rule that
                  // a released lease never resurrects via renewal).
                  // Residual window — a scheduler stall between this
                  // check and the rewrite spanning the seal's
                  // remaining life — is the standard bounded-stall
                  // lease assumption, shared with the catalog lease.
                  case Some((n2, ts)) if n2 == nonce &&
                      System.currentTimeMillis() - ts < IvfIndexTrigger.SealExpiryMs =>
                    val out = fs.create(p, true)
                    try out.write(body().getBytes(java.nio.charset.StandardCharsets.UTF_8))
                    finally out.close()
                  case _ => ()
                }
            } catch {
              case NonFatal(e) =>
                // never throw into the scheduler, but don't fail
                // SILENTLY either: repeated renewal failures degrade
                // the seal to a one-expiry lease an appender will
                // break mid-rebuild — that needs a diagnostic trail
                IvfIndexTrigger.log.warn(
                  s"seal renewal failed for $p: ${e.getMessage} — if this " +
                    "persists, an appender will break the seal and the " +
                    "publish will abort at the nonce fence")
            }
          },
          IvfIndexTrigger.SealExpiryMs / 4, IvfIndexTrigger.SealExpiryMs / 4,
          java.util.concurrent.TimeUnit.MILLISECONDS))
      ()
    }
    Some(nonce)
  }

  private def removeSeal(resolved: String, nonce: String): Unit = {
    val p = new Path(resolved, IvfIndexTrigger.SealFile)
    IvfIndexTrigger.sealLock(indexPath).synchronized {
      // unregister the heartbeat FIRST (inside the monitor): a renewal
      // observing the removed entry no-ops, so a just-deleted seal can
      // never be resurrected by a late rewrite
      Option(IvfIndexTrigger.sealHeartbeats.remove(p.toString))
        .foreach(_.cancel(false))
      // only our own seal: after an expiry-break a successor publisher
      // may legitimately hold a NEW seal on this generation
      if (readSeal(p).exists(_._1 == nonce))
        try fs.delete(p, false) catch { case NonFatal(_) => () }
    }
  }

  /** Wait for in-flight appenders of the sealed generation to finish:
    * a ticket whose mtime is within [[IvfIndexTrigger.TicketExpiryMs]]
    * is a LIVE write the corpus snapshot must include — appenders
    * heartbeat-renew their ticket for as long as the write runs
    * (r12), so a legitimately long batch parks the drain instead of
    * being presumed dead at a fixed budget. A ticket that stops
    * renewing is a crashed appender (its uncommitted task files sit
    * under `_temporary`, invisible to readers) and drops out of the
    * live set one expiry later. New appenders see the seal after
    * creating their ticket and back off, so the set only drains; the
    * publisher's own seal heartbeat keeps its seal live however long
    * this takes. An appender that renews but never finishes parks the
    * publisher indefinitely — the standard bounded-progress lease
    * assumption, now on the renewal rather than on one batch's
    * wall-clock.
    */
  private def drainTickets(resolved: String): Unit = {
    val dir = new Path(resolved)
    // poll fast at first (the common drain is sub-second), then back
    // off toward the renewal period: a multi-hour legitimate write
    // must not cost 20 directory LISTs per second for its whole
    // duration — the ticket renewal cadence already bounds how
    // quickly a finished (or died) appender can be detected anyway
    var sleep = 50L
    val maxSleep = math.max(50L, math.min(5000L, ticketExpiry / 4))
    while (true) {
      val live =
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).toSeq.filter(s => s.isFile &&
          s.getPath.getName.startsWith(IvfIndexTrigger.TicketPrefix) &&
          System.currentTimeMillis() - s.getModificationTime <=
            ticketExpiry)
      if (live.isEmpty) return
      Thread.sleep(sleep)
      sleep = math.min(sleep * 2, maxSleep)
    }
  }

  /** Any visible parquet data in the generation? (A sealed dir may
    * hold only protocol files — seal/tickets/marker — before the
    * first append lands.)
    */
  private def hasDataFiles(resolved: String): Boolean = {
    val dir = new Path(resolved)
    fs.exists(dir) && fs.listStatus(dir).exists(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
  }

  /** The maintained (cell, id, embedding) index relation — the highest
    * complete generation (or the flat pre-compaction root).
    */
  def index: DataFrame =
    spark.read.parquet(IvfIndexTrigger.resolveIndexPath(spark, indexPath))

  /** Rewrite the current index relation cell-clustered into the next
    * generation and retire all but one predecessor: appends stop
    * growing the file count across compactions, and per-cell rows
    * become contiguous. Single-writer like every mutation here (fire
    * and compact synchronize on the trigger); readers are
    * generation-isolated and never see a partial rewrite — the marker
    * lands only after the generation is fully written.
    */
  def compact(): Unit = publishLock.synchronized {
    if (!fs.exists(new Path(indexPath))) return // nothing fired yet
    // the instance monitor is held only to snapshot (generation,
    // quantizer); the rewrite itself runs outside it so serving reads
    // are never parked behind a compaction
    val (resolved, q) = synchronized { (syncGeneration(), quantizer) }
    IvfIndexTrigger.testHookPreSeal.foreach(_.apply(indexPath))
    // losing the seal means a concurrent publisher (another process's
    // refresh/compaction) owns the relation — its generation already
    // bounds the file count, which is all a compaction is for; the
    // next entry-point call adopts it
    acquireSeal(resolved) match {
      case None => ()
      case Some(nonce) =>
        try {
          // the monitor snapshot and the seal are two steps: a foreign
          // flip landing BETWEEN them retires `resolved`, and the
          // exclusive-create then succeeds on the RETIRED generation
          // (the foreign publisher unsealed after flipping). Rebuilding
          // that stale snapshot as the next generation would silently
          // drop every row appended into the foreign generation — so
          // re-check resolution AFTER winning the seal (fire()'s
          // ticket→seal→resolution order applied to the publisher) and
          // simply return on a move: the foreign generation already
          // bounds the file count, which is all a compaction is for.
          if (IvfIndexTrigger.resolveIndexPath(spark, indexPath) == resolved) {
            drainTickets(resolved)
            if (hasDataFiles(resolved)) {
              publishGeneration(
                spark.read.parquet(resolved), q, resolved, nonce)
              ()
            }
          }
        } finally removeSeal(resolved, nonce)
    }
  }

  /** Blue/green quantizer refresh — drift repair WITHOUT a serving
    * gap: retrain `nCells` centroids from the index's own vectors
    * (`trainIters` Lloyd iterations over exactly the rows being
    * served; the index rows carry full embeddings, so the base table
    * is never read), rebuild the whole relation into the next
    * generation under the NEW quantizer, persist that quantizer
    * inside the generation, and flip via the marker. Readers that
    * resolved before the flip finish on the grace-retained old
    * (index, quantizer) pair; everyone after gets the new pair;
    * subsequent [[fire]]s assign under the new quantizer. The rebuild
    * is row-identical to a fresh build over the same vectors under
    * the same centroids (assignment under a frozen quantizer is
    * deterministic). No-op on an empty index.
    */
  def refreshQuantizer(nCells: Int = 0, trainIters: Int = 3): Unit =
    publishLock.synchronized {
      if (!fs.exists(new Path(indexPath))) return // nothing fired yet
      // the monitor is held only to snapshot (generation, cell count);
      // the retrain + rebuild run outside it so serving reads are
      // never parked behind a refresh (the flip itself updates the
      // live (generation, quantizer) pair atomically under the
      // monitor inside publishGeneration)
      var attempts = 0
      while (true) {
        attempts += 1
        val (resolved, nSeed) = synchronized { (syncGeneration(), quantizer.length) }
        IvfIndexTrigger.testHookPreSeal.foreach(_.apply(indexPath))
        // SEAL before the corpus snapshot (r11): the snapshot's file
        // listing happens at the read below, and any append landing after
        // it but before the flip would be stranded in the grace generation
        // and deleted one flip later. With the seal held, every appender
        // either finished before the drain (its files are in the
        // snapshot) or backs off until the flip and writes into the NEW
        // generation — no batch can fall between snapshot and flip.
        val nonce = acquireSeal(resolved).getOrElse(throw new IllegalStateException(
          s"concurrent generation publish on $indexPath — another publisher " +
            "holds the seal; re-run this refresh against its generation"))
        try {
          // re-check currency AFTER winning the seal (r12 — fire()'s
          // ticket→seal→resolution order applied to the publisher): a
          // foreign flip landing between the monitor snapshot and the
          // exclusive-create means this seal sits on a RETIRED
          // generation (the foreign publisher unsealed after flipping);
          // retraining from it would publish a stale corpus as the next
          // generation and silently drop every row appended into the
          // foreign one. Release and retry against the new generation.
          if (IvfIndexTrigger.resolveIndexPath(spark, indexPath) == resolved) {
            drainTickets(resolved)
            if (!hasDataFiles(resolved)) return
            val corpus = spark.read.parquet(resolved).select(col(id), col(emb))
            if (corpus.isEmpty) return
            val n = if (nCells > 0) nCells else nSeed
            val fresh = Similarity.trainedCentroids(corpus, n, trainIters, id, emb)
            IvfIndexTrigger.testHookMidRefresh.foreach(_.apply(indexPath))
            if (!publishGeneration(Similarity.ivfIndex(corpus, fresh, id, emb),
                fresh, resolved, nonce))
              // unlike compaction, a lost refresh means THIS retrain never
              // became the serving state — surface it so the caller retries
              // instead of believing its drift repair landed
              throw new IllegalStateException(
                s"concurrent generation publish on $indexPath — this refresh " +
                  "lost the slot race; re-run it against the new generation")
            return
          }
        } finally removeSeal(resolved, nonce)
        // each retry requires a whole foreign publish to have landed
        // inside the microsecond snapshot→seal window — more than a
        // handful means something is flipping pathologically fast
        if (attempts >= 5) throw new IllegalStateException(
          s"refresh on $indexPath lost the generation race $attempts times — " +
            "concurrent publishers are flipping faster than this retrain; re-run")
      }
    }

  /** One definition of the generation flip, shared by [[compact]] and
    * [[refreshQuantizer]]: write `rows` cell-clustered — with `cents`
    * at `_quantizer` (leading underscore — parquet readers of the
    * generation ignore it) and the `_COMPLETE` marker already inside
    * — into a UNIQUE tmp directory, then claim the gen-(N+1) slot by
    * atomic no-overwrite rename (the manifest version-slot CAS
    * applied to generations): concurrent publishers from other
    * processes (the `knn_ivf_refresh` wire job) target the same slot
    * and exactly one wins; the loser's bytes are dropped, never
    * half-merged into a marked generation. Returns whether THIS
    * publish won. The winner retires all but the immediate
    * predecessor (grace for readers that resolved just before the
    * flip). Readers are generation-isolated either way — the rename
    * makes a complete (index, quantizer, marker) trio appear in one
    * metadata operation.
    */
  private def publishGeneration(
      rows: DataFrame, cents: Array[Seq[Float]],
      sourceResolved: String, sealNonce: String): Boolean = {
    val gens = IvfIndexTrigger.completeGens(fs, indexPath)
    val cur = gens.maxOption
    val next = cur.getOrElse(0L) + 1
    val tmp = s"$indexPath/.gen_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
    rows.repartition(math.min(cents.length, 4096), col("cell"))
      .sortWithinPartitions("cell", id)
      .write.mode("overwrite").parquet(tmp)
    Similarity.centroidsDF(spark, cents)
      .write.mode("overwrite")
      .parquet(s"$tmp/${IvfIndexTrigger.QuantizerDir}")
    fs.create(new Path(s"$tmp/${IvfIndexTrigger.Marker}"), true).close()
    // pre-flip fence: the seal must still be OURS. If the build
    // outlived SealExpiryMs an appender broke the seal (possibly a
    // successor publisher re-sealed) — appends may have landed outside
    // our snapshot, so publishing it would strand them: abort instead.
    // Read under the per-index monitor so the fence can never land in
    // our OWN heartbeat's truncate-then-write window and falsely abort
    // a finished build as "concurrent".
    val sealOk = IvfIndexTrigger.sealLock(indexPath).synchronized {
      readSeal(new Path(sourceResolved, IvfIndexTrigger.SealFile))
        .exists(_._1 == sealNonce)
    }
    if (!sealOk) {
      try fs.delete(new Path(tmp), true) catch { case NonFatal(_) => () }
      return false
    }
    // the slot CAS is the shared no-overwrite rename (FsOps holds the
    // object-store rename-semantics requirement, stated once for the
    // manifest version slots and these generation slots alike)
    val dst = new Path(s"$indexPath/gen-$next")
    val won = graft.core.FsOps.renameNoOverwrite(fs, new Path(tmp), dst)
    if (!won) {
      try fs.delete(new Path(tmp), true) catch { case NonFatal(_) => () }
      return false
    }
    // retire everything older than the immediate predecessor (grace
    // for readers that resolved just before the marker landed):
    // earlier generations, and — once the first generation has itself
    // been superseded — the flat pre-compaction files at the root
    gens.filter(_ < cur.getOrElse(0L)).foreach { g =>
      try fs.delete(new Path(s"$indexPath/gen-$g"), true)
      catch { case NonFatal(_) => () }
    }
    if (next >= 2) {
      try fs.listStatus(new Path(indexPath)).toSeq
        .filter(s => s.isFile)
        .foreach(s => fs.delete(s.getPath, false))
      catch { case NonFatal(_) => () }
    }
    // the live serving state flips ATOMICALLY under the instance
    // monitor — generation AND quantizer together, so a fire or
    // serving read between the marker landing and this update can
    // never pair the new generation with stale centroids (it either
    // sees the old consistent pair or, via syncGeneration's own
    // resolve, adopts the new generation's persisted quantizer)
    synchronized {
      knownResolved = s"$indexPath/gen-$next"
      quantizer = cents
      firesSinceCompact = 0
    }
    true
  }

  /** Persist the frozen quantizer beside the index: (index parquet,
    * centroids parquet) is the complete serving state, so an
    * out-of-process server (the RPC `knn_ivf` job) can answer queries
    * from the maintained index without sharing this JVM.
    */
  def writeCentroids(path: String): Unit = synchronized {
    Similarity.centroidsDF(spark, quantizer).write.mode("overwrite").parquet(path)
  }

  /** ANN top-k served from the maintained index (cell-pruned scan;
    * nProbe = nCells degenerates to exact search) under the LIVE
    * quantizer. The generation is resolved ONCE and its quantizer
    * snapshotted with it, so a concurrent flip can never pair a new
    * index with old centroids.
    */
  def topK(queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val (idxDf, cents) = pinServingPair()
    Similarity.ivfTopKIndexed(idxDf, queries, k, cents, nProbe, id, emb)
  }

  /** [[topK]] with the probe depth DERIVED from a recall contract
    * against this trigger's own index
    * ([[graft.ops.Similarity.ivfProbeForRecall]] — the index rows
    * carry full vectors, so the calibration truth never needs the
    * base table): the serving call a user should reach for when they
    * know the recall they need rather than a probe geometry. The
    * calibration and the serve share ONE pinned (index, quantizer)
    * pair — a flip landing during the calibration job cannot make
    * the serve probe a new generation with the calibrated-against
    * centroids.
    */
  def topKAtRecall(queries: DataFrame, k: Int,
      recallFloor: Double = 0.85, nCal: Int = 64): DataFrame = {
    val (idxDf, cents) = pinServingPair()
    val nProbe = Similarity.ivfProbeForRecall(
      idxDf.select(col(id), col(emb)), queries, k, cents, recallFloor, nCal, id, emb)
    Similarity.ivfTopKIndexed(idxDf, queries, k, cents, nProbe, id, emb)
  }

  /** One consistent (index DataFrame, quantizer) snapshot: resolved
    * under the lock, the DataFrame pinned to the resolved generation
    * path (grace retention keeps it readable one flip further).
    */
  private def pinServingPair(): (DataFrame, Array[Seq[Float]]) = synchronized {
    val resolved = syncGeneration()
    (spark.read.parquet(resolved), quantizer)
  }

  /** Continuous serving: a STREAM of query vectors answered per
    * micro-batch from the maintained index (stream-side foreachBatch —
    * each batch of queries runs the same cell-pruned plan as [[topK]],
    * so a batch and a stream answer identically; the index is re-read
    * per batch and therefore sees concurrent [[fire]] appends). The
    * results of each micro-batch go to `sink`.
    *
    * A micro-batch pins one generation for its whole plan; grace
    * retention keeps ONE spent generation, so two publishes landing
    * back-to-back can retire the pinned one mid-read. That transient
    * is retried against a freshly-resolved pair instead of killing
    * the long-lived streaming query — consistent with foreachBatch's
    * own contract that sinks are idempotent per batch (Spark itself
    * re-runs batches on failure).
    */
  def attachQueries(
      queryStream: DataFrame, k: Int, nProbe: Int, checkpointDir: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    attachQueriesKeyed(queryStream, k, nProbe, checkpointDir)(
      (hits: DataFrame, _: Long) => sink(hits))

  /** [[attachQueries]] with the foreachBatch epoch id passed through to
    * the sink — the idempotence key foreachBatch's contract expects a
    * sink to dedupe on: the stale-generation retry below (and Spark's
    * own failure re-runs) re-invoke the sink for the SAME batch with
    * the SAME id, so a parquet/Delta/exactly-once sink can recognize
    * the re-delivery instead of double-writing it. (A distinct name,
    * not an overload: Scala resolves curried overloads on the first
    * parameter list alone, which is identical here.)
    */
  def attachQueriesKeyed(
      queryStream: DataFrame, k: Int, nProbe: Int, checkpointDir: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          var attempts = 0
          var done = false
          while (!done) {
            attempts += 1
            try { sink(topK(batch, k, nProbe), batchId); done = true }
            catch {
              case NonFatal(e) if attempts < 3 &&
                  IvfIndexTrigger.isStaleGenerationRead(e, indexPath) =>
                // re-pin: topK re-resolves the current generation.
                // Logged + counted — repeated retries mean publishes
                // are outrunning the one-generation grace window and
                // the publish cadence needs tuning
                IvfIndexTrigger.staleServeRetries.incrementAndGet()
                IvfIndexTrigger.log.warn(
                  s"serving micro-batch re-pinned $indexPath after its " +
                    s"generation retired mid-read (attempt $attempts): " +
                    e.getMessage)
            }
          }
        }
      }
      .start()
}

object IvfIndexTrigger {
  private[streaming] val Marker = "_COMPLETE"
  private[graft] val QuantizerDir = "_quantizer"

  /** Publisher seal: present in a generation while a compaction or
    * blue/green refresh is snapshotting/rebuilding it (underscore
    * prefix — parquet readers ignore it). Appenders seeing a live
    * seal back off until the flip.
    */
  private[graft] val SealFile = "_SEALING"

  /** Appender ticket prefix (dot prefix — invisible to readers): one
    * short-lived file per in-flight [[IvfIndexTrigger.fire]] append;
    * publishers drain these before snapshotting.
    */
  private[graft] val TicketPrefix = ".ticket_"

  /** A seal older than this is a crashed publisher and is broken by
    * the next appender/publisher. A LIVE publisher renews its seal
    * every quarter-expiry from a daemon heartbeat for as long as it
    * holds it (registered by acquireSeal, cancelled by removeSeal) —
    * so the expiry can stay SHORT (a crashed publisher parks ingest
    * for at most this long) without bounding how long a legitimate
    * drain + retrain + rebuild may take. Wall-clock lease semantics —
    * same bounded-skew assumption as the catalog's writer lease.
    */
  private[graft] val SealExpiryMs: Long = 60000L

  /** A ticket whose mtime is older than this is a CRASHED appender. A
    * live appender heartbeat-renews its ticket every quarter-expiry
    * for as long as the parquet write runs (r12 — only the writing
    * THREAD is blocked in the commit, not the process), so this is no
    * longer a ceiling on one batch's duration: a legitimately long
    * write (plausible at 100 TB batch sizes) stays visibly live and a
    * draining publisher waits for it. A crashed appender
    * symmetrically parks publishers' drains for at most this long
    * (its uncommitted task files sit in `_temporary`, invisible to
    * readers). Should renewal itself lapse past the expiry under a
    * concurrent publisher, the appender's ack fence (tryAppendOnce)
    * flags the batch as uncertain and fire() recovers it mechanically
    * (r13): wait the publisher out, diff the batch against the live
    * relation by id, re-append exactly the excluded rows — never a
    * silent exclusion, never a duplicating blind retry.
    */
  private[graft] val TicketExpiryMs: Long = 600000L

  // seal renewal: one daemon thread for every held seal in the
  // process (the catalog lease heartbeat pattern); per-path monitors
  // order renewals against removal so a cancelled heartbeat can never
  // resurrect a seal removeSeal just deleted
  private val sealScheduler = {
    val s = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-ivf-seal-heartbeat"); t.setDaemon(true); t
      })
    s
  }
  private val sealHeartbeats = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ScheduledFuture[_]]()
  // ticket touches get their OWN small pool: they are per-append
  // blocking FS calls against a possibly-browning-out store — exactly
  // the condition the lease protocol must survive — and sharing the
  // single seal-renewal thread would let one hung setTimes stall every
  // publisher's seal renewal in the process (an appender would then
  // break the "expired" seal and abort a healthy multi-minute rebuild
  // at the nonce fence)
  private val ticketScheduler = {
    val s = java.util.concurrent.Executors.newScheduledThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-ivf-ticket-heartbeat"); t.setDaemon(true); t
      })
    s
  }
  // keyed by the INDEX ROOT, not the generation path, so the map is
  // bounded by live indexes (generation numbers grow without bound on
  // a long-lived trigger) and renewal/fence/removal across a flip all
  // order through one monitor
  private val sealLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[streaming] def sealLock(indexRoot: String): Object =
    sealLocks.computeIfAbsent(indexRoot, _ => new Object)

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[IvfIndexTrigger])

  /** A read that failed because its pinned generation was retired
    * under it (two publishes outran the one-generation grace window):
    * a FileNotFound — or Spark's FAILED_READ_FILE.FILE_NOT_EXIST
    * wrapper — anywhere in the cause chain whose message names a path
    * UNDER this index root. Only this shape is retried by serving
    * paths; a sink's own missing-file failure (an external target or
    * source) names a foreign path and propagates.
    */
  private[graft] def isStaleGenerationRead(
      e: Throwable, indexRoot: String): Boolean = {
    // normalize the root to (authority, path): messages may carry the
    // path qualified ("hdfs://nn:8020/data/idx/...") or bare
    // ("/data/idx/..."), independent of how the trigger's root was
    // written — either side may have the authority the other drops —
    // and a miss here silently disables the retry (the streaming
    // query dies on a genuine stale-generation transient; fire()'s
    // recovery diff surfaces "append failed" for a committed batch).
    // namesPathUnder() accepts both forms but pins the AUTHORITY when
    // both sides carry one, so a foreign bucket's missing file never
    // classifies as our stale read.
    val (rootAuth, rootPath) = {
      val u = try new Path(indexRoot).toUri catch { case NonFatal(_) => null }
      val p = if (u == null) "" else Option(u.getPath).getOrElse("")
      val a = if (u == null) "" else Option(u.getAuthority).getOrElse("")
      if (p.isEmpty) ("", indexRoot) else (a, p)
    }
    var cur: Throwable = e
    var depth = 0
    while (cur != null && depth < 10) {
      val msg = Option(cur.getMessage)
      val missingFileShape = cur.isInstanceOf[java.io.FileNotFoundException] ||
        msg.exists(m => m.contains("FILE_NOT_EXIST") ||
          m.contains("PATH_NOT_FOUND"))
      if (missingFileShape &&
          msg.exists(namesPathUnder(_, rootPath, rootAuth)))
        return true
      cur = if (cur.getCause eq cur) null else cur.getCause
      depth += 1
    }
    false
  }

  /** Does `msg` name a file at or under the root (`rootAuth`,
    * `rootPath`)? An occurrence of the path counts when it is either
    *  - anchored at a message boundary (start, whitespace, quotes,
    *    ':', brackets, ...) — the unqualified form — or
    *  - the path root of a qualified URI ("scheme://authority/path"),
    *    in which case the URI's authority must equal `rootAuth` when
    *    the root carries one (a BARE root is the default filesystem,
    *    which messages may qualify with any authority).
    * The character AFTER the occurrence must be '/' or a delimiter —
    * never another path-name character — so root "bucket/idx" matches
    * ".../bucket/idx/gen-0" but neither "other-bucket/idx-out" nor
    * "bucket/idx%20archive" (bare contains() accepted all three).
    */
  private def namesPathUnder(
      msg: String, rootPath: String, rootAuth: String): Boolean = {
    def isDelim(c: Char): Boolean =
      c.isWhitespace || "\"'`()[]{},;:=".indexOf(c.toInt) >= 0
    var from = 0
    while (from <= msg.length - rootPath.length) {
      val i = msg.indexOf(rootPath, from)
      if (i < 0) return false
      val j = i + rootPath.length
      val afterOk = j >= msg.length || msg.charAt(j) == '/' ||
        isDelim(msg.charAt(j))
      if (afterOk) {
        if (i == 0 || isDelim(msg.charAt(i - 1))) return true
        // not boundary-anchored: accept only the path root of a
        // qualified URI whose authority we trust — the first '/'
        // after "scheme://" is exactly this occurrence
        val ss = msg.lastIndexOf("://", i - 1)
        if (ss >= 0 && msg.indexOf('/', ss + 3) == i &&
            (rootAuth.isEmpty || msg.substring(ss + 3, i) == rootAuth))
          return true
      }
      from = i + 1
    }
    false
  }

  /** Outcome of one fenced append attempt (see tryAppendOnce). */
  private sealed trait AppendOutcome
  private case object Appended extends AppendOutcome
  private case object SealBackoff extends AppendOutcome
  private case object AckUncertain extends AppendOutcome

  /** Observability: serving micro-batches re-pinned after their
    * generation retired mid-read. A climbing counter means publishes
    * are outrunning grace retention.
    */
  private[graft] val staleServeRetries =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observability: ticket heartbeat touches that failed OR whose
    * mtime verifiably did not move (a silently no-op setTimes store).
    * A climbing counter is a renewal brown-out — visible here BEFORE
    * it accrues into a lapse the ack fence has to judge.
    */
  private[graft] val ticketRenewalFailures =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observability: appends whose ack fence tripped (renewal lapsed
    * under a concurrent publisher) and were recovered by the
    * diff-and-re-append path in [[IvfIndexTrigger.fire]]. Any nonzero
    * value means ticket renewal is lapsing — check
    * [[ticketRenewalFailures]] and the store's setTimes behavior.
    */
  private[graft] val ackFenceRecoveries =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observability for tests: how many times an appender backed off on
    * a live seal or a moved generation.
    */
  private[graft] val sealWaits = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test-only interleaving hook, invoked inside [[refreshQuantizer]]
    * after the seal + drain + corpus snapshot, before the publish —
    * the exact window the r10 race lost appends in.
    */
  @volatile private[graft] var testHookMidRefresh: Option[String => Unit] = None

  /** Test-only interleaving hook, invoked inside [[compact]] and
    * [[refreshQuantizer]] after the monitor snapshot of the resolved
    * generation, BEFORE acquiring the seal — the window where a
    * foreign flip would let a publisher seal a retired generation
    * (the r12 publisher-side check-order fix).
    */
  @volatile private[graft] var testHookPreSeal: Option[String => Unit] = None

  /** Test-only hook, invoked inside a CLEAR append attempt after the
    * ticket is visible and the seal/resolution checks passed, before
    * the parquet write — stalls the write window so tests can drive a
    * draining publisher against a live, renewing ticket.
    */
  @volatile private[graft] var testHookDuringAppend: Option[String => Unit] = None

  /** Test-only hook, invoked at the top of each syncGeneration
    * adoption attempt (after the stale resolve, before the currency
    * re-check) — flips generations in exactly the window that makes
    * the adoption loop retry, so tests can drive its bound.
    */
  @volatile private[graft] var testHookMidSync: Option[String => Unit] = None

  private def completeGens(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Seq[Long] = {
    val p = new Path(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .map(_.getPath.getName.stripPrefix("gen-"))
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .filter(g => fs.exists(new Path(s"$path/gen-$g/$Marker")))
  }

  /** Resolve an index path to its CURRENT data location: the highest
    * complete generation written by [[IvfIndexTrigger.compact]], or
    * the path itself for a flat (never-compacted) index. Out-of-process
    * consumers (the RPC `knn_ivf` job) resolve through this, so a
    * compacted and an uncompacted index serve identically.
    */
  def resolveIndexPath(spark: SparkSession, path: String): String = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    completeGens(fs, path).maxOption.map(g => s"$path/gen-$g").getOrElse(path)
  }

  /** Blue/green refresh of an index PATH without a live trigger
    * instance — the serving-ops entry point (the RPC
    * `knn_ivf_refresh` job): adopt the resolved generation's
    * persisted quantizer (a flat pre-generation index seeds from a
    * deterministic sample of its own rows instead), retrain from the
    * index's vectors, rebuild into the next generation and flip. The
    * whole body is [[IvfIndexTrigger.refreshQuantizer]] on a
    * throwaway instance, so embedded and over-the-wire refreshes can
    * never diverge. Returns the retrained cell count, or None for a
    * missing or empty index.
    */
  def refreshPath(spark: SparkSession, indexPath: String,
      nCells: Int = 0, trainIters: Int = 3,
      id: String = "vec_id", emb: String = "embedding",
      ticketExpiryMs: Long = 0L): Option[Int] = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(indexPath))) return None
    val rows = spark.read.parquet(resolveIndexPath(spark, indexPath))
    if (rows.isEmpty) return None
    // seed centroids only matter for a FLAT index with no persisted
    // quantizer — the constructor adopts gen-N/_quantizer otherwise
    // and refresh retrains regardless, so don't pay the two seed jobs
    // (distinct-cell count + hash-sample sort) in the common
    // already-refreshed case; cell count defaults to the index's own
    val seed =
      if (resolveQuantizerPath(spark, indexPath).isDefined) Array.empty[Seq[Float]]
      else Similarity.sampledCentroids(rows,
        if (nCells > 0) nCells
        else math.max(1, rows.select("cell").distinct().count().toInt), id, emb)
    // the drain clock must match the index's appenders (the class-doc
    // lease rule): an operator who configured a longer ticket expiry
    // on the ingest side passes the same value here, or the drain
    // would presume a slow-but-renewing appender dead
    val trig = new IvfIndexTrigger(spark, seed, indexPath, id, emb,
      ticketExpiryMs = ticketExpiryMs)
    trig.refreshQuantizer(nCells, trainIters)
    Some(trig.currentQuantizer.length)
  }

  /** The quantizer PAIRED with the resolved generation, if that
    * generation carries one (`gen-N/_quantizer`, written by compact
    * and refreshQuantizer since r10). Serving consumers (the RPC
    * `knn_ivf` job) prefer this over an external centroids path: a
    * blue/green quantizer refresh flips index and quantizer in one
    * marker, so reading the pair from one resolved generation can
    * never mix an old index with new centroids or vice versa.
    */
  def resolveQuantizerPath(spark: SparkSession, path: String): Option[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resolved = resolveIndexPath(spark, path)
    val q = s"$resolved/$QuantizerDir"
    if (fs.exists(new Path(q))) Some(q) else None
  }
}

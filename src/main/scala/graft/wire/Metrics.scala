package graft.wire

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray, DoubleAdder}

/** Minimal Prometheus-text-format metrics, mirroring the reference's
  * observability surface (metrics/metrics.go): RPC request-duration
  * histograms (total + per-method successes, frontend/server.go:60-64),
  * the websocket connection gauge (frontend/stream/stream.go:151-156),
  * the write-call histogram (WriteCSMDuration) and the startup gauge.
  * Metric names/labels match the reference so existing dashboards
  * carry over.
  *
  * Hand-rolled on atomics (no client library in the offline sandbox —
  * and none needed: a histogram is bucket counters + sum). Exposition
  * follows the Prometheus text format v0.0.4.
  */
final class Metrics {
  import Metrics._

  val startupSeconds = new Gauge
  val wsConnections = new Gauge
  /** Exact probe-depth calibrations run by the `knn_ivf` job's
    * `probe_recall` path (engine-specific superset metric): each one
    * is a bounded exact pass over the index, so the ratio of this to
    * knn_ivf requests is the calibration cache's miss rate — and a
    * test/operator can observe that an append or flip actually
    * re-calibrated rather than serving a stale depth.
    */
  val probeCalibrations = new Gauge
  /** All requests, success or error (RPCTotalRequestDuration). */
  val rpcTotal = new Histogram(DefaultBuckets)
  /** Successful requests partitioned by method (label "method"). */
  private val rpcByMethod = new ConcurrentHashMap[String, Histogram]()
  /** Write-call durations (WriteCSMDuration buckets, metrics.go). */
  val writeDuration = new Histogram(WriteBuckets)

  def observeMethod(method: String, seconds: Double): Unit =
    rpcByMethod.computeIfAbsent(method, _ => new Histogram(DefaultBuckets))
      .observe(seconds)

  /** Prometheus text exposition of every registered metric. */
  def render(): String = {
    val sb = new StringBuilder
    def gauge(name: String, help: String, g: Gauge): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      sb.append(s"$name ${fmt(g.get)}\n")
    }
    gauge(s"${Ns}_startup_seconds", "Seconds taken by the startup", startupSeconds)
    gauge(s"${Ns}_ws_connections",
      "Current number of ws connections established", wsConnections)
    // monotonic in practice but exported as a gauge — so the name must
    // NOT carry the counter-reserved `_total` suffix (OpenMetrics
    // parsers reject a gauge named `_total`)
    gauge(s"${Ns}_ops_probe_calibrations",
      "Exact probe-depth calibrations run for knn_ivf probe_recall requests",
      probeCalibrations)
    // IVF seal/ticket protocol counters (engine-specific superset
    // metrics, process-local like every gauge here): sampled live from
    // the trigger at render time. Climbing seal_waits = appends are
    // backing off on publisher seals; climbing serve_repins = publishes
    // are outrunning the one-generation grace window and retiring
    // generations under serving micro-batches — both are the cadence
    // signals an operator tunes compactEvery / refresh frequency by.
    def raw(name: String, help: String, v: Double): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      sb.append(s"$name ${fmt(v)}\n")
    }
    raw(s"${Ns}_ops_ivf_seal_waits",
      "IVF appender backoffs on a live publisher seal in this process",
      graft.streaming.IvfIndexTrigger.sealWaits.get.toDouble)
    raw(s"${Ns}_ops_ivf_serve_repins",
      "IVF serving micro-batches re-pinned after their generation retired mid-read in this process",
      graft.streaming.IvfIndexTrigger.staleServeRetries.get.toDouble)
    // renewal brown-outs surface HERE before they accrue into a lapse
    // the ack fence must judge; a nonzero ack_recoveries means a lapse
    // actually happened under a publisher and fire() self-healed it
    raw(s"${Ns}_ops_ivf_ticket_renewal_failures",
      "IVF appender ticket heartbeat touches that failed or did not move the ticket mtime in this process",
      graft.streaming.IvfIndexTrigger.ticketRenewalFailures.get.toDouble)
    raw(s"${Ns}_ops_ivf_ack_recoveries",
      "IVF appends recovered by diff-and-re-append after their ack fence tripped in this process",
      graft.streaming.IvfIndexTrigger.ackFenceRecoveries.get.toDouble)
    histogram(sb, s"${Ns}_rpc_total_request_duration_seconds",
      "RPC request processing time for every request", Seq("" -> rpcTotal))
    val byMethod = {
      import scala.jdk.CollectionConverters._
      rpcByMethod.asScala.toSeq.sortBy(_._1)
        .map { case (m, h) => s"""method="$m"""" -> h }
    }
    if (byMethod.nonEmpty)
      histogram(sb, s"${Ns}_rpc_successful_request_duration_seconds",
        "RPC request processing time for successful requests partitioned by method",
        byMethod)
    histogram(sb, s"${Ns}_write_csm_duration_seconds",
      "WriteCSM call duration", Seq("" -> writeDuration))
    sb.toString
  }

  private def histogram(
      sb: StringBuilder, name: String, help: String,
      series: Seq[(String, Histogram)]): Unit = {
    sb.append(s"# HELP $name $help\n# TYPE $name histogram\n")
    series.foreach { case (labels, h) =>
      def lbl(extra: String): String = {
        val all = Seq(labels, extra).filter(_.nonEmpty).mkString(",")
        if (all.isEmpty) "" else s"{$all}"
      }
      var cum = 0L
      h.buckets.zipWithIndex.foreach { case (le, i) =>
        cum += h.bucketCount(i)
        sb.append(s"${name}_bucket${lbl(s"""le="${fmt(le)}"""")} $cum\n")
      }
      sb.append(s"${name}_bucket${lbl("""le="+Inf"""")} ${h.count}\n")
      sb.append(s"${name}_sum${lbl("")} ${fmt(h.sum)}\n")
      sb.append(s"${name}_count${lbl("")} ${h.count}\n")
    }
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
}

object Metrics {
  /** Reference metric namespace (metrics/metrics.go: alpaca/marketstore). */
  val Ns = "alpaca_marketstore"
  /** prometheus.DefBuckets. */
  val DefaultBuckets: Array[Double] =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)
  /** WriteCSMDuration buckets (metrics/metrics.go). */
  val WriteBuckets: Array[Double] =
    Array(0.0001, 0.001, 0.005, 0.01, 0.05, 0.1, 0.25, 0.5, 1)

  final class Gauge {
    private val bits = new AtomicLong(java.lang.Double.doubleToLongBits(0.0))
    def set(v: Double): Unit = bits.set(java.lang.Double.doubleToLongBits(v))
    def inc(): Unit = add(1.0)
    def dec(): Unit = add(-1.0)
    def add(d: Double): Unit = {
      var done = false
      while (!done) {
        val cur = bits.get
        val next = java.lang.Double.doubleToLongBits(
          java.lang.Double.longBitsToDouble(cur) + d)
        done = bits.compareAndSet(cur, next)
      }
    }
    def get: Double = java.lang.Double.longBitsToDouble(bits.get)
  }

  /** Cumulative histogram: per-bucket counters + sum + count. */
  final class Histogram(val buckets: Array[Double]) {
    private val perBucket = new AtomicLongArray(buckets.length)
    private val total = new AtomicLong(0L)
    private val sumAdder = new DoubleAdder
    def observe(seconds: Double): Unit = {
      // branchless upper-bound binary search (buckets are sorted
      // ascending): first bucket with seconds <= bound
      var lo = 0
      var hi = buckets.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (seconds <= buckets(mid)) hi = mid else lo = mid + 1
      }
      if (lo < buckets.length) perBucket.incrementAndGet(lo)
      total.incrementAndGet()
      sumAdder.add(seconds)
    }
    /** NON-cumulative count of bucket i (render accumulates). */
    def bucketCount(i: Int): Long = perBucket.get(i)
    def count: Long = total.get
    def sum: Double = sumAdder.sum()
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling for training-data mixing: keep each
  * document with a per-domain probability (e.g. up-weight curated
  * sources, down-weight crawl), decided by a content-independent hash
  * of (seed, id) — so the sample is reproducible across runs and
  * engines, composable with any upstream filter, and re-seedable for
  * disjoint epochs.
  *
  * Keep rule: the first 8 hex chars of md5("seed:id") compared
  * lexicographically against a per-domain threshold. md5's hex is
  * uniform, so P(prefix < thr(r)) ≈ r within 2⁻³² — and the same rule
  * is expressible verbatim in any SQL engine (the DuckDB oracle uses
  * the identical strings), unlike engine-native hash functions.
  *
  * Scale design: one broadcast join against the (tiny, config-sized)
  * rate table plus a codegen'd per-row hash — no shuffle of the
  * corpus at all.
  */
object Sampling {

  /** Hex threshold for a keep-rate: first-8-hex-chars(md5) < thr keeps
    * ≈ `rate` of rows. Rates ≥ 1 map to the sentinel "g0000000" which
    * sorts above every hex string (keep all); rates ≤ 0 to "00000000"
    * (keep none).
    */
  private[graft] def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g0000000"
    else f"${math.max(0L, math.floor(rate * 4294967296.0).toLong)}%08x"

  /** Sample `df` keeping ≈ rates(domain) of each domain's rows
    * (`defaultRate` for domains not in the map). Deterministic in
    * (seed, id): the same row is kept or dropped on every run.
    */
  def weighted(df: DataFrame, rates: Map[String, Double],
               defaultRate: Double = 0.0, seed: String = "graft",
               id: String = "doc_id", domain: String = "source"): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val rateTable = rates.toSeq.sortBy(_._1)
      .map { case (d, r) => (d, hexThreshold(r)) }.toDF(domain, "__thr")
    df.join(broadcast(rateTable), Seq(domain), "left")
      .where(substring(
          md5(concat(lit(seed), lit(":"), col(id).cast("string"))), 1, 8)
        < coalesce(col("__thr"), lit(hexThreshold(defaultRate))))
      .drop("__thr")
  }

  /** Sample each domain down to ≈ a TOKEN budget — the mixing shape a
    * corpus build actually runs ("2B tokens of crawl, everything from
    * curated"): keep-rate per domain = budget / total-domain-tokens
    * (capped at 1), then the same deterministic md5-threshold rule as
    * [[weighted]]. Rate derivation is one bounded aggregation
    * (≤ #domains rows collected); domains without a budget are
    * dropped. Expected token yield per domain is the budget within
    * sampling noise (the hash is content-independent, so long and
    * short documents are kept at the same rate).
    */
  def toTokenBudget(df: DataFrame, budgets: Map[String, Long],
                    tokens: String = "n_tokens", seed: String = "graft",
                    id: String = "doc_id", domain: String = "source"): DataFrame = {
    val totals = df.groupBy(domain).agg(sum(col(tokens)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = budgets.map { case (d, b) =>
      d -> math.min(1.0, b.toDouble / math.max(1L, totals.getOrElse(d, 0L)).toDouble)
    }
    weighted(df, rates, defaultRate = 0.0, seed = seed, id = id, domain = domain)
  }

  /** Stratified selection: the top `k` rows of each domain by `score`
    * (ties broken by ascending id — deterministic). One window shuffle
    * partitioned by domain; the rank filter prunes before anything
    * downstream, so the selected corpus, not the scored corpus, flows
    * on.
    */
  def topKByDomain(df: DataFrame, k: Int, score: String,
                   domain: String = "source", id: String = "doc_id"): DataFrame =
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(domain).orderBy(col(score).desc, col(id))))
      .where(col("__rk") <= k)
      .drop("__rk")
}

package graft.sql

import graft.catalog.BucketCatalog
import graft.core.TimeBucketKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import scala.util.Try

/** Backtick-TBK table identifiers in PLAIN Spark SQL:
  * {{{
  *   spark.sql("SELECT Close FROM graft.`AAPL/1Min/OHLC` WHERE Epoch >= 60")
  * }}}
  * resolved by a Catalyst rule instead of [[SqlService]]'s per-query
  * temp-view registration — the reference's backtick TBK names
  * (sqlparser/selectrelation.go table references) as first-class
  * Spark SQL identifiers, usable inside joins, subqueries, CTEs and
  * set ops with no pre-registration step.
  *
  * Spark-first shape: option (c) of the extension ladder — a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * (`injectResolutionRule`), substituting each
  * `graft.\`SYM/TF/AG\`` [[UnresolvedRelation]] with the ANALYZED
  * plan of `BucketCatalog.read` for that key, exactly how Spark
  * inlines views. Because the substituted plan IS the catalog's read
  * plan, every storage optimization rides along unchanged: manifest
  * snapshot pinning, partition pruning on timeframe/year/sbucket,
  * the pushed symbol predicate of the bucketed layout, and parquet
  * Epoch filter pushdown (PlanSpec asserts them on a SQL-resolved
  * plan).
  *
  * Session-extension timing: an analyzer reads the injected rules
  * when it is BUILT, so [[enable]] injects into the session's
  * extensions (once per name) and returns a session CLONE — same
  * runtime conf, temp views and UDFs, but a lazily rebuilt analyzer
  * that sees the rule even when the original session's analyzer was
  * already materialized. The original session is untouched unless
  * its own analyzer had not been built yet.
  */
object TbkSql {

  // process-wide name → catalog bindings, read by the rule AT APPLY
  // TIME: the LATEST enable for a name wins everywhere (re-running a
  // pipeline that rebuilds its catalog just rebinds)
  private val bindings =
    new java.util.concurrent.ConcurrentHashMap[String, BucketCatalog]()

  // one rule injection per (extensions object, name): re-enabling
  // only rebinds — the analyzer must not accumulate a duplicate rule
  // per call (a per-request enable in a long-lived server would
  // otherwise grow analysis cost without bound). WeakHashMap so a
  // discarded session's extensions object stays collectable.
  private val injected =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSessionExtensions,
      scala.collection.mutable.Set[String]]()

  private[sql] def catalogFor(name: String): Option[BucketCatalog] =
    Option(bindings.get(name.toLowerCase))

  /** Bind `catalogName` to `catalog` and return a session whose SQL
    * resolves `catalogName`.`TBK` identifiers — a CLONE of the given
    * session (runtime conf, temp views and UDFs carried over; only
    * the analyzer is rebuilt so the rule takes effect). The binding
    * is dynamic and process-wide: the most recent `enable` for a
    * name wins in every session carrying the rule — bind DISTINCT
    * names for catalogs used concurrently.
    */
  def enable(spark: SparkSession, catalog: BucketCatalog,
             catalogName: String = "graft"): SparkSession = {
    bindings.put(catalogName.toLowerCase, catalog)
    val ext = org.apache.spark.sql.graft.GraftColumns.extensions(spark)
    injected.synchronized {
      val names = injected.computeIfAbsent(ext,
        _ => scala.collection.mutable.Set.empty[String])
      if (names.add(catalogName.toLowerCase))
        ext.injectResolutionRule(_ => new ResolveTbkRelations(catalogName))
    }
    org.apache.spark.sql.graft.GraftColumns.cloneWithFreshState(spark)
  }
}

/** The resolution rule: a two-part identifier whose first part is the
  * graft catalog name and whose second parses as a TimeBucketKey
  * becomes the bound catalog's read plan. Anything else is left for
  * the built-in resolution rules (and their error reporting).
  */
class ResolveTbkRelations(catalogName: String) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase(catalogName) =>
      (Try(TimeBucketKey.parse(u.multipartIdentifier(1))).toOption,
        TbkSql.catalogFor(catalogName)) match {
        case (Some(tbk), Some(cat)) => cat.read(tbk).queryExecution.analyzed
        case _ => u // not a TBK / unbound name: built-in rules report it
      }
  }
}

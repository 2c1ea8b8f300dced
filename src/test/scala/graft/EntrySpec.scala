package graft

/** Driver-contract surface: entry() smoke, queries/oracle key parity. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; every query has an oracle or is rows-only by design") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    // the reverse direction is CLOSED by an explicit allowlist: the
    // only entries allowed to ship without a DuckDB oracle are the
    // approximate-by-design four, each of which has an oracled exact
    // sibling and a per-run recall number in Bench. A new entry
    // missing an oracle fails HERE, not in the driver's JSON.
    val approximateByDesign = Set(
      "q_dedup_simhash", "q_knn_ivf", "q_knn_lsh", "q_knn_pq")
    assert(q.diff(o) == approximateByDesign,
      s"queries without oracles beyond the documented approximate set: " +
        s"${q.diff(o).diff(approximateByDesign)} (missing from queries: " +
        s"${approximateByDesign.diff(q.diff(o))})")
  }

  test("all queries run on sf0.001 and produce rows") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}

package graft

/** Guards the driver's t1 smoke: the flagship query must return rows on
  * sf0.001, and every registered oracle key must have a query (and vice
  * versa a query may legitimately omit its oracle only for approximate ops).
  */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registration is complete: queries == oracles ++ declared rows-only") {
    // the round-14 failure class: a gate registered without its oracle (or
    // without being declared rows-only) must fail the suite BY NAME
    val unaccounted =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- SparkEntry.rowsOnly
    assert(unaccounted.isEmpty,
      s"queries with neither an oracle nor a rows-only declaration: $unaccounted")
    val both = SparkEntry.oracleSql.keySet.intersect(SparkEntry.rowsOnly)
    assert(both.isEmpty, s"declared rows-only but an oracle exists: $both")
    val stale = SparkEntry.rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only declarations without a query: $stale")
  }

  test("every registered query runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    // q_neardup_* may be legitimately empty on a dup-free corpus — everything
    // else must produce rows
    assert(empty.forall(_.startsWith("q_neardup")), s"empty results: $empty")
  }
}

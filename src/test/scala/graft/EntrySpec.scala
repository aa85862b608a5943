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

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Sessionize, TimeJoin}

/** The as-of join: hand-pinned edges (inclusive equality, no-prior-right
  * NULL, tie resolution) plus a ScalaCheck equivalence against the
  * brute-force per-row model. Plus the sessionizer's gap edges.
  */
class AsOfJoinSpec extends SparkSpec {

  test("sessionize: strict gap comparison, first-event session, key isolation") {
    val events = dp(Seq(
      ("a", "2024-01-01T00:00:00Z", 1.0),
      ("a", "2024-01-01T00:10:00Z", 2.0),  // gap 600s == gap limit: SAME session
      ("a", "2024-01-01T00:20:01Z", 4.0),  // gap 601s > limit: new session
      ("b", "2024-01-01T00:00:05Z", 8.0))) // other key: own session 1
    val out = Sessionize.sessions(events, Seq("stream_id"), gapUs = 600000000L)
      .orderBy("stream_id", "session_seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      ("a", 1L, 2L, 3.0),  // two events, values 1+2
      ("a", 2L, 1L, 4.0),
      ("b", 1L, 1L, 8.0)))
  }

  test("as-of join: inclusive equality, NULL before first right, latest-previous match") {
    import spark.implicits._
    val left = Seq(
      ("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 20L, "l3"),
      ("b", 7L, "l4")).toDF("k", "ts", "tag")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 8L, 9.0)).toDF("k", "ts", "value")
    val out = TimeJoin.asOf(left, right, keyCols = Seq("k"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("a", 5L, "l1", None),        // no right at-or-before 5
      ("a", 10L, "l2", Some(1.0)),  // equal ts matches (inclusive)
      ("a", 20L, "l3", Some(2.0)),  // latest previous, not first
      ("b", 7L, "l4", None)))       // other key's rights invisible
  }

  test("as-of join: equal-ts right rows resolve to the largest tie value") {
    import spark.implicits._
    val left = Seq(("a", 10L, "l")).toDF("k", "ts", "tag")
    val right = Seq(("a", 10L, 1.0, 1L), ("a", 10L, 2.0, 2L))
      .toDF("k", "ts", "value", "seq")
    val out = TimeJoin.asOf(left, right, keyCols = Seq("k"),
      tieCol = Some("seq")).collect()
    assert(out.head.getDouble(3) === 2.0)
  }

  test("range join: inclusive endpoints, overlapping intervals, cross-bucket spans") {
    import spark.implicits._
    val ivs = Seq(
      ("a", 10L, 20L, "i1"), ("a", 15L, 40L, "i2"), // overlapping
      ("b", 10L, 20L, "i3"))
      .map { case (k, s, e, id) =>
        (k, new java.sql.Timestamp(s * 1000), new java.sql.Timestamp(e * 1000), id)
      }.toDF("k", "start", "end", "iv")
    val pts = Seq(("a", 10L), ("a", 15L), ("a", 20L), ("a", 41L), ("b", 15L))
      .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000)) }
      .toDF("k", "ts")
    // bucket 7s: intervals span multiple buckets, boundaries off-bucket
    val got = operators.TimeJoin.rangeJoin(pts, ivs, Seq("k"), bucketUs = 7000000L)
      .select("k", "ts", "iv").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000, r.getString(2)))
      .toSet
    assert(got === Set(
      ("a", 10L, "i1"),                    // inclusive start
      ("a", 15L, "i1"), ("a", 15L, "i2"),  // overlapping intervals both match
      ("a", 20L, "i1"), ("a", 20L, "i2"),  // inclusive end
      ("b", 15L, "i3")))                   // (a,41) matches nothing
  }

  test("range join equals the brute-force theta model on random inputs") {
    import spark.implicits._
    val gen = for {
      ps <- Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0L, 50L)))
      is <- Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("x", "y"),
        Gen.choose(0L, 50L), Gen.choose(0L, 12L)))
      b <- Gen.choose(1L, 15L)
    } yield (ps.distinct, is.map { case (k, s, len) => (k, s, s + len) }
      .distinct.zipWithIndex, b)
    val prop = Prop.forAll(gen) { case (ps, is, bucketS) =>
      val pts = ps.map { case (k, t) => (k, new java.sql.Timestamp(t * 1000)) }
        .toDF("k", "ts")
      val ivs = is.map { case ((k, s, e), i) =>
        (k, new java.sql.Timestamp(s * 1000), new java.sql.Timestamp(e * 1000), i.toLong)
      }.toDF("k", "start", "end", "iv")
      val got = operators.TimeJoin
        .rangeJoin(pts, ivs, Seq("k"), bucketUs = bucketS * 1000000L)
        .select("k", "ts", "iv").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
        .toSet
      val want = (for {
        (k, t) <- ps
        ((ik, s, e), i) <- is
        if ik == k && s <= t && t <= e
      } yield (k, t, i.toLong)).toSet
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("resample fill-forward: NULL before first obs, inclusive exact hit, " +
      "carry past last obs, collision dedup keeps max") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val obs = Seq(
      ("a", t(30), 3.0), ("a", t(50), 5.0), ("a", t(60), 7.0),
      ("b", t(10), 1.0), ("b", t(10), 3.0)) // same-instant collision
      .toDF("k", "ts", "value")
    val out = operators.Resample.fillForward(obs, Seq("k"),
        gridStartUs = 0L, gridEndUs = 100000000L, stepUs = 25000000L)
      .orderBy("k", "grid_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        Option(r.getTimestamp(2)).map(_.getTime / 1000),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("a", 0L, None, None), ("a", 25L, None, None),
      ("a", 50L, Some(50L), Some(5.0)),   // exact hit is inclusive
      ("a", 75L, Some(60L), Some(7.0)),
      ("a", 100L, Some(60L), Some(7.0)),  // held past last obs
      ("b", 0L, None, None),
      ("b", 25L, Some(10L), Some(3.0)),   // dedup kept the max value
      ("b", 50L, Some(10L), Some(3.0)),
      ("b", 75L, Some(10L), Some(3.0)),
      ("b", 100L, Some(10L), Some(3.0))))
  }

  test("resample interpolate: none/exact/hold/interp kinds and exact lerp values") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val obs = Seq(
      ("a", t(20), 2.0), ("a", t(80), 10.0),
      ("c", t(50), 4.0)) // single obs: exact at 50, hold after, none before
      .toDF("k", "ts", "value")
    val df = operators.Resample.interpolate(obs, Seq("k"),
      gridStartUs = 0L, gridEndUs = 100000000L, stepUs = 25000000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "resample must stay join-free (union-and-scan)")
    val out = df.orderBy("k", "grid_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3)))
    def lerp(g: Long, tp: Long, p: Double, tn: Long, n: Double): Double =
      p + (n - p) * ((g * 1e6 - tp * 1e6) / (tn * 1e6 - tp * 1e6))
    assert(out.toSeq === Seq(
      ("a", 0L, None, "none"),
      ("a", 25L, Some(lerp(25, 20, 2.0, 80, 10.0)), "interp"),
      ("a", 50L, Some(lerp(50, 20, 2.0, 80, 10.0)), "interp"),
      ("a", 75L, Some(lerp(75, 20, 2.0, 80, 10.0)), "interp"),
      ("a", 100L, Some(10.0), "hold"),
      ("c", 0L, None, "none"), ("c", 25L, None, "none"),
      ("c", 50L, Some(4.0), "exact"),
      ("c", 75L, Some(4.0), "hold"), ("c", 100L, Some(4.0), "hold")))
  }

  test("resample interpolate equals the brute-force model on random inputs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(0, 18)
      obs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("x", "y"),
        Gen.choose(0L, 40L), Gen.choose(-5.0, 5.0)))
      step <- Gen.choose(3L, 15L)
    } yield (obs.groupBy(o => (o._1, o._2)).values.map(_.head).toList, step)
    val prop = Prop.forAll(gen) { case (obs, stepS) =>
      val df = obs.map { case (k, s, v) => (k, new java.sql.Timestamp(s * 1000), v) }
        .toDF("k", "ts", "value")
      val endUs = 40000000L
      val got = operators.Resample.interpolate(df, Seq("k"),
          gridStartUs = 0L, gridEndUs = endUs, stepUs = stepS * 1000000L)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000) ->
          ((Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3)))).toMap
      val keys = obs.map(_._1).distinct
      val instants = 0L.to(40L, stepS)
      val want = (for { k <- keys; g <- instants } yield {
        val series = obs.filter(_._1 == k)
        val prev = series.filter(_._2 <= g).sortBy(_._2).lastOption
        val next = series.filter(_._2 > g).sortBy(_._2).headOption
        val cell = (prev, next) match {
          case (None, _) => (None, "none")
          case (Some((_, tp, p)), _) if tp == g => (Some(p), "exact")
          case (Some((_, _, p)), None) => (Some(p), "hold")
          case (Some((_, tp, p)), Some((_, tn, nn))) =>
            (Some(p + (nn - p) * ((g * 1e6 - tp * 1e6) / (tn * 1e6 - tp * 1e6))),
              "interp")
        }
        (k, g) -> cell
      }).toMap
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("as-of join equals the brute-force model on random inputs") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0L, 40L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0L, 40L)))
    } yield (ls.distinct, rs.distinct) // unique (key, ts) per side
    val prop = Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rs.map { case (k, t) => (k, t, t.toDouble / 2.0) }
        .toDF("k", "ts", "value")
      val got = TimeJoin.asOf(left, right, keyCols = Seq("k")).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      ls.forall { case (k, t) =>
        val expect = rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._2.toDouble / 2.0)
        got((k, t)) == expect
      } && got.size == ls.size
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}

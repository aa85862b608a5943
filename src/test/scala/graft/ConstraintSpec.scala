package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** CHECK constraints (ingest expectations): declaration contract, the
  * tri-state violation rule (only FALSE fails — NULL passes), whole-batch
  * rejection before any write, and enforcement on every append path.
  */
class ConstraintSpec extends SparkSpec {

  private def freshDs = {
    val dir = Files.createTempDirectory("graft-cons").toString
    (new Datastream(spark, dir), dir)
  }

  test("violating batch is rejected whole, before anything is written") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.addCheckConstraint("value_nonneg", "value >= 0")
    assert(ds.checkConstraints === Map("value_nonneg" -> "value >= 0"))
    val e = intercept[errors.ConstraintViolation](
      ds.appendMultiple(dp(Seq(
        ("a", "2024-01-01T00:00:00Z", 1.0),
        ("a", "2024-01-01T00:00:01Z", -2.0))).select("stream_id", "ts", "value")))
    assert(e.getMessage.contains("value_nonneg"))
    // nothing landed — not even the clean row
    assert(ds.rawDatapoints.count() === 0L)
    assert(ds.currentVersion.isEmpty)
    // the clean batch then passes
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"))
    assert(ds.rawDatapoints.count() === 1L)
  }

  test("NULL passes (SQL tri-state); nominal streams with null values append") {
    val (ds, _) = freshDs
    import spark.implicits._
    ds.ensureStream("n", valueType = ValueType.Nominal)
    ds.addCheckConstraint("value_nonneg", "value >= 0")
    // nominal rows carry a null numeric value: the constraint is NULL, not
    // FALSE, so the append is legal
    ds.appendMultiple(Seq(("n", ts("2024-01-01T00:00:00Z"),
        null.asInstanceOf[java.lang.Double], "\"ok\""))
      .toDF("stream_id", "ts", "value", "value_json"))
    assert(ds.rawDatapoints.count() === 1L)
  }

  test("declaration contract: bad names, bad expressions, duplicates, unknown drops") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    intercept[IllegalArgumentException](
      ds.addCheckConstraint("no spaces", "value >= 0"))
    intercept[Exception](
      ds.addCheckConstraint("bad_ref", "no_such_column >= 0"))
    ds.addCheckConstraint("c1", "value >= 0")
    intercept[IllegalArgumentException](ds.addCheckConstraint("c1", "value >= 1"))
    intercept[IllegalArgumentException](ds.dropCheckConstraint("nope"))
    ds.dropCheckConstraint("c1")
    assert(ds.checkConstraints === Map.empty)
  }

  test("adding a constraint the existing history violates is refused") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:00Z", -5.0)))
      .select("stream_id", "ts", "value"))
    val e = intercept[errors.ConstraintViolation](
      ds.addCheckConstraint("value_nonneg", "value >= 0"))
    assert(e.getMessage.contains("existing row"))
    assert(ds.checkConstraints === Map.empty)
    // deleting the dirty history unblocks the declaration
    ds.deleteDatapoints(Map.empty, ts("2024-01-01T00:00:00Z"),
      ts("2024-01-01T00:00:00Z"), DeleteMode.CopyOnWrite)
    ds.addCheckConstraint("value_nonneg", "value >= 0")
    assert(ds.checkConstraints.keySet === Set("value_nonneg"))
  }

  test("streaming/batch ingest path enforces too (appendBatch funnels through)") {
    val (ds, _) = freshDs
    ds.ensureStream("a")
    ds.addCheckConstraint("ts_in_2024", "ts >= TIMESTAMP '2024-01-01 00:00:00'")
    intercept[errors.ConstraintViolation](
      ds.appendBatch(dp(Seq(("a", "2023-12-31T23:59:59Z", 1.0)))
        .select("stream_id", "ts", "value"), batchId = 1L))
    ds.appendBatch(dp(Seq(("a", "2024-06-01T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"), batchId = 2L)
    assert(ds.rawDatapoints.count() === 1L)
  }
}

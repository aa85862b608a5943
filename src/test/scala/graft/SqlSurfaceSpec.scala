package graft

import java.nio.file.Files

/** The spark.sql surface: registered views are snapshot-pinned at
  * registration and advance on re-registration.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("views are snapshot-pinned; re-registering advances them") {
    val dir = Files.createTempDirectory("graft-sqlv").toString
    val ds = new Datastream(spark, dir)
    ds.ensureStream("a")
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:00Z", 1.0)))
      .select("stream_id", "ts", "value"))
    val names = ds.registerViews("sqlspec")
    assert(names.contains("sqlspec_datapoints"))
    assert(spark.sql("SELECT count(*) FROM sqlspec_datapoints").first().getLong(0) === 1L)
    // a later append is invisible to the pinned view...
    ds.appendMultiple(dp(Seq(("a", "2024-01-01T00:00:01Z", 2.0)))
      .select("stream_id", "ts", "value"))
    assert(spark.sql("SELECT count(*) FROM sqlspec_datapoints").first().getLong(0) === 1L)
    // ...and visible after re-registration
    ds.registerViews("sqlspec")
    assert(spark.sql("SELECT count(*) FROM sqlspec_datapoints").first().getLong(0) === 2L)
    // registry + history views answer too
    assert(spark.sql("SELECT count(*) FROM sqlspec_streams").first().getLong(0) === 1L)
    assert(spark.sql(
      "SELECT count(*) FROM sqlspec_history WHERE op = 'append'")
      .first().getLong(0) === 2L)
  }
}

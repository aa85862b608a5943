package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for pipeline bisection (not part of the driver
  * contract; used during perf work).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Sources.documents(spark, sfDir)
    val n = 3; val bands = 16; val rowsPerBand = 4
    val numHashes = bands * rowsPerBand
    val p = 2147483647L
    val rnd = new scala.util.Random(8191)
    val ab = Seq.fill(numHashes)(
      (math.abs(rnd.nextLong()) % (p - 1)) + 1, math.abs(rnd.nextLong()) % p)
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), ext.Dedup.shinglesFromTokens(col("w"), n).as("sh"))
      .where(size(col("sh")) > 0)
    time("warmup")(docs.count())
    time("shingles")(sh.count())
    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(p)).as("h"))
    time("hashed")(hashed.count())
    val sig = hashed.groupBy("doc_id").agg(
      min(pmod(col("h") * ab.head._1 + ab.head._2, lit(p))).as("m0"),
      ab.tail.zipWithIndex.map { case ((a, b), i) =>
        min(pmod(col("h") * a + b, lit(p))).as(s"m${i + 1}")
      }: _*)
    time("sig")(sig.count())
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        hash((0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
      }: _*)))
      .toDF("doc_id", "band", "band_hash")
    time("banded")(banded.count())
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    time("candidates")(candidates.count())
    val withSets = candidates
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
    time("withSets+jaccard")(withSets
      .select(col("a"), col("b"), ext.Dedup.jaccard(col("sha"), col("shb")).as("jaccard"))
      .where(col("jaccard") >= 0.8).count())
    time("full query run1")(ext.Dedup.nearDupMinhash(docs, 0.8, n, bands, rowsPerBand).count())
    time("full query run2")(ext.Dedup.nearDupMinhash(docs, 0.8, n, bands, rowsPerBand).count())
    spark.stop()
  }
}

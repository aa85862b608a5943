package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class ExtAndPaginationSpec extends SparkSpec {
  import spark.implicits._

  test("plan guard: core corpus operators plan no CartesianProduct and no " +
      "unbounded single-partition exchange") {
    val docs = Sources.documents(spark, "/root/testdata/sf0.001")
    val emb = Sources.embeddings(spark, "/root/testdata/sf0.001")
    // purely-declarative constructions (no eager jobs in the builder):
    // the scale-killer patterns the per-round plan audit hunts by hand —
    // a cross product, or a plan-wide SinglePartition exchange (the
    // apex-window shapes are bounded by construction and carry explicit
    // scaladoc; none of THESE operators may require one)
    val plans = Seq(
      "tfidf" -> ext.Text.tfIdfTopTerms(docs),
      "topngrams" -> ext.Text.topNgrams(docs),
      "quality" -> ext.Text.quality(docs),
      "gopher_rules" -> ext.Text.gopherRules(docs),
      "sample_weight" -> ext.Text.sampleByWeight(docs,
        org.apache.spark.sql.functions.lit(0.5)),
      "split" -> ext.Text.splitAssign(docs),
      "histogram" -> ext.Text.tokenHistogram(docs),
      "neardup_jaccard" -> ext.Dedup.nearDupJaccard(docs, 0.8),
      "substring" -> ext.Dedup.substringOverlap(docs),
      "embdup" -> ext.Similarity.nearDupPairs(emb, 0.9),
      "resample_ffill" -> operators.Resample.fillForward(
        Sources.events(spark, "/root/testdata/sf0.001")
          .select(col("user_id"), col("ts"), col("value")),
        Seq("user_id"), 1704067200000000L, 1704070800000000L, 600000000L),
      "resample_interp" -> operators.Resample.interpolate(
        Sources.events(spark, "/root/testdata/sf0.001")
          .select(col("user_id"), col("ts"), col("value")),
        Seq("user_id"), 1704067200000000L, 1704070800000000L, 600000000L),
      "boilerplate_share" -> ext.Text.boilerplateShare(docs,
        Seq("the_a").toDF("ngram")),
      // literal vocab: mapToIds' own shape, not buildVocab's bounded
      // apex-window rank
      "map_to_ids" -> ext.Text.mapToIds(docs, Seq(("the", 1L)).toDF("token", "id")),
      "with_ids" -> ext.Text.withIds(docs, Map("the" -> 1L)))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin")
      assert(!p.contains("Exchange SinglePartition"),
        s"$name plans a single-partition exchange")
    }
  }

  test("plan guard: merge-on-read delete and tombstone-filtered index reads " +
      "stay broadcast anti-joins") {
    val dir = Files.createTempDirectory("graft-planmor").toString
    val ds = new Datastream(spark, dir)
    ds.ensureStream("a"); ds.ensureStream("b")
    ds.appendMultiple(dp(Seq(
      ("a", "2024-01-01T00:00:10Z", 1.0),
      ("b", "2024-01-01T00:00:20Z", 2.0))).select("stream_id", "ts", "value"))
    ds.deleteDatapoints(Map.empty,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:00:15Z"))
    val idxDir = Files.createTempDirectory("graft-planidx").toString
    val rnd = new scala.util.Random(7)
    val emb = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    ext.Ivf.buildIndex(emb, idxDir, nCells = 4)
    ext.Ivf.removeFromIndex(idxDir, Seq(1L).toDF("vec_id"))
    val plans = Seq(
      "raw_with_mor_deletes" -> ds.rawDatapoints,
      "index_query_with_tombstones" ->
        ext.Ivf.queryIndex(idxDir, emb.limit(2), k = 3, nProbe = 4),
      "cells_with_tombstones" -> ext.Ivf.cells(spark, idxDir))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin")
      assert(!p.contains("Exchange SinglePartition"),
        s"$name plans a single-partition exchange")
    }
    val morPlan = ds.rawDatapoints.queryExecution.executedPlan.toString
    assert(morPlan.contains("BroadcastHashJoin") && morPlan.contains("LeftAnti"),
      "the merge-on-read filter must be a broadcast hash anti-join")
  }

  test("limit/offset pagination over ordered getData") {
    val f = dp((0 until 10).map(i => ("a", f"2024-01-01T00:00:$i%02dZ", i.toDouble)))
    val page = GetData.raw(f, "a", limit = Some(3), offset = 4)
      .collect().map(_.getAs[Double]("value")).toSeq
    assert(page == Seq(4.0, 5.0, 6.0))
    val lastPage = GetData.raw(f, "a", reverse = true, limit = Some(2))
      .collect().map(_.getAs[Double]("value")).toSeq
    assert(lastPage == Seq(9.0, 8.0))
  }

  test("nested tag query matches via tags_json") {
    val reg = Seq(
      ("s1", Map("flat" -> "x"), """{"a":{"b":"c"}}"""),
      ("s2", Map("flat" -> "x"), """{"a":{"b":"OTHER"}}"""))
      .toDF("stream_id", "tags", "tags_json")
    val hit = StreamRegistry.findStreams(reg, Map("a.b" -> "c"))
    assert(hit.select("stream_id").as[String].collect().toSeq == Seq("s1"))
    assert(StreamRegistry.findStreams(reg, Map("flat" -> "x")).count() == 2)
  }

  test("nominal stream: append value_json, count-only downsample, raw read returns JSON") {
    val ds = new Datastream(spark, Files.createTempDirectory("graft-nom").toString)
    ds.ensureStream("n1", valueType = ValueType.Nominal)
    assert(ds.streamMeta("n1").value_downsamplers == Seq("count"))
    ds.appendMultiple(Seq(
      ("n1", ts("2024-01-01T00:00:10Z"), null.asInstanceOf[java.lang.Double], """{"state":"up"}"""),
      ("n1", ts("2024-01-01T00:00:20Z"), null.asInstanceOf[java.lang.Double], """{"state":"down"}"""))
      .toDF("stream_id", "ts", "value", "value_json"))
    val raw = ds.getData("n1", Granularity.Seconds).collect()
    assert(raw.map(_.getAs[String]("value_json")).toSeq ==
      Seq("""{"state":"up"}""", """{"state":"down"}"""))
    ds.downsampleStreams(ts("2024-01-01T01:00:00Z"))
    val m = ds.getData("n1", Granularity.Minutes, valueDownsamplers = Some(Seq("count")))
      .collect()
    assert(m.length == 1 && m.head.getAs[Long]("count") == 2L)
    // numeric downsamplers are undeclared for a nominal stream
    assertThrows[errors.UnsupportedDownsampler](
      ds.getData("n1", Granularity.Minutes, valueDownsamplers = Some(Seq("mean"))))
  }

  test("graph value JSON parses against the graph schema") {
    val g = Seq("""{"v":[{"i":"a"},{"i":"b"}],"e":[{"f":"a","t":"b"}]}""").toDF("value_json")
      .select(from_json(col("value_json"), Schemas.graph).as("g"))
    val row = g.select(size(col("g.v")).as("nv"), size(col("g.e")).as("ne")).collect().head
    assert((row.getAs[Int]("nv"), row.getAs[Int]("ne")) == ((2, 1)))
  }

  test("graph stream end-to-end: JSON append, count-only rollup, parseable payload") {
    val ds = new Datastream(spark, Files.createTempDirectory("graft-graph").toString)
    ds.ensureStream("g1", valueType = ValueType.Graph)
    assert(ds.streamMeta("g1").value_downsamplers == Seq("count"))
    ds.appendMultiple(Seq(
      ("g1", ts("2024-01-01T00:00:10Z"), null.asInstanceOf[java.lang.Double],
        """{"v":[{"i":"a"},{"i":"b"}],"e":[{"f":"a","t":"b"}]}"""))
      .toDF("stream_id", "ts", "value", "value_json"))
    val raw = ds.getData("g1", Granularity.Seconds)
      .select(from_json(col("value_json"), Schemas.graph).as("g"))
    assert(raw.select(size(col("g.v"))).collect().head.getInt(0) == 2)
    ds.downsampleStreams(ts("2024-01-01T01:00:00Z"))
    val m = ds.getData("g1", Granularity.Minutes, valueDownsamplers = Some(Seq("count")))
    assert(m.collect().head.getAs[Long]("count") == 1L)
  }

  test("numeric stream rejects null value appends") {
    val ds = new Datastream(spark, Files.createTempDirectory("graft-num").toString)
    ds.ensureStream("s1")
    assertThrows[IllegalArgumentException](
      ds.appendMultiple(Seq(
        ("s1", ts("2024-01-01T00:00:00Z"), null.asInstanceOf[java.lang.Double], "{}"))
        .toDF("stream_id", "ts", "value", "value_json")))
  }

  test("multimodal decode: undecodable payloads take the deterministic fallback") {
    val assets = Seq(
      ext.Multimodal.Asset(0L, "image", "abcd".getBytes("UTF-8"), "{}"),
      ext.Multimodal.Asset(1L, "audio", "x".getBytes("UTF-8"), "{}"))
    val out = ext.Multimodal.decode(spark.createDataset(assets)).collect()
      .map(d => d.asset_id -> d).toMap
    assert(out(0L).width == 20 && out(0L).n_bytes == 4L && out(0L).duration_ms == 0L)
    assert(out(1L).duration_ms == 20L && out(1L).channels == 3)
    // the health flag marks both fallback decodes as NOT ok
    assert(!out(0L).decode_ok && !out(1L).decode_ok)
  }

  test("multimodal decode: real PNGs round-trip through javax.imageio with true dims") {
    val docs = Seq((5L, "ignored", "en"), (100L, "ignored", "fr"),
        (37L, "ignored", "de")) // 37 ⇒ the fixture's CORRUPT arm
      .toDF("doc_id", "text", "lang")
    val assets = ext.Multimodal.pngAssets(docs)
    // payloads are genuine PNG byte streams (magic bytes), not fakes
    val magic = assets.collect().map(a => a.asset_id ->
      a.payload.take(4).map(_ & 0xFF).toSeq).toMap
    assert(magic(5L) === Seq(0x89, 0x50, 0x4E, 0x47))
    val out = ext.Multimodal.decode(assets).collect()
      .map(d => d.asset_id -> d).toMap
    // dims = the generator's closed form, recovered by the REAL decoder
    assert(out(5L).width == 21 && out(5L).height == 51 && out(5L).channels == 3)
    assert(out(100L).width == 52 && out(100L).height == 76 && out(100L).channels == 3)
    assert(out(5L).decode_ok && out(100L).decode_ok)
    // the corrupt asset is flagged and takes the closed-form fallback:
    // n = 32 + 37 % 64 = 69 ⇒ width 16 + 69 = 85, height 16 + 483 % 512 = 499
    assert(!out(37L).decode_ok)
    assert(out(37L).width == 85 && out(37L).height == 499)
    // a truncated PNG degrades to the fallback instead of throwing
    val broken = assets.collect().head.payload.take(10)
    assert(ext.Multimodal.decodeImage(broken).isEmpty)
  }

  test("averageHash: shift-invariant on real PNGs, corrupt payload None, " +
      "dup candidates = same-base pairs only") {
    val docs = (0L until 12L).map(i => (i, "ignored", "en"))
      .toDF("doc_id", "text", "lang")
    // 4 bases over 12 docs: docs i and i+4 and i+8 share a pattern but
    // carry different brightness shifts (i % 13 differs) → different bytes
    val assets = ext.Multimodal.dupPngAssets(docs, nBases = 4)
    val byId = assets.collect().map(a => a.asset_id -> a.payload).toMap
    assert(!java.util.Arrays.equals(byId(0L), byId(4L))) // bytes differ...
    val h = (id: Long) => ext.Multimodal.averageHash(byId(id)).get
    assert(h(0L) === h(4L) && h(4L) === h(8L)) // ...hashes don't
    assert(Seq(0L, 1L, 2L, 3L).map(h).distinct.size === 4) // bases distinct
    assert(ext.Multimodal.averageHash("not a png".getBytes).isEmpty)
    assert(ext.Multimodal.averageHash(null).isEmpty)
    val pairs = ext.Multimodal.imageDupCandidates(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L; if a % 4 == b % 4
    } yield (a, b)).sorted
    assert(pairs === expected)
  }

  test("audio decode: real WAVs round-trip through javax.sound with exact integer metrics") {
    val docs = Seq((0L, "ignored", "en"), (7L, "ignored", "fr"))
      .toDF("doc_id", "text", "lang")
    val assets = ext.Multimodal.wavAssets(docs)
    // payloads are genuine RIFF/WAVE containers, not fakes
    val byId = assets.collect().map(a => a.asset_id -> a.payload).toMap
    assert(new String(byId(0L).take(4), "US-ASCII") === "RIFF")
    assert(new String(byId(0L).slice(8, 12), "US-ASCII") === "WAVE")
    val out = ext.Multimodal.decodeAudio(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: n=400, amp=4000, step=16 — sawtooth peak is amp (i=250·16=4000
    // ⇒ s=-4000), duration 400/8 = 50 ms
    assert(out(0L).getLong(1) === 8000L)
    assert(out(0L).getLong(2) === 400L)
    assert(out(0L).getLong(3) === 50L)
    assert(out(0L).getLong(4) === 4000L)
    // doc 7: n=512, amp=11000, step=23; energy replayed in closed form
    val (n7, amp7, step7) = (512, 11000L, 23L)
    val s7 = (0 until n7).map(i => (i * step7) % (2 * amp7) - amp7)
    assert(out(7L).getLong(2) === n7.toLong)
    assert(out(7L).getLong(4) === s7.map(math.abs).max)
    assert(out(7L).getLong(5) === s7.map(s => s * s).sum)
    // corrupt containers degrade to None instead of throwing
    assert(ext.Multimodal.decodeWav("not a wav".getBytes).isEmpty)
    assert(ext.Multimodal.decodeWav(byId(0L).take(16)).isEmpty)
    assert(ext.Multimodal.decodeWav(null).isEmpty)
  }

  test("audioFingerprint: scale/sign-invariant on real WAVs, corrupt payload None, " +
      "dup candidates = same-base pairs only") {
    val docs = (0L until 12L).map(i => (i, "ignored", "en"))
      .toDF("doc_id", "text", "lang")
    // 4 bases over 12 docs: i, i+4, i+8 share a base but carry different
    // amplitude scales / sign inversions (t = i % 13 differs) → bytes differ
    val assets = ext.Multimodal.dupWavAssets(docs, nBases = 4)
    val byId = assets.collect().map(a => a.asset_id -> a.payload).toMap
    assert(!java.util.Arrays.equals(byId(0L), byId(4L)))
    val h = (id: Long) => ext.Multimodal.audioFingerprint(byId(id)).get
    assert(h(0L) === h(4L) && h(4L) === h(8L)) // transforms don't move the print
    assert(Seq(0L, 1L, 2L, 3L).map(h).distinct.size === 4) // bases distinct
    // doc 7 takes the sign-inversion branch (t = 7): still the base's print
    assert(h(7L) === h(3L))
    assert(ext.Multimodal.audioFingerprint("not a wav".getBytes).isEmpty)
    assert(ext.Multimodal.audioFingerprint(null).isEmpty)
    val pairs = ext.Multimodal.audioDupCandidates(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L; if a % 4 == b % 4
    } yield (a, b)).sorted
    assert(pairs === expected)
  }

  test("video decode: real MJPEG AVIs round-trip through the RIFF parser " +
      "+ per-frame imageio with closed-form metrics") {
    val docs = Seq((5L, "ignored", "en"), (100L, "ignored", "fr"),
        (82L, "ignored", "de")) // 82 = 2·41 ⇒ the fixture's CORRUPT arm
      .toDF("doc_id", "text", "lang")
    val assets = ext.Multimodal.aviAssets(docs)
    val byId = assets.collect().map(a => a.asset_id -> a.payload).toMap
    // payloads are genuine RIFF/AVI containers, not fakes
    assert(new String(byId(5L).take(4), "US-ASCII") === "RIFF")
    assert(new String(byId(5L).slice(8, 12), "US-ASCII") === "AVI ")
    // ...and the frames inside are genuine JPEGs (SOI marker after the
    // first 00dc chunk header somewhere in movi)
    assert(byId(5L).sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8))
    val out = ext.Multimodal.decodeVideo(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    def expected(id: Long): (Long, Long, Long, Long, Long) = {
      val n = 6 + id % 14
      val bits = (0L until math.min(n, 64L)).map(k =>
        if ((id + k) % 3 != 0) 1L << k else 0L).sum
      (16 + id % 48, 16 + (id * 5) % 48, n,
        n * (20 + 5 * (id % 10)), bits)
    }
    for (id <- Seq(5L, 100L)) {
      val (w, h, n, d, bits) = expected(id)
      assert(out(id).getLong(1) === w && out(id).getLong(2) === h)
      assert(out(id).getLong(3) === n && out(id).getLong(4) === d)
      assert(out(id).getLong(5) === bits)
      assert(out(id).getBoolean(6))
    }
    // the corrupt asset is flagged and zeroed, not fatal
    assert(!out(82L).getBoolean(6))
    assert((1 to 5).forall(i => out(82L).getLong(i) === 0L))
    // torn containers (truncated mid-chunk) degrade to None
    assert(ext.Multimodal.decodeAvi(byId(5L).take(byId(5L).length / 2)).isEmpty)
    assert(ext.Multimodal.decodeAvi("not an avi".getBytes).isEmpty)
    assert(ext.Multimodal.decodeAvi(null).isEmpty)
  }

  test("videoFingerprint: brightness-grade-invariant on real AVIs, corrupt " +
      "payload None, dup candidates = same-base pairs only") {
    val docs = (0L until 12L).map(i => (i, "ignored", "en"))
      .toDF("doc_id", "text", "lang")
    // 4 bases over 12 docs: i, i+4, i+8 share a frame pattern but carry
    // different brightness grades (t = i % 13 differs) → bytes differ
    val assets = ext.Multimodal.dupAviAssets(docs, nBases = 4)
    val byId = assets.collect().map(a => a.asset_id -> a.payload).toMap
    assert(!java.util.Arrays.equals(byId(0L), byId(4L)))
    val h = (id: Long) => ext.Multimodal.videoFingerprint(byId(id)).get
    assert(h(0L) === h(4L) && h(4L) === h(8L)) // grades don't move the print
    assert(Seq(0L, 1L, 2L, 3L).map(h).distinct.size === 4) // bases distinct
    // the decode-fixture AVIs are too short to fingerprint (< 64 frames)
    val shortAvi = ext.Multimodal.aviAssets(
      Seq((5L, "ignored", "en")).toDF("doc_id", "text", "lang"))
      .collect().head.payload
    assert(ext.Multimodal.videoFingerprint(shortAvi).isEmpty)
    assert(ext.Multimodal.videoFingerprint("not an avi".getBytes).isEmpty)
    val pairs = ext.Multimodal.videoDupCandidates(assets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L; if a % 4 == b % 4
    } yield (a, b)).sorted
    assert(pairs === expected)
  }

  test("sampleDecodedFrames: every stride-th REAL frame with decoded dims " +
      "and threshold state; corrupt assets emit nothing") {
    val docs = Seq((5L, "ignored", "en"), (82L, "ignored", "de")) // 82 corrupt
      .toDF("doc_id", "text", "lang")
    val assets = ext.Multimodal.aviAssets(docs)
    val rows = ext.Multimodal.sampleDecodedFrames(assets, stride = 4)
      .orderBy("asset_id", "frame_index").collect()
    // doc 5: n = 11 frames ⇒ sampled indices 0, 4, 8; corrupt doc 82: none
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((5L, 0), (5L, 4), (5L, 8)))
    rows.foreach { r =>
      assert(r.getInt(2) === 21 && r.getInt(3) === 41) // 16+5%48, 16+25%48
      assert(r.getBoolean(4) === ((5 + r.getInt(1)) % 3 != 0))
    }
    // stride 1 = every frame
    assert(ext.Multimodal.sampleDecodedFrames(assets, stride = 1)
      .count() === 11L)
  }

  test("multimodal features have fixed dim and preserve byte counts") {
    val assets = spark.createDataset(Seq(
      ext.Multimodal.Asset(7L, "image", "hello world".getBytes("UTF-8"), "{}")))
    val f = ext.Multimodal.features(assets, dim = 16).collect().head
    val vec = f.getSeq[Float](f.fieldIndex("embedding"))
    assert(vec.length == 16)
    assert(vec.sum == 11.0f) // one vote per payload byte
  }

  test("frame sampling emits every stride-th chunk") {
    val payload = Array.fill[Byte](4096 * 2 + 100)(65)
    val assets = Seq((1L, "video", payload)).toDF("asset_id", "kind", "payload")
    val frames = ext.Multimodal.sampleFrames(assets).collect()
    assert(frames.length == 2) // offsets 0 and 4096
    assert(frames.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 1))
  }

  test("splitAssign is content-determined: same text, same bucket, any doc_id") {
    val docs = Seq((1L, "the quick brown fox"), (999L, "the quick brown fox"),
      (2L, "a different document entirely"), (3L, ""))
      .toDF("doc_id", "text")
    val out = ext.Text.splitAssign(docs, buckets = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("split_bucket")).toMap
    assert(out(1L) == out(999L)) // identical text can never straddle splits
    assert(out.values.forall(b => b >= 0 && b < 10))
    assert(out(3L) == 0L) // empty text hashes to 0 (both engines)
  }

  test("decontaminate removes exact copies and near-dups of the held set only") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),                            // exact copy of held doc 100
      (2L, base + " lambda"),                // near-dup of held (jaccard 8/9)
      (3L, "totally unrelated words here live happily without any overlap x y"),
      (4L, "another clean document with its own vocabulary entirely z w q"))
      .toDF("doc_id", "text")
    val held = Seq((100L, base)).toDF("doc_id", "text")
    val out = ext.Dedup.decontaminate(corpus, held, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(3L, 4L))
    // and with an empty held set, nothing is removed
    val none = ext.Dedup.decontaminate(corpus,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), threshold = 0.8)
    assert(none.count() == 4)
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11 X5 / builder brief): image/audio/video
  * as opaque `binary` payloads with typed metadata, decoded and
  * feature-extracted per partition.
  *
  * The IMAGE arm is a REAL codec: `decodeImage` runs the JDK's
  * `javax.imageio` (PNG/JPEG/GIF/BMP ship with the JRE — no FFI, no
  * native libs), and the `q_multimodal_decode` gate round-trips
  * deterministically generated PNGs through encode → decode with
  * per-asset pinned dimensions. Payloads imageio cannot parse (the
  * text-bound synthetic fixture; audio/video containers, which the JDK
  * has no decoder for) fall back to a clearly-marked deterministic
  * geometry so the resize/frame plumbing stays exercised end to end.
  * Everything around the codec is real and tested: the asset schema, the
  * `mapPartitions`-batched decode (the shape an FFI decoder needs: one
  * library handle per partition, streaming iterator, no per-row setup),
  * the fixed-dim feature vectors ready for `Similarity.topK`, and the
  * frame-sampling layout.
  *
  * At 100 TB: assets are date/kind-partitioned parquet with payloads in
  * their own column (Parquet column pruning keeps metadata-only queries from
  * touching bytes); decode is a narrow map — no shuffle — and feature
  * vectors flow into the LSH pipeline.
  */
object Multimodal {

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte], meta: String)

  /** The synthetic-asset fixtures inherit the documents scan's file-split
    * partitioning — one or two map tasks at gate scale (measured: the whole
    * video decode gate ran as a single 8 s task on a 32-core session) —
    * while codec work (JPEG/PNG encode + decode) is embarrassingly parallel
    * CPU. Spreading the METADATA rows (ids only — payload bytes are
    * synthesized downstream of the exchange) across the session's full
    * parallelism is the guide-§8 discipline: shuffle the lightweight proxy,
    * never the payload. Scale-adaptive (defaultParallelism), not a pinned
    * local constant; row values are untouched, so every consumer's result
    * set is bit-identical.
    */
  private def spread[T](ds: Dataset[T]): Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)
  case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
                     channels: Int, n_bytes: Long, duration_ms: Long,
                     decode_ok: Boolean)

  /** Bind the documents table as fake assets: payload = UTF-8 text bytes,
    * kind cycles deterministically, meta carries the source metadata as
    * JSON. (The driver testdata has no real binary column; the binding IS
    * the schema contract.)
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      to_json(struct(col("lang"), col("source"))).as("meta"))

  /** REAL image decode via the JDK's `javax.imageio` — returns
    * `(width, height, channels)` when the payload is a parseable image
    * (PNG/JPEG/GIF/BMP with the stock JRE plugins), None otherwise.
    * `channels` is the raster's band count (3 for RGB, 4 for RGBA, 1 for
    * grayscale). Decode failures of any shape (null payload, truncated
    * file, non-image bytes) uniformly map to None — a corrupt asset must
    * degrade, not kill a 100 TB scan.
    */
  private[graft] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    if (payload == null || payload.length == 0) None
    else scala.util.Try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getRaster.getNumBands))
    }.toOption.flatten

  /** Per-asset decode: the image arm is the real `decodeImage`; payloads
    * imageio cannot parse (audio/video — no JDK decoder exists — and the
    * synthetic text-bound fixture) take the deterministic fallback
    * geometry, which the resize oracle mirrors in exact integer
    * arithmetic. `duration_ms` is fallback-only either way: the JDK has
    * no media-container parser, so a real deployment swaps that one field
    * for an FFI probe. `decode_ok` is the DECODE HEALTH flag: true only on
    * the real-codec arm, so a 100 TB scan can filter (or quarantine)
    * corrupt assets instead of silently mixing fallback geometry into
    * downstream stats.
    */
  private def decodeOne(a: Asset): Decoded = {
    val n = if (a.payload == null) 0L else a.payload.length.toLong
    decodeImage(a.payload) match {
      case Some((w, h, c)) =>
        Decoded(a.asset_id, a.kind, width = w, height = h, channels = c,
          n_bytes = n, duration_ms = 0L, decode_ok = true)
      case None =>
        Decoded(a.asset_id, a.kind,
          width = (16 + n % 512).toInt,
          height = (16 + (n * 7) % 512).toInt,
          channels = 3,
          n_bytes = n,
          duration_ms = if (a.kind == "image") 0L else n * 20L,
          decode_ok = false)
    }
  }

  /** Partition-batched decode: one iterator pass per partition, with the
    * per-partition codec init imageio wants (disable the temp-file stream
    * cache — payloads are in-memory byte arrays).
    */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodeOne)
    }
  }

  /** Deterministic real-PNG fixture: one tiny RGB PNG per document, dims
    * pinned by doc_id (`16 + id % 64` × `16 + 7·id % 64`), pixels a fixed
    * function of position — so the decode gate's oracle states each
    * asset's expected dimensions in closed form while the payload itself
    * is a genuine PNG byte stream produced by the JDK encoder.
    *
    * CORRUPT arm: every 37th doc instead carries a deterministic
    * NON-image payload (length `32 + id % 64`, first byte 0x01 — no
    * imageio plugin's signature starts with 0x01, so the decode provably
    * fails) — the fixture for the `decode_ok` health flag: those assets
    * must come back with `decode_ok = false` and the closed-form fallback
    * geometry, both pinned by the decode gate's oracle.
    */
  def pngAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id").cast("long"), col("lang")).as[(Long, String)])
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, lang) =>
          if (id % 37 == 0) {
            val len = (32 + id % 64).toInt
            val bytes = Array.tabulate[Byte](len)(i =>
              if (i == 0) 0x01.toByte else ((i * 13 + id) & 0xFF).toByte)
            Asset(id, "image", bytes, s"""{"lang":"$lang"}""")
          } else pngAsset(id, lang)
        }
      }
  }

  private def pngAsset(id: Long, lang: String): Asset = {
    val w = (16 + id % 64).toInt
    val h = (16 + (id * 7) % 64).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17 + id) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Asset(id, "image", bos.toByteArray, s"""{"lang":"$lang"}""")
  }

  /** PERCEPTUAL 64-bit average-hash of an image payload, the aHash every
    * image-dedup pipeline starts from: decode (real `javax.imageio`),
    * box-average the luminance onto an 8×8 grid, emit bit k = cell k's
    * luminance strictly above the grid mean. All-INTEGER arithmetic
    * (luminance = r+g+b undivided; cell = floor box average; mean = floor
    * cell average), so the hash is exactly reproducible anywhere AND
    * invariant to a uniform brightness shift that stays inside [0, 255]
    * (every cell and the mean move by the same delta — comparisons are
    * unchanged). Decode failures return None: a corrupt asset drops out
    * of dedup instead of killing the scan.
    */
  private[graft] def averageHash(payload: Array[Byte]): Option[Long] =
    if (payload == null || payload.length == 0) None
    else scala.util.Try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val cells = new Array[Long](64)
        var ci = 0
        while (ci < 64) {
          val gx = ci % 8; val gy = ci / 8
          val x0 = gx * w / 8; val x1 = (gx + 1) * w / 8
          val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              n += 1; x += 1
            }
            y += 1
          }
          cells(ci) = sum / n; ci += 1
        }
        val mean = cells.sum / 64
        var bits = 0L; var k = 0
        while (k < 64) { if (cells(k) > mean) bits |= (1L << k); k += 1 }
        Some(bits)
      }
    }.toOption.flatten

  /** Perceptual image near-dup candidates over a binary asset column:
    * aHash per asset (narrow map with per-partition codec init), SimHash-
    * style 4×16-bit banding so candidates collide on ≥1 band (hamming ≤ 3
    * implies ≥1 clean band by pigeonhole), exact hamming verification ≤
    * `maxHamming`. Never all-pairs — the same bucket discipline as the
    * text SimHash path; output `(a, b, hamming)`, a < b, distinct.
    * Undecodable payloads drop out at the hash step.
    */
  def imageDupCandidates(assets: Dataset[Asset],
                         maxHamming: Int = 2): DataFrame = {
    import assets.sparkSession.implicits._
    val hashed = assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(a => averageHash(a.payload).map(sig => (a.asset_id, sig)))
    }.toDF("asset_id", "sig")
    val banded = hashed.select(col("asset_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits",
        expr("shiftrightunsigned(sig, band * 16) & 65535"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Dup-structured real-PNG fixture: each doc renders its base pattern
    * (`doc_id % nBases`) as an 8×8 block image (32×32 px, 4×4 px blocks)
    * — block (i,j) bright (180) or dark (70) by bit 8·j+i of a splitmix64
    * signature of the base, bits 0/63 forced mixed so no pattern is
    * degenerate — PLUS a per-doc uniform brightness shift (doc_id % 13,
    * stays inside [0,255]). Same base ⇒ same aHash (shift-invariant);
    * different docs ⇒ different PIXELS and different payload bytes, so
    * content-hash dedup provably cannot find these pairs — only the
    * perceptual path can, and the expected pair set is closed-form
    * (`a.doc_id % nBases = b.doc_id % nBases`), which is the oracle.
    */
  def dupPngAssets(docs: DataFrame, nBases: Int = 40): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id").cast("long")).as[Long])
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val base = id % nBases
          // splitmix64 of the base id; force bit 0 set and bit 63 clear so
          // every pattern has both bright and dark blocks
          var z = base + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          val sig = ((z ^ (z >>> 31)) | 1L) & ~(1L << 63)
          val shift = (id % 13).toInt
          val img = new java.awt.image.BufferedImage(
            32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val bit = (y / 4) * 8 + (x / 4)
              val v = (if (((sig >>> bit) & 1L) == 1L) 180 else 70) + shift
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Asset(id, "image", bos.toByteArray, s"""{"base":$base}""")
        }
      }
  }

  /** Deterministic real-WAV fixture: one PCM_S16LE mono WAV per document,
    * built through the JDK's `javax.sound.sampled` ENCODER (header + frame
    * layout come from `AudioSystem.write`, not hand-rolled bytes). The
    * waveform is an integer SAWTOOTH — `s(i) = ((i·step) mod 2A) − A` with
    * `n = 400 + 16·(id mod 50)` samples, `A = 4000 + 1000·(id mod 8)`,
    * `step = 16 + (id mod 31)` — chosen over a sine because every sample
    * is exact integer arithmetic, so the decode gate's oracle can restate
    * duration/peak/energy in closed form (`generate_series` replay) with
    * no transcendental in sight.
    */
  def wavAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id").cast("long")).as[Long]).mapPartitions { it =>
      it.map { id =>
        val n = (400 + (id % 50) * 16).toInt
        val amp = (4000 + (id % 8) * 1000).toInt
        val step = (16 + (id % 31)).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = ((i.toLong * step) % (2L * amp)).toInt - amp
          pcm(2 * i) = (s & 0xFF).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Asset(id, "audio", bos.toByteArray, """{"codec":"pcm_s16le"}""")
      }
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` — parses the
    * container (WAV/AIFF/AU ship with the JRE), checks the format is
    * 16-bit signed mono PCM, and folds the frames into
    * `(sample_rate, n_samples, duration_ms, peak, energy)` — all INTEGER
    * (peak = max |s|, energy = Σ s², duration floored to ms), so results
    * are exactly reproducible. Any failure (null, truncated header,
    * unsupported encoding) maps to None: a corrupt asset degrades, it
    * never kills the scan. This replaces the former declared audio stub —
    * the remaining stand-in is video only (the JDK has no such decoder).
    */
  /** Parse a 16-bit signed mono PCM container into (sample_rate, samples)
    * through the real `javax.sound.sampled` decoder — shared by the
    * metric fold and the perceptual fingerprint. None on anything the
    * decoder rejects or a non-PCM16-mono format.
    */
  private def wavSamples(payload: Array[Byte]): Option[(Long, Array[Int])] =
    if (payload == null || payload.length == 0) None
    else scala.util.Try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleRate <= 0f)
          None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)
              else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
            i += 1
          }
          Some((fmt.getSampleRate.toLong, out))
        }
      } finally ais.close()
    }.toOption.flatten

  private[graft] def decodeWav(payload: Array[Byte])
      : Option[(Long, Long, Long, Long, Long)] =
    wavSamples(payload).map { case (rate, samples) =>
      var peak = 0L
      var energy = 0L
      var i = 0
      while (i < samples.length) {
        val s = samples(i).toLong
        val a = math.abs(s)
        if (a > peak) peak = a
        energy += s * s
        i += 1
      }
      val n = samples.length.toLong
      (rate, n, n * 1000L / rate, peak, energy)
    }

  /** PERCEPTUAL 64-bit audio fingerprint over real decoded samples — the
    * energy-envelope cousin of the image aHash: decode (javax.sound),
    * split the PCM stream into 64 equal frames, compute each frame's
    * integer energy Σs², emit bit k = `64·energy(k) > totalEnergy`
    * (strictly above the mean, stated as a cross-multiplied integer
    * comparison so NO division ever rounds). All-integer ⇒ exactly
    * reproducible anywhere, and invariant BY CONSTRUCTION to amplitude
    * scaling and sign inversion: scaling every sample by integer s
    * multiplies every frame energy and the total by s² exactly, negation
    * squares away — so a rescaled or inverted copy gets the SAME
    * fingerprint while content-hash dedup sees different bytes. Too-short
    * (< 64 samples) or undecodable payloads return None.
    */
  private[graft] def audioFingerprint(payload: Array[Byte]): Option[Long] =
    wavSamples(payload).flatMap { case (_, samples) =>
      val n = samples.length
      if (n < 64) None
      else {
        val energies = new Array[Long](64)
        var total = 0L
        var k = 0
        while (k < 64) {
          val from = k * n / 64
          val until = (k + 1) * n / 64
          var e = 0L
          var i = from
          while (i < until) {
            val s = samples(i).toLong
            e += s * s
            i += 1
          }
          energies(k) = e
          total += e
          k += 1
        }
        var bits = 0L
        k = 0
        while (k < 64) {
          if (64L * energies(k) > total) bits |= (1L << k)
          k += 1
        }
        Some(bits)
      }
    }

  /** Perceptual audio near-dup candidates over a binary asset column:
    * fingerprint per asset (narrow map), SimHash-style 4×16-bit banding so
    * candidates collide on ≥1 band, exact hamming verification ≤
    * `maxHamming`. Never all-pairs — identical structure to
    * [[imageDupCandidates]], one fingerprint family per modality.
    * Undecodable payloads drop out at the hash step.
    */
  def audioDupCandidates(assets: Dataset[Asset],
                         maxHamming: Int = 0): DataFrame = {
    import assets.sparkSession.implicits._
    val hashed = assets.mapPartitions { it =>
      it.flatMap(a => audioFingerprint(a.payload).map(sig => (a.asset_id, sig)))
    }.toDF("asset_id", "sig")
    val banded = hashed.select(col("asset_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits",
        expr("shiftrightunsigned(sig, band * 16) & 65535"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Dup-structured real-WAV fixture (the audio twin of [[dupPngAssets]]):
    * each doc renders its base pattern (`doc_id % nBases`) as a 512-sample
    * sawtooth whose per-frame amplitude ENVELOPE (1× or 2×) follows the
    * bits of a splitmix64 signature of the base — so the energy-envelope
    * fingerprint recovers (essentially) the signature — then applies a
    * per-doc transform t = doc_id % 13: integer amplitude scale
    * `1 + (t % 7)` and sign inversion for t ≥ 7. The 13 transforms are
    * pairwise distinct and all fingerprint-INVARIANT (scale multiplies
    * every frame energy by s² exactly; negation squares away), and within
    * 500 docs no two same-base docs share a transform (that would need
    * doc ids congruent mod lcm(40,13) = 520) — so md5 dedup provably
    * finds NOTHING while the perceptual path must rediscover the
    * closed-form same-base pair set exactly. Peak sample 2·2180·7 =
    * 30 520 < 2¹⁵, so every scale stays exactly representable in PCM16.
    */
  def dupWavAssets(docs: DataFrame, nBases: Int = 40): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    // the "md5 dedup provably finds nothing" property above only holds
    // below lcm(nBases, 13): two docs congruent mod the lcm would emit
    // byte-identical WAVs. The fixture is therefore CLAMPED to its
    // validity domain — ids past the bound are excluded up front (a
    // deliberate, documented bound, not silent truncation: the fixture
    // exists to pin the perceptual-vs-md5 contrast, which is vacuous once
    // byte-identical twins appear). The sf0.01 correctness corpus (500
    // docs) sits entirely below the default bound of 520.
    val idBound = {
      @annotation.tailrec def gcd(a: Long, b: Long): Long =
        if (b == 0) a else gcd(b, a % b)
      nBases.toLong * 13 / gcd(nBases.toLong, 13)
    }
    spread(docs.select(col("doc_id").cast("long")).as[Long]
        .filter((id: Long) => id < idBound))
      .mapPartitions { it =>
        it.map { id =>
          val base = id % nBases
          var z = base + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          // force both envelope levels present so no base is degenerate
          val sig = ((z ^ (z >>> 31)) | 1L) & ~(1L << 63)
          val amp = (1200 + (sig & 7L) * 140L).toInt          // ≤ 2180
          val step = (17 + ((sig >>> 4) % 29L)).toInt
          val t = (id % 13).toInt
          val scale = 1 + (t % 7)
          val negate = t >= 7
          val n = 512 // 64 frames × 8 samples
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val saw = ((i.toLong * step) % (2L * amp)).toInt - amp
            val env = if (((sig >>> (i / 8)) & 1L) == 1L) 2 else 1
            val s0 = saw * env * scale
            val s = if (negate) -s0 else s0
            pcm(2 * i) = (s & 0xFF).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Asset(id, "audio", bos.toByteArray, s"""{"base":$base}""")
        }
      }
  }

  /** Partition-batched audio decode: one row per decodable asset with the
    * integer frame-fold metrics. Narrow map, no shuffle — the 100 TB shape
    * is scan → decode → project, with payloads column-pruned away for
    * queries that only touch the metrics.
    */
  def decodeAudio(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        decodeWav(a.payload).map { case (r, n, d, p, e) =>
          (a.asset_id, r, n, d, p, e)
        }
      }
    }.toDF("asset_id", "sample_rate", "n_samples", "duration_ms", "peak", "energy")
  }

  // ---------------------------------------------------------------------
  // VIDEO — real MJPEG-in-AVI codec (container + frames both genuinely
  // parsed, no stub left in any modality)
  // ---------------------------------------------------------------------

  /** Little-endian RIFF chunk writer used by the AVI fixture. The AVI/RIFF
    * layout is the public Microsoft "AVI RIFF File Reference" structure:
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * 00dc…))` — every u32 little-endian, every chunk padded to even length.
    */
  private final class RiffOut {
    val out = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def chunk(id: String, body: Array[Byte]): Unit = {
      fourcc(id); u32(body.length.toLong); out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0) // RIFF chunks are word-aligned
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Encode one uniform-gray JPEG frame through the JDK encoder. Uniform
    * frames are the fixture's point: a constant block's DCT is DC-only, so
    * JPEG quantization moves the decoded level by at most a couple of
    * counts — a ≥128 luminance threshold with levels ≤62 / ≥180 is
    * decode-exact however the decoder rounds.
    */
  private[graft] def jpegFrame(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Build a complete MJPEG AVI from pre-encoded JPEG frames: `avih` holds
    * the frame period (µs), count, and geometry; one `vids`/`MJPG` stream
    * (`strh` rate/scale = 1e6/periodUs fps, `strf` a BITMAPINFOHEADER with
    * biCompression 'MJPG'); every frame an `00dc` chunk in the `movi`
    * list. No idx1 — readers that stream `movi` (ours, ffmpeg) don't need
    * the seek index.
    */
  private[graft] def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                              periodUs: Int): Array[Byte] = {
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val strh = new RiffOut
    strh.fourcc("vids"); strh.fourcc("MJPG"); strh.u32(0) // flags
    strh.u16(0); strh.u16(0)                              // priority, language
    strh.u32(0)                                           // initial frames
    strh.u32(periodUs.toLong)                             // dwScale
    strh.u32(1000000L)                                    // dwRate (rate/scale = fps)
    strh.u32(0); strh.u32(frames.length.toLong)           // start, length
    strh.u32(maxFrame.toLong); strh.u32(0xFFFFFFFFL)      // sugg. buffer, quality
    strh.u32(0)                                           // sample size
    strh.u16(0); strh.u16(0); strh.u16(w); strh.u16(h)    // rcFrame
    val strf = new RiffOut
    strf.u32(40L); strf.u32(w.toLong); strf.u32(h.toLong) // biSize, w, h
    strf.u16(1); strf.u16(24)                             // planes, bit count
    strf.fourcc("MJPG"); strf.u32(w.toLong * h * 3)       // compression, image size
    strf.u32(0); strf.u32(0); strf.u32(0); strf.u32(0)
    val strl = new RiffOut
    strl.fourcc("strl")
    strl.chunk("strh", strh.bytes); strl.chunk("strf", strf.bytes)
    val avih = new RiffOut
    avih.u32(periodUs.toLong)                             // dwMicroSecPerFrame
    avih.u32(0); avih.u32(0); avih.u32(0)                 // bytes/sec, padding, flags
    avih.u32(frames.length.toLong)                        // dwTotalFrames
    avih.u32(0); avih.u32(1)                              // initial frames, streams
    avih.u32(maxFrame.toLong)                             // suggested buffer
    avih.u32(w.toLong); avih.u32(h.toLong)                // width, height
    avih.u32(0); avih.u32(0); avih.u32(0); avih.u32(0)    // reserved
    val hdrl = new RiffOut
    hdrl.fourcc("hdrl")
    hdrl.chunk("avih", avih.bytes); hdrl.chunk("LIST", strl.bytes)
    val movi = new RiffOut
    movi.fourcc("movi")
    frames.foreach(f => movi.chunk("00dc", f))
    val riffBody = new RiffOut
    riffBody.fourcc("AVI ")
    riffBody.chunk("LIST", hdrl.bytes); riffBody.chunk("LIST", movi.bytes)
    val riff = new RiffOut
    riff.chunk("RIFF", riffBody.bytes)
    riff.bytes
  }

  /** REAL video decode: parse the RIFF/AVI container (walk top-level LISTs,
    * read `avih` for the frame period, iterate the `movi` list's `00dc`/
    * `00db` chunks) and decode EVERY frame through `javax.imageio` —
    * returns `(width, height, n_frames, duration_ms, frame_bits)` where
    * width/height come from the decoded rasters (all frames must agree),
    * `n_frames` counts actually-decoded frames (not the header claim),
    * `duration_ms = n_frames · periodUs / 1000` exact-integer, and
    * `frame_bits` sets bit k iff frame k's integer mean luminance
    * (Σ(r+g+b) / 3n, floor) is ≥ 128 — the decoded bright/dark pattern,
    * capped at 64 frames. Any failure (null, not RIFF/AVI, torn chunk,
    * undecodable frame, inconsistent dims) maps to None: corrupt assets
    * degrade, they never kill the scan. This closes the last declared
    * modality stub — image (`javax.imageio`), audio (`javax.sound`), and
    * video (this parser + per-frame imageio) are all real codecs now.
    */
  /** Shared RIFF/AVI parse: walk the container, read `avih`'s frame period
    * and decode every `decodeEvery`-th `00dc`/`00db` frame through
    * `javax.imageio` into `(index, width, height, integer mean luminance)`
    * — skipped frames are COUNTED but never rasterized, so a strided
    * sampler pays only for the frames it keeps. Returns
    * `(periodUs, totalFrames, decoded)`; None on anything unparseable
    * (null, not RIFF/AVI, torn chunk, undecodable sampled frame).
    */
  private def parseAvi(payload: Array[Byte], decodeEvery: Int = 1)
      : Option[(Long, Int, Seq[(Int, Int, Int, Int)])] =
    if (payload == null || payload.length < 24) None
    else scala.util.Try {
      def u32(off: Int): Long =
        (payload(off) & 0xFFL) | ((payload(off + 1) & 0xFFL) << 8) |
          ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
      def fourcc(off: Int): String =
        new String(payload, off, 4, "US-ASCII")
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") None
      else {
        val riffEnd = math.min(payload.length.toLong, 8L + u32(4)).toInt
        var periodUs = -1L
        var total = 0
        val decoded = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
        var ok = true
        // walk chunks in [from, until); LIST subtype selects recursion
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (ok && p + 8 <= until) {
            val id = fourcc(p)
            val sz = u32(p + 4)
            val body = p + 8
            val end = body + sz.toInt
            if (sz < 0 || end > until) { ok = false }
            else {
              if (id == "LIST" && sz >= 4) {
                val sub = fourcc(body)
                if (sub == "hdrl" || sub == "movi" || sub == "strl")
                  walk(body + 4, end)
              } else if (id == "avih" && sz >= 40) {
                periodUs = u32(body)
              } else if (id.endsWith("dc") || id.endsWith("db")) {
                val k = total
                total += 1
                if (k % decodeEvery == 0) {
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(payload, body, sz.toInt))
                  if (img == null) ok = false
                  else {
                    val w = img.getWidth; val h = img.getHeight
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val rgb = img.getRGB(x, y)
                        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                        x += 1
                      }
                      y += 1
                    }
                    decoded += ((k, w, h, (sum / (3L * w * h)).toInt))
                  }
                }
              }
              p = end + (sz.toInt & 1) // skip pad byte
            }
          }
        }
        walk(12, riffEnd)
        if (!ok || periodUs <= 0 || total == 0) None
        else Some((periodUs, total, decoded.toSeq))
      }
    }.toOption.flatten

  private[graft] def decodeAvi(payload: Array[Byte])
      : Option[(Int, Int, Int, Long, Long)] =
    parseAvi(payload).flatMap { case (periodUs, total, frames) =>
      if (frames.isEmpty ||
        frames.exists(f => f._2 != frames.head._2 || f._3 != frames.head._3))
        None
      else {
        var bits = 0L
        frames.foreach { case (k, _, _, lum) =>
          if (k < 64 && lum >= 128) bits |= (1L << k)
        }
        Some((frames.head._2, frames.head._3, total,
          total.toLong * periodUs / 1000L, bits))
      }
    }

  /** Deterministic real-AVI fixture: one MJPEG AVI per document — geometry
    * `w = 16 + id%48`, `h = 16 + 5·id%48`, `n = 6 + id%14` frames at
    * period `20000 + 5000·(id%10)` µs, frame k uniform BRIGHT (200) iff
    * `(id + k) % 3 ≠ 0` else DARK (50) — so the decode gate's oracle can
    * restate every output column, including the decoded `frame_bits`
    * pattern, in closed-form SQL arithmetic while the payload itself is a
    * genuine RIFF container full of genuine JPEGs.
    *
    * CORRUPT arm: every 41st doc carries deterministic non-RIFF bytes
    * (first byte 0x00 — no RIFF magic), pinning the `decode_ok` health
    * flag exactly as the image fixture's 0x01 arm does.
    */
  def aviAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id").cast("long"), col("lang")).as[(Long, String)])
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, lang) =>
          if (id % 41 == 0) {
            val len = (48 + id % 64).toInt
            val bytes = Array.tabulate[Byte](len)(i =>
              if (i == 0) 0x00.toByte else ((i * 29 + id) & 0xFF).toByte)
            Asset(id, "video", bytes, s"""{"lang":"$lang"}""")
          } else {
            val w = (16 + id % 48).toInt
            val h = (16 + (id * 5) % 48).toInt
            val n = (6 + id % 14).toInt
            val periodUs = (20000 + (id % 10) * 5000).toInt
            val frames = (0 until n).map { k =>
              jpegFrame(w, h, if ((id + k) % 3 != 0) 200 else 50)
            }
            Asset(id, "video", aviBytes(frames, w, h, periodUs),
              s"""{"lang":"$lang","codec":"mjpeg"}""")
          }
        }
      }
  }

  /** Partition-batched video decode with the health flag: one row per
    * asset; undecodable payloads degrade to zeros + `decode_ok = false`
    * (filterable, never fatal). Narrow map, no shuffle — scan → decode →
    * project, payloads column-pruned away for metadata-only readers.
    */
  def decodeVideo(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        decodeAvi(a.payload) match {
          case Some((w, h, n, d, bits)) =>
            (a.asset_id, w.toLong, h.toLong, n.toLong, d, bits, true)
          case None => (a.asset_id, 0L, 0L, 0L, 0L, 0L, false)
        }
      }
    }.toDF("asset_id", "width", "height", "n_frames", "duration_ms",
      "frame_bits", "decode_ok")
  }

  /** PERCEPTUAL 64-bit video fingerprint: the decoded bright/dark frame
    * pattern over the first 64 frames (bit k = frame k's mean luminance
    * ≥ 128) — the temporal cousin of the image aHash and audio
    * energy-envelope prints. Threshold decisions are invariant to any
    * brightness grade that keeps every frame on its side of 128 (JPEG
    * moves a uniform frame's decoded level by at most a couple of counts,
    * so levels ≤62 / ≥180 have ~66 counts of margin). Payloads with fewer
    * than 64 decodable frames return None — too short to fingerprint.
    */
  private[graft] def videoFingerprint(payload: Array[Byte]): Option[Long] =
    decodeAvi(payload).collect { case (_, _, n, _, bits) if n >= 64 => bits }

  /** Perceptual video near-dup candidates: fingerprint per asset (narrow
    * map with per-partition codec init), 4×16-bit banding, exact hamming
    * verification — identical bucket discipline to [[imageDupCandidates]]
    * and [[audioDupCandidates]]; one fingerprint family per modality,
    * never all-pairs.
    */
  def videoDupCandidates(assets: Dataset[Asset],
                         maxHamming: Int = 0): DataFrame = {
    import assets.sparkSession.implicits._
    val hashed = assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(a => videoFingerprint(a.payload).map(sig => (a.asset_id, sig)))
    }.toDF("asset_id", "sig")
    val banded = hashed.select(col("asset_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_bits",
        expr("shiftrightunsigned(sig, band * 16) & 65535"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("y.asset_id").as("b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Dup-structured real-AVI fixture (the video member of the
    * [[dupPngAssets]] / [[dupWavAssets]] family): each doc renders its
    * base pattern (`doc_id % nBases`) as 64 uniform frames whose
    * bright/dark sequence follows the bits of a splitmix64 signature of
    * the base (bit 0 forced set, bit 63 forced clear so no pattern is
    * degenerate), 16×16 px, then applies a per-doc fingerprint-INVARIANT
    * brightness grade t = doc_id % 13: bright = 180 + t, dark = 40 + 2t
    * (every graded level stays ≥180 / ≤64 — the threshold at 128 cannot
    * flip under JPEG's ±2 on uniform frames). Same base ⇒ identical
    * fingerprint; different docs ⇒ different JPEG bytes, so md5 dedup
    * provably finds nothing within the `lcm(nBases, 13)` id domain the
    * fixture clamps to (same bound discipline as the WAV twin) — the
    * oracle is the closed-form same-base pair set at hamming 0.
    */
  def dupAviAssets(docs: DataFrame, nBases: Int = 40): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    val idBound = {
      @annotation.tailrec def gcd(a: Long, b: Long): Long =
        if (b == 0) a else gcd(b, a % b)
      nBases.toLong * 13 / gcd(nBases.toLong, 13)
    }
    spread(docs.select(col("doc_id").cast("long")).as[Long]
        .filter((id: Long) => id < idBound))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val base = id % nBases
          var z = base + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          val sig = ((z ^ (z >>> 31)) | 1L) & ~(1L << 63)
          val t = (id % 13).toInt
          val bright = 180 + t
          val dark = 40 + 2 * t
          val frames = (0 until 64).map { k =>
            jpegFrame(16, 16, if (((sig >>> k) & 1L) == 1L) bright else dark)
          }
          Asset(id, "video", aviBytes(frames, 16, 16, 40000),
            s"""{"base":$base}""")
        }
      }
  }

  /** Aspect-preserving resize plan: fit each decoded asset into a
    * `targetW × targetH` box. The geometry is PURE INTEGER arithmetic
    * (floor division, no float scale factor) so the DuckDB oracle mirrors
    * it exactly; a real deployment resizes the pixel buffer with the same
    * output dims inside the partition-batched decode. Narrow map — the
    * 100 TB shape is scan → project, no shuffle.
    */
  def resizePlan(decoded: Dataset[Decoded],
                 targetW: Int = 224, targetH: Int = 224): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    // fit: if w/h wider than target box, clamp width; else clamp height
    val wide = w * targetH >= h * targetW
    decoded.toDF().select(
      col("asset_id"), col("kind"), col("width"), col("height"),
      when(wide, lit(targetW.toLong))
        .otherwise(expr(s"(cast(width as bigint) * $targetH) div height")).as("out_w"),
      when(wide, expr(s"(cast(height as bigint) * $targetW) div width"))
        .otherwise(lit(targetH.toLong)).as("out_h"),
      col("decode_ok"))
  }

  /** STUB feature extraction: fixed-dim float vector from payload bytes
    * (byte-histogram projection — deterministic, exact). Real extractor
    * replaces the fold; the output schema `array<float>` feeds
    * Similarity.topK / lshBuckets unchanged.
    */
  def features(assets: Dataset[Asset], dim: Int = 64): DataFrame = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val v = new Array[Float](dim)
      if (a.payload != null) a.payload.foreach { b => v((b & 0xFF) % dim) += 1.0f }
      (a.asset_id, v.toSeq)
    }.toDF("asset_id", "embedding")
  }

  /** REAL decoded-frame sampling: every `stride`-th frame of each AVI
    * payload, decoded through the RIFF walker + per-frame imageio and
    * exploded to one row per sampled frame — `(asset_id, frame_index,
    * width, height, bright)` where `bright` is the decode-exact ≥128
    * luminance threshold (JPEG-noise-robust by the fixture's ~66-count
    * margin; the raw mean is deliberately NOT emitted — it is decoder-
    * rounding-dependent, the threshold is not). The batch shape a training
    * loader's frame extractor emits: narrow flatMap, no shuffle, payloads
    * column-pruned for metadata-only readers. Undecodable payloads emit
    * nothing (filterable upstream via `decodeVideo`'s health flag).
    */
  def sampleDecodedFrames(assets: Dataset[Asset], stride: Int = 4): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        parseAvi(a.payload, decodeEvery = stride) match {
          case None => Iterator.empty
          case Some((_, _, frames)) =>
            frames.iterator.map { case (k, w, h, lum) =>
              (a.asset_id, k, w, h, lum >= 128)
            }
        }
      }
    }.toDF("asset_id", "frame_index", "width", "height", "bright")
  }

  /** Frame sampling for video-like payloads: every `stride`-th `frameSize`
    * chunk, exploded to one row per frame — the batch shape a real
    * frame-decoder emits. Pure expressions (binary `substring` is 1-based).
    */
  def sampleFrames(assets: DataFrame, frameSize: Int = 1024,
                   stride: Int = 4): DataFrame =
    assets.select(col("asset_id"), col("kind"),
        posexplode(transform(
          sequence(lit(0),
            greatest(lit(0), floor(octet_length(col("payload")) / (frameSize.toLong * stride)) - 1)),
          i => substring(col("payload"), (i * frameSize * stride + 1).cast("int"),
            lit(frameSize)))))
      .toDF("asset_id", "kind", "frame_index", "frame_bytes")
      .where(octet_length(col("frame_bytes")) > 0)
}

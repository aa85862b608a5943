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
  case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
                     channels: Int, n_bytes: Long, duration_ms: Long)

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
    * for an FFI probe.
    */
  private def decodeOne(a: Asset): Decoded = {
    val n = if (a.payload == null) 0L else a.payload.length.toLong
    decodeImage(a.payload) match {
      case Some((w, h, c)) =>
        Decoded(a.asset_id, a.kind, width = w, height = h, channels = c,
          n_bytes = n, duration_ms = 0L)
      case None =>
        Decoded(a.asset_id, a.kind,
          width = (16 + n % 512).toInt,
          height = (16 + (n * 7) % 512).toInt,
          channels = 3,
          n_bytes = n,
          duration_ms = if (a.kind == "image") 0L else n * 20L)
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
    */
  def pngAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("lang")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, lang) =>
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
        .otherwise(lit(targetH.toLong)).as("out_h"))
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

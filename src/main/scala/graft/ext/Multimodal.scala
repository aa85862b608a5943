package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.11 X5 / builder brief): image/audio/video
  * as opaque `binary` payloads with typed metadata, decoded and
  * feature-extracted per partition.
  *
  * The codec itself is STUBBED — this container has no image/audio
  * libraries — with a clearly-marked deterministic fake. Everything AROUND
  * the stub is real and tested: the asset schema, the
  * `mapPartitions`-batched decode (the shape a JNI/FFI decoder needs: one
  * library handle per partition, streaming iterator, no per-row setup), the
  * fixed-dim feature vectors ready for `Similarity.topK`, and the
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

  /** STUB decode — deterministic fake dimensions derived from the payload.
    * A real deployment replaces ONLY the body of `decodeOne`; the
    * partition-batched plumbing stays.
    */
  private def decodeOne(a: Asset): Decoded = {
    val n = if (a.payload == null) 0L else a.payload.length.toLong
    // ??? real decoder goes here (libjpeg/ffmpeg via FFI); fake is exact
    // integer arithmetic so the DuckDB oracle can replicate it.
    Decoded(a.asset_id, a.kind,
      width = (16 + n % 512).toInt,
      height = (16 + (n * 7) % 512).toInt,
      channels = 3,
      n_bytes = n,
      duration_ms = if (a.kind == "image") 0L else n * 20L)
  }

  /** Partition-batched decode: one iterator pass per partition. */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init of a (stubbed) codec handle would happen here
      it.map(decodeOne)
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

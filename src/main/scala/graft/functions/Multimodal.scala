package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video ride
  * through the engine as opaque `binary` payloads with a typed metadata
  * struct, and decode/feature-extract run as BATCHED per-partition
  * transforms so a 100 TB asset corpus streams executor-local — the scan
  * never ships payloads to the driver and never shuffles them (all derived
  * columns are narrow).
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape,
  * encoder boundaries — is real and tested. IMAGE decode is real: payloads
  * any registered `javax.imageio` reader accepts (JPEG/PNG/GIF/BMP — the
  * JDK ships the codecs) yield true pixel dimensions and mean luma. AUDIO
  * decode is real for `javax.sound.sampled`-readable payloads (WAV — the
  * JDK ships the reader): true sample rate/channels/duration plus RMS and
  * peak level from the samples. VIDEO container parsing is real for
  * ISO-BMFF (MP4/MOV) payloads — duration/dimensions/track count from
  * the box structure, no codec needed. Payloads no reader recognizes
  * (the driver fixtures carry text bytes as a stand-in blob) fall back
  * to a deterministic hash STUB, as do video FRAME decode and the
  * vision-encoder embedding (no media/model libraries in this
  * environment): every stub is marked `STUB:` and
  * derives its output from a payload hash, so results are reproducible
  * and the surrounding pipeline (metadata propagation, batching,
  * downstream ANN) is fully exercised. Swapping a stub for a real decoder
  * changes ONE function body, not the dataflow.
  */
object Multimodal {

  /** Typed asset metadata (the "header" a real ingest would parse). */
  final case class AssetMeta(format: String, widthPx: Int, heightPx: Int,
                             sampleRateHz: Int, durationMs: Long)
  final case class Asset(assetId: Long, modality: String,
                         payload: Array[Byte], meta: AssetMeta)
  final case class ImageFeatures(assetId: Long, widthPx: Int, heightPx: Int,
                                 channels: Int, meanLuma: Double,
                                 embedding: Array[Float])
  /** `decoded = true` iff the payload came through the real codec path —
    * a curation filter ("keep only assets we could actually parse") and
    * the spec's proof that pixels/samples, not metadata, won. */
  final case class AudioFeatures(assetId: Long, sampleRateHz: Int,
                                 channels: Int, durationMs: Long,
                                 rms: Double, peak: Double,
                                 decoded: Boolean)
  final case class VideoMeta(assetId: Long, widthPx: Int, heightPx: Int,
                             durationMs: Long, nTracks: Int,
                             decoded: Boolean)

  /** Derive a deterministic multimodal asset table from the `documents`
    * fixture: payload bytes are the document text (a stand-in blob),
    * modality/metadata are stable functions of doc_id. This exists because
    * the driver fixtures carry no real media; the column SHAPES match what
    * an ingest from object storage would produce. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id") * 7, lit(1920)) + 64).cast("int").as("width_px"),
        (pmod(col("doc_id") * 13, lit(1080)) + 64).cast("int").as("height_px"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0))
          .cast("int").as("sample_rate_hz"),
        (pmod(col("doc_id") * 31, lit(60000)) + 1000).as("duration_ms"))
        .as("meta"))

  // --- scan-local payload analytics (pure expressions, codegen'd) ---------

  /** Byte-level stats every modality shares: size, content hash, and a
    * magic-bytes sniff — all narrow, pushdown-friendly expressions. */
  def payloadStats(df: DataFrame): DataFrame =
    df.select(
      col("asset_id"), col("modality"),
      length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      xxhash64(col("payload")).as("content_xxh64"),
      upper(hex(substring(col("payload"), 1, 4))).as("magic"),
      col("meta.format").as("format"),
      col("meta.duration_ms").as("duration_ms"))

  /** Video frame sampling plan: one row per sampled frame timestamp —
    * pure arithmetic over metadata (the decode of each frame is the
    * downstream stub). explode() keeps it scan-local. */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("modality") === "video")
      .select(col("asset_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1,
          lit(everyMs))).as("frame_ts_ms"))
      .select(col("asset_id"), col("duration_ms"), col("frame_ts_ms"),
        (col("frame_ts_ms") / lit(1000.0)).as("frame_ts_sec"))

  // --- batched per-partition decode (the mapPartitions shape) -------------

  /** STUB fallback for payloads no image reader accepts: derives
    * pixels-free features from the payload hash, deterministically. */
  private def decodeImageStub(payload: Array[Byte], meta: AssetMeta,
                              targetW: Int, targetH: Int): (Int, Int, Int, Double) = {
    val h = java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
    val channels = 3
    val meanLuma = (h % 256).toDouble / 255.0
    (math.min(meta.widthPx, targetW), math.min(meta.heightPx, targetH),
      channels, meanLuma)
  }

  /** Container sniff on the leading magic bytes — cheaper than letting
    * ImageIO scan its reader registry against every non-image payload (a
    * per-row cost that multiplies across a corpus of opaque blobs). */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||              // JPEG SOI
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))                                 // BMP

  /** REAL image decode via `javax.imageio` (JDK-resident codecs; headless-
    * safe). Decoded path: true pixel dimensions clamped to the resize
    * target, channel count from the color model, mean Rec.601 luma over a
    * nearest-neighbor sample grid of the resized frame — work per asset is
    * bounded by targetW×targetH regardless of source resolution, which is
    * what keeps a mixed-resolution 100 TB corpus's per-task cost flat.
    * Metadata is NOT trusted for dimensions; pixels win. Payloads that
    * don't sniff as a known container, or that fail to decode, fall back
    * to the deterministic stub. */
  private[functions] def decodeImage(payload: Array[Byte], meta: AssetMeta,
                                     targetW: Int, targetH: Int): (Int, Int, Int, Double) = {
    val img =
      if (!looksLikeImage(payload)) null
      else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) decodeImageStub(payload, meta, targetW, targetH)
    else {
      val w = math.min(img.getWidth, targetW)
      val h = math.min(img.getHeight, targetH)
      val channels = img.getColorModel.getNumComponents
      var sum = 0.0
      var y = 0
      while (y < h) {
        val sy = y * img.getHeight / h
        var x = 0
        while (x < w) {
          val sx = x * img.getWidth / w
          val rgb = img.getRGB(sx, sy)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, channels, sum / (w.toLong * h) / 255.0)
    }
  }

  /** RIFF/WAVE container sniff — same role as [[looksLikeImage]]: don't
    * let the sampled-audio reader chew on every opaque blob. */
  private def looksLikeWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** STUB fallback for payloads the audio reader rejects: deterministic
    * hash-derived level stats; rate/duration fall back to metadata. */
  private def decodeAudioStub(payload: Array[Byte], meta: AssetMeta)
      : (Int, Int, Long, Double, Double, Boolean) = {
    val h = java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
    ((meta.sampleRateHz, 1, meta.durationMs,
      (h % 1000).toDouble / 1000.0,
      ((h / 1000) % 1000).toDouble / 1000.0, false))
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK-resident WAV/AIFF/AU
    * readers — the audio twin of the javax.imageio move): true sample
    * rate, channel count and duration from the stream header, and level
    * stats (RMS + absolute peak, full-scale = 1.0) from ONE pass over the
    * samples, normalized to signed 16-bit PCM first so 8/24/32-bit and
    * unsigned sources measure identically. Per-asset work is linear in
    * the payload — the same cost class as the md5 the stats pass already
    * pays — and everything stays executor-local in the batched
    * [[audioFeatures]] pass. Metadata is NOT trusted: samples win.
    * Payloads that don't sniff as RIFF/WAVE or fail to parse fall back to
    * the deterministic stub, flagged `decoded = false`. */
  private[functions] def decodeAudio(payload: Array[Byte], meta: AssetMeta)
      : (Int, Int, Long, Double, Double, Boolean) = {
    if (!looksLikeWav(payload)) decodeAudioStub(payload, meta)
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem
          .getAudioInputStream(target, in)
        val bytes = pcm.readAllBytes()
        val nSamples = bytes.length / 2
        var sumSq = 0.0
        var peak = 0.0
        var i = 0
        while (i + 1 < bytes.length) {
          val s = (((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort) / 32768.0
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 2
        }
        val frames = nSamples / math.max(fmt.getChannels, 1)
        ((math.round(fmt.getSampleRate), fmt.getChannels,
          math.round(frames * 1000.0 / fmt.getSampleRate),
          if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
          peak, true))
      } finally in.close()
    } catch { case _: Exception => decodeAudioStub(payload, meta) }
  }

  /** Audio decode + level analysis as the same BATCHED per-partition pass
    * as [[imageFeatures]]: payloads stay executor-local, output is one
    * narrow typed row per audio asset. */
  def audioFeatures(assets: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    implicit val inEnc = Encoders.product[Asset]
    assets.filter(col("modality") === "audio")
      .select(col("asset_id").as("assetId"), col("modality"), col("payload"),
        struct(col("meta.format").as("format"),
          col("meta.width_px").as("widthPx"),
          col("meta.height_px").as("heightPx"),
          col("meta.sample_rate_hz").as("sampleRateHz"),
          col("meta.duration_ms").as("durationMs")).as("meta"))
      .as[Asset]
      .mapPartitions(_.map { a =>
        val (rate, ch, dur, rms, peak, real) = decodeAudio(a.payload, a.meta)
        AudioFeatures(a.assetId, rate, ch, dur, rms, peak, real)
      })
  }

  /** ISO-BMFF (MP4/MOV) container sniff: a `ftyp` box at the top. */
  private def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  /** STUB fallback for payloads that don't parse as ISO-BMFF. */
  private def decodeVideoStub(payload: Array[Byte], meta: AssetMeta)
      : (Int, Int, Long, Int, Boolean) = {
    val h = java.util.Arrays.hashCode(payload).toLong & 0x7fffffffL
    ((meta.widthPx, meta.heightPx, meta.durationMs,
      1 + (h % 3).toInt, false))
  }

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  private def be64(p: Array[Byte], o: Int): Long =
    (be32(p, o) << 32) | be32(p, o + 4)

  /** REAL video container parse — ISO/IEC 14496-12 box walking (the JDK
    * ships no video codec, but the CONTAINER header is plain structure):
    * top-level boxes are scanned for `moov`; `moov/mvhd` yields the
    * presentation duration (duration/timescale), `moov/trak/tkhd` the
    * track count and the maximal track width/height (16.16 fixed point).
    * No frame is decoded — per-asset work is the box walk, independent
    * of media size, which is exactly the ingest-stats shape a 100 TB
    * video corpus needs (frame DECODE remains the honest stub in
    * [[frameSamplePlan]]'s downstream). 64-bit (`size == 1`) and
    * to-end-of-file (`size == 0`) boxes are honored; a malformed box
    * walk falls back to the deterministic stub, flagged
    * `decoded = false`. Metadata is NOT trusted: the header wins. */
  private[functions] def decodeVideoMeta(payload: Array[Byte],
                                         meta: AssetMeta)
      : (Int, Int, Long, Int, Boolean) = {
    if (!looksLikeMp4(payload)) decodeVideoStub(payload, meta)
    else try {
      // walk children of [from, to) and return each (type, start, end)
      def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var o = from
        while (o + 8 <= to) {
          val size32 = be32(payload, o)
          val tpe = new String(payload, o + 4, 4, "ISO-8859-1")
          val (bodyStart, end) =
            if (size32 == 1L && o + 16 <= to)
              (o + 16, o + be64(payload, o + 8).toInt)
            else if (size32 == 0L) (o + 8, to)
            else (o + 8, o + size32.toInt)
          if (end <= o || end > to) return out.toSeq // malformed: stop
          out += ((tpe, bodyStart, end))
          o = end
        }
        out.toSeq
      }
      val moov = boxes(0, payload.length).collectFirst {
        case ("moov", s, e) => (s, e)
      }.getOrElse(throw new IllegalArgumentException("no moov"))
      val kids = boxes(moov._1, moov._2)
      val durMs = kids.collectFirst { case ("mvhd", s, _) =>
        val version = payload(s) & 0xff
        val (timescale, duration) =
          if (version == 1) (be32(payload, s + 20), be64(payload, s + 24))
          else (be32(payload, s + 12), be32(payload, s + 16))
        if (timescale == 0) 0L else duration * 1000L / timescale
      }.getOrElse(0L)
      val tkhds = kids.collect { case ("trak", s, e) =>
        boxes(s, e).collectFirst { case ("tkhd", ts, _) =>
          val version = payload(ts) & 0xff
          val dimOff = ts + (if (version == 1) 88 else 76)
          // width/height are 16.16 fixed point at the end of tkhd
          ((be32(payload, dimOff) >> 16).toInt,
            (be32(payload, dimOff + 4) >> 16).toInt)
        }
      }.flatten
      val w = if (tkhds.isEmpty) 0 else tkhds.map(_._1).max
      val h = if (tkhds.isEmpty) 0 else tkhds.map(_._2).max
      ((w, h, durMs, tkhds.length, true))
    } catch { case _: Exception => decodeVideoStub(payload, meta) }
  }

  /** Video container stats as the same BATCHED per-partition pass as
    * [[imageFeatures]]/[[audioFeatures]]. */
  def videoMeta(assets: DataFrame): Dataset[VideoMeta] = {
    implicit val enc = Encoders.product[VideoMeta]
    implicit val inEnc = Encoders.product[Asset]
    assets.filter(col("modality") === "video")
      .select(col("asset_id").as("assetId"), col("modality"), col("payload"),
        struct(col("meta.format").as("format"),
          col("meta.width_px").as("widthPx"),
          col("meta.height_px").as("heightPx"),
          col("meta.sample_rate_hz").as("sampleRateHz"),
          col("meta.duration_ms").as("durationMs")).as("meta"))
      .as[Asset]
      .mapPartitions(_.map { a =>
        val (w, h, dur, n, real) = decodeVideoMeta(a.payload, a.meta)
        VideoMeta(a.assetId, w, h, dur, n, real)
      })
  }

  /** STUB: a real implementation runs a vision encoder over decoded
    * pixels; the fake emits a deterministic unit-ish vector seeded by the
    * content hash so downstream ANN/dedup operators run end-to-end. */
  private def embedStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = java.util.Arrays.hashCode(payload).toLong | 1L
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // splitmix64-style mix (public-domain constants)
      h += 0x9E3779B97F4A7C15L
      var z = h
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      v(i) = ((z & 0xffff).toFloat / 65535.0f) - 0.5f
      i += 1
    }
    v
  }

  /** Perceptual difference-hash (dHash) of an image payload: decode, sample
    * a 9×8 luma grid (nearest-neighbor — per-asset work is CONSTANT
    * regardless of source resolution), emit 64 bits of horizontal gradient
    * sign (`luma[x] > luma[x+1]`). Near-identical images — re-encodes,
    * mild resizes, small crops/watermarks — land within a few bits, while
    * byte-level hashes (md5/xxh64) treat every re-encode as a brand-new
    * payload; this is THE image-dedup signal a training-data pipeline
    * blocks on. Non-image / undecodable payloads fall back to a
    * deterministic splitmix of the payload bytes (STUB semantics: equal
    * payloads ⇒ equal hash, so distance-0 pairs == exact-dup pairs). */
  private[functions] def dHash(payload: Array[Byte]): Long = {
    val img =
      if (!looksLikeImage(payload)) null
      else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) {
      // STUB: splitmix64 of the payload hash (public-domain constants)
      var z = java.util.Arrays.hashCode(payload).toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    } else {
      val gw = 9; val gh = 8
      val g = new Array[Double](gw * gh)
      var y = 0
      while (y < gh) {
        val sy = y * img.getHeight / gh
        var x = 0
        while (x < gw) {
          val sx = x * img.getWidth / gw
          val rgb = img.getRGB(sx, sy)
          g(y * gw + x) = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var i = 0
      var yy = 0
      while (yy < gh) {
        var xx = 0
        while (xx < gw - 1) {
          if (g(yy * gw + xx) > g(yy * gw + xx + 1)) bits |= (1L << i)
          i += 1
          xx += 1
        }
        yy += 1
      }
      bits
    }
  }

  /** Per-image dHash column via the batched per-partition decode pass —
    * same economics as [[imageFeatures]]: payloads stay executor-local,
    * output is one narrow (asset_id, dhash) row per image. */
  def imageDHashes(assets: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[Asset]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    assets.filter(col("modality") === "image")
      .select(col("asset_id").as("assetId"), col("modality"), col("payload"),
        struct(col("meta.format").as("format"),
          col("meta.width_px").as("widthPx"),
          col("meta.height_px").as("heightPx"),
          col("meta.sample_rate_hz").as("sampleRateHz"),
          col("meta.duration_ms").as("durationMs")).as("meta"))
      .as[Asset]
      .mapPartitions(_.map(a => (a.assetId, dHash(a.payload))))
      .toDF("asset_id", "dhash")
  }

  /** Near-dup image pairs from dHashes: banded Hamming blocking (Manku et
    * al. WWW 2007, the same pigeonhole as SimHash banding — two hashes
    * within `maxDistance` bits must agree EXACTLY on at least one of
    * `bands` disjoint bit-bands when `maxDistance < bands`), verified by
    * an exact `bit_count(a XOR b)` on each candidate. One equi-join per
    * band key — never an all-pairs product — so the plan scales like the
    * text-side LSH family. Lossless for `maxDistance < bands`. */
  def dhashNearDupPairs(hashes: DataFrame, maxDistance: Int = 3,
                        bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64 (got $bands)")
    require(maxDistance >= 0, s"maxDistance must be >= 0 (got $maxDistance)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val bandCols = (0 until bands).map { b =>
      shiftrightunsigned(col("dhash"), b * width).bitwiseAND(lit(mask))
    }
    val banded = hashes.select(col("asset_id"), col("dhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("a.dhash").as("hash_a"),
        col("b.asset_id").as("asset_b"), col("b.dhash").as("hash_b"))
      .distinct()
    cand.select(col("asset_a"), col("asset_b"),
        Dedup.hammingDistance(col("hash_a"), col("hash_b")).as("distance"))
      .filter(col("distance") <= maxDistance)
  }

  /** Image decode + resize + embed as a BATCHED per-partition pass:
    * `mapPartitions` hands each executor core an iterator over its
    * partition, so a real codec would amortize model/codec init once per
    * partition (the same economics as Arrow-batched UDFs). No shuffle, no
    * driver involvement; output is a typed Dataset. */
  def imageFeatures(assets: DataFrame, targetW: Int = 224, targetH: Int = 224,
                    embeddingDim: Int = 64): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    implicit val inEnc = Encoders.product[Asset]
    assets.filter(col("modality") === "image")
      .select(col("asset_id").as("assetId"), col("modality"),
        col("payload"),
        struct(col("meta.format").as("format"),
          col("meta.width_px").as("widthPx"),
          col("meta.height_px").as("heightPx"),
          col("meta.sample_rate_hz").as("sampleRateHz"),
          col("meta.duration_ms").as("durationMs")).as("meta"))
      .as[Asset]
      .mapPartitions { batch =>
        // per-partition init happens HERE once (codec handles, model
        // weights); the stub has nothing to init.
        batch.map { a =>
          val (w, hgt, ch, luma) =
            decodeImage(a.payload, a.meta, targetW, targetH)
          ImageFeatures(a.assetId, w, hgt, ch, luma,
            embedStub(a.payload, embeddingDim))
        }
      }
  }
}

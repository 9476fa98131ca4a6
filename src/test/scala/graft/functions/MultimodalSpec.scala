package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, sfTiny)).cache()

  test("asset table carries binary payloads with typed metadata") {
    val schema = assets.schema
    assert(schema("payload").dataType.typeName === "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ===
      Seq("format", "width_px", "height_px", "sample_rate_hz", "duration_ms"))
    // every modality present; format tracks modality
    val pairs = assets.select("modality", "meta.format").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("image", "jpeg"), ("audio", "wav"), ("video", "mp4")))
  }

  test("payload stats are scan-local byte analytics") {
    val stats = Multimodal.payloadStats(assets)
    val r = stats.filter(col("asset_id") === 3).head()
    // payload is the text bytes, so n_bytes == n_chars for ASCII docs
    val nChars = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") === 3).select(length(col("text"))).head().getInt(0)
    assert(r.getAs[Int]("n_bytes") === nChars)
    assert(r.getAs[String]("content_md5").length === 32)
    assert(r.getAs[String]("magic").length === 8) // 4 bytes hex
    // no shuffle in the plan: narrow expressions only
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"payload stats should not shuffle:\n$plan")
  }

  test("frame sample plan enumerates deterministic timestamps per video") {
    val frames = Multimodal.frameSamplePlan(assets, everyMs = 5000)
    val one = frames.filter(col("asset_id") === 2) // doc_id % 3 == 2 -> video
      .orderBy("frame_ts_ms").collect()
    assert(one.nonEmpty)
    val duration = one.head.getAs[Long]("duration_ms")
    assert(one.map(_.getAs[Long]("frame_ts_ms")).toSeq ===
      (0L until duration by 5000L).toSeq)
  }

  test("image feature extraction: batched, deterministic, typed output") {
    val feats = Multimodal.imageFeatures(assets, embeddingDim = 32).cache()
    val nImages = assets.filter(col("modality") === "image").count()
    assert(feats.count() === nImages)
    val f = feats.filter(col("assetId") === 3).head()
    assert(f.channels === 3)
    assert(f.meanLuma >= 0.0 && f.meanLuma <= 1.0)
    assert(f.embedding.length === 32)
    assert(f.widthPx <= 224 && f.heightPx <= 224) // resize clamp
    // deterministic: a second run yields identical features
    val again = Multimodal.imageFeatures(assets, embeddingDim = 32)
      .filter(col("assetId") === 3).head()
    assert(again.meanLuma === f.meanLuma)
    assert(again.embedding.toSeq === f.embedding.toSeq)
  }

  test("real PNG/JPEG payloads decode through javax.imageio: pixel dims beat metadata") {
    import spark.implicits._
    def encode(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val grayPng = encode(50, 40, 0x808080, "png")   // luma 128/255
    val whiteJpg = encode(500, 300, 0xffffff, "jpg") // oversize: clamps to target
    // metadata deliberately lies about dimensions: decoded pixels must win
    val assets = Seq((0L, grayPng), (3L, whiteJpg))
      .toDF("asset_id", "payload")
      .select(col("asset_id"), lit("image").as("modality"), col("payload"),
        struct(lit("png").as("format"), lit(999).as("width_px"),
          lit(999).as("height_px"), lit(0).as("sample_rate_hz"),
          lit(0L).as("duration_ms")).as("meta"))
    val feats = Multimodal.imageFeatures(assets)
      .collect().map(f => f.assetId -> f).toMap
    val gray = feats(0L)
    assert((gray.widthPx, gray.heightPx) === (50, 40),
      "decoded dims must come from the pixels, not the metadata")
    assert(gray.channels === 3)
    assert(math.abs(gray.meanLuma - 128.0 / 255.0) < 0.01)
    val white = feats(3L)
    assert((white.widthPx, white.heightPx) === (224, 224), "resize clamp")
    assert(white.meanLuma > 0.98, s"white frame luma ${white.meanLuma}")
    // the magic sniff in payloadStats sees the real container bytes
    val magic = Multimodal.payloadStats(assets)
      .select("asset_id", "magic").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(magic(0L) === "89504E47") // \x89PNG
    assert(magic(3L).startsWith("FFD8"))  // JPEG SOI
  }

  test("real WAV payloads decode through javax.sound.sampled: samples beat metadata") {
    import spark.implicits._
    // Plant a genuine RIFF/WAVE payload: mono 8 kHz signed-16-bit PCM,
    // 4000 frames (500 ms) of a half-scale square wave -> RMS = peak = 0.5
    def wav(rateHz: Int, frames: Int, amp: Short): Array[Byte] = {
      val samples = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val s: Short = if (i % 2 == 0) amp else (-amp).toShort
        samples(2 * i) = (s & 0xff).toByte
        samples(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rateHz.toFloat, 16, 1, 2, rateHz.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val real = wav(8000, 4000, 16384) // half full-scale
    val fake = "definitely not audio bytes".getBytes("UTF-8")
    // metadata deliberately lies (16 kHz / 60 s): decoded samples must win
    val assets = Seq((1L, real), (2L, fake)).toDF("asset_id", "payload")
      .select(col("asset_id"), lit("audio").as("modality"), col("payload"),
        struct(lit("wav").as("format"), lit(0).as("width_px"),
          lit(0).as("height_px"), lit(16000).as("sample_rate_hz"),
          lit(60000L).as("duration_ms")).as("meta"))
    val feats = Multimodal.audioFeatures(assets)
      .collect().map(f => f.assetId -> f).toMap
    val r = feats(1L)
    assert(r.decoded, "RIFF/WAVE payload must take the real codec path")
    assert(r.sampleRateHz === 8000, "rate must come from the stream header")
    assert(r.channels === 1)
    assert(r.durationMs === 500L, "duration must come from the frame count")
    assert(math.abs(r.rms - 0.5) < 0.001, s"square-wave RMS ${r.rms}")
    assert(math.abs(r.peak - 0.5) < 0.001, s"square-wave peak ${r.peak}")
    // non-audio payload: deterministic stub, metadata passthrough, flagged
    val s = feats(2L)
    assert(!s.decoded)
    assert(s.sampleRateHz === 16000 && s.durationMs === 60000L)
    val again = Multimodal.audioFeatures(assets)
      .collect().map(f => f.assetId -> f).toMap
    assert(again(2L) === s, "stub path must be deterministic")
  }

  test("real MP4 payloads parse through the ISO-BMFF box walk: header beats metadata") {
    import spark.implicits._
    // hand-assemble a minimal valid MP4: ftyp + moov(mvhd + trak(tkhd))
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ tpe.getBytes("ISO-8859-1") ++ body
    val mvhd = box("mvhd", // v0: timescale 1000, duration 7500 -> 7500 ms
      Array.fill[Byte](12)(0) ++ be32(1000) ++ be32(7500) ++
        Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", // v0: width 640, height 360 as 16.16 fixed
      Array.fill[Byte](76)(0) ++ be32(640L << 16) ++ be32(360L << 16))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0)) ++
      box("moov", mvhd ++ box("trak", tkhd))
    val junk = "not a video at all".getBytes("UTF-8")
    // metadata deliberately lies (1920x1080, 60 s): the header must win
    val assets = Seq((1L, mp4), (2L, junk)).toDF("asset_id", "payload")
      .select(col("asset_id"), lit("video").as("modality"), col("payload"),
        struct(lit("mp4").as("format"), lit(1920).as("width_px"),
          lit(1080).as("height_px"), lit(0).as("sample_rate_hz"),
          lit(60000L).as("duration_ms")).as("meta"))
    val metas = Multimodal.videoMeta(assets)
      .collect().map(v => v.assetId -> v).toMap
    val r = metas(1L)
    assert(r.decoded, "ISO-BMFF payload must take the real parse path")
    assert((r.widthPx, r.heightPx) === (640, 360),
      "dimensions must come from tkhd, not the metadata")
    assert(r.durationMs === 7500L, "duration must come from mvhd")
    assert(r.nTracks === 1)
    // junk payload: deterministic stub, metadata passthrough, flagged
    val s = metas(2L)
    assert(!s.decoded)
    assert((s.widthPx, s.heightPx, s.durationMs) === (1920, 1080, 60000L))
    val again = Multimodal.videoMeta(assets)
      .collect().map(v => v.assetId -> v).toMap
    assert(again(2L) === s, "stub path must be deterministic")
  }

  test("audioFeatures covers every audio asset in the fixture corpus") {
    val feats = Multimodal.audioFeatures(assets)
    val nAudio = assets.filter(col("modality") === "audio").count()
    assert(feats.count() === nAudio)
    // fixture payloads are text bytes -> all stub-flagged, all in-range
    val rows = feats.collect()
    assert(rows.forall(!_.decoded))
    assert(rows.forall(f => f.rms >= 0.0 && f.rms < 1.0))
  }

  test("stub embeddings flow into the similarity operators end-to-end") {
    val feats = Multimodal.imageFeatures(assets, embeddingDim = 32)
      .select(col("assetId").as("vec_id"), col("embedding"))
    val queries = feats.limit(3)
    val topk = Similarity.bruteForceTopK(feats, queries, k = 4)
    val counts = topk.groupBy("query_id").count().collect()
    assert(counts.length === 3)
    counts.foreach(r => assert(r.getLong(1) === 4))
  }

  test("payload near-dup finds exactly the byte-identical assets") {
    import spark.implicits._
    // ids 0,3,6 are image-modality (id % 3 == 0); 0 and 3 share bytes
    val docs = Seq(
      (0L, "the same exact payload bytes"),
      (3L, "the same exact payload bytes"),
      (6L, "a completely different text body here"),
      (1L, "the same exact payload bytes")) // audio modality: excluded
      .toDF("doc_id", "text")
    val feats = Multimodal.imageFeatures(Multimodal.assetsFromDocuments(docs))
      .toDF().select(col("assetId").as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineThresholdPairs(feats, 0.9, nBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 3L)),
      s"expected exactly the duplicate pair, got ${pairs.toSeq}")
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
    // deterministic end to end: a second run produces identical rows
    val again = Similarity.cosineThresholdPairs(feats, 0.9, nBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSet === pairs.toSet)
  }

  private def encodePng(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: perturbed re-render stays near, different image is far") {
    // horizontal gradient image: dHash bits are all-ones per row direction
    def shade(x: Int, y: Int): Int = { val v = (x * 255) / 99; (v << 16) | (v << 8) | v }
    val base = encodePng(100, 80)(shade)
    // same scene re-rendered at a different resolution: dHash is sampled
    // on a fixed 9x8 grid, so the hash should be nearly unchanged
    val rescaled = encodePng(50, 40)((x, y) => { val v = (x * 255) / 49; (v << 16) | (v << 8) | v })
    // reversed gradient: every horizontal comparison flips
    val reversed = encodePng(100, 80)((x, y) => shade(99 - x, y))
    val hBase = Multimodal.dHash(base)
    val hRescaled = Multimodal.dHash(rescaled)
    val hReversed = Multimodal.dHash(reversed)
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(hBase, hRescaled) <= 3,
      s"re-render should stay within a few bits (got ${dist(hBase, hRescaled)})")
    assert(dist(hBase, hReversed) >= 32,
      s"reversed gradient should flip most bits (got ${dist(hBase, hReversed)})")
  }

  test("dhashNearDupPairs: banded == exhaustive; stub distance-0 == exact dups") {
    import spark.implicits._
    // ids all % 3 == 0 so every asset is image-modality; two byte-identical
    // text payloads stub-hash identically, one differs
    val docs = Seq(
      (0L, "payload payload payload one"),
      (3L, "payload payload payload one"),
      (6L, "something else entirely goes here"),
      (9L, "payload payload payload one"))
      .toDF("doc_id", "text")
    val hashes = Multimodal.imageDHashes(Multimodal.assetsFromDocuments(docs))
    for (d <- Seq(0, 3)) {
      val banded = Multimodal.dhashNearDupPairs(hashes, maxDistance = d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exhaustive = hashes.as("a").join(hashes.as("b"),
          col("a.asset_id") < col("b.asset_id"))
        .select(col("a.asset_id"), col("b.asset_id"),
          Dedup.hammingDistance(col("a.dhash"), col("b.dhash")).as("dist"))
        .filter(col("dist") <= d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded === exhaustive, s"banded != exhaustive at d=$d")
    }
    val zero = Multimodal.dhashNearDupPairs(hashes, maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero === Set((0L, 3L), (0L, 9L), (3L, 9L)),
      "stub hashes: distance-0 pairs must be exactly the byte-dup pairs")
  }

  test("dhashNearDupPairs on real images pairs the re-render, not the reverse") {
    import spark.implicits._
    def shade(w: Int)(x: Int, y: Int): Int = { val v = (x * 255) / (w - 1); (v << 16) | (v << 8) | v }
    val rows = Seq(
      (1L, encodePng(100, 80)(shade(100))),
      (2L, encodePng(50, 40)(shade(50))),
      (3L, encodePng(100, 80)((x, y) => shade(100)(99 - x, y))))
    val assets = rows.toDF("asset_id", "payload")
      .select(col("asset_id"), lit("image").as("modality"), col("payload"),
        struct(lit("png").as("format"), lit(0).as("width_px"),
          lit(0).as("height_px"), lit(0).as("sample_rate_hz"),
          lit(0L).as("duration_ms")).as("meta"))
    val pairs = Multimodal.dhashNearDupPairs(
        Multimodal.imageDHashes(assets), maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"expected only the re-rendered pair, got $pairs")
  }
}

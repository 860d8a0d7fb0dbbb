package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL as of round 12: [[decodeImage]] reads PNG / BMP /
  * GIF / JPEG through the JDK's own `javax.imageio.ImageIO` (zero new
  * dependencies) and produces an integer BT.601 luma plane; [[decode]]
  * routes decodable images through it and falls back to the deterministic
  * byte-plane stub ([[stubDecode]]) for everything else (audio/video/
  * unknown blobs — codecs for those are still absent in this container).
  * Exactness contract: PNG and BMP are lossless and their decode is
  * pinned by spec on any JDK; JPEG decodes deterministically within one
  * JDK but is NOT pinned across vendors (the classic libjpeg IDCT
  * variance) — keep JPEG out of cross-engine oracles.
  *
  * Scale note: media blobs ride the scan as `BinaryType`; per-partition
  * `mapPartitions` keeps decode zero-shuffle and lets one task amortize
  * decoder init across its whole partition (the reason for mapPartitions
  * over a per-row UDF).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  final case class DecodedMedia(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float]
  )

  /** STUB decode — deterministic fake in place of a real image/audio
    * decoder (none available in this container). Dimensions derive from a
    * stable hash of the content; the feature vector is a REAL computation
    * (folded byte histogram, 8 bins, L1-normalized) so downstream
    * similarity plumbing has honest numbers to chew on.
    */
  def stubDecode(r: MediaRow): DecodedMedia = {
    val h = java.util.Arrays.hashCode(r.content)
    val hist = new Array[Float](8)
    var i = 0
    while (i < r.content.length) {
      hist((r.content(i) & 0xff) >> 5) += 1f
      i += 1
    }
    val total = math.max(1f, r.content.length.toFloat)
    DecodedMedia(
      doc_id = r.doc_id,
      media_type = r.media_type,
      byte_len = r.content.length,
      width = 64 + math.floorMod(h, 1856), // fake 64..1919
      height = 64 + math.floorMod(h / 1856, 1016), // fake 64..1079
      channels = 3,
      features = hist.map(_ / total)
    )
  }

  /** REAL image decode via JDK `ImageIO` — PNG / BMP / GIF / JPEG, the
    * readers every JRE ships. Returns (width, height, channels, luma)
    * where luma is the integer BT.601 plane `(77R + 150G + 29B) >> 8`
    * (all-integer: deterministic on any engine), or None when the bytes
    * are not a decodable image (magic-sniffed first so arbitrary text
    * blobs never reach the decoder).
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 8) return None
    val isPng = (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    val isBmp = bytes(0) == 'B' && bytes(1) == 'M'
    val isJpg = (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
    val isGif = bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'
    if (!isPng && !isBmp && !isJpg && !isGif) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) None // shed absurd planes
        else {
          // bulk getRGB: one sRGB-converted row-major int plane (same
          // values as per-pixel getRGB, deterministic for the lossless
          // formats) instead of w·h virtual calls
          val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
          val luma = new Array[Byte](w * h)
          var i = 0
          while (i < rgbs.length) {
            val rgb = rgbs(i)
            luma(i) =
              ((77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8).toByte
            i += 1
          }
          Some((w, h, img.getColorModel.getNumComponents, luma))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 8-bin L1-normalized histogram of an unsigned byte plane (the honest
    * feature vector both decode paths share).
    */
  private def histogram8(plane: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < plane.length) { hist((plane(i) & 0xff) >> 5) += 1f; i += 1 }
    val total = math.max(1f, plane.length.toFloat)
    hist.map(_ / total)
  }

  /** Decode one row: REAL ImageIO decode for image bytes (true dims +
    * channel count + luma histogram), [[stubDecode]] for everything else.
    */
  def realDecode(r: MediaRow): DecodedMedia = decodeImage(r.content) match {
    case Some((w, h, ch, luma)) =>
      DecodedMedia(
        doc_id = r.doc_id,
        media_type = r.media_type,
        byte_len = r.content.length,
        width = w,
        height = h,
        channels = ch,
        features = histogram8(luma)
      )
    case None => stubDecode(r)
  }

  /** Decode a media Dataset per partition (batched, zero-shuffle). */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(realDecode))
  }

  /** "Video" frame sampling: treat content as fixed-size frame blocks and
    * keep every `stride`-th FULL block — pure column ops (no UDF): slice
    * the binary into `frameSize` chunks via substring arithmetic. Content
    * shorter than one frame yields no frames (the row drops out), and a
    * partial tail block is dropped — block semantics are uniform, never a
    * phantom undersized frame.
    */
  def sampleFrames(df: DataFrame, content: String, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(content)) / frameSize).cast("int")
    df.withColumn(
      "frame_idx",
      explode(
        when(
          nFrames > 0,
          filter(sequence(lit(0), nFrames - 1), i => i % stride === 0)
        ).otherwise(array().cast("array<int>"))
      )
    ).withColumn(
      "frame",
      substring(col(content), (col("frame_idx") * frameSize + 1).cast("int"), lit(frameSize))
    )
  }

  /** "Resize" stub: nearest-neighbor downsample of the raw byte plane by
    * `factor` (every factor-th byte), run per-partition over the typed
    * Dataset — the same zero-shuffle batch shape a real resampling kernel
    * (JNI libjpeg/swscale) would use; swapping the loop body changes no
    * plan.
    */
  def resizeDataset(ds: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1)
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val out = new Array[Byte]((r.content.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = r.content(i * factor); i += 1 }
      r.copy(content = out)
    })
  }

  /** Deterministic synthetic-image encoder: renders a w×h RGB plane whose
    * pixel (x, y) derives from (seed, x, y) by a splitmix64-style integer
    * mix (no RNG state — the repo's determinism discipline), encoded with
    * the JDK writer for `format` ("png" | "bmp" | "gif" | "jpg"). Exists
    * for spec/oracle construction: lossless formats round-trip the exact
    * plane, so expected decode results are computable in closed form.
    */
  def syntheticImage(seed: Long, w: Int, h: Int, format: String): Array[Byte] = {
    val img =
      new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, syntheticPixel(seed, x, y))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos), s"no JDK writer for '$format'")
    baos.toByteArray
  }

  /** The synthetic plane's pixel formula (splitmix64-style mix), exposed
    * so oracles can recompute expected pixels WITHOUT going through the
    * encode/decode path under test.
    */
  def syntheticPixel(seed: Long, x: Int, y: Int): Int = {
    var z = seed + x * 0x9e3779b97f4a7c15L + y * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 0xffffff).toInt
  }

  /** BT.601 integer luma of a packed RGB int — the [[decodeImage]] plane
    * formula, exposed for the same oracle-recompute reason.
    */
  def bt601Luma(rgb: Int): Int =
    (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8

  /** REAL image resize: decode (via [[decodeImage]]) and nearest-neighbor
    * resample the luma plane to (dstW, dstH) with exact integer index
    * math — `src = (dst · srcDim) / dstDim` — so the result is
    * deterministic on any JVM and replayable from the pixel formula alone
    * (no float scaling, no interpolation rounding). Non-image rows fall
    * back to the 1-D byte-plane stride stub ([[resizeDataset]] semantics)
    * over dstW·dstH bytes. Output rows: (doc_id, media_type, width,
    * height, plane) with the plane as a binary column — the embedding-
    * prep shape (fixed-size input planes) a multimodal pipeline feeds to
    * its encoder. Zero-shuffle mapPartitions, same batch shape as
    * [[decode]].
    */
  def resizeImage(ds: Dataset[MediaRow], dstW: Int, dstH: Int): DataFrame = {
    require(dstW >= 1 && dstH >= 1, s"target dims must be >= 1, got ${dstW}x$dstH")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val plane = decodeImage(r.content) match {
        case Some((w, h, _, luma)) =>
          val out = new Array[Byte](dstW * dstH)
          var y = 0
          while (y < dstH) {
            val sy = (y.toLong * h / dstH).toInt
            var x = 0
            while (x < dstW) {
              val sx = (x.toLong * w / dstW).toInt
              out(y * dstW + x) = luma(sy * w + sx)
              x += 1
            }
            y += 1
          }
          out
        case None =>
          // non-image: strided byte sampling over the raw plane
          val n = r.content.length
          val out = new Array[Byte](dstW * dstH)
          if (n > 0) {
            var i = 0
            while (i < out.length) {
              out(i) = r.content((i.toLong * n / out.length).toInt)
              i += 1
            }
          }
          out
      }
      (r.doc_id, r.media_type, dstW, dstH, plane)
    }).toDF("doc_id", "media_type", "width", "height", "plane")
  }

  /** Build a MediaRow dataset from the documents table (text bytes stand in
    * for media content — the driver testdata has no true binary column).
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        concat(lit("media/"), col("source")).as("media_type"),
        encode(col("text"), "UTF-8").as("content")
      )
      .as[MediaRow]
  }

  /** Perceptual average-hash (aHash) of the media byte plane: split the
    * content into `bits` equal block ranges, bit j = (block-j mean >
    * global mean). On a real image pipeline the input is the decoded
    * 8×8-downsampled grayscale plane (the classic aHash); here it runs
    * on the raw bytes the [[stubDecode]] environment provides — swapping
    * in a real decoder changes the bytes, not the operator. Returns
    * (id, simhash) — deliberately the [[graft.operators.Dedup.simhash]]
    * column contract so the Manku pigeonhole blocking is shared.
    *
    * Zero-shuffle `mapPartitions` (same batch shape as [[decode]]).
    */
  def aHash(ds: Dataset[MediaRow], bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val h = decodeImage(r.content) match {
        case Some((w, hgt, _, luma)) if bits == 64 => lumaAHash64(luma, w, hgt)
        case Some((_, _, _, luma)) => planeAHash(luma, bits)
        case None => planeAHash(r.content, bits)
      }
      (r.doc_id, h)
    }).toDF("id", "simhash")
  }

  /** Exact 128-bit compare of two non-negative Long products: a·b > c·d.
    * The cross-multiplied mean compare overflows a 64-bit product once
    * the plane passes ~190 MB (s ≤ 255·n makes s·n ≈ 255·n² exceed
    * Long.MaxValue past n ≈ 1.9e8) — and the non-image fallback path
    * feeds raw blobs unbounded, so the compare must be overflow-proof.
    * `Math.multiplyHigh` gives the high 64 bits; the low halves compare
    * unsigned.
    */
  private[graft] def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val h1 = Math.multiplyHigh(a, b)
    val h2 = Math.multiplyHigh(c, d)
    if (h1 != h2) h1 > h2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** 1-D block-mean aHash over a raw byte plane — the non-image fallback
    * (and the sub-64-bit form). All-integer: block mean > global mean is
    * compared cross-multiplied (s_j · n > S · n_j) in 128 bits
    * ([[prodGt]]), so no division ever rounds a borderline bit and no
    * giant blob (> ~190 MB, where the 64-bit product overflows) silently
    * flips one.
    */
  private[graft] def planeAHash(plane: Array[Byte], bits: Int): Long = {
    val n = plane.length
    var h = 0L
    if (n > 0) {
      var total = 0L
      var i = 0
      while (i < n) { total += (plane(i) & 0xff); i += 1 }
      var j = 0
      while (j < bits) {
        val lo = (j.toLong * n / bits).toInt
        val hi = ((j + 1).toLong * n / bits).toInt
        var s = 0L
        var k = lo
        while (k < hi) { s += (plane(k) & 0xff); k += 1 }
        // s/(hi-lo) > total/n  <=>  s*n > total*(hi-lo), exact in 128 bits
        if (hi > lo && prodGt(s, n, total, hi - lo)) h |= (1L << j)
        j += 1
      }
    }
    h
  }

  /** CLASSIC 8×8 average hash over a decoded luma plane: the image
    * partitions into an 8×8 grid of pixel boxes (exact integer bounds
    * bx·w/8 … (bx+1)·w/8), bit (by·8 + bx) set when the box's mean
    * exceeds the global mean — compared cross-multiplied in longs, so
    * the hash is bit-exact on any engine. Images smaller than 8 px on a
    * side leave their empty boxes at 0 (same convention as the 1-D path).
    * Format-invariance: a PNG and a BMP of the SAME pixel plane decode to
    * the same luma and therefore the same hash (spec-pinned).
    */
  private[graft] def lumaAHash64(luma: Array[Byte], w: Int, h: Int): Long = {
    if (w <= 0 || h <= 0) return 0L
    var total = 0L
    var i = 0
    while (i < luma.length) { total += (luma(i) & 0xff); i += 1 }
    val nAll = luma.length.toLong
    var hash = 0L
    var by = 0
    while (by < 8) {
      val y0 = (by.toLong * h / 8).toInt
      val y1 = ((by + 1).toLong * h / 8).toInt
      var bx = 0
      while (bx < 8) {
        val x0 = (bx.toLong * w / 8).toInt
        val x1 = ((bx + 1).toLong * w / 8).toInt
        val nBox = (y1 - y0).toLong * (x1 - x0)
        if (nBox > 0) {
          var sBox = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sBox += (luma(y * w + x) & 0xff); x += 1 }
            y += 1
          }
          if (sBox * nAll > total * nBox) hash |= (1L << (by * 8 + bx))
        }
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** Image near-dup pairs: [[aHash]] + the Manku permute-and-block
    * Hamming join ([[graft.operators.Dedup.simhashBlocked]]) — the dedup
    * pass a multimodal corpus runs on its image column (re-encoded /
    * lightly-edited copies land within a few aHash bits; pigeonhole
    * blocking finds ALL pairs within `maxHamming` exactly, no
    * all-pairs scan). Returns (id_a, id_b, hamming), id_a < id_b.
    *
    * Scale shape: identical to the text simhash path — the join carries
    * (id, 8-byte fp, block key) rows only, never content; candidate mass
    * is governed by the block-key width exactly as measured in
    * `StressXOps simhash`.
    */
  def imageNearDupPairs(ds: Dataset[MediaRow], maxHamming: Int = 2, blocks: Int = 4): DataFrame =
    Dedup
      .pairsFromFps(aHash(ds), maxHamming, blocks)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))

  /** Audio-style frame features over the media byte plane: cut the content
    * into complete `frameSize`-byte frames and emit per-frame (rms, mean)
    * of the unsigned samples — the windowed-feature pass an audio
    * pipeline runs before VAD / silence trimming / energy gating. The
    * kernel is the native codegen [[graft.functions.codecs.PcmFrames]]
    * (integer accumulation — exact, order-free, engine-replayable); the
    * operator is a pure projection + explode, zero shuffle. On a real
    * pipeline the input is the decoded PCM plane ([[stubDecode]] note);
    * swapping the decoder changes no plan shape.
    */
  /** Energy-gated segmentation over [[audioFrames]] — the VAD / silence-
    * trimming pass: frames with rms below `silenceRms` are gaps, maximal
    * runs of active frames become segments (classic gaps-and-islands:
    * run key = frame_idx − row_number within the doc). Returns one row
    * per segment: (doc_id, seg_idx, start_frame, end_frame, n_frames,
    * mean_rms). Because the frame features are bit-exact in any engine
    * (integer sums), the gate boolean — and therefore the segmentation —
    * is exactly replayable, however close a frame sits to the threshold.
    *
    * Scale shape: the only exchange is the per-DOC window (frames per
    * doc are bounded by media length — thousands, not corpus-sized), so
    * partitions stay uniform at any corpus width.
    */
  def audioSegments(
      media: DataFrame,
      frameSize: Int = 8,
      silenceRms: Double = 80.0
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // carry the EXACT integer Σx² per frame: the segment RMS is computed
    // over all samples from summed longs (order-free), where an
    // avg-of-rounded-frame-rms would sit on 6dp midpoints and flip
    // between engines (measured on the oracle corpus)
    val active = media
      .select(
        col("doc_id"),
        posexplode(graft.functions.codecs.pcm_frames(col("content"), frameSize))
          .as(Seq("frame_idx", "f"))
      )
      .select(
        col("doc_id"),
        col("frame_idx"),
        round(col("f.rms"), 6).as("rms"),
        col("f.sum_sq").as("sum_sq")
      )
      .filter(col("rms") >= silenceRms)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    active
      .withColumn("__grp", col("frame_idx") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(
        min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("sum_sq")).as("__sq")
      )
      .withColumn(
        "seg_idx",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("start_frame"))) - 1
      )
      .select(
        col("doc_id"),
        col("seg_idx"),
        col("start_frame"),
        col("end_frame"),
        col("n_frames"),
        round(
          sqrt(col("__sq").cast("double") / (col("n_frames") * frameSize).cast("double")),
          6
        ).as("seg_rms")
      )
  }

  def audioFrames(media: DataFrame, frameSize: Int = 8): DataFrame =
    media.select(
        col("doc_id"),
        posexplode(graft.functions.codecs.pcm_frames(col("content"), frameSize))
          .as(Seq("frame_idx", "f"))
      )
      .select(
        col("doc_id"),
        col("frame_idx"),
        round(col("f.rms"), 6).as("rms"),
        round(col("f.mean"), 6).as("mean")
      )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A multimodal record: opaque binary payload + typed metadata — the
  * image/audio/video column model for a training-data pipeline.
  */
case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)

/** Extracted media metadata (the decode output schema). */
case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long,
    n_frames: Long, content_sha: String)

/** One sampled frame of a media payload (the 1→N frame-extraction shape). */
case class FrameRecord(doc_id: Long, frame_idx: Long, frame_payload: Array[Byte])

/** A media feature vector (the media-embedding output schema). */
case class MediaFeature(doc_id: Long, feature: Array[Float])

/** Perceptual 64-bit image hashes (difference hash + average hash). */
case class MediaPHash(doc_id: Long, dhash: Long, ahash: Long)

/** Decoded audio metadata (the audio-decode output schema). */
case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
    bits: Long, n_samples: Long, duration_ms: Long, content_sha: String)

/** Per-channel audio features: RMS level and DC mean, both in [-1, 1]. */
case class AudioFeature(doc_id: Long, rms: Array[Float], mean: Array[Float])

case class AudioFp(doc_id: Long, fp: Long)

/** Parsed video container metadata (the video-probe output schema).
  * `n_frames` is the stsz sample count of the largest-dimensioned track
  * (the video track — audio tracks carry 0×0 dims), 0 when absent.
  */
case class VideoMeta(doc_id: Long, byte_len: Long, duration_ms: Long,
    width: Long, height: Long, n_frames: Long, n_tracks: Long,
    content_sha: String)

/** Multimodal-column plumbing: treat media as `binary` payloads with typed
  * metadata, decode/feature-extract as a per-partition batch operator.
  *
  * Image decode is REAL for every format the JDK itself can read: PPM/P6
  * via the hand-rolled parser ([[parsePpm]]) and PNG/JPEG/BMP/GIF/WBMP via
  * `javax.imageio` ([[decodeImage]] — ships with the JRE, zero added
  * dependencies). Audio decode is REAL the same way: WAV/AIFF/AU via
  * `javax.sound.sampled.AudioSystem` ([[decodeAudio]] — also in every
  * JRE), with true sample-rate/duration metadata ([[audioMeta]]) and
  * per-channel RMS/mean features ([[audioFeatures]]). VIDEO codecs are
  * absent from the JDK, so frame DECODE remains a DETERMINISTIC FAKE
  * (clearly marked below, as is the fallback for payloads no codec
  * claims) — but video container METADATA is real: [[parseMp4]] walks
  * the ISO-BMFF box tree (MP4/MOV — pure JVM, the video twin of
  * [[parsePpm]]) and [[videoMeta]] reports true duration, dimensions
  * and track count from mvhd/tkhd. Everything Spark-side is real
  * and tested: the binary schema, the typed `Dataset[MediaRecord]` →
  * `Dataset[MediaMeta]` `mapPartitions` shape (partition-batched, the JVM
  * analog of `mapInPandas`), and the pure-SQL fingerprint/metadata path
  * that the oracle checks. Fixture payloads are the text UTF-8 encoded —
  * the plumbing is payload-agnostic.
  *
  * Scale notes: decode is a map-side `mapPartitions` — zero shuffle; batch
  * amortization happens per partition (the reason `mapInPandas`/Arrow
  * batches exist). Binary payloads stay columnar in parquet; metadata
  * columns prune independently of the payload (a metadata-only query never
  * reads payload bytes).
  */
object MultimodalOps {

  /** Hex SHA-256 of a payload. MessageDigest.digest() already resets the
    * instance, and the table walk avoids a Formatter allocation per byte
    * in these per-row paths.
    */
  private def shaHex(digest: java.security.MessageDigest,
      bytes: Array[Byte]): String = {
    val hex = "0123456789abcdef"
    val d = digest.digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The fixture corpus as binary media records (text bytes as payload). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRecord]
  }

  /** STUBBED DECODE — deterministic fake dimensions from byte length (a real
    * deployment swaps this body for an image/audio codec call; signature and
    * batch shape stay identical).
    */
  private def fakeDecode(byteLen: Long): (Long, Long, Long) =
    (64L + byteLen % 512L, 64L + (byteLen * 7L) % 512L, 1L + byteLen % 16L)

  /** Typed per-partition decode: `Dataset[MediaRecord] → Dataset[MediaMeta]`
    * via `mapPartitions` — the partition-batched UDF shape. The ScalaTest
    * suite asserts this path emits exactly the same rows as the SQL path
    * ([[mediaMeta]]), pinning the plumbing.
    */
  def decodeMeta(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = fakeDecode(r.payload.length.toLong)
        val sha = shaHex(digest, r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, f, sha)
      }
    }
  }

  /** STUBBED RESIZE — 1→1 per-partition transform. The fake "codec"
    * truncates/cycles the payload to exactly w·h bytes (a real deployment
    * swaps the body for an image resampler; signature, batch shape and the
    * payload-in/payload-out contract stay identical). Deterministic.
    */
  def resize(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    requireDims(w, h)
    records.mapPartitions(_.map(stubResizeRecord(_, w, h)))
  }

  private def requireDims(w: Int, h: Int): Unit =
    require(w > 0 && h > 0 && w.toLong * h * 3 + 32 <= Int.MaxValue,
      s"invalid target dims ${w}x$h")

  /** The one stub-resize contract (cycle the payload to w·h bytes) —
    * shared by [[resize]] and [[resizePpm]]'s non-PPM fallback so the two
    * cannot diverge.
    */
  private def stubResizeRecord(r: MediaRecord, w: Int, h: Int): MediaRecord = {
    val out = Array.tabulate(w * h)(i =>
      if (r.payload.isEmpty) 0.toByte else r.payload(i % r.payload.length))
    MediaRecord(r.doc_id, out, r.mime)
  }

  /** STUBBED FRAME SAMPLING — the 1→N flatMap shape of video frame
    * extraction: emit every `everyN`-th of the payload's `n_frames` (from
    * the stub decode), each frame a deterministic slice of the payload.
    * At scale this is the row-count-multiplying step, so it runs map-side
    * with nothing shuffled until the downstream per-frame operator asks.
    */
  def sampleFrames(records: Dataset[MediaRecord], everyN: Int = 2): Dataset[FrameRecord] = {
    import records.sparkSession.implicits._
    require(everyN > 0, s"invalid stride $everyN")
    records.flatMap { r =>
      val (_, _, nFrames) = fakeDecode(r.payload.length.toLong)
      (0L until nFrames by everyN.toLong).map { idx =>
        val chunk = math.max(1, r.payload.length / math.max(1L, nFrames).toInt)
        val start = (idx.toInt * chunk) % math.max(1, r.payload.length)
        FrameRecord(r.doc_id, idx,
          r.payload.slice(start, math.min(start + chunk, r.payload.length)))
      }
    }
  }

  /** STUBBED FEATURE EXTRACTION — payload → fixed-dim float vector by byte
    * bucketing (a real deployment swaps the body for a vision/audio model
    * forward pass batched per partition). Output plugs straight into the
    * vector operators ([[KnnOps]]) — the media-embedding bridge.
    */
  def featureExtract(records: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeature] = {
    import records.sparkSession.implicits._
    require(dim > 0, s"invalid feature dim $dim")
    records.mapPartitions { it =>
      it.map { r =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          acc(i % dim) += (r.payload(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaFeature(r.doc_id, acc)
      }
    }
  }

  /** REAL PPM (P6) header parse — the one raster format a JVM can decode
    * with no codec library, so this path is NOT a stub: magic, then
    * width/height/maxval as ASCII tokens (whitespace-separated, `#`
    * comments skipped), one whitespace, then the raw RGB plane. Returns
    * (width, height, maxval, pixelOffset); None for anything that is not
    * a well-formed 8-bit P6 payload.
    */
  private[graft] def parsePpm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b.length < 3 || b(0) != 'P'.toByte || b(1) != '6'.toByte) return None
    // the spec requires whitespace (or a comment) after the magic; without
    // this check a payload starting "P6123..." would misparse the glued
    // digits as the width and walk arbitrary bytes as a pixel plane
    if (!b(2).toChar.isWhitespace && b(2) != '#'.toByte) return None
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      var skipping = true
      while (skipping && i < b.length) {
        if (b(i) == '#'.toByte) { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (b(i).toChar.isWhitespace) i += 1
        else skipping = false
      }
      if (i >= b.length || !b(i).toChar.isDigit) return None
      var x = 0L // Long + cap: an Int accumulator would wrap a long digit
      while (i < b.length && b(i).toChar.isDigit) {
        x = x * 10 + (b(i) - '0'.toByte)
        if (x > Int.MaxValue) return None
        i += 1
      }
      vals(v) = x.toInt; v += 1
    }
    if (i >= b.length || !b(i).toChar.isWhitespace) return None
    i += 1 // exactly one whitespace separates maxval from the pixel plane
    val (w, h, maxv) = (vals(0), vals(1), vals(2))
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (b.length - i < w.toLong * h * 3) return None
    Some((w, h, maxv, i))
  }

  /** REAL decode via the JDK's OWN raster codecs — `javax.imageio.ImageIO`
    * (PNG, JPEG, BMP, GIF, WBMP readers ship with every JRE; zero new
    * dependencies). Reader dispatch is by content magic, not mime, so a
    * mislabeled column still decodes; None for payloads no registered
    * reader claims (text, audio, truncated images).
    */
  private[graft] def decodeImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Typed decode with a REAL codec chain: P6 payloads parse via
    * [[parsePpm]] (ImageIO has no PPM reader), every ImageIO-supported
    * format (PNG/JPEG/BMP/GIF/WBMP) gets its true dimensions from the
    * JDK decoder, and only payloads no codec claims fall back to the
    * labeled stub ([[fakeDecode]]) so mixed-format corpora still flow.
    * Same partition-batched shape as [[decodeMeta]].
    */
  def decodeMetaPpm(records: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = parsePpm(r.payload) match {
          case Some((pw, ph, _, _)) => (pw.toLong, ph.toLong, 1L)
          case None => decodeImage(r.payload) match {
            case Some(img) => (img.getWidth.toLong, img.getHeight.toLong, 1L)
            case None => fakeDecode(r.payload.length.toLong)
          }
        }
        val sha = shaHex(digest, r.payload)
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h, f, sha)
      }
    }
  }

  /** REAL feature extraction: per-channel mean intensity normalized to
    * [0,1] — an actual image statistic, not a byte hash — over P6 payloads
    * (raw plane walk) or any ImageIO-decodable format (pixel walk over the
    * decoded raster). Payloads no codec claims are dropped (route them to
    * the stub extractor if needed).
    */
  def meanRgb(records: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        parsePpm(r.payload).map { case (w, h, maxv, off) =>
          val sums = new Array[Double](3)
          val n = w * h
          var p = 0
          while (p < n) {
            var c = 0
            while (c < 3) { sums(c) += (r.payload(off + p * 3 + c) & 0xFF); c += 1 }
            p += 1
          }
          MediaFeature(r.doc_id,
            Array.tabulate(3)(c => (sums(c) / n / maxv).toFloat))
        }.orElse(decodeImage(r.payload).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Double](3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sums(0) += (rgb >> 16) & 0xFF
              sums(1) += (rgb >> 8) & 0xFF
              sums(2) += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          MediaFeature(r.doc_id,
            Array.tabulate(3)(c => (sums(c) / n / 255.0).toFloat))
        })
      }
    }
  }

  /** REAL resize: nearest-neighbor resampling (deterministic — no AWT
    * interpolation hints whose kernels could vary) for P6 payloads (raw
    * plane, emitted as well-formed P6 so the output round-trips through
    * [[parsePpm]]) and for any ImageIO-decodable format (decoded raster,
    * re-encoded as PNG — the JDK's lossless writer). Only payloads no
    * codec claims pass through the labeled stub [[resize]] — same
    * mixed-corpus contract as [[decodeMetaPpm]].
    */
  def resizePpm(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    requireDims(w, h)
    records.mapPartitions { it =>
      it.map { r =>
        parsePpm(r.payload) match {
          case Some((sw, sh, maxv, off)) =>
            val header = s"P6\n$w $h\n$maxv\n".getBytes("US-ASCII")
            val out = new Array[Byte](header.length + w * h * 3)
            System.arraycopy(header, 0, out, 0, header.length)
            var y = 0
            while (y < h) {
              // Long index math: y*sh (and x*sw) overflows Int for legal
              // tall/wide source×target combinations, turning sy negative
              val sy = (y.toLong * sh / h).toInt
              var x = 0
              while (x < w) {
                val sx = (x.toLong * sw / w).toInt
                val src = off + (sy.toLong * sw + sx).toInt * 3
                val dst = header.length + (y * w + x) * 3
                out(dst) = r.payload(src)
                out(dst + 1) = r.payload(src + 1)
                out(dst + 2) = r.payload(src + 2)
                x += 1
              }
              y += 1
            }
            MediaRecord(r.doc_id, out, r.mime)
          case None => decodeImage(r.payload) match {
            case Some(img) =>
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val (sw, sh) = (img.getWidth, img.getHeight)
              var y = 0
              while (y < h) {
                val sy = (y.toLong * sh / h).toInt // Long: see the PPM branch
                var x = 0
                while (x < w) {
                  dst.setRGB(x, y, img.getRGB((x.toLong * sw / w).toInt, sy))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              MediaRecord(r.doc_id, bos.toByteArray, "image/png")
            case None => stubResizeRecord(r, w, h)
          }
        }
      }
    }
  }

  /** Grayscale pixel access over whatever codec claims the payload — P6
    * via [[parsePpm]] (raw plane walk) or any ImageIO format (decoded
    * raster). Integer Rec.601 luma (299/587/114 over 1000): no float
    * rounding, no AWT colorspace conversion — the same payload hashes
    * identically on every JVM. Returns (width, height, sample(x, y));
    * None when no codec claims the payload.
    */
  private def graySampler(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] = {
    def luma(r: Int, g: Int, bl: Int): Int = (r * 299 + g * 587 + bl * 114) / 1000
    parsePpm(b).map { case (sw, sh, _, off) =>
      (sw, sh, (sx: Int, sy: Int) => {
        val p = off + (sy.toLong * sw + sx).toInt * 3
        luma(b(p) & 0xFF, b(p + 1) & 0xFF, b(p + 2) & 0xFF)
      })
    }.orElse(decodeImage(b).map { img =>
      (img.getWidth, img.getHeight, (sx: Int, sy: Int) => {
        val rgb = img.getRGB(sx, sy)
        luma((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
      })
    })
  }

  /** Nearest-neighbor gw×gh downsample grid (same index math as
    * [[resizePpm]], Long-safe): cell (x, y) samples the source pixel at
    * (⌊x·sw/gw⌋, ⌊y·sh/gh⌋).
    */
  private def grayGrid(sw: Int, sh: Int, sample: (Int, Int) => Int,
      gw: Int, gh: Int): Array[Int] =
    Array.tabulate(gw * gh) { i =>
      val x = i % gw; val y = i / gw
      sample((x.toLong * sw / gw).toInt, (y.toLong * sh / gh).toInt)
    }

  /** Perceptual image hashes — the image-modality fingerprint that makes
    * re-encoded/resized copies of one picture land a few bits apart
    * (where any byte hash sees unrelated payloads):
    *
    *  - dHash (difference hash): 9×8 grayscale grid, bit y·8+x set when
    *    grid(x,y) < grid(x+1,y) — gradient signs survive resampling and
    *    lossy re-encodes.
    *  - aHash (average hash): 8×8 grid, bit set when the cell exceeds the
    *    (integer) grid mean.
    *
    * One decode per payload feeds both grids; unclaimed payloads are
    * dropped (the [[meanRgb]] mixed-corpus contract). Map-side
    * `mapPartitions`, zero shuffle; the near-dup JOIN over these hashes is
    * [[DedupOps.imageNearDupOn]] — the same pigeonhole-blocked hamming
    * plan as the text simhash, no cross join.
    */
  def perceptualHash(records: Dataset[MediaRecord]): Dataset[MediaPHash] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap(r => perceptualHashOne(r.payload)
        .map { case (dh, ah) => MediaPHash(r.doc_id, dh, ah) })
    }
  }

  /** (dHash, aHash) of one payload — the per-row core of
    * [[perceptualHash]], also called driver-side by the single-image
    * serving probe ([[DedupOps.probeImage]]: one query image does not
    * need a Spark job to hash). None when no codec claims the payload.
    */
  private[graft] def perceptualHashOne(payload: Array[Byte]): Option[(Long, Long)] =
    graySampler(payload).map { case (sw, sh, sample) =>
      val dg = grayGrid(sw, sh, sample, 9, 8)
      var dh = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (dg(y * 9 + x) < dg(y * 9 + x + 1)) dh |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      val ag = grayGrid(sw, sh, sample, 8, 8)
      val avg = ag.sum / 64
      var ah = 0L
      var i = 0
      while (i < 64) { if (ag(i) > avg) ah |= 1L << i; i += 1 }
      (dh, ah)
    }

  /** Deterministic P6 render of arbitrary bytes as a `blocks`×`blocks`
    * color mosaic (block k takes payload bytes 3k..3k+2 as RGB, cycled),
    * `blockPx` pixels per block side. Turns any corpus into a DECODABLE
    * image corpus — the fixtures ship no rasters, so the image-dedup
    * contract query renders its own; block structure (not per-pixel
    * noise) is what perceptual hashing assumes of real photographs, and
    * it makes the mosaic's dHash invariant under nearest-neighbor
    * resampling at block granularity.
    */
  def renderPpm(payload: Array[Byte], blocks: Int = 8, blockPx: Int = 4): Array[Byte] = {
    require(blocks > 0 && blockPx > 0 && blocks.toLong * blockPx <= 4096,
      s"invalid mosaic dims $blocks×$blockPx")
    val wh = blocks * blockPx
    val header = s"P6\n$wh $wh\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + wh * wh * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < wh) {
      var x = 0
      while (x < wh) {
        val block = (y / blockPx) * blocks + (x / blockPx)
        val base = header.length + (y * wh + x) * 3
        var c = 0
        while (c < 3) {
          out(base + c) =
            if (payload.isEmpty) 0 else payload((block * 3 + c) % payload.length)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fingerprint framing constants — shared by [[audioFingerprint]] and
    * [[renderWav]] so synthesized tones land on band centers: frames of
    * [[FpFrame]] mono samples, [[FpBands]]+1 analysis bins at
    * `bin(b) = 12·(b+1)` of the frame DFT.
    */
  private[graft] val FpFrame = 512
  private[graft] val FpBands = 16 // bits per frame = FpBands (17 bins)
  private[graft] def fpBin(b: Int): Int = 12 * (b + 1)

  /** Deterministic WAV synthesis from arbitrary document bytes — the
    * audio analog of [[renderPpm]]: a 16-bit PCM mix with a tone in
    * EVERY analysis band, whose per-band per-quarter amplitude ORDERING
    * comes from the payload hash. Energy in every band keeps each
    * adjacent-band comparison signal-vs-signal (the robustness premise
    * of the Philips hash — a band with only quantization noise would
    * hand its bit to noise), while the hash-driven ordering gives
    * different documents different spectral AND temporal structure —
    * exactly the two axes the fingerprint reads.
    */
  /** One FpFrame-period sine per analysis bin, shared by every synth
    * call: `toneTable(b)(i) = sin(2π·fpBin(b)·i/FpFrame)` — the exact
    * expression [[renderWav]]'s tone loop evaluated per clip, hoisted to
    * a per-JVM constant (the bins and the frame length are fixed).
    */
  private lazy val toneTable: Array[Array[Double]] =
    Array.tabulate(FpBands + 1) { b =>
      val k = fpBin(b)
      Array.tabulate(FpFrame)(i => math.sin(2 * math.Pi * k * i / FpFrame))
    }

  def renderWav(payload: Array[Byte], sampleRate: Float = 8000f,
      seconds: Double = 0.5, gain: Double = 1.0): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val h = java.util.Arrays.hashCode(payload)
    val nBins = FpBands + 1
    // amplitude level per (band, quarter) via a full avalanche mix
    // (splitmix64 finalizer) — an affine map mod m would give every doc
    // the same monotone-run band ordering up to wrap position, collapsing
    // fingerprint entropy (measured: 2.6k spurious near-pairs at sf0.01)
    def amp(b: Int, q: Int): Double = {
      var x = h.toLong + b * 0x9E3779B97F4A7C15L + q * 0xBF58476D1CE4E5B9L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x ^= x >>> 33
      0.1 + 0.8 * math.floorMod(x, 997L) / 996.0
    }
    val frames = (sampleRate * seconds).toInt
    val bytes = new Array[Byte](frames * 2)
    // every tone sits on an analysis bin = integer cycles per FpFrame
    // samples, so each quarter's mix is EXACTLY periodic with period
    // FpFrame — synthesize one 512-sample waveform per quarter and tile
    // (17 tones × 4·512 sins per clip instead of 17 × every sample;
    // measured 28 s → ~4 s for the sf0.1 contract entry). The sins
    // themselves depend only on (bin, phase) — [[toneTable]] holds them,
    // computed once per JVM, so the per-clip synth is pure FMA
    // (r19 optimization round: 35k math.sin calls/clip → table reads;
    // bit-identical by construction — the table entry is the SAME double
    // expression this loop used to evaluate inline)
    val wave = Array.ofDim[Double](4, FpFrame)
    var q = 0
    while (q < 4) {
      var b = 0
      while (b < nBins) {
        val a = amp(b, q)
        val tone = toneTable(b)
        var i = 0
        while (i < FpFrame) {
          wave(q)(i) += a * tone(i)
          i += 1
        }
        b += 1
      }
      q += 1
    }
    var i = 0
    while (i < frames) {
      val quarter = math.min(3, i * 4 / frames)
      val s = math.max(-1.0,
        math.min(1.0, gain * wave(quarter)(i % FpFrame) / nBins))
      val qv = math.round(s * 32767.0).toInt
      bytes(2 * i) = (qv & 0xFF).toByte
      bytes(2 * i + 1) = ((qv >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, 1, 2, sampleRate, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Volume-changed re-encode: decode, scale samples (clipped), rewrite
    * as WAV — the canonical audio near-dup pathology (same recording,
    * different loudness/container).
    */
  def scaleWav(b: Array[Byte], gainFactor: Double): Option[Array[Byte]] =
    readPcm(b).map { case (channels, samples) =>
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val rate = decodeAudio(b).map(_._1.getSampleRate).getOrElse(8000f)
      val out = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = math.max(-1.0, math.min(1.0, samples(i) * gainFactor))
        val q = math.round(s * 32767.0).toInt
        out(2 * i) = (q & 0xFF).toByte
        out(2 * i + 1) = ((q >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate,
        16, channels, channels * 2, rate, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(out),
        fmt, (samples.length / channels).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** Spectral audio fingerprint — the Haitsma–Kalker (Philips robust
    * hash) family, simplified to its amplitude-invariant core: per
    * [[FpFrame]]-sample mono frame, [[FpBands]]+1 band energies (Goertzel
    * at the fixed [[fpBin]] bins — O(bands·frame) per frame, no FFT
    * dependency), one sign bit per adjacent-band energy difference
    * (`E(b) > E(b+1)` — UNIFORM GAIN CANCELS, the invariance the volume
    * pathology needs), majority-voted within each time quarter →
    * 4 × 16 = 64 bits. Map-side like every decode here; the fingerprint
    * column plugs straight into the pigeonhole-blocked hamming join
    * ([[graft.operators.DedupOps]]). Payloads no reader claims, or
    * shorter than 4 frames, are dropped (the mixed-corpus contract).
    */
  def audioFingerprint(records: Dataset[MediaRecord]): Dataset[AudioFp] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r => audioFingerprintOne(r.payload).map(AudioFp(r.doc_id, _)) }
    }
  }

  private[graft] def audioFingerprintOne(payload: Array[Byte]): Option[Long] =
    readPcm(payload).flatMap { case (channels, samples) =>
      val n = samples.length / math.max(1, channels)
      val mono = new Array[Double](n)
      var i = 0
      while (i < n * channels) { mono(i / channels) += samples(i) / channels; i += 1 }
      val nFrames = n / FpFrame
      if (nFrames < 4) None
      else {
        val nBins = FpBands + 1
        // per-quarter majority counters for each of the 16 bits
        val votes = Array.ofDim[Int](4, FpBands)
        val frameCount = new Array[Int](4)
        val energy = new Array[Double](nBins)
        val coeffs = Array.tabulate(nBins)(b =>
          2.0 * math.cos(2.0 * math.Pi * fpBin(b) / FpFrame))
        var f = 0
        while (f < nFrames) {
          var b = 0
          while (b < nBins) {
            // Goertzel power at bin fpBin(b) over frame f
            val coeff = coeffs(b)
            var s1 = 0.0; var s2 = 0.0
            var j = 0
            while (j < FpFrame) {
              val s0 = mono(f * FpFrame + j) + coeff * s1 - s2
              s2 = s1; s1 = s0
              j += 1
            }
            energy(b) = s1 * s1 + s2 * s2 - coeff * s1 * s2
            b += 1
          }
          val quarter = math.min(3, f * 4 / nFrames)
          frameCount(quarter) += 1
          var m = 0
          while (m < FpBands) {
            if (energy(m) > energy(m + 1)) votes(quarter)(m) += 1
            m += 1
          }
          f += 1
        }
        var fp = 0L
        var q = 0
        while (q < 4) {
          var m = 0
          while (m < FpBands) {
            if (2 * votes(q)(m) > frameCount(q))
              fp |= 1L << (q * FpBands + m)
            m += 1
          }
          q += 1
        }
        Some(fp)
      }
    }

  /** REAL audio container probe via the JDK's OWN sampled-audio stack —
    * `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU readers ship with
    * every JRE; zero new dependencies, the audio twin of [[decodeImage]]).
    * Returns the true format and frame count; None for payloads no
    * registered reader claims (text, images, truncated containers).
    */
  private[graft] def decodeAudio(b: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try Some((in.getFormat, in.getFrameLength)) finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a payload to normalized interleaved PCM samples in [-1, 1]:
    * the JDK conversion chain re-encodes whatever the container holds
    * (8/16-bit, signed/unsigned, big/little-endian, µ-law/a-law) as
    * 16-bit signed little-endian, so the sample walk below has ONE case.
    * Returns (channels, samples); None when no reader claims the payload.
    */
  private[graft] def readPcm(b: Array[Byte]): Option[(Int, Array[Double])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(b))
      try {
        val f = src.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, src)
        try {
          val bytes = pcm.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            out(i) = (((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF))
              / 32768.0)
            i += 1
          }
          Some((f.getChannels, out))
        } finally pcm.close()
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Typed audio-decode: true sample rate, channel count, bit depth, frame
    * count and duration from the container header — the audio analog of
    * [[decodeMetaPpm]], same partition-batched map-side shape (zero
    * shuffle). Payloads no audio reader claims are dropped (route them to
    * the image or stub decoders — the mixed-corpus contract).
    */
  def audioMeta(records: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        // a reader may claim the payload yet report NOT_SPECIFIED (-1) for
        // frame length or rate (legal e.g. for AU's unknown-data-size
        // header) — without real numbers the row would carry n_samples=-1
        // and a zero/negative duration as if they were measurements, so it
        // routes to the drop contract like any unclaimed payload
        decodeAudio(r.payload).filter { case (fmt, frames) =>
          frames >= 0 && fmt.getFrameRate > 0 && fmt.getSampleRate > 0
        }.map { case (fmt, frames) =>
          val sha = shaHex(digest, r.payload)
          AudioMeta(r.doc_id,
            math.round(fmt.getSampleRate.toDouble),
            fmt.getChannels.toLong,
            fmt.getSampleSizeInBits.toLong,
            frames,
            math.round(frames * 1000.0 / fmt.getFrameRate), sha)
        }
      }
    }
  }

  /** REAL audio feature extraction: per-channel RMS level and DC mean over
    * the decoded PCM samples — actual signal statistics (a 440 Hz sine at
    * amplitude A has RMS A/√2 and mean ≈ 0; both are test-pinned on
    * generated WAV payloads). Map-side like every decode here; output
    * plugs into the vector operators as a (short) feature vector.
    */
  def audioFeatures(records: Dataset[MediaRecord]): Dataset[AudioFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        readPcm(r.payload).flatMap { case (channels, samples) =>
          val n = samples.length / math.max(1, channels)
          if (n == 0) None
          else {
            val mean = new Array[Double](channels)
            val sq = new Array[Double](channels)
            var i = 0
            while (i < n * channels) {
              val c = i % channels
              mean(c) += samples(i); sq(c) += samples(i) * samples(i)
              i += 1
            }
            Some(AudioFeature(r.doc_id,
              Array.tabulate(channels)(c => math.sqrt(sq(c) / n).toFloat),
              Array.tabulate(channels)(c => (mean(c) / n).toFloat)))
          }
        }
      }
    }
  }

  /** REAL MP4/ISO-BMFF container-metadata parse — pure JVM box walk, the
    * video twin of [[parsePpm]] (ISO/IEC 14496-12 box layout: 32-bit size
    * + fourcc, size 1 → 64-bit largesize, size 0 → to-end-of-enclosing).
    * Requires a leading `ftyp` (the MP4/MOV magic), then reads `moov/mvhd`
    * for timescale+duration (both version 0 and 1 layouts) and every
    * `moov/trak/tkhd` for the 16.16 fixed-point presentation dimensions
    * (the largest-dimensioned track wins — audio tracks carry 0×0) plus
    * that track's REAL frame count from its sample-size table
    * (`mdia/minf/stbl/stsz` sample_count). Returns
    * (duration_ms, width, height, n_frames, n_tracks); None for payloads
    * that are not well-formed ISO-BMFF. Frame DECODE stays out of scope
    * (no video codec ships with the JDK) — this is the honest boundary:
    * real container truth, stubbed pixels.
    */
  private[graft] def parseMp4(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    def u32(i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def typ(i: Int): String = new String(b, i + 4, 4, "US-ASCII")
    if (b.length < 12 || typ(0) != "ftyp") return None
    var durationMs = -1L
    var w = 0L; var h = 0L; var frames = 0L; var tracks = 0L
    // per-trak accumulation: tkhd dims + stsz sample count; the
    // largest-dimensioned trak (the video track) wins the globals
    var trakW = 0L; var trakH = 0L; var trakSamples = 0L
    // Real ISO-BMFF nests ~6 deep (moov/trak/mdia/minf/stbl); a crafted
    // payload of recursively nested container headers must be rejected,
    // not allowed to overflow the stack inside a mapPartitions task.
    val MaxDepth = 16
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      if (depth > MaxDepth) return false
      var i = from
      while (i + 8 <= to) {
        var size = u32(i)
        var hdr = 8
        if (size == 1L) {
          if (i + 16 > to) return false
          size = u64(i + 8); hdr = 16
        } else if (size == 0L) size = (to - i).toLong
        if (size < hdr || size > (to - i).toLong) return false
        // leaf fields are bounds-checked against the box's OWN end — a
        // truncated box must reject, never read sibling bytes as metadata
        val end = i + size.toInt
        typ(i) match {
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (!walk(i + hdr, end, depth + 1)) return false
          case "trak" =>
            tracks += 1
            trakW = 0L; trakH = 0L; trakSamples = 0L
            if (!walk(i + hdr, end, depth + 1)) return false
            if (trakW > 0 && trakH > 0 && trakW * trakH > w * h) {
              w = trakW; h = trakH; frames = trakSamples
            }
          case "stsz" =>
            // version/flags(4) + sample_size(4) + sample_count(4)
            val p = i + hdr
            if (p + 12 > end) return false
            trakSamples = u32(p + 8)
          case "mvhd" =>
            val p = i + hdr
            if (p + 4 > end) return false
            val ver = b(p) & 0xFF
            if (ver == 1) {
              if (p + 32 > end) return false
              val timescale = u32(p + 20); val dur = u64(p + 24)
              if (timescale > 0) durationMs = math.round(dur * 1000.0 / timescale)
            } else {
              if (p + 20 > end) return false
              val timescale = u32(p + 12); val dur = u32(p + 16)
              if (timescale > 0) durationMs = math.round(dur * 1000.0 / timescale)
            }
          case "tkhd" =>
            val p = i + hdr
            if (p + 4 > end) return false
            val ver = b(p) & 0xFF
            // version/flags + creation/modification + track_id + reserved
            // + duration, then reserved(8) layer(2) alternate(2) volume(2)
            // reserved(2) matrix(36) → width/height as 16.16 fixed point
            val base = if (ver == 1) p + 4 + 8 + 8 + 4 + 4 + 8
                       else p + 4 + 4 + 4 + 4 + 4 + 4
            val wOff = base + 8 + 2 + 2 + 2 + 2 + 36
            if (wOff + 8 > end) return false
            val tw = u32(wOff) >> 16; val th = u32(wOff + 4) >> 16
            if (tw > 0 && th > 0) { trakW = tw; trakH = th }
          case _ => ()
        }
        i += size.toInt
      }
      i == to // trailing garbage = not a well-formed container
    }
    if (!walk(0, b.length, 0) || durationMs < 0) None
    else Some((durationMs, w, h, frames, tracks))
  }

  /** Typed video-container probe: true duration, presentation dimensions
    * and track count from the ISO-BMFF header — the video analog of
    * [[audioMeta]], same partition-batched map-side shape (zero shuffle).
    * Payloads that are not MP4/MOV containers are dropped (route them to
    * the image/audio decoders — the mixed-corpus contract).
    */
  def videoMeta(records: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { r =>
        parseMp4(r.payload).map { case (durMs, w, h, frames, tracks) =>
          val sha = shaHex(digest, r.payload)
          VideoMeta(r.doc_id, r.payload.length.toLong, durMs, w, h, frames,
            tracks, sha)
        }
      }
    }
  }

  /** Pure-SQL metadata extraction over the binary column — oracle-checkable
    * (octet_length / sha256 / modular fake dims compute identically in
    * DuckDB). `q_multimodal_meta`.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("content_sha"),
        substring(hex(col("payload")), 1, 32).as("head_hex"))
      .withColumn("width", lit(64L) + col("byte_len") % 512L)
      .withColumn("height", lit(64L) + (col("byte_len") * 7L) % 512L)
      .withColumn("n_frames", lit(1L) + col("byte_len") % 16L)
      .orderBy(col("doc_id").asc)
}

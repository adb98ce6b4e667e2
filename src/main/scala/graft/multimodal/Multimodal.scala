package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int)
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    dom_bin: Int, nonzero_bins: Int)

/** Multimodal column pipeline (SURVEY.md §2.6): media as opaque binary
  * columns + typed metadata, feature extraction as a partition-wise
  * batch pass. `realDecode` runs a genuine codec (the JRE's own
  * javax.imageio readers — PNG/JPEG/GIF/BMP, no external libraries);
  * `decodeStub` is the deterministic stand-in for payloads that are not
  * encoded images (the synthetic driver tables carry UTF-8 text blobs),
  * and `decode` dispatches between them by magic number. Both emit the
  * same fixed-length feature contract, so the Spark-side plumbing
  * (schema, encoders, partition batching) is identical whichever ran.
  */
object Multimodal {

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic opaque blob), kind round-robins image/audio/
    * video, metadata columns are typed.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height"))

  /** Real codec decode via the JDK's own image readers (javax.imageio
    * ships PNG/JPEG/GIF/BMP readers in every JRE — no external
    * libraries). Emits the same fixed-length contract as [[decodeStub]]:
    * a 16-bin normalized luminance histogram, with integer BT.601 luma
    * weights ((77R + 150G + 29B) >> 8) so the binning is deterministic
    * across JVMs. Throws IllegalArgumentException when no JRE reader
    * recognizes the bytes — callers mixing encoded and synthetic
    * payloads go through [[decode]].
    */
  def realDecode(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException(
        s"no JRE image reader recognizes this ${payload.length}-byte payload")
    val hist = new Array[Int](16)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) +
          29 * (rgb & 0xFF)) >> 8
        hist(luma >> 4) += 1
        x += 1
      }
      y += 1
    }
    val n = math.max(w * h, 1).toFloat
    hist.map(_ / n)
  }

  /** True iff the payload starts with a magic number one of the JRE's
    * image readers handles (PNG / JPEG / GIF / BMP).
    */
  def looksEncodedImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** Decode dispatch: the real codec when the payload carries an image
    * magic number, the histogram stand-in otherwise. A magic-number hit
    * is only a hint — a UTF-8 blob can legitimately start with "BM" or
    * "GIF" (e.g. text beginning "BMW…") — so a payload ImageIO refuses
    * falls back to the stub instead of crashing the partition. The
    * driver-gated mm_extract query pins [[decodeStub]] directly (its
    * payloads are UTF-8 text by construction and the oracle replays the
    * stub's exact arithmetic); pipelines over genuine image corpora use
    * this.
    */
  def decode(payload: Array[Byte]): Array[Float] =
    if (looksEncodedImage(payload)) {
      // NonFatal, not just IllegalArgumentException: a reader that
      // accepts the magic can still fail parsing the rest (the JRE BMP
      // reader throws EOFException on "BMW..." — it reads the magic,
      // then hits end-of-stream mid-header)
      try realDecode(payload)
      catch { case scala.util.control.NonFatal(_) => decodeStub(payload) }
    } else decodeStub(payload)

  /** Deterministic stand-in: 16-bin byte histogram, normalized. Keeps
    * the dataflow (binary -> fixed-length feature vector) identical to a
    * real embedding/decode step.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Int](16)
    payload.foreach(b => hist((b & 0xFF) >> 4) += 1)
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Partition-wise feature extraction: one pass per partition, no
    * per-row task overhead — the shape a GPU/codec batch call needs.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.selectExpr("media_id", "kind", "payload",
        "cast(width as int) width", "cast(height as int) height")
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val feat = decodeStub(m.payload)
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            feat.indexOf(feat.max), feat.count(_ > 0))
        }
      }
  }

  case class MediaHistogram(media_id: Long, n_bytes: Long, features: Array[Float])

  case class MediaEmbedding(media_id: Long, kind: String,
      embedding: Array[Float])

  /** Partition-wise embedding stub: a 16-dim high-nibble byte histogram
    * per payload, RAW INTEGER counts as float32 (no normalization —
    * cosine normalizes downstream, and integer counts < 2^24 are exact
    * in float, so a SQL oracle replays the vector value-for-value where
    * a float division would not be engine-portable). The batch shape a
    * real encoder swap-in keeps: blobs in, fixed-length vectors out,
    * one pass per partition.
    */
  def embedStub(media: DataFrame): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.selectExpr("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val hist = new Array[Float](16)
          payload.foreach(b => hist((b & 0xFF) >> 4) += 1f)
          MediaEmbedding(id, kind, hist)
        }
      }
  }

  /** Partition-wise decode through the [[decode]] dispatch (real codec
    * for encoded images, stub for everything else): the batch kernel a
    * genuine multimodal ingest uses — binaryFile source rows in, one
    * fixed-length feature vector per blob out. Same one-pass-per-
    * partition shape as [[extractFeatures]], so swapping the codec for
    * a GPU batch call changes nothing upstream or downstream.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaHistogram] = {
    import media.sparkSession.implicits._
    media.selectExpr("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          MediaHistogram(id, payload.length.toLong, decode(payload))
        }
      }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk — the partition/batch shape of real frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"transform(sequence(0, greatest(int(length(payload) / $frameBytes) - 1, 0), $stride), " +
          s"i -> substring(payload, i * $frameBytes + 1, $frameBytes))"))
          .as(Seq("frame_no", "frame")))

  case class AudioWindow(media_id: Long, window_no: Int, energy: Long)

  /** Overlapping fixed-size windows over audio payloads (window length
    * `winBytes`, hop `hopBytes` — the STFT/spectrogram framing shape)
    * with a per-window integer energy (sum of unsigned byte values; a
    * real pipeline would FFT here). Complete windows only:
    * (len - win) / hop + 1 per payload. Exact integer arithmetic so the
    * framing is oracle-replayable; partition-wise kernel like the other
    * media passes — swap the inner loop for a DSP call and nothing else
    * changes.
    */
  def audioWindows(media: DataFrame, winBytes: Int, hopBytes: Int): Dataset[AudioWindow] = {
    require(winBytes > 0 && hopBytes > 0)
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val n = if (p.length < winBytes) 0
            else (p.length - winBytes) / hopBytes + 1
          (0 until n).iterator.map { wi =>
            var s = 0L
            var i = wi * hopBytes
            val end = i + winBytes
            while (i < end) { s += (p(i) & 0xFF); i += 1 }
            AudioWindow(id, wi, s)
          }
        }
      }
  }

  case class ShotStats(media_id: Long, n_frames: Long, n_shots: Long,
      max_delta: Long)

  /** Shot-boundary detection over video payloads: frame the payload
    * into complete `frameBytes` chunks, compute each frame's integer
    * byte-sum energy, and cut where the absolute energy delta between
    * consecutive frames exceeds `threshold` (the classic
    * histogram/intensity-difference detector; a real pipeline would
    * compare color histograms per frame — the framing, the pairwise
    * scan and the integer-delta contract stay identical). n_shots =
    * boundaries + 1 for any non-empty framing, 0 for payloads shorter
    * than one frame. Exact integers end to end, so the oracle replays
    * every cut. Partition-wise kernel like [[audioWindows]].
    */
  def shotBoundaries(media: DataFrame, frameBytes: Int,
      threshold: Long): Dataset[ShotStats] = {
    require(frameBytes > 0)
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          val n = p.length / frameBytes
          val e = new Array[Long](n)
          var f = 0
          while (f < n) {
            var s = 0L
            var i = f * frameBytes
            val end = i + frameBytes
            while (i < end) { s += (p(i) & 0xFF); i += 1 }
            e(f) = s
            f += 1
          }
          var cuts = 0L
          var maxD = 0L
          var j = 1
          while (j < n) {
            val d = math.abs(e(j) - e(j - 1))
            if (d > threshold) cuts += 1
            if (d > maxD) maxD = d
            j += 1
          }
          ShotStats(id, n.toLong, if (n == 0) 0L else cuts + 1L, maxD)
        }
      }
  }

  case class PHash(media_id: Long, phash: String)

  /** Average-hash perceptual fingerprint for image payloads: downsample
    * the byte grid to 8×8 with the SAME clamped nearest-neighbor
    * addressing as [[resize]], then set bit (y,x) iff that cell's value
    * strictly exceeds the 64-cell mean — compared as an integer cross
    * product (p·64 > Σ), so no division ever happens. Emitted as a
    * 16-hex-char string (two digits per row byte, MSB = x 0) — string
    * keys dodge 64-bit sign traps and group/join cleanly. Identical
    * images (and near-identical ones after real decode) collide, which
    * makes exact-dedup-by-phash the cheap first pass of visual dedup.
    */
  def perceptualHash(media: DataFrame): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image")
      .selectExpr("media_id", "payload", "cast(width as int) width",
        "cast(height as int) height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, p, w, h) =>
          val len = p.length
          val px = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val y = i / 8; val x = i % 8
            val src = (y.toLong * h / 8) * w + (x.toLong * w / 8)
            val clamped = math.max(math.min(len - 1L, src), 0L).toInt
            px(i) = if (len == 0) 0 else p(clamped) & 0xFF
            i += 1
          }
          var s = 0
          i = 0
          while (i < 64) { s += px(i); i += 1 }
          val sb = new StringBuilder(16)
          var r = 0
          while (r < 8) {
            var b = 0
            var x = 0
            while (x < 8) {
              if (px(r * 8 + x) * 64 > s) b |= 1 << (7 - x)
              x += 1
            }
            sb.append(f"$b%02x")
            r += 1
          }
          PHash(id, sb.toString)
        }
      }
  }

  case class MediaResized(media_id: Long, kind: String,
      payload: Array[Byte], width: Int, height: Int)

  /** Nearest-neighbor "resize" of the opaque byte grid to (w2, h2).
    * Stub arithmetic (a real codec would interpolate pixels), but the
    * partition-wise dataflow, metadata rewrite, and clamped grid
    * addressing are exactly what a real resize kernel needs — swap the
    * inner loop for a codec call and nothing else changes.
    */
  def resize(media: DataFrame, w2: Int, h2: Int): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.selectExpr("media_id", "kind", "payload",
        "cast(width as int) width", "cast(height as int) height")
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { m =>
          val out = new Array[Byte](w2 * h2)
          val len = m.payload.length
          var y = 0
          while (y < h2) {
            val sy = y.toLong * m.height / h2
            var x = 0
            while (x < w2) {
              val sx = x.toLong * m.width / w2
              val src = math.min(len - 1, sy * m.width + sx).toInt
              out(y * w2 + x) = if (len == 0) 0 else m.payload(math.max(src, 0))
              x += 1
            }
            y += 1
          }
          MediaResized(m.media_id, m.kind, out, w2, h2)
        }
      }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.5 #42): images/audio/video as
  * opaque `binary` payloads with a typed metadata struct, processed in
  * partition-local batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB (the real codec
  * libraries are not in this environment); everything Spark-level — the
  * schema contract, batch shape, partition-local processing, feature
  * column layout — is real and tested, so swapping in a JNI/FFI decoder
  * changes one function.
  *
  * Scale notes: payloads never shuffle (all ops are map-side until the
  * final projection); batch processing amortizes per-record codec setup
  * exactly like an Arrow-batch UDF would.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte],
                      width: Int, height: Int, format: String)
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                           mean_byte: Double, byte_entropy: Double,
                           n_frames: Int)

  /** STUB decoder: a real implementation hands `payload` to an image/audio
    * codec and returns pixel/sample arrays. This deterministic fake
    * computes byte-level statistics so the full pipeline is testable
    * end-to-end with stable outputs. */
  private def decodeStub(payload: Array[Byte]): (Double, Double) = {
    if (payload.isEmpty) return (0.0, 0.0)
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xFF) += 1)
    val n = payload.length.toDouble
    val mean = payload.map(b => (b & 0xFF).toDouble).sum / n
    val entropy = -counts.filter(_ > 0)
      .map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
    (mean, entropy)
  }

  /** Build a media table from documents: payload = utf-8 bytes of the text
    * (deterministic fake "media bytes"), metadata derived per row. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format")).as("meta"))

  /** Batched feature extraction: partition-local iteration in fixed-size
    * batches (the Arrow-batch shape), stub-decoding each payload. Frame
    * sampling: one "frame" per 256 payload bytes. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("doc_id"), col("modality"), col("payload"),
        col("meta.width"), col("meta.height"), col("meta.format"))
      .as[MediaRow]
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would be invoked once per
        // batch (codec context reuse); the stub decodes per row.
        batch.iterator.map { r =>
          val (mean, entropy) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.modality, r.payload.length, mean, entropy,
            n_frames = math.max(1, r.payload.length / 256))
        }
      }
    }.toDF()
  }

  /** REAL-codec decode path (r10): the JDK's `javax.imageio` (PNG / JPEG /
    * BMP / GIF — public platform API, no external dependency) behind the
    * same map-side plumbing as the stub. The gated queries stay on the
    * deterministic stub — byte statistics are what the DuckDB oracle can
    * replay — while this proves the Spark-side shape (binary column in,
    * partition-local decode, fixed-dim feature vector out, payload never
    * in the output) runs a genuine codec, so swapping in ffmpeg/JNI for
    * video really is one function. */
  object ImageCodec {
    /** None for undecodable payloads (truncated/corrupt/not-an-image) —
      * curation pipelines must classify those rows, not die on them. */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Fixed-dim grayscale (BT.601 luma, [0,1]) thumbnail on an even
      * row-major pixel grid — the real-pixel analog of [[frameSample]]'s
      * byte-grid thumb, same output contract (thumbDim doubles). */
    def grayThumb(img: java.awt.image.BufferedImage, thumbDim: Int): Array[Double] = {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      Array.tabulate(thumbDim) { t =>
        val q = t * n / thumbDim
        val rgb = img.getRGB((q % w).toInt, (q / w).toInt)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
      }
    }
  }

  case class ImageFeatures(doc_id: Long, decoded: Boolean, width: Int,
                           height: Int, thumb: Array[Double])

  /** Map-side real-codec image features: decode each `image` payload with
    * [[ImageCodec]] and emit dimensions + a fixed-dim grayscale thumbnail
    * (undecodable rows flagged, not dropped — and never poisoning the
    * partition). Same scale shape as [[extractFeatures]]: payloads stay
    * where they were read, output rows carry thumbDim doubles. */
  def imageFeaturesReal(media: DataFrame, thumbDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          ImageCodec.decode(payload) match {
            case Some(img) => ImageFeatures(id, decoded = true,
              img.getWidth, img.getHeight, ImageCodec.grayThumb(img, thumbDim))
            case None => ImageFeatures(id, decoded = false, -1, -1,
              Array.empty[Double])
          }
        }
      }.toDF()
  }

  /** REAL-codec audio path (r10): `javax.sound.sampled` (WAV / AIFF /
    * AU — public JDK platform API, like [[ImageCodec]]'s imageio)
    * behind the same map-side contract: binary in, partition-local
    * decode, fixed-dim features out, payload never in the output,
    * undecodable rows flagged not fatal. Whatever the container's
    * encoding, samples are normalized through the JDK's converter to
    * 16-bit signed PCM and mixed to mono in [-1, 1], so the features are
    * codec-independent. */
  object AudioCodec {
    case class Pcm(sampleRate: Float, channels: Int, samples: Array[Double])

    /** None for undecodable payloads (truncated/corrupt/not-audio). */
    def decode(payload: Array[Byte]): Option[Pcm] =
      try {
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
          val ch = math.max(1, target.getChannels)
          val nFrames = bytes.length / (2 * ch)
          val mono = new Array[Double](nFrames)
          var i = 0
          while (i < nFrames) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              val off = (i * ch + c) * 2
              s += (((bytes(off + 1) << 8) | (bytes(off) & 0xFF)).toShort
                / 32768.0)
              c += 1
            }
            mono(i) = s / ch
            i += 1
          }
          Some(Pcm(target.getSampleRate, ch, mono))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Fixed-dim mean-|amplitude| envelope over even sample windows —
      * the audio analog of [[ImageCodec.grayThumb]]'s pixel grid. */
    def envelope(samples: Array[Double], dim: Int): Array[Double] = {
      if (samples.isEmpty) return new Array[Double](dim)
      Array.tabulate(dim) { t =>
        val lo = (t.toLong * samples.length / dim).toInt
        val hi = math.max(lo + 1, ((t + 1).toLong * samples.length / dim).toInt)
        var s = 0.0
        var i = lo
        while (i < hi) { s += math.abs(samples(i)); i += 1 }
        s / (hi - lo)
      }
    }
  }

  case class AudioFeatures(doc_id: Long, decoded: Boolean,
                           sample_rate: Double, channels: Int,
                           n_samples: Long, rms: Double, peak: Double,
                           envelope: Array[Double])

  /** Map-side real-codec audio features: decode each `audio` payload with
    * [[AudioCodec]] and emit rate/channels/length plus RMS, peak and a
    * fixed-dim amplitude envelope. Same scale shape as
    * [[imageFeaturesReal]]: payloads stay where they were read, output
    * rows carry envDim doubles. */
  def audioFeaturesReal(media: DataFrame, envDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          AudioCodec.decode(payload) match {
            case Some(pcm) =>
              val n = pcm.samples.length
              var sq = 0.0
              var peak = 0.0
              pcm.samples.foreach { s =>
                sq += s * s; val a = math.abs(s); if (a > peak) peak = a
              }
              AudioFeatures(id, decoded = true, pcm.sampleRate.toDouble,
                pcm.channels, n.toLong,
                if (n == 0) 0.0 else math.sqrt(sq / n), peak,
                AudioCodec.envelope(pcm.samples, envDim))
            case None =>
              AudioFeatures(id, decoded = false, -1.0, -1, -1L, 0.0, 0.0,
                Array.empty[Double])
          }
        }
      }.toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Int,
                   frame_hash: Long, thumb: Array[Double])

  /** Frame sampling + resize plumbing: every `stride` bytes of a video
    * payload is one "frame"; up to `maxFrames` evenly-spaced frames are
    * sampled per document, and each frame is "resized" to a fixed
    * `thumbDim`-element intensity vector by even-stride byte sampling —
    * the exact shape (explode per frame, fixed-size feature vector) a real
    * ffmpeg/PIL decoder plugs into. Map-side only; output rows carry
    * `thumbDim` doubles, never the payload. */
  def frameSample(media: DataFrame, stride: Int = 256, maxFrames: Int = 8,
                  thumbDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("modality"), col("payload"),
        col("meta.width"), col("meta.height"), col("meta.format"))
      .as[MediaRow]
      .flatMap { r =>
        val nFrames = math.max(1, r.payload.length / stride)
        val take = math.min(nFrames, maxFrames)
        (0 until take).iterator.map { i =>
          // evenly spaced frame selection covering BOTH endpoints — the
          // floor(i*n/take) grid can never reach the final frame, biasing
          // thumbnails away from the payload tail
          val idx = if (take == 1) 0
                    else (i.toLong * (nFrames - 1) / (take - 1)).toInt
          val off = idx * stride
          val end = math.min(off + stride, r.payload.length)
          val len = math.max(end - off, 1)
          var h = 1125899906842597L
          var p = off
          while (p < end) { h = h * 31 + (r.payload(p) & 0xFF); p += 1 }
          val thumb = Array.tabulate(thumbDim) { t =>
            val q = off + (t.toLong * len / thumbDim).toInt
            if (q < r.payload.length) (r.payload(q) & 0xFF) / 255.0 else 0.0
          }
          Frame(r.doc_id, i, off, h, thumb)
        }
      }.toDF()
  }

  /** SparkEntry glue. Float features rounded so the DuckDB oracle (which
    * re-derives the byte statistics from hex(encode(text))) hash-matches
    * despite engine-order float summation. */
  def mmBinaryFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(Tables.documents(spark, sfDir)))
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"),
        round(col("byte_entropy"), 6).as("byte_entropy"),
        col("n_frames"))

  /** DuckDB byte-list builder shared by the two multimodal oracles: the
    * payload is the UTF-8 encoding of `text`, recovered byte-by-byte via
    * hex(encode(text)). */
  private val SqlBytes =
    "list_transform(range(octet_length(encode(text))), i -> ('0x' || substr(hex(encode(text)), 2*i + 1, 2))::INT)"

  /** Oracle for the stubbed batch feature extraction: identical byte
    * statistics computed relationally (mean via list_avg over the same
    * byte order; entropy via a per-(doc, byte) group count).
    *
    * Residual parity risk (accepted, documented): the entropy group-sum
    * accumulates ≤256 float terms in engine-specific order before round-6;
    * a document whose entropy sits within ~1 ulp of a half-way point could
    * round apart on other corpora. Verified green on the fixed gate data
    * at sf0.001/0.01/0.1 (the terms cannot be integer-scaled — ln(c) is
    * irrational). */
  val mmBinaryFeaturesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
       |    $SqlBytes AS bs
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, byte, CAST(count(*) AS DOUBLE) AS cnt
       |  FROM (SELECT doc_id, unnest(bs) AS byte FROM m)
       |  GROUP BY doc_id, byte),
       |e AS (
       |  SELECT c.doc_id,
       |    -sum((cnt / t.n) * ln(cnt / t.n) / ln(2.0)) AS ent
       |  FROM c JOIN (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n
       |               FROM c GROUP BY doc_id) t
       |    ON c.doc_id = t.doc_id
       |  GROUP BY c.doc_id)
       |SELECT m.doc_id AS doc_id, m.modality AS modality,
       |  CAST(len(m.bs) AS INT) AS n_bytes,
       |  round(CASE WHEN len(m.bs) = 0 THEN 0.0 ELSE list_avg(m.bs) END, 6) AS mean_byte,
       |  round(coalesce(e.ent, 0.0), 6) AS byte_entropy,
       |  CAST(greatest(len(m.bs) // 256, 1) AS INT) AS n_frames
       |FROM m LEFT JOIN e ON m.doc_id = e.doc_id""".stripMargin

  /** Driver-facing projection: thumbs digested to a scalar so the gate can
    * sort and hash. */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(mediaTable(Tables.documents(spark, sfDir)))
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        col("frame_hash"),
        round(aggregate(col("thumb"), lit(0.0), (a, x) => a + x), 6).as("thumb_sum"))

  /** Oracle for frame sampling: the per-frame polynomial hash replays
    * Java's wrapping 64-bit arithmetic in HUGEINT mod 2^64 (then converts
    * back to signed), and the thumbnail byte grid is the same integer
    * index arithmetic. */
  val mmFrameSampleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, $SqlBytes AS bs
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT doc_id, bs, len(bs) AS L,
       |    greatest(len(bs) // 256, 1) AS nf,
       |    least(greatest(len(bs) // 256, 1), 8) AS tk
       |  FROM m),
       |y AS (
       |  SELECT doc_id, bs, L,
       |    CAST(i AS INT) AS frame_idx,
       |    CAST((CASE WHEN tk = 1 THEN 0 ELSE i * (nf - 1) // (tk - 1) END) * 256 AS INT) AS frame_off
       |  FROM (SELECT doc_id, bs, L, nf, tk, unnest(range(tk)) AS i FROM f)),
       |z AS (
       |  SELECT doc_id, frame_idx, frame_off, bs, L,
       |    least(frame_off + 256, L) AS fend,
       |    greatest(least(frame_off + 256, L) - frame_off, 1) AS flen
       |  FROM y)
       |SELECT doc_id, frame_idx, frame_off,
       |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
       |       THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS frame_hash,
       |  round(ts, 6) AS thumb_sum
       |FROM (
       |  SELECT doc_id, frame_idx, frame_off,
       |    list_reduce([1125899906842597::HUGEINT] ||
       |      list_transform(bs[frame_off+1:fend], b -> b::HUGEINT),
       |      (h, b) -> (h * 31 + b) % 18446744073709551616::HUGEINT) AS hu,
       |    list_sum(list_transform(range(16),
       |      t -> CASE WHEN frame_off + (t * flen // 16) < L
       |           THEN bs[CAST(frame_off + (t * flen // 16) AS INT) + 1] / 255.0
       |           ELSE 0.0 END)) AS ts
       |  FROM z)""".stripMargin
}

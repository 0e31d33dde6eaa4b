package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Byte sum of a binary column — a native Catalyst expression with
  * whole-stage codegen, standing in for per-blob feature extraction in the
  * multimodal pipeline (a real deployment swaps the loop body for a codec
  * call; the Spark-side shape — tight per-row loop over the blob inside
  * codegen — is the part that matters at scale). */
case class BinaryByteSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} += ($bytes[$i] & 0xff);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multimodal column plumbing (SURVEY brief: treat image/audio/video as
  * opaque binary + typed metadata; make the Spark-side schema, batching
  * and partitioning real, stub the codec).
  *
  * The media table schema is
  * `(id LONG, media BINARY, meta STRUCT<mime STRING, width INT, height INT>)`.
  * Feature extraction runs per-partition over an iterator of blobs —
  * the same batch shape `mapInPandas`/Arrow would see — with a
  * deterministic stub in place of the absent codec libraries.
  */
object Multimodal {

  /** Column wrapper for the native byte-sum expression. */
  def byteSum(c: Column): Column = Shims.column(BinaryByteSum(Shims.expression(c)))

  /** Build a media table from any text column (the container has no image
    * codecs, so blobs are synthesized deterministically from text). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height")).as("meta"))

  /** STUBBED decode: a real build would decode image bytes here (e.g.
    * javax.imageio / ffmpeg). The stub derives deterministic pseudo-pixels
    * so the pipeline shape (schema, partition iteration, per-blob loop) is
    * exercised end-to-end. */
  private[multimodal] def decodeStub(media: Array[Byte]): Array[Float] = {
    val n = math.min(16, media.length)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = ((media(i) & 0xff) / 255.0f)
      i += 1
    }
    out
  }

  /** STUBBED resize: a real build would decode, scale to (w, h) and
    * re-encode; the stub deterministically subsamples the blob to the
    * target "pixel budget" so output sizes follow the real contract
    * (output length = min(input length, w·h/256)). */
  private[multimodal] def resizeStub(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val budget = math.max(1, w * h / 256)
    if (media.length <= budget) return media
    val out = new Array[Byte](budget)
    var i = 0
    while (i < budget) {
      out(i) = media((i.toLong * media.length / budget).toInt)
      i += 1
    }
    out
  }

  /** Input row shape for the per-partition codec passes. */
  private[multimodal] case class MediaRow(id: Long, media: Array[Byte])
  private[multimodal] case class ResizedRow(id: Long, media: Array[Byte], n_bytes: Long)
  private[multimodal] case class FrameRow(id: Long, frame_idx: Int, frame: Array[Byte])
  private[multimodal] case class FeatureRow(id: Long, features: Array[Float], n_bytes: Long)

  // JVM-cached encoders: Encoders.product derives via runtime reflection
  // on every call — once per JVM is enough (same rationale as delta.Encs)
  private lazy val mediaRowEnc = org.apache.spark.sql.Encoders.product[MediaRow]
  private lazy val resizedRowEnc = org.apache.spark.sql.Encoders.product[ResizedRow]
  private lazy val frameRowEnc = org.apache.spark.sql.Encoders.product[FrameRow]
  private lazy val featureRowEnc = org.apache.spark.sql.Encoders.product[FeatureRow]

  private def asMedia(media: DataFrame): org.apache.spark.sql.Dataset[MediaRow] = {
    implicit val enc = mediaRowEnc
    media.select(col("id"), col("media")).as[MediaRow]
  }

  /** Resize every blob per partition; schema (id, media, n_bytes).
    *
    * Typed `Dataset.mapPartitions` (not an RDD hop): the codec pass stays
    * a node INSIDE the Catalyst plan — codegen spans the surrounding
    * operators and AQE still re-plans across it, where a
    * DataFrame→rdd→createDataFrame round-trip severs both. The iterator
    * shape is what a real decode (mapInPandas / Arrow batch) needs. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    implicit val enc = resizedRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val resized = resizeStub(m.media, width, height)
        ResizedRow(m.id, resized, resized.length.toLong)
      }
    }.toDF()
  }

  /** Frame sampling for video-shaped blobs: treat the blob as contiguous
    * `frameBytes`-sized frames, keep every `everyN`-th frame (from the
    * first). Output one row per sampled frame with its index — the
    * explode-shaped plumbing a real frame extractor needs. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    implicit val enc = frameRowEnc
    asMedia(media).mapPartitions { it =>
      it.flatMap { m =>
        val frames = m.media.length / frameBytes
        (0 until frames by everyN).iterator.map { f =>
          FrameRow(m.id, f, java.util.Arrays.copyOfRange(
            m.media, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }.toDF()
  }

  /** Per-partition feature extraction over blobs: decode (stub) →
    * fixed-width feature vector. Runs as one iterator pass per partition —
    * the executor never materializes more than one blob batch. */
  def extractFeatures(media: DataFrame): DataFrame = {
    implicit val enc = featureRowEnc
    asMedia(media).mapPartitions { it =>
      it.map(m => FeatureRow(m.id, decodeStub(m.media), m.media.length.toLong))
    }.toDF()
  }

  // ------------------------------------------------- real decode faces
  private[multimodal] case class WavRow(
      id: Long, sample_rate: Int, n_channels: Int, n_samples: Long,
      mean_amp: Double, peak_amp: Int)
  private[multimodal] case class BmpRow(
      id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  private lazy val wavRowEnc = org.apache.spark.sql.Encoders.product[WavRow]
  private lazy val bmpRowEnc = org.apache.spark.sql.Encoders.product[BmpRow]

  /** `(id, media)` of spec-compliant PCM WAVE blobs synthesized from the
    * id column ([[MediaCodecs.synthWav]]; `nSamples = 64 + id mod 64`) —
    * generated per partition, never on the driver. */
  def wavMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id, MediaCodecs.synthWav(id, (64 + id % 64).toInt)))
    }.toDF()
  }

  /** `(id, media)` of G.711 mu-law WAVE blobs (format tag 7) whose
    * bytes are the closed form `(id*13 + i*7) mod 256`
    * ([[MediaCodecs.synthUlawWav]]; even `nSamples = 50 + 2*(id mod
    * 10)` so the data chunk needs no pad byte). Decoded through the
    * same [[wavFeatures]] face — format dispatch is the decoder's. */
  def ulawMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id,
        MediaCodecs.synthUlawWav(id, (50 + 2 * (id % 10)).toInt)))
    }.toDF()
  }

  /** REAL per-partition WAV decode ([[MediaCodecs.decodeWav]]): RIFF
    * chunk walk + PCM or mu-law fold per blob, one iterator pass, schema
    * `(id, sample_rate, n_channels, n_samples, mean_amp, peak_amp)`. */
  def wavFeatures(media: DataFrame): DataFrame = {
    implicit val enc = wavRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val s = MediaCodecs.decodeWav(m.media)
        WavRow(m.id, s.sampleRate, s.channels, s.nSamples, s.mean, s.peak)
      }
    }.toDF()
  }

  /** `(id, media)` of 24-bit BMP blobs synthesized from the id column
    * ([[MediaCodecs.synthBmp]]; `width = 4 + id mod 5`,
    * `height = 3 + id mod 4` — the mod-5 widths exercise every row
    * padding remainder). */
  def bmpMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id,
        MediaCodecs.synthBmp(id, (4 + id % 5).toInt, (3 + id % 4).toInt)))
    }.toDF()
  }

  /** REAL per-partition BMP decode ([[MediaCodecs.decodeBmp]]): header
    * parse + padded bottom-up pixel walk, schema
    * `(id, width, height, mean_r, mean_g, mean_b)`. */
  def bmpFeatures(media: DataFrame): DataFrame = {
    implicit val enc = bmpRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val s = MediaCodecs.decodeBmp(m.media)
        BmpRow(m.id, s.width, s.height, s.meanR, s.meanG, s.meanB)
      }
    }.toDF()
  }

  /** `(id, media)` of 8-bit truecolor PNG blobs synthesized from the id
    * column ([[MediaCodecs.synthPng]]; `width = 3 + id mod 6`,
    * `height = 5 + id mod 5` — every height ≥ 5 cycles through ALL five
    * scanline filters). */
  def pngMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id,
        MediaCodecs.synthPng(id, (3 + id % 6).toInt, (5 + id % 5).toInt)))
    }.toDF()
  }

  /** REAL per-partition PNG decode ([[MediaCodecs.decodePng]]): chunk
    * walk with CRC verification, zlib inflate, all-five-filter scanline
    * reconstruction; schema `(id, width, height, mean_r, mean_g,
    * mean_b)`. */
  def pngFeatures(media: DataFrame): DataFrame = {
    implicit val enc = bmpRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val s = MediaCodecs.decodePng(m.media)
        BmpRow(m.id, s.width, s.height, s.meanR, s.meanG, s.meanB)
      }
    }.toDF()
  }

  /** `(id, media)` of GIF89a blobs synthesized from the id via closed
    * palette/index forms ([[MediaCodecs.synthGif]]). */
  def gifMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id,
        MediaCodecs.synthGif(id, (3 + id % 4).toInt, (2 + id % 3).toInt)))
    }.toDF()
  }

  /** REAL per-partition GIF decode ([[MediaCodecs.decodeGif]]): block
    * walking, color tables, and a full variable-width LZW decode run in
    * executor tasks; output shape matches the other image codecs. */
  def gifFeatures(media: DataFrame): DataFrame = {
    implicit val enc = bmpRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val s = MediaCodecs.decodeGif(m.media)
        BmpRow(m.id, s.width, s.height, s.meanR, s.meanG, s.meanB)
      }
    }.toDF()
  }

  /** `(id, media)` of baseline JPEG blobs synthesized from the id —
    * real DQT/SOF0/DHT/SOS structure with the Annex K.3 standard
    * Huffman tables ([[MediaCodecs.synthJpeg]]); 8x8 blocks carry
    * closed-form constant YCbCr so the decode is bit-exact. */
  def jpegMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc = mediaRowEnc
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => MediaRow(id,
        MediaCodecs.synthJpeg(id, (1 + id % 3).toInt, (1 + id % 2).toInt)))
    }.toDF()
  }

  /** REAL per-partition baseline-JPEG decode ([[MediaCodecs.decodeJpeg]]):
    * canonical Huffman, DC prediction, dequant, IDCT, fixed-point
    * YCbCr→RGB — all in executor tasks; output shape matches the other
    * image codecs. */
  def jpegFeatures(media: DataFrame): DataFrame = {
    implicit val enc = bmpRowEnc
    asMedia(media).mapPartitions { it =>
      it.map { m =>
        val s = MediaCodecs.decodeJpeg(m.media)
        BmpRow(m.id, s.width, s.height, s.meanR, s.meanG, s.meanB)
      }
    }.toDF()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside. The Spark-side machinery —
  * schema, partition-friendly batch iteration, deterministic output shape —
  * is real and tested; images and audio are decoded for REAL (pure-JVM
  * `javax.imageio` / `javax.sound.sampled` header parsing); only the
  * VIDEO codec call is STUBBED (no video libraries in this environment)
  * behind [[MediaCodec.decodeStub]], which
  * derives deterministic fake dimensions from the payload. Swap
  * `decodeStub` for a real codec (JavaCPP/FFmpeg etc.) without touching
  * the pipeline shape.
  */
object Multimodal {

  case class MediaMeta(id: Long, byte_len: Long, kind: String, width: Long, height: Long)

  object MediaCodec {
    /** STUB (video only — no video codec libraries in this environment):
      * a real implementation would parse the container header.
      * Deterministic fake: dimensions derived from payload length, kind
      * from a length mod — keeps tests and oracles reproducible.
      * IMAGES and AUDIO are decoded for real — see [[decodeImageHeader]]
      * and [[decodeAudioHeader]]. */
    def decodeStub(payload: Array[Byte]): (String, Long, Long) = {
      val len = payload.length.toLong
      val kind = (len % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      (kind, len % 640, len % 480)
    }

    /** REAL image decode (pure-JVM `javax.imageio`): format name and
      * dimensions read from the container HEADER via an `ImageReader` —
      * `getWidth/getHeight` never rasterize pixel data, which is the
      * behavior a 100 TB scan needs (don't decode megapixels to learn a
      * thumbnail's dimensions). PNG/JPEG/GIF/BMP ship with the JDK.
      * Returns None for bytes no installed reader recognizes. */
    def decodeImageHeader(payload: Array[Byte]): Option[(String, Int, Int)] = {
      if (payload == null || payload.isEmpty) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
          } catch { case _: java.io.IOException => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** REAL audio header decode (pure-JVM `javax.sound.sampled`): container
      * type, sample rate, channel count and frame count read from the WAV/
      * AIFF/AU header via `AudioSystem.getAudioFileFormat` — header-only,
      * the PCM payload is never decoded (the 100 TB-scan shape: learn a
      * clip's duration without streaming its samples). Returns None for
      * bytes no installed provider recognizes. */
    def decodeAudioHeader(payload: Array[Byte]): Option[(String, Int, Int, Long)] = {
      if (payload == null || payload.isEmpty) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        Some((aff.getType.getExtension.toLowerCase, fmt.getSampleRate.round,
          fmt.getChannels, aff.getFrameLength.toLong))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

    /** Fixture generator for the real audio-decode path: a PCM-16 WAV with
      * the given rate/channels/frames (deterministic ramp samples — the
      * oracle predicts header fields, not byte content). */
    def encodeWav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
      val af = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
      val data = new Array[Byte](frames * channels * 2)
      var i = 0
      while (i < data.length) { data(i) = (i % 251).toByte; i += 1 }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), af, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Fixture generator for the real-decode path: a blank w×h image in
      * the given format ("png"/"jpeg"). Deterministic bytes per (w,h,
      * format) — the oracle predicts dimensions, not byte content. */
    def encodeImage(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
  }

  case class ImageMeta(id: Long, format: String, width: Long, height: Long,
                       byte_len: Long)

  /** REAL image-metadata extraction over a binary column: per-partition
    * batch iteration (codec state amortized across the partition's rows),
    * header-only decode — no full rasterization, no shuffle. Bytes no
    * reader recognizes surface as format "unknown" with -1 dims rather
    * than dropping rows (an audit scan must account for every input). */
  def imageMeta(df: DataFrame, idCol: String, binCol: String): Dataset[ImageMeta] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        MediaCodec.decodeImageHeader(payload) match {
          case Some((fmt, w, h)) => ImageMeta(id, fmt, w.toLong, h.toLong, payload.length.toLong)
          case None => ImageMeta(id, "unknown", -1L, -1L, payload.length.toLong)
        }
      }
    }(Encoders.product[ImageMeta])
  }

  /** Deterministic image fixture over any id column: each row becomes a
    * REAL encoded PNG (even ids) or JPEG (odd ids) whose dimensions are a
    * closed form of the id — so a SQL oracle can predict what the real
    * decoder must recover from the bytes. Encoding runs per-partition
    * (map-side, no shuffle); this is the test-harness inverse of
    * [[imageMeta]], not a production operator. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 1 + (id % 64).toInt
        val h = 1 + (id % 48).toInt
        val fmt = if (id % 2 == 0) "png" else "jpeg"
        (id, MediaCodec.encodeImage(w, h, fmt))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "img")
  }

  case class AudioMeta(id: Long, format: String, sample_rate: Long,
                       channels: Long, frames: Long, byte_len: Long)

  /** REAL audio-metadata extraction over a binary column: per-partition
    * batch iteration, header-only decode (no PCM materialization, no
    * shuffle). Unrecognized bytes surface as format "unknown" with -1
    * fields rather than dropping rows. */
  def audioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        MediaCodec.decodeAudioHeader(payload) match {
          case Some((fmt, sr, ch, fr)) =>
            AudioMeta(id, fmt, sr.toLong, ch.toLong, fr, payload.length.toLong)
          case None => AudioMeta(id, "unknown", -1L, -1L, -1L, payload.length.toLong)
        }
      }
    }(Encoders.product[AudioMeta])
  }

  /** Deterministic audio fixture over any id column: each row becomes a
    * REAL PCM-16 WAV whose rate/channels/frames are a closed form of the
    * id — the SQL oracle predicts what the real header parser must
    * recover from the bytes. Map-side only; the test-harness inverse of
    * [[audioMeta]]. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val rate = 8000 * (1 + (id % 5).toInt)
        val ch = 1 + (id % 2).toInt
        val frames = 50 + (id % 200).toInt
        (id, MediaCodec.encodeWav(rate, ch, frames))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "wav")
  }

  /** Batch metadata extraction over a binary column via mapPartitions —
    * the per-partition batch shape a real decoder needs (amortized codec
    * init per partition, not per row). */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      // real codecs would init once here, per partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (kind, w, h) = MediaCodec.decodeStub(payload)
        MediaMeta(id, payload.length.toLong, kind, w, h)
      }
    }(Encoders.product[MediaMeta])
  }

  /** Deterministic frame sampling plan for a (stub) video column: every
    * `stride`-th frame index below `frames` — the fan-out shape of a real
    * frame extractor (explode without shuffling the payload twice). */
  def frameSamplePlan(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("kind") === "video")
      .withColumn("n_frames", (col("byte_len") % 300 + 1).cast("long"))
      .select(col("id"), posexplode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
        .as(Seq("sample_ord", "frame_idx")))

  /** Resize plan: target dimensions preserving aspect ratio against a
    * bounding box — pure metadata arithmetic; the pixel work would happen
    * in the (stubbed) codec pass. */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = greatest(col("width"), lit(1L)); val h = greatest(col("height"), lit(1L))
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    meta.select(col("id"), col("kind"), col("width"), col("height"),
      floor(w * scale).cast("long").as("target_w"),
      floor(h * scale).cast("long").as("target_h"))
  }

  case class MediaFeature(id: Long, embedding: Array[Float])

  /** STUB feature extractor: a deterministic pseudo-embedding derived from
    * the payload digest (unit-normalized), in the batch-per-partition
    * shape a real vision/audio encoder needs. Output plugs directly into
    * [[Similarity.hyperplaneBuckets]] / cosine ANN — the full
    * decode → embed → dedup/search pipeline minus only the codec. */
  def fakeFeatures(df: DataFrame, idCol: String, binCol: String,
                   dims: Int): Dataset[MediaFeature] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      // a real encoder would load weights once per partition here
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val vec = new Array[Float](dims)
        var seed = md.digest(payload)
        var i = 0
        while (i < dims) {
          if (i % 16 == 0 && i > 0) seed = md.digest(seed)
          vec(i) = ((seed(i % 16) & 0xff) - 127.5f) / 127.5f
          i += 1
        }
        val n = math.sqrt(vec.map(x => x.toDouble * x).sum).toFloat max 1e-9f
        MediaFeature(id, vec.map(_ / n))
      }
    }(Encoders.product[MediaFeature])
  }
}

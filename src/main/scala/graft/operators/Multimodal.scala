package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside. The Spark-side machinery —
  * schema, partition-friendly batch iteration, deterministic output shape —
  * is real and tested, and so are the decodes: HEADERS for images
  * (`javax.imageio`), audio (`javax.sound.sampled`) and video (a
  * hand-rolled ISO-BMFF box parser), plus CONTENT for image rasters
  * ([[Multimodal.imagePixelStats]]), audio PCM
  * ([[Multimodal.audioPcmStats]]) and MJPEG-class AVI video frames
  * ([[Multimodal.videoFrameStats]] via a RIFF walker + per-frame
  * ImageIO) — all pure-JVM. What this environment genuinely lacks is a
  * compressed-video codec (H.264/VP9/AV1 frame decode), represented by
  * [[MediaCodec.decodeStub]] — a deterministic fake kept for the q34
  * plumbing demo; swap it for a real codec (JavaCPP/FFmpeg etc.)
  * without touching the pipeline shape.
  */
object Multimodal {

  // ImageIO's DEFAULT stream cache is a TEMP FILE per read/write — every
  // decoded image/frame paid a file create+write+delete even though all
  // payloads here are in-memory byte arrays (r19: 294k → 2.4k
  // syscalls/run on q76). Scoped per stream by constructing
  // MemoryCacheImage{Input,Output}Stream explicitly at every call site
  // below, NOT by flipping the process-wide `ImageIO.setUseCache`
  // default (r19 ADVICE: a JVM-global mutation would also change
  // behavior for host-application ImageIO users decoding very large
  // images that rely on disk-backed caching).

  /** ImageIO read/write through explicit MEMORY-cached streams,
    * centralized so every call site — including executor-side partition
    * closures — takes the temp-file-free path. */
  private[operators] def imageIoRead(payload: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload)))

  private[operators] def imageIoWrite(img: java.awt.image.RenderedImage,
                                      format: String,
                                      out: java.io.OutputStream): Unit = {
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    // close() flushes the memory cache into `out`
    try javax.imageio.ImageIO.write(img, format, ios) finally ios.close()
  }

  case class MediaMeta(id: Long, byte_len: Long, kind: String, width: Long, height: Long)

  object MediaCodec {
    /** STUB standing in for codec-library media decode — by round 8 its
      * scope is ONLY video frames in compressed-codec formats (H.264/
      * VP9/AV1 etc.), which genuinely need a codec library this
      * environment lacks. Deterministic fake: dimensions derived from
      * payload length, kind from a length mod — keeps tests and oracles
      * reproducible. Everything else is decoded for REAL: image headers
      * ([[decodeImageHeader]]) and rasters ([[Multimodal.imagePixelStats]]),
      * audio headers ([[decodeAudioHeader]]) and PCM
      * ([[Multimodal.audioPcmStats]]), video headers
      * ([[decodeVideoHeader]]) and MJPEG-class AVI frames
      * ([[Multimodal.videoFrameStats]]). */
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
      // explicit memory-cached stream — see imageIoRead
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
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

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def boxType(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    /** Walk ISO-BMFF boxes in b[start,end): f(type, payloadStart,
      * payloadEnd) per box. Handles all three size forms of ISO
      * 14496-12 §4.2 — plain 32-bit, size=1 (64-bit largesize follows
      * the type), size=0 (box extends to the end of the container).
      * Returns false on any malformed size (undersized or overrunning
      * the enclosing box); all arithmetic is done in Long so an
      * adversarial 0x7fffffff-ish size cannot wrap the bounds check. */
    private def walkBoxes(b: Array[Byte], start: Int, end: Int)
                         (f: (String, Int, Int) => Unit): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val size32 = be32(b, off)
        var payloadStart = off + 8
        val size: Long =
          if (size32 == 0) (end - off).toLong
          else if (size32 == 1) {
            if (off + 16 > end) return false
            payloadStart = off + 16
            (be32(b, off + 8).toLong << 32) | (be32(b, off + 12).toLong & 0xffffffffL)
          } else size32.toLong // negative (= unsigned ≥ 2^31) fails below
        if (size < (payloadStart - off).toLong || size > (end - off).toLong)
          return false
        f(boxType(b, off + 4), payloadStart, off + size.toInt)
        off += size.toInt
      }
      true
    }

    /** REAL video container header decode: a hand-rolled ISO-BMFF (MP4)
      * box walker per ISO 14496-12 — recovers the `ftyp` major brand,
      * `mvhd` timescale/duration and `tkhd` track dimensions (16.16
      * fixed-point) from the raw bytes. Header-only: the `mdat` media
      * payload is never touched (the 100 TB-scan shape — learn a video's
      * duration and resolution without reading its frames; FRAME decode
      * would need a codec library this environment lacks). Returns None
      * unless the bytes open with a well-formed `ftyp` and every box size
      * is consistent. Timescale and duration are u32 per the spec, so
      * both are returned as Long. */
    def decodeVideoHeader(payload: Array[Byte]): Option[(String, Long, Long, Int, Int)] = {
      if (payload == null || payload.length < 16) return None
      // type check only — walkBoxes validates the size, whichever of the
      // three size forms the leading box uses
      if (boxType(payload, 4) != "ftyp") return None
      var brand: String = null
      var timescale = -1L; var duration = -1L; var w = -1; var h = -1
      var nestedOk = true
      val ok = walkBoxes(payload, 0, payload.length) { (t, ps, pe) =>
        if (t == "ftyp") { if (pe - ps >= 4) brand = boxType(payload, ps) }
        else if (t == "moov") nestedOk &= walkBoxes(payload, ps, pe) { (mt, mps, mpe) =>
          if (mt == "mvhd") {
            // version-0 payload: ver/flags(4) times(8) timescale(4) duration(4)
            if (mpe - mps >= 20 && payload(mps) == 0) {
              timescale = be32(payload, mps + 12).toLong & 0xffffffffL // unsigned
              duration = be32(payload, mps + 16).toLong & 0xffffffffL // unsigned
            }
          } else if (mt == "trak") nestedOk &= walkBoxes(payload, mps, mpe) { (tt, tps, tpe) =>
            // version-0 tkhd payload: width/height at 76/80, 16.16 fixed.
            // Real files carry several traks (video + audio, the audio
            // one 0×0) — keep the first POSITIVE-dimension track, falling
            // back to the first track seen
            if (tt == "tkhd" && tpe - tps >= 84 && payload(tps) == 0) {
              val nw = be32(payload, tps + 76) >>> 16
              val nh = be32(payload, tps + 80) >>> 16
              if (w < 0 || (nw > 0 && nh > 0 && (w == 0 || h == 0))) { w = nw; h = nh }
            }
          }
        }
      }
      if (ok && nestedOk && brand != null && timescale > 0 && duration >= 0 && w >= 0 && h >= 0)
        Some((brand, timescale, duration, w, h))
      else None
    }

    private def box(out: java.io.ByteArrayOutputStream, tpe: String,
                    payload: Array[Byte]): Unit = {
      val hdr = java.nio.ByteBuffer.allocate(8)
      hdr.putInt(8 + payload.length)
      hdr.put(tpe.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(hdr.array()); out.write(payload)
    }

    /** Fixture generator for the real video-decode path: a minimal valid
      * ISO-BMFF file — `ftyp` + `moov(mvhd + trak(tkhd))` + a token
      * `mdat` — with the given brand, timescale/duration and track
      * dimensions (the oracle predicts header fields, not byte content). */
    def encodeMp4(brand: String, timescale: Int, durationTicks: Long,
                  w: Int, h: Int): Array[Byte] =
      encodeMp4Multi(brand, timescale, durationTicks, Seq((w, h)))

    /** [[encodeMp4]] with several traks — real files carry video + audio
      * traks, the audio one with 0×0 tkhd dimensions. */
    private[graft] def encodeMp4Multi(brand: String, timescale: Int,
                                      durationTicks: Long,
                                      trakDims: Seq[(Int, Int)]): Array[Byte] = {
      val matrix = Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      val mvhd = java.nio.ByteBuffer.allocate(100)
      mvhd.putInt(0).putInt(0).putInt(0) // version/flags, creation, modification
      mvhd.putInt(timescale).putInt(durationTicks.toInt)
      mvhd.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      mvhd.position(mvhd.position() + 10) // reserved
      matrix.foreach(mvhd.putInt); (0 until 6).foreach(_ => mvhd.putInt(0))
      mvhd.putInt(trakDims.length + 1) // next track id: exceeds every trak's id
      def tkhdFor(trackId: Int, w: Int, h: Int): Array[Byte] = {
        val tkhd = java.nio.ByteBuffer.allocate(84)
        tkhd.putInt(0x00000007).putInt(0).putInt(0) // flags: enabled|in-movie|in-preview
        tkhd.putInt(trackId).putInt(0).putInt(0).putInt(0).putInt(0) // track id, reserved, duration, reserved
        tkhd.putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt group, volume, reserved
        matrix.foreach(tkhd.putInt)
        tkhd.putInt(w << 16).putInt(h << 16)
        tkhd.array()
      }
      val bb = java.nio.charset.StandardCharsets.ISO_8859_1
      val ftyp = new java.io.ByteArrayOutputStream()
      ftyp.write(brand.getBytes(bb)); ftyp.write(Array[Byte](0, 0, 2, 0))
      ftyp.write(brand.getBytes(bb))
      val moov = new java.io.ByteArrayOutputStream()
      box(moov, "mvhd", mvhd.array())
      trakDims.zipWithIndex.foreach { case ((w, h), i) =>
        val trak = new java.io.ByteArrayOutputStream()
        box(trak, "tkhd", tkhdFor(i + 1, w, h))
        box(moov, "trak", trak.toByteArray)
      }
      val out = new java.io.ByteArrayOutputStream()
      box(out, "ftyp", ftyp.toByteArray); box(out, "moov", moov.toByteArray)
      box(out, "mdat", new Array[Byte](16))
      out.toByteArray
    }

    /** Fixture generator for the real-decode path: a blank w×h image in
      * the given format ("png"/"jpeg"). Deterministic bytes per (w,h,
      * format) — the oracle predicts dimensions, not byte content. */
    def encodeImage(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      Multimodal.imageIoWrite(img, format, bos)
      bos.toByteArray
    }

    // ---- RIFF/AVI (MJPEG-class video): pure-JVM container codec ----

    private def le32(v: Long): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    private def le32At(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** Minimal MJPEG-class AVI writer (RIFF per the VfW layout):
      * RIFF('AVI '){ LIST hdrl { avih, LIST strl { strh('vids'), strf } },
      * LIST movi { '00dc' frame ... } }. `codec` is the fourcc recorded
      * in strh/strf — 'MJPG' (JPEG frames) and 'MPNG' (PNG frames) are
      * both real VfW registrations; the frame payloads are whatever the
      * caller encoded. Chunks pad to even length per RIFF. */
    def encodeAvi(codec: String, w: Int, h: Int, fps: Int,
                  frames: Seq[Array[Byte]]): Array[Byte] = {
      val ISO = java.nio.charset.StandardCharsets.ISO_8859_1
      def fcc(s: String): Array[Byte] = s.getBytes(ISO)
      def le16(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)
      def chunk(tpe: String, body: Array[Byte]): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(fcc(tpe)); bos.write(le32(body.length.toLong))
        bos.write(body); if ((body.length & 1) == 1) bos.write(0)
        bos.toByteArray
      }
      def list(tpe: String, bodies: Array[Byte]*): Array[Byte] = {
        val inner = new java.io.ByteArrayOutputStream()
        inner.write(fcc(tpe)); bodies.foreach(inner.write)
        chunk("LIST", inner.toByteArray)
      }
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      val avih = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(le32(1000000L / math.max(1, fps))) // dwMicroSecPerFrame
        b.write(le32(0)); b.write(le32(0)); b.write(le32(0)) // bps/pad/flags
        b.write(le32(frames.size.toLong)) // dwTotalFrames
        b.write(le32(0)); b.write(le32(1)) // initial frames, streams
        b.write(le32(maxFrame.toLong)) // suggested buffer
        b.write(le32(w.toLong)); b.write(le32(h.toLong))
        b.write(new Array[Byte](16)) // dwReserved[4]
        b.toByteArray
      }
      val strh = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(fcc("vids")); b.write(fcc(codec))
        b.write(le32(0)); b.write(le16(0)); b.write(le16(0)) // flags, prio, lang
        b.write(le32(0)) // initial frames
        b.write(le32(1)); b.write(le32(fps.toLong)) // scale, rate
        b.write(le32(0)); b.write(le32(frames.size.toLong)) // start, length
        b.write(le32(maxFrame.toLong)); b.write(le32(0xffffffffL)) // sugbuf, quality
        b.write(le32(0)) // sample size
        b.write(le16(0)); b.write(le16(0)); b.write(le16(w)); b.write(le16(h)) // rcFrame
        b.toByteArray
      }
      val strf = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(le32(40)); b.write(le32(w.toLong)); b.write(le32(h.toLong))
        b.write(le16(1)); b.write(le16(24)) // planes, bit count
        b.write(fcc(codec)) // biCompression
        b.write(le32(w.toLong * h * 3))
        b.write(le32(0)); b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
        b.toByteArray
      }
      val hdrl = list("hdrl", chunk("avih", avih),
        list("strl", chunk("strh", strh), chunk("strf", strf)))
      val movi = list("movi", frames.map(f => chunk("00dc", f)): _*)
      val inner = new java.io.ByteArrayOutputStream()
      inner.write(fcc("AVI ")); inner.write(hdrl); inner.write(movi)
      chunk("RIFF", inner.toByteArray)
    }

    /** REAL video-frame payload extraction for RIFF/AVI containers: walks
      * the RIFF chunk tree to LIST 'movi' and returns each video frame
      * chunk ('##dc'/'##db') payload in stream order. Pure container
      * parsing — decoding the payloads is the caller's concern (ImageIO
      * handles the MJPG/MPNG cases with no codec library). Returns None
      * unless the bytes open with a well-formed RIFF/AVI header; chunk
      * bounds are checked in Long so an adversarial size cannot wrap. */
    def decodeAviFrames(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
      if (payload == null || payload.length < 12) return None
      if (boxType(payload, 0) != "RIFF" || boxType(payload, 8) != "AVI ") return None
      val riffEnd = math.min(payload.length.toLong, 8L + le32At(payload, 4))
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(start: Long, end: Long): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val tpe = boxType(payload, off.toInt)
          val size = le32At(payload, off.toInt + 4)
          val dataStart = off + 8
          val dataEnd = dataStart + size
          if (dataEnd > end) return false
          if (tpe == "LIST") {
            if (size < 4) return false
            val listType = boxType(payload, dataStart.toInt)
            if (listType == "movi" || listType == "rec ")
              { if (!walk(dataStart + 4, dataEnd)) return false }
          } else if (tpe.length == 4 && tpe.take(2).forall(_.isDigit) &&
                     (tpe.endsWith("dc") || tpe.endsWith("db"))) {
            frames += java.util.Arrays.copyOfRange(
              payload, dataStart.toInt, dataEnd.toInt)
          }
          off = dataEnd + (size & 1L) // RIFF pads chunks to even offsets
        }
        true
      }
      if (!walk(12L, riffEnd)) None else Some(frames.result())
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

  case class DecimatedAudio(id: Long, in_frames: Long, out_frames: Long,
                            out_rate: Long, mean_abs: Double, peak: Long,
                            wav: Array[Byte])

  /** REAL audio downsample by integer decimation (pure JVM): decode
    * 16-bit PCM, keep every `factor`-th frame (all channels), re-encode
    * as a WAV at rate/factor, and reduce the KEPT samples to
    * mean-|amplitude| and peak in the same pass — the sample-rate
    * normalization step of an audio ingest pipeline (plain decimation,
    * no anti-alias filter: the deterministic variant a SQL oracle can
    * replay sample-by-sample; see the q94 oracle). Map-side; memory is
    * O(clip) — inherent, since the decimated bytes are the output.
    * Non-PCM-16 or undecodable payloads surface as a frames = -1
    * sentinel row. */
  def audioDecimate(df: DataFrame, idCol: String, binCol: String,
                    factor: Int): Dataset[DecimatedAudio] = {
    require(factor >= 1, "factor must be at least 1")
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val out =
          try {
            if (payload.isEmpty) None
            else {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              try {
                val fmt = ais.getFormat
                if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                  fmt.getSampleSizeInBits != 16) None
                else {
                  val ch = fmt.getChannels; val big = fmt.isBigEndian
                  val frameBytes = ch * 2
                  val pcm = ais.readAllBytes()
                  val inFrames = pcm.length / frameBytes
                  val kept = new java.io.ByteArrayOutputStream()
                  var absSum = 0L; var peak = 0L; var nKeptSamples = 0L
                  var f = 0
                  while (f < inFrames) {
                    if (f % factor == 0) {
                      val off = f * frameBytes
                      var c = 0
                      while (c < ch) {
                        val i = off + c * 2
                        // the output WAV is ALWAYS little-endian (WAV is
                        // LE by spec, and platform writers may reject BE
                        // PCM-16 streams) — swap bytes from BE sources
                        if (big) { kept.write(pcm(i + 1)); kept.write(pcm(i)) }
                        else kept.write(pcm, i, 2)
                        val s = if (big) (pcm(i) << 8) | (pcm(i + 1) & 0xff)
                                else (pcm(i + 1) << 8) | (pcm(i) & 0xff)
                        val a = math.abs(s.toShort.toLong)
                        absSum += a; if (a > peak) peak = a
                        nKeptSamples += 1; c += 1
                      }
                    }
                    f += 1
                  }
                  val outFrames = (inFrames + factor - 1) / factor
                  val outRate = fmt.getSampleRate / factor
                  val outFmt = new javax.sound.sampled.AudioFormat(
                    outRate, 16, ch, true, false)
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.sound.sampled.AudioSystem.write(
                    new javax.sound.sampled.AudioInputStream(
                      new java.io.ByteArrayInputStream(kept.toByteArray),
                      outFmt, outFrames.toLong),
                    javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
                  Some(DecimatedAudio(id, inFrames.toLong, outFrames.toLong,
                    outRate.toLong,
                    if (nKeptSamples == 0) 0.0 else absSum.toDouble / nKeptSamples,
                    peak, bos.toByteArray))
                }
              } finally ais.close()
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        out.getOrElse(DecimatedAudio(id, -1L, -1L, -1L, -1.0, -1L, null))
      }
    }(Encoders.product[DecimatedAudio])
  }

  case class ImagePixelStats(id: Long, width: Long, height: Long,
                             mean_r: Double, mean_g: Double, mean_b: Double,
                             max_r: Long, max_g: Long, max_b: Long)

  /** REAL image CONTENT decode (pure-JVM `javax.imageio`): rasterizes
    * each image and reduces the pixels to per-channel statistics — mean
    * and max of R/G/B — in one pass with fixed-size accumulators (the
    * 100 TB shape: an image reduces to 8 numbers map-side, no shuffle,
    * no pixel buffer retained past the row). PNG/GIF/BMP are lossless,
    * so a deterministic fixture's pixel values survive the round trip
    * exactly. Undecodable bytes surface as -1 sentinels rather than
    * dropping rows. Together with [[audioPcmStats]] this retires the
    * content-decode stub for images; [[MediaCodec.decodeStub]] remains
    * only for codec-library formats (video frames). */
  def imagePixelStats(df: DataFrame, idCol: String, binCol: String): Dataset[ImagePixelStats] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val img =
          if (payload.isEmpty) null
          else
            // NonFatal, not just IOException: ImageIO plugins throw
            // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds,
            // NegativeArraySize) on crafted payloads — a corrupt image
            // must yield the sentinel row, never fail the task
            try Multimodal.imageIoRead(payload)
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ImagePixelStats(id, -1L, -1L, -1.0, -1.0, -1.0, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var mr = 0L; var mg = 0L; var mb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val cr = (rgb >> 16) & 0xff; val cg = (rgb >> 8) & 0xff; val cb = rgb & 0xff
              sr += cr; sg += cg; sb += cb
              if (cr > mr) mr = cr; if (cg > mg) mg = cg; if (cb > mb) mb = cb
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImagePixelStats(id, w.toLong, h.toLong,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, mr, mg, mb)
        }
      }
    }(Encoders.product[ImagePixelStats])
  }

  case class ResizedImage(id: Long, width: Long, height: Long,
                          target_w: Long, target_h: Long,
                          mean_r: Double, mean_g: Double, mean_b: Double,
                          png: Array[Byte])

  /** REAL image resize (pure JVM, no codec library): decode, sample a
    * nearest-neighbor raster into a maxW×maxH bounding box (aspect
    * preserved, never upscaled, floor dims clamped to ≥1; source pixel
    * of output (x,y) is (x·w div tw, y·h div th) — integer arithmetic a
    * SQL oracle can replay), re-encode as PNG, and reduce the RESIZED
    * raster to per-channel means in the same pass. Map-side, one raster
    * in memory at a time — the thumbnail/normalize step of a multimodal
    * ingest pipeline; at 100 TB each image reduces to its resized bytes
    * + 3 numbers with no shuffle. Undecodable payloads surface as a
    * width = -1 sentinel row (NonFatal-caught, like
    * [[imagePixelStats]]) rather than failing the task. */
  def imageResize(df: DataFrame, idCol: String, binCol: String,
                  maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    require(maxW >= 1 && maxH >= 1, "bounding box must be at least 1x1")
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val img =
          if (payload.isEmpty) null
          else
            try Multimodal.imageIoRead(payload)
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ResizedImage(id, -1L, -1L, -1L, -1L, -1.0, -1.0, -1.0, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val tw = math.max(1L, math.floor(w * scale).toLong).toInt
          val th = math.max(1L, math.floor(h * scale).toLong).toInt
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < th) {
            val sy = (y.toLong * h / th).toInt
            var x = 0
            while (x < tw) {
              val sx = (x.toLong * w / tw).toInt
              val rgb = img.getRGB(sx, sy)
              out.setRGB(x, y, rgb)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          Multimodal.imageIoWrite(out, "png", bos)
          val n = tw.toLong * th
          ResizedImage(id, w.toLong, h.toLong, tw.toLong, th.toLong,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, bos.toByteArray)
        }
      }
    }(Encoders.product[ResizedImage])
  }

  /** Deterministic patterned-image fixture over any id column: each row
    * becomes a REAL encoded PNG of w×h = (1 + id%16)×(1 + id%12) whose
    * pixel (x,y) is the closed form r=(id+3x+5y)%256, g=(2id+7x+y)%256,
    * b=(5id+x+11y)%256 — so a SQL oracle can replay every pixel the
    * real decoder must recover from the bytes. PNG is lossless; the
    * round trip is exact. Map-side only; the test-harness inverse of
    * [[imagePixelStats]]. */
  def syntheticPatternImages(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = 1 + (id % 16).toInt
        val h = 1 + (id % 12).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cr = ((id + 3 * x + 5 * y) % 256).toInt
            val cg = ((2 * id + 7 * x + y) % 256).toInt
            val cb = ((5 * id + x + 11 * y) % 256).toInt
            img.setRGB(x, y, (cr << 16) | (cg << 8) | cb)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        Multimodal.imageIoWrite(img, "png", bos)
        (id, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "img")
  }

  case class AudioPcmStats(id: Long, frames: Long, mean_abs: Double,
                           peak: Long, clip_ratio: Double)

  /** REAL audio CONTENT decode (pure-JVM `javax.sound.sampled`): streams
    * the PCM payload of each WAV/AIFF/AU clip and reduces it to signal
    * statistics — frame count, mean |amplitude|, peak |amplitude|, and
    * the fraction of samples at or above `clipThreshold` (near-full-scale
    * "clipping"). Per-partition batch iteration, map-side only, and the
    * reduction is streaming (fixed-size accumulators per row, never a
    * samples array) — the 100 TB shape: a clip reduces to 4 numbers in
    * one pass, no shuffle, no buffering of decoded PCM. 16-bit signed
    * PCM in either endianness is decoded; anything else surfaces as
    * frames -1 rather than dropping the row. This retires the
    * content-decode stub for audio: [[MediaCodec.decodeStub]] remains
    * only for formats needing codec libraries this environment lacks. */
  def audioPcmStats(df: DataFrame, idCol: String, binCol: String,
                    clipThreshold: Int = 32000): Dataset[AudioPcmStats] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      val buf = new Array[Byte](8192) // reused across the partition's rows
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        decodePcm16Stats(payload, buf, clipThreshold) match {
          case Some((frames, meanAbs, peak, clip)) =>
            AudioPcmStats(id, frames, meanAbs, peak, clip)
          case None => AudioPcmStats(id, -1L, -1.0, -1L, -1.0)
        }
      }
    }(Encoders.product[AudioPcmStats])
  }

  /** One-pass PCM-16 reduction behind [[audioPcmStats]]: decode via
    * `AudioSystem.getAudioInputStream`, consume frames through a reused
    * transfer buffer, accumulate sum/peak/clip counters in Longs. */
  private def decodePcm16Stats(payload: Array[Byte], buf: Array[Byte],
                               clipThreshold: Int): Option[(Long, Double, Long, Double)] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return None
        val big = fmt.isBigEndian
        var absSum = 0L; var peak = 0L; var clipped = 0L; var nSamples = 0L
        var carry = -1 // odd trailing byte of the previous read, else -1
        var n = ais.read(buf)
        while (n > 0) {
          var i = 0
          if (carry >= 0 && n >= 1) {
            val s = if (big) (carry << 8) | (buf(0) & 0xff)
                    else (buf(0) << 8) | carry
            val a = math.abs(s.toShort.toLong)
            absSum += a; if (a > peak) peak = a
            if (a >= clipThreshold) clipped += 1
            nSamples += 1; i = 1; carry = -1
          }
          while (i + 1 < n) {
            val s = if (big) (buf(i) << 8) | (buf(i + 1) & 0xff)
                    else (buf(i + 1) << 8) | (buf(i) & 0xff)
            val a = math.abs(s.toShort.toLong)
            absSum += a; if (a > peak) peak = a
            if (a >= clipThreshold) clipped += 1
            nSamples += 1; i += 2
          }
          if (i < n) carry = buf(i) & 0xff
          n = ais.read(buf)
        }
        if (nSamples == 0) Some((0L, 0.0, 0L, 0.0))
        else Some((nSamples / fmt.getChannels, absSum.toDouble / nSamples,
          peak, clipped.toDouble / nSamples))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  case class VideoMeta(id: Long, brand: String, duration_ms: Long,
                       width: Long, height: Long, byte_len: Long)

  /** REAL video-metadata extraction over a binary column: per-partition
    * batch iteration, ISO-BMFF header-only parse (no mdat read, no
    * shuffle). Unrecognized bytes surface as brand "unknown" with -1
    * fields rather than dropping rows. */
  def videoMeta(df: DataFrame, idCol: String, binCol: String): Dataset[VideoMeta] = {
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        MediaCodec.decodeVideoHeader(payload) match {
          case Some((brand, ts, dur, w, h)) =>
            VideoMeta(id, brand, Math.floorDiv(dur * 1000L, ts),
              w.toLong, h.toLong, payload.length.toLong)
          case None => VideoMeta(id, "unknown", -1L, -1L, -1L, payload.length.toLong)
        }
      }
    }(Encoders.product[VideoMeta])
  }

  /** Deterministic video fixture over any id column: each row becomes a
    * REAL minimal MP4 whose brand/duration/dimensions are a closed form
    * of the id — the SQL oracle predicts what the real box parser must
    * recover from the bytes. Map-side only; the test-harness inverse of
    * [[videoMeta]]. */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val ticks = 600L + id % 9000
        val w = 160 + (id % 8).toInt * 80
        val h = 90 + (id % 8).toInt * 45
        (id, MediaCodec.encodeMp4(brand, 600, ticks, w, h))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "mp4")
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

  case class VideoFrameStats(id: Long, frame: Long, width: Long, height: Long,
                             mean_r: Double, mean_g: Double, mean_b: Double,
                             max_r: Long, max_g: Long, max_b: Long)

  /** REAL video FRAME content decode for MJPEG-class AVIs (pure JVM):
    * walks the RIFF/AVI container to the 'movi' frame chunks
    * ([[MediaCodec.decodeAviFrames]]) and decodes each frame with
    * ImageIO — JPEG ('MJPG') and PNG ('MPNG') frame payloads need no
    * codec library — reducing every frame to per-channel raster
    * statistics in one pass. Streaming shape: one frame raster in memory
    * at a time, fixed-size accumulators, map-side only — a video reduces
    * to #frames × 10 numbers with no shuffle. Malformed containers (or
    * frame payloads ImageIO rejects) surface as a frame = -1 sentinel
    * row rather than dropping the id. This narrows
    * [[MediaCodec.decodeStub]] to codec-library formats (H.264/VP9/AV1):
    * container-parseable video is now content-decoded for real, like
    * images (q72) and audio (q71) before it. */
  def videoFrameStats(df: DataFrame, idCol: String, binCol: String): Dataset[VideoFrameStats] =
    videoFrameSample(df, idCol, binCol, stride = 1)

  /** Strided REAL frame sampling — [[videoFrameStats]] decoding only
    * every `stride`-th frame (by container frame index, which the
    * emitted rows carry). Skipped frames are never rasterized: the RIFF
    * walk touches every chunk header, but ImageIO cost — the dominant
    * term — scales with SAMPLED frames only. This retires the
    * metadata-only [[frameSamplePlan]] shape for container-parseable
    * video: the fan-out is real decoded frames now. */
  def videoFrameSample(df: DataFrame, idCol: String, binCol: String,
                       stride: Int): Dataset[VideoFrameStats] = {
    require(stride >= 1, "stride must be at least 1")
    val src = df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val bad = VideoFrameStats(id, -1L, -1L, -1L, -1.0, -1.0, -1.0, -1L, -1L, -1L)
        MediaCodec.decodeAviFrames(payload) match {
          case None => Iterator.single(bad)
          case Some(frames) if frames.isEmpty => Iterator.single(bad)
          case Some(frames) =>
            frames.iterator.zipWithIndex
              .filter { case (_, i) => i % stride == 0 }
              .map { case (bytes, i) =>
              val img =
                // NonFatal (see imagePixelStats): a crafted frame payload
                // must produce the frame = -1 sentinel, not a task failure
                try Multimodal.imageIoRead(bytes)
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) bad
              else {
                val w = img.getWidth; val h = img.getHeight
                var sr = 0L; var sg = 0L; var sb = 0L
                var mr = 0L; var mg = 0L; var mb = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    val cr = (rgb >> 16) & 0xff; val cg = (rgb >> 8) & 0xff
                    val cb = rgb & 0xff
                    sr += cr; sg += cg; sb += cb
                    if (cr > mr) mr = cr; if (cg > mg) mg = cg; if (cb > mb) mb = cb
                    x += 1
                  }
                  y += 1
                }
                val n = w.toLong * h
                VideoFrameStats(id, i.toLong, w.toLong, h.toLong,
                  sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, mr, mg, mb)
              }
            }
        }
      }
    }(Encoders.product[VideoFrameStats])
  }

  /** Deterministic MPNG-in-AVI fixture over any id column: each row
    * becomes a REAL RIFF/AVI container whose 1 + id%3 frames are PNG
    * rasters of the q72 pixel pattern keyed by pid = 4·id + frame
    * (dims (1 + pid%16) × (1 + pid%12), pixel (x,y) closed-form in
    * (pid,x,y)) — PNG is lossless, so a SQL oracle replays every pixel
    * of every frame the real decoder must recover from the container.
    * Map-side only; the test-harness inverse of [[videoFrameStats]]. */
  def syntheticPatternAvis(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("id"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val frames = (0 until (1 + (id % 3)).toInt).map { f =>
          val pid = 4 * id + f
          val w = 1 + (pid % 16).toInt
          val h = 1 + (pid % 12).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cr = ((pid + 3 * x + 5 * y) % 256).toInt
              val cg = ((2 * pid + 7 * x + y) % 256).toInt
              val cb = ((5 * pid + x + 11 * y) % 256).toInt
              img.setRGB(x, y, (cr << 16) | (cg << 8) | cb)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          Multimodal.imageIoWrite(img, "png", bos)
          bos.toByteArray
        }
        val w0 = 1 + ((4 * id) % 16).toInt
        val h0 = 1 + ((4 * id) % 12).toInt
        (id, MediaCodec.encodeAvi("MPNG", w0, h0, 25, frames))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "avi")
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

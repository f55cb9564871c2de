package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside. The Spark-side machinery —
  * schema, partition-friendly batch iteration, deterministic output shape —
  * is real and tested; the actual codec call is STUBBED (no image/audio
  * libraries in this environment) behind [[MediaCodec.decodeStub]], which
  * derives deterministic fake dimensions from the payload. Swap
  * `decodeStub` for a real codec (JavaCPP/FFmpeg etc.) without touching
  * the pipeline shape.
  */
object Multimodal {

  case class MediaMeta(id: Long, byte_len: Long, kind: String, width: Long, height: Long)

  object MediaCodec {
    /** STUB: a real implementation would parse the container header.
      * Deterministic fake: dimensions derived from payload length, kind
      * from a length mod — keeps tests and oracles reproducible. */
    def decodeStub(payload: Array[Byte]): (String, Long, Long) = {
      val len = payload.length.toLong
      val kind = (len % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      (kind, len % 640, len % 480)
    }
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

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-wise.
  *
  * The Spark-side architecture here is the real thing — schema, typed
  * Dataset, `mapPartitions` with one "codec" instantiation per partition and
  * iterator streaming (no driver collect, no per-row codec setup) — while the
  * codec itself is a clearly-marked deterministic STUB (this container has no
  * image/audio libraries). Swapping `StubCodec` for a JNI/FFmpeg/JPEG
  * implementation changes no query, no schema, no partitioning.
  *
  * At 100 TB: assets live in parquet/iceberg with the binary column; feature
  * extraction is embarrassingly parallel, bounded by
  * `spark.sql.files.maxPartitionBytes`; the per-partition codec amortizes
  * model/codec load the same way a Pandas-UDF batch would in PySpark.
  */
object MediaOps {

  val FeatureDim = 16

  case class MediaMeta(format: String, width: Int, height: Int,
                       durationMs: Long)
  case class MediaAsset(asset_id: Long, kind: String, content: Array[Byte],
                        meta: MediaMeta)
  case class MediaFeatures(asset_id: Long, kind: String, feat_dim: Int,
                           features: Array[Float], norm: Double)
  case class MediaFrame(asset_id: Long, frame_idx: Int, frame_bytes: Int,
                        checksum: Long)

  /** STUB CODEC — deterministic stand-in for image/audio decoding.
    * A real deployment implements this trait over libjpeg/FFmpeg/etc.; the
    * stub "decodes" a byte payload into a 16-bin byte-value histogram
    * (normalized), which has the same shape and determinism as a real
    * feature extractor. Instantiated once per partition by design.
    */
  trait MediaCodec {
    def features(content: Array[Byte]): Array[Float]
    def sampleFrames(content: Array[Byte], frameSize: Int): Iterator[Array[Byte]]
  }

  final class StubCodec extends MediaCodec {
    override def features(content: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xFF) / FeatureDim) += 1f
        i += 1
      }
      if (content.length > 0) {
        var b = 0
        while (b < FeatureDim) { hist(b) /= content.length; b += 1 }
      }
      hist
    }
    // a real codec would seek keyframes; the stub chunks the payload
    override def sampleFrames(content: Array[Byte], frameSize: Int): Iterator[Array[Byte]] =
      content.grouped(frameSize)
  }

  /** The fixture has no media table, so assets are derived deterministically
    * from the documents fixture: the UTF-8 bytes of each text are the opaque
    * payload; kind/metadata derive from doc_id. Real deployments read a
    * parquet table with a true binary column — same schema from here on.
    */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val kind = kinds((id % 3).toInt)
        MediaAsset(id, kind, bytes,
          MediaMeta(format = kind match {
            case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
          }, width = 64 + (id % 8).toInt * 16, height = 64,
            durationMs = bytes.length.toLong * 10))
      }
  }

  /** Partition-wise feature extraction: ONE codec per partition, iterator
    * streaming through it (the batch shape a Pandas UDF would have).
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec: MediaCodec = new StubCodec // per-partition instantiation
      it.map { a =>
        val f = codec.features(a.content)
        var n2 = 0.0
        var i = 0
        while (i < f.length) { n2 += f(i).toDouble * f(i); i += 1 }
        MediaFeatures(a.asset_id, a.kind, f.length, f, math.sqrt(n2))
      }
    }
  }

  /** Frame sampling for video assets: explode each payload into fixed-size
    * "frames" with a rolling checksum (stub for keyframe extraction).
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameSize: Int = 256): Dataset[MediaFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      val codec: MediaCodec = new StubCodec
      it.flatMap { a =>
        codec.sampleFrames(a.content, frameSize).zipWithIndex.map {
          case (frame, idx) =>
            var ck = 7L
            var i = 0
            while (i < frame.length) { ck = (ck * 31 + (frame(i) & 0xFF)) % 1000000007L; i += 1 }
            MediaFrame(a.asset_id, idx, frame.length, ck)
        }
      }
    }
  }

  /** Query: per-kind media feature profile. */
  def mediaFeatureProfile(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assetsFromDocuments(spark, dir)).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_assets"),
        max(col("feat_dim")).as("feat_dim"),
        round(avg(col("norm")), 4).as("avg_norm"))
      .orderBy("kind")

  /** Query: frame-sampling profile over the video assets. */
  def mediaFrameProfile(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(assetsFromDocuments(spark, dir)).toDF()
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_bytes")).as("total_bytes"),
        max(col("checksum")).as("max_checksum"))
      .filter(col("asset_id") < 60)
      .orderBy("asset_id")
}

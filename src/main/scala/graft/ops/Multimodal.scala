package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs as a partition-local batch stage
  * (`mapPartitions` over an iterator — the Scala analog of a batched
  * mapInPandas: per-partition setup cost is amortized across the batch, and
  * nothing ever collects to the driver).
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces deterministic pseudo-features from the
  * bytes. The Spark-side plumbing — schema, partitioning, batch iteration,
  * output shape — is real and is what matters at 100 TB: media bytes stay
  * columnar-compressed in parquet, scans prune to the metadata struct
  * unless features are requested, and the decode stage parallelizes
  * per-partition with constant memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_bytes", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Build a media table from any (id, payload-string) source — used by the
    * driver-contract query to exercise the plumbing against the shared
    * `documents` table (text bytes stand in for media bytes).
    *
    * Synthetic metadata derives from md5 (not xxhash64) so the DuckDB
    * correctness oracle can recompute it: first 31 bits of the digest,
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT & 2147483647` in SQL.
    */
  private def h31(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL))

  def fromDocuments(docs: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(mime).as("mime"),
        (pmod(h31(col(payloadCol)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(h31(concat(col(payloadCol), lit("h"))), lit(1080)) + 1).cast("int").as("height"),
        pmod(h31(concat(col(payloadCol), lit("d"))), lit(600000)).as("duration_ms"),
        length(col(payloadCol)).cast("long").as("n_bytes")
      ).as("meta"))

  final case class MediaFeatures(media_id: Long, feature: Array[Float], n_frames: Int)

  /** Deterministic stand-in for a real decoder: hashes byte windows into a
    * fixed-length float feature vector. Replace the body with a codec call
    * (JNI/javacpp) in production; the batch shape stays identical.
    */
  private[ops] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      out(d) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    val norm = math.max(1, bytes.length / dim)
    while (d < dim) { out(d) /= norm; d += 1 }
    out
  }

  /** Partition-local batched feature extraction. `???`-free by design: the
    * stub is deterministic so the stage is testable end-to-end.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "content", "meta.duration_ms").mapPartitions { rows =>
      // per-partition decoder setup would go here (codec init, model load)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val frames = math.max(1, (r.getAs[Long]("duration_ms") / 40000L).toInt)
        MediaFeatures(r.getLong(0), decodeStub(bytes, dim), frames)
      }
    }
  }

  /** Frame-sampling stub: pick `n` deterministic byte-offset "frames". */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.select(col("media_id"),
      transform(sequence(lit(0), lit(n - 1)),
        i => pmod(xxhash64(col("media_id"), i), greatest(col("meta.n_bytes"), lit(1))))
        .as("frame_offsets"))

  /** Resize stub: metadata-only transform (a real impl rewrites content). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      lit(w).as("width"), lit(h).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.n_bytes").as("n_bytes")))
}

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
  * IMAGE and AUDIO decode are REAL, JDK-only: `javax.imageio` decodes
  * PNG/JPEG/BMP/GIF to pixels ([[decodeLumaGrid]] → luma-plane features
  * and pixel pHash), `javax.sound.sampled` decodes WAV/AIFF to PCM
  * ([[decodeAudioPcm]] → windowed energy/zero-crossing features and the
  * envelope fingerprint). Container-invariance (PNG == BMP of the same
  * pixels; WAV == AIFF of the same PCM) is ScalaTest-gated for both.
  * VIDEO and compressed-audio codecs are not in the JDK and stay stubbed:
  * `decodeStub` produces deterministic pseudo-features from the bytes,
  * and every non-decodable payload falls back to the byte tier, so the
  * pipeline is total. The Spark-side plumbing — schema, partitioning,
  * batch iteration, output shape — is identical for both tiers and is
  * what matters at 100 TB: media bytes stay columnar-compressed in
  * parquet, scans prune to the metadata struct unless features are
  * requested, and the decode stage parallelizes per-partition with
  * constant memory.
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

  /** Real image decode via `javax.imageio` (ships in the JDK — PNG, JPEG,
    * BMP, GIF need no external dependency): returns the `grid`×`grid`
    * block-average luma plane (0-255 ints, row-major), or None when the
    * bytes are not a decodable image (text payloads, truncated files,
    * unsupported codecs). Integer luma: (299·R + 587·G + 114·B) / 1000,
    * block sums accumulated exactly then divided by the block pixel count,
    * so two lossless encodings of the same pixels (PNG vs BMP) produce
    * identical grids — that invariance is what makes decoded pHash a real
    * cross-container near-dup signal, and it is ScalaTest-gated.
    *
    * This is deliberately an iterator-stage helper, not a Catalyst
    * expression: codec calls are opaque JVM library invocations with
    * per-call setup cost, exactly what the `mapPartitions` batching in
    * [[extractFeatures]]/[[pHashDecoded]] amortizes. Audio/video codecs
    * slot into the same batch shape behind [[decodeStub]].
    */
  private[graft] def decodeLumaGrid(bytes: Array[Byte], grid: Int): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) return None
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val gy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        val gx = math.min(grid - 1, x * grid / w)
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sums(gy * grid + gx) += luma
        counts(gy * grid + gx) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](grid * grid)
    var i = 0
    while (i < out.length) {
      out(i) = if (counts(i) == 0) 0 else (sums(i) / counts(i)).toInt
      i += 1
    }
    Some(out)
  }

  /** Real audio decode via `javax.sound.sampled` (JDK-resident like
    * ImageIO — WAV and AIFF need no external dependency): returns the
    * mono PCM samples as 16-bit ints, or None when the bytes are not a
    * decodable audio container (text, truncated files, compressed codecs
    * the JDK lacks). Channels downmix by integer average; 8-bit samples
    * upscale to 16-bit range. Two containers of the same PCM (WAV vs
    * AIFF, different endianness on disk) decode to identical samples —
    * the container-invariance that makes the audio fingerprint a real
    * cross-container near-dup signal (ScalaTest-gated, same law as the
    * PNG == BMP image gate).
    */
  private[graft] def decodeAudioPcm(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.length < 12) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      if (bits != 8 && bits != 16) return None
      val raw = in.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      if (frameBytes == 0) return None
      val nFrames = raw.length / frameBytes
      val out = new Array[Int](nFrames)
      val big = fmt.isBigEndian
      val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      var f = 0
      while (f < nFrames) {
        var acc = 0
        var c = 0
        while (c < ch) {
          val off = f * frameBytes + c * bytesPerSample
          val s =
            if (bits == 16) {
              val lo = raw(off + (if (big) 1 else 0)) & 0xff
              val hi = raw(off + (if (big) 0 else 1))
              (hi << 8) | lo
            } else {
              // 8-bit audio is conventionally unsigned; center then widen
              val v = if (signed) raw(off).toInt else (raw(off) & 0xff) - 128
              v << 8
            }
          acc += s
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      Some(out)
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** Windowed audio features over decoded PCM: one row per fixed-length
    * sample window — integer RMS energy proxy (mean |sample|, exact
    * integer division) and zero-crossing count (the classic cheap
    * speech/music/noise separator). Partition-local batched decode, same
    * stage shape as [[extractFeatures]]; non-audio payloads produce zero
    * rows (audio QA pipelines treat them via the byte-tier fingerprints
    * instead). Output: (media_id, frame, energy, zero_crossings).
    */
  def audioFeatures(media: DataFrame, windowSamples: Int = 1024,
      maxWindows: Int = 64): DataFrame = {
    require(windowSamples >= 1 && maxWindows >= 1, "window params must be >= 1")
    implicit val enc = Encoders.product[(Long, Int, Long, Int)]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        decodeAudioPcm(bytes) match {
          case None => Iterator.empty
          case Some(pcm) =>
            val nWin = math.min(maxWindows, pcm.length / windowSamples)
            (0 until nWin).iterator.map { w =>
              var i = w * windowSamples
              val end = i + windowSamples
              var absSum = 0L
              var zc = 0
              var prev = pcm(i)
              while (i < end) {
                val s = pcm(i)
                absSum += math.abs(s).toLong
                if ((s < 0 && prev >= 0) || (s >= 0 && prev < 0)) zc += 1
                prev = s
                i += 1
              }
              (r.getLong(0), w, absSum / windowSamples, zc)
            }
        }
      }
    }.toDF("media_id", "frame", "energy", "zero_crossings")
  }

  /** Decode-aware audio fingerprint: decodable audio hashes its windowed
    * energy ENVELOPE (per-window mean |sample| scaled to 0-255, reduced
    * with the same accumulate→threshold [[pHash60]] as every other media
    * tier), so two containers of the same recording collide exactly and
    * lightly-trimmed copies stay Hamming-close; everything else falls
    * back to the byte-path hash, bit-identical to [[pHash]]. Output:
    * (media_id, phash) — drop-in input to [[phashCandidates]]'s banding.
    */
  def audioFingerprint(media: DataFrame, windowSamples: Int = 1024,
      maxWindows: Int = 240): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val hash = decodeAudioPcm(bytes) match {
          case Some(pcm) if pcm.length >= windowSamples =>
            val nWin = math.min(maxWindows, pcm.length / windowSamples)
            val env = new Array[Int](nWin)
            var w = 0
            while (w < nWin) {
              var i = w * windowSamples
              val end = i + windowSamples
              var absSum = 0L
              while (i < end) { absSum += math.abs(pcm(i)).toLong; i += 1 }
              // mean |sample| in 0..32768 → scale to the 0-255 range the
              // shared reduction expects
              env(w) = ((absSum / windowSamples) / 129L).toInt
              w += 1
            }
            pHash60(env)
          case _ =>
            if (bytes == null) 0L else pHash60(bytes.map(b => b & 0xff))
        }
        (r.getLong(0), hash)
      }
    }.toDF("media_id", "phash")
  }

  /** Deterministic stand-in for a real decoder: hashes byte windows into a
    * fixed-length float feature vector. Replace the body with a codec call
    * (JNI/javacpp) in production; the batch shape stays identical.
    */
  private[graft] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
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

  /** Partition-local batched feature extraction. Bytes that decode as a
    * real image (PNG/JPEG/BMP/GIF via the JDK's ImageIO) produce the
    * block-average luma grid as the feature vector (grid side =
    * ⌊√dim⌋, zero-padded to `dim`, values scaled to [0, 1]; n_frames = 1 —
    * a decoded still is one frame regardless of synthetic metadata).
    * Anything else falls back to the deterministic byte-hash stub, which
    * keeps the driver-contract gate (text payloads) bit-stable and gives
    * un-decodable media a well-defined feature instead of an error row.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val grid = math.max(1, math.sqrt(dim.toDouble).toInt)
    media.select("media_id", "content", "meta.duration_ms").mapPartitions { rows =>
      // per-partition decoder setup would go here (codec init, model load);
      // ImageIO keeps its reader registry per-JVM so there is none today
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        decodeLumaGrid(bytes, grid) match {
          case Some(cells) =>
            val f = new Array[Float](dim)
            var i = 0
            while (i < cells.length && i < dim) { f(i) = cells(i) / 255.0f; i += 1 }
            MediaFeatures(r.getLong(0), f, 1)
          case None =>
            val frames = math.max(1, (r.getAs[Long]("duration_ms") / 40000L).toInt)
            MediaFeatures(r.getLong(0), decodeStub(bytes, dim), frames)
        }
      }
    }
  }

  /** The MediaPHashExpr accumulate→threshold reduction over any 0-255
    * integer sequence: acc(i mod 60) += v_i, bit d set iff 60·acc(d) >
    * total. Shared by the decoded-pixel path (values = luma grid cells)
    * and mirrored by the byte-path Catalyst expression (values = payload
    * bytes), so both tiers band and join identically downstream.
    */
  private[graft] def pHash60(values: Array[Int]): Long = {
    if (values == null || values.isEmpty) return 0L
    val acc = new Array[Long](60)
    var i = 0
    while (i < values.length) { acc(i % 60) += values(i).toLong; i += 1 }
    var total = 0L
    var d = 0
    while (d < 60) { total += acc(d); d += 1 }
    var hash = 0L
    d = 0
    while (d < 60) { if (60L * acc(d) > total) hash |= (1L << d); d += 1 }
    hash
  }

  /** Decode-aware perceptual hash: bytes that decode as an image hash
    * their 8×8 block-average LUMA PLANE (so the hash is a function of the
    * pixels — two lossless containers of the same image collide exactly,
    * ScalaTest-gated); everything else hashes its raw bytes with the
    * identical reduction (= [[pHash]]'s Catalyst expression, bit-for-bit).
    * Runs as a partition-local batched decode stage like
    * [[extractFeatures]] — codec work cannot be a codegen'd expression,
    * and the batching keeps it scan-adjacent with only (media_id, phash)
    * leaving the stage. Downstream banding ([[phashCandidates]]) is
    * oblivious to which tier produced each hash.
    */
  def pHashDecoded(media: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    val ds = media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val hash = decodeLumaGrid(bytes, 8) match {
          case Some(cells) => pHash60(cells)
          case None =>
            if (bytes == null) 0L
            else pHash60(bytes.map(b => b & 0xff))
        }
        (r.getLong(0), hash)
      }
    }
    ds.toDF("media_id", "phash")
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

  /** 60-bit perceptual hash per media row (integer grid-average→threshold
    * over the payload bytes — see MediaPHashExpr). A narrow zero-shuffle
    * projection: the binary column is read once in the scan stage and
    * reduced to one long. On real images this is where a DCT-pHash over
    * decoded pixels would slot in; the banding/dedup machinery downstream
    * is identical either way.
    */
  def pHash(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.text.mediaPHash(col("content")).as("phash"))

  /** Per-frame content fingerprints: up to `n` windows of `w` bytes at
    * FIXED STRIDE offsets (offset_i = i · stride, emitted only while the
    * window fits), each reduced to a 31-bit md5-derived fingerprint the
    * correctness oracle can recompute. Fixed anchoring is what makes this
    * a NEAR-dup signal: a trimmed/extended tail changes only the frames
    * it covers, the leading frames still collide (proportional sampling
    * would shift every offset on any length change). This is the
    * frame-sampling tier of video dedup: whole-payload pHash catches
    * byte-level near-dups, frame fingerprints catch shared-content pairs
    * whose containers differ. On real video the windows become decoded
    * key-frames at fixed timestamps and the fingerprint a pHash of each —
    * identical plumbing. Output: (media_id, frame, fp), ≤ n rows per
    * media.
    */
  def frameFingerprints(media: DataFrame, n: Int = 8, w: Int = 16,
      stride: Int = 64): DataFrame = {
    require(n >= 1 && w >= 1 && stride >= 1, "need n, w, stride >= 1")
    val payload = col("content").cast("string")
    media.select(col("media_id"), payload.as("__p"),
        explode(sequence(lit(0), lit(n - 1))).as("frame"))
      .filter(col("frame") * stride + w <= length(col("__p")))
      .select(col("media_id"), col("frame"),
        h31(col("__p").substr(col("frame") * stride + 1, lit(w))).as("fp"))
  }

  /** Keyframe selection over [[frameFingerprints]]: the first frame of
    * every RUN of identical consecutive fingerprints — the shot-boundary
    * reduction that turns "every frame" into "one frame per held shot"
    * before expensive downstream work (decode, embedding, captioning at
    * keyframes only: the standard video-corpus cost lever). Fingerprint
    * tier = byte-exact shot holds; near-identical-but-not-equal frames
    * belong to the DECODED tier (luma-distance thresholds over
    * [[decodeLumaGrid]] features), the same byte/decode split the whole
    * multimodal family documents.
    *
    * Scale shape: the fingerprint scan stage plus ONE window keyed by
    * media_id over frame-index order — per-media state is `n` (frame
    * count) rows of (idx, fp) scalars; payload bytes never reach the
    * exchange. Output: (media_id, keyframe, fp), keyframe = the run's
    * first frame index.
    */
  def keyframes(media: DataFrame, n: Int = 8, w: Int = 16,
      stride: Int = 64): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame"))
    frameFingerprints(media, n, w, stride)
      .withColumn("__prev", lag(col("fp"), 1).over(wd))
      .where(col("__prev").isNull || col("__prev") =!= col("fp"))
      .select(col("media_id"), col("frame").as("keyframe"), col("fp"))
  }

  /** Media pairs sharing ≥ `minShared` of their `n` frame fingerprints —
    * the set-overlap candidate join over [[frameFingerprints]]. Pairs
    * meet per (frame, fp) key (positional agreement: same content at the
    * same relative position), so the join is banded — never all-pairs —
    * and the shuffle carries (id, frame, fp) rows only. `maxBucket` caps
    * degenerate fingerprint buckets (constant/empty payloads), same as
    * every banded generator here.
    */
  def frameNearDupCandidates(media: DataFrame, n: Int = 8, w: Int = 16,
      stride: Int = 64, minShared: Int = 4, maxBucket: Int = 64): DataFrame = {
    val fps = frameFingerprints(media, n, w, stride)
    val bucketed = Dedup.capBuckets(fps, Seq("frame", "fp"), maxBucket)
    val a = bucketed.select(col("frame"), col("fp"), col("media_id").as("idA"))
    val b = bucketed.select(col("frame"), col("fp"), col("media_id").as("idB"))
    a.join(b, Seq("frame", "fp"))
      .filter(col("idA") < col("idB"))
      .groupBy("idA", "idB")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Near-duplicate media pairs with Hamming distance ≤ maxDist via 15-bit
    * banding of the 60-bit pHash (pigeonhole: every pair within distance 3
    * shares at least one of the 4 bands; larger distances are found
    * probabilistically). Only (id, phash, band, chunk) cross the band
    * exchange — payload bytes never leave the scan stage. Same `maxBucket`
    * skew guard as the text simhash/minhash paths: a degenerate chunk
    * (empty payloads → hash 0) would otherwise make one bucket quadratic
    * at corpus scale.
    */
  def phashCandidates(media: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 64): DataFrame =
    bandedHammingCandidates(pHash(media), maxDist, maxBucket)

  /** Audio near-duplicate candidate pairs: [[audioFingerprint]]'s 60-bit
    * envelope hash pushed through the same 4×15-bit band join as the image
    * path — re-encoded copies, trims, and loudness-normalized re-uploads
    * of the same recording land in shared bands (the envelope shape
    * survives those edits; true different recordings don't collide within
    * `maxDist`). Same scale shape as [[phashCandidates]]: banding bounds
    * the join, `maxBucket` caps degenerate bands (silence-heavy corpora
    * hash alike — the cap is the skew guard there), Hamming filters before
    * the pair-dedup exchange.
    */
  def audioNearDupCandidates(media: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 64, windowSamples: Int = 1024,
      maxWindows: Int = 240): DataFrame =
    bandedHammingCandidates(
      audioFingerprint(media, windowSamples, maxWindows), maxDist, maxBucket)

  /** Shared candidate join over any (media_id, phash) 60-bit fingerprint
    * frame: 4 bands × 15 bits — a pair within Hamming distance 3 shares at
    * least one intact band (pigeonhole), so the equi-join on (band, chunk)
    * is candidate-complete for maxDist <= 3.
    */
  private def bandedHammingCandidates(fp: DataFrame, maxDist: Int,
      maxBucket: Int): DataFrame = {
    val banded0 = fp.select(col("media_id"), col("phash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("phash"), (lit(15) * b).cast("int"))
          .bitwiseAND(lit(0x7fffL)))).as(Seq("band", "chunk")))
    val banded = Dedup.capBuckets(banded0, Seq("band", "chunk"), maxBucket)
    val a = banded.select(col("band"), col("chunk"), col("media_id").as("idA"), col("phash").as("fpA"))
    val b = banded.select(col("band"), col("chunk"), col("media_id").as("idB"), col("phash").as("fpB"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("fpA").bitwiseXOR(col("fpB"))).as("hamming"))
      // hamming is a pure function of the pair: filtering BEFORE the
      // dedup exchange discards band-collision false positives in the
      // join stage instead of shuffling them
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("idA", "idB")
  }
}

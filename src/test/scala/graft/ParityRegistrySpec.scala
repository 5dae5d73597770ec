package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.RowLocal

/** The row-local streaming-parity law, registry-driven (round-6 upgrade of
  * the three hand-picked StreamingSpec parity tests): every `graft.ops`
  * method returning DataFrame or Column is either registered in
  * [[RowLocal.transforms]] — and then PROVEN batch==stream over a
  * MemoryStream here — or explicitly exempted with its boundary reason.
  * Reflection enumerates the surface, so a future operator that skips
  * classification fails the completeness gate by name.
  */
class ParityRegistrySpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val opsObjects: Seq[(String, AnyRef)] = Seq(
    "Bpe" -> graft.ops.Bpe,
    "Classifier" -> graft.ops.Classifier,
    "Curation" -> graft.ops.Curation,
    "Dedup" -> graft.ops.Dedup,
    "Embeddings" -> graft.ops.Embeddings,
    "EvalMetrics" -> graft.ops.EvalMetrics,
    "Fuzzy" -> graft.ops.Fuzzy,
    "Graph" -> graft.ops.Graph,
    "Lm" -> graft.ops.Lm,
    "Multimodal" -> graft.ops.Multimodal,
    "Pipelines" -> graft.ops.Pipelines,
    "Profile" -> graft.ops.Profile,
    "Search" -> graft.ops.Search,
    "Similarity" -> graft.ops.Similarity,
    "Skew" -> graft.ops.Skew,
    "Tables" -> graft.ops.Tables,
    "Temporal" -> graft.ops.Temporal,
    "TextAnalysis" -> graft.ops.TextAnalysis,
    "Web" -> graft.ops.Web)

  /** The classification domain: public declared methods returning
    * Dataset (DataFrame) or Column — the operator surface. `$`-names are
    * compiler artifacts (default-arg suppliers, lambdas), not operators.
    */
  private def surface: Set[String] = opsObjects.flatMap { case (name, obj) =>
    obj.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(m => m.isSynthetic || m.isBridge || m.getName.contains("$"))
      .filter(m =>
        classOf[org.apache.spark.sql.Dataset[_]].isAssignableFrom(m.getReturnType) ||
        classOf[org.apache.spark.sql.Column].isAssignableFrom(m.getReturnType))
      .map(m => s"$name.${m.getName}")
  }.toSet

  test("completeness: every ops DataFrame/Column method is registered row-local or exempt with a reason") {
    val registered = RowLocal.transforms.map(_._1).toSet
    val exempt = RowLocal.exempt.keySet
    val dup = registered.intersect(exempt)
    assert(dup.isEmpty, s"both registered and exempt: ${dup.toSeq.sorted}")
    val s = surface
    val unclassified = (s -- registered -- exempt).toSeq.sorted
    val stale = ((registered ++ exempt) -- s).toSeq.sorted
    assert(unclassified.isEmpty,
      s"unclassified ops methods (register in RowLocal.transforms or exempt with a reason):\n  ${unclassified.mkString("\n  ")}")
    assert(stale.isEmpty,
      s"stale RowLocal entries (no such ops method):\n  ${stale.mkString("\n  ")}")
    RowLocal.exempt.foreach { case (k, v) =>
      assert(v.trim.nonEmpty, s"exempt entry $k needs a reason")
    }
  }

  // ---- the parity law: every registered transform is batch==stream ------

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 101) % 256) << 16 | ((x * 13) % 256) << 8 | (y * 7) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png writer in JDK")
    bos.toByteArray
  }

  private def wavBytes(n: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val raw = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s: Short = (if ((i / 8) % 2 == 0) 900 else -900).toShort
      raw(2 * i) = s.toByte; raw(2 * i + 1) = (s >> 8).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The standard parity rows (see RowLocal's input contract): anchor tags
    * for link extraction, repeated words for dedup/quality paths, an empty
    * text, a real PNG, a real WAV, and undecodable text bytes.
    */
  private def parityRows: Seq[(Long, String, String, Array[Byte], Seq[Double])] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog. the quick brown fox returns!",
      "https://ex1.example.com/a/b?x=1&utm_source=t",
      pngBytes(8, 8), Seq(1.0, 2.0, -3.0, 0.5)),
    (2L, "alpha beta gamma delta epsilon zeta eta theta alpha beta",
      "HTTP://WWW.ex2.example.com:80/path/index.html#frag",
      wavBytes(512), Seq(0.0, 0.0, 0.0, 0.0)),
    (3L, "Visit <a href=\"/docs/1\">docs</a> and <a href=\"https://other.example.org/x\">x</a>.\nline two here\nline two here",
      "https://sub.ex3.example.com/",
      "not media at all".getBytes("UTF-8"), Seq(-1.5, 4.0, 2.25, 9.0)),
    (4L, "", "https://ex1.example.com/a/c",
      pngBytes(5, 3), Seq(7.0, 7.0, 7.0, 7.0)),
    (5L, "val x = 1;\nif (x > 0) { return x; } // code-ish\nemail me at a@b.co",
      "https://ex4.example.net/item/42/rev/deadbeefcafe1234",
      wavBytes(300), Seq(0.25, -0.25, 0.125, -0.125)))

  /** Deterministic row rendering: Array[Byte] (and nested arrays/rows/maps)
    * stringify by CONTENT — Row.toString prints byte arrays as identity
    * hashes, which can never compare equal across two runs.
    */
  private def canon(v: Any): String = v match {
    case null => "<null>"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case r: org.apache.spark.sql.Row => r.toSeq.map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "->" + canon(x) }.sorted.mkString("{", ",", "}")
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case x => x.toString
  }

  test("parity law: every registered row-local transform emits identical rows on batch and MemoryStream") {
    val rows = parityRows
    val batchDf = rows.toDF("doc_id", "text", "url", "content", "vec")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    RowLocal.transforms.zipWithIndex.foreach { case ((name, f), i) =>
      val batch = f(batchDf).collect().map(canon).sorted.toSeq
      val input = MemoryStream[(Long, String, String, Array[Byte], Seq[Double])](spark, 1)
      val sdf = input.toDF().toDF("doc_id", "text", "url", "content", "vec")
      val qn = s"rowlocal_$i"
      try {
        val q = f(sdf).writeStream.format("memory").queryName(qn)
          .outputMode("append").start()
        try {
          input.addData(rows: _*)
          q.processAllAvailable()
          val streamed = spark.table(qn).collect().map(canon).sorted.toSeq
          if (streamed != batch)
            failures += s"$name: stream(${streamed.size}) != batch(${batch.size})\n  stream: ${streamed.take(3).mkString(" | ")}\n  batch:  ${batch.take(3).mkString(" | ")}"
          else if (batch.isEmpty)
            failures += s"$name: parity holds but the transform emitted ZERO rows on the standard frame — weak exercise, enrich parityRows or the adapter"
        } finally q.stop()
      } catch {
        case e: Throwable =>
          failures += s"$name: streaming run failed — ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(2).mkString(" ")}"
      }
      spark.sql(s"DROP VIEW IF EXISTS $qn")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

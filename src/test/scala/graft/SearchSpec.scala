package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Search

/** Gates for BM25 search. The integer posting layer has the DuckDB oracle
  * (ns_bm25); the ln-based score/ranking is pinned here by an exact
  * driver-side replay.
  */
class SearchSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Plain-Scala BM25 replay over the same tokenization. */
  private def replay(corpus: Seq[(Long, String)], terms: Seq[String],
      k1: Double, b: Double): Map[Long, Double] = {
    val docs = corpus.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val dfs = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    docs.flatMap { case (id, ts) =>
      val score = terms.map { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val df = dfs(term).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.size / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }.toMap
  }

  test("bm25 ranking matches a driver-side replay on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 200).select("doc_id", "text")
    val local = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    // pick query terms that actually occur: two frequent tokens + one rare
    val freq = local.flatMap(_._2.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    val terms = Seq(freq.head._1, freq(5)._1, freq.last._1)

    val got = Search.bm25(docs, "text", "doc_id", terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = replay(local, terms, k1 = 1.2, b = 0.75)

    // same ranking: replay's top-20 (score desc, id asc) equals Spark's
    val wantTop = want.toSeq.sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq == wantTop)
    // and scores agree to float noise
    got.foreach { case (id, _, s) =>
      assert(math.abs(s - want(id)) < 1e-9, s"doc $id: $s vs ${want(id)}")
    }
  }

  test("bm25 prefers docs matching more query terms and higher tf") {
    val docs = Seq(
      (1L, "apple banana cherry date egg fig"),
      (2L, "apple apple apple date egg fig"),
      (3L, "apple banana zebra yak xray walrus"),
      (4L, "zebra yak xray walrus vole umbra")).toDF("doc_id", "text")
    val top = Search.bm25(docs, "text", "doc_id", Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 4 matches nothing → absent; docs 1,3 match both terms
    assert(!top.map(_._1).contains(4L))
    assert(top.filter(r => r._1 == 1L || r._1 == 3L).forall(_._2 == 2))
    // two-term matches outrank the single-term doc 2 (idf of banana counts)
    val order = top.map(_._1).toSeq
    assert(order.indexOf(1L) < order.indexOf(2L))
  }

  test("termPostings counts tf and dl exactly; query terms are lowercased") {
    val docs = Seq((1L, "A a b  c"), (2L, "b b b")).toDF("doc_id", "text")
    val got = Search.termPostings(docs, "text", "doc_id", Seq("A", "b"))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getInt(1))).toSet
    assert(got == Set((1L, "a", 2L, 4), (1L, "b", 1L, 4), (2L, "b", 3L, 3)))
  }
}

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

  test("tfTopK ranks by matched-term coverage, then total tf, then id") {
    val docs = Seq(
      (1L, "x y"),            // 2 terms, tf 2
      (2L, "x x x"),          // 1 term, tf 3
      (3L, "x y x"),          // 2 terms, tf 3 — best
      (4L, "z z z")).toDF("doc_id", "text")
    val got = Search.tfTopK(docs, "text", "doc_id", Seq("x", "y"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(3L -> 1, 1L -> 2, 2L -> 3), s"got $got")
  }

  test("rrfFuse: single list preserves order; integer contributions fuse exactly") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val single = Search.rrfFuse(Seq(a), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(single == Map(10L -> 1, 11L -> 2, 12L -> 3))
    val b = Seq((12L, 1), (10L, 2), (99L, 3)).toDF("id", "rank")
    val fused = Search.rrfFuse(Seq(a, b), k = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // integer-exact contributions: 10 at ranks (1,2) → 1e9/61 + 1e9/62
    // beats 12 at ranks (3,1) → 1e9/63 + 1e9/61
    assert(fused(10L)._2 == 1000000000L / 61 + 1000000000L / 62)
    assert(fused(12L)._2 == 1000000000L / 63 + 1000000000L / 61)
    assert(fused(10L)._3 == 1 && fused(10L)._1 == 2)
    assert(fused(12L)._3 == 2)
    assert(fused(99L)._1 == 1, "single-list doc carries one contribution")
  }

  test("hybridTopK fuses bm25 and vector neighbors deterministically on real data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val qv = e.filter(col("id") === 0).select("vec").head().getSeq[Double](0).toArray
    val run1 = Search.hybridTopK(docs, "text", "doc_id", Seq("join", "filter"),
      e, qv, k = 10, kCand = 50).collect().map(r => (r.getLong(0), r.getInt(3))).toSeq
    val run2 = Search.hybridTopK(docs, "text", "doc_id", Seq("join", "filter"),
      e, qv, k = 10, kCand = 50).collect().map(r => (r.getLong(0), r.getInt(3))).toSeq
    assert(run1 == run2, "hybrid ranking must be deterministic")
    assert(run1.size == 10 && run1.map(_._2).sorted == (1 to 10))
    // vec 0 is its own nearest neighbor (rank 1 on the vector side) and
    // must appear in the fused list
    assert(run1.exists(_._1 == 0L), "the query's own vector must fuse into the top-k")
  }

  test("rankingMetrics: recall@k, first-hit rank and MRR on hand-checked rankings") {
    // q1: 2 relevant, one at rank 1 and one at rank 7 (outside k=5)
    // q2: 1 relevant, found at rank 3
    // q3: 1 relevant, never retrieved
    // q4: relevant but appears only in truth with no predicted rows at all
    val predicted = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 7),
      (2L, 20L, 1), (2L, 21L, 3),
      (3L, 30L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val truth = Seq(
      (1L, 10L), (1L, 12L),
      (2L, 21L),
      (3L, 99L),
      (4L, 40L)
    ).toDF("query_id", "doc_id")
    val m = Search.rankingMetrics(predicted, truth, k = 5)
      .orderBy("query_id").collect()
    // (query_id, n_relevant, hits_at_k, recall_at_k_permille, first_hit_rank, rr_micro)
    assert(m(0).toSeq == Seq(1L, 2L, 1L, 500L, 1, 1000000L))
    assert(m(1).toSeq == Seq(2L, 1L, 1L, 1000L, 3, 333333L))
    assert(m(2).getLong(1) == 1L && m(2).getLong(2) == 0L &&
      m(2).getLong(3) == 0L && m(2).isNullAt(4) && m(2).getLong(5) == 0L)
    assert(m(3).getLong(2) == 0L && m(3).getLong(5) == 0L,
      "query absent from predictions scores zero, not error")
    // duplicate truth rows must not double-count
    val dup = Search.rankingMetrics(predicted,
      truth.union(truth), k = 5).orderBy("query_id").collect()
    assert(dup(0).getLong(1) == 2L)
  }

  test("bm25Indexed equals the corpus-scan bm25; add == build-on-union; save/load round-trips") {
    val corpus = Seq(
      (1L, "spark join filter join"),
      (2L, "filter filter filter words here"),
      (3L, "spark spark spark spark join"),
      (4L, "completely unrelated text body"),
      (5L, "join")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val idx = Search.buildBm25Index(corpus, "text", "doc_id")
    for (terms <- Seq(Seq("join", "spark"), Seq("filter"), Seq("join", "filter", "spark"))) {
      val scan = rows(Search.bm25(corpus, "text", "doc_id", terms, k = 5))
      val indexed = rows(Search.bm25Indexed(idx, terms, k = 5))
      assert(indexed == scan, s"terms=$terms")
    }
    // incremental append equals rebuilding on the union
    val delta = Seq((6L, "spark filter"), (7L, "noise")).toDF("doc_id", "text")
    val added = Search.addToBm25Index(idx, delta, "text", "doc_id")
    val rebuilt = Search.buildBm25Index(corpus.unionAll(delta), "text", "doc_id")
    assert(added.nDocs == rebuilt.nDocs && added.dlSum == rebuilt.dlSum)
    assert(rows(Search.bm25Indexed(added, Seq("spark", "filter"), 7)) ==
      rows(Search.bm25Indexed(rebuilt, Seq("spark", "filter"), 7)))
    // persistence round-trip
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Search.saveBm25Index(added, dir, shards = 4)
    val loaded = Search.loadBm25Index(spark, dir)
    assert(rows(Search.bm25Indexed(loaded, Seq("join", "spark"), 7)) ==
      rows(Search.bm25Indexed(added, Seq("join", "spark"), 7)))
  }

  test("rankAgreement: overlap at each depth against hand-built rankings") {
    val a = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L),
      ("q2", "x", 1L), ("q2", "y", 2L), ("q2", "z", 3L))
      .toDF("q", "item", "rk")
    val b = Seq(
      ("q1", "a", 1L), ("q1", "c", 2L), ("q1", "d", 3L),
      ("q2", "y", 1L), ("q2", "x", 2L), ("q2", "w", 3L))
      .toDF("q", "item", "rk")
    val out = graft.ops.Search.rankAgreement(a, b, "q", "item", "rk", Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // d=1: only q1's 'a' sits in both top-1 -> 1/(2*1) = 500
    assert(out(1L) == ((2L, 1L, 500L)))
    // d=2: q1 {a}, q2 {x,y} -> 3/(2*2) = 750
    assert(out(2L) == ((2L, 3L, 750L)))
    // d=3: q1 {a,c}, q2 {x,y} -> 4/(2*3) = 666
    assert(out(3L) == ((2L, 4L, 666L)))
    // identical rankings agree fully at every depth
    val self = graft.ops.Search.rankAgreement(a, a, "q", "item", "rk", Seq(1, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(self == Map(1L -> 1000L, 3L -> 1000L))
  }
}

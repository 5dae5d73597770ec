package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Lm

/** Gates for the CCNet-style LM scorer. The ln-based micronat layer is
  * engine-local (not oracle-comparable across libms), so it is pinned here
  * by an exact driver-side replay; the integer join layer has the DuckDB
  * oracle (ns_lm_score).
  */
class LmSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tok(s: String): Array[String] =
    s.trim.toLowerCase.split("\\s+")

  /** Plain-Scala stupid-backoff replay of Lm.score's micronat sum. */
  private def replay(train: Seq[String], doc: String, alpha: Double): Long = {
    val uni = train.flatMap(tok).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val big = train.map(tok).flatMap(ts => ts.sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1))).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = uni.values.sum.toDouble
    val v = uni.size.toDouble
    def uniLog(w: String): Double =
      math.log((uni.getOrElse(w, 0L) + 1.0) / (n + v + 1))
    val ts = tok(doc)
    ts.zipWithIndex.map { case (w, i) =>
      val lp =
        if (i == 0) uniLog(w)
        else big.get((ts(i - 1), w)) match {
          case Some(cb) => math.log(cb.toDouble / uni(ts(i - 1)).toDouble)
          case None => uniLog(w) + math.log(alpha)
        }
      math.round(lp * 1e6)
    }.sum
  }

  test("score micronats match a driver-side stupid-backoff replay exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val trainHalf = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val model = Lm.train(trainHalf, "text")
    val got = Lm.score(docs.filter(col("doc_id") < 20), "text", "doc_id", model)
      .select("doc_id", "score_micronats")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val trainTexts = trainHalf.select("text").collect().map(_.getString(0)).toSeq
    val scored = docs.filter(col("doc_id") < 20)
      .select("doc_id", "text").collect()
    scored.foreach { r =>
      val want = replay(trainTexts, r.getString(1), alpha = 0.4)
      assert(got(r.getLong(0)) == want,
        s"doc ${r.getLong(0)}: got ${got(r.getLong(0))}, want $want")
    }
  }

  test("in-domain text scores far better than OOV noise") {
    val train = Seq.tabulate(50)(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val model = Lm.train(train, "text")
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zxqv wvut kjih gfed cbaz yxwv utsr qpon mlkj")).toDF("doc_id", "text")
    val ppl = Lm.score(probe, "text", "doc_id", model)
      .select("doc_id", "ppl").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppl(1L) * 10 < ppl(2L),
      s"in-domain ppl ${ppl(1L)} should be far below OOV ppl ${ppl(2L)}")
    // and the OOV doc's accounting shows it: every token unseen
    val acct = Lm.score(probe, "text", "doc_id", model)
      .filter(col("doc_id") === 2).select("n_tokens", "n_oov", "n_hits").head()
    assert(acct.getLong(0) == acct.getLong(1) && acct.getLong(2) == 0)
  }

  test("first token uses the unigram path, bigram hits use MLE") {
    // training corpus: "a b" twice and "a c" once → c(a)=3, c(b)=2(? no)
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val model = Lm.train(train, "text")
    // N=6 tokens, V=3; score "a b": ln((c(a)+1)/(N+V+1)) + ln(c(a,b)/c(a))
    val want = math.round(math.log(4.0 / 10.0) * 1e6) +
      math.round(math.log(2.0 / 3.0) * 1e6)
    val got = Lm.score(Seq((9L, "a b")).toDF("doc_id", "text"), "text", "doc_id", model)
      .select("score_micronats").head().getLong(0)
    assert(got == want)
  }

  test("pplBuckets labels head/middle/tail by quantile with CCNet fractions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val model = Lm.train(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text")
    val scored = Lm.score(docs, "text", "doc_id", model)
    val buckets = Lm.pplBuckets(scored, headFrac = 0.3, middleFrac = 0.4)
      .groupBy("ppl_bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = buckets.values.sum.toDouble
    assert(buckets.keySet == Set("head", "middle", "tail"))
    assert(buckets("head") / total > 0.2 && buckets("head") / total < 0.4)
    assert(buckets("tail") / total > 0.2 && buckets("tail") / total < 0.4)
    // head really is the low-perplexity band
    val maxHead = Lm.pplBuckets(scored).filter(col("ppl_bucket") === "head")
      .agg(max("ppl")).head().getDouble(0)
    val minTail = Lm.pplBuckets(scored).filter(col("ppl_bucket") === "tail")
      .agg(min("ppl")).head().getDouble(0)
    assert(maxHead < minTail)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Web

/** Semantics tests for the URL/domain curation operators. */
class WebSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val suffixes = Seq("co.uk", "github.io")

  test("urlParts decomposes scheme/host/path/query; absent parts are empty") {
    val df = Seq(
      (1L, "https://WWW.Example.COM/a/b?x=1&y=2#frag"),
      (2L, "http://example.org"),
      (3L, "ftp://files.example.net/pub"),
      (4L, "not a url at all")
    ).toDF("id", "url")
    val out = df.select(col("id"), Web.urlParts(col("url")).as("p"))
      .select(col("id"), col("p.scheme"), col("p.host"), col("p.path"), col("p.query"))
      .orderBy("id").collect()
    assert(out(0).toSeq == Seq(1L, "https", "www.example.com", "/a/b", "x=1&y=2"))
    assert(out(1).toSeq == Seq(2L, "http", "example.org", "", ""))
    assert(out(2).toSeq == Seq(3L, "ftp", "files.example.net", "/pub", ""))
    assert(out(3).toSeq == Seq(4L, "", "", "", ""))
  }

  test("registrableDomain: PSL-lite with multi-label suffixes") {
    val hosts = Seq("deep.sub.example.co.uk", "example.co.uk", "www.example.com",
      "example.com", "localhost", "a.b.github.io").toDF("host")
    val out = hosts.select(col("host"),
      Web.registrableDomain(col("host"), suffixes).as("reg")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("deep.sub.example.co.uk") == "example.co.uk")
    assert(out("example.co.uk") == "example.co.uk")
    assert(out("www.example.com") == "example.com")
    assert(out("example.com") == "example.com")
    assert(out("localhost") == "localhost")
    assert(out("a.b.github.io") == "b.github.io")
  }

  test("domainFilter blocks every subdomain of a blocked domain, keeps the rest") {
    val df = Seq(
      (1L, "https://ads.tracker.com/x"),
      (2L, "https://tracker.com/y"),
      (3L, "https://fine.example.org/z"),
      (4L, "https://sub.deep.tracker.com/w")
    ).toDF("id", "url")
    val kept = Web.domainFilter(df, "url", blocklist = Seq("tracker.com"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    // domainTag agrees and keeps the original columns
    val tagged = Web.domainTag(df, "url", blocklist = Seq("tracker.com"))
    assert(tagged.columns.toSeq ==
      Seq("id", "url", "scheme", "host", "path", "query", "reg_domain", "blocked"))
    val byId = tagged.collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(byId == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("domainStats aggregates docs and weight per registrable domain") {
    val df = Seq(
      (1L, "https://a.x.com/1", 10L), (2L, "https://b.x.com/2", 20L),
      (3L, "https://y.org/3", 5L)
    ).toDF("id", "url", "n_tokens")
    val out = Web.domainStats(df, "url", weightCol = Some("n_tokens"))
      .orderBy("reg_domain").collect()
    assert(out.map(_.toSeq).toSeq == Seq(
      Seq("x.com", 2L, 30L), Seq("y.org", 1L, 5L)))
  }
}

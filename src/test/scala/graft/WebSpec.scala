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

  test("registrableDomainTable: real PSL subset loaded from a file, longest suffix wins") {
    // a PSL-format file exactly as published: comments, blanks, plain
    // suffixes of 1-3 labels (wildcard/exception entries are expanded
    // upstream per the scaladoc)
    val dir = java.nio.file.Files.createTempDirectory("psl").toFile
    val pslFile = new java.io.File(dir, "public_suffix_list.dat")
    val fw = new java.io.FileWriter(pslFile)
    fw.write(
      """// ===BEGIN ICANN DOMAINS===
        |// uk : https://en.wikipedia.org/wiki/.uk
        |uk
        |co.uk
        |gov.uk
        |
        |// au
        |au
        |com.au
        |
        |// jp geographic
        |jp
        |pref.aichi.jp
        |
        |// user-content namespaces
        |github.io
        |""".stripMargin)
    fw.close()
    val psl = spark.read.text(pslFile.getAbsolutePath)
      .select(trim(col("value")).as("suffix"))
      .where(col("suffix") =!= "" && !col("suffix").startsWith("//"))
    val hosts = Seq(
      "shop.Example.co.uk",     // 2-label suffix -> example.co.uk
      "example.co.uk",          // already registrable
      "co.uk",                  // IS a suffix -> pass through whole
      "deep.a.b.pref.aichi.jp", // 3-label suffix -> b.pref.aichi.jp
      "www.example.com.au",     // 2-label suffix -> example.com.au
      "user.github.io",         // private-namespace suffix -> user.github.io
      "www.example.com",        // no entry -> implicit * rule, last two
      "localhost"               // single label, no entry -> pass through
    ).toDF("host")
    val out = Web.registrableDomainTable(hosts, "host", psl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("shop.Example.co.uk") == "example.co.uk")
    assert(out("example.co.uk") == "example.co.uk")
    assert(out("co.uk") == "co.uk")
    assert(out("deep.a.b.pref.aichi.jp") == "b.pref.aichi.jp")
    assert(out("www.example.com.au") == "example.com.au")
    assert(out("user.github.io") == "user.github.io")
    assert(out("www.example.com") == "example.com")
    assert(out("localhost") == "localhost")
    // agreement law: on hosts whose suffixes are all 2-label, the table
    // tier and the literal tier produce identical groupings
    val lit2 = hosts.select(col("host"),
      Web.registrableDomain(lower(col("host")), Seq("co.uk", "com.au", "github.io")).as("r"))
      .where(!col("host").isin("co.uk", "deep.a.b.pref.aichi.jp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    lit2.foreach { case (h, r) => assert(out(h) == r, s"tier mismatch on $h") }
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
  test("canonicalUrl: case, www, default port, fragment, tracking params, param order") {
    val cases = Seq(
      // same page, three crawl variants -> one canonical form
      ("HTTP://WWW.Site.com:80/a?utm_source=x&b=1", "http://site.com/a?b=1"),
      ("http://site.com/a?b=1#section-2", "http://site.com/a?b=1"),
      ("http://site.com:8080/a?b=1", "http://site.com:8080/a?b=1"), // non-default port kept
      ("HTTPS://shop.example.ORG:443/", "https://shop.example.org/"),
      ("https://example.org", "https://example.org/"), // empty path -> /
      ("https://example.org/p?z=1&a=2&utm_campaign=c&gclid=g&m=3",
        "https://example.org/p?a=2&m=3&z=1"), // survivors sorted
      ("https://example.org/p?utm_x=1&fbclid=f", "https://example.org/p"), // all dropped -> no ?
      ("https://www.example.org/p?ref=rss", "https://example.org/p"))
    val got = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), Web.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"canonical($u)")
    }
  }

  test("canonicalUrl collapses crawl variants for exact URL dedup") {
    val docs = Seq(
      (1L, "HTTP://WWW.Site.com:80/a?utm_source=x&b=1"),
      (2L, "http://site.com/a?b=1#frag"),
      (3L, "http://site.com/a?b=2")).toDF("doc_id", "url")
      .withColumn("canon", Web.canonicalUrl(col("url")))
    // rows 1 and 2 share a canonical form; 3 differs → two dedup groups,
    // the shared group keeping the min doc_id with dup_count 2
    val groups = graft.ops.Dedup.exact(docs, "canon", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L))
  }

  test("extractLinks: positions, anchor cleanup, and every resolution rule") {
    val html =
      """<html><body>
        |<p>intro</p>
        |<A class="nav" HREF="https://ext.example.org/p?q=1">External <b>bold</b>
        |site</A>
        |<a href="//cdn.example.net/lib.js">proto relative</a>
        |<a href="/abs/path">  root   relative </a>
        |<a href="sibling.html">doc relative</a>
        |<a href="#top">skip fragment</a>
        |<a href="mailto:x@y.z">skip mail</a>
        |<a href="javascript:void(0)">skip js</a>
        |<a href="">skip empty</a>
        |<a name="anchor-without-href">not a link</a>
        |</body></html>""".stripMargin
    val docs = Seq((7L, "https://www.host.com/dir/page.html", html),
      (8L, "https://host.com/", "no links here")).toDF("doc_id", "url", "text")
    val out = Web.extractLinks(docs, "text", "url", "doc_id")
      .orderBy("doc_id", "link_pos").collect()
    // doc 8 has no anchors → contributes no rows; doc 7 keeps 4 of 8
    assert(out.map(_.getLong(0)).toSeq == Seq(7L, 7L, 7L, 7L))
    // link_pos is the pre-filter tag index (0-based over ALL matched tags)
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getString(4)).toSeq == Seq(
      "External bold site", "proto relative", "root relative", "doc relative"))
    assert(out.map(_.getString(5)).toSeq == Seq(
      "https://ext.example.org/p?q=1",
      "https://cdn.example.net/lib.js",
      "https://www.host.com/abs/path",
      "https://www.host.com/dir/sibling.html"))
  }

  test("linkEdges aggregates multiplicity and distinct source docs per domain pair") {
    val links = Seq(
      (1L, "https://a.site.com/x", "https://b.other.com/1"),
      (1L, "https://a.site.com/x", "https://c.other.com/2"),
      (2L, "https://site.com/y", "https://other.com/3"),
      (2L, "https://site.com/y", "https://site.com/internal"),
      (3L, "https://third.net/", "https://other.com/4")
    ).toDF("doc_id", "url", "abs_url")
    val out = Web.linkEdges(links, "url", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // site.com → other.com: 3 links (2 from doc 1, 1 from doc 2) over 2 docs
    assert(out(("site.com", "other.com")) == (3L, 2L))
    assert(out(("site.com", "site.com")) == (1L, 1L))   // self-edge kept
    assert(out(("third.net", "other.com")) == (1L, 1L))
    assert(out.size == 3)
  }

  test("urlTemplates law: templating is idempotent (placeholders never re-generalize)") {
    import SparkTestBase.spark.implicits._
    val urls = Seq(
      "https://a.example/product/123/rev/0123456789abcdef0123456789abcdef",
      "https://a.example/s/AbCdEfGhIjKlMnOpQr/99").toDF("url")
    val once = graft.ops.Web.urlTemplates(urls, "url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // rebuild URLs from the first pass's templates and template again:
    // {n}/{hex}/{id} are not digit/hex/16-char-url-safe runs, so they
    // survive verbatim and the row set is a fixed point
    val rebuilt = once.toSeq.map { case (h, t, _) => s"https://$h$t" }.toDF("url")
    val twice = graft.ops.Web.urlTemplates(rebuilt, "url")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(twice == once, s"once=$once twice=$twice")
  }

  test("urlTemplates: id-like segments generalize, product pages collapse to one row") {
    import SparkTestBase.spark.implicits._
    val urls = Seq(
      "https://shop.example/product/123/view",
      "https://shop.example/product/9876/view",
      "https://shop.example/product/123/rev/0123456789abcdef0123456789abcdef",
      "https://shop.example/about",                           // plain segment survives
      "https://shop.example/s/AbCdEfGhIjKlMnOpQr",            // 18-char url-safe -> {id}
      "https://other.example/product/5/view")                  // other host separate
      .toDF("url")
    val out = graft.ops.Web.urlTemplates(urls, "url").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("shop.example", "/product/{n}/view")) == 2L)
    assert(out(("shop.example", "/product/{n}/rev/{hex}")) == 1L)
    assert(out(("shop.example", "/about")) == 1L)
    assert(out(("shop.example", "/s/{id}")) == 1L)
    assert(out(("other.example", "/product/{n}/view")) == 1L)
    assert(out.size == 5)
  }
}

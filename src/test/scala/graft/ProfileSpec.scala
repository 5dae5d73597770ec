package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

class ProfileSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  test("distributionDrift: KS max vs EMD sum, empty-bucket persistence, identity = 0") {
    // all of a in bucket 0 (value 5), all of b in bucket 19 (value 595),
    // 20 buckets over [0, 600): KS = 1.0 (1e6 micro); EMD must count the
    // 18 EMPTY buckets in between where |CDF diff| stays 1 -> 19 widths
    val a = (1 to 10).map(i => (i.toLong, 5L)).toDF("id", "v")
    val b = (1 to 10).map(i => (i.toLong, 595L)).toDF("id", "v")
    val out = graft.ops.Profile.distributionDrift(a, b, "v", buckets = 20, lo = 0L, hi = 600L)
      .collect()
    assert(out.length == 20, "one row per bucket, empty buckets included")
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getLong(r0.fieldIndex("ks_micro")) == 1000000L)
    assert(r0.getLong(r0.fieldIndex("emd_micro")) == 19000000L,
      "EMD must see the 19-bucket move, not just the two occupied rows")
    assert(r0.getLong(r0.fieldIndex("share_a_permille")) == 1000L)
    // identical distributions drift 0
    val same = graft.ops.Profile.distributionDrift(a, a, "v", buckets = 20, lo = 0L, hi = 600L)
      .select("ks_micro", "emd_micro").distinct().collect()
    assert(same.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 0L)))
    // clamping: out-of-range values land in the CORRECT edge bucket —
    // including magnitudes where (v - lo) * buckets would wrap a long
    // (a raw nanosecond epoch): the wrap would land the far-out value on
    // the LOW edge, inverting the edge-mass signal
    val wild = Seq((1L, -50L), (2L, 9999L), (3L, Long.MaxValue - 5L)).toDF("id", "v")
    val cl = graft.ops.Profile.distributionDrift(wild, wild, "v", buckets = 20, lo = 0L, hi = 600L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.values.sum == 3L)
    assert(cl(0L) == 1L && cl(19L) == 2L,
      s"huge values must clamp HIGH, negatives LOW: $cl")
    // empty side: NULL statistics, never the all-clear 0
    val e = graft.ops.Profile.distributionDrift(
      a, a.where(org.apache.spark.sql.functions.lit(false)), "v", 20, 0L, 600L).head()
    assert(e.isNullAt(e.fieldIndex("ks_micro")) && e.isNullAt(e.fieldIndex("emd_micro")))
  }

  // Two groups with hand-checkable stats:
  //   g1: token counts 1,2,3,4  (p50 = rank ceil(0.5*4)=2 -> 2; p90 = rank 4 -> 4)
  //   g2: token counts 2,5      (p50 = rank 1 -> 2; p90 = rank 2 -> 5)
  private def corpus = Seq(
    (1L, "g1", "a"),
    (2L, "g1", "b b"),
    (3L, "g1", "a b c"),
    (4L, "g1", "c c d d"),
    (5L, "g2", "x y"),
    (6L, "g2", "x x y z w")
  ).toDF("id", "grp", "text")

  test("groupProfile: exact counts, vocab breadth, nearest-rank quantiles") {
    val out = Profile.groupProfile(corpus, "text", "grp")
      .orderBy("grp").collect()
    assert(out.length == 2)
    // g1: 4 docs, 1+2+3+4=10 tokens, distinct {a,b,c,d}=4
    assert(out(0).toSeq == Seq("g1", 4L, 10L, 4L, 2L, 4L))
    // g2: 2 docs, 2+5=7 tokens, distinct {x,y,z,w}=4
    assert(out(1).toSeq == Seq("g2", 2L, 7L, 4L, 2L, 5L))
  }

  test("groupProfile: custom quantile list names and values") {
    val out = Profile.groupProfile(corpus, "text", "grp", quantiles = Seq(0.25, 1.0))
      .where($"grp" === "g1").collect().head
    // rank ceil(0.25*4)=1 -> 1; rank ceil(1.0*4)=4 -> 4
    assert(out.getAs[Long]("p25_tokens") == 1L)
    assert(out.getAs[Long]("p100_tokens") == 4L)
  }

  test("groupProfileSketch matches exact tier on small data and stays close at size") {
    val exact = Profile.groupProfile(corpus, "text", "grp")
      .orderBy("grp").collect()
    val sketch = Profile.groupProfileSketch(corpus, "text", "grp")
      .orderBy("grp").collect()
    // same schema order
    assert(sketch.head.schema.fieldNames.toSeq ==
      Seq("grp", "n_docs", "total_tokens", "distinct_tokens", "p50_tokens", "p90_tokens"))
    exact.zip(sketch).foreach { case (e, sk) =>
      assert(e.getString(0) == sk.getString(0))
      assert(e.getLong(1) == sk.getLong(1)) // n_docs exact in both
      assert(e.getLong(2) == sk.getLong(2)) // total_tokens exact in both
      val ed = e.getLong(3).toDouble
      val sd = sk.getLong(3).toDouble
      assert(math.abs(sd - ed) / ed <= 0.2, s"distinct ${sd} vs ${ed}")
      // GK quantiles on tiny data return an actual element near the rank
      assert(sk.getLong(4) >= 1L && sk.getLong(4) <= 5L)
      assert(sk.getLong(5) >= 2L && sk.getLong(5) <= 5L)
    }
    // a larger synthetic corpus: 2000 docs, ~500 distinct tokens
    val big = spark.range(2000).select(
      col("id"),
      lit("g").as("grp"),
      concat_ws(" ",
        concat(lit("t"), pmod(col("id"), lit(500))),
        concat(lit("t"), pmod(col("id") * 7 + 3, lit(500))),
        concat(lit("t"), pmod(col("id") * 13 + 1, lit(500)))).as("text"))
    val eBig = Profile.groupProfile(big, "text", "grp").collect().head
    val sBig = Profile.groupProfileSketch(big, "text", "grp").collect().head
    val rel = math.abs(sBig.getLong(3).toDouble - eBig.getLong(3)) / eBig.getLong(3)
    assert(rel <= 0.1, s"HLL rel err $rel")
    assert(sBig.getLong(4) == eBig.getLong(4)) // all docs same length: quantile exact
  }

  test("both tiers reject bad quantiles identically (range and name collisions)") {
    intercept[IllegalArgumentException] {
      Profile.groupProfile(corpus, "text", "grp", quantiles = Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Profile.groupProfileSketch(corpus, "text", "grp", quantiles = Seq.empty)
    }
    // 0.995 and 1.0 both round to p100_tokens
    intercept[IllegalArgumentException] {
      Profile.groupProfile(corpus, "text", "grp", quantiles = Seq(0.995, 1.0))
    }
    intercept[IllegalArgumentException] {
      Profile.groupProfileSketch(corpus, "text", "grp", quantiles = Seq(0.995, 1.0))
    }
  }

  test("datasetCard: profile + exact dup rate + keep rate in one table") {
    // g1 has one exact duplicate pair (docs 1 and 7 share text "a")
    val withDup = corpus.union(Seq((7L, "g1", "a")).toDF("id", "grp", "text"))
      .withColumn("keep", col("id") % 2 === 0)
    val card = Profile.datasetCard(withDup, "text", "grp", keepCol = Some("keep"))
      .orderBy("grp").collect()
    assert(card.length == 2)
    val g1 = card(0)
    // (grp, n_docs, total_tokens, distinct_tokens, p50, p90,
    //  n_chars, n_distinct_docs, dup_permille, n_kept, keep_permille)
    assert(g1.getString(0) == "g1")
    assert(g1.getLong(1) == 5L, "n_docs")
    assert(g1.getLong(7) == 4L, "n_distinct_docs: dup text collapses")
    assert(g1.getLong(8) == 200L, "dup_permille = 1000*(5-4)/5")
    assert(g1.getLong(9) == 2L, "n_kept: ids 2 and 4")
    assert(g1.getLong(10) == 400L, "keep_permille = 1000*2/5")
    val g2 = card(1)
    assert(g2.getLong(8) == 0L && g2.getLong(9) == 1L)
    // without keepCol the keep columns are null, everything else identical
    val noKeep = Profile.datasetCard(withDup, "text", "grp")
      .orderBy("grp").collect()
    assert(noKeep(0).isNullAt(9) && noKeep(0).isNullAt(10))
    assert(noKeep(0).getLong(8) == 200L)
    // sketch tier: same shape, counts within HLL error on tiny data
    val sk = Profile.datasetCard(withDup, "text", "grp", keepCol = Some("keep"),
        exact = false).orderBy("grp").collect()
    assert(sk(0).getLong(1) == 5L && sk(0).getLong(9) == 2L)
    assert(math.abs(sk(0).getLong(7) - 4L) <= 1, "HLL distinct docs close on tiny data")
  }

  test("lengthHistogram: integer log2 buckets, exact counts and extremes") {
    // token counts: g1 -> 1,2,3,4 (buckets 0,1,1,2); g2 -> 2,5 (buckets 1,2)
    val h = Profile.lengthHistogram(corpus, "text", "grp")
      .orderBy("grp", "bucket").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(h.toSeq == Seq(
      ("g1", 0, 1L, 1L, 1L, 1L),
      ("g1", 1, 2L, 5L, 2L, 3L),
      ("g1", 2, 1L, 4L, 4L, 4L),
      ("g2", 1, 1L, 2L, 2L, 2L),
      ("g2", 2, 1L, 5L, 5L, 5L)))
    // power-of-two boundary is integer-exact: 8 tokens -> bucket 3, 7 -> 2
    val edge = Seq((1L, "e", (1 to 8).map(_ => "t").mkString(" ")),
      (2L, "e", (1 to 7).map(_ => "t").mkString(" "))).toDF("id", "grp", "text")
    val eb = Profile.lengthHistogram(edge, "text", "grp")
      .orderBy("bucket").collect().map(_.getInt(1)).toSeq
    assert(eb == Seq(2, 3))
  }

  test("distinctiveTerms: integer contrastive tf-idf favors group-local tokens") {
    val df = Seq(
      (1L, "g1", "apple apple apple shared"),
      (2L, "g1", "apple shared"),
      (3L, "g2", "banana shared"),
      (4L, "g2", "banana banana shared")
    ).toDF("id", "grp", "text")
    val out = graft.ops.Profile.distinctiveTerms(df, "text", "grp", "id", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .groupBy(_._1)
    // g1: apple tf=4 df=2 -> 2_000_000 beats shared tf=2 df=4 -> 500_000
    assert(out("g1").sortBy(_._6).toSeq == Seq(
      ("g1", "apple", 4L, 2L, 2000000L, 1), ("g1", "shared", 2L, 4L, 500000L, 2)))
    // g2: banana tf=3 df=2 -> 1_500_000 beats shared
    assert(out("g2").sortBy(_._6).toSeq == Seq(
      ("g2", "banana", 3L, 2L, 1500000L, 1), ("g2", "shared", 2L, 4L, 500000L, 2)))
  }

  test("heavyHitters: top-k per group with deterministic ties") {
    val out = Profile.heavyHitters(corpus, "text", "grp", 2)
      .orderBy("grp", "rank").collect()
    // g1 counts: a=2 b=3 c=3 d=2 -> top2 = b(3), c(3) (count desc, token asc)
    assert(out(0).toSeq == Seq("g1", "b", 3L, 1L))
    assert(out(1).toSeq == Seq("g1", "c", 3L, 2L))
    // g2 counts: x=3 y=2 z=1 w=1 -> top2 = x(3), y(2)
    assert(out(2).toSeq == Seq("g2", "x", 3L, 1L))
    assert(out(3).toSeq == Seq("g2", "y", 2L, 2L))
  }

  test("profileDrift: per-metric integer deltas, appeared/vanished groups drift against zero") {
    val a = Seq(("g1", "x y"), ("g1", "x")).toDF("g", "text")
    val b = Seq(("g1", "x y z"), ("g2", "a b")).toDF("g", "text")
    val out = graft.ops.Profile.profileDrift(a, b, "text", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // g1 in a: n_docs 2, total 3, distinct 2, p50 1 (ranks [1,2], ceil(1)=1), p90 2
    // g1 in b: n_docs 1, total 3, distinct 3, p50 3, p90 3
    assert(out(("g1", "n_docs")) == (2L, 1L, -1L, -500L))
    assert(out(("g1", "total_tokens")) == (3L, 3L, 0L, 0L))
    assert(out(("g1", "distinct_tokens")) == (2L, 3L, 1L, 500L))
    assert(out(("g1", "p50_tokens")) == (1L, 3L, 2L, 2000L))
    assert(out(("g1", "p90_tokens")) == (2L, 3L, 1L, 500L))
    // g2 appeared: drifts against zero (permille divides by max(v_a, 1))
    assert(out(("g2", "n_docs")) == (0L, 1L, 1L, 1000L))
    assert(out(("g2", "total_tokens")) == (0L, 2L, 2L, 2000L))
    assert(out.size == 10)
  }

  test("correlationMatrix: perfect/inverse/constant columns, exact moments") {
    val df = Seq((1L, 2L, 10L, 5L), (2L, 4L, 8L, 5L), (3L, 6L, 6L, 5L), (4L, 8L, 4L, 5L))
      .toDF("x", "y2", "inv", "const")
    val out = Profile.correlationMatrix(df, Seq("x", "y2", "inv", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(8)) null else r.getLong(8))).toMap
    assert(out(("x", "y2")) == 1000L, "y = 2x is perfectly correlated")
    assert(out(("x", "inv")) == -1000L, "inv = 12 - 2x is perfectly anti-correlated")
    assert(out(("x", "const")) == null, "constant column has no defined correlation")
    // moments are exact decimals
    val m = Profile.correlationMatrix(df, Seq("x", "y2"))
      .collect().head
    assert(m.getDecimal(3).longValueExact() == 10L) // sum_x
    assert(m.getDecimal(7).longValueExact() == 60L) // sum_xy = 2+8+18+32
    assert(m.getLong(2) == 4L)
  }

  test("robustOutliers: hand-checked median/MAD verdicts; robust to the outlier itself") {
    // g: values 10,10,11,12,13,1000 → n=6, med = rank ceil(6/2)=3 asc = 11
    // devs: 1,1,0,1,2,989 → mad = rank 3 of (0,1,1,1,2,989) = 1
    // outlier rule |x-11|*1000 > 3500*1 → only 1000 (dev 989) and 13? dev 2*1000=2000 < 3500 no
    val df = Seq(10L, 10L, 11L, 12L, 13L, 1000L).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val out = Profile.robustOutliers(df, "v", "id", Seq("grp"))
      .collect().map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toMap == Map(1000L -> (11L, 1L, 989L)),
      s"mean/stddev would be dragged to ~176 and miss everything: ${out.toSeq}")
    // MAD = 0 degenerate case: every deviating row flags
    val deg = Seq(5L, 5L, 5L, 5L, 7L).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    val dout = Profile.robustOutliers(deg, "v", "id", Seq("grp")).collect()
    assert(dout.length == 1 && dout.head.getLong(2) == 7L)
  }

  test("analyzeColumns: typed value mapping, nulls, and metric coverage") {
    val df = Seq(
      (1L, Some("ab"), Some(1.5), Some(true)),
      (2L, Some("xyz"), Some(-0.25), Some(false)),
      (3L, None: Option[String], None: Option[Double], None: Option[Boolean]),
      (3L, Some(""), Some(1.5), Some(true))
    ).toDF("id", "s", "d", "b")
    val out = Profile.analyzeColumns(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (if (r.isNullAt(2)) null else r.getLong(2)))
      .toMap
    assert(out(("id", "n_null")) == 0L && out(("id", "n_distinct")) == 3L)
    assert(out(("id", "min_v")) == 1L && out(("id", "max_v")) == 3L)
    assert(out(("s", "n_null")) == 1L && out(("s", "n_distinct")) == 3L)
    assert(out(("s", "min_v")) == 0L && out(("s", "max_v")) == 3L) // char lengths
    assert(out(("s", "len_total")) == 5L)
    assert(out(("d", "n_distinct")) == 2L)
    assert(out(("d", "min_v")) == -250000L && out(("d", "max_v")) == 1500000L)
    assert(out(("b", "min_v")) == 0L && out(("b", "max_v")) == 1L)
    // coverage: 4 + 5 + 4 + 4 metrics, no extras
    assert(out.size == 17)
  }

  test("analyzeColumns: sketch tier matches exact counts within rsd scale; one row per partial") {
    val df = (0 until 2000).map(i => (i.toLong % 700, s"v${i % 137}")).toDF("k", "s")
    val exact = Profile.analyzeColumns(df, exact = true).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sk = Profile.analyzeColumns(df, exact = false, rsd = 0.02).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (c <- Seq("k", "s")) {
      val (e, a) = (exact((c, "n_distinct")), sk((c, "n_distinct")))
      assert(math.abs(a - e).toDouble / e < 0.1, s"$c: exact=$e approx=$a")
      // non-distinct metrics are identical across tiers
      assert(exact((c, "n_null")) == sk((c, "n_null")))
      assert(exact((c, "min_v")) == sk((c, "min_v")))
      assert(exact((c, "max_v")) == sk((c, "max_v")))
    }
    // sketch tier must not plan an Expand (single-pass partial aggregate)
    val plan = Profile.analyzeColumns(df, exact = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"sketch tier must collapse the Expand:\n${plan.take(2000)}")
  }

  test("functionalDependencies: keys hold, reverse direction violated, duplicates collapse") {
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 20L), (3L, "b", 20L))
      .toDF("id", "g", "v")
    val out = Profile.functionalDependencies(df, Seq("id", "g", "v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size == 6)
    assert(out(("id", "g")) == ((3L, 0L, true)), "id is a key: id → g holds")
    assert(out(("id", "v")) == ((3L, 0L, true)))
    assert(out(("g", "id")) == ((2L, 1L, false)), "g=a maps to ids {1,2}")
    assert(out(("g", "v")) == ((2L, 0L, true)))
    assert(out(("v", "g")) == ((2L, 0L, true)))
    assert(out(("v", "id")) == ((2L, 1L, false)))
  }

  test("crossTab: exact cells, marginals from windows, nulls are categories") {
    // a x x, a y, b y, null y: N = 5
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"),
      (null: String, "y")).toDF("l", "s")
    val got = graft.ops.Profile.crossTab(df, "l", "s")
      .collect().map(r => ((Option(r.getString(0)), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // lift(a,x) = 1e6*2*5/(3*2) = 1666666
    assert(got((Some("a"), "x")) == ((2L, 3L, 2L, 1666666L)), s"got $got")
    // lift(a,y) = 1e6*1*5/(3*3) = 555555
    assert(got((Some("a"), "y")) == ((1L, 3L, 3L, 555555L)))
    assert(got((Some("b"), "y")) == ((1L, 1L, 3L, 1666666L)))
    assert(got((None, "y")) == ((1L, 1L, 3L, 1666666L)),
      "null category must survive with correct marginals")
    assert(got.size == 4, "only observed cells emit")
  }

  test("balanceReport: effective labels hit 1000·k balanced, collapse to 1000 monoculture") {
    import SparkTestBase.spark.implicits._
    val df = (Seq.fill(3)(("even", "a")) ++ Seq.fill(3)(("even", "b")) ++
      Seq.fill(9)(("skew", "a")) ++ Seq.fill(1)(("skew", "b")) ++
      Seq.fill(4)(("mono", "a"))).toDF("g", "label")
    val out = Profile.balanceReport(df, Seq("g"), "label").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("even") == ((6L, 2L, 500L, 2000L)))
    // skew: sq = 81 + 1 = 82 -> 100000 // 82 = 1219
    assert(out("skew") == ((10L, 2L, 900L, 1219L)))
    assert(out("mono") == ((4L, 1L, 1000L, 1000L)))
  }

  test("confusionReport: per-label tp/fp/fn and null-not-zero vacuous ratios") {
    import SparkTestBase.spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "d")).toDF("gold", "pred")
    val out = Profile.confusionReport(df, "gold", "pred").collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          opt(4), opt(5), opt(6)))
      }.toMap
    assert(out("a") == ((2L, 0L, 1L, Some(1000L), Some(666L), Some(800L))))
    assert(out("b") == ((2L, 1L, 0L, Some(666L), Some(1000L), Some(800L))))
    // gold-only label: never predicted -> precision is vacuous (null), not 0
    assert(out("c") == ((0L, 0L, 1L, None, Some(0L), Some(0L))))
    // pred-only label: no gold rows -> recall vacuous
    assert(out("d") == ((0L, 1L, 0L, Some(0L), None, Some(0L))))
    assert(out.size == 4)
  }

  test("cohenKappa: textbook 0.4 example, perfect/inverse/vacuous corners") {
    import SparkTestBase.spark.implicits._
    // classic 2x2: yes/yes 20, no/no 15, yes/no 10, no/yes 5 -> kappa 0.400
    val classic = (Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))).toDF("a", "b")
    val k1 = Profile.cohenKappa(classic, "a", "b").head()
    assert((k1.getLong(0), k1.getLong(1), k1.getLong(2)) == ((50L, 35L, 400L)))
    // perfect agreement (non-constant labels) -> 1000
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Profile.cohenKappa(perfect, "a", "b").head().getLong(2) == 1000L)
    // symmetric complete disagreement -> -1000
    val inverse = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))).toDF("a", "b")
    assert(Profile.cohenKappa(inverse, "a", "b").head().getLong(2) == -1000L)
    // both raters constant -> denominator 0 -> null kappa
    val constant = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Profile.cohenKappa(constant, "a", "b").head().isNullAt(2))
  }

  test("giniByGroup: equality is 0, one-holder approaches (n-1)/n, ties are order-invariant") {
    val df = Seq(
      ("even", 5L), ("even", 5L), ("even", 5L),         // perfectly even -> 0
      ("mono", 0L), ("mono", 0L), ("mono", 9L),         // max for n=3 -> 666
      ("tied", 1L), ("tied", 1L), ("tied", 2L),         // num=2, den=12 -> 166
      ("zero", 0L), ("zero", 0L))                       // total 0 -> 0
      .toDF("g", "x")
    val got = Profile.giniByGroup(df, "x", Seq("g")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("even") == ((3L, 15L, 0L)))
    assert(got("mono") == ((3L, 9L, 666L)))
    assert(got("tied") == ((3L, 4L, 166L)))
    assert(got("zero") == ((2L, 0L, 0L)))
  }

  test("benfordAudit: hand-computed digit shares, floor + positivity filter") {
    // x: digits 1,1,1,2,3 after floor; 0 and -5 excluded -> total 5
    val df = Seq(10.0, 11.0, 19.0, 25.0, 3.7, 0.0, -5.0).toDF("x")
    val out = Profile.benfordAudit(df, Seq("x")).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(1) == ((3L, 600L, 301L, 299L)))
    assert(out(2) == ((1L, 200L, 176L, 24L)))
    assert(out(3) == ((1L, 200L, 125L, 75L)))
    assert(out.size == 3, "only observed digits emit")
    // two columns: shares are per-column (each sums to ~1000 over observed)
    val two = Seq((10L, 90L), (20L, 95L)).toDF("a", "b")
    val perCol = Profile.benfordAudit(two, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(perCol(("a", 1)) == 500L && perCol(("a", 2)) == 500L)
    assert(perCol(("b", 9)) == 1000L)
  }

  test("krippendorffAlpha: hand-derived mixture, perfect/vacuous corners, budget guard") {
    // u1: a,a (agree) — u2: a,b (disagree) — u3: b,b,b — u4: single rating (drops)
    // n=7, n_a=3, n_b=4, P=49-25=24, S=2L (only u2 disagrees) =>
    // alpha = 1 - 6*2L/(24L) = 0.5
    val df = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"),
      ("u3", "b"), ("u3", "b"), ("u3", "b"), ("u4", "a"))
      .toDF("item", "label")
    val r = Profile.krippendorffAlpha(df, "item", "label").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 7L, 2L, 500L)), s"got $r")
    // perfect agreement on a two-label corpus => alpha = 1000
    val perfect = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b"))
      .toDF("item", "label")
    assert(Profile.krippendorffAlpha(perfect, "item", "label")
      .collect().head.getLong(3) == 1000L)
    // one label everywhere => De = 0, alpha undefined (NULL)
    val const = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "a"))
      .toDF("item", "label")
    assert(Profile.krippendorffAlpha(const, "item", "label")
      .collect().head.isNullAt(3))
    // rating order never matters (the statistic is over count multisets)
    val shuffled = Profile.krippendorffAlpha(
      df.orderBy(col("label").desc), "item", "label").collect().head
    assert(shuffled.getLong(3) == 500L)
    // a 14-rater unit breaks the lcm budget loudly
    val big = (1 to 14).map(i => ("u1", if (i % 2 == 0) "a" else "b")).toDF("item", "label")
    val e = intercept[Exception] {
      Profile.krippendorffAlpha(big, "item", "label").collect()
    }
    assert(e.getMessage.contains("exactness budget") ||
      Option(e.getCause).exists(_.getMessage.contains("exactness budget")), e.getMessage)
  }

  test("instructionTemplates: opening templates, shares, short and empty docs") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "Write a story about dragons"),
      (2L, "write a story quickly"),
      (3L, "Summarize this text"),
      (4L, ""),
      (5L, null))
      .toDF("doc_id", "text")
    val out = TextAnalysis.instructionTemplates(docs, "text", nTokens = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // NULL text coalesces into the empty template (never a NULL group key)
    assert(out.size == 3)
    assert(out("write a story") == ((2L, 400L)))
    assert(out("summarize this text") == ((1L, 200L)))
    assert(out("") == ((2L, 400L)))
  }

  test("fleissKappa: Fleiss-1971 canonical table, corners, fixed-panel guard") {
    // the canonical 10-item / 14-rater / 5-category table (Fleiss 1971):
    // kappa = 5895400/28082600 = 0.20993... -> 209 milli (trunc toward zero)
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val rows = for {
      (counts, item) <- table.zipWithIndex
      (k, cat) <- counts.zipWithIndex
      _ <- 0 until k
    } yield (s"i$item", s"c$cat")
    val r = graft.ops.Profile.fleissKappa(rows.toDF("item", "label"), "item", "label")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 14L, 5L, 209L)), s"got $r")
    // negative kappa: 2 items x 2 raters, (A,A) and (A,B) -> -1/3 -> -333
    val neg = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "B"))
      .toDF("item", "label")
    assert(Profile.fleissKappa(neg, "item", "label").collect().head.getLong(3) == -333L)
    // perfect agreement, two labels -> 1000
    val perfect = Seq(("u1", "A"), ("u1", "A"), ("u1", "A"),
      ("u2", "B"), ("u2", "B"), ("u2", "B")).toDF("item", "label")
    assert(Profile.fleissKappa(perfect, "item", "label").collect().head.getLong(3) == 1000L)
    // one label everywhere -> chance agreement 1, kappa undefined (NULL)
    val const = Seq(("u1", "A"), ("u1", "A"), ("u2", "A"), ("u2", "A"))
      .toDF("item", "label")
    assert(Profile.fleissKappa(const, "item", "label").collect().head.isNullAt(3))
    // ragged panel raises loudly instead of silently changing the statistic
    val ragged = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"))
      .toDF("item", "label")
    val e = intercept[Exception] {
      Profile.fleissKappa(ragged, "item", "label").collect()
    }
    assert(e.getMessage.contains("fixed panel") ||
      Option(e.getCause).exists(_.getMessage.contains("fixed panel")), e.getMessage)
  }

  test("langSegments: code-switched doc flags, monolingual doc does not, empty doc is zero") {
    import graft.ops.TextAnalysis
    // doc 1: 4-token chunks — first chunk English markers, second German
    val mixed = "the cat and the dog der hund ist nicht gut"
    // doc 2: all-English across both chunks
    val mono = "the cat and the dog is that with the fox"
    val df = Seq((1L, mixed), (2L, mono), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.langSegments(df, "text", "doc_id", chunkTokens = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val m = out(1L)
    assert(m.getLong(1) == 10L && m.getLong(2) == 2L, s"tokens/segments: $m")
    assert(m.getLong(3) == 2L && m.getBoolean(7), s"mixed doc must switch: $m")
    assert(m.getLong(6) == 500L, s"top share 1/2: $m")
    val o = out(2L)
    assert(o.getLong(3) == 1L && !o.getBoolean(7) && o.getString(4) == "en"
      && o.getLong(6) == 1000L, s"monolingual: $o")
    val z = out(3L)
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L && z.getLong(3) == 0L
      && z.isNullAt(4) && !z.getBoolean(7), s"empty: $z")
  }

  test("trimmedStats: rank trimming is tie-safe, small groups keep everything, guard") {
    val rows = (Seq(0L, 10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 1000L).map(("A", _)) ++
      Seq(5L, 7L, 9L).map(("B", _))).toDF("g", "v")
    val out = Profile.trimmedStats(rows, "v", Seq("g"), trimPermille = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // A: n=10, k=1 each side -> kept 10..80: mean 45, untouched by the 1000 outlier
    assert(out("A") == ((10L, 2L, 8L, 45L, 10L, 80L)))
    // B: n=3, k=0 -> everything kept
    assert(out("B") == ((3L, 0L, 3L, 7L, 5L, 9L)))
    intercept[IllegalArgumentException] {
      Profile.trimmedStats(rows, "v", Seq("g"), trimPermille = 500L)
    }
  }

  test("bootstrapCI: deterministic, ordered bounds, percentile ranks, guards") {
    val rows = (1L to 40L).map(i => (i, i * 10L)).toDF("id", "v")
    val ci1 = Profile.bootstrapCI(rows, "v", "id", replicates = 32,
      alphaPermille = 100L).collect().head
    val ci2 = Profile.bootstrapCI(rows, "v", "id", replicates = 32,
      alphaPermille = 100L).collect().head
    assert(ci1.toSeq == ci2.toSeq, "hash bootstrap must replay identically")
    val (n, point, lo, hi) = (ci1.getLong(0), ci1.getLong(1),
      ci1.getLong(2), ci1.getLong(3))
    assert(n == 32L)
    assert(lo <= point && point <= hi, s"bounds must bracket the point: $lo $point $hi")
    // the true mean is 205000 milli; a 32-replicate bootstrap of a
    // uniform ramp should bracket it comfortably
    assert(lo <= 205000L && 205000L <= hi, s"CI [$lo, $hi] should cover the mean")
    // tighter alpha can only widen or keep the interval
    val wide = Profile.bootstrapCI(rows, "v", "id", replicates = 32,
      alphaPermille = 10L).collect().head
    assert(wide.getLong(2) <= lo && hi <= wide.getLong(3))
    intercept[IllegalArgumentException] {
      Profile.bootstrapCI(rows, "v", "id", replicates = 32, alphaPermille = 500L)
    }
    intercept[IllegalArgumentException] {
      Profile.bootstrapMeans(rows, "v", "id", replicates = 1)
    }
    // empty input: clean zero-count signal, NULL CI columns (never an
    // all-NULL row a getLong(0) caller would trip on)
    val empty = Profile.bootstrapCI(rows.limit(0), "v", "id",
      replicates = 32, alphaPermille = 100L).collect().head
    assert(empty.getLong(0) == 0L)
    assert(empty.isNullAt(1) && empty.isNullAt(2) && empty.isNullAt(3))
  }
}

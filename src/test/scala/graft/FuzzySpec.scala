package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Fuzzy

/** Semantics tests for the PassJoin edit-distance join: hand goldens, the
  * completeness law vs the brute-force join (the property the DuckDB
  * oracle re-checks at corpus scale), short-string degenerate paths, and
  * the skew-guard subset property.
  */
class FuzzySpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("self-join finds exactly the hand-computed pairs at d=2") {
    val df = Seq(
      (1L, "kitten"), (2L, "sitten"), (3L, "sitting"), (4L, "kitchen"), (5L, "apple")
    ).toDF("id", "s")
    val got = pairs(Fuzzy.editDistanceSelfJoin(df, "s", "id", maxDist = 2))
    assert(got == Set((1L, 2L, 1), (2L, 3L, 2), (1L, 4L, 2)))
  }

  test("completeness law: PassJoin output equals the brute-force join") {
    // deterministic string soup over a tiny alphabet, lengths 0..8 —
    // includes empty and shorter-than-d+1 strings (the k=0 key path)
    val rows = (0 until 90).map { i =>
      val h = java.lang.Integer.hashCode(i * 0x9E3779B9.toInt)
      val len = math.abs(h) % 9
      val s = (0 until len).map(j => ("ab".charAt(math.abs(h >> j) % 2))).mkString
      (i.toLong, s)
    }
    val df = rows.toDF("id", "s")
    for (d <- 0 to 3) {
      val got = pairs(Fuzzy.editDistanceSelfJoin(df, "s", "id", maxDist = d))
      val a = df.select(col("id").as("idA"), col("s").as("sa"))
      val b = df.select(col("id").as("idB"), col("s").as("sb"))
      val brute = pairs(a.crossJoin(b).where(col("idA") < col("idB"))
        .withColumn("dist", levenshtein(col("sa"), col("sb")))
        .where(col("dist") <= d)
        .select(col("idA"), col("idB"), col("dist")))
      assert(got == brute, s"d=$d: PassJoin must equal brute force")
    }
  }

  test("cross-table join matches ids across frames, keeps nulls out") {
    val l = Seq((1L, "graft"), (2L, "spark"), (3L, null.asInstanceOf[String])).toDF("lid", "ls")
    val r = Seq((10L, "craft"), (11L, "sparks"), (12L, "zzzzz")).toDF("rid", "rs")
    val got = pairs(Fuzzy.editDistanceJoin(l, "ls", "lid", r, "rs", "rid", maxDist = 1))
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
  }

  test("jaroWinkler goldens: published examples + DuckDB-verified edge cases") {
    // Expected doubles are DuckDB jaro_winkler_similarity outputs
    // (bit-exact contract): the classic Winkler-paper pairs, the boost
    // threshold (prefix present but jaro <= 0.7 -> NO boost), the
    // byte-not-codepoint semantics (multibyte é), and the empty/equal
    // conventions (both-empty -> 0.0; equal nonempty -> 1.0).
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("duane", "dwayne", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334), // jaro > 0.7 but prefix 0
      ("abwxyzijkl", "abmnopqrst", 0.4666666666666666), // prefix 2, no boost
      ("abcz", "abyx", 0.6666666666666666), // prefix 2, jaro < 0.7: no boost
      ("héllo", "héllp", 0.9333333333333333), // 6-byte strings, byte jaro
      ("ab", "ba", 0.0), // window 0: no matches
      ("ab", "ab", 1.0),
      ("a", "", 0.0),
      ("", "", 0.0)
    )
    val df = cases.zipWithIndex
      .map { case ((a, b, e), i) => (i, a, b, e) }.toDF("i", "a", "b", "want")
    val got = df.select(col("i"), graft.functions.text.jaroWinkler(col("a"), col("b")).as("jw"), col("want"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"case ${r.getInt(0)}")
    }
    // null in -> null out
    val n = Seq((1, null.asInstanceOf[String], "x")).toDF("i", "a", "b")
      .select(graft.functions.text.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaroWinkler join: constant blocking equals brute force; default blocking restricts to same initial") {
    val df = Seq(
      (1L, "martha"), (2L, "marhta"), (3L, "michelle"), (4L, "michela"),
      (5L, "sean"), (6L, "shawn"), (7L, "Sean"), (8L, "zzz")
    ).toDF("id", "s")
    def jwPairs(got: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      got.select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = {
      val a = df.select(col("id").as("idA"), col("s").as("sa"))
      val b = df.select(col("id").as("idB"), col("s").as("sb"))
      a.crossJoin(b).where(col("idA") < col("idB"))
        .withColumn("sim", graft.functions.text.jaroWinkler(col("sa"), col("sb")))
        .where(col("sim") >= 0.83)
        .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val allPairs = jwPairs(Fuzzy.jaroWinklerSelfJoin(df, "s", "id", minSim = 0.83,
      blockKey = _ => lit("all")))
    assert(allPairs == brute)
    assert(allPairs.contains((1L, 2L)) && allPairs.contains((3L, 4L)))
    // default initial-letter blocking: the same pairs, since every
    // qualifying brute pair here shares an (upper-cased) initial —
    // including the case-folded (5, 7) pair
    val blocked = jwPairs(Fuzzy.jaroWinklerSelfJoin(df, "s", "id", minSim = 0.83))
    assert(blocked == brute)
    assert(blocked.contains((5L, 7L)))
  }

  test("maxBucket skew guard yields a subset of the unguarded pairs") {
    val df = (0 until 40).map(i => (i.toLong, f"item$i%02d")).toDF("id", "s")
    val all = pairs(Fuzzy.editDistanceSelfJoin(df, "s", "id", maxDist = 2))
    val guarded = pairs(Fuzzy.editDistanceSelfJoin(df, "s", "id", maxDist = 2, maxBucket = 10))
    assert(guarded.subsetOf(all))
    assert(all.nonEmpty)
  }

  test("resolveEntities: variants cluster to min id, one canonical each, singletons intact") {
    val df = Seq(
      (10L, "MARTHA"), (11L, "MARHTA"), // classic JW pair ~0.961
      (20L, "JONATHON"), (21L, "JONATHAN"),
      (30L, "ZEBRA") // singleton
    ).toDF("id", "name")
    val out = graft.ops.Fuzzy.resolveEntities(df, "name", "id", minSim = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L) == (10L, true) && out(11L) == (10L, false))
    assert(out(20L) == (20L, true) && out(21L) == (20L, false))
    assert(out(30L) == (30L, true))
    // transitivity across a chain: A~B and B~C put A,B,C in one cluster
    // even if A~C alone misses the bar
    val chain = Seq((1L, "AAAAAAX"), (2L, "AAAAAXX"), (3L, "AAAAXXX")).toDF("id", "name")
    val c = graft.ops.Fuzzy.resolveEntities(chain, "name", "id", minSim = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.values.toSet.size == 1, s"chain must close transitively: $c")
  }

  test("sortedNeighborhoodJoin equals the global-window replay at any bucket count") {
    val rows = (0 until 97).map { i =>
      val h = i * 2654435761L
      (i.toLong, s"name-${(math.abs(h) % 40)}-${i % 7}")
    }
    val df = rows.toDF("id", "k")
    // expected: sort by (k, id), pairs at rank distance 1..3
    val sorted = rows.sortBy(r => (r._2, r._1))
    val want = (for {
      i <- sorted.indices; d <- 1 until 4 if i + d < sorted.length
    } yield (sorted(i)._1, sorted(i + d)._1, d.toLong)).toSet
    for (buckets <- Seq(1, 4, 200)) {
      val got = graft.ops.Fuzzy.sortedNeighborhoodJoin(df, "k", "id", window = 4, buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("sortedNeighborhoodJoin pairs across value-block boundaries; window 2 = adjacency") {
    // "aa x"/"ab x" differ in the blocking-fatal second char but are
    // sort-adjacent — SNM's reason to exist
    val df = Seq((1L, "aa smith"), (2L, "ab smith"), (3L, "zz other")).toDF("id", "k")
    val got = graft.ops.Fuzzy.sortedNeighborhoodJoin(df, "k", "id", window = 2, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }
}

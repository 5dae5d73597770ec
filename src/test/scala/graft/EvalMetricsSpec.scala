package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Curation, EvalMetrics, Profile, Similarity}

/** Hand-computed goldens + laws for the eval-metric family (BLEU / ROUGE /
  * chrF), MMR selection, Bradley-Terry fitting, and the shard manifest.
  */
class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ------------------------------------------------------------- BLEU

  test("bleuComponents: clipped counts, lengths, permille geometric mean") {
    val pairs = Seq(
      (1L, "the cat the cat", "the cat sat on the mat"),
      (2L, "a b c d", "a b c d"),
      (3L, "", "x y"))
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getLong(r1.fieldIndex("cand_len")) == 4L)
    assert(r1.getLong(r1.fieldIndex("ref_len")) == 6L)
    // 1-grams: clip(the)=2, clip(cat)=1 of 4 candidate grams
    assert(r1.getLong(r1.fieldIndex("matches_1")) == 3L)
    assert(r1.getLong(r1.fieldIndex("total_1")) == 4L)
    // 2-grams: "the cat" appears twice in cand, once in ref -> clip 1 of 3
    assert(r1.getLong(r1.fieldIndex("matches_2")) == 1L)
    assert(r1.getLong(r1.fieldIndex("total_2")) == 3L)
    assert(r1.getLong(r1.fieldIndex("matches_3")) == 0L)
    assert(r1.getLong(r1.fieldIndex("total_3")) == 2L)
    assert(r1.getLong(r1.fieldIndex("matches_4")) == 0L)
    assert(r1.getLong(r1.fieldIndex("total_4")) == 1L)
    // p3 = 0 -> product 0 -> geo 0 (defined: every total > 0)
    assert(r1.getLong(r1.fieldIndex("precision_geo_permille")) == 0L)

    val r2 = out(2L) // identity pair: every precision 1000
    assert(r2.getLong(r2.fieldIndex("precision_geo_permille")) == 1000L)

    val r3 = out(3L) // empty candidate: zero totals, geo undefined
    assert(r3.getLong(r3.fieldIndex("cand_len")) == 0L)
    assert(r3.getLong(r3.fieldIndex("total_1")) == 0L)
    assert(r3.isNullAt(r3.fieldIndex("precision_geo_permille")))
  }

  test("rougeN: recall against the reference, integer F1") {
    val pairs = Seq((1L, "the cat the cat", "the cat sat on the mat"))
      .toDF("pair_id", "cand", "ref")
    val rows = EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", maxN = 2)
      .collect().map(r => r.getLong(r.fieldIndex("n")) -> r).toMap
    val n1 = rows(1L)
    assert(n1.getLong(n1.fieldIndex("matches")) == 3L)
    assert(n1.getLong(n1.fieldIndex("ref_total")) == 6L)
    assert(n1.getLong(n1.fieldIndex("recall_permille")) == 500L) // 3000 div 6
    assert(n1.getLong(n1.fieldIndex("precision_permille")) == 750L) // 3000 div 4
    // F1 = 2*750*500 div (750+500) = 600
    assert(n1.getLong(n1.fieldIndex("f1_permille")) == 600L)
  }

  test("chrF: character grams, beta=2 F, absent rows for gram-free n") {
    val pairs = Seq((1L, "ab", "ab")).toDF("pair_id", "cand", "ref")
    val rows = EvalMetrics.chrF(pairs, "pair_id", "cand", "ref", maxN = 3)
      .collect().map(r => r.getLong(r.fieldIndex("n")) -> r).toMap
    assert(rows.keySet == Set(1L, 2L), "n=3 has no grams on either side")
    val n1 = rows(1L)
    assert(n1.getLong(n1.fieldIndex("f1_permille")) == 1000L)
    assert(n1.getLong(n1.fieldIndex("f2_permille")) == 1000L)
  }

  test("edge whitespace never yields phantom tokens (trim strips spaces only)") {
    // "a b\n" vs "x y\n": without the empty-string filter both sides grow
    // a phantom "" token (trim keeps the \n, split emits a trailing "")
    // that scores a spurious clipped 1-gram match
    val pairs = Seq((1L, "a b\n", "x y\n"), (2L, "\t", "z")).toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(r1.fieldIndex("cand_len")) == 2L)
    assert(r1.getLong(r1.fieldIndex("ref_len")) == 2L)
    assert(r1.getLong(r1.fieldIndex("matches_1")) == 0L,
      "disjoint texts must not match on a phantom empty token")
    val r2 = out(2L) // tab-only candidate = zero tokens
    assert(r2.getLong(r2.fieldIndex("cand_len")) == 0L)
  }

  test("rouge/bleu ignore token multiplicity beyond the clip (law)") {
    // repeating a reference word 50x in the candidate scores it at most
    // ref-count times
    val pairs = Seq((1L, Seq.fill(50)("word").mkString(" "), "word once"))
      .toDF("pair_id", "cand", "ref")
    val r = EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", maxN = 1).head()
    assert(r.getLong(r.fieldIndex("matches")) == 1L)
    assert(r.getLong(r.fieldIndex("cand_total")) == 50L)
  }

  // -------------------------------------------------------------- MMR

  private def vec(xs: Double*): Array[Double] = xs.toArray

  // ------------------------------------------------------ self-BLEU / TER

  test("selfBleuPairs: deterministic derangement, k peers per doc") {
    val docs = (0L until 37L).map(i => (i, s"tok$i words of doc $i"))
      .toDF("doc_id", "text")
    val pairs = EvalMetrics.selfBleuPairs(docs, "text", "doc_id", peers = 3)
      .collect()
    assert(pairs.length == 37 * 3) // every doc, every peer slot
    pairs.foreach { r =>
      assert(r.getLong(r.fieldIndex("cand_id")) != r.getLong(r.fieldIndex("ref_id")),
        "self-pair leaked through the ring derangement")
    }
    // pair_id encodes (cand, peer slot) injectively
    assert(pairs.map(_.getLong(0)).distinct.length == pairs.length)
    // NO RNG: a second evaluation reproduces the pairing exactly
    val again = EvalMetrics.selfBleuPairs(docs, "text", "doc_id", peers = 3)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    // texts ride along correctly (cand text belongs to cand_id)
    pairs.foreach { r =>
      assert(r.getString(r.fieldIndex("cand")) ==
        s"tok${r.getLong(r.fieldIndex("cand_id"))} words of doc ${r.getLong(r.fieldIndex("cand_id"))}")
      assert(r.getString(r.fieldIndex("ref")) ==
        s"tok${r.getLong(r.fieldIndex("ref_id"))} words of doc ${r.getLong(r.fieldIndex("ref_id"))}")
    }
  }

  test("selfBleuPairs: rejects a corpus with no possible peer") {
    val one = Seq((1L, "only doc")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      EvalMetrics.selfBleuPairs(one, "text", "doc_id", peers = 1)
    }
    assert(e.getMessage.contains(">= 2 documents"))
  }

  test("selfBleu: identical corpus scores 1000 geo on every pair (law)") {
    // every doc the same text -> every sampled peer is an exact match,
    // the mode-collapse reading self-BLEU exists to flag
    val docs = (0L until 12L).map(i => (i, "the same generated sample text here"))
      .toDF("doc_id", "text")
    val out = EvalMetrics.selfBleu(docs, "text", "doc_id", peers = 2).collect()
    assert(out.length == 24)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("precision_geo_permille")) == 1000L)
    }
  }

  test("terComponents: hand-computed token edit distances") {
    val pairs = Seq(
      (1L, "a b c", "a x c"), // one substitution
      (2L, "a b c d", "a b c"), // one deletion (cand has one extra)
      (3L, "a b", "a b"), // identical
      (4L, "", "x y z"), // empty candidate: 3 insertions
      (5L, "p q", ""), // empty reference: TER undefined
      (6L, "the cat sat", "sat the cat")) // reorder: 2 edits, no shift op
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.terComponents(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    def ops(id: Long) = out(id).getLong(out(id).fieldIndex("edit_ops"))
    def ter(id: Long) = out(id).getLong(out(id).fieldIndex("ter_permille"))
    assert(ops(1L) == 1L && ter(1L) == 333L)
    assert(ops(2L) == 1L && ter(2L) == 333L)
    assert(ops(3L) == 0L && ter(3L) == 0L)
    assert(ops(4L) == 3L && ter(4L) == 1000L)
    assert(ops(5L) == 2L)
    assert(out(5L).isNullAt(out(5L).fieldIndex("ter_permille")))
    assert(ops(6L) == 2L) // levenshtein of "abc" vs "cab"
    // lengths are post-truncation token counts
    assert(out(4L).getLong(out(4L).fieldIndex("cand_len")) == 0L)
    assert(out(4L).getLong(out(4L).fieldIndex("ref_len")) == 3L)
  }

  test("terComponents: truncation bounds the DP and the reported lengths") {
    val longText = (1 to 100).map(i => s"w$i").mkString(" ")
    val shifted = (3 to 102).map(i => s"w$i").mkString(" ")
    val out = EvalMetrics.terComponents(
      Seq((1L, longText, shifted)).toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref", maxTokens = 10)
      .collect().head
    assert(out.getLong(out.fieldIndex("cand_len")) == 10L)
    assert(out.getLong(out.fieldIndex("ref_len")) == 10L)
    // w1..w10 vs w3..w12: distance on the truncated windows = 2 subs +
    // shared middle -> levenshtein("1..10","3..12") token-wise = 4? no:
    // optimal alignment deletes w1,w2 and inserts w11,w12 -> 4 edits
    assert(out.getLong(out.fieldIndex("edit_ops")) == 4L)
  }

  test("rougeL: token LCS with hand-computed goldens") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat is on a mat"), // LCS 4
      (2L, "a b c", "a b c"), // identity: LCS 3
      (3L, "x y z", "p q r"), // disjoint: LCS 0
      (4L, "", "a b"), // empty cand: P NULL, R 0
      (5L, "c a b", "a b c")) // subsequence beats any n-gram: LCS 2
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.rougeL(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    def lcs(id: Long) = out(id).getLong(out(id).fieldIndex("lcs_len"))
    assert(lcs(1L) == 4L) // the cat ... on ... mat
    assert(lcs(2L) == 3L)
    assert(lcs(3L) == 0L)
    assert(lcs(4L) == 0L)
    assert(lcs(5L) == 2L) // "a b"
    val r1 = out(1L)
    assert(r1.getLong(r1.fieldIndex("recall_permille")) == 666L) // 4000 div 6
    assert(r1.getLong(r1.fieldIndex("precision_permille")) == 666L)
    assert(r1.getLong(r1.fieldIndex("f1_permille")) == 666L)
    val r4 = out(4L)
    assert(r4.isNullAt(r4.fieldIndex("precision_permille"))) // empty cand
    assert(r4.getLong(r4.fieldIndex("recall_permille")) == 0L)
    assert(r4.isNullAt(r4.fieldIndex("f1_permille")))
    val r2 = out(2L)
    assert(r2.getLong(r2.fieldIndex("f1_permille")) == 1000L)
  }

  test("rougeL: truncation bounds the DP (law: LCS <= min(len))") {
    val longA = (1 to 100).map(i => s"w$i").mkString(" ")
    val longB = (51 to 150).map(i => s"w$i").mkString(" ")
    val out = EvalMetrics.rougeL(
      Seq((1L, longA, longB)).toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref", maxTokens = 60).collect().head
    assert(out.getLong(out.fieldIndex("cand_len")) == 60L)
    assert(out.getLong(out.fieldIndex("ref_len")) == 60L)
    // truncated windows: w1..w60 vs w51..w110 share w51..w60 -> LCS 10
    assert(out.getLong(out.fieldIndex("lcs_len")) == 10L)
  }

  test("passAtK: hand-computed estimator values and edge semantics") {
    // problem A: n=5, c=2 -> pass@2 = 1 - C(3,2)/C(5,2) = 0.7 (exact on
    // the micro fold: 1e6*3/5=600000, *2/4=300000 -> 700000)
    val samples =
      Seq.fill(2)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
        Seq.fill(4)(("B", false)) ++ // c=0: pass@k = 0 at every k <= n
        Seq.fill(3)(("C", true)) // c=n: pass@k = 1
    val out = EvalMetrics.passAtK(samples.toDF("problem", "passed"),
      "problem", "passed", ks = Seq(1, 2, 5))
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("k"))) -> r).toMap
    def micro(p: String, k: Long) =
      out((p, k)).getLong(out((p, k)).fieldIndex("pass_at_k_micro"))
    assert(micro("A", 1L) == 400000L) // 1 - 3/5
    assert(micro("A", 2L) == 700000L)
    assert(micro("A", 5L) == 1000000L) // k = n, c >= 1: certain
    assert(micro("B", 1L) == 0L)
    assert(micro("B", 2L) == 0L)
    assert(micro("C", 1L) == 1000000L)
    // k > n is undefined, not clamped
    assert(out(("B", 5L)).isNullAt(out(("B", 5L)).fieldIndex("pass_at_k_micro")))
    assert(out(("C", 5L)).isNullAt(out(("C", 5L)).fieldIndex("pass_at_k_micro")))
  }

  test("passAtK law: fold matches the exact rational within k micro-units") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 30).map { i =>
      val n = 1 + rnd.nextInt(20); val c = rnd.nextInt(n + 1); (i, n, c)
    }
    val rows = cases.flatMap { case (p, n, c) =>
      Seq.fill(c)((p.toLong, true)) ++ Seq.fill(n - c)((p.toLong, false))
    }
    val ks = Seq(1, 3, 7)
    val out = EvalMetrics.passAtK(rows.toDF("problem", "passed"),
      "problem", "passed", ks)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("k"))) -> r).toMap
    for ((p, n, c) <- cases; k <- ks if k <= n) {
      def comb(a: Int, b: Int): BigInt =
        if (b < 0 || b > a) BigInt(0)
        else (0 until b).map(i => BigInt(a - i)).product / (1 to b).map(BigInt(_)).product
      val exact = BigInt(1000000) -
        (if (comb(n, k) == 0) BigInt(0)
         else BigInt(1000000) * comb(n - c, k) / comb(n, k))
      val got = out((p.toLong, k.toLong))
        .getLong(out((p.toLong, k.toLong)).fieldIndex("pass_at_k_micro"))
      assert((BigInt(got) - exact).abs <= k,
        s"n=$n c=$c k=$k got=$got exact=$exact")
    }
  }

  test("gPassAtK: exact hypergeometric tail, brute-force law, pass@k and pass^k degenerations") {
    // hand case: n=4, c=2, k=2 — G(tau=1/2) = P(>=1 pass) = 1 - C(2,2)/
    // C(4,2) = 5/6 -> 833333; G(tau=1) = C(2,2)/C(4,2) = 1/6 -> 166666
    val df = Seq.tabulate(4)(i => (1L, i < 2)).toDF("problem", "passed")
    val out = EvalMetrics.gPassAtK(df, "problem", "passed",
      ks = Seq(2), taus = Seq((1, 2), (1, 1)))
      .collect().map(r => (r.getLong(4), r.getLong(5)) -> r.getLong(6)).toMap
    assert(out((1L, 2L)) == 833333L)
    assert(out((1L, 1L)) == 166666L)
    // brute force over all C(n,k) subsets for small n: G equals the
    // enumerated share of k-subsets with >= ceil(tau*k) passes
    val n = 7; val c = 3
    val samples = Seq.tabulate(n)(i => (1L, i < c)).toDF("problem", "passed")
    for (k <- Seq(2, 3, 5); (tn, td) <- Seq((1, 3), (1, 2), (2, 3), (1, 1))) {
      val j0 = (tn * k + td - 1) / td
      val subsets = (0 until n).combinations(k).toSeq
      val hit = subsets.count(_.count(_ < c) >= j0)
      val exact = BigInt(hit) * 1000000 / subsets.size
      val got = EvalMetrics.gPassAtK(samples, "problem", "passed",
        ks = Seq(k), taus = Seq((tn, td))).collect().head.getLong(6)
      assert(got == exact.toLong, s"k=$k tau=$tn/$td")
    }
    // cross-family: tau = 1/k degenerates to pass@k; tau = 1 to pass^k;
    // the compounded-floor folds sit within k+1 micro of the exact tail
    val wide = (1L to 200L).map(i => (1L, i <= 70L)).toDF("problem", "passed")
    val g = EvalMetrics.gPassAtK(wide, "problem", "passed",
      ks = Seq(10), taus = Seq((1, 10), (1, 1)))
      .collect().map(r => (r.getLong(4), r.getLong(5)) -> r.getLong(6)).toMap
    val pk = EvalMetrics.passAtK(wide, "problem", "passed", ks = Seq(10))
      .collect().head.getLong(4)
    assert(math.abs(g((1L, 10L)) - pk) <= 11L, s"pass@k ${g((1L, 10L))} vs $pk")
    val allk = EvalMetrics.passAtKRollup(
      EvalMetrics.passAtK(wide, "problem", "passed", ks = Seq(10)))
      .collect().head
    assert(math.abs(g((1L, 1L)) -
      allk.getLong(allk.fieldIndex("mean_pass_all_k_micro"))) <= 11L)
    // k > n is undefined
    val tiny = Seq((1L, true), (1L, false)).toDF("problem", "passed")
    val nulls = EvalMetrics.gPassAtK(tiny, "problem", "passed",
      ks = Seq(5), taus = Seq((1, 1))).collect().head
    assert(nulls.isNullAt(6))
    // rollup: mean over problems per (k, tau); undefined problems drop
    // visibly. Two problems — (4 of 4 pass) and (2 of 4) — at k=2,
    // tau=1: G = 1e6 and 166666 -> mean 583333 over 2 problems; a third
    // problem with n=1 < k is NULL and drops
    val three = (Seq.tabulate(4)(i => (1L, true)) ++
      Seq.tabulate(4)(i => (2L, i < 2)) ++ Seq((3L, true)))
      .toDF("problem", "passed")
    val roll = EvalMetrics.gPassAtKRollup(EvalMetrics.gPassAtK(three,
      "problem", "passed", ks = Seq(2), taus = Seq((1, 1))))
      .collect().head
    assert(roll.getLong(roll.fieldIndex("n_problems")) == 2L)
    assert(roll.getLong(roll.fieldIndex("mean_g_pass_micro")) == 583333L)
  }

  test("selfConsistency: majority vote, smallest-answer ties, null abstentions") {
    val rows = Seq(
      (1L, Some(3L)), (1L, Some(3L)), (1L, Some(7L)), (1L, None), // 3 wins
      (2L, Some(5L)), (2L, Some(2L)), // tie -> smaller answer 2
      (3L, None)) // all abstain: no row
      .map { case (p, a) => (p, a.map(Long.box).orNull) }
      .toDF("problem", "answer")
    val out = EvalMetrics.selfConsistency(rows, "problem", "answer")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getLong(r1.fieldIndex("majority_answer")) == 3L)
    assert(r1.getLong(r1.fieldIndex("n_majority")) == 2L)
    assert(r1.getLong(r1.fieldIndex("n_samples")) == 3L) // null dropped
    assert(r1.getLong(r1.fieldIndex("majority_permille")) == 666L)
    val r2 = out(2L)
    assert(r2.getLong(r2.fieldIndex("majority_answer")) == 2L) // tie-break
    assert(r2.getLong(r2.fieldIndex("majority_permille")) == 500L)
  }

  test("selfConsistencyRollup: mean majority share and the quorum share") {
    // problems: p1 majority 2/3 (666), p2 tie 1/2 (500), p3 3/3 (1000)
    val rows = Seq(
      (1L, 3L), (1L, 3L), (1L, 7L),
      (2L, 5L), (2L, 2L),
      (3L, 9L), (3L, 9L), (3L, 9L))
      .toDF("problem", "answer")
    val per = EvalMetrics.selfConsistency(rows, "problem", "answer")
    val out = EvalMetrics.selfConsistencyRollup(per, quorumPermille = 600L)
      .collect().head
    assert(out.getLong(out.fieldIndex("n_problems")) == 3L)
    // (666 + 500 + 1000) div 3 = 722
    assert(out.getLong(out.fieldIndex("mean_majority_permille")) == 722L)
    assert(out.getLong(out.fieldIndex("n_quorum")) == 2L) // 666 and 1000
    assert(out.getLong(out.fieldIndex("quorum_share_permille")) == 666L)
  }

  test("corpusBleu: micro-average pools components BEFORE the root") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"), // identity pair: all precisions perfect
      (2L, "x y", "x q")) // 2-token pair: per-pair geo is NULL (no 4-grams)
      .toDF("pair_id", "cand", "ref")
    val comp = EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref")
    val out = EvalMetrics.corpusBleu(comp).collect().head
    assert(out.getLong(out.fieldIndex("n_pairs")) == 2L)
    assert(out.getLong(out.fieldIndex("cand_tokens")) == 6L)
    assert(out.getLong(out.fieldIndex("ref_tokens")) == 6L)
    assert(out.getLong(out.fieldIndex("matches_1")) == 5L) // 4 + clip(x)
    assert(out.getLong(out.fieldIndex("total_1")) == 6L)
    assert(out.getLong(out.fieldIndex("matches_2")) == 3L) // 3/3 + 0/1
    assert(out.getLong(out.fieldIndex("total_2")) == 4L)
    // pooled p = (833, 750, 1000, 1000); isqrt∘isqrt(624.75e9) = 889 —
    // DEFINED even though pair 2 alone has no BLEU (the micro-average
    // point: pooling first keeps short pairs from zeroing the corpus)
    assert(out.getLong(out.fieldIndex("precision_geo_permille")) == 889L)
  }

  test("corpusRougeL: pooled LCS over pooled lengths") {
    val pairs = Seq(
      (1L, "a b c", "a x c"), // LCS 2 of 3/3
      (2L, "", "y z")) // per-pair P undefined; pooled absorbs it
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.corpusRougeL(
      EvalMetrics.rougeL(pairs, "pair_id", "cand", "ref")).collect().head
    assert(out.getLong(out.fieldIndex("n_pairs")) == 2L)
    assert(out.getLong(out.fieldIndex("lcs_total")) == 2L)
    assert(out.getLong(out.fieldIndex("cand_tokens")) == 3L)
    assert(out.getLong(out.fieldIndex("ref_tokens")) == 5L)
    assert(out.getLong(out.fieldIndex("precision_permille")) == 666L)
    assert(out.getLong(out.fieldIndex("recall_permille")) == 400L)
    assert(out.getLong(out.fieldIndex("f1_permille")) == 499L) // 2*666*400/1066
  }

  test("corpusTer: pooled edits over pooled reference tokens") {
    val pairs = Seq(
      (1L, "a b c", "a x c"), // 1 substitution over 3 ref tokens
      (2L, "p", "")) // empty ref: per-pair TER undefined, 1 edit pooled
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.corpusTer(
      EvalMetrics.terComponents(pairs, "pair_id", "cand", "ref"))
      .collect().head
    assert(out.getLong(out.fieldIndex("n_pairs")) == 2L)
    assert(out.getLong(out.fieldIndex("cand_tokens")) == 4L)
    assert(out.getLong(out.fieldIndex("ref_tokens")) == 3L)
    assert(out.getLong(out.fieldIndex("edit_ops")) == 2L)
    assert(out.getLong(out.fieldIndex("ter_permille")) == 666L)
  }

  test("bleuComponentsRowLocal == bleuComponents (law: the row-local clip IS the distributed clip)") {
    val pairs = Seq(
      (1L, "the cat the cat", "the cat sat on the mat"),
      (2L, "a b c d", "a b c d"),
      (3L, "", "x y"),
      (4L, "a a a a a", "a a b"), // clip: 5 candidate 'a's score 2
      (5L, "p q r s t u v w", "q p r s x t u v"),
      (6L, "one two", "three")) // no overlap, short both sides
      .toDF("pair_id", "cand", "ref")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val dist = EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref")
    val local = EvalMetrics.bleuComponentsRowLocal(pairs, "pair_id", "cand", "ref",
      maxTokens = 16) // texts <= 16 tokens: truncation is a no-op
    assert(local.columns.toSeq == dist.columns.toSeq)
    assert(rows(local).toSeq == rows(dist).toSeq)
  }

  test("round-11 kernel == shuffled witness (law): bleuComponents / rougeN / chrF / bleuComponentsMultiRef") {
    // the row-local clip kernels replaced the (pair, n, gram) shuffles
    // on the hot path (round-11 optimization); the distributed forms
    // survive as *Shuffled witnesses and this law pins the two
    // column-for-column on inputs that exercise the clip (repeats), the
    // coverage rows (empty sides), multi-codepoint text (chrF slices
    // code points, incl. a supplementary-plane emoji), and whitespace
    // edges (tabs/newlines)
    val pairs = Seq(
      (1L, "the cat the cat", "the cat sat on the mat"),
      (2L, "a b c d", "a b c d"),
      (3L, "", "x y"),
      (4L, "a a a a a", "a a b"),
      (5L, "café 😀 zhé", "café zhé 😀 😀"),
      (6L, "  tab\tsep  \n", "tab sep"),
      (7L, "one two", null.asInstanceOf[String]))
      .toDF("pair_id", "cand", "ref")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map {
        case null => "NULL"; case v => v.toString
      }).sortBy(_.mkString("|")).toSeq
    def law(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
        what: String): Unit = {
      assert(a.columns.toSeq == b.columns.toSeq, s"$what columns")
      assert(rows(a) == rows(b), s"$what rows")
    }
    law(EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref"),
      EvalMetrics.bleuComponentsShuffled(pairs, "pair_id", "cand", "ref"),
      "bleuComponents")
    law(EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", maxN = 3),
      EvalMetrics.rougeNShuffled(pairs, "pair_id", "cand", "ref", maxN = 3),
      "rougeN")
    law(EvalMetrics.chrF(pairs, "pair_id", "cand", "ref", maxN = 3, maxChars = 10),
      EvalMetrics.chrFShuffled(pairs, "pair_id", "cand", "ref", maxN = 3, maxChars = 10),
      "chrF (truncating)")
    law(EvalMetrics.chrF(pairs, "pair_id", "cand", "ref", maxN = 2, maxChars = 2000),
      EvalMetrics.chrFShuffled(pairs, "pair_id", "cand", "ref", maxN = 2, maxChars = 2000),
      "chrF (untruncated)")
    // multi-ref: two refs per pair incl. a duplicated ref (max-clip must
    // not double-count), a length tie (BP picks the shorter), and a
    // pair with no reference row (drops in both forms)
    val cands = Seq((1L, "the cat the cat"), (2L, "a b c d"), (3L, ""),
      (4L, "x y z")).toDF("pair_id", "cand")
    val refs = Seq(
      (1L, 1L, "the cat sat"), (1L, 2L, "the cat the dog"),
      (2L, 1L, "a b c d"), (2L, 2L, "a b c d"),
      (3L, 1L, "p q"), (3L, 2L, "r"))
      .toDF("pair_id", "ref_ord", "ref")
    law(EvalMetrics.bleuComponentsMultiRef(cands, refs,
        "pair_id", "cand", "ref_ord", "ref"),
      EvalMetrics.bleuComponentsMultiRefShuffled(cands, refs,
        "pair_id", "cand", "ref_ord", "ref"),
      "bleuComponentsMultiRef")
  }

  test("corpusChrf: per-n pooled components, beta=2 F on the pooled grid") {
    val pairs = Seq(
      (1L, "ab", "ab"), // n1: 2/2/2, n2: 1/1/1
      (2L, "abc", "ab")) // n1: m2 t3 r2, n2: m1 t2 r1
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.corpusChrf(
      EvalMetrics.chrF(pairs, "pair_id", "cand", "ref", maxN = 2))
      .collect().map(r => r.getLong(r.fieldIndex("n")) -> r).toMap
    val n1 = out(1L)
    assert(n1.getLong(n1.fieldIndex("n_pairs")) == 2L)
    assert(n1.getLong(n1.fieldIndex("matches")) == 4L)
    assert(n1.getLong(n1.fieldIndex("cand_total")) == 5L)
    assert(n1.getLong(n1.fieldIndex("ref_total")) == 4L)
    assert(n1.getLong(n1.fieldIndex("precision_permille")) == 800L)
    assert(n1.getLong(n1.fieldIndex("recall_permille")) == 1000L)
    assert(n1.getLong(n1.fieldIndex("f1_permille")) == 888L)
    // F2 = 5*800*1000 div (4*800 + 1000) = 4000000 div 4200
    assert(n1.getLong(n1.fieldIndex("f2_permille")) == 952L)
    val n2 = out(2L)
    assert(n2.getLong(n2.fieldIndex("matches")) == 2L)
    assert(n2.getLong(n2.fieldIndex("cand_total")) == 3L)
    assert(n2.getLong(n2.fieldIndex("ref_total")) == 2L)
    assert(n2.getLong(n2.fieldIndex("precision_permille")) == 666L)
    assert(n2.getLong(n2.fieldIndex("recall_permille")) == 1000L)
    assert(n2.getLong(n2.fieldIndex("f2_permille")) == 908L)
  }

  test("corpusRougeN: pooled clipped matches per n (micro-average law)") {
    val pairs = Seq(
      (1L, "a b", "a b"),
      (2L, "a", "a b"))
      .toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.corpusRougeN(
      EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", maxN = 1))
      .collect()
    assert(out.length == 1)
    val n1 = out.head
    assert(n1.getLong(n1.fieldIndex("n_pairs")) == 2L)
    assert(n1.getLong(n1.fieldIndex("matches")) == 3L)
    assert(n1.getLong(n1.fieldIndex("cand_total")) == 3L)
    assert(n1.getLong(n1.fieldIndex("ref_total")) == 4L)
    assert(n1.getLong(n1.fieldIndex("precision_permille")) == 1000L)
    assert(n1.getLong(n1.fieldIndex("recall_permille")) == 750L)
    assert(n1.getLong(n1.fieldIndex("f1_permille")) == 857L)
  }

  test("passAtKRollup: per-k means, the pass^k dual, and k>n thinning") {
    // p1: n=3 c=1; p2: n=2 c=2
    val rows = Seq((1L, true), (1L, false), (1L, false), (2L, true), (2L, true))
      .toDF("problem", "passed")
    val out = EvalMetrics.passAtKRollup(
      EvalMetrics.passAtK(rows, "problem", "passed", ks = Seq(1, 3)))
      .collect().map(r => r.getLong(0) -> r).toMap
    val k1 = out(1L)
    assert(k1.getLong(k1.fieldIndex("n_problems")) == 2L)
    // p1 pass@1 = 1e6 - floor(2e6/3) = 333334; p2 = 1e6; mean = 666667
    assert(k1.getLong(k1.fieldIndex("mean_pass_at_k_micro")) == 666667L)
    // pass^1: p1 floor(1e6/3) = 333333; p2 = 1e6; mean = 666666
    assert(k1.getLong(k1.fieldIndex("mean_pass_all_k_micro")) == 666666L)
    val k3 = out(3L)
    // p2 has n=2 < k=3: undefined, drops from the mean — visibly
    assert(k3.getLong(k3.fieldIndex("n_problems")) == 1L)
    // p1 pass@3: some draw of 3 from 3 must contain the pass -> exactly 1e6
    assert(k3.getLong(k3.fieldIndex("mean_pass_at_k_micro")) == 1000000L)
    // p1 pass^3: c=1 < k=3 -> a zero factor pins the fold to 0
    assert(k3.getLong(k3.fieldIndex("mean_pass_all_k_micro")) == 0L)
  }

  test("passAtKRollup law: means match exact rational means within k+1 micro-units") {
    val rnd = new scala.util.Random(11)
    val cases = (1 to 40).map { i =>
      val n = 1 + rnd.nextInt(20); val c = rnd.nextInt(n + 1); (i, n, c)
    }
    val rows = cases.flatMap { case (p, n, c) =>
      Seq.fill(c)((p.toLong, true)) ++ Seq.fill(n - c)((p.toLong, false))
    }
    val ks = Seq(1, 4, 9)
    val out = EvalMetrics.passAtKRollup(
      EvalMetrics.passAtK(rows.toDF("problem", "passed"), "problem", "passed", ks))
      .collect().map(r => r.getLong(0) -> r).toMap
    def comb(a: Int, b: Int): BigInt =
      if (b < 0 || b > a) BigInt(0)
      else (0 until b).map(i => BigInt(a - i)).product / (1 to b).map(BigInt(_)).product
    for (k <- ks) {
      val defined = cases.filter { case (_, n, _) => k <= n }
      val r = out(k.toLong)
      assert(r.getLong(r.fieldIndex("n_problems")) == defined.size.toLong)
      // each per-problem fold sits within k micro-units of the exact
      // rational; the mean inherits that, plus one more floor at the div
      val exactAtK = defined.map { case (_, n, c) =>
        BigInt(1000000) - BigInt(1000000) * comb(n - c, k) / comb(n, k)
      }.sum / defined.size
      val gotAtK = BigInt(r.getLong(r.fieldIndex("mean_pass_at_k_micro")))
      assert((gotAtK - exactAtK).abs <= k + 1,
        s"k=$k pass@k mean got=$gotAtK exact~$exactAtK")
      val exactAllK = defined.map { case (_, n, c) =>
        BigInt(1000000) * comb(c, k) / comb(n, k)
      }.sum / defined.size
      val gotAllK = BigInt(r.getLong(r.fieldIndex("mean_pass_all_k_micro")))
      assert((gotAllK - exactAllK).abs <= k + 1,
        s"k=$k pass^k mean got=$gotAllK exact~$exactAllK")
    }
  }

  test("bertScore: per-unit max matching, integer means, signed-F1 guard") {
    // pair 1: cand {[1,0],[0,2]}, ref {[2,0],[1,1]} — hand-traced dots;
    // pair 2: one negative-dot unit each side -> F1 undefined (NULL);
    // pair 3: candidate side only -> no defined matching, no row
    val cand = Seq(
      (1L, 0L, Seq(1.0, 0.0)), (1L, 2L, Seq(0.0, 2.0)),
      (2L, 0L, Seq(-1.0, 0.0)),
      (3L, 0L, Seq(1.0, 1.0)))
      .toDF("pair_id", "unit_id", "vec")
    val ref = Seq(
      (1L, 1L, Seq(2.0, 0.0)), (1L, 3L, Seq(1.0, 1.0)),
      (2L, 1L, Seq(1.0, 0.0)))
      .toDF("pair_id", "unit_id", "vec")
    val out = EvalMetrics.bertScore(cand, ref, "pair_id", "unit_id", "vec")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val p1 = out(1L)
    assert(p1.getLong(p1.fieldIndex("n_cand")) == 2L)
    assert(p1.getLong(p1.fieldIndex("n_ref")) == 2L)
    // ref [2,0]: best dot = 2 (vs [1,0]); ref [1,1]: best = 2 (vs [0,2])
    assert(p1.getLong(p1.fieldIndex("recall_sum")) == 4L)
    // cand [1,0]: best = 2; cand [0,2]: best = 2
    assert(p1.getLong(p1.fieldIndex("precision_sum")) == 4L)
    assert(p1.getLong(p1.fieldIndex("recall_mean")) == 2L)
    assert(p1.getLong(p1.fieldIndex("precision_mean")) == 2L)
    assert(p1.getLong(p1.fieldIndex("f1")) == 2L)
    val p2 = out(2L)
    assert(p2.getLong(p2.fieldIndex("precision_mean")) == -1L)
    assert(p2.isNullAt(p2.fieldIndex("f1")), "signed means have no harmonic F1")
  }

  test("bertScoreIdf: uniform weights reproduce bertScore; idf weights tilt the means; missing keys take the default") {
    val cand = Seq(
      (1L, 0L, 10L, Seq(1.0, 0.0)), (1L, 2L, 11L, Seq(0.0, 2.0)))
      .toDF("pair_id", "unit_id", "key", "vec")
    val ref = Seq(
      (1L, 1L, 10L, Seq(2.0, 0.0)), (1L, 3L, 11L, Seq(1.0, 1.0)))
      .toDF("pair_id", "unit_id", "key", "vec")
    // uniform-weight law: any constant W > 0 gives floor(W*S / W*n) =
    // floor(S/n) — identical means and F1 to the unweighted operator
    val uni = Seq((10L, 777000L), (11L, 777000L)).toDF("key", "wm")
    val got = EvalMetrics.bertScoreIdf(cand, ref, "pair_id", "unit_id",
      "vec", "key", uni, "key", "wm").collect().head
    val base = EvalMetrics.bertScore(cand, ref, "pair_id", "unit_id", "vec")
      .collect().head
    Seq("precision_mean", "recall_mean", "f1").foreach { f =>
      assert(got.getLong(got.fieldIndex(f)) == base.getLong(base.fieldIndex(f)), f)
    }
    // non-uniform weights: ref2's bests vs cand {[1,0],[0,2]} are
    // unit1 (key 10) -> 2 and unit3 (key 11) -> 1, so a 9:1 weighting
    // pools to Σw·best = 9e6·2 + 1e6·1 = 19e6 over Σw = 10e6
    val ref2 = Seq(
      (1L, 1L, 10L, Seq(2.0, 0.0)), (1L, 3L, 11L, Seq(0.0, 0.5)))
      .toDF("pair_id", "unit_id", "key", "vec")
    val w96 = Seq((10L, 9000000L), (11L, 1000000L)).toDF("key", "wm")
    val tilted = EvalMetrics.bertScoreIdf(cand, ref2, "pair_id", "unit_id",
      "vec", "key", w96, "key", "wm").collect().head
    assert(tilted.getLong(tilted.fieldIndex("recall_wsum")) == 10000000L)
    // weighted dot = 9e6*2 + 1e6*1 = 19e6 -> mean floor(19e6/10e6) = 1
    assert(tilted.getLong(tilted.fieldIndex("recall_mean")) == 1L)
    // missing key: drop key 11 from the table -> it takes the explicit
    // default (2e6 here), recall_wsum = 9e6 + 2e6
    val partial = Seq((10L, 9000000L)).toDF("key", "wm")
    val miss = EvalMetrics.bertScoreIdf(cand, ref2, "pair_id", "unit_id",
      "vec", "key", partial, "key", "wm",
      missingWeightMicro = 2000000L).collect().head
    assert(miss.getLong(miss.fieldIndex("recall_wsum")) == 11000000L)
  }

  test("idfWeightsMicro: rational inverse-frequency on the micro grid, smoothed") {
    // 3 documents; key 'a' in all 3, 'b' in 1 -> N=3:
    // idf(a) = (4*1e6)//4 = 1e6; idf(b) = (4*1e6)//2 = 2e6
    val units = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"), (3L, "a"))
      .toDF("doc", "key")
    val w = EvalMetrics.idfWeightsMicro(units, "doc", "key")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w("a") == ((3L, 1000000L)))
    assert(w("b") == ((1L, 2000000L)))
  }

  test("distinctN: corpus-level distinct share per n") {
    val docs = Seq("a b a", "b c").toDF("text")
    val out = EvalMetrics.distinctN(docs, "text", maxN = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val n1 = out(1L)
    assert(n1.getLong(n1.fieldIndex("total_grams")) == 5L)
    assert(n1.getLong(n1.fieldIndex("distinct_grams")) == 3L)
    assert(n1.getLong(n1.fieldIndex("distinct_permille")) == 600L)
    val n2 = out(2L)
    assert(n2.getLong(n2.fieldIndex("total_grams")) == 3L)
    assert(n2.getLong(n2.fieldIndex("distinct_grams")) == 3L)
    assert(n2.getLong(n2.fieldIndex("distinct_permille")) == 1000L)
  }

  test("ngramNovelty + corpusNovelty: instance-level novelty vs the reference gram set") {
    val gen = Seq((10L, "a b c"), (20L, "x y")).toDF("doc_id", "text")
    val ref = Seq((1L, "a b q"), (2L, "c d")).toDF("doc_id", "text")
    val perDoc = EvalMetrics.ngramNovelty(gen, "text", "doc_id", ref, "text", maxN = 2)
    val out = perDoc.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val d10n1 = out((10L, 1L)) // a, b, c all present in the reference
    assert(d10n1.getLong(d10n1.fieldIndex("total_grams")) == 3L)
    assert(d10n1.getLong(d10n1.fieldIndex("novel_grams")) == 0L)
    assert(d10n1.getLong(d10n1.fieldIndex("novelty_permille")) == 0L)
    val d10n2 = out((10L, 2L)) // "a b" known, "b c" never appears
    assert(d10n2.getLong(d10n2.fieldIndex("novel_grams")) == 1L)
    assert(d10n2.getLong(d10n2.fieldIndex("novelty_permille")) == 500L)
    val d20n1 = out((20L, 1L)) // x, y entirely novel
    assert(d20n1.getLong(d20n1.fieldIndex("novelty_permille")) == 1000L)
    val corpus = EvalMetrics.corpusNovelty(perDoc).collect()
      .map(r => r.getLong(0) -> r).toMap
    val c1 = corpus(1L)
    assert(c1.getLong(c1.fieldIndex("n_docs")) == 2L)
    assert(c1.getLong(c1.fieldIndex("total_grams")) == 5L)
    assert(c1.getLong(c1.fieldIndex("novel_grams")) == 2L)
    assert(c1.getLong(c1.fieldIndex("novelty_permille")) == 400L)
    val c2 = corpus(2L)
    assert(c2.getLong(c2.fieldIndex("total_grams")) == 3L)
    assert(c2.getLong(c2.fieldIndex("novel_grams")) == 2L)
    assert(c2.getLong(c2.fieldIndex("novelty_permille")) == 666L)
  }

  test("pairedBootstrapBleu: identical systems tie; a dominant system wins every defined replicate") {
    val refs = (1L to 20L).map(i => (i, s"w$i a b c d e f g"))
    val compA = EvalMetrics.bleuComponents(
      refs.map { case (i, t) => (i, t, t) }.toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref")
    def counts(r: Row): Map[String, Long] =
      Seq("n_replicates", "defined", "a_wins", "b_wins", "ties", "undefined")
        .map(f => f -> r.getLong(r.fieldIndex(f))).toMap
    val same = counts(
      EvalMetrics.pairedBootstrapBleu(compA, compA, replicates = 16).collect().head)
    assert(same("n_replicates") == 16L)
    assert(same("a_wins") == 0L && same("b_wins") == 0L)
    assert(same("ties") == same("defined"))
    assert(same("defined") + same("undefined") == 16L)
    // system B shares no token with the references: geo 0 wherever
    // defined, so A wins every replicate both systems define
    val compB = EvalMetrics.bleuComponents(
      refs.map { case (i, t) => (i, "z y x z y x z y", t) }
        .toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref")
    val dom = counts(
      EvalMetrics.pairedBootstrapBleu(compA, compB, replicates = 16).collect().head)
    assert(dom("a_wins") == dom("defined") && dom("defined") > 0L)
    assert(dom("b_wins") == 0L && dom("ties") == 0L)
    val row = EvalMetrics.pairedBootstrapBleu(compA, compB, replicates = 16)
      .collect().head
    assert(row.getLong(row.fieldIndex("a_win_permille")) == 1000L)
  }

  test("pairedBootstrapMetric: identity ties, dominance wins, NULL pairs drop visibly") {
    val a = (1L to 20L).map(i => (i, Some(800L + (i % 3))))
      .map { case (i, m) => (i, m.map(Long.box).orNull) }.toDF("pair_id", "m")
    def counts(r: Row): Map[String, Long] =
      Seq("n_pairs_used", "n_replicates", "defined", "a_wins", "b_wins",
        "ties", "undefined").map(f => f -> r.getLong(r.fieldIndex(f))).toMap
    val same = counts(EvalMetrics.pairedBootstrapMetric(a, a, "pair_id", "m",
      replicates = 16).collect().head)
    assert(same("n_pairs_used") == 20L && same("n_replicates") == 16L)
    assert(same("a_wins") == 0L && same("b_wins") == 0L)
    assert(same("ties") == same("defined"))
    // uniformly worse system, with 5 NULL scores -> those pairs drop
    val b = (1L to 20L).map(i =>
        (i, if (i % 4 == 0) null else Long.box(500L)))
      .toDF("pair_id", "m")
    val dom = counts(EvalMetrics.pairedBootstrapMetric(a, b, "pair_id", "m",
      replicates = 16).collect().head)
    assert(dom("n_pairs_used") == 15L)
    assert(dom("a_wins") == dom("defined") && dom("defined") > 0L)
    assert(dom("b_wins") == 0L && dom("ties") == 0L)
  }

  test("bleuComponentsMultiRef: max-over-refs clip, closest-ref BP length, shorter on ties") {
    // cand "a a a b"; ref1 "a" (a x1), ref2 "a a c" (a x2):
    // clip on max-over-refs -> min(3, 2) + min(1, 0) = 2 of 4
    val cands = Seq((1L, "a a a b")).toDF("pair_id", "cand")
    val refs = Seq((1L, 1L, "a"), (1L, 2L, "a a c"))
      .toDF("pair_id", "ref_ord", "ref")
    val out = EvalMetrics.bleuComponentsMultiRef(cands, refs,
      "pair_id", "cand", "ref_ord", "ref").collect().head
    assert(out.getLong(out.fieldIndex("matches_1")) == 2L)
    assert(out.getLong(out.fieldIndex("total_1")) == 4L)
    assert(out.getLong(out.fieldIndex("cand_len")) == 4L)
    // closest length to 4 among {1, 3} is 3
    assert(out.getLong(out.fieldIndex("ref_len")) == 3L)
    // a length tie goes to the SHORTER reference (sacrebleu's rule):
    // cand len 3, ref lens {4, 2} both at distance 1 -> 2
    val o2 = EvalMetrics.bleuComponentsMultiRef(
      Seq((1L, "x y z")).toDF("pair_id", "cand"),
      Seq((1L, 1L, "x y w q"), (1L, 2L, "x y")).toDF("pair_id", "ref_ord", "ref"),
      "pair_id", "cand", "ref_ord", "ref").collect().head
    assert(o2.getLong(o2.fieldIndex("ref_len")) == 2L)
    // a candidate with no reference rows drops (undefined, not zero)
    val only1 = EvalMetrics.bleuComponentsMultiRef(
      Seq((1L, "a"), (2L, "b")).toDF("pair_id", "cand"),
      Seq((1L, 1L, "a")).toDF("pair_id", "ref_ord", "ref"),
      "pair_id", "cand", "ref_ord", "ref")
    assert(only1.count() == 1L)
  }

  test("multi-reference single-ref law: one reference reproduces the single-ref operators column-for-column") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on a mat"),
      (2L, "a b c d e f g h", "a b c x e f g h"),
      (3L, "", "x y"),
      (4L, "q r s", "")).toDF("pair_id", "cand", "ref")
    val cands = pairs.select(col("pair_id"), col("cand"))
    val refs = pairs.select(col("pair_id"), lit(1L).as("ref_ord"), col("ref"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(EvalMetrics.bleuComponentsMultiRef(cands, refs,
        "pair_id", "cand", "ref_ord", "ref")) ==
      rows(EvalMetrics.bleuComponents(pairs, "pair_id", "cand", "ref")))
    def prf(df: org.apache.spark.sql.DataFrame) = df
      .select("pair_id", "n", "precision_permille", "recall_permille",
        "f1_permille")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    assert(prf(EvalMetrics.rougeNMultiRef(cands, refs,
        "pair_id", "cand", "ref_ord", "ref", maxN = 2)) ==
      prf(EvalMetrics.rougeN(pairs, "pair_id", "cand", "ref", maxN = 2)))
    def prf2(df: org.apache.spark.sql.DataFrame) = df
      .select("pair_id", "n", "precision_permille", "recall_permille",
        "f1_permille", "f2_permille")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    assert(prf2(EvalMetrics.chrFMultiRef(cands, refs,
        "pair_id", "cand", "ref_ord", "ref", maxN = 3, maxChars = 100)) ==
      prf2(EvalMetrics.chrF(pairs, "pair_id", "cand", "ref",
        maxN = 3, maxChars = 100)))
    // and the corpus rollup accepts the multi-ref components unchanged
    val corpus = EvalMetrics.corpusBleu(EvalMetrics.bleuComponentsMultiRef(
      cands, refs, "pair_id", "cand", "ref_ord", "ref")).collect().head
    assert(corpus.getLong(corpus.fieldIndex("n_pairs")) == 4L)
    // ROUGE-L: same P/R/F per pair as the single-ref DP
    def prl(df: org.apache.spark.sql.DataFrame) = df
      .select("pair_id", "precision_permille", "recall_permille",
        "f1_permille")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(prl(EvalMetrics.rougeLMultiRef(cands, refs,
        "pair_id", "cand", "ref_ord", "ref", maxTokens = 40)) ==
      prl(EvalMetrics.rougeL(pairs, "pair_id", "cand", "ref", maxTokens = 40)))
    // TER: one ref's average length IS its length, min edits its edits
    val tm = EvalMetrics.terMultiRef(cands, refs,
      "pair_id", "cand", "ref_ord", "ref", maxTokens = 40)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ts = EvalMetrics.terComponents(pairs, "pair_id", "cand", "ref",
      maxTokens = 40).collect().map(r => r.getLong(0) -> r).toMap
    ts.foreach { case (id, s) =>
      val m = tm(id)
      assert(m.getLong(m.fieldIndex("edit_ops")) ==
        s.getLong(s.fieldIndex("edit_ops")), s"edit_ops pair $id")
      assert(m.getLong(m.fieldIndex("avg_ref_len")) ==
        s.getLong(s.fieldIndex("ref_len")), s"ref_len pair $id")
      assert(m.isNullAt(m.fieldIndex("ter_permille")) ==
        s.isNullAt(s.fieldIndex("ter_permille")), s"ter null pair $id")
      if (!s.isNullAt(s.fieldIndex("ter_permille")))
        assert(m.getLong(m.fieldIndex("ter_permille")) ==
          s.getLong(s.fieldIndex("ter_permille")), s"ter pair $id")
    }
  }

  test("terMultiRef: min edits over refs, truncated-average length denominator") {
    // cand "a b c"; ref1 "a b c d e" (2 edits: insert d, e... edit_ops
    // = 2), ref2 "a x c" (1 edit: substitute) -> min edits 1; avg ref
    // len = (5 + 3) div 2 = 4 -> ter = 1000 div 4 = 250
    val out = EvalMetrics.terMultiRef(
      Seq((1L, "a b c")).toDF("pair_id", "cand"),
      Seq((1L, 1L, "a b c d e"), (1L, 2L, "a x c"))
        .toDF("pair_id", "ref_ord", "ref"),
      "pair_id", "cand", "ref_ord", "ref").collect().head
    assert(out.getLong(out.fieldIndex("n_refs")) == 2L)
    assert(out.getLong(out.fieldIndex("edit_ops")) == 1L)
    assert(out.getLong(out.fieldIndex("avg_ref_len")) == 4L)
    assert(out.getLong(out.fieldIndex("ter_permille")) == 250L)
  }

  test("rougeNMultiRef: per-metric max over references, coverage-aware n_refs") {
    // cand "a b"; ref1 "a": P=500 R=1000 F=666; ref2 "a b c d": P=1000
    // R=500 F=666 -> maxes are per metric (P=1000 AND R=1000), not the
    // scores of one argmax reference
    val out = EvalMetrics.rougeNMultiRef(
      Seq((1L, "a b")).toDF("pair_id", "cand"),
      Seq((1L, 1L, "a"), (1L, 2L, "a b c d")).toDF("pair_id", "ref_ord", "ref"),
      "pair_id", "cand", "ref_ord", "ref", maxN = 2)
      .collect().map(r => r.getLong(r.fieldIndex("n")) -> r).toMap
    val n1 = out(1L)
    assert(n1.getLong(n1.fieldIndex("n_refs")) == 2L)
    assert(n1.getLong(n1.fieldIndex("precision_permille")) == 1000L)
    assert(n1.getLong(n1.fieldIndex("recall_permille")) == 1000L)
    assert(n1.getLong(n1.fieldIndex("f1_permille")) == 666L)
    // n=2: ref1 has no bigram (recall NULL there, ignored by max)
    val n2 = out(2L)
    assert(n2.getLong(n2.fieldIndex("recall_permille")) == 333L)
    assert(n2.getLong(n2.fieldIndex("precision_permille")) == 1000L)
  }

  test("bootstrapDeltaCi: order-statistics bounds, permille drop rule, NULL deltas drop visibly") {
    // hand frame: deltas 1..200 ascending -> drop 200*25//1000 = 5 each
    // side -> lo = 6th smallest = 6, hi = 195, lower median = 100
    val reps = (1L to 200L).map(i => (i, i)).toDF("replicate", "delta")
    val ci = EvalMetrics.bootstrapDeltaCi(reps, "delta").collect().head
    assert(ci.getLong(ci.fieldIndex("n_replicates")) == 200L)
    assert(ci.getLong(ci.fieldIndex("defined")) == 200L)
    assert(ci.getLong(ci.fieldIndex("drop_each_side")) == 5L)
    assert(ci.getLong(ci.fieldIndex("delta_lo")) == 6L)
    assert(ci.getLong(ci.fieldIndex("delta_hi")) == 195L)
    assert(ci.getLong(ci.fieldIndex("delta_median")) == 100L)
    // undefined replicates (NULL delta) rank nowhere but stay counted
    val withNulls = ((1L to 10L).map(i => (i, Long.box(i))) ++
      Seq((11L, null.asInstanceOf[java.lang.Long]))).toDF("replicate", "delta")
    val ci2 = EvalMetrics.bootstrapDeltaCi(withNulls, "delta").collect().head
    assert(ci2.getLong(ci2.fieldIndex("n_replicates")) == 11L)
    assert(ci2.getLong(ci2.fieldIndex("defined")) == 10L)
    assert(ci2.getLong(ci2.fieldIndex("drop_each_side")) == 0L)
    assert(ci2.getLong(ci2.fieldIndex("delta_lo")) == 1L)
    assert(ci2.getLong(ci2.fieldIndex("delta_hi")) == 10L)
  }

  test("bootstrap replicate frames: identical systems pin the CI to [0,0]; the verdict re-derives from the frame") {
    val refs = (1L to 24L).map(i => (i, s"w$i a b c d e f g"))
    val comp = EvalMetrics.bleuComponents(
      refs.map { case (i, t) => (i, t, t) }.toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref")
    val reps = EvalMetrics.pairedBootstrapBleuReplicates(comp, comp,
      replicates = 16).collect()
    assert(reps.length == 16)
    // identical systems: every defined replicate's delta is exactly 0
    assert(reps.filter(!_.isNullAt(3)).forall(_.getLong(3) == 0L))
    val ci = EvalMetrics.bootstrapDeltaCi(
      EvalMetrics.pairedBootstrapBleuReplicates(comp, comp, replicates = 16),
      "delta").collect().head
    assert(ci.getLong(ci.fieldIndex("delta_lo")) == 0L)
    assert(ci.getLong(ci.fieldIndex("delta_hi")) == 0L)
    // the verdict is a REDUCTION of the same frame: counts must agree
    // with a hand reduction of the collected replicates
    val verdict = EvalMetrics.pairedBootstrapBleu(comp, comp,
      replicates = 16).collect().head
    val definedHand = reps.count(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(verdict.getLong(verdict.fieldIndex("defined")) == definedHand.toLong)
    assert(verdict.getLong(verdict.fieldIndex("ties")) == definedHand.toLong)
    // metric twin: dominance shows up as a strictly positive interval
    val a = (1L to 20L).map(i => (i, 800L)).toDF("pair_id", "m")
    val b = (1L to 20L).map(i => (i, 500L)).toDF("pair_id", "m")
    val mi = EvalMetrics.bootstrapDeltaCi(
      EvalMetrics.pairedBootstrapMetricReplicates(a, b, "pair_id", "m",
        replicates = 16), "delta_milli").collect().head
    // every defined resample's weighted-mean delta is exactly 300 on
    // the metric grid -> 300000 milli
    assert(mi.getLong(mi.fieldIndex("delta_lo")) == 300000L)
    assert(mi.getLong(mi.fieldIndex("delta_hi")) == 300000L)
  }

  test("pairedBootstrapMetric: a fractional metric fails loudly, never truncates") {
    // the integer contract is ENFORCED, not documented: a float metric
    // column (here 0.5) must raise, because .cast("long") would silently
    // floor it toward zero and score garbage with full confidence
    val a = (1L to 8L).map(i => (i, 700.0)).toDF("pair_id", "m")
    val b = (1L to 8L).map(i => (i, if (i == 3L) 0.5 else 500.0))
      .toDF("pair_id", "m")
    // integral doubles pass (the envelope admits any carrier type whose
    // VALUES are integers)
    val ok = EvalMetrics.pairedBootstrapMetric(a, a, "pair_id", "m",
      replicates = 4).collect().head
    assert(ok.getLong(ok.fieldIndex("n_pairs_used")) == 8L)
    val e = intercept[Exception] {
      EvalMetrics.pairedBootstrapMetric(a, b, "pair_id", "m",
        replicates = 4).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("must be integral"), s"got: $msgs")
  }

  test("bertScore dotScale: the micro grid rescues normalized-float cosines (law: scale multiplies integer dots)") {
    // unit vectors whose cosines are fractional: at dotScale = 1 every
    // similarity floors to 0/-1 (the degenerate regime the scaladoc now
    // warns about); at 1e6 the micro grid carries them
    val s = math.sqrt(0.5)
    val cand = Seq((1L, 0L, Seq(1.0, 0.0))).toDF("pair_id", "unit_id", "vec")
    val ref = Seq((1L, 1L, Seq(s, s)), (1L, 2L, Seq(0.0, 1.0)))
      .toDF("pair_id", "unit_id", "vec")
    val micro = EvalMetrics.bertScore(cand, ref, "pair_id", "unit_id", "vec",
      dotScale = 1000000L).collect().head
    // cand best = floor(1e6/sqrt2) = 707106; ref bests = 707106 and 0
    assert(micro.getLong(micro.fieldIndex("precision_sum")) == 707106L)
    assert(micro.getLong(micro.fieldIndex("recall_sum")) == 707106L)
    assert(micro.getLong(micro.fieldIndex("recall_mean")) == 353553L)
    // integer vectors: scale multiplies the (already integral) dots
    // exactly, so scaled = unscaled x scale column-for-column
    val ci = Seq((1L, 0L, Seq(1.0, 2.0)), (1L, 2L, Seq(3.0, 0.0)))
      .toDF("pair_id", "unit_id", "vec")
    val ri = Seq((1L, 1L, Seq(2.0, 1.0)), (1L, 3L, Seq(0.0, 5.0)))
      .toDF("pair_id", "unit_id", "vec")
    val base = EvalMetrics.bertScore(ci, ri, "pair_id", "unit_id", "vec")
      .collect().head
    val scaled = EvalMetrics.bertScore(ci, ri, "pair_id", "unit_id", "vec",
      dotScale = 1000L).collect().head
    Seq("precision_sum", "recall_sum").foreach { f =>
      assert(scaled.getLong(scaled.fieldIndex(f)) ==
        1000L * base.getLong(base.fieldIndex(f)), f)
    }
  }

  test("approxRandomization: exchangeable systems give p = 1000; strong dominance drives p down") {
    // identical systems: every delta is 0, so every flipped sum equals
    // the observed 0 -> ge_count = R and the add-one p is exactly 1000
    val a = (1L to 20L).map(i => (i, 700L + (i % 3))).toDF("pair_id", "m")
    val same = EvalMetrics.approxRandomization(a, a, "pair_id", "m",
      replicates = 16).collect().head
    assert(same.getLong(same.fieldIndex("n_pairs_used")) == 20L)
    assert(same.getLong(same.fieldIndex("observed_delta")) == 0L)
    assert(same.getLong(same.fieldIndex("ge_count")) == 16L)
    assert(same.getLong(same.fieldIndex("p_permille")) == 1000L)
    // uniform +300 dominance over 20 pairs: a flipped sum matches the
    // observed only if every flip agrees (2 of 2^20 sign patterns) —
    // with the frozen draws ge_count stays (near) zero and p small
    val b = (1L to 20L).map(i => (i, 400L + (i % 3))).toDF("pair_id", "m")
    val dom = EvalMetrics.approxRandomization(a, b, "pair_id", "m",
      replicates = 32).collect().head
    assert(dom.getLong(dom.fieldIndex("observed_delta")) == 6000L)
    assert(dom.getLong(dom.fieldIndex("ge_count")) <= 1L)
    assert(dom.getLong(dom.fieldIndex("p_permille")) <= 61L)
    // NULL metrics drop visibly, the bootstrap convention
    val withNull = (1L to 20L).map(i =>
      (i, if (i == 5L) null else Long.box(500L))).toDF("pair_id", "m")
    val thin = EvalMetrics.approxRandomization(a, withNull, "pair_id", "m",
      replicates = 8).collect().head
    assert(thin.getLong(thin.fieldIndex("n_pairs_used")) == 19L)
  }

  test("mcnemarTest: discordant counts drive the statistic; identical systems are undefined; NULLs drop visibly") {
    // 20 problems: A passes 1-12, B passes 9-16 -> both_pass 4 (9-12),
    // a_only 8 (1-8), b_only 4 (13-16), both_fail 4 (17-20)
    val a = (1L to 20L).map(i => (i, i <= 12)).toDF("pair_id", "p")
    val b = (1L to 20L).map(i => (i, i >= 9 && i <= 16)).toDF("pair_id", "p")
    val out = EvalMetrics.mcnemarTest(a, b, "pair_id", "p").collect().head
    assert(out.getLong(out.fieldIndex("n_pairs_used")) == 20L)
    assert(out.getLong(out.fieldIndex("both_pass")) == 4L)
    assert(out.getLong(out.fieldIndex("both_fail")) == 4L)
    assert(out.getLong(out.fieldIndex("a_only")) == 8L)
    assert(out.getLong(out.fieldIndex("b_only")) == 4L)
    // chi2 = (8-4)^2/12 = 16/12 -> 1333 milli; corrected (|4|-1)^2/12 = 750
    assert(out.getLong(out.fieldIndex("chi2_milli")) == 1333L)
    assert(out.getLong(out.fieldIndex("chi2_corrected_milli")) == 750L)
    // identical systems: no discordant pairs -> both statistics NULL
    val same = EvalMetrics.mcnemarTest(a, a, "pair_id", "p").collect().head
    assert(same.isNullAt(same.fieldIndex("chi2_milli")))
    assert(same.isNullAt(same.fieldIndex("chi2_corrected_milli")))
    // NULL outcomes drop the pair before counting
    val bn = (1L to 20L).map(i =>
      (i, if (i == 3L) null else java.lang.Boolean.valueOf(i >= 9 && i <= 16)))
      .toDF("pair_id", "p")
    val thin = EvalMetrics.mcnemarTest(a, bn, "pair_id", "p").collect().head
    assert(thin.getLong(thin.fieldIndex("n_pairs_used")) == 19L)
    assert(thin.getLong(thin.fieldIndex("a_only")) == 7L)
  }

  test("seqRepN: per-document repetition shares (Welleck rep-n)") {
    val docs = Seq((1L, "a a a b"), (2L, "x")).toDF("doc_id", "text")
    val out = EvalMetrics.seqRepN(docs, "text", "doc_id", maxN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val d1n1 = out((1L, 1L)) // 4 unigrams, 2 distinct
    assert(d1n1.getLong(d1n1.fieldIndex("total_grams")) == 4L)
    assert(d1n1.getLong(d1n1.fieldIndex("distinct_grams")) == 2L)
    assert(d1n1.getLong(d1n1.fieldIndex("rep_permille")) == 500L)
    val d1n2 = out((1L, 2L)) // "a a", "a a", "a b"
    assert(d1n2.getLong(d1n2.fieldIndex("total_grams")) == 3L)
    assert(d1n2.getLong(d1n2.fieldIndex("distinct_grams")) == 2L)
    assert(d1n2.getLong(d1n2.fieldIndex("rep_permille")) == 334L)
    val d2n1 = out((2L, 1L))
    assert(d2n1.getLong(d2n1.fieldIndex("rep_permille")) == 0L)
    assert(!out.contains((2L, 2L)), "one token has no bigram row")
  }

  test("incrementalNovelty over a prebuilt index == one-shot ngramNovelty (law)") {
    val docs = (1L to 40L).map(i => (i, s"tok$i common a b tok${i % 7}"))
      .toDF("doc_id", "text")
    val gen = docs.where(col("doc_id") % 5 === 0)
    val ref = docs.where(col("doc_id") % 5 =!= 0)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    val oneShot = rows(EvalMetrics.ngramNovelty(gen, "text", "doc_id",
      ref, "text", maxN = 2))
    val viaIndex = rows(EvalMetrics.incrementalNovelty(gen, "text", "doc_id",
      EvalMetrics.noveltyIndex(ref, "text", maxN = 2)))
    assert(oneShot == viaIndex && oneShot.nonEmpty)
  }

  test("selfBleuPairs: duplicate ids are rejected eagerly (derangement precondition)") {
    val docs = Seq((1L, "a b"), (1L, "c d"), (2L, "e f"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      EvalMetrics.selfBleuPairs(docs, "text", "doc_id", peers = 1)
    }
    assert(ex.getMessage.contains("unique"), ex.getMessage)
  }

  test("mmrSelect: lambda=1 degenerates to exact top-k (law)") {
    val corpus = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(0.9, 0.1)), (3L, vec(0.0, 1.0)),
      (4L, vec(0.5, 0.5)), (5L, vec(-1.0, 0.0)))
      .toDF("id", "vec")
    val q = vec(1.0, 0.0)
    val mmr = Similarity.mmrSelect(corpus, "vec", "id", q, k = 3,
      lambdaPermille = 1000).orderBy("rank").collect().map(_.getLong(1))
    val topk = Similarity.bruteForceTopK(
      Seq((99L, q)).toDF("id", "vec"), corpus, k = 3, excludeSelf = false)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(mmr.toSeq == topk.toSeq)
  }

  test("mmrSelect: diversity term spreads picks across clusters") {
    // two tight clusters near the query; plain top-2 stays in cluster A,
    // MMR's second pick crosses to cluster B
    val corpus = Seq(
      (1L, vec(1.0, 0.05)), (2L, vec(1.0, 0.06)), // cluster A (nearest)
      (3L, vec(0.7, 0.7)), (4L, vec(0.7, 0.71))) // cluster B
      .toDF("id", "vec")
    val q = vec(1.0, 0.0)
    val picks = Similarity.mmrSelect(corpus, "vec", "id", q, k = 2,
      lambdaPermille = 300).orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(picks.head == 1L)
    assert(Set(3L, 4L).contains(picks(1)),
      s"second MMR pick should cross clusters, got $picks")
    val plain = Similarity.mmrSelect(corpus, "vec", "id", q, k = 2,
      lambdaPermille = 1000).orderBy("rank").collect().map(_.getLong(1)).toSet
    assert(plain == Set(1L, 2L), "top-k without diversity stays in cluster A")
  }

  test("mmrSelect: stops early when the corpus runs out") {
    val corpus = Seq((1L, vec(1.0, 0.0)), (2L, vec(0.0, 1.0))).toDF("id", "vec")
    val out = Similarity.mmrSelect(corpus, "vec", "id", vec(1.0, 0.0), k = 5)
    assert(out.count() == 2L)
  }

  // ---------------------------------------------------- Bradley-Terry

  test("bradleyTerry: dominant winner normalizes to 1e6, shut-out fits 0") {
    val j = Seq((0L, 1L), (0L, 1L), (0L, 1L)).toDF("winner", "loser")
    val out = Curation.bradleyTerry(j, "winner", "loser", iters = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(out(0L).fieldIndex("skill_micro")) == 1000000L)
    assert(out(1L).getLong(out(1L).fieldIndex("skill_micro")) == 0L)
    assert(out(0L).getLong(out(0L).fieldIndex("wins")) == 3L)
    assert(out(0L).getLong(out(0L).fieldIndex("games")) == 3L)
    assert(out(1L).getLong(out(1L).fieldIndex("wins")) == 0L)
  }

  test("bradleyTerry: symmetric record fits equal skills (law)") {
    val j = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 0L)).toDF("winner", "loser")
    val skills = Curation.bradleyTerry(j, "winner", "loser", iters = 4)
      .select("skill_micro").collect().map(_.getLong(0)).toSet
    assert(skills == Set(1000000L))
  }

  test("bradleyTerry: strength orders beyond win counts") {
    // A beats B 2-1; B beats C 3-0: wins(A)=2, wins(B)=4 — win COUNTS rank
    // B first, but strength must rank A > B (A leads the head-to-head and
    // B's wins come from the weakest player) — the Copeland-vs-BT gap
    val j = Seq((0L, 1L), (0L, 1L), (1L, 0L),
      (1L, 2L), (1L, 2L), (1L, 2L)).toDF("winner", "loser")
    val out = Curation.bradleyTerry(j, "winner", "loser", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("skill_micro"))).toMap
    assert(out(0L) > out(1L), s"A must out-skill B: $out")
    assert(out(1L) > out(2L), s"B must out-skill C: $out")
  }

  test("bradleyTerry: self-games and nulls are dropped") {
    val j = Seq((Some(0L), Some(0L)), (Some(0L), Some(1L)), (None, Some(1L)))
      .toDF("winner", "loser")
    val out = Curation.bradleyTerry(j, "winner", "loser", iters = 2)
    assert(out.agg(sum("games")).head().getLong(0) == 2L) // the one real game
  }

  // --------------------------------------------------- shard manifest

  test("shardManifest: partition-layout invariance + digest sensitivity") {
    val docs = (1L to 100L).map(i => (i, s"payload-$i" * (i % 5 + 1).toInt))
      .toDF("doc_id", "text")
    val m1 = Profile.shardManifest(docs, "doc_id", "text", shards = 8)
      .orderBy("shard").collect()
    val m2 = Profile.shardManifest(docs.repartition(7).sortWithinPartitions(desc("text")),
      "doc_id", "text", shards = 8).orderBy("shard").collect()
    assert(m1.map(_.toString).toSeq == m2.map(_.toString).toSeq,
      "manifest must not depend on partitioning or row order")
    assert(m1.map(_.getLong(1)).sum == 100L) // n_rows covers every doc
    val shareSum = m1.map(r => r.getLong(r.fieldIndex("bytes_share_permille"))).sum
    assert(shareSum >= 1000L - m1.length && shareSum <= 1000L, // floor undershoot
      s"shares must sum to ~1000 permille, got $shareSum")

    // corrupting ONE payload moves exactly that shard's digest
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 42L, lit("CORRUPTED")).otherwise(col("text")))
    val m3 = Profile.shardManifest(corrupted, "doc_id", "text", shards = 8)
      .orderBy("shard").collect()
    val changed = m1.zip(m3).count { case (a, b) =>
      a.getLong(a.fieldIndex("digest")) != b.getLong(b.fieldIndex("digest")) }
    assert(changed == 1, s"exactly one shard digest must move, got $changed")
  }

  test("shardManifest: null payloads count zero bytes but keep their row") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("doc_id", "text")
    val m = Profile.shardManifest(docs, "doc_id", "text", shards = 1).head()
    assert(m.getLong(m.fieldIndex("n_rows")) == 2L)
    assert(m.getLong(m.fieldIndex("bytes")) == 1L)
  }
}

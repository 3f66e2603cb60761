package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE tokenizer: hand-computed fixtures, the invariants the oracle
  * gate leans on, determinism, and codegen participation. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("training learns the hand-computed merge sequence") {
    // abab x10 + ab x5: round 0 pairs are (a,b)=25, (b,a)=10 -> merge
    // (a,b); round 1 the only pair is (ab,ab)=10 -> merge (ab,ab)
    val m = Bpe.train(Seq(("abab", 10L), ("ab", 5L)), numMerges = 4)
    assert(m.ranks(("a", "b")) === 0)
    assert(m.ranks(("ab", "ab")) === 1)
    assert(Bpe.encode("abab", m) === Vector("abab"))
    assert(Bpe.encode("ab", m) === Vector("ab"))
    // merges are word-internal left-to-right: aba -> [ab, a]
    assert(Bpe.encode("aba", m) === Vector("ab", "a"))
    assert(Bpe.encode("ba", m) === Vector("b", "a"))
    assert(Bpe.countTokens("abab ab aba ba", m) === 1 + 1 + 2 + 2)
  }

  test("frequency ties break to the lexicographically smallest pair") {
    val m = Bpe.train(Seq(("dc", 1L), ("ba", 1L)), numMerges = 1)
    assert(m.ranks === Map(("b", "a") -> 0))
  }

  test("training is deterministic and stops when pairs run out") {
    val dict = Seq(("hash", 3L), ("join", 2L), ("scan", 7L))
    val a = Bpe.train(dict, numMerges = 50)
    val b = Bpe.train(dict, numMerges = 50)
    assert(a.ranks === b.ranks)
    // 3 word types x 3 adjacent pairs each = at most 9 learnable merges
    assert(a.ranks.size < 50)
  }

  test("zero merges tokenizes to characters; empty and null safe") {
    val m0 = Bpe.Model(Map.empty)
    assert(Bpe.countTokens("hash join scan", m0) === 12)
    assert(Bpe.countTokens("", m0) === 0)
    assert(Bpe.countTokens("  double  space ", m0) === 11)
    assert(Bpe.countTokens(null, m0) === 0)
    assert(Bpe.encode("", m0) === Vector.empty)
  }

  test("rank-prefix monotonicity and word floor on the real corpus") {
    import org.apache.spark.sql.functions._
    val m200 = Bpe.modelFor(spark, sf)
    val m50 = m200.truncate(50)
    val m0 = Bpe.Model(Map.empty)
    val bad = Engine.table(spark, sf, "documents")
      .select(col("text"),
        size(split(col("text"), " ")).as("n_words"),
        graft.plans.BpeCount(col("text"), m0).as("c0"),
        graft.plans.BpeCount(col("text"), m50).as("c50"),
        graft.plans.BpeCount(col("text"), m200).as("c200"))
      .filter(col("c200") > col("c50") || col("c50") > col("c0")
        || col("c200") < col("n_words"))
      .count()
    assert(bad === 0L)
    // and the 200-merge model genuinely compresses this corpus
    val Array(t200, t0) = Engine.table(spark, sf, "documents")
      .agg(sum(graft.plans.BpeCount(col("text"), m200)),
        sum(graft.plans.BpeCount(col("text"), m0)))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(t200 < t0)
  }

  test("truncate(k) is a rank prefix") {
    val m = Bpe.modelFor(spark, sf)
    val t = m.truncate(50)
    assert(t.ranks.values.forall(_ < 50))
    assert(t.ranks === m.ranks.filter(_._2 < 50))
  }

  test("property: tokens concatenate back to the word; bounds; monotone") {
    val rnd = new scala.util.Random(17)
    val alpha = "abcde" // small alphabet -> dense pair statistics
    def word() = Seq.fill(1 + rnd.nextInt(12))(
      alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 30) {
      val dict = Seq.fill(1 + rnd.nextInt(20))((word(), 1L + rnd.nextInt(9)))
      val m = Bpe.train(dict, numMerges = 1 + rnd.nextInt(40))
      val mHalf = m.truncate(m.ranks.size / 2)
      for (_ <- 1 to 40) {
        val w = word()
        val toks = Bpe.encode(w, m)
        // lossless segmentation: the tokens ARE the word, in order
        assert(toks.mkString === w, s"word $w -> $toks")
        assert(toks.nonEmpty && toks.forall(_.nonEmpty))
        // bounds + rank-prefix monotonicity on arbitrary words (seen
        // and unseen alike)
        val n = toks.length
        assert(n >= 1 && n <= w.length)
        assert(Bpe.encode(w, mHalf).length >= n,
          s"truncated model produced FEWER tokens for $w")
        // determinism
        assert(Bpe.encode(w, m) === toks)
      }
    }
  }

  test("property: incremental trainer is identical to the naive rescan trainer") {
    // the incremental trainer (pair-count deltas + lazy max-heap) must
    // produce the EXACT merge table of the full-rescan reference —
    // same pairs, same ranks, same tie-breaks — on arbitrary seeded
    // dictionaries, including heavy-tie regimes (small alphabets,
    // repeated runs like "aaaa" where overlap handling bites)
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      val alpha = if (seed % 3 == 0) "ab" else "abcd" // dense ties 1/3 of runs
      def word() = Seq.fill(1 + rnd.nextInt(14))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val dict = Seq.fill(1 + rnd.nextInt(30))((word(), 1L + rnd.nextInt(9)))
      val budget = 1 + rnd.nextInt(60)
      val inc = Bpe.train(dict, budget)
      val ref = Bpe.trainNaive(dict, budget)
      assert(inc.ranks === ref.ranks,
        s"seed=$seed budget=$budget dict=$dict")
    }
    // degenerate shapes
    assert(Bpe.train(Nil, 10).ranks === Bpe.trainNaive(Nil, 10).ranks)
    assert(Bpe.train(Seq(("x", 5L)), 10).ranks
      === Bpe.trainNaive(Seq(("x", 5L)), 10).ranks)
    assert(Bpe.train(Seq(("aaaaaaa", 3L), ("aa", 9L)), 20).ranks
      === Bpe.trainNaive(Seq(("aaaaaaa", 3L), ("aa", 9L)), 20).ranks)
  }

  test("incremental trainer handles a production-scale merge budget") {
    // the corpus dict at test scale exhausts its pairs well before 2k
    // merges; what this pins is that a big budget TERMINATES fast and
    // agrees with the reference — the wall-time ratio vs naive is the
    // PLANS.md timing row, not a test assertion (box-speed dependent)
    val wc = Engine.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val big = Bpe.train(wc, 2000)
    val ref = Bpe.trainNaive(wc, 2000)
    assert(big.ranks === ref.ranks)
    // and the 200-prefix is exactly the gated queries' model
    assert(big.truncate(200).ranks === Bpe.modelFor(spark, sf).ranks)
  }

  test("BpeCount participates in whole-stage codegen") {
    import spark.implicits._
    val m = Bpe.Model(Map(("a", "b") -> 0))
    val e = Engine.table(spark, sf, "documents")
      .select(graft.plans.BpeCount($"text", m).as("n"))
    e.collect() // finalize the adaptive plan first
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("bpecount") && l.trim.startsWith("*(")), plan.take(500))
  }
}

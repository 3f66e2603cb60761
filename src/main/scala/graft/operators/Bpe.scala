package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pure-Scala byte-pair encoding (the public BPE algorithm of
  * Sennrich/Haddow/Birch 2016, with GPT-2-style ranked-merge greedy
  * encoding) — no external deps, fully deterministic.
  *
  * Training operates on the WORD-TYPE frequency dictionary, the same
  * input every production BPE trainer consumes: the corpus collapses to
  * (word, count) via a distributed groupBy, and only that vocab-sized
  * dict (sublinear in corpus size — Heaps' law) reaches the driver.
  * At 100 TB the dict is still MBs; the corpus itself never is.
  *
  * Determinism: each round merges the pair with the highest weighted
  * frequency, ties broken by the lexicographically smallest (left,
  * right) pair — so the same corpus always yields the same merge table,
  * and the cross-engine oracle invariants (see q_llm_tokens_bpe) hold
  * reproducibly.
  *
  * Rank-prefix property (load-bearing for the oracle): `Model.truncate`
  * keeps the first k merges, and greedy lowest-rank-first encoding
  * under the full table REPLAYS the truncated table's entire merge
  * sequence before it can touch any rank >= k merge (an applicable
  * lower rank always wins). Every extra merge then strictly reduces
  * the token count, so count(full) <= count(truncated) <= count(zero
  * merges) = character count, per word and hence per document.
  */
object Bpe {

  /** A trained tokenizer: merge pair -> rank (0 = learned first). */
  final case class Model(ranks: Map[(String, String), Int])
      extends Serializable {

    /** The model with only the first `k` merges — a rank-prefix, so
      * token counts are monotonically non-increasing in k. */
    def truncate(k: Int): Model =
      Model(ranks.filter { case (_, r) => r < k })

    // per-word memo: word types repeat heavily inside a task; bounded
    // by vocab size, which is why an unbounded map is safe here
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Int]()

    private[Bpe] def cachedCount(word: String): Int = {
      // missing key unboxes to 0; real counts are >= 1 (non-empty word)
      val hit = memo.get(word)
      if (hit != 0) hit
      else {
        val n = encode(word, this).length
        memo.put(word, n)
        n
      }
    }
  }

  /** Learn `numMerges` merges from a (word, count) dictionary.
    * Stops early when no adjacent pair remains (tiny vocabularies
    * exhaust their pair inventory before the budget).
    *
    * INCREMENTAL trainer (the standard fast-BPE structure): pair
    * frequencies are maintained as running deltas — each merge
    * re-examines ONLY the word types that contain the merged pair —
    * and the round maximum comes from a lazily-invalidated max-heap.
    * Per-round cost is O(affected words + heap churn) instead of the
    * naive O(total symbols) full rescan, which is what makes a
    * production 32k-merge vocabulary tractable (the naive loop is
    * merges x corpus-dict rescans — hours at web scale). Identity
    * with the naive trainer (same merge table, same ranks, same
    * tie-breaks) is property-tested in BpeSpec against
    * [[trainNaive]]. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Model = {
    // working state: each word type as its current symbol sequence
    val words = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.toCharArray.map(_.toString).toVector, c) }
      .toArray
    type P = (String, String)
    val counts = scala.collection.mutable.HashMap[P, Long]()
    val occ = scala.collection.mutable.HashMap[P, scala.collection.mutable.Set[Int]]()
    def pairsOf(syms: Vector[String]): Iterator[P] =
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))
    // dequeue order: highest count first, ties to the lexicographically
    // smallest (left, right) — the naive trainer's exact pick
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2)
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    def bump(p: P, delta: Long): Unit = {
      val n = counts.getOrElse(p, 0L) + delta
      if (n <= 0L) { counts -= p; () }
      else {
        counts(p) = n
        heap.enqueue((n, p._1, p._2))
      }
    }
    var wi = 0
    while (wi < words.length) {
      val (syms, c) = words(wi)
      pairsOf(syms).foreach { p =>
        bump(p, c)
        occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
      }
      wi += 1
    }
    val ranks = scala.collection.mutable.LinkedHashMap[P, Int]()
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      // pop to the first LIVE entry (count still current, not stale)
      var best: P = null
      while (best == null && heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        if (counts.getOrElse((l, r), 0L) == n) best = (l, r)
      }
      if (best == null) done = true
      else {
        ranks += best -> it
        // re-derive pair contributions for ONLY the words containing
        // the merged pair; every other word's pairs are untouched
        val affected = occ.getOrElse(best, scala.collection.mutable.Set.empty)
          .toArray
        java.util.Arrays.sort(affected)
        affected.foreach { j =>
          val (oldSyms, c) = words(j)
          val newSyms = mergePair(oldSyms, best)
          words(j) = (newSyms, c)
          val oldPairs = pairsOf(oldSyms).toArray
          val newPairs = pairsOf(newSyms).toArray
          oldPairs.foreach { p =>
            bump(p, -c)
            // occ is an index of word MEMBERSHIP; drop j only for pairs
            // the word no longer contains at all
          }
          newPairs.foreach(bump(_, c))
          val newSet = newPairs.toSet
          oldPairs.iterator.filterNot(newSet).foreach { p =>
            occ.get(p).foreach { s => s -= j; if (s.isEmpty) occ -= p }
          }
          newPairs.foreach { p =>
            occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += j
          }
        }
        it += 1
      }
    }
    Model(ranks.toMap)
  }

  /** The reference O(merges x total-symbols) full-rescan trainer —
    * kept as the oracle the incremental [[train]] is property-tested
    * against (identical Model on any dictionary). */
  private[graft] def trainNaive(wordCounts: Seq[(String, Long)],
                                numMerges: Int): Model = {
    val words = wordCounts.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (w.toCharArray.map(_.toString).toVector, c) }
      .toArray
    val ranks = scala.collection.mutable.LinkedHashMap[(String, String), Int]()
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val freq = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          freq.update(p, freq.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (freq.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = freq.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 &&
              (b._1._1 < a._1._1 ||
                (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b
          else a
        }._1
        ranks += best -> it
        var j = 0
        while (j < words.length) {
          words(j) = (mergePair(words(j)._1, best), words(j)._2)
          j += 1
        }
        it += 1
      }
    }
    Model(ranks.toMap)
  }

  /** Merge every non-overlapping occurrence of `p`, left to right. */
  private def mergePair(syms: Vector[String],
                        p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Tokenize one word: start from characters, repeatedly apply the
    * LOWEST-RANK applicable merge (all its occurrences, left to right)
    * until none applies — the GPT-2 encoder's loop. */
  def encode(word: String, m: Model): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.toCharArray.map(_.toString).toVector
    var cont = true
    while (cont && syms.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = m.ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) cont = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** BPE token count of a whitespace-pretokenized text: the sum of
    * per-word token counts. Encoding never crosses a word boundary, so
    * n_words <= count <= non-space character count. */
  def countTokens(text: String, m: Model): Int = {
    if (text == null) return 0
    var total = 0
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) total += m.cachedCount(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Number of merges the corpus-trained models use. */
  val DefaultMerges = 200

  // one trained model per (sfDir, merges) per JVM — training input is
  // the deterministic word-frequency dict, so retraining would yield
  // the identical model; memoizing skips the repeated groupBy+collect
  private val modelCache =
    scala.collection.concurrent.TrieMap[(String, Int), Model]()

  /** Train (memoized) on the documents table of `dir`: distributed
    * word-type counts, then the driver-side merge loop over the
    * vocab-sized dict. */
  def modelFor(spark: SparkSession, dir: String,
               numMerges: Int = DefaultMerges): Model =
    modelCache.getOrElseUpdate((dir, numMerges), {
      val wc = graft.Engine.table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect() // vocab-sized dict (word TYPES), not the corpus
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      train(wc, numMerges)
    })
}

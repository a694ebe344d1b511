package graft

import org.apache.spark.sql.functions._

/** q57_bpe_merges: BPE vocabulary induction. Hand corpora with hand-derived
  * merge sequences, the greedy chain-merge semantics (the double-replace
  * trick), multi-char symbol safety, and determinism.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int) =
    graft.queries.TextOps.bpeMergesFrom(texts.toDF("text"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("hand corpus: merge sequence derived by hand") {
    // words: "abab" ×3, "ab" ×2, "cd" ×1  (split on space)
    val out = merges(Seq("abab abab ab", "abab ab cd"), 3)
    // round 1 pairs: (a,b): abab has 2 per occurrence ×3 =6, ab ×2 = 2 → 8
    //                (b,a): abab ×3 → 3; (c,d): 1
    assert(out(0) === ((1, "a", "b", "ab", 8L)))
    // after merge: abab → [ab, ab]; ab → [ab]; cd → [c, d]
    // round 2 pairs: (ab,ab): 3; (c,d): 1
    assert(out(1) === ((2, "ab", "ab", "abab", 3L)))
    // after merge: [abab]; round 3 only (c,d): 1
    assert(out(2) === ((3, "c", "d", "cd", 1L)))
  }

  test("chain merge: odd self-pair run merges floor(n/2) times, two-pass order") {
    // "aaaaa" = 5 a's: round-1 pair (a,a) counts 4 per word (naive
    // adjacent) ×2 words = 8. The two-pass replace merges alternate
    // occurrences: [a,a,a,a,a] → [aa, a, aa] (two merges — same count as
    // greedy, pinned symbol order). Round-2 pairs per word: (aa,a) and
    // (a,aa), 2 each across words — tie broken on a asc: ("a","aa") wins.
    val out = merges(Seq("aaaaa aaaaa"), 2)
    assert(out(0) === ((1, "a", "a", "aa", 8L)))
    assert(out(1) === ((2, "a", "aa", "aaa", 2L)))
  }

  test("multi-char symbols never false-match inside other symbols") {
    // after merging (a,b)→ab, the word "xab" = [x,a,b] merges to [x,ab];
    // a naive un-sentineled replace of "ab" would also corrupt "cab"-like
    // contexts — verify counts stay symbol-exact
    // words: "ab" ×4 → (a,b) ×4; "xab" ×3 → (x,a) + (a,b) each ×3 ⇒ (a,b)=7
    val out = merges(Seq("ab ab ab xab xab", "ab xab"), 2)
    assert(out(0) === ((1, "a", "b", "ab", 7L)))
    // round 2: "ab" → [ab] (no pairs); "xab" → [x, ab] → (x, ab) ×3
    assert(out(1) === ((2, "x", "ab", "xab", 3L)))
  }

  test("exhaustion: fewer merges than rounds when every word fully fuses") {
    // single 2-char word: round 1 merges it whole; rounds 2-3 find no pairs
    val out = merges(Seq("ab ab"), 3)
    assert(out === Seq((1, "a", "b", "ab", 2L)))
  }

  test("random corpora: engine equals a driver-side replica of the contract") {
    // the merge contract IS java.lang.String.replace applied twice on the
    // sentinel strings, so the replica is a direct transliteration — any
    // divergence is an engine-side bug, not a modelling gap
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    def replica(texts: Seq[String], rounds: Int): Seq[(Int, String, String, String, Long)] = {
      val S = "\u0001"
      var words: Map[String, Long] = texts.flatMap(_.split(" "))
        .filter(_.length >= 2)
        .groupBy(identity).map { case (w, g) =>
          (S + w.toCharArray.mkString(S) + S) -> g.size.toLong
        }
      val out = scala.collection.mutable.Buffer[(Int, String, String, String, Long)]()
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((s, wc) <- words) {
          val syms = s.split(S).filter(_.nonEmpty)
          syms.indices.dropRight(1).foreach { i =>
            counts((syms(i), syms(i + 1))) =
              counts.getOrElse((syms(i), syms(i + 1)), 0L) + wc
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
          out += ((r, a, b, a + b, cnt))
          val pat = S + a + S + b + S; val rep = S + a + b + S
          words = words.toSeq
            .map { case (s, wc) => s.replace(pat, rep).replace(pat, rep) -> wc }
            .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
          r += 1
        }
      }
      out.toSeq
    }
    val word = Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val doc = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, doc))
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(corpus) { texts =>
        merges(texts, 3) == replica(texts, 3)
      })
    assert(res.passed, res.status.toString)
  }

  test("deterministic across runs and partitionings") {
    val texts = Seq("the cat sat on the mat", "the bat and the rat", "cat bat mat")
    val a = merges(texts, 3)
    val b = merges(texts, 3)
    assert(a === b)
  }

  test("lane runs on the real corpus and rounds chain") {
    val out = graft.queries.TextOps.q57BpeMerges(spark, sf001)
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out.forall(_.getLong(4) > 0))
  }
}

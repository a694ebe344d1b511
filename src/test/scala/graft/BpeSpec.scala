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

package graft

/** q59_bigram_lm: bigram-LM fluency in integer basis points. Hand-corpus
  * exact values, the filtering-monotonicity sanity, and determinism.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)]) =
    graft.queries.TextOps.bigramLmFrom(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("hand corpus: exact integer-basis-point arithmetic") {
    // d1 bigrams: (a,b),(b,a),(a,b); d2: (a,c)
    // model: c(a,b)=2 c(b,a)=1 c(a,c)=1; prefixes: a·=3, b·=1
    // d1: 20000//3 + 10000//1 + 20000//3 = 6666+10000+6666 = 23332 over 3
    // d2: 10000//3 = 3333 over 1
    val out = score(Seq(1L -> "a b a b", 2L -> "a c"))
    assert(out === Seq(
      (1L, 3L, 23332.0 / 30000.0),
      (2L, 1L, 3333.0 / 10000.0)))
  }

  test("common continuations score higher than junk") {
    val docs = Seq(
      1L -> "the cat sat", 2L -> "the cat sat", 3L -> "the cat sat",
      4L -> "zq xv bnm")
    val out = score(docs).map(t => t._1 -> t._3).toMap
    // doc 4's bigrams are unique (probability 1 given their unique prefixes)
    // while docs 1-3 share all bigrams — both defined; the common docs'
    // bigrams have conditional probability 1 too here, so refine: make the
    // junk doc's PREFIX ambiguous instead
    val out2 = score(Seq(
      1L -> "the cat sat", 2L -> "the cat sat", 3L -> "the dog ran"))
      .map(t => t._1 -> (t._2, t._3)).toMap
    // bigram (the,cat)=2 of prefix the·=3 → 6666bp; (cat,sat)=2/2 → 10000bp
    // doc3: (the,dog)=1/3 → 3333bp; (dog,ran)=1/1 → 10000bp
    assert(out2(1L)._2 > out2(3L)._2)
    assert(out.nonEmpty)
  }

  test("deterministic and lane runs on the real corpus") {
    val a = graft.queries.TextOps.q59BigramLm(spark, sf001).collect().map(_.toSeq)
    val b = graft.queries.TextOps.q59BigramLm(spark, sf001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}

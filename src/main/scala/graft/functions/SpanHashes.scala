package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `span_hashes(toks, k)` — the rolling-hash window fingerprints behind
  * q26_span_dup: one 61-bit key per k-token window of `toks`, in O(n)
  * total instead of the O(n·k) of hashing each window's joined text whole
  * (the round-4 formulation md5'd ~50 tokens per position; VERDICT r4 #5).
  *
  * Key construction (identical in the DuckDB oracle, which replays it as
  * per-window Horner folds — bit-exactness is the contract):
  *   - per token: ht = Hash60(token) (the engine-wide md5-60bit), reduced
  *     mod two 30-bit primes p1 = 1e9+7, p2 = 1e9+9;
  *   - per window i: Horner folds H1 = fold(a*31 + ht%p1 mod p1),
  *     H2 = fold(a*37 + ht%p2 mod p2) over the k tokens in order;
  *   - key = H1 · 2³¹ + H2 (fits 61 bits; two independent moduli keep the
  *     per-pair collision odds ~k/(p1·p2) ≈ 1e-17 — the md5-60bit class —
  *     where a single 30-bit modulus would produce real phantom pairs at
  *     a few hundred thousand distinct windows).
  *
  * The Spark side never re-folds a window: H(i+1) derives from H(i) by
  * removing ht[i]·B^(k-1) and pushing ht[i+k] — all intermediates bounded
  * below 2⁶³ (max product ~1e9·1e9). Rows with fewer than k tokens yield
  * an EMPTY array (never an error), so the expression is safe wherever
  * the optimizer moves it — the round-3 short-row crash class (inferred
  * Generate filters evaluating before length guards) cannot occur.
  * Null TOKEN elements are rejected with a typed error at eval time: they
  * have no oracle-consistent hash (the SQL h60 form propagates NULL), and
  * every in-repo caller feeds split() output, which is containsNull=false.
  *
  * CodegenFallback for the usual reason: the compiled Scala loop (one md5
  * per token + O(1) arithmetic per window) dominates; lambda-free.
  */
case class SpanHashes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "span_hashes"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val k = right.eval()
      if (k == null || k.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("span_hashes k must be a positive integer literal")
      else TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects (array<string>, int literal), got ${l.sql}, ${r.sql}")
  }

  import SpanHashes._

  @transient private lazy val k: Int = right.eval().asInstanceOf[Int]
  // B^(k-1) mod p — the removal weights of the rolling update
  @transient private lazy val b1k: Long = powMod(B1, k - 1, P1)
  @transient private lazy val b2k: Long = powMod(B2, k - 1, P2)

  override protected def nullSafeEval(toksAny: Any, kAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      // A null token has no oracle-consistent hash: the SQL/DuckDB h60
      // formulation propagates NULL through the fold, while any coercion
      // here would silently diverge. In-repo callers only pass split()
      // output (containsNull=false); fail loudly for anything else.
      // Deliberate (r6 ADVICE adjudicated): skipping null tokens would
      // shift window indices off the oracle's; external SQL callers with
      // containsNull arrays must `filter(x -> x is not null)` first.
      if (t == null)
        throw new IllegalArgumentException(
          "span_hashes: null token element — filter nulls from the array first")
      val ht = Hash60(t.getBytes)
      h1(i) = ht % P1
      h2(i) = ht % P2
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    // first window: plain Horner
    var a1 = 0L; var a2 = 0L
    i = 0
    while (i < k) {
      a1 = (a1 * B1 + h1(i)) % P1
      a2 = (a2 * B2 + h2(i)) % P2
      i += 1
    }
    out(0) = (a1 << 31) + a2
    // roll: drop position i-k, push position i
    i = k
    while (i < n) {
      a1 = ((a1 - h1(i - k) * b1k % P1 + P1) % P1 * B1 + h1(i)) % P1
      a2 = ((a2 - h2(i - k) * b2k % P2 + P2) % P2 * B2 + h2(i)) % P2
      out(i - k + 1) = (a1 << 31) + a2
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SpanHashes =
    copy(left = newLeft, right = newRight)
}

object SpanHashes {
  val B1 = 31L; val P1 = 1000000007L
  val B2 = 37L; val P2 = 1000000009L

  def powMod(b: Long, e: Int, p: Long): Long = {
    var r = 1L; var base = b % p; var ex = e
    while (ex > 0) {
      if ((ex & 1) == 1) r = r * base % p
      base = base * base % p
      ex >>= 1
    }
    r
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: tokenize with POSITIONS — one output row
  * per token carrying (pos, start_char, tok). The span-annotation
  * primitive: chunking, PII span reporting, and token-aligned labels all
  * need the character offset of each token, which `posexplode(split(...))`
  * cannot produce (the split throws the offsets away; recovering them
  * downstream needs a prefix-sum window over the exploded rows — an extra
  * shuffle). Here the offsets fall out of the single forward scan that
  * tokenization already does, row-local, no shuffle.
  *
  * This is the repo's one Generator-class operator (SURVEY §2's "custom
  * `Generator` only if tokenizer-with-positions proves necessary" —
  * q23_tokens_pos makes it necessary): plans through the stock `Generate`
  * operator exactly like `explode`/`posexplode`; like `split(text, ' ')`,
  * an empty text yields ONE empty token (the reconstruct law below must
  * hold for every input), and a null text yields no rows.
  * Generate evaluates non-builtin generators interpreted (only the
  * explode family has codegen support in Spark) — acceptable: the per-row
  * work IS the tokenization; there is no expression tree underneath to
  * fuse (CodegenFallback, same stance as Spark's own `JsonTuple`/`Stack`).
  *
  * Tokenization contract: single-space split, IDENTICAL to the repo-wide
  * `split(text, ' ')` convention (consecutive spaces yield empty tokens,
  * which occupy zero chars but still advance the offset past their
  * separator) — so `collect_list(tok)` over the output reconstructs
  * `split(text, ' ')` exactly, and `substr(text, start_char+1, len(tok))
  * = tok` holds for every row. Both laws are spec-pinned and the lane's
  * DuckDB oracle recomputes the offsets independently via a prefix-sum
  * window.
  */
case class TokenizePos(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "tokenize_pos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokenize_pos expects a string column, got ${t.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("start_char", IntegerType, nullable = false),
    StructField("tok", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      // offsets in CODE POINTS (what Spark's length()/substr() and
      // DuckDB's len()/substr count), not UTF-16 units
      val parts = s.split(" ", -1) // limit -1: identical to split(text, ' ')
      val out = new Array[InternalRow](parts.length)
      var startCp = 0
      var i = 0
      while (i < parts.length) {
        val t = parts(i)
        out(i) = InternalRow(i, startCp, UTF8String.fromString(t))
        startCp += t.codePointCount(0, t.length) + 1 // token + one separator
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizePos =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup pipeline.
  *
  * Semantics are EXACTLY the engine-portable polynomial hash the DuckDB
  * oracles compute with list lambdas:
  *   h(s) = fold over chars: acc = (acc * 31 + codepoint) mod 1e9+7
  * so results stay oracle-checkable — but evaluated in one JVM pass per
  * row instead of per-element interpreted lambda trees (the lambda form
  * costs ~µs per character; these cost ~ns).
  */
object TextHash {
  val Mod = 1000000007L

  /** The 8 universal-hash (a, b) pairs of the MinHash signature and their
    * modulus — the ONE definition both sides read: QDedup's DuckDB oracle
    * fragments interpolate these, and [[MinHashSig]] evaluates them
    * natively (r12 optimization: the 8 interpreted
    * `array_min(transform(hs, hv -> (a*hv+b) % p))` lambda trees cost
    * ~µs/element × 8 passes; this is one codegen'd call per row).
    */
  val MinHashP = 100003L
  val MinHashA: Array[Long] = Array(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  val MinHashB: Array[Long] = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** All 8 minhashes of a shingle-hash array in ONE pass. Null elements
    * are skipped and an empty (or all-null) array yields null minhashes —
    * exactly `array_min(transform(...))`'s null semantics. */
  def minHashSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nh = MinHashA.length
    val out = new Array[Any](nh)
    var j = 0
    while (j < nh) {
      val a = MinHashA(j); val b = MinHashB(j)
      var m = Long.MaxValue
      var seen = false
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val v = (a * arr.getLong(i) + b) % MinHashP
          if (v < m) m = v
          seen = true
        }
        i += 1
      }
      out(j) = if (seen) m else null
      j += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def requireStringArray(
      fn: String, child: Expression): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$fn expects ARRAY<STRING>, got ${other.simpleString}")
    }

  def hashToken(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    // Advance by full codepoint: a non-BMP char must contribute exactly one
    // fold step (the oracle's string_split+unicode iterates per codepoint).
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Hash of "tok1 tok2 tok3" without materializing the concatenation. */
  def hashShingle(t1: UTF8String, t2: UTF8String, t3: UTF8String): Long = {
    var acc = 0L
    def fold(s: UTF8String): Unit = {
      val str = s.toString
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        acc = (acc * 31 + cp) % Mod
        i += Character.charCount(cp)
      }
    }
    fold(t1); acc = (acc * 31 + ' '.toInt) % Mod
    fold(t2); acc = (acc * 31 + ' '.toInt) % Mod
    fold(t3)
    acc
  }

  /** Static eval bodies shared by the interpreted and generated paths. */
  def tokenHashes(arr: ArrayData): ArrayData = {
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < out.length) {
      val s = arr.getUTF8String(i)
      out(i) = if (s == null) null else hashToken(s)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + 2 < n) {
      val (a, b, c) = (arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2))
      if (a != null && b != null && c != null) seen.add(hashShingle(a, b, c))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** All sliding word n-grams of a token array as "t1 t2 … tn" strings —
    * exactly `transform(sequence(1, size-n+1), i -> concat_ws(' ',
    * slice(toks, i, n)))` (null tokens skipped like concat_ws, result
    * empty when size < n), in one JVM pass instead of an interpreted
    * lambda + array copy per gram (r12, guide §4). */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](sz)
    var i = 0
    // isNullAt guard (ADVICE r12): UnsafeArrayData.getUTF8String reads a
    // null element as an EMPTY string, which would break the concat_ws
    // null-skip semantics below for any ARRAY<STRING> with null elements
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g < m) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        val t = toks(g + j)
        if (t != null) { // concat_ws semantics: null contributes nothing
          if (!first) sb.append(' ')
          sb.append(t.toString)
          first = false
        }
        j += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Register the expressions in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
      (children: Seq[Expression]) => TokenHashes(children.head))
    registry.registerFunction(
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head))
    registry.registerFunction(
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head))
    registry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head))
    registry.registerFunction(
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      {
        case Seq(toks, n) => WordNgrams(toks, n)
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`word_ngrams`",
            "expectedNum" -> "2",
            "actualNum" -> other.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      })
  }
}

/** `word_ngrams(array<string>, n) → array<string>` — sliding word n-grams
  * joined by single spaces; see [[TextHash.wordNgrams]]. `n` must be a
  * foldable positive integer.
  */
case class WordNgrams(tokens: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = tokens
  override def right: Expression = n
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (tokens.dataType, n.dataType, n.foldable) match {
      case (ArrayType(StringType, _), org.apache.spark.sql.types.IntegerType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects (ARRAY<STRING>, foldable INT), got $other")
    }

  override protected def nullSafeEval(toks: Any, nv: Any): Any =
    TextHash.wordNgrams(toks.asInstanceOf[ArrayData], nv.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.TextHash.wordNgrams($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, n = newRight)
}

/** `minhash_sig(array<long>) → array<long>` — the 8-hash MinHash signature
  * ([[TextHash.MinHashA]]/[[TextHash.MinHashB]] mod [[TextHash.MinHashP]])
  * in one JVM pass (== array_min(transform(hs, hv -> (aᵢ*hv+bᵢ) % p)) for
  * each i). Output element i is mhᵢ; null iff the input has no non-null
  * element (array_min of an empty projection).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects ARRAY<BIGINT>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minHashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.TextHash.minHashSig($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `poly_hash(string) → long` — the whole-string polynomial hash
  * (== aggregate(split(s, ''), 0L, (a, c) -> (a*31 + codepoint) % 1e9+7)),
  * fully codegen'd: one static call per row vs one interpreted lambda
  * invocation per CHARACTER in the HOF form (q_doc_fingerprint's doc-level
  * fingerprint walks every char of every doc).
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects STRING, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashToken(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = graft.functions.TextHash.hashToken($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_hashes(array<string>) → array<long>` — per-token polynomial hash
  * (== transform(toks, tok -> charPoly(tok))). Duplicates preserved (term
  * weighting for SimHash). Null elements map to null (same as `transform`
  * with a null-propagating lambda), so the output's containsNull mirrors
  * the input's.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _               => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "token_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextHash.requireStringArray(prettyName, child)

  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.TextHash.tokenHashes($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `shingle_hashes(array<string>) → array<long>` — DISTINCT hashes of all
  * 3-token shingles (== transform(distinct 3-shingles, charPoly)), one
  * pass, no intermediate shingle strings. Input must have ≥ 3 tokens.
  * Windows containing a null token are skipped (a null token is not a
  * shingle member), so the output never contains null.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TextHash.requireStringArray(prettyName, child)

  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.TextHash.shingleHashes($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared pieces of the word-shingle expression family.
  *
  * Tokenization is EXACTLY Spark's `split(text, '\\s+')` (which is
  * `String.split(regex, -1)` under the hood — UTF8String.split
  * delegates to it), so these expressions produce byte-identical
  * shingle strings to the SQL formulation they replace and the DuckDB
  * oracle's `string_split_regex` on the clean testdata. */
private[functions] object ShingleUtil {
  private val ws = Pattern.compile("\\s+")

  /** Shared (string, positive-int-literal) signature check for the
    * SQL-exposed shingle family — a non-positive or non-foldable
    * width must fail ANALYSIS, not throw per-row inside a task. */
  def checkTextWidth(name: String, left: Expression,
      right: Expression): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires (string, int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable || right.eval() == null ||
        right.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires a positive integer literal width")
    else TypeCheckResult.TypeCheckSuccess

  /** Tokens with Spark split semantics (limit -1: trailing empties kept). */
  def tokens(text: UTF8String): Array[String] = ws.split(text.toString, -1)

  /** Space-joined word n-grams, one per window, in document order. */
  def shingles(toks: Array[String], n: Int): Array[String] = {
    val count = toks.length - n + 1
    if (count <= 0) return Array.empty
    val out = new Array[String](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** `word_shingles(text, n)` — the document's word n-gram shingles as
  * one array, built in a single eval per DOCUMENT.
  *
  * Replaces the posexplode + 2×lead() window formulation, which
  * shuffled and sorted the ~1M-row token stream (sf0.1) just to pair
  * adjacent tokens that were already adjacent in the source string.
  * Consumers `explode` this array, so the token stream never crosses a
  * shuffle before its first aggregate — at 1000 executors the shingle
  * stage becomes embarrassingly parallel map work. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleUtil.checkTextWidth("word_shingles", left, right)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override def nullSafeEval(t: Any, n: Any): Any = {
    val sh = ShingleUtil.shingles(
      ShingleUtil.tokens(t.asInstanceOf[UTF8String]), n.asInstanceOf[Int])
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

/** `minhash8(text, n)` — the full 8-slice MinHash signature plus
  * distinct-shingle count as a struct, one eval per DOCUMENT.
  *
  * Identical semantics to the aggregate formulation (min over the
  * doc's DISTINCT shingles of each 4-hex-char slice of the shingle's
  * md5), but as a pure projection: no exploded shingle stream, no
  * hash aggregate, no shuffle — the signature stage of the LSH
  * pipeline reads the corpus once and emits one narrow row per doc.
  * Returns null when the doc has no n-token window, matching the
  * aggregate form's absent group. Hex-slice minima compare as
  * strings; fixed-width lowercase hex makes that the same order the
  * oracle's SQL `min(substring(md5(..)..))` uses. */
case class MinHash8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleUtil.checkTextWidth("minhash8", left, right)

  override def dataType: DataType = StructType(
    (0 until 8).map(j => StructField(s"m$j", StringType, nullable = false)) :+
      StructField("sz", LongType, nullable = false))

  override def nullable: Boolean = true

  override def prettyName: String = "minhash8"

  override def nullSafeEval(t: Any, n: Any): Any = {
    val sh = ShingleUtil.shingles(
      ShingleUtil.tokens(t.asInstanceOf[UTF8String]), n.asInstanceOf[Int])
    if (sh.isEmpty) return null
    val seen = new java.util.HashSet[String]()
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](8)
    var i = 0
    while (i < sh.length) {
      if (seen.add(sh(i))) {
        val hex = ShingleUtil.md5Hex(md, sh(i))
        var j = 0
        while (j < 8) {
          val slice = hex.substring(4 * j, 4 * j + 4)
          if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
          j += 1
        }
      }
      i += 1
    }
    val fields = new Array[Any](9)
    i = 0
    while (i < 8) { fields(i) = UTF8String.fromString(mins(i)); i += 1 }
    fields(8) = seen.size.toLong
    new GenericInternalRow(fields)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHash8 =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min and max md5 over a document's sliding character shingles, in
  * one pass per ROW instead of one row per WINDOW.
  *
  * The explode formulation of q_doc_fingerprint materializes
  * ~Σ n_chars rows (6M at sf0.1) through the generator and partial
  * aggregate just to keep two of them — consistently the suite's most
  * expensive query (4.4 s). This expression walks the windows inside
  * a single evaluation and returns [min_hex, max_hex], so the plan is
  * a plain projection: no generator, no aggregate, nothing but
  * |docs| rows anywhere.
  *
  * Hash semantics are IDENTICAL to the SQL form (md5 of the UTF-8
  * bytes of `substring(text, i, w)`, lowercase hex, lexicographic
  * min/max), so the DuckDB oracle is untouched and the explode form
  * remains in the spec as ground truth. CodegenFallback is deliberate:
  * the expression runs once per document (5 000 evals at sf0.1), so
  * interpreted-call overhead is noise while the win — not exploding
  * millions of rows — lives inside the eval.
  */
case class ShingleMinMaxMd5(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    ShingleUtil.checkTextWidth("shingle_minmax_md5", left, right)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // returns null for texts shorter than the window width even when
  // both inputs are non-nullable — without this override Catalyst
  // folds IsNull to false and generated code NPEs on the null array
  override def nullable: Boolean = true

  override def prettyName: String = "shingle_minmax_md5"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte-wise compare. Hex encoding is order-preserving over
    * unsigned bytes, so comparing raw digests gives exactly the
    * lexicographic order of their lowercase-hex strings — the 6M
    * per-window hex allocations happen zero times. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  override def nullSafeEval(t: Any, w: Any): Any = {
    val text = t.asInstanceOf[UTF8String]
    val width = w.asInstanceOf[Int]
    val n = text.numChars()
    if (n < width) return null
    // one UTF-8 byte image of the doc + a char->byte offset map, so
    // each window hashes a (offset, len) slice with no allocation —
    // the same bytes the SQL form's substring(text, i, w) md5's
    val bytes = text.getBytes
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(n) = bytes.length
    val md = MessageDigest.getInstance("MD5")
    val cur = new Array[Byte](16)
    var minD: Array[Byte] = null
    var maxD: Array[Byte] = null
    var i = 0
    while (i <= n - width) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + width) - offsets(i))
      md.digest(cur, 0, 16)
      if (minD == null) { minD = cur.clone(); maxD = cur.clone() }
      else if (cmp(cur, minD) < 0) System.arraycopy(cur, 0, minD, 0, 16)
      else if (cmp(cur, maxD) > 0) System.arraycopy(cur, 0, maxD, 0, 16)
      i += 1
    }
    new GenericArrayData(Array[Any](
      UTF8String.fromString(toHex(minD)), UTF8String.fromString(toHex(maxD))))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleMinMaxMd5 =
    copy(left = newLeft, right = newRight)
}

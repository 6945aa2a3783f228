package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays.
  *
  * The built-in composition `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc,v) -> acc+v)` evaluates interpreted (higher-order
  * functions don't participate in whole-stage codegen) and allocates
  * an intermediate array per row — measured ~10× slower on the
  * all-pairs similarity join. This expression generates a tight
  * primitive loop inside whole-stage codegen instead, which is the
  * custom-Expression escape hatch SURVEY.md §7.4 reserves for
  * semantics Spark's built-ins can't express *efficiently*.
  *
  * Summation is a strict left fold, matching the DuckDB oracle's
  * `list_sum` over a list comprehension bit for bit.
  *
  * Callers cast float embeddings with `CAST(x AS ARRAY<DOUBLE>)`
  * before the loop — element-wise cast then double math, the same
  * order the oracle applies.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions; idempotent, so query
  * entry points can call it unconditionally on their session. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1)))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // runtime-filter rewrite but does not expose them in the public
    // registry; surface them for the engine's incremental-dedup fast
    // path (Quality.qBloomDedup). Same builder contract as built-ins.
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2)).toAggregateExpression())
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shingle_minmax_md5"),
      new ExpressionInfo(classOf[ShingleMinMaxMd5].getName, "shingle_minmax_md5"),
      (children: Seq[Expression]) => ShingleMinMaxMd5(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash8"),
      new ExpressionInfo(classOf[MinHash8].getName, "minhash8"),
      (children: Seq[Expression]) => MinHash8(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder16"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder16"),
      (children: Seq[Expression]) => ZOrderKey(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1)))
  }
}

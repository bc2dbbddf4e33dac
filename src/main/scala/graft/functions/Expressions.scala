package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (SURVEY.md §4.3): the two places the
  * engine's semantics justify dropping below the built-in surface, both
  * with whole-stage codegen (`doGenCode`) so they stay inside the
  * generated loop — no UDF boxing, no codegen fence.
  */

/** `map_contains_all(labels, selector)` — true iff every (k,v) entry of
  * `selector` appears in `labels`. The selector-containment predicate of
  * the reference's service→pod join (E3, k8sclient.go:76-89). The engine's
  * default E3 plan is the explode+equi-join (scalable); this expression is
  * the predicate form for broadcast-size dimensions. Empty selector ⇒
  * false, matching the reference (labels.Set{} selects nothing here —
  * guarded by the caller filtering empty selectors).
  */
case class MapContainsAll(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {
  // inputs must both be map<string,string> (no ExpectsInputTypes — its
  // AbstractDataType is private[sql]; misuse fails at runtime cast)

  override def nullSafeEval(labels: Any, selector: Any): Any = {
    val l = labels.asInstanceOf[MapData]
    val s = selector.asInstanceOf[MapData]
    if (s.numElements() == 0) return false
    val lk = l.keyArray(); val lv = l.valueArray()
    val sk = s.keyArray(); val sv = s.valueArray()
    var i = 0
    while (i < s.numElements()) {
      val k = sk.getUTF8String(i)
      val v = sv.getUTF8String(i)
      var found = false
      var j = 0
      while (!found && j < l.numElements()) {
        if (lk.getUTF8String(j).equals(k) && lv.getUTF8String(j).equals(v))
          found = true
        j += 1
      }
      if (!found) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, s) => {
      val lk = ctx.freshName("lk"); val lv = ctx.freshName("lv")
      val sk = ctx.freshName("sk"); val sv = ctx.freshName("sv")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      s"""
         |${ev.value} = $s.numElements() > 0;
         |org.apache.spark.sql.catalyst.util.ArrayData $lk = $l.keyArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $lv = $l.valueArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $sk = $s.keyArray();
         |org.apache.spark.sql.catalyst.util.ArrayData $sv = $s.valueArray();
         |for (int $i = 0; ${ev.value} && $i < $s.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $k = $sk.getUTF8String($i);
         |  org.apache.spark.unsafe.types.UTF8String $v = $sv.getUTF8String($i);
         |  boolean $found = false;
         |  for (int $j = 0; !$found && $j < $l.numElements(); $j++) {
         |    $found = $lk.getUTF8String($j).equals($k) && $lv.getUTF8String($j).equals($v);
         |  }
         |  ${ev.value} = $found;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `dot_f(a, b)` — dot product of two float vectors, accumulated in
  * double, sequential in element order. The similarity-search hot path
  * (embedding dim × corpus size multiplications) as a single codegen'd
  * loop instead of the zip_with/aggregate higher-order-function chain. */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must both be array<float>
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `shingle_gen(text, n)` — custom Generator (UDTF): emits the word
  * n-shingles of `text` as rows, one UTF8String per shingle, straight
  * from the tokenizer — no intermediate array-of-strings column like
  * the transform+sequence+explode composition builds. Completes the
  * engine's extension-point triad (scalar Expression / UDAF /
  * Generator, SURVEY.md §2.2 UDF table). Generators run in GenerateExec
  * (CodegenFallback here — only collection explodes have a codegen
  * path); rows out = O(tokens) per input row, nothing driver-side. */
case class ShingleGenerator(child: Expression, n: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(Seq(StructField("sh", StringType)))

  private lazy val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    val kv = n.eval(input)
    if (s == null || kv == null) return Nil
    val k = kv.asInstanceOf[Int]
    if (k <= 0) return Nil
    val toks = s.asInstanceOf[UTF8String].split(space, -1)
    if (toks.length < k) Nil
    else (0 to toks.length - k).iterator.map { i =>
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      new GenericInternalRow(Array[Any](UTF8String.concatWs(space, parts: _*)))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

object GraftFunctions {
  import ColumnBridge.{column, expression}

  def map_contains_all(labels: Column, selector: Column): Column =
    column(MapContainsAll(expression(labels), expression(selector)))

  def dot_f(a: Column, b: Column): Column =
    column(DotProductFloat(expression(a), expression(b)))

  def shingle_gen(text: Column, n: Column): Column =
    column(ShingleGenerator(expression(text), expression(n)))

  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinklerSimilarity(expression(a), expression(b)))

  /** Register SQL names (`map_contains_all`, `dot_f`, `shingle_gen`,
    * `jaro_winkler`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Arity is checked up front so a call like jaro_winkler(x) fails
    // with a named error at analysis rather than IndexOutOfBounds
    // inside the builder.
    def binary(name: String, mk: (Expression, Expression) => Expression)(
        exprs: Seq[Expression]): Expression = {
      if (exprs.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      mk(exprs(0), exprs(1))
    }
    reg.createOrReplaceTempFunction("map_contains_all",
      binary("map_contains_all", MapContainsAll.apply), "built-in")
    reg.createOrReplaceTempFunction("dot_f",
      binary("dot_f", DotProductFloat.apply), "built-in")
    reg.createOrReplaceTempFunction("shingle_gen",
      binary("shingle_gen", ShingleGenerator.apply), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler",
      binary("jaro_winkler", JaroWinklerSimilarity.apply), "built-in")
  }
}

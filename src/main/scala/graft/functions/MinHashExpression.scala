package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for MinHash signatures — the hot inner loop
  * of MinHash+LSH dedup at corpus scale.
  *
  * The pure-Column formulation (`array_min(transform(hs, h -> (h*a+b)%p))`
  * once per permutation) evaluates Spark's higher-order functions
  * INTERPRETED, per element per permutation: |docs| × |shingles| × k
  * closure calls. This expression computes the whole k-wide signature in
  * one tight fused loop with the permutation constants in primitive
  * arrays — identical numerics ((h*a+b) mod p over 30-bit inputs, so no
  * overflow), bit-equal output, ~100× less interpreter overhead.
  *
  * Reference behavior being accelerated: the signature family of
  * SURVEY.md §M5 / Dedup.minhashFromHashes; DuckDB oracle parity is
  * preserved because the math is element-identical.
  */
case class MinHashSignature(child: Expression, as: Array[Long],
    bs: Array[Long], prime: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = as.length
    if (n == 0) {
      // parity with array_min over an empty array: null per permutation
      return new GenericArrayData(new Array[Any](k))
    }
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // All generated locals are freshName'd so multiple expression
  // instances can share one codegen context without Janino redefinition
  // errors (which would silently demote the stage to interpreted eval).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $input.numElements();
         |int $k = $aRef.length;
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $input.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  val Name = "graft_minhash"

  /** Register `graft_minhash(hashes, numHashes)`; the permutation family
    * comes from [[graft.dedup.Dedup.permutations]] resolved at plan time
    * from the literal numHashes argument. Idempotent: re-registering the
    * same builder every call would log a "replaced a previously
    * registered function" WARN per query, so an existing registration is
    * left in place.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(Name))) return
    reg.createOrReplaceTempFunction(
      Name, exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
            v.asInstanceOf[Int]
          case org.apache.spark.sql.catalyst.expressions.Literal(v, LongType) =>
            v.asInstanceOf[Long].toInt
          case other => throw new IllegalArgumentException(
            s"$Name numHashes must be a literal, got $other")
        }
        val perms = graft.dedup.Dedup.permutations(k)
        MinHashSignature(exprs(0), perms.map(_._1).toArray,
          perms.map(_._2).toArray, graft.dedup.Dedup.MinhashPrime)
      }, "built-in")
  }

  def minhash(spark: SparkSession, hashes: Column, numHashes: Int): Column = {
    register(spark)
    call_function(Name, hashes, org.apache.spark.sql.functions.lit(numHashes))
  }
}

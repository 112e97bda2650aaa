package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float-array
  * embedding columns — the hot inner loop of KNN / ANN / embedding
  * dedup. Generates a tight Java loop (whole-stage codegen) instead of
  * the interpreted zip_with+aggregate higher-order functions; identical
  * numerics (sequential double accumulation over float inputs), so
  * results are bit-equal to the pure-Column formulation and the DuckDB
  * oracle.
  *
  * This is preference tier (b) from the build guide: a custom
  * `Expression` with `doGenCode`, reached only because built-in operator
  * composition (zip_with/aggregate) cannot be codegen'd.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  // All generated locals are freshName'd: two cosine calls in one
  // projection would otherwise redeclare `i`/`n`/… and fail Janino
  // compilation, silently dropping the whole stage to interpreted eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val nn = ctx.freshName("nn")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($nn == 0.0) ? 0.0 : $dot / $nn;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Argmax-cosine index (0-based) of a float-array vector against a
  * centroid MATRIX (`array<array<float>>`) — the hot per-row step of
  * hierarchical-IVF assignment (√k cosines per level, every corpus
  * row). One codegen'd double loop replaces √k interpreted HOF cosine
  * calls plus a struct array_sort per row (measured: the HOF chain
  * cost ~0.25 ms/row at k=16384; the loop is µs-class). Numerics match
  * [[CosineSimilarity]] exactly (sequential double accumulation); ties
  * break to the LOWEST index, deterministically. A NULL matrix row
  * scores 0 (like a zero-norm centroid); an empty matrix yields 0.
  */
case class NearestCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<array<float>>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < m.numElements()) {
      var sim = 0.0
      if (!m.isNullAt(c)) {
        val row = m.getArray(c)
        val n = math.min(v.numElements(), row.numElements())
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = v.getFloat(i).toDouble
          val y = row.getFloat(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val nn = math.sqrt(na) * math.sqrt(nb)
        sim = if (nn == 0.0) 0.0 else dot / nn
      }
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val best = ctx.freshName("best"); val bestSim = ctx.freshName("bestSim")
      val c = ctx.freshName("c"); val sim = ctx.freshName("sim")
      val row = ctx.freshName("row"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val nn = ctx.freshName("nn")
      s"""
         |int $best = 0;
         |double $bestSim = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $b.numElements(); $c++) {
         |  double $sim = 0.0;
         |  if (!$b.isNullAt($c)) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($c);
         |    int $n = java.lang.Math.min($a.numElements(), $row.numElements());
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = (double) $a.getFloat($i);
         |      double $y = (double) $row.getFloat($i);
         |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |    }
         |    double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    $sim = ($nn == 0.0) ? 0.0 : $dot / $nn;
         |  }
         |  if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Two-level IVF list assignment in ONE expression:
  * `hier_cid(vec, supers, children)` = sup·kSub + argmax-cosine child
  * within the winning supercluster, where `supers` (kSup × dim) and
  * `children` (kSup × kSub × dim) must be FOLDABLE literals. The
  * literals are converted to primitive float matrices once per
  * expression instance (lazy, per executor) — the generic ArrayData
  * path pays a boxed accessor per element (measured ~130 µs/row at
  * k=16384: 16K boxed getFloat calls), while the primitive loop is
  * µs-class. Splitting the two levels into separate expressions would
  * also re-open the evaluate-sup-per-child trap (lambda bodies
  * re-evaluate non-lambda subtrees), which this fuses away entirely.
  * Ties break to the lowest index, matching [[NearestCosine]].
  */
case class HierCid(vec: Expression, supLit: Expression,
    childLit: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vec, supLit, childLit)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hier_cid"

  override def checkInputDataTypes(): TypeCheckResult = {
    val shapeOk = (vec.dataType, supLit.dataType, childLit.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(FloatType, _), _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) => true
      case _ => false
    }
    if (!shapeOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<array<float>>, " +
        "array<array<array<float>>>)")
    else if (!supLit.foldable || !childLit.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName centroid matrices must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def floats(a: ArrayData): Array[Float] = {
    val n = a.numElements(); val out = new Array[Float](n)
    var i = 0; while (i < n) { out(i) = a.getFloat(i); i += 1 }; out
  }
  @transient private lazy val sup: Array[Array[Float]] = {
    val m = supLit.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements())(i => floats(m.getArray(i)))
  }
  @transient private lazy val ch: Array[Array[Array[Float]]] = {
    val m = childLit.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { s =>
      val g = m.getArray(s)
      Array.tabulate(g.numElements())(j => floats(g.getArray(j)))
    }
  }

  private def argmax(v: ArrayData, m: Array[Array[Float]]): Int = {
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < m.length) {
      val row = m(c)
      val n = math.min(v.numElements(), row.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = row(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val nn = math.sqrt(na) * math.sqrt(nb)
      val sim = if (nn == 0.0) 0.0 else dot / nn
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v0 = vec.eval(input)
    if (v0 == null) return null
    val v = v0.asInstanceOf[ArrayData]
    val s = argmax(v, sup)
    val kSub = if (ch.isEmpty) 0 else ch(0).length
    s * kSub + argmax(v, ch(s))
  }

  // codegen: the whole two-level loop over the PRIMITIVE reference
  // matrices — the vec's float array is copied out once per row
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val supRef = ctx.addReferenceObj("hierSup", sup, "float[][]")
    val chRef = ctx.addReferenceObj("hierCh", ch, "float[][][]")
    val vecCode = vec.genCode(ctx)
    val v = ctx.freshName("v"); val s = ctx.freshName("s")
    val j = ctx.freshName("j"); val kSub = ctx.freshName("kSub")
    val am = ctx.freshName("argmaxCos")
    ctx.addNewFunction(am,
      s"""
         |private int $am(org.apache.spark.sql.catalyst.util.ArrayData v,
         |    float[][] m) {
         |  int best = 0;
         |  double bestSim = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int c = 0; c < m.length; c++) {
         |    float[] row = m[c];
         |    int n = java.lang.Math.min(v.numElements(), row.length);
         |    double dot = 0.0, na = 0.0, nb = 0.0;
         |    for (int i = 0; i < n; i++) {
         |      double x = (double) v.getFloat(i);
         |      double y = (double) row[i];
         |      dot += x * y; na += x * x; nb += y * y;
         |    }
         |    double nn = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb);
         |    double sim = (nn == 0.0) ? 0.0 : dot / nn;
         |    if (sim > bestSim) { bestSim = sim; best = c; }
         |  }
         |  return best;
         |}
       """.stripMargin)
    val code =
      code"""
         |${vecCode.code}
         |boolean ${ev.isNull} = ${vecCode.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $v = ${vecCode.value};
         |  int $s = $am($v, $supRef);
         |  int $kSub = ($chRef.length == 0) ? 0 : $chRef[0].length;
         |  int $j = $am($v, $chRef[$s]);
         |  ${ev.value} = $s * $kSub + $j;
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), supLit = newChildren(1),
      childLit = newChildren(2))
}

object VectorFunctions {
  val CosineName = "graft_cosine"
  val NearestName = "graft_nearest"
  val HierCidName = "graft_hier_cid"

  /** Register the expression in the session's function registry (the
    * Spark-4 path for building Columns from custom expressions).
    * Idempotent — re-registering logs a "replaced" WARN per query.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(CosineName)))
      reg.createOrReplaceTempFunction(
        CosineName, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(NearestName)))
      reg.createOrReplaceTempFunction(
        NearestName, exprs => NearestCosine(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(HierCidName)))
      reg.createOrReplaceTempFunction(
        HierCidName, exprs => HierCid(exprs(0), exprs(1), exprs(2)),
        "built-in")
  }

  /** Codegen'd cosine similarity column (registers on first use). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(CosineName, a, b)
  }

  /** Codegen'd argmax-cosine index column (registers on first use). */
  def nearest(spark: SparkSession, vec: Column, mat: Column): Column = {
    register(spark)
    call_function(NearestName, vec, mat)
  }

  /** Codegen'd two-level IVF list id column (registers on first use);
    * `supLit`/`childLit` must be centroid-matrix literals. */
  def hierCid(spark: SparkSession, vec: Column, supLit: Column,
      childLit: Column): Column = {
    register(spark)
    call_function(HierCidName, vec, supLit, childLit)
  }
}

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

/** [[HierCid]] with the centroid matrices as PRIMITIVE constructor
  * fields instead of literal children. The literal form pays a hidden
  * per-task tax at large k: a k=16384×64 typedLit is a
  * GenericArrayData graph of ~1M boxed java.lang.Float, and Spark
  * deserializes the task closure (plan included) PER TASK — measured
  * ~2.4 s of a 2.7 s assignment stage at 60K rows, re-paid by every
  * stage referencing the literal. Primitive float[][] fields ship as
  * compact array records instead (ms-class). Constructed through a
  * closure-capturing function registration
  * ([[VectorFunctions.hierCidRef]]) because Columns can only be built
  * from registry functions, and matrices cannot ride through
  * expression children without becoming literals again.
  */
case class HierCidRef(child: Expression, sup: Array[Array[Float]],
    ch: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hier_cid_ref"

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

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val s = argmax(v, sup)
    val kSub = if (ch.isEmpty) 0 else ch(0).length
    s * kSub + argmax(v, ch(s))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val supRef = ctx.addReferenceObj("hierSupR", sup, "float[][]")
    val chRef = ctx.addReferenceObj("hierChR", ch, "float[][][]")
    val am = ctx.freshName("argmaxCosR")
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
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val kSub = ctx.freshName("kSub")
      s"""
         |int $s = $am($a, $supRef);
         |int $kSub = ($chRef.length == 0) ? 0 : $chRef[0].length;
         |${ev.value} = $s * $kSub + $am($a, $chRef[$s]);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Query-side probe of the hierarchical IVF: the nprobe list ids of a
  * query vector — top pSup superclusters by cosine, all their children
  * ranked together, global top nprobe. Matrices ride as primitive
  * fields like [[HierCidRef]] so the probe plan carries no boxed
  * literal into the candidate join's stages. CodegenFallback by
  * design: this evaluates once per QUERY row (a handful), while the
  * corpus-sized side uses the codegen'd [[HierCidRef]]; batch-probe
  * workloads use the codegen'd [[HierProbeCidsGen]]. Ranking:
  * descending sim, exact ties to the LOWEST cid — the same tie side
  * assignment takes, so the assigned list always outranks its padded
  * duplicates.
  */
case class HierProbeCids(child: Expression, sup: Array[Array[Float]],
    ch: Array[Array[Array[Float]]], pSup: Int, nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hier_probe"

  private def cos(v: ArrayData, row: Array[Float]): Double = {
    val n = math.min(v.numElements(), row.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble; val y = row(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val kSub = if (ch.isEmpty) 0 else ch(0).length
    // descending sim; exact ties break to the LOWEST index, matching
    // assignment ([[HierCidRef]]/[[NearestCosine]] argmax keeps the
    // first best). Padded duplicate children (train() fills short
    // groups with the super's own centroid) tie exactly — ranking the
    // high-index pads first would let an nprobe cut probe EMPTY padded
    // lists before the populated assigned one (ADVICE r19).
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse,
      Ordering.Int)
    val topSups = sup.indices.map(s => (cos(v, sup(s)), s))
      .sorted(ord).take(pSup).map(_._2)
    val scored = topSups.flatMap { s =>
      val g = ch(s)
      g.indices.map(j => (cos(v, g(j)), s * kSub + j))
    }
    val cids = scored.sorted(ord).take(nprobe).map(_._2)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(cids.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** The per-row probe computation behind [[HierProbeCidsGen]], hoisted
  * into a plain serializable class so generated code can invoke one
  * compiled method per row (`addReferenceObj` + a single virtual call)
  * instead of dropping the whole stage to interpreted eval the way
  * CodegenFallback does. All selection runs over primitive arrays — no
  * per-row tuple boxing or Seq sorts. Ranking matches
  * [[HierProbeCids]] exactly: descending sim under Double total order
  * (NaN ranks first, like Ordering.Double.TotalOrdering.reverse), exact
  * ties to the lowest index.
  */
final class HierProbeHelper(sup: Array[Array[Float]],
    ch: Array[Array[Array[Float]]], pSup: Int, nprobe: Int)
    extends Serializable {

  // ---- fast-path precomputation (r21): at k=16384 a probe runs
  // kSup + pSup·kSub (~4K) cosines per row, and the original loop
  // re-read the query vector through ArrayData.getFloat AND re-summed
  // BOTH squared norms inside every one of them (~270K virtual calls,
  // 3× the necessary flops — measured 237 µs/row at the 30× tier).
  // When every centroid row shares one dimensionality (always true for
  // trained matrices; children are padded to kSub), the per-centroid
  // norm is a constant: precompute sqrt(Σy²) once per centroid with
  // the SAME sequential double accumulation, copy the query vector to
  // a primitive array once per row, and the inner loop is a pure
  // primitive dot product. sqrt(na)·sqrt(nb) then multiplies the same
  // two doubles the fused loop produced — results are bit-identical
  // (parity-pinned against the interpreted expression in HierIvfSpec).
  // Ragged matrices or a query of a different length fall back to the
  // original exact per-pair loop.
  private val dim: Int = if (sup.nonEmpty) sup(0).length else -1
  private val uniform: Boolean = dim >= 0 &&
    sup.forall(_.length == dim) && ch.forall(_.forall(_.length == dim))
  private def normOf(row: Array[Float]): Double = {
    var nb = 0.0; var i = 0
    while (i < row.length) { val y = row(i).toDouble; nb += y * y; i += 1 }
    math.sqrt(nb)
  }
  private val supNorm: Array[Double] = if (uniform) sup.map(normOf) else null
  private val chNorm: Array[Array[Double]] =
    if (uniform) ch.map(_.map(normOf)) else null

  private def cos(v: ArrayData, row: Array[Float]): Double = {
    val n = math.min(v.numElements(), row.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble; val y = row(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  // Positions 0..m-1 in (sim desc, position asc) order via a STABLE
  // LSD radix sort over the IEEE-754 sortable transform: ascending
  // unsigned `bits ^ ((bits >> 63) | Long.MinValue)` is exactly
  // java.lang.Double.compare order (canonical NaN above +Inf, -0.0
  // below +0.0), so its complement descends, and radix stability
  // resolves exact ties to the lower position — the same strict total
  // order the interpreted expression's Ordering produces, with zero
  // data-dependent branches (a comparison sort over ~4K candidates was
  // the probe's dominant term after the cosine fast path).
  private def rankOrder(sims: Array[Double]): Array[Int] = {
    val m = sims.length
    val keys = new Array[Long](m)
    var i = 0
    while (i < m) {
      val b = java.lang.Double.doubleToLongBits(sims(i))
      keys(i) = ~(b ^ ((b >> 63) | java.lang.Long.MIN_VALUE))
      i += 1
    }
    var src = new Array[Int](m)
    i = 0; while (i < m) { src(i) = i; i += 1 }
    if (m < 2) return src
    var dst = new Array[Int](m)
    val count = new Array[Int](257)
    var shift = 0
    while (shift < 64) {
      java.util.Arrays.fill(count, 0)
      i = 0
      while (i < m) {
        count((((keys(src(i)) >>> shift) & 0xffL).toInt) + 1) += 1
        i += 1
      }
      // a byte every key shares sorts to a no-op — skip the scatter
      // (cosines cluster in a narrow exponent range, so the high
      // passes are usually uniform)
      if (count((((keys(src(0)) >>> shift) & 0xffL).toInt) + 1) != m) {
        i = 1
        while (i < 257) { count(i) += count(i - 1); i += 1 }
        i = 0
        while (i < m) {
          val b = (((keys(src(i)) >>> shift) & 0xffL).toInt)
          dst(count(b)) = src(i)
          count(b) += 1
          i += 1
        }
        val tmp = src; src = dst; dst = tmp
      }
      shift += 8
    }
    src
  }

  def probe(v: ArrayData): ArrayData = {
    val fast = uniform && v.numElements() == dim
    val q: Array[Float] = if (fast) {
      val a = new Array[Float](dim)
      var i = 0
      while (i < dim) { a(i) = v.getFloat(i); i += 1 }
      a
    } else null
    val qNorm: Double = if (fast) normOf(q) else 0.0
    def fastCos(row: Array[Float], rowNorm: Double): Double = {
      val nn = qNorm * rowNorm
      if (nn == 0.0) return 0.0
      var dot = 0.0; var i = 0
      while (i < dim) { dot += q(i).toDouble * row(i).toDouble; i += 1 }
      dot / nn
    }
    val kSub = if (ch.isEmpty) 0 else ch(0).length
    val supSims = new Array[Double](sup.length)
    var s = 0
    while (s < sup.length) {
      supSims(s) =
        if (fast) fastCos(sup(s), supNorm(s)) else cos(v, sup(s))
      s += 1
    }
    val supIdx = rankOrder(supSims)
    // the selected supercluster SET is order-invariant downstream (the
    // final ranking is a total order over cids); ascending sp keeps the
    // candidate fill cid-monotonic so the rank tie-break below can use
    // positions directly
    val tops = java.util.Arrays.copyOf(supIdx, math.min(pSup, supIdx.length))
    java.util.Arrays.sort(tops)
    val m = tops.length * kSub
    val sims = new Array[Double](m)
    val cids = new Array[Int](m)
    var w = 0
    var t = 0
    while (t < tops.length) {
      val sp = tops(t); val g = ch(sp)
      val gn = if (fast) chNorm(sp) else null
      var j = 0
      if (fast) {
        // score 4 independent child centroids per pass: each dot's own
        // accumulation order is untouched (bit-identical sims), but the
        // four serial dependency chains interleave, hiding the FP-add
        // latency the single-chain loop is bound by
        while (j + 4 <= g.length) {
          val r0 = g(j); val r1 = g(j + 1); val r2 = g(j + 2); val r3 = g(j + 3)
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          var i = 0
          while (i < dim) {
            val x = q(i).toDouble
            d0 += x * r0(i).toDouble; d1 += x * r1(i).toDouble
            d2 += x * r2(i).toDouble; d3 += x * r3(i).toDouble
            i += 1
          }
          val base = sp * kSub + j
          var u = 0
          while (u < 4) {
            val nn = qNorm * gn(j + u)
            val d = u match { case 0 => d0; case 1 => d1; case 2 => d2
              case _ => d3 }
            sims(w) = if (nn == 0.0) 0.0 else d / nn
            cids(w) = base + u
            w += 1; u += 1
          }
          j += 4
        }
      }
      while (j < g.length) {
        sims(w) = if (fast) fastCos(g(j), gn(j)) else cos(v, g(j))
        cids(w) = sp * kSub + j
        w += 1; j += 1
      }
      t += 1
    }
    // rank candidate cids by (sim desc, cid asc) — cids are strictly
    // ascending in fill position, so the radix sort's stable
    // position-asc tie-break IS the cid tie-break
    val order = rankOrder(sims)
    val out = new Array[Int](math.min(nprobe, m))
    var i = 0
    while (i < out.length) { out(i) = cids(order(i)); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Codegen'd [[HierProbeCids]] for query-BATCH workloads (thousands of
  * probe vectors — the serving shape of semantic retrieval over a
  * training corpus). The generated code makes ONE call into the
  * compiled [[HierProbeHelper]] per row, so the projection stays inside
  * whole-stage codegen (CodegenFallback would interpret the entire
  * stage and box an InternalRow per row). Results are identical to
  * [[HierProbeCids]] — same cosine numerics, same (sim desc, cid asc)
  * ranking.
  */
case class HierProbeCidsGen(child: Expression, helper: HierProbeHelper)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hier_probe_gen"

  override def nullSafeEval(a: Any): Any =
    helper.probe(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("hierProbeHelper", helper,
      classOf[HierProbeHelper].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $h.probe($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
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
    * `supLit`/`childLit` must be centroid-matrix literals. Prefer
    * [[hierCidRef]] for large k — the literal form re-pays boxed plan
    * deserialization per task (see [[HierCidRef]]). */
  def hierCid(spark: SparkSession, vec: Column, supLit: Column,
      childLit: Column): Column = {
    register(spark)
    call_function(HierCidName, vec, supLit, childLit)
  }

  // --- closure-capturing hier-IVF function registrations -------------
  //
  // Keyed on a CONTENT DIGEST of the matrices (not array references —
  // each HierIvfIndex instance converts fresh float arrays, so a
  // reference key re-registered a new function and pinned another k×dim
  // matrix copy per construction for the JVM's lifetime; ADVICE r19),
  // bounded by an LRU that DEREGISTERS the evicted temp function from
  // every registry it was installed into, so long-lived sessions don't
  // grow the registry and heap per trained index.

  private val hierRefCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val HierFnCacheMax = 64

  private final class HierFnEntry(val name: String) {
    val registries = scala.collection.mutable.Set
      .empty[org.apache.spark.sql.catalyst.analysis.FunctionRegistry]
  }
  private val hierFnLru =
    new java.util.LinkedHashMap[String, HierFnEntry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, HierFnEntry]): Boolean = {
        val evict = size() > HierFnCacheMax
        if (evict) e.getValue.registries.foreach(_.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(e.getValue.name)))
        evict
      }
    }

  /** MD5 of the matrices' float bits (+ shape) — content-equal matrix
    * pairs share one registered closure. A k=16384×64 children matrix
    * digests ~4 MB, a few ms ONCE PER QUERY BUILD (the per-row path
    * never touches this). */
  private def matDigest(sup: Array[Array[Float]],
      ch: Array[Array[Array[Float]]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def putRow(row: Array[Float]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4 * row.length + 4)
      bb.putInt(row.length)
      row.foreach(bb.putFloat)
      md.update(bb.array())
    }
    def putMat(m: Array[Array[Float]]): Unit = {
      md.update(java.nio.ByteBuffer.allocate(4).putInt(m.length).array())
      m.foreach(putRow)
    }
    putMat(sup)
    md.update(java.nio.ByteBuffer.allocate(4).putInt(ch.length).array())
    ch.foreach(putMat)
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** The registered name for `key`, installing `build` into this
    * session's registry when absent. One matrix copy pinned per
    * (content, registry), LRU-bounded. */
  private def hierFn(spark: SparkSession, key: String,
      build: Seq[Expression] => Expression): String =
    hierFnLru.synchronized {
      val entry = Option(hierFnLru.get(key)).getOrElse {
        val e = new HierFnEntry(
          s"graft_hier_fn_${hierRefCounter.incrementAndGet()}")
        hierFnLru.put(key, e); e
      }
      val reg = spark.sessionState.functionRegistry
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(entry.name))) {
        reg.createOrReplaceTempFunction(entry.name, build, "built-in")
        entry.registries += reg
      }
      entry.name
    }

  private[graft] def hierFnCacheSize: Int =
    hierFnLru.synchronized(hierFnLru.size())

  /** Two-level IVF list id with PRIMITIVE matrices captured in the
    * registered builder closure — the plan carries only the tiny
    * function call, and tasks deserialize compact float arrays instead
    * of a boxed literal graph (see [[HierCidRef]]).
    */
  def hierCidRef(spark: SparkSession, vec: Column,
      sup: Array[Array[Float]], ch: Array[Array[Array[Float]]]): Column = {
    val name = hierFn(spark, s"ref:${matDigest(sup, ch)}",
      exprs => HierCidRef(exprs(0), sup, ch))
    call_function(name, vec)
  }

  /** Query-side nprobe list ids with primitive captured matrices (see
    * [[HierProbeCids]]) — the few-query-rows shape. */
  def hierProbeRef(spark: SparkSession, vec: Column,
      sup: Array[Array[Float]], ch: Array[Array[Array[Float]]],
      pSup: Int, nprobe: Int): Column = {
    val name = hierFn(spark, s"probe:$pSup:$nprobe:${matDigest(sup, ch)}",
      exprs => HierProbeCids(exprs(0), sup, ch, pSup, nprobe))
    call_function(name, vec)
  }

  /** Codegen'd query-side probe for BATCH workloads (see
    * [[HierProbeCidsGen]]) — identical results to [[hierProbeRef]],
    * stays inside whole-stage codegen. */
  def hierProbeRefGen(spark: SparkSession, vec: Column,
      sup: Array[Array[Float]], ch: Array[Array[Array[Float]]],
      pSup: Int, nprobe: Int): Column = {
    val helper = new HierProbeHelper(sup, ch, pSup, nprobe)
    val name = hierFn(spark, s"probeGen:$pSup:$nprobe:${matDigest(sup, ch)}",
      exprs => HierProbeCidsGen(exprs(0), helper))
    call_function(name, vec)
  }
}

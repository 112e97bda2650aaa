package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkFixture

/** Algebraic invariants of the common-supertype lattice behind
  * heterogeneous unions, plus union-level behavior the compiler relies
  * on (DynamicSemanticsSpec covers the end-to-end GQL paths).
  */
class SchemaReconcileSpec extends AnyFunSuite {

  private val atomics: Seq[DataType] = Seq(ByteType, ShortType,
    IntegerType, LongType, FloatType, DoubleType, DecimalType(10, 2),
    DecimalType(20, 4), StringType, BooleanType, DateType, TimestampType,
    BinaryType, NullType)
  private val arrays: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(LongType), ArrayType(StringType),
      ArrayType(ArrayType(DoubleType)))

  test("widerType is commutative and idempotent over the type lattice") {
    val all = atomics ++ arrays
    for (a <- all; b <- all) {
      val ab = SchemaReconcile.widerType(a, b)
      val ba = SchemaReconcile.widerType(b, a)
      assert(ab == ba, s"widerType($a, $b) != widerType($b, $a)")
    }
    all.foreach(t => assert(SchemaReconcile.widerType(t, t).contains(t)))
  }

  test("the lattice only widens: both inputs cast losslessly upward") {
    // every reconciled pair must admit a cast FROM each input type —
    // Cast.canCast is the authority Spark itself uses
    import org.apache.spark.sql.catalyst.expressions.Cast
    val all = atomics ++ arrays
    for (a <- all; b <- all; w <- SchemaReconcile.widerType(a, b)) {
      assert(Cast.canCast(a, w), s"cannot cast $a to widerType($a,$b)=$w")
      assert(Cast.canCast(b, w), s"cannot cast $b to widerType($a,$b)=$w")
    }
  }

  test("numeric pairs widen numerically, never to string") {
    val nums = Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, DecimalType(10, 2))
    for (a <- nums; b <- nums; w <- SchemaReconcile.widerType(a, b))
      assert(w != StringType, s"$a + $b must not meet at string")
  }

  test("decimal widening never truncates integral capacity") {
    // long + high-scale decimal can't fit losslessly in decimal(38,_):
    // the meet keeps ALL integral digits and shrinks the SCALE to fit
    // (r14 — previously fell to double, which also changed equality/
    // ordering semantics for exact monetary values). Never clamps
    // precision while keeping scale, which would overflow large longs
    // to NULL at runtime; the round-trip test below proves the shrink
    // cannot overflow either.
    assert(SchemaReconcile.widerType(LongType, DecimalType(38, 20))
      .contains(DecimalType(38, 18)))
    assert(SchemaReconcile.widerType(DecimalType(38, 20), DecimalType(20, 0))
      .contains(DecimalType(38, 18)))
    // integral meets must keep ALL integral digits of the wider side
    assert(SchemaReconcile.widerType(DecimalType(30, 0), LongType)
      .contains(DecimalType(30, 0)))
    assert(SchemaReconcile.widerType(DecimalType(10, 2), LongType)
      .contains(DecimalType(22, 2)))
    assert(SchemaReconcile.widerType(DecimalType(10, 2), IntegerType)
      .contains(DecimalType(12, 2)))
  }

  test("widened decimal pairs round-trip extreme values without NULLs") {
    val s = SparkFixture.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val pairs = Seq(
      (LongType, DecimalType(38, 20)), (DecimalType(30, 0), LongType),
      (DecimalType(10, 2), LongType), (DecimalType(38, 0), LongType))
    // per side, the most demanding value REPRESENTABLE in that side's
    // type must survive the cast to the meet (value-level, not canCast)
    def extreme(t: DataType): String = t match {
      case d: DecimalType =>
        "9" * (d.precision - d.scale) +
          (if (d.scale > 0) "." + "9" * d.scale else "")
      case _ => Long.MaxValue.toString
    }
    for ((a, b) <- pairs; w <- SchemaReconcile.widerType(a, b);
        t <- Seq(a, b)) {
      val r = Seq(extreme(t)).toDF("v")
        .select(col("v").cast(t).as("in"), col("v").cast(t).cast(w).as("out"))
        .head()
      assert(!r.isNullAt(0), s"probe not representable in $t for ($a,$b)")
      assert(!r.isNullAt(1), s"${extreme(t)} overflowed $t -> $w for ($a,$b)")
    }
  }

  test("irreconcilable pairs are refused, not silently coerced") {
    assert(SchemaReconcile.widerType(ArrayType(IntegerType), BooleanType).isEmpty)
    assert(SchemaReconcile.widerType(BinaryType, LongType).isEmpty)
    assert(SchemaReconcile.widerType(
      ArrayType(ArrayType(DoubleType)), ArrayType(BooleanType)).isEmpty)
  }

  test("union pads missing columns with NULL and widens shared ones") {
    val s = SparkFixture.spark
    import s.implicits._
    val a = Seq((1L, 5L)).toDF("id", "x")
    val b = Seq((2L, "six", true)).toDF("id", "x", "extra")
    val u = SchemaReconcile.union(Seq(a, b), "spec")
    assert(u.schema("x").dataType == StringType)
    assert(u.schema("extra").dataType == BooleanType)
    val rows = u.orderBy("id").collect()
    assert(rows(0).getString(1) == "5" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "six" && rows(1).getBoolean(2))
    // irreconcilable columns name the column and the context
    val err = intercept[IllegalArgumentException] {
      SchemaReconcile.union(Seq(
        Seq((1L, Seq(1, 2))).toDF("id", "x"),
        Seq((2L, true)).toDF("id", "x")), "edge types A|B")
    }
    assert(err.getMessage.contains("x") &&
      err.getMessage.contains("edge types A|B"))
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema reconciliation for heterogeneous unions.
  *
  * The per-label-table model gives each edge/node type its own schema; a
  * multi-type pattern (`-[t:WIRE|NOTE]->`), a label-less scan `(n)`, and
  * DML appending new rows all union those tables by name. When the SAME
  * property name carries DIFFERENT types across branches (the reference's
  * dynamic `Value` rows allow `amount: i64` on one edge type and
  * `string` on another — pattern_tests.rs:151,509 ground), a naive
  * `unionByName` lets Spark coerce to the FIRST branch's type, which at
  * best loses information and under ANSI semantics throws
  * `CAST_INVALID_INPUT` mid-query on the first non-numeric string.
  *
  * Here every union branch is first cast to the per-column COMMON
  * SUPERTYPE: numeric pairs widen along the standard lattice (the
  * reference compares mixed numerics as f64 — executor Value semantics),
  * anything else meets string at the top (the reference renders mixed
  * number/string columns dynamically per row; we surface one typed
  * column, so `500` arrives as `"500"` — documented divergence, the
  * row SET is identical). Types with no common supertype (struct vs
  * atomic, incompatible arrays) fail fast at COMPILE time with the
  * column and branch types named, instead of a runtime cast error deep
  * in a stage.
  */
object SchemaReconcile {

  // the abstract type-class hierarchy (AtomicType & co.) is private[sql]
  // in Spark 4 — use concrete sets instead
  private val numericRank: Map[DataType, Int] = Map(ByteType -> 0,
    ShortType -> 1, IntegerType -> 2, LongType -> 3, FloatType -> 4,
    DoubleType -> 5)
  private def isIntegral(t: DataType): Boolean =
    numericRank.get(t).exists(_ <= 3)
  private def isFractional(t: DataType): Boolean =
    numericRank.get(t).exists(_ >= 4)
  private def stringMeets(t: DataType): Boolean = t match {
    case _: DecimalType => true
    case BooleanType | DateType | TimestampType | TimestampNTZType |
        BinaryType => true
    case other => numericRank.contains(other)
  }

  /** Widest common type, or None when the pair is irreconcilable. */
  def widerType(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (NullType, y) => Some(y)
    case (x, NullType) => Some(x)
    case (x: DecimalType, y: DecimalType) =>
      // enough integral digits and enough scale for both
      Some(boundedDecimal(
        math.max(x.precision - x.scale, y.precision - y.scale),
        math.max(x.scale, y.scale)))
    case (x: DecimalType, y) if isIntegral(y) => Some(widerDecimalIntegral(x, y))
    case (x, y: DecimalType) if isIntegral(x) => Some(widerDecimalIntegral(y, x))
    case (_: DecimalType, y) if isFractional(y) => Some(DoubleType)
    case (x, _: DecimalType) if isFractional(x) => Some(DoubleType)
    case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
      Some(if (numericRank(x) >= numericRank(y)) x else y)
    case (DateType, TimestampType) | (TimestampType, DateType) =>
      Some(TimestampType)
    case (StringType, y) if stringMeets(y) => Some(StringType)
    case (x, StringType) if stringMeets(x) => Some(StringType)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      widerType(x, y).map(ArrayType(_, n1 || n2))
    case _ => None
  }

  // max base-10 digits an integral type's values can need
  private val integralDigits: Map[DataType, Int] =
    Map(ByteType -> 3, ShortType -> 5, IntegerType -> 10, LongType -> 20)

  private def widerDecimalIntegral(d: DecimalType, i: DataType): DataType =
    boundedDecimal(math.max(d.precision - d.scale, integralDigits(i)), d.scale)

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.SchemaReconcile")

  /** A decimal with `intDigits` integral digits and `scale` fractional
    * ones. When that exceeds MAX_PRECISION, the meet keeps ALL integral
    * digits and shrinks the SCALE to what fits (decimal(38, 38-int)) —
    * fractions round at cast time, but equality/ordering stay exact
    * decimal semantics at the kept scale, which beats the previous
    * DoubleType fallback (~15-16 significant digits AND float
    * equality/ordering) for high-precision monetary columns. This cannot
    * overflow: any branch whose values round up has integral capacity
    * p-s < 38-keptScale = intDigits (its scale exceeds keptScale), so
    * the +1 carry still fits; the branch that DEFINES intDigits has
    * scale ≤ keptScale and casts exactly. Both reductions are
    * approximate by declared type, never a runtime NULL/ANSI overflow —
    * and both WARN, since the caller is silently losing fraction digits.
    */
  private def boundedDecimal(intDigits: Int, scale: Int): DataType =
    if (intDigits + scale <= DecimalType.MAX_PRECISION)
      DecimalType(intDigits + scale, scale)
    else if (intDigits <= DecimalType.MAX_PRECISION) {
      val keptScale = DecimalType.MAX_PRECISION - intDigits
      log.warn(s"approximate decimal meet: needed decimal($intDigits+" +
        s"$scale) exceeds decimal(38) — keeping all $intDigits integral " +
        s"digits, rounding fractions to scale $keptScale")
      DecimalType(DecimalType.MAX_PRECISION, keptScale)
    } else {
      // unreachable from decimal/integral meets (intDigits ≤ 38 by
      // construction) — kept as a safe fallback
      log.warn("approximate decimal meet: >38 integral digits cannot " +
        "stay decimal — falling to double (~15-16 significant digits)")
      DoubleType
    }

  /** Union `frames` by name (missing columns pad to NULL), with every
    * shared column first cast to the common supertype across ALL
    * branches. `context` names the operation in the error message
    * (e.g. "edge types WIRE|NOTE").
    */
  def union(frames: Seq[DataFrame], context: => String): DataFrame = {
    require(frames.nonEmpty)
    if (frames.size == 1) return frames.head
    // per-column supertype across every branch that has the column
    var target = Map.empty[String, DataType]
    frames.foreach(_.schema.fields.foreach { f =>
      target.get(f.name) match {
        case None => target += f.name -> f.dataType
        case Some(t) =>
          target += f.name -> widerType(t, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"property '${f.name}' has irreconcilable types " +
                s"${t.simpleString} and ${f.dataType.simpleString} " +
                s"across $context"))
      }
    })
    frames.map { df =>
      val casts = df.schema.fields.collect {
        case f if target(f.name) != f.dataType =>
          f.name -> col(f.name).cast(target(f.name))
      }
      casts.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

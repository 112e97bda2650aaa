package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Reference DATE_ADD / DATE_SUB calendar arithmetic
  * (temporal_functions.rs:663-938).
  *
  * Duration units (SECOND/MINUTE/HOUR/DAY/WEEK) shift the instant by a
  * fixed number of seconds — chrono's `Duration` is absolute time, so a
  * DAY is always 86,400 s even across DST (the reference's
  * add_duration_dst_aware adds the same absolute duration to the local
  * DateTime, which is the identical instant shift).
  *
  * MONTH/YEAR are calendar arithmetic on the datetime's components with
  * the reference's `unwrap_or` quirk: chrono's `with_month`/`with_year`
  * return None when the target month lacks the source's day-of-month,
  * and the reference keeps the PREVIOUS value — so Jan 31 + 1 MONTH is
  * Jan 31 (not clamped to Feb 28/29 the way java.time or Spark's
  * add_months would), and since every further iteration retries the
  * same invalid step, Jan 31 + k MONTH stays Jan 31 for every k.
  * Likewise Feb 29 + 1 YEAR on a non-leap target stays Feb 29. This is
  * deliberately NOT java.time's clamping `plusMonths`; the month step
  * is hand-rolled to match the reference loop.
  *
  * Component arithmetic happens on the micros' UTC rendering; for
  * non-UTC sessions the compiler wraps input/output in
  * from/to_utc_timestamp for the CALENDAR units only (the sessionLocal
  * convention EXTRACT uses) — duration units pass straight through, so
  * they stay absolute instant shifts across DST like chrono's.
  */
case class RefDateArith(left: Expression, right: Expression,
    unit: String, subtract: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (TimestampType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (timestamp, bigint), got $other")
    }
  override def dataType: DataType = TimestampType
  override def prettyName: String =
    if (subtract) "graft_date_sub" else "graft_date_add"

  private val unitMicros: Option[Long] = unit match {
    case "SECOND" | "SECONDS" => Some(1000000L)
    case "MINUTE" | "MINUTES" => Some(60L * 1000000L)
    case "HOUR" | "HOURS" => Some(3600L * 1000000L)
    case "DAY" | "DAYS" => Some(86400L * 1000000L)
    case "WEEK" | "WEEKS" => Some(7L * 86400L * 1000000L)
    case "MONTH" | "MONTHS" | "YEAR" | "YEARS" => None
    case other => throw new IllegalArgumentException(
      s"Unsupported ${if (subtract) "DATE_SUB" else "DATE_ADD"} unit: " +
        s"'$other'. Supported units: SECOND, MINUTE, HOUR, DAY, WEEK, " +
        "MONTH, YEAR")
  }
  private val isYear = unit == "YEAR" || unit == "YEARS"

  override def nullSafeEval(tsAny: Any, nAny: Any): Any = {
    val micros = tsAny.asInstanceOf[Long]
    val k0 = nAny.asInstanceOf[Long]
    unitMicros match {
      case Some(um) => micros + (if (subtract) -k0 else k0) * um
      case None => calendarStep(micros, k0)
    }
  }

  /** MONTH/YEAR calendar step on a UTC-rendered instant — public so the
    * generated code calls the same logic through an
    * [[CodegenContext.addReferenceObj]] handle.
    */
  def calendarStep(micros: Long, k0: Long): Long = {
    val k = if (subtract) -k0 else k0
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    var ldt = java.time.LocalDateTime.ofEpochSecond(
      secs, frac.toInt * 1000, java.time.ZoneOffset.UTC)
    if (isYear) {
      // single with_year; invalid (Feb 29 -> non-leap) keeps base
      val ny = ldt.getYear + k.toInt
      if (!(ldt.getMonthValue == 2 && ldt.getDayOfMonth == 29 &&
          !java.time.Year.isLeap(ny.toLong)))
        ldt = ldt.withYear(ny)
    } else {
      // month loop: one calendar month per step, same day-of-month;
      // a step whose target month lacks the day keeps the previous
      // value, and the retry fails identically -> stop early
      var i = 0L
      val steps = math.abs(k)
      val fwd = k > 0
      var stuck = false
      while (i < steps && !stuck) {
        val y = ldt.getYear
        val m = ldt.getMonthValue
        val (ny, nm) =
          if (fwd) { if (m == 12) (y + 1, 1) else (y, m + 1) }
          else { if (m == 1) (y - 1, 12) else (y, m - 1) }
        if (ldt.getDayOfMonth <=
            java.time.YearMonth.of(ny, nm).lengthOfMonth) {
          ldt = java.time.LocalDateTime.of(ny, nm, ldt.getDayOfMonth,
            ldt.getHour, ldt.getMinute, ldt.getSecond, ldt.getNano)
        } else stuck = true
        i += 1
      }
    }
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      ldt.getNano / 1000L
  }

  /** Whole-stage codegen (r15 verdict: this was the one new expression
    * still on CodegenFallback). Duration units inline to one multiply-
    * add on the micros — branch-free, stays fused in the stage; the
    * MONTH/YEAR calendar loop calls [[calendarStep]] through a
    * reference handle (same logic as interpreted eval, no boxing, no
    * InternalRow detour).
    */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = unitMicros match {
    case Some(um) =>
      val sign = if (subtract) "-" else ""
      defineCodeGen(ctx, ev, (ts, n) => s"$ts + ($sign($n)) * ${um}L")
    case None =>
      val self = ctx.addReferenceObj("refDateArith", this,
        classOf[RefDateArith].getName)
      defineCodeGen(ctx, ev, (ts, n) => s"$self.calendarStep($ts, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RefDateArith =
    copy(left = newLeft, right = newRight)
}

object TemporalFunctions {
  val AddName = "graft_date_add"
  val SubName = "graft_date_sub"

  /** Register both arithmetic directions; the unit rides as a literal
    * third argument (resolved at plan time, like graft_minhash's
    * numHashes). Idempotent — re-registering logs a WARN per query.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(AddName))) return
    def builder(subtract: Boolean)(
        exprs: Seq[Expression]): Expression = {
      val unit = exprs(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(u, StringType)
            if u != null => u.toString.toUpperCase
        case other => throw new IllegalArgumentException(
          s"date arithmetic unit must be a string literal, got $other")
      }
      RefDateArith(exprs(0), exprs(1), unit, subtract)
    }
    reg.createOrReplaceTempFunction(AddName, builder(false), "built-in")
    reg.createOrReplaceTempFunction(SubName, builder(true), "built-in")
  }
}

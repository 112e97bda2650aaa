package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-based 60-bit hash — bit-identical to the Column formula
  * `conv(substring(md5(x), 1, 15), 16, 10)` (TextAnalysis.stableHash60)
  * and the DuckDB oracle's `CAST(concat('0x', substr(md5(x),1,15)) AS
  * BIGINT)`: the first 15 hex digits of the md5 are the top 60 bits of
  * the digest, i.e. (first 8 bytes as big-endian u64) >>> 4.
  */
object GraftHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top >>> 4
  }

  def hash60(s: UTF8String): Long = hash60(s.getBytes)
}

/** Fused word-n-gram shingle hashes — one pass building each shingle's
  * utf8 bytes and hashing it, with first-occurrence dedup. Replaces the
  * interpreted `array_distinct(transform(shingles(text), sh ->
  * pmod(stableHash60(sh), mod)))` higher-order pipeline (Dedup
  * .shingleHashes) with identical output: |docs| × |shingles| closure
  * dispatches become a tight loop.
  *
  * Semantics (must stay bit-equal to the DuckDB oracle): fewer than n
  * tokens → one shingle of all tokens joined by ' '; else tokens[i..i+n)
  * joined by ' ' for each window; hash = (md5-top-60-bits) mod `mod`.
  */
case class ShingleHash(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    new GenericArrayData(ShingleHash.eval(toks, n, mod))
  }

  // NOTE: the companion must be referenced as `ShingleHash$.MODULE$` —
  // the case class's own `eval(InternalRow)` suppresses Scala's static
  // forwarder, so a bare `ShingleHash.eval(...)` does not resolve under
  // Janino and the whole projection silently falls back to interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHash$$.MODULE$$.eval($input, $n, ${mod}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash {
  private val space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen. */
  def eval(toks: ArrayData, n: Int, mod: Long): Array[Long] = {
    val sz = toks.numElements()
    val count = if (sz < n) 1 else sz - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      val width = if (sz < n) sz else n
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val sh = UTF8String.concatWs(space, parts: _*)
      seen.add(GraftHash.hash60(sh) % mod)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** Fused 60-bit SimHash over a token array: per-token md5-based hashes
  * vote ±1 per bit; the sign vector is the fingerprint. Replaces 60
  * interpreted `aggregate(...)` higher-order calls per row (Dedup
  * .simhash60) with one loop; output is bit-identical (same hash, same
  * `sum > 0` vote rule).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash60.eval(input.asInstanceOf[ArrayData])

  // Same static-forwarder caveat as ShingleHash: go through MODULE$.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      s"${ev.value} = graft.functions.SimHash60$$.MODULE$$.eval($input);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def eval(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = GraftHash.hash60(toks.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object TextHashFunctions {
  val ShingleName = "graft_shingle_hash"
  val SimhashName = "graft_simhash"
  val MarkerName = "graft_marker_counts"

  def register(spark: SparkSession): Unit = {
    // idempotent — re-registering logs a "replaced" WARN per query
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(ShingleName))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShingleName, exprs => {
        def intLit(e: Expression): Long = e match {
          case Literal(v, IntegerType) => v.asInstanceOf[Int].toLong
          case Literal(v, LongType) => v.asInstanceOf[Long]
          case other => throw new IllegalArgumentException(
            s"$ShingleName expects literal n/mod, got $other")
        }
        ShingleHash(exprs(0), intLit(exprs(1)).toInt, intLit(exprs(2)))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimhashName, exprs => SimHash60(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MarkerName, exprs => {
        val ms = exprs(1) match {
          case Literal(v, StringType) if v != null =>
            // -1 limit keeps trailing empty segments so a malformed list
            // fails MarkerCounts' require instead of silently shrinking
            // (split's default drops them, misaligning element_at math)
            v.asInstanceOf[UTF8String].toString.split("\u0001", -1).toSeq
          case other => throw new IllegalArgumentException(
            s"$MarkerName expects a non-null literal marker list, got $other")
        }
        MarkerCounts(exprs(0), ms)
      }, "built-in")
  }

  def shingleHashes(spark: SparkSession, tokens: Column, n: Int, mod: Long): Column = {
    register(spark)
    call_function(ShingleName, tokens, lit(n), lit(mod))
  }

  def simhash(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function(SimhashName, tokens)
  }

  /** array<int> of per-marker counts over ` lower(text) ` — see
    * [[MarkerCounts]]. Markers must be non-empty and free of the
    * `\u0001` delimiter (validated here; the same rules hold for direct
    * SQL calls via the registry lambda). Registration lands in `spark`'s
    * function registry — pass the session that will ANALYZE the plan
    * (the repo-wide convention for the custom-expression helpers).
    */
  def markerCounts(spark: SparkSession, text: Column,
      markers: Seq[String]): Column = {
    require(markers.nonEmpty && markers.forall(m =>
      m.nonEmpty && !m.contains('\u0001')),
      "markerCounts needs non-empty markers without the \\u0001 delimiter")
    register(spark)
    call_function(MarkerName, text, lit(markers.mkString("\u0001")))
  }
}

/** Fused multi-marker substring counter — one lowercase+pad pass and a
  * plain `indexOf` walk per marker, replacing the per-marker
  * `length(padded) - length(regexp_replace(padded, marker, ''))`
  * pipeline (~20 regex traversals of every document for language id +
  * stopword scoring; measured 0.6 s of d12's 1.4 s at sf0.1).
  *
  * Count semantics are EXACTLY the length-diff formula's: non-
  * overlapping, left-to-right (the scan advances past each whole match
  * — ` the the ` counts ONE ` the `), over ` lower(text) ` with the
  * same UTF8String lowercasing Spark's `lower` uses — so the DuckDB
  * oracle's regexp-based SQL keeps producing identical values.
  */
case class MarkerCounts(child: Expression, markers: Seq[String])
    extends UnaryExpression {
  // an empty marker would make the indexOf walk spin forever (indexOf
  // of "" matches at every offset without advancing) — reject at
  // construction, where both the Scala helper and the SQL registry land
  require(markers.nonEmpty && markers.forall(_.nonEmpty),
    "graft_marker_counts needs a non-empty list of non-empty markers")
  // Seq, not Array: case-class equality must be by VALUE for expression
  // canonicalization/CSE to recognize two identical counters.
  // Markers are normalized with the SAME UTF8String lowercasing applied
  // to the text, so the contract holds for every entry point — the Scala
  // helper AND direct SQL calls through the registry lambda (an
  // uppercase marker used to silently count zero from SQL).
  private lazy val markerArr: Array[String] =
    markers.map(m => UTF8String.fromString(m).toLowerCase.toString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_marker_counts"

  override def nullSafeEval(input: Any): Any =
    MarkerCounts.count(input.asInstanceOf[UTF8String], markerArr)

  // Same static-forwarder caveat as ShingleHash: go through MODULE$.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markers", markerArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.MarkerCounts$$.MODULE$$.count($input, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCounts {
  def count(s: UTF8String, markers: Array[String]): ArrayData = {
    val padded = " " + s.toLowerCase.toString + " "
    val out = new Array[Int](markers.length)
    var j = 0
    while (j < markers.length) {
      val m = markers(j)
      var c = 0
      var i = padded.indexOf(m)
      while (i >= 0) { c += 1; i = padded.indexOf(m, i + m.length) }
      out(j) = c
      j += 1
    }
    new GenericArrayData(out)
  }
}

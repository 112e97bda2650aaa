package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** The custom expressions exist to keep hot paths inside codegen — a
  * Janino compile error silently demotes the stage to interpreted eval
  * (only a WARN in the logs). This spec forces CODEGEN_ONLY so any such
  * error fails loudly, and evaluates each expression TWICE in one
  * projection to catch non-freshName'd local collisions.
  */
class CodegenSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def codegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("shingle/simhash/minhash/cosine all codegen, duplicated in one projection") {
    import spark.implicits._
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", Array(1.0f, 2.0f, 3.0f),
        Array(3.0f, 2.0f, 1.0f)),
      ("pack my box with five dozen liquor jugs", Array(0.5f, 0.5f, 0.5f),
        Array(1.0f, 0.0f, 0.0f))
    ).toDF("text", "va", "vb")
      .withColumn("toks", split(col("text"), " "))

    val rows = codegenOnly {
      val sh1 = TextHashFunctions.shingleHashes(spark, col("toks"), 3, 1L << 30)
      val sh2 = TextHashFunctions.shingleHashes(spark, col("toks"), 2, 1L << 30)
      df.select(
        sh1.as("sh1"), sh2.as("sh2"),
        TextHashFunctions.simhash(spark, col("toks")).as("sim1"),
        TextHashFunctions.simhash(spark, reverse(col("toks"))).as("sim2"),
        MinHashFunctions.minhash(spark, sh1, 8).as("mh1"),
        MinHashFunctions.minhash(spark, sh2, 8).as("mh2"),
        VectorFunctions.cosine(spark, col("va"), col("vb")).as("cos1"),
        VectorFunctions.cosine(spark, col("va"), col("va")).as("cos2")
      ).collect()
    }
    assert(rows.length == 2)
    // self-cosine of a non-zero vector is exactly 1.0
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos2") - 1.0) < 1e-12))
    // codegen output must equal interpreted output (fallback path)
    val interp = df.select(
      VectorFunctions.cosine(spark, col("va"), col("vb")).as("cos1"),
      TextHashFunctions.simhash(spark, col("toks")).as("sim1")).collect()
    rows.zip(interp).foreach { case (cg, ip) =>
      assert(cg.getAs[Double]("cos1") === ip.getAs[Double]("cos1"))
      assert(cg.getAs[Long]("sim1") === ip.getAs[Long]("sim1"))
    }
  }

  test("RefDateArith codegens for duration AND calendar units, matching " +
      "interpreted eval (r15 verdict: was CodegenFallback)") {
    import spark.implicits._
    TemporalFunctions.register(spark)
    val df = Seq(
      ("2024-01-31 12:30:45", 1L),
      ("2024-02-29 23:59:59", 12L),
      ("2023-12-31 00:00:00", -3L)
    ).toDF("s", "k").withColumn("ts", to_timestamp(col("s")))
    def proj(d: org.apache.spark.sql.DataFrame) = d.select(
      call_function("graft_date_add", col("ts"), col("k"), lit("DAY")).as("d1"),
      call_function("graft_date_add", col("ts"), col("k"), lit("MONTH")).as("m1"),
      call_function("graft_date_sub", col("ts"), col("k"), lit("YEAR")).as("y1"),
      // duplicated in one projection: catches non-freshName'd locals
      call_function("graft_date_add", col("ts"), col("k"), lit("MONTH")).as("m2"))
    val cg = codegenOnly { proj(df).collect() }
    val ip = proj(df).collect()
    cg.zip(ip).foreach { case (a, b) =>
      (0 until 4).foreach(i => assert(a.get(i) == b.get(i),
        s"codegen/interpreted divergence at col $i: ${a.get(i)} vs ${b.get(i)}"))
    }
    // the sticky-month quirk survives codegen: Jan 31 + 1 MONTH = Jan 31
    assert(cg(0).getTimestamp(1).toString.startsWith("2024-01-31"))
  }

  test("marker counts codegen and match the regex length-diff formula") {
    import spark.implicits._
    val markers = Seq(" the ", " and ", " of ")
    val df = Seq(
      "The quick the THE the end",   // case folding + repeats
      " the the ",                    // overlapping-adjacent: counts ONE
      "no markers here",
      "of and the of of",             // boundary-padded hits
      "").toDF("text")
    val rows = codegenOnly {
      df.select(
        TextHashFunctions.markerCounts(spark, col("text"), markers).as("c1"),
        TextHashFunctions.markerCounts(spark, reverse(col("text")), markers)
          .as("c2")) // duplicated with a different child: freshName check
        .collect()
    }
    // independent oracle: the regexp length-diff formula the old Column
    // pipeline (and the DuckDB oracle SQL) uses
    val expected = df.select(markers.map { m =>
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      ((length(padded) - length(regexp_replace(padded,
        java.util.regex.Pattern.quote(m), ""))) / m.length).cast("int").as(m)
    }: _*).collect()
    rows.zip(expected).foreach { case (got, want) =>
      val gotCounts = got.getSeq[Int](0)
      markers.indices.foreach(i => assert(gotCounts(i) == want.getInt(i),
        s"marker '${markers(i)}' mismatch: $gotCounts vs $want"))
    }
    // the adjacent-overlap rule specifically: " the the " counts 1
    assert(rows(1).getSeq[Int](0) == Seq(1, 0, 0))
  }

  test("marker case is normalized for SQL and Scala callers alike") {
    import spark.implicits._
    val df = Seq("The quick the THE end").toDF("text")
    // uppercase markers count the same as lowercase ones — the
    // expression lowercases markers with the same UTF8String fold it
    // applies to the text, for every entry point
    val viaScala = df.select(
      TextHashFunctions.markerCounts(spark, col("text"), Seq(" The ", " QUICK "))
        .as("c")).head().getSeq[Int](0)
    assert(viaScala == Seq(2, 1))
    // direct SQL through the registry lambda (the path that used to
    // silently count zero for non-lowercase markers)
    TextHashFunctions.register(spark)
    df.createOrReplaceTempView("marker_case_t")
    val delim = "\u0001"
    val viaSql = spark.sql(
      "SELECT graft_marker_counts(text, ' The " + delim +
        " QUICK ') AS c FROM marker_case_t").head().getSeq[Int](0)
    assert(viaSql == Seq(2, 1))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every SparkEntry
  * query at SPARK_GRAFT_SF_DIR and prints one JSON line.
  * Session warm-up runs first so the first query is not charged JVM /
  * codegen / parquet-footer costs; queries run in sorted name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM + whole-stage codegen + one shuffle + parquet footers,
    // through the same accessors queries use (so the events ns→µs
    // conversion and the documents/embeddings scan widening warm too)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    Tables.events(spark, sfDir).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // ms precision and a short sf tag keep the whole line under ~1.7 KB:
    // the driver parses the JSON from the tail of the captured output, so
    // the line must survive tail truncation intact
    def f3(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val sfTag = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfTag"}""")
    spark.stop()
  }
}

import org.apache.spark.sql.SparkSession
object Gql13Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/tmp/graft_scale10x", "/tmp/graft_scale30x")) {
      val df = graft.SparkEntry.queries("gql13_quantified")(spark, dir)
      df.count()
      println(s"==== $dir")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Sort") || l.contains("Aggregate"))
        .map(_.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}

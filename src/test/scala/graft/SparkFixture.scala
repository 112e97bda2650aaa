package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.{EdgeType, PropertyGraph}

/** Shared SparkSession + the reference test datasets, reproduced exactly
  * from /root/reference/graphlite/tests/testutils/test_fixture.rs
  * (simple: 93-116, fraud: 135-190; see FIXTURES.md).
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fraud dataset (test_fixture.rs:135-190): 50 Account + 20 Merchant
    * nodes, 100 Transaction + 50 Purchase edges.
    */
  lazy val fraudGraph: PropertyGraph = {
    val s = spark
    import s.implicits._
    val accountTypes = Array("checking", "savings", "business", "investment")
    val accounts = (1 to 50).map { i =>
      (i.toLong, s"ACC$i", s"Account$i", i * 100.0,
        if (i % 10 == 0) "inactive" else "active",
        accountTypes(i % 4), (i % 100) / 10.0)
    }.toDF("id", "account_number", "name", "balance", "status",
      "account_type", "risk_score")
    val merchants = (1 to 20).map { i =>
      (i.toLong, s"Merchant$i", "retail")
    }.toDF("id", "name", "category")
    val transactions = (1 to 100).map { i =>
      (((i - 1) % 50) + 1L, ((i - 1) % 20) + 1L, i.toLong,
        50.0 + (i % 30), i.toLong)
    }.toDF("src", "dst", "eid", "amount", "timestamp")
    val purchases = (1 to 50).map { i =>
      (((i - 1) % 50) + 1L, ((i - 1) % 20) + 1L, (i + 1000).toLong,
        ((i % 30) + 1) * 3.5, (i + 100).toLong)
    }.toDF("src", "dst", "eid", "amount", "timestamp")
    new PropertyGraph(
      Map("Account" -> accounts, "Merchant" -> merchants),
      Map(
        "Transaction" -> (EdgeType("Transaction", "Account", "Merchant"), transactions),
        "Purchase" -> (EdgeType("Purchase", "Account", "Merchant"), purchases)))
  }

  /** Simple dataset (test_fixture.rs:93-116): 20 TestNode, chain 1→…→10. */
  lazy val simpleGraph: PropertyGraph = {
    val s = spark
    import s.implicits._
    val nodes = (1 to 20).map(i => (i.toLong, s"Node $i", i * 10L))
      .toDF("id", "name", "value")
    val edges = (1 to 9).map(i => (i.toLong, i + 1L, i.toLong, i * 2L))
      .toDF("src", "dst", "eid", "weight")
    new PropertyGraph(
      Map("TestNode" -> nodes),
      Map("CONNECTS_TO" -> (EdgeType("CONNECTS_TO", "TestNode", "TestNode"), edges)))
  }

  def gqlSession(g: PropertyGraph = fraudGraph): GqlSession =
    GraphLiteSpark.open(spark, java.nio.file.Files
      .createTempDirectory("graft-wh").toString)
      .session("test").useGraph(g)
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator battery — one named query per operator class from
  * SURVEY.md §2 (scans, filters, projections, joins, aggregation, windows,
  * sorts, set ops, subqueries, scalar functions), each paired with an ANSI
  * SQL oracle executed by DuckDB over the same parquet tables.
  *
  * Parity rules (Spark vs DuckDB) used throughout:
  *  - integer-ish outputs normalized to BIGINT/LongType on BOTH sides;
  *  - order-dependent double aggregates wrapped in round(x, 2..4);
  *  - every query fully deterministic via a total ORDER BY;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all semantics; DuckDB ln() is Spark log().
  *
  * Reference semantics covered (citations into /root/reference):
  * filters/projections graphlite/src/plan/operators/logical.rs:129-137,
  * aggregation logical.rs:151-156, sort/limit logical.rs:164-178, set ops
  * executor.rs:7615-7978, joins physical.rs:161-192, subquery unnesting
  * plan/optimizers/logical_optimizer.rs:283-516.
  */
object Relational {

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- aggregation (HashAggregate analog; reference executor.rs:5717-6124)
    "q01_agg_groupby" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- filter + projection with arithmetic (pushdown-friendly)
    "q02_filter_project" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 30 && $"l_discount" <= 0.05)
        .select(
          $"l_orderkey",
          $"l_linenumber".cast("long").as("l_linenumber"),
          // raw double arithmetic is bit-reproducible across engines;
          // round() here would hit .xx5 shortest-repr boundaries
          ($"l_extendedprice" * (lit(1) - $"l_discount")).as("net"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // data — net completes a total order so ties compare stably
        // whatever the scan parallelism
        .orderBy($"l_orderkey", $"l_linenumber", $"net")
    }),

    // ---- equi-join + aggregation (shuffle join; broadcast picked by AQE)
    "q03_join_agg" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy($"c_mktsegment", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"c_mktsegment", $"o_orderpriority")
    }),

    // ---- sort + limit (TakeOrderedAndProject)
    "q04_sort_limit" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),

    // ---- distinct
    "q05_distinct" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_mktsegment", $"c_nationkey".cast("long").as("nk"))
        .distinct()
        .orderBy($"c_mktsegment", $"nk")
    }),

    // ---- UNION (distinct semantics, executor.rs:7615-7717)
    "q06_union" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
      val su = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
      c.union(su).distinct().orderBy($"nationkey")
    }),

    // ---- INTERSECT (executor.rs:7718-7864)
    "q07_intersect" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
      val su = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
      c.intersect(su).orderBy($"nationkey")
    }),

    // ---- EXCEPT (executor.rs:7896-7978)
    "q08_except" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d).select($"c_nationkey".cast("long").as("nationkey"))
      val su = Tables.supplier(s, d).select($"s_nationkey".cast("long").as("nationkey"))
      c.except(su).orderBy($"nationkey")
    }),

    // ---- HAVING (post-aggregation filter, executor.rs:4031-4136)
    "q09_having" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .groupBy($"c_nationkey".cast("long").as("nk"))
        .agg(count(lit(1)).as("n"), round(avg($"c_acctbal"), 4).as("avg_bal"))
        .filter($"n" > 5)
        .orderBy($"nk")
    }),

    // ---- CASE + CAST (executor.rs:4811-5147)
    "q10_case_cast" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 300000, "high")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("low").as("bucket"),
          floor($"o_totalprice").cast("long").as("floor_price"),
          $"o_orderkey".cast("string").as("key_str"))
        .orderBy($"o_orderkey")
    }),

    // ---- EXISTS -> left-semi join (logical_optimizer.rs:283-516)
    "q11_exists_semi" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter($"o_totalprice" > 400000).select($"o_custkey")
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // ---- NOT EXISTS -> left-anti join
    "q12_not_exists_anti" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select($"o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // ---- LEFT OUTER join with correct null handling (reference TODO at
    // executor.rs:3823-3840 — we ship the correct semantics)
    "q13_left_join" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("spent"))
        .orderBy($"c_custkey")
    }),

    // ---- window: ranking (beyond-reference; SURVEY.md §2.5 headroom)
    "q14_window_rank" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val w = Window.partitionBy($"nk").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(s, d)
        .select($"c_custkey", $"c_nationkey".cast("long").as("nk"), $"c_acctbal")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"nk", $"rn", $"rk", $"c_custkey", $"c_acctbal")
        .orderBy($"nk", $"rn")
    }),

    // ---- window: running aggregate over a frame
    "q15_window_running" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("running"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ---- string function battery (functions/string_functions.rs)
    "q16_string_funcs" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .select(
          $"c_custkey",
          upper($"c_name").as("u"),
          lower($"c_mktsegment").as("lo"),
          substring($"c_name", 1, 10).as("sub"),
          length($"c_name").cast("long").as("len"),
          regexp_replace($"c_name", "[0-9]+", "#").as("repl"),
          reverse($"c_name").as("rev"),
          concat($"c_name", lit("-"), $"c_mktsegment").as("cat"),
          trim(lit("  pad  ")).as("trm"))
        .orderBy($"c_custkey")
    }),

    // ---- math function battery (functions/mathematical_functions.rs)
    "q17_math_funcs" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.part(s, d)
        .select(
          $"p_partkey",
          round(sqrt($"p_retailprice"), 4).as("sq"),
          ceil($"p_retailprice").cast("long").as("ce"),
          floor($"p_retailprice").cast("long").as("fl"),
          round(pow($"p_size", lit(2)), 1).as("pw"),
          round(log($"p_retailprice"), 4).as("ln_"),
          round(log10($"p_retailprice"), 4).as("l10"),
          round(exp($"p_size".cast("double") / lit(100.0)), 4).as("ex"),
          abs($"p_size").cast("long").as("ab"),
          signum($"p_retailprice" - lit(1000.0)).as("sg"),
          ($"p_partkey" % 7).as("md"))
        .orderBy($"p_partkey")
    }),

    // ---- temporal functions (functions/temporal_functions.rs)
    "q18_temporal" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofmonth($"o_orderdate").cast("long").as("dy"),
          date_trunc("month", $"o_orderdate").as("mon_start"),
          ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as("plus7"),
          datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date"))
            .cast("long").as("dd"))
        .orderBy($"o_orderkey")
    }),

    // ---- null functions: NULLIF/COALESCE + 3VL CASE (null_functions.rs)
    "q19_null_funcs" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .select(
          $"c_custkey",
          nullif($"c_mktsegment", lit("BUILDING")).as("seg_nn"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(bldg)")).as("seg2"),
          when($"c_acctbal" < 0, $"c_acctbal").as("neg_bal"))
        .orderBy($"c_custkey")
    }),

    // ---- IN list predicate (executor.rs:5367-5431)
    "q20_in_list" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.nation(s, d)
        .filter($"n_nationkey".isin(1, 3, 5, 7))
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name")
        .orderBy($"n_nationkey")
    }),

    // ---- LIKE / STARTS WITH / ENDS WITH / CONTAINS (executor.rs:5353-5412)
    "q21_like" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_name".like("%wid%") || $"p_name".startsWith("small") ||
          $"p_name".endsWith("bolt"))
        .select($"p_partkey", $"p_name",
          $"p_name".contains("ring").as("has_ring"))
        .orderBy($"p_partkey")
    }),

    // ---- LIMIT + OFFSET (logical.rs:173-178)
    "q22_limit_offset" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderpriority")
        .orderBy($"o_orderkey")
        .offset(10).limit(20)
    }),

    // ---- ROLLUP (beyond-reference; SURVEY.md §2.4 headroom)
    "q23_rollup" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_mktsegment", $"c_nationkey".cast("long").as("nk"), $"c_acctbal")
        .rollup($"c_mktsegment", $"nk")
        .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("bal"))
        .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("nk"))
    }),

    // ---- COUNT(DISTINCT) (ast.rs:537-543)
    "q24_count_distinct" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // raw load: the distinct/decimal aggregation exchange parallelizes
      // downstream work by itself — a widen repartition before it is a
      // redundant extra stage (measured ~2x at sf0.1)
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("nd_part"),
          countDistinct($"l_suppkey").as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // ---- COLLECT -> sorted list (aggregate_functions.rs:365). Output as
    // a joined string, not array<string>: the driver's pandas compare
    // can't sort array cells (unhashable ndarray).
    "q25_collect_list" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.nation(s, d)
        .select($"n_regionkey".cast("long").as("rk"), $"n_name")
        .groupBy($"rk")
        .agg(array_join(sort_array(collect_list($"n_name")), ",").as("names"))
        .orderBy($"rk")
    }),

    // ---- CROSS join (logical.rs:276)
    "q26_cross_join" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val r1 = Tables.region(s, d).select($"r_name".as("a"))
      val r2 = Tables.region(s, d).select($"r_name".as("b"))
      r1.crossJoin(r2).orderBy($"a", $"b")
    }),

    // ---- scalar subquery (order-independent double: max)
    "q27_scalar_subquery" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val mx = o.agg(max($"o_totalprice").as("mx"))
      o.crossJoin(mx)
        .filter($"o_totalprice" > $"mx" * 0.9)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // ---- CUBE grouping sets (beyond-reference; SURVEY.md §2.4 headroom)
    "q29_cube" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_mktsegment", $"c_nationkey".cast("long").as("nk"))
        .cube($"c_mktsegment", $"nk")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("nk"))
    }),

    // ---- quantified comparison < ANY (ast.rs:1326-1334 -> min/max rewrite)
    "q30_quantified_any" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val mx = Tables.customer(s, d).agg(max($"c_acctbal").as("mx"))
      o.crossJoin(mx).filter($"o_totalprice" < $"mx")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // ---- approximate distinct (HLL; beyond-reference extension) —
    // rows-only check: sketch estimates are engine-specific by design
    // HLL sketch values differ per engine, so the oracle checks the
    // APPROXIMATION CONTRACT instead: the exact count plus a pass/fail
    // on |approx - exact| / exact <= 5% (HLL++ default rsd is 0.05).
    "q31_approx_distinct" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // raw load: the distinct/decimal aggregation exchange parallelizes
      // downstream work by itself — a widen repartition before it is a
      // redundant extra stage (measured ~2x at sf0.1)
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"),
          count(lit(1)).as("n"))
        .select($"l_returnflag", $"exact_parts", $"n",
          when(abs($"approx_parts" - $"exact_parts").cast("double") /
            $"exact_parts".cast("double") <= 0.05, "within_5pct")
            .otherwise("out_of_tolerance").as("approx_check"))
        .orderBy($"l_returnflag")
    }),

    // ---- timezone functions (timezone_functions.rs: AT_TIME_ZONE /
    // CONVERT_TZ analogs) + month arithmetic + last_day
    "q32_timezone" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey",
          from_utc_timestamp($"o_orderdate", "America/New_York").as("ny"),
          to_utc_timestamp($"o_orderdate", "Asia/Tokyo").as("from_tokyo"),
          ($"o_orderdate" + expr("INTERVAL 3 MONTHS")).as("plus3m"),
          last_day($"o_orderdate").as("eom"),
          // named-tz value accessor parity (value.rs:154): the zone's
          // DST-correct offset at each row's instant, in hours — the same
          // arithmetic EXTRACT_TIMEZONE('TIMEZONE_HOUR', zoned) compiles to
          ((unix_timestamp(from_utc_timestamp($"o_orderdate", "America/New_York")) -
            unix_timestamp($"o_orderdate")) / lit(3600.0)).as("ny_offset_hours"),
          // fixed-offset value parity (DateTimeWithFixedOffset,
          // value.rs:153): wall clock and offset at a numeric '+05:30'
          // zone — the same rendering LOCAL_DATETIME / EXTRACT_TIMEZONE
          // compile to for fixed-offset (tz, ts) structs
          from_utc_timestamp($"o_orderdate", "+05:30").as("ist_wall"),
          ((unix_timestamp(from_utc_timestamp($"o_orderdate", "+05:30")) -
            unix_timestamp($"o_orderdate")) / lit(3600.0)).as("ist_offset_hours"))
        .orderBy($"o_orderkey")
    }),

    // ---- TIME_WINDOW / WITHIN predicate (temporal_functions.rs:938):
    // half-open interval containment
    "q33_within_window" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val t1 = lit("1996-01-01").cast("timestamp")
      val t2 = lit("1998-01-01").cast("timestamp")
      Tables.orders(s, d)
        .filter($"o_orderdate" >= t1 && $"o_orderdate" < t2)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- DECIMAL(p,s) exact aggregation (reference TypeSpec DECIMAL(p,s),
    // ast.rs:826-830): money math bit-exact against DuckDB — every step is
    // exact decimal arithmetic, so no float-rounding parity tricks needed.
    // Compiled through the GQL CAST path's DecimalType(p,s) mapping.
    "q34_decimal_agg" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val li = // raw load: the distinct/decimal aggregation exchange parallelizes
      // downstream work by itself — a widen repartition before it is a
      // redundant extra stage (measured ~2x at sf0.1)
      Tables.load(s, d, "lineitem")
        .select($"l_returnflag",
          $"l_extendedprice".cast("decimal(12,2)").as("price"),
          $"l_discount".cast("decimal(12,2)").as("disc"))
      li.groupBy($"l_returnflag")
        .agg(
          sum($"price").cast("decimal(18,2)").as("sum_price"),
          sum(($"price" * (lit(1).cast("decimal(12,2)") - $"disc"))
            .cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_disc_price"),
          min($"price").as("min_price"),
          max($"price").as("max_price"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    }),

    // ---- bi-temporal AS OF over SCD-2 intervals (reference TemporalValue,
    // value.rs:19-24; SURVEY §1.2): each customer's order history becomes
    // SCD-2 rows (valid_from = orderdate, valid_to = next orderdate), and
    // the AS-OF instant picks the row whose interval covers it. The
    // validity predicate runs through Bitemporal.isValidAt on the
    // (value, valid_from, valid_to, tx_time) struct — one window shuffle
    // on o_custkey, then a pure per-row filter.
    "q35_asof_scd2" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import graft.functions.Bitemporal
      val t = lit("1997-06-01").cast("timestamp")
      val scd = Bitemporal.scd2(Tables.orders(s, d),
        keys = Seq("o_custkey"), ts = "o_orderdate", tieBreak = Seq("o_orderkey"))
        .withColumn("tv", Bitemporal.temporalValue(
          $"o_totalprice", $"valid_from", $"valid_to", lit("1998-01-01").cast("timestamp")))
      Bitemporal.asOf(scd, "tv", t)
        .select($"o_custkey".cast("long").as("cust"),
          $"o_orderkey".cast("long").as("okey"),
          $"tv".getField("value").as("price"))
        .orderBy($"cust", $"okey")
    }),

    // ---- FULL OUTER join
    "q28_full_outer" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val cn = Tables.customer(s, d)
        .groupBy($"c_nationkey".cast("long").as("nk")).agg(count(lit(1)).as("nc"))
      val sn = Tables.supplier(s, d)
        .groupBy($"s_nationkey".cast("long").as("snk")).agg(count(lit(1)).as("ns"))
      cn.join(sn, cn("nk") === sn("snk"), "full_outer")
        .select(
          coalesce($"nk", $"snk").as("nationkey"),
          coalesce($"nc", lit(0L)).as("n_customers"),
          coalesce($"ns", lit(0L)).as("n_suppliers"))
        .orderBy($"nationkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty, count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | l_extendedprice*(1-l_discount) AS net
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_orderkey, l_linenumber, net""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice),2) AS total
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q04_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q05_distinct" ->
      """SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk
        |FROM customer ORDER BY c_mktsegment, nk""".stripMargin,
    "q06_union" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q07_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q08_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q09_having" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
        | round(avg(c_acctbal),4) AS avg_bal
        |FROM customer GROUP BY 1 HAVING count(*) > 5 ORDER BY nk""".stripMargin,
    "q10_case_cast" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 300000 THEN 'high'
        |      WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        | CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
        | CAST(o_orderkey AS VARCHAR) AS key_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q11_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q12_not_exists_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q13_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q14_window_rank" ->
      """SELECT nk, rn, rk, c_custkey, c_acctbal FROM (
        | SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk, c_acctbal,
        |  CAST(row_number() OVER (PARTITION BY CAST(c_nationkey AS BIGINT)
        |    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
        |  CAST(rank() OVER (PARTITION BY CAST(c_nationkey AS BIGINT)
        |    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
        | FROM customer) t
        |WHERE rn <= 3 ORDER BY nk, rn""".stripMargin,
    "q15_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q16_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS u, lower(c_mktsegment) AS lo,
        | substring(c_name, 1, 10) AS sub, CAST(length(c_name) AS BIGINT) AS len,
        | regexp_replace(c_name, '[0-9]+', '#', 'g') AS repl,
        | reverse(c_name) AS rev, c_name || '-' || c_mktsegment AS cat,
        | trim('  pad  ') AS trm
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q17_math_funcs" ->
      """SELECT p_partkey, round(sqrt(p_retailprice),4) AS sq,
        | CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        | CAST(floor(p_retailprice) AS BIGINT) AS fl,
        | round(pow(p_size, 2),1) AS pw,
        | round(ln(p_retailprice),4) AS ln_,
        | round(log10(p_retailprice),4) AS l10,
        | round(exp(p_size/100.0),4) AS ex,
        | CAST(abs(p_size) AS BIGINT) AS ab,
        | CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sg,
        | p_partkey % 7 AS md
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q18_temporal" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dy,
        | date_trunc('month', o_orderdate) AS mon_start,
        | o_orderdate + INTERVAL 7 DAY AS plus7,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS dd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q19_null_funcs" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_nn,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg2,
        | CASE WHEN c_acctbal < 0 THEN c_acctbal END AS neg_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q20_in_list" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name FROM nation
        |WHERE n_nationkey IN (1, 3, 5, 7) ORDER BY n_nationkey""".stripMargin,
    "q21_like" ->
      """SELECT p_partkey, p_name, p_name LIKE '%ring%' AS has_ring FROM part
        |WHERE p_name LIKE '%wid%' OR p_name LIKE 'small%' OR p_name LIKE '%bolt'
        |ORDER BY p_partkey""".stripMargin,
    "q22_limit_offset" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin,
    "q23_rollup" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n,
        | round(sum(c_acctbal),2) AS bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment, CAST(c_nationkey AS BIGINT))
        |ORDER BY c_mktsegment NULLS FIRST, nk NULLS FIRST""".stripMargin,
    "q24_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        | count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_collect_list" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS rk,
        | array_to_string(list_sort(list(n_name)), ',') AS names
        |FROM nation GROUP BY 1 ORDER BY rk""".stripMargin,
    "q26_cross_join" ->
      """SELECT r1.r_name AS a, r2.r_name AS b
        |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin,
    "q27_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin,
    "q29_cube" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nk, count(*) AS n
        |FROM customer GROUP BY CUBE(c_mktsegment, CAST(c_nationkey AS BIGINT))
        |ORDER BY c_mktsegment NULLS FIRST, nk NULLS FIRST""".stripMargin,
    "q30_quantified_any" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice < ANY (SELECT c_acctbal FROM customer)
        |ORDER BY o_orderkey""".stripMargin,
    "q31_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        | count(*) AS n, 'within_5pct' AS approx_check
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q32_timezone" ->
      """SELECT o_orderkey,
        | CAST(timezone('America/New_York', o_orderdate::TIMESTAMPTZ) AS TIMESTAMP) AS ny,
        | CAST(timezone('Asia/Tokyo', o_orderdate) AS TIMESTAMP) AS from_tokyo,
        | o_orderdate + INTERVAL 3 MONTH AS plus3m,
        | last_day(o_orderdate) AS eom,
        | epoch(CAST(timezone('America/New_York', o_orderdate::TIMESTAMPTZ) AS TIMESTAMP)
        |   - o_orderdate) / 3600.0 AS ny_offset_hours,
        | o_orderdate + INTERVAL 330 MINUTE AS ist_wall,
        | 5.5 AS ist_offset_hours
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q33_within_window" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // The decimal aggregates are rendered as VARCHAR on the oracle side
    // only: DuckDB's pandas fetch coerces DECIMAL to float64 (dropping
    // trailing zeros: 3854893.80 -> "3854893.8"), while the Spark parquet
    // output keeps exact decimal128 values that print with full scale.
    // CAST(dec AS VARCHAR) preserves the exact scale-2/scale-4 rendering,
    // so the comparison is an *exact* digit-for-digit decimal check — the
    // Spark output itself stays DECIMAL-typed.
    "q34_decimal_agg" ->
      """SELECT l_returnflag,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
        | CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |   AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS sum_disc_price,
        | CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS min_price,
        | CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS max_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_asof_scd2" ->
      """WITH s AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to
        | FROM orders)
        |SELECT CAST(o_custkey AS BIGINT) AS cust,
        |       CAST(o_orderkey AS BIGINT) AS okey,
        |       o_totalprice AS price
        |FROM s
        |WHERE TIMESTAMP '1997-06-01' >= valid_from
        |  AND (valid_to IS NULL OR TIMESTAMP '1997-06-01' < valid_to)
        |ORDER BY cust, okey""".stripMargin,
    "q28_full_outer" ->
      """SELECT coalesce(cn.nk, sn.snk) AS nationkey,
        | coalesce(cn.nc, 0) AS n_customers, coalesce(sn.ns, 0) AS n_suppliers
        |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nk, count(*) AS nc
        |      FROM customer GROUP BY 1) cn
        |FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS snk, count(*) AS ns
        |      FROM supplier GROUP BY 1) sn
        |ON cn.nk = sn.snk ORDER BY nationkey""".stripMargin
  )
}

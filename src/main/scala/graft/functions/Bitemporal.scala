package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bi-temporal value analog of the reference's `TemporalValue` wrapper
  * (graphlite/src/storage/value.rs:19-24: value + valid_from + optional
  * valid_to + transaction_time), re-expressed the Spark way: a typed
  * struct column `(value, valid_from, valid_to, tx_time)` instead of a
  * boxed runtime value, so validity predicates stay Catalyst expressions
  * (codegen'd, pushdown-friendly) and SCD-2 interval construction is a
  * single window function over the change log.
  *
  * Semantics parity (value.rs:53-60):
  *  - `isValidAt(tv, t)`  ⟺ t >= valid_from && (valid_to IS NULL || t < valid_to)
  *  - `isCurrent(tv)`     ⟺ valid_to IS NULL || valid_to > now
  *
  * Scale note: `asOf` is a pure per-row filter (no shuffle, pushes into
  * the scan when the struct fields are top-level columns); `scd2` costs
  * one window shuffle on the key — the same partitioning any per-key
  * history query needs anyway.
  */
object Bitemporal {

  /** Build a bi-temporal struct. `validTo` null = open interval. */
  def temporalValue(value: Column, validFrom: Column,
      validTo: Column = lit(null), txTime: Column = current_timestamp()): Column =
    struct(
      value.as("value"),
      validFrom.cast("timestamp").as("valid_from"),
      validTo.cast("timestamp").as("valid_to"),
      txTime.cast("timestamp").as("tx_time"))

  /** Validity at an instant (value.rs:53 `is_valid_at`). */
  def isValidAt(tv: Column, t: Column): Column = {
    val ts = t.cast("timestamp")
    ts >= tv.getField("valid_from") &&
      (tv.getField("valid_to").isNull || ts < tv.getField("valid_to"))
  }

  /** Currently-valid check (value.rs:58 `is_current`). */
  def isCurrent(tv: Column): Column =
    tv.getField("valid_to").isNull ||
      tv.getField("valid_to") > current_timestamp()

  /** AS OF filter over a frame with a bi-temporal struct column. */
  def asOf(df: DataFrame, tvCol: String, t: Column): DataFrame =
    df.filter(isValidAt(col(tvCol), t))

  /** SCD-2 intervals from an event/change log: each row's `valid_from` is
    * its own timestamp and `valid_to` is the NEXT change for the same key
    * (null = still current) — the planned SURVEY §1.2 mapping of the
    * reference's per-value temporal wrapper onto columnar history tables.
    * `tieBreak` columns make same-timestamp changes deterministic.
    */
  def scd2(df: DataFrame, keys: Seq[String], ts: String,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((ts +: tieBreak).map(col): _*)
    df.withColumn("valid_from", col(ts).cast("timestamp"))
      .withColumn("valid_to", lead(col(ts), 1).over(w).cast("timestamp"))
  }
}

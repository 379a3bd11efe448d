package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, attach the latest right row
  * with the same key and `rightT <= leftT` (ties broken by the largest
  * `rightSeq`).
  *
  * This is THE lookup against an SCD2/CDC-versioned table ("what did the
  * dimension look like when this event happened") and Spark has no native
  * operator for it. The naive formulations explode at scale: an equi+theta
  * join (key = key AND t' <= t) plans as a broadcast-nested-loop or a
  * sort-merge with per-key quadratic scan, and a correlated subquery
  * re-scans the right side per left row.
  *
  * Implementation: tag both sides, union, and take `last(payload,
  * ignoreNulls)` over a per-key window ordered by (t, side, seq) — right
  * rows sort before left rows at equal timestamps, so the match is
  * inclusive. ONE shuffle on the key, linear per-key work, no join node at
  * all. This is the canonical 100 TB as-of shape (the same trick
  * backs point-in-time joins in feature stores).
  */
object AsOfJoin {

  /** @param left     driving rows (kept entirely)
    * @param right    versioned/event rows to look up
    * @param leftKey  join key column on `left`
    * @param rightKey join key column on `right`
    * @param leftT    event-time column on `left`
    * @param rightT   event-time column on `right`
    * @param rightSeq tiebreak column on `right` (e.g. LSN / event id)
    * @param payload  right columns to attach (emitted as `asof_<name>`)
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftT: String, rightT: String, rightSeq: String,
           payload: Seq[String]): DataFrame = {
    val key = "__asof_key"
    val t = "__asof_t"
    val side = "__asof_side"
    val seq = "__asof_seq"
    val pay = "__asof_payload"

    val payStruct = struct(payload.map(right(_)): _*)
    val r = right.select(
      right(rightKey).as(key),
      right(rightT).cast("timestamp_ntz").as(t),
      lit(0).as(side),
      right(rightSeq).cast("long").as(seq),
      payStruct.as(pay))

    val lCols = left.columns.map(left(_))
    val l = left.select(lCols :+
      left(leftKey).as(key) :+
      left(leftT).cast("timestamp_ntz").as(t) :+
      lit(1).as(side) :+
      lit(null).cast("long").as(seq) :+
      lit(null).cast(r.schema(pay).dataType).as(pay): _*)

    // union with schema alignment: right side carries nulls for left cols
    val rAligned = r.select(
      left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(key), col(t), col(side), col(seq), col(pay)): _*)

    val w = Window.partitionBy(key)
      .orderBy(col(t).asc, col(side).asc, col(seq).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .withColumn("__match", last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and `rightT >= leftT` (ties broken by the smallest
    * `rightSeq`) — "the next event at or after this instant", the
    * attribution-window / next-touch lookup. Same union-window shape as
    * [[asOf]] (one key shuffle, no join node); the window just runs over
    * DESCENDING time, so the running `last` at a left row is the nearest
    * future right row. Right rows sort before left at equal instants
    * (inclusive) and by seq DESC so the smallest seq is seen last.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftT: String, rightT: String, rightSeq: String,
                  payload: Seq[String]): DataFrame = {
    val key = "__asof_key"
    val t = "__asof_t"
    val side = "__asof_side"
    val seq = "__asof_seq"
    val pay = "__asof_payload"

    val payStruct = struct(payload.map(right(_)): _*)
    val r = right.select(
      right(rightKey).as(key),
      right(rightT).cast("timestamp_ntz").as(t),
      lit(0).as(side),
      right(rightSeq).cast("long").as(seq),
      payStruct.as(pay))

    val lCols = left.columns.map(left(_))
    val l = left.select(lCols :+
      left(leftKey).as(key) :+
      left(leftT).cast("timestamp_ntz").as(t) :+
      lit(1).as(side) :+
      lit(null).cast("long").as(seq) :+
      lit(null).cast(r.schema(pay).dataType).as(pay): _*)

    val rAligned = r.select(
      left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(key), col(t), col(side), col(seq), col(pay)): _*)

    val w = Window.partitionBy(key)
      .orderBy(col(t).desc, col(side).asc, col(seq).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned)
      .withColumn("__match", last(col(pay), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }
}

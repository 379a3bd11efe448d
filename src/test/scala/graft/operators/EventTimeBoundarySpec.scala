package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.time.LocalDateTime

/** Boundary-condition pins for the two r13 skew-fix rewrites.
  *
  * `window_funnel_depth` (ordered scan) and `multi_touch_attribution`
  * (day-binned range join) replaced per-user theta joins whose strict /
  * inclusive bounds and id tie-breaks were enforced by join predicates.
  * The rewrites enforce the same semantics through SORT ORDER (anchor
  * before same-instant successors, ids descending under a descending
  * frame) and through ±1 µs bound shifts onto [start, end) bins — rules
  * that are easy to get off-by-one and that the organic testdata barely
  * exercises (micro-resolution timestamps rarely tie, and no event sits
  * exactly 7 days from another). This spec crafts those exact
  * collisions — same-instant signup/view, view at precisely s+7d,
  * purchase at precisely v_ts and at the bin edge one day-bin away —
  * and asserts both catalog queries equal their original join-form
  * references row for row.
  */
class EventTimeBoundarySpec extends SparkSuite {
  import spark.implicits._

  private val T0 = LocalDateTime.of(2024, 3, 1, 12, 0, 0)
  private def us(base: LocalDateTime, micros: Long): LocalDateTime =
    base.plusNanos(micros * 1000L)
  private val day = 86400000000L

  /** (event_id, ts, user_id, event_type) — value/props unused by both queries */
  private val rows: Seq[(Long, LocalDateTime, Long, String)] = Seq(
    // u1: same-instant view excluded; first real view +1µs; purchase at
    // v_ts excluded (strict >); purchase at exactly s+7d included
    (101L, T0, 1L, "signup"),
    (102L, T0, 1L, "view"),
    (103L, us(T0, 1), 1L, "view"),
    (104L, us(T0, 1), 1L, "purchase"),
    (105L, us(T0, 7 * day), 1L, "purchase"),
    // u2: view at exactly s+7d included; purchase at the same instant
    // fails the strict p > v
    (201L, T0, 2L, "signup"),
    (202L, us(T0, 7 * day), 2L, "view"),
    (203L, us(T0, 7 * day), 2L, "purchase"),
    // u3: view one microsecond past the window
    (301L, T0, 3L, "signup"),
    (302L, us(T0, 7 * day + 1), 3L, "view"),
    // u4: two same-instant signups, both chains must convert
    (401L, T0, 4L, "signup"),
    (402L, T0, 4L, "signup"),
    (403L, us(T0, 3 * day), 4L, "view"),
    (404L, us(T0, 5 * day), 4L, "purchase"),
    // u6: same-ts view tie (ids 7 then 5 — min id wins); purchase at
    // v_ts excluded, +1µs included
    (607L, us(T0, 2 * day), 6L, "view"),
    (605L, us(T0, 2 * day), 6L, "view"),
    (601L, T0, 6L, "signup"),
    (602L, us(T0, 2 * day), 6L, "purchase"),
    (603L, us(T0, 2 * day + 1), 6L, "purchase"),
    // u7: purchase BEFORE the first view must not complete the chain
    (701L, T0, 7L, "signup"),
    (702L, us(T0, 1 * day), 7L, "purchase"),
    (703L, us(T0, 2 * day), 7L, "view"),
    // u8: view before the signup is not a touch
    (801L, T0, 8L, "signup"),
    (802L, us(T0, -day), 8L, "view"),
    // u9 (multi-touch bin edges): views at exactly p-7d (excluded),
    // p-7d+1µs (included), a different-day-bin view 6d23h59m before
    // (included), at p (included), p+1µs (excluded)
    (901L, us(T0, 0), 9L, "purchase"),
    (902L, us(T0, -7 * day), 9L, "view"),
    (903L, us(T0, -7 * day + 1), 9L, "view"),
    (904L, us(T0, -(7 * day) + 60000000L), 9L, "view"),
    (905L, us(T0, 0), 9L, "view"),
    (906L, us(T0, 1), 9L, "view"))

  private lazy val dir: String = {
    val d = graft.SparkSuite.scratchDir("graft-boundary")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** The pre-r13 join formulation of the funnel — the semantic reference. */
  private def funnelReference(ev: DataFrame): DataFrame = {
    val su = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("event_id").as("s_id"))
    val vw = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val s2 = su.join(vw, Seq("user_id"))
      .filter(col("v_ts") > col("s_ts") &&
        col("v_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id", "s_ts", "s_id")
      .agg(min(struct(col("v_ts"), col("v_id"))).as("v"))
      .select(col("user_id"), col("s_ts"), col("s_id"), col("v.v_ts").as("v_ts"))
    val s3 = s2.join(pu, Seq("user_id"))
      .filter(col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .groupBy("user_id", "s_ts", "s_id").agg(min("p_ts").as("p_ts"))
    val u1 = su.groupBy("user_id").agg(count(lit(1)).as("n1"))
    val u2 = s2.groupBy("user_id").agg(count(lit(1)).as("n2"))
    val u3 = s3.groupBy("user_id").agg(count(lit(1)).as("n3"))
    u1.join(u2, Seq("user_id"), "left_outer")
      .join(u3, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        when(col("n3").isNotNull, 3L)
          .when(col("n2").isNotNull, 2L).otherwise(1L).as("funnel_depth"))
      .groupBy("funnel_depth").agg(count(lit(1)).as("n_users"))
  }

  /** The pre-r13 theta-join formulation of multi-touch — the reference. */
  private def touchReference(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val touches = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") > col("p_ts") - expr("INTERVAL 7 DAY"))
    val w = Window.partitionBy("purchase_id").orderBy(col("v_ts"), col("view_id"))
    val cnt = Window.partitionBy("purchase_id")
    touches
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cnt))
      .select(col("purchase_id"), col("view_id"),
        col("rk").cast("long").as("rk"), col("n"),
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rk") === 1 || col("rk") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2).cast("double"))
          .as("credit"))
  }

  private def events: DataFrame = graft.QueryDef.t(spark, dir, "events")

  test("funnel ordered scan matches the join reference on crafted tie/boundary cases") {
    val got = graft.SparkEntry.queries("window_funnel_depth")(spark, dir)
      .select("funnel_depth", "n_users").as[(Long, Long)].collect().toMap
    val want = funnelReference(events)
      .select("funnel_depth", "n_users").as[(Long, Long)].collect().toMap
    assert(got === want, s"got $got want $want")
    // the fixture must actually exercise each depth
    assert(want.keySet === Set(1L, 2L, 3L), s"fixture degenerate: $want")
  }

  test("binned multi-touch matches the theta-join reference at the window edges") {
    val key = (df: DataFrame) => df
      .select("purchase_id", "view_id", "rk", "n", "credit")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val got = key(graft.SparkEntry.queries("multi_touch_attribution")(spark, dir))
    val want = key(touchReference(events))
    assert(got === want,
      s"missing=${want -- got} phantom=${got -- want}")
    // the boundary views must be present/absent exactly as designed
    val u9 = got.filter(_._1 == 901L).map(_._2)
    assert(u9 === Set(903L, 904L, 905L), s"u9 touches: $u9")
  }

  // ---- events_sessionize_salted: the r14 salt-and-merge rewrite must be
  // bit-identical to the plain per-user window, most of all AT the 6-hour
  // salt-block edges its decomposition introduces (a gap bridging a block
  // boundary, a gap of exactly 30 min across one, sessions spanning
  // EMPTY blocks, same-instant ties at a boundary) — and on a randomized
  // stream where every such collision happens by volume.

  private val blockMs = 21600000L // 6h, the query's salt width
  private def atMs(ms: Long): LocalDateTime =
    LocalDateTime.of(1970, 1, 1, 0, 0).plusNanos(ms * 1000000L)

  private lazy val saltDir: String = {
    val gap = 1800000L // the 30-min threshold (strictly-greater starts a session)
    val crafted: Seq[(Long, LocalDateTime, Long, String)] = Seq(
      // uA: one 26-hour session crossing 4 block edges (10-min steps)
      (1 to 156).map(i => (1000L + i, atMs(4 * blockMs + i * 600000L), 21L, "view")),
      // uB: gap of EXACTLY 30 min across a block edge (same session),
      // then 30 min + 1 ms across the next edge (new session)
      Seq((2001L, atMs(blockMs - 1000L), 22L, "view"),
          (2002L, atMs(blockMs - 1000L + gap), 22L, "view"),
          (2003L, atMs(2 * blockMs - 1000L), 22L, "view"),
          (2004L, atMs(2 * blockMs - 1000L + gap + 1L), 22L, "view")),
      // uC: empty blocks between events; same-instant tie AT an edge
      Seq((3001L, atMs(500L), 23L, "view"),
          (3002L, atMs(4 * blockMs), 23L, "view"),
          (3003L, atMs(4 * blockMs), 23L, "purchase"),
          (3004L, atMs(9 * blockMs + 42L), 23L, "view")),
      // uD: single event
      Seq((4001L, atMs(7 * blockMs + 7L), 24L, "view"))
    ).flatten
    val rnd = new scala.util.Random(20260816L)
    // randomized stream: 400 events, 8 users, 3 days — ties and 30-min
    // straddles occur by volume (ts quantized to 10 min so exact-gap and
    // same-instant collisions are common)
    val fuzz = (1 to 400).map { i =>
      (9000L + i, atMs(rnd.nextInt(432) * 600000L), 30L + rnd.nextInt(8), "view")
    }
    val d = graft.SparkSuite.scratchDir("graft-salt")
    (crafted ++ fuzz).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("salt-and-merge sessionize equals the per-user window at salt-block edges") {
    val key = (df: DataFrame) => df
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    val got = key(graft.SparkEntry.queries("events_sessionize_salted")(spark, saltDir))
    val want = key(graft.SparkEntry.queries("events_sessionize")(spark, saltDir))
    assert(got === want, s"missing=${(want -- got).take(10)} phantom=${(got -- want).take(10)}")
    // the crafted cases resolve as designed: uA is one session, uB's
    // exact-30-min boundary gap merges while +1ms splits, uC bridges
    // empty blocks into new sessions
    val byUser = want.groupBy(_._1)
    assert(byUser(21L).map(_._3) === Set(1L), "uA must be one session")
    assert(byUser(22L).toSeq.sortBy(_._2).map(_._3) === Seq(1L, 1L, 2L, 3L), "uB boundary gaps")
    assert(byUser(23L).toSeq.sortBy(_._2).map(_._3) === Seq(1L, 2L, 2L, 3L), "uC empty blocks + tie")
    assert(byUser(24L).map(_._3) === Set(1L), "uD singleton")
  }

  // ---- multi_touch_last_n (r16): the seq-range rewrite must equal the
  // capped join reference exactly where its arithmetic can be off by one
  // — at the 8-touch cap cut, at the 7-day open edge (strict >, realized
  // by the +1 µs shifted anchor's sort position), at the inclusive p_ts
  // edge, and under same-instant view ties straddling the cap.

  /** The join-form reference: all qualifying pairs, keep the last 8 by
    * (v_ts, view_id) descending, re-rank ascending.
    */
  private def cappedReference(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val wDesc = Window.partitionBy("purchase_id")
      .orderBy(col("v_ts").desc, col("view_id").desc)
    val kept = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") > col("p_ts") - expr("INTERVAL 7 DAY"))
      .withColumn("rd", row_number().over(wDesc))
      .filter(col("rd") <= 8)
    val w = Window.partitionBy("purchase_id").orderBy(col("v_ts"), col("view_id"))
    val cnt = Window.partitionBy("purchase_id")
    kept
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cnt))
      .select(col("purchase_id"), col("view_id"),
        col("rk").cast("long").as("rk"), col("n"),
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rk") === 1 || col("rk") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2).cast("double"))
          .as("credit"))
  }

  private lazy val cappedDir: String = {
    val crafted: Seq[(Long, LocalDateTime, Long, String)] = Seq(
      // u11: 12 hourly views then a purchase — the cap must keep exactly
      // the LAST 8 (ids 5004..5011), rk 1..8, n=8
      (1 to 12).map(i => (5000L + i - 1, us(T0, i * 3600000000L), 11L, "view")) ++
        Seq((5100L, us(T0, 13 * 3600000000L), 11L, "purchase")),
      // u12: 10 views BEFORE the window plus 4 inside — the window edge
      // cuts deeper than the cap (n=4, vprev+1 > vmax-7); boundary views
      // at exactly p-7d (out, strict >) and p-7d+1µs (in)
      (1 to 10).map(i => (6000L + i, us(T0, -(8 * day) + i * 60000000L), 12L, "view")) ++
        Seq((6020L, us(T0, -7 * day), 12L, "view"), // exactly p-7d: out
            (6021L, us(T0, -7 * day + 1), 12L, "view"), // +1µs: in
            (6022L, us(T0, -3 * day), 12L, "view"),
            (6023L, us(T0, -day), 12L, "view"),
            (6024L, us(T0, 0), 12L, "view"), // exactly p_ts: in
            (6100L, us(T0, 0), 12L, "purchase")),
      // u13: 10 same-instant views at the cap edge — the cut must keep
      // the 8 highest ids (deterministic (v_ts, view_id) order)
      (1 to 10).map(i => (7000L + i, us(T0, day), 13L, "view")) ++
        Seq((7100L, us(T0, 2 * day), 13L, "purchase")),
      // u14: purchase with no views in window — absent from the output
      Seq((8001L, us(T0, -(7 * day) - 1), 14L, "view"),
          (8100L, us(T0, 0), 14L, "purchase")),
      // u15: two purchases 1µs apart sharing the same two views — the
      // view AT the first purchase's instant must count for BOTH
      // (inclusive <=), and neither purchase's range double-consumes
      Seq((9001L, us(T0, -day), 15L, "view"),
          (9002L, us(T0, 0), 15L, "view"),
          (9100L, us(T0, 0), 15L, "purchase"),
          (9101L, us(T0, 1), 15L, "purchase"))
    ).flatten
    val d = graft.SparkSuite.scratchDir("graft-capped")
    crafted.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("capped multi-touch equals the join reference at cap and window edges") {
    val key = (df: DataFrame) => df
      .select("purchase_id", "view_id", "rk", "n", "credit")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val got = key(graft.SparkEntry.queries("multi_touch_last_n")(spark, cappedDir))
    val want = key(cappedReference(graft.QueryDef.t(spark, cappedDir, "events")))
    assert(got === want, s"missing=${want -- got} phantom=${got -- want}")
    val byPurchase = got.groupBy(_._1)
    // u11: exactly the last 8 of 12
    assert(byPurchase(5100L).map(_._2) === (5004L to 5011L).toSet)
    assert(byPurchase(5100L).forall(_._4 == 8L))
    // u12: window cuts deeper than the cap — 4 in-window views
    assert(byPurchase(6100L).map(_._2) === Set(6021L, 6022L, 6023L, 6024L))
    // u13: same-instant tie cut keeps the 8 highest ids
    assert(byPurchase(7100L).map(_._2) === (7003L to 7010L).toSet)
    // u14: no in-window views -> no rows
    assert(!byPurchase.contains(8100L))
    // u15: the view AT the first purchase's instant counts for both
    assert(byPurchase(9100L).map(_._2) === Set(9001L, 9002L))
    assert(byPurchase(9101L).map(_._2) === Set(9001L, 9002L))
  }
}

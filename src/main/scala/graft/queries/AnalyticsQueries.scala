package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Relational analytics over the harness tables — the aggregate / join /
  * window / set-op operator classes of SURVEY.md §2.5/2.6/2.8 at TPC-H
  * shape, sized for the 100 TB design point (partial aggregation,
  * broadcastable dimensions, single-pass windows).
  *
  * Float policy: every double aggregate is rounded to 2 decimals in BOTH
  * engines; source money columns carry 2–4 decimal digits so sums sit
  * far from rounding boundaries regardless of accumulation order.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    Q("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       round(sum(l_quantity), 2) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_base_price,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |       round(avg(l_quantity), 2) AS avg_qty,
             |       round(avg(l_extendedprice), 2) AS avg_price,
             |       count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "A1: hash aggregate with partial+final (TPC-H Q1 shape)"),

    Q("q3_shipping_priority",
      (s, dir) => {
        val cutoff = to_timestamp(lit("1998-06-15 00:00:00"))
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
        val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
             |GROUP BY l_orderkey, orderdate
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin),
      doc = "TPC-H Q3 shape: selective fact joins + broadcast dim + top-k by revenue"),

    Q("q5_local_supplier",
      (s, dir) => {
        val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).filter(
            col("o_orderdate") >= cutoff), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin),
      doc = "TPC-H Q5 shape: 6-table join, all dims broadcast, single fact shuffle"),

    Q("events_hourly",
      (s, dir) => Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour"), col("event_type")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             |       event_type,
             |       count(*) AS n,
             |       round(sum(value), 2) AS sum_value
             |FROM events
             |GROUP BY hour, event_type
             |ORDER BY hour, event_type""".stripMargin),
      doc = "event-time tumbling-window aggregate (batch twin of the streaming path)"),

    // Sequential funnel (view → click → purchase, strictly ordered in
    // event time): per user, the first view, the first click AFTER it,
    // the first purchase after that — the product-analytics staple the
    // windowed/sessionized queries don't cover. Three keyed min-
    // aggregates chained by equi-joins on user_id (each stage's table
    // is |users|-sized, partial-aggregated; no window over raw events).
    // Attribution: the batch twin of EventStream.attributionPairs (the
    // watermarked stream-stream interval join; stream ≡ batch is
    // pinned by AttributionStreamSpec).
    Q("events_attribution",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts"))
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"), col("value").as("purchase_value"))
        graft.streaming.EventStream.attributionPairs(clicks, conv,
            "user_id", "click_ts", "purchase_ts", windowMinutes = 240)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            col("click_ts"), col("purchase_ts"),
            round(col("purchase_value"), 2).as("purchase_value"))
          .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
      },
      Some("""SELECT c.user_id, c.event_id AS click_id,
             |       p.event_id AS purchase_id,
             |       c.ts AS click_ts, p.ts AS purchase_ts,
             |       round(p.value, 2) AS purchase_value
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 240 MINUTE
             |ORDER BY c.user_id, click_id, purchase_id""".stripMargin),
      doc = "click→purchase attribution pairs within a 4 h window " +
        "(equi-join on user + time range; the stream-stream join's batch twin)"),

    // Last-click reduction: the latest click at-or-before each
    // purchase, windowed — AsofJoin (single-shuffle carry-forward, no
    // pair explosion) + a post-filter on the window, NOT the pairs
    // query above grouped (which would materialize every pair first).
    Q("events_attribution_last",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // one click per (user, ts): asof tie determinism (see AsofJoin doc)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts").as("click_ts"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id"), col("click_ts"), col("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        graft.operators.AsofJoin.asof(purchases, clicks,
            key = "user_id", probeTime = "purchase_ts",
            buildTime = "click_ts", payload = Seq("click_id"),
            buildTimeAs = Some("click_ts"))
          .filter(col("purchase_ts") <
            col("click_ts") + expr("INTERVAL '240' MINUTE"))
          .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
            col("click_id"), col("click_ts"))
          .orderBy(col("purchase_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |pairs AS (
             |  SELECT p.user_id, p.event_id AS purchase_id,
             |         p.ts AS purchase_ts, c.click_id, c.click_ts,
             |         row_number() OVER (
             |           PARTITION BY p.event_id
             |           ORDER BY c.click_ts DESC) AS rn
             |  FROM events p JOIN c
             |    ON p.user_id = c.user_id AND c.click_ts <= p.ts
             |   AND p.ts < c.click_ts + INTERVAL 240 MINUTE
             |  WHERE p.event_type = 'purchase')
             |SELECT user_id, purchase_id, purchase_ts, click_id, click_ts
             |FROM pairs WHERE rn = 1
             |ORDER BY purchase_id""".stripMargin),
      doc = "last-click attribution: latest click ≤ purchase within 4 h " +
        "via the single-shuffle as-of join (no pair explosion)"),

    Q("events_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        v.join(c.select(col("user_id"), col("t2")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), col("t3")), Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2).otherwise(1).as("stage"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS t2
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND e.ts > v.t1
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS t3
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
             |  GROUP BY e.user_id)
             |SELECT v.user_id,
             |       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
             |                 WHEN c.user_id IS NOT NULL THEN 2
             |                 ELSE 1 END AS INTEGER) AS stage
             |FROM v
             |LEFT JOIN c ON v.user_id = c.user_id
             |LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin),
      doc = "sequential event-time funnel: first view -> first later click -> first later purchase, stage per user"),

    Q("events_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser))
        val newSession = when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L)
        Tables.events(s, dir)
          .withColumn("session_idx",
            sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |                       THEN 1 ELSE 0 END)
             |              OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |       max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
             |FROM s
             |GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin),
      doc = "sessionization: 30-min-gap windows via lag + running sum (batch twin of flatMapGroupsWithState)"),

    // The whale-user-safe twin: identical sessions via time-bucketed
    // two-phase windows (Skew.sessionizeBucketed) — event-level work
    // keys on (user, 2h bucket), never on user alone, so one user
    // owning half the events shards across its timeline instead of
    // serializing one window task. Same oracle as events_sessionize:
    // the pair is a value-level equivalence check, like the cc pair.
    Q("events_sessionize_bucketed",
      (s, dir) => graft.operators.Skew.sessionizeBucketed(
          Tables.events(s, dir), "user_id", "ts", "event_id",
          gapMinutes = 30, bucketMinutes = 120)
        .orderBy(col("user_id"), col("session_idx")),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
             |                       THEN 1 ELSE 0 END)
             |              OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |       max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
             |FROM s
             |GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin),
      doc = "whale-safe two-phase sessionization: (user, time-bucket) windows + tiny per-user bucket merge, sessions identical"),

    Q("customer_balance_by_nation",
      (s, dir) => Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"),
          round(min(col("c_acctbal")), 2).as("min_bal"),
          round(max(col("c_acctbal")), 2).as("max_bal"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, count(*) AS n_customers,
             |       round(sum(c_acctbal), 2) AS sum_bal,
             |       round(min(c_acctbal), 2) AS min_bal,
             |       round(max(c_acctbal), 2) AS max_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      doc = "broadcast dim join + multi-aggregate over signed values"),

    Q("events_props_map",
      (s, dir) => {
        // single-path extraction: get_json_object streams the one key
        // instead of materializing a full map per row (from_json is
        // ~3x slower cold for this shape); the map-typed parse (C11)
        // is exercised by TagDimension's memo read
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            round(avg(col("k")), 6).as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |            AS BIGINT) AS sum_k,
             |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             |         AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "C11/open-column: schema-on-read JSON props -> map, aggregate"),

    Q("skew_salted_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_suppkey"), col("l_quantity"))
        val sup = Tables.supplier(s, dir)
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        graft.operators.Skew.saltedJoin(li, sup, "l_suppkey", n = 8)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("s_name"))
      },
      Some("""SELECT s_name, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_name ORDER BY s_name""".stripMargin),
      doc = "salted hot-key join: replicated build side, results equal the plain join"),

    Q("events_session_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |                OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |                          ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id,
             |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       count(*) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      doc = "native session_window gap sessions (same semantics as the lag formulation)"),

    Q("events_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("t", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("t"))
        // one build row per (key, time) keeps the as-of pick deterministic
        val build = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("t").as("pt"))
          .agg(round(max(col("value")), 2).as("purchase_value"))
        graft.operators.AsofJoin.asof(
            probe, build, key = "user_id", probeTime = "t", buildTime = "pt",
            payload = Seq("purchase_value"), buildTimeAs = Some("purchase_t"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS t
             |  FROM events WHERE event_type = 'click'),
             |b AS (
             |  SELECT user_id, epoch_us(ts) AS pt,
             |         round(max(value), 2) AS purchase_value
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.t, b.purchase_value,
             |       b.pt AS purchase_t
             |FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.t >= b.pt
             |ORDER BY p.event_id""".stripMargin),
      doc = "as-of (point-in-time) join: latest preceding purchase per click, " +
        "single-shuffle union+carry-forward form (AsofJoin)"),

    // The skew-safe variant against the SAME DuckDB ASOF JOIN oracle:
    // bucketing the carry-forward by time (1h buckets over the ~week of
    // events) must not change a single row.
    Q("events_asof_join_salted",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("t", unix_micros(col("ts")))
        val probe = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("t"))
        val build = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("t").as("pt"))
          .agg(round(max(col("value")), 2).as("purchase_value"))
        graft.operators.AsofJoin.asofSalted(
            probe, build, key = "user_id", probeTime = "t", buildTime = "pt",
            payload = Seq("purchase_value"), bucketWidth = 3600L * 1000 * 1000,
            buildTimeAs = Some("purchase_t"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS t
             |  FROM events WHERE event_type = 'click'),
             |b AS (
             |  SELECT user_id, epoch_us(ts) AS pt,
             |         round(max(value), 2) AS purchase_value
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.t, b.purchase_value,
             |       b.pt AS purchase_t
             |FROM p ASOF JOIN b ON p.user_id = b.user_id AND p.t >= b.pt
             |ORDER BY p.event_id""".stripMargin),
      doc = "skew-safe as-of join: (key, time-bucket) carry-forward + bucket-level " +
        "boundary fix-up == plain as-of (AsofJoin.asofSalted)"),

    // Attribution windows: every signup opens a 24h interval; count the
    // same user's purchases inside it. Windows of one user overlap when
    // signups are < 24h apart, so pair-uniqueness of the binned join is
    // exercised, not just containment.
    Q("events_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))
        val dayUs = 24L * 3600 * 1000000
        val windows = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id").as("signup_id"),
            col("t").as("lo"), (col("t") + dayUs).as("hi"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("t"))
        graft.operators.RangeJoin.pointInInterval(purchases, windows,
            key = "user_id", t = "t", lo = "lo", hi = "hi", binWidth = dayUs)
          .groupBy(col("user_id"), col("signup_id"))
          .agg(min(col("lo")).as("window_start"), count(lit(1)).as("n_purchases"))
          .orderBy(col("signup_id"))
      },
      Some("""WITH s AS (
             |  SELECT user_id, event_id AS signup_id, epoch_us(ts) AS lo,
             |         epoch_us(ts) + 86400000000 AS hi
             |  FROM events WHERE event_type = 'signup'),
             |p AS (SELECT user_id, epoch_us(ts) AS t
             |      FROM events WHERE event_type = 'purchase')
             |SELECT p.user_id, s.signup_id, s.lo AS window_start,
             |       count(*) AS n_purchases
             |FROM p JOIN s ON p.user_id = s.user_id
             |              AND p.t BETWEEN s.lo AND s.hi
             |GROUP BY p.user_id, s.signup_id, s.lo
             |ORDER BY s.signup_id""".stripMargin),
      doc = "range (interval-containment) join: purchases inside 24h signup " +
        "attribution windows, binned equi-join form (RangeJoin), not a nested loop"),

    // The anti-join operator class: parts with no shipment since a
    // cutoff. The probe side stays the full dimension; the build side is
    // date-filtered BEFORE the join (the filter reaches the parquet
    // scan), so the anti semi-structure shuffles only surviving keys.
    Q("parts_dormant",
      (s, dir) => {
        val cutoff = to_timestamp(lit("2001-06-01 00:00:00"))
        val recent = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= cutoff)
          .select(col("l_partkey"))
        Tables.part(s, dir)
          .join(recent, col("p_partkey") === col("l_partkey"), "left_anti")
          .select(col("p_partkey"), col("p_brand"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_brand
             |FROM part
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_partkey = p_partkey
             |    AND l_shipdate >= TIMESTAMP '2001-06-01 00:00:00')
             |ORDER BY p_partkey""".stripMargin),
      doc = "left-anti join: parts with no shipment since cutoff (filter pushed below the anti join)"),

    // ROLLUP: the multi-level aggregate class. Spark emits NULL for
    // rolled-up levels; both engines coalesce to a label so the NULL
    // sort-order difference between engines never matters. Grouping
    // columns are non-null enum chars, so the label can't collide.
    Q("q1_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("revenue"), col("n"))
        .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |       COALESCE(l_linestatus, 'ALL') AS linestatus,
             |       round(sum(l_extendedprice), 2) AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin),
      doc = "ROLLUP multi-level aggregate: per (flag, status), per flag, grand total in one pass"),

    // PIVOT with an explicit value list (the only scale-sane form —
    // inferring pivot values is a driver-side distinct). The oracle is
    // the equivalent conditional aggregate.
    // RANGE-frame rolling window — the feature-store "activity in the
    // hour before each event" signal. A RANGE frame is tie-inclusive,
    // so the in-frame row SET is deterministic even when a user has
    // equal timestamps; round(,2) absorbs the (set-identical)
    // accumulation-order float noise.
    Q("events_rolling_1h",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000 * 1000, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum(col("value")).over(w), 2).as("sum_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |       count(*) OVER w AS n_1h,
             |       round(sum(value) OVER w, 2) AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      doc = "RANGE-frame rolling 1-hour window per user (point-in-time activity features)"),

    // Whale-user-safe twin of events_rolling_1h: own+context bucket
    // slices (Skew.rollingBucketed) so the trailing-1h frame computes
    // within (user, hour-bucket) — frame SETS identical to the plain
    // window, so the rounded sums match the same oracle.
    Q("events_rolling_1h_bucketed",
      (s, dir) => graft.operators.Skew.rollingBucketed(
          Tables.events(s, dir), "user_id", "ts", "event_id", "value",
          rangeUs = 3600L * 1000 * 1000)
        .select(col("event_id"), col("user_id"), col("n").as("n_1h"),
          round(col("s"), 2).as("sum_1h"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id,
             |       count(*) OVER w AS n_1h,
             |       round(sum(value) OVER w, 2) AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      doc = "whale-safe rolling 1-hour window: own+context time-bucket slices, no per-user window partition"),

    // TPC-H Q18 shape: HAVING over a grouped join chain — the
    // large-order customers.
    Q("q18_large_orders",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
          .filter(col("total_qty") > 250)
        Tables.orders(s, dir)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, total_qty
             |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING round(sum(l_quantity), 2) > 250) big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY total_qty DESC, o_orderkey""".stripMargin),
      doc = "TPC-H Q18 shape: HAVING over grouped join chain (large-order customers)"),

    // Correlated scalar subquery — exercises Catalyst's decorrelation
    // (DecorrelateInnerQuery rewrites the per-row subquery into an
    // aggregate + join; no per-row re-execution).
    Q("orders_above_cust_avg",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
                |FROM orders_v o
                |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice)
                |                            FROM orders_v i
                |                            WHERE i.o_custkey = o.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
             |FROM orders o
             |WHERE o_totalprice > 1.5 * (SELECT avg(i.o_totalprice)
             |                            FROM orders i
             |                            WHERE i.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin),
      doc = "correlated scalar subquery (decorrelated to aggregate+join by Catalyst)"),

    // min_by/max_by: the argmax aggregate family (one pass, no window).
    // Scalar ordering key is deterministic here: verified 0 per-nation
    // acctbal ties at every testdata SF (DuckDB's max_by takes no
    // composite key, so a tie would make both engines order-dependent).
    Q("supplier_top_by_nation",
      (s, dir) => Tables.supplier(s, dir)
        .groupBy(col("s_nationkey"))
        .agg(max_by(col("s_name"), col("s_acctbal")).as("top_supplier"),
          round(max(col("s_acctbal")), 2).as("top_acctbal"))
        .orderBy(col("s_nationkey")),
      Some("""SELECT s_nationkey,
             |       max_by(s_name, s_acctbal) AS top_supplier,
             |       round(max(s_acctbal), 2) AS top_acctbal
             |FROM supplier
             |GROUP BY s_nationkey
             |ORDER BY s_nationkey""".stripMargin),
      doc = "argmax aggregate (max_by), one pass, no window"),

    // TPC-H Q4 shape: EXISTS decorrelates to a left-semi join with a
    // non-equi conjunct; Catalyst plans the semi probe, never a
    // row-multiplying inner join.
    Q("q4_late_shipments",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir)
        o.join(l, o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      doc = "TPC-H Q4 shape: EXISTS -> left-semi with non-equi conjunct, grouped"),

    // GROUPING SETS beyond ROLLUP: an explicit lattice of (flag,
    // status), (flag), and grand total.
    Q("q1_grouping_sets",
      (s, dir) => Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |       coalesce(l_linestatus, 'ALL') AS ls,
             |       count(*) AS n,
             |       round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), ())
             |ORDER BY rf, ls""".stripMargin),
      doc = "GROUPING SETS lattice: (flag,status) + (flag) + grand total"),

    // Rank-family windows beyond row_number/ntile: percent_rank and
    // cume_dist are ratios of integers — bit-identical IEEE division
    // in both engines.
    Q("doc_length_percentiles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang,
             |       round(percent_rank() OVER w, 6) AS pr,
             |       round(cume_dist() OVER w, 6) AS cd
             |FROM documents
             |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
             |ORDER BY doc_id""".stripMargin),
      doc = "percent_rank + cume_dist per language over document length"),

    Q("events_pivot_by_type",
      (s, dir) => Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |       count(*) FILTER (event_type = 'click') AS click,
             |       count(*) FILTER (event_type = 'view') AS view,
             |       count(*) FILTER (event_type = 'purchase') AS purchase
             |FROM events WHERE user_id < 20
             |GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "PIVOT with explicit value list -> per-user event-type count columns"),

    // Z-order layout probe: Morton-interleave (user_id, epoch-hour)
    // into one clustering key, cut the sorted order into 32 "files",
    // and report each file's min/max envelope in BOTH dimensions. The
    // envelopes being narrow on ux AND uh at once is the property a
    // lexicographic (user-then-time) sort cannot give time-only
    // predicates — ZOrderSpec quantifies the pruning gap. ntile over a
    // total order keeps the stats oracle-deterministic; the WRITE path
    // (Layout.zorderClustered) uses repartitionByRange, never a global
    // window.
    Q("events_zorder_layout",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("ux", col("user_id").cast("long").bitwiseAND(lit(1023L)))
          .withColumn("uh", expr("unix_micros(ts) div 3600000000")
            .bitwiseAND(lit(1023L)))
          .withColumn("zkey",
            graft.functions.ZOrder.key(10, col("ux"), col("uh")))
        graft.operators.Layout.bucketEnvelopes(e,
          col("zkey"), col("event_id"), 32,
          ("ux", col("ux")), ("uh", col("uh")), ("zkey", col("zkey")))
      },
      Some(s"""WITH b AS (SELECT event_id,
             |             (CAST(user_id AS BIGINT) & 1023) AS ux,
             |             ((epoch_us(ts) // 3600000000) & 1023) AS uh
             |           FROM events),
             |z AS (SELECT event_id, ux, uh,
             |        ${graft.functions.ZOrder.sqlTerms(10, Seq("ux", "uh"))} AS zkey
             |      FROM b),
             |t AS (SELECT *, ntile(32) OVER (ORDER BY zkey, event_id) AS bucket
             |      FROM z)
             |SELECT bucket, min(ux) AS min_ux, max(ux) AS max_ux,
             |       min(uh) AS min_uh, max(uh) AS max_uh,
             |       min(zkey) AS min_zkey, max(zkey) AS max_zkey,
             |       count(*) AS n
             |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin),
      doc = "Z-order (Morton) clustering: per-file min/max envelopes tight in both dims at once")
  )
}

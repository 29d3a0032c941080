package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.{approx_count_distinct, col, count,
  date_format, date_trunc, expr, lit, to_timestamp}
import graft.operators.{Events, Multimodal}

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gap > 30 min, counts per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, "view", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 100L, "click", 2.0),
      (3L, ts("2024-01-01 11:00:00"), 100L, "view", 3.0),  // 50min gap → new session
      (4L, ts("2024-01-01 10:05:00"), 200L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = Events.sessionStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats == Map(100L -> (2L, 3L), 200L -> (1L, 1L)))
  }

  test("sessionize boundary matches native session_window: exactly 30 min merges") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0), // session 1
      (2L, ts("2024-01-01 10:30:00"), 1L, "a", 0.0), // exactly gap → merges
      (3L, ts("2024-01-01 11:00:01"), 1L, "a", 0.0)) // > gap → new session
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.sessionStats(ev).head().getLong(1) == 2L)
    // the native operator agrees on this exact boundary input
    assert(Events.sessionWindows(ev).count() == 2L)
  }

  test("hourly aggregation buckets by window start") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:55:00"), 1L, "view", 2.0),
      (3L, ts("2024-01-01 11:05:00"), 1L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = Events.hourlyAgg(ev).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(agg.toSeq == Seq(("2024-01-01 10:00", 2L, 3.0), ("2024-01-01 11:00", 1L, 4.0)))
  }

  test("streaming hourly counts equal the batch result") {
    val batch = Events.hourlyAgg(Tables.t(spark, sfDir, "events"))
      .select("hour", "event_type", "n").collect().toSeq
    val stream = graft.streaming.EventStream
      .hourlyCounts(spark, s"$sfDir/events.parquet").collect().toSeq
    assert(stream == batch)
  }

  test("streaming drift monitor drains to the batch PSI result") {
    val stream = graft.streaming.EventStream
      .driftMonitor(spark, s"$sfDir/events.parquet").collect().toSeq
    val batch = graft.operators.DataQuality
      .valueDrift(Tables.t(spark, sfDir, "events")).collect().toSeq
    assert(stream == batch)
  }

  test("bounded-state replay faces: dedup exactly unique, left join equals batch") {
    // the r13 scale-probe faces, pinned at sf0.001 with 5 time buckets:
    // multi-batch watermark advancement must not change the ANSWERS —
    // dedup drains exactly unique, the interval join equals its batch twin
    val d = graft.streaming.EventStream
      .dedupWithinWatermarkReplay(spark, s"$sfDir/events.parquet", nFiles = 5).head()
    assert(d.getLong(0) == d.getLong(2) && d.getLong(3) == 1L,
      s"dedup replay: $d")
    val j = graft.streaming.EventStream
      .purchaseClickLeftJoinReplay(spark, s"$sfDir/events.parquet", nFiles = 5).head()
    assert(j.getLong(4) == 1L, s"left-join replay vs batch: $j")
    // expiring sessionization: event-time-timeout closures summed per
    // user must equal the batch sessionize exactly
    val se = graft.streaming.EventStream
      .sessionStatsExpiring(spark, s"$sfDir/events.parquet", nFiles = 5).head()
    assert(se.getLong(3) == 1L, s"expiring sessionize vs batch: $se")
  }

  test("staged-replay validation: corrupt/truncated buckets and out-of-order mtimes are diagnosable errors") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.EventStream
    // build a tiny well-formed two-bucket dir (valid parquet, mtimes in
    // name order) — the shape stageTimeBuckets produces
    val dir = graft.sources.Export.tempDir("graft_staged_val_").toString
    def writeBucket(name: String, mtime: Long): Unit = {
      val tmp = s"$dir/_stage_$name"
      Seq((1L, "a")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val dst = Paths.get(dir, s"$name.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    val now = System.currentTimeMillis()
    writeBucket("0000_bucket", now - 120000L)
    writeBucket("0001_bucket", now - 60000L)
    EventStream.validateStagedDir(dir) // well-formed passes
    // a TRUNCATED bucket (zero bytes — a killed copy) names itself
    val trunc = Paths.get(dir, "0002_bucket.parquet")
    Files.write(trunc, Array.empty[Byte])
    trunc.toFile.setLastModified(now)
    val e1 = intercept[IllegalArgumentException](EventStream.validateStagedDir(dir))
    assert(e1.getMessage.contains("not readable parquet") &&
      e1.getMessage.contains("0002_bucket"), e1.getMessage)
    // a CORRUPT bucket (garbage bytes) likewise
    Files.write(trunc, "not a parquet file".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](EventStream.validateStagedDir(dir))
    assert(e2.getMessage.contains("not readable parquet"), e2.getMessage)
    Files.delete(trunc)
    // an out-of-order mtime (later-named bucket with an OLDER mtime —
    // the file source would replay it first, watermark jumps ahead,
    // the late bucket's events silently drop) is refused, named
    Paths.get(dir, "0001_bucket.parquet").toFile.setLastModified(now - 300000L)
    val e3 = intercept[IllegalArgumentException](EventStream.validateStagedDir(dir))
    assert(e3.getMessage.contains("out of mtime order") &&
      e3.getMessage.contains("0001_bucket"), e3.getMessage)
    // and an empty staged dir cannot silently stream zero rows
    val empty = graft.sources.Export.tempDir("graft_staged_empty_").toString
    val e4 = intercept[IllegalArgumentException](EventStream.validateStagedDir(empty))
    assert(e4.getMessage.contains("no bucket files"), e4.getMessage)
  }

  test("streaming sessionization (flatMapGroupsWithState) matches batch") {
    val batch = Events.sessionStats(Tables.t(spark, sfDir, "events"))
      .select("user_id", "n_sessions", "n_events").collect().toSeq
    val stream = graft.streaming.EventStream
      .sessionStats(spark, s"$sfDir/events.parquet").collect().toSeq
    assert(stream == batch)
  }

  test("session_window operator agrees with the lag-based derivation") {
    val ev = Tables.t(spark, sfDir, "events")
    val viaWindow = Events.sessionWindows(ev)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLag = Events.sessionStats(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaWindow == viaLag)
  }

  test("stream-static broadcast join matches the batch join") {
    val users = (0L until 200L).map(u => (u, if (u % 2 == 0) "A" else "B"))
      .toDF("user_id", "cohort")
    val batch = Tables.t(spark, sfDir, "events").join(users, "user_id")
      .groupBy("cohort").count().orderBy("cohort").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val stream = graft.streaming.EventStream
      .enrichedCounts(spark, s"$sfDir/events.parquet", users, "user_id", "cohort")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(stream == batch)
  }

  test("watermarked streaming plan runs append-mode end to end") {
    val agg = graft.streaming.EventStream
      .hourlyCountsStreaming(spark, s"$sfDir/events.parquet")
    val name = s"wm_sink_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append emits only windows older than the 2h watermark: all but the
    // tail of the month of data
    assert(spark.table(name).count() > 0)
  }

  test("streaming dedup matches batch distinct fingerprint counts") {
    val batch = graft.operators.Dedup.exactGroups(Tables.t(spark, sfDir, "documents")).count()
    val stream = graft.streaming.EventStream
      .dedupedLangCounts(spark, s"$sfDir/documents.parquet")
      .agg(org.apache.spark.sql.functions.sum("n_unique")).head().getLong(0)
    assert(stream == batch)
  }

  test("funnel counts users per stage in strict temporal order") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 0.0),
      // user 2: click BEFORE signup → stalls at stage 1
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0),
      // user 3: purchase before click → reaches stage 2 only
      (6L, ts("2024-01-01 10:00:00"), 3L, "signup", 0.0),
      (7L, ts("2024-01-01 10:30:00"), 3L, "purchase", 0.0),
      (8L, ts("2024-01-01 11:00:00"), 3L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val f = Events.funnel(ev).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("1_signup" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("rolling range frame spans exactly the trailing window") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-04 00:00:00"), 1L, "view", 2.0),
      (3L, ts("2024-01-11 00:00:00"), 1L, "view", 4.0)) // day 1 aged out; day 4 exactly -7d → in
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.rollingUserValue(ev, days = 7).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0))
  }

  test("stream-stream interval join matches the batch join twin") {
    val ev = Tables.t(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = graft.streaming.EventStream
      .purchaseClickJoin(spark, s"$sfDir/events.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stream == batch && batch.nonEmpty)
  }

  test("streaming LEFT-OUTER interval join drains to the batch left join") {
    val ev = Tables.t(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("c_ts") <= col("p_ts"), "left_outer")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val stream = graft.streaming.EventStream
      .purchaseClickLeftJoin(spark, s"$sfDir/events.parquet")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(stream == batch)
    // the left-outer mode actually exercises null emission on expiry
    assert(stream.exists(_._2 == -1L), "expected unmatched purchases")
    assert(stream.exists(_._2 >= 0L), "expected matched pairs")
  }

  test("asof join matches latest prior right row, ties and no-match included") {
    val purchases = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),  // before any click → null
      (2L, ts("2024-01-01 10:30:00"), 1L, 20.0),  // after clicks A,B → B
      (3L, ts("2024-01-01 10:20:00"), 2L, 30.0))  // tie: click at same instant matches
      .toDF("event_id", "ts", "user_id", "value")
    val clicks = Seq(
      (101L, ts("2024-01-01 10:05:00"), 1L, 1.0), // A
      (102L, ts("2024-01-01 10:10:00"), 1L, 2.0), // B (latest ≤ 10:30)
      (103L, ts("2024-01-01 10:20:00"), 2L, 3.0), // equal-ts tie for purchase 3
      (104L, ts("2024-01-01 10:21:00"), 2L, 4.0)) // after purchase 3 → excluded
      .toDF("event_id", "ts", "user_id", "value")
    val out = Events.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("event_id", "value"), "click_")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.get(5)))).toMap
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some(102L), Some(2.0)))
    assert(out(3L) == (Some(103L), Some(3.0)))
  }

  test("range join pairs points with every containing range, boundaries inclusive") {
    val ranges = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (11L, 1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")), // overlaps 10
      (12L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))) // other key
      .toDF("range_id", "user_id", "w_start", "w_end")
    val points = Seq(
      (1L, 1L, ts("2024-01-01 10:45:00"), 1.0),  // in 10 AND 11 (range overlap)
      (2L, 1L, ts("2024-01-01 11:00:00"), 2.0),  // end boundary of 10, in 11
      (3L, 1L, ts("2024-01-01 12:00:01"), 3.0),  // past everything
      (4L, 2L, ts("2024-01-01 10:45:00"), 4.0))  // key isolation: only 12
      .toDF("event_id", "user_id", "ts", "value")
    // small bin (10 min) forces multi-bin ranges; each pair still appears once
    val got = Events.rangeJoin(points, ranges, "user_id", "ts", "w_start", "w_end",
        binSeconds = 600L)
      .select("event_id", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (4L, 12L)))
  }

  test("transitionMatrix counts per-user consecutive pairs with probabilities") {
    val ev = Seq(
      // user 100: view→click→view→purchase ⇒ v→c, c→v, v→p
      (1L, ts("2024-01-01 10:00:00"), 100L, "view", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 100L, "click", 0.0),
      (3L, ts("2024-01-01 10:02:00"), 100L, "view", 0.0),
      (4L, ts("2024-01-01 10:03:00"), 100L, "purchase", 0.0),
      // user 200: view→view ⇒ v→v; no cross-user pair with user 100
      (5L, ts("2024-01-01 09:00:00"), 200L, "view", 0.0),
      (6L, ts("2024-01-01 09:30:00"), 200L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // from=view: v→c 1, v→p 1, v→v 1 (n_from 3, p = 0.3333 each)
    assert(out(("view", "click")) == ((1L, 3L, 0.3333)))
    assert(out(("view", "purchase")) == ((1L, 3L, 0.3333)))
    assert(out(("view", "view")) == ((1L, 3L, 0.3333)))
    assert(out(("click", "view")) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
  }

  test("valueAnomalies flags the planted spike only, per-user normalized") {
    // user 100: twenty 10.0s + one 1000.0 spike; user 200: twenty VOLATILE
    // values where 1000.0 is normal — same magnitude, no flag (self-
    // normalization); user 300: too few events to profile
    val base = (1 to 20).map(i =>
      (i.toLong, ts("2024-01-01 10:00:00"), 100L, "view", if (i == 1) 10.5 else 10.0))
    val spike = Seq((21L, ts("2024-01-01 11:00:00"), 100L, "view", 1000.0))
    val volatile = (1 to 20).map(i =>
      (100L + i, ts("2024-01-01 10:00:00"), 200L, "view", i * 100.0))
    val tiny = Seq((900L, ts("2024-01-01 10:00:00"), 300L, "view", 99999.0))
    val ev = (base ++ spike ++ volatile ++ tiny)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.valueAnomalies(ev, sigma = 3.0, minEvents = 20).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(21L))
    assert(out.head.getLong(1) == 100L && out.head.getDouble(2) == 1000.0)
  }

  test("valueTrend: recovers an exact linear relationship") {
    // x lands on whole days from the 2025-01-01 anchor, y = 2x + 5
    // exactly → slope 2, intercept 5, pearson 1; constant series → r NaN
    // excluded by construction (only one type here)
    val ev = (0 to 9).map { i =>
      (i.toLong, Timestamp.valueOf(s"2025-01-${"%02d".format(i + 1)} 00:00:00"),
        1L, "view", 2.0 * i + 5.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.valueTrend(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "view" && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 2.0)   // slope
    assert(r.getDouble(3) == 5.0)   // intercept
    assert(r.getDouble(4) == 1.0)   // perfectly correlated
  }

  test("winsorizedStats: clamping tames a planted outlier, raw mean keeps it") {
    // 19 values of 10 plus one 1000: p95 (linear interp over sorted
    // values) = 10 + 0.05*990... clamp pulls the spike to the band edge
    val ev = (1 to 19).map(i =>
      (i.toLong, Timestamp.valueOf("2025-01-01 00:00:00"), i.toLong, "m", 10.0)) :+
      ((20L, Timestamp.valueOf("2025-01-01 00:00:00"), 20L, "m", 1000.0))
    val out = Events.winsorizedStats(ev.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 20L)
    assert(r.getDouble(2) == 59.5)            // raw mean owns the spike
    assert(r.getDouble(3) < r.getDouble(2))   // winsorized mean tamed it
    assert(r.getDouble(4) == 10.0)            // lo bound
    assert(r.getDouble(5) < 1000.0)           // hi bound below the spike
    // winsorized mean = (19*10 + p95)/20 exactly
    assert(math.abs(r.getDouble(3) - (190.0 + r.getDouble(5)) / 20.0) < 1e-3)
  }

  test("abTest: planted variant shift is significant with the analytic means") {
    // mirror the operator's md5 assignment independently to know each
    // user's variant, then plant a large A-vs-B gap with per-user jitter
    // (zero within-variant variance would make t infinite)
    def variantOf(uid: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
      if (Character.forDigit((d(0) >> 4) & 0xf, 16) < '8') "A" else "B"
    }
    val uids = (1L to 40L).toSeq
    val ev = uids.map { u =>
      val base = if (variantOf(u) == "A") 100.0 else 1.0
      (u, Timestamp.valueOf("2025-01-01 00:00:00"), u, "m", base + (u % 3))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.abTest(ev).collect()
    assert(out.length == 1)
    val r = out.head
    val (na, nb) = (r.getLong(1), r.getLong(2))
    assert(na + nb == 40L && na > 0 && nb > 0)
    val meanOf = (v: String) => {
      val xs = uids.filter(variantOf(_) == v).map(u => (if (v == "A") 100.0 else 1.0) + (u % 3))
      xs.sum / xs.size
    }
    assert(math.abs(r.getDouble(3) - meanOf("A")) < 1e-3)
    assert(math.abs(r.getDouble(4) - meanOf("B")) < 1e-3)
    assert(r.getDouble(5) > 10.0)  // t hugely positive: A is the high arm
    assert(r.getBoolean(7))        // significant
  }

  test("multimodal decode classifies non-image payloads as unknown, not an error") {
    val docs = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    val a = Multimodal.decodeMeta(Multimodal.withPayload(docs)).collect().sortBy(_.doc_id)
    assert(a.forall(m => m.n_bytes == 5 && m.width == 0 && m.height == 0 && m.format == "unknown"))
  }

  test("watermarked streaming dedup of a doubled feed equals batch distinct counts") {
    val stream = graft.streaming.EventStream
      .dedupWithinWatermark(spark, s"$sfDir/events.parquet").collect().toSeq
    val batch = Tables.t(spark, sfDir, "events")
      .groupBy("event_type").agg(expr("count(DISTINCT event_id)").as("n"))
      .orderBy("event_type").collect().toSeq
    assert(stream == batch)
  }

  test("streaming daily top-k drains to the batch ranking") {
    import org.apache.spark.sql.functions.{count, date_format, row_number, to_date}
    import org.apache.spark.sql.expressions.Window
    val stream = graft.streaming.EventStream
      .windowTopK(spark, s"$sfDir/events.parquet").collect().toSeq
    val batch = Tables.t(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(expr("1")).as("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("d").orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= 3)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("rnk").cast("long").as("rnk"))
      .orderBy("day", "rnk").collect().toSeq
    assert(stream == batch)
  }

  test("dau/mau: trailing-window contributions age out; stickiness is dau/mau") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 0.0),
      (2L, 2L, "2024-01-01 11:00:00", 0.0),
      (3L, 2L, "2024-01-05 09:00:00", 0.0),
      (4L, 1L, "2024-01-30 09:00:00", 0.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.dauMau(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 1.0)))
    // day 5 audience: both users seen within 28 days, only one active today
    assert(out("2024-01-05") == ((1L, 2L, 0.5)))
    // day 30: day-1 activity aged out, day-5 activity still inside
    assert(out("2024-01-30") == ((1L, 2L, 0.5)))
    assert(out.size == 3) // only days with actual activity are reported
  }

  test("pareto concentration: tier cut-offs, cumulative shares, count-desc ranking") {
    // user 1: 10 events; users 2-5: 2 each; users 6-10: 1 each (23 total)
    val users = Seq.fill(10)(1L) ++ (2 to 5).flatMap(u => Seq(u.toLong, u.toLong)) ++
      (6 to 10).map(_.toLong)
    val ev = users.zipWithIndex
      .map { case (u, i) => (i.toLong, u, s"2024-01-01 10:${"%02d".format(i)}:00") }
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.concentration(ev, Seq(10, 50)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((1L, 10L, 0.4348))) // top user alone: 10/23
    assert(out(50L) == ((5L, 18L, 0.7826))) // top half: 10 + 4×2 = 18/23
  }

  test("inter-arrival: per-type gap percentiles interpolate; first events excluded") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:00:10", "B"),
      (3L, 1L, "2024-01-01 10:00:30", "B"),
      (4L, 2L, "2024-01-01 11:00:00", "A"),
      (5L, 2L, "2024-01-01 11:00:05", "A"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.interArrival(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("A") == ((1L, 5.0, 5.0, 5.0)))
    // gaps 10s and 20s: p50 midpoint 15, p90 interpolates to 19
    assert(out("B") == ((2L, 15.0, 19.0, 15.0)))
  }

  test("peak concurrency: overlaps counted, disjoint sessions don't stack, ties peer-group") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:08:00"), // u1 [10:00,10:08]
      (3L, 2L, "2024-01-01 10:05:00"), // u2 point session inside u1 → overlap 2
      (4L, 3L, "2024-01-01 10:20:00"), // u3 after u1 ended → no stack
      // day 2: three point sessions at the same µs → tied deltas, peak 3
      (5L, 1L, "2024-01-02 09:00:00"), (6L, 2L, "2024-01-02 09:00:00"),
      (7L, 3L, "2024-01-02 09:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(0.0))
    val out = Events.peakConcurrency(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("2024-01-01") == ((2L, 6L)))
    assert(out("2024-01-02") == ((3L, 6L)))
  }

  test("gap fill: dense daily grid, zero-filled counts, forward-filled values") {
    val ev = Seq(
      (1L, 10L, "2024-01-01 10:00:00", 5.0),
      (2L, 10L, "2024-01-04 09:00:00", 7.5),
      (3L, 20L, "2024-01-02 00:00:00", 1.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.gapFillDaily(ev).collect()
    // user 10: a 4-day span with two silent days carrying the last value
    val u10 = out.filter(_.getLong(0) == 10L)
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(u10 == Seq(
      ("2024-01-01", 1L, 5.0), ("2024-01-02", 0L, 5.0),
      ("2024-01-03", 0L, 5.0), ("2024-01-04", 1L, 7.5)))
    // user 20: single-day span → single grid row, no padding beyond it
    val u20 = out.filter(_.getLong(0) == 20L)
    assert(u20.length == 1 && u20.head.getLong(2) == 1L && u20.head.getDouble(3) == 1.0)
  }

  test("growth accounting: new/retained/resurrected classify, churn lands on day+1") {
    // u1: d1,d2,d4 — new d1, retained d2, churned→d3, resurrected d4
    // u2: d2 only — new d2, churned→d3
    // u3: d1,d4 — new d1, churned→d2, resurrected d4
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-02 10:00:00"),
      (3L, 1L, "2024-01-04 10:00:00"), (4L, 2L, "2024-01-02 11:00:00"),
      (5L, 3L, "2024-01-01 12:00:00"), (6L, 3L, "2024-01-04 12:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.growthAccounting(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("2024-01-01") == ((2L, 0L, 0L, 0L)))
    assert(out("2024-01-02") == ((1L, 1L, 0L, 1L)))
    // a zero-activity day still carries its churn row
    assert(out("2024-01-03") == ((0L, 0L, 0L, 2L)))
    // the last observed day can't churn anyone past the horizon
    assert(out("2024-01-04") == ((0L, 0L, 2L, 0L)))
    assert(out.size == 4)
  }

  test("forecastSnaive: week-back predictor scores only where defined, exact per-dow errors") {
    // days 2024-01-01..01-10 with k events on day k → only days 8,9,10
    // have a −7 observation: |8−1|=|9−2|=|10−3|=7. Jan 8 is a Monday →
    // dow 1,2,3; wape = 7/8, 7/9, 7/10
    val rows = for { d <- 1 to 10; k <- 1 to d }
      yield (f"2024-01-$d%02d 12:00:00", k)
    val ev = rows.toDF("ts_s", "k")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s", "k")
    val out = Events.forecastSnaive(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 7.0, 0.875), (2L, 1L, 7.0, 0.7778), (3L, 1L, 7.0, 0.7)))
  }

  test("valueQuantilesKll: exact percentiles out, sketch answers pass their rank-error verdicts") {
    val ev = Tables.t(spark, sfDir, "events")
    val got = Events.valueQuantilesKll(ev).collect()
    assert(got.nonEmpty)
    import org.apache.spark.sql.functions._
    val exact = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    got.foreach { r =>
      val t = r.getString(0)
      assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) == exact(t), s"$t exact leg")
      // the verdicts encode the KLL rank contract (3% margin over the
      // ~1.65% k=200 bound); any sketch answer past it flips one to 0
      assert(r.getLong(5) == 1L && r.getLong(6) == 1L && r.getLong(7) == 1L, s"$t verdicts")
    }
  }

  test("streaming KLL quantiles: gate face equals the batch twin, verdicts pass") {
    // the STREAMED sketch differs from the batch one (insertion-order-
    // dependent compaction) but both answer inside the same rank
    // contract, so the exact+verdict gate faces must be identical rows
    val stream = graft.streaming.EventStream
      .quantilesStream(spark, s"$sfDir/events.parquet").collect().map(_.toSeq)
    val batch = Events.valueQuantilesKll(Tables.t(spark, sfDir, "events"))
      .collect().map(_.toSeq)
    assert(stream.nonEmpty)
    assert(stream.toSeq == batch.toSeq)
    assert(stream.forall(r => r(5) == 1L && r(6) == 1L && r(7) == 1L))
  }

  test("streaming CMS estimates equal the batch sketch exactly (order-invariant state)") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.EventStream
      .cmsStream(spark, s"$sfDir/events.parquet").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // batch twin: same grid algebra over the same keys, same probes
    val keys = Tables.t(spark, sfDir, "events")
      .select(col("user_id").cast("string").as("term"))
    val grid = graft.operators.CountMin.sketch(keys, "term")
    import spark.implicits._
    val probes = (0 until 10).map(i => (i * 10).toString).toDF("term")
    val batch = graft.operators.CountMin.estimate(grid, probes)
      .select(col("term").cast("long"), col("n_est")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch, s"stream $got != batch $batch")
    // and the estimates never undercount the exact per-user counts
    val exact = Tables.t(spark, sfDir, "events").groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // getOrElse: an absent probe user can still draw a collision-driven
    // positive estimate (true count 0) — the CMS one-sided guarantee
    got.foreach { case (u, e) =>
      assert(e >= exact.getOrElse(u, 0L), s"user $u undercounted")
    }
  }

  test("islands: overlapping intervals merge, a long interval swallows a later short one") {
    import org.apache.spark.sql.functions._
    // user 1 (value = duration minutes):
    //   id 1 @10:00 +60min  → [10:00, 11:00]
    //   id 2 @10:30 +5min   → [10:30, 10:35]  (swallowed by id 1)
    //   id 3 @10:50 +30min  → [10:50, 11:20]  (overlaps → extends island)
    //   id 4 @12:00 +10min  → new island (11:20 < 12:00)
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 60.0), (2L, 1L, "2024-01-01 10:30:00", 5.0),
      (3L, 1L, "2024-01-01 10:50:00", 30.0), (4L, 1L, "2024-01-01 12:00:00", 10.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.islands(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 2)
    val us = (s: String) => java.time.Instant.parse(s).toEpochMilli * 1000L
    assert(out(0) == ((1L, us("2024-01-01T10:00:00Z"), us("2024-01-01T11:20:00Z"), 3L)))
    assert(out(1) == ((2L, us("2024-01-01T12:00:00Z"), us("2024-01-01T12:10:00Z"), 1L)))
  }

  test("watermarkAudit: chunked prefix scan equals the sequential scan; hand case exact") {
    import org.apache.spark.sql.functions._
    // deterministic pseudo-disordered stream: arrival i carries event
    // time (7i mod 50) hours — plenty of inversions across chunk seams
    val rows = (0 until 50).map { i =>
      (i.toLong, "a", f"2024-04-${(7 * i) % 50 / 24 + 1}%02d ${(7 * i) % 50 % 24}%02d:00:00")
    }
    val ev = rows.toDF("event_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val chunked = Events.watermarkAudit(ev, chunkSize = 8L).collect().toSeq.map(_.toSeq)
    val single = Events.watermarkAudit(ev, chunkSize = 1000000L).collect().toSeq.map(_.toSeq)
    assert(chunked == single, "chunk seams must not change lateness")
    // hand case: arrivals with times 10:00, 13:00, 11:30 — the third
    // lags the 13:00 frontier by 1.5h → late at 1h, not at 6h
    val h = Seq((1L, "x", "2024-05-01 10:00:00"), (2L, "x", "2024-05-01 13:00:00"),
        (3L, "x", "2024-05-01 11:30:00"))
      .toDF("event_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Events.watermarkAudit(h, chunkSize = 2L).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (("x", 3L, 1L, 0L, 0L)))
  }

  test("shapleyAttribution: hand-computed coalition splits; non-converters excluded") {
    import org.apache.spark.sql.functions._
    // u1: a,b → buy ⇒ T={a,b}; u2: a → buy ⇒ {a}; u3: b,c → buy ⇒ {b,c}
    // u4: c, never buys; u5 buys with no prior exposure (no coalition)
    // φ(a)=½+1=1.5, φ(b)=½+½=1.0, φ(c)=½=0.5
    val rows = Seq(
      (1L, 1L, "a", "10:00"), (2L, 1L, "b", "10:05"), (3L, 1L, "purchase", "10:10"),
      (4L, 2L, "a", "10:00"), (5L, 2L, "purchase", "10:01"),
      (6L, 3L, "b", "09:00"), (7L, 3L, "c", "09:30"), (8L, 3L, "purchase", "09:45"),
      (9L, 4L, "c", "11:00"),
      (10L, 5L, "purchase", "08:00"))
    val ev = rows.map { case (e, u, t0, hm) => (e, u, t0, s"2024-01-01 $hm:00") }
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.shapleyAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("a" -> ((2L, 1.5)), "b" -> ((2L, 1.0)), "c" -> ((1L, 0.5))))
    // credit conservation: Σφ = conversions that had any exposure (3)
    assert(out.values.map(_._2).sum == 3.0)
  }

  test("snapshot sink is exactly-once: a replayed stream is fenced, the table never doubles") {
    import graft.sources.{Export, Snapshots}
    val root = Export.tempDir("sinkspec_").toString + "/t"
    val first = graft.streaming.EventStream
      .snapshotSink(spark, s"$sfDir/events.parquet", root).head()
    val vs = Snapshots.versions(root)
    assert(vs.nonEmpty && Snapshots.committedStreamBatches(root).nonEmpty)
    // a fresh query on the same source redelivers epoch 0 — the #txn
    // fence must skip every batch, leaving versions AND counts unchanged
    val replay = graft.streaming.EventStream
      .snapshotSink(spark, s"$sfDir/events.parquet", root).head()
    assert(replay == first, "replay must not change the table's aggregate")
    assert(Snapshots.versions(root) == vs, "fenced replay must commit no version")
  }

  test("audienceOverlap: theta intersections are exact at spec scale") {
    // A users 1..10, B users 6..15 (overlap 5, union 15, j=0.3333),
    // C user 100 only (disjoint from both)
    val rows = (1L to 10L).map(u => ("A", u)) ++ (6L to 15L).map(u => ("B", u)) ++
      Seq(("C", 100L)) ++ Seq(("A", 3L)) // a repeat must not inflate counts
    val ev = rows.toDF("event_type", "user_id")
    val out = Events.audienceOverlap(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(out == Seq(
      ("A", "B", 10L, 10L, 5L, 15L, 0.3333),
      ("A", "C", 10L, 1L, 0L, 11L, 0.0),
      ("B", "C", 10L, 1L, 0L, 11L, 0.0)))
  }

  test("funnelWindowed: stages only count inside the 48 h window from first signup") {
    // u1 converts fully in-window; u2's click lands at +49 h (out);
    // u3 clicks in-window but purchases at +50 h (out); u4 never signs up
    val rows = Seq(
      (1L, 1L, "signup", 0L), (2L, 1L, "click", 1L), (3L, 1L, "purchase", 2L),
      (4L, 2L, "signup", 0L), (5L, 2L, "click", 49L),
      (6L, 3L, "signup", 0L), (7L, 3L, "click", 1L), (8L, 3L, "purchase", 50L),
      (9L, 4L, "click", 1L))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ev = rows.map { case (id, u, t, h) =>
      (id, u, t, new java.sql.Timestamp(base + h * 3600 * 1000)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.funnelWindowed(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      ("1_signup", 3L, 1.0), ("2_click_48h", 2L, 0.6667), ("3_purchase_48h", 1L, 0.3333)))
  }

  test("botDetect: the metronome flags, bursty and thin users stay human") {
    // u1: 10 events exactly 60 s apart → cv 0 → bot; u2: wildly uneven
    // gaps → human; u3: only 2 events (too few) → human
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(offsetS: Long) = new java.sql.Timestamp(base + offsetS * 1000)
    val rows = (0 until 10).map(i => (i.toLong, 1L, ts(i * 60L))) ++
      Seq(0L, 1L, 101L, 106L, 406L, 408L).zipWithIndex.map { case (o, i) => (100L + i, 2L, ts(o)) } ++
      Seq((200L, 3L, ts(0)), (201L, 3L, ts(60)))
    val ev = rows.toDF("event_id", "user_id", "ts")
    val out = Events.botDetect(ev, minEvents = 5, cvMax = 0.1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1)))).toMap
    assert(out == Map("bot" -> 1L, "human" -> 2L))
  }

  test("rollingDistinctHll: exact rolling distinct out, sketch estimate passes its 5% verdict") {
    val ev = Tables.t(spark, sfDir, "events")
    val got = Events.rollingDistinctHll(ev).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // driver-side observed-rows twin (test scale): last-7 OBSERVED days,
    // the same window the operator and its oracle compute
    import org.apache.spark.sql.functions._
    val pairs = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val idx = pairs.map(_._1).distinct.sorted.zipWithIndex.toMap
    val expected = idx.map { case (d, i) =>
      d -> pairs.collect {
        case (pd, u) if idx(pd) <= i && idx(pd) > i - 7 => u
      }.distinct.length.toLong
    }
    got.foreach { case (day, exact, verdict) =>
      assert(exact == expected(day), s"$day exact rolling distinct")
      assert(verdict == 1L, s"$day hll verdict")
    }
  }

  test("seasonality: planted two-cell grid gives analytic z-scores; dow is Sunday=0") {
    // 2024-01-07 is a Sunday: cells (0,0)×3 and (0,1)×1 →
    // mean 2, σ² = ((9+1) − 16/2)/2 = 1 → z = ±1.0 exactly
    val ev = Seq(
      "2024-01-07 00:10:00", "2024-01-07 00:20:00",
      "2024-01-07 00:30:00", "2024-01-07 01:00:00")
      .toDF("ts_s").withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Events.seasonality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((0L, 0L, 3L, 1.0), (0L, 1L, 1L, -1.0)))
  }

  test("topPaths assembles first-K journeys in time order and truncates at K") {
    // u1/u2 share a 3-step journey; u3 diverges; u4 has 7 events but
    // only the first 5 may appear in its path
    def ev(u: Long, i: Int, ty: String) =
      (u * 100 + i, u, Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"), ty)
    val rows =
      Seq("view", "click", "purchase").zipWithIndex.flatMap { case (ty, i) =>
        Seq(ev(1, i, ty), ev(2, i, ty)) } ++
      Seq(ev(3, 0, "view"), ev(3, 1, "signup")) ++
      (0 until 7).map(i => ev(4, i, if (i < 5) "view" else "error"))
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.topPaths(df).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("view>click>purchase", 2L),
      ("view>signup", 1L), ("view>view>view>view>view", 1L)))
  }

  test("slidingCounts: every event lands in exactly two hourly-advancing windows") {
    // the streaming source expects a FILE like the testdata layout, so
    // write one part and move it into place
    val dir = java.nio.file.Files.createTempDirectory("slide_").toString
    Seq((1L, 1L, Timestamp.valueOf("2024-01-01 10:30:00"), "a", 1.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 11:30:00"), "a", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = graft.streaming.EventStream.slidingCounts(spark, s"$dir/events.parquet")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("2024-01-01 09:00", 1L),
      ("2024-01-01 10:00", 2L), ("2024-01-01 11:00", 1L)))
  }

  test("nextEventBaseline: majority next per context with its accuracy") {
    def j(u: Long, seq: Seq[String]) = seq.zipWithIndex.map { case (ty, i) =>
      (u * 100 + i, u, Timestamp.valueOf(f"2024-01-01 10:0$i%01d:00"), ty) }
    val rows = j(1, Seq("a", "b", "c")) ++ j(2, Seq("a", "b", "c")) ++
      j(3, Seq("a", "b", "c")) ++ j(4, Seq("a", "b", "d"))
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.nextEventBaseline(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(("a>b", 4L, "c", 3L, 0.75)))
  }

  test("cuped: a perfectly predictive baseline removes ALL variance") {
    // user i: pre value i, post value 2i → θ = 2 exactly, every
    // adjusted metric collapses to 2·x̄ = 21.0, var_cuped = 0,
    // reduction = 1 — in both arms
    val rows = (1L to 20L).flatMap { i =>
      Seq((i * 2, i, Timestamp.valueOf("2024-01-01 10:00:00"), "m", i.toDouble),
        (i * 2 + 1, i, Timestamp.valueOf("2024-01-01 12:00:00"), "m", 2.0 * i))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.cuped(df).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(5), r.getDouble(6)))
    assert(out.length == 2)
    assert(out.forall { case (_, meanC, varC, red) =>
      meanC == 21.0 && varC == 0.0 && red == 1.0 }, s"cuped: ${out.toSeq}")
  }

  test("srmCheck: balanced assignment passes, a one-user pile-up flags") {
    def variant(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      if (h(0) < '8') "A" else "B"
    }
    // 200 distinct users: md5 splits ≈ 50/50 → no SRM
    val many = (1L to 200L).map(u => (u, u, Timestamp.valueOf("2024-01-01 10:00:00"), "m"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val ok = Events.srmCheck(many).head()
    val expA = (1L to 200L).count(variant(_) == "A").toLong
    assert((ok.getLong(1), ok.getLong(2)) == ((expA, 200L - expA)))
    assert(!ok.getBoolean(4), s"balanced split must not flag: $ok")
    // every event from ONE user: one arm holds all 100 → χ² = 100
    val one = (1 to 100).map(i => (i.toLong, 42L,
        Timestamp.valueOf("2024-01-01 10:00:00"), "m"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val bad = Events.srmCheck(one).head()
    assert(bad.getDouble(3) == 100.0 && bad.getBoolean(4), s"pile-up must flag: $bad")
  }

  test("decomposeDaily: a flat series decomposes to itself; a spike lands in residual") {
    def mk(dayN: Seq[(Int, Int)]) = dayN.flatMap { case (d, n) =>
      (1 to n).map(i => (d * 1000L + i, 1L,
        Timestamp.valueOf(f"2024-06-$d%02d 10:00:${i % 60}%02d"), "click"))
    }.toDF("event_id", "user_id", "ts", "event_type")
    // constant 10/day: integer moments give slope EXACTLY 0 →
    // trend = 10, dow_effect = 0, residual = 0 on every day
    val flat = Events.decomposeDaily(mk((1 to 14).map((_, 10))))
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(flat.forall(_ == ((10.0, 0.0, 0.0))), s"flat: ${flat.toSeq}")
    // one 24-event day over THREE weeks (3 samples per weekday, so the
    // spike can't hide as its weekday's effect): the largest |residual|
    // must sit on the spike day
    val spiked = Events.decomposeDaily(
      mk((1 to 21).map(d => (d, if (d == 9) 24 else 10))))
      .collect().map(r => (r.getString(0), math.abs(r.getDouble(5))))
    assert(spiked.maxBy(_._2)._1 == "2024-06-09", s"spike: ${spiked.toSeq}")
  }

  test("burstDays: a 3× day bursts only after enough history exists") {
    // days 1..8: 10 events; day 9: 30. Days 1-3 lack history (prev_n<3
    // → NULL avg, no burst); day 9: 30·8 > 2·80 → burst
    val rows = (1 to 9).flatMap { d =>
      val n = if (d == 9) 30 else 10
      (1 to n).map(i => (d * 1000L + i, 1L,
        Timestamp.valueOf(f"2024-06-$d%02d 10:00:${i % 60}%02d"), "click"))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.burstDays(df).collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    assert(out.take(3).forall(r => r._3.isEmpty && !r._4), s"no-history days: ${out.toSeq}")
    assert(out(3) == (("2024-06-04", 10L, Some(10.0), false)))
    assert(out(8) == (("2024-06-09", 30L, Some(10.0), true)))
  }

  test("rollingCorr: proportional series give r=1; a 1-day frame gives NULL") {
    // daily volumes (click, purchase) = (1,1), (2,2), (3,3): every
    // frame with n ≥ 2 is perfectly correlated; day 1's frame has zero
    // variance → NULL, not NaN
    val rows = (1 to 3).flatMap { d =>
      (1 to d).flatMap(i => Seq(
        (d * 100L + i, 1L, Timestamp.valueOf(f"2024-05-$d%02d 10:0$i:00"), "click"),
        (d * 200L + i, 2L, Timestamp.valueOf(f"2024-05-$d%02d 11:0$i:00"), "purchase")))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.rollingCorr(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      ("2024-05-01", 1L, 1L, None),
      ("2024-05-02", 2L, 2L, Some(1.0)),
      ("2024-05-03", 3L, 3L, Some(1.0))))
  }

  test("funnelStages: stage anchors respect at-or-after ordering") {
    val dir = java.nio.file.Files.createTempDirectory("sfun_").toString
    Seq(
      // u1: full journey
      (11L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1.0),
      (12L, 1L, Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (13L, 1L, Timestamp.valueOf("2024-01-01 10:10:00"), "purchase", 1.0),
      // u2: click BEFORE the first view must not open stage 2,
      // so the purchase can't open stage 3 either
      (21L, 2L, Timestamp.valueOf("2024-01-01 09:00:00"), "click", 1.0),
      (22L, 2L, Timestamp.valueOf("2024-01-01 09:30:00"), "view", 1.0),
      (23L, 2L, Timestamp.valueOf("2024-01-01 10:00:00"), "purchase", 1.0),
      // u3: click at the SAME instant as the view counts (>= semantics)
      (31L, 3L, Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1.0),
      (32L, 3L, Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val r = graft.streaming.EventStream
      .funnelStages(spark, s"$dir/events.parquet").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("hourlyDistinctHll: drained stream equals the batch HLL bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("shll_").toString
    val rows = (1L to 40L).map(u =>
      (u, u % 7, Timestamp.valueOf(f"2024-01-01 ${10 + (u % 2)}%02d:00:00"),
        "view", 1.0))
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = graft.streaming.EventStream
      .hourlyDistinctHllRaw(spark, s"$dir/events.parquet").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
        .as("hour"))
      .agg(approx_count_distinct(col("user_id")).as("h"),
        count(lit(1)).as("n"))
      .orderBy("hour").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
    // 7 true distinct users per hour; HLL must land within 10%
    assert(streamed.forall { case (_, hll, _) => math.abs(hll - 7.0) <= 1.0 })
    assert(streamed.map(_._3).sum == 40L)
    // the r12 gate face: exact hourly distinct out + passing verdicts
    val face = graft.streaming.EventStream
      .hourlyDistinctHll(spark, s"$dir/events.parquet").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(face.forall { case (_, exact, _, verdict) => exact == 7L && verdict == 1L })
    assert(face.map(_._3).sum == 40L)
  }

  test("valueBands: interpolated percentiles per type") {
    val rows = (1 to 9).map(i =>
      (i.toLong, 1L, Timestamp.valueOf(f"2024-01-01 10:0$i%01d:00"), "a",
        i.toDouble)) :+
      (10L, 1L, Timestamp.valueOf("2024-01-01 11:00:00"), "b", 5.0)
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.valueBands(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(("a", 9L, 1.8, 5.0, 8.2), ("b", 1L, 5.0, 5.0, 5.0)))
  }

  test("dowHourHeatmap: cells land on the 0-Sunday dow convention") {
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-07 10:00:00"), "view"), // Sunday
      (2L, 1L, Timestamp.valueOf("2024-01-07 10:30:00"), "view"),
      (3L, 1L, Timestamp.valueOf("2024-01-08 23:00:00"), "view")) // Monday
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.dowHourHeatmap(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0L, 10L, 2L, 0.6667), (1L, 23L, 1L, 0.3333)))
  }

  test("mttr: recovery is the next non-error event; unrecovered stays NULL") {
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "error"),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:05:00"), "click"), // rec 5
      (3L, 1L, Timestamp.valueOf("2024-01-01 10:10:00"), "error"),
      (4L, 1L, Timestamp.valueOf("2024-01-01 10:30:00"), "view"), // rec 20
      (5L, 2L, Timestamp.valueOf("2024-01-01 11:00:00"), "error")) // never
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Events.mttr(rows).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((3L, 2L, 12.5, 12.5)))
  }

  test("causalImpact: a flat pre-period makes the lifted post day significant") {
    // 28 days, 2 events/day except 2024-01-20 (5 events): the pre
    // half (Jan 1-14) is perfectly flat → every dow mean is 2, pooled
    // variance 0 → only the lifted day clears the ±2σ band
    val rows = (1 to 28).flatMap { d =>
      val k = if (d == 20) 5 else 2
      (1 to k).map(i =>
        (d * 100L + i, 1L, Timestamp.valueOf(f"2024-01-$d%02d 10:0$i%01d:00"),
          "view", 1.0))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.causalImpact(df).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5)))
    assert(out.length == 14) // Jan 15-28
    assert(out.forall(_._3 == 2.0), "every dow forecast must be the flat 2")
    val lifted = out.filter(_._5)
    assert(lifted.toSeq == Seq(("2024-01-20", 5L, 2.0, 3.0, true)))
    assert(out.filterNot(_._5).forall(r => r._2 == 2L && r._4 == 0.0))
  }

  test("did: group-constant deltas give the exact effect and zero SE") {
    // replicate the operator's md5 split independently so the spec can
    // compute the expected group sizes
    def ctl(u: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(u.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.head < '8'
    }
    val users = (1L to 12L)
    val (nc, nt) = (users.count(ctl), users.count(!ctl(_)))
    assert(nc > 0 && nt > 0, "md5 must scatter users across both groups")
    // pre value varies by user, but the DELTA depends only on the
    // group (ctl +2, trt +5) → did = 3 exactly, se = 0, t NULL
    val rows = users.flatMap { u =>
      val pre = (u % 3 + 1).toDouble
      val post = pre + (if (ctl(u)) 2.0 else 5.0)
      Seq((u * 10 + 1, u, Timestamp.valueOf("2024-01-01 00:00:00"), "view", pre),
        (u * 10 + 2, u, Timestamp.valueOf("2024-01-02 00:00:00"), "view", post))
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Events.did(df).head()
    assert((r.getLong(0), r.getLong(1)) == ((nc.toLong, nt.toLong)))
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4), "zero-variance groups must yield NULL t, not NaN")
  }

  test("timeToConvert: first purchase at-or-after the first view, by start hour") {
    val rows = Seq(
      // u1: view 10:00 → purchase 10:30 (30 min, cohort 10)
      (11L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "view"),
      (12L, 1L, Timestamp.valueOf("2024-01-01 10:30:00"), "purchase"),
      // u2: a purchase BEFORE the first view must not count
      (21L, 2L, Timestamp.valueOf("2024-01-01 09:00:00"), "purchase"),
      (22L, 2L, Timestamp.valueOf("2024-01-01 09:30:00"), "view"),
      (23L, 2L, Timestamp.valueOf("2024-01-01 10:30:00"), "purchase"),
      // u3: never converts
      (31L, 3L, Timestamp.valueOf("2024-01-01 11:00:00"), "view"))
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.timeToConvert(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq((9L, 1L, 60.0, 60.0, 60.0),
      (10L, 1L, 30.0, 30.0, 30.0)))
  }

  test("sequenceMatch: each planted journey hits exactly its own pattern") {
    def j(u: Long, seq: Seq[String]) = seq.zipWithIndex.map { case (ty, i) =>
      (u * 100 + i, u, Timestamp.valueOf(f"2024-01-01 10:0$i%01d:00"), ty) }
    val rows = j(1, Seq("view", "purchase")) ++ // direct_convert only
      j(2, Seq("signup", "view", "click")) ++   // signup_first only
      j(3, Seq("view", "view", "view")) ++      // pure_browse only
      j(4, Seq("error", "click", "purchase"))   // error_recovery only
    val df = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.sequenceMatch(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("direct_convert", 1L, 4L, 0.25),
      ("error_recovery", 1L, 4L, 0.25),
      ("pure_browse", 1L, 4L, 0.25),
      ("signup_first", 1L, 4L, 0.25)))
  }

  test("holtLinear: recursion matches the hand-computed series, forecast extends the trend") {
    // daily counts 2,4,6 (one event day 1, ... wait: plant exact counts)
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, 1L, Timestamp.valueOf("2024-01-02 10:00:00")),
      (4L, 1L, Timestamp.valueOf("2024-01-02 11:00:00")),
      (5L, 1L, Timestamp.valueOf("2024-01-02 12:00:00")),
      (6L, 1L, Timestamp.valueOf("2024-01-02 13:00:00")),
      (7L, 1L, Timestamp.valueOf("2024-01-03 10:00:00")),
      (8L, 1L, Timestamp.valueOf("2024-01-03 11:00:00")),
      (9L, 1L, Timestamp.valueOf("2024-01-03 12:00:00")),
      (10L, 1L, Timestamp.valueOf("2024-01-03 13:00:00")),
      (11L, 1L, Timestamp.valueOf("2024-01-03 14:00:00")),
      (12L, 1L, Timestamp.valueOf("2024-01-03 15:00:00")))
      .toDF("event_id", "user_id", "ts")
    // x = (2, 4, 6): init s=2, b=2.
    // t=2: yhat=4; s'=0.5*4+0.5*(2+2)=4; b'=0.25*(4-2)+0.75*2=2
    // t=3: yhat=6; s'=0.5*6+0.5*(4+2)=6; b'=0.25*(6-4)+0.75*2=2
    // forecast h: 6 + 2h
    val out = Events.holtLinear(rows, horizon = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01", "fit", 2L, 2.0),
      ("2024-01-02", "fit", 4L, 4.0),
      ("2024-01-03", "fit", 6L, 6.0),
      ("2024-01-04", "forecast", 0L, 8.0),
      ("2024-01-05", "forecast", 0L, 10.0)))
  }

  test("upliftQini: hand-computed qini over a known md5 assignment split") {
    // md5 first hex char: treated (<'8') = users 6,9,11,17; control =
    // 7,10,13,14. Engagement puts {6,9,7,10} in tile 1, rest in tile 2.
    // Converters: 6 (treated), 7 (control), 11 (treated).
    // tile1: 1/2 vs 1/2 -> uplift 0, qini 1-1*(2/2) = 0
    // tile2: 1/2 vs 0/2 -> uplift 0.5; cum 2-1*(4/4) = 1.0
    val nEv = Map(6L -> 20, 9L -> 19, 7L -> 18, 10L -> 17,
      11L -> 16, 17L -> 15, 13L -> 14, 14L -> 13)
    val conv = Set(6L, 7L, 11L)
    val rows = nEv.toSeq.flatMap { case (u, n) =>
      (1 to n).map { i =>
        (u, if (i == 1 && conv(u)) "purchase" else "view") }
    }
    val ev = rows.toDF("user_id", "event_type")
    val out = Events.upliftQini(ev, buckets = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(out == Seq((1L, 2L, 2L, 1L, 1L, 0.0, 0.0),
      (2L, 2L, 2L, 1L, 0L, 0.5, 1.0)))
  }

  test("acf: hand-checked lags on a 3-day ramp") {
    // daily counts [1,2,3]: mean 2, den Σ(x−2)² = 2
    //   lag 1 pairs (1,2),(2,3): (−1·0)+(0·1) = 0   → acf 0
    //   lag 2 pair (1,3): (−1)(1) = −1               → acf −0.5
    import java.sql.Timestamp
    val rows = (Seq.fill(1)("2024-01-01") ++ Seq.fill(2)("2024-01-02") ++
      Seq.fill(3)("2024-01-03"))
      .map(d => Timestamp.valueOf(s"$d 12:00:00")).toDF("ts")
    val out = Events.acf(rows, maxLag = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.0), (2L, 1L, -0.5)))
  }

  test("adfScreen: hand-checked regression on a 4-day series") {
    // daily [1,2,3,1] → (z,Δ) pairs (1,1),(2,1),(3,−2): m=3, β̂=−1.5,
    // α̂=3, SSR=1.5, se=√0.75, t=−1.5/0.866025… = −1.7321
    import java.sql.Timestamp
    val rows = (Seq.fill(1)("2024-01-01") ++ Seq.fill(2)("2024-01-02") ++
      Seq.fill(3)("2024-01-03") ++ Seq.fill(1)("2024-01-04"))
      .map(d => Timestamp.valueOf(s"$d 12:00:00")).toDF("ts")
    val r = Events.adfScreen(rows).head()
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((3L, -1.5, -0.5, -1.7321)))
  }

  test("bayesAb: Beta(1,1) posterior means and z on hand-picked arms") {
    // md5 first hex: users 6,9 → arm A; users 1,2 → arm B.
    // A: successes 1/2 → posterior mean 2/4 = 0.5; B: 2/2 → 3/4 = 0.75;
    // vars 4/80, 3/80 → z = 0.25/√0.0875 = 0.8452
    val ev = Seq((6L, 100.0), (9L, 10.0), (1L, 100.0), (2L, 100.0))
      .map { case (u, v) => (u, "click", v) }
      .toDF("user_id", "event_type", "value")
    val r = Events.bayesAb(ev).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 2L, 2L)))
    assert((r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)) ==
      ((0.5, 0.75, 0.25, 0.8452)))
  }

  test("userEntropy: uniform two-type mix lands in the ln2 band, monoculture at 0") {
    // u1: 2 click + 2 view → H = ln4 − ln2 = 0.6931 → band 0.6
    // u2: 4 click → H = 0 → band 0.0
    val ev = (Seq.fill(2)((1L, "click")) ++ Seq.fill(2)((1L, "view")) ++
      Seq.fill(4)((2L, "click"))).toDF("user_id", "event_type")
    val out = Events.userEntropy(ev).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0.0, 1L, 4L), (0.6, 1L, 4L)))
  }

  test("funnelCi: Wilson bounds on a 4→2→1 funnel (hand-computed)") {
    // stage 2: 2/4 → Wilson(0.5, n=4) = [0.15, 0.85]
    // stage 3: 1/2 → Wilson(0.5, n=2) = [0.0945, 0.9055]
    import java.sql.Timestamp
    def at(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")
    val ev = ((1L to 4L).map(u => (u, "signup", at(1))) ++
      Seq((1L, "click", at(2)), (2L, "click", at(2)), (1L, "purchase", at(3))))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnelCi(ev).collect()
    assert((out(0).getString(0), out(0).getLong(1)) == (("1_signup", 4L)))
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert((out(1).getString(0), out(1).getLong(1), out(1).getLong(2),
      out(1).getDouble(3), out(1).getDouble(4), out(1).getDouble(5)) ==
      (("2_click", 2L, 4L, 0.5, 0.15, 0.85)))
    assert((out(2).getString(0), out(2).getLong(1), out(2).getLong(2),
      out(2).getDouble(3), out(2).getDouble(4), out(2).getDouble(5)) ==
      (("3_purchase", 1L, 2L, 0.5, 0.0945, 0.9055)))
  }

  test("sloBurn: integer breach verdicts and exact cumulative burn") {
    // 200‰ SLO: day 1 = 1/10 errors (no breach, burn 0.5 of budget so
    // far), day 2 = 5/10 (breach; cumulative 6/20 → burn 1.5: blown)
    import java.sql.Timestamp
    def ev(day: Int, ty: String, n: Int) = Seq.fill(n)(
      (Timestamp.valueOf(f"2024-01-0$day%d 10:00:00"), ty))
    val rows = (ev(1, "error", 1) ++ ev(1, "view", 9) ++
      ev(2, "error", 5) ++ ev(2, "view", 5)).toDF("ts", "event_type")
    val out = Events.sloBurn(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 10L, 1L, 0.1, false, 0.5),
      ("2024-01-02", 10L, 5L, 0.5, true, 1.5)))
  }

  test("dowAnova: hand-checked F on two Mondays vs two Tuesdays") {
    // Mondays {2,4}, Tuesdays {1,1}: SSB = 20−16 = 4, SSW = 22−20 = 2
    // → F = (4/1)/(2/2) = 4, η² = 4/6 = 0.6667
    import java.sql.Timestamp
    def day(d: String, n: Int) =
      Seq.fill(n)(Timestamp.valueOf(s"2024-01-$d 12:00:00"))
    val rows = (day("01", 2) ++ day("08", 4) ++ day("02", 1) ++ day("09", 1))
      .toDF("ts")
    val r = Events.dowAnova(rows).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((2L, 4L, 4.0, 0.6667)))
  }

  test("holtWinters: a pure weekly pattern forecasts itself exactly") {
    // Two identical weeks starting Monday 2024-01-01: count on weekday
    // d is 2+d. The dow index is then exactly (2+d) - 5, every
    // deseasonalized value is 5, the recursion holds (s, b) = (5, 0),
    // and every fit AND forecast reproduces the weekly pattern exactly
    // (all arithmetic dyadic-exact, so pround4 is the identity).
    val rows = (0 until 14).flatMap { day =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
      val n = 2 + day % 7
      (0 until n).map(i => (day * 100L + i,
        Timestamp.valueOf(s"$date 10:${"%02d".format(i)}:00")))
    }.toDF("event_id", "ts")
    val out = Events.holtWinters(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 21)
    out.take(14).zipWithIndex.foreach { case ((day, kind, n, yhat), i) =>
      assert(kind == "fit" && n == (2 + i % 7).toLong && yhat == n.toDouble,
        s"fit row $i: $day $n $yhat")
    }
    out.drop(14).zipWithIndex.foreach { case ((day, kind, n, yhat), h) =>
      assert(kind == "forecast" && n == 0L && yhat == (2 + h % 7).toDouble,
        s"forecast row $h: $day $yhat")
    }
  }

  test("forecastBacktest: holt is exact on a linear series, mean/snaive pay their bias") {
    // daily counts 1..16; train = 1..9, test = 10..16. Holt with
    // alpha=.5/beta=.25 tracks a linear series exactly -> zero error.
    // snaive repeats train days 3..9 -> every error is -7. mean = 5.
    val rows = (1 to 16).flatMap { t =>
      (1 to t).map(i => (t * 100L + i,
        Timestamp.valueOf(f"2024-01-$t%02d 10:00:${i % 60}%02d")))
    }.toDF("event_id", "ts")
    val out = Events.forecastBacktest(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    def p4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    def mape(err: Int => Double) =
      p4((1 to 7).map(h => math.abs(err(h)) / (9.0 + h)).sum / 7.0)
    assert(out(0) == ("holt", 9L, 7L, 0.0, 0.0, 0.0))
    assert(out(1) == ("mean", 9L, 7L, 8.0, p4(math.sqrt(476.0 / 7.0)),
      mape(h => 4.0 + h)))
    assert(out(2) == ("snaive", 9L, 7L, 7.0, 7.0, mape(_ => 7.0)))
  }

  test("holtWinters guards forecast weekdays: unseen dow refused, covered horizon allowed") {
    // 5 days Mon-Fri (2024-01-01 is a Monday): no Sat/Sun seasonal index.
    // The default horizon=7 forecasts into the weekend — must fail fast
    // naming the unseen dow, not NoSuchElementException on idx()
    val ev = (0 until 5).flatMap { d =>
      (0 until (d + 2)).map(i =>
        ((d * 10 + i).toLong, ts(s"2024-01-0${d + 1} 10:0$i:00"), 1L, "view", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val e = intercept[IllegalArgumentException] { Events.holtWinters(ev).collect() }
    assert(e.getMessage.contains("never observed"))
    assert(e.getMessage.contains("5")) // Saturday = dow 5 named in the gap
    // 6-weekday corpus (Mon-Sat + next Mon, Sunday never observed) with a
    // horizon whose forecast days are all covered (Tue-Sat) now WORKS —
    // fit rows only ever use observed dows (the r9 all-7 require was
    // stricter than the failure it prevented)
    val ev6 = ((0 until 6) :+ 7).flatMap { d =>
      (0 until 3).map(i =>
        ((d * 10 + i).toLong, ts(s"2024-01-0${d + 1} 10:0$i:00"), 1L, "view", 1.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.holtWinters(ev6, horizon = 5).collect()
    assert(out.count(_.getString(1) == "forecast") == 5)
    assert(out.count(_.getString(1) == "fit") == 7)
    // ...but the same corpus with horizon=7 reaches Sunday (dow 6): refused
    val e2 = intercept[IllegalArgumentException] {
      Events.holtWinters(ev6, horizon = 7).collect()
    }
    assert(e2.getMessage.contains("dow 6"))
  }

  test("state-store provider resolves per face shape (r14 x600 measured defaults)") {
    import graft.streaming.EventStream.{resolveProvider, StateShape}
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    // unset: Spark default everywhere — local gate runs unchanged
    assert(resolveProvider(StateShape.HighChurn, Map.empty).isEmpty)
    assert(resolveProvider(StateShape.ScanHeavy, Map.empty).isEmpty)
    // cluster profile: RocksDB ONLY for high-churn faces (sessionize-shaped,
    // 2.1x faster at x600); scan-heavy replay faces keep HDFSBacked headroom
    val cluster = Map("SPARK_GRAFT_PROFILE" -> "cluster")
    assert(resolveProvider(StateShape.HighChurn, cluster).contains(rocks))
    assert(resolveProvider(StateShape.ScanHeavy, cluster).isEmpty)
    // explicit provider overrides the profile for EVERY face (probe/bench knob)
    val explicit = cluster + ("SPARK_GRAFT_STATE_PROVIDER" -> "rocksdb")
    assert(resolveProvider(StateShape.ScanHeavy, explicit).contains(rocks))
    assert(resolveProvider(StateShape.HighChurn,
      Map("SPARK_GRAFT_STATE_PROVIDER" -> "com.example.MyProvider"))
      .contains("com.example.MyProvider"))
    // unknown profile values change nothing
    assert(resolveProvider(StateShape.HighChurn,
      Map("SPARK_GRAFT_PROFILE" -> "laptop")).isEmpty)
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** Kill/restart goldens for the stateful geo stream machines
  * (S44–S50) — r17 verdict item 3. S8 pins checkpoint recovery for
  * the ingest SINK and the RocksDB sweep pins provider metrics, but
  * nothing previously killed a visit/burst/resample/proximity query
  * mid-stream and asserted no-dup/no-loss across the recovered STATE.
  *
  * Each golden runs the same scripted input twice through the
  * exactly-once parquet file sink:
  *  - control: one query consumes every batch uninterrupted;
  *  - restart: the query is stopped (killed) after EVERY batch and a
  *    fresh query resumes from the same checkpoint for the next one,
  *    so recovered state carries each cross-batch interaction.
  * The two output sets must be identical: state recovery loses
  * nothing, the file-sink commit log duplicates nothing. Batch
  * boundaries are the same in both runs (timeout sweeps fire per
  * micro-batch, so differing boundaries would be a fixture bug, not
  * an engine bug). Scripts reuse the S44–S50 functional goldens'
  * fixtures with every stateful interaction placed ACROSS a restart:
  * cross-batch pair detection (S44), transition chains (S45), visit
  * close + idle timeout (S46/S50), burst baseline + eviction re-warm
  * (S47), bracket interpolation + final-second flush (S48), and the
  * previous-fix speed comparison (S49) — plus the classic analytics
  * machines (S14 funnel step times, S18 transition anchors, S19
  * last-touch anchors) and an S46 variant on the RocksDB provider.
  * Batch arrangement respects watermark progression: an event must
  * ride no later than the batch that advances the watermark past it
  * (or both runs would drop it equally and the golden would be
  * vacuous there). */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val base = 1700000000L
  private def ts(sec: Long) = new Timestamp((base + sec) * 1000)

  /** Drive `transform` over the scripted batches into a parquet sink;
    * `restart = true` kills and restarts the query between every
    * batch. Returns the committed rows rendered as strings. */
  private def run[T <: Product : Encoder](
      transform: DataFrame => DataFrame, cols: Seq[String],
      batches: Seq[Seq[T]], restart: Boolean): Set[String] = {
    val in = MemoryStream[T]
    val out = tmpDir("rg_out"); val ckpt = tmpDir("rg_ckpt")
    def start() = transform(in.toDF().toDF(cols: _*))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    if (restart) batches.foreach { b =>
      val q = start(); in.addData(b); q.processAllAvailable(); q.stop()
    } else {
      val q = start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
    }
    spark.read.parquet(out).collect().map(_.mkString("|")).toSet
  }

  private def golden[T <: Product : Encoder](name: String,
      transform: DataFrame => DataFrame, cols: Seq[String],
      batches: Seq[Seq[T]], minRows: Int): Unit = {
    val control = run(transform, cols, batches, restart = false)
    val restarted = run(transform, cols, batches, restart = true)
    assert(control.size >= minRows,
      s"$name: vacuous control fixture (${control.size} rows)")
    assert(restarted == control, s"$name: lost=${(control -- restarted).take(3)} " +
      s"dup/extra=${(restarted -- control).take(3)}")
  }

  private def e(sec: Long, typ: String, id: Long, user: Long = 1): Ev =
    Ev(ts(sec), user, typ, 1.0, id)

  test("S14 restart: funnel step-completion state survives a kill mid-funnel") {
    // Ev is a case class (not a tuple) — drive the harness with its
    // natural column names via toDF-with-no-renames
    golden[Ev]("S14",
      df => StreamOps.funnelStream(df, Seq(("view", 0L),
        ("click", 3600L * 1000000), ("purchase", 24 * 3600L * 1000000))),
      Seq("ts", "user_id", "event_type", "value", "event_id"),
      Seq(
        Seq(e(10, "view", 1), e(20, "click", 2), e(5, "click", 3, user = 2)),
        // u1's purchase completes against RECOVERED step times
        Seq(e(30, "purchase", 4), e(50, "view", 5, user = 2)),
        Seq(e(55, "click", 7, user = 2))),
      minRows = 5)
  }

  test("S18 restart: the per-user transition anchor is recovered state") {
    golden[Ev]("S18",
      df => StreamOps.transitionStream(df),
      Seq("ts", "user_id", "event_type", "value", "event_id"),
      Seq(
        Seq(e(10, "view", 1), e(20, "click", 2), e(5, "view", 3, user = 2)),
        // chains off RECOVERED anchors; stale @15 drops; u2's pair
        // rides the same batch as @40 (watermark discipline)
        Seq(e(40, "purchase", 5), e(15, "signup", 7),
          e(30, "click", 4, user = 2), e(25, "error", 6, user = 2))),
      minRows = 4)
  }

  test("S19 restart: the last-touch anchor is recovered state") {
    golden[Ev]("S19",
      df => StreamOps.attributionStream(df, lookbackUs = 1000L * 1000000),
      Seq("ts", "user_id", "event_type", "value", "event_id"),
      Seq(
        Seq(e(100, "view", 1), e(400, "click", 2), e(100, "view", 3, user = 2)),
        // credits resolve against RECOVERED touches; u3's same-instant
        // pair rides the same batch as @5000 (watermark discipline)
        Seq(e(500, "purchase", 5), e(5000, "purchase", 6, user = 2),
          e(700, "click", 7, user = 3), e(700, "purchase", 8, user = 3))),
      minRows = 3)
  }

  test("S44 restart: cross-batch proximity pairs survive a kill between the batches") {
    golden("S44",
      df => StreamOps.proximityStream(df, 150000.0, watermark = "30 seconds"),
      Seq("ts", "id", "la", "lo"),
      Seq(
        // A and B pair in-batch; C is far
        Seq((ts(10), 1L, 10000000L, 20000000L),
          (ts(12), 2L, 10000000L, 21000000L),
          (ts(11), 3L, -50000000L, -120000000L)),
        // D pairs with RECOVERED A and B state after the kill
        Seq((ts(20), 4L, 10100000L, 20100000L)),
        // watermark push evicts; then a lone reading pairs with nothing
        Seq((ts(1000), 9L, -50000000L, 170000000L)),
        Seq((ts(1005), 5L, 10000000L, 20000000L))),
      minRows = 3)
  }

  test("S45 restart: geofence transition chain spans kills without dup or loss") {
    val zones = Seq(
      (101L, 10000000L, 20000000L, 400000.0),
      (102L, 10500000L, 20500000L, 400000.0),
      (103L, 0L, 179900000L, 300000.0),
      (104L, -60000000L, -90000000L, 200000.0))
      .toDF("zone_id", "zla", "zlo", "radius_m")
    golden("S45",
      df => StreamOps.geofenceZoneStream(df, zones, 500000.0),
      Seq("ts", "user_id", "event_id", "la", "lo"),
      Seq( // each transition's "previous zone" is recovered state
        Seq((ts(10), 1L, 1L, 40000000L, 40000000L)),
        Seq((ts(20), 1L, 2L, 10000000L, 20000000L)),
        Seq((ts(30), 1L, 3L, 10500000L, 20500000L)),
        Seq((ts(40), 1L, 4L, 100000L, -179950000L),
          (ts(50), 1L, 5L, -30000000L, 100000000L))),
      minRows = 4)
  }

  test("S46 restart: dwell visits close across kills; idle timeout fires post-recovery") {
    val zones = Seq(("A", 0L, 0L, 200000.0), ("B", 0L, 10000000L, 200000.0))
    golden("S46",
      df => StreamOps.dwellStream(df, zones,
        watermark = "0 seconds", idleGapUs = 60L * 1000000L),
      Seq("ts", "user_id", "event_id", "la", "lo"),
      Seq(
        Seq((ts(20), 1L, 2L, 0L, 0L), (ts(10), 1L, 1L, 100000L, 0L),
          (ts(30), 1L, 3L, 0L, 10000000L)), // closes visit A
        Seq((ts(40), 1L, 4L, 40000000L, 90000000L)), // closes B post-kill
        Seq((ts(15), 1L, 9L, 0L, 10000000L)),        // straggler drops
        Seq((ts(50), 1L, 5L, 0L, 0L)),               // re-enter A
        Seq((ts(200), 2L, 6L, 40000000L, 90000000L)), // wm → 200
        Seq((ts(201), 2L, 7L, 40000000L, 90000000L))), // timeout fires
      minRows = 3)
  }

  test("S47 restart: burst baseline and eviction re-warm survive kills") {
    def hot(sec: Long) = (ts(sec), 0L, 0L)
    def far(sec: Long) = (ts(sec), 40000000L, 90000000L)
    golden("S47",
      df => StreamOps.geoBurstStream(df, windowSeconds = 10L, mult = 3L,
        warmup = 4L, watermark = "0 seconds", idleGapUs = 50L * 1000000L),
      Seq("ts", "la", "lo"),
      Seq(
        // five steady windows + a 12-event burst — baseline is state
        Seq(3L, 7L, 13L, 17L, 23L, 27L, 33L, 37L, 43L, 47L).map(hot) ++
          Seq(51L, 51L, 52L, 52L, 53L, 53L, 54L, 54L, 55L, 55L, 56L, 56L).map(hot),
        Seq(far(58)),   // closes the steady windows (silent)
        Seq(far(100)),  // closes the burst window → ONE alert
        Seq(far(120)), Seq(far(121)), // idle eviction
        (1 to 50).map(_ => hot(135)), // post-return flood must re-warm
        Seq(far(160)), Seq(far(161))),
      minRows = 1)
  }

  test("S48 restart: bracket interpolation and final-second flush span kills") {
    golden("S48",
      df => StreamOps.resampleStream(df, 10L,
        watermark = "0 seconds", idleGapUs = 60L * 1000000L),
      Seq("ts", "user_id", "event_id", "la", "lo"),
      Seq(
        Seq((ts(5), 1L, 1L, -1000L, 100L)),
        // the bracket's left fix is recovered state
        Seq((ts(25), 1L, 2L, 3000L, -500L), (ts(30), 1L, 3L, 5000L, 5000L)),
        Seq((ts(30), 1L, 0L, 99999L, 99999L)), // straggler drops
        Seq((ts(200), 2L, 9L, 40000000L, 90000000L)),
        Seq((ts(201), 2L, 10L, 40000000L, 90000000L))), // timeout flush
      minRows = 3)
  }

  test("S49 restart: the previous-fix speed comparison is recovered state") {
    golden("S49",
      df => StreamOps.speedAnomalyStream(df, 50.0, watermark = "0 seconds"),
      Seq("ts", "user_id", "event_id", "la", "lo"),
      Seq( // ~3,300 km in 10 s across the kill → alert from recovered fix
        Seq((ts(10), 1L, 1L, 0L, 0L)),
        Seq((ts(20), 1L, 2L, 0L, 30000000L)),
        Seq((ts(30), 1L, 3L, 0L, 30010000L))), // ~100 km/s → also flags
      minRows = 1)
  }

  test("S46 restart under RocksDB: state recovery through the production store") {
    // the HDFS-backed default store recovers from the checkpoint's
    // delta files; RocksDB recovers from its own changelog/snapshot
    // machinery — a different code path worth its own kill/restart
    // golden (the r16 sweep asserts provider METRICS, not recovery)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val zones = Seq(("A", 0L, 0L, 200000.0), ("B", 0L, 10000000L, 200000.0))
      golden("S46-rocks",
        df => StreamOps.dwellStream(df, zones,
          watermark = "0 seconds", idleGapUs = 60L * 1000000L),
        Seq("ts", "user_id", "event_id", "la", "lo"),
        Seq(
          Seq((ts(20), 1L, 2L, 0L, 0L), (ts(10), 1L, 1L, 100000L, 0L),
            (ts(30), 1L, 3L, 0L, 10000000L)),
          Seq((ts(40), 1L, 4L, 40000000L, 90000000L)),
          Seq((ts(50), 1L, 5L, 0L, 0L)),
          Seq((ts(200), 2L, 6L, 40000000L, 90000000L)),
          Seq((ts(201), 2L, 7L, 40000000L, 90000000L))),
        minRows = 3)
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("S50 restart: zone-scale dwell runs close across kills (nearest-wins state)") {
    val zones = Seq((101L, 10000000L, 20000000L, 50000.0),
      (102L, 10500000L, 20500000L, 50000.0))
      .toDF("zone_id", "zla", "zlo", "radius_m")
    golden("S50",
      df => StreamOps.dwellZoneStream(df, zones, 500000.0,
        watermark = "0 seconds", idleGapUs = 60L * 1000000L),
      Seq("ts", "user_id", "event_id", "la", "lo"),
      Seq(
        Seq((ts(10), 1L, 1L, 10000000L, 20000000L),
          (ts(20), 1L, 2L, 10000000L, 20000000L)),
        // overlap fix resolves nearest=102, closing the RECOVERED 101 run
        Seq((ts(30), 1L, 3L, 10300000L, 20300000L)),
        Seq((ts(40), 1L, 4L, 40000000L, 40000000L))), // closes 102
      minRows = 2)
  }
}

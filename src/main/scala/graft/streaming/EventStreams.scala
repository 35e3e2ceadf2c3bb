package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming capabilities over the `events` table — greenfield relative
  * to the reference (whose "streaming" is a 30-day batch re-run
  * scheduler, SURVEY §2.10), designed Spark-first:
  *
  *   - event-time tumbling / sliding / session windows, usable in BOTH
  *     batch and streaming plans (same `window()` expressions, so batch
  *     results are the oracle for the streaming path);
  *   - watermarked Structured Streaming variants (`readStream` →
  *     transform → sink) with bounded state;
  *   - custom stateful sessionization via
  *     `flatMapGroupsWithState` (the arbitrary-state escape hatch).
  *
  * Scale: every aggregation keys on (window × type) or user_id — state
  * is bounded by the watermark; no global ordering is ever required.
  */
object EventStreams {

  /** events schema for the file-streaming source (ts arrives as
    * TIMESTAMP(NANOS) parquet → read as LongType nanos, converted). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long (see graft.Tables.events)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  // ----------------------------------------------------------- batch/stream shared

  /** Tumbling event-time window aggregation (works in batch and stream). */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding window (1h window, 30m slide). */
  def slidingAgg(events: DataFrame, width: String = "1 hour",
                 slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"))

  /** Built-in session windows per user (gap-based). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Keyed interval (range) join: each left row pairs with the right
    * rows of the SAME key whose `ts` falls in
    * [left.ts, left.ts + window] — the click-attribution / funnel
    * shape. Works in batch and as a stream-stream inner join (both
    * sides watermarked; the equality key + range condition is exactly
    * what lets Spark bound each side's join state).
    *
    * Contract: both sides must carry an event-time column named
    * `tsCol` (default "ts"), distinct from `key`; `window` must be a
    * simple positive interval like "1 hour" / "30 minutes". Output
    * columns are prefixed l_/r_ (minus the key), so neither side may
    * already contain a column named `l_<c>`/`r_<c>` for one of its
    * own columns.
    *
    * Scale: executes as a hash join on the key with the range as a
    * join-level predicate — never a cartesian; a pure range join
    * without an equality key would need bucketized time binning
    * instead. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   window: String = "1 hour", tsCol: String = "ts",
                   joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
      s"joinType must be inner/left_outer/right_outer/full_outer, got '$joinType'")
    require(key != tsCol, s"key ('$key') must differ from the event-time column ('$tsCol')")
    require(left.columns.contains(tsCol), s"left side has no '$tsCol' column (pass tsCol=...)")
    require(right.columns.contains(tsCol), s"right side has no '$tsCol' column (pass tsCol=...)")
    require(left.columns.contains(key) && right.columns.contains(key),
      s"both sides need the join key '$key'")
    // parse the window to a typed day-time interval (never spliced
    // into SQL text): a malformed caller fails here, not deep inside
    // analysis, and the join condition is built from Columns only
    val windowPattern = """(?i)(\d+)\s+(second|minute|hour|day)s?""".r
    val windowSeconds: Long = window.trim match {
      case windowPattern(n, unit) =>
        n.toLong * (unit.toLowerCase match {
          case "second" => 1L
          case "minute" => 60L
          case "hour"   => 3600L
          case "day"    => 86400L
        })
      case _ => throw new IllegalArgumentException(
        s"window must look like '30 minutes' / '1 hour', got '$window'")
    }
    def collides(cols: Array[String], p: String) =
      cols.filter(_ != key).map(c => s"$p$c").toSet.intersect(cols.toSet)
    require(collides(left.columns, "l_").isEmpty,
      s"left side already has prefixed columns ${collides(left.columns, "l_").mkString(",")}")
    require(collides(right.columns, "r_").isEmpty,
      s"right side already has prefixed columns ${collides(right.columns, "r_").mkString(",")}")
    val l = left.columns.foldLeft(left) { (d, c) =>
      if (c == key) d else d.withColumnRenamed(c, s"l_$c")
    }
    val r = right.columns.foldLeft(right) { (d, c) =>
      if (c == key) d else d.withColumnRenamed(c, s"r_$c")
    }
    // Alias both sides and resolve the key by qualified name: in the
    // self-join case (left and right derived from the same frame) the
    // two key columns share an attribute id, and `l(key) === r(key)`
    // builds a trivially-true predicate Spark then has to repair (it
    // logs a WARN). Qualified resolution is unambiguous by
    // construction.
    // Outer variants are streaming-legal BECAUSE of the equality key +
    // time-range condition: with both sides watermarked, Spark can
    // prove when an unmatched row's match window has closed and emit
    // it with nulls — an un-keyed or un-bounded outer stream join
    // would have to hold state forever and is rejected at analysis.
    val joined = l.as("gl").join(r.as("gr"),
      col(s"gl.$key") === col(s"gr.$key") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") &&
        // a Duration literal lowers to a DayTimeIntervalType Literal —
        // unlike make_dt_interval(...), which is a function call the
        // streaming state-watermark analyzer can't fold, so the outer
        // join's state bound would be unprovable
        col(s"r_$tsCol") <= col(s"l_$tsCol") +
          lit(java.time.Duration.ofSeconds(windowSeconds)),
      joinType)
    // outer joins null the unmatched side's key: surface ONE coalesced
    // key column via an explicit projection (withColumn/drop cannot
    // disambiguate two same-name attributes)
    joined.select(
      coalesce(col(s"gl.$key"), col(s"gr.$key")).as(key) +:
        (l.columns.filter(_ != key).map(c => col(s"gl.$c")) ++
          r.columns.filter(_ != key).map(c => col(s"gr.$c"))).toSeq: _*)
  }

  // ----------------------------------------------------------- streaming

  /** File-source streaming read of the events fixture. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` at session build time
    * (see [[graft.Tables.events]] — readers must not mutate conf). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "readEventStream needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(set at session build time, e.g. via GraftSession.create)")
    // the file source wants a directory: stream the fixture dir with a
    // glob that admits only the events table
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked streaming tumbling aggregation: append-mode safe,
    * state bounded by the watermark horizon. */
  def streamingTumbling(spark: SparkSession, dir: String,
                        width: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    tumblingAgg(readEventStream(spark, dir).withWatermark("ts", watermark), width)

  /** Streaming exact dedup: one event per event_id within the
    * watermark horizon — state stays bounded (ids older than the
    * watermark are evicted), which is what makes streaming dedup
    * viable on an unbounded source. */
  def streamingDedup(spark: SparkSession, dir: String,
                     watermark: String = "2 hours"): DataFrame =
    readEventStream(spark, dir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–static enrichment join: the static side is re-read per
    * micro-batch and broadcast; no stream state involved. */
  def streamStaticJoin(stream: DataFrame, dim: DataFrame,
                       key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  // ----------------------------------------------------------- custom state

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long,
                         total_value: Double)

  /** Arbitrary-stateful sessionization with `flatMapGroupsWithState`:
    * the KeyValueGroupedDataset custom-state path for semantics the
    * built-in session_window can't express (e.g. emitting per-session
    * running aggregates, per-key timeout policies).
    *
    * Batch mode: one invocation sees the user's full history; the
    * still-open session is emitted at end-of-data (end of data closes
    * every session).
    *
    * Streaming mode: a session may span micro-batches, so the open
    * session STAYS in state with an event-time timeout at
    * `end + gap`; it is emitted exactly once — either merged into a
    * later batch's events, or on timeout when the watermark passes its
    * close horizon. Requires `withWatermark("ts", ...)` upstream
    * (EventTimeTimeout's contract). */
  def userSessions(events: Dataset[Event], gapMillis: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    def emit(userId: Long, s: SessionState): UserSession =
      UserSession(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.total)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (streaming && state.hasTimedOut) {
            // watermark passed end+gap: the session can never extend
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var cur: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMillis =>
                  // A cross-batch late-but-above-watermark event can
                  // arrive with t < s.end (or even t < s.start): merge
                  // with max/min so it extends the session instead of
                  // dragging end backwards (which would also shrink the
                  // event-time timeout horizon below end+gap).
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  out += emit(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) if streaming =>
                // keep the open session; close it when the watermark
                // passes its gap horizon (never set a timeout below the
                // current watermark — Spark rejects it)
                state.update(s)
                state.setTimeoutTimestamp(
                  math.max(s.end + gapMillis, state.getCurrentWatermarkMs() + 1))
              case Some(s) =>
                out += emit(userId, s)
                if (state.exists) state.remove()
              case None => ()
            }
            out.iterator
          }
      }
  }
}

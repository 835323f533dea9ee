package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed conversation session: emitted once, when no turn has arrived
  * for the conversation within the inactivity gap (event time). */
final case class ConvSession(
    conv_id: String,
    n_turns: Long,
    n_ws_tokens: Long,
    first_ts: Timestamp,
    last_ts: Timestamp)

/** Running per-conversation state while the session is open. */
final case class ConvAgg(
    nTurns: Long, nTokens: Long, firstTs: Long, lastTs: Long)

/** Event-time session-ization of the transcript stream: per `conv_id`,
  * accumulate turn/token counts while the conversation is active and emit
  * ONE summary row when the watermark passes `last turn + gap` — the
  * custom-state streaming primitive (`flatMapGroupsWithState` with
  * EventTimeTimeout) the sink/percolator family doesn't exercise.
  *
  * The reference is batch-only (SURVEY §2.8: no stream processing in
  * lucene.net); this is the transcript-pipeline op a streaming ingest
  * needs before indexing whole conversations: "conversation ended,
  * summarize and hand it downstream".
  *
  * Shape at scale: state is keyed by conv_id (uniform hash shuffle — the
  * only shuffle in the query) and holds one tiny fixed-size record per
  * OPEN conversation; closed groups are removed on timeout, so the state
  * store is bounded by the number of conversations active inside the gap
  * horizon, not by history. Late turns beyond the watermark delay are
  * dropped by the watermark (the documented trade of event-time
  * sessionization); within-delay stragglers reopen nothing — they extend
  * the still-open session because the timeout only fires once the
  * watermark (which the delay holds back) passes their gap. */
object StreamingSessions {

  /** Fold turns for one conversation into its open-session state; emit
    * the summary exactly when the group times out. */
  private def step(gapMs: Long)(
      convId: String,
      rows: Iterator[(String, String, Timestamp)],
      state: GroupState[ConvAgg]): Iterator[ConvSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(ConvSession(convId, s.nTurns, s.nTokens,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs)))
    } else {
      def close(s: ConvAgg) = ConvSession(convId, s.nTurns, s.nTokens,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs))
      // fold in event-time order and SPLIT on in-batch gaps, so a batch
      // carrying turns on both sides of an inactivity gap yields the
      // same two sessions the batch twin computes. (Cross-batch
      // out-of-order stragglers inside the watermark delay fold into the
      // open session — counts stay right; only the split point of a
      // straggler-bridged gap can differ from the batch twin, the
      // standard event-time sessionization caveat.)
      val sorted = rows.toArray.sortBy(_._3.getTime)
      var emitted = List.empty[ConvSession]
      var sOpt = state.getOption
      sorted.foreach { case (_, text, ts) =>
        val t = ts.getTime
        val nTok = if (text == null) 0L
          else text.split("\\s+").count(_.nonEmpty).toLong
        sOpt = sOpt match {
          case Some(s) if t - s.lastTs > gapMs =>
            emitted ::= close(s)
            Some(ConvAgg(1L, nTok, t, t))
          case Some(s) =>
            Some(ConvAgg(s.nTurns + 1, s.nTokens + nTok,
              math.min(s.firstTs, t), math.max(s.lastTs, t)))
          case None =>
            Some(ConvAgg(1L, nTok, t, t))
        }
      }
      sOpt.foreach { s =>
        state.update(s)
        // the timeout must sit strictly past the current watermark or
        // the state store rejects it; a clamp here just means "time out
        // at the very next trigger", which is the intended semantics
        state.setTimeoutTimestamp(
          math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      emitted.reverseIterator
    }
  }

  /** Sessionize a STREAMING turns frame. `watermarkDelay` bounds how
    * late a turn may arrive and still count; `gapMs` is the inactivity
    * gap that closes a session. Append-mode output: each session row is
    * final when emitted. */
  def sessions(turns: DataFrame, gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ConvSession] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", watermarkDelay)
      .select(col("conv_id"), col("text"), col("ts"))
      .as[(String, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step(gapMs))
  }

  /** The batch twin — the invariant the spec pins: streaming sessions
    * (once every conversation's gap has passed) == one groupBy over the
    * same turns. Gap boundaries WITHIN a conversation are split the same
    * way: a turn more than gapMs after its predecessor starts a new
    * session (window over (conv_id, ts) — the standard batch
    * sessionization idiom). */
  def sessionsBatch(turns: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("ts")
    val nTok = size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
      t => length(t) > 0)).cast("long")
    turns
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs,
          1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("conv_id"), col("sess"))
      .agg(count(lit(1)).as("n_turns"), sum(nTok).as("n_ws_tokens"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .drop("sess")
  }
}

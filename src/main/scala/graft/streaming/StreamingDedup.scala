package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen deduplication with explicit keyed state — the
  * custom-state Structured Streaming operator
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`) of the training-data
  * pipeline: a document stream goes in, only the FIRST occurrence of each
  * content fingerprint ever seen (across micro-batches AND restarts — state
  * lives in the checkpoint) comes out. The batch analog is
  * [[graft.text.Dedup.exact]]; streamed over the same input, the emitted
  * fingerprint set is identical (asserted in StreamingDedupSpec).
  *
  * Scale shape: state is one boolean per distinct fingerprint,
  * hash-partitioned across executors by the state store — no driver state,
  * no shuffle beyond the groupByKey exchange every stateful operator needs.
  * At 100-TB corpus scale the state set is the distinct-document count;
  * bound it with the RocksDB state store provider (spills to executor disk)
  * or switch to [[firstSeenWithTTL]], the event-time-timeout variant whose
  * state holds only the TTL horizon.
  */
object StreamingDedup {

  /** One doc entering the dedup: content fingerprint + a content-determined
    * payload (identical for every duplicate, so emission stays deterministic
    * under any partitioning/batch order). No doc_id: the output never used
    * it, and a null (or uncastable) id would fail the non-nullable Long
    * encoder field and kill the whole query. */
  final case class FingerprintedDoc(fingerprint: String, n_tokens: Int)

  /** First-seen emission: the fingerprint and its content-determined token
    * count. Deliberately does NOT carry doc_id — which duplicate arrives
    * first is nondeterministic in a distributed stream, and the operator's
    * contract is a deterministic output SET. */
  final case class FirstSeen(fingerprint: String, n_tokens: Int)

  /** Emit each distinct `textCol` fingerprint exactly once over the lifetime
    * of the stream (append mode; state persisted in the checkpoint). */
  def firstSeen(docs: DataFrame, textCol: String = "text"): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null text has no fingerprint — drop it rather than kill the query
    // (a null into the non-nullable encoder fields fails the whole stream)
    val fp = docs.where(col(textCol).isNotNull).select(
      md5(col(textCol)).as("fingerprint"),
      size(split(col(textCol), " ", -1)).as("n_tokens")).as[FingerprintedDoc]
    fp.groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[FingerprintedDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // seen in an earlier batch/run
          else {
            val first = rows.next()
            state.update(true)
            Iterator.single(FirstSeen(key, first.n_tokens))
          }
      }
  }

  /** A doc with an event time, for the TTL variant. */
  final case class TimedDoc(fingerprint: String, n_tokens: Int, ts: java.sql.Timestamp)

  /** Windowed first-seen dedup: the BOUNDED-state variant of [[firstSeen]].
    * Contract: each fingerprint is emitted at most once per TTL window,
    * anchored at the EMITTED occurrence's event time — state for a
    * fingerprint is dropped once the watermark passes that time +
    * `ttlMillis` (repeats inside the window are suppressed and do NOT
    * extend it), so the state set holds only the fingerprints first seen
    * within the TTL horizon. A fingerprint recurring after expiry is
    * emitted again — the standard windowed-dedup trade for bounded state
    * on an unbounded 100-TB stream. Requires an event-time column;
    * `delayThreshold` is the watermark lateness bound. */
  def firstSeenWithTTL(docs: DataFrame, tsCol: String, ttlMillis: Long,
      delayThreshold: String = "0 seconds", textCol: String = "text"): Dataset[FirstSeen] = {
    require(ttlMillis > 0, "TTL must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // rows with null text or no usable event time cannot be deduped or
    // aged — drop them rather than kill the query. The guard runs on the
    // CASTED timestamp (filtering the raw column would pass a
    // non-null-but-unparseable value whose conversion fails downstream of
    // it), and the cast is try_cast: under ANSI mode — Spark 4's default —
    // a plain cast of 'garbage' to timestamp THROWS, so one malformed row
    // in an unbounded stream would otherwise abort the whole query.
    val fp = docs.select(
      md5(col(textCol)).as("fingerprint"),
      size(split(col(textCol), " ", -1)).as("n_tokens"),
      expr(s"try_cast(`$tsCol` as timestamp)").as("ts"))
      .where(col("fingerprint").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", delayThreshold)
      .as[TimedDoc]
    // state = the window's expiry timestamp (ms). It must live in the state,
    // not just the timeout registration: Spark CANCELS a group's pending
    // timeout whenever the function is invoked for it, so every suppressed
    // repeat must RE-ARM the original expiry or the key never expires.
    fp.groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Long, FirstSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[TimedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { // horizon passed: forget the fingerprint
            state.remove()
            Iterator.empty
          } else if (state.exists && state.get > state.getCurrentWatermarkMs()) {
            // inside the window: suppress, re-arm the ORIGINAL expiry
            // (repeats don't extend it); the registered timestamp must sit
            // strictly beyond the current watermark or the store rejects it
            state.setTimeoutTimestamp(
              math.max(state.get, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          } else {
            // no state — OR state whose expiry the watermark has already
            // passed: Spark fires hasTimedOut only for keys with NO data
            // this trigger, so a fingerprint recurring in the very batch
            // where its timeout would have fired lands here with stale
            // state. Treating that as suppressed would silently swallow
            // the post-expiry occurrence (and the wm+1 re-arm would then
            // drop the key having emitted nothing) — the documented
            // contract is that it is emitted again, starting a new window.
            //
            // Anchor at the batch's MINIMUM event time, not rows.next():
            // with several occurrences in one batch the iterator's order is
            // partitioning-dependent, and an order-dependent window end
            // would make the emitted set nondeterministic across runs.
            // n_tokens is content-determined — identical on every row.
            val first = rows.minBy(_.ts.getTime)
            val expiry = first.ts.getTime + ttlMillis
            state.update(expiry)
            state.setTimeoutTimestamp(math.max(expiry, state.getCurrentWatermarkMs() + 1))
            Iterator.single(FirstSeen(key, first.n_tokens))
          }
      }
  }
}

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
  * and, where the product allows windowed dedup, an event-time TTL
  * (watermark + `GroupStateTimeout.EventTimeTimeout` — not enabled here
  * because global dedup is the semantics the pipeline wants).
  */
object StreamingDedup {

  /** One doc entering the dedup: content fingerprint + a content-determined
    * payload (identical for every duplicate, so emission stays deterministic
    * under any partitioning/batch order). */
  final case class FingerprintedDoc(fingerprint: String, doc_id: Long, n_tokens: Int)

  /** First-seen emission: the fingerprint and its content-determined token
    * count. Deliberately does NOT carry doc_id — which duplicate arrives
    * first is nondeterministic in a distributed stream, and the operator's
    * contract is a deterministic output SET. */
  final case class FirstSeen(fingerprint: String, n_tokens: Int)

  /** Emit each distinct `textCol` fingerprint exactly once over the lifetime
    * of the stream (append mode; state persisted in the checkpoint). */
  def firstSeen(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = docs.select(
      md5(col(textCol)).as("fingerprint"),
      col(idCol).cast("long").as("doc_id"),
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
}

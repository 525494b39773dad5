package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Delta

/** Structured-Streaming sink into a Delta table with EXACTLY-ONCE batch
  * semantics via the protocol's `txn` action (ref: Delta PROTOCOL.md
  * "Transaction Identifiers"; surface analog of the reference's
  * `write_deltalake` from a streaming pipeline).
  *
  * Mechanism: every micro-batch commit carries
  * `{"txn":{"appId":<queryId>,"version":<batchId>}}`. On restart, Spark's
  * checkpoint re-delivers the last uncommitted-or-in-flight batch; the
  * sink reads the table's latest txn version for its appId and SKIPS any
  * batch at or below it — a replayed batch becomes a no-op instead of
  * duplicate rows. This is the same idempotence contract production Delta
  * streaming writers use, reconstructed from the spec.
  *
  * Scale shape: each micro-batch is one atomic versioned commit (data
  * files land first, rename-publish after), so readers never observe a
  * torn batch; the txn lookup is a driver-side log replay, O(commits
  * since checkpoint). */
object DeltaSink {

  /** Idempotently append one micro-batch. Returns true if the batch was
    * applied, false if it had already been committed (replay). */
  def appendBatch(
      batch: DataFrame,
      tablePath: String,
      appId: String,
      batchId: Long,
      partitionBy: Seq[String] = Nil): Boolean = {
    val applied = Delta.latestVersion(tablePath) >= 0 &&
      Delta.snapshot(batch.sparkSession, tablePath).appTxns.get(appId).exists(_ >= batchId)
    if (applied) false
    else {
      Delta.write(batch, tablePath, mode = "append", partitionBy = partitionBy,
        txn = Some(appId -> batchId))
      true
    }
  }

  /** Start a streaming query draining `stream` into a Delta table.
    * `appId` defaults to a checkpoint-stable identifier: pass your own
    * when multiple independent streams write the same table. */
  def start(
      stream: DataFrame,
      tablePath: String,
      checkpointDir: String,
      appId: String = "graft-delta-sink",
      partitionBy: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, tablePath, appId, batchId, partitionBy)
        ()
      }
      .start()
}

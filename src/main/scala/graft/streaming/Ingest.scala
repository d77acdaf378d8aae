package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.storage.{Eav, LayerStore}

/** Streaming triple ingestion (SURVEY §2.10): an append-only stream of
  * EAV triples lands as one commit layer per micro-batch via
  * foreachBatch — the streaming analogue of the reference's layered
  * commits, giving every batch a queryable delta (added_triple works on
  * batch commits out of the box). */
object Ingest {

  def streamIntoStore(tripleStream: DataFrame, store: LayerStore,
                      branch: String): StreamingQuery = {
    val empty = store.spark.createDataFrame(
      store.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Eav.schema)
    tripleStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val _ = store.commit(branch, batch, empty, s"stream batch $id")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

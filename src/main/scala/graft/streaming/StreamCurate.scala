package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.{HashFunctions => H, TextFunctions => T}

/** One doc routed to its packing shard (same hash routing as the batch
  * operator). */
case class PackInput(id: Long, shard: Int, n_tok: Long)

/** Per-shard running state: the next sequence-start token offset. */
case class PackState(next_start: Long)

/** A doc with its assigned training-sequence coordinates — the same
  * row [[graft.operators.Curate.packSequences]] emits. */
case class PackedDoc(id: Long, shard: Int, n_tok: Long, start_tok: Long,
    seq_id: Long)

/** Streaming forms of the curation operators. Decontaminate and the
  * hash-predicate samplers are stateless — the batch expressions apply
  * to a stream unchanged (spec'd in CurateSpec). Sequence packing is
  * the one with real state: a doc's start offset depends on every doc
  * packed before it in its shard, so the running token counter lives in
  * the state store.
  */
object StreamCurate {

  /** Streaming sequence packing: each shard's running token total is
    * one `PackState` in the state store; a micro-batch's docs extend it
    * and are emitted with their (start_tok, seq_id) immediately. State
    * is O(shards) — a single long per shard, never per-doc — so the
    * store stays bytes-sized at any corpus volume, and each trigger's
    * work is O(batch).
    *
    * Ordering contract: the batch operator lays docs end-to-end in id
    * order within a shard. A stream can only honor that order as far as
    * arrival allows — docs are sorted by id WITHIN each trigger, and
    * triggers append in arrival order. Feed the stream in globally
    * ascending id order (the replay/backfill case) and the drained
    * output is bit-equal to batch [[graft.operators.Curate.packSequences]]
    * on the same prefix; out-of-order arrival packs by arrival instead
    * (no retroactive re-packing — emitted offsets are immutable).
    * NoTimeout: packing state never expires; a shard's counter is
    * meaningful for the stream's lifetime. */
  def packSequencesStream(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 32, seed: Int = 29): Dataset[PackedDoc] = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        pmod(H.hash32(seed, col(idCol).cast("string")), lit(shards))
          .cast("int").as("shard"),
        T.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .as[PackInput]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state) =>
          val batch = it.toIndexedSeq.sortBy(_.id)
          var start = state.getOption.map(_.next_start).getOrElse(0L)
          val out = batch.map { d =>
            val row = PackedDoc(d.id, shard, d.n_tok, start, start / budget)
            start += d.n_tok
            row
          }
          state.update(PackState(start))
          out.iterator
      }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterparts of the corpus-shaping operators — the
  * ingest-time side of the training-data pipeline (documents arrive
  * continuously; the corpus artifacts are maintained incrementally).
  *
  * [[packDocStream]] is the stateful stream form of
  * [[graft.operators.Sharding.packSequences]]: each source's token
  * tape position survives across micro-batches in group state, so the
  * packing a stream produces over time is IDENTICAL to what one batch
  * run over the same docs would produce — the property the spec pins.
  */
object CorpusStreams {

  case class Doc(source: String, doc_id: Long, text: String)
  /** Tape position per source: next token offset, plus the last doc id
    * seen (the ordering-contract tripwire). */
  case class TapeState(nextStart: Long, lastDocId: Long)
  case class PackedFrag(source: String, doc_id: Long, seq_id: Long,
                        frag_start: Long, frag_len: Long, seq_offset: Long)

  /** Whitespace token count with Spark SQL `split(text, ' ')`
    * semantics (trailing empties kept), so stream and batch packers
    * agree token-for-token. */
  private def tokenCount(text: String): Long =
    text.split(" ", -1).length.toLong

  /** Stateful streaming sequence packing: concat each source's docs in
    * arrival order and cut every `seqLen` tokens, emitting the same
    * per-(doc, sequence) fragments as the batch packer. State is two
    * longs per source — the stream can run forever.
    *
    * Ordering contract: each source's docs must arrive in increasing
    * `doc_id` order ACROSS micro-batches (within a batch the group is
    * sorted here); out-of-order arrival would silently mispack the
    * tape, so it fails loud instead. That contract is the natural
    * shape of log-structured ingest (files land in id ranges); an
    * unordered source needs a batch repack instead.
    *
    * Scale: state is O(1) per source; a micro-batch's group fits in
    * memory by construction (bounded by trigger size). For the skewed
    * single-giant-source case the batch packer's substream valve is
    * the right tool — streams shard by source. */
  def packDocStream(docs: Dataset[Doc], seqLen: Long): Dataset[PackedFrag] = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[TapeState, PackedFrag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[Doc], state: GroupState[TapeState]) =>
          var st = state.getOption.map(_.nextStart).getOrElse(0L)
          var last = state.getOption.map(_.lastDocId).getOrElse(Long.MinValue)
          val out = Vector.newBuilder[PackedFrag]
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            if (d.doc_id <= last)
              throw new IllegalStateException(
                s"packDocStream ordering contract violated for source " +
                  s"'$source': doc ${d.doc_id} arrived after $last — " +
                  "stream packing needs per-source id-ordered arrival")
            last = d.doc_id
            val n = tokenCount(d.text)
            if (n > 0) {
              val end = st + n
              var seq = st / seqLen
              while (seq * seqLen < end) {
                val lo = math.max(seq * seqLen, st)
                val hi = math.min((seq + 1) * seqLen, end)
                out += PackedFrag(source, d.doc_id, seq, lo - st, hi - lo,
                  lo % seqLen)
                seq += 1
              }
              st = end
            }
          }
          state.update(TapeState(st, last))
          out.result().iterator
      }
  }
}

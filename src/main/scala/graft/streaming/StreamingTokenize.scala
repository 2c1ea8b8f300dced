package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time BPE tokenization — the streaming front of
  * [[graft.ops.Bpe.encode]]: documents arriving on a stream are
  * tokenized against the TRAINED (word → pieces) relation via a
  * stream-static left join (stateless at the join; the static side
  * is the vocabulary relation, shuffled or broadcast by the batch
  * planner per micro-batch), then reassembled per document under a
  * watermarked aggregation.
  *
  * Division of labor, same one-sided contract as the other gates:
  * every trained word tokenizes exactly as the batch encoder would;
  * a word the training vocabulary has never seen passes through as a
  * single opaque piece (the stream cannot run the merge-fold loop
  * per micro-batch), so the stream's output equals
  * `Bpe.encode(batch, segRel)` with OOV merge application disabled —
  * the batch encoder remains the source of truth for full OOV
  * segmentation, and StreamingSpec pins the equality.
  */
object StreamingTokenize {

  /** Per-doc (eventTime, id, n_tokens_bpe, bpe_text) in append mode
    * once the watermark passes each document's event time.
    */
  def encodeStream(stream: DataFrame, segRel: DataFrame,
      eventTimeCol: String = "ts", lateness: String = "10 minutes",
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = segRel.select(col("word"), col("seg"))
    val tok = stream.filter(col(textCol).isNotNull)
      .select(col(idCol), col(eventTimeCol),
        posexplode(graft.ops.TextAnalysis.tokens(col(textCol))).as(Seq("ord", "tok")))
    val joined = tok.join(vocab, col("tok") === col("word"), "left")
      .select(col(idCol), col(eventTimeCol), col("ord"),
        coalesce(col("seg"), col("tok")).as("piece"),
        when(col("seg").isNull, lit(1L))
          .otherwise(size(split(col("seg"), "\\|")).cast("long")).as("n"))
    joined.withWatermark(eventTimeCol, lateness)
      .groupBy(col(eventTimeCol), col(idCol))
      .agg(sum("n").as("n_tokens_bpe"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("ord"), col("piece")))),
            s => s.getField("piece"))).as("bpe_text"))
  }
}

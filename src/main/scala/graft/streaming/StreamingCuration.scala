package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Streaming corpus curation — the q55 batch law applied to a LIVE
  * document feed: score quality per document, gate on a threshold, and
  * collapse re-published bodies by content hash, all inside one streaming
  * query. The batch pack curates the corpus you already have; this curates
  * the crawl as it lands, so the 100 TB sweep only ever sees documents
  * worth keeping.
  *
  * What deliberately differs from q55: batch dedup keeps the globally
  * smallest doc_id per fingerprint — a GLOBAL argmin no stream can know.
  * The streaming law is keep-FIRST-ARRIVAL per content hash (exact dedup
  * on md5(text)), which is the only order a feed defines. Quality scoring
  * is the identical expression, so a document passes the stream gate iff
  * it passes the batch gate.
  *
  * Scale shape: scoring is narrow per-row expression work; dedup is one
  * stateful exact-dedup operator partitioned by content hash. With
  * [[StreamingDedup.withinWatermark]] semantics (pass an event-time
  * column) state stays bounded by the watermark; with none it is
  * ever-seen dedup over the content-hash domain.
  */
object StreamingCuration {

  /** The q55 quality law, verbatim, as a reusable column over `text`. */
  def quality(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks)
    val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val nStop = size(filter(toks,
      t => t.isin("the", "a", "of", "and", "to", "is")))
    lit(0.5) * least(nTok * lit(1.0) / 100.0, lit(1.0)) +
      lit(0.3) * (nStop * lit(1.0) / nTok) +
      lit(0.2) * least((sumLen * lit(1.0) / nTok) / 6.0, lit(1.0))
  }

  /** Score, gate, and dedup a streaming document frame. `eventTimeCol`
    * (with `delay`) bounds dedup state by a watermark; omit both for
    * ever-seen dedup (bounded key domains only).
    */
  def curate(stream: DataFrame, textCol: String, minQuality: Double,
      eventTimeCol: Option[String] = None,
      delay: String = "1 hour"): DataFrame = {
    val scored = stream
      .withColumn("quality", quality(col(textCol)))
      .where(col("quality") >= minQuality)
    eventTimeCol match {
      case Some(t) => StreamingDedup.byContent(scored, t, delay, textCol)
      case None => StreamingDedup.exact(
        scored.withColumn("__ck", md5(col(textCol).cast("binary"))),
        Seq("__ck")).drop("__ck")
    }
  }
}

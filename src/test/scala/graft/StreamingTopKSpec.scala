package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingTopK

/** Space-Saving laws: the error bound (reported ≥ true ≥ reported−err),
  * guaranteed presence of true heavy hitters, bounded state, and exactness
  * when the sketch never overflows.
  */
class StreamingTopKSpec extends SparkSpec {

  private def writeBatch(dir: String, rows: Seq[(String, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("g", "ms", "item")
      .selectExpr("g", "timestamp_millis(ms) AS ts", "item")
      .repartition(1)
      .write.mode("append").parquet(dir)
  }

  private def drain(dir: String, ckpt: String, k: Int, capacity: Int)
      : Seq[StreamingTopK.HeavyHitter] = {
    val out = scala.collection.mutable.Buffer.empty[StreamingTopK.HeavyHitter]
    val stream = spark.readStream.schema("g STRING, ts TIMESTAMP, item STRING").parquet(dir)
    val q = StreamingTopK.topK(stream, "g", "ts", "item", k, capacity)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingTopK.HeavyHitter], _: Long) =>
        out.synchronized { out ++= b.collect() }; ()
      }
      .start()
    q.awaitTermination()
    out.toSeq
  }

  // Zipf-ish feed: item_i appears 2^(8-i) times for i in 0..7, plus 200
  // distinct one-off items to pressure the sketch
  private def feed(g: String): Seq[(String, Long, String)] = {
    val heavy = (0 until 8).flatMap(i => Seq.fill(1 << (8 - i))(s"hot$i"))
    val noise = (0 until 200).map(i => s"rare$i")
    (heavy ++ noise).zipWithIndex.map { case (item, ix) => (g, 1000L + ix, item) }
  }

  test("exact when the sketch never overflows") {
    val dir = tmpDir("topk1")
    writeBatch(dir, feed("A"))
    val got = drain(dir, tmpDir("topk1-ck"), k = 4, capacity = 1024)
    val top = got.sortBy(_.rank)
    assert(top.map(_.item) == Seq("hot0", "hot1", "hot2", "hot3"))
    assert(top.map(_.count) == Seq(256L, 128L, 64L, 32L))
    assert(top.forall(_.err == 0L), "no eviction → no overestimate")
  }

  test("under pressure: bound holds and true heavy hitters survive") {
    val dir = tmpDir("topk2")
    writeBatch(dir, feed("B"))
    val trueCounts = (0 until 8).map(i => s"hot$i" -> (1L << (8 - i))).toMap
    val got = drain(dir, tmpDir("topk2-ck"), k = 6, capacity = 32)
    val top = got.sortBy(_.rank)
    // every true heavy hitter with freq > N/capacity (≈ 710/32 ≈ 22) present
    assert(Set("hot0", "hot1", "hot2", "hot3").subsetOf(top.map(_.item).toSet))
    top.filter(h => trueCounts.contains(h.item)).foreach { h =>
      val t = trueCounts(h.item)
      assert(h.count >= t && h.count - h.err <= t,
        s"${h.item}: reported ${h.count}±${h.err}, true $t — bound violated")
    }
  }

  test("state survives restart and later batches keep counting") {
    val dir = tmpDir("topk3")
    val ckpt = tmpDir("topk3-ck")
    writeBatch(dir, feed("C"))
    drain(dir, ckpt, k = 2, capacity = 1024)
    writeBatch(dir, (0 until 100).map(i => ("C", 100000L + i, "hot1")))
    val top = drain(dir, ckpt, k = 2, capacity = 1024).sortBy(_.rank)
    assert(top.map(_.item) == Seq("hot0", "hot1"))
    assert(top(1).count == 228L, "128 from batch 1 + 100 from batch 2")
  }
}

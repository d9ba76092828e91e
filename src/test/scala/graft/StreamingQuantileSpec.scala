package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingQuantile

/** Laws for the streaming portable-quantile sketch: agreement with the
  * batch q119 SQL-expression spelling of the SAME law, batching
  * invariance (pure counting has no fold-order sensitivity), the bucket
  * error bound, and bounded state.
  */
class StreamingQuantileSpec extends SparkSpec {

  private def writeBatch(dir: String, rows: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("g", "v").repartition(1).write.mode("append").parquet(dir)
  }

  private def drain(dir: String, ckpt: String)
      : Seq[StreamingQuantile.QuantileEstimate] = {
    val out = scala.collection.mutable.Buffer.empty[StreamingQuantile.QuantileEstimate]
    val stream = spark.readStream.schema("g STRING, v DOUBLE").parquet(dir)
    val q = StreamingQuantile.quantiles(stream, "g", "v")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingQuantile.QuantileEstimate],
         _: Long) => out.synchronized { out ++= b.collect() }; ()
      }
      .start()
    q.awaitTermination()
    out.toSeq
  }

  /** The batch side of the law: q119's estimate computed with Spark SQL
    * expressions (bin()/shiftright — the exact spelling the DuckDB oracle
    * replicates), NOT with the operator's Scala fold. Agreement between
    * the two implementations is the cross-spelling guarantee.
    */
  private def batchEstimates(values: Seq[Double]): Map[String, Double] = {
    import spark.implicits._
    val buckets = values.toDF("v")
      .select(round($"v" * 100).cast("long").as("c"))
      .select($"c", length(bin($"c")).as("b"))
      .select($"c", $"b", greatest($"b" - 6, lit(0)).as("s"))
      .select($"b", $"s", expr("shiftright(c, s)").as("h"))
      .groupBy($"b", $"h", $"s").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"b", $"h")
    val cum = buckets.select($"b", $"h", $"s", $"n",
      sum($"n").over(w).as("cn"),
      sum($"n").over(org.apache.spark.sql.expressions.Window.partitionBy()
        .rowsBetween(Long.MinValue, Long.MaxValue)).as("total"))
    val qf = StreamingQuantile.DefaultQs.toDF("q", "qv")
    cum.join(broadcast(qf), $"cn" >= ceil($"qv" * $"total"))
      .groupBy($"q")
      .agg(min(when($"s" > 0, expr("shiftleft(h, s) + shiftleft(1, s - 1)"))
        .otherwise($"h")).as("mid"))
      .select($"q", ($"mid" / 100.0).as("est"))
      .as[(String, Double)].collect().toMap
  }

  // deterministic price-like feed: spread across several octaves
  private def feed(g: String, n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (g, ((i * 7919) % 90000 + 101) / 100.0 * ((i % 5) + 1)))

  test("streaming estimates equal the batch SQL-expression law") {
    val dir = tmpDir("sq1")
    val rows = feed("A", 500)
    writeBatch(dir, rows)
    val got = drain(dir, tmpDir("sq1-ck"))
      .filter(_.n == 500).map(e => e.q -> e.est).toMap
    val want = batchEstimates(rows.map(_._2))
    assert(got == want, s"streaming $got != batch $want")
  }

  test("batching invariance: one batch and three checkpointed restarts converge identically") {
    val rows = feed("B", 600)
    val oneMap = {
      val dir = tmpDir("sq2a"); writeBatch(dir, rows)
      drain(dir, tmpDir("sq2a-ck")).filter(_.n == 600).map(e => e.q -> e.est).toMap
    }
    // three appends, each drained by a FRESH query on the same checkpoint —
    // exercises both cross-batch state and restart persistence
    val dir = tmpDir("sq2b")
    val ckpt = tmpDir("sq2b-ck")
    var last = Seq.empty[StreamingQuantile.QuantileEstimate]
    rows.grouped(200).foreach { chunk =>
      writeBatch(dir, chunk); last = drain(dir, ckpt)
    }
    val incrMap = last.filter(_.n == 600).map(e => e.q -> e.est).toMap
    assert(incrMap == oneMap,
      s"split-batch run $incrMap != single-batch run $oneMap")
  }

  test("error bound: the exact order statistic lies in the chosen bucket") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val cents = Vector.fill(300)(math.abs(rnd.nextLong()) % 10000000L)
      val sk = cents.foldLeft(Map.empty[(Int, Long), Long])(
        StreamingQuantile.foldSketch)
      val sorted = cents.sorted
      StreamingQuantile.DefaultQs.foreach { case (_, qv) =>
        val exact = sorted(math.ceil(qv * cents.size).toInt - 1)
        val est = StreamingQuantile.estimate(sk, qv)
        val (lo, hi) = StreamingQuantile.bucketRange(
          StreamingQuantile.bucketOf(est)._1, StreamingQuantile.bucketOf(est)._2)
        assert(exact >= lo && exact <= hi,
          s"q=$qv: exact $exact outside estimate bucket [$lo,$hi]")
        // within ~2^-6 relative for values past the first octaves
        if (exact >= 64)
          assert(math.abs(est - exact).toDouble / exact <= 1.0 / 64 + 1e-9,
            s"q=$qv: est $est vs exact $exact beyond the bucket bound")
      }
    }
  }

  test("state stays bounded: sub-bucket grid, not value domain") {
    val rnd = new scala.util.Random(7)
    val cents = Vector.fill(50000)(math.abs(rnd.nextLong()) % (1L << 40))
    val sk = cents.foldLeft(Map.empty[(Int, Long), Long])(
      StreamingQuantile.foldSketch)
    // ≤ 64 sub-buckets per octave, ≤ 64 octaves — 50k distinct values
    // collapse to a grid the value domain cannot grow
    assert(sk.size <= 64 * 64, s"sketch grew to ${sk.size} buckets")
    assert(sk.valuesIterator.sum == 50000L)
  }
}

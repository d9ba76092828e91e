package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) placement — consistent shard
  * assignment with minimal movement under topology change (Thaler &
  * Ravishankar 1996, the scheme behind consistent object placement in
  * Ceph/HDFS-EC-style systems).
  *
  * Every (key, shard) pair gets a portable score — the md5 hex of
  * `"key:shard"`, the same deterministic-hash discipline as the engine's
  * md5-percentile splits — and a key lives on the shard with the LEXICALLY
  * LARGEST score. Growing the cluster from n to n+1 shards therefore moves
  * exactly the keys the new shard wins (expected 1/(n+1) of them), and
  * removing a shard moves only that shard's keys; mod-hash placement
  * reassigns almost everything on any change (q143 measures both).
  *
  * Spelled as a pure per-row column expression — `transform` over the
  * shard list + `array_max` over (score, shard) structs. No explode, no
  * shuffle, no UDF: placement of a 100 TB fact table is map-side work
  * fused into whatever scan already runs, and the shard column then
  * feeds `repartition`/`partitionBy` for the physical move.
  */
object Rendezvous {

  /** The HRW winner among `shards` for `key`, as a column expression.
    * Score = md5("key:shard"); winner = max (score, shard) struct. Ties
    * are impossible in practice (128-bit scores) but break to the larger
    * shard id, deterministically.
    */
  def shardFor(key: Column, shards: Seq[Int]): Column = {
    require(shards.nonEmpty, "rendezvous needs at least one shard")
    array_max(transform(
      typedLit(shards),
      sh => struct(
        md5(concat(key.cast("string"), lit(":"), sh.cast("string"))
          .cast("binary")).as("sc"),
        sh.cast("int").as("sh"))))
      .getField("sh")
  }

  /** Convenience: the contiguous topology [0, nShards). */
  def shardFor(key: Column, nShards: Int): Column =
    shardFor(key, 0 until nShards)

  /** `df` with an HRW shard column appended; feed the result to
    * `repartition(col(shardCol))` / `write.partitionBy(shardCol)` for the
    * physical placement.
    */
  def place(df: DataFrame, keyCol: String, nShards: Int,
      shardCol: String = "shard"): DataFrame =
    df.withColumn(shardCol, shardFor(col(keyCol), nShards))

  /** Per-key placement under two topologies plus the `moved` flag — the
    * churn ledger a reshard planner sums (q143's measured claim: HRW
    * moves ~1/(n+1) of keys on grow where mod moves ~1 − 1/(n+1)).
    */
  def churn(df: DataFrame, keyCol: String, fromShards: Seq[Int],
      toShards: Seq[Int]): DataFrame = {
    val k = col(keyCol)
    df.withColumn("from_shard", shardFor(k, fromShards))
      .withColumn("to_shard", shardFor(k, toShards))
      .withColumn("moved", col("from_shard") =!= col("to_shard"))
  }
}

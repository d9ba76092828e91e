package graft

import scala.util.Random

import graft.operators.ConnectedComponents

/** The closure operator (q36's engine) against a driver-side union-find
  * reference on fixed shapes and seeded random graphs — the distributed
  * min-label fixpoint must equal the textbook answer on every input.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Textbook union-find with path compression — the reference answer. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("empty pair set yields an empty result, not an error") {
    assert(run(Seq.empty) == Map.empty)
  }

  test("fixed shapes: chain, clique, isolated pairs, self-loop") {
    // chain 1-2-3-4-5 → all component 1
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // two cliques
    assert(run(Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
      == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // self-loop is inert
    assert(run(Seq((7L, 7L))) == Map(7L -> 7L))
  }

  test("seeded random graphs match union-find") {
    val rnd = new Random(42)
    (1 to 5).foreach { _ =>
      val n = 30
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(pairs) == unionFind(pairs))
    }
  }

  test("long chain converges within the pointer-jump round budget") {
    // diameter 63: O(log) rounds must reach the fixpoint well under maxRounds
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L) && got.size == 64)
  }

  test("reliable checkpoint mode (checkpoint dir set) reaches the same fixpoint") {
    // With a checkpoint dir configured the rounds write fault-tolerant
    // parquet snapshots instead of executor-local blocks — same answer,
    // rounds survive executor loss on a preemptible cluster, and every
    // superseded round is deleted (only the final snapshot remains).
    val sc = spark.sparkContext
    val dir = tmpDir("cc-ckpt")
    sc.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 13L), (11L, 12L))
      assert(run(pairs) == unionFind(pairs))
      // the rounds actually wrote reliable snapshots, and superseded
      // rounds were deleted — exactly ONE (the final) remains per run
      val fs = org.apache.hadoop.fs.FileSystem.get(sc.hadoopConfiguration)
      // setCheckpointDir nests a UUID subdir; rounds live under THAT
      val ckpt = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      val ccDirs = fs.listStatus(ckpt)
        .filter(_.getPath.getName.startsWith("graft-cc-"))
      assert(ccDirs.nonEmpty, "checkpoint dir should contain round snapshots")
      ccDirs.foreach { d =>
        assert(fs.listStatus(d.getPath).length == 1,
          s"${d.getPath}: superseded round snapshots must be deleted")
      }
    } finally {
      // do not leak the dir into other suites' sessions
      sc.setCheckpointDir(null)
    }
  }
}

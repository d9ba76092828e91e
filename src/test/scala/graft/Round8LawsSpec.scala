package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

/** Semantic laws for the round-8 additions, asserted through the real
  * builders/operators (DuckDB hash parity is the driver's t2 gate; these
  * pin the laws the hashes alone can't localize):
  *
  *   - TableProfiler: exact profile of a hand-built frame covering every
  *     normalization branch (numeric, string-length, timestamp epoch,
  *     date epoch-days, unprofilable array), including an all-null column;
  *   - q219 PPJoin: COMPLETENESS against brute-force all-pairs Jaccard on
  *     the real sf0.001 corpus — the prefix filter must miss nothing and
  *     invent nothing (zero false negatives is the operator's whole claim);
  *   - q222: recall is exact-law-anchored — n_exact sums to q219's row
  *     count and n_found never exceeds n_exact.
  */
class Round8LawsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("TableProfiler: every normalization branch exact") {
    val df = Seq(
      (1L, "ab", Timestamp.valueOf("1970-01-01 00:00:01.5"),
        Date.valueOf("1970-01-11"), Seq(1, 2)),
      (5L, "abcd", Timestamp.valueOf("1970-01-02 00:00:00"),
        Date.valueOf("1969-12-31"), Seq(3)))
      .toDF("n", "s", "ts", "d", "arr")
      .withColumn("allnull", lit(null).cast("double"))
    val p = graft.operators.TableProfiler.profile(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(p("n") == ((2L, 0L, Some(1.0), Some(5.0))))
    assert(p("s") == ((2L, 0L, Some(2.0), Some(4.0))))
    assert(p("ts") == ((2L, 0L, Some(1.5), Some(86400.0))))
    assert(p("d") == ((2L, 0L, Some(-1.0), Some(10.0))))
    assert(p("arr") == ((2L, 0L, None, None)), "arrays profile null min/max")
    assert(p("allnull") == ((2L, 2L, None, None)))
  }

  test("q219 PPJoin completeness: equals brute-force all-pairs on sf0.001") {
    graft.functions.expressions.GraftFunctions.register(spark)
    import graft.functions.TextFunctions._
    val sets = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", array_distinct(wordShingles(tokens($"text"), 3)).as("sh"))
      .where(size($"sh") > 0)
    val brute = sets.as("a").join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        (size(array_intersect($"a.sh", $"b.sh")) * lit(1.0) /
          (size($"a.sh") + size($"b.sh") -
            size(array_intersect($"a.sh", $"b.sh")))).as("jac"))
      .where($"jac" >= 0.8)
      .select($"a_id", $"b_id", round($"jac", 6).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pp = SparkEntry.queries("q219_ppjoin_exact")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp == brute,
      s"missed=${(brute -- pp).take(5)} invented=${(pp -- brute).take(5)}")
    assert(pp.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("GraftCatalog: full surface reachable from plain SQL") {
    graft.sources.GraftCatalog.register(spark, dir, prefix = "cat_")
    val joined = spark.sql(
      """SELECT count(*) FROM cat_lineitem l
        |JOIN cat_orders o ON o.o_orderkey = l.l_orderkey""".stripMargin)
      .head().getLong(0)
    assert(joined > 0)
    val dot = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>))
        |FROM cat_embeddings LIMIT 1""".stripMargin)
      .head().getDouble(0)
    assert(dot > 0.0)
    val ev = spark.sql("SELECT count(*) FROM cat_events WHERE ts IS NOT NULL")
      .head().getLong(0)
    assert(ev > 0, "events view must carry the adapted timestamp column")
  }

  test("q223 incremental PPJoin: exactly the split-crossing exact pairs") {
    val pairs = SparkEntry.queries("q219_ppjoin_exact")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def isNew(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val pct = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) / 65536.0
      pct >= 0.9
    }
    val expected = pairs.collect {
      case (a, b) if isNew(a) && !isNew(b) => (a, b)
      case (a, b) if !isNew(a) && isNew(b) => (b, a)
    }
    val inc = SparkEntry.queries("q223_ppjoin_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == expected,
      s"missing=${(expected -- inc).take(5)} extra=${(inc -- expected).take(5)}")
  }

  test("q221 constraint suite: the synthetic corpus is clean") {
    val checks = SparkEntry.queries("q221_constraint_checks")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
    assert(checks.length == 7)
    checks.foreach { case (name, (n, passed)) =>
      assert(n == 0L && passed, s"$name must hold on the generator's data")
    }
  }

  test("q224 keeper policy: keeper quality dominates its group") {
    val m = SparkEntry.queries("q224_dedup_keeper_policy")(spark, dir).collect()
    assert(m.nonEmpty, "fixture has near-dup groups")
    m.foreach { r =>
      val (removedQ, keeperQ) = (r.getDouble(2), r.getDouble(3))
      assert(keeperQ >= removedQ ||
        (keeperQ == removedQ && r.getLong(1) < r.getLong(0)),
        s"keeper must win on (quality, id): $r")
    }
  }

  test("q225 profile drift: both split sides populated, all columns present") {
    val d = SparkEntry.queries("q225_profile_drift")(spark, dir).collect()
    assert(d.map(_.getString(0)).sorted.toSeq ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    d.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0, "day parity splits events")
    }
  }

  test("q226: re-rank never loses to ADC-only on any query") {
    // theorem: a true hit in the ADC top-3 is in the shortlist and is
    // beaten by at most 2 vectors GLOBALLY on the exact key, so at most 2
    // within the shortlist — it re-ranks into the top-3 (ties broken by
    // nn_id in both rankings)
    SparkEntry.queries("q226_pq_rerank_recall")(spark, dir).collect()
      .foreach { r =>
        assert(r.getLong(3) >= r.getLong(2),
          s"rerank hits must dominate ADC hits: $r")
      }
  }

  test("PlanAudit flags the two scale-killers and passes healthy plans") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{row_number, sum => fsum}
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      assert(graft.operators.PlanAudit.audit(a.crossJoin(b)).cartesian)
      val rawWin = a.withColumn("rn",
        row_number().over(W.orderBy($"x")))
      assert(graft.operators.PlanAudit.audit(rawWin).globalWindow)
      val boundedWin = a.groupBy($"x").agg(fsum($"x").as("s"))
        .withColumn("rn", row_number().over(W.orderBy($"s")))
      val rep = graft.operators.PlanAudit.audit(boundedWin)
      assert(!rep.globalWindow && !rep.cartesian && rep.ok)
      assert(graft.operators.PlanAudit
        .audit(a.join(b, $"x" === $"y")).exchanges >= 1)
    } finally spark.conf.set(key, prev)
  }

  test("q222 recall audit is anchored to the exact law") {
    val audit = SparkEntry.queries("q222_lsh_recall_audit")(spark, dir).collect()
    val nExact = SparkEntry.queries("q219_ppjoin_exact")(spark, dir).count()
    assert(audit.map(_.getLong(1)).sum == nExact)
    audit.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "found cannot exceed exact")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q227 distillation laws: splits partition, AUC bounded and real") {
    val r = SparkEntry.queries("q227_nb_distill")(spark, dir).collect().head
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    // train + test partition the corpus (the pct hash assigns every doc)
    assert(r.getLong(0) + r.getLong(1) == nDocs)
    assert(r.getLong(3) <= r.getLong(1), "positives are test docs")
    val auc = r.getDouble(4)
    assert(auc >= 0.0 && auc <= 1.0)
    // the classifier must actually have distilled the gate: well above
    // chance on held-out docs, and the class means must be ordered the
    // way the log-odds sign convention promises (pos class scores higher)
    assert(auc > 0.7, s"held-out AUC $auc should beat chance decisively")
    assert(r.getDouble(5) > r.getDouble(6),
      "mean score of gate-positive docs must exceed gate-negative")
    // model capacity law: the vocabulary is min-count capped, so it can
    // never exceed the corpus vocabulary of the train split
    assert(r.getLong(2) > 0 && r.getLong(2) <= 64)
    // plan discipline: no cartesian, no data-sized global window (the
    // ROC fold's window sits above the 401-bin aggregate)
    val rep = graft.operators.PlanAudit.audit(
      SparkEntry.queries("q227_nb_distill")(spark, dir))
    assert(rep.ok, s"plan audit: $rep")
  }

  test("q228 winnowing guarantee: a shared >=8-token run shares a fingerprint") {
    graft.functions.expressions.GraftFunctions.register(spark)
    import graft.functions.TextFunctions._
    // w=4 windows over 5-gram hashes: any shared contiguous run of
    // >= w+4 = 8 tokens yields >= 1 shared window, hence >= 1 shared
    // window-min. Plant a 12-token run inside different contexts.
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight $run nine ten eleven twelve"),
      (3L, "completely different words with no common span at all here"))
      .toDF("doc_id", "text")
    val fps = docs
      .select($"doc_id",
        transform(wordShingles(tokens($"text"), 5),
          x => md5(x.cast("binary"))).as("ghs"))
      .select($"doc_id", when(size($"ghs") >= 4,
          array_distinct(transform(sequence(lit(0), size($"ghs") - 4),
            j => array_min(slice($"ghs", j + 1, lit(4))))))
        .otherwise(array().cast("array<string>")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "guarantee: shared run must collide")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs share nothing")
    // corpus-level laws on the real fixture
    val out = SparkEntry.queries("q228_winnowing_overlap")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are ordered doc_a < doc_b")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q229 matryoshka laws: identity at full dim, energy monotone") {
    val rows = SparkEntry.queries("q229_matryoshka_recall")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(64, 32, 16, 8))
    // prefix-cosine at the full dimension IS the truth ranking
    val full = rows.head
    assert(full._2 == 1.0, s"recall@64 must be exactly 1.0, got ${full._2}")
    assert(full._3 == 1.0, s"kept energy@64 must be exactly 1.0, got ${full._3}")
    rows.foreach { case (_, rec, en) =>
      assert(rec >= 0.0 && rec <= 1.0)
      assert(en > 0.0 && en <= 1.0)
    }
    // energy can only shrink as dimensions are dropped
    rows.sliding(2).foreach { case Array((_, _, hi), (_, _, lo)) =>
      assert(lo <= hi, "kept energy must be monotone in prefix length")
    }
  }

  test("q230 re-rank dominance: exact re-rank never loses to Hamming-only") {
    val rows = SparkEntry.queries("q230_binary_quantization")(spark, dir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) == 3L, "k is always 3 on a >=4-vector corpus")
      // THEOREM: ham3 is a subset of the re-rank shortlist, and any
      // truth member inside the shortlist must survive an exact-cosine
      // re-rank to top-3 (at most 2 other vectors beat it globally) —
      // so per-query re-ranked hits >= Hamming-only hits, always.
      assert(r.getLong(4) >= r.getLong(2),
        s"re-rank dominance violated for q_id ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q231 quota law: selected = min(5, uncertain), counts nest") {
    val rows = SparkEntry.queries("q231_uncertainty_sampling")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scored, uncertain, selected) =
        (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(uncertain <= scored, "band is a subset of the scored split")
      assert(selected == math.min(5L, uncertain),
        s"per-source quota violated for ${r.getString(0)}")
      if (selected == 0) assert(r.isNullAt(5),
        "empty selection has no mean |score|")
      else assert(r.getDouble(5) < 0.01,
        "selected docs sit inside the indecision band")
    }
  }

  test("q232 threshold sweep: recall monotone to 1.0, counts nest") {
    val rows = SparkEntry.queries("q232_score_gains")(spark, dir).collect()
    assert(rows.length >= 2)
    // rows are bin-descending = loosening the threshold monotonically
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_pos <= n per bin")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    val recalls = rows.map(_.getDouble(5))
    recalls.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, "cum_recall can only grow as the threshold loosens")
    }
    assert(recalls.last == 1.0, "the loosest threshold admits every positive")
  }
}

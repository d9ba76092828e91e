package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

/** Partition pruning for the MANY-topics event-log layout.
  *
  * A bucketed [[graft.sources.EventLog]] (`topicBuckets = Some(n)`) stores
  * events partitioned by `topic_bucket = md5(topic) mod n` with `topic` as a
  * plain data column (EventLog.scala — the layout that survives millions of
  * event-sourcing aggregates, one topic each, reference:
  * src/sourcing.ts:272-274). The log's own API adds the bucket predicate by
  * hand, but any OTHER way of querying the same table — `log.all` through
  * the DataFrame API, a temp view through the SQL front door, a BI tool on
  * a Connect server — writes `WHERE topic = 'x'` and scans ALL n buckets,
  * because the topic→bucket mapping is knowledge Spark doesn't have. At
  * 100 TB that is the difference between reading 1/n of the log and all
  * of it.
  *
  * This rule restores the mapping: for a Filter with `topic = 'x'` (or
  * `topic IN (...)`) sitting on a parquet relation partitioned by
  * `topic_bucket`, it computes the buckets of the literal topics driver-side
  * — same md5-prefix hash the writer used — and injects the implied
  * `topic_bucket IN (...)` conjunct. FileSourceStrategy recognizes the new
  * conjunct as a partition-key filter, so the scan lists only the matching
  * bucket directories. The original predicate is kept (the rewrite is
  * predicate injection, never replacement) — but note the injected conjunct
  * is a PARTITION filter, so pruning correctness DOES depend on the bucket
  * count matching the on-disk layout: a wrong count would exclude the
  * directory that actually holds the topic and silently drop rows. That is
  * why the count is never guessed (no meta ⇒ no pruning) and why the meta
  * cache below is keyed by the sidecar file's identity, not just its path.
  *
  * The bucket count n travels with the data: the writer drops a
  * `_graft_meta.json` ({"topicBuckets": n}) next to the partition
  * directories (EventLog.append), read here per (root, meta mtime, meta
  * length) — deleting and re-creating a log at the same path with a
  * different bucket count produces a new sidecar and therefore a fresh
  * read, never a stale cached count. Underscore-prefixed files are
  * invisible to parquet directory listings, the same convention as
  * `_SUCCESS`.
  */
object TopicBucketPruning extends Rule[LogicalPlan] with PredicateHelper {

  /** Name of the partition column a bucketed EventLog writes. */
  val BucketCol = "topic_bucket"

  /** Sidecar metadata file at the log root. */
  val MetaFile = "_graft_meta.json"

  // (table root, meta mtime, meta length) → bucket count (None = invalid
  // meta). A LIVE layout is immutable, but the same PATH is not: dropping
  // and re-creating a log there writes a new sidecar, and serving the old
  // count would prune to the wrong directories and silently drop rows
  // (ADVICE r4). Keying by the sidecar's identity makes staleness
  // structural; superseded entries are garbage but bounded by the number
  // of distinct layouts a session ever touches.
  private val metaCache = new ConcurrentHashMap[(String, Long, Long), Option[Int]]()

  private def bucketsFor(hfs: HadoopFsRelation): Option[Int] = {
    val roots = hfs.location.rootPaths
    if (roots.size != 1) return None
    val root = roots.head
    try {
      val fs = root.getFileSystem(hfs.sparkSession.sessionState.newHadoopConf())
      val st = fs.getFileStatus(new Path(root, MetaFile))
      metaCache.computeIfAbsent(
        (root.toString, st.getModificationTime, st.getLen),
        _ => readMeta(root, hfs.sparkSession))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def readMeta(root: Path, spark: SparkSession): Option[Int] =
    try {
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val meta = new Path(root, MetaFile)
      if (!fs.exists(meta)) None
      else {
        val in = fs.open(meta)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        """"topicBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
          .map(_.group(1).toInt).filter(_ > 0)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Literal topics constrained by one conjunct, if it is an equality or
    * IN-list on the given attribute with only string literals.
    */
  private def literalTopics(c: Expression, topic: Attribute): Option[Seq[String]] = c match {
    case EqualTo(a: Attribute, Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType))
        if a.semanticEquals(topic) => Some(Seq(s.toString))
    case EqualTo(Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType), a: Attribute)
        if a.semanticEquals(topic) => Some(Seq(s.toString))
    case In(a: Attribute, vs) if a.semanticEquals(topic) &&
        vs.forall { case Literal(_: org.apache.spark.unsafe.types.UTF8String, StringType) => true; case _ => false } =>
      Some(vs.map(_.asInstanceOf[Literal].value.toString))
    case InSet(a: Attribute, vs) if a.semanticEquals(topic) =>
      Some(vs.toSeq.collect { case s: org.apache.spark.unsafe.types.UTF8String => s.toString })
    case _ => None
  }

  private def isBucketed(rel: LogicalRelation): Boolean =
    rel.relation.isInstanceOf[HadoopFsRelation] &&
      rel.relation.asInstanceOf[HadoopFsRelation]
        .partitionSchema.fieldNames.contains(BucketCol)

  /** The `topic_bucket` conjunct implied by `cond` (expressed over `rel`'s
    * own attributes), or None when nothing applies — no literal topic
    * constraint, no/invalid meta, or the bucket column already constrained
    * (idempotence: ours from a previous fixed-point pass, or the caller's
    * own).
    */
  private def impliedBucketPredicate(cond: Expression,
      rel: LogicalRelation): Option[Expression] = {
    val hfs = rel.relation.asInstanceOf[HadoopFsRelation]
    val bucketAttr = rel.output.find(_.name == BucketCol)
    val topicAttr = rel.output.find(a => a.name == "topic" && a.dataType == StringType)
    val conjuncts = splitConjunctivePredicates(cond)
    (bucketAttr, topicAttr) match {
      case (Some(b), Some(t)) if !conjuncts.exists(_.references.contains(b)) =>
        bucketsFor(hfs).flatMap { n =>
          val topics = conjuncts.flatMap(literalTopics(_, t)).flatten.distinct
          if (topics.isEmpty) None
          else {
            val buckets = topics.map(graft.sources.EventLog.bucketOf(_, n)).distinct.sorted
            Some(
              if (buckets.size == 1) EqualTo(b, Literal(buckets.head))
              else In(b, buckets.map(Literal(_))))
          }
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) if isBucketed(rel) =>
      impliedBucketPredicate(cond, rel)
        .map(pruned => Filter(And(cond, pruned), rel))
        .getOrElse(f)

    // A SQL view with a select-list plans Filter(Project(relation)) — e.g.
    // `CREATE VIEW v AS SELECT topic AS t, ... FROM log` queried with
    // `WHERE t = 'x'`. Re-express the condition through the project's
    // alias map and inject the bucket conjunct BENEATH the project, directly
    // on the relation (where the partition column lives even when projected
    // away). The rewritten inner Filter matches the first arm on the next
    // fixed-point pass, where the already-constrained check stops it.
    case f @ Filter(cond, Project(projList, rel: LogicalRelation)) if isBucketed(rel) =>
      val aliasMap: Map[ExprId, AttributeReference] = projList.collect {
        case a @ Alias(ar: AttributeReference, _) => a.exprId -> ar
        case ar: AttributeReference => ar.exprId -> ar
      }.toMap
      val overRelation = cond.transform {
        case attr: AttributeReference if aliasMap.contains(attr.exprId) =>
          aliasMap(attr.exprId)
      }
      impliedBucketPredicate(overRelation, rel)
        .map(pruned => Filter(cond, Project(projList, Filter(pruned, rel))))
        .getOrElse(f)
  }

  /** Idempotently add this rule to a session's extra optimizer batch (the
    * imperative twin of `GraftExtensions`' injectOptimizerRule, for
    * sessions built without extensions).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations ++= Seq(this)
  }
}

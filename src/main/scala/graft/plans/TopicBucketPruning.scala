package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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
  * bucket directories. The original predicate is kept: the rewrite is
  * predicate injection, never replacement, so correctness doesn't depend on
  * the hash (a wrong bucket count could only make the scan read MORE, never
  * drop a matching row — and the count comes from the log's own metadata).
  *
  * The bucket count n travels with the data: the writer drops a
  * `_graft_meta.json` ({"topicBuckets": n}) next to the partition
  * directories (EventLog.append), read here once per table root and cached.
  * Underscore-prefixed files are invisible to parquet directory listings,
  * the same convention as `_SUCCESS`.
  */
object TopicBucketPruning extends Rule[LogicalPlan] with PredicateHelper {

  /** Name of the partition column a bucketed EventLog writes. */
  val BucketCol = "topic_bucket"

  /** Sidecar metadata file at the log root. */
  val MetaFile = "_graft_meta.json"

  // table root → bucket count (None = no/invalid meta). Layouts are
  // immutable once created, so entries never expire; the map stays tiny
  // (one entry per distinct log path touched by the session).
  private val metaCache = new ConcurrentHashMap[String, Option[Int]]()

  private def bucketsFor(hfs: HadoopFsRelation): Option[Int] = {
    val roots = hfs.location.rootPaths
    if (roots.size != 1) return None
    metaCache.computeIfAbsent(roots.head.toString, _ => readMeta(roots.head, hfs.sparkSession))
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation)
        if rel.relation.isInstanceOf[HadoopFsRelation] &&
          rel.relation.asInstanceOf[HadoopFsRelation]
            .partitionSchema.fieldNames.contains(BucketCol) =>
      val hfs = rel.relation.asInstanceOf[HadoopFsRelation]
      val bucketAttr = rel.output.find(_.name == BucketCol)
      val topicAttr = rel.output.find(a => a.name == "topic" && a.dataType == StringType)
      val conjuncts = splitConjunctivePredicates(cond)
      (bucketAttr, topicAttr) match {
        // idempotence: once any conjunct constrains the bucket column
        // (ours from a previous fixed-point pass, or the caller's own),
        // there is nothing to add
        case (Some(b), Some(t)) if !conjuncts.exists(_.references.contains(b)) =>
          bucketsFor(hfs) match {
            case Some(n) =>
              val topics = conjuncts.flatMap(literalTopics(_, t)).flatten.distinct
              if (topics.isEmpty) f
              else {
                val buckets = topics.map(graft.sources.EventLog.bucketOf(_, n)).distinct.sorted
                val pruned: Expression =
                  if (buckets.size == 1) EqualTo(b, Literal(buckets.head))
                  else In(b, buckets.map(Literal(_)))
                Filter(And(cond, pruned), rel)
              }
            case None => f
          }
        case _ => f
      }
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

package graft.sources

import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.EventRow

/** Migration importer for the reference's FileEventStore layout
  * (reference: src/persistence.ts:141-145): `baseDir/<topic>/<ts>_<id>.json`,
  * one JSON-stringified Event per file. Lets a reference deployment move its
  * persisted history into the parquet event log in one batch job:
  *
  * {{{
  * log.appendRows(...)  // live traffic
  * FileStoreImporter.read(spark, "/old/deno/store").pipe(log.append)
  * }}}
  *
  * Parsing is Jackson-per-partition rather than `from_json`/`get_json_object`
  * because the payload must survive VERBATIM as JSON text: `get_json_object`
  * unquotes string payloads and `from_json` coerces typed ones — both lose
  * the exact byte representation our payload column (and the reference's
  * `JSON.stringify` round-trip) preserves. Import is a cold path; exactness
  * beats codegen here. Metadata values are stringified (the reference allows
  * arbitrary JSON values; our envelope pins Map[String,String] — documented
  * in SURVEY.md §1.2).
  */
object FileStoreImporter {

  def read(spark: SparkSession, baseDir: String): Dataset[EventRow] = {
    import spark.implicits._
    spark.read.textFile(s"${baseDir.stripSuffix("/")}/*/*.json")
      .mapPartitions { lines =>
        val mapper = new ObjectMapper() // one parser per partition
        lines.flatMap { line =>
          val t = line.trim
          if (t.isEmpty) None
          else {
            val n = mapper.readTree(t)
            Some(EventRow(
              id = n.get("id").asText(),
              `type` = n.get("type").asText(),
              topic = n.get("topic").asText(),
              timestamp = new Timestamp(n.get("timestamp").asLong()),
              schemaVersion =
                if (n.hasNonNull("schemaVersion")) n.get("schemaVersion").asText() else "1.0",
              payload =
                if (n.has("payload")) mapper.writeValueAsString(n.get("payload")) else "null",
              metadata =
                if (n.hasNonNull("metadata")) {
                  val it = n.get("metadata").properties().iterator()
                  val b = Map.newBuilder[String, String]
                  while (it.hasNext) {
                    val e = it.next()
                    b += (e.getKey -> (if (e.getValue.isTextual) e.getValue.asText()
                                       else mapper.writeValueAsString(e.getValue)))
                  }
                  b.result()
                } else Map.empty[String, String]))
          }
        }
      }
  }

  /** Read the reference store and append it to a parquet log. Persisted so
    * the file store is parsed once, not once for the count and once for
    * the append.
    */
  def importInto(spark: SparkSession, baseDir: String, log: EventLog): Long = {
    val events = read(spark, baseDir).persist()
    try {
      val n = events.count()
      log.append(events)
      n
    } finally { events.unpersist(blocking = false); () }
  }

  /** Inverse migration: write events back OUT in the reference's layout
    * (`baseDir/<topic>/<epochms>_<id>.json`, one stringified event per
    * file — reference: src/persistence.ts:141-145), so a rollback to the
    * reference keeps its history. Executor-side per-partition writes; the
    * payload JSON text is embedded as a raw JSON value, exactly as
    * `JSON.stringify(event)` would emit it. Returns the file count.
    */
  def exportFrom(events: Dataset[EventRow], baseDir: String): Long = {
    import events.sparkSession.implicits._
    events.mapPartitions { rows =>
      val mapper = new ObjectMapper()
      rows.map { e =>
        val n = mapper.createObjectNode()
        n.put("id", e.id)
        n.put("type", e.`type`)
        n.put("topic", e.topic)
        n.put("timestamp", e.timestamp.getTime)
        n.put("schemaVersion", e.schemaVersion)
        n.set[com.fasterxml.jackson.databind.JsonNode]("payload", mapper.readTree(e.payload))
        val meta = mapper.createObjectNode()
        e.metadata.foreach { case (k, v) => meta.put(k, v) }
        n.set[com.fasterxml.jackson.databind.JsonNode]("metadata", meta)
        val dir = java.nio.file.Paths.get(baseDir, e.topic)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(
          dir.resolve(s"${e.timestamp.getTime}_${e.id}.json"),
          mapper.writeValueAsString(n))
        1L
      }
    }.reduce(_ + _)
  }
}

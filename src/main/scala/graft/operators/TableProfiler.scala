package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven single-pass table profiler — the Deequ/`ANALYZE TABLE`
  * capability as a first-class operator: one row per column with null
  * count and type-normalized min/max, computed for ANY input DataFrame
  * from its schema alone.
  *
  * Scale shape: everything folds into ONE aggregate over one scan — the
  * per-column stats are nested inside an `array(struct(...))` of agg
  * expressions and exploded after the (single-row) aggregation, so
  * profiling N columns costs the same shuffle as profiling one. No
  * distinct counts here by design: multiple exact `countDistinct`s in one
  * pass plan as an N-way Expand (N copies of the scan) — at 100 TB
  * cardinality belongs to the HLL sketch rollup (q117/q131), which is
  * mergeable and single-pass.
  *
  * min/max are normalized to DOUBLE per type so the output schema is
  * uniform: numerics by value, strings by length, timestamps as
  * fractional epoch seconds (micros / 1e6 — exactly DuckDB's `epoch()`),
  * dates as days since 1970-01-01; other types profile null-count only.
  */
object TableProfiler {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val entries = df.schema.fields.map { f =>
      val c = col(f.name)
      val nv: Column = f.dataType match {
        case _: NumericType => c.cast("double")
        case StringType     => length(c).cast("double")
        // NTZ first re-tags as an instant in the session zone (UTC here),
        // so both timestamp flavors profile as the same epoch seconds —
        // NTZ has no direct numeric cast and would otherwise profile null
        case TimestampType | TimestampNTZType =>
          c.cast(TimestampType).cast("double")
        case DateType       => datediff(c, to_date(lit("1970-01-01"))).cast("double")
        case _              => lit(null).cast("double")
      }
      struct(lit(f.name).as("column_name"),
        coalesce(count(when(c.isNull, 1)), lit(0L)).as("n_null"),
        round(min(nv), 6).as("min_val"),
        round(max(nv), 6).as("max_val"))
    }
    df.agg(count(lit(1)).as("n_rows"), array(entries.toSeq: _*).as("cols"))
      .select($"n_rows", explode($"cols").as("c"))
      .select($"c.column_name", $"n_rows", $"c.n_null", $"c.min_val", $"c.max_val")
  }
}

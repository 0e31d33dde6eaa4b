package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names MUST match between the two (the driver
  * sorts columns by name before hashing values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions._

  /** Load one of the driver-generated tables from an sf directory.
    *
    * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads via the nanosAsLong legacy conf; convert to a micros timestamp
    * with integer division (same floor-truncation DuckDB applies), keeping
    * full precision (nanos since epoch overflow double's 53-bit mantissa,
    * so no floating-point division here).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}

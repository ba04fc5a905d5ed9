package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared registry row type for SparkEntry's query inventory. */
private[graft] object SparkEntryRegistry {
  /** name → spark implementation → optional DuckDB oracle SQL.
    * Queries without an oracle get the driver's weaker rows-only check
    * (approximate operators: MinHash/SimHash/LSH).
    */
  case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])
}

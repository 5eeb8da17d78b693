package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Oracle-portability rules (SURVEY.md §2.9): every query ends with a total
  * ORDER BY over a unique key; money math on DECIMAL(18,2) (exact, so sums
  * are order-independent — safe under any shuffle/partitioning); integer
  * outputs cast to BIGINT in both engines; timestamps surfaced as epoch
  * micros or formatted strings, never raw TIMESTAMP (tz-awareness differs
  * between engines' parquet writers).
  */
final case class Probe(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Probe {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Probe =
    Probe(name, run, Some(sql))

  /** No DuckDB-expressible oracle → driver records a rows-only check. */
  def unchecked(name: String)(run: (SparkSession, String) => DataFrame): Probe =
    Probe(name, run, None)
}

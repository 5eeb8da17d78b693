package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the patterns that keep plans healthy at 100 TB.
  * Correctness of saltedJoin is pinned by ScaleSpec against a plain join.
  */
object Scale {

  /** Salted inner equi-join for skewed keys.
    *
    * The skewed (large) side gets a random-but-deterministic salt derived
    * from a row fingerprint; the small side is exploded ×`salts`. The join
    * key becomes (key, salt), splitting a hot key's rows across `salts`
    * reducers instead of one straggler task. Semantics are identical to
    * `big.join(small, keys)` for inner equi-joins where `small` has unique
    * keys. (With AQE's skewedJoin enabled Spark can do this at runtime;
    * explicit salting is for engines/paths where AQE can't see the skew,
    * e.g. pre-shuffle bucketing decisions.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic bucket id for co-located joins / bucketed sinks: rows
    * with equal keys land in equal buckets on every engine and every run.
    */
  def bucketOf(key: Column, buckets: Int): Column = pmod(hash(key), lit(buckets))

  /** Output-size guardrail: bound rows per output file WITHOUT executing
    * the plan an extra time (a count-then-coalesce approach runs the whole
    * upstream twice — unacceptable when the upstream is a 100 TB join).
    * `maxRecordsPerFile` splits at write time with zero additional jobs.
    */
  def sizedWriter(df: DataFrame, targetRowsPerFile: Long)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.write.option("maxRecordsPerFile", targetRowsPerFile)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-randomness helpers: seeded draws that are stable
  * across engines, partitionings, and reruns — properties rand() lacks and
  * reproducible sampling needs. */
object Deterministic {

  /** Uniform int64 priority from a key column: the first 60 bits (15 hex
    * chars — 16 would overflow a signed long) of the md5 digest of the
    * key's decimal string. Sorting on the long is markedly cheaper than on
    * the 32-char hex string, and the same value is expressible in DuckDB as
    * `('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT` — which is
    * how the sampling oracles replay it. */
  def md5Priority(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
}

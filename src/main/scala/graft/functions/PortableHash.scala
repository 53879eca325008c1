package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 32-bit hash: the first 8 hex chars of md5, parsed as a
  * BIGINT in [0, 2^32). md5 is bit-identical between Spark and DuckDB (proven
  * by the `dedup_exact` oracle), so every sketch built on this hash — minhash,
  * simhash, HLL — is exactly reproducible by the SQL oracle, unlike
  * `xxhash64`, which only Spark implements.
  *
  * Cost: one md5 per hashed value vs xxhash64's few ns. For the 100-TB fast
  * path the sketch operators accept `fastHash = true` to switch the inner
  * hash to `xxhash64` (same shapes, same shuffles — only the hash function
  * and therefore the oracle-checkability changes).
  */
object PortableHash {

  /** Spark side: BIGINT in [0, 2^32). Input is hashed via its UTF-8 bytes;
    * non-string columns should be cast to string explicitly by the caller so
    * the representation matches the oracle's `CAST(x AS VARCHAR)`.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL computing the identical value for VARCHAR expression `e`.
    * (md5 hex is lowercase in both engines; letters a-f are ascii 97-102.)
    */
  def duckSql(e: String): String =
    s"""CAST(list_sum(list_transform(range(0, 8), j ->
       |  (CASE WHEN ascii(substr(md5($e), CAST(j+1 AS INT), 1)) >= 97
       |        THEN ascii(substr(md5($e), CAST(j+1 AS INT), 1)) - 87
       |        ELSE ascii(substr(md5($e), CAST(j+1 AS INT), 1)) - 48 END)
       |  * (CAST(1 AS BIGINT) << CAST(4*(7-j) AS INT)))) AS BIGINT)""".stripMargin
}

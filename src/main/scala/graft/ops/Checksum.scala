package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksums — the cross-system validation tool a
  * migration needs: run the same checksum on the source engine and the
  * target engine and compare one row, instead of sorting and diffing
  * terabytes. (Exactly the workflow this library's oracle gate automates
  * per-query; the checksum packages it as an operator.)
  *
  * The digest is a SUM of per-row portable hashes: integer addition is
  * commutative and associative, so the result is independent of row
  * order, partitioning, and merge shape (mergeable across shards — sum
  * the shard checksums). Hash arithmetic is the engine-portable avalanche
  * family from [[Sketches.portableHash]]; the sum accumulates mod 2^64 in
  * a plain long, identical everywhere. A single-row swap, dup, or drop
  * changes the digest; colliding edits require engineering a zero-sum
  * hash delta.
  */
object Checksum {

  /** One row: (n_rows, checksum) over a caller-supplied integer row-key
    * expression (fold your columns into one long — e.g.
    * `orderkey * 131 + linenumber` — with the same expression on the
    * other engine). Map-side partial aggregation means the shuffle
    * carries one (count, sum) pair per partition. */
  def tableChecksum(df: DataFrame, rowKey: Column): DataFrame =
    df.select(Sketches.portableHash(rowKey).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
}

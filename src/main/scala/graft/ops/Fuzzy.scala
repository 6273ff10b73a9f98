package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) joins without a cross join.
  *
  * The SymSpell observation: two strings within Levenshtein distance 1
  * always share a member of their deletion neighborhoods — the string
  * itself plus every single-character deletion. (Equal strings share
  * the string; a substitution means the two same-position deletions are
  * equal; an insertion/deletion means one side's deletion IS the other
  * string.) So distance-1 candidates come from an EQUI-join on
  * neighborhood members, and only candidates pay the exact
  * `levenshtein` verify — the same candidates-then-verify discipline as
  * the LSH families in [[Dedup]]/[[Similarity]]. The neighborhood is
  * hashed to 8-byte keys before exploding, so the candidate shuffle
  * carries (hash, id) — never the strings themselves twice per variant;
  * hash collisions are false candidates the verify removes anyway.
  *
  * Sharing a member bounds the true distance by 2, not 1 ("ab" and
  * "ba" share "a"), so the verify filter is load-bearing, not hygiene.
  *
  * Reference analog: the typo-tolerant lookup discipline of a
  * catalog-matching ETL stage; at 100 TB scale the shuffle is
  * O(total string length), never O(left x right).
  */
object Fuzzy {

  /** The string itself plus every single-code-point deletion, each
    * hashed to 8 bytes and deduplicated (repeated characters produce
    * identical deletions). Native rolling-hash kernel: O(len) per row
    * where the previous substr+concat+xxhash64 expression chain paid
    * O(len) per VARIANT plus a string allocation per variant. The hash
    * family changed with the kernel — only equality matters here (a
    * variant hash is a pure function of the variant's content, and
    * false candidates die in the exact levenshtein verify), so the
    * join's result is unchanged (FuzzySpec pins it against brute
    * force). */
  private[graft] def deletionNeighborhoodHashes(s: Column): Column =
    graft.functions.TextHashFunctions.deletionNeighborhoodHashes(s)

  /** HOF reference implementation of [[deletionNeighborhoodHashes]]'s
    * SHAPE (kept for documentation and the neighborhood-size spec;
    * hash VALUES differ from the kernel by design — both are valid
    * families, and the join verifies candidates exactly). */
  private[graft] def deletionNeighborhoodHashesHof(s: Column): Column =
    array_union(
      array(xxhash64(s)),
      transform(sequence(lit(1), greatest(length(s), lit(1))),
        i => xxhash64(concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, greatest(length(s) - i, lit(0)))))))

  /** All (left, right) pairs with `levenshtein(leftStr, rightStr) <= 1`.
    * Output: leftId, rightId, both strings, and `dist`. Columns must be
    * disjoint between the inputs; ids must be unique per side (they key
    * the string join-back).
    *
    * Ids-only banding: the exploded neighborhood join carries (hash, id)
    * rows — 16 bytes — never the strings (a string would otherwise ride
    * the shuffle once per neighborhood member, ~|s| copies). Strings
    * join back onto the DEDUPED candidate pairs, which are
    * near-output-sized, before the exact levenshtein verify. Same
    * candidates-then-verify economics as the ids-only LSH banding in
    * [[Similarity.lshNearDupPairs]]. */
  def editDistance1Join(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String): DataFrame = {
    val l = left.select(col(leftId),
      explode(deletionNeighborhoodHashes(col(leftStr))).as("__h"))
    val r = right.select(col(rightId),
      explode(deletionNeighborhoodHashes(col(rightStr))).as("__h"))
    l.join(r, "__h")
      .drop("__h")
      // a pair shares many members (always >= 2 when equal); dedup the
      // bounded candidate set before the join-back + O(len^2) verify
      .dropDuplicates(leftId, rightId)
      // the join-back projections dedupe by id: a no-op under the
      // documented unique-id precondition, and a guard against silently
      // multiplying candidate pairs when a caller violates it (a
      // repeated id then contributes ONE string, instead of fanning out)
      .join(left.select(col(leftId), col(leftStr)).dropDuplicates(leftId),
        leftId)
      .join(right.select(col(rightId), col(rightStr)).dropDuplicates(rightId),
        rightId)
      .withColumn("dist", levenshtein(col(leftStr), col(rightStr)))
      .filter(col("dist") <= 1)
      .select(col(leftId), col(leftStr), col(rightId), col(rightStr),
        col("dist"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string self-join at edit distance ≤ 1 — the entity-matching
  * join data-cleaning pipelines run on names/titles/URLs where exact keys
  * miss typo'd duplicates.
  *
  * Blocking uses the deletion neighborhood: any two strings within
  * Levenshtein distance 1 (substitution, insertion, or deletion) share at
  * least one key in {s} ∪ {single-deletion variants of s} — substitutions
  * meet at the variant deleting the differing position, insertions/
  * deletions at the shorter string itself. Candidates are therefore an
  * EQUALITY join on the key (shuffle-partitioned, never all-pairs) and the
  * exact `levenshtein` filter afterwards removes the neighborhood's false
  * positives, so recall is exact by construction. Keys per row = len + 1 —
  * at 100 TB this is the same Σ df² posting-join bound as the n-gram
  * dedup family, and the same hot-key guard applies (`maxKeyBucket` drops
  * degenerate keys shared by too many rows, e.g. a corpus of one repeated
  * name).
  */
object FuzzyJoin {

  /** {s} ∪ single-deletion variants, deduped (e.g. "aa" yields one "a"). */
  def deletionKeys(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      array_union(array(s),
        transform(sequence(lit(1), length(s), lit(1)), i =>
          concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** All pairs (id1 < id2) with Levenshtein(str1, str2) ≤ 1 and the exact
    * distance (0 for identical strings under different ids).
    *
    * PRECONDITION: `idCol` must functionally determine `strCol` (one
    * string per id — the natural entity-table shape). The pair-distinct
    * runs over bare (id1, id2) and both strings are re-joined
    * afterwards, so an id carrying TWO different strings would cross
    * every string combination for a surviving id pair — including
    * combinations that never shared a deletion key — changing the
    * result set vs the one-string-through-distinct form. The rejoin
    * side deduplicates full (id, str) rows, which preserves exact
    * 4-column-distinct semantics ONLY under this precondition; it is
    * not asserted per-row (a corpus-wide exactness check would cost an
    * extra aggregate on the hot path), so callers with non-unique ids
    * must pre-dedup to one string per id.
    */
  def selfJoinEditDistance1(df: DataFrame, strCol: String, idCol: String,
      maxKeyBucket: Int = 1000): DataFrame = {
    val base = df.select(col(idCol), col(strCol))
    val exploded = base
      .withColumn("k", explode(deletionKeys(col(strCol))))
    // NOTE: `exploded`'s lineage is DELIBERATELY evaluated twice (once
    // under the hot-key aggregate, once as the anti-join probe side) —
    // recomputing a map-side explode is cheaper at every scale than
    // materializing tens of millions of exploded key rows just to avoid
    // a second pass.
    // hot-key guard as aggregate + anti-join, not a count window: the
    // window form hash-partitions AND SORTS every exploded key row
    // (30M rows × ~18-char keys at the 100× probe) just to attach a
    // count. The aggregate needs no sort, and the anti-join's build
    // side is bounded by construction — at most rows/maxKeyBucket keys
    // can exceed the cap — so AQE broadcasts it in any non-degenerate
    // corpus and falls back to a shuffle join gracefully otherwise.
    val hot = exploded.groupBy(col("k"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") > maxKeyBucket)
      .select(col("k"))
    val keyed = exploded.join(hot, Seq("k"), "left_anti")
    // candidate dedup carries NO strings: an ED1 pair surfaces from 2-3
    // shared deletion keys (an identical pair from ALL its keys), so the
    // distinct is the volume choke point — at the 100× probe its
    // hash-aggregate SPILLED when each row dragged an 18-char name
    // through the sorter (thread-sampled: UnsafeKVExternalSorter spill +
    // UTF8String compares dominated). Distinct over the bare 16-byte
    // (id1, id2) pair sorts ~2.6× less volume and compares fixed-width
    // longs; both strings rejoin AFTERWARDS against the (distinct) base
    // — two joins of the already-deduped pair set, each shuffling only
    // ids + one string. Wall-clock at the 100× probe is a modest win
    // (warm ~59 s vs ~60–67 for the one-string-through-distinct form);
    // the real argument is spill volume: fixed-width sorter rows are
    // the shape that degrades gracefully when the pair set outgrows
    // memory at 100 TB, where a string-dragging distinct falls off a
    // cliff.
    val l = keyed.select(col("k"), col(idCol).as("id1"))
    val r = keyed.select(col("k"), col(idCol).as("id2"))
    val cand = l.join(r, Seq("k"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    // distinct on the rejoin sides: an exact-duplicate input row would
    // otherwise re-expand a deduped pair (the 4-column-distinct
    // semantics this restructuring must preserve)
    val named = base.distinct()
    cand
      .join(named.select(col(idCol).as("id1"), col(strCol).as("n1")), "id1")
      .join(named.select(col(idCol).as("id2"), col(strCol).as("n2")),
        "id2")
      // threshold form: banded O(len·1) DP that bails at distance 2 and
      // returns -1, instead of the full O(len²) matrix — the verify runs
      // once per candidate pair, so the DP width is the hot loop
      .withColumn("dist", levenshtein(col("n1"), col("n2"), 1))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist").cast("int").as("dist"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (record linkage / fuzzy
  * matching): all unordered pairs of DISTINCT string values within
  * Levenshtein distance `k`, without the all-pairs DP matrix.
  *
  * The reference has no fuzzy matching at all — its dedup operators
  * (`DPF/processors/processor.py` deduplicate()) are equality-only —
  * yet near-miss catalog names, titles, and entity strings are the
  * classic record-linkage input.
  *
  * Candidate generation is the PassJoin segment scheme (Li, Deng &
  * Feng, PVLDB 2011): partition every string into k+1 contiguous
  * segments; if ed(r,s) ≤ k then — pigeonhole over the ≤ k errors of
  * an optimal alignment — at least one segment of r survives
  * error-free, and its image in s is an EXACT substring whose start
  * is shifted by at most k (the net-indel bound). So the join is:
  *
  *  1. DISTINCT first — the join runs on the value VOCABULARY, never
  *     the corpus (same license as DistinctValueFilter: a 100 TB
  *     table with 10⁶ distinct names does 10⁶-scale work).
  *  2. Index side: every string emits its k+1 segments keyed by
  *     (segment index, source length, segment text).
  *  3. Probe side: every string s emits, for each CANDIDATE source
  *     length l_r ∈ [l_s − k, l_s] (the indexed side is canonically
  *     the no-longer side; equal lengths meet from both directions
  *     and dedup) and each segment index, the ≤ 2k+1 substrings of s
  *     at starts within ±k of the segment's canonical position —
  *     O(k³) constant fan-out per string.
  *  4. Exact-match join on the (index, length, text) key, pair
  *     distinct, then levenshtein verify on candidates only.
  *
  * Unlike the classic positional q-gram count filter, segment
  * selectivity GROWS with string length (segments are l/(k+1) chars,
  * not a fixed q) — the q-gram variant of this operator was measured
  * to die at 10⁶ vocabulary by gram-space saturation (24³ grams ≪
  * 10⁶ strings; NOTES.md, the V^K ≫ N exact-join rule), which is why
  * the segment scheme is the shipped plan. Strings of length ≤ k
  * can't carry k+1 non-empty segments and route through an exact
  * all-pairs branch over that (alphabet^k-bounded) tiny universe.
  *
  * Remaining scale caveat (same class as the V^K ≫ N rule):
  * low-entropy vocabularies with long shared affixes
  * ("Customer#000…") make the affix segments' df ≈ |vocabulary| and
  * the candidate set quadratic — strip constant affixes before the
  * join; no exact-match scheme survives a vocabulary whose members
  * are near-identical by construction. */
object FuzzyJoin {

  /** All unordered pairs of distinct `strCol` values with
    * levenshtein ≤ `maxDist`, as (name_a, name_b, dist) with
    * name_a < name_b. Nulls are skipped. */
  def editDistancePairs(df: DataFrame, strCol: String,
      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"need maxDist >= 1; got $maxDist")
    val k = maxDist
    val m = k + 1 // segment count
    val names = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("l", length(col("s")))
      .persist()

    // segment geometry as SQL fragments over (length `lv`, index `iv`):
    // base = lv div m segments, the last (lv mod m) one char longer —
    // a pure function of (lv, iv) so both sides agree exactly
    def segLen(lv: String, iv: String) =
      s"($lv div $m) + (CASE WHEN $iv >= $m - ($lv % $m) THEN 1 ELSE 0 END)"
    def segStart(lv: String, iv: String) =
      s"$iv * ($lv div $m) + greatest(0, $iv - ($m - ($lv % $m)))"

    // index side: the k+1 segments of every segmentable string
    val idx = names.filter(col("l") >= m)
      .selectExpr("s AS name_r", "l AS l_r",
        s"""posexplode(transform(sequence(0, $k), i ->
           substring(s, ${segStart("l", "i")} + 1, ${segLen("l", "i")})))
           AS (i, seg)""")

    // probe side: for each candidate indexed length l_r (no longer
    // than this string) and segment index, the substrings at starts
    // within the ±k net-indel window of the canonical position
    val probe = names.filter(col("l") >= m)
      .selectExpr("s AS name_s", "l AS l_s",
        s"explode(sequence(greatest($m, l - $k), l)) AS l_r")
      .selectExpr("name_s", "l_s", "l_r",
        s"posexplode(transform(sequence(0, $k), i -> named_struct(" +
          s"'p', ${segStart("l_r", "i")}, 'w', ${segLen("l_r", "i")})))" +
          " AS (i, geo)")
      .selectExpr("name_s", "l_s", "l_r", "i",
        s"""explode(CASE WHEN greatest(0, geo.p - $k) <=
             least(l_s - geo.w, geo.p + $k)
           THEN transform(sequence(greatest(0, geo.p - $k),
                  least(l_s - geo.w, geo.p + $k)),
                p -> substring(name_s, p + 1, geo.w))
           ELSE array() END) AS seg""")
      .distinct()

    val candSeg = idx.join(probe, Seq("i", "l_r", "seg"))
      .filter(col("name_r") =!= col("name_s"))
      .select(least(col("name_r"), col("name_s")).as("name_a"),
        greatest(col("name_r"), col("name_s")).as("name_b"))
      .distinct()

    // strings too short to carry k+1 segments: exact pairs over the
    // (alphabet^k-bounded) tiny universe; partners are ≤ 2k long
    val shortA = names.filter(col("l") < m)
      .select(col("s").as("name_x"), col("l").as("lx"))
    val shortB = names.filter(col("l") <= 2 * k)
      .select(col("s").as("name_y"), col("l").as("ly"))
    val candShort = shortB
      .join(broadcast(shortA),
        col("name_x") =!= col("name_y") &&
          abs(col("lx") - col("ly")) <= k)
      .select(least(col("name_x"), col("name_y")).as("name_a"),
        greatest(col("name_x"), col("name_y")).as("name_b"))
      .distinct()

    val out = candSeg.unionByName(candShort).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= k)
      .select(col("name_a"), col("name_b"),
        col("dist").cast("long").as("dist"))
      .localCheckpoint(true)
    names.unpersist()
    out
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-record entity resolution (record linkage): find records that
  * denote the same real-world entity despite dirty key fields — the
  * structured-data sibling of the text near-dup family. Training pipelines
  * need it wherever metadata joins feed curation (user tables, source
  * registries, license holders).
  *
  * The engine shape is the standard blocking + verify + cluster stack:
  *  1. BLOCK on cheap stable fields (equi-join key) — never all-pairs. The
  *     candidate set is sum over blocks of |block|^2, kept near-linear by
  *     choosing selective blocking keys and capping pathological blocks
  *     (the same skew discipline as [[Dedup.winnowPairs]]' bucket cap).
  *  2. VERIFY candidates with an edit-distance bound (`levenshtein` is a
  *     codegen'd built-in; the comparison runs inside the join's output
  *     projection, no extra pass).
  *  3. CLUSTER matches into entities with [[Dedup.components]] (pointer
  *     jumping over the match graph, which is dup-graph-sized, not
  *     corpus-sized).
  *
  * Blocking keys must be chosen from fields the dirt cannot touch —
  * recall is a MODELING decision made by the caller, not something the
  * engine can recover after the fact.
  */
object RecordLinkage {

  /** Name-suffix blocking digits derived from corpus size — the r13 scale
    * knob ("key selectivity must scale with the corpus") made SELF-SETTING,
    * the same move sessionStatePartitions made for streaming state. Under
    * a FIXED key, block depth = rows / #blocks grows linearly with rows and
    * candidate pairs grow with depth² (measured r13: 188x pairs at 10x
    * rows); one more suffix digit multiplies #blocks by 10, holding depth —
    * and with it the pair count's growth — near-linear. Anchored so corpora
    * at or below `anchorRows` keep the reference 2-digit key (the driver
    * corpora — the er fixture is 1.65k records at sf0.01 and 16.5k at
    * sf0.1, and the DuckDB oracle states last-2 semantics; the 188x pair
    * growth was measured at the NEXT decade, 165k records, which is where
    * the first extra digit lands); capped
    * because a suffix longer than the name's varying digit run stops adding
    * selectivity. Output semantics (spec-pinned on the planted-clone
    * fixture): RECALL on dirt outside the suffix is digit-invariant, and
    * precision is MONOTONE — a finer key never adds a merge, it only sheds
    * incidental collisions whose difference sits at the newly-covered
    * position. Blocking is a declared part of the match policy (match =
    * blocked together AND within maxDist), so the shed is the policy
    * tightening with corpus size, not a recall loss.
    */
  def derivedNameSuffixDigits(rows: Long, anchorRows: Long = 20000L,
      base: Int = 2, maxDigits: Int = 8): Int = {
    require(anchorRows > 0 && base >= 1)
    var d = base
    var cap = anchorRows
    while (rows > cap && d < maxDigits) { d += 1; cap *= 10 }
    d
  }

  /** Candidate matches: records sharing the blocking key whose `nameCol`
    * values are within `maxDist` edits. Returns (id_a, id_b, dist) with
    * id_a < id_b.
    *
    * @param blockKey  expression over `df`'s columns producing the blocking
    *                  key (concat of stable fields, a phonetic code, ...)
    * @param maxBlock  blocks larger than this are dropped (skew guard: a
    *                  degenerate key — empty name, default value — would
    *                  otherwise go quadratic; pass Int.MaxValue for oracle
    *                  parity on bounded fixtures)
    */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    val recs = df.select(col(idCol).as("id"), blockKey.as("blk"),
      col(nameCol).as("nm"))
    val sized =
      if (maxBlock == Int.MaxValue) recs
      else {
        // map-side-combined block sizes; oversized blocks exit the join
        val ok = recs.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= maxBlock)
          .select(col("blk"))
        recs.join(ok, Seq("blk"), "left_semi")
      }
    val a = sized.select(col("id").as("id_a"), col("blk"),
      col("nm").as("nm_a"))
    val b = sized.select(col("id").as("id_b"), col("blk"),
      col("nm").as("nm_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** [[blockedPairs]] without the self-join: one hash aggregate collects
    * each block's records into a sorted array and the pairs are generated
    * ROW-LOCALLY with array higher-order functions — same (id_a < id_b,
    * dist <= maxDist) output contract (spec-pinned equal to
    * [[blockedPairs]]).
    *
    * MEASURED SLOWER than the self-join at every probed block-size regime
    * (sf1 warm reps: 11.9 s vs 6.6 s on ~10-row blocks, 29.9 s vs ~10 s on
    * ~70-row blocks): the nested-transform pair expansion is interpreted
    * per row while the self-join's probe/verify runs in whole-stage
    * codegen, and that dominates any per-key machinery saved. Kept as the
    * measured alternative (and for engines where the join is the
    * bottleneck), NOT the default — see `compactBlocks` on [[resolve]].
    */
  def blockedPairsCompact(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    val recs = df.select(col(idCol).as("id"), blockKey.as("blk"),
      col(nameCol).as("nm"))
    val sized =
      if (maxBlock == Int.MaxValue) recs
      else {
        val ok = recs.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= maxBlock)
          .select(col("blk"))
        recs.join(ok, Seq("blk"), "left_semi")
      }
    // sort_array orders the structs by id (first field), so slice-based
    // combination yields id_a <= id_b by construction — EQUALITY is
    // possible when the input carries duplicate ids in a block (sort_array
    // ties sit adjacent and pair with each other), so the strict-< filter
    // below is required to match blockedPairs' contract exactly
    sized.groupBy(col("blk"))
      .agg(sort_array(collect_list(struct(col("id"), col("nm")))).as("rs"))
      .select(explode(expr(
        "flatten(transform(rs, (x, i) -> " +
          "transform(slice(rs, i + 2, size(rs) - i - 1), " +
          "y -> struct(x.id AS id_a, y.id AS id_b, x.nm AS nm_a, y.nm AS nm_b))))"))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        levenshtein(col("p.nm_a"), col("p.nm_b")).as("dist"))
      .filter(col("id_a") < col("id_b")) // pairs-sized: drop duplicate-id self-pairs
      .filter(col("dist") <= maxDist)
  }

  /** Full resolution: every input record mapped to its entity id (the
    * minimum member id of its match cluster; unmatched records are their
    * own entity). The label frame is match-graph-sized; the final
    * assignment is one id-keyed left join against the input.
    *
    * `compactBlocks` selects the candidate generator: false (default)
    * keeps the codegen'd self-join ([[blockedPairs]]) — measured faster at
    * every probed block size; true switches to the row-local
    * [[blockedPairsCompact]]. Identical output either way (spec-pinned).
    *
    * EXACT-COLLAPSE before fuzzy matching (the textbook ER staging, added
    * after the r15 sf10 sweep): records sharing (block, name) byte-exactly
    * are first collapsed to their min-id representative — a single hash
    * aggregate — and only REPRESENTATIVES enter the levenshtein candidate
    * join; collapsed members attach to their rep by STAR edges. The
    * resulting components are IDENTICAL to the full pairwise graph's
    * (levenshtein depends only on the strings, so two members match iff
    * their reps match, and star + rep edges preserve exactly the full
    * graph's connectivity — spec-pinned against the uncollapsed pipeline),
    * while clone mass costs LINEAR edges instead of per-group cliques: a
    * corpus of 100-deep exact duplicates (the ScaleUp-sf10 regime: 82M
    * clique pairs, OOM at any local heap) becomes 1 star edge per record.
    * `maxBlock` now guards REPRESENTATIVE blocks — distinct-name depth,
    * the quantity the key's discriminativeness actually controls.
    *
    * CROSS-VERSION OUTPUT CHANGE (re-baseline deliberately if you consumed
    * pre-r15 assignments): the output identity above holds only BELOW the
    * cap. Two guard semantics moved at once in r15 — (a) `maxBlock` counts
    * distinct names, not raw records, so a block that was over the old
    * raw-record cap but under the distinct-name cap now MATCHES instead of
    * being dropped wholesale; (b) exact-duplicate star merges bypass the
    * cap entirely, so byte-identical clones inside an oversized block now
    * collapse to one entity where they previously all stayed singletons.
    * Both directions only ADD merges relative to the old semantics, never
    * remove them.
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 1000,
      compactBlocks: Boolean = false): DataFrame = {
    val recs = df.select(col(idCol).as("id"), blockKey.as("blk"),
      col(nameCol).as("nm"))
    val reps = recs.groupBy(col("blk"), col("nm"))
      .agg(min(col("id")).as("id"))
      .localCheckpoint(eager = false) // stars + the candidate join read it
    val stars = recs.join(reps.select(col("blk"), col("nm"),
        col("id").as("id_a")), Seq("blk", "nm"))
      .filter(col("id") =!= col("id_a")) // rep = min id, so id_a < id_b
      .select(col("id_a"), col("id").as("id_b"))
    val fuzzy =
      (if (compactBlocks) blockedPairsCompact(reps, "id", "nm", col("blk"), maxDist, maxBlock)
       else blockedPairs(reps, "id", "nm", col("blk"), maxDist, maxBlock))
        .select(col("id_a"), col("id_b"))
    val labels = Dedup.components(fuzzy.unionAll(stars))
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("entity_id"))
  }
}

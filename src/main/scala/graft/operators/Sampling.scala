package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data curation.
  *
  * Everything keys off md5 of the row id, never rand(): results are identical
  * across runs, retries, partitionings and engines (md5 of the decimal string
  * form of the id is engine-portable, which is what makes these operators
  * DuckDB-oracle-able). hashSplit is pure map-side; stratifiedTake costs one
  * shuffle on the group key, same as any windowed aggregation.
  */
object Sampling {

  /** Add a `split` column ('train'/'val'/'test') by the first two hex chars
    * of md5(id): prefix < trainHexUpper -> train, < valHexUpper -> val, else
    * test. Defaults give ~80/10/10 (204/26/26 of 256 buckets). Rows keep
    * their split forever — adding data never reassigns existing rows.
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainHexUpper: String = "cc", valHexUpper: String = "e6"): DataFrame =
    df.withColumn("split", splitCol(col(idCol), trainHexUpper, valHexUpper))

  /** The split decision as a Column: 'train'/'val'/'test' by the first two
    * hex chars of md5(key). Shared by [[hashSplit]] (key = row id),
    * [[groupSplit]] and `TextAnalysis.curateFuzzySplit` (key = dup-cluster
    * label), so every split in the library agrees on the same hash
    * boundaries.
    */
  def splitCol(key: org.apache.spark.sql.Column,
      trainHexUpper: String = "cc", valHexUpper: String = "e6"): org.apache.spark.sql.Column = {
    // md5() emits lowercase hex; normalize and validate the thresholds so an
    // uppercase "CC" can't lexically sort below every digest and send all
    // rows to 'test'.
    val train = trainHexUpper.toLowerCase
    val value = valHexUpper.toLowerCase
    // ASCII range check, not isDigit: Unicode digits (e.g. U+0663) would pass
    // isDigit yet sort above every hex digest, re-creating the mis-split
    def hex(c: Char) = ('0' to '9').contains(c) || ('a' to 'f').contains(c)
    require(train.length == 2 && train.forall(hex),
      s"train threshold must be two hex chars, got '$trainHexUpper'")
    require(value.length == 2 && value.forall(hex),
      s"val threshold must be two hex chars, got '$valHexUpper'")
    require(train < value, "train threshold must sort below val threshold")
    val prefix = substring(md5(key.cast("string")), 1, 2)
    when(prefix < train, "train")
      .when(prefix < value, "val")
      .otherwise("test")
  }

  /** Deterministic weighted downsampling for domain mixing: keep a row with
    * probability `weights(key)` (1.0 for keys not in the map), decided by the
    * first four hex chars of md5(id) — 65,536 buckets, so realized rates are
    * within ~1/65536 of the target. Pure map-side (no shuffle, no rand()):
    * the keep/drop decision for a row never changes across runs, retries or
    * engines, and adding data never resamples existing rows — the standard
    * requirement for reproducible corpus mixes.
    */
  def weightedKeep(df: DataFrame, idCol: String, keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0, 1], got $weights")
    val prefix = substring(md5(col(idCol).cast("string")), 1, 4)
    // lexical compare of the lowercase hex prefix against a 4-hex-digit
    // threshold == numeric compare; weight 1.0 needs a sentinel above every
    // hex string ('g' > 'f' at the first char), since "10000" sorts BELOW
    // "ffff" lexically
    val threshold = weights.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(1.0))) {
      case (acc, (k, w)) => when(col(keyCol) === k, hexThreshold(w)).otherwise(acc)
    }
    df.filter(prefix < threshold)
  }

  /** 4-hex-digit keep threshold for a weight (see weightedKeep); "g" for 1.0.
    * A nonzero weight always keeps at least one of the 65,536 buckets —
    * rounding a tiny weight (e.g. 1e-6) to zero would silently drop every
    * row of that key even though the weight validated as nonzero.
    */
  private[operators] def hexThreshold(w: Double): String = {
    val buckets = if (w > 0.0) math.max(1L, math.round(w * 65536.0)) else 0L
    if (buckets >= 65536L) "g" else f"$buckets%04x"
  }

  /** Deterministic shard assignment — the "global shuffle" step that turns a
    * curated corpus into training shards: every row gets a `shard` in
    * [0, nShards) and a dense `shard_pos` rank inside its shard, both pure
    * functions of md5(id), so the shard layout is identical across runs,
    * engines and partitionings (unlike repartition(n), whose assignment
    * depends on the physical partitioning of the input). Readers stream
    * shard files in shard_pos order and see a fixed pseudorandom permutation
    * of the corpus.
    *
    * The shard number is the first FOUR md5 hex chars (65536 values) valued
    * via ascii() arithmetic — string ops only, so any engine reproduces it —
    * taken mod nShards; shard_pos orders by the full
    * digest (id tiebreak). One shuffle (the per-shard window sort), the
    * exact cost of any global shuffle; at write time, `partitionBy("shard")`
    * + sortWithinPartitions(shard_pos) lays files out so a training job
    * reads each shard sequentially with no further sort.
    *
    * Balance: when nShards does not divide 65536, shards fall into two size
    * classes (ceil vs floor of 65536/nShards draws), a relative skew of at
    * most nShards/65536 — under 0.4% at the nShards <= 256 cap. (Two hex
    * chars would make that 50% at nShards = 100.)
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    shardAssign(df, idCol, nShards, epoch = 0)

  /** [[shardAssign]] with an epoch seed: epoch 0 is the base permutation
    * (digest of the bare id — identical to the 3-arg overload); any other
    * epoch digests `id:epoch`, giving each training epoch its own
    * deterministic global shuffle — the standard "reshuffle every epoch"
    * semantics without rand(): replaying epoch e reproduces epoch e
    * exactly, on any engine, at any partitioning.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int, epoch: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256], got $nShards")
    val digest =
      if (epoch == 0) md5(col(idCol).cast("string"))
      else md5(concat(col(idCol).cast("string"), lit(s":$epoch")))
    // md5 hex is lowercase: '0'-'9' (48-57) value ascii-48, 'a'-'f' (97-102)
    // value ascii-87
    def hexVal(c: org.apache.spark.sql.Column) =
      when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)
    val hv = Seq(1, 2, 3, 4)
      .map(i => hexVal(substring(digest, i, 1)))
      .reduce(_ * 16 + _)
    val shard = pmod(hv, lit(nShards))
    val w = Window.partitionBy(col("shard"))
      .orderBy(digest, col(idCol)) // within-shard order follows the SAME epoch digest
    df.withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w))
  }

  /** Export MANIFEST for a [[shardAssign]] layout: one row per shard with
    * document/token/byte mass and an ORDER-FREE content checksum (bit_xor
    * of each document's leading-8-hex md5 value) — what a training job
    * reads to verify a shard set before consuming it, and what makes a
    * re-export comparable to the original without re-reading payloads.
    * Every column is a plain aggregate over the shard key: one map-side
    * combined shuffle of |shards| rows per partition, corpus-size-free.
    * bit_xor (not sum) keeps the checksum closed under the 64-bit domain
    * and insensitive to row order and partitioning by construction.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, epoch: Int = 0): DataFrame = {
    val hexes = Seq(1, 2, 3, 4, 5, 6, 7, 8)
    def hexVal(c: org.apache.spark.sql.Column) =
      when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)
    val digest = md5(col(textCol))
    val docHash = hexes
      .map(i => hexVal(substring(digest, i, 1)).cast("long"))
      .reduce(_ * 16 + _)
    shardAssign(df, idCol, nShards, epoch)
      .select(col("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("_toks"),
        octet_length(col(textCol)).cast("long").as("_bytes"),
        docHash.as("_h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_toks")).as("n_tokens"),
        sum(col("_bytes")).as("n_bytes"),
        expr("bit_xor(_h)").as("checksum"))
      .orderBy(col("shard"))
  }

  /** Deterministic stratified take: at most k rows per group, chosen by
    * md5(id) order — a reproducible "reservoir" any engine replays
    * identically. Balances skewed groups (languages, sources, labels)
    * without a global sort.
    */
  def stratifiedTake(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Leakage-proof train/val/test split: every member of a near-duplicate
    * cluster lands in the SAME split, so a test document never has a
    * near-copy in train (the classic eval-contamination bug that a plain
    * per-row [[hashSplit]] cannot prevent). `pairs` is any dup-pair frame
    * (`id_a`,`id_b` — minhash/LSH, jaccard, semantic); clusters come from
    * [[Dedup.components]], the split is decided by md5 of the cluster LABEL
    * (singletons: the row's own id), with [[hashSplit]]'s thresholds.
    * Output: df + `grp` + `split`.
    *
    * Scale: the labels frame is |dup graph| rows — orders of magnitude
    * smaller than the corpus after curation — joined once on the id key
    * (AQE broadcasts it when it fits); everything after is map-side.
    */
  def groupSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainHexUpper: String = "cc", valHexUpper: String = "e6"): DataFrame = {
    val labels = Dedup.components(pairs)
      .select(col("id").as("_gid"), col("label").as("_glabel"))
    df.join(labels, df(idCol) === labels("_gid"), "left")
      .withColumn("grp", coalesce(col("_glabel"), col(idCol)))
      .withColumn("split", splitCol(col("grp"), trainHexUpper, valHexUpper))
      .drop("_gid", "_glabel")
  }

  /** Static mixture planning: given target corpus shares per key (e.g.
    * lang/source proportions a training mix should have), compute from the
    * ACTUAL per-key token mass the resampling knobs that achieve them:
    *
    *  - `ratio`   = target_share / natural_share (rounded to 6 decimals) —
    *                the per-key oversampling factor;
    *  - `keep_prob` = min(1, ratio) — feed to [[weightedKeep]] for keys
    *                that must shrink;
    *  - `extra_epochs` = max(0, ceil(ratio) - 1) — feed to [[upsample]]
    *                for keys that must grow;
    *  - `last_epoch_keep` — the fractional remainder that makes the knobs
    *                REALIZE a non-integer ratio: run `extra_epochs + 1`
    *                epochs, apply [[weightedKeep]] with this probability to
    *                the LAST epoch only (ratio 2.3 = 2 full epochs + 0.3 of
    *                a third; integer ratios and shrinking keys emit 1.0 —
    *                their last epoch is full / keep_prob already handles
    *                them). Without this column the emitted knobs could only
    *                overshoot to ceil(ratio).
    *
    * Keys absent from `targets` get target share 0 (drop). One hash
    * aggregate on the key plus a singleton total — the plan costs one
    * shuffle of |keys| rows regardless of corpus size; the knobs it emits
    * drive the map-side samplers, closing the measure → decide → act loop
    * for corpus mixing (`sourceReport`/`sketchStats` → mixturePlan →
    * weightedKeep/upsample).
    */
  def mixturePlan(df: DataFrame, keyCol: String, tokenCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    require(targets.values.forall(_ >= 0.0), s"target shares must be >= 0, got $targets")
    val target = targets.foldLeft(lit(0.0)) { case (acc, (k, share)) =>
      when(col(keyCol) === k, share).otherwise(acc)
    }
    val agg = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("tokens"),
        first(target).as("_target"))
    // corpus total as a 1-row aggregate + broadcast cross join, NOT an
    // empty-partition window: same |keys|-row cost, but no all-rows-to-one-
    // partition WindowExec (and no its warning); the aggregate's exchange
    // is reused between `agg` and the total, so the corpus scans once
    val total = agg.agg(sum(col("tokens")).as("_total"))
    agg.crossJoin(broadcast(total))
      .withColumn("natural_share", col("tokens") / col("_total"))
      .withColumn("ratio", round(col("_target") / col("natural_share"), 6))
      .select(col(keyCol), col("n_docs"), col("tokens"),
        round(col("natural_share"), 6).as("natural_share"),
        col("ratio"),
        least(lit(1.0), col("ratio")).as("keep_prob"),
        greatest(lit(0L), (ceil(col("ratio")) - 1).cast("long")).as("extra_epochs"),
        when(col("ratio") > 1 && col("ratio") =!= floor(col("ratio")),
          round(col("ratio") - floor(col("ratio")), 6))
          .otherwise(lit(1.0)).as("last_epoch_keep"))
  }

  /** Deterministic per-key upsampling for mixture targets that need MORE
    * than one epoch of a source (the counterpart of [[weightedKeep]], which
    * can only downsample): each row is repeated `factors(key)` times
    * (default 1; 0 drops the row) with an `epoch` column 0..n-1, so a
    * downstream tokenizer/packer sees distinct rows. Pure map-side row
    * generation — `posexplode(array_repeat(...))` multiplies rows inside
    * the scan projection with no shuffle and no rand(); the repeat count
    * for a row never changes across runs or engines.
    */
  def upsample(df: DataFrame, keyCol: String, factors: Map[String, Int]): DataFrame = {
    require(factors.values.forall(_ >= 0), s"factors must be >= 0, got $factors")
    val factor = factors.foldLeft(lit(1)) { case (acc, (k, n)) =>
      when(col(keyCol) === k, n).otherwise(acc)
    }
    df.select(col("*"), posexplode(array_repeat(lit(true), factor)))
      .withColumnRenamed("pos", "epoch")
      .drop("col")
  }

  /** Execute a [[mixturePlan]] — the actuator that turns the emitted knobs
    * into rows: every key's ratio is realized EXACTLY (to the knobs' 6dp
    * rounding) as `extra_epochs` full copies plus one fractional epoch.
    * Rows come out with an `epoch` column; epochs below `extra_epochs` are
    * complete copies, the last epoch keeps each row with its key's
    * fractional probability (`last_epoch_keep` for growing keys,
    * `keep_prob` for shrinking ones — a shrink key has zero full epochs,
    * so its only epoch IS the fractional one). The keep decision hashes
    * `id:epoch` with the same 4-hex-digit threshold rule as
    * [[weightedKeep]] — deterministic across runs, engines and retries,
    * and the epoch salt keeps the fractional epoch's subset independent of
    * any earlier [[weightedKeep]] pass over the same ids. Keys absent from
    * `plan` drop (target share 0), mirroring [[mixturePlan]].
    *
    * Pure map-side row generation: posexplode inside the projection, one
    * md5 per emitted row, no shuffle — the same scale shape as
    * [[upsample]] + [[weightedKeep]] it composes.
    *
    * `plan` maps key -> (keep_prob, extra_epochs, last_epoch_keep), i.e.
    * exactly the columns [[mixturePlan]] emits (collect its |keys| rows).
    */
  def applyMixture(df: DataFrame, idCol: String, keyCol: String,
      plan: Map[String, (Double, Long, Double)]): DataFrame = {
    require(plan.nonEmpty, "plan must not be empty")
    plan.foreach { case (k, (kp, ee, lk)) =>
      require(kp >= 0.0 && kp <= 1.0 && lk >= 0.0 && lk <= 1.0 && ee >= 0,
        s"invalid knobs for $k: keep_prob=$kp extra_epochs=$ee last_epoch_keep=$lk")
    }
    val sorted = plan.toSeq.sortBy(_._1)
    // total epochs per key: extra_epochs full + 1 fractional
    val nEpochs = sorted.foldLeft(lit(0)) { case (acc, (k, (_, ee, _))) =>
      when(col(keyCol) === k, (ee + 1).toInt).otherwise(acc)
    }
    val lastIdx = sorted.foldLeft(lit(-1)) { case (acc, (k, (_, ee, _))) =>
      when(col(keyCol) === k, ee.toInt).otherwise(acc)
    }
    // the fractional epoch's keep threshold: last_epoch_keep for growers,
    // keep_prob for shrinkers (their extra_epochs is 0, so the two rules
    // coincide on which column applies)
    val lastThreshold = sorted.foldLeft(lit(hexThreshold(0.0))) {
      case (acc, (k, (kp, ee, lk))) =>
        when(col(keyCol) === k, hexThreshold(if (ee > 0) lk else math.min(kp, lk))).otherwise(acc)
    }
    val exploded = df
      .select(col("*"), posexplode(array_repeat(lit(true), nEpochs)))
      .withColumnRenamed("pos", "epoch")
      .drop("col")
    val prefix = substring(
      md5(concat(col(idCol).cast("string"), lit(":"), col("epoch"))), 1, 4)
    exploded.filter(col("epoch") < lastIdx || prefix < lastThreshold)
  }

  /** Temperature-based mixture targets (the multilingual alpha-sampling of
    * mC4 / XLM-R: Raffel et al. 2020 §3.4.3, Conneau et al. 2020 —
    * target_share ∝ natural_share^alpha). alpha = 1 reproduces the natural
    * mix; alpha → 0 approaches uniform; the usual 0.3–0.7 range flattens
    * the head languages and boosts the tail without drowning it. Emits
    * (key, n_docs, tokens, natural_share, target_share) — the
    * `target_share` column IS the `targets` input of [[mixturePlan]], so
    * measure → temper → plan → act composes without a human step. Same
    * cost shape as mixturePlan: one key aggregate plus a singleton total,
    * a |keys|-row plan regardless of corpus size.
    */
  def temperatureTargets(df: DataFrame, keyCol: String, tokenCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    // both normalizers as 1-row aggregates + broadcast cross joins (see
    // mixturePlan) — the token total before the pow, the tempered total
    // after it; exchange reuse keeps the corpus scan single
    val base = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("tokens"))
    val total = base.agg(sum(col("tokens")).as("_tot"))
    val tempered = base.crossJoin(broadcast(total))
      .withColumn("natural_share", col("tokens") / col("_tot"))
      .withColumn("_t", pow(col("natural_share"), alpha))
    val temperedTotal = tempered.agg(sum(col("_t")).as("_ttot"))
    tempered.crossJoin(broadcast(temperedTotal))
      .select(col(keyCol), col("n_docs"), col("tokens"),
        round(col("natural_share"), 6).as("natural_share"),
        round(col("_t") / col("_ttot"), 6).as("target_share"))
  }

  /** Curriculum staging (Bengio et al. 2009, "Curriculum Learning"): assign
    * each row a `stage` 1..nStages by where its difficulty score falls
    * against global quantile boundaries, so a training loop can feed easy
    * documents first and hard ones later. Deliberately NOT `ntile`: an
    * equal-count ntile is a global-order window (every row through ONE
    * window partition — the plan that dies first at 100 TB). Instead the
    * nStages-1 boundaries come from one mergeable `approx_percentile`
    * aggregate (Greenwald-Khanna sketch, map-side partials), the collect is
    * bounded at nStages-1 doubles, and assignment is a pure map-side
    * when-chain — fully codegen'd, no shuffle beyond the one aggregate.
    *
    * Binning is `score > boundary` counting: equal scores always share a
    * stage, so per-stage score ranges never interleave (max of stage i <=
    * min of stage i+1 — the provable fact the oracled gate checks). Null
    * scores land in stage 1. Stages can be empty under heavy ties; counts
    * are near-equal only as far as the sketch accuracy allows — curriculum
    * needs monotone difficulty bands, not exact-equal bins.
    */
  def curriculumAssign(df: DataFrame, scoreCol: String, nStages: Int,
      accuracy: Int = 10000): DataFrame = {
    require(nStages >= 1, s"nStages must be >= 1, got $nStages")
    if (nStages == 1) return df.withColumn("stage", lit(1))
    val qs = (1 until nStages).map(i => i.toDouble / nStages)
    val bnds = df
      .agg(expr(s"approx_percentile(CAST($scoreCol AS DOUBLE), array(${qs.mkString(",")}), $accuracy)"))
      .head().getSeq[Any](0) match {
        case null => Seq.empty[Double] // empty input: no boundaries
        case s => s.map(_.asInstanceOf[Number].doubleValue())
      }
    val stage = bnds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col(scoreCol) > b, 1).otherwise(0)
    }
    df.withColumn("stage", stage)
  }

  /** Importance weights for target-aware data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling" — the
    * unigram-vocabulary variant): score every raw document by how much more
    * likely its words are under the TARGET distribution than under the raw
    * pool, `logweight(d) = sum_w n_dw * (ln p_t(w) - ln p_r(w))` with add-1
    * smoothing over the target vocabulary V. Words outside V contribute 0
    * (both distributions are only estimated on V; `n_invocab` exposes how
    * much of each document the score actually saw — a document with
    * n_invocab = 0 scores 0.0 by construction and stays in the output, the
    * lesson of oovReport's silent drop). p_r is estimated from the
    * V-restricted raw token counts, p_t from the target sample:
    * p_t(w) = (ct_w+1)/(Tt+|V|), p_r(w) = (cr_w+1)/(Tr+|V|).
    *
    * Scale: the target sample is curated and small by definition — its
    * vocabulary-sized count table broadcasts. The raw corpus is touched by
    * exactly two map-side-combinable aggregations ((doc, word) then doc) and
    * one broadcast join against the |V|-row log-ratio table; no raw-side
    * exchange carries anything wider than (doc_id, word, count). The
    * normalizer constants (Tt, Tr, |V|) are 1-row aggregates
    * crossJoin(broadcast(...))-ed in, the warning-free form
    * [[temperatureTargets]] uses. Output: (idCol, n_invocab, logweight
    * rounded to 4 — one rounding point per document keeps the cross-engine
    * libm ulp noise far below the grid).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def toks(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+
        explode(split(lower(trim(col(textCol))), "\\s+")).as("_w"): _*)
        .filter(col("_w") =!= "")
    // target vocabulary with counts; Tt and |V| as a 1-row aggregate
    val tCnt = toks(target).groupBy(col("_w")).agg(count(lit(1)).as("_ct"))
    val tTot = tCnt.agg(sum(col("_ct")).as("_tt"),
      count(lit(1)).as("_v"))
    // per-(doc, word) counts over raw; V-restricted via the broadcast join
    val dw = toks(raw, col(idCol)).groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).as("_ndw"))
      .join(broadcast(tCnt), "_w")
    // V-restricted raw word counts -> the |V|-row log-ratio table
    val rCnt = dw.groupBy(col("_w"))
      .agg(sum(col("_ndw")).as("_cr"), first(col("_ct")).as("_ct"))
    val rTot = rCnt.agg(sum(col("_cr")).as("_tr"))
    val lr = rCnt.crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("_w"),
        (log((col("_ct") + 1).cast("double") / (col("_tt") + col("_v"))) -
         log((col("_cr") + 1).cast("double") / (col("_tr") + col("_v"))))
          .as("_llr"))
    val scored = dw.join(broadcast(lr), "_w")
      .groupBy(col(idCol))
      .agg(sum(col("_ndw")).as("n_invocab"),
        sum(col("_ndw") * col("_llr")).as("_lw"))
    // every raw id stays in the report, OOV-only documents at 0.0
    raw.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_invocab"), lit(0L)).as("n_invocab"),
        round(coalesce(col("_lw"), lit(0.0)), 4).as("logweight"))
  }

  /** Top-k selection over [[dsirWeights]]: the k raw documents most
    * target-like by log importance weight (ties broken by id — the
    * deterministic analog of the paper's Gumbel resampling; emitting ranks
    * and ids only keeps the gate independent of float noise). Output:
    * (rank, idCol).
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    dsirWeights(raw, target, idCol, textCol)
      .orderBy(col("logweight").desc, col(idCol))
      .limit(k)
      // the global window ranks the ALREADY-limited k rows (TakeOrdered
      // upstream) — a singleton window over k rows, never the corpus
      .select(row_number().over(Window.orderBy(col("logweight").desc,
        col(idCol))).as("rank"), col(idCol))

  /** Deterministic uniform negative sampling (contrastive-training prep,
    * the random complement of [[Similarity.hardNegatives]]): for each
    * anchor, the `k` corpus ids ranked FIRST by md5(anchor || '|' || id) —
    * a fresh pseudorandom permutation per anchor, replayable by any engine
    * — after removing the anchor itself and its `exclude` pairs
    * (query_id, id): known positives, same-class rows, dup-cluster members.
    *
    * Scale: the ranking is per-anchor over the corpus id column only
    * (id-width rows, anchors broadcast); `sampleDenom > 1` pre-thins
    * candidates map-side to ids whose digest ≡ 0 (mod denom) — the
    * [[weightedKeep]] hex-threshold discipline — so the per-anchor sort
    * never sees more than ~|corpus|/denom rows. The exclusion is one
    * anti-join on pair keys.
    */
  def negativeSample(corpus: DataFrame, anchors: DataFrame, idCol: String,
      queryIdCol: String, k: Int, exclude: DataFrame,
      sampleDenom: Int = 1): DataFrame = {
    val cand = corpus.select(col(idCol).as("id"))
      .join(broadcast(anchors.select(col(queryIdCol).as("query_id"))))
      .withColumn("digest",
        md5(concat(col("query_id").cast("string"), lit("|"),
          col("id").cast("string"))))
      .filter(col("id") =!= col("query_id"))
    val thinned =
      if (sampleDenom <= 1) cand
      else cand.filter(
        (conv(substring(col("digest"), 1, 8), 16, 10).cast("long")
          % sampleDenom) === 0)
    val w = Window.partitionBy(col("query_id")).orderBy(col("digest"))
    thinned
      .join(exclude.select(col("query_id"), col("id")).distinct(),
        Seq("query_id", "id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("neg_rank"), col("id"))
  }
}

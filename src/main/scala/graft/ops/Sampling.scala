package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (no reference
  * counterpart; `df.sample()` is unsuitable at scale because it is
  * seed-AND-partitioning dependent — a repartition or retry changes the
  * sample).
  *
  * Both operators key the decision on a HASH of a stable id, so:
  *  - reproducible across runs, retries, partitionings, and engines;
  *  - consistent across tables — the same fraction of the same id space
  *    is selected everywhere, so samples of fact and dim JOIN correctly;
  *  - narrow (filter) or single-shuffle (per-group top-k), never a
  *    global sort.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`fraction` of rows, decided by `hash(salt, idCol)`.
    * Same id ⇒ same decision everywhere (consistent sampling).
    * The default hash is `xxhash64(salt, id)` (fastest); any
    * deterministic salted hash works — e.g.
    * `(s, c) => TextAnalysis.md5Hash60(concat_ws(":", s, c))` to make
    * the selection reproducible in an external SQL oracle.
    */
  def consistentSample(df: DataFrame, idCol: String, fraction: Double,
                       salt: String = "graft",
                       hash: (Column, Column) => Column = xxhash64(_, _)): DataFrame =
    df.filter(keepPredicate(col(idCol), fraction, salt, hash))

  /** The keep decision of [[consistentSample]] as a standalone boolean
    * Column — for callers that need the VERDICT rather than the filtered
    * frame (funnel reports, audit columns).
    */
  def keepPredicate(idCol: Column, fraction: Double,
                    salt: String = "graft",
                    hash: (Column, Column) => Column = xxhash64(_, _)): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    // round, not truncate: (0.000249 * 1e6).toLong == 248
    val cut = math.round(fraction * Buckets)
    pmod(hash(lit(salt), idCol), lit(Buckets)) < cut
  }

  /** At most `k` rows per group, chosen as the k smallest id-hashes —
    * a uniform without-replacement per-group sample (the
    * RefinedWeb-style per-domain cap) that is fully deterministic:
    * sorted by (hash, id), so even a hash collision breaks the same
    * way everywhere. Rides the bounded-heap aggregate
    * ([[Windows.topKPerGroupAgg]]): every map task reduces its slice
    * to ≤ k rows per group BEFORE the exchange, so the shuffle carries
    * O(groups·k) rows no matter how hot a domain is — no window, no
    * whole-group sort, no skew hazard.
    */
  def perGroupSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     k: Int, salt: String = "graft",
                     hash: (Column, Column) => Column =
                       xxhash64(_, _)): DataFrame = {
    require(k > 0, "k must be positive")
    val h = graft.util.Cols.fresh(df, "__h")
    // (hash, id) lead the heap's comparison struct: id is the unique
    // tiebreaker, the remaining payload never influences selection
    val payload = idCol +: df.columns.filterNot(c =>
      groupCols.contains(c) || c == idCol).toSeq
    Windows.topKPerGroupAgg(
        df.withColumn(h, hash(lit(salt), col(idCol))),
        groupCols.map(col), (h +: payload).map(col), k,
        rankCol = graft.util.Cols.fresh(df, "__rk"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** EXACTLY `n` rows (or all, if fewer), chosen as the n globally
    * smallest (hash, id) pairs — the deterministic spelling of "give
    * me a 10k-doc eval subset": [[consistentSample]] only hits a
    * fraction in expectation, this hits the count. Plans as
    * TakeOrderedAndProject ([[Windows.globalTopK]]): every partition
    * keeps an n-row heap and only n rows per partition reach the
    * driver-side merge — no global sort, no shuffle of the corpus.
    * Same-id rows keep the same fate under any partitioning, and a
    * larger n is a SUPERSET of a smaller one (nested samples, like
    * [[consistentSample]]'s nested fractions).
    */
  def sampleExact(df: DataFrame, idCol: String, n: Int,
                  salt: String = "graft",
                  hash: (Column, Column) => Column =
                    xxhash64(_, _)): DataFrame = {
    require(n > 0, "n must be positive")
    val h = graft.util.Cols.fresh(df, "__h")
    Windows.globalTopK(df.withColumn(h, hash(lit(salt), col(idCol))),
        Seq(col(h).asc, col(idCol).asc), n)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Deterministic weighted corpus mixing: sample each named source so
    * the union realizes the given RELATIVE weights, keeping as much data
    * as the weights allow. The bottleneck source (smallest count/weight
    * ratio) is kept whole; every other source is down-sampled to match —
    * the standard "mix to target proportions without upsampling" step of
    * a pretraining data recipe.
    *
    * Cost: one `count()` per source (cheap metadata-ish jobs), then a
    * narrow [[consistentSample]] filter per source and a union — no
    * shuffle at all. Selection is id-hash-keyed, so the realized mixture
    * is reproducible across runs, retries, partitionings, and engines
    * (the oracled harness query reproduces it in DuckDB bit-for-bit),
    * and re-mixing with different weights reuses maximal overlap of the
    * same ids.
    *
    * Realized proportions are exact up to hash-sampling noise
    * (±O(1/√n) per source) — acceptable by construction for corpus
    * recipes, and the price of a collect-free plan.
    *
    * Note on float determinism: per-source fractions are computed as
    * `weight * perUnit / count` in IEEE double left-to-right — mirror
    * the same expression order in any external reproduction.
    */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)], idCol: String,
                 salt: String = "graft",
                 hash: (Column, Column) => Column = xxhash64(_, _),
                 tagCol: String = "mix_source"): DataFrame = {
    require(sources.nonEmpty, "mixCorpora needs at least one source")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique (they salt the sampling hash)")
    sources.foreach { case (name, _, w) =>
      require(w > 0, s"weight for '$name' must be positive (drop the " +
        "source instead of zero-weighting it)")
    }
    val counted = sources.map { case (name, df, w) => (name, df, w, df.count()) }
    // an EMPTY source would make perUnit = min(count/weight) = 0 and
    // silently zero the ENTIRE mix — the recipe must fail loudly, the
    // same contract as the zero-weight refusal above
    counted.foreach { case (name, _, _, c) =>
      require(c > 0, s"source '$name' is empty — it would zero the " +
        "whole mix (perUnit = min over sources); drop the source " +
        "instead of passing an empty frame")
    }
    // docs-per-unit-weight the bottleneck source can supply
    val perUnit = counted.map { case (_, _, w, c) => c / w }.min
    counted.map { case (name, df, w, c) =>
      val fraction = math.min(w * perUnit / c, 1.0)
      consistentSample(df, idCol, fraction, s"$salt:$name", hash)
        .withColumn(tagCol, lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Deterministic train/val/test split: label every row with the name
    * of the slice its id-hash bucket falls in. Fractions must sum to 1
    * (within 1e-9); the last slice absorbs the rounding tail so every
    * row gets exactly one label — splits are disjoint and total BY
    * CONSTRUCTION, not by sampling luck.
    *
    * Same id ⇒ same split everywhere: across tables (doc features and
    * doc labels land on the same side), across runs/retries, and across
    * engines when given an externally-reproducible hash — which is what
    * makes the split auditable for leakage instead of trusted. A narrow
    * `withColumn`, no shuffle; filter on the label to materialize a side.
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "graft",
                  outCol: String = "split",
                  hash: (Column, Column) => Column = xxhash64(_, _)): DataFrame = {
    require(splits.size >= 2, "need at least two named slices")
    require(splits.map(_._1).distinct.size == splits.size,
      "slice names must be unique")
    splits.foreach { case (n, f) =>
      require(f > 0, s"fraction for '$n' must be positive") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * Buckets))
    val bucket = pmod(hash(lit(salt), col(idCol)), lit(Buckets))
    // first matching cumulative cut wins; the last slice is the default,
    // so bucket Buckets-1 is covered even if the cuts round low
    val label = splits.map(_._1).zip(cuts).init
      .foldRight(lit(splits.last._1): Column) {
        case ((name, cut), rest) => when(bucket < cut, lit(name)).otherwise(rest)
      }
    df.withColumn(outCol, label)
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws the deterministic uniform
    * `u = (hash_bucket + 0.5) / buckets ∈ (0,1)` from its id, and the
    * `n` rows with the SMALLEST `key = -ln(u) / weight` win — an
    * exponential race where rate = weight, so inclusion odds are
    * proportional to weight (the classic k-item weighted reservoir
    * semantics), yet fully reproducible across runs, retries,
    * partitionings, and engines. The top-n is Spark's
    * TakeOrderedAndProject (per-partition heads, driver merges n
    * rows) — never a one-partition window, so it holds at any corpus
    * size as long as `n` fits on the driver. This is the
    * quality-weighted selection step of a data recipe ("sample 10M
    * docs ∝ quality score") as a one-pass deterministic operator.
    *
    * Rows with non-positive weight are excluded (their inclusion odds
    * are zero in the limit; excluding beats emitting NaN keys). Ties
    * (astronomically unlikely on real weights) break on id ascending.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, salt: String = "graft",
                     hash: (Column, Column) => Column = xxhash64(_, _)): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (pmod(hash(lit(salt), col(idCol)), lit(Buckets)).cast("double")
      + 0.5) / Buckets
    val kc = graft.util.Cols.fresh(df, "__esk")
    Windows.globalTopK(
        df.filter(col(weightCol) > 0)
          .withColumn(kc, -log(u) / col(weightCol).cast("double")),
        Seq(col(kc).asc, col(idCol).asc), n)
      .drop(kc)
  }

  /** Per-group weighted sample: at most `k` rows per group under the
    * same exponential-race key. Rides the bounded-heap aggregate
    * ([[Windows.topKPerGroupAgg]]), NOT a group-partitioned window: the
    * shuffle carries at most k race keys per group per map task, and no
    * task ever sorts a whole group — "sample 1000 docs per language
    * ∝ quality" stays one cheap aggregate even when a language holds
    * billions of rows. Selection is identical to the window spelling
    * (same key, same id tiebreak), just cheaper.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String, k: Int,
                             salt: String = "graft",
                             hash: (Column, Column) => Column = xxhash64(_, _)): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (pmod(hash(lit(salt), col(idCol)), lit(Buckets)).cast("double")
      + 0.5) / Buckets
    val kc = graft.util.Cols.fresh(df, "__esk")
    val payload = df.columns.filterNot(c => c == idCol || groupCols.contains(c))
    Windows.topKPerGroupAgg(
        df.filter(col(weightCol) > 0)
          .withColumn(kc, -log(u) / col(weightCol).cast("double")),
        groupCols.map(col),
        Seq(col(kc).as(kc), col(idCol).as(idCol)) ++
          payload.map(c => col(c).as(c)),
        k, rankCol = graft.util.Cols.fresh(df.columns :+ kc, "__rk"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Stratified fractions per group: `fractions` maps group value (of a
    * single stratum column) to its keep-fraction; groups not in the map
    * keep `defaultFraction`. Decision is per-id hash as in
    * [[consistentSample]] — still a narrow filter.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = "graft",
                       hash: (Column, Column) => Column = xxhash64(_, _)): DataFrame =
    df.filter(stratifiedKeepPredicate(col(stratumCol), col(idCol),
      fractions, defaultFraction, salt, hash))

  /** [[keepPredicate]] with the per-stratum cut of [[stratifiedSample]]. */
  def stratifiedKeepPredicate(stratumCol: Column, idCol: Column,
                              fractions: Map[String, Double],
                              defaultFraction: Double = 0.0,
                              salt: String = "graft",
                              hash: (Column, Column) => Column =
                                xxhash64(_, _)): Column = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, "fractions must be in [0,1]"))
    val cutExpr = fractions.foldLeft(lit(math.round(defaultFraction * Buckets))) {
      case (acc, (value, f)) =>
        when(stratumCol === value, lit(math.round(f * Buckets))).otherwise(acc)
    }
    pmod(hash(lit(salt), idCol), lit(Buckets)) < cutExpr
  }

  /** Temperature-scaled corpus mixing (the T5/mT5 recipe, public):
    * sample each group at a rate proportional to `weight(n_g)` instead
    * of its raw size, flattening the head so small corpora
    * (low-resource languages, rare domains) are over-represented
    * relative to their byte share. With the default `sqrt` weight this
    * is temperature α = 0.5; `identity` degrades to plain uniform
    * sampling at `targetFraction`.
    *
    * Per group g of size n_g: share s_g = weight(n_g) / Σ weight(n),
    * desired count c_g = s_g · targetFraction · N, keep fraction
    * f_g = min(1, c_g / n_g) — capped, since hash sampling is
    * without-replacement. Selection is [[consistentSample]]'s hash
    * predicate with the per-group cut.
    *
    * Scale shape: one count aggregate (rows = groups), ONE sorted
    * in-order fold over the per-group weights for Σ weight — double
    * summation order pinned so the totals are bit-identical in any
    * engine (the [[graft.text.CorpusDivergence]] pattern; a plain
    * `sum` of doubles is partial-aggregation-order-dependent) — then a
    * broadcast join of the tiny cuts frame and a narrow filter. The
    * corpus is scanned twice (sizes + filter), shuffled never.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     targetFraction: Double,
                     weight: Column => Column = sqrt(_),
                     salt: String = "graft",
                     hash: (Column, Column) => Column =
                       xxhash64(_, _)): DataFrame = {
    require(targetFraction >= 0 && targetFraction <= 1,
      "targetFraction must be in [0,1]")
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val totals = sizes.agg(
      sum(col("__n")).as("__N"),
      aggregate(
        array_sort(collect_list(struct(col(groupCol).as("g"),
          col("__n").as("n")))),
        lit(0.0),
        (acc, x) => acc + weight(x.getField("n").cast("double"))).as("__W"))
    // alias both sides: totals descends from sizes, so an unqualified
    // __n resolves ambiguously through the self-join lineage
    val cuts = sizes.alias("s").crossJoin(broadcast(totals).alias("t"))
      .withColumn("__f", least(lit(1.0),
        weight(col("s.__n").cast("double")) / col("t.__W") *
          lit(targetFraction) * col("t.__N").cast("double") /
          col("s.__n").cast("double")))
      .select(col(s"s.$groupCol").as("__cg"),
        round(col("__f") * Buckets).cast("long").as("__cut"))
    // null-safe join: a null group is a group like any other (sizes
    // and cuts frames carry its row) — a plain equi-join would silently
    // DROP null-group rows instead of sampling them
    df.join(broadcast(cuts), col(groupCol) <=> col("__cg"))
      .filter(pmod(hash(lit(salt), col(idCol)), lit(Buckets)) < col("__cut"))
      .select(df.columns.map(col).toSeq: _*)
  }
}

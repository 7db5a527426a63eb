package graft.ml

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML column-preprocessing pipeline — the analog of the reference's
  * `TableCleaner` (`pyarrow_ops/ml.py:79-128`), re-expressed as a
  * fit-on-first-use model whose transform is a pure `select` of `Column`
  * expressions (no shuffle; fit is one agg / one distinct job per column).
  *
  * Parity contract (verified behaviors, SURVEY §2.2.8):
  *  - numeric: cast to double, impute nulls with the TRAIN mean/min/max,
  *    clip to the TRAIN [min,max] (`ml.py:29-57`);
  *  - label encode: given categories ⇒ value→index+1, unknown→0, null→0;
  *    output column keeps the original name (`ml.py:9-17`);
  *  - one-hot: one BOOLEAN column per category named `{col}_{cat}`,
  *    null row → all false; `drop_first` drops the first category
  *    (`ml.py:19-26`);
  *  - JSON round-trip with the reference's `to_dict` schema
  *    (`ml.py:36,65,83-93`): a list of
  *    `{"name","type":"numerical","impute","clip","v_min","v_mean","v_max"}` /
  *    `{"name","type":"categorical","method","categories"}` objects.
  *
  * ✚ Extension beyond the reference surface: per-column feature SCALING
  * (`registerNumeric(..., scale = "standard" | "minmax")`), applied after
  * impute+clip. Standard uses the population std derived from plain sums in
  * a fixed operation order ([[NumericalColumn.stdFromSums]]) so the learned
  * statistic — unlike built-in streaming `stddev` — is partition-order
  * independent and replayable by the SQL oracle; constant columns scale to
  * 0.0 under both modes. `scale`/`v_std` round-trip through to_dict JSON
  * but are written only when active, keeping unscaled dicts byte-compatible
  * with the reference.
  *
  * Documented divergences: learned categories are SORTED distinct non-null
  * (the reference uses nondeterministic first-appearance order and mutates
  * its category list with an 'Unknown' sentinel between cleans — a bug we
  * do not replicate in our own state, though `fromJson` HONORS the sentinel
  * when importing a reference-written dict); stats come from Spark
  * aggregates, which skip nulls like SQL (the reference's numpy path would
  * NaN-poison, SURVEY §2.2.3). Fit-learned category lists are capped at
  * [[TableCleaner.MaxCategories]] and label encoding switches from a
  * codegen'd `when`-chain to a broadcast lookup join past 64 categories —
  * both 100-TB guards with no behavior change.
  */
sealed trait CleanColumn {
  def name: String
  def measured: Boolean
  /** One fit job over the train DataFrame; returns the measured column. */
  def fit(df: DataFrame): CleanColumn
  /** Transform expressions (aliased output columns). */
  def exprs: Seq[Column]
}

final case class NumericalColumn(
    name: String,
    impute: String = "mean",
    clip: Boolean = true,
    scale: String = "none", // "none" | "standard" | "minmax" (✚ extension)
    vMin: Option[Double] = None,
    vMean: Option[Double] = None,
    vMax: Option[Double] = None,
    vStd: Option[Double] = None) extends CleanColumn {
  require(Seq("none", "standard", "minmax").contains(scale),
    s"scale must be none|standard|minmax, got $scale")

  def measured: Boolean = vMin.isDefined || vMean.isDefined || vMax.isDefined

  def fit(df: DataFrame): NumericalColumn = {
    val row = df.agg(
      avg(col(name).cast("double")).as("mean"),
      min(col(name).cast("double")).as("min"),
      max(col(name).cast("double")).as("max"),
      sum(col(name).cast("double")).as("sx"),
      sum(col(name).cast("double") * col(name).cast("double")).as("sx2"),
      count(col(name)).as("n")).head()
    copy(vMin = Some(row.getDouble(1)), vMean = Some(row.getDouble(0)),
      vMax = Some(row.getDouble(2)),
      vStd = Some(NumericalColumn.stdFromSums(
        row.getDouble(3), row.getDouble(4), row.getLong(5))))
  }

  private def imputeValue: Double = impute match {
    case "mean" => vMean.getOrElse(0.0)
    case "min"  => vMin.getOrElse(0.0)
    case "max"  => vMax.getOrElse(0.0)
    case other  => throw new IllegalArgumentException(s"$other is not a valid impute method")
  }

  def exprs: Seq[Column] = {
    val base = coalesce(col(name).cast("double"), lit(imputeValue))
    val clipped =
      if (clip) least(greatest(base, lit(vMin.getOrElse(0.0))), lit(vMax.getOrElse(0.0)))
      else base
    val out = scale match {
      case "none" => clipped
      case "standard" =>
        val s = vStd.getOrElse(0.0)
        if (s == 0.0) lit(0.0) // constant column: every value IS the mean
        else (clipped - lit(vMean.getOrElse(0.0))) / lit(s)
      case "minmax" =>
        val (lo, hi) = (vMin.getOrElse(0.0), vMax.getOrElse(0.0))
        if (hi == lo) lit(0.0)
        else (clipped - lit(lo)) / lit(hi - lo)
    }
    Seq(out.as(name))
  }
}

object NumericalColumn {
  /** Population std from plain sums, in a FIXED operation order —
    * sqrt((Σx² − Σx·Σx/n) / n) — so any engine replaying the same three
    * exact sums produces the bit-identical double (Spark's/DuckDB's
    * built-in `stddev` use streaming central-moment merges whose float
    * result depends on partition order — unusable under the oracle
    * contract). Exact whenever the sums are (integral-valued columns up to
    * 2^53, or cents-quantized inputs); max(0, ·) guards the tiny negative
    * residual rounding can leave on near-constant columns. */
  def stdFromSums(sx: Double, sx2: Double, n: Long): Double =
    if (n == 0L) 0.0 else math.sqrt(math.max(0.0, (sx2 - sx * sx / n) / n))
}

final case class CategoricalColumn(
    name: String,
    method: String, // "label" | "one_hot"
    categories: Seq[String] = Nil,
    dropFirst: Boolean = false) extends CleanColumn {

  def measured: Boolean = categories.nonEmpty

  /** Learned categories: sorted distinct non-null non-empty string values
    * (deterministic; divergence from the reference's appearance order).
    * Cardinality is capped at [[TableCleaner.MaxCategories]] — an unbounded
    * `distinct().collect()` on a high-cardinality column is a driver OOM at
    * 100 TB; a column that wide isn't a categorical feature, so failing
    * loudly beats silently materializing it (the `limit(cap+1)` bounds the
    * job's result before collection, not after). */
  def fit(df: DataFrame): CategoricalColumn = {
    val cap = TableCleaner.MaxCategories
    val cats = df.select(col(name).cast("string").as("v"))
      .filter(col("v").isNotNull && col("v") =!= "")
      .distinct().limit(cap + 1).collect().map(_.getString(0))
    if (cats.length > cap)
      throw new IllegalArgumentException(
        s"column '$name' has more than $cap distinct values - not a categorical " +
          "feature; register it as numeric, hash it, or raise TableCleaner.MaxCategories")
    copy(categories = cats.sorted.toSeq)
  }

  /** Label columns above this cardinality encode via a broadcast lookup
    * join in [[TableCleaner.cleanTable]] instead of the `when`-chain below —
    * a 10k-deep `CASE` expression is a giant-plan/codegen bomb, while a
    * broadcast hash join is O(1) per row at any cardinality. */
  private[ml] def usesLookupJoin: Boolean = method == "label" && categories.size > 64

  def exprs: Seq[Column] = method match {
    case "label" =>
      // value -> index+1, unknown -> 0, null -> 0; keeps the original name
      val c = col(name).cast("string")
      val encoded = categories.zipWithIndex.foldLeft(lit(0)) {
        case (acc, (cat, i)) => when(c === lit(cat), lit(i + 1)).otherwise(acc)
      }
      Seq(encoded.as(name))
    case "one_hot" =>
      val kept = if (dropFirst) categories.drop(1) else categories
      kept.map(cat =>
        coalesce(col(name).cast("string") === lit(cat), lit(false)).as(s"${name}_$cat"))
    case other =>
      throw new IllegalArgumentException(s"Unknown categorical method: $other")
  }
}

/** ✚ Extension: equal-frequency discretizer (the KBinsDiscretizer
  * `strategy="quantile"` analog; the reference has no binning). Fit learns
  * the nBins−1 interior boundaries as DISCRETE (type-1) quantiles of the
  * train column — boundary_j is the value at rank ⌈j·N/nBins⌉, an actual
  * data value selected by pure integer arithmetic, so the learned state is
  * engine-replayable like every other fit statistic here. Transform is
  * bin(x) = #{j : x > boundary_j} — a pure projection (the nBins−1
  * comparisons fold into one codegen'd expression; the `MaxBins` cap keeps
  * the when-chain far from giant-plan territory). Nulls map to bin −1 (an
  * explicit missing bucket, mirroring label-encode's reserved 0). TRAIN
  * decides the boundaries; a skewed test set bins by the train quantiles —
  * the fit/transform distinction that separates this from
  * [[graft.operators.Profile.equalFrequencyBins]], which ranks the dataset
  * against itself. Heavy ties can collapse adjacent bins (duplicate
  * boundaries → empty bins), the standard quantile-binning behavior. */
final case class BinnedColumn(
    name: String,
    nBins: Int,
    boundaries: Seq[Double] = Nil) extends CleanColumn {
  require(nBins > 1 && nBins <= TableCleaner.MaxBins,
    s"nBins must be in [2, ${TableCleaner.MaxBins}], got $nBins")

  def measured: Boolean = boundaries.nonEmpty

  /** One job over the per-VALUE count table (distinct-value cardinality,
    * not rows, bounds the state — same shape as
    * `Profile.equalFrequencyBins`), with the cumulative counts riding
    * `Ranks.runningSums` under a data-adaptive equi-width bucket
    * (`Ranks.withRangeBucket`): a continuous column whose distinct count
    * approaches the row count no longer serializes one task (r9 VERDICT
    * §wrong-1). Collects exactly nBins−1 boundary rows. All-null/empty
    * columns throw, like the numeric fit path. */
  def fit(df: DataFrame): BinnedColumn = {
    import graft.operators.Ranks
    val vc = df.filter(col(name).isNotNull)
      .groupBy(col(name).cast("double").as("__v")).agg(count(lit(1)).as("__n"))
    val tot = vc.agg(coalesce(sum(col("__n")), lit(0L)).as("__total"))
    val cum = Ranks.runningSums(Ranks.withRangeBucket(vc, "__v", "__b"),
        col("__b"), Seq(col("__v")), Seq("__n" -> "__cum"), inclusive = true)
      .crossJoin(broadcast(tot))
    // boundary_j = the value whose cumulative count first reaches rank
    // r_j = ⌈j·N/nBins⌉ = (j·N + nBins − 1) div nBins — integer-exact
    val r = expr(s"(__j * __total + ${nBins - 1}) div $nBins")
    val rows = cum.withColumn("__j", explode(sequence(lit(1), lit(nBins - 1))))
      .filter(col("__cum") >= r && (col("__cum") - col("__n")) < r)
      .select(col("__j").cast("int"), col("__v")).collect()
    if (rows.isEmpty)
      throw new IllegalArgumentException(
        s"column '$name' has no non-null values - cannot fit quantile bins")
    copy(boundaries = rows.sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq)
  }

  def exprs: Seq[Column] = {
    val x = col(name).cast("double")
    val bin = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(x > lit(b), lit(1)).otherwise(lit(0))
    }
    Seq(when(x.isNull, lit(-1)).otherwise(bin).as(name))
  }
}

final class TableCleaner {
  private[ml] val columns = ArrayBuffer.empty[CleanColumn]

  def registerNumeric(name: String, impute: String = "mean", clip: Boolean = true,
      scale: String = "none"): Unit =
    columns += NumericalColumn(name, impute, clip, scale)

  def registerLabel(name: String, categories: Seq[String] = Nil): Unit =
    columns += CategoricalColumn(name, "label", categories)

  def registerOneHot(name: String, categories: Seq[String] = Nil, dropFirst: Boolean = false): Unit =
    columns += CategoricalColumn(name, "one_hot", categories, dropFirst)

  def registerBinned(name: String, nBins: Int, boundaries: Seq[Double] = Nil): Unit =
    columns += BinnedColumn(name, nBins, boundaries)

  /** Fit any not-yet-measured column (fit-on-first-use, `ml.py:53-56,75-76`).
    * ALL unmeasured numeric columns share ONE aggregation scan (3 aggregates
    * per column in a single job) — at 100 TB a per-column scan of the train
    * table is the difference between 1 pass and #features passes.
    * Categorical columns still fit one (cardinality-bounded) distinct job
    * each; transforms are then shuffle-free. */
  def fit(df: DataFrame): Unit = {
    val numIdx = columns.indices.filter(i =>
      !columns(i).measured && columns(i).isInstanceOf[NumericalColumn])
    if (numIdx.nonEmpty) {
      val aggs = numIdx.flatMap { i =>
        val n = columns(i).name
        Seq(avg(col(n).cast("double")).as(s"__mean_$i"),
          min(col(n).cast("double")).as(s"__min_$i"),
          max(col(n).cast("double")).as(s"__max_$i"),
          sum(col(n).cast("double")).as(s"__sx_$i"),
          sum(col(n).cast("double") * col(n).cast("double")).as(s"__sx2_$i"),
          count(col(n)).as(s"__n_$i"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      numIdx.zipWithIndex.foreach { case (i, k) =>
        val nc = columns(i).asInstanceOf[NumericalColumn]
        // getDouble throws on null (all-null column) — same caller-error
        // surfacing as the per-column fit path (EdgeCasesSpec pins it)
        columns(i) = nc.copy(
          vMean = Some(row.getDouble(6 * k)),
          vMin = Some(row.getDouble(6 * k + 1)),
          vMax = Some(row.getDouble(6 * k + 2)),
          vStd = Some(NumericalColumn.stdFromSums(
            row.getDouble(6 * k + 3), row.getDouble(6 * k + 4), row.getLong(6 * k + 5))))
      }
    }
    columns.indices.foreach { i =>
      if (!columns(i).measured) columns(i) = columns(i).fit(df)
    }
  }

  /** Transformed feature table: the registered columns in registration order
    * (`ml.py:112-121`). A pure projection, except label columns past the
    * `when`-chain cardinality bound, which encode via a broadcast lookup
    * join (tiny code table built driver-side from the learned categories —
    * it is the broadcast the executors need either way). */
  def cleanTable(df: DataFrame): DataFrame = {
    fit(df)
    project(df)
  }

  private def project(df: DataFrame): DataFrame = {
    val joined = columns.foldLeft(df) {
      case (cur, c: CategoricalColumn) if c.usesLookupJoin =>
        import df.sparkSession.implicits._
        val enc = c.categories.zipWithIndex.map { case (v, i) => (v, i + 1) }
          .toDF(s"__cat_${c.name}", s"__code_${c.name}")
        cur.join(broadcast(enc),
          cur(c.name).cast("string") === enc(s"__cat_${c.name}"), "left")
      case (cur, _) => cur
    }
    joined.select(columns.flatMap {
      case c: CategoricalColumn if c.usesLookupJoin =>
        Seq(coalesce(col(s"__code_${c.name}"), lit(0)).as(c.name))
      case c => c.exprs
    }.toSeq: _*)
  }

  /** `clean_table(table, label)` — features plus the raw label column. */
  def cleanTable(df: DataFrame, label: String): (DataFrame, DataFrame) = {
    fit(df)
    (project(df), df.select(label))
  }

  /** Random train/test split (`ml.py:123-128`) — seeded for determinism,
    * unlike the reference. */
  def split(df: DataFrame, testSize: Double = 0.2, seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
    (train, test)
  }

  /** Reference `split(X, y)` parity (`ml.py:123-128`): the SAME seeded row
    * mask drives both the feature and the label side, so (X_train, y_train)
    * stay row-paired — achieved by splitting the source frame once and
    * projecting features/label from each half (two projections of one
    * deterministic split, not two independent samples). */
  def splitXy(df: DataFrame, label: String, testSize: Double = 0.2, seed: Long = 42L)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    fit(df)
    val Array(tr, te) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
    (project(tr), project(te), tr.select(label), te.select(label))
  }

  /** GROUP-ATOMIC [[splitXy]] — the leakage-safe upgrade of the
    * reference's random split (`ml.py:123-128`): rows sharing `groupCol`
    * (a user id, a [[graft.operators.Dedup.connectedComponents]] dedup
    * label) land wholly in train or test, so correlated rows can never
    * straddle the boundary and inflate eval scores — GroupKFold's k=1
    * analog, via [[graft.operators.Ops.splitByGroupHash]]'s engine-stable
    * hash cuts (deterministic without a seed: the assignment is a pure
    * function of the group key). X/y stay row-paired exactly as in
    * [[splitXy]]: one split of the source frame, two projections.
    *
    * Cleaner statistics (imputation means, clip bounds, bin edges,
    * category vocabularies) are fitted on the TRAIN slice only (ADVICE
    * r12: fitting on the full frame leaked test-row statistics into
    * preprocessing even when no row straddled) — unlike [[splitXy]],
    * which keeps the reference's whole-table fit (`ml.py` clean_table →
    * split order) for parity. Fit-on-first-use still applies: columns the
    * caller already measured (or provided categories for) keep them. */
  def splitXyByGroup(df: DataFrame, label: String, groupCol: String,
      testSize: Double = 0.2)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(testSize > 0.0 && testSize < 1.0, "testSize must be in (0, 1)")
    val cut = graft.operators.Ops.splitByGroupHash(df, groupCol,
      Seq("train" -> (1.0 - testSize), "test" -> 1.0))
    val tr = cut.filter(col("split") === "train").drop("split")
    val te = cut.filter(col("split") === "test").drop("split")
    fit(tr)
    (project(tr), project(te), tr.select(label), te.select(label))
  }

  /** TEMPORAL [[splitXy]] (r14 ✚, VERDICT r13 missing #2) — train on the
    * past, evaluate on the future: rows with `tsCol` (µs long or castable
    * timestamp) strictly before `cutoffUs` are train, at/after (and null
    * ts) are test, via [[graft.operators.Ops.splitByTime]] — the leakage
    * axis group hashing cannot cover (a model fitted on future rows of
    * the SAME user still peeked). X/y stay row-paired exactly as in
    * [[splitXy]]: one split of the source frame, two projections.
    *
    * Cleaner statistics are fitted on the TRAIN slice only (the
    * [[splitXyByGroup]] r12 rule) — here that is the whole point: an
    * imputation mean or clip bound computed over future rows IS temporal
    * leakage, even when no row straddles. Fit-on-first-use still applies:
    * caller-measured columns keep their stats. */
  def splitXyByTime(df: DataFrame, label: String, tsCol: String,
      cutoffUs: Long): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val cut = graft.operators.Ops.splitByTime(df, tsCol,
      Seq("train" -> cutoffUs), tailName = "test")
    val tr = cut.filter(col("split") === "train").drop("split")
    val te = cut.filter(col("split") === "test").drop("split")
    fit(tr)
    (project(tr), project(te), tr.select(label), te.select(label))
  }

  /** Rolling-origin (expanding-window) temporal cross-validation (r14 ✚)
    * — [[splitXyByTime]] generalized to the time-series CV norm: for
    * strictly-increasing `cutoffsUs` of length k ≥ 2, element f of the
    * returned sequence (f = 0..k−2) is (X_train, X_test, y_train, y_test)
    * with train = rows STRICTLY before cutoffs(f) and test = rows in
    * [cutoffs(f), cutoffs(f+1)) — each evaluation window is scored by a
    * model that saw only its past, and windows never overlap. Null-ts
    * rows appear in no fold (they postdate every boundary under the
    * [[graft.operators.Ops.splitByTime]] null contract and are excluded
    * from the bounded test windows).
    *
    * Cleaner statistics are fitted FRESH on each fold's train slice (the
    * [[foldXyByGroup]] per-fold template restore), so fold f's imputation
    * means never see fold f's own test window — the temporal leakage rule
    * applied per origin. The returned frames are self-contained
    * projections; the cleaner is left fitted on the LAST fold's train. */
  def foldXyByTime(df: DataFrame, label: String, tsCol: String,
      cutoffsUs: Seq[Long]): Seq[(DataFrame, DataFrame, DataFrame, DataFrame)] = {
    require(cutoffsUs.length >= 2, "need at least 2 cutoffs (1 fold)")
    require(cutoffsUs == cutoffsUs.sorted.distinct,
      "cutoffs must be strictly increasing")
    val t = col(tsCol).cast("long")
    val templates = columns.toList
    cutoffsUs.sliding(2).toSeq.map { case Seq(lo, hi) =>
      columns.clear()
      columns ++= templates
      val tr = df.filter(t < lo)
      val te = df.filter(t >= lo && t < hi)
      fit(tr)
      (project(tr), project(te), tr.select(label), te.select(label))
    }
  }

  /** Leave-one-fold-out cross-validation splits — [[splitXyByGroup]]
    * generalized to k folds (VERDICT r12 missing #2) on
    * [[graft.operators.Ops.foldByGroupHash]]'s group-atomic fold labels:
    * element f of the returned sequence is (X_train, X_test, y_train,
    * y_test) with test = fold f and train = the other k−1 folds, so rows
    * sharing `groupCol` (near-dup components, users) never appear on both
    * sides of ANY fold's boundary. Unmeasured cleaner statistics are
    * fitted FRESH on each fold's train slice ([[splitXyByGroup]]'s
    * leakage rule applied per fold: the pre-call column state is restored
    * before every fold's fit, so fold 1's learned means never leak into
    * fold 2's transform — while caller-PROVIDED categories/boundaries stay
    * fixed across folds, the fit-on-first-use contract). The returned
    * frames are self-contained (projections capture the fitted stats as
    * literals); the cleaner object itself is left fitted on the last
    * fold's train slice. The fold assignment is a pure function of the
    * group key: folds are stable across runs, engines, corpus growth. */
  def foldXyByGroup(df: DataFrame, label: String, groupCol: String, k: Int)
      : Seq[(DataFrame, DataFrame, DataFrame, DataFrame)] = {
    val folded = graft.operators.Ops.foldByGroupHash(df, groupCol, k)
    val templates = columns.toList
    (0 until k).map { f =>
      columns.clear()
      columns ++= templates
      val tr = folded.filter(col("fold") =!= f.toLong).drop("fold")
      val te = folded.filter(col("fold") === f.toLong).drop("fold")
      fit(tr)
      (project(tr), project(te), tr.select(label), te.select(label))
    }
  }

  /** JSON in the reference `to_dict` schema (`ml.py:83-93`). */
  def toJson: String = {
    val m = new ObjectMapper()
    val arr = m.createArrayNode()
    columns.foreach {
      case n: NumericalColumn =>
        val o = arr.addObject()
        o.put("name", n.name).put("type", "numerical").put("impute", n.impute)
          .put("clip", n.clip)
        // scale/v_std are our extension; written only when active so an
        // unscaled dict stays byte-compatible with the reference's to_dict
        // shape (its from_dict(**column) rejects unknown keys)
        if (n.scale != "none") {
          o.put("scale", n.scale)
          o.put("v_std", n.vStd.getOrElse(0.0))
        }
        o.put("v_min", n.vMin.getOrElse(0.0))
        o.put("v_mean", n.vMean.getOrElse(0.0))
        o.put("v_max", n.vMax.getOrElse(0.0))
      case b: BinnedColumn =>
        // "binned" is our extension type — reference-written dicts never
        // contain it, and a dict carrying it is (intentionally) rejected by
        // the reference's from_dict rather than silently misread
        val o = arr.addObject()
        o.put("name", b.name).put("type", "binned").put("n_bins", b.nBins)
        val bs = o.putArray("boundaries")
        b.boundaries.foreach(bs.add)
      case c: CategoricalColumn =>
        val o = arr.addObject()
        o.put("name", c.name).put("type", "categorical").put("method", c.method)
        // drop_first is our extension; written only when set so that a
        // dropFirst=false dict stays byte-compatible with the reference's
        // to_dict shape (its from_dict(**column) rejects unknown keys)
        if (c.dropFirst) o.put("drop_first", true)
        val cats = o.putArray("categories")
        // label dicts carry the reference's 'Unknown' sentinel at [0]
        // (`ml.py:17`: categories = ['Unknown'] + dic) so the JSON is
        // byte-compatible with a reference-written dict AND round-trips
        // exactly through our own fromJson (which strips the head) — even
        // when a LEARNED category is the literal string "Unknown"
        if (c.method == "label") cats.add("Unknown")
        c.categories.foreach(cats.add)
    }
    m.writeValueAsString(arr)
  }
}

object TableCleaner {
  /** Cardinality cap for fit-learned categories (driver-memory guard);
    * raise deliberately if a genuinely wide categorical is intended. */
  @volatile var MaxCategories: Int = 65536

  /** Bin-count cap for [[BinnedColumn]] (keeps the transform's comparison
    * chain a small codegen'd expression; 256 bins is already far past any
    * sensible discretization). */
  val MaxBins: Int = 256

  def fromJson(json: String): TableCleaner = {
    val m = new ObjectMapper()
    val root = m.readTree(json).asInstanceOf[ArrayNode]
    val cleaner = new TableCleaner
    (0 until root.size()).map(root.get).foreach { node =>
      node.get("type").asText() match {
        case "numerical" =>
          cleaner.columns += NumericalColumn(
            node.get("name").asText(),
            node.get("impute").asText(),
            node.get("clip").asBoolean(),
            Option(node.get("scale")).map(_.asText()).getOrElse("none"),
            Some(node.get("v_min").asDouble()),
            Some(node.get("v_mean").asDouble()),
            Some(node.get("v_max").asDouble()),
            Option(node.get("v_std")).map(n => Some(n.asDouble())).getOrElse(None))
        case "binned" =>
          val bNode = node.get("boundaries").asInstanceOf[ArrayNode]
          cleaner.columns += BinnedColumn(
            node.get("name").asText(),
            node.get("n_bins").asInt(),
            (0 until bNode.size()).map(bNode.get(_).asDouble()))
        case "categorical" =>
          val catsNode = node.get("categories").asInstanceOf[ArrayNode]
          val method = node.get("method").asText()
          val raw = (0 until catsNode.size()).map(catsNode.get(_).asText())
          // A label dict — reference-written (`ml.py:17`: categories =
          // ['Unknown'] + dic, where code i+1 = dic[i]) or our own toJson —
          // always carries the 'Unknown' sentinel at [0]: drop the head so
          // position i maps to code i exactly as when the dict was
          // exported. toJson writes the sentinel unconditionally, so a
          // genuine learned "Unknown" category (position 1+) survives the
          // round-trip. FORMAT NOTE: exports from toJson versions that
          // predate the sentinel (pre round-3) wrote the bare learned list;
          // such a dict whose FIRST learned category happens to be the
          // literal "Unknown" is indistinguishable from a sentinel-carrying
          // one and loses its head here — re-export with the current toJson
          // (the sentinel shape is also what the reference emits, so there
          // is no marker field that could disambiguate without breaking
          // reference from_dict compatibility).
          val cats =
            if (method == "label" && raw.headOption.contains("Unknown")) raw.drop(1)
            else raw
          val dropFirst = Option(node.get("drop_first")).exists(_.asBoolean())
          cleaner.columns += CategoricalColumn(
            node.get("name").asText(), method, cats, dropFirst)
        case other => throw new IllegalArgumentException(s"Unknown column type: $other")
      }
    }
    cleaner
  }

  /** Hashing-trick categorical encoder — the STATELESS scale path where
    * [[CategoricalColumn]]'s label/one-hot encoders need a fitted (and
    * capped) vocabulary: each feature (a single column, or a CROSS of
    * columns — the classic "lang×source" interaction) maps to
    * `md5(values joined by '|') mod dim`, a pure per-row function. No fit
    * pass, no vocabulary table to broadcast or persist, no cap — new
    * categories at serving time land in a bucket instead of exploding the
    * schema; the price is hash collisions, bounded by dim (Weinberger
    * 2009). Any null component nulls the feature (SQL semantics, matching
    * `concat`'s null propagation — never a silent collision between
    * ("a", null) and ("a",)). Output: input columns + one
    * `<prefix><cols joined by '_'>` LongType bucket per feature.
    *
    * Scale shape: stateless projection inside WholeStageCodegen —
    * md5-based (engine-portable, the [[graft.operators.Ops.sampleByHash]]
    * determinism contract), so any SQL engine replays the exact buckets. */
  def hashFeatures(df: DataFrame, features: Seq[Seq[String]], dim: Int,
      prefix: String = "hx_"): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(features.nonEmpty && features.forall(_.nonEmpty),
      "each feature needs at least one column")
    features.foldLeft(df) { (d, cols) =>
      val joined = concat(cols.flatMap(c =>
        Seq(col(c).cast("string"), lit("|"))).dropRight(1): _*)
      d.withColumn(prefix + cols.mkString("_"),
        pmod(conv(substring(md5(joined), 1, 15), 16, 10).cast("long"),
          lit(dim.toLong)))
    }
  }
}

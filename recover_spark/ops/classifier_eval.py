"""Classifier-evaluation metrics: per-group ROC-AUC, reliability
bins, and calibration summaries (Brier score + expected calibration
error).

The training-data pipeline trains a quality classifier
(``ops/classifier.py``) and scores documents with it, but until now
nothing measured the classifier itself — the evaluation half that
``ops/retrieval.rank_metrics`` provides for retrieval was missing for
classification.  These operators close that gap.

Reference parity: the reference repo's pipeline ships validation
summaries per dataset (run_great_expectations_on_parquet.py drives
pass/fail checks); classifier evaluation is an extension-surface
capability in the same measure-the-output spirit, not a port.

Scale shapes (the 100 TB contract):

- ``roc_auc_by_group`` is a rank statistic over scores, i.e. the
  per-group ordered-window hazard.  It reuses the bucket-decomposed
  rank machinery from ``gini_by_group`` / ``weighted_quantiles``: the
  fact first COLLAPSES to the (group, distinct-score) grain (one
  shuffle with map-side combine, and ties — the midrank headache —
  disappear into the grain), then cumulative negative counts decompose
  over approx-quantile score buckets: ONE (group, bucket) window plus
  aggregate-sized offset folds.  No per-group single-reducer sort ever
  touches fact-sized data.
- ``reliability_bins`` / ``calibration_summary`` are ONE conditional
  mergeable aggregate each (bin = clamped floor(score*B) is a map-side
  expression), so they are skew-immune by map-side partials.

Everything stays JVM-side — no Python UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from recover_spark.functions.transforms import bucket_chain


def _bernoulli(label_col: Column | str, what: str) -> Column:
    """0/1-validated double label — non-Bernoulli values raise at
    execution time rather than silently skewing counts (the
    prop_ztest guard)."""
    raw = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("double")
    return F.when(raw.isNull() | raw.isin(0.0, 1.0), raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{what}: label_col must be boolean/0-1, got "),
                raw.cast("string"),
            )
        )
    )


def roc_auc_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: Column | str,
    buckets: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group ROC-AUC of a score against a binary label, exact
    including ties (the Mann-Whitney U / midrank convention).

    Identity: over the distinct-score grain with per-score positive
    and negative counts (pos_c, neg_c) ordered by score ascending,

        AUC = sum( pos_c * (cum_neg_below + 0.5 * neg_c) ) / (P * N)

    — each positive beats every lower-scored negative, half-beats each
    tied negative.  Collapsing to distinct scores FIRST makes the tie
    handling exact by construction and shrinks the windowed frame to
    the score vocabulary.

    Engine shape: one (group, score) aggregate over the fact, then the
    ``gini_by_group`` bucket decomposition for the cumulative negative
    count — approx-quantile score buckets, ONE (group, bucket) window,
    bucket offsets folded on the aggregate-sized frame behind a lazy
    ``localCheckpoint`` pin (the aggregate-diamond lesson) and joined
    back as broadcasts.  The bucket column is materialized behind the
    Generate barrier so its O(buckets) CASE chain never becomes a join
    key expression (the round-9 weighted-quantiles postmortem).

    NULL scores / labels are excluded (family convention).  Degenerate
    groups (no positives or no negatives) yield NULL auc via
    ``try_divide``.  Labels must be boolean/0-1; anything else raises.
    """
    group_cols = list(group_cols)
    lab = _bernoulli(label_col, "roc_auc_by_group")
    nn = df.filter(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(
        *group_cols,
        F.col(score_col).cast("double").alias("__s"),
        lab.alias("__y"),
    )
    grain = nn.groupBy(*group_cols, "__s").agg(
        F.sum("__y").alias("__pos"),
        F.sum(F.lit(1.0) - F.col("__y")).alias("__neg"),
    )

    from recover_spark.functions.transforms import materialize_columns

    # runs a Spark job at CALL time: the grain is pinned lazily and
    # approxQuantile's action materializes it, so the quantile pass
    # and the downstream window share one grain aggregation
    grain = grain.localCheckpoint(eager=False)
    probs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(grain.stat.approxQuantile("__s", probs, 0.001)))
    bucket = bucket_chain("__s", bounds)
    staged = materialize_columns(grain, {"__bucket": bucket})

    w = (
        Window.partitionBy(*group_cols, "__bucket")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = staged.withColumn(
        "__cnb_local", F.coalesce(F.sum("__neg").over(w), F.lit(0.0))
    )
    # bucket negative totals derived from the windowed subtree (last
    # row's inclusive cumulative IS the total), pinned: two consumers
    per_bucket = (
        local.groupBy(*group_cols, "__bucket")
        .agg(F.max(F.col("__cnb_local") + F.col("__neg")).alias("__bn"))
        .localCheckpoint(eager=False)
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0.0))
    )
    scored = local.join(
        F.broadcast(offsets.select(*group_cols, "__bucket", "__off")),
        [*group_cols, "__bucket"],
    )
    contrib = F.col("__pos") * (
        F.col("__off") + F.col("__cnb_local") + F.lit(0.5) * F.col("__neg")
    )
    out = scored.groupBy(*group_cols).agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum(contrib).alias("__u"),
    )
    auc = F.try_divide(
        F.col("__u"),
        F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
    )
    return out.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.round(auc + F.lit(1e-9), round_digits).alias("auc"),
    )


def average_precision_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: Column | str,
    buckets: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group average precision (area under the precision-recall
    curve) with the TIE-BLOCK convention: documents sharing a score
    are retrieved together as one block, and every positive in the
    block contributes the precision AT THE BLOCK'S END —

        AP = sum over distinct scores s (descending) of
             pos_c(s) * ( cum_pos_incl(s) / cum_n_incl(s) ) / P.

    This is the deterministic tie handling (no permutation of tied
    rows can change it), matching how a ranked system actually serves
    ties; it differs from scikit-learn's step interpolation only
    WITHIN tie blocks.  AP complements :func:`roc_auc_by_group` where
    positives are rare — AUC barely moves when the top of the ranking
    degrades, AP collapses.

    Engine shape: identical to AUC — collapse to the (group,
    distinct-score) grain, then bucket-decompose the DESCENDING
    cumulative positive/total counts over approx-quantile score
    buckets: ONE (group, bucket) window, aggregate-sized offset folds
    behind the checkpoint pin, broadcast join-back.  NULLs excluded;
    groups with no positives yield NULL via ``try_divide``; labels
    must be boolean/0-1.
    """
    group_cols = list(group_cols)
    lab = _bernoulli(label_col, "average_precision_by_group")
    nn = df.filter(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(
        *group_cols,
        F.col(score_col).cast("double").alias("__s"),
        lab.alias("__y"),
    )
    grain = nn.groupBy(*group_cols, "__s").agg(
        F.sum("__y").alias("__pos"),
        F.count(F.lit(1)).cast("double").alias("__cnt"),
    )

    from recover_spark.functions.transforms import materialize_columns

    # call-time Spark job; lazy pin shared with downstream (see
    # roc_auc_by_group)
    grain = grain.localCheckpoint(eager=False)
    probs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(grain.stat.approxQuantile("__s", probs, 0.001)))
    # bucket 0 holds the HIGHEST scores so the bucket order follows
    # the descending retrieval order
    bucket = bucket_chain("__s", bounds, op="<=")
    staged = materialize_columns(grain, {"__bucket": bucket})

    w = (
        Window.partitionBy(*group_cols, "__bucket")
        .orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = staged.withColumn(
        "__cp_local", F.sum("__pos").over(w)
    ).withColumn("__cn_local", F.sum("__cnt").over(w))
    per_bucket = (
        local.groupBy(*group_cols, "__bucket")
        .agg(
            F.max("__cp_local").alias("__bp"),
            F.max("__cn_local").alias("__bn"),
        )
        .localCheckpoint(eager=False)
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        *group_cols,
        "__bucket",
        F.coalesce(F.sum("__bp").over(w_off), F.lit(0.0)).alias("__offp"),
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0.0)).alias("__offn"),
    )
    scored = local.join(F.broadcast(offsets), [*group_cols, "__bucket"])
    prec = (F.col("__offp") + F.col("__cp_local")) / (
        F.col("__offn") + F.col("__cn_local")
    )
    out = scored.groupBy(*group_cols).agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__cnt").cast("long").alias("n"),
        F.sum(F.col("__pos") * prec).alias("__ap_num"),
    )
    ap = F.try_divide(F.col("__ap_num"), F.col("n_pos").cast("double"))
    return out.select(
        *group_cols,
        "n",
        "n_pos",
        F.round(ap + F.lit(1e-9), round_digits).alias("avg_precision"),
    )


def _binned(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: Column | str,
    bins: int,
    what: str,
) -> DataFrame:
    """(group, bin)-grain sums shared by the calibration lenses.

    Scores must live in [0, 1] — a calibrated probability; out-of-range
    scores raise rather than silently folding into the edge bins.
    """
    if bins < 1:
        raise ValueError(f"{what}: bins must be >= 1, got {bins}")
    group_cols = list(group_cols)
    lab = _bernoulli(label_col, what)
    s = F.col(score_col).cast("double")
    s_ok = F.when((s >= 0.0) & (s <= 1.0), s).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{what}: score must be in [0, 1], got "),
                s.cast("string"),
            )
        )
    )
    nn = df.filter(s.isNotNull() & lab.isNotNull()).select(
        *group_cols, s_ok.alias("__s"), lab.alias("__y")
    )
    # clamp score == 1.0 into the top bin
    bin_c = F.least(
        F.floor(F.col("__s") * F.lit(float(bins))).cast("int"),
        F.lit(bins - 1),
    )
    return nn.groupBy(*group_cols, bin_c.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bin"),
        F.sum("__s").alias("__ss"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__s") - F.col("__y")) ** 2).alias("__sq"),
    )


def fold_reliability(
    binned: DataFrame,
    group_cols: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """Reliability diagram from a (group, bin) sums frame — shared by
    the batch operator and the streaming matview's read side (the
    bin sums are mergeable, so the same fold serves both)."""
    group_cols = list(group_cols)
    return binned.select(
        *group_cols,
        "bin",
        "n_bin",
        F.round(
            F.col("__ss") / F.col("n_bin") + F.lit(1e-9), round_digits
        ).alias("confidence"),
        F.round(
            F.col("__sy") / F.col("n_bin") + F.lit(1e-9), round_digits
        ).alias("accuracy"),
    ).orderBy(*group_cols, "bin")


def fold_calibration_summary(
    binned: DataFrame,
    group_cols: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """Calibration scalars (brier/ece/base_rate) from a (group, bin)
    sums frame — the bins-sized fold shared by batch and stream."""
    group_cols = list(group_cols)
    gap = F.abs(
        F.col("__ss") / F.col("n_bin") - F.col("__sy") / F.col("n_bin")
    )
    out = binned.groupBy(*group_cols).agg(
        F.sum("n_bin").cast("long").alias("n"),
        F.sum("__sq").alias("__sqt"),
        F.sum(F.col("n_bin") * gap).alias("__et"),
        F.sum("__sy").alias("__syt"),
    )
    return out.select(
        *group_cols,
        "n",
        F.round(
            F.col("__sqt") / F.col("n") + F.lit(1e-9), round_digits
        ).alias("brier"),
        F.round(
            F.col("__et") / F.col("n") + F.lit(1e-9), round_digits
        ).alias("ece"),
        F.round(
            F.col("__syt") / F.col("n") + F.lit(1e-9), round_digits
        ).alias("base_rate"),
    )


def reliability_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: Column | str,
    bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group reliability diagram: for each of ``bins`` uniform
    score bins, the mean predicted score (confidence) vs the observed
    positive rate (accuracy) — a well-calibrated classifier has
    confidence == accuracy in every bin.

    ONE mergeable (group, bin) aggregate over the fact; empty bins are
    simply absent (the diagram's convention).  Confidence and accuracy
    are ratios of a bin's sums, so their magnitudes stay in [0, 1] at
    any scale (the sum-magnitude hashing rule holds by construction).
    """
    b = _binned(df, group_cols, score_col, label_col, bins,
                "reliability_bins")
    return fold_reliability(b, group_cols, round_digits)


def calibration_summary(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: Column | str,
    bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group calibration scalars:

    - ``brier``: mean squared error between score and outcome — the
      proper scoring rule (decomposes into calibration + refinement).
    - ``ece``: expected calibration error, sum over bins of
      (n_bin / n) * |confidence - accuracy| — the reliability diagram
      folded to one number.
    - ``base_rate``: the positive rate (the trivial-predictor floor).

    Engine shape: the same ONE (group, bin) aggregate as
    :func:`reliability_bins`, then a bins-sized group fold — nothing
    downstream of the first aggregate exceeds group x bins rows.
    """
    b = _binned(df, group_cols, score_col, label_col, bins,
                "calibration_summary")
    return fold_calibration_summary(b, group_cols, round_digits)


def isotonic_calibration_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group isotonic regression calibration via pool-adjacent-
    violators (Ayer et al. 1955; Zadrozny & Elkan KDD-02) — THE
    non-parametric calibration fitter: the unique non-decreasing step
    function minimizing squared error of predicted-vs-observed rates,
    where the reliability/ECE readouts in this module only DIAGNOSE
    miscalibration.

    Scale shape: one fact pass collapses to the distinct-score grain
    (map-side combinable (group, score) -> (positives, count) cells —
    the roc_auc_by_group precedent; pre-bin continuous scores if the
    distinct-score grain is unbounded), then PAV runs per group over
    the bounded cell frame in ONE Arrow batch per group
    (applyInPandas) — the stack algorithm is inherently sequential
    (SURVEY §2.10 justified-Arrow rule), O(cells) amortized since
    every merge retires a block.

    Determinism: violator comparisons use integer cross-
    multiplication (pos_a * n_b >= pos_b * n_a), so block boundaries
    are exact; the only float op is the final pos/n division, rounded.
    PAV's fixed-point is unique, so an independent oracle lands on
    identical blocks.

    Returns one row per fitted block: (groups..., block, score_lo,
    score_hi, n_rows, n_pos, calibrated) with ``calibrated``
    non-decreasing in ``block`` within each group.
    """
    keys = list(group_cols)
    cells = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(*keys, F.col(score_col).alias("__score"))
        .agg(
            F.sum(F.col(label_col).cast("int")).alias("__pos"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return isotonic_fit_cells(cells, keys, round_digits)


def isotonic_fit_cells(
    cells: DataFrame,
    group_cols: Sequence[str],
    round_digits: int = 6,
) -> DataFrame:
    """PAV over an already-aggregated (groups..., __score, __pos, __n)
    cell frame — the shared kernel behind the batch operator and the
    streaming calibration-state read lens (bin sums are exactly the
    cells PAV needs, so the streamed FIT equals the batch fit on the
    same binning)."""
    import pandas as pd

    keys = list(group_cols)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cells.schema
        if f.name in keys
    )
    out_schema = (
        f"{key_fields}, block int, score_lo double, score_hi double, "
        "n_rows bigint, n_pos bigint, calibrated double"
    )

    def _pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__score")
        # blocks: [pos, n, lo, hi] — merge while non-increasing
        blocks: list[list] = []
        for s, p, n in zip(pdf["__score"], pdf["__pos"], pdf["__n"]):
            blocks.append([int(p), int(n), float(s), float(s)])
            while len(blocks) > 1:
                pa, na, loa, _ = blocks[-2]
                pb, nb, _, hib = blocks[-1]
                if pa * nb >= pb * na:  # rate_a >= rate_b: violator
                    blocks[-2:] = [[pa + pb, na + nb, loa, hib]]
                else:
                    break
        rows = []
        gvals = {k: pdf[k].iloc[0] for k in keys}
        for i, (p, n, lo, hi) in enumerate(blocks):
            rows.append(
                {
                    **gvals,
                    "block": i,
                    "score_lo": lo,
                    "score_hi": hi,
                    "n_rows": n,
                    "n_pos": p,
                    # +1e-9 tie-break nudge (repo rounding convention):
                    # p/n with power-of-two n lands EXACTLY on decimal
                    # half-ties (e.g. 122/256 = 0.4765625) where Python
                    # banker's rounding and SQL half-away diverge.
                    "calibrated": round(p / n + 1e-9, round_digits),
                }
            )
        return pd.DataFrame(rows)

    return cells.groupBy(*keys).applyInPandas(_pav, out_schema)


def split_conformal(
    df: DataFrame,
    group_cols: Sequence[str],
    y_col: str,
    yhat_col: str,
    key_col: str,
    alpha: float = 0.1,
    salt: str = "conformal",
    buckets: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Split-conformal prediction intervals per group, with the
    empirical coverage audit: given ANY point predictor's output
    ``yhat_col`` (conformal is model-agnostic by construction — the
    model can be a GBM, an LLM scorer, or a heuristic; only its
    residuals matter), hold out a deterministic calibration split,
    take

        q_hat = the k-th smallest |y - yhat| on calibration,
        k = ceil((1 - alpha) * (n_cal + 1))   (clamped to n_cal)

    and the interval ``yhat +- q_hat`` covers a fresh point with
    probability >= 1 - alpha (finite-sample, distribution-free).  The
    operator returns per group: n_cal, n_test, q_hat, the realized
    coverage on the held-out test split, and the target.

    Determinism / cross-engine: the calibration membership is the
    portable md5 parity of the key (ops/sampling.py scheme); the rank
    index k is computed in INTEGER arithmetic from alpha's exact
    rational form (Fraction.limit_denominator), never from
    ``ceil(0.9 * x)`` whose binary-decimal mismatch flips the index
    off-by-one; the order statistic is tie-insensitive (any tie order
    selects the same value).

    100 TB shape: the exact per-group order statistic decomposes over
    approx-quantile residual buckets exactly as in
    ``trimmed_group_stats`` — ONE (group, bucket) window for local
    ranks, offset folds on the aggregate-sized bucket frame — so no
    per-group single-reducer sort touches calibration-sized data; the
    test side is one broadcast join + one mergeable aggregate.
    """
    from fractions import Fraction

    from recover_spark.functions.hashing import portable_hash32
    from recover_spark.functions.transforms import materialize_columns

    group_cols = list(group_cols)
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"split_conformal: alpha={alpha} not in (0, 1)")
    frac = Fraction(alpha).limit_denominator(1_000_000)
    qnum = frac.denominator - frac.numerator  # (1 - alpha) numerator
    qden = frac.denominator
    nn = df.filter(
        F.col(y_col).isNotNull() & F.col(yhat_col).isNotNull()
    ).select(
        *group_cols,
        F.abs(
            F.col(y_col).cast("double") - F.col(yhat_col).cast("double")
        ).alias("__r"),
        (portable_hash32(F.col(key_col).cast("string"), salt=salt) % 2).alias(
            "__split"
        ),
    )
    # pin the residual+split frame: the md5 split hash otherwise
    # re-evaluates over the full scan once per consumer (calibration
    # window pass, test pass — r14 optimization)
    nn = nn.localCheckpoint(eager=False)
    calib = nn.filter(F.col("__split") == 0).drop("__split")
    test = nn.filter(F.col("__split") == 1).drop("__split")

    probs = [i / buckets for i in range(1, buckets)]
    # Bucket bounds steer only the DECOMPOSITION — the k-th-smallest
    # order statistic below is exact for ANY deterministic bounds — so
    # compute them on the pre-split frame (column pruning then drops
    # the md5 split hash from this pass entirely) at the standard 0.01
    # accuracy: measured 2.3 s -> 0.6 s of the sf0.1 query, values
    # unchanged by construction and re-verified by the oracle gate.
    bounds = sorted(
        set(nn.select("__r").stat.approxQuantile("__r", probs, 0.01))
    )
    bucket = bucket_chain("__r", bounds)
    staged = materialize_columns(calib, {"__bucket": bucket})
    w = Window.partitionBy(*group_cols, "__bucket").orderBy("__r")
    ranked = staged.withColumn("__lr", F.row_number().over(w))
    # consuming __lr keeps both consumer subtrees identical so
    # ReuseExchange collapses them (the trimmed_group_stats lesson);
    # the pin bounds the frame at (groups x buckets)
    per_bucket = ranked.groupBy(*group_cols, "__bucket").agg(
        F.max("__lr").cast("long").alias("__cnt")
    ).localCheckpoint(eager=False)
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    )
    totals = per_bucket.groupBy(*group_cols).agg(
        F.sum("__cnt").cast("long").alias("__n")
    )
    rn = F.col("__off") + F.col("__lr")
    # k = ceil(qnum * (n + 1) / qden) in exact integer arithmetic
    k = F.least(
        (
            (F.lit(qnum) * (F.col("__n") + F.lit(1)) + F.lit(qden - 1))
            .cast("long")
            / F.lit(qden)
        ).cast("long"),
        F.col("__n"),
    )
    qs = (
        ranked.join(
            F.broadcast(offsets.select(*group_cols, "__bucket", "__off")),
            [*group_cols, "__bucket"],
        )
        .join(F.broadcast(totals), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max("__n").alias("n_cal"),
            F.max(F.when(rn == k, F.col("__r"))).alias("__q"),
        )
    )
    cov = (
        test.join(F.broadcast(qs), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.avg(
                (F.col("__r") <= F.col("__q")).cast("double")
            ).alias("__cov"),
            F.max("n_cal").alias("n_cal"),
            F.max("__q").alias("__qh"),
        )
    )
    return cov.select(
        *group_cols,
        "n_cal",
        "n_test",
        F.round(F.col("__qh") + F.lit(1e-9), round_digits).alias("q_hat"),
        F.round(F.col("__cov") + F.lit(1e-9), round_digits).alias(
            "coverage"
        ),
        F.lit(1.0 - float(frac)).alias("target"),
    )

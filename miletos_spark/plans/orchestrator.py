"""Entry point 1 parity — the `miletos.main.init` pipeline
(miletos/main.py:7624-12554) as a typed config + staged Spark driver.

The reference's ~200-kwarg god object (`gdat`) becomes `RunConfig`;
its mutable blackboard becomes explicit DataFrame lineage: each stage
is a pure DataFrame→DataFrame function, cached at the boundaries the
reference memoizes (raw assembly, detrended, spectra). Stage order
(miletos/main.py §3.1 steps 5–10):

    raw → guards (F1/F4) → mask (F2) → clip↔detrend (X4 'Detrended')
    → analyses: LS (P1), BLS multi (P2), flare outliers (P7)
    → detection gate (A9 `boolposianls`, miletos/main.py:11871-11877)
    → [gated] transit windows (J1/J3), phase-curve bundles (X5),
      closed-form depth (M5) and optional per-group NM fit
    → results row (+ optional S10 upsert)

Network/catalog stages (steps 2/4: MAST, lygos) are upstream landing
jobs here — the pipeline starts from the landed long-format table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miletos_spark.model.forward import trapezoid_depth
from miletos_spark.model.likelihood import depth_fit_closed_form
from miletos_spark.operators.detrend import clip_detrend_loop
from miletos_spark.operators.filters import mask_time_windows
from miletos_spark.operators.fold import fold, phase_bins, transit_flag
from miletos_spark.search.bls import (
    bls_multi_signal,
    bls_multi_signal_grouped,
    trial_table,
)
from miletos_spark.search.flare import flare_outlier_search
from miletos_spark.search.lombscargle import (
    freq_grid,
    lomb_scargle,
    lomb_scargle_grouped,
)


@dataclass
class RunConfig:
    """Declarative run configuration (the decision-table reduction of
    the reference's kwargs web, SURVEY.md §7.4.6). Thresholds default
    to the reference's (miletos/main.py:7931, 7934, 5322)."""

    # masking (F2): [(t0, t1), ...] in time units of the input
    mask_windows: list[tuple[float, float]] = field(default_factory=list)
    # detrend (X4)
    detrend_half_width: int = 25
    detrend_max_iter: int = 2
    # BLS (P2); osam=10 is the reference default (miletos/main.py:5482)
    # — off-grid periods smear phase by Δf·baseline, so osam must keep
    # that under the smallest duty cycle
    bls_p_min: float = 1.0
    bls_p_max: float = 10.0
    bls_osam: float = 10.0
    bls_n_dcyc: int = 2
    bls_dcyc_min: float = 0.02
    bls_max_signals: int = 2
    bls_snr_accept: float = 7.1          # thrss2nr
    # LS (P1)
    ls_osam: float = 3.0
    ls_max_freq: float = 2.0
    # flares (P7)
    flare_window: float = 1.0 / 24.0
    flare_threshold: float = 7.0
    # detection gate (A9)
    gate_bls_snr: float = 10.0           # thrss2nrcosc
    gate_ls_power: float = 0.2           # thrslspecosc
    # fitting (M5)
    fit_on_detection: bool = True
    # optional frozen baseline for GRID construction (BLS trial table,
    # LS frequency grid). None = measure from the detrended data (the
    # reference's behavior). Freezing it makes the search grids a pure
    # function of config — reproducible across runs and replayable by
    # an external oracle — while the reported span stays measured.
    grid_span_days: float | None = None


@dataclass
class RunResult:
    detrended: DataFrame
    bls_detections: list[dict]
    ls_best: dict | None
    flares: DataFrame
    detected: bool
    phase_bundle: DataFrame | None
    depth_fit: dict | None
    summary: dict
    wall_s: float


def run_pipeline(
    spark: SparkSession,
    series: DataFrame,
    config: RunConfig | None = None,
    time_col: str = "time",
    value_col: str = "value",
) -> RunResult:
    """Run the full pipeline on a long-format series
    (time, value[, stdv]). Returns a `RunResult`; nothing sample-sized
    is collected to the driver (detections/summaries are O(1) rows)."""
    cfg = config or RunConfig()
    t_start = time.time()

    # --- guards + mask (F1/F2/F4) ------------------------------------
    work = series.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col))
        & (F.abs(F.col(value_col)) < 1e10)
    )
    if cfg.mask_windows:
        work = mask_time_windows(work, cfg.mask_windows, time_col=time_col)

    # --- detrend (X4) → 'Detrended' stage ----------------------------
    detrended = clip_detrend_loop(
        work, cfg.detrend_half_width, max_iter=cfg.detrend_max_iter,
        value_col=value_col, time_col=time_col,
        halo_chunk_rows=max(8192, 4 * cfg.detrend_half_width),
    ).cache()
    span_row = detrended.agg(
        F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
    ).first()
    span = float(span_row["hi"] - span_row["lo"])
    det = detrended.select(
        F.col(time_col).alias("time"),
        F.col("value_detrended").alias("value"),
    )

    # --- analyses (P1, P2, P7) ---------------------------------------
    if cfg.grid_span_days is not None and cfg.grid_span_days <= 0:
        raise ValueError(
            f"grid_span_days must be positive or None, got {cfg.grid_span_days!r}"
        )
    grid_span = cfg.grid_span_days if cfg.grid_span_days is not None else span
    trials = trial_table(
        spark, cfg.bls_p_min, cfg.bls_p_max, span_days=grid_span,
        osam=cfg.bls_osam, n_dcyc=cfg.bls_n_dcyc, dcyc_min=cfg.bls_dcyc_min,
    )
    bls_found = bls_multi_signal(
        det, trials, max_signals=cfg.bls_max_signals,
        snr_threshold=cfg.bls_snr_accept,
    )

    f_lo = 1.0 / grid_span
    df_step = f_lo / cfg.ls_osam
    n_freq = max(int((cfg.ls_max_freq - f_lo) / df_step), 2)
    shifted = det.select(
        (F.col("time") - F.lit(float(span_row["lo"]))).alias("time"), "value"
    )
    spec = lomb_scargle(
        shifted, freq_grid(spark, f_lo, df_step, min(n_freq, 2000))
    )
    ls_row = spec.orderBy(F.col("power").desc(), "freq").first()
    ls_best = (
        {"freq": ls_row["freq"], "period": 1.0 / ls_row["freq"],
         "power": ls_row["power"]}
        if ls_row is not None else None
    )

    flares = flare_outlier_search(
        det, window_days=cfg.flare_window, threshold=cfg.flare_threshold,
        halo_chunk_days=24.0 * cfg.flare_window,
    )

    # --- detection gate (A9 boolposianls) ----------------------------
    best_snr = max((d["snr"] for d in bls_found), default=0.0)
    detected = bool(
        best_snr > cfg.gate_bls_snr
        or (ls_best is not None and ls_best["power"] > cfg.gate_ls_power)
    )

    # --- gated: transit windows, phase bundle, fit (J1/X5/M5) --------
    phase_bundle = None
    depth_fit = None
    if detected and cfg.fit_on_detection and bls_found:
        top = bls_found[0]
        p, epoch = float(top["period"]), float(top["epoch"])
        dura = float(top["dcyc"]) * p
        flagged = transit_flag(det, p, epoch, dura)
        folded = fold(det, p, epoch, phase_center=0.0)
        phase_bundle = phase_bins(
            folded.withColumn("stdv", F.lit(1.0)), num_bins=50, center=0.0
        )
        shape = trapezoid_depth(F.col("time"), p, epoch, dura)
        fit_row = depth_fit_closed_form(
            det.withColumn("stdv", F.lit(1.0)).withColumn("shape", shape),
            "shape",
        ).first()
        depth_fit = {
            "depth_hat": fit_row["depth_hat"],
            "depth_err": fit_row["depth_err"],
            "n_in_transit": flagged.filter(F.col("in_transit")).count(),
        }

    summary = {
        "n_samples": det.count(),
        "span_days": span,
        "n_bls_signals": len(bls_found),
        "best_bls_snr": best_snr,
        "ls_power": ls_best["power"] if ls_best else None,
        "n_flares": flares.count(),
        "detected": detected,
    }
    return RunResult(
        detrended=detrended,
        bls_detections=bls_found,
        ls_best=ls_best,
        flares=flares,
        detected=detected,
        phase_bundle=phase_bundle,
        depth_fit=depth_fit,
        summary=summary,
        wall_s=time.time() - t_start,
    )


def run_population(
    spark: SparkSession,
    population: DataFrame,
    config: RunConfig | None = None,
    target_col: str = "target",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """The population run — N independent targets through the full
    guards → clip↔detrend → BLS-multi / LS / flares → gate lifecycle in
    ONE Spark job chain, `target_col` as the group key of every stage
    (the reference's real 100 TB fan-out axis: a TOI list driven
    through `miletos.main.init` per target, examples/examples.py:162-172;
    SURVEY §7.1.6 — there it is a scheduler loop, here one plan).

    Requires `config.grid_span_days` (a frozen search-grid baseline):
    a shared trial/frequency grid is what lets every target ride one
    broadcast crossJoin instead of per-target grid builds. The driver
    loop count is `bls_max_signals`, never N. Nothing per-sample ever
    reaches the driver; the result is one summary row per target:
    (target, n_samples, span_days, n_bls_signals, best_bls_snr,
    ls_power, n_flares, detected).
    """
    cfg = config or RunConfig()
    if cfg.grid_span_days is None:
        raise ValueError(
            "run_population requires config.grid_span_days: the frozen "
            "grid baseline is what makes the search grids shared across "
            "targets (one broadcast crossJoin for the whole population)"
        )
    keys = [target_col]

    # --- guards + mask (F1/F2/F4), per-row so no keying needed -------
    work = population.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col))
        & (F.abs(F.col(value_col)) < 1e10)
    )
    if cfg.mask_windows:
        work = mask_time_windows(work, cfg.mask_windows, time_col=time_col)

    # --- detrend (X4) keyed by target --------------------------------
    detrended = clip_detrend_loop(
        work, cfg.detrend_half_width, max_iter=cfg.detrend_max_iter,
        value_col=value_col, time_col=time_col, group_cols=keys,
        clip_per_group=True,
        halo_chunk_rows=max(8192, 4 * cfg.detrend_half_width),
    ).cache()
    det = detrended.select(
        target_col,
        F.col(time_col).alias("time"),
        F.col("value_detrended").alias("value"),
    )
    spans = (
        det.groupBy(target_col)
        .agg(
            F.count("*").alias("n_samples"),
            F.min("time").alias("_lo"),
            F.max("time").alias("_hi"),
        )
        .withColumn("span_days", F.col("_hi") - F.col("_lo"))
    ).cache()

    # --- BLS multi-signal (P2), keyed --------------------------------
    trials = trial_table(
        spark, cfg.bls_p_min, cfg.bls_p_max, span_days=cfg.grid_span_days,
        osam=cfg.bls_osam, n_dcyc=cfg.bls_n_dcyc, dcyc_min=cfg.bls_dcyc_min,
    )
    detections = bls_multi_signal_grouped(
        det, trials, keys, max_signals=cfg.bls_max_signals,
        snr_threshold=cfg.bls_snr_accept,
    )
    det_agg = detections.groupBy(target_col).agg(
        F.count("*").alias("n_bls_signals"),
        F.max("snr").alias("best_bls_snr"),
    )

    # --- LS (P1), keyed: per-target time shift to its own origin -----
    f_lo = 1.0 / cfg.grid_span_days
    df_step = f_lo / cfg.ls_osam
    n_freq = max(int((cfg.ls_max_freq - f_lo) / df_step), 2)
    shifted = det.join(
        F.broadcast(spans.select(target_col, "_lo")), target_col
    ).select(
        target_col, (F.col("time") - F.col("_lo")).alias("time"), "value"
    )
    spec = lomb_scargle_grouped(
        shifted, freq_grid(spark, f_lo, df_step, min(n_freq, 2000)), keys
    )
    ls_best = (
        spec.groupBy(target_col)
        .agg(
            F.max(
                F.struct(
                    F.col("power").alias("power"),
                    (-F.col("freq")).alias("_nf"),
                )
            ).alias("_b")
        )
        .select(target_col, F.col("_b.power").alias("ls_power"))
    )

    # --- flares (P7), keyed ------------------------------------------
    flare_counts = (
        flare_outlier_search(
            det, window_days=cfg.flare_window, threshold=cfg.flare_threshold,
            group_cols=keys, halo_chunk_days=24.0 * cfg.flare_window,
        )
        .groupBy(target_col)
        .agg(F.count("*").alias("n_flares"))
    )

    # --- gate (A9) + per-target summary ------------------------------
    out = (
        spans.join(F.broadcast(det_agg), target_col, "left")
        .join(F.broadcast(ls_best), target_col, "left")
        .join(F.broadcast(flare_counts), target_col, "left")
        .select(
            target_col,
            "n_samples",
            "span_days",
            F.coalesce("n_bls_signals", F.lit(0)).cast("int")
            .alias("n_bls_signals"),
            F.coalesce("best_bls_snr", F.lit(0.0)).alias("best_bls_snr"),
            "ls_power",
            F.coalesce("n_flares", F.lit(0)).alias("n_flares"),
            (
                (F.coalesce("best_bls_snr", F.lit(0.0)) > cfg.gate_bls_snr)
                | (F.coalesce("ls_power", F.lit(0.0)) > cfg.gate_ls_power)
            ).alias("detected"),
        )
    )

    # --- gated per-target depth fit (M5 closed form), one job --------
    # mirrors run_pipeline's gated stage: only DETECTED targets are
    # fitted, on their top accepted detection, via the column-parameter
    # trapezoid shape — every target's fit runs in the same aggregation
    if cfg.fit_on_detection:
        from miletos_spark.model.forward import trapezoid_depth_cols
        from miletos_spark.model.likelihood import depth_fit_closed_form

        top = (
            detections.filter(F.col("signal_idx") == 0)
            .join(
                F.broadcast(
                    out.filter(F.col("detected")).select(target_col)
                ),
                target_col,
            )
            .select(
                target_col,
                F.col("period").alias("_p"),
                F.col("epoch").alias("_e"),
                (F.col("dcyc") * F.col("period")).alias("_dura"),
            )
        )
        shape = trapezoid_depth_cols(
            F.col("time"), F.col("_p"), F.col("_e"), F.col("_dura")
        )
        fits = depth_fit_closed_form(
            det.join(F.broadcast(top), target_col)
            .withColumn("stdv", F.lit(1.0))
            .withColumn("_shape", shape),
            "_shape",
            group_cols=(target_col,),
        )
        out = out.join(
            F.broadcast(
                fits.select(
                    target_col, "depth_hat", "depth_err", "n_in_shape"
                )
            ),
            target_col,
            "left",
        )
    return out

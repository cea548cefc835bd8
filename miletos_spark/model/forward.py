"""M1 — forward-model components (`retr_dictmodl_mile`,
miletos/main.py:327-668) as vectorized column expressions.

The reference evaluates NumPy arrays per model component and sums:
transit (via the external `ephesos.eval_modl`), flares
`1 + Σ ampl·exp(−Δt/tscl)` (miletos/main.py:362-382), baseline constant
or logistic step (miletos/main.py:559-573), radial velocity
(`retr_rvel`, miletos/main.py:644-647); total = signal + baseline − 1
(miletos/main.py:613).

Spark-first: every component is pure `pyspark.sql.functions` column
arithmetic — whole-stage-codegen'd, no UDF, no shuffle — evaluated
against a time column of any DataFrame (data grid or fine grid X6).
The transit shape is a dependency-free symmetric trapezoid (the
standard limb-darkening-free approximation of the ephesos profile):
depth reached between 2nd/3rd contact, linear ingress/egress.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _wrapped_phase_days(time: Column, period: float, epoch: float) -> Column:
    """Time offset from the nearest transit center, in days, in
    (−P/2, P/2]."""
    p = F.lit(float(period))
    ph = ((time - F.lit(float(epoch))) % p + p) % p  # [0, P)
    return ph - F.when(ph > p / 2, p).otherwise(F.lit(0.0))


def transit_model(
    time: Column,
    period: float,
    epoch: float,
    depth: float,
    dura_total: float,
    dura_ingress: float | None = None,
) -> Column:
    """Trapezoid transit: 1 − depth between 2nd and 3rd contact, linear
    ingress/egress of width `dura_ingress` (default: 10% of total),
    1 outside. Durations in days; depth relative (e.g. 0.01 = 1%)."""
    if dura_ingress is None:
        dura_ingress = 0.1 * dura_total
    t14h = float(dura_total) / 2.0  # 1st–4th contact half-width
    t23h = max(t14h - float(dura_ingress), 0.0)  # 2nd–3rd contact half-width
    dt = F.abs(_wrapped_phase_days(time, period, epoch))
    slope_den = max(t14h - t23h, 1e-12)
    frac = (F.lit(t14h) - dt) / F.lit(slope_den)  # 1 at t23h edge, 0 at t14h
    return (
        F.when(dt <= t23h, F.lit(1.0 - depth))
        .when(dt < t14h, F.lit(1.0) - F.lit(float(depth)) * frac)
        .otherwise(F.lit(1.0))
    )


def flare_model(
    time: Column,
    flares: list[tuple[float, float, float]],
) -> Column:
    """Flare component `1 + Σ ampl·exp(−(t−t0)/tscl)` for t ≥ t0
    (miletos/main.py:362-382). `flares` = [(t0, ampl, tscl_days), ...]."""
    out: Column = F.lit(1.0)
    for t0, ampl, tscl in flares:
        dt = time - F.lit(float(t0))
        out = out + F.when(
            dt >= 0, F.lit(float(ampl)) * F.exp(-dt / F.lit(float(tscl)))
        ).otherwise(F.lit(0.0))
    return out


def rv_model(
    time: Column,
    period: float,
    epoch: float,
    semi_amp: float,
    sys_vel: float = 0.0,
) -> Column:
    """Circular-orbit radial velocity `γ + K·sin(2π(t−epoch)/P)`
    (`retr_rvel`, miletos/main.py:644-647)."""
    ang = 2.0 * math.pi * (time - F.lit(float(epoch))) / F.lit(float(period))
    return F.lit(float(sys_vel)) + F.lit(float(semi_amp)) * F.sin(ang)


def step_baseline(
    time: Column,
    cons: float = 0.0,
    step_ampl: float | None = None,
    step_time: float | None = None,
    step_scale: float | None = None,
) -> Column:
    """Baseline in ppt: constant offset, plus an optional logistic step
    `ampl/(1+exp(−(t−t0)/scale))` (miletos/main.py:559-573). Returns the
    baseline in relative units (ppt/1e3), reference convention."""
    out: Column = F.lit(float(cons) / 1e3)
    if step_ampl is not None:
        out = out + F.lit(float(step_ampl) / 1e3) / (
            F.lit(1.0)
            + F.exp(-(time - F.lit(float(step_time))) / F.lit(float(step_scale)))
        )
    return out


def dilution_correction(flux: Column, contrati: float) -> Column:
    """X7 — correct transit depth for flux contamination:
    `1 − contrati·(1 − flux)` (miletos/main.py:11919-11931)."""
    return F.lit(1.0) - F.lit(float(contrati)) * (F.lit(1.0) - flux)


def orbital_phase(time: Column, period: float, epoch: float) -> Column:
    """Orbital phase in [0, 1): 0 at transit center, 0.5 at
    occultation (circular orbit)."""
    p = F.lit(float(period))
    return (((time - F.lit(float(epoch))) % p + p) % p) / p


def phase_curve_total(
    time: Column,
    period: float,
    epoch: float,
    depth: float,
    dura: float,
    a_beam: float,
    a_elli: float,
    a_day: float,
    a_night: float,
    cons: float = 0.0,
) -> Column:
    """M9-class full phase-curve model (the model the reference fits via
    its external-package bridge, miletos/main.py:1588-2683, and whose
    median evaluation it decomposes at miletos/main.py:1950-2025):

      total(t) = 1 + cons
               + [transit dip]                       (depth, dura trapezoid)
               + a_beam·sin(2πφ)                     (Doppler beaming)
               − a_elli·cos(4πφ)                     (ellipsoidal variation)
               + F_p(φ)·(1 − occ(t))                 (planetary flux,
                                                      occulted at φ=0.5)
      F_p(φ) = a_night + (a_day − a_night)·(1 − cos 2πφ)/2

    φ = orbital phase (0 = transit). All terms are small-amplitude
    additive (the standard phase-curve linearization); every term is
    closed-form column arithmetic — codegen, no UDF."""
    phi = orbital_phase(time, period, epoch)
    two_pi = 2.0 * math.pi
    dip = transit_model(time, period, epoch, depth, dura) - F.lit(1.0)
    occ = trapezoid_depth(time, period, epoch + period / 2.0, dura)
    beam = F.lit(float(a_beam)) * F.sin(F.lit(two_pi) * phi)
    elli = -F.lit(float(a_elli)) * F.cos(F.lit(2.0 * two_pi) * phi)
    fp = F.lit(float(a_night)) + F.lit(float(a_day - a_night)) * (
        F.lit(1.0) - F.cos(F.lit(two_pi) * phi)
    ) / 2.0
    return (
        F.lit(1.0 + float(cons)) + dip + beam + elli + fp * (F.lit(1.0) - occ)
    )


def phase_curve_components(
    time: Column,
    period: float,
    epoch: float,
    depth: float,
    dura: float,
    a_beam: float,
    a_elli: float,
    a_day: float,
    a_night: float,
    cons: float = 0.0,
) -> dict[str, Column]:
    """The reference's component decomposition (miletos/main.py:1950-2025):
    re-evaluate the model with selected amplitudes zeroed and subtract
    the stellar baseline —

      stel = eval(beam=elli=planet=0)          (baseline + transit)
      elli = eval(beam=planet=0) − stel
      beam = eval(elli=planet=0) − stel
      plan = totl − stel − elli − beam         (planetary flux)
      nigh = eval(beam=elli=0, day:=night) − stel   (nightside floor)
      pmod = plan − nigh                       (day-night modulation)

    The reference operates on posterior-median params of a fitted model;
    here the same decomposition runs on explicit params. Zero-and-
    subtract (rather than emitting each closed form directly) keeps the
    identity totl = stel + elli + beam + plan true BY CONSTRUCTION, as
    in the reference. Returns {'totl','stel','elli','beam','plan',
    'nigh','pmod'}; the reference's occultation-window mean offset
    (`offsdays`) is applied by the caller (it needs an aggregation)."""

    def ev(ab: float, ae: float, ad: float, an: float) -> Column:
        return phase_curve_total(
            time, period, epoch, depth, dura, ab, ae, ad, an, cons
        )

    totl = ev(a_beam, a_elli, a_day, a_night)
    stel = ev(0.0, 0.0, 0.0, 0.0)
    elli = ev(0.0, a_elli, 0.0, 0.0) - stel
    beam = ev(a_beam, 0.0, 0.0, 0.0) - stel
    plan = totl - stel - elli - beam
    nigh = ev(0.0, 0.0, a_night, a_night) - stel
    return {
        "totl": totl,
        "stel": stel,
        "elli": elli,
        "beam": beam,
        "plan": plan,
        "nigh": nigh,
        "pmod": plan - nigh,
    }


def trapezoid_depth_cols(
    time: Column,
    period: Column,
    epoch: Column,
    dura_total: Column,
    ingress_frac: float = 0.1,
) -> Column:
    """`trapezoid_depth` with per-row COLUMN ephemeris parameters — the
    population form: one shape expression scores every target's samples
    against that target's own (period, epoch, duration) after a
    broadcast join, no per-target driver loop. Ingress is the default
    fraction of the total duration (the scalar twin's default)."""
    ph = ((time - epoch) % period + period) % period  # [0, P)
    dt = F.abs(ph - F.when(ph > period / 2, period).otherwise(F.lit(0.0)))
    t14h = dura_total / 2.0
    # ingress = ingress_frac·dura_total, exactly the scalar twin's
    # default geometry (t23h = t14h − ingress, floored at 0)
    t23h = F.greatest(t14h - dura_total * float(ingress_frac), F.lit(0.0))
    frac = (t14h - dt) / F.greatest(t14h - t23h, F.lit(1e-12))
    return (
        F.when(dt <= t23h, F.lit(1.0))
        .when(dt < t14h, frac)
        .otherwise(F.lit(0.0))
    )


def trapezoid_depth(
    time: Column,
    period: float,
    epoch: float,
    dura_total: float,
    dura_ingress: float | None = None,
) -> Column:
    """The unit-depth transit *shape* `s(t) ∈ [0, 1]` (1 = full transit
    depth reached). `transit_model = 1 − depth·s`; the closed-form depth
    fit regresses the data on this shape."""
    if dura_ingress is None:
        dura_ingress = 0.1 * dura_total
    t14h = float(dura_total) / 2.0
    t23h = max(t14h - float(dura_ingress), 0.0)
    dt = F.abs(_wrapped_phase_days(time, period, epoch))
    slope_den = max(t14h - t23h, 1e-12)
    frac = (F.lit(t14h) - dt) / F.lit(slope_den)
    return (
        F.when(dt <= t23h, F.lit(1.0))
        .when(dt < t14h, frac)
        .otherwise(F.lit(0.0))
    )

"""The reference's flagship user workflow — the *paramtable* processing
template (reference resources/templates/paramtable.py: compute a row of
scalar features per waveform segment) — expressed on this engine.

A reference user's ``main(segment, config)`` carries over almost verbatim:
the segment object exposes the same attribute surface
(``segment.data``, ``segment.event.magnitude``, ``segment.arrival_time``,
dotted dims), ``SkipSegment`` skips bad rows without killing the job, and
the returned dict becomes one output row keyed by ``segment_db_id``.
The execution engine underneath is ``process_df`` (Arrow-batched
``mapInPandas``), not chunked ORM loops.

Features per segment (paramtable.py parity):
decode miniSEED -> gap check -> bandpass (magnitude-dependent cutoff) ->
signal/noise split at the arrival time -> SNR, peak amplitudes, cumulative
-energy quantile times, Wood-Anderson peak displacement.
"""

from __future__ import annotations

import numpy as np

from stream2segment_spark.funclib import ndarrays as ND
from stream2segment_spark.funclib import traces as TR
from stream2segment_spark.funclib.templates import signal_noise_spectra
from stream2segment_spark.process import SegmentView, SkipSegment
from stream2segment_spark.sources.mseed import MSeedError, unpack_blob

OUTPUT_SCHEMA = (
    "seed_id string, sample_rate double, n_samples int, "
    "snr double, pga double, pgv double, wa_peak double, "
    "t05 double, t95 double, mag double, dist_deg double"
)


def magnitude_to_freq_min(mag: float) -> float:
    """Magnitude -> bandpass high-pass cutoff (reference paramtable
    magdep mapping F9: bigger events carry lower corner frequencies)."""
    if mag is None:
        return 0.5
    if mag <= 4.0:
        return 0.5
    if mag <= 5.5:
        return 0.3
    if mag <= 6.5:
        return 0.1
    return 0.05


def main(segment: SegmentView, config: dict) -> dict:
    """The user pyfunc: one segment -> one feature row (or SkipSegment)."""
    data = segment.data
    if data is None or len(data) == 0:
        raise SkipSegment("empty data")
    try:
        channels = unpack_blob(bytes(data))
    except MSeedError as exc:  # bad bytes = data error -> skip, not abort
        raise SkipSegment(f"mseed: {exc}") from exc
    if not channels or channels[0]["error"]:
        raise SkipSegment(f"mseed: {channels[0]['error'] if channels else 'no records'}")
    ch = channels[0]
    if abs(ch["max_gap_overlap_ratio"]) > config.get("max_gap", 0.5):
        raise SkipSegment("gaps")
    x = np.asarray(ch["samples"], dtype=float)
    rate = ch["sample_rate"]
    delta = 1.0 / rate
    if len(x) < 32:
        raise SkipSegment("too few samples")

    mag = segment.event.magnitude
    fmin = magnitude_to_freq_min(mag)
    y = TR.bandpass_zerophase(x, delta, freq_min=fmin,
                              freq_max=config.get("freq_max", 30.0))

    start_epoch = ch["start_time"].timestamp()
    arrival = segment.arrival_time.timestamp() \
        if segment.get("arrival_time") is not None else start_epoch
    arrival = min(max(arrival, start_epoch),
                  start_epoch + (len(x) - 2) * delta)
    sns = signal_noise_spectra(y, delta, start_epoch, arrival,
                               win_length=config.get("sn_win", (0.05, 0.95)))
    sig_power = float(np.square(sns["signal_spec"]).sum())
    noise_power = float(np.square(sns["noise_spec"]).sum())
    snr = sig_power / noise_power if noise_power > 0 else float("inf")

    vel = y  # fixture traces are velocity-like
    pgv = float(np.max(np.abs(vel)))
    acc = np.gradient(vel, delta)
    pga = float(np.max(np.abs(acc)))
    wa = TR.synth_wood_anderson(vel, delta)
    wa_peak = float(np.max(np.abs(wa)))

    cum = ND.cumsumsq(y, normalize=True)
    i05, i95 = np.searchsorted(cum, [0.05, 0.95])
    return {
        "seed_id": ch["seed_id"],
        "sample_rate": rate,
        "n_samples": int(len(x)),
        "snr": snr,
        "pga": pga,
        "pgv": pgv,
        "wa_peak": wa_peak,
        "t05": float(i05 * delta),
        "t95": float(i95 * delta),
        "mag": float(mag) if mag is not None else None,
        "dist_deg": float(segment.event_distance_deg)
        if segment.get("event_distance_deg") is not None else None,
    }

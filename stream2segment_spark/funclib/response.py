"""Instrument-response removal from poles-and-zeros (SURVEY N14) —
obspy-free.

The reference removes the instrument response via obspy's
``Trace.remove_response(inventory)`` with a 60 dB water level and m/s
output (process/gui/webapp/mainapp/core.py:38-47, funclib/traces.py:283).
obspy is absent in this runtime, so the same physics is implemented
directly:

- PAZ (poles, zeros, normalization A0, overall sensitivity) parsed from
  FDSN StationXML with the stdlib ElementTree (namespace-agnostic);
- the frequency response H(f) = sensitivity * A0 * prod(s - z)/prod(s - p)
  evaluated at the trace's rFFT bins;
- water-level spectrum inversion (Clayton & Wiggins 1976, the same
  stabilization obspy's ``invert_spec`` applies): bins where |H| falls
  below ``max|H| * 10**(-wl_db/20)`` are raised to that floor with phase
  kept, so the deconvolution never blows up at notches/DC;
- output-unit conversion relative to the response's input unit
  (velocity-input PAZ is the FDSN norm): DISP divides by (i*omega), ACC
  multiplies by it.

Everything is plain numpy on (samples, delta) pairs, composable inside
the pandas-UDF process engine like the rest of funclib.
"""

from __future__ import annotations

from dataclasses import dataclass
from xml.etree import ElementTree

import numpy as np

from stream2segment_spark.funclib.traces import paz_frequency_response, taper_hann
from stream2segment_spark.sources.compression import sniff_decompress


@dataclass(frozen=True)
class PAZResponse:
    """Pole-zero stage + overall sensitivity of one channel."""
    poles: tuple = ()
    zeros: tuple = ()
    normalization: float = 1.0       # A0, normalizes the PZ stage to 1 at f_norm
    sensitivity: float = 1.0         # overall counts per input unit
    input_units: str = "M/S"         # unit the PZ transfer is defined against

    def frequency_response(self, freqs_hz: np.ndarray) -> np.ndarray:
        """Counts-per-input-unit transfer at ``freqs_hz``."""
        h = paz_frequency_response(freqs_hz, self.poles, self.zeros,
                                   gain=self.normalization)
        return h * self.sensitivity


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children(elem, name):
    return [c for c in elem if _local(c.tag) == name]


def _complex(elem) -> complex:
    re_, im = 0.0, 0.0
    for c in elem:
        if _local(c.tag) == "Real":
            re_ = float(c.text)
        elif _local(c.tag) == "Imaginary":
            im = float(c.text)
    return complex(re_, im)


def parse_stationxml_paz(
    xml_data: bytes | str,
    network: str | None = None,
    station: str | None = None,
    channel: str | None = None,
) -> PAZResponse:
    """Extract the PAZ response of one channel from FDSN StationXML.

    ``xml_data`` may be raw or compressed bytes (gzip/zip/bz2 sniffed, as
    datacenters serve inventories compressed). The first channel matching
    the (network, station, channel) codes is used; ``None`` matches any.
    Raises ValueError when no matching channel carries a PolesZeros stage.
    """
    if isinstance(xml_data, bytes):
        xml_data = sniff_decompress(xml_data).decode("utf-8", errors="replace")
    # strip any default-namespace prefix burden by parsing as-is; matching
    # is on local names so the FDSN namespace version does not matter
    root = ElementTree.fromstring(xml_data)

    for net in _children(root, "Network"):
        if network and net.get("code") != network:
            continue
        for sta in _children(net, "Station"):
            if station and sta.get("code") != station:
                continue
            for cha in _children(sta, "Channel"):
                if channel and cha.get("code") != channel:
                    continue
                for resp in _children(cha, "Response"):
                    paz = _parse_response_elem(resp)
                    if paz is not None:
                        return paz
    raise ValueError(
        f"no PolesZeros response for network={network!r} station={station!r} "
        f"channel={channel!r} in StationXML")


def _parse_response_elem(resp) -> PAZResponse | None:
    poles, zeros, a0 = [], [], 1.0
    input_units, found_pz = "M/S", False
    for stage in _children(resp, "Stage"):
        for pz in _children(stage, "PolesZeros"):
            found_pz = True
            for p in _children(pz, "Pole"):
                poles.append(_complex(p))
            for z in _children(pz, "Zero"):
                zeros.append(_complex(z))
            for nf in _children(pz, "NormalizationFactor"):
                a0 = float(nf.text)
            for iu in _children(pz, "InputUnits"):
                names = _children(iu, "Name")
                if names and names[0].text:
                    input_units = names[0].text.strip().upper()
    sens = 1.0
    for s in _children(resp, "InstrumentSensitivity"):
        for v in _children(s, "Value"):
            sens = float(v.text)
    if not found_pz:
        return None
    return PAZResponse(poles=tuple(poles), zeros=tuple(zeros),
                       normalization=a0, sensitivity=sens,
                       input_units=input_units)


_UNIT_ORDER = {"M": 0, "M/S": 1, "M/S**2": 2, "M/S^2": 2, "M/S/S": 2}
_OUTPUT_ORDER = {"DISP": 0, "VEL": 1, "ACC": 2}


def invert_spec_water_level(h: np.ndarray, water_level_db: float) -> np.ndarray:
    """1/H with the Clayton-Wiggins water level: |H| below
    ``max|H| * 10**(-wl/20)`` is raised to that floor (phase kept; zero
    bins become the floor itself), so the inverse is bounded."""
    habs = np.abs(h)
    floor = habs.max() * 10.0 ** (-water_level_db / 20.0)
    out = np.array(h, dtype=complex, copy=True)
    tiny = habs < floor
    nz = tiny & (habs > 0.0)
    out[nz] *= floor / habs[nz]
    out[tiny & (habs == 0.0)] = floor
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / out
    return inv


def remove_response(
    samples: np.ndarray, delta: float, paz: PAZResponse,
    output: str = "VEL", water_level_db: float = 60.0,
    taper_max_percentage: float = 0.05,
) -> np.ndarray:
    """Deconvolve the instrument response: counts -> ground motion in
    ``output`` units ('DISP' m, 'VEL' m/s, 'ACC' m/s^2). Mirrors the
    reference's default pre-process (obspy remove_response, water level
    60): taper, rFFT, water-level spectral division, unit conversion by
    powers of (i*omega), irFFT."""
    x = taper_hann(np.asarray(samples, dtype=float), taper_max_percentage)
    n = len(x)
    if n == 0:
        return x
    f = np.fft.rfftfreq(n, d=delta)
    h = paz.frequency_response(f)
    spec = np.fft.rfft(x) * invert_spec_water_level(h, water_level_db)

    try:
        shift = _OUTPUT_ORDER[output.upper()] - _UNIT_ORDER[paz.input_units]
    except KeyError:
        raise ValueError(f"unknown output/input units: {output!r} / "
                         f"{paz.input_units!r}") from None
    if shift:
        iw = 2j * np.pi * f
        if shift > 0:
            spec = spec * iw ** shift
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                spec = np.where(f > 0, spec / iw ** (-shift), 0.0)
    return np.fft.irfft(spec, n=n)


def apply_response(samples: np.ndarray, delta: float,
                   paz: PAZResponse) -> np.ndarray:
    """Forward-convolve ground motion (in the PAZ input unit) with the
    instrument response -> counts. The inverse of :func:`remove_response`
    (up to taper/water-level); used by tests to build synthetic raw
    traces with a known ground truth."""
    x = np.asarray(samples, dtype=float)
    n = len(x)
    if n == 0:
        return x
    f = np.fft.rfftfreq(n, d=delta)
    return np.fft.irfft(np.fft.rfft(x) * paz.frequency_response(f), n=n)

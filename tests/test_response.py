"""N14 instrument-response removal: PAZ deconvolution + StationXML parse.

Reference parity target: obspy Trace.remove_response(inventory) with
water_level=60, output='VEL' (reference core.py:38-47). Ground truth here
is built by forward-convolving a known signal with the same PAZ, so
recovery is checked to numerical precision rather than against obspy.
"""

import gzip

import numpy as np
import pytest

from stream2segment_spark.funclib.response import (
    PAZResponse,
    apply_response,
    invert_spec_water_level,
    parse_stationxml_paz,
    remove_response,
)

# A realistic broadband velocity-input PAZ (STS-2-like corner at ~8.33 mHz)
PAZ = PAZResponse(
    poles=(-0.037 + 0.037j, -0.037 - 0.037j, -251.3 + 0.0j),
    zeros=(0j, 0j),
    normalization=251.3,
    sensitivity=6.0e8,
    input_units="M/S",
)

N, DELTA = 4096, 0.01  # 100 Hz, ~41 s


def _band_signal(freqs=(0.5, 2.0, 7.5), n=N, delta=DELTA):
    t = np.arange(n) * delta
    x = sum(np.sin(2 * np.pi * f * t + 0.3 * i)
            for i, f in enumerate(freqs))
    # taper the ground truth so edge effects don't dominate the comparison
    from stream2segment_spark.funclib.traces import taper_hann
    return taper_hann(x, 0.05)


def test_roundtrip_velocity():
    vel = _band_signal()
    counts = apply_response(vel, DELTA, PAZ)
    # raw trace is ~6e8 times larger: the deconvolution must undo that
    assert np.abs(counts).max() > 1e6 * np.abs(vel).max()
    rec = remove_response(counts, DELTA, PAZ, output="VEL",
                          taper_max_percentage=0.0)
    core = slice(N // 8, -N // 8)  # ignore wrap-around edges
    assert np.allclose(rec[core], vel[core], rtol=0, atol=2e-3 * np.abs(vel).max())


def test_output_units_disp_acc():
    vel = _band_signal(freqs=(2.0,))
    counts = apply_response(vel, DELTA, PAZ)
    disp = remove_response(counts, DELTA, PAZ, output="DISP",
                           taper_max_percentage=0.0)
    acc = remove_response(counts, DELTA, PAZ, output="ACC",
                          taper_max_percentage=0.0)
    # for a sine at f: |disp| = |vel|/(2 pi f), |acc| = |vel|*(2 pi f)
    w = 2 * np.pi * 2.0
    core = slice(N // 8, -N // 8)
    assert np.abs(disp[core]).max() == pytest.approx(
        np.abs(vel[core]).max() / w, rel=0.02)
    assert np.abs(acc[core]).max() == pytest.approx(
        np.abs(vel[core]).max() * w, rel=0.02)


def test_water_level_bounds_inverse():
    f = np.linspace(0.0, 50.0, 513)
    h = PAZ.frequency_response(f)
    inv = invert_spec_water_level(h, 60.0)
    # the floor is max|H| * 10^(-60/20) = max|H|/1000; nothing exceeds 1/floor
    assert np.isfinite(inv).all()
    assert np.abs(inv).max() <= 1000.0 / np.abs(h).max() * (1 + 1e-9)
    # DC bin of a response with zeros at the origin is |H|=0 -> floored
    assert np.abs(h[0]) == 0.0 and np.isfinite(inv[0])


def test_water_level_no_effect_in_band():
    # where |H| is far above the floor the inverse is exactly 1/H
    f = np.linspace(0.1, 40.0, 400)
    h = PAZ.frequency_response(f)
    inv = invert_spec_water_level(h, 60.0)
    big = np.abs(h) > np.abs(h).max() * 1e-3
    assert big.any()
    np.testing.assert_allclose(inv[big], 1.0 / h[big], rtol=1e-12)


STATIONXML = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
 <Network code="GE">
  <Station code="APE">
   <Channel code="BHZ" locationCode="">
    <Response>
     <InstrumentSensitivity>
      <Value>600000000.0</Value>
      <Frequency>1.0</Frequency>
     </InstrumentSensitivity>
     <Stage number="1">
      <PolesZeros>
       <InputUnits><Name>M/S</Name></InputUnits>
       <OutputUnits><Name>V</Name></OutputUnits>
       <NormalizationFactor>251.3</NormalizationFactor>
       <NormalizationFrequency>1.0</NormalizationFrequency>
       <Zero number="0"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Zero number="1"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Pole number="0"><Real>-0.037</Real><Imaginary>0.037</Imaginary></Pole>
       <Pole number="1"><Real>-0.037</Real><Imaginary>-0.037</Imaginary></Pole>
       <Pole number="2"><Real>-251.3</Real><Imaginary>0.0</Imaginary></Pole>
      </PolesZeros>
     </Stage>
    </Response>
   </Channel>
  </Station>
 </Network>
</FDSNStationXML>
"""


def test_parse_stationxml_paz():
    paz = parse_stationxml_paz(STATIONXML, network="GE", station="APE",
                               channel="BHZ")
    assert paz.sensitivity == 6.0e8
    assert paz.normalization == 251.3
    assert paz.input_units == "M/S"
    assert paz.zeros == (0j, 0j)
    assert (-0.037 + 0.037j) in paz.poles and (-251.3 + 0j) in paz.poles


def test_parse_stationxml_gzipped_bytes_and_wildcards():
    blob = gzip.compress(STATIONXML.encode())
    paz = parse_stationxml_paz(blob)  # sniffed + any-channel match
    assert paz.sensitivity == 6.0e8


def test_parse_stationxml_no_match_raises():
    with pytest.raises(ValueError, match="no PolesZeros"):
        parse_stationxml_paz(STATIONXML, network="XX")


def test_default_preprocess_through_engine(spark):
    """The reference's default pre-process (core.py:38-47: parse the
    segment's inventory, remove the response, water level 60, m/s) run as
    a pyfunc through the Spark process engine over binary inventory_xml +
    sample payloads."""
    from stream2segment_spark.process import process_df

    vels = [_band_signal(freqs=(0.5 + i, 3.0)) * (1 + i) for i in range(4)]
    rows = [(i, gzip.compress(STATIONXML.encode()),
             [float(v) for v in apply_response(vels[i], DELTA, PAZ)])
            for i in range(4)]
    segs = spark.createDataFrame(
        rows, "id long, inventory_xml binary, data array<double>")

    def preprocess(segment, config):
        paz = parse_stationxml_paz(bytes(segment.inventory_xml))
        vel = remove_response(np.asarray(segment.data), DELTA, paz,
                              output="VEL",
                              water_level_db=config["water_level"],
                              taper_max_percentage=0.0)
        core = vel[N // 8: -N // 8]
        return {"peak_vel": float(np.abs(core).max())}

    out = (process_df(segs, preprocess, "peak_vel double",
                      config={"water_level": 60.0})
           .toPandas().set_index("segment_db_id").peak_vel)
    for i in range(4):
        want = np.abs(vels[i][N // 8: -N // 8]).max()
        assert out[i] == pytest.approx(want, rel=5e-3)


def test_parsed_paz_roundtrip_matches_literal():
    paz = parse_stationxml_paz(STATIONXML)
    vel = _band_signal(freqs=(1.5,))
    a = remove_response(apply_response(vel, DELTA, paz), DELTA, paz,
                        taper_max_percentage=0.0)
    b = remove_response(apply_response(vel, DELTA, PAZ), DELTA, PAZ,
                        taper_max_percentage=0.0)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9 * np.abs(vel).max())


# ---------------------------------------------------------------------------
# Multi-stage response chains (PolesZeros + gain + FIR decimation)
# ---------------------------------------------------------------------------

MULTISTAGE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<FDSNStationXML xmlns="http://www.fdsn.org/xml/station/1" schemaVersion="1.1">
 <Network code="GE">
  <Station code="APE">
   <Channel code="BHZ" locationCode="">
    <Response>
     <InstrumentSensitivity>
      <Value>600000000.0</Value>
      <Frequency>1.0</Frequency>
     </InstrumentSensitivity>
     <Stage number="1">
      <PolesZeros>
       <InputUnits><Name>M/S</Name></InputUnits>
       <OutputUnits><Name>V</Name></OutputUnits>
       <PzTransferFunctionType>LAPLACE (RADIANS/SECOND)</PzTransferFunctionType>
       <NormalizationFactor>251.3</NormalizationFactor>
       <NormalizationFrequency>1.0</NormalizationFrequency>
       <Zero number="0"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Zero number="1"><Real>0.0</Real><Imaginary>0.0</Imaginary></Zero>
       <Pole number="0"><Real>-0.037</Real><Imaginary>0.037</Imaginary></Pole>
       <Pole number="1"><Real>-0.037</Real><Imaginary>-0.037</Imaginary></Pole>
       <Pole number="2"><Real>-251.3</Real><Imaginary>0.0</Imaginary></Pole>
      </PolesZeros>
      <StageGain><Value>1500.0</Value><Frequency>1.0</Frequency></StageGain>
     </Stage>
     <Stage number="2">
      <StageGain><Value>400000.0</Value><Frequency>1.0</Frequency></StageGain>
     </Stage>
     <Stage number="3">
      <FIR>
       <InputUnits><Name>COUNTS</Name></InputUnits>
       <OutputUnits><Name>COUNTS</Name></OutputUnits>
       <Symmetry>ODD</Symmetry>
       <NumeratorCoefficient i="0">0.25</NumeratorCoefficient>
       <NumeratorCoefficient i="1">0.5</NumeratorCoefficient>
      </FIR>
      <Decimation>
       <InputSampleRate>200.0</InputSampleRate>
       <Factor>2</Factor>
      </Decimation>
      <StageGain><Value>1.0</Value><Frequency>0.0</Frequency></StageGain>
     </Stage>
    </Response>
   </Channel>
  </Station>
 </Network>
</FDSNStationXML>
"""


def _chain():
    from stream2segment_spark.funclib.response import parse_stationxml_response
    return parse_stationxml_response(MULTISTAGE_XML, network="GE",
                                     station="APE", channel="BHZ")


def test_parse_multistage_chain():
    from stream2segment_spark.funclib.response import (
        CoefficientsStage, PolesZerosStage)
    chain = _chain()
    assert len(chain.stages) == 3
    pz, dig, fir = chain.stages
    assert isinstance(pz, PolesZerosStage) and pz.gain == 1500.0
    assert pz.normalization == 251.3 and len(pz.poles) == 3
    assert isinstance(dig, CoefficientsStage) and dig.gain == 400000.0
    assert dig.numerator == () and dig.denominator == ()
    assert isinstance(fir, CoefficientsStage) and fir.symmetry == "ODD"
    assert fir.input_sample_rate == 200.0
    # ODD symmetry: stored [0.25, 0.5] expands to [0.25, 0.5, 0.25]
    np.testing.assert_allclose(fir.full_taps(), [0.25, 0.5, 0.25])
    assert chain.sensitivity == 6.0e8
    assert chain.input_units == "M/S"


def test_multistage_exact_composition():
    """frequency_response equals the hand-computed product of the three
    stages (independent numpy formulas, written out here)."""
    chain = _chain()
    f = np.linspace(0.1, 40.0, 113)
    s = 2j * np.pi * f
    pz = 251.3 * s * s / ((s - (-0.037 + 0.037j)) * (s - (-0.037 - 0.037j))
                          * (s - (-251.3 + 0j)))
    taps = np.array([0.25, 0.5, 0.25])
    w = 2 * np.pi * f / 200.0
    # symmetric 3-tap filter evaluated zero-phase, DC-normalized (sum=1)
    fir = taps[1] + 2 * taps[0] * np.cos(w)
    want = pz * 1500.0 * 400000.0 * fir
    got = chain.frequency_response(f)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_multistage_fir_zero_phase_and_unity_dc():
    chain = _chain()
    fir = chain.stages[2]
    f = np.linspace(0.0, 50.0, 51)
    h = fir.transfer(f)
    # linear-phase symmetric FIR, centered: real-valued transfer
    np.testing.assert_allclose(h.imag, 0.0, atol=1e-12)
    assert h[0] == pytest.approx(1.0)  # DC-normalized x gain 1


def test_multistage_gain_product_matches_sensitivity():
    chain = _chain()
    total = np.abs(chain.frequency_response(np.array([1.0])))[0]
    # A0 normalizes the PZ stage to ~1 at 1 Hz, FIR ~1 in-band, so
    # |H(1 Hz)| ~ 1500 * 400000 = sensitivity
    assert total == pytest.approx(chain.sensitivity, rel=5e-3)


def test_multistage_remove_response_roundtrip():
    from stream2segment_spark.funclib.response import remove_response
    chain = _chain()
    vel = _band_signal(freqs=(1.5, 3.0))
    counts = apply_response(vel, DELTA, chain)
    rec = remove_response(counts, DELTA, chain, output="VEL",
                          water_level_db=60.0, taper_max_percentage=0.0)
    core = slice(N // 8, -N // 8)
    np.testing.assert_allclose(rec[core], vel[core],
                               atol=2e-3 * np.abs(vel).max())


def test_asymmetric_fir_delay_correction():
    """Asymmetric-FIR phase: a shifted-delta FIR (taps [0,0,1], pure
    2-sample delay at fs=100) is corrected to zero phase when
    Decimation/Correction equals its nominal delay — evalresp's
    default asymmetric-FIR rule; with use_estimated_delay the
    Decimation/Delay value is used instead."""
    from stream2segment_spark.funclib.response import CoefficientsStage
    fs = 100.0
    f = np.linspace(0.0, 45.0, 91)
    raw = CoefficientsStage(numerator=(0.0, 0.0, 1.0),
                            input_sample_rate=fs)
    # uncorrected: full phase of e^{-i w 2/fs}
    np.testing.assert_allclose(raw.transfer(f),
                               np.exp(-2j * np.pi * f * 2 / fs),
                               rtol=0, atol=1e-12)
    fixed = CoefficientsStage(numerator=(0.0, 0.0, 1.0),
                              input_sample_rate=fs, correction=2 / fs)
    np.testing.assert_allclose(fixed.transfer(f), 1.0, rtol=0, atol=1e-12)
    # estimated-delay mode reads .delay, ignores .correction
    est = CoefficientsStage(numerator=(0.0, 0.0, 1.0),
                            input_sample_rate=fs, delay=2 / fs,
                            correction=99.0, use_estimated_delay=True)
    np.testing.assert_allclose(est.transfer(f), 1.0, rtol=0, atol=1e-12)
    # symmetric filters are centered instead and IGNORE the correction
    sym = CoefficientsStage(numerator=(0.25, 0.5, 0.25),
                            input_sample_rate=fs, correction=0.5)
    np.testing.assert_allclose(sym.transfer(f).imag, 0.0, atol=1e-12)


ASYM_FIR_XML = MULTISTAGE_XML.replace(
    """       <Symmetry>ODD</Symmetry>
       <NumeratorCoefficient i="0">0.25</NumeratorCoefficient>
       <NumeratorCoefficient i="1">0.5</NumeratorCoefficient>""",
    """       <Symmetry>NONE</Symmetry>
       <NumeratorCoefficient i="0">0.0</NumeratorCoefficient>
       <NumeratorCoefficient i="1">0.0</NumeratorCoefficient>
       <NumeratorCoefficient i="2">1.0</NumeratorCoefficient>""").replace(
    """       <InputSampleRate>200.0</InputSampleRate>
       <Factor>2</Factor>""",
    """       <InputSampleRate>200.0</InputSampleRate>
       <Factor>2</Factor>
       <Delay>0.01</Delay>
       <Correction>0.01</Correction>""")


def test_parse_decimation_delay_correction():
    """The parser picks up Decimation/Delay+Correction, and the parsed
    asymmetric FIR stage (a 2-sample delay at 200 Hz = 0.01 s, fully
    corrected) contributes zero phase — the chain equals the same chain
    with a flat FIR."""
    from stream2segment_spark.funclib.response import (
        parse_stationxml_response)
    chain = parse_stationxml_response(ASYM_FIR_XML, network="GE",
                                      station="APE", channel="BHZ")
    fir = chain.stages[2]
    assert fir.symmetry == "NONE"
    assert fir.delay == pytest.approx(0.01)
    assert fir.correction == pytest.approx(0.01)
    assert fir.use_estimated_delay is False
    f = np.linspace(0.1, 40.0, 53)
    np.testing.assert_allclose(fir.transfer(f), 1.0, rtol=0, atol=1e-12)
    est = parse_stationxml_response(ASYM_FIR_XML, network="GE",
                                    station="APE", channel="BHZ",
                                    use_estimated_delay=True)
    assert est.stages[2].use_estimated_delay is True
    np.testing.assert_allclose(est.stages[2].transfer(f), 1.0,
                               rtol=0, atol=1e-12)


def test_asym_fir_correction_removes_time_shift():
    """End-to-end: 'Correction' means the datalogger already shifted the
    record timestamps by the FIR delay, so field-corrected counts are
    UNSHIFTED relative to ground motion. Deconvolving them through the
    corrected chain recovers the ground motion in place; using the
    uncorrected chain double-counts the delay and advances the output
    by the 2 samples."""
    from stream2segment_spark.funclib.response import (
        ChannelResponse, CoefficientsStage, remove_response)
    fs, n = 100.0, N
    delay_s = 2 / fs
    asym = CoefficientsStage(numerator=(0.0, 0.0, 1.0),
                             input_sample_rate=fs, correction=delay_s)
    uncorr = CoefficientsStage(numerator=(0.0, 0.0, 1.0),
                               input_sample_rate=fs)
    vel = _band_signal(freqs=(1.5, 3.0))
    # field-corrected counts: the logger compensated the FIR delay,
    # so counts align with ground motion (gain 1)
    counts = vel.copy()
    core = slice(n // 8, -n // 8)
    rec = remove_response(
        counts, 1 / fs,
        ChannelResponse(stages=(asym,), input_units="M/S"),
        output="VEL", water_level_db=120.0, taper_max_percentage=0.0)
    np.testing.assert_allclose(rec[core], vel[core],
                               atol=2e-3 * np.abs(vel).max())
    rec_shifted = remove_response(
        counts, 1 / fs,
        ChannelResponse(stages=(uncorr,), input_units="M/S"),
        output="VEL", water_level_db=120.0, taper_max_percentage=0.0)
    np.testing.assert_allclose(rec_shifted[core], np.roll(vel, -2)[core],
                               atol=2e-3 * np.abs(vel).max())


def test_multistage_reduces_to_paz_when_fir_flat():
    """A chain whose digital stages are flat (gain-only) must equal the
    PAZ+sensitivity path exactly in-band."""
    from stream2segment_spark.funclib.response import (
        ChannelResponse, PolesZerosStage)
    paz = parse_stationxml_paz(STATIONXML)
    chain = ChannelResponse(
        stages=(PolesZerosStage(poles=paz.poles, zeros=paz.zeros,
                                normalization=paz.normalization, gain=1.0),),
        sensitivity=paz.sensitivity, input_units=paz.input_units)
    f = np.linspace(0.1, 40.0, 79)
    np.testing.assert_allclose(chain.frequency_response(f),
                               paz.frequency_response(f), rtol=1e-12)

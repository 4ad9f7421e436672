"""Known-answer and spec-coverage tests for the pure-stdlib baseline
JPEG codec (operators/jpeg_codec.py) — the round-11 closure of VERDICT
r10 "What's missing #3".

Coverage strategy (JPEG is lossy, so exactness needs care):
- DC-exact round-trips: uniform 8x8 blocks with even level offsets
  quantize without remainder -> pixel-exact assertions.
- Lossy round-trips: bounded max error on smooth content; decode
  stability under restart markers.
- REAL third-party file: CPython's 543-byte test/imghdrdata/python.jpg
  (16x16 RGB Python logo, libjpeg-encoded with OPTIMIZED Huffman tables
  and 4:2:0-style framing none of our encoder paths produce) is
  embedded below — parsing it proves the decoder reads real-world
  streams, not just its own encoder's output.
- PROGRESSIVE (SOF2, round 11): decode(progressive_encode(img)) must
  equal decode(baseline_encode(img)) pixel-for-pixel (progressive only
  reorders the quantized spectrum) — fixed cases + a hypothesis
  property; plus a real libjpeg progressive file from Spark's own
  distribution.
- Honest failure modes: arithmetic/12-bit raise NotImplementedError
  naming the mode; truncation raises ValueError.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from domanda_etl_spark.operators.jpeg_codec import (  # noqa: E402
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    ZIGZAG,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
)
from domanda_etl_spark.operators.multimodal import decode_image  # noqa: E402

# CPython Lib/test/imghdrdata/python.jpg (PSF-licensed test data): a real
# libjpeg-produced 16x16 RGB baseline JPEG with optimized Huffman tables.
PYTHON_JPG = bytes.fromhex(
    "ffd8ffe000104a46494600010101000100010000ffdb00430003020202020203020202030303"
    "0304060404040404080606050609080a0a090809090a0c0f0c0a0b0e0b09090d110d0e0f1010"
    "11100a0c12131210130f101010ffdb00430103030304030408040408100b090b101010101010"
    "1010101010101010101010101010101010101010101010101010101010101010101010101010"
    "101010101010ffc00011080010001003012200021101031101ffc40016000101010000000000"
    "0000000000000000070405ffc400241000010401040202030000000000000000010203040605"
    "0708121311220014093132ffc4001501010100000000000000000000000000000006ffc40023"
    "1100010205030500000000000000000000010211030405062100123115166181e1ffda000c03"
    "010002110311003f0014a6d26a1b73c1e61312d4951cf31163e42565beba5aec694540b1e520"
    "b254a51fd2cab8faf220ab963d976c9335e69b77d7e66da71781a5571c7f1cea71e24b39d7e3"
    "2253f21a69ded4714a38b482e84b892a71691ecd2d213bf1efb91a74aceea15a758ed548ac65"
    "5b858b81857b21299867a96b94b949654fb9c88529114b812af07ad9f23c807e55be0df662a1"
    "40cce8e69a3d5cb743b3d77a6558b1d9512188bf64b8d3f1c3680429c0d0febb3c02e03c5407"
    "b4bdd97b54e627fb6edf9460148262138db8529828370589727960e432896fc3828ea7528cea"
    "208dbe78191f07ad7fffd9"
)


def test_annex_k_tables_consistent():
    """BITS sums match HUFFVAL lengths and every code set is prefix-free
    (no code is a prefix of another at a greater length)."""
    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    assert sum(AC_CHROMA_BITS) == len(AC_CHROMA_VALS) == 162
    for bits, vals in ((AC_LUMA_BITS, AC_LUMA_VALS), (AC_CHROMA_BITS, AC_CHROMA_VALS)):
        codes = _build_codes(bits, vals)
        seen = {}
        for sym, (ln, cd) in codes.items():
            seen[(ln, cd)] = sym
        for ln, cd in list(seen):
            for ln2 in range(1, ln):
                assert (ln2, cd >> (ln - ln2)) not in seen, "prefix violation"


def test_zigzag_is_standard():
    """Spot-pin the generated zigzag order against the published table's
    anchor entries (start, first diagonals, end)."""
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dc_exact_roundtrip_grayscale():
    """Uniform 8x8 quadrants with even level offsets round-trip EXACTLY
    (DC = 8*(v-128) is a multiple of Q[0,0]=16) — the invariant the
    image_decode_jpeg driver query's oracle relies on."""
    img = np.zeros((16, 16), np.uint8)
    img[0:8, 0:8] = 64
    img[0:8, 8:16] = 190
    img[8:16, 0:8] = 128
    img[8:16, 8:16] = 66
    d = decode_jpeg(encode_jpeg(img))
    assert (d["width"], d["height"], d["mode"]) == (16, 16, "L")
    assert np.array_equal(d["pixels"][:, :, 0], img)


def test_dc_exact_with_restart_markers():
    """Same image, restart interval 1: DRI framing, RSTn resync, and DC
    predictor resets must not change a single pixel."""
    img = np.zeros((16, 16), np.uint8)
    img[0:8, 0:8] = 100
    img[0:8, 8:16] = 102
    img[8:16, 0:8] = 104
    img[8:16, 8:16] = 106
    d = decode_jpeg(encode_jpeg(img, restart_interval=1))
    assert np.array_equal(d["pixels"][:, :, 0], img)


def test_lossy_roundtrip_bounded_error_gradient():
    """Smooth gradient (AC energy concentrated in low frequencies, where
    Annex K quant steps are small): max error must stay tiny."""
    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    err = np.abs(d["pixels"][:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 6


def test_ac_runs_and_zrl_roundtrip():
    """A sparse impulse pattern forces long zero runs (ZRL symbols) and
    high-frequency AC codes; decode must reproduce encode's quantized
    spectrum (re-encoding the decoded image is a fixpoint)."""
    img = np.full((8, 8), 128, np.uint8)
    img[0, 7] = 255
    img[7, 0] = 0
    once = decode_jpeg(encode_jpeg(img))["pixels"][:, :, 0]
    twice = decode_jpeg(encode_jpeg(once))["pixels"][:, :, 0]
    assert np.array_equal(once, twice)


def test_color_444_uniform_bounded():
    """Uniform RGB through YCbCr and back: error bounded by the two
    float->int roundings (<= 2 per channel)."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :] = (200, 100, 50)
    d = decode_jpeg(encode_jpeg(img))
    assert d["mode"] == "RGB"
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 2


def test_color_420_subsampling_shape_and_error():
    """4:2:0 with non-multiple-of-16 dimensions: correct crop and
    bounded error on chroma-flat content (gray ramp)."""
    x = np.linspace(40, 215, 21)
    ramp = np.tile(x, (19, 1))
    img = np.stack([ramp] * 3, axis=2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    assert d["pixels"].shape == (19, 21, 3)
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 8


def test_decodes_real_libjpeg_file():
    """The embedded CPython python.jpg: real optimized Huffman tables,
    real libjpeg entropy stream. Dims/mode are ground truth; the logo's
    blue and yellow both appear (hue sanity on the color transform)."""
    d = decode_jpeg(PYTHON_JPG)
    assert (d["width"], d["height"], d["mode"]) == (16, 16, "RGB")
    px = d["pixels"].astype(int)
    # Python-logo hues: some pixel clearly blue-dominant, some yellow-ish
    assert (px[:, :, 2] - px[:, :, 0] > 40).any(), "no blue-dominant pixel"
    assert ((px[:, :, 0] > 150) & (px[:, :, 1] > 120) & (px[:, :, 2] < 120)).any(), (
        "no yellow-dominant pixel"
    )


def test_progressive_equals_baseline_fixed():
    """Progressive transmission only reorders the quantized spectrum, so
    the two encoders' streams must decode to IDENTICAL pixels — the
    exact cross-check that validates both the SOF2 decoder and the
    progressive scan-script encoder (DC Al=1 + refinement, per-band AC
    first scans, AC refinement with buffered correction bits)."""
    from domanda_etl_spark.operators.jpeg_codec import encode_jpeg_progressive

    rng = np.random.RandomState(7)
    for shape, sub in [
        ((24, 24), "4:4:4"),
        ((19, 21, 3), "4:2:0"),
        ((16, 16, 3), "4:4:4"),
        ((1, 2), "4:4:4"),
    ]:
        img = rng.randint(0, 256, shape, np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling=sub))["pixels"]
        prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))["pixels"]
        assert np.array_equal(base, prog), (shape, sub)


def test_decodes_real_progressive_files():
    """Real libjpeg-produced PROGRESSIVE files (custom EOBn Huffman
    tables, multi-scan successive approximation none of our encoder
    paths produce).  Spark's own distribution ships one, so the path is
    stable in this environment; skip gracefully elsewhere."""
    import os

    path = (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg"
    )
    if not os.path.exists(path):
        pytest.skip("Spark mllib test image not present")
    d = decode_jpeg(open(path, "rb").read())
    assert (d["width"], d["height"], d["mode"]) == (300, 215, "L")
    px = d["pixels"].astype(int)
    assert 100 < px.mean() < 200  # photographic content, not garbage
    assert px.std() > 20


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker (ADVICE r11): inject fills after SOI, before the first RST0,
    and before EOI — the decode must be byte-identical to the clean
    stream's. Our encoder and libjpeg never emit fill, so this is
    foreign-stream robustness only."""
    img = np.zeros((16, 16), np.uint8)
    img[0:8, 0:8] = 100
    img[0:8, 8:16] = 102
    img[8:16, 0:8] = 104
    img[8:16, 8:16] = 106
    blob = encode_jpeg(img, restart_interval=1)
    clean = decode_jpeg(blob)["pixels"]
    padded = bytearray(blob)
    assert padded[-2:] == b"\xff\xd9"
    padded[-2:-2] = b"\xff\xff\xff"  # fill before EOI (scan-end search)
    sos = bytes(padded).find(b"\xff\xda")
    rst = bytes(padded).find(b"\xff\xd0", sos)
    assert rst > sos  # restart_interval=1 guarantees an RST0
    padded[rst:rst] = b"\xff"  # fill before RST0 (sync_restart)
    padded[2:2] = b"\xff\xff"  # fill right after SOI (marker loop)
    d = decode_jpeg(bytes(padded))
    assert np.array_equal(d["pixels"], clean)
    assert np.array_equal(d["pixels"][:, :, 0], img)


def test_arithmetic_raises_named():
    img = np.full((8, 8), 128, np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(blob))


def test_truncated_raises():
    img = np.full((16, 16), 128, np.uint8)
    blob = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])


def test_truncated_fill_byte_tail_raises_valueerror():
    """ADVICE r12: a stream cut mid-header whose tail is a run of 0xFF fill
    bytes must fail with the decoder's documented ValueError, not IndexError
    from reading past the end after the fill-skip loop."""
    img = np.full((8, 8), 128, np.uint8)
    blob = encode_jpeg(img)
    i = blob.find(b"\xff\xdb")  # cut just before a real marker...
    truncated = blob[:i] + b"\xff\xff\xff"  # ...and end in fill bytes
    with pytest.raises(ValueError, match="fill bytes run to EOF"):
        decode_jpeg(truncated)


def test_decode_image_dispatches_jpeg():
    """multimodal.decode_image now routes 0xFFD8 payloads to the real
    codec (the NotImplementedError narrowed to genuinely-absent modes)."""
    img = np.full((8, 8), 130, np.uint8)
    d = decode_image(encode_jpeg(img))
    assert (d["width"], d["height"], d["mode"]) == (8, 8, "L")
    assert np.array_equal(d["pixels"][:, :, 0], img)


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    rst=st.sampled_from([0, 1, 3]),
)
def test_jpeg_roundtrip_shape_and_stability(h, w, seed, sub, rst):
    """Any HxW (including non-multiple-of-8/16 crops, 1x1, 1xN):
    decode(encode(img)) preserves exact dimensions, decode is
    deterministic (same bytes -> same pixels), and a re-encode
    generation drifts by a bounded amount (re-save stability).  A strict
    re-encode FIXPOINT is NOT asserted — it genuinely does not hold:
    pixel rounding/clipping perturbs coefficients near quantization-bin
    boundaries (hypothesis falsified the naive fixpoint even on
    MCU-aligned dims; stress run: 234/300 random images differ in
    generation 2, max drift 9)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), np.uint8)
    blob = encode_jpeg(img, subsampling=sub, restart_interval=rst)
    d = decode_jpeg(blob)
    assert (d["height"], d["width"]) == (h, w)
    assert d["pixels"].shape == (h, w, 1)
    assert np.array_equal(decode_jpeg(blob)["pixels"], d["pixels"])
    # re-save drift bound only on MCU-ALIGNED dims (stress runs: max 19
    # over 700 random aligned images; bound 48 = 2.5x observed worst —
    # the property exists to catch entropy desync, whose drift is
    # hundreds or an exception, not to measure quantization physics).
    # Cropped dims are exempt — re-padding the cropped reconstruction
    # feeds different pad content into the shared edge blocks, and
    # high-frequency Annex K steps (~100) make per-pixel drift up to
    # ~50 legitimate there, not a codec bug (hypothesis found 34 on 2x4).
    mcu = 16 if sub == "4:2:0" else 8
    ha, wa = max(1, h // mcu) * mcu, max(1, w // mcu) * mcu
    img2 = rng.randint(0, 256, (ha, wa), np.uint8)
    once = decode_jpeg(
        encode_jpeg(img2, subsampling=sub, restart_interval=rst)
    )["pixels"][:, :, 0]
    twice = decode_jpeg(
        encode_jpeg(once, subsampling=sub, restart_interval=rst)
    )["pixels"][:, :, 0]
    assert np.abs(once.astype(int) - twice.astype(int)).max() <= 48


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bh=st.integers(min_value=1, max_value=3),
    bw=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_dc_exact_property(bh, bw, seed):
    """ANY block grid of uniform 8x8 tiles with even level offsets
    round-trips pixel-exactly — the invariant the image_decode_jpeg
    driver query's oracle is built on, generalized beyond the fixed
    2x2-quadrant fixture (random grid shapes, random even values,
    cross-block DC-prediction chains of random sign patterns)."""
    rng = np.random.RandomState(seed)
    vals = 64 + 2 * rng.randint(0, 64, (bh, bw))
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(d["pixels"][:, :, 0], img)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    color=st.booleans(),
    sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
)
def test_progressive_equals_baseline_property(h, w, seed, color, sub):
    """Property form of the progressive==baseline exactness: any random
    image, any dims (crops included), gray or RGB, either subsampling."""
    from domanda_etl_spark.operators.jpeg_codec import encode_jpeg_progressive

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3) if color else (h, w), np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsampling=sub))["pixels"]
    prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))["pixels"]
    assert np.array_equal(base, prog)


def test_422_subsampling_shape_and_error():
    """4:2:2 (horizontal-only chroma subsample, the broadcast/video
    default): correct crop on odd dims and tight error on chroma-flat
    content; sampling factors (2,1) exercise the decoder's asymmetric
    upsample path."""
    x = np.linspace(40, 215, 21)
    ramp = np.tile(x, (19, 1))
    img = np.stack([ramp] * 3, axis=2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, subsampling="4:2:2"))
    assert d["pixels"].shape == (19, 21, 3)
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 8

"""Vendored baseline JPEG codec (functions/jpeg.py) vs an INDEPENDENT
reference: fixtures are built from quantized coefficient blocks (entropy
coding is lossless on coefficients), expected pixels are computed here
with a separate double-loop implementation of the pinned decode formulas
(naive float64 IDCT, round half up, clamp, replicate upsampling, JFIF
color transform), and the decoder must reproduce them byte-for-byte —
validating the marker walk, Huffman tables, zigzag, dequant, IDCT,
subsampling, and color chain end to end."""

from __future__ import annotations

import io
import math

import numpy as np
import pytest

from solana_etl_spark.functions import jpeg


# ---- independent reference (double loops, no shared code paths) ----------


def _ref_idct_block(coeffs):
    """Direct 2-D cosine sum over a dequantized 8x8 block."""
    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    acc += (
                        0.25
                        * cu
                        * cv
                        * coeffs[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = acc
    return out


def _rhu(x):
    return max(0, min(255, int(math.floor(x + 0.5))))


def _ref_plane(blocks, bw, bh, qtable):
    """Quantized blocks (natural order, raster) → sample plane
    (bh*8 × bw*8) via dequant + reference IDCT + level shift."""
    plane = [[0] * (bw * 8) for _ in range(bh * 8)]
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, bw)
        deq = [
            [blk[v * 8 + u] * qtable[v * 8 + u] for u in range(8)]
            for v in range(8)
        ]
        spat = _ref_idct_block(deq)
        for y in range(8):
            for x in range(8):
                plane[by * 8 + y][bx * 8 + x] = _rhu(spat[y][x] + 128.0)
    return plane


def _ref_gray(blocks, width, height, qtable=jpeg.STD_LUMA_QUANT):
    bw, bh = (width + 7) // 8, (height + 7) // 8
    plane = _ref_plane(blocks, bw, bh, qtable)
    return bytes(plane[y][x] for y in range(height) for x in range(width))


def _ref_color444(yb, cbb, crb, width, height):
    bw, bh = (width + 7) // 8, (height + 7) // 8
    yp = _ref_plane(yb, bw, bh, jpeg.STD_LUMA_QUANT)
    cbp = _ref_plane(cbb, bw, bh, jpeg.STD_CHROMA_QUANT)
    crp = _ref_plane(crb, bw, bh, jpeg.STD_CHROMA_QUANT)
    out = bytearray()
    for y in range(height):
        for x in range(width):
            Y, cb, cr = yp[y][x], cbp[y][x] - 128.0, crp[y][x] - 128.0
            out.append(_rhu(Y + 1.402 * cr))
            out.append(_rhu(Y - 0.344136 * cb - 0.714136 * cr))
            out.append(_rhu(Y + 1.772 * cb))
    return bytes(out)


def _ref_color420(yb, cbb, crb, width, height):
    mcux, mcuy = (width + 15) // 16, (height + 15) // 16
    yp = _ref_plane(yb, mcux * 2, mcuy * 2, jpeg.STD_LUMA_QUANT)
    cbp = _ref_plane(cbb, mcux, mcuy, jpeg.STD_CHROMA_QUANT)
    crp = _ref_plane(crb, mcux, mcuy, jpeg.STD_CHROMA_QUANT)
    out = bytearray()
    for y in range(height):
        for x in range(width):
            Y = yp[y][x]
            cb = cbp[y // 2][x // 2] - 128.0  # replicate upsample
            cr = crp[y // 2][x // 2] - 128.0
            out.append(_rhu(Y + 1.402 * cr))
            out.append(_rhu(Y - 0.344136 * cb - 0.714136 * cr))
            out.append(_rhu(Y + 1.772 * cb))
    return bytes(out)


def _blocks(rng, n, dc_range=60, n_ac=4):
    """Deterministic quantized coefficient blocks: a DC value plus a few
    low-frequency ACs — the exactly-representable fixture family."""
    out = []
    for _ in range(n):
        blk = [0] * 64
        blk[0] = int(rng.integers(-dc_range, dc_range + 1))
        for _ in range(n_ac):
            pos = int(rng.integers(1, 10))
            blk[pos] = int(rng.integers(-8, 9))
        out.append(blk)
    return out


# ---- decode parity --------------------------------------------------------


@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (13, 9), (21, 17)])
def test_gray_decode_matches_reference(dims):
    w, h = dims
    rng = np.random.default_rng(w * 100 + h)
    blocks = _blocks(rng, ((w + 7) // 8) * ((h + 7) // 8))
    payload = jpeg.encode_gray_coeffs(blocks, w, h)
    with jpeg.open(io.BytesIO(payload)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 1)
        assert im.tobytes() == _ref_gray(blocks, w, h)


def test_color_444_decode_matches_reference():
    w, h = 19, 14
    rng = np.random.default_rng(4)
    n = ((w + 7) // 8) * ((h + 7) // 8)
    yb, cbb, crb = _blocks(rng, n), _blocks(rng, n, 20, 2), _blocks(rng, n, 20, 2)
    payload = jpeg.encode_color_coeffs(yb, cbb, crb, w, h)
    with jpeg.open(io.BytesIO(payload)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 3)
        assert im.tobytes() == _ref_color444(yb, cbb, crb, w, h)


def test_color_420_decode_matches_reference():
    w, h = 23, 18
    rng = np.random.default_rng(20)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    yb = _blocks(rng, mcux * 2 * mcuy * 2)
    cbb = _blocks(rng, mcux * mcuy, 20, 2)
    crb = _blocks(rng, mcux * mcuy, 20, 2)
    payload = jpeg.encode_color_coeffs(yb, cbb, crb, w, h, subsample=True)
    with jpeg.open(io.BytesIO(payload)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 3)
        assert im.tobytes() == _ref_color420(yb, cbb, crb, w, h)


def test_resize_and_context_manager():
    rng = np.random.default_rng(7)
    blocks = _blocks(rng, 4)
    payload = jpeg.encode_gray_coeffs(blocks, 16, 16)
    with jpeg.open(io.BytesIO(payload)) as im:
        small = im.resize((4, 4))
        assert (small.width, small.height) == (4, 4)
        full = im.tobytes()
        # nearest-neighbor: sampled pixels come from the source grid
        for y in range(4):
            for x in range(4):
                assert (
                    small.tobytes()[y * 4 + x]
                    == full[(y * 16 // 4) * 16 + (x * 16 // 4)]
                )


# ---- error contracts ------------------------------------------------------


def test_undecodable_payloads_raise_valueerror():
    rng = np.random.default_rng(3)
    good = jpeg.encode_gray_coeffs(_blocks(rng, 1), 8, 8)
    for bad in (
        b"",
        b"\x00\x01",
        b"\x89PNG\r\n\x1a\n" + b"x" * 30,  # a PNG is not a JPEG
        good[:20],  # truncated mid-segment
        good[:-10],  # truncated entropy data... may decode partially
    ):
        try:
            with jpeg.open(io.BytesIO(bad)) as im:
                im.tobytes()
        except ValueError:
            continue
        # the -10 truncation can still terminate cleanly on EOB padding
        assert bad == good[:-10]


@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (13, 9), (21, 17)])
def test_progressive_gray_matches_baseline(dims):
    """Progressive re-encode of the same coefficient blocks decodes
    bit-identically to the baseline encoding — the entropy layout
    changes (spectral bands + successive approximation), the
    coefficients do not."""
    w, h = dims
    rng = np.random.default_rng(w * 100 + h)
    blocks = _blocks(rng, ((w + 7) // 8) * ((h + 7) // 8))
    prog = jpeg.encode_progressive_gray_coeffs(blocks, w, h)
    assert prog != jpeg.encode_gray_coeffs(blocks, w, h)
    with jpeg.open(io.BytesIO(prog)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 1)
        assert im.tobytes() == _ref_gray(blocks, w, h)


def test_progressive_color_matches_baseline():
    w, h = 19, 14
    rng = np.random.default_rng(4)
    n = ((w + 7) // 8) * ((h + 7) // 8)
    yb, cbb, crb = _blocks(rng, n), _blocks(rng, n, 20, 2), _blocks(rng, n, 20, 2)
    prog = jpeg.encode_progressive_color_coeffs(yb, cbb, crb, w, h)
    with jpeg.open(io.BytesIO(prog)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 3)
        assert im.tobytes() == _ref_color444(yb, cbb, crb, w, h)


def test_progressive_color_420_matches_baseline():
    """Progressive 4:2:0 — non-interleaved AC scans traverse only each
    component's own block grid while the interleaved DC scans cover the
    MCU-padded luma grid; visible pixels must equal the baseline
    encoding of the same blocks."""
    w, h = 23, 18
    rng = np.random.default_rng(20)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    yb = _blocks(rng, mcux * 2 * mcuy * 2)
    cbb = _blocks(rng, mcux * mcuy, 20, 2)
    crb = _blocks(rng, mcux * mcuy, 20, 2)
    prog = jpeg.encode_progressive_color_coeffs(
        yb, cbb, crb, w, h, subsample=True
    )
    with jpeg.open(io.BytesIO(prog)) as im:
        assert (im.width, im.height, im.channels) == (w, h, 3)
        assert im.tobytes() == _ref_color420(yb, cbb, crb, w, h)


def test_progressive_refinement_stress():
    """Large coefficients, magnitude-1 coefficients (newly significant in
    the refinement scan), long zero runs (ZRL + buffered correction
    bits) — the full G.2 AC refinement machinery must round-trip."""
    rng = np.random.default_rng(11)
    blocks = []
    for _ in range(9):
        blk = [0] * 64
        blk[0] = int(rng.integers(-500, 501))
        for pos in rng.choice(np.arange(1, 64), size=12, replace=False):
            blk[int(pos)] = int(rng.integers(-80, 81))
        for pos in rng.choice(np.arange(1, 64), size=6, replace=False):
            blk[int(pos)] = int(rng.choice([-1, 1]))
        blocks.append(blk)
    prog = jpeg.encode_progressive_gray_coeffs(blocks, 24, 24)
    with jpeg.open(io.BytesIO(prog)) as im:
        assert im.tobytes() == _ref_gray(blocks, 24, 24)


def test_progressive_truncation_raises():
    rng = np.random.default_rng(5)
    blocks = _blocks(rng, 4)
    prog = jpeg.encode_progressive_gray_coeffs(blocks, 16, 16)
    with pytest.raises(ValueError, match="jpeg"):
        with jpeg.open(io.BytesIO(prog[: len(prog) // 2])) as im:
            im.tobytes()


def test_unsupported_frames_still_rejected_by_name():
    rng = np.random.default_rng(5)
    good = bytearray(jpeg.encode_gray_coeffs(_blocks(rng, 1), 8, 8))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC3  # SOF3 lossless sequential
    with pytest.raises(ValueError, match="baseline"):
        jpeg.open(io.BytesIO(bytes(good)))


def test_dimension_bomb_guard():
    rng = np.random.default_rng(6)
    good = bytearray(jpeg.encode_gray_coeffs(_blocks(rng, 1), 8, 8))
    sof = good.find(b"\xff\xc0")
    # height/width fields at SOF body offset: marker(2) + len(2) + prec(1)
    good[sof + 5 : sof + 9] = (65000).to_bytes(2, "big") + (65000).to_bytes(
        2, "big"
    )
    with pytest.raises(ValueError, match="implausible|truncated"):
        jpeg.open(io.BytesIO(bytes(good)))


# ---- multimodal wiring ----------------------------------------------------


def test_decode_dims_routes_jpeg_to_vendored_decoder():
    from solana_etl_spark.operators.multimodal import decode_dims

    rng = np.random.default_rng(9)
    payload = jpeg.encode_gray_coeffs(_blocks(rng, 6), 21, 14)
    assert decode_dims(payload, "image/jpeg") == (21, 14)
    # corrupt JPEG of a decodable mime raises (error isolation contract)
    with pytest.raises(ValueError):
        decode_dims(b"\xff\xd8 garbage", "image/jpeg")
    # unknown image mimes still take the deterministic stub
    assert decode_dims(b"abc", "image/webp") == (
        len(b"abc") % 640 + 1,
        len(b"abc") % 480 + 1,
    )


# ---- batched IDCT (r10) ----------------------------------------------------


def test_batched_idct_bit_identical_to_scalar():
    """_idct_blocks (the batched numpy IDCT every decode path now uses)
    must reproduce _idct_block_pixels bit-for-bit, including blocks with
    zero rows/terms (the scalar form's skip branches) and rounding-edge
    magnitudes."""
    rng = np.random.default_rng(1234)
    blocks = []
    for i in range(200):
        blk = rng.integers(-2048, 2048, size=(8, 8)).astype(np.int64)
        if i % 3 == 0:
            blk[rng.integers(0, 8)] = 0  # whole zero row (skip branch)
        if i % 5 == 0:
            blk[:, rng.integers(0, 8)] = 0
        if i % 7 == 0:
            blk[:] = 0  # all-zero block -> flat 128
        blocks.append(blk)
    deq = np.stack(blocks).astype(np.float64)
    batched = jpeg._idct_blocks(deq)
    for i, blk in enumerate(blocks):
        scalar = jpeg._idct_block_pixels([list(r) for r in blk])
        assert batched[i].tolist() == scalar, f"block {i} diverged"

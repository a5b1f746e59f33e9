"""Entropy coding: codelength estimators + adaptive Golomb / exp-Golomb.

Two faces:

1. *Estimator parity* — bit-for-bit reproduction of the reference's
   codelength arithmetic (the reference never emits a bitstream; its "coders"
   only keep ``bitcount`` counters — GolombCoder.cpp:26, eg.cpp:26-35):
     * ``enum_codelength``      == enumL / enumerative_codelength
       (coding.cpp:19-22; every compress driver re-defines a local copy,
       e.g. compress8_test.cpp:25-28)
     * ``universal_codelength`` == coding.cpp:24-32
     * ``GolombCoder``          == GolombCoder.cpp:13-34 (adaptive Rice)
     * ``EGCoder``              == eg.cpp:20-37 (run-length; the shipped code
       never calls incBlockSize — it is commented out at eg.cpp:25 — so the
       adaptation is inert; we reproduce that exactly, and additionally offer
       the evidently-intended adaptive MELCODE with ``adaptive=True``)

2. *Real codes* — actual encode/decode (the part the reference never
   finished: GolombDecoder.h:13 includes a non-existent BinaryFileReader.h,
   eg.cpp:39-56 is #if 0).  Formats are defined in bitstream.py; the
   enumerative code is the exact combinatorial-number-system rank.

GSL note: the reference computes lnchoose via GSL (gsl_sf_lnchoose,
coding.cpp:1).  We use the identity lnchoose(n,r) = lgamma(n+1) - lgamma(r+1)
- lgamma(n-r+1) with the platform libm lgamma; goldens are generated with the
same formula (see scripts/build_reference.sh), so parity is exact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

COSMOS_LOG2E = 1.442695040888963387004650940070860087872  # coding.h:10

_U32 = 0xFFFFFFFF


def lnchoose(n: int, r: int) -> float:
    """ln C(n, r) — drop-in for gsl_sf_lnchoose."""
    if r > n:
        raise ValueError("r > n")
    if r == n or r == 0:
        return 0.0
    return math.lgamma(n + 1) - math.lgamma(r + 1) - math.lgamma(n - r + 1)


def enum_codelength(n: int, r: int) -> float:
    """log2 C(n,r) in bits; 0 for r == 0 (reference enumL, coding.cpp:19)."""
    return lnchoose(n, r) * COSMOS_LOG2E if r > 0 else 0.0


def universal_codelength(n: int, r: int) -> float:
    """n*H(r/n) + 0.5*log2(n) (reference coding.cpp:24-32)."""
    if 0 < r < n:
        p1 = r / n
        return n * (-p1 * math.log2(p1) - (1.0 - p1) * math.log2(1.0 - p1)) \
            + 0.5 * math.log2(n)
    return 0.5 * math.log2(n)


# jnp twins for in-graph codelength math ------------------------------------

def enum_codelength_jnp(n, r):
    """Vectorized log2 C(n,r); exact same formula via lgamma."""
    n = jnp.asarray(n, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    ln = (jax.lax.lgamma(n + 1) - jax.lax.lgamma(r + 1)
          - jax.lax.lgamma(n - r + 1))
    return jnp.where(r > 0, ln * COSMOS_LOG2E, 0.0)


def universal_codelength_jnp(n, r):
    n = jnp.asarray(n, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    p = r / n
    h = -p * jnp.log2(jnp.where(p > 0, p, 1.0)) \
        - (1 - p) * jnp.log2(jnp.where(p < 1, 1 - p, 1.0))
    mid = n * h + 0.5 * jnp.log2(n)
    return jnp.where((r > 0) & (r < n), mid, 0.5 * jnp.log2(n))


# ---------------------------------------------------------------------------
# Adaptive Golomb / Rice (reference Golomb.h:12-29, GolombCoder.cpp:13-34)
# ---------------------------------------------------------------------------

@dataclass
class GolombCoder:
    """Context-adaptive Rice codelength counter, bit-exact vs the reference.

    codeSample(u) adds k + (u >> k) + 1 bits, then re-derives
    k = min{k : (samples << k) >= accumulatedError} from scratch
    (GolombCoder.cpp:29-33).  State arithmetic is 32-bit unsigned, as in C.
    """
    accumulated_error: int = 0
    samples: int = 0
    k: int = 1
    bitcount: int = 0

    def code_sample(self, u: int) -> int:
        nbits = self.k + (int(u) >> self.k) + 1
        self.bitcount += nbits
        self.samples = (self.samples + 1) & _U32
        self.accumulated_error = (self.accumulated_error + int(u)) & _U32
        k = 0
        # C `unsigned` shift: on x86 the count is masked mod 32; cap at 31
        while k < 32 and ((self.samples << k) & _U32) < self.accumulated_error:
            k += 1
        self.k = k
        return nbits


def golomb_scan(samples: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-graph GolombCoder over a 1-D sample stream.

    Returns (per-sample bit lengths int32, final total).  The k-update is the
    reference's from-scratch loop, evaluated branch-free as
    k = max(0, ceil_log2(accErr / samples)) via the 32-candidate comparison.
    """
    samples = jnp.asarray(samples, jnp.uint32)
    ks = jnp.arange(32, dtype=jnp.uint32)

    def step(state, u):
        acc, n, k = state
        nbits = k + (u >> k) + 1
        n = n + 1
        acc = acc + u
        ok = (n << ks) >= acc  # uint32 wraparound matches C shift mod 32
        newk = jnp.argmax(ok).astype(jnp.uint32)  # first k satisfying
        newk = jnp.where(jnp.any(ok), newk, jnp.uint32(31))
        return (acc, n, newk), nbits

    (_, _, _), lens = jax.lax.scan(
        step, (jnp.uint32(0), jnp.uint32(0), jnp.uint32(1)), samples)
    lens = lens.astype(jnp.int32)
    return lens, lens.sum()


# ---------------------------------------------------------------------------
# Adaptive exponential-Golomb run-length (reference eg.h / eg.cpp)
# ---------------------------------------------------------------------------

EGLUT = (0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
         4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15)  # eg.cpp:2


@dataclass
class EGCoder:
    """Run-length coder counter (eg.cpp:20-37).

    ``adaptive=False`` (default) reproduces the reference exactly as shipped:
    codeRun never grows the block (the incBlockSize call is commented out at
    eg.cpp:25), so with the initial blockSize=1 the full-block part is unary.
    ``adaptive=True`` enables the intended MELCODE adaptation (grow on full
    block, shrink on remainder), with the lutIndex clamped to 31 — the
    reference's incBlockSize lets lutIndex reach 32 and reads EGLUT[32] out
    of bounds (eg.cpp:4-10); we do not replicate that UB (DEVIATIONS.md).
    """
    adaptive: bool = False
    g: int = 1          # eg.h ctor
    block_size: int = 1
    lut_index: int = 0
    bitcount: int = 0

    def _inc(self):
        if self.lut_index < 31:
            self.lut_index += 1
        self.g = EGLUT[self.lut_index]
        self.block_size = 1 << self.g

    def _dec(self):
        if self.lut_index > 0:
            self.lut_index -= 1
        self.g = EGLUT[self.lut_index]
        self.block_size = 1 << self.g

    def code_run(self, length: int, eol: bool) -> int:
        n0 = self.bitcount
        while length >= self.block_size:
            length -= self.block_size
            self.bitcount += 1
            if self.adaptive:
                self._inc()
        if eol:
            self.bitcount += 1
        else:
            self.bitcount += self.g + 1
            self._dec()
        return self.bitcount - n0


# ---------------------------------------------------------------------------
# Context-adaptive binary arithmetic coding (codec 12) — Python twin of the
# native LZMA-style range coder (native/bic_native.cpp); used as fallback
# and as the conformance oracle for the C++ implementation.
# ---------------------------------------------------------------------------

class RangeEncoder:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            self.out.append((self.cache + carry) & 0xFF)
            for _ in range(self.cache_size - 1):
                self.out.append((0xFF + carry) & 0xFF)
            self.cache_size = 0
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, p1: int, bit: int):
        bound = (self.range >> 16) * p1
        if bit:
            self.range = bound
        else:
            self.low += bound
            self.range -= bound
        while self.range < (1 << 24):
            self._shift_low()
            self.range <<= 8

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 1  # first byte is the encoder's initial zero cache
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(4):
            self.code = ((self.code << 8) | self._get()) & 0xFFFFFFFF

    def _get(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode_bit(self, p1: int) -> int:
        bound = (self.range >> 16) * p1
        if self.code < bound:
            bit = 1
            self.range = bound
        else:
            bit = 0
            self.code -= bound
            self.range -= bound
        while self.range < (1 << 24):
            self.range <<= 8
            self.code = ((self.code << 8) | self._get()) & 0xFFFFFFFF
        return bit


def cabac_model_update(p: int, bit: int) -> int:
    """16-bit adaptive probability of 1, shift-5 update, clamped."""
    p = p + ((0xFFFF - p) >> 5) if bit else p - (p >> 5)
    return min(max(p, 32), 0xFFDF)


def scab_ramp_shift(n: int) -> int:
    """Count-ramped adaptation rate (codec 13): fresh contexts move with
    shift 2..4 before settling at the steady-state 5, so each independent
    stripe's model warms in tens of pixels instead of thousands."""
    return 2 if n < 2 else 3 if n < 4 else 4 if n < 8 else 5


def scab_model_update(p: int, n: int, bit: int, ramp: bool
                      ) -> tuple[int, int]:
    """Codec-13 model update; returns (new_p, new_count).  Twin of the
    native scab::Model::update (native/bic_native.cpp)."""
    sh = scab_ramp_shift(n) if ramp else 5
    if ramp and n < 8:
        n += 1
    p = p + ((0xFFFF - p) >> sh) if bit else p - (p >> sh)
    return min(max(p, 32), 0xFFDF), n

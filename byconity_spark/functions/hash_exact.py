"""Reference-exact hash implementations for ``strict_hash_compat`` mode.

The fast default for cityHash64/sipHash64/etc. is Spark's JVM-side
xxhash64 — value-stable within this engine but NOT bit-identical to the
reference, which matters only when hash values are persisted or exchanged
cross-engine (bucket assignment, sampling keys, dedup fingerprints written
by the reference and read here, or vice versa).  This module provides the
bit-exact implementations, activated per-call by
``functions.registry.set_strict_hash_compat(True)`` (or env
``BYCONITY_STRICT_HASH_COMPAT=1``).

Reference semantics implemented (src/Functions/FunctionsHashing.h):

* ``cityHash64`` — CityHash v1.0.2 (contrib/cityhash102/src/city.cc) over
  string/binary bytes; POD (numeric) arguments go through
  ``IntHash64Impl::apply(bit_cast<UInt64>(v))`` where IntHash64Impl is
  ``intHash64(x ^ 0x4CF2D2BAAE6DA887)`` (FunctionsHashing.h:168-176 —
  note the ByConity-specific XOR salt, verified against
  tests/queries/4_cnch_stateless/00751_hashing_ints.reference);
  multi-arg combine = ``Hash128to64(uint128(h1, h2))``
  (FunctionsHashing.h:851-860, verified against 00259_hashing_tuples).
* ``sipHash64`` — SipHash-2-4 with zero key over the argument's
  little-endian binary representation (strings = raw bytes); combine =
  sipHash64 over the 16 bytes {h1, h2} (combineHashesFunc,
  FunctionsHashing.h:178-190,325-338).
* ``intHash64`` / ``intHash32`` — the murmur-style finalizer with the
  ByConity XOR salt / the 32-bit mix with salt 0x75D9543DE018BF45
  (FunctionsHashing.h:157-176), verified against
  0_stateless/02184_hash_functions_and_ip_types.reference.
* ``halfMD5`` — first 8 bytes of MD5, big-endian (FunctionsHashing.h:
  HalfMD5Impl); combine = halfMD5 over {h1, h2} LE bytes.
* ``URLHash`` — cityHash64 with one trailing '/', '?' or '#' trimmed
  (src/Functions/URL/URLHash... URLHashImpl).
* ``hiveHash`` — Java String.hashCode over bytes with the sign bit
  cleared (FunctionsHashing.h:833-849).

All vector anchors come from the reference's OWN test outputs, so exact
means exact.  Scale note: these are Arrow UDFs (pyarrow.Array batches —
the declared column type survives, unlike pandas conversion) doing
per-row Python math — 10-100× slower than the JVM xxhash64 default.  That
is the documented cost of the opt-in; workloads that only need a stable
hash keep the fast path.
"""

from __future__ import annotations

import hashlib
import struct

import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_M64 = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_K3 = 0xC949D7C7509E6557
# ByConity's IntHash64Impl XOR salt (FunctionsHashing.h:175)
_INT64_SALT = 0x4CF2D2BAAE6DA887
# IntHash32Impl template salt (FunctionsHashing.h:164)
_INT32_SALT = 0x75D9543DE018BF45


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & _M64


def _f64(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _f32(s: bytes, i: int = 0) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _shift_mix(v: int) -> int:
    v &= _M64
    return (v ^ (v >> 47)) & _M64


def hash128to64(lo: int, hi: int) -> int:
    """CityHash's Hash128to64 — also the cityHash64 multi-arg combiner."""
    kmul = 0x9DDFEA08EB382D69
    a = ((lo ^ hi) * kmul) & _M64
    a ^= a >> 47
    b = ((hi ^ a) * kmul) & _M64
    b ^= b >> 47
    return (b * kmul) & _M64


def _hash_len_16(u: int, v: int) -> int:
    return hash128to64(u & _M64, v & _M64)


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n > 8:
        a = _f64(s)
        b = _f64(s, n - 8)
        r = n & 63
        if r == 0:
            r = 1
        return (_hash_len_16(a, _rot((b + n) & _M64, r)) ^ b) & _M64
    if n >= 4:
        a = _f32(s)
        return _hash_len_16((n + (a << 3)) & _M64, _f32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & _M64
        z = (n + (c << 2)) & _M64
        return (_shift_mix((y * _K2 ^ z * _K3) & _M64) * _K2) & _M64
    return _K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    a = (_f64(s) * _K1) & _M64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * _K2) & _M64
    d = (_f64(s, n - 16) * _K0) & _M64
    return _hash_len_16(
        (_rot((a - b) & _M64, 43) + _rot(c, 30) + d) & _M64,
        (a + _rot((b ^ _K3) & _M64, 20) - c + n) & _M64,
    )


def _weak32(s: bytes, i: int, a: int, b: int) -> tuple:
    w, x, y, z = _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24)
    a = (a + w) & _M64
    b = _rot((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rot(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    z = _f64(s, 24)
    a = (_f64(s) + (n + _f64(s, n - 16)) * _K0) & _M64
    b = _rot((a + z) & _M64, 52)
    c = _rot(a, 37)
    a = (a + _f64(s, 8)) & _M64
    c = (c + _rot(a, 7)) & _M64
    a = (a + _f64(s, 16)) & _M64
    vf = (a + z) & _M64
    vs = (b + _rot(a, 31) + c) & _M64
    a = (_f64(s, 16) + _f64(s, n - 32)) & _M64
    z = _f64(s, n - 8)
    b = _rot((a + z) & _M64, 52)
    c = _rot(a, 37)
    a = (a + _f64(s, n - 24)) & _M64
    c = (c + _rot(a, 7)) & _M64
    a = (a + _f64(s, n - 16)) & _M64
    wf = (a + z) & _M64
    ws = (b + _rot(a, 31) + c) & _M64
    r = _shift_mix(((vf + ws) * _K2 + (wf + vs) * _K0) & _M64)
    return (_shift_mix((r * _K0 + vs) & _M64) * _K2) & _M64


def city_hash_64(s: bytes) -> int:
    """CityHash v1.0.2 CityHash64 (contrib/cityhash102/src/city.cc:205)."""
    n = len(s)
    if n <= 32:
        return _hash_len_0_to_16(s) if n <= 16 else _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)
    x = _f64(s)
    y = (_f64(s, n - 16) ^ _K1) & _M64
    z = (_f64(s, n - 56) ^ _K0) & _M64
    v = _weak32(s, n - 64, n, y)
    w = _weak32(s, n - 32, (n * _K1) & _M64, _K0)
    z = (z + _shift_mix(v[1]) * _K1) & _M64
    x = (_rot((z + x) & _M64, 39) * _K1) & _M64
    y = (_rot(y, 33) * _K1) & _M64
    rem = (n - 1) & ~63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _f64(s, i + 16)) & _M64, 37) * _K1) & _M64
        y = (_rot((y + v[1] + _f64(s, i + 48)) & _M64, 42) * _K1) & _M64
        x ^= w[1]
        y ^= v[0]
        z = _rot((z ^ w[0]) & _M64, 33)
        v = _weak32(s, i, (v[1] * _K1) & _M64, (x + w[0]) & _M64)
        w = _weak32(s, i + 32, (z + w[1]) & _M64, y)
        z, x = x, z
        i += 64
        rem -= 64
        if rem == 0:
            break
    return _hash_len_16(
        (_hash_len_16(v[0], w[0]) + _shift_mix(y) * _K1 + z) & _M64,
        (_hash_len_16(v[1], w[1]) + x) & _M64,
    )


def int_hash_64(x: int) -> int:
    """Reference SQL intHash64 = finalizer(x ^ ByConity salt)."""
    x = (x & _M64) ^ _INT64_SALT
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


def int_hash_32(x: int) -> int:
    """Reference SQL intHash32 (Common/HashTable/Hash.h intHash32<salt>)."""
    key = (x & _M64) ^ _INT32_SALT
    key = ((~key & _M64) + ((key << 18) & _M64)) & _M64
    key ^= (key >> 31) | ((key << 33) & _M64)
    key = (key * 21) & _M64
    key ^= (key >> 11) | ((key << 53) & _M64)
    key = (key + ((key << 6) & _M64)) & _M64
    key ^= (key >> 22) | ((key << 42) & _M64)
    return key & 0xFFFFFFFF


def sip_hash_64(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-2-4, zero key — the reference's sipHash64 (SipHash.h)."""
    v0 = 0x736F6D6570736575 ^ k0
    v1 = 0x646F72616E646F6D ^ k1
    v2 = 0x6C7967656E657261 ^ k0
    v3 = 0x7465646279746573 ^ k1

    def rnd():
        nonlocal v0, v1, v2, v3
        v0 = (v0 + v1) & _M64
        v1 = ((v1 << 13) | (v1 >> 51)) & _M64
        v1 ^= v0
        v0 = ((v0 << 32) | (v0 >> 32)) & _M64
        v2 = (v2 + v3) & _M64
        v3 = ((v3 << 16) | (v3 >> 48)) & _M64
        v3 ^= v2
        v0 = (v0 + v3) & _M64
        v3 = ((v3 << 21) | (v3 >> 43)) & _M64
        v3 ^= v0
        v2 = (v2 + v1) & _M64
        v1 = ((v1 << 17) | (v1 >> 47)) & _M64
        v1 ^= v2
        v2 = ((v2 << 32) | (v2 >> 32)) & _M64

    n = len(data)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = _f64(data, i)
        v3 ^= m
        rnd()
        rnd()
        v0 ^= m
    b = (n & 0xFF) << 56
    for i, ch_ in enumerate(data[end:]):
        b |= ch_ << (8 * i)
    v3 ^= b
    rnd()
    rnd()
    v0 ^= b
    v2 ^= 0xFF
    rnd()
    rnd()
    rnd()
    rnd()
    return (v0 ^ v1 ^ v2 ^ v3) & _M64


def half_md5(data: bytes) -> int:
    """First 8 MD5 bytes as big-endian UInt64 (HalfMD5Impl)."""
    return struct.unpack(">Q", hashlib.md5(data).digest()[:8])[0]


def sip_hash_128(data: bytes, k0: int = 0, k1: int = 0) -> bytes:
    """The reference's LEGACY sipHash128 (Common/SipHash.h get128 with
    is_reference_128=false): SipHash-2-4 body, 64-bit-style 0xff finalize,
    output = LE(v0^v1) || LE(v2^v3) — verified against
    0_stateless/02184 hex(sipHash128(toIPv4('1.2.3.4')))."""
    v0 = 0x736F6D6570736575 ^ k0
    v1 = 0x646F72616E646F6D ^ k1
    v2 = 0x6C7967656E657261 ^ k0
    v3 = 0x7465646279746573 ^ k1

    def rnd():
        nonlocal v0, v1, v2, v3
        v0 = (v0 + v1) & _M64
        v1 = ((v1 << 13) | (v1 >> 51)) & _M64
        v1 ^= v0
        v0 = ((v0 << 32) | (v0 >> 32)) & _M64
        v2 = (v2 + v3) & _M64
        v3 = ((v3 << 16) | (v3 >> 48)) & _M64
        v3 ^= v2
        v0 = (v0 + v3) & _M64
        v3 = ((v3 << 21) | (v3 >> 43)) & _M64
        v3 ^= v0
        v2 = (v2 + v1) & _M64
        v1 = ((v1 << 17) | (v1 >> 47)) & _M64
        v1 ^= v2
        v2 = ((v2 << 32) | (v2 >> 32)) & _M64

    n = len(data)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = _f64(data, i)
        v3 ^= m
        rnd()
        rnd()
        v0 ^= m
    b = (n & 0xFF) << 56
    for i, ch_ in enumerate(data[end:]):
        b |= ch_ << (8 * i)
    v3 ^= b
    rnd()
    rnd()
    v0 ^= b
    v2 ^= 0xFF
    rnd()
    rnd()
    rnd()
    rnd()
    return struct.pack("<QQ", v0 ^ v1, v2 ^ v3)


def url_hash(s: bytes) -> int:
    """cityHash64 with ONE trailing '/', '?' or '#' trimmed (URLHashImpl)."""
    if s and s[-1:] in (b"/", b"?", b"#"):
        s = s[:-1]
    return city_hash_64(s)


def hive_hash(s: bytes) -> int:
    """Java String.hashCode over SIGNED bytes, sign bit cleared
    (HiveHashImpl / JavaHashImpl string branch)."""
    h = 0
    for b in s:
        if b >= 128:
            b -= 256
        h = (h * 31 + b) & 0xFFFFFFFF
    return h & 0x7FFFFFFF


# ---------------------------------------------------------------------------
# per-argument encoding + multi-arg combine, CH semantics
# ---------------------------------------------------------------------------

def _arg_bytes(v, itemsize: int) -> bytes:
    """Little-endian binary representation, CH column layout."""
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, bool):
        return struct.pack("<B", int(v))
    if isinstance(v, float):
        return struct.pack("<f" if itemsize == 4 else "<d", v)
    # integer: two's complement within the column width
    return int(v).to_bytes(itemsize, "little", signed=int(v) < 0)


def _arg_u64(v, itemsize: int) -> int:
    """bit_cast<UInt64> — memcpy of the value's bytes, zero-extended."""
    return int.from_bytes(_arg_bytes(v, itemsize), "little")


def _value_bytes(v, size: int) -> bytes:
    """Canonical bytes for one argument.  ``size == 0`` marks the
    string/binary branch (dispatch is by the DECLARED column type via
    itemsize, never isinstance — runtime Python types lie after Arrow
    conversions, round-8 advisory).  ``size > 0`` PODs may arrive either
    pre-encoded (bytes of exactly ``size``) or as raw Python numbers."""
    if size == 0:
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return _arg_bytes(v, size)


def city64_values(values, itemsizes) -> int:
    """cityHash64(args...) with full reference semantics (string bytes →
    CityHash64; PODs → IntHash64Impl; Hash128to64 combine)."""
    h = None
    for v, size in zip(values, itemsizes):
        b = _value_bytes(v, size)
        if size == 0:
            hv = city_hash_64(b)
        else:
            hv = int_hash_64(int.from_bytes(b, "little"))
        h = hv if h is None else hash128to64(h, hv)
    return h if h is not None else _K2


def sip64_values(values, itemsizes) -> int:
    h = None
    for v, size in zip(values, itemsizes):
        hv = sip_hash_64(_value_bytes(v, size))
        h = hv if h is None else sip_hash_64(struct.pack("<QQ", h, hv))
    return h if h is not None else sip_hash_64(b"")


def sip128_values(values, itemsizes) -> bytes:
    """sipHash128 multi-arg: combine = sipHash128 over the two 16-byte
    states (SipHash128Impl::combineHashes → combineHashesFunc<UInt128>)."""
    h = None
    for v, size in zip(values, itemsizes):
        hv = sip_hash_128(_value_bytes(v, size))
        h = hv if h is None else sip_hash_128(h + hv)
    return h if h is not None else sip_hash_128(b"")


def half_md5_values(values, itemsizes) -> int:
    h = None
    for v, size in zip(values, itemsizes):
        hv = half_md5(_value_bytes(v, size))
        h = hv if h is None else half_md5(struct.pack("<QQ", h, hv))
    return h if h is not None else half_md5(b"")


# ---------------------------------------------------------------------------
# Spark integration: Arrow UDFs (opt-in strict path)
#
# arrow_udf (Spark 4.1) hands each batch as a pyarrow.Array carrying the
# column's DECLARED type: an Int8 column arrives as pa.int8() even when the
# batch contains NULLs, and Float32 arrives as pa.float32().  The previous
# pandas_udf implementation lost exactly that information — Arrow→pandas
# widens nullable ints to float64 and per-value isinstance cannot tell
# float32 from float64 — which silently broke bit-exactness for any batch
# containing a NULL and truncated Float32 values (round-8 advisory).
# Encoding width is now derived from the Arrow field type, nulls from the
# Arrow validity bitmap; NaN is a VALUE (hashed by bit pattern, like the
# reference), not a null.
# ---------------------------------------------------------------------------

def _pa_itemsize(pa_type) -> int:
    """Byte width of the declared column type; 0 = string/binary."""
    if pa.types.is_string(pa_type) or pa.types.is_large_string(pa_type):
        return 0
    if pa.types.is_binary(pa_type) or pa.types.is_large_binary(pa_type):
        return 0
    if pa.types.is_boolean(pa_type):
        return 1
    return pa_type.bit_width // 8


def _pa_encode(v, pa_type, itemsize: int) -> bytes:
    """CH column-layout bytes for a non-null value, width from the DECLARED
    Arrow type (never the runtime Python type)."""
    if itemsize == 0:  # string/binary
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if pa.types.is_floating(pa_type):
        return struct.pack("<f" if itemsize == 4 else "<d", float(v))
    if pa.types.is_boolean(pa_type):
        return struct.pack("<B", int(v))
    iv = int(v)
    return iv.to_bytes(itemsize, "little", signed=iv < 0)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# Vectorized CityHash64 batch kernel (numpy uint64 wraps mod 2^64 natively,
# matching the scalar implementation bit for bit — enforced by
# tests/test_hash_exact.py::test_city64_np_matches_scalar fuzz).  The scalar
# per-value Python walk was ~1.1 s per 150k strings and taxed every
# CREATE STATS display collection over a string column plus the exact-hash
# golden paths (guide §4.2: hand whole batches to vectorized native code).
# Strings longer than 64 bytes take the scalar loop path (rare in the hot
# callers); everything else is branch-bucketed and fully vectorized.
# ---------------------------------------------------------------------------

def _city64_np_batch(bvals: list) -> list:
    """CityHash64 for a batch of bytes-or-None; returns signed-int64 list."""
    import numpy as np

    n_rows = len(bvals)
    out = np.zeros(n_rows, dtype=np.uint64)
    lens = np.array([-1 if b is None else len(b) for b in bvals],
                    dtype=np.int64)
    u64 = np.uint64
    K0, K1, K2, K3 = u64(_K0), u64(_K1), u64(_K2), u64(_K3)
    KMUL = u64(0x9DDFEA08EB382D69)

    def rot(v, s):
        # s: scalar int in [1,63] or uint64 array with values in [1,63]
        s = np.asarray(s, dtype=np.uint64)
        return (v >> s) | (v << (u64(64) - s))

    def shift_mix(v):
        return v ^ (v >> u64(47))

    def h128to64(lo, hi):
        a = (lo ^ hi) * KMUL
        a ^= a >> u64(47)
        b = (hi ^ a) * KMUL
        b ^= b >> u64(47)
        return b * KMUL

    # flatten all <=64-byte strings into one buffer with absolute offsets
    sel_idx = np.flatnonzero((lens >= 0) & (lens <= 64))
    if sel_idx.size:
        joined = b"".join(bvals[i] for i in sel_idx)
        flat = np.frombuffer(joined, dtype=np.uint8)
        sel_lens = lens[sel_idx]
        starts = np.concatenate(([0], np.cumsum(sel_lens)[:-1]))

        def fetch(rows_mask, rel_off, nbytes):
            # rel_off: scalar or per-row array of offsets INTO each string
            st = starts[rows_mask] + rel_off
            idx = st[:, None] + np.arange(nbytes)
            b = flat[idx].astype(np.uint64)
            sh = np.arange(nbytes, dtype=np.uint64) * u64(8)
            return (b << sh).sum(axis=1, dtype=np.uint64)

        res = np.zeros(sel_idx.size, dtype=np.uint64)
        ns = sel_lens
        nu = ns.astype(np.uint64)

        m0 = ns == 0
        if m0.any():
            res[m0] = K2
        m1 = (ns >= 1) & (ns <= 3)
        if m1.any():
            st = starts[m1]
            nn = ns[m1]
            a = flat[st].astype(np.uint64)
            b = flat[st + (nn >> 1)].astype(np.uint64)
            c = flat[st + nn - 1].astype(np.uint64)
            y = a + (b << u64(8))
            z = nn.astype(np.uint64) + (c << u64(2))
            res[m1] = shift_mix((y * K2) ^ (z * K3)) * K2
        m2 = (ns >= 4) & (ns <= 8)
        if m2.any():
            a = fetch(m2, 0, 4)
            b = fetch(m2, ns[m2] - 4, 4)
            res[m2] = h128to64(nu[m2] + (a << u64(3)), b)
        m3 = (ns > 8) & (ns <= 16)
        if m3.any():
            a = fetch(m3, 0, 8)
            b = fetch(m3, ns[m3] - 8, 8)
            r = nu[m3] & u64(63)  # n in 9..16 -> r == n, never 0
            res[m3] = h128to64(a, rot(b + nu[m3], r)) ^ b
        m4 = (ns >= 17) & (ns <= 32)
        if m4.any():
            nn = nu[m4]
            a = fetch(m4, 0, 8) * K1
            b = fetch(m4, 8, 8)
            c = fetch(m4, ns[m4] - 8, 8) * K2
            d = fetch(m4, ns[m4] - 16, 8) * K0
            res[m4] = h128to64(
                rot(a - b, 43) + rot(c, 30) + d,
                a + rot(b ^ K3, 20) - c + nn,
            )
        m5 = (ns >= 33) & (ns <= 64)
        if m5.any():
            nn = nu[m5]
            nsl = ns[m5]
            z = fetch(m5, 24, 8)
            a = fetch(m5, 0, 8) + (nn + fetch(m5, nsl - 16, 8)) * K0
            b = rot(a + z, 52)
            c = rot(a, 37)
            a = a + fetch(m5, 8, 8)
            c = c + rot(a, 7)
            a = a + fetch(m5, 16, 8)
            vf = a + z
            vs = b + rot(a, 31) + c
            a = fetch(m5, 16, 8) + fetch(m5, nsl - 32, 8)
            z = fetch(m5, nsl - 8, 8)
            b = rot(a + z, 52)
            c = rot(a, 37)
            a = a + fetch(m5, nsl - 24, 8)
            c = c + rot(a, 7)
            a = a + fetch(m5, nsl - 16, 8)
            wf = a + z
            ws = b + rot(a, 31) + c
            r = shift_mix((vf + ws) * K2 + (wf + vs) * K0)
            res[m5] = shift_mix(r * K0 + vs) * K2
        out[sel_idx] = res

    # scalar fallback: > 64 bytes (the block-loop path)
    for i in np.flatnonzero(lens > 64):
        out[i] = city_hash_64(bvals[i])

    signed = out.astype(np.int64)
    return [
        None if bvals[i] is None else int(signed[i]) for i in range(n_rows)
    ]


def _make_multiarg_udf(scalar_fn):
    """Multi-arg hash: each arg hashed per its declared type, then combined.

    scalar_fn receives (values, itemsizes) where string/binary values stay
    str/bytes (the *_values combiners branch on that) and POD values are
    pre-encoded via the declared Arrow type — delivered as the raw bytes so
    the combiner needs no further type knowledge.
    """
    import pyarrow as pa

    def batch(*arrays: pa.Array) -> pa.Array:
        sizes = [_pa_itemsize(a.type) for a in arrays]
        types = [a.type for a in arrays]
        cols = [a.to_pylist() for a in arrays]
        # single string/binary arg of cityHash64: vectorized numpy kernel
        # (bit-identical; fuzz-enforced) instead of the per-value walk
        if (
            scalar_fn is city64_values
            and len(arrays) == 1
            and sizes[0] == 0
        ):
            bvals = [
                None if v is None
                else (v.encode("utf-8") if isinstance(v, str) else bytes(v))
                for v in cols[0]
            ]
            return pa.array(_city64_np_batch(bvals), type=pa.int64())
        n = len(cols[0])
        out = []
        for i in range(n):
            vals = [c[i] for c in cols]
            if any(v is None for v in vals):
                out.append(None)
                continue
            enc = [
                v if sz == 0 else _pa_encode(v, t, sz)
                for v, t, sz in zip(vals, types, sizes)
            ]
            out.append(_to_signed64(scalar_fn(enc, sizes)))
        return pa.array(out, type=pa.int64())

    return F.arrow_udf(batch, LongType())


def _make_bytes_udf(scalar_fn, to32: bool = False):
    def batch(arr: pa.Array) -> pa.Array:
        size = _pa_itemsize(arr.type)
        t = arr.type
        out = []
        for v in arr.to_pylist():
            if v is None:
                out.append(None)
            else:
                u = scalar_fn(_pa_encode(v, t, size) if size else
                              (v.encode("utf-8") if isinstance(v, str) else bytes(v)))
                out.append(u if to32 else _to_signed64(u))
        return pa.array(out, type=pa.int64())

    return F.arrow_udf(batch, LongType())


def _make_int_udf(scalar_fn, to32: bool = False):
    def batch(arr: pa.Array) -> pa.Array:
        size = _pa_itemsize(arr.type) or 8
        t = arr.type
        out = []
        for v in arr.to_pylist():
            if v is None:
                out.append(None)
            else:
                u = scalar_fn(int.from_bytes(_pa_encode(v, t, size), "little"))
                out.append(u if to32 else _to_signed64(u))
        return pa.array(out, type=pa.int64())

    return F.arrow_udf(batch, LongType())


_UDF_CACHE: dict = {}


def exact_hash_column(name: str, *cols) -> Column:
    """Reference-exact Column for ``name`` (strict_hash_compat path).
    Returns CH's UInt64 as its two's-complement BIGINT (the same signed
    view DuckDB/Spark give); intHash32/hiveHash fit in the positive range.
    """
    key = (name, len(cols))
    udf = _UDF_CACHE.get(key)
    if udf is None:
        if name == "cityHash64":
            udf = _make_multiarg_udf(city64_values)
        elif name == "sipHash64":
            udf = _make_multiarg_udf(sip64_values)
        elif name == "halfMD5":
            udf = _make_multiarg_udf(half_md5_values)
        elif name == "intHash64":
            udf = _make_int_udf(int_hash_64)
        elif name == "intHash32":
            udf = _make_int_udf(int_hash_32, to32=True)
        elif name == "URLHash":
            udf = _make_bytes_udf(url_hash)
        elif name == "hiveHash":
            udf = _make_bytes_udf(hive_hash, to32=True)
        elif name == "sipHash128":
            # hex STRING of the 16-byte FixedString, lowercase — the same
            # column convention the fast-path stand-in uses
            def batch128(*arrays):
                sizes = [_pa_itemsize(a.type) for a in arrays]
                types = [a.type for a in arrays]
                cols = [a.to_pylist() for a in arrays]
                out = []
                for i in range(len(cols[0])):
                    vals = [c[i] for c in cols]
                    if any(v is None for v in vals):
                        out.append(None)
                        continue
                    enc = [
                        v if sz == 0 else _pa_encode(v, t, sz)
                        for v, t, sz in zip(vals, types, sizes)
                    ]
                    out.append(sip128_values(enc, sizes).hex())
                return pa.array(out, type=pa.string())

            from pyspark.sql.types import StringType

            udf = F.arrow_udf(batch128, StringType())
        else:
            raise ValueError(f"no exact implementation for {name!r}")
        _UDF_CACHE[key] = udf
    return udf(*cols)


#: names exact_hash_column can serve
EXACT_HASHES = frozenset(
    {"cityHash64", "sipHash64", "sipHash128", "halfMD5", "intHash64",
     "intHash32", "URLHash", "hiveHash"}
)


# ---------------------------------------------------------------------------
# CRC32Hash + HashSet iteration order (reference base/common/StringRef.h
# CRC32Hash, src/Common/HashTable/HashTable.h HashTableGrower,
# src/AggregateFunctions/AggregateFunctionGroupUniqArray.h
# INITIAL_SIZE_DEGREE = 3).  getMapKeys builds a
# HashSetWithSavedHash<StringRef, StringRefHash> via groupUniqArrayArray;
# its output order is the open-addressing buffer scan, which this
# reproduces bit-exactly: bucket = CRC32Hash(key) & mask, linear probing,
# grow ×4 past half-fill, iterate cells ascending (00745 golden).
# ---------------------------------------------------------------------------

_CH_K2 = 0x9AE16A3B2F90404F
_CH_K3 = 0xC949D7C7509E6557
_CH_KMUL = 0x9DDFEA08EB382D69
_M64 = (1 << 64) - 1

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def _hash128to64(u: int, v: int) -> int:
    a = ((u ^ v) * _CH_KMUL) & _M64
    a ^= a >> 47
    b = ((v ^ a) * _CH_KMUL) & _M64
    b ^= b >> 47
    return (b * _CH_KMUL) & _M64


def _crc32c_u64(crc: int, word: int) -> int:
    crc &= 0xFFFFFFFF
    for i in range(8):
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ (word >> (8 * i))) & 0xFF]
    return crc


def crc32_hash(b: bytes) -> int:
    """StringRefHash on SSE4.2 builds (StringRef.h:276-307): CityHash
    tail for <8 bytes, chained _mm_crc32_u64 over 8-byte words otherwise
    (the final word re-reads the last 8 bytes, overlap included)."""
    n = len(b)
    if n == 0:
        return 0
    if n < 8:
        if n >= 4:
            a = int.from_bytes(b[:4], "little")
            return _hash128to64(
                (n + (a << 3)) & _M64, int.from_bytes(b[n - 4:], "little")
            )
        y = b[0] + (b[n >> 1] << 8)
        z = n + (b[n - 1] << 2)
        v = ((y * _CH_K2) & _M64) ^ ((z * _CH_K3) & _M64)
        v ^= v >> 47
        return (v * _CH_K2) & _M64
    res = 0xFFFFFFFFFFFFFFFF
    pos = 0
    while True:
        res = _crc32c_u64(res, int.from_bytes(b[pos:pos + 8], "little"))
        pos += 8
        if pos + 8 >= n:
            break
    return _crc32c_u64(res, int.from_bytes(b[n - 8:], "little"))


def ch_hashset_order(keys) -> list:
    """Order `keys` (first-seen dedup) the way the reference's
    HashSet<StringRef, CRC32Hash> iterates them: empty string is the
    zero-cell (first), others land at CRC32Hash & mask with linear
    probing; grower starts at 2^3 cells and quadruples past half-fill,
    rehashing in buffer-scan order."""
    order, seen = [], set()
    for k in keys:
        if k is not None and k not in seen:
            seen.add(k)
            order.append(k)
    has_zero = "" in seen
    items = [k for k in order if k != ""]
    degree = 3
    buf: list = [None] * (1 << degree)
    count = 0

    def _reinsert(i: int) -> None:
        # HashTable.h:711-733 — findCell from the new home; if the
        # found cell is non-empty the element found ITSELF along the
        # (partially-moved) chain and stays put; else move + zero
        mask = len(buf) - 1
        k = buf[i]
        p = crc32_hash(k.encode("utf-8")) & mask
        if p == i:
            return
        while buf[p] is not None and buf[p] != k:
            p = (p + 1) & mask
        if buf[p] is not None:
            return
        buf[p] = k
        buf[i] = None

    for k in items:
        mask = len(buf) - 1
        pos = crc32_hash(k.encode("utf-8")) & mask
        while buf[pos] is not None and buf[pos] != k:
            pos = (pos + 1) & mask
        if buf[pos] is None:
            buf[pos] = k
            count += 1
            if count > (len(buf) >> 1):
                # IN-PLACE resize (HashTable.h:548-636): extend the
                # buffer, reinsert each old cell in scan order, then
                # the wrap-around tail past old_size — an element may
                # stay put or move left; a fresh-buffer rebuild
                # iterates ~3% of key sets differently (r10 ADVICE)
                old_size = len(buf)
                degree += 1 if degree >= 23 else 2
                buf.extend([None] * ((1 << degree) - old_size))
                for i in range(old_size):
                    if buf[i] is not None:
                        _reinsert(i)
                i = old_size
                while i < len(buf) and buf[i] is not None:
                    _reinsert(i)
                    i += 1
    out = ([""] if has_zero else []) + [x for x in buf if x is not None]
    return out


def ch_hashset_order_rows(rows) -> list:
    """chHashSetOrder SQL kernel: rows = array<struct<__rid,__mk>> —
    insertion order is the minimum row id per key (the probe-chain
    layout depends on it), output is the HashSet buffer scan."""
    if not rows:
        return []
    pairs = sorted(
        (r["__rid"] if hasattr(r, "__getitem__") else r.__rid, 
         r["__mk"] if hasattr(r, "__getitem__") else r.__mk)
        for r in rows
    )
    return ch_hashset_order([k for _, k in pairs])

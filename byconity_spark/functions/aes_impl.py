"""Pure-Python AES for the encrypt()/decrypt()/aes_*_mysql function
family (reference src/Functions/FunctionsAES.h, registerFunctionsAES —
OpenSSL-backed there; this is a clean-room implementation from the
public FIPS-197 spec and NIST SP 800-38A/D mode definitions, tables
generated programmatically).  Sizes here are tiny (function-surface
tests), so pure Python is fine; the Spark-side entry is an Arrow-batched
pandas UDF over the hot path.

MySQL compatibility semantics (aes_encrypt_mysql): keys LONGER than the
mode's size fold by XOR (whole key used, effective length fixed); an
over-long IV truncates.  Strict mode (encrypt/decrypt) enforces exact
key/IV lengths like the reference (error 36).
"""
from __future__ import annotations


def _build_tables():
    # GF(2^8) arithmetic with the AES polynomial 0x11B; S-box =
    # affine transform of the multiplicative inverse (FIPS-197 §5.1.1)
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def inv(b):
        return 0 if b == 0 else exp[255 - log[b]]

    sbox = [0] * 256
    for i in range(256):
        c = inv(i)
        r = 0x63  # the affine constant (FIPS-197 §5.1.1)
        for k in range(8):
            bit = (
                (c >> k) ^ (c >> ((k + 4) % 8)) ^ (c >> ((k + 5) % 8))
                ^ (c >> ((k + 6) % 8)) ^ (c >> ((k + 7) % 8))
            ) & 1
            r ^= bit << k
        sbox[i] = r
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _build_tables()


def _expand_key(key: bytes):
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = (rcon << 1) ^ (0x11B if rcon & 0x80 else 0)
            rcon &= 0xFF
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w, nr


def _encrypt_block(block: bytes, w, nr) -> bytes:
    # state is column-major (FIPS-197 §3.4)
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    add_round_key(0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < nr:
            for c in range(4):
                a0, a1, a2, a3 = (s[0][c], s[1][c], s[2][c], s[3][c])
                s[0][c] = _GMUL(a0, 2) ^ _GMUL(a1, 3) ^ a2 ^ a3
                s[1][c] = a0 ^ _GMUL(a1, 2) ^ _GMUL(a2, 3) ^ a3
                s[2][c] = a0 ^ a1 ^ _GMUL(a2, 2) ^ _GMUL(a3, 3)
                s[3][c] = _GMUL(a0, 3) ^ a1 ^ a2 ^ _GMUL(a3, 2)
        add_round_key(rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, w, nr) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= w[4 * rnd + c][r]

    add_round_key(nr)
    for rnd in range(nr - 1, -1, -1):
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]
        for r in range(4):
            for c in range(4):
                s[r][c] = _INV_SBOX[s[r][c]]
        add_round_key(rnd)
        if rnd > 0:
            for c in range(4):
                a0, a1, a2, a3 = (s[0][c], s[1][c], s[2][c], s[3][c])
                s[0][c] = (_GMUL(a0, 14) ^ _GMUL(a1, 11)
                           ^ _GMUL(a2, 13) ^ _GMUL(a3, 9))
                s[1][c] = (_GMUL(a0, 9) ^ _GMUL(a1, 14)
                           ^ _GMUL(a2, 11) ^ _GMUL(a3, 13))
                s[2][c] = (_GMUL(a0, 13) ^ _GMUL(a1, 9)
                           ^ _GMUL(a2, 14) ^ _GMUL(a3, 11))
                s[3][c] = (_GMUL(a0, 11) ^ _GMUL(a1, 13)
                           ^ _GMUL(a2, 9) ^ _GMUL(a3, 14))
    return bytes(s[r][c] for c in range(4) for r in range(4))


_MODES = {
    "aes-128-ecb": (16, 0, "ecb"), "aes-192-ecb": (24, 0, "ecb"),
    "aes-256-ecb": (32, 0, "ecb"),
    "aes-128-cbc": (16, 16, "cbc"), "aes-192-cbc": (24, 16, "cbc"),
    "aes-256-cbc": (32, 16, "cbc"),
    "aes-128-cfb": (16, 16, "cfb"), "aes-192-cfb": (24, 16, "cfb"),
    "aes-256-cfb": (32, 16, "cfb"),
    "aes-128-ofb": (16, 16, "ofb"), "aes-192-ofb": (24, 16, "ofb"),
    "aes-256-ofb": (32, 16, "ofb"),
    "aes-128-ctr": (16, 16, "ctr"), "aes-192-ctr": (24, 16, "ctr"),
    "aes-256-ctr": (32, 16, "ctr"),
    "aes-128-gcm": (16, 12, "gcm"), "aes-192-gcm": (24, 12, "gcm"),
    "aes-256-gcm": (32, 12, "gcm"),
}

# _mysql functions support only ecb/cbc/cfb/ofb (no ctr/gcm)
_MYSQL_OK = {"ecb", "cbc", "cfb", "ofb"}


class AesError(ValueError):
    def __init__(self, code: int, msg: str):
        super().__init__(f"({code}): {msg}")
        self.code = code


def _fold_key_mysql(key: bytes, n: int) -> bytes:
    if len(key) < n:
        raise AesError(36, "Invalid key size: key is too short")
    folded = bytearray(key[:n])
    for i in range(n, len(key)):
        folded[i % n] ^= key[i]
    return bytes(folded)


def _pkcs7(data: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return data + bytes([pad]) * pad


def _unpkcs7(data: bytes) -> bytes:
    if not data or data[-1] < 1 or data[-1] > 16:
        raise AesError(454, "Invalid padding")
    return data[:-data[-1]]


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def _inc32(block: bytes) -> bytes:
    n = int.from_bytes(block[12:], "big")
    return block[:12] + ((n + 1) & 0xFFFFFFFF).to_bytes(4, "big")


def _gcm_mul(x: int, y: int) -> int:
    # GF(2^128) multiply, NIST SP 800-38D algorithm 1
    z = 0
    v = y
    for i in range(127, -1, -1):
        if (x >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ (0xE1 << 120)
        else:
            v >>= 1
    return z


def _ghash(h: int, aad: bytes, ct: bytes) -> bytes:
    def pad16(b):
        return b + b"\x00" * ((16 - len(b) % 16) % 16)

    data = (pad16(aad) + pad16(ct)
            + (8 * len(aad)).to_bytes(8, "big")
            + (8 * len(ct)).to_bytes(8, "big"))
    y = 0
    for i in range(0, len(data), 16):
        y = _gcm_mul(y ^ int.from_bytes(data[i:i + 16], "big"), h)
    return y.to_bytes(16, "big")


def aes_apply(mode_name: str, data: bytes, key: bytes,
              iv: bytes | None = None, aad: bytes | None = None,
              mysql: bool = False, decrypt: bool = False) -> bytes:
    """Encrypt/decrypt `data` under the CH function-family semantics.
    GCM appends/verifies the 16-byte tag like the reference."""
    m = _MODES.get(str(mode_name).lower())
    if m is None:
        raise AesError(36, f"Invalid mode: {mode_name}")
    klen, ivlen, kind = m
    if mysql:
        if kind not in _MYSQL_OK:
            raise AesError(
                36, f"Unsupported cipher mode {mode_name} for "
                    f"MySQL-compatible functions"
            )
        key = _fold_key_mysql(key, klen)
        # a PROVIDED IV must be at least a block long even for modes
        # that ignore it (the reference validates against the cipher's
        # block size — 01318 `aes_encrypt_mysql('aes-128-ecb', ...,
        # 'iv')` is error 36); over-long IVs truncate
        if iv is not None and len(iv) < 16:
            raise AesError(36, "Invalid IV size: IV is too short")
        if ivlen:
            if iv is None:
                raise AesError(36, "Invalid IV size: IV is required")
            iv = iv[:ivlen]
    else:
        if len(key) != klen:
            raise AesError(
                36, f"Invalid key size: {len(key)} expected {klen}"
            )
        if ivlen and kind != "gcm":
            if iv is None or len(iv) == 0:
                raise AesError(36, "Invalid IV size: IV is required")
            if len(iv) != ivlen:
                raise AesError(
                    36, f"Invalid IV size: {len(iv)} expected {ivlen}"
                )
        if kind == "gcm" and (iv is None or len(iv) == 0):
            raise AesError(36, "Invalid IV size: IV is required")
    if aad is not None and kind != "gcm":
        if not mysql:
            raise AesError(
                42, "AAD can be only used with GCM-mode ciphers"
            )
    w, nr = _expand_key(key)

    if kind == "ecb":
        if decrypt:
            if len(data) % 16:
                raise AesError(454, "Invalid ciphertext length")
            out = b"".join(
                _decrypt_block(data[i:i + 16], w, nr)
                for i in range(0, len(data), 16)
            )
            return _unpkcs7(out)
        pt = _pkcs7(data)
        return b"".join(
            _encrypt_block(pt[i:i + 16], w, nr)
            for i in range(0, len(pt), 16)
        )
    if kind == "cbc":
        if decrypt:
            if len(data) % 16:
                raise AesError(454, "Invalid ciphertext length")
            prev = iv
            out = []
            for i in range(0, len(data), 16):
                blk = data[i:i + 16]
                out.append(_xor(_decrypt_block(blk, w, nr), prev))
                prev = blk
            return _unpkcs7(b"".join(out))
        pt = _pkcs7(data)
        prev = iv
        out = []
        for i in range(0, len(pt), 16):
            prev = _encrypt_block(_xor(pt[i:i + 16], prev), w, nr)
            out.append(prev)
        return b"".join(out)
    if kind == "cfb":
        out = []
        prev = iv
        for i in range(0, len(data), 16):
            ks = _encrypt_block(prev, w, nr)
            blk = data[i:i + 16]
            o = _xor(blk, ks)
            out.append(o)
            prev = (blk if decrypt else o).ljust(16, b"\x00")
        return b"".join(out)
    if kind == "ofb":
        out = []
        prev = iv
        for i in range(0, len(data), 16):
            prev = _encrypt_block(prev, w, nr)
            out.append(_xor(data[i:i + 16], prev))
        return b"".join(out)
    if kind == "ctr":
        out = []
        ctr = iv
        for i in range(0, len(data), 16):
            out.append(_xor(data[i:i + 16], _encrypt_block(ctr, w, nr)))
            ctr = _inc32(ctr)
        return b"".join(out)
    # gcm
    h = int.from_bytes(_encrypt_block(b"\x00" * 16, w, nr), "big")
    if len(iv) == 12:
        j0 = iv + b"\x00\x00\x00\x01"
    else:
        j0 = _ghash(h, b"", iv)
    aad_b = aad or b""
    if decrypt:
        if len(data) < 16:
            raise AesError(454, "Ciphertext shorter than the GCM tag")
        ct, tag = data[:-16], data[-16:]
        s = _ghash(h, aad_b, ct)
        want = _xor(_encrypt_block(j0, w, nr), s)
        if want != tag:
            raise AesError(454, "GCM tag mismatch")
        out = []
        ctr = j0
        for i in range(0, len(ct), 16):
            ctr = _inc32(ctr)
            out.append(_xor(ct[i:i + 16], _encrypt_block(ctr, w, nr)))
        return b"".join(out)
    out = []
    ctr = j0
    for i in range(0, len(data), 16):
        ctr = _inc32(ctr)
        out.append(_xor(data[i:i + 16], _encrypt_block(ctr, w, nr)))
    ct = b"".join(out)
    s = _ghash(h, aad_b, ct)
    tag = _xor(_encrypt_block(j0, w, nr), s)
    return ct + tag

"""Scalar parity batch, round 7 second pass — the feasible tail of the
previously-skipped names.

Exact-name implementations of reference-registered functions that were
still missing after the round-7 first-pass batches:

* sharding / bucketing (``hashRange`` hashRange.cpp:29 — the TEA sharding
  triple ``(id % slots) / ceil(slots/shards)``; ``bucket``
  FunctionBucket.h:34 over a precomputed hash column;
  ``bucket_bounds_search`` bucketBoundsSearch.cpp binary-search over
  explicit bucket bounds — the reference reads the bounds from a
  serialized statistics blob, we take them as a plain sorted array:
  same search, different state encoding, consistent with the repo's
  explicit-state sketch convention),
* ByteMap implicit-column name helpers (``extractMapColumn`` /
  ``extractMapKey`` per DataTypes/MapHelpers.cpp:64,104 — parse
  ``__col__'key'.bin`` part file names),
* ``partitionId`` (partitionId.cpp + MergeTreePartition::getID
  MergeTreePartition.cpp:283: all-integral keys join dash-separated with
  Date as YYYYMMDD; any other type switches the WHOLE id to a 32-hex
  hash.  DOCUMENTED DEVIATION: the hash path uses md5-low-128 instead of
  the reference's legacy sipHash, value-divergent like the repo's whole
  hash-function family),
* MySQL compat (``globalVariable`` globalVariable.cpp:82 table,
  ``interval`` interval.cpp:30 = MySQL INTERVAL boundary count,
  ``aes_encrypt_mysql``/``aes_decrypt_mysql`` = MySQL key fold
  (XOR-wrap into 16 bytes) + the native AES primitives),
* ``errorCodeToName`` (errorCodeToName.cpp over the public
  ErrorCodes.cpp registry, transcribed in errorcodes_data.py; unknown
  codes render '' like the reference),
* array-set index probes (``arraySetCheck`` arraySetCheck.cpp:23
  variadic pair AND of overlap; ``arraySetGet`` ordered matching
  elements; ``arraySetGetAny`` first match),
* ``arrayReduceInRanges`` (arrayReduceInRanges.cpp — per-range
  arrayReduce over 1-based (start, length) windows; ranges passed as
  array<array<int>> or array<struct>),
* ``topoFindDown`` (FunctionTopoFindDown.cpp:34 state-machine over
  (hit, level) arrays: a hit anchors its level, following items stay
  "taken" while strictly deeper, the first shallower item re-enters
  search mode),
* ``tupleToNameValuePairs`` (tupleToNameValuePairs.cpp — named tuple ->
  array of (name, value) pairs.  DOCUMENTED DEVIATION: values render as
  their JSON string form since Spark cannot carry a per-row heterogenous
  value type through one column),
* conversion tail (``CAST`` alias with CH type-name translation,
  ``toInterval(n, unit)``, ``toTimeType`` -> HH:mm:ss string render of
  the CNCH Time type),
* interval-tuple arithmetic (``addTupleOfIntervals`` /
  ``subtractTupleOfIntervals`` FunctionBinaryArithmetic.h tuple fold —
  intervals passed as 'N UNIT' strings),
* server/file probes with real local semantics (``filesystemAvailable``/
  ``filesystemCapacity``/``filesystemFree`` via os.statvfs of the
  warehouse volume; ``file`` reads from the configured user-files dir
  with a realpath containment check, like the reference's
  user_files_path jail; ``logTrace`` returns 0 — the reference logs to
  the server text log, we have none: DOCUMENTED no-op),
* ``bitSlice`` (bitSlice.cpp — bit-granular substring with 1-based /
  negative-from-end offsets, output bits left-aligned and zero-padded;
  pure-python bit math, exactness pinned by unit vectors),
* ``hashid`` (FunctionHashID.h — the public Hashids algorithm
  (hashids.org spec): salt-shuffled alphabet, lottery char, per-number
  hashing with separators/guards),
* ``MD4`` (pure RFC-1320 implementation; hashlib's md4 is usually
  fenced off by OpenSSL legacy policy, so transcribing the public RFC
  rounds keeps it deterministic everywhere; hex-digest render like the
  repo's MD5 convention),
* ``bayesAB`` (abtesting.cpp — the reference Monte-Carlo-samples
  rbeta/rgamma; we compute the win probabilities with the EXACT
  closed-form Beta/Gamma race integrals instead, so results are
  deterministic.  DOCUMENTED METHOD DEVIATION: exact integral vs
  sampled estimate — same quantities, no sampling noise),
* restricted hyperscan stand-ins (``multiFuzzyMatchAny`` /
  ``multiFuzzyMatchAnyIndex`` / ``multiFuzzyMatchAllIndices``
  MultiMatchAnyImpl.h — supported for PLAIN-LITERAL needles via banded
  edit-distance sliding windows; regex metacharacters raise, because a
  from-scratch fuzzy-regex engine would not be faithful: DOCUMENTED
  partial),
* text-search pair (``toTextSearchQuery`` Common/TextSreachQuery.h —
  tsquery-style `&`/`|`/`!`/parens/phrases parsed to a normalized
  prefix-form AST string (render format is ours: the reference's is an
  internal debug dump); ``textSearch`` — the reference scalar is an
  index-pushdown placeholder that always returns 1 (tsquery.cpp:66), we
  EVALUATE the query over lowercase alphanumeric tokens for real:
  DOCUMENTED value superset).

All entries use setdefault; nothing already registered is clobbered.
"""

from __future__ import annotations

import math
import os
import re
import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(x):
    return x if isinstance(x, Column) else F.lit(x)


def _str(x) -> str:
    return str(x).strip("'\"")


def _int(x) -> int:
    return int(str(x).strip("'\""))


# ---------------------------------------------------------------------------
# hashRange / bucket / bucket_bounds_search — sharding math
# ---------------------------------------------------------------------------


def _hash_range(hid, slots, shards):
    slots_i, shards_i = _int(slots), _int(shards)
    if shards_i == 0:
        raise ValueError("hashRange: number_shards must be > 0")
    per_range = (slots_i + shards_i - 1) // shards_i
    if per_range == 0:
        raise ValueError("hashRange: input val incorrect")
    return F.floor((_lit(hid).cast("bigint") % slots_i) / per_range).cast(
        "bigint"
    )


def _bucket(hash_col, bucket_size, is_with_range=0, split_number=0):
    """FunctionBucket.h over a PRECOMPUTED hash column (the reference binds
    the hash function at DDL time; callers here pass e.g. sparkpartition(x)
    or dtsPartition output explicitly)."""
    b, wr, sp = _int(bucket_size), _int(is_with_range), _int(split_number)
    h = _lit(hash_col).cast("bigint")
    if sp > 0:
        h = h % sp
    if not wr:
        return (h % b).cast("bigint")
    shard_ratio = max(sp // b, 1)
    bn = F.floor(h / shard_ratio).cast("bigint")
    return F.when(bn >= b, F.lit(b - 1)).otherwise(bn).cast("bigint")


def _bucket_bounds_search(bounds, value):
    # binarySearchBucket == count of bounds <= value clamped to the last
    # bucket (upper_bound semantics over sorted ascending bounds).
    v = _lit(value)
    return F.size(F.filter(_lit(bounds), lambda b: b <= v)).cast("int")


# ---------------------------------------------------------------------------
# ByteMap implicit-column name parsing (MapHelpers.cpp)
# ---------------------------------------------------------------------------

# __col__'key'.bin  |  __col__123.bin   (separator fixed at the default __)
_MAP_COL_RE = r"^__(.+?)__."
_MAP_KEY_Q_RE = r"^__.+?__'(.*?)'\."
_MAP_KEY_D_RE = r"^__.+?__(\d[^.]*)\.[a-z]"


def _extract_map_column(s):
    c = _lit(s)
    got = F.regexp_extract(c, _MAP_COL_RE, 1)
    # minimum viable name is __M__1.bin (9 chars), like the reference guard
    return F.when(F.length(c) < 9, F.lit("")).otherwise(got)


def _extract_map_key(s):
    c = _lit(s)
    quoted = F.regexp_extract(c, _MAP_KEY_Q_RE, 1)
    digits = F.regexp_extract(c, _MAP_KEY_D_RE, 1)
    return F.when(F.length(c) < 9, F.lit("")).otherwise(
        F.when(quoted != "", quoted).otherwise(digits)
    )


# ---------------------------------------------------------------------------
# partitionId — MergeTreePartition::getID
# ---------------------------------------------------------------------------


def _partition_id(*cols):
    if not cols:
        raise ValueError("partitionId requires at least one argument")

    @F.pandas_udf("string")
    def k(*series: pd.Series) -> pd.Series:
        import datetime as _dt
        import hashlib

        import numpy as np

        n = len(series[0])
        out = []
        for i in range(n):
            vals = [s.iloc[i] for s in series]
            pieces, all_int = [], True
            for v in vals:
                # Spark DATE columns arrive in Arrow as midnight
                # timestamps; a true midnight DateTime formats the same —
                # DOCUMENTED corner (CH can tell the types apart, Arrow
                # cannot)
                if isinstance(v, pd.Timestamp):
                    if v == v.normalize():
                        pieces.append(v.strftime("%Y%m%d"))
                    else:
                        pieces.append(str(int(v.timestamp())))
                elif isinstance(v, _dt.date) and not isinstance(
                    v, _dt.datetime
                ):
                    pieces.append(v.strftime("%Y%m%d"))
                elif isinstance(v, (int, np.integer, bool)) and not isinstance(
                    v, float
                ):
                    pieces.append(str(int(v)))
                else:
                    all_int = False
                    break
            if all_int:
                out.append("-".join(pieces))
            else:
                # hash path: DOCUMENTED md5-low-128 stand-in for the
                # reference's legacy sipHash field visitor
                h = hashlib.md5()
                for v in vals:
                    h.update(repr(v).encode())
                out.append(h.hexdigest())
        return pd.Series(out)

    return k(*[_lit(c) for c in cols])


# ---------------------------------------------------------------------------
# MySQL compat: globalVariable / interval / aes_*_mysql
# ---------------------------------------------------------------------------

# globalVariable.cpp:82 table, verbatim (typed defaults)
_GLOBAL_VARIABLES: dict[str, object] = {
    "max_allowed_packet": 67108864,
    "version": "5.7.0",
    "version_comment": "",
    "auto_increment_increment": 1,
    "character_set_client": "utf8mb4",
    "character_set_connection": "utf8mb4",
    "character_set_results": "utf8mb4",
    "character_set_server": "utf8mb4",
    "collation_server": "utf8mb4_0900_ai_ci",
    "collation_connection": "utf8mb4_0900_ai_ci",
    "init_connect": "",
    "interactive_timeout": 28800,
    "license": "GPL",
    "lower_case_table_names": 0,
    "net_write_timeout": 60,
    "performance_schema": 0,
    "sql_mode": (
        "ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES,NO_ZERO_IN_DATE,"
        "NO_ZERO_DATE,ERROR_FOR_DIVISION_BY_ZERO,NO_ENGINE_SUBSTITUTION"
    ),
    "system_time_zone": "UTC",
    "time_zone": "UTC",
    "wait_timeout": 28800,
    "ssl_cipher": "TLS_AES_256_GCM_SHA384",
    "transaction_isolation": "READ-UNCOMMITTED",
    "tx_isolation": "READ-UNCOMMITTED",
}


def _global_variable(name):
    key = _str(name).lower()
    if key in _GLOBAL_VARIABLES:
        return F.lit(_GLOBAL_VARIABLES[key])
    return F.lit(0)  # unknown -> Int32 0, like the reference stub


def _mysql_interval(x, *bounds):
    # MySQL INTERVAL(N, N1, N2, ...) = number of boundaries <= N
    # (boundaries sorted ascending); NULL N -> -1 like MySQL.
    xc = _lit(x)
    n = F.aggregate(
        F.array(*[_lit(b) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc + F.when(xc >= b, 1).otherwise(0),
    )
    return F.when(xc.isNull(), F.lit(-1)).otherwise(n).cast("int")


def _mysql_fold_key(key: str, nbytes: int = 16) -> bytes:
    # MySQL's my_aes key fold: XOR-wrap the raw key bytes into the fixed
    # AES key buffer.
    raw = key.encode() if isinstance(key, str) else bytes(key)
    buf = bytearray(nbytes)
    for i, b in enumerate(raw):
        buf[i % nbytes] ^= b
    return bytes(buf)


_MYSQL_AES_MODES = {
    "aes-128-ecb": (16, "ECB"), "aes-192-ecb": (24, "ECB"),
    "aes-256-ecb": (32, "ECB"),
    "aes-128-cbc": (16, "CBC"), "aes-192-cbc": (24, "CBC"),
    "aes-256-cbc": (32, "CBC"),
}


def _aes_mysql(encrypt: bool):
    def fn(mode, data, key, *iv):
        m = _str(mode).lower()
        if m not in _MYSQL_AES_MODES:
            raise ValueError(f"aes_*_mysql: unsupported mode {m}")
        nbytes, spark_mode = _MYSQL_AES_MODES[m]
        if isinstance(key, Column):
            raise NotImplementedError(
                "aes_*_mysql needs a literal key (the MySQL key fold runs "
                "driver-side)"
            )
        if spark_mode == "CBC" and not iv:
            raise ValueError(
                "aes_*_mysql: CBC mode requires an explicit init vector "
                "(MySQL semantics; a generated IV would be nondeterministic)"
            )
        folded = F.lit(_mysql_fold_key(_str(key), nbytes))
        ivc = _lit(iv[0]).cast("binary") if iv else F.lit(b"")
        if encrypt:
            return F.aes_encrypt(
                _lit(data).cast("binary"), folded, F.lit(spark_mode),
                F.lit("PKCS"), ivc
            )
        return F.aes_decrypt(
            _lit(data).cast("binary"), folded, F.lit(spark_mode),
            F.lit("PKCS"), ivc
        )

    return fn


# ---------------------------------------------------------------------------
# errorCodeToName
# ---------------------------------------------------------------------------


def _error_code_to_name(code):
    from byconity_spark.functions.errorcodes_data import ERROR_CODE_NAMES

    @F.pandas_udf("string")
    def k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: ""
            if pd.isna(v)
            else ERROR_CODE_NAMES.get(int(v), "")
        )

    return k(_lit(code).cast("bigint"))


# ---------------------------------------------------------------------------
# array-set probes
# ---------------------------------------------------------------------------


def _array_set_check(*args):
    if len(args) < 2 or len(args) % 2:
        raise ValueError("arraySetCheck takes (array, set) pairs")
    out = None
    for i in range(0, len(args), 2):
        arr, sset = _lit(args[i]), _lit(args[i + 1])
        hit = F.arrays_overlap(arr, sset)
        out = hit if out is None else (out & hit)
    return out.cast("boolean")


def _array_set_get(arr, sset):
    s = _lit(sset)
    return F.filter(_lit(arr), lambda x: F.array_contains(s, x))


def _array_set_get_any(arr, sset):
    return F.try_element_at(_array_set_get(arr, sset), F.lit(1))


# ---------------------------------------------------------------------------
# arrayReduceInRanges
# ---------------------------------------------------------------------------

_RANGE_AGGS = {
    "sum": lambda a: F.aggregate(
        a, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
    ),
    "min": F.array_min,
    "max": F.array_max,
    "count": F.size,
    "avg": lambda a: F.when(
        F.size(a) > 0,
        F.aggregate(
            a, F.lit(0).cast("double"), lambda acc, x: acc + x.cast("double")
        )
        / F.size(a),
    ),
    "any": lambda a: F.try_element_at(a, F.lit(1)),
    "anyLast": lambda a: F.try_element_at(a, F.lit(-1)),
    "uniq": lambda a: F.size(F.array_distinct(a)),
    "groupArray": lambda a: a,
}


def _array_reduce_in_ranges(name, ranges, arr):
    agg = _RANGE_AGGS[_str(name)]
    a = _lit(arr)

    def one(r):
        # ranges come as [start, len] pairs (1-based start, like the
        # reference's (UInt, UInt) tuples)
        return agg(
            F.slice(
                a,
                F.try_element_at(r, F.lit(1)).cast("int"),
                F.try_element_at(r, F.lit(2)).cast("int"),
            )
        )

    return F.transform(_lit(ranges), one)


# ---------------------------------------------------------------------------
# topoFindDown — (hit, level) state machine
# ---------------------------------------------------------------------------


def _topo_find_down(hit, level):
    # fold state: struct(out array<int>, taking boolean, hl int)
    pairs = F.arrays_zip(_lit(hit).cast("array<int>"),
                         _lit(level).cast("array<int>"))

    def step(acc, p):
        h, lv = p["0"], p["1"]
        taking, hl = acc["taking"], acc["hl"]
        in_take = taking & (lv > hl)
        # not in_take -> search mode for this item (also covers the
        # reference's inner-loop break + reprocess)
        take_hit = (~in_take) & (h == 1)
        out_bit = F.when(in_take | take_hit, F.lit(1)).otherwise(F.lit(0))
        new_taking = F.when(in_take, F.lit(True)).otherwise(take_hit)
        new_hl = F.when(take_hit, lv).otherwise(hl)
        return F.struct(
            F.concat(acc["out"], F.array(out_bit)).alias("out"),
            new_taking.alias("taking"),
            new_hl.alias("hl"),
        )

    folded = F.aggregate(
        pairs,
        F.struct(
            F.array().cast("array<int>").alias("out"),
            F.lit(False).alias("taking"),
            F.lit(0).alias("hl"),
        ),
        step,
    )
    return folded["out"]


# ---------------------------------------------------------------------------
# tuple / conversion tail
# ---------------------------------------------------------------------------


def _tuple_to_name_value_pairs(t):
    return F.map_entries(
        F.from_json(F.to_json(_lit(t)), "map<string,string>")
    )


def _cast_ch(c, t):
    ch_map = {
        "UInt8": "smallint", "UInt16": "int", "UInt32": "bigint",
        "UInt64": "bigint", "Int8": "tinyint", "Int16": "smallint",
        "Int32": "int", "Int64": "bigint", "Float32": "float",
        "Float64": "double", "String": "string", "Date": "date",
        "DateTime": "timestamp", "UUID": "string",
    }
    name = _str(t)
    return _lit(c).cast(ch_map.get(name, name.lower()))


_INTERVAL_UNITS = {
    "second", "minute", "hour", "day", "week", "month", "quarter", "year"
}


def _to_interval(n, unit):
    u = _str(unit).lower()
    if u not in _INTERVAL_UNITS:
        raise ValueError(f"toInterval: bad unit {unit}")
    if u == "week":
        return F.expr(f"INTERVAL {7 * _int(n)} DAY")
    if u == "quarter":
        return F.expr(f"INTERVAL {3 * _int(n)} MONTH")
    return F.expr(f"INTERVAL {_int(n)} {u.upper()}")


def _to_time_type(c, *scale):
    # CNCH Time type renders HH:MM:SS[.fff] — we surface the string form
    return F.date_format(_lit(c).cast("timestamp"), "HH:mm:ss")


def _add_tuple_of_intervals(c, *intervals):
    out = _lit(c)
    for iv in intervals:
        out = out + F.expr(f"INTERVAL {_str(iv)}")
    return out


def _subtract_tuple_of_intervals(c, *intervals):
    out = _lit(c)
    for iv in intervals:
        out = out - F.expr(f"INTERVAL {_str(iv)}")
    return out


# ---------------------------------------------------------------------------
# filesystem / file / logTrace
# ---------------------------------------------------------------------------

USER_FILES_PATH = os.environ.get(
    "BYCONITY_SPARK_USER_FILES", os.path.join(os.getcwd(), ".userfiles")
)


def _statvfs_bytes(kind: str):
    st = os.statvfs(os.getcwd())
    if kind == "capacity":
        return F.lit(st.f_blocks * st.f_frsize).cast("bigint")
    if kind == "free":
        return F.lit(st.f_bfree * st.f_frsize).cast("bigint")
    return F.lit(st.f_bavail * st.f_frsize).cast("bigint")


def _file(path, *default):
    rel = _str(path)
    base = os.path.realpath(USER_FILES_PATH)
    full = os.path.realpath(os.path.join(base, rel))
    if not full.startswith(base + os.sep) and full != base:
        raise ValueError(
            f"file(): path {rel!r} escapes the user-files dir (the "
            "reference applies the same user_files_path jail)"
        )
    try:
        with open(full, "r") as fh:
            return F.lit(fh.read())
    except OSError:
        if default:
            return _lit(default[0])
        raise


# ---------------------------------------------------------------------------
# bitSlice — bit-granular substring (bitSlice.cpp)
# ---------------------------------------------------------------------------


def _bit_slice_py(data: bytes, start: int, length=None) -> bytes:
    nbits = len(data) * 8
    if start > 0:
        begin = start - 1
    elif start < 0:
        # right offset: |start| bits from the end; offsets past the start
        # of the string clamp to the whole string unshifted (the
        # reference's left_truncate branch fires when ceil(|start|/8)
        # exceeds the byte size, i.e. |start| > nbits)
        off = -start
        begin = 0 if off > nbits else nbits - off
    else:
        raise ValueError("Indices in strings are 1-based")
    if begin >= nbits:
        return b""
    if length is None:
        end = nbits
    elif length >= 0:
        end = min(begin + length, nbits)
    else:
        end = max(begin, nbits + length)
    take = end - begin
    if take <= 0:
        return b""
    as_int = int.from_bytes(data, "big")
    sliced = (as_int >> (nbits - end)) & ((1 << take) - 1)
    out_len = (take + 7) // 8
    # left-align: shift so the first sliced bit is the MSB of byte 0
    sliced <<= out_len * 8 - take
    return sliced.to_bytes(out_len, "big")


def _bit_slice(s, offset, *length):
    def run(data: pd.Series, off: pd.Series, lseries) -> pd.Series:
        out = []
        for i in range(len(data)):
            d = data.iloc[i]
            if d is None or pd.isna(off.iloc[i]):
                out.append(None)
                continue
            if isinstance(d, str):
                d = d.encode()
            lv = None
            if lseries is not None:
                lv = None if pd.isna(lseries.iloc[i]) else int(lseries.iloc[i])
            out.append(_bit_slice_py(bytes(d), int(off.iloc[i]), lv))
        return pd.Series(out, dtype=object)

    if length:
        @F.pandas_udf("binary")
        def k3(data: pd.Series, off: pd.Series, ln: pd.Series) -> pd.Series:
            return run(data, off, ln)

        return k3(
            _lit(s).cast("binary"),
            _lit(offset).cast("bigint"),
            _lit(length[0]).cast("bigint"),
        )

    @F.pandas_udf("binary")
    def k2(data: pd.Series, off: pd.Series) -> pd.Series:
        return run(data, off, None)

    return k2(_lit(s).cast("binary"), _lit(offset).cast("bigint"))


# ---------------------------------------------------------------------------
# hashid — the public Hashids algorithm (hashids.org)
# ---------------------------------------------------------------------------

_HASHID_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ1234567890"
_HASHID_SEPS = "cfhistuCFHISTU"


def _hashids_shuffle(alphabet: str, salt: str) -> str:
    if not salt:
        return alphabet
    chars = list(alphabet)
    v = p = 0
    for i in range(len(chars) - 1, 0, -1):
        v %= len(salt)
        p += ord(salt[v])
        j = (ord(salt[v]) + v + p) % i
        chars[i], chars[j] = chars[j], chars[i]
        v += 1
    return "".join(chars)


def _hashids_setup(salt: str, alphabet: str):
    # canonical Hashids setup (hashids.org public spec)
    alphabet = "".join(dict.fromkeys(alphabet))
    seps = "".join(c for c in _HASHID_SEPS if c in alphabet)
    alphabet = "".join(c for c in alphabet if c not in seps)
    if len(alphabet) + len(seps) < 16:
        raise ValueError("hashid: alphabet must contain >= 16 unique chars")
    seps = _hashids_shuffle(seps, salt)
    if not seps or len(alphabet) / len(seps) > 3.5:
        seps_length = int(math.ceil(len(alphabet) / 3.5))
        if seps_length == 1:
            seps_length = 2
        if seps_length > len(seps):
            diff = seps_length - len(seps)
            seps += alphabet[:diff]
            alphabet = alphabet[diff:]
        else:
            seps = seps[:seps_length]
    alphabet = _hashids_shuffle(alphabet, salt)
    num_guards = int(math.ceil(len(alphabet) / 12.0))
    if len(alphabet) < 3:
        guards = seps[:num_guards]
        seps = seps[num_guards:]
    else:
        guards = alphabet[:num_guards]
        alphabet = alphabet[num_guards:]
    return alphabet, seps, guards


def _hashids_encode(n: int, salt: str, min_length: int, alphabet0: str) -> str:
    alphabet, seps, guards = _hashids_setup(salt, alphabet0)
    values = [n]
    values_hash = sum(v % (i + 100) for i, v in enumerate(values))
    lottery = alphabet[values_hash % len(alphabet)]
    encoded = lottery
    for i, value in enumerate(values):
        alphabet = _hashids_shuffle(
            alphabet, (lottery + salt + alphabet)[: len(alphabet)]
        )
        last = ""
        v = value
        while True:
            last = alphabet[v % len(alphabet)] + last
            v //= len(alphabet)
            if v == 0:
                break
        encoded += last
        if i < len(values) - 1:
            value %= ord(last[0]) + i
            encoded += seps[value % len(seps)]
    if len(encoded) < min_length:
        guard_index = (values_hash + ord(encoded[0])) % len(guards)
        encoded = guards[guard_index] + encoded
        if len(encoded) < min_length:
            guard_index = (values_hash + ord(encoded[2])) % len(guards)
            encoded += guards[guard_index]
        split_at = len(alphabet) // 2
        while len(encoded) < min_length:
            alphabet = _hashids_shuffle(alphabet, alphabet)
            encoded = (
                alphabet[split_at:] + encoded + alphabet[:split_at]
            )
            excess = len(encoded) - min_length
            if excess > 0:
                from_index = excess // 2
                encoded = encoded[from_index : from_index + min_length]
    return encoded


def _hashid(c, *rest):
    salt = _str(rest[0]) if len(rest) >= 1 else ""
    min_length = _int(rest[1]) if len(rest) >= 2 else 0
    alphabet = _str(rest[2]) if len(rest) >= 3 else _HASHID_ALPHABET

    @F.pandas_udf("string")
    def k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if pd.isna(v)
            else _hashids_encode(int(v), salt, min_length, alphabet)
        )

    return k(_lit(c).cast("bigint"))


# ---------------------------------------------------------------------------
# MD4 — RFC 1320, pure python (hashlib md4 is usually policy-disabled)
# ---------------------------------------------------------------------------


def _md4_bytes(data: bytes) -> bytes:
    def lrot(x, n):
        return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF

    msg = bytearray(data)
    ml = (8 * len(data)) & 0xFFFFFFFFFFFFFFFF
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += ml.to_bytes(8, "little")
    a, b, c, d = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    for off in range(0, len(msg), 64):
        x = list(struct.unpack("<16I", msg[off : off + 64]))
        aa, bb, cc, dd = a, b, c, d
        # round 1: F = (b & c) | (~b & d)
        for i, s in zip(range(16), [3, 7, 11, 19] * 4):
            if i % 4 == 0:
                a = lrot((a + ((b & c) | (~b & d)) + x[i]) & 0xFFFFFFFF, s)
            elif i % 4 == 1:
                d = lrot((d + ((a & b) | (~a & c)) + x[i]) & 0xFFFFFFFF, s)
            elif i % 4 == 2:
                c = lrot((c + ((d & a) | (~d & b)) + x[i]) & 0xFFFFFFFF, s)
            else:
                b = lrot((b + ((c & d) | (~c & a)) + x[i]) & 0xFFFFFFFF, s)
        # round 2: G = (b&c)|(b&d)|(c&d), +0x5A827999
        order2 = [0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15]
        for idx, (i, s) in enumerate(zip(order2, [3, 5, 9, 13] * 4)):
            if idx % 4 == 0:
                a = lrot(
                    (a + ((b & c) | (b & d) | (c & d)) + x[i] + 0x5A827999)
                    & 0xFFFFFFFF, s)
            elif idx % 4 == 1:
                d = lrot(
                    (d + ((a & b) | (a & c) | (b & c)) + x[i] + 0x5A827999)
                    & 0xFFFFFFFF, s)
            elif idx % 4 == 2:
                c = lrot(
                    (c + ((d & a) | (d & b) | (a & b)) + x[i] + 0x5A827999)
                    & 0xFFFFFFFF, s)
            else:
                b = lrot(
                    (b + ((c & d) | (c & a) | (d & a)) + x[i] + 0x5A827999)
                    & 0xFFFFFFFF, s)
        # round 3: H = b ^ c ^ d, +0x6ED9EBA1
        order3 = [0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15]
        for idx, (i, s) in enumerate(zip(order3, [3, 9, 11, 15] * 4)):
            if idx % 4 == 0:
                a = lrot((a + (b ^ c ^ d) + x[i] + 0x6ED9EBA1) & 0xFFFFFFFF, s)
            elif idx % 4 == 1:
                d = lrot((d + (a ^ b ^ c) + x[i] + 0x6ED9EBA1) & 0xFFFFFFFF, s)
            elif idx % 4 == 2:
                c = lrot((c + (d ^ a ^ b) + x[i] + 0x6ED9EBA1) & 0xFFFFFFFF, s)
            else:
                b = lrot((b + (c ^ d ^ a) + x[i] + 0x6ED9EBA1) & 0xFFFFFFFF, s)
        a = (a + aa) & 0xFFFFFFFF
        b = (b + bb) & 0xFFFFFFFF
        c = (c + cc) & 0xFFFFFFFF
        d = (d + dd) & 0xFFFFFFFF
    return struct.pack("<4I", a, b, c, d)


def _md4(c):
    @F.pandas_udf("string")
    def k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else _md4_bytes(
                v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            ).hex()
        )

    return k(_lit(c))


# ---------------------------------------------------------------------------
# bayesAB — exact Beta/Gamma race probabilities (deterministic)
# ---------------------------------------------------------------------------


def _prob_beta_beats(a1: float, b1: float, a2: float, b2: float) -> float:
    # P(X1 > X2), X1~Beta(a1,b1), X2~Beta(a2,b2) — exact closed form via
    # the standard sum over the first (integer) shape; bayesAB's alphas
    # are 1 + conversion counts, so they are always integral
    from math import lgamma, exp

    def lbeta(x, y):
        return lgamma(x) + lgamma(y) - lgamma(x + y)

    if not float(a1).is_integer() or a1 > 100000:
        raise ValueError("bayesAB: beta shape must be a modest integer")
    total = 0.0
    for i in range(int(a1)):
        total += exp(
            lbeta(a2 + i, b1 + b2)
            - math.log(b1 + i)
            - lbeta(1 + i, b1)
            - lbeta(a2, b2)
        )
    return total


def _prob_gamma_less(k1, s1, k2, s2) -> float:
    # P(G1 < G2) for G1~Gamma(shape k1, scale s1), G2~Gamma(k2, s2) with
    # integer k1, via the racing-Poisson identity (rate form)
    from math import lgamma, exp, log

    if not float(k1).is_integer() or k1 > 100000:
        raise ValueError("bayesAB: gamma shape must be a modest integer")
    r1, r2 = 1.0 / s1, 1.0 / s2
    # P(G1 < G2) = 1 - sum_{i=0}^{k1-1} E[P(Poisson(r1*G2) = i)] — the
    # Erlang CDF of G1 integrated against G2's density term-by-term:
    # each term is Gamma(k2+i)/(Gamma(k2) i!) * r1^i r2^k2/(r1+r2)^(k2+i)
    total = 0.0
    for i in range(int(k1)):
        total += exp(
            i * log(r1)
            + k2 * log(r2)
            - (i + k2) * log(r1 + r2)
            + lgamma(i + k2)
            - lgamma(i + 1)
            - lgamma(k2)
        )
    return 1.0 - total


def _bayes_ab(distribution, higher_is_better, variant_names, xs, ys):
    """abtesting.cpp bayesAB with EXACT probabilities instead of the
    reference's 25600 Monte-Carlo samples (DOCUMENTED METHOD DEVIATION —
    same quantities, no sampling noise).  ``to_be_best`` uses the product
    of pairwise win probabilities: exact for 2 variants, an approximation
    for 3+ (pairwise independence)."""
    dist = _str(distribution).lower()
    hib = str(higher_is_better).strip("'\"").lower() in ("1", "true")
    if not isinstance(variant_names, (list, tuple)):
        raise ValueError("bayesAB: variant_names must be a literal list")
    names = [str(v) for v in variant_names]
    xv = [float(v) for v in xs]
    yv = [float(v) for v in ys]
    if len({len(names), len(xv), len(yv)}) != 1 or not names:
        raise ValueError("bayesAB: names/xs/ys must have equal length")

    if dist == "beta":
        for x, y in zip(xv, yv):
            if x < y:
                raise ValueError("Conversions cannot be larger than trials")
        params = [(1.0 + y, 1.0 + x - y) for x, y in zip(xv, yv)]

        def p_higher(i, j):  # P(variant i sample > variant j sample)
            a1, b1 = params[i]
            a2, b2 = params[j]
            return _prob_beta_beats(a1, b1, a2, b2)

    elif dist == "gamma":
        # abtesting.cpp:66 — shape = 1 + x, scale = 250/(1 + 250*y); the
        # compared samples are the INVERSES, so sample_i > sample_j
        # exactly when gamma_i < gamma_j
        params = [(1.0 + x, 250.0 / (1.0 + 250.0 * y)) for x, y in zip(xv, yv)]

        def p_higher(i, j):
            k1, s1 = params[i]
            k2, s2 = params[j]
            return _prob_gamma_less(k1, s1, k2, s2)

    else:
        raise ValueError("bayesAB: distribution must be beta or gamma")

    def p_wins(i, j):
        return p_higher(i, j) if hib else (1.0 - p_higher(i, j))

    n = len(names)
    beats_control = [0.0] + [p_wins(i, 0) for i in range(1, n)]
    to_be_best = [
        math.prod(p_wins(i, j) for j in range(n) if j != i) if n > 1 else 1.0
        for i in range(n)
    ]

    import json

    payload = {
        "data": [
            {
                "variant_name": names[i],
                "x": xv[i],
                "y": yv[i],
                "beats_control": round(beats_control[i], 8),
                "to_be_best": round(to_be_best[i], 8),
            }
            for i in range(n)
        ]
    }
    return F.lit(json.dumps(payload, separators=(",", ":")))


# ---------------------------------------------------------------------------
# multiFuzzyMatch* — plain-literal fuzzy matching (restricted hyperscan)
# ---------------------------------------------------------------------------

_REGEX_META = re.compile(r"[.\\+*?\[\]^$(){}|]")


def _fuzzy_contains(hay: str, needle: str, dist: int) -> bool:
    # banded DP: does needle match any substring of hay with <= dist edits?
    n, m = len(hay), len(needle)
    if m == 0:
        return True
    prev = [0] * (n + 1)  # start anywhere: row 0 all zeros
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ch = needle[i - 1]
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if hay[j - 1] == ch else 1),
            )
        prev = cur
        if min(prev) > dist:
            return False
    return min(prev) <= dist


def _fuzzy_needles(patterns):
    if not isinstance(patterns, (list, tuple)):
        raise ValueError("multiFuzzyMatch*: patterns must be a literal array")
    needles = [str(p) for p in patterns]
    for nd in needles:
        if _REGEX_META.search(nd):
            raise NotImplementedError(
                "multiFuzzyMatch*: regex metacharacters need the hyperscan "
                "fuzzy engine; only plain-literal needles are supported "
                "(DOCUMENTED partial)"
            )
    return needles


def _multi_fuzzy(kind: str):
    def fn(hay, distance, patterns):
        needles = _fuzzy_needles(patterns)
        dist = _int(distance)

        if kind == "any":
            rtype = "boolean"
        elif kind == "index":
            rtype = "bigint"
        else:
            rtype = "array<bigint>"

        @F.pandas_udf(rtype)
        def k(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                hits = [
                    i + 1
                    for i, nd in enumerate(needles)
                    if _fuzzy_contains(v, nd, dist)
                ]
                if kind == "any":
                    return bool(hits)
                if kind == "index":
                    return hits[0] if hits else 0
                return hits

            return s.map(one)

        return k(_lit(hay))

    return fn


# ---------------------------------------------------------------------------
# text search query pair
# ---------------------------------------------------------------------------

_TS_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def _ts_parse(q: str):
    """tsquery grammar: term | 'phrase' | !expr | expr & expr | expr | expr,
    parens group.  Returns nested tuples ('val', token) / ('not', x) /
    ('and', l, r) / ('or', l, r)."""
    toks = re.findall(r"\(|\)|&|\||!|'[^']*'|[^\s()&|!]+", q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        node = parse_and()
        while peek() == "|":
            eat()
            node = ("or", node, parse_and())
        return node

    def parse_and():
        node = parse_not()
        while peek() == "&":
            eat()
            node = ("and", node, parse_not())
        return node

    def parse_not():
        if peek() == "!":
            eat()
            return ("not", parse_not())
        return parse_atom()

    def parse_atom():
        t = peek()
        if t == "(":
            eat()
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"toTextSearchQuery: unbalanced parens in {q!r}")
            eat()
            return node
        if t is None or t in (")", "&", "|"):
            raise ValueError(f"toTextSearchQuery: bad query {q!r}")
        return ("val", eat().strip("'").lower())

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"toTextSearchQuery: trailing tokens in {q!r}")
    return node


def _ts_render(node) -> str:
    kind = node[0]
    if kind == "val":
        return f"VAL({node[1]})"
    if kind == "not":
        return f"NOT({_ts_render(node[1])})"
    return f"{kind.upper()}({_ts_render(node[1])}, {_ts_render(node[2])})"


def _ts_eval(node, tokens: set) -> bool:
    kind = node[0]
    if kind == "val":
        return all(t in tokens for t in _TS_TOKEN_RE.findall(node[1]))
    if kind == "not":
        return not _ts_eval(node[1], tokens)
    if kind == "and":
        return _ts_eval(node[1], tokens) and _ts_eval(node[2], tokens)
    return _ts_eval(node[1], tokens) or _ts_eval(node[2], tokens)


def _to_text_search_query(q):
    if isinstance(q, Column):
        @F.pandas_udf("string")
        def k(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None if v is None else _ts_render(_ts_parse(v))
            )

        return k(q)
    return F.lit(_ts_render(_ts_parse(str(q))))


def _text_search(text, query):
    if isinstance(query, Column):
        @F.pandas_udf("boolean")
        def kdyn(s: pd.Series, qs: pd.Series) -> pd.Series:
            def one(i):
                v = s.iloc[i]
                if v is None or qs.iloc[i] is None:
                    return None
                toks = set(t.lower() for t in _TS_TOKEN_RE.findall(v))
                return _ts_eval(_ts_parse(qs.iloc[i]), toks)

            return pd.Series([one(i) for i in range(len(s))])

        return kdyn(_lit(text), query)

    qnode = _ts_parse(str(query))

    @F.pandas_udf("boolean")
    def k(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            toks = set(t.lower() for t in _TS_TOKEN_RE.findall(v))
            return _ts_eval(qnode, toks)

        return s.map(one)

    return k(_lit(text))


# ---------------------------------------------------------------------------
# logTrace
# ---------------------------------------------------------------------------


def _log_trace(msg):
    # the reference writes msg to the server text log and returns 0; we
    # have no server log — DOCUMENTED no-op, same return contract
    return F.lit(0).cast("tinyint")


# ---------------------------------------------------------------------------
# install
# ---------------------------------------------------------------------------


def install(SCALAR: dict, AGG: dict) -> None:
    batch = {
        "CAST": _cast_ch,
        "interval": _mysql_interval,
        "globalVariable": _global_variable,
        "errorCodeToName": _error_code_to_name,
        "hashRange": _hash_range,
        "bucket": _bucket,
        "bucket_bounds_search": _bucket_bounds_search,
        "extractMapColumn": _extract_map_column,
        "extractMapKey": _extract_map_key,
        "partitionId": _partition_id,
        "tupleToNameValuePairs": _tuple_to_name_value_pairs,
        "addTupleOfIntervals": _add_tuple_of_intervals,
        "subtractTupleOfIntervals": _subtract_tuple_of_intervals,
        "aes_encrypt_mysql": _aes_mysql(True),
        "aes_decrypt_mysql": _aes_mysql(False),
        "filesystemAvailable": lambda *a: _statvfs_bytes("available"),
        "filesystemCapacity": lambda *a: _statvfs_bytes("capacity"),
        "filesystemFree": lambda *a: _statvfs_bytes("free"),
        "file": _file,
        "logTrace": _log_trace,
        "arraySetCheck": _array_set_check,
        "arraySetGet": _array_set_get,
        "arraySetGetAny": _array_set_get_any,
        "arrayReduceInRanges": _array_reduce_in_ranges,
        "topoFindDown": _topo_find_down,
        "toInterval": _to_interval,
        "toTimeType": _to_time_type,
        "bitSlice": _bit_slice,
        "hashid": _hashid,
        "MD4": _md4,
        "bayesAB": _bayes_ab,
        "multiFuzzyMatchAny": _multi_fuzzy("any"),
        "multiFuzzyMatchAnyIndex": _multi_fuzzy("index"),
        "multiFuzzyMatchAllIndices": _multi_fuzzy("all"),
        "toTextSearchQuery": _to_text_search_query,
        "textSearch": _text_search,
    }
    for name, fn in batch.items():
        SCALAR.setdefault(name, fn)


# ---------------------------------------------------------------------------
# finalizeAggregation / initializeAggregation over the explicit-state
# sketch family (the reference's -State combinator carries the aggregate
# type; our states are explicit blobs per DataTypeSketchBinary.h, so the
# state KIND is a second argument — 'uniq' (HLL, default), 'uniqTheta'
# (KMV), 'sum'/'count' (plain numbers).  DOCUMENTED SIGNATURE DEVIATION.
# ---------------------------------------------------------------------------


def _finalize_aggregation(state, kind="uniq"):
    k = _str(kind)
    if k in ("sum", "count"):
        return _lit(state).cast("bigint")
    if k == "uniq":
        # uniq_estimate is already a pandas_udf — apply it directly
        from byconity_spark.udafs.sketches import uniq_estimate

        return uniq_estimate(_lit(state))
    if k == "uniqTheta":
        from byconity_spark.udafs.sketches import _theta_estimate

        import numpy as np

        @F.pandas_udf("bigint")
        def fin_t(s: pd.Series) -> pd.Series:
            return s.map(
                lambda b: 0
                if b is None
                else _theta_estimate(np.frombuffer(b, dtype=np.uint64))
            ).astype("int64")

        return fin_t(_lit(state))
    raise ValueError(f"finalizeAggregation: unsupported state kind {kind}")


def _initialize_aggregation(name, value):
    agg = _str(name)
    c = _lit(value)
    if agg == "sumState":
        return c.cast("bigint")
    if agg == "countState":
        return F.when(c.isNotNull(), 1).otherwise(0).cast("bigint")
    if agg in ("uniqState", "uniqThetaState"):
        import numpy as np

        from byconity_spark.udafs.sketches import (
            _registers_from_hashes,
            _theta_from_hashes,
        )

        build = (
            _registers_from_hashes if agg == "uniqState" else _theta_from_hashes
        )

        @F.pandas_udf("binary")
        def init(h: pd.Series) -> pd.Series:
            def one(v):
                if pd.isna(v):
                    # empty state: no registered hash
                    return build(np.array([], dtype=np.int64)).tobytes() \
                        if agg == "uniqState" else b""
                return bytes(build(np.array([v], dtype=np.int64)))

            return pd.Series([one(v) for v in h], dtype=object)

        hashed = F.when(c.isNotNull(), F.xxhash64(c))
        return init(hashed)
    raise ValueError(f"initializeAggregation: unsupported aggregate {name}")


def install2(SCALAR: dict, AGG: dict) -> None:
    SCALAR.setdefault("finalizeAggregation", _finalize_aggregation)
    SCALAR.setdefault("initializeAggregation", _initialize_aggregation)
    SCALAR.setdefault("getMapKeys", _get_map_keys)


def _get_map_keys(db, table, column, *pattern):
    """getMapKeys(db, table, column[, partition_pattern]) — distinct keys
    of a map column of a registered table (reference map.cpp:945
    FunctionGetMapKeys, which itself executes a driver-side subquery:
    ``SELECT groupUniqArrayArray(..) FROM db.table``; we run the same
    aggregation through the session catalog).  Returns the sorted key
    array as a constant, like the reference's one-row result."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("getMapKeys needs an active SparkSession")
    dbn, tbl, col = _str(db), _str(table), _str(column)
    for cand in (f"{dbn}.{tbl}" if dbn and dbn != "default" else tbl, tbl):
        try:
            df = spark.table(cand)
            break
        except Exception:
            df = None
    if df is None:
        raise ValueError(f"getMapKeys: unknown table {dbn}.{tbl}")
    rows = (
        df.select(F.explode(F.map_keys(F.col(col))).alias("__k"))
        .distinct()
        .collect()
    )
    keys = sorted(r["__k"] for r in rows)
    return F.array(*[F.lit(k) for k in keys]) if keys else (
        F.array().cast("array<string>")
    )

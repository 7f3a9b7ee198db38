"""Spark-compatible xxHash64 as generated DuckDB SQL.

Spark's ``xxhash64(cols...)`` (catalyst ``XxHash64``) chains the XXH64
short-input kernels over the columns left-to-right, starting from seed
42: ``h = hashInt(c, h)`` for 4-byte inputs, ``h = hashLong(c, h)`` for
8-byte inputs, each including the final avalanche (fmix). Several
engine kernels key on it (random-walk neighbor picks, MinHash, SimHash
— seeded trajectories per RandomWalkingRunner.java:24,31), so DuckDB
oracles for those kernels must reproduce the hash bit-for-bit.

DuckDB has no xxhash64 and its BIGINT arithmetic raises on overflow
rather than wrapping, so the kernels are emitted as a PIPELINE of
nested SELECTs over HUGEINT values kept in [0, 2**64): multiplication
mod 2**64 splits into 32-bit halves (each partial product fits a
HUGEINT), XOR drops to BIGINT halves (DuckDB ``xor`` is BIGINT-only),
rotations become divmod by powers of two. Each pipeline level only
references the level below it, so the generated text grows linearly
with the number of hash operations, not exponentially.

A Python reference implementation (``xxh64_int`` / ``xxh64_long`` /
``spark_xxhash64``) precomputes hashes of LITERAL inputs at
oracle-generation time and anchors the unit tests; Spark itself is the
ground truth (tests/test_xxhash_sql.py compares all three).
"""

from __future__ import annotations

PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
SPARK_SEED = 42
_M64 = 1 << 64
_M32 = 1 << 32


# ---------------------------------------------------------------------------
# Python reference (literal precompute + test anchor)
# ---------------------------------------------------------------------------


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & (_M64 - 1)


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME64_2) % _M64
    h ^= h >> 29
    h = (h * PRIME64_3) % _M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark XXH64.hashUnsafeBytes — what
    ``F.xxhash64`` applies to a StringType column's UTF-8 bytes),
    unsigned result. Full spec including the 32-byte stripe path;
    words are read little-endian (Spark's Platform.getLong on x86).
    Pinned bit-for-bit against Spark in tests/test_xxhash_sql.py."""
    n = len(data)
    off = 0
    if n >= 32:
        v = [
            (seed + PRIME64_1 + PRIME64_2) % _M64,
            (seed + PRIME64_2) % _M64,
            seed % _M64,
            (seed - PRIME64_1) % _M64,
        ]
        while off + 32 <= n:
            for i in range(4):
                w = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v[i] = (_rotl((v[i] + w * PRIME64_2) % _M64, 31) * PRIME64_1) % _M64
            off += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) % _M64
        for vi in v:
            h ^= (_rotl((vi * PRIME64_2) % _M64, 31) * PRIME64_1) % _M64
            h = (h * PRIME64_1 + PRIME64_4) % _M64
        h = (h + n) % _M64
    else:
        h = (seed + PRIME64_5 + n) % _M64
    while off + 8 <= n:
        w = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((w * PRIME64_2) % _M64, 31) * PRIME64_1) % _M64
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) % _M64
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off : off + 4], "little")
        h ^= (w * PRIME64_1) % _M64
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) % _M64
        off += 4
    while off < n:
        h ^= (data[off] * PRIME64_5) % _M64
        h = (_rotl(h, 11) * PRIME64_1) % _M64
        off += 1
    return _fmix(h)


def xxh64_int(i: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark XXH64.hashInt), unsigned result."""
    h = (seed + PRIME64_5 + 4) % _M64
    h ^= ((i % _M32) * PRIME64_1) % _M64
    h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) % _M64
    return _fmix(h)


def xxh64_long(l: int, seed: int) -> int:  # noqa: E741 - mirrors Spark name
    """XXH64 of one 8-byte long (Spark XXH64.hashLong), unsigned result."""
    h = (seed + PRIME64_5 + 8) % _M64
    h ^= (_rotl(((l % _M64) * PRIME64_2) % _M64, 31) * PRIME64_1) % _M64
    h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) % _M64
    return _fmix(h)


def to_signed(u: int) -> int:
    """Unsigned 64-bit value -> Java signed long (Spark's output type)."""
    return u - _M64 if u >= (1 << 63) else u


def spark_xxhash64(values: list[tuple[int, str]]) -> int:
    """Signed ``F.xxhash64(*values)`` of literal ints/longs: chain the
    per-type kernels from seed 42, exactly as catalyst does."""
    h = SPARK_SEED
    for v, typ in values:
        if typ == "int":
            h = xxh64_int(v, h)
        elif typ == "long":
            h = xxh64_long(v, h)
        elif typ == "str":
            h = xxh64_bytes(v.encode("utf-8"), h)
        else:  # pragma: no cover - caller bug
            raise ValueError(f"unsupported type {typ!r}")
    return to_signed(h)


# ---------------------------------------------------------------------------
# DuckDB SQL pipeline generator
# ---------------------------------------------------------------------------


class XXPipe:
    """Accumulates hash operations as pipeline LEVELS; ``sql()`` emits
    them as nested SELECTs (innermost = level 0). Every level re-selects
    the carry columns plus all hash intermediates created so far, so any
    level may reference any earlier value by name while the text stays
    linear in operation count."""

    def __init__(self, carry: list[str]):
        self.carry = list(carry)
        self.levels: list[dict[str, str]] = []
        self._n = 0

    def _add(self, expr: str) -> str:
        self._n += 1
        name = f"x{self._n}"
        self.levels.append({name: expr})
        return name

    # -- 64-bit primitives over HUGEINT in [0, 2**64) --------------------

    def norm64(self, expr: str) -> str:
        """Any signed integer expression -> unsigned 64-bit HUGEINT."""
        return self._add(
            f"(((CAST({expr} AS HUGEINT) % {_M64}) + {_M64}) % {_M64})"
        )

    def norm32(self, expr: str) -> str:
        """Java ``(i & 0xFFFFFFFFL)``: zero-extend a 32-bit int."""
        return self._add(
            f"(((CAST({expr} AS HUGEINT) % {_M32}) + {_M32}) % {_M32})"
        )

    def addc(self, a: str, c: int) -> str:
        return self._add(f"(({a} + {c % _M64}) % {_M64})")

    def mul64c(self, a: str, k: int, add_c: int = 0) -> str:
        """(a * k + add_c) mod 2**64 for a constant k: 32-bit-half
        schoolbook product; every partial fits a HUGEINT."""
        klo, khi = k % _M32, (k >> 32) % _M32
        self._n += 1
        lo, hi = f"x{self._n}l", f"x{self._n}h"
        self.levels.append({lo: f"(({a}) % {_M32})", hi: f"(({a}) // {_M32})"})
        expr = (
            f"(({lo} * {klo} + (({lo} * {khi} + {hi} * {klo}) % {_M32})"
            f" * {_M32} + {add_c % _M64}) % {_M64})"
        )
        return self._add(expr)

    def xor64(self, a: str, b_expr: str) -> str:
        """a XOR b via BIGINT halves (DuckDB xor() is BIGINT-only)."""
        self._n += 1
        alo, ahi = f"x{self._n}al", f"x{self._n}ah"
        blo, bhi = f"x{self._n}bl", f"x{self._n}bh"
        self.levels.append(
            {
                alo: f"CAST(({a}) % {_M32} AS BIGINT)",
                ahi: f"CAST(({a}) // {_M32} AS BIGINT)",
                blo: f"CAST(({b_expr}) % {_M32} AS BIGINT)",
                bhi: f"CAST(({b_expr}) // {_M32} AS BIGINT)",
            }
        )
        return self._add(
            f"(CAST(xor({ahi}, {bhi}) AS HUGEINT) * {_M32}"
            f" + xor({alo}, {blo}))"
        )

    def rotl(self, a: str, n: int) -> str:
        lo_mod = 1 << (64 - n)
        return self._add(f"((({a} % {lo_mod}) * {1 << n}) + ({a} // {lo_mod}))")

    def _fmix(self, h: str) -> str:
        h = self.xor64(h, f"{h} // {1 << 33}")
        h = self.mul64c(h, PRIME64_2)
        h = self.xor64(h, f"{h} // {1 << 29}")
        h = self.mul64c(h, PRIME64_3)
        return self.xor64(h, f"{h} // {1 << 32}")

    # -- Spark kernels ----------------------------------------------------

    def hash_int(self, i_expr: str, seed) -> str:
        """Spark XXH64.hashInt; ``seed`` is an int literal or a prior
        pipeline column name (str)."""
        if isinstance(seed, int):
            h = self._add(f"CAST({(seed + PRIME64_5 + 4) % _M64} AS HUGEINT)")
        else:
            h = self.addc(seed, PRIME64_5 + 4)
        iu = self.norm32(i_expr)
        m = self.mul64c(iu, PRIME64_1)
        h = self.xor64(h, m)
        h = self.rotl(h, 23)
        h = self.mul64c(h, PRIME64_2, add_c=PRIME64_3)
        return self._fmix(h)

    def hash_long(self, l_expr: str, seed) -> str:
        """Spark XXH64.hashLong; ``seed`` as in hash_int."""
        lu = self.norm64(l_expr)
        k = self.mul64c(lu, PRIME64_2)
        k = self.rotl(k, 31)
        k = self.mul64c(k, PRIME64_1)
        if isinstance(seed, int):
            h = self._add(f"CAST({(seed + PRIME64_5 + 8) % _M64} AS HUGEINT)")
        else:
            h = self.addc(seed, PRIME64_5 + 8)
        h = self.xor64(h, k)
        h = self.rotl(h, 27)
        h = self.mul64c(h, PRIME64_1, add_c=PRIME64_4)
        return self._fmix(h)

    def pick(self, cond: str, a: str, b: str) -> str:
        """CASE WHEN cond THEN a ELSE b — conditional application of a
        mix step (the SQL form of xxHash's data-length-dependent
        loops, unrolled to the declared byte bound)."""
        return self._add(f"(CASE WHEN {cond} THEN {a} ELSE {b} END)")

    def hash_str(self, t_expr: str, seed, max_len: int = 31) -> str:
        """Spark XXH64.hashUnsafeBytes over an ASCII VARCHAR column —
        the kernel ``F.xxhash64`` applies to StringType. Unrolls the
        8-byte word / 4-byte chunk / tail-byte loops to ``max_len``
        bytes (< 32, so the stripe path never arises) with pick()
        guards on the actual length; bytes come from
        ``unicode(substr(...))`` over a padded copy so out-of-range
        reads are harmless garbage that the guards discard.

        ASCII-only by construction (code point == byte); the emitted
        value is NULL — a loud hash-mismatch, never a silent wrong
        answer — for non-ASCII or longer-than-bound tokens."""
        if max_len >= 32:  # pragma: no cover - caller bug
            raise ValueError("hash_str covers the sub-stripe path only")
        t = self._add(f"({t_expr})")
        tp = self._add(f"({t} || repeat(chr(7), {max_len + 9}))")
        ln = self._add(f"CAST(length({t}) AS HUGEINT)")

        def byte(pos: str) -> str:
            return f"unicode(substr({tp}, CAST({pos} AS BIGINT), 1))"

        if isinstance(seed, int):
            h = self._add(
                f"((CAST({(seed + PRIME64_5) % _M64} AS HUGEINT) + {ln}) % {_M64})"
            )
        else:
            h = self._add(f"(({seed} + {PRIME64_5 % _M64} + {ln}) % {_M64})")
        for wi in range(max_len // 8):
            w = self._add(
                "(" + " + ".join(
                    f"CAST({byte(str(8 * wi + k + 1))} AS HUGEINT) * {1 << (8 * k)}"
                    for k in range(8)
                ) + ")"
            )
            k1 = self.mul64c(w, PRIME64_2)
            k1 = self.rotl(k1, 31)
            k1 = self.mul64c(k1, PRIME64_1)
            hx = self.xor64(h, k1)
            hx = self.rotl(hx, 27)
            hx = self.mul64c(hx, PRIME64_1, add_c=PRIME64_4)
            h = self.pick(f"{ln} >= {8 * (wi + 1)}", hx, h)
        # 4-byte chunk at the word-aligned offset (length & -8)
        woff = self._add(f"(({ln} // 8) * 8)")
        c = self._add(
            "(" + " + ".join(
                f"CAST({byte(f'{woff} + {k + 1}')} AS HUGEINT) * {1 << (8 * k)}"
                for k in range(4)
            ) + ")"
        )
        m = self.mul64c(c, PRIME64_1)
        hx = self.xor64(h, m)
        hx = self.rotl(hx, 23)
        hx = self.mul64c(hx, PRIME64_2, add_c=PRIME64_3)
        h = self.pick(f"({ln} % 8) >= 4", hx, h)
        # tail bytes (at most 3 after words + chunk)
        ts = self._add(
            f"({woff} + (CASE WHEN ({ln} % 8) >= 4 THEN 4 ELSE 0 END))"
        )
        tl = self._add(f"({ln} - {ts})")
        for bi in range(3):
            b = self._add(f"CAST({byte(f'{ts} + {bi + 1}')} AS HUGEINT)")
            m = self.mul64c(b, PRIME64_5)
            hx = self.xor64(h, m)
            hx = self.rotl(hx, 11)
            hx = self.mul64c(hx, PRIME64_1)
            h = self.pick(f"{tl} > {bi}", hx, h)
        h = self._fmix(h)
        return self.pick(
            f"octet_length(encode({t})) = {ln} AND {ln} <= {max_len}",
            h,
            "NULL",
        )

    def signed(self, h: str) -> str:
        """Unsigned HUGEINT column -> Spark's signed BIGINT."""
        return self._add(
            f"CAST(CASE WHEN {h} >= {1 << 63} THEN {h} - {_M64}"
            f" ELSE {h} END AS BIGINT)"
        )

    def sql(self, src_sql: str, out_col: str, result: str) -> str:
        """Nested-SELECT pipeline over ``src_sql`` (a CTE name or a
        parenthesized subquery) exposing carry columns + ``result`` as
        ``out_col``."""
        return self.sql_multi(src_sql, {out_col: result})

    def sql_multi(self, src_sql: str, results: dict[str, str]) -> str:
        """Like sql() but exposing several result expressions at once
        (one pipeline can chain/branch multiple hashes over shared
        intermediates). Emitted as a FLAT chain of one-level CTEs
        (``WITH p0 AS (...), p1 AS (SELECT .. FROM p0), ...``): nested
        subqueries blew DuckDB's parser recursion past ~200 levels,
        and a single lateral-alias SELECT blew its binder (aliases are
        expanded by substitution — multi-referenced intermediates grow
        exponentially). A CTE list parses linearly and binds each
        level exactly once. Dead intermediates are pruned: each CTE
        re-selects only the carry columns plus intermediates still
        referenced by a LATER level or a result expression, keeping
        the text linear in live operations."""
        import re

        # CTE prefix derived from the (caller-chosen, stable) result
        # column names — NOT a global counter: a counter made every
        # emitted oracle's text depend on import/emission ORDER, so
        # adding one new substrate consumer churned the oracle_sha of
        # five untouched keys and defeated the ledger's edited-oracle
        # staleness signal (round-10 self-review). Distinct result
        # names within one oracle guarantee distinct prefixes at any
        # given nesting level; inner emissions wrapped as subqueries
        # may shadow outer names legally.
        pfx = "xx_" + "_".join(results) + "_"
        name_re = re.compile(r"\bx\d+(?:[a-z]{1,2})?\b")
        n_levels = len(self.levels)
        # liveness, backwards: a level survives if any of its outputs
        # is read by a surviving later level or a result expression
        live = [False] * n_levels
        needed: set[str] = set()
        for expr in results.values():
            needed.update(name_re.findall(expr))
        for i in range(n_levels - 1, -1, -1):
            if any(nm in needed for nm in self.levels[i]):
                live[i] = True
                for expr in self.levels[i].values():
                    needed.update(name_re.findall(expr))
        # last surviving position at which each intermediate is read
        # (n_levels = the result expressions)
        last_ref: dict[str, int] = {}
        for i in range(n_levels):
            if not live[i]:
                continue
            for expr in self.levels[i].values():
                for nm in name_re.findall(expr):
                    last_ref[nm] = i
        for expr in results.values():
            for nm in name_re.findall(expr):
                last_ref[nm] = n_levels
        ctes: list[str] = []
        created: list[str] = []
        prev = f"({src_sql})" if " " in src_sql.strip() else src_sql
        for i in range(n_levels):
            if not live[i]:
                continue
            level = self.levels[i]
            cols = ", ".join(f"{e} AS {n}" for n, e in level.items())
            keep = ", ".join(
                self.carry
                + [nm for nm in created if last_ref.get(nm, -1) > i]
            )
            name = f"{pfx}{len(ctes)}"
            ctes.append(f"{name} AS (SELECT {keep}, {cols} FROM {prev})")
            created.extend(level.keys())
            prev = name
        keep = ", ".join(self.carry)
        outs = ", ".join(f"{e} AS {n}" for n, e in results.items())
        if not ctes:
            return f"SELECT {keep}, {outs} FROM {prev}"
        return (
            "WITH " + ",\n ".join(ctes) + f"\n SELECT {keep}, {outs} FROM {prev}"
        )


def xxhash64_sql(
    src_sql: str,
    carry: list[str],
    inputs: list[tuple[str, str]],
    out_col: str,
) -> str:
    """One-call form: SELECT carry..., signed spark-xxhash64(inputs) AS
    out_col FROM src_sql. ``inputs`` are (sql_expr, 'int'|'long') pairs
    hashed left-to-right from seed 42, exactly like ``F.xxhash64``."""
    pipe = XXPipe(carry)
    h: int | str = SPARK_SEED
    for expr, typ in inputs:
        if typ == "int":
            h = pipe.hash_int(expr, h)
        elif typ == "long":
            h = pipe.hash_long(expr, h)
        elif typ == "str":
            h = pipe.hash_str(expr, h)
        else:  # pragma: no cover - caller bug
            raise ValueError(f"unsupported type {typ!r}")
    return pipe.sql(src_sql, out_col, pipe.signed(h))

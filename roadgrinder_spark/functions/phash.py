"""Portable polynomial string hash — the shared Spark/DuckDB base hash
under MinHash, SimHash, and winnowing fingerprints.

Round 1 used xxhash64, which DuckDB lacks, leaving those operators
rows-only at the driver's correctness gate. This replaces it with a
Rabin-Karp-style polynomial over the first 8 code points plus a length
salt, written in the shared SQL subset (ascii, substring, +, *, %) so the
DuckDB oracle can reproduce every signature bit-exactly (VERDICT r1 #3).

h_B(s) = (sum_{i=1..8} ascii(s[i]) * B^(8-i)  +  length(s) * SALT) mod P

- P = 2^31 - 1 (Mersenne), values fit 31 bits, so universal-hash
  permutations (a*h + b) mod P stay inside signed-64 arithmetic.
- ascii('') = 0 in BOTH engines, so strings shorter than 8 pad with
  zeros; the length term separates prefix-sharing strings.
- ascii() returns the Unicode code point in both engines (verified), so
  the hash is codepoint-defined, not byte-defined.
- Two independent bases (263, 191) give two ~31-bit hashes; SimHash
  packs them into one 62-bit value.

Overflow audit: term <= 0x10FFFF * P < 2^52; eight terms + length*SALT
< 2^56 — one `% P` at the end suffices, no intermediate mod needed.
"""

from __future__ import annotations

P = 2147483647  # 2^31 - 1
B1 = 263
B2 = 191
LEN_SALT = 1000003


def _powers(base: int, n: int = 8) -> list[int]:
    out = [1]
    for _ in range(n - 1):
        out.append(out[-1] * base % P)
    return out


POW1 = _powers(B1)
POW2 = _powers(B2)


def poly8_sql(expr: str, base: int) -> str:
    """Shared-subset SQL for h_base(expr). `expr` is evaluated 9 times —
    stage it through a named column/lambda var first if it is not cheap."""
    pows = _powers(base)
    # CAST(pow AS BIGINT) keeps every product in 64-bit: ascii() returns
    # INT32 and both engines run checked 32-bit multiply otherwise.
    terms = " + ".join(
        f"ascii(substring({expr}, {i + 1}, 1)) * CAST({pows[7 - i]} AS BIGINT)"
        for i in range(8)
    )
    return f"(({terms} + length({expr}) * CAST({LEN_SALT} AS BIGINT)) % {P})"


def poly8_py(s: str, base: int) -> int:
    """Reference implementation (tests / numpy-kernel parity)."""
    pows = _powers(base)
    acc = sum(ord(c) * pows[7 - i] for i, c in enumerate(s[:8]))
    return (acc + len(s) * LEN_SALT) % P


def md5_prefix_value(h, nibbles: int):
    """Column: first `nibbles` hex chars of an md5 Column decoded as a
    BIGINT — the engine-portable hex parse (no hex-decode builtin exists
    in the shared Spark/DuckDB subset; instr over the hex alphabet does).
    Shared by sampling (4 nibbles) and the KMV sketch (12 nibbles)."""
    from pyspark.sql import functions as F

    out = F.lit(0).cast("long")
    for i in range(nibbles):
        out = out * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1
        )
    return out


def md5_prefix_sql(h: str, nibbles: int) -> str:
    """SQL mirror of md5_prefix_value."""
    expr = "CAST(0 AS BIGINT)"
    for i in range(nibbles):
        expr = (
            f"({expr}) * 16 + "
            f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        )
    return expr

#!/usr/bin/env python
"""Mechanical sweep for the benford-class cross-engine rounding hazard.

Round 5's one red row (`dq_benford_firstdigit`) was a `round()` applied to
a double that was itself DERIVED FROM another rounded double: the chained
float rounding manufactured exact .5 ties, and the driver's DuckDB build
tie-broke them differently than Spark. The fix class is the integer-bps
idiom (quantize to an integer FIRST, via CAST(round(x) AS BIGINT) or
floor-division, then do exact integer arithmetic).

This script flags, in every declared oracle:
  round( <arg containing another round(...) > , n )
where the inner round's value escapes as a DOUBLE — i.e. it is NOT
immediately re-anchored to an exact integer by CAST(... AS
BIGINT/INT/INTEGER/HUGEINT) or by `// 1`-style floor division. Such inner
integer anchors are exact in both engines and therefore safe.

Exit 0 when nothing is flagged; exit 1 with a per-site report otherwise.
Run: python scripts/oracle_hazard_sweep.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _match_paren(text: str, open_idx: int) -> int:
    """Index of the ')' matching text[open_idx] == '('; -1 if unbalanced."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _round_calls(sql: str) -> list[tuple[int, int]]:
    """(arg_start, arg_end) spans of every round( ... ) argument list."""
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE):
        open_idx = sql.index("(", m.start())
        close = _match_paren(sql, open_idx)
        if close > 0:
            out.append((open_idx + 1, close))
    return out


def _is_integer_anchored(sql: str, inner_start: int, inner_end: int) -> bool:
    """True if the round() spanning [inner_start, inner_end) is re-anchored
    to an exact integer, which kills the hazard:
    - CAST(round(...) AS BIGINT/INT/INTEGER/HUGEINT/LONG), or
    - round(...) // <divisor> (integer floor division of the rounded value)."""
    after = sql[inner_end:]
    if re.match(r"\s*//", after):
        return True
    before = sql[:inner_start]
    m = re.search(r"CAST\s*\(\s*$", before, re.IGNORECASE)
    if not m:
        return False
    return bool(re.match(r"\s*AS\s+(BIGINT|INT|INTEGER|HUGEINT|LONG)\b", after, re.IGNORECASE))


def _decimal_floordiv_sites(sql: str) -> list[tuple[str, list[str]]]:
    """Round-9 hazard class: DuckDB ``//`` on DECIMAL operands degrades to
    DOUBLE division (no integral semantics at all), so a following
    CAST(... AS BIGINT) ROUNDS the quotient instead of flooring it —
    text_simpson_diversity shipped exactly this (33316.71 -> 33317 while
    Spark's DIV truncates to 33316). Flag every ``//`` line that touches an
    alias defined via CAST(... AS DECIMAL(38,n)) unless that alias is
    re-anchored with CAST(alias AS HUGEINT/BIGINT) on the same line."""
    dec_aliases = set(
        re.findall(r"AS\s+DECIMAL\(38,\s*\d+\)\)\s+AS\s+(\w+)", sql, re.IGNORECASE)
    )
    if not dec_aliases:
        return []
    hits: list[tuple[str, list[str]]] = []
    for line in sql.splitlines():
        if "//" not in line:
            continue
        risky = set(re.findall(r"\b([a-z_]\w*)\b", line)) & dec_aliases
        if not risky:
            continue
        cleared = all(
            re.search(rf"CAST\(\s*{r}\s+AS\s+(HUGEINT|BIGINT)\)", line, re.IGNORECASE)
            for r in risky
        )
        if not cleared:
            hits.append((line.strip(), sorted(risky)))
    return hits


def sweep() -> int:
    from __spark_entry__ import oracle_sql

    flagged: list[tuple[str, str]] = []
    for qid, sql in sorted(oracle_sql().items()):
        for line, risky in _decimal_floordiv_sites(sql):
            flagged.append((qid, f"DECIMAL '//' (double div!) on {risky}: {line[:120]}"))
        spans = _round_calls(sql)
        for a, b in spans:
            arg = sql[a:b]
            # inner round( occurrences inside this argument list
            for im in re.finditer(r"\bround\s*\(", arg, re.IGNORECASE):
                inner_open = arg.index("(", im.start())
                inner_close = _match_paren(arg, inner_open)
                if inner_close < 0:
                    continue
                abs_start = a + im.start()
                abs_end = a + inner_close + 1
                if _is_integer_anchored(sql, abs_start, abs_end):
                    continue
                snippet = " ".join(sql[max(0, abs_start - 60) : abs_end + 20].split())
                flagged.append((qid, snippet))
    if not flagged:
        print(f"oracle_hazard_sweep: 0 flagged sites across {len(oracle_sql())} oracles")
        return 0
    print(f"oracle_hazard_sweep: {len(flagged)} FLAGGED site(s):")
    for qid, snippet in flagged:
        print(f"  {qid}: ...{snippet}...")
    return 1


if __name__ == "__main__":
    sys.exit(sweep())

#!/usr/bin/env python3
"""One-shot source sweep for the round-12 signed-zero escape class.

Inserts ` + 0` after every DOUBLE-producing `round(...)` in oracle SQL
string literals that is directly emitted/aliased (`round(...) AS name`
or `CAST(round(...) AS DOUBLE)`), so DuckDB's sign-preserving round
(round(-1e-9, 4) -> -0.0) can never emit a cell whose IEEE-754 bits
differ from Spark's BigDecimal-based round (always +0.0).

Skips: Scala-side functions.round (followed by `).as(` / operators, not
SQL `AS`), sites already protected, casts to non-DOUBLE types, and
rounds whose argument is itself a top-level DECIMAL cast (decimal
result; `+ 0` would widen the decimal and flip the arrow type).

Dev-only tool — run once, review the diff, delete nothing silently.
"""
import re, sys

TYPES = {"DOUBLE", "BIGINT", "INT", "INTEGER", "SMALLINT", "HUGEINT",
         "REAL", "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "DECIMAL",
         "BOOLEAN", "TINYINT", "UTINYINT", "UBIGINT", "UINTEGER"}

def match_paren(s, open_i):
    depth = 0
    for i in range(open_i, len(s)):
        if s[i] == '(':
            depth += 1
        elif s[i] == ')':
            depth -= 1
            if depth == 0:
                return i
    return -1

def patch(text, path):
    out = []
    edits = 0
    inserts = []  # positions to insert " + 0" after
    for m in re.finditer(r"(?i)\bround\s*\(", text):
        close = match_paren(text, m.end() - 1)
        if close < 0:
            continue
        inner = text[m.end():close]
        after = text[close + 1:close + 80]
        # already protected at site?
        if re.match(r"\s*\+\s*0(?![.\w])", after):
            continue
        # decimal-producing: outermost arg is CAST(... AS DECIMAL(p,s))
        arg = re.sub(r",\s*\d+\s*$", "", inner.strip())
        if re.search(r"(?is)AS\s+DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)\s*\)$", arg):
            continue
        am = re.match(r"(?s)^\s+AS\s+(\w+)", after)
        if not am:
            continue  # not directly aliased/cast — straggler, handle by hand
        word = am.group(1).upper()
        if word in TYPES:
            if word != "DOUBLE":
                continue  # CAST(round(...) AS BIGINT) etc — integer result
            # CAST(round(...) AS DOUBLE): insert before the AS
            inserts.append((close + 1, m.start()))
        else:
            # SQL alias: round(...) AS name
            inserts.append((close + 1, m.start()))
    if not inserts:
        return text, 0
    for pos, site in sorted(inserts, reverse=True):
        text = text[:pos] + " + 0" + text[pos:]
        edits += 1
        line = text.count("\n", 0, site) + 1
        print(f"{path}:{line} patched")
    return text, edits

total = 0
for path in sys.argv[1:]:
    with open(path) as f:
        text = f.read()
    new, n = patch(text, path)
    if n:
        with open(path, "w") as f:
            f.write(new)
        total += n
print(f"total edits: {total}")

#!/usr/bin/env python3
"""Generate a pure-SQL (DuckDB) implementation of XXH64 with seed support,
bit-compatible with Spark's xxhash64 / XxHash64Function on ASCII strings.

Used to build DuckDB oracles for the minhash/simhash dedup queries: the
oracle must reproduce Spark's hash-driven candidate generation exactly,
and DuckDB has no xxhash64 builtin. All arithmetic is HUGEINT mod 2^64
(DuckDB integer ops error on overflow, so 64-bit wraparound is emulated
with 32-bit split multiplies); xor goes through UBIGINT.

Self-test:  python3 scripts/xxh64_sql.py /tmp/xxh_vectors.tsv
(vectors minted by `sbt "Test/runMain graft.HashVectors"`)
"""
M = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def mul(a, b):
    return (f"(((({a})%4294967296)*({b}) + (((({a})//4294967296)*({b}))"
            f"%4294967296)*4294967296) % 18446744073709551616)")


def add(*xs):
    s = " + ".join(f"({x})" for x in xs)
    return f"(({s}) % 18446744073709551616)"


def rotl(x, r):
    lo, hi = 1 << (64 - r), 1 << r
    return f"((({x}) % {lo}) * {hi} + ({x}) // {lo})"


def xor(a, b):
    return (f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT))"
            f" AS HUGEINT)")


def shr(x, n):
    return f"(({x}) // {1 << n})"


def let(name, value, body):
    """Single-element list_transform as a let-binding."""
    return f"list_transform([{value}], {name} -> {body})[1]"


def xround(acc, lane):
    return mul(rotl(add(acc, mul(lane, P2)), 31), P1)


def merge_round(h, v):
    return add(mul(xor(h, xround(0, v)), P1), P4)


def avalanche(h):
    e = xor(h, shr(h, 33))
    e = mul(e, P2)
    e = let("av1", e, mul(xor("av1", shr("av1", 29)), P3))
    e = let("av2", e, xor("av2", shr("av2", 32)))
    return e


def lane8(bexpr, base):
    """Little-endian u64 from 8 bytes of list `bexpr` at 0-based `base`
    (a SQL int expression)."""
    terms = [f"({bexpr})[({base})+{k + 1}]*{1 << (8 * k)}" for k in range(8)]
    return "(" + " + ".join(terms) + ")"


def lane4(bexpr, base):
    terms = [f"({bexpr})[({base})+{k + 1}]*{1 << (8 * k)}" for k in range(4)]
    return "(" + " + ".join(terms) + ")"


def xxh64(bytes_expr, n_expr, seed_expr):
    """SQL for XXH64 of a HUGEINT[] byte list (1-based) of length n."""
    B, n, seed = "xB", "xN", "xS"
    blocks = f"({n}//32)"
    # 32-byte stripes: accumulator and each stripe are HUGEINT[4] so
    # list_reduce (which needs acc/elem type equality) can fold them.
    stripe = ("list_transform(range(0, " + blocks + "), s -> ["
              + ", ".join(lane8(B, f"32*s + {8 * i}") for i in range(4)) + "])")
    acc0 = ("[" + add(seed, (P1 + P2) % M) + ", " + add(seed, P2) + ", "
            + f"({seed})" + ", " + add(seed, M - P1) + "]")
    folded = (f"list_reduce(list_prepend({acc0}, {stripe}), "
              "(a, x) -> [" + ", ".join(
                  xround(f"a[{i + 1}]", f"x[{i + 1}]") for i in range(4)) + "])")
    merged = let("a", folded,
                 let("h", add(rotl("a[1]", 1), rotl("a[2]", 7),
                              rotl("a[3]", 12), rotl("a[4]", 18)),
                     let("h1", merge_round("h", "a[1]"),
                         let("h2", merge_round("h1", "a[2]"),
                             let("h3", merge_round("h2", "a[3]"),
                                 merge_round("h3", "a[4]"))))))
    h0 = f"CASE WHEN {n} >= 32 THEN {merged} ELSE " + add(seed, P5) + " END"
    h1 = let("hh", h0, add("hh", n))
    # tail 8-byte lanes
    rem8 = f"(({n} % 32) // 8)"
    lanes8 = (f"list_transform(range(0, {rem8}), k -> "
              + lane8(B, f"32*{blocks} + 8*k") + ")")
    h2 = (f"list_reduce(list_prepend({h1}, {lanes8}), (acc, l) -> "
          + add(mul(rotl(xor("acc", xround(0, "l")), 27), P1), P4) + ")")
    # optional 4-byte lane
    c8 = f"(32*({n}//32) + 8*(({n} % 32) // 8))"   # consumed so far
    l4 = lane4(B, c8)
    h3 = let("hq", h2,
             f"CASE WHEN {n} - {c8} >= 4 THEN "
             + add(mul(rotl(xor("hq", mul(l4, P1)), 23), P2), P3)
             + " ELSE hq END")
    # byte tail
    c4 = f"({c8} + CASE WHEN {n} - {c8} >= 4 THEN 4 ELSE 0 END)"
    tail = f"list_transform(range({c4}, {n}), i -> ({B})[i+1])"
    h4 = (f"list_reduce(list_prepend({h3}, {tail}), (acc, b) -> "
          + mul(rotl(xor("acc", mul("b", P5)), 11), P1) + ")")
    out = let("hf", h4, avalanche("hf"))
    # bind the inputs once
    return let(B, bytes_expr, let(n, n_expr, let(seed, seed_expr, out)))


def ascii_bytes(str_expr):
    """HUGEINT[] byte list of an ASCII string expression (1-based)."""
    return (f"list_transform(range(1, length({str_expr})+1), "
            f"i -> CAST(ord(substr({str_expr}, i, 1)) AS HUGEINT))")


def xxh64_str(str_expr, seed_expr):
    return let("xRaw", str_expr,
               xxh64(ascii_bytes("xRaw"), f"length(xRaw)", seed_expr))


def xxh64_str_seeds(str_expr, n_seeds):
    """List of hashes for seeds 0..n_seeds-1, binding the byte list once."""
    body = xxh64("xBs", "xNs", "CAST(xSd AS HUGEINT)")
    return let("xRaw", str_expr,
               let("xBs", ascii_bytes("xRaw"),
                   let("xNs", "length(xRaw)",
                       f"list_transform(range(0, {n_seeds}), xSd -> {body})")))


def int_bytes(int_expr, width):
    """HUGEINT[] little-endian byte list of a non-negative integer
    expression (width 4 = Spark IntegerType, 8 = LongType)."""
    terms = ", ".join(
        f"(CAST(({int_expr}) AS HUGEINT) // {1 << (8 * k)}) % 256"
        for k in range(width))
    return f"[{terms}]"


def xxh64_int(int_expr, seed_expr):
    """Spark XxHash64Function.hashInt — XXH64 of the 4 LE bytes."""
    return xxh64(int_bytes(int_expr, 4), "4", seed_expr)


def xxh64_long(int_expr, seed_expr):
    """Spark XxHash64Function.hashLong — XXH64 of the 8 LE bytes."""
    return xxh64(int_bytes(int_expr, 8), "8", seed_expr)


def signed(e):
    """Back to Spark's signed BIGINT representation (let-bound so the
    argument expression appears once — class-file string constants cap
    at 64 KB)."""
    return let("sg", e,
               "CAST(CASE WHEN sg >= 9223372036854775808 THEN sg - "
               "18446744073709551616 ELSE sg END AS BIGINT)")


if __name__ == "__main__":
    import sys
    import duckdb
    vec = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xxh_vectors.tsv"
    con = duckdb.connect()
    expr = signed(xxh64_str("s", "CAST(seed AS HUGEINT)"))
    q = (f"SELECT seed, s, h, {expr} AS got FROM "
         f"read_csv('{vec}', delim='\\t', header=true, "
         f"columns={{'seed':'BIGINT','s':'VARCHAR','h':'BIGINT'}})")
    df = con.sql(q).df()
    bad = df[df.h != df.got]
    print(f"{len(df)} vectors, {len(bad)} mismatches")
    if len(bad):
        print(bad.head(10))
        sys.exit(1)

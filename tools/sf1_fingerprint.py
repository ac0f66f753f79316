#!/usr/bin/env python3
"""Content fingerprint of a fixture dir (dev/judge tool; driver-side
python). For each table: row count + order-independent XOR of DuckDB's
row hash — layout- and file-byte-independent, so it pins the LOGICAL
content GenScale is claimed to regenerate bit-stably.

Usage: python3 tools/sf1_fingerprint.py <fixtureDir> <pinFile>

If <pinFile> does not exist it is written (first pin); otherwise the
computed fingerprint must equal the pinned one or the exit code is 1
with a per-table diff. NOTE: hash() is DuckDB-version-dependent — the
pin records the version; a mismatch there is reported as such, not as
corruption.
"""
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fingerprint(fixture_dir):
    con = duckdb.connect()
    lines = [f"duckdb {duckdb.__version__}"]
    for t in TABLES:
        n, h = con.execute(
            f"SELECT count(*), bit_xor(hash(t)) "
            f"FROM read_parquet('{fixture_dir}/{t}.parquet') t").fetchone()
        lines.append(f"{t} rows={n} xorhash={h}")
    return lines


def main(fixture_dir, pin_file):
    got = fingerprint(fixture_dir)
    try:
        with open(pin_file) as f:
            want = f.read().splitlines()
    except FileNotFoundError:
        with open(pin_file, "w") as f:
            f.write("\n".join(got) + "\n")
        print(f"[sf1] pinned fingerprint -> {pin_file}")
        for ln in got:
            print("  " + ln)
        return 0
    if got == want:
        print(f"[sf1] fingerprint OK ({fixture_dir} == {pin_file})")
        return 0
    if got[0] != want[0]:
        print(f"[sf1] DuckDB version changed ({want[0]} -> {got[0]}): "
              "row hashes are not comparable across versions; re-pin "
              "after verifying correctness another way")
        return 1
    print(f"[sf1] FINGERPRINT MISMATCH vs {pin_file}:")
    for g, w in zip(got, want):
        if g != w:
            print(f"  pinned: {w}\n  got:    {g}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

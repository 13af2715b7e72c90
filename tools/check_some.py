#!/usr/bin/env python3
"""Filtered wrapper over tools/check.py for targeted re-verification.

Usage: python3 tools/check_some.py <sfDir> <outDir> q_a,q_b,...

Rewrites outDir/oracle_sql.json down to the named queries (backing up
the original alongside) and runs check.py's comparison on just those —
the dev loop after touching one operator, where a full Verify run is
20× the wall for no extra signal.
"""
import sys, json, shutil, os, subprocess

def main():
    sf_dir, out_dir, names = sys.argv[1], sys.argv[2], set(sys.argv[3].split(","))
    full = os.path.join(out_dir, "oracle_sql.json")
    bak = full + ".full"
    if not os.path.exists(bak):
        shutil.copy(full, bak)
    oracles = json.load(open(bak))
    missing = names - set(oracles)
    if missing:
        print(f"WARNING: no oracle for {sorted(missing)} (rows-only or typo)")
    json.dump({k: v for k, v in oracles.items() if k in names}, open(full, "w"))
    try:
        rc = subprocess.call([sys.executable,
            os.path.join(os.path.dirname(__file__), "check.py"), sf_dir, out_dir])
    finally:
        shutil.copy(bak, full)
    sys.exit(rc)

if __name__ == "__main__":
    main()

"""Mine a TRUE 60-bit salted-md5 gram collision (r9/r10 verdict carry:
the tenth sweep mode needs two DISTINCT word-k-grams whose
_salted_hash values — the first 15 hex chars of md5('<salt>:<gram>')
parsed base-16 — are equal).

This is a birthday search over ~2^30.5 candidates: we enumerate grams
'g<hex(i)> p q r s ...' (one variable token + k-1 fixed single-char
tokens, so any document can carry the gram as k consecutive
whitespace-split words), hash them on every core, sort the 60-bit
prefixes, and report adjacent duplicates. ~2.4e9 candidates gives
P(>=1 collision) ~ 0.92 per run; the START offset advances between
runs so retries explore fresh ground. On a 32-core box one salt takes
~5 minutes and ~40 GB transient RAM.

Why this exists: `ext_dup_span_profile` (salt 'sp') and
`ext_dedup_substr_spans` (salt 'ss') key their gram censuses on the
60-bit hash while their DuckDB oracles compare raw gram strings — a
collision silently merges two different grams on the Spark side only.
At 100 TB (~1e12 distinct grams) the 60-bit birthday bound expects
~4e5 such merges, so this is a REAL scale exposure, not a test
curiosity; the mined pairs are the fixture that proves the fix
(the 120-bit two-salt key) and pins it forever in pytest.

Usage:  python tools/mine_gram_collision.py <salt> <k> [n] [start]
        python tools/mine_gram_collision.py sp 5
        python tools/mine_gram_collision.py ss 8
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import sys

import numpy as np

# Mined TRUE collisions (this box, r11; ~2.4e9 candidates each, ~5 min
# on 30 cores). Each pair: two DISTINCT grams whose md5('<salt>:<gram>')
# digests agree on the first 15 hex chars (60 bits) and differ on hex
# chars 17-31 — so the legacy single-column _salted_hash key merged
# them while the r11 120-bit _salted_hash_pair key separates them.
# Consumed by tests/test_dedup.py (regression pin) and
# tools/degen_sweep.py --grams (the tenth sweep mode).
MINED = {
    # salt -> (gram1, gram2, shared 15-hex prefix)
    "sp": (
        "g24ac56b8 p q r s",
        "g43ffc73a p q r s",
        "5619e618ed3b447",
    ),
    "ss": (
        "g168c3537 p q r s t u v",
        "g4886dafe p q r s t u v",
        "37efcddfaae1a9b",
    ),
}

FILL_TOKENS = "p q r s t u v w x y z"  # k-1 single-char filler words


def _fill(k: int) -> str:
    return " ".join(FILL_TOKENS.split()[: k - 1])


def gram_text(i: int, k: int) -> str:
    return f"g{i:x} " + _fill(k)


def hash60(salt: str, gram: str) -> int:
    return int(hashlib.md5(f"{salt}:{gram}".encode()).hexdigest()[:15], 16)


_PRE = b""
_SUF = b""


def _init(pre: bytes, suf: bytes) -> None:
    global _PRE, _SUF
    _PRE, _SUF = pre, suf


def _scan(args):
    lo, hi = args
    md5 = hashlib.md5
    pre, suf = _PRE, _SUF
    out = np.empty(hi - lo, dtype=np.uint64)
    for j in range(hi - lo):
        d = md5(pre + b"%x" % (lo + j) + suf).digest()
        out[j] = int.from_bytes(d[:8], "big") >> 4
    return lo, out


def _find(args):
    lo, hi, targets = args
    md5 = hashlib.md5
    pre, suf = _PRE, _SUF
    tset = set(int(t) for t in targets)
    hits = []
    for i in range(lo, hi):
        d = md5(pre + b"%x" % i + suf).digest()
        if (int.from_bytes(d[:8], "big") >> 4) in tset:
            hits.append(i)
    return hits


def main() -> int:
    salt = sys.argv[1]
    k = int(sys.argv[2])
    n = int(float(sys.argv[3])) if len(sys.argv) > 3 else 2_400_000_000
    start = int(float(sys.argv[4])) if len(sys.argv) > 4 else 0
    pre = f"{salt}:g".encode()
    suf = (" " + _fill(k)).encode()
    procs = max(1, (mp.cpu_count() or 8) - 2)
    chunk = 8_000_000
    ranges = [
        (lo, min(lo + chunk, start + n))
        for lo in range(start, start + n, chunk)
    ]

    print(
        f"mining salt={salt!r} k={k} n={n:,} start={start:,} "
        f"procs={procs}",
        flush=True,
    )
    vals = np.empty(n, dtype=np.uint64)
    done = 0
    with mp.Pool(procs, initializer=_init, initargs=(pre, suf)) as pool:
        for lo, arr in pool.imap_unordered(_scan, ranges):
            vals[lo - start : lo - start + len(arr)] = arr
            done += len(arr)
            if done % 320_000_000 < chunk:
                print(f"  hashed {done:,}/{n:,}", flush=True)
        print("sorting...", flush=True)
        vals.sort()
        dup_mask = vals[1:] == vals[:-1]
        targets = np.unique(vals[1:][dup_mask])
        print(f"colliding 60-bit values: {len(targets)}", flush=True)
        if len(targets) == 0:
            print(
                "no collision in this range; re-run with "
                f"start={start + n} (results compose across runs only "
                "per-range — a cross-range collision needs both ranges "
                "re-scanned together)"
            )
            return 1
        del vals
        print("locating pre-images...", flush=True)
        pairs: dict[int, list[int]] = {int(t): [] for t in targets}
        for hits in pool.imap_unordered(
            _find, [(lo, hi, targets) for lo, hi in ranges]
        ):
            for i in hits:
                pairs[hash60(salt, gram_text(i, k))].append(i)
    for h, idxs in pairs.items():
        if len(idxs) >= 2:
            idxs.sort()
            g1, g2 = gram_text(idxs[0], k), gram_text(idxs[1], k)
            assert g1 != g2 and hash60(salt, g1) == hash60(salt, g2) == h
            print(f"COLLISION salt={salt!r} hash60={h}")
            print(f"  gram1 = {g1!r}")
            print(f"  gram2 = {g2!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

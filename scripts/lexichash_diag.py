"""Diagnostics for the lexichash mask-generation reconstruction."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lexicmap_tpu.utils.gorand import GoRand
from scripts.lexichash_mask_variants import (
    EXTRA,
    NPREF,
    ORACLE_CODES,
    SELECTORS,
    SUF_MASK,
    SUFFIXES,
)

# 0-based duplicated-prefix constraints from the oracle
DUP_HEAD = {3, 5, 7, 10, 11, 15, 20, 21, 24, 28}  # all dups < 32
SINGLE_HEAD = set(range(32)) - DUP_HEAD - {x for x in range(32) if x > 28}
# prefixes 0..28 fully determined by masks 1-10 except >28; dups in 16376..16383:
DUP_TAIL = {16380, 16383}
SINGLE_TAIL = {16376, 16377, 16378, 16379, 16381, 16382}

ORACLE_SUFFIXES = {c & SUF_MASK for c in ORACLE_CODES.values()}


def check_sel(extras: list[int]) -> bool:
    s = set(extras)
    if len(s) != EXTRA:
        return False
    head = {x for x in s if x <= 28}
    tail = {x for x in s if x >= 16376}
    return head == DUP_HEAD and tail == DUP_TAIL


def main():
    print("== duplicate selection at stream position 0 ==")
    for name, fn in SELECTORS.items():
        r = GoRand(1)
        extras = fn(r)
        head = sorted(x for x in set(extras) if x <= 28)
        tail = sorted(x for x in set(extras) if x >= 16376)
        print(f"  {name}: match={check_sel(extras)} head={head[:12]} tail={tail}")

    print("== selection after N suffix draws (uint64 source) ==")
    for pre in (16384, 20000):
        for name, fn in SELECTORS.items():
            r = GoRand(1)
            for _ in range(pre):
                r.uint64()
            extras = fn(r)
            print(f"  pre={pre} {name}: match={check_sel(extras)}")

    print("== oracle suffixes in raw suffix streams ==")
    for name, fn in SUFFIXES.items():
        r = GoRand(1)
        draws = [fn(r) for _ in range(100000)]
        hits = [(i, d) for i, d in enumerate(draws) if d in ORACLE_SUFFIXES]
        print(f"  {name}: {len(hits)}/21 found; first positions {[h[0] for h in hits[:25]]}")

    print("== oracle full mask codes in raw 62-bit draw streams ==")
    full_oracle = set(ORACLE_CODES.values())
    for name, mk in {
        "uint64&62": lambda r: r.uint64() & ((1 << 62) - 1),
        "int63&62": lambda r: r.int63() & ((1 << 62) - 1),
        "uint64>>2": lambda r: r.uint64() >> 2,
        "int63>>1": lambda r: r.int63() >> 1,
        "int63n_4^31": lambda r: r.int63n(1 << 62),
    }.items():
        r = GoRand(1)
        draws = [mk(r) for _ in range(100000)]
        hits = [i for i, d in enumerate(draws) if d in full_oracle]
        print(f"  {name}: {len(hits)}/21 found; positions {hits[:25]}")


if __name__ == "__main__":
    main()

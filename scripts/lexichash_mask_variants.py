"""Search for the exact lexichash mask-generation procedure.

Oracle: docs/content/usage/utils/masks.md in the reference repo prints 21
masks of the default demo index (k=31, m=20000, seed=1, lcPrefix=0):
indices 1-10, 19991-20000 and 12345 of the sorted mask list, plus the
constraint that exactly 3616 of the 16384 7-bp prefixes appear twice
(never three times -> duplicates are drawn without replacement).

We know the RNG bit-exactly (lexicmap_tpu/utils/gorand.py).  This script
enumerates plausible (suffix source x duplicate-prefix selection x
consumption order) combinations and reports any whose sorted mask list
reproduces all 21 oracle entries.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lexicmap_tpu.utils.gorand import GoRand

K = 31
M = 20000
SEED = 1
P = 7  # 4^7 = 16384 <= 20000
NPREF = 1 << (2 * P)
EXTRA = M - NPREF  # 3616
SUF_BASES = K - P  # 24
SUF_BITS = 2 * SUF_BASES  # 48
SUF_MASK = (1 << SUF_BITS) - 1

B = {"A": 0, "C": 1, "G": 2, "T": 3}


def encode(s: str) -> int:
    c = 0
    for ch in s:
        c = (c << 2) | B[ch]
    return c


ORACLE = {
    0: "AAAAAAATTCTCGGCGGTGTTTCCAGGCGCA",
    1: "AAAAAACGTGGCGTCCCCTGTATAACGGCTA",
    2: "AAAAAAGAGGGGAAGCAAGCTGAAGGATATG",
    3: "AAAAAATACAGGCTGGCATCTTTAACCCACC",
    4: "AAAAAATCCAGGGTTCCGTTAAGGATCTGTC",
    5: "AAAAACATTCATGCTAGCATACCTTGGCAAC",
    6: "AAAAACCACAATGTGGAAGCACGAGAGGATT",
    7: "AAAAACCTGTACCCACCCGACGTGGATCCTC",
    8: "AAAAACGTAGGCGTACCTCTCATAGCTTGTA",
    9: "AAAAACTATGGATACTTGCCGTAAATCACCT",
    19990: "TTTTTGAACTTGTGAAAAAGGCAGATGTGTG",
    19991: "TTTTTGCGTTTATGCTGCCCTCAAACCATCT",
    19992: "TTTTTGGATCCACTGTACGAGCACACTACCC",
    19993: "TTTTTGTGGCTCATCGGGATCGGGAGCAGTC",
    19994: "TTTTTTACATGTTGGGCTAGGGGCGGTTCAC",
    19995: "TTTTTTATCGGACGCCAAGTTTGTAATCGTC",
    19996: "TTTTTTCTTGCATCGTATTCAGCACGTTCCT",
    19997: "TTTTTTGCCGAGTGACCCCGAAAAGCTCACA",
    19998: "TTTTTTTATCGAGGCATGGTTGAAGACGGGT",
    19999: "TTTTTTTCCGTAACTAGGTTCTGGCGATTCC",
    12344: "GCTGCACACGCAAAGACTCACGTCTTCAACG",
}
ORACLE_CODES = {i: encode(s) for i, s in ORACLE.items()}


def score(masks: list[int]) -> int:
    ms = sorted(masks)
    return sum(1 for i, c in ORACLE_CODES.items() if ms[i] == c)


# ---------------- suffix sources ----------------


def suf_uint64(r: GoRand) -> int:
    return r.uint64() & SUF_MASK


def suf_int63(r: GoRand) -> int:
    return r.int63() & SUF_MASK


def suf_perbase_intn(r: GoRand) -> int:
    c = 0
    for _ in range(SUF_BASES):
        c = (c << 2) | r.intn(4)
    return c


def suf_perbase_int63(r: GoRand) -> int:
    c = 0
    for _ in range(SUF_BASES):
        c = (c << 2) | (r.int63() & 3)
    return c


def suf_uint64_top(r: GoRand) -> int:
    return r.uint64() >> (64 - SUF_BITS)


SUFFIXES = {
    "uint64&48": suf_uint64,
    "int63&48": suf_int63,
    "perbase_intn4": suf_perbase_intn,
    "perbase_int63&3": suf_perbase_int63,
    "uint64>>16": suf_uint64_top,
}

# ---------------- duplicate-prefix selection ----------------


def sel_perm(r: GoRand) -> list[int]:
    return r.perm(NPREF)[:EXTRA]


def sel_shuffle(r: GoRand) -> list[int]:
    xs = list(range(NPREF))
    r.shuffle_list(xs)
    return xs[:EXTRA]


def sel_reject(r: GoRand) -> list[int]:
    seen = set()
    out = []
    while len(out) < EXTRA:
        p = r.intn(NPREF)
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def sel_reject_int63(r: GoRand) -> list[int]:
    seen = set()
    out = []
    while len(out) < EXTRA:
        p = r.int63() % NPREF
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


SELECTORS = {
    "perm": sel_perm,
    "shuffle": sel_shuffle,
    "reject_intn": sel_reject,
    "reject_int63": sel_reject_int63,
}


# ---------------- assembly orders ----------------


def gen(order: str, sel_name: str, suf_name: str) -> list[int]:
    r = GoRand(SEED)
    suf = SUFFIXES[suf_name]
    masks: list[int] = []
    seen: set[int] = set()

    def add(prefix: int) -> None:
        while True:
            mcode = (prefix << SUF_BITS) | suf(r)
            if mcode not in seen:
                seen.add(mcode)
                masks.append(mcode)
                return

    if order == "sel_first":
        extras = SELECTORS[sel_name](r)
        for p in range(NPREF):
            add(p)
        for p in extras:
            add(p)
    elif order == "sel_first_sorted":
        extras = sorted(SELECTORS[sel_name](r))
        for p in range(NPREF):
            add(p)
        for p in extras:
            add(p)
    elif order == "base_then_sel":
        for p in range(NPREF):
            add(p)
        for p in SELECTORS[sel_name](r):
            add(p)
    elif order == "sel_first_interleaved":
        # prefix list built first (base + extras), then sorted, then suffixes
        extras = SELECTORS[sel_name](r)
        plist = sorted(list(range(NPREF)) + extras)
        for p in plist:
            add(p)
    else:
        raise ValueError(order)
    return masks


def main():
    best = []
    for order in ("sel_first", "sel_first_sorted", "base_then_sel", "sel_first_interleaved"):
        for sel_name in SELECTORS:
            for suf_name in SUFFIXES:
                masks = gen(order, sel_name, suf_name)
                s = score(masks)
                tag = f"{order}/{sel_name}/{suf_name}"
                if s > 0:
                    print(f"  {tag}: {s}/21")
                best.append((s, tag))
    best.sort(reverse=True)
    print("top:", best[:5])


if __name__ == "__main__":
    main()


# ---------------- Wang-hash suffix variants (round-2 session 2) ----------------

def wang64(key: int) -> int:
    M = (1 << 64) - 1
    key = ((~key & M) + ((key << 21) & M)) & M
    key ^= key >> 24
    key = (key + ((key << 3) & M) + ((key << 8) & M)) & M
    key ^= key >> 14
    key = (key + ((key << 2) & M) + ((key << 4) & M)) & M
    key ^= key >> 28
    key = (key + ((key << 31) & M)) & M
    return key


def suf_wang_uint64(r: GoRand) -> int:
    return wang64(r.uint64()) & SUF_MASK


def suf_wang_int63(r: GoRand) -> int:
    return wang64(r.int63()) & SUF_MASK


def suf_wang_top(r: GoRand) -> int:
    return wang64(r.uint64()) >> (64 - SUF_BITS)


SUFFIXES["wang(uint64)&48"] = suf_wang_uint64
SUFFIXES["wang(int63)&48"] = suf_wang_int63
SUFFIXES["wang(uint64)>>16"] = suf_wang_top

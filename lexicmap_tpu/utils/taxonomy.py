"""NCBI taxdump taxonomy with ancestor/LCA queries.

Replaces the reference's shenwei356/bio/taxdump usage for TaxId-filtered
search (ref: lib-index-search.go:316-416, 1399-1448)."""

from __future__ import annotations

import os


class Taxonomy:
    def __init__(self, parent: dict[int, int], rank: dict[int, str] | None = None):
        self.parent = parent
        self.rank = rank or {}
        self._anc_cache: dict[tuple[int, int], bool] = {}

    @classmethod
    def from_taxdump(cls, taxdump_dir: str) -> "Taxonomy":
        """Parse nodes.dmp ('taxid\t|\tparent\t|\trank\t|...')."""
        parent: dict[int, int] = {}
        rank: dict[int, str] = {}
        with open(os.path.join(taxdump_dir, "nodes.dmp")) as fh:
            for line in fh:
                parts = [p.strip() for p in line.split("|")]
                if len(parts) < 3:
                    continue
                tid = int(parts[0])
                parent[tid] = int(parts[1])
                rank[tid] = parts[2]
        return cls(parent, rank)

    def lineage(self, taxid: int) -> list[int]:
        out = []
        seen = set()
        t = taxid
        while t in self.parent and t not in seen:
            out.append(t)
            seen.add(t)
            p = self.parent[t]
            if p == t:
                break
            t = p
        return out

    def is_descendant_or_self(self, taxid: int, ancestor: int) -> bool:
        """True iff ancestor is on taxid's lineage (LCA(taxid, a) == a)."""
        key = (taxid, ancestor)
        v = self._anc_cache.get(key)
        if v is not None:
            return v
        v = ancestor in self.lineage(taxid)
        self._anc_cache[key] = v
        return v

    def lca(self, a: int, b: int) -> int:
        la = self.lineage(a)
        sb = set(self.lineage(b))
        for t in la:
            if t in sb:
                return t
        return 1


def read_genome2taxid(path: str) -> dict[str, int]:
    """TSV: genome_id<TAB>taxid (ref demo: demo/taxid.map)."""
    out: dict[str, int] = {}
    with open(path) as fh:
        for line in fh:
            parts = line.rstrip("\r\n").split("\t")
            if len(parts) >= 2 and parts[0]:
                try:
                    out[parts[0]] = int(parts[1])
                except ValueError:
                    continue
    return out


def parse_taxid_args(taxids_str: list[str], taxid_file: str | None):
    """Split into (positive, negative) TaxId lists; negatives are prefixed
    with '-' (ref: parseTaxids, search-util.go:56-140)."""
    pos: list[int] = []
    neg: list[int] = []
    seen_p: set[int] = set()
    seen_n: set[int] = set()

    def add(val: int):
        if val > 0 and val not in seen_p:
            pos.append(val)
            seen_p.add(val)
        elif val < 0 and -val not in seen_n:
            neg.append(-val)
            seen_n.add(-val)

    for s in taxids_str:
        for part in s.split(","):
            part = part.strip()
            if part:
                add(int(part))
    if taxid_file:
        with open(taxid_file) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    add(int(line))
    return pos, neg

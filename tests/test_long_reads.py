"""Long-read search: simulated ONT-like reads from the demo genomes.

The reference's demo includes q.long-reads.fasta.gz (Badread-simulated ONT
reads; the file itself is absent from the read-only mount, see BASELINE.md),
so reads are simulated here: 1-8 kb windows with ~8% errors (mismatches +
indels), both strands.  Requires the demo index (see test_demo_parity.py).
"""

import os

import numpy as np
import pytest

DEMO_DB = os.environ.get("LEXICMAP_TPU_DEMO_DB", "/tmp/demo.lmt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DB, "info.json")),
    reason="demo index not built",
)


def simulate_read(rng, seq, err=0.08):
    """Mismatch/insert/delete at uniform positions (Badread-ish, simplified)."""
    out = bytearray()
    bases = b"ACGT"
    for ch in seq:
        r = rng.random()
        if r < err * 0.5:  # mismatch
            out.append(bases[int(rng.integers(0, 4))])
        elif r < err * 0.75:  # deletion
            continue
        elif r < err:  # insertion
            out.append(ch)
            out.append(bases[int(rng.integers(0, 4))])
        else:
            out.append(ch)
    return bytes(out)


@pytest.fixture(scope="module")
def searcher():
    from lexicmap_tpu.index.search import IndexSearcher, SearchOptions

    return IndexSearcher(DEMO_DB, SearchOptions())


def test_long_reads_map_back(searcher):
    from lexicmap_tpu.utils.kmers import codes_to_seq, revcomp_seq

    rng = np.random.default_rng(42)
    n_reads = 24
    correct = 0
    pos_ok = 0
    total = 0
    n_genomes = len(searcher.id_of_code)
    codes_list = sorted(searcher.id_of_code)
    for i in range(n_reads):
        code = codes_list[int(rng.integers(0, n_genomes))]
        b = code >> 17
        gi = code & ((1 << 17) - 1)
        st = searcher.genome_stores[b]
        glen = int(st.lens[gi])
        rlen = int(rng.integers(1000, 8000))
        start = int(rng.integers(0, glen - rlen))
        seq = codes_to_seq(st.subseq_codes(gi, start, start + rlen - 1))
        read = simulate_read(rng, seq)
        if rng.random() < 0.5:
            read = revcomp_seq(read)
        total += 1
        hits = searcher.search_bytes(read)
        if not hits:
            continue
        top = hits[0]
        if top.batch_genome_index == code:
            correct += 1
            c = top.details[0].chains[0]
            # position sanity: overlap with the true source region
            # (contig-level coordinates; allow the concatenated offset)
            if any(
                abs(cc.tbegin - start) < glen
                for sd in top.details
                for cc in sd.chains
            ):
                pos_ok += 1
    assert correct / total >= 0.85, f"only {correct}/{total} reads mapped to source"


def test_long_read_alignment_quality(searcher):
    """A clean (error-free) 5kb read must align ~100% qcov / ~100% pident."""
    from lexicmap_tpu.utils.kmers import codes_to_seq

    st = searcher.genome_stores[0]
    seq = codes_to_seq(st.subseq_codes(0, 100000, 104999))
    hits = searcher.search_bytes(seq)
    assert hits
    top = hits[0]
    c = top.details[0].chains[0]
    assert c.pident == pytest.approx(100.0, abs=0.2)
    assert top.aligned_fraction == pytest.approx(100.0, abs=0.5)

"""Bit layouts and default parameters.

The seed-posting bit layout follows the reference exactly so that search-side
decoding logic is comparable line by line
(ref: lexicmap/cmd/lib-index-build.go:412-455):

    batch(17) | genomeIdx(17) | pos(28) | strand(1) | reverse(1)   = 64 bits

- ``strand``: the captured k-mer came from the reverse-complement strand.
- ``reverse``: the entry stores a base-order-REVERSED k-mer (suffix index).
"""

BITS_BATCH_IDX = 17
BITS_GENOME_IDX = 17
MASK_GENOME_IDX = (1 << BITS_GENOME_IDX) - 1
BITS_POSITION = 28
MAX_GENOME_SIZE = 1 << BITS_POSITION
BITS_STRAND = 1
MASK_STRAND = 1
BITS_REVERSE = 1
MASK_REVERSE = 1
BITS_IDX = BITS_BATCH_IDX + BITS_GENOME_IDX  # 34
BITS_NONE_POS = 64 - BITS_POSITION
BITS_NONE_IDX = 64 - BITS_IDX  # 30
MASK_NONE_IDX = (1 << BITS_NONE_IDX) - 1
BITS_FLAGS = BITS_STRAND + BITS_REVERSE  # 2
BITS_IDX_FLAGS = BITS_IDX + BITS_FLAGS  # 36


class IndexDefaults:
    """Defaults of ``lexicmap index`` (ref: lexicmap/cmd/index.go:515-630)."""

    K = 31
    MASKS = 20000
    RAND_SEED = 1
    BATCH_SIZE = 5000
    CHUNKS = 0  # 0 -> number of CPUs (bounded to [1, 128])
    PARTITIONS = 4096
    MAX_GENOME_SIZE = 20_000_000
    MIN_SEQ_LEN = -1  # -1 -> k
    CONTIG_INTERVAL = 1000
    SEED_MAX_DESERT = 100
    SEED_IN_DESERT_DIST = 50
    MAX_KMER_FREQ = 0  # 0 for no filtering


class SearchDefaults:
    """Defaults of ``lexicmap search`` (ref: lexicmap/cmd/search.go:630-724)."""

    MIN_PREFIX = 15  # -p/--seed-min-prefix
    MIN_SINGLE_PREFIX = 17  # -P/--seed-min-single-prefix
    SEED_MAX_GAP = 50
    SEED_MAX_DIST = 1000
    TOP_N_GENOMES = 0
    TOP_N_CHAINS = 0
    ALIGN_EXT_LEN = 1000
    ALIGN_MAX_GAP = 20
    ALIGN_BAND = 100
    ALIGN_MIN_MATCH_LEN = 50  # -l
    ALIGN_MIN_MATCH_PIDENT = 70.0  # -i
    MIN_QCOV_PER_HSP = 0.0  # -q
    MIN_QCOV_PER_GENOME = 0.0  # -Q
    MAX_EVALUE = 10.0  # -e
    EXTEND_LENGTH2 = 50

    # pseudo-alignment (SeqComparator) settings (ref: search.go:361-383)
    CMP_K = 31
    CMP_MIN_PREFIX = 11
    HEURISTIC_KMER_PIDENT_THRESHOLD = 15.0

    # BLAST-like scoring for bit score / e-value
    # (ref: lib-index-search.go:1875, lib-index-search-util.go:259-303,
    #  values from blastn_values_2_3 in NCBI BLAST blast_stat.c)
    BLAST_MATCH = 2
    BLAST_MISMATCH = -3
    BLAST_GAP_OPEN = 5
    BLAST_GAP_EXT = 2
    BLAST_LAMBDA = 0.625
    BLAST_K = 0.41

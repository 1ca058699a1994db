"""lexicmap_tpu — a TPU-native LexicMap-class nucleotide alignment engine.

A from-scratch reimplementation of the capabilities of shenwei356/LexicMap
(reference: /root/reference) designed TPU-first:

- LexicHash masking as batched array kernels (JAX/Pallas) over packed 2-bit
  sequences, instead of per-goroutine scalar loops.
- A columnar, fixed-width seed index (sorted k-mer arrays per mask) that is
  memory-mappable on host and shardable into HBM along the mask axis,
  instead of varint-GB delta-encoded chunk files.
- Seed matching as vectorized double binary searches (searchsorted) per mask.
- Seed chaining / pseudo-alignment as banded DP kernels.
- Wavefront alignment (WFA) for base-level alignment.
- Multi-device scaling via jax.sharding.Mesh + shard_map along the mask
  axis (index) and query axis (data parallel).

Layout mirrors the reference's component inventory (SURVEY.md §2):
  utils/    codecs and IO           (ref: lexicmap/cmd/util, bio/seqio)
  masks     mask generation + IO    (ref: shenwei356/lexichash)
  ops/      compute kernels         (ref: lib-chaining*.go, lib-seq_compare.go, wfa)
  index/    build/store/search      (ref: lib-index-build.go, cmd/kv, cmd/genome,
                                     lib-index-search.go)
  parallel/ device-mesh sharding    (no reference equivalent; single-node Go)
"""

__version__ = "0.1.0"

# Index format version of this implementation (not the reference's binary format;
# we use a columnar layout, see lexicmap_tpu/index/store.py).
FORMAT_MAIN_VERSION = 1
FORMAT_MINOR_VERSION = 0

"""TaxId-filtered search with a synthetic NCBI-style taxdump."""

import os

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index
from lexicmap_tpu.index.search import IndexSearcher, SearchOptions
from lexicmap_tpu.utils.taxonomy import Taxonomy, parse_taxid_args


def test_taxonomy_lineage_lca(tmp_path):
    nodes = tmp_path / "nodes.dmp"
    #      1
    #     / \
    #    2   3
    #   / \    \
    #  4   5    6
    nodes.write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "3\t|\t1\t|\tsuperkingdom\t|\n"
        "4\t|\t2\t|\tspecies\t|\n"
        "5\t|\t2\t|\tspecies\t|\n"
        "6\t|\t3\t|\tspecies\t|\n"
    )
    tax = Taxonomy.from_taxdump(str(tmp_path))
    assert tax.lineage(4) == [4, 2, 1]
    assert tax.is_descendant_or_self(4, 2)
    assert tax.is_descendant_or_self(4, 4)
    assert not tax.is_descendant_or_self(4, 3)
    assert tax.lca(4, 5) == 2
    assert tax.lca(4, 6) == 1


def test_parse_taxid_args(tmp_path):
    f = tmp_path / "taxids.txt"
    f.write_text("7\n-8\n")
    pos, neg = parse_taxid_args(["1,2", "-3", "2"], str(f))
    assert pos == [1, 2, 7]
    assert neg == [3, 8]


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(55)
    d = tmp_path_factory.mktemp("refs5")
    files = []
    genomes = {}
    for i in range(3):
        name = f"T{i:03d}"
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=40000))
        genomes[name] = seq
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + seq + b"\n")
        files.append(str(p))
    out = str(tmp_path_factory.mktemp("db5") / "t.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=256, chunks=2))

    # shared query present in all three genomes: splice a common region
    common = genomes["T000"][1000:2500]
    d2 = tmp_path_factory.mktemp("refs5b")
    files2 = []
    for i, name in enumerate(genomes):
        seq = bytearray(genomes[name])
        seq[5000:5000 + len(common)] = common
        p = d2 / f"{name}.fasta"
        with open(p, "wb") as fh:
            fh.write(b">c0\n" + bytes(seq) + b"\n")
        files2.append(str(p))
    out2 = str(tmp_path_factory.mktemp("db5c") / "t2.lmt")
    build_index(out2, files2, BuildOptions(k=31, n_masks=256, chunks=2))

    taxdir = tmp_path_factory.mktemp("taxdump")
    (taxdir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "10\t|\t1\t|\tgenus\t|\n"
        "11\t|\t10\t|\tspecies\t|\n"
        "12\t|\t10\t|\tspecies\t|\n"
        "20\t|\t1\t|\tgenus\t|\n"
        "21\t|\t20\t|\tspecies\t|\n"
    )
    g2t = taxdir / "g2t.tsv"
    g2t.write_text("T000\t11\nT001\t12\nT002\t21\n")
    return out2, common, str(taxdir), str(g2t)


def test_taxid_whitelist(db):
    out, common, taxdir, g2t = db
    base = dict(taxdump_dir=taxdir, genome2taxid_file=g2t)
    # no filter: all 3 genomes hit
    idx = IndexSearcher(out, SearchOptions())
    all_hits = {h.genome_id.decode() for h in idx.search_bytes(common)}
    assert all_hits == {"T000", "T001", "T002"}
    # genus 10 -> T000, T001
    idx2 = IndexSearcher(out, SearchOptions(taxids=[10], **base))
    hits = {h.genome_id.decode() for h in idx2.search_bytes(common)}
    assert hits == {"T000", "T001"}
    # species 21 only
    idx3 = IndexSearcher(out, SearchOptions(taxids=[21], **base))
    hits3 = {h.genome_id.decode() for h in idx3.search_bytes(common)}
    assert hits3 == {"T002"}


def test_taxid_blacklist(db):
    out, common, taxdir, g2t = db
    idx = IndexSearcher(
        out,
        SearchOptions(
            negative_taxids=[10], keep_genomes_without_taxid=True,
            taxdump_dir=taxdir, genome2taxid_file=g2t,
        ),
    )
    hits = {h.genome_id.decode() for h in idx.search_bytes(common)}
    assert hits == {"T002"}


def test_genome_codes_whitelist(db):
    out, common, taxdir, g2t = db
    idx = IndexSearcher(out, SearchOptions())
    from lexicmap_tpu.utils.kmers import seq_to_codes

    # only genome code 1 (T001)
    hits = idx.search(seq_to_codes(common), genome_codes={1})
    assert {h.genome_id.decode() for h in hits} == {"T001"}

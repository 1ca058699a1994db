"""Drive the utils subcommands through the CLI surface."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lexicmap_tpu.index.build import BuildOptions, build_index


def run_cli(*argv, check=True):
    res = subprocess.run(
        [sys.executable, "-m", "lexicmap_tpu.cli", *argv],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    if check and res.returncode != 0:
        raise AssertionError(f"cli failed: {argv}\n{res.stderr}")
    return res


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(31)
    d = tmp_path_factory.mktemp("refs4")
    files = []
    genomes = {}
    for i in range(2):
        name = f"U{i:03d}"
        contigs = [
            bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)),
            bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=10000)),
        ]
        genomes[name] = contigs
        p = d / f"{name}.fasta"
        with open(p, "wb") as fh:
            for j, s in enumerate(contigs):
                fh.write(b">" + f"seq{j}".encode() + b"\n" + s + b"\n")
        files.append(str(p))
    out = str(tmp_path_factory.mktemp("db4") / "u.lmt")
    build_index(out, files, BuildOptions(k=31, n_masks=256, chunks=2, save_seed_pos=True))
    return out, genomes, files


def test_utils_genomes(db):
    out, genomes, _ = db
    res = run_cli("utils", "genomes", "-d", out)
    assert res.stdout.split() == ["U000", "U001"]
    res2 = run_cli("utils", "genomes", "-d", out, "-e")
    line = res2.stdout.splitlines()[0].split("\t")
    assert line == ["U000", "30000", "2"]


def test_utils_genome_seqs(db):
    out, genomes, _ = db
    res = run_cli("utils", "genome-seqs", "-d", out, "-n", "U001")
    lines = res.stdout.split("\n")
    assert lines[0] == ">seq0"
    seq = "".join(l for l in lines[1:] if l and not l.startswith(">"))
    full = genomes["U001"][0] + genomes["U001"][1]
    assert seq.encode() == full


def test_utils_genome_details(db):
    out, _, _ = db
    res = run_cli("utils", "genome-details", "-d", out, "-a")
    lines = res.stdout.strip().split("\n")
    assert lines[0].startswith("ref\tgenome_size")
    f = lines[1].split("\t")
    assert f[0] == "U000" and f[1] == "30000" and f[7] == "2"
    assert f[8] == "20000,10000"
    assert f[9] == "seq0,seq1"


def test_utils_subseq(db):
    out, genomes, _ = db
    res = run_cli(
        "utils", "subseq", "-d", out, "-n", "U000", "-s", "seq1",
        "-r", "101:150",
    )
    lines = res.stdout.strip().split("\n")
    assert lines[0] == ">seq1:101-150:+"
    assert "".join(lines[1:]).encode() == genomes["U000"][1][100:150]
    # minus strand (reference flag surface: -R/--revcom)
    res2 = run_cli(
        "utils", "subseq", "-d", out, "-n", "U000", "-s", "seq1",
        "-r", "101:150", "-R",
    )
    from lexicmap_tpu.utils.kmers import revcomp_seq

    body = "".join(res2.stdout.strip().split("\n")[1:]).encode()
    assert body == revcomp_seq(genomes["U000"][1][100:150])


def test_utils_masks(db):
    out, _, _ = db
    res = run_cli("utils", "masks", "-d", out)
    lines = res.stdout.strip().split("\n")
    assert len(lines) == 256
    assert lines[0].split("\t")[0] == "1"
    assert len(lines[0].split("\t")[1]) == 31


def test_utils_kmers(db):
    out, _, _ = db
    res = run_cli("utils", "kmers", "-d", out, "-m", "3")
    lines = res.stdout.strip().split("\n")
    assert lines[0].startswith("mask\tkmer\tprefix")
    assert len(lines) > 1
    f = lines[1].split("\t")
    assert f[0] == "3" and len(f[1]) == 31
    assert f[6] in ("+", "-") and f[7] in ("yes", "no")


def test_utils_seed_pos(db):
    out, _, _ = db
    res = run_cli("utils", "seed-pos", "-d", out, "-n", "U000")
    lines = res.stdout.strip().split("\n")
    assert lines[0] == "ref\tpos\tstrand\tafter_interval"
    assert len(lines) > 50


def test_utils_edit_genome_ids(db, tmp_path):
    out, _, files = db
    # build a throwaway index to edit
    out2 = str(tmp_path / "edit.lmt")
    build_index(out2, files, BuildOptions(k=31, n_masks=256, chunks=2))
    run_cli("utils", "edit-genome-ids", "-d", out2, "-p", "^U", "-r", "G")
    res = run_cli("utils", "genomes", "-d", out2)
    assert res.stdout.split() == ["G000", "G001"]


def test_utils_recount_and_reindex(db):
    out, _, _ = db
    run_cli("utils", "recount-bases", "-d", out)
    import json

    info = json.load(open(os.path.join(out, "info.json")))
    assert info["input_bases"] == 60000
    run_cli("utils", "reindex-seeds", "-d", out)


def test_search_then_2blast_2sam_and_subseq_tsv(db, tmp_path):
    out, genomes, _ = db
    qfile = tmp_path / "q.fa"
    with open(qfile, "wb") as fh:
        fh.write(b">q1\n" + genomes["U000"][0][2000:3000] + b"\n")
    tsv = tmp_path / "r.tsv"
    run_cli("search", "-d", out, str(qfile), "-o", str(tsv), "-a")
    rows = open(tsv).read().strip().split("\n")
    assert len(rows) >= 2

    res = run_cli("utils", "2blast", str(tsv))
    assert "Query = q1" in res.stdout
    assert "Sbjct" in res.stdout

    res2 = run_cli("utils", "2sam", str(tsv))
    assert res2.stdout.startswith("@HD")
    body = [l for l in res2.stdout.split("\n") if l and not l.startswith("@")]
    f = body[0].split("\t")
    assert f[0] == "q1" and f[2] == "seq0"
    assert "NM:i:" in body[0]

    res3 = run_cli("utils", "subseq", "-d", out, "-t", str(tsv))
    assert res3.stdout.startswith(">seq0:")

    # merge-search-results round trip (single input = normalization)
    res4 = run_cli("utils", "merge-search-results", str(tsv))
    assert res4.stdout.split("\n")[0].startswith("query\t")

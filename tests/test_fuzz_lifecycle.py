"""Randomized DB-lifecycle fuzz: merge/append/delete over random genome
sets, k sets and sketch sizes must compose exactly — every derived
database's .skd is byte-identical to a direct sketch of the same genomes
in the semantically-required order (merge = concat, append = new samples
first then old db per lib.rs:860-869, delete = remainder in original
order), and the .skm metadata lists the same samples.

The reference covers one fixed configuration of each op
(tests/{merge,concat,delete}.rs); this sweeps random ones.
"""

import gzip

import numpy as np
import pytest

from sketchtpu.cli import main
from sketchtpu.formats.skm import MultiSketch


def run(*argv):
    assert main(list(argv)) == 0


def _write_fasta(path, rng, n_records, length):
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    with gzip.open(path, "wb") as f:
        for r in range(n_records):
            n = int(length * (0.5 + rng.random()))
            probs = np.array([0.24, 0.24, 0.24, 0.24, 0.04])
            seq = alphabet[rng.choice(5, size=n, p=probs)]
            f.write(b">rec%d\n" % r)
            f.write(seq.tobytes() + b"\n")


@pytest.fixture()
def wd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("SKETCHTPU_BACKEND", "host")
    return tmp_path


def _names(db):
    ms = MultiSketch.load_metadata(db)
    return [s.name for s in ms.sketch_metadata]


def _skd(wd, db):
    return (wd / f"{db}.skd").read_bytes()


@pytest.mark.parametrize("seed", range(4))
def test_lifecycle_fuzz(wd, seed):
    rng = np.random.default_rng(1000 + seed)
    ngen = int(rng.integers(4, 9))
    genomes = []
    for i in range(ngen):
        name = f"g{i}.fa.gz"
        _write_fasta(wd / name, rng, int(rng.integers(1, 4)),
                     int(rng.integers(800, 4000)))
        genomes.append(name)

    kmers = sorted(
        rng.choice([13, 15, 17, 19, 21, 25], size=int(rng.integers(1, 4)),
                   replace=False).tolist()
    )
    karg = ",".join(str(k) for k in kmers)
    s = int(rng.choice([64, 100, 156]))

    def sketch(out, files):
        run("sketch", "--k-vals", karg, "-s", str(s), *files, "-o", out,
            "--quiet")

    sketch("full", genomes)

    # merge(part1, part2) == direct sketch of the concatenation
    cut = int(rng.integers(1, ngen))
    part1, part2 = genomes[:cut], genomes[cut:]
    sketch("p1", part1)
    sketch("p2", part2)
    run("merge", "p1", "p2", "-o", "m12", "--quiet")
    assert _skd(wd, "m12") == _skd(wd, "full")
    assert _names("m12") == genomes

    # merge is order-sensitive concat: merge(p2, p1) == sketch(p2 + p1)
    run("merge", "p2", "p1", "-o", "m21", "--quiet")
    sketch("rev", part2 + part1)
    assert _skd(wd, "m21") == _skd(wd, "rev")
    assert _names("m21") == part2 + part1

    # append writes the new samples first, then the old db (lib.rs:860-869)
    run("append", "p1", *part2, "-o", "app", "--quiet")
    assert _skd(wd, "app") == _skd(wd, "rev")
    assert _names("app") == part2 + part1

    # delete == direct sketch of the remainder, original order
    n_del = int(rng.integers(1, ngen))
    dels = sorted(rng.choice(ngen, size=n_del, replace=False).tolist())
    keep = [g for i, g in enumerate(genomes) if i not in dels]
    with open("del.txt", "w") as f:
        for i in dels:
            f.write(genomes[i] + "\n")
    run("delete", "full", "del.txt", "deleted", "--quiet")
    if keep:
        sketch("keep_ref", keep)
        assert _skd(wd, "deleted") == _skd(wd, "keep_ref")
    else:
        assert _skd(wd, "deleted") == b""
    assert _names("deleted") == keep

    # chain: delete from a merged db (exercises index bookkeeping on a
    # database that was not produced by a direct sketch)
    with open("del2.txt", "w") as f:
        f.write(genomes[0] + "\n")
    run("delete", "m12", "del2.txt", "chain", "--quiet")
    sketch("chain_ref", genomes[1:])
    assert _skd(wd, "chain") == _skd(wd, "chain_ref")

    # self-merge must refuse (duplicate names, multisketch.rs:229-244)
    with pytest.raises((SystemExit, ValueError)):
        run("merge", "p1", "p1", "-o", "dup", "--quiet")

    # deleting a name that is absent must refuse
    with open("bad.txt", "w") as f:
        f.write("not-a-sample\n")
    with pytest.raises(SystemExit):
        run("delete", "full", "bad.txt", "nope", "--quiet")

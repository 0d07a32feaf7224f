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


def test_deleted_db_is_fully_consistent(wd):
    """A deleted database must be internally consistent — unlike the
    reference, which saves the pre-delete name_map and index fields
    (multisketch.rs:298-301) so subset loads on its output panic. Our
    delete re-indexes the survivors; subset reads and distances work."""
    rng = np.random.default_rng(99)
    genomes = []
    with open("rfile.txt", "w") as f:
        for i in range(5):
            name = f"g{i}"
            _write_fasta(f"{name}.fa.gz", rng, 2, 8000)
            f.write(f"{name}\t{name}.fa.gz\n")
            genomes.append(name)
    run("sketch", "-f", "rfile.txt", "-o", "full", "-k", "17", "-s", "100",
        "--quiet")
    with open("del.txt", "w") as f:
        f.write("g1\n")
    run("delete", "full", "del.txt", "deleted", "--quiet")

    ms = MultiSketch.load_metadata("deleted")
    assert set(ms.name_map) == {"g0", "g2", "g3", "g4"}
    assert [s.index for s in ms.sketch_metadata] == [0, 1, 2, 3]

    # subset load by name resolves the right rows
    sub = MultiSketch.load_metadata("deleted")
    sub.read_sketch_data_block("deleted", ["g4", "g2"])
    full = MultiSketch.load_metadata("full")
    full.read_sketch_data("full")
    import numpy as _np

    for want, got in (("g4", 0), ("g2", 1)):
        w = full.get_sketch_slice(genomes.index(want), 0)
        assert _np.array_equal(sub.get_sketch_slice(got, 0), w)

    # (the CLI --subset variant is exercised in the golden tests; the
    # block load above is exactly the path the reference breaks)


def test_empty_query_rank_writes_empty_part(wd):
    """A multi-process `inverted query` rank whose row slice is empty must
    write its (empty) part instead of crashing (the build path already
    handles empty shards, shard/distributed.py)."""
    rng = np.random.default_rng(101)
    with open("rfile.txt", "w") as f:
        for i in range(3):
            _write_fasta(f"q{i}.fa.gz", rng, 1, 6000)
            f.write(f"q{i}\tq{i}.fa.gz\n")
    run("inverted", "build", "-f", "rfile.txt", "-o", "inv", "-s", "50",
        "-k", "17", "--quiet")
    # 8 ranks, 3 queries: ranks 3..7 get empty slices
    run("inverted", "query", "inv.ski", "-f", "rfile.txt",
        "--query-type", "match-count", "-o", "out.txt",
        "--process-id", "7", "--n-processes", "8", "--quiet")
    import os

    assert os.path.exists("out.txt.part7")
    assert open("out.txt.part7").read() == ""
